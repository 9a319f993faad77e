"""Convert a HuggingFace dots.llm1 (rednote-hilab) checkpoint to GGUF
(llama.cpp 'dots1' arch).  DeepSeek-V3 routing (sigmoid + correction
bias + group-limited top-k) under qwen3-style attention: FULL-dim
rotate-half rope and per-head q/k RMSNorm.  Served by the glm4moe module
(deepseek routing shared)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "dots1"
    head_dim = getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.attention.key_length", head_dim)
    w.add_u32(f"{a}.rope.dimension_count", head_dim)  # full-dim rope
    w.add_u32(f"{a}.leading_dense_block_count", cfg.first_k_dense_replace)
    w.add_u32(f"{a}.expert_count", cfg.n_routed_experts)
    w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)
    w.add_u32(f"{a}.expert_group_count", cfg.n_group)
    w.add_u32(f"{a}.expert_group_used_count", cfg.topk_group)
    w.add_u32(f"{a}.expert_gating_func", 2)  # sigmoid
    w.add_f32(f"{a}.expert_weights_scale", float(cfg.routed_scaling_factor))
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add_bool(f"{a}.expert_weights_norm", bool(cfg.norm_topk_prob))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    E = cfg.n_routed_experts
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "norm.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        for ours, theirs in (("attn_q", "self_attn.q_proj"),
                             ("attn_k", "self_attn.k_proj"),
                             ("attn_v", "self_attn.v_proj"),
                             ("attn_output", "self_attn.o_proj")):
            add(out + ours + ".weight", sd[hf + theirs + ".weight"])
            if hf + theirs + ".bias" in sd:
                add(out + ours + ".bias", sd[hf + theirs + ".bias"], quant=False)
        if hf + "self_attn.q_norm.weight" in sd:  # qwen3 attention: always
            add(out + "attn_q_norm.weight", sd[hf + "self_attn.q_norm.weight"],
                quant=False)
            add(out + "attn_k_norm.weight", sd[hf + "self_attn.k_norm.weight"],
                quant=False)
        if i < cfg.first_k_dense_replace:
            add(out + "ffn_gate.weight", sd[hf + "mlp.gate_proj.weight"])
            add(out + "ffn_up.weight", sd[hf + "mlp.up_proj.weight"])
            add(out + "ffn_down.weight", sd[hf + "mlp.down_proj.weight"])
        else:
            add(out + "ffn_gate_inp.weight", sd[hf + "mlp.gate.weight"])
            add(out + "exp_probs_b.bias",
                sd[hf + "mlp.gate.e_score_correction_bias"], quant=False)
            for ours, theirs in (("ffn_gate_exps", "gate_proj"),
                                 ("ffn_up_exps", "up_proj"),
                                 ("ffn_down_exps", "down_proj")):
                stacked = np.stack([
                    np_(sd[hf + f"mlp.experts.{j}.{theirs}.weight"])
                    for j in range(E)])
                add(out + ours + ".weight", stacked, quant=False)
            add(out + "ffn_gate_shexp.weight",
                sd[hf + "mlp.shared_experts.gate_proj.weight"])
            add(out + "ffn_up_shexp.weight",
                sd[hf + "mlp.shared_experts.up_proj.weight"])
            add(out + "ffn_down_shexp.weight",
                sd[hf + "mlp.shared_experts.down_proj.weight"])
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "q8_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K,
          "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
