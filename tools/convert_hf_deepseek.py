"""Convert a HuggingFace DeepSeek-V3 (or V2-style) checkpoint to GGUF.

llama.cpp arch 'deepseek2': MLA attention tensors (attn_q_a/_q_a_norm/_q_b
or attn_q, attn_kv_a_mqa, attn_kv_a_norm, attn_kv_b), leading dense blocks,
group-limited MoE with exp_probs_b selection bias and ffn_*_shexp shared
experts.  Weights stay in HF layout; rope dims remain interleaved (the
model applies the runtime de-interleave exactly as HF does, flagged by
deepseek2.rope_interleave).
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "deepseek2"
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_attention_heads)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", getattr(cfg, "rope_theta", 10000.0))
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    if getattr(cfg, "q_lora_rank", None):
        w.add_u32(f"{a}.attention.q_lora_rank", cfg.q_lora_rank)
    w.add_u32(f"{a}.attention.kv_lora_rank", cfg.kv_lora_rank)
    w.add_u32(f"{a}.attention.key_length", cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
    w.add_u32(f"{a}.attention.value_length", cfg.v_head_dim)
    w.add_u32(f"{a}.rope.dimension_count", cfg.qk_rope_head_dim)
    w.add_u32(f"{a}.leading_dense_block_count", cfg.first_k_dense_replace)
    w.add_u32(f"{a}.expert_count", cfg.n_routed_experts)
    w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)
    w.add_u32(f"{a}.expert_shared_count", cfg.n_shared_experts)
    w.add_u32(f"{a}.expert_feed_forward_length", cfg.moe_intermediate_size)
    w.add_u32(f"{a}.expert_group_count", getattr(cfg, "n_group", None) or 1)
    w.add_u32(f"{a}.expert_group_used_count", getattr(cfg, "topk_group", None) or 1)
    # 1 = softmax (V2), 2 = sigmoid (V3) — llama.cpp LLM_KV_EXPERT_GATING_FUNC
    sigmoid = getattr(cfg, "scoring_func",
                      "sigmoid" if cfg.model_type == "deepseek_v3" else "softmax"
                      ) == "sigmoid"
    w.add_u32(f"{a}.expert_gating_func", 2 if sigmoid else 1)
    w.add_bool(f"{a}.expert_weights_norm", bool(cfg.norm_topk_prob))
    w.add_f32(f"{a}.expert_weights_scale", float(cfg.routed_scaling_factor))
    w.add_bool(f"{a}.rope_interleave", bool(getattr(cfg, "rope_interleave", True)))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim >= 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "norm.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        at = hf + "self_attn."
        if getattr(cfg, "q_lora_rank", None):
            add(out + "attn_q_a.weight", sd[at + "q_a_proj.weight"])
            add(out + "attn_q_a_norm.weight", sd[at + "q_a_layernorm.weight"])
            add(out + "attn_q_b.weight", sd[at + "q_b_proj.weight"])
        else:
            add(out + "attn_q.weight", sd[at + "q_proj.weight"])
        add(out + "attn_kv_a_mqa.weight", sd[at + "kv_a_proj_with_mqa.weight"])
        add(out + "attn_kv_a_norm.weight", sd[at + "kv_a_layernorm.weight"])
        add(out + "attn_kv_b.weight", sd[at + "kv_b_proj.weight"])
        add(out + "attn_output.weight", sd[at + "o_proj.weight"])

        if i < cfg.first_k_dense_replace:
            add(out + "ffn_gate.weight", sd[hf + "mlp.gate_proj.weight"])
            add(out + "ffn_up.weight", sd[hf + "mlp.up_proj.weight"])
            add(out + "ffn_down.weight", sd[hf + "mlp.down_proj.weight"])
        else:
            moe = hf + "mlp."
            add(out + "ffn_gate_inp.weight", sd[moe + "gate.weight"], quant=False)
            add(out + "exp_probs_b.bias", sd[moe + "gate.e_score_correction_bias"],
                quant=False)
            E = cfg.n_routed_experts
            gate = np.stack([np_(sd[f"{moe}experts.{e}.gate_proj.weight"]) for e in range(E)])
            up = np.stack([np_(sd[f"{moe}experts.{e}.up_proj.weight"]) for e in range(E)])
            down = np.stack([np_(sd[f"{moe}experts.{e}.down_proj.weight"]) for e in range(E)])
            add(out + "ffn_gate_exps.weight", gate)
            add(out + "ffn_up_exps.weight", up)
            add(out + "ffn_down_exps.weight", down)
            sh = moe + "shared_experts."
            add(out + "ffn_gate_shexp.weight", sd[sh + "gate_proj.weight"])
            add(out + "ffn_up_shexp.weight", sd[sh + "up_proj.weight"])
            add(out + "ffn_down_shexp.weight", sd[sh + "down_proj.weight"])
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
