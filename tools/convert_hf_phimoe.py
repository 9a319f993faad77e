"""Convert a HuggingFace Phi-3.5-MoE checkpoint to GGUF (llama.cpp
'phimoe' arch).  Per-expert w1/w3/w2 stack into
ffn_gate_exps/ffn_up_exps/ffn_down_exps; LongRoPE divisors land as
rope_factors_long/short with explicit long/short mscales."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "phimoe"
    head_dim = getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.attention.key_length", head_dim)
    w.add_u32(f"{a}.expert_count", cfg.num_local_experts)
    w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_f32(f"{a}.attention.layer_norm_epsilon", cfg.rms_norm_eps)
    w.add_f32(f"{a}.router_jitter", float(getattr(cfg, "router_jitter_noise", 0.01)))
    rs = getattr(cfg, "rope_scaling", None)
    has_longrope = bool(rs) and rs.get("rope_type", rs.get("type")) == "longrope"
    if has_longrope:
        w.add_u32(f"{a}.rope.scaling.original_context_length",
                  getattr(cfg, "original_max_position_embeddings",
                          cfg.max_position_embeddings))
        w.add_f32(f"{a}.rope.scaling.long_mscale", float(rs["long_mscale"]))
        w.add_f32(f"{a}.rope.scaling.short_mscale", float(rs["short_mscale"]))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    def add_bias(name, key):
        if key in sd:
            add(name, sd[key], quant=False)

    p = "model."
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "norm.weight"])
    add("output_norm.bias", sd[p + "norm.bias"])
    add("output.weight", sd["lm_head.weight"])
    add_bias("output.bias", "lm_head.bias")
    if has_longrope:
        add("rope_factors_long.weight", np.asarray(rs["long_factor"], np.float32),
            quant=False)
        add("rope_factors_short.weight", np.asarray(rs["short_factor"], np.float32),
            quant=False)
    E = cfg.num_local_experts
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "attn_norm.bias", sd[hf + "input_layernorm.bias"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        add(out + "ffn_norm.bias", sd[hf + "post_attention_layernorm.bias"])
        for ours, theirs in (("attn_q", "self_attn.q_proj"),
                             ("attn_k", "self_attn.k_proj"),
                             ("attn_v", "self_attn.v_proj"),
                             ("attn_output", "self_attn.o_proj")):
            add(out + ours + ".weight", sd[hf + theirs + ".weight"])
            add_bias(out + ours + ".bias", hf + theirs + ".bias")
        add(out + "ffn_gate_inp.weight", sd[hf + "block_sparse_moe.gate.weight"])
        for ours, theirs in (("ffn_gate_exps", "w1"), ("ffn_up_exps", "w3"),
                             ("ffn_down_exps", "w2")):
            stacked = np.stack([
                np_(sd[hf + f"block_sparse_moe.experts.{j}.{theirs}.weight"])
                for j in range(E)])
            add(out + ours + ".weight", stacked, quant=False)
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
