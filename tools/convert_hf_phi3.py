"""Convert a HuggingFace Phi-3 / Phi-3.5 / Phi-4 checkpoint to GGUF
(llama.cpp 'phi3' arch).  The fused qkv_proj and gate_up_proj are split
offline into attn_q/k/v + ffn_gate/ffn_up; LongRoPE per-dim divisors are
stored as rope_factors_long/short.weight tensors (llama.cpp naming)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "phi3"
    head_dim = getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads
    H, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", H)
    w.add_u32(f"{a}.attention.head_count_kv", Hkv)
    w.add_u32(f"{a}.attention.key_length", head_dim)
    w.add_u32(f"{a}.attention.value_length", head_dim)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", getattr(cfg, "rope_theta", 10000.0))
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    if getattr(cfg, "sliding_window", None):
        w.add_u32(f"{a}.attention.sliding_window", cfg.sliding_window)
    rs = getattr(cfg, "rope_scaling", None)
    has_longrope = bool(rs) and rs.get("rope_type", rs.get("type")) == "longrope"
    if has_longrope:
        orig = getattr(cfg, "original_max_position_embeddings",
                       cfg.max_position_embeddings)
        w.add_u32(f"{a}.rope.scaling.original_context_length", orig)
        if rs.get("attention_factor") is not None:
            w.add_f32(f"{a}.rope.scaling.attn_factor", float(rs["attention_factor"]))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "norm.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["lm_head.weight"])
    if has_longrope:
        add("rope_factors_long.weight", np.asarray(rs["long_factor"], np.float32),
            quant=False)
        add("rope_factors_short.weight", np.asarray(rs["short_factor"], np.float32),
            quant=False)
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        qkv = np_(sd[hf + "self_attn.qkv_proj.weight"])  # ((H+2Hkv)*hd, D)
        add(out + "attn_q.weight", qkv[: H * head_dim])
        add(out + "attn_k.weight", qkv[H * head_dim: (H + Hkv) * head_dim])
        add(out + "attn_v.weight", qkv[(H + Hkv) * head_dim:])
        add(out + "attn_output.weight", sd[hf + "self_attn.o_proj.weight"])
        gu = np_(sd[hf + "mlp.gate_up_proj.weight"])  # (2F, D): gate then up
        F = cfg.intermediate_size
        add(out + "ffn_gate.weight", gu[:F])
        add(out + "ffn_up.weight", gu[F:])
        add(out + "ffn_down.weight", sd[hf + "mlp.down_proj.weight"])
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
