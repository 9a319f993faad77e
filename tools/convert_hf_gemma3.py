"""Convert a HuggingFace Gemma-3 (text) checkpoint to GGUF (llama.cpp
'gemma3' arch: gemma2's norm-sandwich layers + per-head q/k RMSNorm, 5:1
sliding/global layer pattern, dual rope bases (local 10k / global 1M with
linear scaling on global layers), and NO logit softcapping)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "gemma3"
    head_dim = getattr(cfg, "head_dim", cfg.hidden_size // cfg.num_attention_heads)
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.attention.key_length", head_dim)
    w.add_u32(f"{a}.attention.value_length", head_dim)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add_f32(f"{a}.rope.freq_base", getattr(cfg, "rope_theta", 1000000.0))
    w.add_f32(f"{a}.rope.local_freq_base", getattr(cfg, "rope_local_base_freq", 10000.0))
    rs = getattr(cfg, "rope_scaling", None)
    if rs:
        w.add_string(f"{a}.rope.scaling.type", "linear")
        w.add_f32(f"{a}.rope.scaling.factor", float(rs.get("factor", 1.0)))
    w.add_u32(f"{a}.attention.sliding_window", cfg.sliding_window)
    # every Nth layer is global; HF encodes this via cfg.layer_types
    pattern = getattr(cfg, "sliding_window_pattern", None)
    if pattern is None:
        lt = list(getattr(cfg, "layer_types", []) or [])
        pattern = (lt.index("full_attention") + 1) if "full_attention" in lt else 6
    w.add_u32(f"{a}.attention.sliding_window_pattern", pattern)
    w.add_f32(f"{a}.attention.query_pre_attn_scalar", cfg.query_pre_attn_scalar)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr):
        arr = np_(arr).astype(np.float32)
        t = ftype if (arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "norm.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "attn_post_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "pre_feedforward_layernorm.weight"])
        add(out + "ffn_post_norm.weight", sd[hf + "post_feedforward_layernorm.weight"])
        add(out + "attn_q.weight", sd[hf + "self_attn.q_proj.weight"])
        add(out + "attn_k.weight", sd[hf + "self_attn.k_proj.weight"])
        add(out + "attn_v.weight", sd[hf + "self_attn.v_proj.weight"])
        add(out + "attn_output.weight", sd[hf + "self_attn.o_proj.weight"])
        add(out + "attn_q_norm.weight", sd[hf + "self_attn.q_norm.weight"])
        add(out + "attn_k_norm.weight", sd[hf + "self_attn.k_norm.weight"])
        add(out + "ffn_gate.weight", sd[hf + "mlp.gate_proj.weight"])
        add(out + "ffn_up.weight", sd[hf + "mlp.up_proj.weight"])
        add(out + "ffn_down.weight", sd[hf + "mlp.down_proj.weight"])
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "q8_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import Gemma3ForCausalLM

    model = Gemma3ForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K,
          "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
