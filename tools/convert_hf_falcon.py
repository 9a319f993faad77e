"""Convert a HuggingFace Falcon checkpoint to GGUF (llama.cpp 'falcon'
arch keys).  De-interleaves the fused query_key_value layout: 7B
multi-query ([q heads | k | v]), classic per-head interleave, or the 40B
per-kv-group interleave (new_decoder_architecture)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def _split_qkv(w, cfg):
    """fused (rows, E) -> (q (n_head*hd, E), k (kv*hd, E), v (kv*hd, E))."""
    n_head = cfg.num_attention_heads
    hd = cfg.hidden_size // n_head
    if cfg.new_decoder_architecture:  # per-kv-group [q*rep | k | v]
        kv = cfg.num_kv_heads
        rep = n_head // kv
        g = w.reshape(kv, rep + 2, hd, -1)
        q = g[:, :rep].reshape(n_head * hd, -1)
        k = g[:, rep].reshape(kv * hd, -1)
        v = g[:, rep + 1].reshape(kv * hd, -1)
        return q, k, v
    if cfg.multi_query:  # [q heads | k | v], kv = 1
        q = w[: n_head * hd]
        k = w[n_head * hd: (n_head + 1) * hd]
        v = w[(n_head + 1) * hd:]
        return q, k, v
    # classic per-head [q|k|v] interleave (like neox)
    g = w.reshape(n_head, 3, hd, -1)
    return tuple(g[:, j].reshape(n_head * hd, -1) for j in range(3))


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    if getattr(cfg, "alibi", False):
        raise ValueError("falcon converter supports rope models, not alibi")
    if not getattr(cfg, "parallel_attn", True):
        raise ValueError("falcon converter expects parallel_attn=True")
    w = GGUFWriter()
    a = "falcon"
    n_head = cfg.num_attention_heads
    if cfg.new_decoder_architecture:
        kv = cfg.num_kv_heads
    else:
        kv = 1 if cfg.multi_query else n_head
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", getattr(cfg, "max_position_embeddings", 2048))
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.attention.head_count", n_head)
    w.add_u32(f"{a}.attention.head_count_kv", kv)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", getattr(cfg, "rope_theta", 10000.0))
    w.add_f32(f"{a}.attention.layer_norm_epsilon", cfg.layer_norm_epsilon)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr):
        arr = np_(arr).astype(np.float32)
        t = ftype if (arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "transformer."
    add("token_embd.weight", sd[p + "word_embeddings.weight"])
    add("output_norm.weight", sd[p + "ln_f.weight"])
    add("output_norm.bias", sd[p + "ln_f.bias"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}h.{i}."
        out = f"blk.{i}."
        if cfg.new_decoder_architecture:
            add(out + "attn_norm.weight", sd[hf + "ln_attn.weight"])
            add(out + "attn_norm.bias", sd[hf + "ln_attn.bias"])
            add(out + "attn_norm_2.weight", sd[hf + "ln_mlp.weight"])
            add(out + "attn_norm_2.bias", sd[hf + "ln_mlp.bias"])
        else:
            add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
            add(out + "attn_norm.bias", sd[hf + "input_layernorm.bias"])
        qw, kw, vw = _split_qkv(np_(sd[hf + "self_attention.query_key_value.weight"]), cfg)
        add(out + "attn_q.weight", qw)
        add(out + "attn_k.weight", kw)
        add(out + "attn_v.weight", vw)
        add(out + "attn_output.weight", sd[hf + "self_attention.dense.weight"])
        add(out + "ffn_up.weight", sd[hf + "mlp.dense_h_to_4h.weight"])
        add(out + "ffn_down.weight", sd[hf + "mlp.dense_4h_to_h.weight"])
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "q8_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import FalconForCausalLM

    model = FalconForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K,
          "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
