"""Convert a HuggingFace GPT-NeoX (Pythia) checkpoint to GGUF (llama.cpp
'gptneox' arch keys).  HF fuses q/k/v into query_key_value with rows
interleaved per head ([head, (q|k|v), head_dim]); this de-interleaves into
separate attn_q/k/v tensors."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def _split_qkv(w, n_head: int, head_dim: int):
    """(3*E, ...) fused per-head-interleaved qkv -> (q, k, v) each (E, ...)."""
    parts = w.reshape(n_head, 3, head_dim, *w.shape[1:])
    return tuple(parts[:, j].reshape(n_head * head_dim, *w.shape[1:])
                 for j in range(3))


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "gptneox"
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    n_rot = int(getattr(cfg, "rotary_pct", 1.0) * head_dim)
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_u32(f"{a}.rope.dimension_count", n_rot)
    w.add_f32(f"{a}.rope.freq_base", getattr(cfg, "rope_theta", 10000.0))
    w.add_f32(f"{a}.attention.layer_norm_epsilon", cfg.layer_norm_eps)
    w.add_bool(f"{a}.use_parallel_residual",
               bool(getattr(cfg, "use_parallel_residual", True)))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr):
        arr = np_(arr).astype(np.float32)
        t = ftype if (arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "gpt_neox."
    add("token_embd.weight", sd[p + "embed_in.weight"])
    add("output_norm.weight", sd[p + "final_layer_norm.weight"])
    add("output_norm.bias", sd[p + "final_layer_norm.bias"])
    add("output.weight", sd["embed_out.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "attn_norm.bias", sd[hf + "input_layernorm.bias"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        add(out + "ffn_norm.bias", sd[hf + "post_attention_layernorm.bias"])
        qw, kw, vw = _split_qkv(np_(sd[hf + "attention.query_key_value.weight"]),
                                cfg.num_attention_heads, head_dim)
        qb, kb, vb = _split_qkv(np_(sd[hf + "attention.query_key_value.bias"]),
                                cfg.num_attention_heads, head_dim)
        for ours, wt, bs in (("attn_q", qw, qb), ("attn_k", kw, kb),
                             ("attn_v", vw, vb)):
            add(out + ours + ".weight", wt)
            add(out + ours + ".bias", bs)
        add(out + "attn_output.weight", sd[hf + "attention.dense.weight"])
        add(out + "attn_output.bias", sd[hf + "attention.dense.bias"])
        add(out + "ffn_up.weight", sd[hf + "mlp.dense_h_to_4h.weight"])
        add(out + "ffn_up.bias", sd[hf + "mlp.dense_h_to_4h.bias"])
        add(out + "ffn_down.weight", sd[hf + "mlp.dense_4h_to_h.weight"])
        add(out + "ffn_down.bias", sd[hf + "mlp.dense_4h_to_h.bias"])
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "q8_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import GPTNeoXForCausalLM

    model = GPTNeoXForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K,
          "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
