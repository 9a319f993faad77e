"""Convert a HuggingFace MPT checkpoint to GGUF (llama.cpp 'mpt' arch).
The fused Wqkv is a straight (q|k|v) concat, split offline into
attn_q/k/v; clip_qkv lands as mpt.attention.clamp_kqv."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "mpt"
    D = cfg.hidden_size
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_seq_len)
    w.add_u32(f"{a}.embedding_length", D)
    w.add_u32(f"{a}.block_count", cfg.n_layers)
    w.add_u32(f"{a}.feed_forward_length", 4 * D)
    w.add_u32(f"{a}.attention.head_count", cfg.n_heads)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_epsilon", cfg.layer_norm_epsilon)
    w.add_f32(f"{a}.attention.max_alibi_bias",
              float(getattr(cfg.attn_config, "alibi_bias_max", 8)))
    if getattr(cfg.attn_config, "clip_qkv", None):
        w.add_f32(f"{a}.attention.clamp_kqv", float(cfg.attn_config.clip_qkv))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    add("token_embd.weight", sd[p + "wte.weight"])
    add("output_norm.weight", sd[p + "norm_f.weight"])
    for i in range(cfg.n_layers):
        hf = f"{p}blocks.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "norm_1.weight"])
        qkv = np_(sd[hf + "attn.Wqkv.weight"])  # (3D, D) straight concat
        add(out + "attn_q.weight", qkv[:D])
        add(out + "attn_k.weight", qkv[D:2 * D])
        add(out + "attn_v.weight", qkv[2 * D:])
        add(out + "attn_output.weight", sd[hf + "attn.out_proj.weight"])
        add(out + "ffn_norm.weight", sd[hf + "norm_2.weight"])
        add(out + "ffn_up.weight", sd[hf + "ffn.up_proj.weight"])
        add(out + "ffn_down.weight", sd[hf + "ffn.down_proj.weight"])
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
