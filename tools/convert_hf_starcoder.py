"""Convert a HuggingFace GPTBigCode (StarCoder/SantaCoder) checkpoint to
GGUF (llama.cpp 'starcoder' arch).  The fused c_attn is (q all heads | k |
v) with k/v at kv_heads width (1 head under multi_query); it is split
offline into attn_q/k/v."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "starcoder"
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    hd = D // H
    kvh = 1 if cfg.multi_query else H
    n_ff = cfg.n_inner if getattr(cfg, "n_inner", None) else 4 * D
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", D)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", n_ff)
    w.add_u32(f"{a}.attention.head_count", H)
    w.add_u32(f"{a}.attention.head_count_kv", kvh)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_epsilon", cfg.layer_norm_epsilon)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    add("token_embd.weight", sd[p + "wte.weight"])
    add("position_embd.weight", sd[p + "wpe.weight"], quant=False)
    add("output_norm.weight", sd[p + "ln_f.weight"])
    add("output_norm.bias", sd[p + "ln_f.bias"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}h.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "ln_1.weight"])
        add(out + "attn_norm.bias", sd[hf + "ln_1.bias"])
        qkv = np_(sd[hf + "attn.c_attn.weight"])
        qkvb = np_(sd[hf + "attn.c_attn.bias"])
        if cfg.multi_query:
            # (q all heads | k | v), k/v one head wide
            add(out + "attn_q.weight", qkv[:D])
            add(out + "attn_q.bias", qkvb[:D])
            add(out + "attn_k.weight", qkv[D: D + kvh * hd])
            add(out + "attn_k.bias", qkvb[D: D + kvh * hd])
            add(out + "attn_v.weight", qkv[D + kvh * hd:])
            add(out + "attn_v.bias", qkvb[D + kvh * hd:])
        else:
            # per-head (q,k,v) interleave: view (H, 3*hd) then split
            qkv = qkv.reshape(H, 3, hd, D)
            qkvb = qkvb.reshape(H, 3, hd)
            for j, nm in enumerate(("q", "k", "v")):
                add(out + f"attn_{nm}.weight", qkv[:, j].reshape(H * hd, D))
                add(out + f"attn_{nm}.bias", qkvb[:, j].reshape(H * hd))
        add(out + "attn_output.weight", sd[hf + "attn.c_proj.weight"])
        add(out + "attn_output.bias", sd[hf + "attn.c_proj.bias"])
        add(out + "ffn_norm.weight", sd[hf + "ln_2.weight"])
        add(out + "ffn_norm.bias", sd[hf + "ln_2.bias"])
        add(out + "ffn_up.weight", sd[hf + "mlp.c_fc.weight"])
        add(out + "ffn_up.bias", sd[hf + "mlp.c_fc.bias"])
        add(out + "ffn_down.weight", sd[hf + "mlp.c_proj.weight"])
        add(out + "ffn_down.bias", sd[hf + "mlp.c_proj.bias"])
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
