"""Convert a HuggingFace DBRX checkpoint to GGUF (llama.cpp 'dbrx' arch).
Fused Wqkv is split; the stacked expert blobs w1/v1/w2 (each
(E*F, D)) land as ffn_gate_exps/ffn_up_exps (E,F,D) and ffn_down_exps
(E,D,F) — w2 is applied as h @ w2 in HF, so each expert chunk transposes."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "dbrx"
    D = cfg.d_model
    H = cfg.n_heads
    hd = D // H
    kvh = cfg.attn_config.kv_n_heads
    F = cfg.ffn_config.ffn_hidden_size
    E = cfg.ffn_config.moe_num_experts
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_seq_len)
    w.add_u32(f"{a}.embedding_length", D)
    w.add_u32(f"{a}.block_count", cfg.n_layers)
    w.add_u32(f"{a}.feed_forward_length", F)
    w.add_u32(f"{a}.attention.head_count", H)
    w.add_u32(f"{a}.attention.head_count_kv", kvh)
    w.add_u32(f"{a}.expert_count", E)
    w.add_u32(f"{a}.expert_used_count", cfg.ffn_config.moe_top_k)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", cfg.attn_config.rope_theta)
    w.add_f32(f"{a}.attention.layer_norm_epsilon", 1e-5)
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
    if "lm_head.weight" in sd:
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.n_layers):
        hf = f"{p}blocks.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "norm_attn_norm.norm_1.weight"])
        add(out + "ffn_norm.weight", sd[hf + "norm_attn_norm.norm_2.weight"])
        qkv = np_(sd[hf + "norm_attn_norm.attn.Wqkv.weight"])  # (D+2*kvh*hd, D)
        add(out + "attn_q.weight", qkv[:D])
        add(out + "attn_k.weight", qkv[D: D + kvh * hd])
        add(out + "attn_v.weight", qkv[D + kvh * hd:])
        add(out + "attn_output.weight", sd[hf + "norm_attn_norm.attn.out_proj.weight"])
        add(out + "ffn_gate_inp.weight", sd[hf + "ffn.router.layer.weight"])
        w1 = np_(sd[hf + "ffn.experts.mlp.w1"]).reshape(E, F, D)
        v1 = np_(sd[hf + "ffn.experts.mlp.v1"]).reshape(E, F, D)
        w2 = np_(sd[hf + "ffn.experts.mlp.w2"]).reshape(E, F, D)
        add(out + "ffn_gate_exps.weight", w1, quant=False)
        add(out + "ffn_up_exps.weight", v1, quant=False)
        add(out + "ffn_down_exps.weight", w2.transpose(0, 2, 1), quant=False)
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
