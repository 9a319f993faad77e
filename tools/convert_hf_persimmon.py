"""Convert a HuggingFace Persimmon checkpoint to GGUF (arch 'persimmon').

HF fuses qkv with per-head interleaving — weight rows are (H, 3, hd)
blocks — de-interleaved here into plain attn_q/attn_k/attn_v."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "persimmon"
    H = cfg.num_attention_heads
    hd = cfg.hidden_size // H
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", H)
    w.add_u32(f"{a}.rope.dimension_count",
              int(hd * getattr(cfg, "partial_rotary_factor", 0.5)))
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_f32(f"{a}.attention.layer_norm_epsilon", cfg.layer_norm_eps)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "final_layernorm.weight"], quant=False)
    add("output_norm.bias", sd[p + "final_layernorm.bias"], quant=False)
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        for ours, theirs in (("attn_norm", "input_layernorm"),
                             ("ffn_norm", "post_attention_layernorm")):
            add(out + ours + ".weight", sd[hf + theirs + ".weight"], quant=False)
            add(out + ours + ".bias", sd[hf + theirs + ".bias"], quant=False)
        sa = hf + "self_attn."
        # de-interleave the fused qkv: rows are (H, 3, hd) blocks
        fw = np_(sd[sa + "query_key_value.weight"]).reshape(H, 3, hd, -1)
        fb = np_(sd[sa + "query_key_value.bias"]).reshape(H, 3, hd)
        for j, name in enumerate(("attn_q", "attn_k", "attn_v")):
            add(out + name + ".weight", fw[:, j].reshape(H * hd, -1))
            add(out + name + ".bias", fb[:, j].reshape(H * hd), quant=False)
        add(out + "attn_output.weight", sd[sa + "dense.weight"])
        add(out + "attn_output.bias", sd[sa + "dense.bias"], quant=False)
        if getattr(cfg, "qk_layernorm", True):
            for ours, theirs in (("attn_q_norm", "q_layernorm"),
                                 ("attn_k_norm", "k_layernorm")):
                add(out + ours + ".weight", sd[sa + theirs + ".weight"], quant=False)
                add(out + ours + ".bias", sd[sa + theirs + ".bias"], quant=False)
        add(out + "ffn_up.weight", sd[hf + "mlp.dense_h_to_4h.weight"])
        add(out + "ffn_up.bias", sd[hf + "mlp.dense_h_to_4h.bias"], quant=False)
        add(out + "ffn_down.weight", sd[hf + "mlp.dense_4h_to_h.weight"])
        add(out + "ffn_down.bias", sd[hf + "mlp.dense_4h_to_h.bias"], quant=False)
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
