"""Convert a HuggingFace T5 checkpoint to GGUF (llama.cpp 't5' arch keys +
tensor names: enc.blk.N.* / dec.blk.N.* stacks, attn_rel_b on block 0,
dec.blk.N.cross_attn_*, enc/dec output_norm; untied lm head as 'output')."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "t5"
    gated = getattr(cfg, "is_gated_act", False) or "gated" in getattr(
        cfg, "feed_forward_proj", "relu")
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", getattr(cfg, "n_positions", 512))
    w.add_u32(f"{a}.embedding_length", cfg.d_model)
    w.add_u32(f"{a}.block_count", cfg.num_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.d_ff)
    w.add_u32(f"{a}.attention.head_count", cfg.num_heads)
    w.add_u32(f"{a}.attention.key_length", cfg.d_kv)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_u32(f"{a}.attention.relative_buckets_count", cfg.relative_attention_num_buckets)
    w.add_u32(f"{a}.attention.relative_max_distance",
              getattr(cfg, "relative_attention_max_distance", 128))
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.layer_norm_epsilon)
    w.add_bool(f"{a}.feed_forward_gated", bool(gated))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr):
        arr = np_(arr).astype(np.float32)
        t = ftype if (arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    add("token_embd.weight", sd["shared.weight"])
    add("enc.output_norm.weight", sd["encoder.final_layer_norm.weight"])
    add("dec.output_norm.weight", sd["decoder.final_layer_norm.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", True):
        add("output.weight", sd["lm_head.weight"])

    add("enc.blk.0.attn_rel_b.weight",
        sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])
    add("dec.blk.0.attn_rel_b.weight",
        sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])

    def ffn(out, hf, gated):
        if gated:
            add(out + "ffn_gate.weight", sd[hf + "wi_0.weight"])
            add(out + "ffn_up.weight", sd[hf + "wi_1.weight"])
        else:
            add(out + "ffn_up.weight", sd[hf + "wi.weight"])
        add(out + "ffn_down.weight", sd[hf + "wo.weight"])

    for i in range(cfg.num_layers):
        hf = f"encoder.block.{i}."
        out = f"enc.blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "layer.0.layer_norm.weight"])
        for n in "qkvo":
            add(out + f"attn_{n}.weight", sd[hf + f"layer.0.SelfAttention.{n}.weight"])
        add(out + "ffn_norm.weight", sd[hf + "layer.1.layer_norm.weight"])
        ffn(out, hf + "layer.1.DenseReluDense.", gated)

        hf = f"decoder.block.{i}."
        out = f"dec.blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "layer.0.layer_norm.weight"])
        for n in "qkvo":
            add(out + f"attn_{n}.weight", sd[hf + f"layer.0.SelfAttention.{n}.weight"])
        add(out + "cross_attn_norm.weight", sd[hf + "layer.1.layer_norm.weight"])
        for n in "qkvo":
            add(out + f"cross_attn_{n}.weight",
                sd[hf + f"layer.1.EncDecAttention.{n}.weight"])
        add(out + "ffn_norm.weight", sd[hf + "layer.2.layer_norm.weight"])
        ffn(out, hf + "layer.2.DenseReluDense.", gated)
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "q8_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import T5ForConditionalGeneration

    model = T5ForConditionalGeneration.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K,
          "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
