"""Convert a HuggingFace Whisper checkpoint to GGUF for models/whisper.py.

Tensor naming follows the repo's enc./dec. convention (the whisper.cpp model
layout expressed in GGUF): conv frontend + sinusoidal encoder positions,
biased pre-LN blocks with a bias-free k_proj, learned decoder positions,
tied lm head (proj_out == embed_tokens, omitted).
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    w.add_string("general.architecture", "whisper")
    w.add_u32("whisper.vocab_size", cfg.vocab_size)
    w.add_u32("whisper.embedding_length", cfg.d_model)
    w.add_u32("whisper.encoder.mels_count", cfg.num_mel_bins)
    w.add_u32("whisper.encoder.context_length", cfg.max_source_positions)
    w.add_u32("whisper.encoder.attention.head_count", cfg.encoder_attention_heads)
    w.add_u32("whisper.encoder.block_count", cfg.encoder_layers)
    w.add_u32("whisper.decoder.context_length", cfg.max_target_positions)
    w.add_u32("whisper.decoder.attention.head_count", cfg.decoder_attention_heads)
    w.add_u32("whisper.decoder.block_count", cfg.decoder_layers)
    w.add_f32("whisper.attention.layer_norm_epsilon", 1e-5)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    enc, dec = "model.encoder.", "model.decoder."
    add("enc.conv1.weight", sd[enc + "conv1.weight"], quant=False)
    add("enc.conv1.bias", sd[enc + "conv1.bias"])
    add("enc.conv2.weight", sd[enc + "conv2.weight"], quant=False)
    add("enc.conv2.bias", sd[enc + "conv2.bias"])
    add("enc.position_embd.weight", sd[enc + "embed_positions.weight"], quant=False)
    add("enc.output_norm.weight", sd[enc + "layer_norm.weight"])
    add("enc.output_norm.bias", sd[enc + "layer_norm.bias"])
    add("dec.token_embd.weight", sd[dec + "embed_tokens.weight"])
    add("dec.position_embd.weight", sd[dec + "embed_positions.weight"], quant=False)
    add("dec.output_norm.weight", sd[dec + "layer_norm.weight"])
    add("dec.output_norm.bias", sd[dec + "layer_norm.bias"])

    def attn(dst, src):
        hf = {"q": "q_proj", "k": "k_proj", "v": "v_proj", "output": "out_proj"}
        for n, p in hf.items():
            add(f"{dst}attn_{n}.weight", sd[f"{src}{p}.weight"])
            if n != "k":  # k_proj is bias-free in Whisper
                add(f"{dst}attn_{n}.bias", sd[f"{src}{p}.bias"])

    for i in range(cfg.encoder_layers):
        src = f"{enc}layers.{i}."
        dst = f"enc.blk.{i}."
        attn(dst, src + "self_attn.")
        add(dst + "attn_norm.weight", sd[src + "self_attn_layer_norm.weight"])
        add(dst + "attn_norm.bias", sd[src + "self_attn_layer_norm.bias"])
        add(dst + "ffn_up.weight", sd[src + "fc1.weight"])
        add(dst + "ffn_up.bias", sd[src + "fc1.bias"])
        add(dst + "ffn_down.weight", sd[src + "fc2.weight"])
        add(dst + "ffn_down.bias", sd[src + "fc2.bias"])
        add(dst + "ffn_norm.weight", sd[src + "final_layer_norm.weight"])
        add(dst + "ffn_norm.bias", sd[src + "final_layer_norm.bias"])

    for i in range(cfg.decoder_layers):
        src = f"{dec}layers.{i}."
        dst = f"dec.blk.{i}."
        attn(dst, src + "self_attn.")
        add(dst + "attn_norm.weight", sd[src + "self_attn_layer_norm.weight"])
        add(dst + "attn_norm.bias", sd[src + "self_attn_layer_norm.bias"])
        hf = {"q": "q_proj", "k": "k_proj", "v": "v_proj", "output": "out_proj"}
        for n, p in hf.items():
            add(f"{dst}cross_attn_{n}.weight", sd[f"{src}encoder_attn.{p}.weight"])
            if n != "k":
                add(f"{dst}cross_attn_{n}.bias", sd[f"{src}encoder_attn.{p}.bias"])
        add(dst + "cross_attn_norm.weight", sd[src + "encoder_attn_layer_norm.weight"])
        add(dst + "cross_attn_norm.bias", sd[src + "encoder_attn_layer_norm.bias"])
        add(dst + "ffn_up.weight", sd[src + "fc1.weight"])
        add(dst + "ffn_up.bias", sd[src + "fc1.bias"])
        add(dst + "ffn_down.weight", sd[src + "fc2.weight"])
        add(dst + "ffn_down.bias", sd[src + "fc2.bias"])
        add(dst + "ffn_norm.weight", sd[src + "final_layer_norm.weight"])
        add(dst + "ffn_norm.bias", sd[src + "final_layer_norm.bias"])
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "f16", "q8_0", "q4_k"])
    args = ap.parse_args()
    from transformers import WhisperForConditionalGeneration

    model = WhisperForConditionalGeneration.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "f16": GGMLType.F16, "q8_0": GGMLType.Q8_0,
          "q4_k": GGMLType.Q4_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
