"""Convert a HuggingFace BLOOM checkpoint to GGUF (llama.cpp 'bloom' arch).
The fused query_key_value uses a PER-HEAD (q,k,v) interleave — (H, 3, hd, D)
— which is de-interleaved offline into attn_q/k/v."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "bloom"
    H = cfg.n_head
    D = cfg.hidden_size
    hd = D // H
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", getattr(cfg, "seq_length", 2048))
    w.add_u32(f"{a}.embedding_length", D)
    w.add_u32(f"{a}.block_count", cfg.n_layer)
    w.add_u32(f"{a}.feed_forward_length", 4 * D)
    w.add_u32(f"{a}.attention.head_count", H)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_epsilon", cfg.layer_norm_epsilon)
    w.add_f32(f"{a}.attention.max_alibi_bias", 8.0)
    if getattr(cfg, "apply_residual_connection_post_layernorm", False):
        raise SystemExit("apply_residual_connection_post_layernorm is unsupported")

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    # some checkpoints prefix everything with "transformer."
    p = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    add("token_embd.weight", sd[p + "word_embeddings.weight"])
    add("token_embd_norm.weight", sd[p + "word_embeddings_layernorm.weight"])
    add("token_embd_norm.bias", sd[p + "word_embeddings_layernorm.bias"])
    add("output_norm.weight", sd[p + "ln_f.weight"])
    add("output_norm.bias", sd[p + "ln_f.bias"])
    for i in range(cfg.n_layer):
        hf = f"{p}h.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "attn_norm.bias", sd[hf + "input_layernorm.bias"])
        qkv = np_(sd[hf + "self_attention.query_key_value.weight"]).reshape(H, 3, hd, D)
        qkvb = np_(sd[hf + "self_attention.query_key_value.bias"]).reshape(H, 3, hd)
        for j, nm in enumerate(("q", "k", "v")):
            add(out + f"attn_{nm}.weight", qkv[:, j].reshape(H * hd, D))
            add(out + f"attn_{nm}.bias", qkvb[:, j].reshape(H * hd))
        add(out + "attn_output.weight", sd[hf + "self_attention.dense.weight"])
        add(out + "attn_output.bias", sd[hf + "self_attention.dense.bias"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        add(out + "ffn_norm.bias", sd[hf + "post_attention_layernorm.bias"])
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
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K,
          "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
