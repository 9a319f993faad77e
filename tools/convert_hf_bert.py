"""Convert a HuggingFace BERT checkpoint to GGUF (llama.cpp 'bert' arch
keys + tensor names: token_embd / token_types / position_embd /
token_embd_norm, per block attn_q/k/v + attn_output + attn_output_norm +
ffn_up/ffn_down + layer_output_norm, optional pooler)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32,
                       pooling: str = "mean") -> GGUFWriter:
    w = GGUFWriter()
    a = "bert"
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_u32(f"{a}.token_type_count", getattr(cfg, "type_vocab_size", 2))
    w.add_f32(f"{a}.attention.layer_norm_epsilon", cfg.layer_norm_eps)
    w.add_string(f"{a}.pooling_type", pooling)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr):
        arr = np_(arr).astype(np.float32)
        t = ftype if (arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    # BertModel state dicts are unprefixed; Bert*Model heads prefix "bert."
    _p = "" if "embeddings.word_embeddings.weight" in sd else "bert."

    def key(k):
        return _p + k

    add("token_embd.weight", sd[key("embeddings.word_embeddings.weight")])
    add("position_embd.weight", sd[key("embeddings.position_embeddings.weight")])
    add("token_types.weight", sd[key("embeddings.token_type_embeddings.weight")])
    add("token_embd_norm.weight", sd[key("embeddings.LayerNorm.weight")])
    add("token_embd_norm.bias", sd[key("embeddings.LayerNorm.bias")])
    if key("pooler.dense.weight") in sd:
        add("pooler.weight", sd[key("pooler.dense.weight")])
        add("pooler.bias", sd[key("pooler.dense.bias")])
    for i in range(cfg.num_hidden_layers):
        hf = key(f"encoder.layer.{i}.")
        out = f"blk.{i}."
        for ours, theirs in (("attn_q", "attention.self.query"),
                             ("attn_k", "attention.self.key"),
                             ("attn_v", "attention.self.value"),
                             ("attn_output", "attention.output.dense"),
                             ("ffn_up", "intermediate.dense"),
                             ("ffn_down", "output.dense")):
            add(out + ours + ".weight", sd[hf + theirs + ".weight"])
            add(out + ours + ".bias", sd[hf + theirs + ".bias"])
        add(out + "attn_output_norm.weight", sd[hf + "attention.output.LayerNorm.weight"])
        add(out + "attn_output_norm.bias", sd[hf + "attention.output.LayerNorm.bias"])
        add(out + "layer_output_norm.weight", sd[hf + "output.LayerNorm.weight"])
        add(out + "layer_output_norm.bias", sd[hf + "output.LayerNorm.bias"])
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "q8_0", "q4_k", "q5_k", "q6_k"])
    ap.add_argument("--pooling", default="mean", choices=["mean", "cls", "pooler"])
    args = ap.parse_args()
    from transformers import BertModel

    model = BertModel.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K,
          "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft,
                       pooling=args.pooling).write(args.out)
    print("wrote", args.out)
