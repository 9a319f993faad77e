"""Convert a HuggingFace RWKV-4 checkpoint to GGUF (arch 'rwkv').

Time-mixing lands as rwkv_time_decay / rwkv_time_first / rwkv_mix_{k,v,r}
/ rwkv_{key,value,receptance,output}; channel mixing as rwkv_ffn_*; the
layer-0 pre-LayerNorm as blk.0.pre_norm.  Weights are stored UNRESCALED
(the HF rescale_every fp16 trick is an exact no-op in real arithmetic)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "rwkv"
    n_attn = cfg.attention_hidden_size or cfg.hidden_size
    n_ff = cfg.intermediate_size or 4 * cfg.hidden_size
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.context_length)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", n_ff)
    w.add_u32(f"{a}.attention_hidden_size", n_attn)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_epsilon", cfg.layer_norm_epsilon)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "rwkv."
    add("token_embd.weight", sd[p + "embeddings.weight"])
    add("output_norm.weight", sd[p + "ln_out.weight"], quant=False)
    add("output_norm.bias", sd[p + "ln_out.bias"], quant=False)
    if "head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}blocks.{i}."
        out = f"blk.{i}."
        if i == 0:
            add(out + "pre_norm.weight", sd[hf + "pre_ln.weight"], quant=False)
            add(out + "pre_norm.bias", sd[hf + "pre_ln.bias"], quant=False)
        for ours, theirs in (("attn_norm", "ln1"), ("ffn_norm", "ln2")):
            add(out + ours + ".weight", sd[hf + theirs + ".weight"], quant=False)
            add(out + ours + ".bias", sd[hf + theirs + ".bias"], quant=False)
        at = hf + "attention."
        add(out + "rwkv_time_decay", sd[at + "time_decay"], quant=False)
        add(out + "rwkv_time_first", sd[at + "time_first"], quant=False)
        for ours, theirs in (("rwkv_mix_k", "time_mix_key"),
                             ("rwkv_mix_v", "time_mix_value"),
                             ("rwkv_mix_r", "time_mix_receptance")):
            add(out + ours, np_(sd[at + theirs]).reshape(-1), quant=False)
        for ours, theirs in (("rwkv_key", "key"), ("rwkv_value", "value"),
                             ("rwkv_receptance", "receptance"),
                             ("rwkv_output", "output")):
            add(out + ours + ".weight", sd[at + theirs + ".weight"])
        ff = hf + "feed_forward."
        for ours, theirs in (("rwkv_ffn_mix_k", "time_mix_key"),
                             ("rwkv_ffn_mix_r", "time_mix_receptance")):
            add(out + ours, np_(sd[ff + theirs]).reshape(-1), quant=False)
        for ours, theirs in (("rwkv_ffn_key", "key"),
                             ("rwkv_ffn_receptance", "receptance"),
                             ("rwkv_ffn_value", "value")):
            add(out + ours + ".weight", sd[ff + theirs + ".weight"])
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
