"""Convert a HuggingFace GPT-2 checkpoint (in-memory model or directory) to GGUF.

Analog of examples/gpt-2/convert-ckpt-to-ggml.py in the reference, but writing
the modern GGUF container. HF Conv1D weights are stored (in, out); we normalize
to (out, in) rows so mul_mat(w, x) applies directly.
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    """sd: HF GPT2LMHeadModel state_dict (torch tensors or numpy). cfg: HF config."""
    w = GGUFWriter()
    w.add_string("general.architecture", "gpt2")
    w.add_u32("gpt2.context_length", cfg.n_positions)
    w.add_u32("gpt2.embedding_length", cfg.n_embd)
    w.add_u32("gpt2.attention.head_count", cfg.n_head)
    w.add_u32("gpt2.block_count", cfg.n_layer)
    w.add_u32("gpt2.vocab_size", cfg.vocab_size)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, transpose=False, quant=True):
        arr = np_(arr).astype(np.float32)
        if transpose:
            arr = arr.T.copy()
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    add("token_embd.weight", sd["transformer.wte.weight"])
    add("position_embd.weight", sd["transformer.wpe.weight"])
    add("output_norm.weight", sd["transformer.ln_f.weight"])
    add("output_norm.bias", sd["transformer.ln_f.bias"])
    for i in range(cfg.n_layer):
        hf = f"transformer.h.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "ln_1.weight"])
        add(out + "attn_norm.bias", sd[hf + "ln_1.bias"])
        add(out + "attn_qkv.weight", sd[hf + "attn.c_attn.weight"], transpose=True)
        add(out + "attn_qkv.bias", sd[hf + "attn.c_attn.bias"])
        add(out + "attn_output.weight", sd[hf + "attn.c_proj.weight"], transpose=True)
        add(out + "attn_output.bias", sd[hf + "attn.c_proj.bias"])
        add(out + "ffn_norm.weight", sd[hf + "ln_2.weight"])
        add(out + "ffn_norm.bias", sd[hf + "ln_2.bias"])
        add(out + "ffn_up.weight", sd[hf + "mlp.c_fc.weight"], transpose=True)
        add(out + "ffn_up.bias", sd[hf + "mlp.c_fc.bias"])
        add(out + "ffn_down.weight", sd[hf + "mlp.c_proj.weight"], transpose=True)
        add(out + "ffn_down.bias", sd[hf + "mlp.c_proj.bias"])
    return w


def add_tokenizer(w: GGUFWriter, tokenizer):
    """Store BPE vocab + merges (GGUF tokenizer.ggml.* convention)."""
    vocab = tokenizer.get_vocab()
    tokens = [None] * len(vocab)
    for tok, idx in vocab.items():
        tokens[idx] = tok
    w.add_array("tokenizer.ggml.model", ["gpt2"])
    w.add_array("tokenizer.ggml.tokens", tokens)
    if getattr(tokenizer, "chat_template", None):
        w.add_string("tokenizer.chat_template", tokenizer.chat_template)
    merges = []
    try:
        import json

        state = json.loads(tokenizer.backend_tokenizer.to_str())
        merges = [" ".join(m) if isinstance(m, list) else m for m in state["model"]["merges"]]
    except Exception:
        pass
    if merges:
        w.add_array("tokenizer.ggml.merges", merges)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="HF model dir or name")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "f16", "q8_0", "q4_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer

    model = AutoModelForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "f16": GGMLType.F16, "q8_0": GGMLType.Q8_0, "q4_0": GGMLType.Q4_0,
          "q4_k": GGMLType.Q4_K, "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    w = convert_state_dict(model.state_dict(), model.config, ft)
    try:
        add_tokenizer(w, AutoTokenizer.from_pretrained(args.model))
    except Exception as e:
        print("tokenizer skipped:", e)
    w.write(args.out)
    print("wrote", args.out)
