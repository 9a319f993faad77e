"""Convert a HuggingFace GPT-J checkpoint to GGUF.

Analog of examples/gpt-j/convert-h5-to-ggml.py in the reference, writing the
modern GGUF container. HF GPTJ Linear weights are already (out, in) rows.
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    """sd: HF GPTJForCausalLM state_dict. cfg: HF GPTJConfig."""
    w = GGUFWriter()
    w.add_string("general.architecture", "gptj")
    w.add_u32("gptj.context_length", cfg.n_positions)
    w.add_u32("gptj.embedding_length", cfg.n_embd)
    w.add_u32("gptj.attention.head_count", cfg.n_head)
    w.add_u32("gptj.block_count", cfg.n_layer)
    w.add_u32("gptj.vocab_size", cfg.vocab_size)
    w.add_u32("gptj.rope.dimension_count", cfg.rotary_dim)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    add("token_embd.weight", sd["transformer.wte.weight"])
    add("output_norm.weight", sd["transformer.ln_f.weight"])
    add("output_norm.bias", sd["transformer.ln_f.bias"])
    add("output.weight", sd["lm_head.weight"])
    add("output.bias", sd["lm_head.bias"])
    for i in range(cfg.n_layer):
        hf = f"transformer.h.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "ln_1.weight"])
        add(out + "attn_norm.bias", sd[hf + "ln_1.bias"])
        add(out + "attn_q.weight", sd[hf + "attn.q_proj.weight"])
        add(out + "attn_k.weight", sd[hf + "attn.k_proj.weight"])
        add(out + "attn_v.weight", sd[hf + "attn.v_proj.weight"])
        add(out + "attn_output.weight", sd[hf + "attn.out_proj.weight"])
        add(out + "ffn_up.weight", sd[hf + "mlp.fc_in.weight"])
        add(out + "ffn_up.bias", sd[hf + "mlp.fc_in.bias"])
        add(out + "ffn_down.weight", sd[hf + "mlp.fc_out.weight"])
        add(out + "ffn_down.bias", sd[hf + "mlp.fc_out.bias"])
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="HF model dir or name")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "f16", "q8_0", "q4_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "f16": GGMLType.F16, "q8_0": GGMLType.Q8_0, "q4_0": GGMLType.Q4_0,
          "q4_k": GGMLType.Q4_K, "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    w = convert_state_dict(model.state_dict(), model.config, ft)
    w.write(args.out)
    print("wrote", args.out)
