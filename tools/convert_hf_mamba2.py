"""Convert a HuggingFace Mamba-2 checkpoint to GGUF (llama.cpp 'mamba2'
arch).  Conv weights land as (conv_dim, d_conv); A is stored as A_log
(negated/exponentiated at load, llama.cpp convention)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "mamba2"
    d_inner = cfg.expand * cfg.hidden_size
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", getattr(cfg, "max_position_embeddings", 2048))
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.ssm.inner_size", d_inner)
    w.add_u32(f"{a}.ssm.conv_kernel", cfg.conv_kernel)
    w.add_u32(f"{a}.ssm.state_size", cfg.state_size)
    w.add_u32(f"{a}.ssm.time_step_rank", cfg.num_heads)
    w.add_u32(f"{a}.ssm.group_count", cfg.n_groups)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.layer_norm_epsilon)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "backbone."
    add("token_embd.weight", sd[p + "embeddings.weight"])
    add("output_norm.weight", sd[p + "norm_f.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "norm.weight"])
        add(out + "ssm_in.weight", sd[hf + "mixer.in_proj.weight"])
        add(out + "ssm_conv1d.weight",
            np_(sd[hf + "mixer.conv1d.weight"])[:, 0, :], quant=False)
        add(out + "ssm_conv1d.bias", sd[hf + "mixer.conv1d.bias"], quant=False)
        add(out + "ssm_dt.bias", sd[hf + "mixer.dt_bias"], quant=False)
        add(out + "ssm_a", sd[hf + "mixer.A_log"], quant=False)
        add(out + "ssm_d", sd[hf + "mixer.D"], quant=False)
        add(out + "ssm_norm.weight", sd[hf + "mixer.norm.weight"], quant=False)
        add(out + "ssm_out.weight", sd[hf + "mixer.out_proj.weight"])
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
