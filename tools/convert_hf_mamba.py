"""Convert a HuggingFace Mamba or FalconMamba checkpoint to GGUF
(llama.cpp 'mamba' keys: ssm_in / ssm_conv1d / ssm_x / ssm_dt / ssm_a /
ssm_d / ssm_out).  FalconMamba configs (mixer_rms_eps attribute) land as
arch 'falcon_mamba' with the ssm.mixer_rms_eps key — same tensor map."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    d_inner = cfg.intermediate_size if getattr(cfg, "intermediate_size", None) else cfg.expand * cfg.hidden_size
    dt_rank = cfg.time_step_rank
    a = "falcon_mamba" if getattr(cfg, "mixer_rms_eps", None) else "mamba"
    w.add_string("general.architecture", a)
    if a == "falcon_mamba":
        w.add_f32(f"{a}.ssm.mixer_rms_eps", float(cfg.mixer_rms_eps))
    w.add_u32(f"{a}.context_length", getattr(cfg, "max_position_embeddings", 2048) or 2048)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_u32(f"{a}.ssm.conv_kernel", cfg.conv_kernel)
    w.add_u32(f"{a}.ssm.inner_size", d_inner)
    w.add_u32(f"{a}.ssm.state_size", cfg.state_size)
    w.add_u32(f"{a}.ssm.time_step_rank", dt_rank)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", getattr(cfg, "layer_norm_epsilon", 1e-5))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    add("token_embd.weight", sd["backbone.embeddings.weight"])
    add("output_norm.weight", sd["backbone.norm_f.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", True):
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"backbone.layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "norm.weight"])
        add(out + "ssm_in.weight", sd[hf + "mixer.in_proj.weight"])
        # HF depthwise conv (d_inner, 1, d_conv) -> (d_inner, d_conv)
        add(out + "ssm_conv1d.weight", np_(sd[hf + "mixer.conv1d.weight"])[:, 0, :])
        add(out + "ssm_conv1d.bias", sd[hf + "mixer.conv1d.bias"])
        add(out + "ssm_x.weight", sd[hf + "mixer.x_proj.weight"])
        add(out + "ssm_dt.weight", sd[hf + "mixer.dt_proj.weight"])
        add(out + "ssm_dt.bias", sd[hf + "mixer.dt_proj.bias"])
        add(out + "ssm_a", sd[hf + "mixer.A_log"], quant=False)
        add(out + "ssm_d", sd[hf + "mixer.D"])
        add(out + "ssm_out.weight", sd[hf + "mixer.out_proj.weight"])
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32",
                    choices=["f32", "f16", "q8_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "f16": GGMLType.F16, "q8_0": GGMLType.Q8_0,
          "q4_k": GGMLType.Q4_K, "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
