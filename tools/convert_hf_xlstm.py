"""Convert a HuggingFace xLSTM checkpoint (NX-AI xLSTM-7B, weight_mode
'single') to GGUF (arch 'xlstm')."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "xlstm"
    qk_dim = int(cfg.hidden_size * cfg.qk_dim_factor)
    v_dim = int(cfg.hidden_size * cfg.v_dim_factor)
    n_ff = sd["backbone.blocks.0.ffn.proj_up.weight"].shape[0]
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", getattr(cfg, "max_position_embeddings", 8192) or 8192)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_blocks)
    w.add_u32(f"{a}.feed_forward_length", n_ff)
    w.add_u32(f"{a}.attention.head_count", cfg.num_heads)
    w.add_u32(f"{a}.qk_dim", qk_dim)
    w.add_u32(f"{a}.v_dim", v_dim)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_epsilon", cfg.norm_eps)
    w.add_f32(f"{a}.gate_softcap", float(cfg.gate_soft_cap))
    w.add_f32(f"{a}.output_softcap", float(cfg.output_logit_soft_cap))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    def add_opt(name, key):
        if key in sd:
            add(name, sd[key], quant=False)

    p = "backbone."
    add("token_embd.weight", sd[p + "embeddings.weight"])
    add("output_norm.weight", sd[p + "out_norm.weight"], quant=False)
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_blocks):
        hf = f"{p}blocks.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "norm_mlstm.weight"], quant=False)
        add(out + "ffn_norm.weight", sd[hf + "norm_ffn.weight"], quant=False)
        ml = hf + "mlstm_layer."
        for ours, theirs in (("xlstm_q", "q"), ("xlstm_k", "k"),
                             ("xlstm_v", "v"), ("xlstm_ogate", "ogate_preact"),
                             ("xlstm_igate", "igate_preact"),
                             ("xlstm_fgate", "fgate_preact"),
                             ("xlstm_out", "out_proj")):
            add(out + ours + ".weight", sd[ml + theirs + ".weight"])
            add_opt(out + ours + ".bias", ml + theirs + ".bias")
        add(out + "xlstm_mh_norm.weight", sd[ml + "multihead_norm.weight"],
            quant=False)
        for ours, theirs in (("ffn_gate", "proj_up_gate"),
                             ("ffn_up", "proj_up"), ("ffn_down", "proj_down")):
            add(out + ours + ".weight", sd[hf + "ffn." + theirs + ".weight"])
            add_opt(out + ours + ".bias", hf + "ffn." + theirs + ".bias")
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
