"""Convert a HuggingFace JetMoE checkpoint to GGUF (arch 'jetmoe').

MoA expert stacks land as attn_qexp (E, kv, D) / attn_oexp (E, D, kv)
around the shared attn_kv projection; MoE fused input_linear (E, 2F, D)
splits into ffn_gate_exps / ffn_up_exps; both keep their output biases."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "jetmoe"
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.attention.key_length", cfg.kv_channels)
    w.add_u32(f"{a}.expert_count", cfg.num_local_experts)
    w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    # the HF blocks construct their norms with the module default eps
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "norm.weight"], quant=False)
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", True):
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"], quant=False)
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"],
            quant=False)
        sa = hf + "self_attention."
        add(out + "attn_kv.weight", sd[sa + "kv_proj.weight"])
        add(out + "attn_router.weight", sd[sa + "experts.router.layer.weight"],
            quant=False)
        add(out + "attn_qexp.weight", sd[sa + "experts.input_linear.weight"],
            quant=False)
        add(out + "attn_oexp.weight", sd[sa + "experts.output_linear.weight"],
            quant=False)
        add(out + "attn_moa_bias", sd[sa + "experts.bias"], quant=False)
        ml = hf + "mlp."
        add(out + "ffn_gate_inp.weight", sd[ml + "router.layer.weight"],
            quant=False)
        fused = np_(sd[ml + "input_linear.weight"])  # (E, 2F, D): gate | up
        gate, up = np.split(fused, 2, axis=1)
        add(out + "ffn_gate_exps.weight", gate, quant=False)
        add(out + "ffn_up_exps.weight", up, quant=False)
        add(out + "ffn_down_exps.weight", sd[ml + "output_linear.weight"],
            quant=False)
        add(out + "ffn_bias", sd[ml + "bias"], quant=False)
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
