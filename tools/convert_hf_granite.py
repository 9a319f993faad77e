"""Convert a HuggingFace Granite / GraniteMoE checkpoint to GGUF
(llama.cpp archs 'granite' / 'granitemoe') — the llama layout plus four
fixed scalar multipliers (embedding/residual/attention/logits) and, for
MoE, per-expert fused input_linear (gate|up) split offline into
ffn_gate_exps / ffn_up_exps."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    moe = getattr(cfg, "num_local_experts", 0) > 0 and any(
        "block_sparse_moe" in k for k in sd)
    a = "granitemoe" if moe else "granite"
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add_f32(f"{a}.embedding_scale", float(cfg.embedding_multiplier))
    w.add_f32(f"{a}.residual_scale", float(cfg.residual_multiplier))
    w.add_f32(f"{a}.attention.scale", float(cfg.attention_multiplier))
    w.add_f32(f"{a}.logit_scale", float(cfg.logits_scaling))
    if moe:
        w.add_u32(f"{a}.expert_count", cfg.num_local_experts)
        w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "norm.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["lm_head.weight"])
    F = cfg.intermediate_size
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        for ours, theirs in (("attn_q", "self_attn.q_proj"),
                             ("attn_k", "self_attn.k_proj"),
                             ("attn_v", "self_attn.v_proj"),
                             ("attn_output", "self_attn.o_proj")):
            add(out + ours + ".weight", sd[hf + theirs + ".weight"])
        if moe:
            gu = np_(sd[hf + "block_sparse_moe.input_linear.weight"])  # (E, 2F, D)
            add(out + "ffn_gate_exps.weight", gu[:, :F], quant=False)
            add(out + "ffn_up_exps.weight", gu[:, F:], quant=False)
            add(out + "ffn_down_exps.weight",
                sd[hf + "block_sparse_moe.output_linear.weight"], quant=False)
            add(out + "ffn_gate_inp.weight",
                sd[hf + "block_sparse_moe.router.layer.weight"])
        else:
            add(out + "ffn_gate.weight", sd[hf + "mlp.gate_proj.weight"])
            add(out + "ffn_up.weight", sd[hf + "mlp.up_proj.weight"])
            add(out + "ffn_down.weight", sd[hf + "mlp.down_proj.weight"])
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
