"""Convert a HuggingFace MiniMax (MiniMax-Text-01) checkpoint to GGUF
(arch 'minimax').  Lightning linear-attention layers land as attn_qkv /
attn_gate / attn_out_norm / attn_output; full-attention layer indices as
minimax.attention.layer_indices; Mixtral-style experts stack into
ffn_*_exps; the six alpha/beta residual factors as minimax.* keys."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "minimax"
    head_dim = getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads
    full_idx = [i for i, t in enumerate(cfg.layer_types) if t == "full_attention"]
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.attention.key_length", head_dim)
    w.add_array(f"{a}.attention.layer_indices", full_idx)
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_u32(f"{a}.expert_count", cfg.num_local_experts)
    w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)
    w.add_f32(f"{a}.full_attn_alpha", float(cfg.full_attn_alpha_factor))
    w.add_f32(f"{a}.full_attn_beta", float(cfg.full_attn_beta_factor))
    w.add_f32(f"{a}.linear_attn_alpha", float(cfg.linear_attn_alpha_factor))
    w.add_f32(f"{a}.linear_attn_beta", float(cfg.linear_attn_beta_factor))
    w.add_f32(f"{a}.mlp_alpha", float(cfg.mlp_alpha_factor))
    w.add_f32(f"{a}.mlp_beta", float(cfg.mlp_beta_factor))
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    E = cfg.num_local_experts
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "norm.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        sa = hf + "self_attn."
        if i in full_idx:
            for ours, theirs in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                                 ("attn_v", "v_proj"), ("attn_output", "o_proj")):
                add(out + ours + ".weight", sd[sa + theirs + ".weight"])
        else:
            add(out + "attn_qkv.weight", sd[sa + "qkv_proj.weight"])
            add(out + "attn_gate.weight", sd[sa + "output_gate.weight"])
            add(out + "attn_output.weight", sd[sa + "out_proj.weight"])
            add(out + "attn_out_norm.weight", sd[sa + "norm.weight"], quant=False)
        moe = hf + "block_sparse_moe."
        add(out + "ffn_gate_inp.weight", sd[moe + "gate.weight"], quant=False)
        gate = np.stack([np_(sd[f"{moe}experts.{e}.w1.weight"]) for e in range(E)])
        up = np.stack([np_(sd[f"{moe}experts.{e}.w3.weight"]) for e in range(E)])
        down = np.stack([np_(sd[f"{moe}experts.{e}.w2.weight"]) for e in range(E)])
        add(out + "ffn_gate_exps.weight", gate, quant=False)
        add(out + "ffn_up_exps.weight", up, quant=False)
        add(out + "ffn_down_exps.weight", down, quant=False)
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
