"""Convert HuggingFace Qwen2-MoE / Qwen3-MoE checkpoints to GGUF.

llama.cpp archs 'qwen2moe' (qkv biases, sigmoid-gated shared expert, gate
probs NOT renormalized after top-k) and 'qwen3moe' (per-head q/k RMSNorm,
decoupled head_dim, no shared expert, renormalized gates).  Both use the
stacked 3-D _exps expert tensors of the Mixtral layout.
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, arch: str,
                       ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    assert arch in ("qwen2moe", "qwen3moe")
    w = GGUFWriter()
    a = arch
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_u32(f"{a}.expert_count", cfg.num_experts)
    w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)
    w.add_u32(f"{a}.expert_feed_forward_length", cfg.moe_intermediate_size)
    w.add_f32(f"{a}.rope.freq_base", getattr(cfg, "rope_theta", 10000.0))
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    if arch == "qwen2moe":
        w.add_u32(f"{a}.expert_shared_feed_forward_length",
                  cfg.shared_expert_intermediate_size)
    else:
        head_dim = getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads
        w.add_u32(f"{a}.attention.key_length", head_dim)
        w.add_u32(f"{a}.attention.value_length", head_dim)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim >= 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "norm.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        for t, hfp in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                       ("output", "o_proj")):
            add(f"{out}attn_{t}.weight", sd[f"{hf}self_attn.{hfp}.weight"])
            if arch == "qwen2moe" and t != "output":
                add(f"{out}attn_{t}.bias", sd[f"{hf}self_attn.{hfp}.bias"])
        if arch == "qwen3moe":
            add(out + "attn_q_norm.weight", sd[hf + "self_attn.q_norm.weight"])
            add(out + "attn_k_norm.weight", sd[hf + "self_attn.k_norm.weight"])

        moe = hf + "mlp."
        add(out + "ffn_gate_inp.weight", sd[moe + "gate.weight"], quant=False)
        E = cfg.num_experts
        gate = np.stack([np_(sd[f"{moe}experts.{e}.gate_proj.weight"]) for e in range(E)])
        up = np.stack([np_(sd[f"{moe}experts.{e}.up_proj.weight"]) for e in range(E)])
        down = np.stack([np_(sd[f"{moe}experts.{e}.down_proj.weight"]) for e in range(E)])
        add(out + "ffn_gate_exps.weight", gate)
        add(out + "ffn_up_exps.weight", up)
        add(out + "ffn_down_exps.weight", down)
        if arch == "qwen2moe":
            sh = moe + "shared_expert."
            add(out + "ffn_gate_shexp.weight", sd[sh + "gate_proj.weight"])
            add(out + "ffn_up_shexp.weight", sd[sh + "up_proj.weight"])
            add(out + "ffn_down_shexp.weight", sd[sh + "down_proj.weight"])
            add(out + "ffn_gate_inp_shexp.weight",
                sd[moe + "shared_expert_gate.weight"], quant=False)
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "q8_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import AutoConfig, AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(args.model)
    arch = "qwen3moe" if model.config.model_type == "qwen3_moe" else "qwen2moe"
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K,
          "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, arch, ft).write(args.out)
    print("wrote", args.out)
