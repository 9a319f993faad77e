"""Convert a HuggingFace Llama-4 text checkpoint (Llama4ForCausalLM /
the text_config side of Llama4ForConditionalGeneration) to GGUF.

Arch 'llama4': iRoPE — interleaved-pair rope on chunked-attention layers,
NoPE + log-temperature attention scaling on full-attention layers —
optional qk L2 norm, interleaved dense/MoE FFN (sigmoid top-k router,
scores applied to the expert INPUT, always-on shared expert)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "llama4"
    head_dim = getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads
    nope_idx = [i for i, use_rope in enumerate(cfg.no_rope_layers) if not use_rope]
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size_mlp)
    w.add_u32(f"{a}.expert_feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.attention.key_length", head_dim)
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_u32(f"{a}.attention.chunk_size", cfg.attention_chunk_size)
    w.add_array(f"{a}.attention.no_rope_layer_indices", nope_idx)
    w.add_array(f"{a}.expert_layer_indices", list(cfg.moe_layers))
    w.add_u32(f"{a}.expert_count", cfg.num_local_experts)
    w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)
    w.add_bool(f"{a}.attention.use_qk_norm", bool(cfg.use_qk_norm))
    w.add_bool(f"{a}.attention.temperature_tuning",
               bool(getattr(cfg, "attn_temperature_tuning", True)))
    w.add_f32(f"{a}.attention.attn_scale", float(cfg.attn_scale))
    w.add_f32(f"{a}.attention.floor_scale", float(cfg.floor_scale))
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)

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
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        for ours, theirs in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                             ("attn_v", "v_proj"), ("attn_output", "o_proj")):
            add(out + ours + ".weight", sd[hf + "self_attn." + theirs + ".weight"])
        if i in cfg.moe_layers:
            ff = hf + "feed_forward."
            add(out + "ffn_gate_inp.weight", sd[ff + "router.weight"])
            # HF fused (E, D, 2F) gate_up + (E, F, D) down -> llama.cpp
            # (E, F, D) gate/up and (E, D, F) down layouts
            gu = np_(sd[ff + "experts.gate_up_proj"])
            gate, up = np.split(gu, 2, axis=-1)
            add(out + "ffn_gate_exps.weight", gate.transpose(0, 2, 1), quant=False)
            add(out + "ffn_up_exps.weight", up.transpose(0, 2, 1), quant=False)
            add(out + "ffn_down_exps.weight",
                np_(sd[ff + "experts.down_proj"]).transpose(0, 2, 1), quant=False)
            for ours, theirs in (("ffn_gate_shexp", "shared_expert.gate_proj"),
                                 ("ffn_up_shexp", "shared_expert.up_proj"),
                                 ("ffn_down_shexp", "shared_expert.down_proj")):
                add(out + ours + ".weight", sd[ff + theirs + ".weight"])
        else:
            for ours, theirs in (("ffn_gate", "feed_forward.gate_proj"),
                                 ("ffn_up", "feed_forward.up_proj"),
                                 ("ffn_down", "feed_forward.down_proj")):
                add(out + ours + ".weight", sd[hf + theirs + ".weight"])
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
    cfg = model.config
    cfg = getattr(cfg, "text_config", cfg)
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K,
          "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), cfg, ft).write(args.out)
    print("wrote", args.out)
