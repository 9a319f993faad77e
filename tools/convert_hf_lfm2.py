"""Convert a HuggingFace LFM2 (Liquid Foundation Model 2) checkpoint to
GGUF (llama.cpp arch 'lfm2' — gated short-conv layers + periodic GQA
attention with per-head q/k RMSNorm).  Attention layer indices land as
lfm2.attention.layer_indices."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "lfm2"
    attn_idx = [i for i, t in enumerate(cfg.layer_types) if t == "full_attention"]
    head_dim = getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    # the live SwiGLU width (block_auto_adjust_ff_dim folds into the weights)
    w.add_u32(f"{a}.feed_forward_length", sd["model.layers.0.feed_forward.w1.weight"].shape[0])
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.attention.key_length", head_dim)
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_array(f"{a}.attention.layer_indices", attn_idx)
    w.add_u32(f"{a}.shortconv.l_cache", cfg.conv_L_cache)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.norm_eps)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "embedding_norm.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", True):
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "operator_norm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "ffn_norm.weight"])
        for ours, theirs in (("ffn_gate", "feed_forward.w1"),
                             ("ffn_up", "feed_forward.w3"),
                             ("ffn_down", "feed_forward.w2")):
            add(out + ours + ".weight", sd[hf + theirs + ".weight"])
        if i in attn_idx:
            sa = hf + "self_attn."
            for ours, theirs in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                                 ("attn_v", "v_proj"), ("attn_output", "out_proj")):
                add(out + ours + ".weight", sd[sa + theirs + ".weight"])
            add(out + "attn_q_norm.weight", sd[sa + "q_layernorm.weight"], quant=False)
            add(out + "attn_k_norm.weight", sd[sa + "k_layernorm.weight"], quant=False)
        else:
            cv = hf + "conv."
            add(out + "shortconv_in.weight", sd[cv + "in_proj.weight"])
            add(out + "shortconv_out.weight", sd[cv + "out_proj.weight"])
            # depthwise conv (n_embd, 1, L) -> (n_embd, L)
            add(out + "shortconv_conv.weight", np_(sd[cv + "conv.weight"])[:, 0, :],
                quant=False)
            for ours, theirs in (("shortconv_in.bias", "in_proj.bias"),
                                 ("shortconv_out.bias", "out_proj.bias"),
                                 ("shortconv_conv.bias", "conv.bias")):
                if cv + theirs in sd:  # conv_bias=True checkpoints
                    add(out + ours, sd[cv + theirs], quant=False)
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
