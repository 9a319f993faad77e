"""Convert a HuggingFace RecurrentGemma (Griffin) checkpoint to GGUF.

Arch 'recurrentgemma': RG-LRU recurrent blocks + periodic sliding-window
GQA attention (block pattern recurrent,recurrent,attention), GeGLU MLP
with biases, (1+w) RMSNorms, tied lm head with a final logit softcap.
Attention layer indices land as recurrentgemma.attention.layer_indices.
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "recurrentgemma"
    attn_idx = [i for i, t in enumerate(cfg.layers_block_type) if t == "attention"]
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    # HF keeps the pre-split width; the live GeGLU width is half of it
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size // 2)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.attention.key_length", cfg.head_dim)
    w.add_u32(f"{a}.rope.dimension_count",
              int(cfg.head_dim * getattr(cfg, "partial_rotary_factor", 0.5)))
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_u32(f"{a}.attention.sliding_window", cfg.attention_window_size)
    w.add_array(f"{a}.attention.layer_indices", attn_idx)
    w.add_u32(f"{a}.recurrent.lru_width", cfg.lru_width)
    w.add_u32(f"{a}.recurrent.conv_kernel", cfg.conv1d_width)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add_f32(f"{a}.final_logit_softcapping", cfg.logits_soft_cap)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "final_norm.weight"])
    # lm head is tied (RecurrentGemmaForCausalLM._tied_weights_keys)
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "temporal_pre_norm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "channel_pre_norm.weight"])
        for ours, theirs in (("ffn_gate", "mlp_block.gate_proj"),
                             ("ffn_up", "mlp_block.up_proj"),
                             ("ffn_down", "mlp_block.down_proj")):
            add(out + ours + ".weight", sd[hf + theirs + ".weight"])
            add(out + ours + ".bias", sd[hf + theirs + ".bias"], quant=False)
        tb = hf + "temporal_block."
        if i in attn_idx:
            for ours, theirs in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                                 ("attn_v", "v_proj"), ("attn_output", "o_proj")):
                add(out + ours + ".weight", sd[tb + theirs + ".weight"])
                if tb + theirs + ".bias" in sd:  # o_proj always; q/k/v if attention_bias
                    add(out + ours + ".bias", sd[tb + theirs + ".bias"], quant=False)
        else:
            for ours, theirs in (("rec_y", "linear_y"), ("rec_x", "linear_x"),
                                 ("rec_out", "linear_out")):
                add(out + ours + ".weight", sd[tb + theirs + ".weight"])
                add(out + ours + ".bias", sd[tb + theirs + ".bias"], quant=False)
            # depthwise conv (lru_width, 1, k) -> (lru_width, k)
            add(out + "rec_conv1d.weight", np_(sd[tb + "conv_1d.weight"])[:, 0, :],
                quant=False)
            add(out + "rec_conv1d.bias", sd[tb + "conv_1d.bias"], quant=False)
            lru = tb + "rg_lru."
            add(out + "rglru_a", sd[lru + "recurrent_param"], quant=False)
            # per-head block-diagonal gates, (h, bw, bw) applied as x @ W_h + b_h
            for ours, theirs in (("rglru_in_gate", "input_gate"),
                                 ("rglru_rec_gate", "recurrent_gate")):
                add(out + ours + ".weight", np_(sd[f"{lru}{theirs}_weight"]),
                    quant=False)
                add(out + ours + ".bias", sd[f"{lru}{theirs}_bias"], quant=False)
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
