"""Convert a HuggingFace Zamba2 checkpoint to GGUF (arch 'zamba2').

The num_mem_blocks shared transformer blocks are stored ONCE under
shared.{b}.* (HF duplicates the tied weights at every hybrid layer);
each hybrid USE keeps its own low-rank adapters and hybrid_proj under
its blk.{i}.*, and every layer keeps bamba-style ssm_* mixer tensors."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "zamba2"
    d_inner = cfg.mamba_expand * cfg.hidden_size
    hybrid_idx = [i for i, t in enumerate(cfg.layers_block_type) if t == "hybrid"]
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_array(f"{a}.hybrid_layer_indices", hybrid_idx)
    w.add_u32(f"{a}.shared_block_count", cfg.num_mem_blocks)
    w.add_u32(f"{a}.adapter_rank", cfg.adapter_rank)
    w.add_bool(f"{a}.attention.qkv_adapter",
               bool(cfg.use_shared_attention_adapter))
    w.add_bool(f"{a}.attention.use_rope", bool(cfg.use_mem_rope))
    w.add_f32(f"{a}.rope.freq_base", float(cfg.rope_theta))
    w.add_u32(f"{a}.ssm.inner_size", d_inner)
    w.add_u32(f"{a}.ssm.conv_kernel", cfg.mamba_d_conv)
    w.add_u32(f"{a}.ssm.state_size", cfg.mamba_d_state)
    w.add_u32(f"{a}.ssm.time_step_rank", cfg.n_mamba_heads)
    w.add_u32(f"{a}.ssm.group_count", cfg.mamba_ngroups)
    w.add_f32(f"{a}.ssm.time_step_min", float(cfg.time_step_min))
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
    add("output_norm.weight", sd[p + "final_layernorm.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["lm_head.weight"])

    # shared blocks, each from its FIRST hybrid use (the copies are tied)
    for b in range(cfg.num_mem_blocks):
        i = hybrid_idx[b]
        st = f"{p}layers.{i}.shared_transformer."
        sp = f"shared.{b}."
        add(sp + "attn_norm.weight", sd[st + "input_layernorm.weight"])
        add(sp + "ffn_norm.weight", sd[st + "pre_ff_layernorm.weight"])
        for ours, theirs in (("attn_q", "self_attn.q_proj"),
                             ("attn_k", "self_attn.k_proj"),
                             ("attn_v", "self_attn.v_proj"),
                             ("attn_output", "self_attn.o_proj")):
            add(sp + ours + ".weight", sd[st + theirs + ".weight"])
        add(sp + "ffn_gate_up.weight", sd[st + "feed_forward.gate_up_proj.weight"])
        add(sp + "ffn_down.weight", sd[st + "feed_forward.down_proj.weight"])

    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        if i in hybrid_idx:
            use = hybrid_idx.index(i)
            st = hf + "shared_transformer."
            add(out + "hybrid_proj.weight", sd[hf + "linear.weight"])
            add(out + "ffn_gate_up_adapter_a.weight",
                sd[f"{st}feed_forward.gate_up_proj_adapter_list.{use}.0.weight"],
                quant=False)
            add(out + "ffn_gate_up_adapter_b.weight",
                sd[f"{st}feed_forward.gate_up_proj_adapter_list.{use}.1.weight"],
                quant=False)
            if cfg.use_shared_attention_adapter:
                for nm in ("q", "k", "v"):
                    add(out + f"attn_{nm}_adapter_a.weight",
                        sd[f"{st}self_attn.linear_{nm}_adapter_list.{use}.0.weight"],
                        quant=False)
                    add(out + f"attn_{nm}_adapter_b.weight",
                        sd[f"{st}self_attn.linear_{nm}_adapter_list.{use}.1.weight"],
                        quant=False)
            mx = hf + "mamba_decoder.mamba."
            ln = hf + "mamba_decoder.input_layernorm.weight"
        else:
            mx = hf + "mamba."
            ln = hf + "input_layernorm.weight"
        add(out + "attn_norm.weight", sd[ln])
        add(out + "ssm_in.weight", sd[mx + "in_proj.weight"])
        add(out + "ssm_conv1d.weight", np_(sd[mx + "conv1d.weight"])[:, 0, :],
            quant=False)
        add(out + "ssm_conv1d.bias", sd[mx + "conv1d.bias"], quant=False)
        add(out + "ssm_dt.bias", sd[mx + "dt_bias"], quant=False)
        add(out + "ssm_a", sd[mx + "A_log"], quant=False)
        add(out + "ssm_d", sd[mx + "D"], quant=False)
        add(out + "ssm_norm.weight", sd[mx + "norm.weight"], quant=False)
        add(out + "ssm_out.weight", sd[mx + "out_proj.weight"])
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
