"""Convert a HuggingFace GraniteMoeHybrid (IBM Granite 4.0) checkpoint to
GGUF (arch 'granitehybrid').  Mamba-2 layers land under the bamba ssm_*
names; attention layer indices as granitehybrid.attention.layer_indices;
the granitemoe fused input_linear expert blobs split into
ffn_gate_exps/ffn_up_exps; the always-on shared MLP as ffn_*_shexp; the
four granite scalar multipliers as the granite.* key analogs."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "granitehybrid"
    d_inner = cfg.mamba_expand * cfg.hidden_size
    attn_idx = [i for i, t in enumerate(cfg.layers_block_type) if t == "attention"]
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.shared_intermediate_size)
    if getattr(cfg, "num_local_experts", 0) > 0:
        w.add_u32(f"{a}.expert_feed_forward_length", cfg.intermediate_size)
        w.add_u32(f"{a}.expert_count", cfg.num_local_experts)
        w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_array(f"{a}.attention.layer_indices", attn_idx)
    w.add_bool(f"{a}.attention.use_rope",
               getattr(cfg, "position_embedding_type", None) == "rope")
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_f32(f"{a}.embedding_scale", float(cfg.embedding_multiplier))
    w.add_f32(f"{a}.residual_scale", float(cfg.residual_multiplier))
    w.add_f32(f"{a}.attention.scale", float(cfg.attention_multiplier))
    w.add_f32(f"{a}.logit_scale", float(cfg.logits_scaling))
    w.add_u32(f"{a}.ssm.inner_size", d_inner)
    w.add_u32(f"{a}.ssm.conv_kernel", cfg.mamba_d_conv)
    w.add_u32(f"{a}.ssm.state_size", cfg.mamba_d_state)
    w.add_u32(f"{a}.ssm.time_step_rank", cfg.mamba_n_heads)
    w.add_u32(f"{a}.ssm.group_count", cfg.mamba_n_groups)
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
        if i in attn_idx:
            for ours, theirs in (("attn_q", "self_attn.q_proj"),
                                 ("attn_k", "self_attn.k_proj"),
                                 ("attn_v", "self_attn.v_proj"),
                                 ("attn_output", "self_attn.o_proj")):
                add(out + ours + ".weight", sd[hf + theirs + ".weight"])
        else:
            add(out + "ssm_in.weight", sd[hf + "mamba.in_proj.weight"])
            add(out + "ssm_conv1d.weight",
                np_(sd[hf + "mamba.conv1d.weight"])[:, 0, :], quant=False)
            add(out + "ssm_conv1d.bias", sd[hf + "mamba.conv1d.bias"], quant=False)
            add(out + "ssm_dt.bias", sd[hf + "mamba.dt_bias"], quant=False)
            add(out + "ssm_a", sd[hf + "mamba.A_log"], quant=False)
            add(out + "ssm_d", sd[hf + "mamba.D"], quant=False)
            add(out + "ssm_norm.weight", sd[hf + "mamba.norm.weight"], quant=False)
            add(out + "ssm_out.weight", sd[hf + "mamba.out_proj.weight"])
        # shared GeGLU MLP: fused (2F, D) input_linear -> gate | up
        shared_in = np_(sd[hf + "shared_mlp.input_linear.weight"])
        g_w, u_w = np.split(shared_in, 2, axis=0)
        add(out + "ffn_gate_shexp.weight", g_w)
        add(out + "ffn_up_shexp.weight", u_w)
        add(out + "ffn_down_shexp.weight", sd[hf + "shared_mlp.output_linear.weight"])
        if getattr(cfg, "num_local_experts", 0) > 0:
            moe = hf + "block_sparse_moe."
            add(out + "ffn_gate_inp.weight", sd[moe + "router.layer.weight"])
            fused = np_(sd[moe + "input_linear.weight"])  # (E, 2F, D)
            gate, up = np.split(fused, 2, axis=1)
            add(out + "ffn_gate_exps.weight", gate, quant=False)
            add(out + "ffn_up_exps.weight", up, quant=False)
            add(out + "ffn_down_exps.weight", sd[moe + "output_linear.weight"],
                quant=False)
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
