"""Convert a HuggingFace Jamba checkpoint to GGUF (arch 'jamba' — hybrid
Mamba-v1 + NoPE attention + periodic MoE).  Attention/MoE layer indices
land as jamba.attention.layer_indices / jamba.expert_layer_indices."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "jamba"
    d_inner = cfg.mamba_expand * cfg.hidden_size
    attn_idx = [i for i in range(cfg.num_hidden_layers)
                if i % cfg.attn_layer_period == cfg.attn_layer_offset]
    moe_idx = [i for i in range(cfg.num_hidden_layers)
               if cfg.num_experts > 1
               and i % cfg.expert_layer_period == cfg.expert_layer_offset]
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_array(f"{a}.attention.layer_indices", attn_idx)
    w.add_array(f"{a}.expert_layer_indices", moe_idx)
    w.add_u32(f"{a}.ssm.inner_size", d_inner)
    w.add_u32(f"{a}.ssm.conv_kernel", cfg.mamba_d_conv)
    w.add_u32(f"{a}.ssm.state_size", cfg.mamba_d_state)
    w.add_u32(f"{a}.ssm.time_step_rank", cfg.mamba_dt_rank)
    w.add_u32(f"{a}.expert_count", cfg.num_experts)
    w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    E = cfg.num_experts
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "final_layernorm.weight"])
    if "lm_head.weight" in sd and not getattr(cfg, "tie_word_embeddings", False):
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "pre_ff_layernorm.weight"])
        if i in attn_idx:
            for ours, theirs in (("attn_q", "self_attn.q_proj"),
                                 ("attn_k", "self_attn.k_proj"),
                                 ("attn_v", "self_attn.v_proj"),
                                 ("attn_output", "self_attn.o_proj")):
                add(out + ours + ".weight", sd[hf + theirs + ".weight"])
        else:
            mb = hf + "mamba."
            add(out + "ssm_in.weight", sd[mb + "in_proj.weight"])
            add(out + "ssm_conv1d.weight",
                np_(sd[mb + "conv1d.weight"])[:, 0, :], quant=False)
            if mb + "conv1d.bias" in sd:
                add(out + "ssm_conv1d.bias", sd[mb + "conv1d.bias"], quant=False)
            add(out + "ssm_x.weight", sd[mb + "x_proj.weight"])
            add(out + "ssm_dt.weight", sd[mb + "dt_proj.weight"])
            add(out + "ssm_dt.bias", sd[mb + "dt_proj.bias"], quant=False)
            add(out + "ssm_dt_norm.weight", sd[mb + "dt_layernorm.weight"], quant=False)
            add(out + "ssm_b_norm.weight", sd[mb + "b_layernorm.weight"], quant=False)
            add(out + "ssm_c_norm.weight", sd[mb + "c_layernorm.weight"], quant=False)
            add(out + "ssm_a", sd[mb + "A_log"], quant=False)
            add(out + "ssm_d", sd[mb + "D"], quant=False)
            add(out + "ssm_out.weight", sd[mb + "out_proj.weight"])
        if i in moe_idx:
            add(out + "ffn_gate_inp.weight", sd[hf + "feed_forward.router.weight"])
            for ours, theirs in (("ffn_gate_exps", "gate_proj"),
                                 ("ffn_up_exps", "up_proj"),
                                 ("ffn_down_exps", "down_proj")):
                stacked = np.stack([
                    np_(sd[hf + f"feed_forward.experts.{j}.{theirs}.weight"])
                    for j in range(E)])
                add(out + ours + ".weight", stacked, quant=False)
        else:
            add(out + "ffn_gate.weight", sd[hf + "feed_forward.gate_proj.weight"])
            add(out + "ffn_up.weight", sd[hf + "feed_forward.up_proj.weight"])
            add(out + "ffn_down.weight", sd[hf + "feed_forward.down_proj.weight"])
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
