"""Convert a HuggingFace Qwen3-Next checkpoint to GGUF (arch 'qwen3next').
The deltanet in_proj_qkvz is interleaved PER KEY-HEAD as
[q(dk) | k(dk) | v(rep*dv) | z(rep*dv)] and in_proj_ba as [b(rep) | a(rep)]
— both are de-interleaved offline into ssm_q/k/v/z and ssm_beta/ssm_alpha;
the attention q_proj fuses [q | output-gate] per head and splits into
attn_q / attn_gate."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "qwen3next"
    head_dim = getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads
    attn_idx = [i for i, t in enumerate(cfg.layer_types) if t == "full_attention"]
    Hk, Hv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    rep = Hv // Hk
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.attention.key_length", head_dim)
    w.add_u32(f"{a}.rope.dimension_count",
              int(head_dim * getattr(cfg, "partial_rotary_factor", 0.25)))
    w.add_array(f"{a}.attention.layer_indices", attn_idx)
    w.add_u32(f"{a}.ssm.conv_kernel", cfg.linear_conv_kernel_dim)
    w.add_u32(f"{a}.ssm.key_head_count", Hk)
    w.add_u32(f"{a}.ssm.value_head_count", Hv)
    w.add_u32(f"{a}.ssm.key_head_dim", dk)
    w.add_u32(f"{a}.ssm.value_head_dim", dv)
    w.add_u32(f"{a}.expert_count", cfg.num_experts)
    w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    if not cfg.norm_topk_prob:
        raise SystemExit("qwen3next expects norm_topk_prob=True")

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    E = cfg.num_experts
    D = cfg.hidden_size
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
            qg = np_(sd[hf + "self_attn.q_proj.weight"]).reshape(
                cfg.num_attention_heads, 2, head_dim, D)
            add(out + "attn_q.weight", qg[:, 0].reshape(-1, D))
            add(out + "attn_gate.weight", qg[:, 1].reshape(-1, D))
            add(out + "attn_k.weight", sd[hf + "self_attn.k_proj.weight"])
            add(out + "attn_v.weight", sd[hf + "self_attn.v_proj.weight"])
            add(out + "attn_output.weight", sd[hf + "self_attn.o_proj.weight"])
            add(out + "attn_q_norm.weight", sd[hf + "self_attn.q_norm.weight"],
                quant=False)
            add(out + "attn_k_norm.weight", sd[hf + "self_attn.k_norm.weight"],
                quant=False)
        else:
            la = hf + "linear_attn."
            qkvz = np_(sd[la + "in_proj_qkvz.weight"]).reshape(
                Hk, 2 * dk + 2 * rep * dv, D)
            add(out + "ssm_q.weight", qkvz[:, :dk].reshape(-1, D))
            add(out + "ssm_k.weight", qkvz[:, dk:2 * dk].reshape(-1, D))
            add(out + "ssm_v.weight",
                qkvz[:, 2 * dk:2 * dk + rep * dv].reshape(-1, D))
            add(out + "ssm_z.weight", qkvz[:, 2 * dk + rep * dv:].reshape(-1, D))
            ba = np_(sd[la + "in_proj_ba.weight"]).reshape(Hk, 2 * rep, D)
            add(out + "ssm_beta.weight", ba[:, :rep].reshape(-1, D), quant=False)
            add(out + "ssm_alpha.weight", ba[:, rep:].reshape(-1, D), quant=False)
            add(out + "ssm_conv1d.weight",
                np_(sd[la + "conv1d.weight"])[:, 0, :], quant=False)
            if la + "conv1d.bias" in sd:
                add(out + "ssm_conv1d.bias", sd[la + "conv1d.bias"], quant=False)
            add(out + "ssm_dt.bias", sd[la + "dt_bias"], quant=False)
            add(out + "ssm_a", sd[la + "A_log"], quant=False)
            add(out + "ssm_norm.weight", sd[la + "norm.weight"], quant=False)
            add(out + "ssm_out.weight", sd[la + "out_proj.weight"])
        # MoE on every layer (decoder_sparse_step=1)
        add(out + "ffn_gate_inp.weight", sd[hf + "mlp.gate.weight"])
        for ours, theirs in (("ffn_gate_exps", "gate_proj"),
                             ("ffn_up_exps", "up_proj"),
                             ("ffn_down_exps", "down_proj")):
            stacked = np.stack([
                np_(sd[hf + f"mlp.experts.{j}.{theirs}.weight"])
                for j in range(E)])
            add(out + ours + ".weight", stacked, quant=False)
        add(out + "ffn_gate_shexp.weight",
            sd[hf + "mlp.shared_expert.gate_proj.weight"])
        add(out + "ffn_up_shexp.weight",
            sd[hf + "mlp.shared_expert.up_proj.weight"])
        add(out + "ffn_down_shexp.weight",
            sd[hf + "mlp.shared_expert.down_proj.weight"])
        add(out + "ffn_gate_inp_shexp.weight",
            sd[hf + "mlp.shared_expert_gate.weight"])
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
