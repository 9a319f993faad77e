"""Convert a HuggingFace Apertus (Swiss AI) checkpoint to GGUF.

Arch 'apertus': llama layout + per-head qk RMSNorm (before rope) + a
non-gated xIELU MLP.  The per-layer learned xIELU parameters are
resolved here — a_p = softplus(alpha_p), a_n = beta + softplus(alpha_n)
computed in bf16 exactly as HF's XIELUActivation holds them — and stored
as blk.N.ffn_act.alpha_p / alpha_n."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    import torch

    w = GGUFWriter()
    a = "apertus"
    head_dim = getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads
    beta = 0.5
    eps_bf16 = float(torch.tensor(-1e-6, dtype=torch.bfloat16).float())
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.attention.key_length", head_dim)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add_f32(f"{a}.xielu.beta", beta)
    w.add_f32(f"{a}.xielu.eps", eps_bf16)

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
        add(out + "attn_norm.weight", sd[hf + "attention_layernorm.weight"])
        add(out + "ffn_norm.weight", sd[hf + "feedforward_layernorm.weight"])
        sa = hf + "self_attn."
        for ours, theirs in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                             ("attn_v", "v_proj"), ("attn_output", "o_proj")):
            add(out + ours + ".weight", sd[sa + theirs + ".weight"])
            if sa + theirs + ".bias" in sd:
                add(out + ours + ".bias", sd[sa + theirs + ".bias"], quant=False)
        add(out + "attn_q_norm.weight", sd[sa + "q_norm.weight"], quant=False)
        add(out + "attn_k_norm.weight", sd[sa + "k_norm.weight"], quant=False)
        add(out + "ffn_up.weight", sd[hf + "mlp.up_proj.weight"])
        add(out + "ffn_down.weight", sd[hf + "mlp.down_proj.weight"])
        # resolve the learned xIELU coefficients in bf16 (HF keeps the
        # activation parameters/buffers in bfloat16)
        ap = sd[hf + "mlp.act_fn.alpha_p"].to(torch.bfloat16)
        an = sd[hf + "mlp.act_fn.alpha_n"].to(torch.bfloat16)
        a_p = torch.nn.functional.softplus(ap).float()
        a_n = (torch.tensor(beta, dtype=torch.bfloat16)
               + torch.nn.functional.softplus(an)).float()
        add(out + "ffn_act.alpha_p", a_p.reshape(1), quant=False)
        add(out + "ffn_act.alpha_n", a_n.reshape(1), quant=False)
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
