"""Convert a HuggingFace GPT-OSS checkpoint to GGUF (llama.cpp 'gpt-oss'
arch): attention sinks, biased projections, fused gate_up experts split
into the stacked _exps layout (HF interleaves gate/up on the last axis of
gate_up_proj (E, D, 2F); we de-interleave and store gate/up as (E, F, D)
with per-expert (E, F) biases, down as (E, D, F) + (E, D))."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "gpt-oss"
    head_dim = getattr(cfg, "head_dim", cfg.hidden_size // cfg.num_attention_heads)
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.attention.key_length", head_dim)
    w.add_u32(f"{a}.attention.value_length", head_dim)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_u32(f"{a}.expert_count", cfg.num_local_experts)
    w.add_u32(f"{a}.expert_used_count", cfg.num_experts_per_tok)
    w.add_u32(f"{a}.attention.sliding_window", cfg.sliding_window)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add_f32(f"{a}.rope.freq_base", getattr(cfg, "rope_theta", 150000.0))
    rs = getattr(cfg, "rope_scaling", None)
    if rs and rs.get("rope_type", rs.get("type")) == "yarn":
        w.add_string(f"{a}.rope.scaling.type", "yarn")
        w.add_f32(f"{a}.rope.scaling.factor", float(rs["factor"]))
        w.add_u32(f"{a}.rope.scaling.original_context_length",
                  int(rs.get("original_max_position_embeddings", 4096)))

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
        for t, pr in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                      ("output", "o_proj")):
            add(f"{out}attn_{t}.weight", sd[f"{hf}self_attn.{pr}.weight"])
            add(f"{out}attn_{t}.bias", sd[f"{hf}self_attn.{pr}.bias"])
        add(out + "attn_sinks.weight", sd[hf + "self_attn.sinks"], quant=False)

        add(out + "ffn_gate_inp.weight", sd[hf + "mlp.router.weight"], quant=False)
        add(out + "ffn_gate_inp.bias", sd[hf + "mlp.router.bias"], quant=False)
        gu = np_(sd[hf + "mlp.experts.gate_up_proj"])  # (E, D, 2F) interleaved
        gub = np_(sd[hf + "mlp.experts.gate_up_proj_bias"])  # (E, 2F)
        add(out + "ffn_gate_exps.weight", gu[:, :, 0::2].transpose(0, 2, 1))
        add(out + "ffn_up_exps.weight", gu[:, :, 1::2].transpose(0, 2, 1))
        add(out + "ffn_gate_exps.bias", gub[:, 0::2], quant=False)
        add(out + "ffn_up_exps.bias", gub[:, 1::2], quant=False)
        dw = np_(sd[hf + "mlp.experts.down_proj"])  # (E, F, D) right-mult
        add(out + "ffn_down_exps.weight", dw.transpose(0, 2, 1))
        add(out + "ffn_down_exps.bias", sd[hf + "mlp.experts.down_proj_bias"],
            quant=False)
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "q8_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import GptOssForCausalLM

    model = GptOssForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K,
          "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
