"""Convert a HuggingFace OLMo-3 checkpoint to GGUF (llama.cpp 'olmo2'
arch)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "olmo3"
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_f32(f"{a}.rope.freq_base", cfg.rope_theta)
    w.add_f32(f"{a}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add_u32(f"{a}.attention.sliding_window", cfg.sliding_window)
    # HF layer_types default: sliding except every 4th layer
    full_idx = [i for i, t in enumerate(cfg.layer_types)
                if t == "full_attention"]
    if full_idx != [i for i in range(cfg.num_hidden_layers) if (i + 1) % 4 == 0]:
        raise SystemExit("non-default olmo3 layer_types pattern unsupported")
    w.add_u32(f"{a}.attention.full_attention_interval", 4)
    if getattr(cfg, "rope_scaling", None):
        raise SystemExit("olmo3 rope_scaling not supported yet")

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
        for ours, theirs in (("attn_q.weight", "self_attn.q_proj.weight"),
                             ("attn_k.weight", "self_attn.k_proj.weight"),
                             ("attn_v.weight", "self_attn.v_proj.weight"),
                             ("attn_output.weight", "self_attn.o_proj.weight"),
                             ("attn_q_norm.weight", "self_attn.q_norm.weight"),
                             ("attn_k_norm.weight", "self_attn.k_norm.weight"),
                             ("attn_post_norm.weight", "post_attention_layernorm.weight"),
                             ("ffn_gate.weight", "mlp.gate_proj.weight"),
                             ("ffn_up.weight", "mlp.up_proj.weight"),
                             ("ffn_down.weight", "mlp.down_proj.weight"),
                             ("ffn_post_norm.weight", "post_feedforward_layernorm.weight")):
            add(out + ours, sd[hf + theirs])
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
