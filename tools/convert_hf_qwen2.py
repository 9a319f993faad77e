"""Convert a HuggingFace Qwen2 checkpoint to GGUF (llama.cpp 'qwen2' keys).

Qwen2 is the llama layout plus per-head q/k/v projection BIASES and (for the
small models) tied input/output embeddings; models/llama.py serves it — the
forward picks up `blk.N.attn_{q,k,v}.bias` when present and falls back to the
token embedding for the lm head when `output.weight` is absent.
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    w.add_string("general.architecture", "qwen2")
    w.add_u32("qwen2.context_length", cfg.max_position_embeddings)
    w.add_u32("qwen2.embedding_length", cfg.hidden_size)
    w.add_u32("qwen2.attention.head_count", cfg.num_attention_heads)
    w.add_u32("qwen2.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32("qwen2.block_count", cfg.num_hidden_layers)
    w.add_u32("qwen2.feed_forward_length", cfg.intermediate_size)
    w.add_u32("qwen2.vocab_size", cfg.vocab_size)
    w.add_f32("qwen2.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add_f32("qwen2.rope.freq_base", getattr(cfg, "rope_theta", 1000000.0))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    add("token_embd.weight", sd["model.embed_tokens.weight"])
    add("output_norm.weight", sd["model.norm.weight"])
    if "lm_head.weight" in sd:  # absent = tied embeddings (Qwen2 <= 1.5B)
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"model.layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "attn_q.weight", sd[hf + "self_attn.q_proj.weight"])
        add(out + "attn_q.bias", sd[hf + "self_attn.q_proj.bias"])
        add(out + "attn_k.weight", sd[hf + "self_attn.k_proj.weight"])
        add(out + "attn_k.bias", sd[hf + "self_attn.k_proj.bias"])
        add(out + "attn_v.weight", sd[hf + "self_attn.v_proj.weight"])
        add(out + "attn_v.bias", sd[hf + "self_attn.v_proj.bias"])
        add(out + "attn_output.weight", sd[hf + "self_attn.o_proj.weight"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        add(out + "ffn_gate.weight", sd[hf + "mlp.gate_proj.weight"])
        add(out + "ffn_up.weight", sd[hf + "mlp.up_proj.weight"])
        add(out + "ffn_down.weight", sd[hf + "mlp.down_proj.weight"])
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32",
                    choices=["f32", "f16", "q8_0", "q4_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "f16": GGMLType.F16, "q8_0": GGMLType.Q8_0,
          "q4_0": GGMLType.Q4_0, "q4_k": GGMLType.Q4_K, "q5_k": GGMLType.Q5_K,
          "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
