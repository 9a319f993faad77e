"""Convert a HuggingFace Phi (phi-2 class) checkpoint to GGUF (llama.cpp
'phi2' arch keys + tensor names: attn_q/k/v + biases, biased attn_norm,
fc1/fc2 as ffn_up/ffn_down, untied biased output head)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    a = "phi2"
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    n_rot = int(getattr(cfg, "partial_rotary_factor", 1.0) * head_dim)
    w.add_string("general.architecture", a)
    w.add_u32(f"{a}.context_length", cfg.max_position_embeddings)
    w.add_u32(f"{a}.embedding_length", cfg.hidden_size)
    w.add_u32(f"{a}.block_count", cfg.num_hidden_layers)
    w.add_u32(f"{a}.feed_forward_length", cfg.intermediate_size)
    w.add_u32(f"{a}.attention.head_count", cfg.num_attention_heads)
    w.add_u32(f"{a}.attention.head_count_kv",
              getattr(cfg, "num_key_value_heads", None) or cfg.num_attention_heads)
    w.add_u32(f"{a}.vocab_size", cfg.vocab_size)
    w.add_u32(f"{a}.rope.dimension_count", n_rot)
    w.add_f32(f"{a}.rope.freq_base", getattr(cfg, "rope_theta", 10000.0))
    w.add_f32(f"{a}.attention.layer_norm_epsilon", cfg.layer_norm_eps)

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr):
        arr = np_(arr).astype(np.float32)
        t = ftype if (arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    p = "model."
    add("token_embd.weight", sd[p + "embed_tokens.weight"])
    add("output_norm.weight", sd[p + "final_layernorm.weight"])
    add("output_norm.bias", sd[p + "final_layernorm.bias"])
    add("output.weight", sd["lm_head.weight"])
    add("output.bias", sd["lm_head.bias"])
    for i in range(cfg.num_hidden_layers):
        hf = f"{p}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "attn_norm.bias", sd[hf + "input_layernorm.bias"])
        for ours, theirs in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                             ("attn_v", "v_proj"), ("attn_output", "dense")):
            add(out + ours + ".weight", sd[hf + f"self_attn.{theirs}.weight"])
            add(out + ours + ".bias", sd[hf + f"self_attn.{theirs}.bias"])
        add(out + "ffn_up.weight", sd[hf + "mlp.fc1.weight"])
        add(out + "ffn_up.bias", sd[hf + "mlp.fc1.bias"])
        add(out + "ffn_down.weight", sd[hf + "mlp.fc2.weight"])
        add(out + "ffn_down.bias", sd[hf + "mlp.fc2.bias"])
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "q8_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import PhiForCausalLM

    model = PhiForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K,
          "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
