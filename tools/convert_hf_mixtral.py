"""Convert a HuggingFace Mixtral checkpoint to GGUF (llama.cpp-compatible keys).

Mixtral is the llama architecture plus a sparse-MoE FFN; llama.cpp stores it
under arch "llama" with llama.expert_count / llama.expert_used_count and the
stacked 3-D expert tensors (ffn_gate_exps / ffn_up_exps / ffn_down_exps) plus
the ffn_gate_inp router.  HF expert weights w1/w3/w2 map to gate/up/down.

Weights stay in HF rotate-half layout (see tools/convert_hf_llama.py).
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    w = GGUFWriter()
    w.add_string("general.architecture", "llama")
    w.add_u32("llama.context_length", cfg.max_position_embeddings)
    w.add_u32("llama.embedding_length", cfg.hidden_size)
    w.add_u32("llama.attention.head_count", cfg.num_attention_heads)
    w.add_u32("llama.attention.head_count_kv", cfg.num_key_value_heads)
    w.add_u32("llama.block_count", cfg.num_hidden_layers)
    w.add_u32("llama.feed_forward_length", cfg.intermediate_size)
    w.add_u32("llama.vocab_size", cfg.vocab_size)
    w.add_u32("llama.expert_count", cfg.num_local_experts)
    w.add_u32("llama.expert_used_count", cfg.num_experts_per_tok)
    w.add_f32("llama.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add_f32("llama.rope.freq_base", getattr(cfg, "rope_theta", 10000.0))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim >= 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    add("token_embd.weight", sd["model.embed_tokens.weight"])
    add("output_norm.weight", sd["model.norm.weight"])
    if "lm_head.weight" in sd:
        add("output.weight", sd["lm_head.weight"])
    for i in range(cfg.num_hidden_layers):
        hf = f"model.layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        add(out + "attn_q.weight", sd[hf + "self_attn.q_proj.weight"])
        add(out + "attn_k.weight", sd[hf + "self_attn.k_proj.weight"])
        add(out + "attn_v.weight", sd[hf + "self_attn.v_proj.weight"])
        add(out + "attn_output.weight", sd[hf + "self_attn.o_proj.weight"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        moe = hf + "block_sparse_moe."
        add(out + "ffn_gate_inp.weight", sd[moe + "gate.weight"], quant=False)
        # stacked (E, F, D) gate/up and (E, D, F) down — llama.cpp _exps layout
        gate = np.stack([np_(sd[f"{moe}experts.{e}.w1.weight"]) for e in range(cfg.num_local_experts)])
        up = np.stack([np_(sd[f"{moe}experts.{e}.w3.weight"]) for e in range(cfg.num_local_experts)])
        down = np.stack([np_(sd[f"{moe}experts.{e}.w2.weight"]) for e in range(cfg.num_local_experts)])
        add(out + "ffn_gate_exps.weight", gate)
        add(out + "ffn_up_exps.weight", up)
        add(out + "ffn_down_exps.weight", down)
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32", choices=["f32", "f16", "q8_0", "q4_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "f16": GGMLType.F16, "q8_0": GGMLType.Q8_0, "q4_0": GGMLType.Q4_0,
          "q4_k": GGMLType.Q4_K, "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
