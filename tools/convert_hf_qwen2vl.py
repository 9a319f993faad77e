"""Convert a HuggingFace Qwen2-VL checkpoint to GGUF.

Text side uses llama.cpp's 'qwen2vl' keys (qwen2 layout + the mRoPE section
widths under qwen2vl.rope.dimension_sections).  The vision tower — which
llama.cpp ships as a separate clip/mmproj GGUF — is embedded in the same
file under 'v.' tensor names and 'clip.vision.*' metadata so one file serves
the whole model (models/qwen2vl.py reads both).
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter


def convert_state_dict(sd: dict, cfg, ftype: GGMLType = GGMLType.F32) -> GGUFWriter:
    tc, vc = cfg.text_config, cfg.vision_config
    w = GGUFWriter()
    w.add_string("general.architecture", "qwen2vl")
    w.add_u32("qwen2vl.context_length", tc.max_position_embeddings)
    w.add_u32("qwen2vl.embedding_length", tc.hidden_size)
    w.add_u32("qwen2vl.attention.head_count", tc.num_attention_heads)
    w.add_u32("qwen2vl.attention.head_count_kv", tc.num_key_value_heads)
    w.add_u32("qwen2vl.block_count", tc.num_hidden_layers)
    w.add_u32("qwen2vl.feed_forward_length", tc.intermediate_size)
    w.add_u32("qwen2vl.vocab_size", tc.vocab_size)
    w.add_f32("qwen2vl.attention.layer_norm_rms_epsilon", tc.rms_norm_eps)
    w.add_f32("qwen2vl.rope.freq_base", getattr(tc, "rope_theta", 1000000.0))
    sections = list(tc.rope_scaling["mrope_section"])
    w.add_array("qwen2vl.rope.dimension_sections", [int(s) for s in sections] + [0] * (4 - len(sections)))
    w.add_u32("qwen2vl.image_token_id", cfg.image_token_id)
    w.add_u32("qwen2vl.vision_start_token_id", cfg.vision_start_token_id)

    w.add_u32("clip.vision.embedding_length", vc.embed_dim)
    w.add_u32("clip.vision.block_count", vc.depth)
    w.add_u32("clip.vision.attention.head_count", vc.num_heads)
    w.add_u32("clip.vision.projection_dim", vc.hidden_size)
    w.add_u32("clip.vision.patch_size", vc.patch_size)
    w.add_u32("clip.vision.temporal_patch_size", vc.temporal_patch_size)
    w.add_u32("clip.vision.in_channels", vc.in_channels)
    w.add_u32("clip.vision.spatial_merge_size", vc.spatial_merge_size)
    w.add_f32("clip.vision.mlp_ratio", float(vc.mlp_ratio))

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def add(name, arr, quant=True):
        arr = np_(arr).astype(np.float32)
        t = ftype if (quant and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    # ---- text decoder (keys: model.language_model.*) -------------------------
    tp = "model.language_model."
    add("token_embd.weight", sd[tp + "embed_tokens.weight"])
    add("output_norm.weight", sd[tp + "norm.weight"])
    if "lm_head.weight" in sd:
        add("output.weight", sd["lm_head.weight"])
    for i in range(tc.num_hidden_layers):
        hf = f"{tp}layers.{i}."
        out = f"blk.{i}."
        add(out + "attn_norm.weight", sd[hf + "input_layernorm.weight"])
        for s, d in (("q_proj", "attn_q"), ("k_proj", "attn_k"), ("v_proj", "attn_v")):
            add(out + d + ".weight", sd[hf + f"self_attn.{s}.weight"])
            add(out + d + ".bias", sd[hf + f"self_attn.{s}.bias"])
        add(out + "attn_output.weight", sd[hf + "self_attn.o_proj.weight"])
        add(out + "ffn_norm.weight", sd[hf + "post_attention_layernorm.weight"])
        add(out + "ffn_gate.weight", sd[hf + "mlp.gate_proj.weight"])
        add(out + "ffn_up.weight", sd[hf + "mlp.up_proj.weight"])
        add(out + "ffn_down.weight", sd[hf + "mlp.down_proj.weight"])

    # ---- vision tower (dense: the decoder dwarfs it; reference mmproj is f16)
    vp = "model.visual."
    patch = np_(sd[vp + "patch_embed.proj.weight"])  # (E, C, tps, ps, ps) conv3d
    add("v.patch_embd.weight", patch.reshape(patch.shape[0], -1), quant=False)
    for i in range(vc.depth):
        hf = f"{vp}blocks.{i}."
        out = f"v.blk.{i}."
        add(out + "ln1.weight", sd[hf + "norm1.weight"], quant=False)
        add(out + "ln1.bias", sd[hf + "norm1.bias"], quant=False)
        add(out + "ln2.weight", sd[hf + "norm2.weight"], quant=False)
        add(out + "ln2.bias", sd[hf + "norm2.bias"], quant=False)
        add(out + "attn_qkv.weight", sd[hf + "attn.qkv.weight"], quant=False)
        add(out + "attn_qkv.bias", sd[hf + "attn.qkv.bias"], quant=False)
        add(out + "attn_out.weight", sd[hf + "attn.proj.weight"], quant=False)
        add(out + "attn_out.bias", sd[hf + "attn.proj.bias"], quant=False)
        add(out + "ffn_up.weight", sd[hf + "mlp.fc1.weight"], quant=False)
        add(out + "ffn_up.bias", sd[hf + "mlp.fc1.bias"], quant=False)
        add(out + "ffn_down.weight", sd[hf + "mlp.fc2.weight"], quant=False)
        add(out + "ffn_down.bias", sd[hf + "mlp.fc2.bias"], quant=False)
    add("v.merger.ln_q.weight", sd[vp + "merger.ln_q.weight"], quant=False)
    add("v.merger.ln_q.bias", sd[vp + "merger.ln_q.bias"], quant=False)
    add("v.merger.mlp.0.weight", sd[vp + "merger.mlp.0.weight"], quant=False)
    add("v.merger.mlp.0.bias", sd[vp + "merger.mlp.0.bias"], quant=False)
    add("v.merger.mlp.2.weight", sd[vp + "merger.mlp.2.weight"], quant=False)
    add("v.merger.mlp.2.bias", sd[vp + "merger.mlp.2.bias"], quant=False)
    return w


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("out")
    ap.add_argument("--ftype", default="f32",
                    choices=["f32", "q8_0", "q4_0", "q4_k", "q5_k", "q6_k"])
    args = ap.parse_args()
    from transformers import Qwen2VLForConditionalGeneration

    model = Qwen2VLForConditionalGeneration.from_pretrained(args.model)
    ft = {"f32": GGMLType.F32, "q8_0": GGMLType.Q8_0, "q4_0": GGMLType.Q4_0,
          "q4_k": GGMLType.Q4_K, "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K}[args.ftype]
    convert_state_dict(model.state_dict(), model.config, ft).write(args.out)
    print("wrote", args.out)
