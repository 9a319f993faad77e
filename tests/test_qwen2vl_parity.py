"""Qwen2-VL parity vs HF transformers through the GGUF round trip: the
model family that exercises mRoPE (multi-section 3D rope) and the ViT
vision tower (2D vision rope + patch merger) end to end.

Reference analogs: GGML_ROPE_TYPE_MROPE / VISION (include/ggml.h:1443-1463);
llama.cpp arch 'qwen2vl' + clip mmproj."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_qwen2vl import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.qwen2vl import (
    Qwen2VL, config_from_gguf, forward_text, get_rope_index, init_cache,
)


def _nmse(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return float(((got - want) ** 2).sum() / ((want ** 2).sum() + 1e-30))


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.Qwen2VLConfig(
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, rope_theta=10000.0, rms_norm_eps=1e-6,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        ),
        vision_config=dict(
            embed_dim=32, depth=2, num_heads=2, hidden_size=64, patch_size=4,
            temporal_patch_size=2, in_channels=3, spatial_merge_size=2,
            mlp_ratio=2.0,
        ),
        # keep special ids inside the tiny vocab
        image_token_id=250, video_token_id=251, vision_start_token_id=252,
        vision_end_token_id=253,
    )
    torch.manual_seed(11)
    hf = transformers.Qwen2VLForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("qwen2vl") / "tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, cfg, path


def _load(path):
    g = GGUFFile(path)
    cfg, vcfg = config_from_gguf(g)
    assert cfg.mrope_sections == (2, 3, 3)
    assert vcfg is not None and vcfg.depth == 2
    md = g.metadata
    return Qwen2VL(load_params(g, jnp.float32), cfg, vcfg,
                   image_token_id=int(md["qwen2vl.image_token_id"]),
                   vision_start_token_id=int(md["qwen2vl.vision_start_token_id"]),
                   max_seq=64, batch=1)


def test_text_mrope_logits_match_hf(tiny):
    """Distinct 3D position streams (the multimodal case) through the text
    decoder only — proves the mRoPE application, not just its text-degenerate
    diagonal."""
    hf, cfg, path = tiny
    m = _load(path)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 58, 9]], np.int32)
    t = toks.shape[1]
    rng = np.random.default_rng(5)
    pos3 = rng.integers(0, 40, size=(3, 1, t))
    with torch.no_grad():
        want = hf.model.language_model(
            input_ids=torch.from_numpy(toks.astype(np.int64)),
            position_ids=torch.from_numpy(pos3.astype(np.int64)),
        ).last_hidden_state
        want = (want @ hf.lm_head.weight.T).numpy()[0]

    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    got, _ = forward_text(m.params, m.cfg, jnp.asarray(toks),
                          jnp.asarray(pos3.astype(np.int32)), cache, jnp.int32(0))
    assert _nmse(got[0], want) < 1e-8


def test_vision_tower_matches_hf(tiny):
    hf, cfg, path = tiny
    m = _load(path)
    vc = cfg.vision_config
    # one "image": grid (t=1, h=4, w=4) patches
    grid = np.asarray([[1, 4, 4]])
    n_patch = 16
    rng = np.random.default_rng(3)
    pixels = rng.standard_normal(
        (n_patch, vc.in_channels * vc.temporal_patch_size * vc.patch_size ** 2)
    ).astype(np.float32)
    with torch.no_grad():
        want = hf.model.visual(torch.from_numpy(pixels), torch.from_numpy(grid)).numpy()
    got = m.encode_images(pixels, grid)
    assert got.shape == want.shape  # (16/4, 64)
    assert _nmse(got, want) < 1e-9


def test_vision_tower_two_images_block_diagonal(tiny):
    """Two images in one call attend block-diagonally (cu_seqlens analog)."""
    hf, cfg, path = tiny
    m = _load(path)
    vc = cfg.vision_config
    grid = np.asarray([[1, 4, 4], [1, 2, 2]])
    n_patch = 16 + 4
    rng = np.random.default_rng(4)
    pixels = rng.standard_normal(
        (n_patch, vc.in_channels * vc.temporal_patch_size * vc.patch_size ** 2)
    ).astype(np.float32)
    with torch.no_grad():
        want = hf.model.visual(torch.from_numpy(pixels), torch.from_numpy(grid)).numpy()
    got = m.encode_images(pixels, grid)
    assert _nmse(got, want) < 1e-9


def test_get_rope_index_matches_hf(tiny):
    hf, cfg, path = tiny
    # text, image (1,4,4 -> 4 merged tokens), text
    toks = [[5, 6, 252, 250, 250, 250, 250, 7, 8, 9]]
    grid = np.asarray([[1, 4, 4]])
    ids = torch.tensor(toks, dtype=torch.long)
    with torch.no_grad():
        want_pos, want_delta = hf.model.get_rope_index(ids, torch.from_numpy(grid))
    pos, delta = get_rope_index(np.asarray(toks), grid, 2, 250, 252)
    np.testing.assert_array_equal(pos, want_pos.numpy())
    np.testing.assert_array_equal(delta, want_delta.numpy()[:, 0])


def test_multimodal_forward_and_greedy_match_hf(tiny):
    """Full pipeline: vision encode -> merge at image tokens -> mRoPE prefill
    -> delta-corrected greedy decode, vs HF end to end."""
    hf, cfg, path = tiny
    m = _load(path)
    vc = cfg.vision_config

    grid = np.asarray([[1, 4, 4]])
    rng = np.random.default_rng(9)
    pixels = rng.standard_normal(
        (16, vc.in_channels * vc.temporal_patch_size * vc.patch_size ** 2)
    ).astype(np.float32)
    toks = np.asarray([[5, 6, 252, 250, 250, 250, 250, 7, 8, 9]], np.int32)

    ids = torch.from_numpy(toks.astype(np.int64))
    with torch.no_grad():
        want = hf(input_ids=ids, pixel_values=torch.from_numpy(pixels),
                  image_grid_thw=torch.from_numpy(grid)).logits.numpy()[0]
        hf_gen = hf.generate(
            input_ids=ids, pixel_values=torch.from_numpy(pixels),
            image_grid_thw=torch.from_numpy(grid), max_new_tokens=8,
            do_sample=False, num_beams=1,
        )

    # full-sequence logits
    embd = np.asarray(m.params["token_embd.weight"])
    embeds = embd[toks]
    img = np.asarray(m.encode_images(pixels, grid))
    flat = embeds.reshape(-1, embeds.shape[-1]).copy()
    flat[np.nonzero(toks.reshape(-1) == 250)[0]] = img
    pos3, deltas = get_rope_index(toks, grid, 2, 250, 252)
    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    got, _ = forward_text(m.params, m.cfg, jnp.asarray(toks),
                          jnp.asarray(pos3.astype(np.int32)), cache, jnp.int32(0),
                          embeds=jnp.asarray(flat[None]))
    assert _nmse(got[0], want) < 1e-8

    # greedy continuation with position delta
    out = m.generate(toks, 8, pixels=pixels, grid_thw=grid)
    assert [int(x) for x in out] == [int(x) for x in hf_gen[0, toks.shape[1]:]]
