"""Chameleon (per-head-affine qk LayerNorm + optional swin post-norms)
text-path parity vs HF transformers through the GGUF round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_chameleon import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.chameleon import (Chameleon, config_from_gguf, forward,
                                       init_cache)
from ggml_tpu.models.gpt2 import load_params


def _make(swin, seed, tmp, name):
    vq = dict(embed_dim=8, num_embeddings=16, latent_channels=32,
              base_channels=32, channel_multiplier=[1, 1], num_res_blocks=1,
              resolution=32, attn_resolutions=[])
    cfg = transformers.ChameleonConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
        swin_norm=swin, vq_config=vq, vocabulary_map={"a": 1},
        tie_word_embeddings=False, attention_bias=False,
        attention_dropout=0.0, pad_token_id=0,
    )
    torch.manual_seed(seed)
    hf = transformers.ChameleonForConditionalGeneration(cfg).eval()
    path = tmp / name
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return _make(False, 1001, tmp_path_factory.mktemp("chameleon"), "c.gguf")


def test_chameleon_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert not cfg.swin_norm
    params = load_params(g)
    assert params["blk.0.attn_q_norm.weight"].shape == (4, 8)  # per-head affine

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_chameleon_swin_norm_variant(tmp_path):
    hf, path = _make(True, 1002, tmp_path, "c_swin.gguf")
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.swin_norm
    params = load_params(g)
    toks = np.asarray([[7, 3, 250, 40, 11, 99]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      init_cache(cfg, 1, 16, jnp.float32), jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_chameleon_greedy_generation_matches_hf(tiny):
    """vs a manual HF greedy loop — Chameleon's generate() suppresses the
    image-token logits (vocabulary_map), which is sampling policy, not
    model semantics."""
    hf, path = tiny
    g = GGUFFile(path)
    from ggml_tpu.models.common import generate
    m = Chameleon(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = generate(m, toks, 8, cache_dtype=jnp.float32)
    cur, want = toks.copy(), []
    for _ in range(8):
        with torch.no_grad():
            lg = hf(torch.from_numpy(cur.astype(np.int64))).logits
        nxt = int(lg[0, -1].argmax())
        want.append(nxt)
        cur = np.concatenate([cur, [[nxt]]], axis=1)
    assert [int(x) for x in out] == want
