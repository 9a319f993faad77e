"""RecurrentGemma / Griffin (RG-LRU + sliding-window attention) parity vs
HF transformers through the GGUF round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_recurrentgemma import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.recurrentgemma import (RecurrentGemma, config_from_gguf,
                                            forward, init_cache)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.RecurrentGemmaConfig(
        vocab_size=256, hidden_size=48, intermediate_size=96,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        lru_width=48, attention_window_size=16, conv1d_width=4,
        logits_soft_cap=30.0, rms_norm_eps=1e-6, rope_theta=10000.0,
        block_types=("recurrent", "recurrent", "attention"),
        max_position_embeddings=64, pad_token_id=0, attention_dropout=0.0,
    )
    torch.manual_seed(311)
    hf = transformers.RecurrentGemmaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("rgemma") / "rgemma_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_recurrentgemma_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.attn_layers == (2, 5)
    assert cfg.head_dim == 12 and cfg.n_rot == 6 and cfg.window == 16
    params = load_params(g)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64)), use_cache=False
                  ).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_recurrentgemma_sliding_window_masks_by_distance(tmp_path):
    """Window semantics on a single-attention-layer model: with W=8, the
    last position's logits must ignore a token edit at distance >= W (only
    the attention layer can carry it there) but see one inside the window.
    (HF's use_cache=False path applies NO window mask, so the long-prompt
    case can't be gated against HF directly — this pins OUR semantics:
    kv visible iff q_pos - W < kv_pos <= q_pos.)"""
    cfg = transformers.RecurrentGemmaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        lru_width=16, attention_window_size=8, conv1d_width=4,
        block_types=("attention",), max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(99)
    hf = transformers.RecurrentGemmaForCausalLM(cfg).eval()
    path = tmp_path / "rg1.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    g = GGUFFile(path)
    c = config_from_gguf(g)
    params = load_params(g)
    assert c.window == 8 and c.attn_layers == (0,)

    rng = np.random.default_rng(5)
    toks = rng.integers(1, 63, (1, 12)).astype(np.int32)

    def last_logits(t):
        lg, _ = forward(params, c, jnp.asarray(t), jnp.zeros((1,), jnp.int32),
                        init_cache(c, 1, 16, jnp.float32), jnp.int32(0))
        return np.asarray(lg[0, -1], np.float32)

    base = last_logits(toks)
    far = toks.copy()
    far[0, 2] = (far[0, 2] + 7) % 63 + 1  # distance 9 >= W from position 11
    near = toks.copy()
    near[0, 8] = (near[0, 8] + 7) % 63 + 1  # distance 3 < W
    np.testing.assert_allclose(last_logits(far), base, rtol=0, atol=0)
    assert np.abs(last_logits(near) - base).max() > 1e-6


def test_recurrentgemma_incremental_equals_full(tiny):
    _, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    params = load_params(g)
    toks = np.asarray([[5, 9, 33, 71, 2, 40, 18, 250, 7, 64]], np.int32)

    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      init_cache(cfg, 1, 32, jnp.float32), jnp.int32(0))
    cache = init_cache(cfg, 1, 32, jnp.float32)
    outs, pos = [], 0
    for chunk in (toks[:, :4],) + tuple(toks[:, j:j + 1] for j in range(4, 10)):
        lg, cache = forward(params, cfg, jnp.asarray(chunk),
                            jnp.full((1,), pos, jnp.int32), cache, jnp.int32(pos))
        outs.append(np.asarray(lg[0]))
        pos += chunk.shape[1]
    inc = np.concatenate(outs, axis=0)
    want = np.asarray(full[0])
    nmse = float(((inc - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-9, nmse


def test_recurrentgemma_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    m = RecurrentGemma(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_recurrentgemma_serving_engine(tiny):
    _, path = tiny
    from ggml_tpu.models.common import generate
    from ggml_tpu.serve import Engine

    g = GGUFFile(path)
    m = RecurrentGemma(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): generate(m, np.asarray([p], np.int32), 6,
                               cache_dtype=jnp.float32) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
