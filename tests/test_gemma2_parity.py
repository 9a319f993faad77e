"""Gemma-2 parity vs HF transformers through the GGUF round trip — the
softcap + sliding-window + norm-sandwich family (llama.cpp arch 'gemma2').
The tiny config uses sliding_window=8 over 16+ token sequences so the
even-layer window mask is actually load-bearing."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_gemma2 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gemma2 import Gemma2, config_from_gguf, forward, init_cache
from ggml_tpu.models.gpt2 import load_params


def _nmse(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return float(((got - want) ** 2).sum() / ((want ** 2).sum() + 1e-30))


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
        sliding_window=8, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, query_pre_attn_scalar=16,
        attn_implementation="eager",
    )
    torch.manual_seed(21)
    hf = transformers.Gemma2ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("gemma2") / "tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def _load(path, **kw):
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.sliding_window == 8 and cfg.attn_softcap == 50.0
    assert cfg.head_dim == 16 and cfg.query_pre_attn_scalar == 16.0
    return Gemma2(load_params(g, jnp.float32), cfg, max_seq=64, batch=1, **kw)


def test_gemma2_logits_match_hf(tiny):
    """Full-sequence logits over 3x the sliding window: window masking,
    softcaps, norm sandwich, GQA, embed scaling all in play."""
    hf, path = tiny
    m = _load(path)
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 128, (1, 24)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    got, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                     jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    assert _nmse(got[0], want) < 1e-8, _nmse(got[0], want)


def test_gemma2_greedy_generation_matches_hf(tiny):
    """Prefill + cached decode past the sliding window == HF generate (the
    decode-path window mask uses absolute positions, not slot indices)."""
    hf, path = tiny
    m = _load(path)
    toks = np.asarray([[3, 14, 15, 9, 2, 6]], np.int32)
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(toks.astype(np.int64)), max_new_tokens=12,
            do_sample=False, num_beams=1,
        ).numpy()[0, toks.shape[1]:]
    got = m.generate(toks, 12)
    assert got == [int(x) for x in want], (got, want)


def test_gemma2_incremental_decode_equals_full_forward(tiny):
    """Chunked prefill + 1-token steps through the cache == one full
    forward (the window mask must give identical results incrementally)."""
    hf, path = tiny
    m = _load(path)
    rng = np.random.default_rng(7)
    toks = rng.integers(0, 128, (1, 20)).astype(np.int32)

    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    full, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                      jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))

    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    outs = []
    pos = 0
    for chunk in (toks[:, :9], toks[:, 9:10], toks[:, 10:])[:2] + tuple(
        toks[:, j:j + 1] for j in range(10, 20)
    ):
        lg, cache = forward(m.params, m.cfg, jnp.asarray(chunk),
                            jnp.full((1,), pos, jnp.int32), cache, jnp.int32(pos))
        outs.append(np.asarray(lg[0]))
        pos += chunk.shape[1]
    inc = np.concatenate(outs, axis=0)
    assert _nmse(inc, np.asarray(full[0])) < 1e-10


def test_gemma2_serving_engine(tiny):
    """serve.Engine drives the family (interleaved == solo)."""
    hf, path = tiny
    from ggml_tpu.serve import Engine

    m = _load(path)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=64, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
