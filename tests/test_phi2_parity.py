"""Phi-2 parity vs HF transformers through the GGUF round trip — the
parallel-residual + PARTIAL-rotary family (llama.cpp arch 'phi2').  The
tiny config uses partial_rotary_factor=0.5 so the pass-through (unrotated)
half of each head is actually load-bearing."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_phi2 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.phi2 import Phi2, config_from_gguf, forward, init_cache
from ggml_tpu.models.gpt2 import load_params


def _nmse(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return float(((got - want) ** 2).sum() / ((want ** 2).sum() + 1e-30))


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.PhiConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, layer_norm_eps=1e-5,
        partial_rotary_factor=0.5, attn_implementation="eager",
    )
    torch.manual_seed(5)
    hf = transformers.PhiForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("phi2") / "tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def _load(path, **kw):
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_rot == 8 and cfg.head_dim == 16  # partial rotary in play
    return Phi2(load_params(g, jnp.float32), cfg, max_seq=64, batch=1, **kw)


def test_phi2_logits_match_hf(tiny):
    """Full-sequence logits: partial rotary, parallel residual, biased LN,
    untied biased head all in play."""
    hf, path = tiny
    m = _load(path)
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 128, (1, 24)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    got, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                     jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    assert _nmse(got[0], want) < 1e-8, _nmse(got[0], want)


def test_phi2_greedy_generation_matches_hf(tiny):
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


def test_phi2_incremental_decode_equals_full_forward(tiny):
    hf, path = tiny
    m = _load(path)
    rng = np.random.default_rng(11)
    toks = rng.integers(0, 128, (1, 16)).astype(np.int32)

    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    full, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                      jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))

    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    outs = []
    pos = 0
    for chunk in (toks[:, :7],) + tuple(toks[:, j:j + 1] for j in range(7, 16)):
        lg, cache = forward(m.params, m.cfg, jnp.asarray(chunk),
                            jnp.full((1,), pos, jnp.int32), cache, jnp.int32(pos))
        outs.append(np.asarray(lg[0]))
        pos += chunk.shape[1]
    inc = np.concatenate(outs, axis=0)
    assert _nmse(inc, np.asarray(full[0])) < 1e-10


def test_phi2_serving_engine(tiny):
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
