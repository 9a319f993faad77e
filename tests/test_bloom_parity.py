"""BLOOM family parity vs HF transformers through the GGUF round trip:
per-head fused-qkv de-interleave, embedding LayerNorm, and ALiBi position
bias end to end (the soft_max_ext max_bias path as a whole model)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_bloom import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.bloom import Bloom, config_from_gguf, forward, init_cache
from ggml_tpu.models.gpt2 import load_params


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.BloomConfig(
        vocab_size=256, hidden_size=72, n_layer=2, n_head=6,  # non-pow2 heads:
        # exercises the two-geometric-sequence ALiBi slope recipe
        layer_norm_epsilon=1e-5, hidden_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(11)
    hf = transformers.BloomForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("bloom") / "bloom_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def _load(path, max_seq=32):
    g = GGUFFile(path)
    return Bloom(load_params(g), config_from_gguf(g), max_seq=max_seq, batch=1)


def test_bloom_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_head == 6 and cfg.max_alibi_bias == 8.0
    params = load_params(g)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse


def test_bloom_incremental_decode_matches_full(tiny):
    """KV-cached chunked decode == one full forward (the ALiBi bias must be
    keyed on absolute positions for this to hold)."""
    _, path = tiny
    m = _load(path)
    toks = np.asarray([[5, 9, 33, 71, 2, 40, 18, 250, 7, 64]], np.int32)
    cache = init_cache(m.cfg, 1, 32, jnp.float32)
    full, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                      jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))

    cache = init_cache(m.cfg, 1, 32, jnp.float32)
    outs, pos = [], 0
    for chunk in (toks[:, :4],) + tuple(toks[:, j:j + 1] for j in range(4, 10)):
        lg, cache = forward(m.params, m.cfg, jnp.asarray(chunk),
                            jnp.full((1,), pos, jnp.int32), cache, jnp.int32(pos))
        outs.append(np.asarray(lg[0]))
        pos += chunk.shape[1]
    inc = np.concatenate(outs, axis=0)
    want = np.asarray(full[0])
    nmse = float(((inc - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-10, nmse


def test_bloom_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    m = _load(path)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_bloom_serving_engine(tiny):
    """serve.Engine drives the family (interleaved == solo) — per-slot
    positions feed the absolute-position ALiBi bias."""
    _, path = tiny
    from ggml_tpu.serve import Engine

    m = _load(path)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
