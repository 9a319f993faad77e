"""GPT-NeoX (Pythia) parity vs HF transformers through the GGUF round trip
(llama.cpp arch 'gptneox').  Covers BOTH residual layouts: parallel
(Pythia, use_parallel_residual=True) and sequential — and the per-head
fused-qkv de-interleave in the converter."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_neox import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.neox import NeoX, config_from_gguf, forward, init_cache
from ggml_tpu.models.gpt2 import load_params


def _nmse(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return float(((got - want) ** 2).sum() / ((want ** 2).sum() + 1e-30))


def _make(tmp, parallel: bool, seed: int):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=128, layer_norm_eps=1e-5,
        rotary_pct=0.5, use_parallel_residual=parallel,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    hf = transformers.GPTNeoXForCausalLM(cfg).eval()
    path = tmp / f"tiny_{parallel}.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return _make(tmp_path_factory.mktemp("neox"), parallel=True, seed=13)


def _load(path, **kw):
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_rot == 8 and cfg.head_dim == 16  # partial rotary in play
    return NeoX(load_params(g, jnp.float32), cfg, max_seq=64, batch=1, **kw)


def test_neox_logits_match_hf(tiny):
    hf, path = tiny
    m = _load(path)
    assert m.cfg.parallel_residual
    rng = np.random.default_rng(4)
    toks = rng.integers(0, 128, (1, 24)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    got, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                     jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    assert _nmse(got[0], want) < 1e-8, _nmse(got[0], want)


def test_neox_sequential_residual_matches_hf(tmp_path):
    """use_parallel_residual=False flows through GGUF metadata and changes
    the compute graph (x + attn THEN + mlp(ln2(x+attn)))."""
    hf, path = _make(tmp_path, parallel=False, seed=17)
    m = _load(path)
    assert not m.cfg.parallel_residual
    rng = np.random.default_rng(6)
    toks = rng.integers(0, 128, (1, 12)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    got, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                     jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    assert _nmse(got[0], want) < 1e-8, _nmse(got[0], want)


def test_neox_greedy_generation_matches_hf(tiny):
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


def test_neox_serving_engine(tiny):
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
