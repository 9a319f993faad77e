"""Falcon parity vs HF transformers through the GGUF round trip (llama.cpp
arch 'falcon').  Covers BOTH decoder shapes: 7B-style multi-query
(n_head_kv=1, shared layer norm) and 40B-style new_decoder_architecture
(GQA + separate ln_attn/ln_mlp), plus the fused-qkv de-interleaves."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_falcon import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.falcon import Falcon, config_from_gguf, forward, init_cache
from ggml_tpu.models.gpt2 import load_params


def _nmse(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return float(((got - want) ** 2).sum() / ((want ** 2).sum() + 1e-30))


def _make(tmp, new_arch: bool, seed: int):
    cfg = transformers.FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_kv_heads=2 if new_arch else None,
        multi_query=not new_arch, new_decoder_architecture=new_arch,
        parallel_attn=True, bias=False, alibi=False,
        max_position_embeddings=128, layer_norm_epsilon=1e-5,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    hf = transformers.FalconForCausalLM(cfg).eval()
    path = tmp / f"falcon_{new_arch}.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


@pytest.fixture(scope="module")
def tiny_mqa(tmp_path_factory):
    return _make(tmp_path_factory.mktemp("falcon"), new_arch=False, seed=41)


def _load(path, **kw):
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    return Falcon(load_params(g, jnp.float32), cfg, max_seq=64, batch=1, **kw)


def test_falcon_mqa_logits_match_hf(tiny_mqa):
    """7B shape: multi-query (1 KV head shared by all 4 query heads),
    shared layer norm feeding attn AND mlp."""
    hf, path = tiny_mqa
    m = _load(path)
    assert m.cfg.n_head_kv == 1 and not m.cfg.dual_norm
    rng = np.random.default_rng(16)
    toks = rng.integers(0, 128, (1, 20)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    got, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                     jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    assert _nmse(got[0], want) < 1e-8, _nmse(got[0], want)


def test_falcon_new_arch_logits_match_hf(tmp_path):
    """40B shape: GQA (2 KV heads), per-group fused-qkv interleave,
    separate ln_attn/ln_mlp."""
    hf, path = _make(tmp_path, new_arch=True, seed=43)
    m = _load(path)
    assert m.cfg.n_head_kv == 2 and m.cfg.dual_norm
    rng = np.random.default_rng(17)
    toks = rng.integers(0, 128, (1, 14)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    got, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                     jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    assert _nmse(got[0], want) < 1e-8, _nmse(got[0], want)


def test_falcon_greedy_generation_matches_hf(tiny_mqa):
    hf, path = tiny_mqa
    m = _load(path)
    toks = np.asarray([[3, 14, 15, 9, 2, 6]], np.int32)
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(toks.astype(np.int64)), max_new_tokens=12,
            do_sample=False, num_beams=1,
        ).numpy()[0, toks.shape[1]:]
    got = m.generate(toks, 12)
    assert got == [int(x) for x in want], (got, want)


def test_falcon_serving_engine(tiny_mqa):
    """serve.Engine drives the family (interleaved == solo)."""
    hf, path = tiny_mqa
    from ggml_tpu.serve import Engine

    m = _load(path)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=64, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
