"""MPT family parity vs HF transformers through the GGUF round trip:
bias-free LayerNorms, straight-concat Wqkv split, the qkv clamp
(clamp_kqv), erf GELU, and MPT's odd/even-reordered ALiBi slopes."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_mpt import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.mpt import MPT, config_from_gguf, forward, init_cache


def _tiny(tmp, clip_qkv=None, n_head=6):
    cfg = transformers.MptConfig(
        vocab_size=256, hidden_size=12 * n_head, n_layers=2, n_heads=n_head,
        max_seq_len=64, layer_norm_epsilon=1e-5,
        attn_config={"alibi": True, "alibi_bias_max": 8, "clip_qkv": clip_qkv,
                     "attn_pdrop": 0.0},
    )
    torch.manual_seed(13)
    hf = transformers.MptForCausalLM(cfg).eval()
    path = tmp / f"mpt_{clip_qkv}.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def _load(path, max_seq=32):
    g = GGUFFile(path)
    return MPT(load_params(g), config_from_gguf(g), max_seq=max_seq, batch=1)


def test_mpt_logits_match_hf(tmp_path):
    hf, path = _tiny(tmp_path)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_head == 6 and cfg.clamp_kqv == 0.0
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


def test_mpt_clamp_kqv_logits_match_hf(tmp_path):
    """clip_qkv small enough that the clamp is load-bearing on a
    random-init model."""
    hf, path = _tiny(tmp_path, clip_qkv=0.25)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.clamp_kqv == 0.25
    params = load_params(g)

    toks = np.asarray([[5, 9, 33, 71, 2, 40, 18, 250]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse
    # prove the clamp actually bit: recompute without it
    cfgn = type(cfg)(**{**cfg.__dict__, "clamp_kqv": 0.0})
    cache = init_cache(cfg, 1, 32, jnp.float32)
    unclamped, _ = forward(params, cfgn, jnp.asarray(toks),
                           jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    assert not np.allclose(np.asarray(unclamped[0]), got)


def test_mpt_greedy_generation_matches_hf(tmp_path):
    hf, path = _tiny(tmp_path)
    m = _load(path)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_mpt_serving_engine(tmp_path):
    _, path = _tiny(tmp_path)
    from ggml_tpu.serve import Engine

    m = _load(path)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
