"""StarCoder (GPT-BigCode) family parity vs HF transformers through the
GGUF round trip: multi-query attention (1 shared KV head), the asymmetric
c_attn split, learned positions — plus the multi-head (multi_query=False)
SantaCoder variant."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_starcoder import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.starcoder import (StarCoder, config_from_gguf, forward,
                                       init_cache)


def _tiny(tmp, multi_query=True):
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=64,
        multi_query=multi_query, attn_pdrop=0.0, resid_pdrop=0.0, embd_pdrop=0.0,
    )
    torch.manual_seed(17)
    hf = transformers.GPTBigCodeForCausalLM(cfg).eval()
    path = tmp / f"starcoder_{multi_query}.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def _load(path, max_seq=32):
    g = GGUFFile(path)
    return StarCoder(load_params(g), config_from_gguf(g), max_seq=max_seq, batch=1)


def test_starcoder_mqa_logits_match_hf(tmp_path):
    hf, path = _tiny(tmp_path, multi_query=True)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_head == 4 and cfg.n_head_kv == 1
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


def test_starcoder_mha_variant_logits_match_hf(tmp_path):
    hf, path = _tiny(tmp_path, multi_query=False)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_head_kv == cfg.n_head == 4
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


def test_starcoder_greedy_generation_matches_hf(tmp_path):
    hf, path = _tiny(tmp_path, multi_query=True)
    m = _load(path)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_starcoder_serving_engine(tmp_path):
    _, path = _tiny(tmp_path, multi_query=True)
    from ggml_tpu.serve import Engine

    m = _load(path)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
