"""Gemma-3 (text) parity vs HF transformers through the GGUF round trip:
gemma2's norm sandwich + per-head q/k RMSNorm, 5:1 sliding/global layer
pattern, dual rope bases with linear scaling on global layers, and no
softcapping — llama.cpp arch 'gemma3' served by models/gemma2.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_gemma3 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gemma2 import Gemma2, config_from_gguf, forward, init_cache
from ggml_tpu.models.gpt2 import load_params


def _tiny(tmp):
    cfg = transformers.Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=7, num_attention_heads=4, num_key_value_heads=2,
        head_dim=24, max_position_embeddings=256, rms_norm_eps=1e-6,
        query_pre_attn_scalar=24, sliding_window=8,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        rope_scaling={"rope_type": "linear", "factor": 2.0},
        attention_dropout=0.0, attn_logit_softcapping=None,
        final_logit_softcapping=None,
    )
    torch.manual_seed(17)
    hf = transformers.Gemma3ForCausalLM(cfg).eval()
    path = tmp / "gemma3.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_gemma3_logits_match_hf(tmp_path):
    hf, path = _tiny(tmp_path)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.qk_norm and cfg.sliding_pattern == 6
    assert cfg.attn_softcap == 0.0 and cfg.final_softcap == 0.0
    assert cfg.rope_local_base == 10_000.0 and cfg.rope_base == 1_000_000.0
    assert cfg.rope_scale_global == 2.0 and cfg.head_dim == 24
    params = load_params(g)

    # 20 tokens > sliding_window=8: the window mask is load-bearing; layer 5
    # is the global layer (pattern wrap exercised with 7 layers)
    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30,
                        200, 4, 99, 12, 63, 7, 151, 41, 2, 88]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]

    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse


def test_gemma3_greedy_matches_hf(tmp_path):
    hf, path = _tiny(tmp_path)
    g = GGUFFile(path)
    m = Gemma2(load_params(g), config_from_gguf(g), max_seq=48, batch=1)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    out = m.generate(toks, 10)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=10, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_gemma3_engine_serves(tmp_path):
    """Gemma-3 rides the existing gemma2 engine dispatch (interleaved ==
    solo through the continuous-batching engine)."""
    from ggml_tpu.serve import Engine

    hf, path = _tiny(tmp_path)
    g = GGUFFile(path)
    m = Gemma2(load_params(g), config_from_gguf(g), max_seq=32, batch=1)

    prompts = [[1, 2, 3], [9, 7, 100, 5]]
    want = {}
    for p in prompts:
        solo = Engine(m, max_batch=1, max_seq=32, cache_dtype=jnp.float32)
        r = solo.submit(p, 6)
        want[tuple(p)] = solo.run()[r]

    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for p, r in zip(prompts, rids):
        assert res[r] == want[tuple(p)], (p, res[r], want[tuple(p)])
