"""Granite / GraniteMoE parity vs HF transformers through the llama family:
the four fixed scalar multipliers (embedding/residual/attention/logits)
and the MoE per-expert fused gate|up split.  Paged decode must apply the
same multipliers (paged == dense gate)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_granite import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import (Llama, config_from_gguf, forward,
                                   init_cache)

MULTS = dict(embedding_multiplier=12.0, residual_multiplier=0.22,
             attention_multiplier=0.015625, logits_scaling=8.0)


def _tiny_dense(tmp):
    cfg = transformers.GraniteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attention_dropout=0.0, **MULTS,
    )
    torch.manual_seed(37)
    hf = transformers.GraniteForCausalLM(cfg).eval()
    path = tmp / "granite_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def _tiny_moe(tmp):
    cfg = transformers.GraniteMoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attention_dropout=0.0, **MULTS,
    )
    torch.manual_seed(41)
    hf = transformers.GraniteMoeForCausalLM(cfg).eval()
    path = tmp / "granitemoe_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_granite_multipliers_logits_match_hf(tmp_path):
    hf, path = _tiny_dense(tmp_path)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.embd_scale == 12.0 and abs(cfg.resid_scale - 0.22) < 1e-6
    assert cfg.attn_scale == 0.015625 and cfg.logit_scale == 8.0
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


def test_granitemoe_logits_match_hf(tmp_path):
    hf, path = _tiny_moe(tmp_path)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_expert == 4 and cfg.n_expert_used == 2 and cfg.moe_renorm
    params = load_params(g)

    toks = np.asarray([[5, 9, 33, 71, 2, 40, 18, 250, 7, 64]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_granite_greedy_generation_matches_hf(tmp_path):
    hf, path = _tiny_dense(tmp_path)
    g = GGUFFile(path)
    m = Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_granite_paged_equals_dense(tmp_path):
    """Engine(paged=...) applies the multipliers in its own step — the
    paged == dense invariant with granite scales live."""
    _, path = _tiny_dense(tmp_path)
    from ggml_tpu.paged_kv import PagedConfig
    from ggml_tpu.serve import Engine

    g = GGUFFile(path)
    m = Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    prompts = [[1, 2, 3], [9, 9, 1, 7]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32,
                 paged=PagedConfig(page_size=8, n_pages=16, max_pages_per_seq=4))
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
