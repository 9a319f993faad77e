"""Persimmon (fused interleaved qkv + per-head qk LayerNorm + relu² MLP)
parity vs HF transformers through the GGUF round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_persimmon import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.persimmon import (Persimmon, config_from_gguf, forward,
                                       init_cache)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.PersimmonConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        hidden_act="relu2", qk_layernorm=True, partial_rotary_factor=0.5,
        max_position_embeddings=64, rope_theta=25000.0, layer_norm_eps=1e-5,
        tie_word_embeddings=False, attention_dropout=0.0, pad_token_id=0,
    )
    torch.manual_seed(712)
    hf = transformers.PersimmonForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("persimmon") / "persimmon_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_persimmon_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.qk_norm and cfg.n_rot == 8
    params = load_params(g)
    assert "blk.0.attn_q_norm.bias" in params  # qk LayerNorm has a bias

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_persimmon_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    m = Persimmon(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]
