"""Gemma v1 (pre-norm only, no softcaps/sliding) parity vs HF through
the gemma2 module with sandwich=False."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_gemma import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gemma2 import (Gemma2, config_from_gguf, forward,
                                    init_cache)
from ggml_tpu.models.gpt2 import load_params


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rope_theta=10000.0,
        rms_norm_eps=1e-6, hidden_activation="gelu_pytorch_tanh",
        attention_bias=False, attention_dropout=0.0, pad_token_id=0,
    )
    torch.manual_seed(31)
    hf = transformers.GemmaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("gemma") / "gemma_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_gemma_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert not cfg.sandwich and cfg.attn_softcap == 0 and cfg.final_softcap == 0
    assert cfg.sliding_window == 0
    params = load_params(g)
    assert "blk.0.attn_post_norm.weight" not in params

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_gemma_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    m = Gemma2(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]
