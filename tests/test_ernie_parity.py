"""ERNIE 4.5 (dense) parity vs HF transformers through the llama family:
head_dim decoupled from hidden_size/num_heads (128 vs 64 in the real
0.3B), tied embeddings."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_ernie import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf, forward, init_cache


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.Ernie4_5Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32,  # decoupled: inner width 128 != hidden 64
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=True, use_bias=False, pad_token_id=0,
    )
    torch.manual_seed(73)
    hf = transformers.Ernie4_5ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("ernie") / "ernie_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_ernie_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.head_dim == 32 and cfg.head_dim != cfg.n_embd // cfg.n_head
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


def test_ernie_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    m = Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]
