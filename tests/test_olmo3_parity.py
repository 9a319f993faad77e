"""OLMo3 (olmo2 ops + sliding-window pattern: every 4th layer global)
parity vs HF transformers through the olmo2 module."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_olmo3 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.olmo2 import Olmo2, config_from_gguf, forward, init_cache


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.Olmo3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=8, rope_theta=10000.0, rope_scaling=None,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_bias=False,
        attention_dropout=0.0, pad_token_id=0,
    )
    assert cfg.layer_types == ["sliding_attention"] * 3 + ["full_attention"]
    torch.manual_seed(1301)
    hf = transformers.Olmo3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("olmo3") / "olmo3_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_olmo3_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.sliding_window == 8 and cfg.full_interval == 4
    params = load_params(g)

    # 14 tokens > window 8 so the sliding mask actually bites
    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4, 19, 66]],
                      np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse
    # the window is load-bearing at t > window
    cfg_off = type(cfg)(**{**cfg.__dict__, "sliding_window": 0})
    off, _ = forward(params, cfg_off, jnp.asarray(toks),
                     jnp.zeros((1,), jnp.int32),
                     init_cache(cfg, 1, 32, jnp.float32), jnp.int32(0))
    assert not np.allclose(np.asarray(off[0]), got)


def test_olmo3_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    from ggml_tpu.models.common import generate

    g = GGUFFile(path)
    m = Olmo2(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = generate(m, toks, 8, cache_dtype=jnp.float32)
    cur, want = toks.copy(), []
    for _ in range(8):
        with torch.no_grad():
            lg = hf(torch.from_numpy(cur.astype(np.int64))).logits
        nxt = int(lg[0, -1].argmax())
        want.append(nxt)
        cur = np.concatenate([cur, [[nxt]]], axis=1)
    assert [int(x) for x in out] == want
