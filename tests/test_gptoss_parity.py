"""GPT-OSS parity vs HF transformers through the GGUF round trip:
attention sinks, alternating sliding/full layers, biased projections,
clamped-SwiGLU MoE with per-expert biases — llama.cpp arch 'gpt-oss'."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_gptoss import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.gptoss import (GptOss, config_from_gguf, forward,
                                    init_cache)


def _tiny(tmp):
    cfg = transformers.GptOssConfig(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8, max_position_embeddings=256, rope_theta=150000.0,
        rope_scaling=None, attention_dropout=0.0, tie_word_embeddings=False,
        layer_types=["sliding_attention", "full_attention", "sliding_attention"],
    )
    torch.manual_seed(13)
    hf = transformers.GptOssForCausalLM(cfg).eval()
    path = tmp / "gptoss.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_gptoss_logits_match_hf(tmp_path):
    hf, path = _tiny(tmp_path)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_expert == 4 and cfg.n_expert_used == 2
    assert cfg.sliding_window == 8 and cfg.head_dim == 16
    params = load_params(g)

    # 20 tokens > window=8: sinks + sliding mask + grouped MoE all load-bearing
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


def test_gptoss_greedy_matches_hf(tmp_path):
    hf, path = _tiny(tmp_path)
    g = GGUFFile(path)
    m = GptOss(load_params(g), config_from_gguf(g), max_seq=40, batch=1)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    out = m.generate(toks, 10)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=10, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_gptoss_engine_interleaved_equals_solo(tmp_path):
    from ggml_tpu.serve import Engine

    hf, path = _tiny(tmp_path)
    g = GGUFFile(path)
    m = GptOss(load_params(g), config_from_gguf(g), max_seq=32, batch=1)

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
