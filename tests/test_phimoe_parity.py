"""Phi-3.5-MoE family parity vs HF transformers through the GGUF round
trip: sparsemixer top-2 routing (threshold-masked softmax — NOT Mixtral
softmax-topk), LongRoPE with explicit mscales, biased LayerNorms and
head."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_phimoe import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.phimoe import (PhiMoE, config_from_gguf, forward,
                                    init_cache, sparsemixer_top2_gates)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    rng = np.random.default_rng(8)
    cfg = transformers.PhimoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2, router_jitter_noise=0.01,
        input_jitter_noise=0.0, max_position_embeddings=64,
        original_max_position_embeddings=8, rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_bias=True, lm_head_bias=True,
        tie_word_embeddings=False, attention_dropout=0.0, sliding_window=None,
        rope_scaling={
            "rope_type": "longrope",
            "long_factor": [float(f) for f in rng.uniform(1.5, 4.0, 8)],
            "short_factor": [float(f) for f in rng.uniform(1.0, 1.2, 8)],
            "long_mscale": 1.9,
            "short_mscale": 1.1,
            "original_max_position_embeddings": 8,
        },
    )
    torch.manual_seed(67)
    hf = transformers.PhimoeForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("phimoe") / "phimoe_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_sparsemixer_matches_hf_reference():
    """Our deterministic gates == HF's sparsemixer (inference path) on
    random router scores, including near-threshold rows."""
    from transformers.models.phimoe.modeling_phimoe import sparsemixer

    rng = np.random.default_rng(3)
    scores = rng.normal(size=(64, 8)).astype(np.float32)
    scores[5, 1] = scores[5, 3]  # tie row
    with torch.no_grad():
        mult, sel = sparsemixer(torch.from_numpy(scores), jitter_eps=0.01,
                                training=False)
    want = np.zeros((64, 8), np.float32)
    np.put_along_axis(want, sel.numpy(), mult.numpy(), axis=-1)
    got = np.asarray(sparsemixer_top2_gates(jnp.asarray(scores), 0.01))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_phimoe_longrope_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.longrope and abs(cfg.long_mscale - 1.9) < 1e-6 and cfg.n_expert == 4
    params = load_params(g)

    # 20 tokens > orig_ctx=8 and max_seq=32 > 8: LONG regime on both sides
    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30,
                        200, 4, 99, 12, 63, 7, 151, 41, 2, 88]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_phimoe_greedy_generation_matches_hf(tiny):
    """Long-regime generation (prompt already beyond orig_ctx)."""
    hf, path = tiny
    g = GGUFFile(path)
    m = PhiMoE(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_phimoe_serving_engine(tiny):
    _, path = tiny
    from ggml_tpu.serve import Engine

    g = GGUFFile(path)
    m = PhiMoE(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
