"""MiniMax (lightning linear attention + full attention + Mixtral MoE)
parity vs HF transformers through the GGUF round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_minimax import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.minimax import (MiniMax, config_from_gguf, forward,
                                     init_cache)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.MiniMaxConfig(
        vocab_size=256, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, num_local_experts=4, num_experts_per_tok=2,
        block_size=256, full_attn_alpha_factor=0.9, full_attn_beta_factor=1.1,
        linear_attn_alpha_factor=1.2, linear_attn_beta_factor=0.8,
        mlp_alpha_factor=1.05, mlp_beta_factor=0.95,
        rope_theta=10000.0, rms_norm_eps=1e-5, sliding_window=None,
        max_position_embeddings=64, pad_token_id=0, tie_word_embeddings=False,
        attention_dropout=0.0, router_jitter_noise=0.0,
    )
    # default pattern: even layers (0-indexed) are full attention
    assert cfg.layer_types == ["full_attention", "linear_attention"] * 2
    torch.manual_seed(808)
    hf = transformers.MiniMaxForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("minimax") / "minimax_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_minimax_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.full_attn_layers == (0, 2)
    assert cfg.lin_alpha == pytest.approx(1.2) and cfg.mlp_beta == pytest.approx(0.95)
    params = load_params(g)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_minimax_incremental_equals_full(tiny):
    """Chunked prefill + decode through the lightning state must equal the
    one-shot forward (the chunk-invariance HF implements with 256-blocks)."""
    _, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    params = load_params(g)
    toks = np.asarray([[5, 9, 33, 71, 2, 40, 18, 250, 7, 64]], np.int32)

    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      init_cache(cfg, 1, 32, jnp.float32), jnp.int32(0))
    cache = init_cache(cfg, 1, 32, jnp.float32)
    outs, pos = [], 0
    for chunk in (toks[:, :4],) + tuple(toks[:, j:j + 1] for j in range(4, 10)):
        lg, cache = forward(params, cfg, jnp.asarray(chunk),
                            jnp.full((1,), pos, jnp.int32), cache, jnp.int32(pos))
        outs.append(np.asarray(lg[0]))
        pos += chunk.shape[1]
    inc = np.concatenate(outs, axis=0)
    want = np.asarray(full[0])
    nmse = float(((inc - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-9, nmse


def test_minimax_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    m = MiniMax(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_minimax_serving_engine(tiny):
    _, path = tiny
    from ggml_tpu.models.common import generate
    from ggml_tpu.serve import Engine

    g = GGUFFile(path)
    m = MiniMax(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): generate(m, np.asarray([p], np.int32), 6,
                               cache_dtype=jnp.float32) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
