"""dots.llm1 (DeepSeek-V3 routing + qwen3 attention) parity vs HF
transformers, served by the glm4moe module through the GGUF round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_dots1 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.glm4moe import (GLM4MoE, config_from_gguf, forward,
                                     init_cache)
from ggml_tpu.models.gpt2 import load_params


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.Dots1Config(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=48, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, n_shared_experts=1,
        n_routed_experts=8, n_group=2, topk_group=1, num_experts_per_tok=2,
        first_k_dense_replace=1, norm_topk_prob=True,
        routed_scaling_factor=1.5, rope_theta=10000.0, rms_norm_eps=1e-6,
        max_position_embeddings=64, pad_token_id=0, tie_word_embeddings=False,
        attention_bias=False, attention_dropout=0.0, use_sliding_window=False,
    )
    torch.manual_seed(606)
    hf = transformers.Dots1ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("dots1") / "dots1_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_dots1_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.qk_norm and cfg.n_rot == cfg.head_dim  # qwen3-style attention
    assert cfg.n_group == 2 and cfg.routed_scale == 1.5 and cfg.first_dense == 1
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


def test_dots1_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    m = GLM4MoE(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]
