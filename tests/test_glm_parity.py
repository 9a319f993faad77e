"""GLM (HF 'glm' arch, GLM-4-9b-chat-hf generation) parity through the
glm4 module with sandwich=False: interleaved partial rope + qkv biases +
fused gate_up MLP, standard pre-norm residuals."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_glm import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.glm4 import GLM4, config_from_gguf, forward, init_cache
from ggml_tpu.models.gpt2 import load_params


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.GlmConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attention_dropout=0.0, pad_token_id=0,
    )
    torch.manual_seed(1103)
    hf = transformers.GlmForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("glm") / "glm_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_glm_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert not cfg.sandwich and cfg.n_rot == 4
    params = load_params(g)
    assert "blk.0.attn_post_norm.weight" not in params
    assert "blk.0.attn_q.bias" in params

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_glm_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    from ggml_tpu.models.common import generate

    m = GLM4(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
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
