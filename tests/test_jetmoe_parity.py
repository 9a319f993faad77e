"""JetMoE (mixture of attention heads + MoE MLP) parity vs HF
transformers through the GGUF round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_jetmoe import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.jetmoe import (JetMoe, config_from_gguf, forward,
                                    init_cache)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.JetMoeConfig(
        vocab_size=256, hidden_size=32, intermediate_size=48,
        num_hidden_layers=3, num_key_value_heads=2, kv_channels=8,
        num_local_experts=4, num_experts_per_tok=2, activation_function="silu",
        max_position_embeddings=64, rope_theta=10000.0,
        # pad_token_id None: padding_idx would zero embedding row 0, making
        # the router logits exactly tied there — torch.topk and lax.top_k
        # break exact ties differently (measure-zero on real checkpoints)
        tie_word_embeddings=False, attention_dropout=0.0, pad_token_id=None,
        use_cache=True,
    )
    assert cfg.num_attention_heads == 4  # top_k * kv heads
    torch.manual_seed(1205)
    hf = transformers.JetMoeForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("jetmoe") / "jetmoe_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_jetmoe_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_expert == 4 and cfg.n_expert_used == 2 and cfg.kv_proj == 16
    params = load_params(g)
    assert params["blk.0.attn_qexp.weight"].shape == (4, 16, 32)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_jetmoe_incremental_equals_full(tiny):
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


def test_jetmoe_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    from ggml_tpu.models.common import generate

    g = GGUFFile(path)
    m = JetMoe(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
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
