"""Mixtral (sparse-MoE llama) parity vs HF transformers through the GGUF
round trip: llama.cpp stores Mixtral under arch "llama" with
llama.expert_count / llama.expert_used_count and stacked 3-D expert tensors
(the GGML_OP_MUL_MAT_ID path, reference include/ggml.h:1121-1125)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_mixtral import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf


def _tiny(tmp):
    cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        rms_norm_eps=1e-5, rope_theta=10000.0, num_local_experts=4,
        num_experts_per_tok=2, attention_dropout=0.0, output_router_logits=False,
    )
    torch.manual_seed(11)
    hf = transformers.MixtralForCausalLM(cfg).eval()
    path = tmp / "mixtral.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_mixtral_logits_match_hf(tmp_path):
    hf, path = _tiny(tmp_path)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_expert == 4 and cfg.n_expert_used == 2  # MoE KVs survive
    m = Llama(load_params(g), cfg, max_seq=32, batch=1)

    # 20 tokens: >= the auto threshold, so the full forward takes the sorted
    # grouped-GEMM path while the greedy decode below takes the dense path
    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30,
                        200, 4, 99, 12, 63, 7, 151, 41, 2, 88]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]

    from ggml_tpu.models.llama import forward

    cache = m.new_cache(jnp.float32)
    full, _ = forward(m.params, m.cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)

    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse

    # greedy continuation matches HF's (exercises the decode-step MoE path)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)), max_new_tokens=8,
                             do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_mixtral_paged_equals_dense(tmp_path):
    """Paged decode routes through the same moe_ffn_block: paged == dense."""
    from ggml_tpu.paged_kv import PagedConfig
    from ggml_tpu.serve import Engine

    hf, path = _tiny(tmp_path)
    g = GGUFFile(path)
    m = Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)

    prompts = [[1, 2, 3], [9, 7]]
    dense = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [dense.submit(p, 6) for p in prompts]
    dres = dense.run()
    want = {tuple(p): dres[r] for p, r in zip(prompts, rids)}

    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32,
                 paged=PagedConfig(n_pages=8, page_size=8, max_pages_per_seq=4))
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for p, r in zip(prompts, rids):
        assert res[r] == want[tuple(p)], (p, res[r], want[tuple(p)])


def test_moe_grouped_matches_dense():
    """Sorted ragged-grouped GEMM path == dense-masked expert sum (the
    prefill MUL_MAT_ID shape), including its gradients."""
    import jax

    from ggml_tpu.models.llama import (moe_expert_sum, moe_expert_sum_grouped,
                                       moe_gates, moe_topk)

    rng = np.random.default_rng(7)
    E, F, D, B, T, K = 6, 24, 16, 2, 9, 2
    h = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    router = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)
    w_gate = jnp.asarray(rng.standard_normal((E, F, D)) * 0.2, jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((E, F, D)) * 0.2, jnp.float32)
    w_down = jnp.asarray(rng.standard_normal((E, D, F)) * 0.2, jnp.float32)

    def dense(h, w_gate, w_up, w_down):
        return moe_expert_sum(h, w_gate, w_up, w_down, moe_gates(router, E, K))

    def grouped(h, w_gate, w_up, w_down):
        probs, idx = moe_topk(router, K)
        return moe_expert_sum_grouped(h, w_gate, w_up, w_down, probs, idx, E)

    want = dense(h, w_gate, w_up, w_down)
    got = grouped(h, w_gate, w_up, w_down)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    g_want = jax.grad(lambda *a: dense(*a).sum(), argnums=(0, 1, 2, 3))(
        h, w_gate, w_up, w_down)
    g_got = jax.grad(lambda *a: grouped(*a).sum(), argnums=(0, 1, 2, 3))(
        h, w_gate, w_up, w_down)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_mixtral_expert_parallel_matches_dense():
    """mixtral_ffn_ep on the 8-device mesh == the single-device moe block
    (expert tensors sharded on 'ep', router replicated, one psum)."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device mesh")

    from ggml_tpu.models.llama import moe_expert_sum, moe_gates
    from ggml_tpu.parallel.moe import mixtral_ffn_ep

    rng = np.random.default_rng(5)
    E, F, D, B, T = 8, 32, 16, 2, 5
    h = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w_inp = jnp.asarray(rng.standard_normal((E, D)) * 0.2, jnp.float32)
    w_gate = jnp.asarray(rng.standard_normal((E, F, D)) * 0.2, jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((E, F, D)) * 0.2, jnp.float32)
    w_down = jnp.asarray(rng.standard_normal((E, D, F)) * 0.2, jnp.float32)

    gates = moe_gates(h @ w_inp.T, E, 2)
    want = moe_expert_sum(h, w_gate, w_up, w_down, gates)

    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    got = mixtral_ffn_ep(mesh, h, w_inp, w_gate, w_up, w_down, n_expert_used=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
