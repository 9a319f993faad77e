"""Differential test: Pallas flash attention vs the jnp reference
(ops.core.flash_attn_ext), the analog of test-backend-ops FLASH_ATTN_EXT cases
(reference: tests/test-backend-ops.cpp test_flash_attn_ext)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ggml_tpu.ops import core as ops
from ggml_tpu.kernels.flash_attn import flash_attention

RNG = np.random.default_rng(3)


def _nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(((a - b) ** 2).sum() / np.maximum((a * a).sum(), 1e-30))


def _make(b, h, h_kv, nq, nkv, d):
    q = RNG.standard_normal((b, h, nq, d)).astype(np.float32)
    k = RNG.standard_normal((b, h_kv, nkv, d)).astype(np.float32)
    v = RNG.standard_normal((b, h_kv, nkv, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def _causal_mask(nq, nkv, offset=0):
    i = np.arange(nq)[:, None]
    j = np.arange(nkv)[None, :]
    m = np.where(j <= i + offset, 0.0, -np.inf).astype(np.float32)
    return jnp.asarray(m)


@pytest.mark.parametrize(
    "b,h,h_kv,nq,nkv,d,max_bias,softcap",
    [
        (1, 4, 4, 128, 256, 64, 0.0, 0.0),
        (2, 8, 2, 128, 128, 64, 0.0, 0.0),  # GQA
        (1, 4, 4, 128, 256, 64, 8.0, 0.0),  # ALiBi
        (1, 4, 4, 128, 256, 64, 0.0, 30.0),  # softcap (gemma-style)
        (1, 4, 4, 100, 256, 64, 0.0, 0.0),  # ragged n_q -> q padding
    ],
)
def test_flash_attention_vs_reference(b, h, h_kv, nq, nkv, d, max_bias, softcap):
    q, k, v = _make(b, h, h_kv, nq, nkv, d)
    mask = _causal_mask(nq, nkv, offset=nkv - nq)
    scale = 1.0 / np.sqrt(d)
    ref = ops.flash_attn_ext(q, k, v, mask=mask, scale=scale, max_bias=max_bias, logit_softcap=softcap)
    out = flash_attention(q, k, v, mask=mask, scale=scale, max_bias=max_bias, logit_softcap=softcap)
    assert out.shape == ref.shape
    assert _nmse(ref, out) < 1e-4  # MXU bf16-pass rounding; reference f16 gate is 5e-4


def test_flash_attention_no_mask():
    q, k, v = _make(1, 4, 4, 128, 128, 64)
    scale = 0.3
    ref = ops.flash_attn_ext(q, k, v, mask=None, scale=scale)
    out = flash_attention(q, k, v, mask=None, scale=scale)
    assert _nmse(ref, out) < 1e-4


def test_flash_attention_decode_shape():
    # nq=1 decode step against a longer KV
    q, k, v = _make(1, 8, 8, 1, 256, 64)
    mask = _causal_mask(1, 256, offset=200)  # only first 201 positions visible
    ref = ops.flash_attn_ext(q, k, v, mask=mask, scale=0.125)
    out = flash_attention(q, k, v, mask=mask, scale=0.125)
    assert _nmse(ref, out) < 1e-4


def test_flash_prefill_matches_reference_model_path():
    """Models with use_flash_prefill=True must match the fp32 jnp attention
    path on a multi-token prefill (bf16 MXU rounding only)."""
    from dataclasses import replace

    from ggml_tpu.dtypes import GGMLType
    from ggml_tpu.models.gptj import GPTJConfig, forward, init_cache, synth_quantized_params

    cfg = GPTJConfig(n_vocab=512, n_ctx=64, n_embd=256, n_head=4, n_layer=2, n_rot=32)
    params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=2, dtype=jnp.float32)
    toks = jnp.asarray(RNG.integers(0, 512, (1, 24)).astype(np.int32))
    cache = init_cache(cfg, 1, 32, jnp.float32)

    ref, _ = forward(params, cfg, toks, jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    cache2 = init_cache(cfg, 1, 32, jnp.float32)
    out, _ = forward(params, replace(cfg, use_flash_prefill=True), toks,
                     jnp.zeros((1,), jnp.int32), cache2, jnp.int32(0))
    assert _nmse(ref, out) < 1e-4


def test_flash_attention_ragged_lengths():
    # odd q and kv lengths exercise the pad+mask path (Mosaic alignment)
    q, k, v = _make(1, 2, 2, 37, 53, 64)
    mask = _causal_mask(37, 53, offset=16)
    ref = ops.flash_attn_ext(q, k, v, mask=mask, scale=0.2)
    out = flash_attention(q, k, v, mask=mask, scale=0.2)
    assert out.shape == ref.shape
    assert _nmse(ref, out) < 1e-4

    # no explicit mask + ragged kv: pad columns must not leak into softmax
    ref2 = ops.flash_attn_ext(q, k, v, mask=None, scale=0.2)
    out2 = flash_attention(q, k, v, mask=None, scale=0.2)
    assert _nmse(ref2, out2) < 1e-4


def test_flash_attention_fully_masked_rows_zero():
    # rows with every kv masked must output exactly 0 (not sum(v)/l)
    q, k, v = _make(1, 2, 2, 16, 33, 64)  # ragged kv -> pad columns too
    mask = np.zeros((16, 33), np.float32)
    mask[4:8, :] = -np.inf  # fully-masked real rows
    out = flash_attention(q, k, v, mask=jnp.asarray(mask), scale=0.3)
    o = np.asarray(out)  # (b, nq, h, d)
    assert np.all(o[:, 4:8] == 0.0)
    # unmasked rows still match the reference
    ref = ops.flash_attn_ext(q, k, v, mask=jnp.asarray(mask), scale=0.3)
    assert _nmse(np.asarray(ref)[:, :4], o[:, :4]) < 1e-4
    assert _nmse(np.asarray(ref)[:, 8:], o[:, 8:]) < 1e-4


# -- training backward (GGML_OP_FLASH_ATTN_BACK analog) -----------------------


@pytest.mark.parametrize(
    "b,h,h_kv,nq,nkv,d,max_bias",
    [
        (1, 4, 4, 64, 64, 64, 0.0),
        (2, 8, 2, 64, 128, 64, 0.0),   # GQA: dk/dv reduce over shared heads
        (1, 4, 4, 64, 64, 64, 8.0),    # ALiBi slopes in both passes
        (1, 4, 4, 50, 96, 64, 0.0),    # ragged nq AND nkv -> both paddings
    ],
)
def test_flash_attention_train_grads_match_reference(b, h, h_kv, nq, nkv, d, max_bias):
    """d(loss)/d{q,k,v} of the fused kernel == jax.grad through the jnp
    reference op (which materializes the n^2 attention matrix)."""
    import jax

    from ggml_tpu.kernels.flash_attn import flash_attention_train

    q, k, v = _make(b, h, h_kv, nq, nkv, d)
    mask = _causal_mask(nq, nkv, offset=nkv - nq)
    scale = 1.0 / np.sqrt(d)
    w = jnp.asarray(RNG.standard_normal((b, nq, h, d)).astype(np.float32))

    def loss_ref(q, k, v):
        o = ops.flash_attn_ext(q, k, v, mask=mask, scale=scale, max_bias=max_bias)
        return jnp.sum(o * w)

    def loss_fused(q, k, v):
        o = flash_attention_train(q, k, v, mask=mask, scale=scale, max_bias=max_bias)
        return jnp.sum(o * w)

    ref_val, ref_g = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got_val, got_g = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    assert _nmse(got_val, ref_val) < 1e-6
    for name, a, bb in zip("qkv", got_g, ref_g):
        assert a.shape == bb.shape, name
        assert _nmse(a, bb) < 1e-6, (name, _nmse(a, bb))


def test_flash_attention_train_no_mask_value_and_grad():
    import jax

    from ggml_tpu.kernels.flash_attn import flash_attention_train

    q, k, v = _make(1, 4, 4, 64, 64, 64)
    scale = 0.25
    ref = ops.flash_attn_ext(q, k, v, mask=None, scale=scale)
    out = flash_attention_train(q, k, v, mask=None, scale=scale)
    assert _nmse(out, ref) < 1e-6

    g_ref = jax.grad(lambda q: jnp.sum(ops.flash_attn_ext(q, k, v, mask=None, scale=scale) ** 2))(q)
    g_got = jax.grad(lambda q: jnp.sum(flash_attention_train(q, k, v, mask=None, scale=scale) ** 2))(q)
    assert _nmse(g_got, g_ref) < 1e-6


def test_flash_attention_train_under_jit_and_fully_masked_rows():
    """Jitted end-to-end; rows whose mask blocks every kv position produce
    zero output and zero gradient (no NaNs from the dead-row lse clamp)."""
    import jax

    from ggml_tpu.kernels.flash_attn import flash_attention_train

    q, k, v = _make(1, 2, 2, 32, 32, 64)
    m = np.zeros((32, 32), np.float32)
    m[5, :] = -np.inf  # row 5 sees nothing
    mask = jnp.asarray(m)

    @jax.jit
    def loss(q, k, v):
        return jnp.sum(flash_attention_train(q, k, v, mask=mask, scale=0.5) ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    assert np.allclose(np.asarray(grads[0])[0, :, 5, :], 0.0)
