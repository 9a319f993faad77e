"""Finite-difference gradient checks — the analog of test-backend-ops
MODE_GRAD (reference: tests/test-backend-ops.cpp:732 eval_grad, 4-point
stencil :333). The reference validates its hand-written adjoint tables; we
validate that jax.grad through our op implementations matches numerical
derivatives (guards against wrong custom ops / non-differentiable kinks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ggml_tpu.ops import core as ops

RNG = np.random.default_rng(31)


def fd_grad(f, x, eps=1e-3):
    """4-point central stencil like the reference's grad_precise mode."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xs = []
        for d in (-2, -1, 1, 2):
            xp = x.copy()
            xp[i] += d * eps
            xs.append(float(f(jnp.asarray(xp, jnp.float32))))
        g[i] = (xs[0] - 8 * xs[1] + 8 * xs[2] - xs[3]) / (12 * eps)
        it.iternext()
    return g


def check(f, x, rtol=2e-2, atol=2e-3):
    g_ad = np.asarray(jax.grad(lambda v: f(v).astype(jnp.float32))(jnp.asarray(x, jnp.float32)))
    g_fd = fd_grad(lambda v: f(v), x)
    np.testing.assert_allclose(g_ad, g_fd, rtol=rtol, atol=atol)


def test_grad_elementwise_chain():
    x = RNG.standard_normal((3, 4)).astype(np.float32)
    check(lambda v: jnp.sum(ops.gelu(v) * ops.silu(v) + ops.sqr(v)), x)


def test_grad_mul_mat():
    # reference: test-mul-mat0.c gradient checks via build_backward
    a = RNG.standard_normal((4, 6)).astype(np.float32)
    x = RNG.standard_normal((3, 6)).astype(np.float32)
    check(lambda v: jnp.sum(ops.mul_mat(jnp.asarray(a), v) ** 2) / 10, x)


def test_grad_norms():
    x = (RNG.standard_normal((2, 8)) * 2).astype(np.float32)
    check(lambda v: jnp.sum(ops.rms_norm(v) * 0.5), x)
    check(lambda v: jnp.sum(ops.norm(v)), x, rtol=5e-2, atol=5e-3)


def test_grad_soft_max_ext():
    x = RNG.standard_normal((1, 2, 3, 5)).astype(np.float32)
    check(lambda v: jnp.sum(ops.soft_max_ext(v, scale=0.7) * jnp.arange(5.0)), x)


def test_grad_flash_attn():
    q = RNG.standard_normal((1, 2, 4, 8)).astype(np.float32) * 0.5
    k = jnp.asarray(RNG.standard_normal((1, 2, 6, 8)).astype(np.float32) * 0.5)
    v = jnp.asarray(RNG.standard_normal((1, 2, 6, 8)).astype(np.float32) * 0.5)
    check(lambda qq: jnp.sum(ops.flash_attn_ext(qq, k, v, scale=0.35) * 0.1), q, rtol=5e-2, atol=5e-3)


def test_grad_cross_entropy():
    logits = RNG.standard_normal((4, 7)).astype(np.float32)
    labels = jnp.asarray(np.eye(7, dtype=np.float32)[RNG.integers(0, 7, 4)])
    check(lambda v: ops.cross_entropy_loss(v, labels).reshape(()), logits)


def test_grad_conv2d():
    x = RNG.standard_normal((1, 1, 6, 6)).astype(np.float32)  # ggml-layout input
    w = jnp.asarray(RNG.standard_normal((2, 1, 3, 3)).astype(np.float32) * 0.5)
    check(lambda v: jnp.sum(ops.conv_2d(v, w) ** 2) / 10, x, rtol=5e-2, atol=5e-3)


def test_grad_rope():
    x = RNG.standard_normal((1, 3, 2, 8)).astype(np.float32)
    pos = jnp.arange(3, dtype=jnp.int32)
    check(lambda v: jnp.sum(ops.rope_ext(v, pos, n_dims=8) * 0.3), x)


def test_grad_im2col_and_pool():
    """Gradients through im2col and pool_2d — the ops whose reference
    adjoints are the hand-written IM2COL_BACK / POOL_2D_BACK kernels
    (include/ggml.h op enum); here jax.grad derives them."""
    x = RNG.standard_normal((1, 2, 6, 6)).astype(np.float32)
    check(lambda v: jnp.sum(ops.im2col(v, 3, 3, 1, 1, 1, 1) * 0.1), x)
    check(lambda v: jnp.sum(ops.pool_2d(v, "avg", 2, 2, 0) * 0.3), x)


def test_grad_repeat_and_get_rows():
    """REPEAT_BACK (sum over repeats) and GET_ROWS_BACK (scatter-add) fall
    out of jax.grad over our repeat/get_rows."""
    x = RNG.standard_normal((2, 3)).astype(np.float32)
    check(lambda v: jnp.sum(ops.repeat(v, (4, 3)) * jnp.arange(12.0).reshape(4, 3)), x)
    tbl = RNG.standard_normal((5, 4)).astype(np.float32)
    ids = jnp.asarray([1, 3, 1], jnp.int32)
    check(lambda v: jnp.sum(ops.get_rows(v, ids) * 0.5), tbl)
