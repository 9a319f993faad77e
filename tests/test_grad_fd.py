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


# -- recurrent-op gradients (VERDICT r4: MODE_GRAD breadth) -------------------
# The reference FD-checks essentially every op case
# (tests/test-backend-ops.cpp:732 eval_grad); these cover the recurrent /
# transposed-conv / pool families that were previously ungated.


def test_grad_ssm_scan():
    """Mamba selective scan: gradients flow through the lax.scan recurrence
    to every input (x, dt, B, C, state)."""
    n_s, n_t, d_in, d_st = 1, 3, 2, 4
    s0 = jnp.asarray(RNG.standard_normal((n_s, d_in, d_st)).astype(np.float32) * 0.1)
    A = jnp.asarray(-np.abs(RNG.standard_normal((d_in, d_st))).astype(np.float32))
    dt = jnp.asarray(RNG.standard_normal((n_s, n_t, d_in)).astype(np.float32) * 0.5)
    B = jnp.asarray(RNG.standard_normal((n_s, n_t, d_st)).astype(np.float32) * 0.5)
    C = jnp.asarray(RNG.standard_normal((n_s, n_t, d_st)).astype(np.float32) * 0.5)
    x = RNG.standard_normal((n_s, n_t, d_in)).astype(np.float32) * 0.5

    def f(v):
        y, s_out = ops.ssm_scan(s0, v, dt, A, B, C)
        return jnp.sum(y * 0.3) + jnp.sum(s_out * 0.1)

    check(f, x, rtol=5e-2, atol=5e-3)
    # and w.r.t. dt (through the softplus + exp discretization)
    dtv = np.asarray(dt)
    check(lambda v: jnp.sum(ops.ssm_scan(s0, jnp.asarray(x), v, A, B, C)[0] * 0.3),
          dtv, rtol=5e-2, atol=5e-3)


def test_grad_rwkv_wkv6():
    """RWKV-6 WKV recurrence: gradients w.r.t. k and the decay td."""
    b, t, h, s = 1, 3, 1, 4
    v = jnp.asarray(RNG.standard_normal((b, t, h, s)).astype(np.float32) * 0.5)
    r = jnp.asarray(RNG.standard_normal((b, t, h, s)).astype(np.float32) * 0.5)
    tf = jnp.asarray(RNG.standard_normal((h, s)).astype(np.float32) * 0.5)
    td = jnp.asarray((RNG.random((b, t, h, s)) * 0.5 + 0.4).astype(np.float32))
    st = jnp.asarray(RNG.standard_normal((b, h, s, s)).astype(np.float32) * 0.1)
    k = RNG.standard_normal((b, t, h, s)).astype(np.float32) * 0.5

    def f(kk):
        y, s_out = ops.rwkv_wkv6(kk, v, r, tf, td, st)
        return jnp.sum(y * 0.3) + jnp.sum(s_out * 0.05)

    check(f, k, rtol=5e-2, atol=5e-3)
    tdv = np.asarray(td)
    check(lambda x: jnp.sum(ops.rwkv_wkv6(jnp.asarray(k), v, r, tf, x, st)[0] * 0.3),
          tdv, rtol=5e-2, atol=5e-3)


def test_grad_gated_linear_attn():
    b, t, h, s = 1, 3, 1, 4
    v = jnp.asarray(RNG.standard_normal((b, t, h, s)).astype(np.float32) * 0.5)
    q = jnp.asarray(RNG.standard_normal((b, t, h, s)).astype(np.float32) * 0.5)
    g = jnp.asarray((RNG.random((b, t, h, s)) * 0.5 + 0.4).astype(np.float32))
    st = jnp.asarray(RNG.standard_normal((b, h, s, s)).astype(np.float32) * 0.1)
    k = RNG.standard_normal((b, t, h, s)).astype(np.float32) * 0.5

    def f(kk):
        y, s_out = ops.gated_linear_attn(kk, v, q, g, st, scale=0.5)
        return jnp.sum(y * 0.3) + jnp.sum(s_out * 0.05)

    check(f, k, rtol=5e-2, atol=5e-3)
    gv = np.asarray(g)
    check(lambda x: jnp.sum(
        ops.gated_linear_attn(jnp.asarray(k), v, q, x, st, scale=0.5)[0] * 0.3),
        gv, rtol=5e-2, atol=5e-3)


def test_grad_conv_transpose_1d():
    """CONV_TRANSPOSE_1D adjoints (w.r.t. input AND kernel) — the reference
    has no backward for this op at all; jax.grad derives both."""
    x = RNG.standard_normal((1, 2, 5)).astype(np.float32) * 0.5
    w = jnp.asarray(RNG.standard_normal((2, 3, 3)).astype(np.float32) * 0.5)
    check(lambda v: jnp.sum(ops.conv_transpose_1d(v, w, s=2) ** 2) / 10, x,
          rtol=5e-2, atol=5e-3)
    wv = np.asarray(w)
    xj = jnp.asarray(x)
    check(lambda v: jnp.sum(ops.conv_transpose_1d(xj, v, s=2) ** 2) / 10, wv,
          rtol=5e-2, atol=5e-3)


def test_grad_conv_transpose_2d():
    x = RNG.standard_normal((1, 2, 4, 4)).astype(np.float32) * 0.5
    w = jnp.asarray(RNG.standard_normal((2, 2, 3, 3)).astype(np.float32) * 0.5)
    check(lambda v: jnp.sum(ops.conv_transpose_2d(v, w, stride=2) ** 2) / 10, x,
          rtol=5e-2, atol=5e-3)
    wv = np.asarray(w)
    xj = jnp.asarray(x)
    check(lambda v: jnp.sum(ops.conv_transpose_2d(xj, v, stride=2) ** 2) / 10, wv,
          rtol=5e-2, atol=5e-3)


def test_grad_pool_1d_and_max_pool():
    """POOL back-passes: avg (uniform scatter) and max (argmax scatter —
    FD needs points away from ties, so inputs are well-separated)."""
    x = (np.arange(12, dtype=np.float32).reshape(1, 2, 6) * 0.7
         + RNG.standard_normal((1, 2, 6)).astype(np.float32) * 0.05)
    check(lambda v: jnp.sum(ops.pool_1d(v, "avg", 2, 2) * 0.5), x)
    check(lambda v: jnp.sum(ops.pool_1d(v, "max", 2, 2) * 0.5), x)
    x2 = (np.arange(32, dtype=np.float32).reshape(1, 2, 4, 4) * 0.7
          + RNG.standard_normal((1, 2, 4, 4)).astype(np.float32) * 0.05)
    check(lambda v: jnp.sum(ops.pool_2d(v, "max", 2, 2, 0) * 0.5), x2)


def test_grad_flash_attn_vjp_vs_xla():
    """The fused flash-attention custom VJP (kernels.flash_attn.
    flash_attention_train, tiled Pallas backward from saved O/logsumexp)
    against jax.grad of the XLA einsum attention — same math, independent
    derivations, must agree to fp32 tolerance for q, k AND v."""
    from ggml_tpu.kernels.flash_attn import flash_attention_train

    b, h, nq, nkv, d = 1, 2, 8, 8, 8
    q = jnp.asarray(RNG.standard_normal((b, h, nq, d)).astype(np.float32) * 0.5)
    k = jnp.asarray(RNG.standard_normal((b, h, nkv, d)).astype(np.float32) * 0.5)
    v = jnp.asarray(RNG.standard_normal((b, h, nkv, d)).astype(np.float32) * 0.5)
    scale = 0.35

    def loss_fused(q, k, v):
        return jnp.sum(flash_attention_train(q, k, v, scale=scale,
                                             interpret=True) ** 2)

    def loss_xla(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       precision=jax.lax.Precision.HIGHEST) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bqhd", p, v,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(o ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
