"""Pallas flash attention (online-softmax, tiled) for TPU.

TPU-native analog of ggml's fused FLASH_ATTN_EXT op (reference:
include/ggml.h:1785-1809; CPU impl src/ggml-cpu/ggml-cpu.c:10805-11020; CUDA
fattn-*.cu). Semantics match ggml_tpu.ops.core.flash_attn_ext exactly:
additive fp32 mask (ggml KQ mask), ALiBi via per-head slope * mask, optional
logit softcap applied before the mask, GQA head broadcast, fp32 accumulation.

Tiling: grid (batch, head, q_tiles, kv_tiles) with the kv dimension innermost
("arbitrary"); the running max/denominator/accumulator live in VMEM scratch
across kv steps — O(seq) memory, exactly the online-softmax recurrence the
reference implements scalar-wise, here expressed per (bq, bkv) tile so the
QK^T and PV products run on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qmatmul import _interpret_default, _pick_tile

_NEG_INF = -1e30  # finite "minus infinity": keeps exp() NaN-free on fully-masked tiles


def _fa_kernel(slopes, q, k, v, mask, o, m_scr, l_scr, acc, *, scale, softcap, have_mask):
    ik = pl.program_id(3)
    n_kv_tiles = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc[:] = jnp.zeros_like(acc)

    qf = q[0, 0].astype(jnp.float32)
    kf = k[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        qf, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bkv)
    if softcap != 0.0:
        s = jnp.tanh(s * (scale / softcap)) * softcap
    else:
        s = s * scale
    if have_mask:
        s = s + slopes[pl.program_id(1)] * mask[:].astype(jnp.float32)

    m_prev = m_scr[:, :1]  # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == n_kv_tiles - 1)
    def _():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        # fully-masked rows never raised the running max off its -1e30 init:
        # emit zeros (not sum(v)/l — every p was exp(0) against the sentinel)
        dead = m_scr[:, :1] <= _NEG_INF * 0.5
        o[0, 0] = jnp.where(dead, 0.0, acc[:] / l).astype(o.dtype)


def flash_attention(
    q,
    k,
    v,
    mask=None,
    scale: float = 1.0,
    max_bias: float = 0.0,
    logit_softcap: float = 0.0,
    interpret: bool | None = None,
):
    """Fused attention. q (b,h,nq,d), k/v (b,h_kv,nkv,d), mask (nq', nkv)
    additive fp32 (nq' >= nq). Returns (b, nq, h, d_v) like ops.core.flash_attn_ext."""
    from ..ops.core import alibi_slopes

    if interpret is None:
        interpret = _interpret_default()
    b, h, n_q, d = q.shape
    _, h_kv, n_kv, d_v = v.shape
    rep = h // h_kv

    # Mosaic tiling wants sublane multiples of 8 and lane-friendly kv tiles:
    # pad ragged q rows (sliced off afterwards) and ragged kv columns (masked
    # to -inf so they contribute exp(-inf)=0 to the online softmax).
    nkv_pad = -(-n_kv // 32) * 32
    bq = _pick_tile(-(-n_q // 8) * 8, (256, 128, 64, 32, 16, 8))
    bkv = _pick_tile(nkv_pad, (512, 256, 128, 64, 32))
    nq_pad = -(-n_q // bq) * bq
    if nq_pad != n_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nq_pad - n_q), (0, 0)))
    have_mask = mask is not None or nkv_pad != n_kv
    if nkv_pad != n_kv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, nkv_pad - n_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, nkv_pad - n_kv), (0, 0)))

    if have_mask:
        m = (
            mask[..., :n_q, :].astype(jnp.float32).reshape(n_q, n_kv)
            if mask is not None
            else jnp.zeros((n_q, n_kv), jnp.float32)
        )
        mask = jnp.pad(
            m, ((0, nq_pad - n_q), (0, nkv_pad - n_kv)), constant_values=_NEG_INF
        )
    else:
        mask = jnp.zeros((bq, bkv), jnp.float32)  # dummy block, never read
    n_kv = nkv_pad
    slopes = (
        alibi_slopes(h, max_bias).astype(jnp.float32)
        if max_bias > 0.0
        else jnp.ones((h,), jnp.float32)
    )

    grid = (b, h, nq_pad // bq, n_kv // bkv)
    kern = functools.partial(
        _fa_kernel, scale=scale, softcap=logit_softcap, have_mask=have_mask
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, iq, ik, *_: (bb, hh, iq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), lambda bb, hh, iq, ik, *_: (bb, hh // rep, ik, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d_v), lambda bb, hh, iq, ik, *_: (bb, hh // rep, ik, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bq, bkv),
                (lambda bb, hh, iq, ik, *_: (iq, ik)) if have_mask else (lambda bb, hh, iq, ik, *_: (0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d_v), lambda bb, hh, iq, ik, *_: (bb, hh, iq, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d_v), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, nq_pad, d_v), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq_pad * n_kv * d,
            bytes_accessed=2 * b * h_kv * n_kv * d * 2 + b * h * nq_pad * d * 4,
            transcendentals=b * h * nq_pad * n_kv,
        ),
        interpret=interpret,
    )(slopes, q, k, v, mask)

    out = out[:, :, :n_q]
    return jnp.transpose(out, (0, 2, 1, 3))


# -- training: fused backward (the GGML_OP_FLASH_ATTN_BACK analog) ------------
#
# reference: ggml_flash_attn_back (include/ggml.h:1797, CPU impl
# src/ggml-cpu/ggml-cpu.c flash_attn_back) — ggml recomputes the full
# attention matrix in the backward.  Here: FlashAttention-2-style tiled
# backward from saved (O, logsumexp): memory stays O(seq) and both passes
# run on the MXU.  Supports mask/ALiBi/GQA like the forward; logit softcap
# is excluded (fall back to jax.grad over ops.core.flash_attn_ext).


def _fa_fwd_lse_kernel(slopes, q, k, v, mask, o, lse, m_scr, l_scr, acc, *,
                       scale, have_mask):
    ik = pl.program_id(3)
    n_kv_tiles = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc[:] = jnp.zeros_like(acc)

    qf = q[0, 0].astype(jnp.float32)
    kf = k[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        qf, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if have_mask:
        s = s + slopes[pl.program_id(1)] * mask[:].astype(jnp.float32)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == n_kv_tiles - 1)
    def _():
        l = l_scr[:, :1]
        dead = l == 0.0
        o[0, 0] = jnp.where(dead, 0.0, acc[:] / jnp.where(dead, 1.0, l)).astype(o.dtype)
        # dead rows get lse=+big so the backward's exp(s - lse) underflows to 0
        lse_v = jnp.where(dead, -_NEG_INF, m_scr[:, :1] + jnp.log(jnp.where(dead, 1.0, l)))
        lse[0, 0] = jnp.broadcast_to(lse_v, lse[0, 0].shape)


def _fa_bwd_dq_kernel(slopes, q, k, v, mask, do, lse, delta, dq, dq_acc, *,
                      scale, have_mask):
    ik = pl.program_id(3)
    n_kv_tiles = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    qf = q[0, 0].astype(jnp.float32)
    kf = k[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        qf, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if have_mask:
        s = s + slopes[pl.program_id(1)] * mask[:].astype(jnp.float32)
    p = jnp.exp(s - lse[0, 0][:, :1])  # (bq, bkv)
    dof = do[0, 0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        dof, v[0, 0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta[0, 0][:, :1]) * scale
    dq_acc[:] += jax.lax.dot_general(
        ds, kf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ik == n_kv_tiles - 1)
    def _():
        dq[0, 0] = dq_acc[:].astype(dq.dtype)


def _fa_bwd_dkv_kernel(slopes, q, k, v, mask, do, lse, delta, dk, dv,
                       dk_acc, dv_acc, *, scale, have_mask):
    iq = pl.program_id(3)
    n_q_tiles = pl.num_programs(3)

    @pl.when(iq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    qf = q[0, 0].astype(jnp.float32)
    kf = k[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        qf, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if have_mask:
        s = s + slopes[pl.program_id(1)] * mask[:].astype(jnp.float32)
    p = jnp.exp(s - lse[0, 0][:, :1])  # (bq, bkv)
    dof = do[0, 0].astype(jnp.float32)
    dv_acc[:] += jax.lax.dot_general(
        p, dof, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        dof, v[0, 0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta[0, 0][:, :1]) * scale  # (bq, bkv)
    dk_acc[:] += jax.lax.dot_general(
        ds, qf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(iq == n_q_tiles - 1)
    def _():
        dk[0, 0] = dk_acc[:].astype(dk.dtype)
        dv[0, 0] = dv_acc[:].astype(dv.dtype)


def _fa_setup(q, k, v, mask, n_q, n_kv):
    """Shared padding/tiling for the training kernels.  Padded q rows and kv
    columns are masked to -inf: their p underflows to exactly 0 in both
    passes, so gradients of real rows are unpolluted."""
    nkv_pad = -(-n_kv // 32) * 32
    bq = _pick_tile(-(-n_q // 8) * 8, (256, 128, 64, 32, 16, 8))
    bkv = _pick_tile(nkv_pad, (512, 256, 128, 64, 32))
    nq_pad = -(-n_q // bq) * bq
    if nq_pad != n_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nq_pad - n_q), (0, 0)))
    have_mask = mask is not None or nkv_pad != n_kv or nq_pad != n_q
    if nkv_pad != n_kv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, nkv_pad - n_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, nkv_pad - n_kv), (0, 0)))
    if have_mask:
        m = (
            mask[..., :n_q, :].astype(jnp.float32).reshape(n_q, n_kv)
            if mask is not None
            else jnp.zeros((n_q, n_kv), jnp.float32)
        )
        mask = jnp.pad(
            m, ((0, nq_pad - n_q), (0, nkv_pad - n_kv)), constant_values=_NEG_INF
        )
    else:
        mask = jnp.zeros((bq, bkv), jnp.float32)
    return q, k, v, mask, have_mask, bq, bkv, nq_pad, nkv_pad


def _fa_specs(bq, bkv, d, d_v, rep, have_mask, kv_inner: bool):
    """Block specs for (q, k, v, mask, ...) with either kv or q innermost."""
    if kv_inner:
        qi = lambda bb, hh, io, ii, *_: (bb, hh, io, 0)
        ki = lambda bb, hh, io, ii, *_: (bb, hh // rep, ii, 0)
        mi = (lambda bb, hh, io, ii, *_: (io, ii)) if have_mask else (lambda *a: (0, 0))
    else:
        qi = lambda bb, hh, io, ii, *_: (bb, hh, ii, 0)
        ki = lambda bb, hh, io, ii, *_: (bb, hh // rep, io, 0)
        mi = (lambda bb, hh, io, ii, *_: (ii, io)) if have_mask else (lambda *a: (0, 0))
    return (
        pl.BlockSpec((1, 1, bq, d), qi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bkv, d), ki, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bkv, d_v), ki, memory_space=pltpu.VMEM),
        pl.BlockSpec((bq, bkv), mi, memory_space=pltpu.VMEM),
        qi,
    )


def _fa_forward_lse(q, k, v, mask, scale, max_bias, interpret):
    from ..ops.core import alibi_slopes

    b, h, n_q, d = q.shape
    _, h_kv, n_kv, d_v = v.shape
    rep = h // h_kv
    q, k, v, mask, have_mask, bq, bkv, nq_pad, nkv_pad = _fa_setup(
        q, k, v, mask, n_q, n_kv
    )
    slopes = (
        alibi_slopes(h, max_bias).astype(jnp.float32)
        if max_bias > 0.0 else jnp.ones((h,), jnp.float32)
    )
    qs, ks, vs, ms, qi = _fa_specs(bq, bkv, d, d_v, rep, have_mask, kv_inner=True)
    grid = (b, h, nq_pad // bq, nkv_pad // bkv)
    out, lse = pl.pallas_call(
        functools.partial(_fa_fwd_lse_kernel, scale=scale, have_mask=have_mask),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[qs, ks, vs, ms],
            out_specs=[
                pl.BlockSpec((1, 1, bq, d_v), qi, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bq, 128), qi, memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d_v), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nq_pad, d_v), q.dtype),
            jax.ShapeDtypeStruct((b, h, nq_pad, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
        interpret=interpret,
    )(slopes, q, k, v, mask)
    return out, lse  # padded (sliced by callers)


def flash_attention_train(q, k, v, mask=None, scale: float = 1.0,
                          max_bias: float = 0.0, interpret: bool | None = None):
    """Differentiable fused attention: same semantics/layout as
    flash_attention (softcap excluded), with a tiled Pallas backward from
    saved (O, logsumexp) — O(seq) memory both ways, the production
    long-context TRAINING path.  Gradients flow to q/k/v (the mask is
    treated as a constant, like the reference's KQ mask)."""
    if interpret is None:
        interpret = _interpret_default()
    return _fa_train(q, k, v, mask, scale, max_bias, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fa_train(q, k, v, mask, scale, max_bias, interpret):
    o, _ = _fa_forward_lse(q, k, v, mask, scale, max_bias, interpret)
    n_q = q.shape[2]
    return jnp.transpose(o[:, :, :n_q], (0, 2, 1, 3))


def _fa_train_fwd(q, k, v, mask, scale, max_bias, interpret):
    o_pad, lse = _fa_forward_lse(q, k, v, mask, scale, max_bias, interpret)
    n_q = q.shape[2]
    out = jnp.transpose(o_pad[:, :, :n_q], (0, 2, 1, 3))
    return out, (q, k, v, mask, o_pad, lse)


def _fa_train_bwd(scale, max_bias, interpret, res, g):
    from ..ops.core import alibi_slopes

    q, k, v, mask, o_pad, lse = res
    b, h, n_q, d = q.shape
    _, h_kv, n_kv, d_v = v.shape
    rep = h // h_kv
    qp, kp, vp, maskp, have_mask, bq, bkv, nq_pad, nkv_pad = _fa_setup(
        q, k, v, mask, n_q, n_kv
    )
    do = jnp.transpose(g, (0, 2, 1, 3))  # back to (b, h, n_q, d_v)
    if nq_pad != n_q:
        do = jnp.pad(do, ((0, 0), (0, 0), (0, nq_pad - n_q), (0, 0)))
    # delta_i = rowsum(dO_i * O_i) — cheap O(n d) jnp; broadcast to the lane
    # width the kernels read
    delta = jnp.sum(do.astype(jnp.float32) * o_pad.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 128))
    slopes = (
        alibi_slopes(h, max_bias).astype(jnp.float32)
        if max_bias > 0.0 else jnp.ones((h,), jnp.float32)
    )

    qs, ks, vs, ms, qi = _fa_specs(bq, bkv, d, d_v, rep, have_mask, kv_inner=True)
    lse_spec = pl.BlockSpec((1, 1, bq, 128), qi, memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((1, 1, bq, d_v), qi, memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_fa_bwd_dq_kernel, scale=scale, have_mask=have_mask),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, nq_pad // bq, nkv_pad // bkv),
            in_specs=[qs, ks, vs, ms, do_spec, lse_spec, lse_spec],
            out_specs=pl.BlockSpec((1, 1, bq, d), qi, memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, nq_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
        interpret=interpret,
    )(slopes, qp, kp, vp, maskp, do, lse, delta)

    qs2, ks2, vs2, ms2, qi2 = _fa_specs(bq, bkv, d, d_v, rep, have_mask, kv_inner=False)
    ki2 = lambda bb, hh, io, ii, *_: (bb, hh // rep, io, 0)
    ko2 = lambda bb, hh, io, ii, *_: (bb, hh, io, 0)  # per q-head; summed below
    lse_spec2 = pl.BlockSpec((1, 1, bq, 128), qi2, memory_space=pltpu.VMEM)
    do_spec2 = pl.BlockSpec((1, 1, bq, d_v), qi2, memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_fa_bwd_dkv_kernel, scale=scale, have_mask=have_mask),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, nkv_pad // bkv, nq_pad // bq),
            in_specs=[qs2, ks2, vs2, ms2, do_spec2, lse_spec2, lse_spec2],
            out_specs=[
                pl.BlockSpec((1, 1, bkv, d), ko2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bkv, d_v), ko2, memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((bkv, d), jnp.float32),
                pltpu.VMEM((bkv, d_v), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nkv_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, nkv_pad, d_v), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
        interpret=interpret,
    )(slopes, qp, kp, vp, maskp, do, lse, delta)

    dq = dq[:, :, :n_q]
    # GQA: per-q-head dk/dv reduce onto their shared kv head
    dk = dk[:, :, :n_kv].reshape(b, h_kv, rep, n_kv, d).sum(2).astype(k.dtype)
    dv = dv[:, :, :n_kv].reshape(b, h_kv, rep, n_kv, d_v).sum(2).astype(v.dtype)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dmask


_fa_train.defvjp(_fa_train_fwd, _fa_train_bwd)
