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
