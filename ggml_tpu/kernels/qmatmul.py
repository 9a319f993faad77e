"""Fused dequant x matmul Pallas kernels over planar-repacked weights.

TPU-native replacement for ggml's quantized matmul kernels
(reference: src/ggml-cpu/ggml-cpu.c:7428 ggml_compute_forward_mul_mat with
per-type vec_dot, src/ggml-cuda/mmq.cu). Weights live in HBM as integer code
planes (4-bit packed or int8) plus per-group fp32 scales, K-major (see
ggml_tpu.quant.planar). Each grid step streams a (bk, bn) code tile into VMEM,
dequantizes on the VPU (codes -> f32 * sublane-broadcast scales -> bf16), and
feeds the MXU, accumulating the (M, bn) output tile in fp32 across the K grid
dimension. HBM traffic is therefore ~bits-per-weight — the same win that makes
ggml's vec_dot kernels fast on CPU, achieved via layout + fusion rather than
SIMD intrinsics.

The affine offset term (Q4_1/Q4_K/... minima) is added OUTSIDE the kernel as
xsum @ offsets — mathematically exact, and XLA fuses this tiny side matmul.

Mosaic tiling constraints shape the design: scale tiles must have sublane
counts that are multiples of 8 or span the full array, so q4 scales are stored
plane-major (2, K/2/G, N) and the K tile either satisfies (bk/G) % 8 == 0 or
covers all of K in one grid step.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.planar import PlanarWeight


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.cache
def _interpret_default() -> bool:
    return not _on_tpu()


def _pick_tile(total: int, candidates: tuple[int, ...], multiple_of: int = 1) -> int:
    for c in candidates:
        if c <= total and total % c == 0 and c % multiple_of == 0:
            return c
    return total


def _pick_k_tile(k: int, g: int, max_tile: int = 1024) -> int:
    """K tile: divides k, multiple of g, and scale-rows (bk/g) a multiple of 8
    (Mosaic sublane granularity) — else fall back to the whole K per step.
    max_tile bounds VMEM: the kernel holds codes + f32 + bf16 dequant tiles."""
    for c in (2048, 1536, 1024, 768, 512, 384, 256):
        if c <= min(k, max_tile) and k % c == 0 and c % g == 0 and (c // g) % 8 == 0:
            return c
    return k


def _expand_groups(s, g: int):
    """(rows, bn) group scales -> (rows*g, bn), broadcasting along sublanes."""
    r, bn = s.shape
    return jnp.broadcast_to(s[:, None, :], (r, g, bn)).reshape(r * g, bn)


# ---------------------------------------------------------------------------
# q4 plane: packed nibbles. codes (K/2, N) uint8; element k<K/2 in low nibble,
# k+K/2 in high nibble of the same byte -> the two halves contract separately.
# scales (2, K/2/G, N): plane-major, fp32.
# ---------------------------------------------------------------------------


def _q4_kernel(x_lo, x_hi, qp, s_lo, s_hi, out, *, G: int):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    codes = qp[:].astype(jnp.int32)  # Mosaic: no direct uint8 -> f32 cast
    lo = (codes & 0xF).astype(jnp.float32)
    hi = (codes >> 4).astype(jnp.float32)
    w_lo = (lo * _expand_groups(s_lo[0].astype(jnp.float32), G)).astype(jnp.bfloat16)
    w_hi = (hi * _expand_groups(s_hi[0].astype(jnp.float32), G)).astype(jnp.bfloat16)
    acc = jnp.dot(x_lo[:], w_lo, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(x_hi[:], w_hi, preferred_element_type=jnp.float32)
    out[:] += acc


def _q4_matmul(x, codes, scales, G: int, interpret: bool):
    m, k = x.shape
    k2, npad = codes.shape
    assert k == 2 * k2
    bn = _pick_tile(npad, (512, 384, 256, 128))
    bk2 = _pick_k_tile(k2, G, max_tile=512)  # two dequant planes live in VMEM
    n_ktiles = k2 // bk2
    grid = (npad // bn, n_ktiles)
    sg = bk2 // G

    return pl.pallas_call(
        functools.partial(_q4_kernel, G=G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk2), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, bk2), lambda i, kk: (0, kk + n_ktiles), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk2, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sg, bn), lambda i, kk: (0, kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sg, bn), lambda i, kk: (1, kk, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * npad,
            bytes_accessed=k2 * npad + scales.nbytes + m * k * 2 + m * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, codes, scales, scales)


# ---------------------------------------------------------------------------
# q8 plane: int8 codes (K, N), scales (K/G, N).
# ---------------------------------------------------------------------------


def _q8_kernel(x, q, s, out, *, G: int):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    w = (q[:].astype(jnp.int32).astype(jnp.float32) * _expand_groups(s[:].astype(jnp.float32), G)).astype(jnp.bfloat16)
    out[:] += jnp.dot(x[:], w, preferred_element_type=jnp.float32)


def _q8_matmul(x, codes, scales, G: int, interpret: bool):
    m, k = x.shape
    kk_, npad = codes.shape
    assert k == kk_
    bn = _pick_tile(npad, (512, 384, 256, 128))
    bk = _pick_k_tile(k, G, max_tile=1024)
    grid = (npad // bn, k // bk)
    sg = bk // G

    return pl.pallas_call(
        functools.partial(_q8_kernel, G=G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * npad,
            bytes_accessed=k * npad + scales.nbytes + m * k * 2 + m * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, codes, scales)


# ---------------------------------------------------------------------------
# int8 GEMV: decode-path speed of light.
#
# The v1 kernels above dequantize every element on the VPU — fine for prefill
# (amortized over many rows) but the bottleneck for M=1 decode: the VPU
# processes 32-bit lanes, so per-element dequant costs ~6 lane-ops x K x N per
# token. This kernel is ggml's vec_dot_type trick (quantize activations to Q8,
# integer dot; reference: src/ggml-cpu/ggml-cpu.c:7447-7471) mapped to the MXU:
# int8 codes stream from HBM STRAIGHT into int8 x int8 -> int32 MXU dots, one
# 32-element quant group per grid step, and the fp32 group scale multiplies the
# per-group partial sum — per-GROUP VPU work instead of per-element.
#
# Activations are quantized per row outside (sx = amax/127), applied after.
# ---------------------------------------------------------------------------


def _q8gemv_kernel(xq, q, s, out, *, G: int, ng: int = 8):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    xv = xq[:]
    qv = q[:]
    sv = s[:].astype(jnp.float32)  # scales may be stored bf16 in HBM
    acc = out[:]
    for j in range(ng):  # quant groups per k step, statically unrolled
        p = jax.lax.dot_general(
            xv[:, j * G : (j + 1) * G],
            qv[j * G : (j + 1) * G, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (M, bn) int32
        acc = acc + p.astype(jnp.float32) * sv[j : j + 1, :]
    out[:] = acc


def _q8gemv_off_kernel(xq, q, s, o, out, *, G: int, ng: int = 8):
    """q8 GEMV with the affine-offset term fused: the group offset multiplies
    the group's activation sum inside the kernel (y += Σxq_g · o_g; the
    per-row activation scale applied outside covers both terms), replacing a
    separate xsum @ offsets pass over the activations + an extra dispatch."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    xv = xq[:]
    qv = q[:]
    sv = s[:].astype(jnp.float32)
    ov = o[:].astype(jnp.float32)
    acc = out[:]
    for j in range(ng):
        xg = xv[:, j * G : (j + 1) * G]
        p = jax.lax.dot_general(
            xg, qv[j * G : (j + 1) * G, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc = acc + p.astype(jnp.float32) * sv[j : j + 1, :] + xsum * ov[j : j + 1, :]
    out[:] = acc


import os

_GEMV_VMEM = int(os.environ.get("GGML_TPU_GEMV_VMEM_MB", "0"))  # 0 = Mosaic default


def _gemv_compiler_params():
    kw = dict(dimension_semantics=("parallel", "arbitrary"))
    if _GEMV_VMEM:
        kw["vmem_limit_bytes"] = _GEMV_VMEM * 1024 * 1024
    return pltpu.CompilerParams(**kw)


_GEMV_BN = tuple(int(v) for v in os.environ.get("GGML_TPU_GEMV_BN", "2048,1024,512,384,256,128").split(","))
_GEMV_GROUPS = int(os.environ.get("GGML_TPU_GEMV_GROUPS", "32"))  # groups per k step


def _q8_gemv(xq, codes, scales, G: int, interpret: bool, offsets=None):
    m, k = xq.shape
    _, npad = codes.shape
    bn = _pick_tile(npad, _GEMV_BN)
    n_groups = k // G
    ng = _GEMV_GROUPS if n_groups % _GEMV_GROUPS == 0 else 8
    kt = ng * G  # xq lane-tile >= 128, scale tile rows multiple of 8
    assert n_groups % 8 == 0, f"n_groups={n_groups} must be a multiple of 8"
    grid = (npad // bn, k // kt)

    in_specs = [
        pl.BlockSpec((m, kt), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((kt, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((ng, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
    ]
    args = (xq, codes, scales)
    kern = functools.partial(_q8gemv_kernel, G=G, ng=ng)
    extra_bytes = 0
    if offsets is not None:
        in_specs.append(pl.BlockSpec((ng, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM))
        args = (xq, codes, scales, offsets)
        kern = functools.partial(_q8gemv_off_kernel, G=G, ng=ng)
        extra_bytes = offsets.nbytes

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=_gemv_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * npad,
            bytes_accessed=k * npad + scales.nbytes + extra_bytes + m * k + m * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _q4gemv_kernel(x_lo, x_hi, qp, s_lo, s_hi, out, *, G: int, ng: int):
    """Packed-nibble GEMV: the S4 path is broken on this platform, so int4
    codes ship two per byte (half-plane packing, quant/planar.py) and unpack
    on the VPU with shift/mask straight into int8 MXU dots.  Measured at the
    q8-half-bytes bound (tools/microbench_gemv_q4.py): the unpack is free and
    HBM code traffic halves vs the int8 GEMV."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    codes = qp[:].astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.int8)
    hi = (codes >> 4).astype(jnp.int8)
    sl = s_lo[0].astype(jnp.float32)
    sh = s_hi[0].astype(jnp.float32)
    xl, xh = x_lo[:], x_hi[:]
    acc = out[:]
    for j in range(ng):
        p = jax.lax.dot_general(
            xl[:, j * G : (j + 1) * G],
            lo[j * G : (j + 1) * G, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + p.astype(jnp.float32) * sl[j : j + 1, :]
        p = jax.lax.dot_general(
            xh[:, j * G : (j + 1) * G],
            hi[j * G : (j + 1) * G, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + p.astype(jnp.float32) * sh[j : j + 1, :]
    out[:] = acc


def _q4gemv_off_kernel(x_lo, x_hi, qp, s_lo, s_hi, o_lo, o_hi, out, *, G: int, ng: int):
    """Packed-nibble GEMV with the affine-offset term fused (see
    _q8gemv_off_kernel); offsets are stored in logical-k group rows, so the
    lo/hi halves read rows [0, K/2/G) and [K/2/G, K/G)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    codes = qp[:].astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.int8)
    hi = (codes >> 4).astype(jnp.int8)
    sl = s_lo[0].astype(jnp.float32)
    sh = s_hi[0].astype(jnp.float32)
    ol = o_lo[:].astype(jnp.float32)
    oh = o_hi[:].astype(jnp.float32)
    xl, xh = x_lo[:], x_hi[:]
    acc = out[:]
    for j in range(ng):
        xg = xl[:, j * G : (j + 1) * G]
        p = jax.lax.dot_general(
            xg, lo[j * G : (j + 1) * G, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc = acc + p.astype(jnp.float32) * sl[j : j + 1, :] + xsum * ol[j : j + 1, :]
        xg = xh[:, j * G : (j + 1) * G]
        p = jax.lax.dot_general(
            xg, hi[j * G : (j + 1) * G, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc = acc + p.astype(jnp.float32) * sh[j : j + 1, :] + xsum * oh[j : j + 1, :]
    out[:] = acc


def _q4gemv_bd_kernel(x_lo, x_hi, qp, s_lo, s_hi, out, *, G: int, ng: int):
    """Block-diagonal grouped-dot GEMV (M=1): the per-group loop issues 4x
    the minimum MXU passes because each dot has K=G=32 < 128; stacking the
    activation groups block-diagonally into the idle ROW dimension — lhs row
    g holds x_g at columns [g*G, (g+1)*G) — yields every per-group partial
    sum in ONE full-K dot: P = blockdiag(x) @ codes, then a VPU reduce
    y = sum_g P[g] * s[g]."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    codes = qp[:].astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.int8)
    hi = (codes >> 4).astype(jnp.int8)
    kt2 = ng * G
    gi = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2), 0)
    gk = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2), 1) // G
    mask = gi == gk

    def bd(x):  # (1, kt2) int8 -> (ng, kt2) block-diagonal
        # select in i32 (matching the iota mask's layout), truncate to i8
        # at the end: an i1 mask relayout from (8,128) to the i8 (32,128)
        # tiling is unsupported by Mosaic
        xb = jnp.broadcast_to(x.astype(jnp.int32), (ng, kt2))
        return jnp.where(mask, xb, 0).astype(jnp.int8)

    Pl = jax.lax.dot_general(bd(x_lo[:]), lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)  # (ng, bn)
    Ph = jax.lax.dot_general(bd(x_hi[:]), hi, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    sl = s_lo[0].astype(jnp.float32)
    sh = s_hi[0].astype(jnp.float32)
    contrib = Pl.astype(jnp.float32) * sl + Ph.astype(jnp.float32) * sh
    out[:] = out[:] + contrib.sum(axis=0, keepdims=True)


def _q4gemv_bd_off_kernel(x_lo, x_hi, qp, s_lo, s_hi, o_lo, o_hi, out, *, G: int, ng: int):
    """Block-diagonal variant with the affine-offset term fused (xsum per
    group rides the same VPU reduce)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    codes = qp[:].astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.int8)
    hi = (codes >> 4).astype(jnp.int8)
    kt2 = ng * G
    gi = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2), 0)
    gk = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2), 1) // G
    mask = gi == gk

    def bd(x):
        xb = jnp.broadcast_to(x.astype(jnp.int32), (ng, kt2))
        return jnp.where(mask, xb, 0).astype(jnp.int8)

    bdl = bd(x_lo[:])
    bdh = bd(x_hi[:])
    Pl = jax.lax.dot_general(bdl, lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    Ph = jax.lax.dot_general(bdh, hi, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    sl = s_lo[0].astype(jnp.float32)
    sh = s_hi[0].astype(jnp.float32)
    ol = o_lo[:].astype(jnp.float32)
    oh = o_hi[:].astype(jnp.float32)
    # per-group activation sums via the already-built block-diagonal rows
    # (a (1,kt2)->(ng,G) reshape is an unsupported Mosaic shape cast)
    xsl = bdl.astype(jnp.int32).sum(axis=1, keepdims=True).astype(jnp.float32)
    xsh = bdh.astype(jnp.int32).sum(axis=1, keepdims=True).astype(jnp.float32)
    contrib = (Pl.astype(jnp.float32) * sl + xsl * ol
               + Ph.astype(jnp.float32) * sh + xsh * oh)
    out[:] = out[:] + contrib.sum(axis=0, keepdims=True)


def _sb_expand(d, sb: int, ng: int, bn: int):
    """(ng/sb, bn) superblock plane -> (ng, bn) f32, element-repeat along
    sublanes (broadcast+reshape; pltpu.repeat is whole-array tile semantics)."""
    d = d.astype(jnp.float32)
    ng_sb = ng // sb
    return jnp.broadcast_to(d[:, None, :], (ng_sb, sb, bn)).reshape(ng, bn)


def _q4gemv_sb_kernel(x_lo, x_hi, qp, sc_lo, sc_hi, m_lo, m_hi,
                      d_lo, d_hi, dm_lo, dm_hi, out, *, G: int, ng: int, sb: int):
    """Per-group-loop q4 GEMV over COMPACT K-quant planes: int8 sub-scale/min
    codes per group + d/dmin per superblock of `sb` groups (reference
    block_q4_K factoring, src/ggml-common.h:279-290).  Effective planes are
    reconstructed once per tile in fp32 — the same arithmetic the reference
    dequantizer does, at 2.5-3 B/group of HBM traffic instead of 4."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    codes = qp[:].astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.int8)
    hi = (codes >> 4).astype(jnp.int8)
    bn = out.shape[-1]
    sl = _sb_expand(d_lo[0], sb, ng, bn) * sc_lo[0].astype(jnp.int32).astype(jnp.float32)
    sh = _sb_expand(d_hi[0], sb, ng, bn) * sc_hi[0].astype(jnp.int32).astype(jnp.float32)
    ol = -_sb_expand(dm_lo[0], sb, ng, bn) * m_lo[:].astype(jnp.int32).astype(jnp.float32)
    oh = -_sb_expand(dm_hi[0], sb, ng, bn) * m_hi[:].astype(jnp.int32).astype(jnp.float32)
    xl, xh = x_lo[:], x_hi[:]
    acc = out[:]
    for j in range(ng):
        xg = xl[:, j * G : (j + 1) * G]
        p = jax.lax.dot_general(xg, lo[j * G : (j + 1) * G, :],
                                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc = acc + p.astype(jnp.float32) * sl[j : j + 1, :] + xsum * ol[j : j + 1, :]
        xg = xh[:, j * G : (j + 1) * G]
        p = jax.lax.dot_general(xg, hi[j * G : (j + 1) * G, :],
                                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc = acc + p.astype(jnp.float32) * sh[j : j + 1, :] + xsum * oh[j : j + 1, :]
    out[:] = acc


def _q4gemv_bd_sb_kernel(x_lo, x_hi, qp, sc_lo, sc_hi, m_lo, m_hi,
                         d_lo, d_hi, dm_lo, dm_hi, out, *, G: int, ng: int, sb: int):
    """Block-diagonal q4 GEMV over compact K-quant planes (see
    _q4gemv_bd_kernel for the block-diagonal trick, _q4gemv_sb_kernel for the
    compact-plane math).  Measured on v5e 2026-08-19: 66.0 us vs 70.3 us for
    bf16 eff-scale planes at K=4096 N=16384 (tools/microbench_r3.py compact)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    codes = qp[:].astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.int8)
    hi = (codes >> 4).astype(jnp.int8)
    kt2 = ng * G
    bn = out.shape[-1]
    gi = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2), 0)
    gk = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2), 1) // G
    mask = gi == gk

    def bd(x):
        xb = jnp.broadcast_to(x.astype(jnp.int32), (ng, kt2))
        return jnp.where(mask, xb, 0).astype(jnp.int8)

    bdl = bd(x_lo[:])
    bdh = bd(x_hi[:])
    Pl = jax.lax.dot_general(bdl, lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    Ph = jax.lax.dot_general(bdh, hi, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    sl = _sb_expand(d_lo[0], sb, ng, bn) * sc_lo[0].astype(jnp.int32).astype(jnp.float32)
    sh = _sb_expand(d_hi[0], sb, ng, bn) * sc_hi[0].astype(jnp.int32).astype(jnp.float32)
    ol = -_sb_expand(dm_lo[0], sb, ng, bn) * m_lo[:].astype(jnp.int32).astype(jnp.float32)
    oh = -_sb_expand(dm_hi[0], sb, ng, bn) * m_hi[:].astype(jnp.int32).astype(jnp.float32)
    xsl = bdl.astype(jnp.int32).sum(axis=1, keepdims=True).astype(jnp.float32)
    xsh = bdh.astype(jnp.int32).sum(axis=1, keepdims=True).astype(jnp.float32)
    contrib = (Pl.astype(jnp.float32) * sl + xsl * ol
               + Ph.astype(jnp.float32) * sh + xsh * oh)
    out[:] = out[:] + contrib.sum(axis=0, keepdims=True)


def _q4gemv_bd_sb_qact_kernel(x_lo, x_hi, qp, sc_lo, sc_hi, m_lo, m_hi,
                              d_lo, d_hi, dm_lo, dm_hi, out, *, G: int,
                              ng: int, sb: int):
    """_q4gemv_bd_sb_kernel with the ACTIVATION QUANTIZATION fused in: x
    arrives bf16 and each K-tile quantizes to int8 with a per-tile scale
    right before the block-diagonal int8 dot.  Removes the per-matmul XLA
    glue (abs-max reduce, divide/round/clip, and the (1, N) * sx epilogue —
    ~2-3 fused ops of launch latency per site, x3 sites x 28 layers of the
    decode step); per-tile scales are finer than the old per-row scale, so
    accuracy only improves (same NMSE gates)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    def quant(x):  # (1, kt2) bf16 -> int8 codes + f32 scalar scale
        xf = x[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf))
        sx = jnp.where(amax == 0, 1.0, amax / 127.0)
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int32)
        return xq, sx

    xl, sx_lo = quant(x_lo)
    xh, sx_hi = quant(x_hi)

    codes = qp[:].astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.int8)
    hi = (codes >> 4).astype(jnp.int8)
    kt2 = ng * G
    bn = out.shape[-1]
    gi = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2), 0)
    gk = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2), 1) // G
    mask = gi == gk

    def bd(xq):  # (1, kt2) i32 -> (ng, kt2) block-diagonal i8
        xb = jnp.broadcast_to(xq, (ng, kt2))
        return jnp.where(mask, xb, 0).astype(jnp.int8)

    bdl = bd(xl)
    bdh = bd(xh)
    Pl = jax.lax.dot_general(bdl, lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    Ph = jax.lax.dot_general(bdh, hi, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    sl = _sb_expand(d_lo[0], sb, ng, bn) * sc_lo[0].astype(jnp.int32).astype(jnp.float32)
    sh = _sb_expand(d_hi[0], sb, ng, bn) * sc_hi[0].astype(jnp.int32).astype(jnp.float32)
    ol = -_sb_expand(dm_lo[0], sb, ng, bn) * m_lo[:].astype(jnp.int32).astype(jnp.float32)
    oh = -_sb_expand(dm_hi[0], sb, ng, bn) * m_hi[:].astype(jnp.int32).astype(jnp.float32)
    xsl = bdl.astype(jnp.int32).sum(axis=1, keepdims=True).astype(jnp.float32)
    xsh = bdh.astype(jnp.int32).sum(axis=1, keepdims=True).astype(jnp.float32)
    contrib = ((Pl.astype(jnp.float32) * sl + xsl * ol) * sx_lo
               + (Ph.astype(jnp.float32) * sh + xsh * oh) * sx_hi)
    out[:] = out[:] + contrib.sum(axis=0, keepdims=True)


def _sb_gemv_k_tile(k2: int, G: int, sb: int) -> int | None:
    """k-tile for the compact-plane GEMV, or None if no VMEM-safe legal tile
    exists.  Legality: superblock-plane tiles need (kt2/(G*sb)) % 8 == 0, or
    kt2 == k2 (the (1, rows, bn) block then spans the plane's row dim)."""
    for c in (2048, 4096):
        if c <= k2 and k2 % c == 0 and c % G == 0 and (c // (G * sb)) % 8 == 0:
            return c
    return k2 if k2 <= 4096 else None  # whole-half-plane tile, VMEM-bounded


def _q4_gemv_sb(xq, packed, sc, m_codes, d_pl, dmin_pl, G: int, sb: int, interpret: bool):
    """Dispatch the compact-plane q4 GEMV (tile rules: _sb_gemv_k_tile)."""
    m, k = xq.shape
    k2, npad = packed.shape
    assert k == 2 * k2
    use_bd = _GEMV_BD and m == 1
    # bd kernel: bn capped at 1024 — kt2=2048 x bn=2048 crashes the Mosaic
    # compiler (internal error; tools/microbench_r3.py compact) and 1024
    # measured best at m=1.  The m>1 loop variant prefers bn=2048 (batch-16:
    # 10.9 vs 12.6 ms/step) and compiles fine.
    bn_cands = (1024, 512, 384, 256, 128) if use_bd else (2048, 1024, 512, 384, 256, 128)
    bn = _pick_tile(npad, bn_cands)
    kt2 = _sb_gemv_k_tile(k2, G, sb)
    assert kt2 is not None
    ng = kt2 // G
    n_ktiles = k2 // kt2
    ng8 = ng // sb
    grid = (npad // bn, n_ktiles)

    in_specs = [
        pl.BlockSpec((m, kt2), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, kt2), lambda i, kk: (0, kk + n_ktiles), memory_space=pltpu.VMEM),
        pl.BlockSpec((kt2, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng, bn), lambda i, kk: (0, kk, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng, bn), lambda i, kk: (1, kk, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((ng, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((ng, bn), lambda i, kk: (kk + n_ktiles, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng8, bn), lambda i, kk: (0, kk, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng8, bn), lambda i, kk: (1, kk, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng8, bn), lambda i, kk: (0, kk, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng8, bn), lambda i, kk: (1, kk, i), memory_space=pltpu.VMEM),
    ]
    # bf16 activations + use_bd: the kernel quantizes in-kernel per tile
    # (planar_matmul skips the XLA quantize/epilogue glue for this path)
    qact = use_bd and xq.dtype != jnp.int8
    kern = functools.partial(
        _q4gemv_bd_sb_qact_kernel if qact
        else _q4gemv_bd_sb_kernel if use_bd
        else _q4gemv_sb_kernel, G=G, ng=ng, sb=sb
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=_gemv_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * npad,
            bytes_accessed=k2 * npad + sc.nbytes + m_codes.nbytes + d_pl.nbytes
            + dmin_pl.nbytes + m * k + m * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, xq, packed, sc, sc, m_codes, m_codes, d_pl, d_pl, dmin_pl, dmin_pl)


def _q8gemv_sb_kernel(x, q, sc, dd, out, *, G: int, ng: int, sb: int):
    """Per-group-loop q8 GEMV over compact K-quant planes (Q6_K: int8
    sub-scales per 16-group + d per 256-superblock, non-affine)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    bn = out.shape[-1]
    sv = _sb_expand(dd[:], sb, ng, bn) * sc[:].astype(jnp.int32).astype(jnp.float32)
    xv, qv = x[:], q[:]
    acc = out[:]
    for j in range(ng):
        p = jax.lax.dot_general(
            xv[:, j * G : (j + 1) * G], qv[j * G : (j + 1) * G, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = acc + p.astype(jnp.float32) * sv[j : j + 1, :]
    out[:] = acc


def _q8gemv_bd_sb_kernel(x, q, sc, dd, out, *, G: int, ng: int, sb: int):
    """Block-diagonal q8 GEMV (m=1) over compact planes — one full-K int8
    MXU dot instead of ng short ones (see _q4gemv_bd_kernel)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    kt = ng * G
    bn = out.shape[-1]
    gi = jax.lax.broadcasted_iota(jnp.int32, (ng, kt), 0)
    gk = jax.lax.broadcasted_iota(jnp.int32, (ng, kt), 1) // G
    xb = jnp.broadcast_to(x[:].astype(jnp.int32), (ng, kt))
    bd = jnp.where(gi == gk, xb, 0).astype(jnp.int8)
    P = jax.lax.dot_general(bd, q[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    sv = _sb_expand(dd[:], sb, ng, bn) * sc[:].astype(jnp.int32).astype(jnp.float32)
    out[:] = out[:] + (P.astype(jnp.float32) * sv).sum(axis=0, keepdims=True)


def _q8gemv_sb_off_kernel(x, q, sc, mm, dd, dm, out, *, G: int, ng: int, sb: int):
    """Affine compact q8 GEMV loop (Q5_K): the group offset (-dmin*m)
    multiplies the group's activation sum, as in _q8gemv_off_kernel."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    bn = out.shape[-1]
    sv = _sb_expand(dd[:], sb, ng, bn) * sc[:].astype(jnp.int32).astype(jnp.float32)
    ov = -_sb_expand(dm[:], sb, ng, bn) * mm[:].astype(jnp.int32).astype(jnp.float32)
    xv, qv = x[:], q[:]
    acc = out[:]
    for j in range(ng):
        xg = xv[:, j * G : (j + 1) * G]
        p = jax.lax.dot_general(
            xg, qv[j * G : (j + 1) * G, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc = acc + p.astype(jnp.float32) * sv[j : j + 1, :] + xsum * ov[j : j + 1, :]
    out[:] = acc


def _q8gemv_bd_sb_off_kernel(x, q, sc, mm, dd, dm, out, *, G: int, ng: int, sb: int):
    """Affine compact q8 GEMV, block-diagonal m=1 variant."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    kt = ng * G
    bn = out.shape[-1]
    gi = jax.lax.broadcasted_iota(jnp.int32, (ng, kt), 0)
    gk = jax.lax.broadcasted_iota(jnp.int32, (ng, kt), 1) // G
    xb = jnp.broadcast_to(x[:].astype(jnp.int32), (ng, kt))
    bd = jnp.where(gi == gk, xb, 0).astype(jnp.int8)
    P = jax.lax.dot_general(bd, q[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    sv = _sb_expand(dd[:], sb, ng, bn) * sc[:].astype(jnp.int32).astype(jnp.float32)
    ov = -_sb_expand(dm[:], sb, ng, bn) * mm[:].astype(jnp.int32).astype(jnp.float32)
    xsum = bd.astype(jnp.int32).sum(axis=1, keepdims=True).astype(jnp.float32)
    contrib = P.astype(jnp.float32) * sv + xsum * ov
    out[:] = out[:] + contrib.sum(axis=0, keepdims=True)


def _q8_gemv_sb(xq, codes, sc, d_pl, G: int, sb: int, interpret: bool,
                m_codes=None, dmin_pl=None):
    """Compact-plane q8 GEMV dispatch (Q6_K non-affine; Q5_K affine via
    m_codes/dmin_pl).  Tile rule: the d-plane tile (kt/(G*sb), bn) needs
    rows % 8 == 0 or a whole-K tile."""
    m, k = xq.shape
    _, npad = codes.shape
    use_bd = _GEMV_BD and m == 1
    bn_cands = (1024, 512, 384, 256, 128) if use_bd else (2048, 1024, 512, 384, 256, 128)
    bn = _pick_tile(npad, bn_cands)
    kt = None
    for c in (2048, 4096):
        if c <= k and k % c == 0 and c % G == 0 and (c // (G * sb)) % 8 == 0:
            kt = c
            break
    if kt is None:
        kt = k  # whole-K tile: all plane blocks span their row dims
    ng = kt // G
    n_ktiles = k // kt
    ng_sb = ng // sb
    grid = (npad // bn, n_ktiles)

    in_specs = [
        pl.BlockSpec((m, kt), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((kt, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((ng, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
    ]
    extra_bytes = 0
    if m_codes is not None:
        in_specs += [
            pl.BlockSpec((ng, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_sb, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_sb, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
        ]
        args = (xq, codes, sc, m_codes, d_pl, dmin_pl)
        kern = functools.partial(
            _q8gemv_bd_sb_off_kernel if use_bd else _q8gemv_sb_off_kernel,
            G=G, ng=ng, sb=sb)
        extra_bytes = m_codes.nbytes + dmin_pl.nbytes
    else:
        in_specs.append(
            pl.BlockSpec((ng_sb, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM))
        args = (xq, codes, sc, d_pl)
        kern = functools.partial(
            _q8gemv_bd_sb_kernel if use_bd else _q8gemv_sb_kernel, G=G, ng=ng, sb=sb)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=_gemv_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * npad,
            bytes_accessed=k * npad + sc.nbytes + d_pl.nbytes + extra_bytes
            + m * k + m * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _sb_q8_gemv_ok(k: int, G: int, sb: int) -> bool:
    """Whole-K fallback tiles are VMEM-bounded like the q4 path."""
    for c in (2048, 4096):
        if c <= k and k % c == 0 and c % G == 0 and (c // (G * sb)) % 8 == 0:
            return True
    return k <= 4096


# DEFAULT ON since round 3: measured on v5e hardware 2026-08-19 —
# GPT-J-6B Q4_K decode 6.69 ms/tok (bd) vs 7.29 ms/tok (loop), an 8.2% e2e
# win (BENCH_AUTOTUNE_DETAIL.json); GGML_TPU_GEMV_BD=0 restores the
# per-group-loop kernels at m=1
_GEMV_BD = os.environ.get("GGML_TPU_GEMV_BD", "1") == "1"


def _q4_gemv(xq, packed, scales, G: int, interpret: bool, offsets=None):
    m, k = xq.shape
    k2, npad = packed.shape
    assert k == 2 * k2
    bn = _pick_tile(npad, _GEMV_BN)
    kt2 = _pick_k_tile(k2, G, max_tile=1024)
    ng = kt2 // G
    n_ktiles = k2 // kt2
    grid = (npad // bn, n_ktiles)
    use_bd = _GEMV_BD and m == 1 and kt2 % G == 0

    in_specs = [
        pl.BlockSpec((m, kt2), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, kt2), lambda i, kk: (0, kk + n_ktiles), memory_space=pltpu.VMEM),
        pl.BlockSpec((kt2, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng, bn), lambda i, kk: (0, kk, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng, bn), lambda i, kk: (1, kk, i), memory_space=pltpu.VMEM),
    ]
    args = (xq, xq, packed, scales, scales)
    kern = functools.partial(_q4gemv_bd_kernel if use_bd else _q4gemv_kernel, G=G, ng=ng)
    extra_bytes = 0
    if offsets is not None:
        in_specs += [
            pl.BlockSpec((ng, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, bn), lambda i, kk: (kk + n_ktiles, i), memory_space=pltpu.VMEM),
        ]
        args = (xq, xq, packed, scales, scales, offsets, offsets)
        kern = functools.partial(
            _q4gemv_bd_off_kernel if use_bd else _q4gemv_off_kernel, G=G, ng=ng
        )
        extra_bytes = offsets.nbytes

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=_gemv_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * npad,
            bytes_accessed=k2 * npad + scales.nbytes + extra_bytes + m * k + m * npad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _quantize_activations_per_row(x):
    """Symmetric per-row int8 quantization (the Q8 activation analog)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.where(amax == 0, 1.0, amax / 127.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return xq, sx


# int-GEMV path for decode-sized row counts: the weight stream amortizes
# across slots while each dot stays well inside one MXU pass
_GEMV_MAX_M = int(os.environ.get("GGML_TPU_GEMV_MAX_M", "32"))


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

_M_CHUNK = 512  # cap rows per kernel call to bound VMEM

# kernel-selection observability (the GGML_SCHED_DEBUG assignment-dump idiom,
# reference src/ggml-backend.cpp:793-830): every planar_matmul trace records
# which path a (kind, K, N, M-class) landed on; dense fallbacks also warn once
_selection_log: dict[tuple, str] = {}


def kernel_selection_report() -> list[str]:
    """One line per distinct matmul site traced so far: which kernel ran.
    Surfaced by tools/generate.py --verbose; reset with clear()."""
    return [
        f"{kind:>3} K={k:<6} N={n:<6} {mclass:>7} -> {path}"
        for (kind, k, n, mclass), path in sorted(_selection_log.items())
    ]


def _record_selection(kind, k, n, m, path):
    mclass = "gemv-M" if m <= _GEMV_MAX_M else "matmul-M"
    key = (kind, k, n, mclass)
    if key not in _selection_log:
        _selection_log[key] = path
        if "fallback" in path:
            from ..utils.log import get_logger

            get_logger().warning(
                "planar_matmul %s K=%d N=%d: %s — full-width dequant traffic, "
                "the quantized-kernel HBM win is lost for this layer", kind, k, n, path
            )


def planar_dequant(pw: PlanarWeight, dtype=jnp.float32):
    """Dense (K, Npad) dequantized weight — the executable spec of the planar
    factoring (identical math to the fused kernels' in-tile reconstruction).

    Used by the dense fallback for shapes with no legal Mosaic tiling, and by
    the planar_matmul VJP (QLoRA: gradients w.r.t. activations flow through a
    frozen quantized base — the reference restricts training to F32/F16 params
    entirely, src/ggml.c:5859)."""
    codes = jnp.asarray(pw.codes)
    scales = jnp.asarray(pw.scales)
    offsets = None if pw.offsets is None else jnp.asarray(pw.offsets)
    g = pw.group
    if pw.supers is not None:
        d_pl = jnp.asarray(pw.supers[0])
        sc = jnp.repeat(d_pl.astype(jnp.float32), pw.sb, axis=-2) * scales.astype(jnp.float32)
        off = None
        if offsets is not None:
            # dmin is plane-major 3D; offsets are natural element order 2D
            dmin_nat = jnp.asarray(pw.supers[1]).astype(jnp.float32).reshape(
                -1, offsets.shape[-1])
            off = -jnp.repeat(dmin_nat, pw.sb, axis=0) * offsets.astype(jnp.float32)
    else:
        sc, off = scales.astype(jnp.float32), offsets
    if pw.kind == "q4":
        lo = (codes & 0xF).astype(jnp.float32)
        hi = (codes >> 4).astype(jnp.float32)
        w = jnp.concatenate(
            [lo * jnp.repeat(sc[0], g, axis=0), hi * jnp.repeat(sc[1], g, axis=0)], 0
        )
    else:
        w = codes.astype(jnp.float32) * jnp.repeat(sc, g, axis=0)
    if off is not None:
        w = w + jnp.repeat(off.astype(jnp.float32), g, axis=0)
    return w.astype(dtype)


def planar_matmul(x, pw: PlanarWeight, interpret: bool | None = None):
    """y = x @ W^T with W a planar-repacked quantized weight.

    x: (..., K) float array (computed in bf16 on the MXU, fp32 accumulation).
    Returns (..., N) in x's dtype.

    Differentiable w.r.t. x (custom VJP: dx = dy @ dequant(W)^T, dequantized
    per-weight in the backward only); the quantized planes get zero
    cotangents — codes are frozen by construction (QLoRA-style training).
    """
    if interpret is None:
        interpret = _interpret_default()
    return _planar_matmul_d(bool(interpret), x, pw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _planar_matmul_d(interpret, x, pw):
    return _planar_matmul_impl(x, pw, interpret)


def _planar_matmul_d_fwd(interpret, x, pw):
    # y carries x's dtype (see _planar_matmul_impl), so g.dtype == x.dtype —
    # no need to save x itself
    return _planar_matmul_impl(x, pw, interpret), pw


def _planar_matmul_d_bwd(interpret, res, g):
    pw = res
    # dx = dy @ W (W in x@W orientation is (K, N)); dequantize the frozen
    # base per-weight in the backward — bf16 operands, f32 accumulation on
    # the MXU.  XLA frees the dense W right after the dot (per-layer peak).
    wd = planar_dequant(pw, jnp.bfloat16)[:, : pw.n]
    dx = jnp.einsum("...n,kn->...k", g.astype(jnp.bfloat16), wd,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)

    def _zero_ct(a):
        if jnp.issubdtype(jnp.result_type(a), jnp.inexact):
            return jnp.zeros(jnp.shape(a), jnp.result_type(a))
        return np.zeros(jnp.shape(a), jax.dtypes.float0)

    return dx.astype(g.dtype), jax.tree.map(_zero_ct, pw)


_planar_matmul_d.defvjp(_planar_matmul_d_fwd, _planar_matmul_d_bwd)


def _planar_matmul_impl(x, pw: PlanarWeight, interpret: bool):
    batch_shape = x.shape[:-1]
    k = x.shape[-1]
    assert k == pw.k, f"K mismatch: x {k} vs weight {pw.k}"
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    xb = xf.astype(jnp.bfloat16)

    codes = jnp.asarray(pw.codes)
    scales = jnp.asarray(pw.scales)

    use_gemv = (
        m <= _GEMV_MAX_M
        and pw.group in (16, 32)
        and (
            (pw.kind == "q8" and (k // pw.group) % 8 == 0)
            or (pw.kind == "q4" and (k // 2) % pw.group == 0 and (k // 2 // pw.group) % 8 == 0)
        )
    )

    offsets = None if pw.offsets is None else jnp.asarray(pw.offsets)

    has_sb = pw.supers is not None
    if has_sb:
        d_pl = jnp.asarray(pw.supers[0])
        dmin_pl = None if pw.supers[1] is None else jnp.asarray(pw.supers[1])

    def _effective_planes():
        """Multiply the compact K-quant factoring back out (jnp, fused by
        XLA) for the paths whose kernels read effective planes directly —
        prefill matmuls amortize scale traffic over many rows, so the
        reconstruction cost is noise there."""
        sc_f = scales.astype(jnp.float32)
        eff_s = jnp.repeat(d_pl.astype(jnp.float32), pw.sb, axis=-2) * sc_f
        eff_o = None
        if offsets is not None:
            # dmin is plane-major 3D; offsets are natural element order 2D
            dmin_nat = dmin_pl.astype(jnp.float32).reshape(-1, offsets.shape[-1])
            eff_o = -jnp.repeat(dmin_nat, pw.sb, axis=0) * offsets.astype(jnp.float32)
        return eff_s, eff_o

    def dense_fallback(xc):
        """Shapes too small for legal Mosaic lane tiling (q4 half-planes need
        K/2 % 128 == 0): dequantize in jnp and matmul — XLA handles tiny
        models fine; the kernels exist for the big ones."""
        return xc.astype(jnp.float32) @ planar_dequant(pw)

    q4_tileable = pw.kind != "q4" or (k // 2) % 128 == 0

    if not interpret and not q4_tileable:
        _record_selection(pw.kind, k, pw.n, m, "dense-fallback (K/2 % 128 != 0)")
    elif use_gemv:
        _record_selection(pw.kind, k, pw.n, m, f"{pw.kind}-gemv (int8 MXU)")
    else:
        _record_selection(pw.kind, k, pw.n, m, f"{pw.kind}-matmul (fused dequant)")

    def one_chunk(xc):
        if not interpret and not q4_tileable:
            return dense_fallback(xc)
        if use_gemv:
            if (has_sb and pw.kind == "q4" and m == 1 and _GEMV_BD
                    and _sb_gemv_k_tile(k // 2, pw.group, pw.sb) is not None):
                # flagship decode path: activation quantization happens IN
                # the kernel (per K-tile scales), so no XLA glue at all —
                # bf16 x straight in, f32 y straight out
                return _q4_gemv_sb(xc, codes, scales, offsets, d_pl, dmin_pl,
                                   pw.group, pw.sb, interpret)
            xq, sx = _quantize_activations_per_row(xc)
            if has_sb and pw.kind == "q4" and _sb_gemv_k_tile(k // 2, pw.group, pw.sb) is not None:
                # compact K-quant planes straight into the kernel: the
                # d*sc / -dmin*m reconstruction rides the VPU per tile
                return _q4_gemv_sb(xq, codes, scales, offsets, d_pl, dmin_pl,
                                   pw.group, pw.sb, interpret) * sx
            if has_sb and pw.kind == "q8" and _sb_q8_gemv_ok(k, pw.group, pw.sb):
                return _q8_gemv_sb(xq, codes, scales, d_pl, pw.group, pw.sb,
                                   interpret, m_codes=offsets,
                                   dmin_pl=dmin_pl) * sx
            if has_sb:  # no legal superblock tile at this K: expanded planes
                eff_s, eff_o = _effective_planes()
                gemv = _q8_gemv if pw.kind == "q8" else _q4_gemv
                return gemv(xq, codes, eff_s, pw.group, interpret,
                            offsets=eff_o) * sx
            gemv = _q8_gemv if pw.kind == "q8" else _q4_gemv
            # affine offsets are folded into the kernel: the group offset
            # multiplies the group's int8 activation sum, and the per-row
            # scale sx outside covers both terms
            return gemv(xq, codes, scales, pw.group, interpret, offsets=offsets) * sx
        if has_sb:
            eff_s, eff_o = _effective_planes()
        else:
            eff_s, eff_o = scales, offsets
        if pw.kind == "q4":
            y = _q4_matmul(xc, codes, eff_s, pw.group, interpret)
        else:
            y = _q8_matmul(xc, codes, eff_s, pw.group, interpret)
        if eff_o is not None:
            xsum = xc.astype(jnp.float32).reshape(xc.shape[0], k // pw.group, pw.group).sum(-1)
            y = y + xsum @ eff_o
        return y

    if m <= _M_CHUNK:
        y = one_chunk(xb)
    else:
        nchunks = -(-m // _M_CHUNK)
        mpad = nchunks * _M_CHUNK
        xp = jnp.pad(xb, ((0, mpad - m), (0, 0))).reshape(nchunks, _M_CHUNK, k)
        y = jax.lax.map(one_chunk, xp).reshape(mpad, -1)[:m]

    y = y[:, : pw.n]
    return y.reshape(*batch_shape, pw.n).astype(x.dtype)
