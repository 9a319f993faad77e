"""Planar repack: ggml block-quant formats -> TPU-native matmul layout.

This is the TPU analog of ggml's on-load weight repacking (reference precedent:
src/ggml-cpu/ggml-cpu-aarch64.cpp:63-72 repacks Q4_0 into interleaved
block_q4_0x4/x8 for NEON mmla; src/ggml-cpu/amx/amx.cpp:25-68 repacks for Intel
AMX tiles). Instead of interleaving for a SIMD ISA, we factor every ggml block
format into the affine form

    w[k, n] = s[k // G, n] * q[k, n] + o[k // G, n]

with integer codes ``q``, per-group fp32 scale ``s`` and optional per-group
offset ``o``, stored K-major so that (a) codes stream from HBM at 4 or 8 bits
per weight, (b) group scales broadcast along TPU *sublanes* (a free relayout),
and (c) one Pallas kernel family (ggml_tpu.kernels.qmatmul) serves all 20+
quantized dtypes. The affine offset term is exact: its contribution to a dot
product is ``sum_g o[g, n] * sum_{k in g} x[k]``, a tiny (M, K/G) x (K/G, N)
side matmul.

Code planes:
  * q4 plane: unsigned codes 0..15 packed two-per-byte as uint8 (K/2, N);
    byte (c, n) holds code k=c in its low nibble and k=c+K/2 in its high
    nibble, so the kernel's nibble unpack needs no element shuffle at all
    (the two halves contract separately against x[:, :K/2] and x[:, K/2:]).
  * q8 plane: signed int8 codes (K, N).

Dequantized values reproduce the reference semantics of
src/ggml-quants.c dequantize_row_* exactly up to fp32 re-association
(validated in tests/test_planar.py against quant.reference).
"""

from __future__ import annotations

from dataclasses import dataclass

import os

import numpy as np

from ..dtypes import GGMLType, get_type_traits
from . import reference as R

F32 = np.float32


# ---------------------------------------------------------------------------
# Per-type plane extractors: (nb, type_size) uint8 raw blocks ->
#   q   : (nb, block) integer codes (int16 work dtype)
#   s   : (nb, block // G) fp32 effective scale per group
#   o   : (nb, block // G) fp32 effective offset per group, or None
#   G   : group size (elements sharing one scale)
# Element order is natural (same as reference dequantize_row_*).
# ---------------------------------------------------------------------------


def _planes_q4_0(b):
    d = R._f16(b, 0)
    qs = b[:, 2:18]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.int16)
    return q, d[:, None], (-8.0 * d)[:, None], 32


def _planes_q4_1(b):
    d = R._f16(b, 0)
    m = R._f16(b, 2)
    qs = b[:, 4:20]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.int16)
    return q, d[:, None], m[:, None], 32


def _planes_q5_0(b):
    d = R._f16(b, 0)
    qh = R._u32(b, 2).reshape(-1)
    qs = b[:, 6:22]
    q = (np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.int16) | R._q5_bits(qh)) - 16
    return q, d[:, None], None, 32


def _planes_q5_1(b):
    d = R._f16(b, 0)
    m = R._f16(b, 2)
    qh = R._u32(b, 4).reshape(-1)
    qs = b[:, 8:24]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.int16) | R._q5_bits(qh)
    return q, d[:, None], m[:, None], 32


def _planes_q8_0(b):
    d = R._f16(b, 0)
    return b[:, 2:34].view(np.int8).astype(np.int16), d[:, None], None, 32


def _planes_q2_k(b):
    d = R._f16(b, 80)[:, None]
    dmin = R._f16(b, 82)[:, None]
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    q = ((qs[:, R._Q2K_QIDX] >> R._Q2K_SHIFT) & 3).astype(np.int16)
    s = d * (scales & 0xF).astype(F32)
    o = -dmin * (scales >> 4).astype(F32)
    return q, s, o, 16


def _planes_q3_k(b):
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    d = R._f16(b, 108)[:, None]
    sc16 = R._q3k_scales(b[:, 96:108])
    g = R._Q2K_G
    mbit = g // 2
    hidx = 16 * (g % 2) + (R._E % 16)
    hm = (hmask[:, hidx] >> mbit) & 1
    # value = code2 - 4 when high bit clear; store code+4 in [0, 7]
    q = (((qs[:, R._Q2K_QIDX] >> R._Q2K_SHIFT) & 3).astype(np.int16) + np.where(hm == 0, 0, 4))
    s = d * sc16.astype(F32)
    return q, s, -4.0 * s, 16


def _planes_q4_k(b):
    d = R._f16(b, 0)[:, None]
    dmin = R._f16(b, 2)[:, None]
    sc, m = R._k4_scale_min(b[:, 4:16])
    qs = b[:, 16:144]
    q = np.where(R._Q4K_NIB == 0, qs[:, R._Q4K_QIDX] & 0xF, qs[:, R._Q4K_QIDX] >> 4).astype(np.int16)
    return q, d * sc, -dmin * m, 32


def _planes_q5_k(b):
    d = R._f16(b, 0)[:, None]
    dmin = R._f16(b, 2)[:, None]
    sc, m = R._k4_scale_min(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    lo = np.where(R._Q4K_NIB == 0, qs[:, R._Q4K_QIDX] & 0xF, qs[:, R._Q4K_QIDX] >> 4).astype(np.int16)
    hi = ((qh[:, R._E % 32] >> R._Q4K_IS) & 1).astype(np.int16) * 16
    return lo + hi, d * sc, -dmin * m, 32


def _planes_q6_k(b):
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].view(np.int8)
    d = R._f16(b, 208)[:, None]
    lo = np.where(R._Q6_QLHI == 0, ql[:, R._Q6_QL] & 0xF, ql[:, R._Q6_QL] >> 4).astype(np.int16)
    hi = ((qh[:, R._Q6_QH] >> R._Q6_QHS) & 3).astype(np.int16) << 4
    q = (lo | hi) - 32
    return q, d * scales.astype(F32), None, 16


def _planes_iq4_nl(b):
    d = R._f16(b, 0)
    qs = b[:, 2:18]
    q = np.concatenate(
        [R.KVALUES_IQ4NL[qs & 0xF], R.KVALUES_IQ4NL[qs >> 4]], axis=1
    ).astype(np.int16)
    return q, d[:, None], None, 32


def _planes_iq4_xs(b):
    nb = len(b)
    d = R._f16(b, 0)
    scales_h = R._u16(b, 2).reshape(-1)
    scales_l = b[:, 4:8]
    qs = b[:, 8:136].reshape(nb, 8, 16)
    ib = np.arange(8)
    ls = ((scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0xF).astype(np.int32) | (
        ((scales_h[:, None].astype(np.int32) >> (2 * ib)) & 3) << 4
    )
    s = d[:, None] * (ls - 32).astype(F32)
    q = np.concatenate(
        [R.KVALUES_IQ4NL[qs & 0xF], R.KVALUES_IQ4NL[qs >> 4]], axis=-1
    ).astype(np.int16).reshape(nb, 256)
    return q, s, None, 32


def _planes_iq2_xxs(b):
    nb = len(b)
    d = R._f16(b, 0)
    q16 = R._u16(b, 2, 32).reshape(nb, 8, 2, 2)
    aux32 = q16[..., 0].astype(np.uint32) | (q16[..., 1].astype(np.uint32) << 16)
    aux8 = np.ascontiguousarray(aux32[..., 0]).view(np.uint8).reshape(nb, 8, 4)
    s = d[:, None] * (F32(0.5) + (aux32[..., 1] >> 28).astype(F32)) * F32(0.25)
    grid = R.IQ2XXS_GRID[aux8].astype(np.int16)
    shifts = (7 * np.arange(4))[None, None, :]
    signs = R._signs_for((aux32[..., 1:2] >> shifts) & 127).astype(np.int16)
    return (grid * signs).reshape(nb, 256), s, None, 32


def _planes_iq2_xs(b):
    nb = len(b)
    d = R._f16(b, 0)
    q16 = R._u16(b, 2, 32).reshape(nb, 8, 4)
    scales = b[:, 66:74]
    sc = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(F32)
    s = (d[:, None, None] * (F32(0.5) + sc) * F32(0.25)).reshape(nb, 16)
    grid = R.IQ2XS_GRID[q16 & 511].astype(np.int16)
    signs = R._signs_for(q16 >> 9).astype(np.int16)
    return (grid * signs).reshape(nb, 256), s, None, 16


def _planes_iq2_s(b):
    nb = len(b)
    d = R._f16(b, 0)
    qs = b[:, 2:34].reshape(nb, 8, 4)
    signs_b = b[:, 34:66].reshape(nb, 8, 4)
    qh = b[:, 66:74]
    scales = b[:, 74:82]
    sc = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(F32)
    s = (d[:, None, None] * (F32(0.5) + sc) * F32(0.25)).reshape(nb, 16)
    l = np.arange(4)
    idx = qs.astype(np.int32) | ((qh[:, :, None].astype(np.int32) << (8 - 2 * l)) & 0x300)
    grid = R.IQ2S_GRID[idx].astype(np.int16)
    signs = np.where((signs_b[..., None] & R.KMASK_IQ2XS) != 0, -1, 1).astype(np.int16)
    return (grid * signs).reshape(nb, 256), s, None, 16


def _planes_iq3_xxs(b):
    nb = len(b)
    d = R._f16(b, 0)
    qs = b[:, 2:66].reshape(nb, 8, 8)
    aux32 = R._u32(b, 66, 8)
    s = d[:, None] * (F32(0.5) + (aux32 >> 28).astype(F32)) * F32(0.5)
    grid = R.IQ3XXS_GRID[qs].astype(np.int16).reshape(nb, 8, 4, 8)
    shifts = (7 * np.arange(4))[None, None, :]
    signs = R._signs_for((aux32[..., None] >> shifts) & 127).astype(np.int16)
    return (grid * signs).reshape(nb, 256), s, None, 32


def _planes_iq3_s(b):
    nb = len(b)
    d = R._f16(b, 0)
    qs = b[:, 2:66].reshape(nb, 8, 8)
    qh = b[:, 66:74]
    signs_b = b[:, 74:106].reshape(nb, 8, 4)
    scales = b[:, 106:110]
    sc_pair = np.stack([scales & 0xF, scales >> 4], axis=-1).reshape(nb, 8)
    s = d[:, None] * (1 + 2 * sc_pair).astype(F32)
    l = np.arange(4)
    idx1 = qs[:, :, 0::2].astype(np.int32) | ((qh[:, :, None].astype(np.int32) << (8 - 2 * l)) & 256)
    idx2 = qs[:, :, 1::2].astype(np.int32) | ((qh[:, :, None].astype(np.int32) << (7 - 2 * l)) & 256)
    grid = np.concatenate(
        [R.IQ3S_GRID[idx1].astype(np.int16), R.IQ3S_GRID[idx2].astype(np.int16)], axis=-1
    )
    signs = np.where((signs_b[..., None] & R.KMASK_IQ2XS) != 0, -1, 1).astype(np.int16)
    return (grid * signs).reshape(nb, 256), s, None, 32


def _planes_iq1_s(b):
    nb = len(b)
    d = R._f16(b, 0)
    qs = b[:, 2:34].reshape(nb, 8, 4)
    qh = R._u16(b, 34, 8)
    s = d[:, None] * (2 * ((qh >> 12) & 7) + 1).astype(F32)
    delta = np.where((qh & 0x8000) != 0, -R.IQ1S_DELTA, R.IQ1S_DELTA)
    l = np.arange(4)
    idx = qs.astype(np.int32) | (((qh[:, :, None].astype(np.int32) >> (3 * l)) & 7) << 8)
    q = R.IQ1S_GRID[idx].astype(np.int16).reshape(nb, 256)
    return q, s, s * delta, 32


def _planes_iq1_m(b):
    nb = len(b)
    qs = b[:, 0:32].reshape(nb, 8, 4)
    qh = b[:, 32:48].reshape(nb, 8, 2)
    sc = R._u16(b, 48, 4)
    scale_bits = (
        (sc[:, 0] >> 12) | ((sc[:, 1] >> 8) & 0x00F0) | ((sc[:, 2] >> 4) & 0x0F00) | (sc[:, 3] & 0xF000)
    ).astype(np.uint16)
    d = R.fp16_bits_to_fp32(scale_bits)
    ib = np.arange(8)
    dl1 = d[:, None] * (2 * ((sc[:, ib // 2] >> (6 * (ib % 2) + 0)) & 0x7) + 1).astype(F32)
    dl2 = d[:, None] * (2 * ((sc[:, ib // 2] >> (6 * (ib % 2) + 3)) & 0x7) + 1).astype(F32)
    dl = np.stack([dl1, dl1, dl2, dl2], axis=-1)  # (nb, 8, 4): scale per 8 elements
    idx = np.empty((nb, 8, 4), dtype=np.int32)
    idx[..., 0] = qs[..., 0] | ((qh[..., 0].astype(np.int32) << 8) & 0x700)
    idx[..., 1] = qs[..., 1] | ((qh[..., 0].astype(np.int32) << 4) & 0x700)
    idx[..., 2] = qs[..., 2] | ((qh[..., 1].astype(np.int32) << 8) & 0x700)
    idx[..., 3] = qs[..., 3] | ((qh[..., 1].astype(np.int32) << 4) & 0x700)
    delta = np.empty((nb, 8, 4), dtype=F32)
    delta[..., 0] = np.where((qh[..., 0] & 0x08) != 0, -R.IQ1S_DELTA, R.IQ1S_DELTA)
    delta[..., 1] = np.where((qh[..., 0] & 0x80) != 0, -R.IQ1S_DELTA, R.IQ1S_DELTA)
    delta[..., 2] = np.where((qh[..., 1] & 0x08) != 0, -R.IQ1S_DELTA, R.IQ1S_DELTA)
    delta[..., 3] = np.where((qh[..., 1] & 0x80) != 0, -R.IQ1S_DELTA, R.IQ1S_DELTA)
    q = R.IQ1S_GRID[idx].astype(np.int16).reshape(nb, 256)
    s = dl.reshape(nb, 32)
    return q, s, (dl * delta).reshape(nb, 32), 8


def _planes_tq1_0(b):
    w = R.dequant_tq1_0(b)
    d = R._f16(b, 52)
    dd = np.where(d == 0, F32(1.0), d)
    q = np.rint(w / dd[:, None]).astype(np.int16)
    return q, d[:, None], None, 256


def _planes_tq2_0(b):
    w = R.dequant_tq2_0(b)
    d = R._f16(b, 64)
    dd = np.where(d == 0, F32(1.0), d)
    q = np.rint(w / dd[:, None]).astype(np.int16)
    return q, d[:, None], None, 256


def _compact_planes_q4_k(b):
    """Q4_K planes with the superblock structure kept FACTORED instead of
    multiplied out: integer 6-bit sub-scale/min codes per 32-group plus fp32
    d/dmin per 256-element superblock (reference layout:
    src/ggml-common.h:279-290 block_q4_K).  Cuts decode scale traffic from
    4 B/group (two bf16/fp32 planes) to 2.5-3 B/group while staying EXACT:
    the kernel recomputes s = d * sc in fp32, the same arithmetic the
    reference dequantizer does."""
    d = R._f16(b, 0)
    dmin = R._f16(b, 2)
    sc, m = R._k4_scale_min(b[:, 4:16])  # (nb, 8) float-valued 6-bit ints
    qs = b[:, 16:144]
    q = np.where(R._Q4K_NIB == 0, qs[:, R._Q4K_QIDX] & 0xF, qs[:, R._Q4K_QIDX] >> 4).astype(np.int16)
    return q, sc.astype(np.int8), m.astype(np.int8), d, dmin, 32, 8


def _compact_planes_q6_k(b):
    """Q6_K factored: int8 sub-scales per 16-group + fp32 d per superblock
    (reference layout: src/ggml-common.h:314-320 block_q6_K — scales int8[16],
    fp16 d).  Codes are signed 6-bit (-32..31) in the q8 plane."""
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].view(np.int8)
    d = R._f16(b, 208)
    lo = np.where(R._Q6_QLHI == 0, ql[:, R._Q6_QL] & 0xF, ql[:, R._Q6_QL] >> 4).astype(np.int16)
    hi = ((qh[:, R._Q6_QH] >> R._Q6_QHS) & 3).astype(np.int16) << 4
    q = (lo | hi) - 32
    return q, scales.copy(), None, d, None, 16, 16


def _compact_planes_q5_k(b):
    """Q5_K factored (reference: src/ggml-common.h:291-303 block_q5_K):
    5-bit codes 0..31 (q8 plane), 6-bit sub-scale/min codes per 32-group,
    fp32 d/dmin per superblock."""
    d = R._f16(b, 0)
    dmin = R._f16(b, 2)
    sc, m = R._k4_scale_min(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    lo = np.where(R._Q4K_NIB == 0, qs[:, R._Q4K_QIDX] & 0xF, qs[:, R._Q4K_QIDX] >> 4).astype(np.int16)
    hi = ((qh[:, R._E % 32] >> R._Q4K_IS) & 1).astype(np.int16) * 16
    return lo + hi, sc.astype(np.int8), m.astype(np.int8), d, dmin, 32, 8


_COMPACT_PLANES = {
    GGMLType.Q4_K: _compact_planes_q4_k,
    GGMLType.Q5_K: _compact_planes_q5_k,
    GGMLType.Q6_K: _compact_planes_q6_k,
}


_PLANES = {
    GGMLType.Q4_0: _planes_q4_0,
    GGMLType.Q4_1: _planes_q4_1,
    GGMLType.Q5_0: _planes_q5_0,
    GGMLType.Q5_1: _planes_q5_1,
    GGMLType.Q8_0: _planes_q8_0,
    GGMLType.Q2_K: _planes_q2_k,
    GGMLType.Q3_K: _planes_q3_k,
    GGMLType.Q4_K: _planes_q4_k,
    GGMLType.Q5_K: _planes_q5_k,
    GGMLType.Q6_K: _planes_q6_k,
    GGMLType.IQ4_NL: _planes_iq4_nl,
    GGMLType.IQ4_XS: _planes_iq4_xs,
    GGMLType.IQ2_XXS: _planes_iq2_xxs,
    GGMLType.IQ2_XS: _planes_iq2_xs,
    GGMLType.IQ2_S: _planes_iq2_s,
    GGMLType.IQ3_XXS: _planes_iq3_xxs,
    GGMLType.IQ3_S: _planes_iq3_s,
    GGMLType.IQ1_S: _planes_iq1_s,
    GGMLType.IQ1_M: _planes_iq1_m,
    GGMLType.TQ1_0: _planes_tq1_0,
    GGMLType.TQ2_0: _planes_tq2_0,
}

# Types whose codes fit an unsigned 4-bit plane (0..15).
_Q4_PLANE_TYPES = {
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
}


def planar_types() -> set[GGMLType]:
    return set(_PLANES)


@dataclass
class PlanarWeight:
    """A weight matrix repacked for the fused dequant-matmul kernels.

    Logical math: y = x @ W^T for ggml-orientation W (N rows of length K).
    Stored K-major: codes (K, N) [q8] or packed (K/2, N) [q4],
    scales/offsets (K/G, N) fp32. N is padded to a lane multiple.
    """

    kind: str  # "q4" | "q8"
    codes: object  # jax/np uint8 (K//2, Npad) or int8 (K, Npad)
    scales: object  # fp32 (K//G, Npad); int8 sub-scale CODES when supers set
    offsets: object | None  # fp32 (K//G, Npad) or None; int8 min codes when supers set
    group: int
    n: int  # logical N (pre-padding)
    k: int
    orig_type: GGMLType
    # K-quant compact-scale planes: (d, dmin) per superblock of `sb` groups,
    # fp32/bf16, shaped (2, K/2/G/sb, Npad) [q4] or (K/G/sb, Npad) [q8];
    # dmin is None for non-affine types.  Effective scale = d_expand * scales,
    # effective offset = -dmin_expand * offsets (codes are small ints).
    supers: tuple | None = None
    sb: int = 8  # groups per superblock when supers is set

    @property
    def shape(self):  # ggml orientation (N, K)
        return (self.n, self.k)

    def to_device(self):
        """Move planes onto the accelerator as jax arrays."""
        import jax.numpy as jnp

        return PlanarWeight(
            kind=self.kind,
            codes=jnp.asarray(self.codes),
            scales=jnp.asarray(self.scales),
            offsets=None if self.offsets is None else jnp.asarray(self.offsets),
            group=self.group,
            n=self.n,
            k=self.k,
            orig_type=self.orig_type,
            supers=None if self.supers is None else tuple(
                None if s is None else jnp.asarray(s) for s in self.supers),
            sb=self.sb,
        )


def _pw_flatten(pw: PlanarWeight):
    children = (pw.codes, pw.scales)
    if pw.offsets is not None:
        children += (pw.offsets,)
    n_sup = 0
    if pw.supers is not None:
        sup = tuple(s for s in pw.supers if s is not None)
        n_sup = len(sup)
        children += sup
    aux = (pw.kind, pw.offsets is None, pw.group, pw.n, pw.k, pw.orig_type,
           None if pw.supers is None else tuple(s is None for s in pw.supers),
           pw.sb)
    return children, aux


def _pw_unflatten(aux, children):
    kind, no_off, group, n, k, orig_type, sup_none_mask, sb = aux
    codes, scales = children[0], children[1]
    i = 2
    offsets = None
    if not no_off:
        offsets = children[i]
        i += 1
    supers = None
    if sup_none_mask is not None:
        supers = []
        for is_none in sup_none_mask:
            if is_none:
                supers.append(None)
            else:
                supers.append(children[i])
                i += 1
        supers = tuple(supers)
    return PlanarWeight(kind, codes, scales, offsets, group, n, k, orig_type,
                        supers, sb)


try:  # register as a pytree so PlanarWeight params flow through jax.jit
    import jax.tree_util as _jtu

    _jtu.register_pytree_node(PlanarWeight, _pw_flatten, _pw_unflatten)
except ImportError:  # pragma: no cover - numpy-only usage
    pass


def repack(
    raw: np.ndarray,
    ggml_type: GGMLType,
    shape: tuple[int, int],
    n_pad_to: int = 128,
    force_q8: bool = False,
    backend: str = "auto",
) -> PlanarWeight:
    """backend: 'auto' uses the multithreaded C++ repacker when available
    (csrc/repack.cpp, bit-identical), 'numpy' forces the pure-Python path.
    Compact K-quant layouts (factored sub-scales) always take the numpy
    path — the native repacker emits the multiplied-out fp32 planes."""
    n_pad_to = _wide_pad(shape[0], n_pad_to)
    if _compact_applicable(ggml_type, shape[1], force_q8):
        return _repack_numpy(raw, ggml_type, shape, n_pad_to=n_pad_to, force_q8=force_q8)
    if backend == "auto":
        try:
            from ..native import native_repack
        except ImportError:
            native_repack = None
        if native_repack is not None:
            # real native-path failures (nonzero rc etc.) propagate; only an
            # unavailable toolchain/library falls back to numpy
            pw = native_repack(raw, ggml_type, shape, n_pad_to=n_pad_to, force_q8=force_q8)
            if pw is not None:
                return pw
    return _repack_numpy(raw, ggml_type, shape, n_pad_to=n_pad_to, force_q8=force_q8)


def _compact_applicable(ggml_type: GGMLType, k: int, force_q8: bool) -> bool:
    """Compact sub-scale planes: K-quant types where the superblock factoring
    is implemented AND the GEMV's superblock tiling constraints hold."""
    if ggml_type not in _COMPACT_PLANES:
        return False
    if force_q8 and ggml_type in _Q4_PLANE_TYPES:
        return False  # forced int8 codes: keep the plain q8 layout
    if os.environ.get("GGML_TPU_COMPACT_SCALES", "1") == "0":
        return False
    if ggml_type in _Q4_PLANE_TYPES:
        return k % 512 == 0  # full superblocks in each packed half-plane
    return k % 256 == 0  # q8-plane K-quants: whole superblocks


def _repack_numpy_compact(
    blocks: np.ndarray, ggml_type: GGMLType, n: int, k: int, npad: int
) -> PlanarWeight:
    """Compact K-quant layout: int8 sub-scale(/min) codes per group + fp32
    d(/dmin) per superblock (kept EXACT: fp32 holds every fp16 value)."""
    q, sc, m, d, dmin, G, SB = _COMPACT_PLANES[ggml_type](blocks)
    q = q.reshape(n, k)
    sc = sc.reshape(n, k // G)
    m = None if m is None else m.reshape(n, k // G)
    d = d.reshape(n, k // (G * SB)).astype(F32)
    dmin = None if dmin is None else dmin.reshape(n, k // (G * SB)).astype(F32)
    if npad != n:
        pad = lambda a: None if a is None else np.pad(a, ((0, npad - n), (0, 0)))
        q, sc, m, d, dmin = pad(q), pad(sc), pad(m), pad(d), pad(dmin)

    if ggml_type in _Q4_PLANE_TYPES:
        qu = q.astype(np.uint8)
        lo, hi = qu[:, : k // 2], qu[:, k // 2 :]
        codes = np.ascontiguousarray((lo | (hi << 4)).T)  # (K/2, Npad)
        scales = np.ascontiguousarray(sc.T).reshape(2, (k // 2) // G, npad)
        offsets = None if m is None else np.ascontiguousarray(m.T)  # natural order
        # d/dmin plane-major 3D: a (1, rows, bn) block that spans the row
        # dim is always a legal Mosaic tile, so whole-K k-tiles work at any K
        d_pl = np.ascontiguousarray(d.T).reshape(2, (k // 2) // (G * SB), npad)
        dmin_pl = (None if dmin is None else
                   np.ascontiguousarray(dmin.T).reshape(2, (k // 2) // (G * SB), npad))
        return PlanarWeight(
            kind="q4", codes=codes, scales=scales, offsets=offsets,
            group=G, n=n, k=k, orig_type=ggml_type,
            supers=(d_pl, dmin_pl), sb=SB,
        )
    # q8-plane compact (Q6_K): int8 codes, int8 sub-scales, 2D d plane
    codes = np.ascontiguousarray(q.astype(np.int8).T)  # (K, Npad)
    scales = np.ascontiguousarray(sc.T)  # (K/G, Npad) int8
    d_pl = np.ascontiguousarray(d.T)  # (K/(G*SB), Npad)
    return PlanarWeight(
        kind="q8", codes=codes, scales=scales,
        offsets=None if m is None else np.ascontiguousarray(m.T),
        group=G, n=n, k=k, orig_type=ggml_type,
        supers=(d_pl, None if dmin is None else np.ascontiguousarray(dmin.T)),
        sb=SB,
    )


def _wide_pad(n: int, n_pad_to: int) -> int:
    """Pad large-N weights to a 1024 multiple so the GEMV N-tile stays wide:
    at npad=50432 (GPT-J lm head under 128-padding) no 512/1024 tile divides
    and the kernel fell to bn=256 — measured 550 GB/s vs 663-677 on the
    layer GEMVs (OP_PERF.json 2026-08-19).  Costs <0.2% extra bytes."""
    import os

    if os.environ.get("GGML_TPU_WIDE_NPAD", "1") != "1":
        return n_pad_to
    if n >= 4096 and n_pad_to < 1024:
        return 1024
    return n_pad_to


def _repack_numpy(
    raw: np.ndarray,
    ggml_type: GGMLType,
    shape: tuple[int, int],
    n_pad_to: int = 128,
    force_q8: bool = False,
) -> PlanarWeight:
    """Repack raw ggml-format bytes of a (N, K) weight into planar layout.

    raw: uint8 array of the tensor's packed bytes (any shape, row data
    contiguous per ggml row of K elements).
    """
    n, k = shape
    tt = get_type_traits(ggml_type)
    fn = _PLANES.get(ggml_type)
    if fn is None:
        raise ValueError(f"no planar repack for {ggml_type!r}")
    blocks = raw.reshape(n * (k // tt.block_size), tt.type_size)
    if _compact_applicable(ggml_type, k, force_q8):
        npad_c = -(-n // n_pad_to) * n_pad_to
        return _repack_numpy_compact(blocks, ggml_type, n, k, npad_c)
    q, s, o, G = fn(blocks)
    q = q.reshape(n, k)
    s = s.reshape(n, k // G)
    o = None if o is None else o.reshape(n, k // G)

    npad = -(-n // n_pad_to) * n_pad_to
    if npad != n:
        q = np.pad(q, ((0, npad - n), (0, 0)))
        s = np.pad(s, ((0, npad - n), (0, 0)))
        if o is not None:
            o = np.pad(o, ((0, npad - n), (0, 0)))

    # q4: half the HBM traffic; q8: feeds the int8 MXU GEMV (decode-optimal)
    use_q4 = ggml_type in _Q4_PLANE_TYPES and (k // 2) % G == 0 and not force_q8
    scales = np.ascontiguousarray(s.T.astype(F32))  # (K/G, Npad), natural order
    if use_q4:
        qu = q.astype(np.uint8)
        lo, hi = qu[:, : k // 2], qu[:, k // 2 :]
        codes = np.ascontiguousarray((lo | (hi << 4)).T)  # (K/2, Npad)
        # plane-major scales (2, K/2/G, Npad): [0]=low-nibble plane (k < K/2)
        scales = np.ascontiguousarray(scales.reshape(2, (k // 2) // G, npad))
        kind = "q4"
    else:
        if q.min() < -128 or q.max() > 127:
            raise AssertionError(f"codes out of int8 range for {ggml_type!r}")
        codes = np.ascontiguousarray(q.astype(np.int8).T)  # (K, Npad)
        kind = "q8"

    return PlanarWeight(
        kind=kind,
        codes=codes,
        scales=scales,
        offsets=None if o is None else np.ascontiguousarray(o.T.astype(F32)),
        group=G,
        n=n,
        k=k,
        orig_type=ggml_type,
    )


def permute_output_columns(pw: PlanarWeight, perm) -> PlanarWeight:
    """Reorder a weight's logical output features (planar column axis) by
    `perm` (length pw.n); padding columns stay in place.  Columns are fully
    independent in the planar layout (codes/scales/offsets/supers all carry
    N last), so this is an exact relayout — used for the on-load RoPE
    deinterleave permutation (models/gptj.rope_permutation)."""
    npad = np.asarray(pw.codes).shape[-1] if not hasattr(pw.codes, "shape") else pw.codes.shape[-1]
    idx = np.concatenate([np.asarray(perm), np.arange(len(perm), npad)])

    def take(a):
        if a is None:
            return None
        if isinstance(a, np.ndarray):
            return np.ascontiguousarray(a[..., idx])
        import jax.numpy as jnp

        return jnp.take(a, jnp.asarray(idx), axis=-1)

    from dataclasses import replace

    return replace(
        pw,
        codes=take(pw.codes),
        scales=take(pw.scales),
        offsets=take(pw.offsets),
        supers=None if pw.supers is None else tuple(take(s) for s in pw.supers),
    )


def expand_compact(pw: PlanarWeight) -> PlanarWeight:
    """Multiply a compact K-quant factoring back out to fp32 effective
    scale/offset planes (supers=None).  Used where per-plane sharding layouts
    predate the compact format (tensor-parallel repack); the decode GEMV
    keeps the compact planes."""
    if pw.supers is None:
        return pw
    d, dmin = pw.supers
    d = np.asarray(d, F32)
    sc = np.asarray(pw.scales, F32)
    if pw.kind == "q4":
        eff_s = np.repeat(d, pw.sb, axis=1) * sc
    else:
        eff_s = np.repeat(d, pw.sb, axis=0) * sc
    eff_o = None
    if pw.offsets is not None:
        npad = eff_s.shape[-1]
        dmin_nat = np.asarray(dmin, F32).reshape(-1, npad)
        eff_o = -np.repeat(dmin_nat, pw.sb, axis=0) * np.asarray(pw.offsets, F32)
    return PlanarWeight(
        kind=pw.kind, codes=np.asarray(pw.codes), scales=eff_s, offsets=eff_o,
        group=pw.group, n=pw.n, k=pw.k, orig_type=pw.orig_type,
    )


def repack_q4_rows_for_tp(pw: PlanarWeight, n_shards: int) -> PlanarWeight:
    """Permute a packed-nibble plane so CONTIGUOUS row chunks are per-shard
    self-consistent q4 half-planes — making q4 row (K) sharding legal for
    tensor parallelism at full packed density.

    The global packed byte row r pairs elements (r, r+K/2); a contiguous
    K-shard of the activations would tear those pairs across devices.  This
    one-time on-load relayout re-pairs each shard's OWN element range
    [d*K/D, (d+1)*K/D) into local (lo|hi<<4) bytes, so shard d's rows decode
    exactly the elements its local activations cover.  Scales follow the same
    per-shard lo/hi split; offsets are element-group-ordered and need no
    permutation.  (The analog of the reference's CUDA split-buffer row
    sharding + repack, src/ggml-cuda/ggml-cuda.cu:750-960.)
    """
    assert pw.kind == "q4"
    # per-shard nibble re-pairing predates the compact factoring: expand it
    pw = expand_compact(pw)
    K, G = pw.k, pw.group
    Kl = K // n_shards
    if K % n_shards or (Kl // 2) % G:
        raise ValueError(
            f"K={K} cannot be q4-row-sharded {n_shards} ways "
            f"(local half {Kl // 2} must be a multiple of group {G})"
        )
    codes = np.asarray(pw.codes)
    scales = np.asarray(pw.scales)
    lo = codes & 0xF
    hi = codes >> 4
    elems = np.concatenate([lo, hi], axis=0)  # (K, Npad) element-ordered nibbles
    escale = np.concatenate([scales[0], scales[1]], axis=0)  # (K/G, Npad) element groups
    new_codes, s0, s1 = [], [], []
    for d in range(n_shards):
        a = d * Kl
        lo_l = elems[a : a + Kl // 2]
        hi_l = elems[a + Kl // 2 : a + Kl]
        new_codes.append((lo_l | (hi_l << 4)).astype(codes.dtype))
        s0.append(escale[a // G : (a + Kl // 2) // G])
        s1.append(escale[(a + Kl // 2) // G : (a + Kl) // G])
    return PlanarWeight(
        kind="q4",
        codes=np.concatenate(new_codes, axis=0),
        scales=np.stack([np.concatenate(s0, 0), np.concatenate(s1, 0)], axis=0),
        offsets=None if pw.offsets is None else np.asarray(pw.offsets),
        group=G,
        n=pw.n,
        k=K,
        orig_type=pw.orig_type,
    )


def dequant_planar(pw: PlanarWeight) -> np.ndarray:
    """Reconstruct (N, K) fp32 weights from a PlanarWeight (for testing)."""
    if pw.kind == "q4":
        lo = (np.asarray(pw.codes) & 0xF).astype(F32)
        hi = (np.asarray(pw.codes) >> 4).astype(F32)
        q = np.concatenate([lo, hi], axis=0)  # (K, Npad)
        s_nat = np.asarray(pw.scales).reshape(-1, q.shape[1])  # back to (K/G, Npad)
    else:
        q = np.asarray(pw.codes).astype(F32)
        s_nat = np.asarray(pw.scales)
    if pw.supers is not None:
        d, dmin = pw.supers
        d_nat = np.asarray(d, F32).reshape(-1, q.shape[1])
        s_nat = np.repeat(d_nat, pw.sb, axis=0) * s_nat.astype(F32)
        o_nat = None
        if pw.offsets is not None:
            dmin_nat = np.asarray(dmin, F32).reshape(-1, q.shape[1])
            o_nat = -np.repeat(dmin_nat, pw.sb, axis=0) * np.asarray(
                pw.offsets).astype(F32)
    else:
        o_nat = None if pw.offsets is None else np.asarray(pw.offsets)
    s = np.repeat(s_nat, pw.group, axis=0)
    w = s * q
    if o_nat is not None:
        w = w + np.repeat(o_nat, pw.group, axis=0)
    return w.T[: pw.n]
