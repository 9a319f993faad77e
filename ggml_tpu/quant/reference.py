"""Reference (de)quantization in NumPy — the executable specification.

Bit-exact reimplementation of ggml's block-quantization formats
(reference: src/ggml-quants.c, block layouts src/ggml-common.h). These run on
host at model load/convert time; the TPU compute path consumes either
dequantized bf16/f32 arrays or the raw packed bytes (for Pallas fused
dequant-matmul kernels in ggml_tpu.kernels).

Everything is vectorized across blocks: a row of quantized data is viewed as
(n_blocks, type_size) uint8 and decoded with integer gathers. Where the
reference's float semantics depend on *sequential* accumulation order (the
error-minimizing scale searches in the quantizers), we keep the per-element
loop in Python but vectorize across blocks, so results stay bit-exact with a
strict-IEEE (-ffp-contract=off) build of the reference while remaining fast
enough for offline model conversion.

Validated against golden vectors generated from the reference library by
tools/gen_golden.c (see tests/test_quantize.py).
"""

from __future__ import annotations

import os

import numpy as np

from ..dtypes import (
    GGMLType,
    QK_K,
    bf16_bits_to_fp32,
    fp16_bits_to_fp32,
    fp32_to_bf16_bits,
    fp32_to_fp16_bits,
    get_type_traits,
    row_size,
)

F32 = np.float32
_GRIDS = np.load(os.path.join(os.path.dirname(__file__), "data", "iq_grids.npz"))
# codebook tables (format-defining constants, reference: src/ggml-common.h:461-1589)
KMASK_IQ2XS = _GRIDS["kmask_iq2xs"]
KSIGNS_IQ2XS = _GRIDS["ksigns_iq2xs"]
IQ2XXS_GRID = _GRIDS["iq2xxs_grid"].view(np.uint8).reshape(256, 8)
IQ2XS_GRID = _GRIDS["iq2xs_grid"].view(np.uint8).reshape(512, 8)
IQ2S_GRID = _GRIDS["iq2s_grid"].view(np.uint8).reshape(1024, 8)
IQ3XXS_GRID = _GRIDS["iq3xxs_grid"].view(np.uint8).reshape(256, 4)
IQ3S_GRID = _GRIDS["iq3s_grid"].view(np.uint8).reshape(512, 4)
IQ1S_GRID = _GRIDS["iq1s_grid"].view(np.int8).reshape(2048, 8)
KVALUES_IQ4NL = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113], dtype=np.int8
)  # reference: src/ggml-quants.c:2434
IQ1S_DELTA = F32(0.125)  # reference: src/ggml-common.h:1072
GROUP_MAX_EPS = F32(1e-15)


def _f16(blocks: np.ndarray, off: int) -> np.ndarray:
    """fp16 scalar field at byte offset -> (nb,) float32."""
    return np.ascontiguousarray(blocks[:, off : off + 2]).view("<f2").astype(F32).reshape(-1)


def _u16(blocks: np.ndarray, off: int, n: int = 1) -> np.ndarray:
    return np.ascontiguousarray(blocks[:, off : off + 2 * n]).view("<u2").reshape(len(blocks), n)


def _u32(blocks: np.ndarray, off: int, n: int = 1) -> np.ndarray:
    return np.ascontiguousarray(blocks[:, off : off + 4 * n]).view("<u4").reshape(len(blocks), n)


def nearest_int(x: np.ndarray) -> np.ndarray:
    """Round-half-to-even (reference: nearest_int, src/ggml-quants.c:22-29 uses
    the float +2^23 trick which is IEEE ties-to-even)."""
    return np.rint(x).astype(np.int32)


# ---------------------------------------------------------------------------
# Dequantizers: (nb, type_size) uint8 -> (nb, block) float32
# Semantics follow src/ggml-quants.c dequantize_row_* exactly.
# ---------------------------------------------------------------------------


def dequant_q4_0(b):
    d = _f16(b, 0)[:, None]
    qs = b[:, 2:18]
    lo = (qs & 0x0F).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    return np.concatenate([lo, hi], axis=1).astype(F32) * d


def dequant_q4_1(b):
    d = _f16(b, 0)[:, None]
    m = _f16(b, 2)[:, None]
    qs = b[:, 4:20]
    lo = (qs & 0x0F).astype(F32)
    hi = (qs >> 4).astype(F32)
    return np.concatenate([lo, hi], axis=1) * d + m


def _q5_bits(qh_u32):
    """(nb,) uint32 -> (nb, 32) the 5th bits as 0x10/0, ordered per dequant loop."""
    j = np.arange(16)
    xh0 = ((qh_u32[:, None] >> j) << 4) & 0x10  # elements 0..15
    xh1 = (qh_u32[:, None] >> (j + 12)) & 0x10  # elements 16..31
    return np.concatenate([xh0, xh1], axis=1).astype(np.int32)


def dequant_q5_0(b):
    d = _f16(b, 0)[:, None]
    qh = _u32(b, 2).reshape(-1)
    qs = b[:, 6:22]
    lo = (qs & 0x0F).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = np.concatenate([lo, hi], axis=1) | _q5_bits(qh)
    return (q - 16).astype(F32) * d


def dequant_q5_1(b):
    d = _f16(b, 0)[:, None]
    m = _f16(b, 2)[:, None]
    qh = _u32(b, 4).reshape(-1)
    qs = b[:, 8:24]
    lo = (qs & 0x0F).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = np.concatenate([lo, hi], axis=1) | _q5_bits(qh)
    return q.astype(F32) * d + m


def dequant_q8_0(b):
    d = _f16(b, 0)[:, None]
    return b[:, 2:34].view(np.int8).astype(F32) * d


# --- K-quants ---------------------------------------------------------------

# static element->byte/shift maps for the 256-element superblocks
_E = np.arange(QK_K)


def _q2k_maps():
    g = _E // 16  # 16 groups of 16
    l = _E % 16
    qidx = 32 * (g // 8) + 16 * (g % 2) + l
    shift = 2 * ((g % 8) // 2)
    return g, qidx, shift


_Q2K_G, _Q2K_QIDX, _Q2K_SHIFT = _q2k_maps()


def dequant_q2_k(b):
    d = _f16(b, 80)[:, None]
    dmin = _f16(b, 82)[:, None]
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    sc = scales[:, _Q2K_G]
    q = ((qs[:, _Q2K_QIDX] >> _Q2K_SHIFT) & 3).astype(np.int8).astype(F32)
    dl = d * (sc & 0xF).astype(F32)
    ml = dmin * (sc >> 4).astype(F32)
    return dl * q - ml


def _q3k_scales(scales: np.ndarray) -> np.ndarray:
    """12 packed bytes -> 16 6-bit scales, minus 32 (reference: dequantize_row_q3_K
    kmask trick, equivalently quantize_row_q3_K_ref's decode)."""
    j = np.arange(16)
    lo = np.where(j < 8, scales[:, j % 8] & 0xF, scales[:, (j - 8) % 8] >> 4)
    hi = (scales[:, 8 + j % 4] >> (2 * (j // 4))) & 3
    return (lo | (hi << 4)).astype(np.int32) - 32


def dequant_q3_k(b):
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    d = _f16(b, 108)[:, None]
    sc16 = _q3k_scales(b[:, 96:108])
    g = _Q2K_G
    mbit = g // 2  # hmask bit index per group
    hidx = 16 * (g % 2) + (_E % 16)
    hm = (hmask[:, hidx] >> mbit) & 1
    q = ((qs[:, _Q2K_QIDX] >> _Q2K_SHIFT) & 3).astype(np.int32) - np.where(hm == 0, 4, 0)
    dl = d * sc16[:, g].astype(F32)
    return dl * q.astype(F32)


def _k4_scale_min(scales: np.ndarray):
    """(nb,12) packed -> (nb,8) 6-bit sc and m (reference: get_scale_min_k4)."""
    j = np.arange(8)
    sc = np.where(j < 4, scales[:, j % 12] & 63, (scales[:, (j % 4) + 8] & 0xF) | ((scales[:, j % 4] >> 6) << 4))
    m = np.where(j < 4, scales[:, (j % 4) + 4] & 63, (scales[:, (j % 4) + 8] >> 4) | ((scales[:, (j % 4) + 4] >> 6) << 4))
    return sc.astype(F32), m.astype(F32)


_Q4K_IS = 2 * (_E // 64) + (_E % 64) // 32
_Q4K_QIDX = 32 * (_E // 64) + (_E % 32)
_Q4K_NIB = (_E % 64) // 32


def dequant_q4_k(b):
    d = _f16(b, 0)[:, None]
    dmin = _f16(b, 2)[:, None]
    sc, m = _k4_scale_min(b[:, 4:16])
    qs = b[:, 16:144]
    q = np.where(_Q4K_NIB == 0, qs[:, _Q4K_QIDX] & 0xF, qs[:, _Q4K_QIDX] >> 4).astype(F32)
    dl = d * sc[:, _Q4K_IS]
    ml = dmin * m[:, _Q4K_IS]
    return dl * q - ml


def dequant_q5_k(b):
    d = _f16(b, 0)[:, None]
    dmin = _f16(b, 2)[:, None]
    sc, m = _k4_scale_min(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    lo = np.where(_Q4K_NIB == 0, qs[:, _Q4K_QIDX] & 0xF, qs[:, _Q4K_QIDX] >> 4).astype(np.int32)
    ubit = _Q4K_IS  # bit index within qh byte
    hi = ((qh[:, _E % 32] >> ubit) & 1).astype(np.int32) * 16
    dl = d * sc[:, _Q4K_IS]
    ml = dmin * m[:, _Q4K_IS]
    return dl * (lo + hi).astype(F32) - ml


_Q6_HALF = _E // 128
_Q6_R = _E % 128
_Q6_QUAD = _Q6_R // 32
_Q6_L = _Q6_R % 32
_Q6_SC = 8 * _Q6_HALF + 2 * _Q6_QUAD + _Q6_L // 16
_Q6_QL = 64 * _Q6_HALF + 32 * (_Q6_QUAD % 2) + _Q6_L
_Q6_QLHI = _Q6_QUAD // 2  # 0 -> low nibble, 1 -> high nibble
_Q6_QH = 32 * _Q6_HALF + _Q6_L
_Q6_QHS = 2 * _Q6_QUAD


def dequant_q6_k(b):
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].view(np.int8)
    d = _f16(b, 208)[:, None]
    lo = np.where(_Q6_QLHI == 0, ql[:, _Q6_QL] & 0xF, ql[:, _Q6_QL] >> 4).astype(np.int32)
    hi = ((qh[:, _Q6_QH] >> _Q6_QHS) & 3).astype(np.int32) << 4
    q = (lo | hi) - 32
    return d * scales[:, _Q6_SC].astype(F32) * q.astype(F32)


def dequant_q8_k(b):
    d = np.ascontiguousarray(b[:, 0:4]).view("<f4")
    qs = b[:, 4:260].view(np.int8).astype(F32)
    return d * qs


# --- ternary ----------------------------------------------------------------

_POW3 = np.array([1, 3, 9, 27, 81, 243], dtype=np.uint8)


def dequant_tq1_0(b):
    nb = len(b)
    qs = b[:, 0:48]
    qh = b[:, 48:52]
    d = _f16(b, 52)[:, None]
    out = np.empty((nb, QK_K), dtype=F32)
    # first 32-byte chunk: 5 trits per byte, elements laid out m + 32*n
    for n in range(5):
        q = (qs[:, 0:32] * _POW3[n]).astype(np.uint8)
        xi = ((q.astype(np.uint16) * 3) >> 8).astype(np.int16) - 1
        out[:, 32 * n : 32 * (n + 1)] = xi.astype(F32)
    for n in range(5):
        q = (qs[:, 32:48] * _POW3[n]).astype(np.uint8)
        xi = ((q.astype(np.uint16) * 3) >> 8).astype(np.int16) - 1
        out[:, 160 + 16 * n : 160 + 16 * (n + 1)] = xi.astype(F32)
    for n in range(4):
        q = (qh * _POW3[n]).astype(np.uint8)
        xi = ((q.astype(np.uint16) * 3) >> 8).astype(np.int16) - 1
        out[:, 240 + 4 * n : 240 + 4 * (n + 1)] = xi.astype(F32)
    return out * d


def dequant_tq2_0(b):
    qs = b[:, 0:64]
    d = _f16(b, 64)[:, None]
    e = _E
    byte = 32 * (e // 128) + e % 32
    shift = 2 * ((e % 128) // 32)
    q = ((qs[:, byte] >> shift) & 3).astype(np.int8) - 1
    return q.astype(F32) * d


# --- i-quants ---------------------------------------------------------------


def _signs_for(bits7: np.ndarray) -> np.ndarray:
    """(...,) 7-bit sign codes -> (..., 8) +1/-1 float32 via ksigns/kmask."""
    signs = KSIGNS_IQ2XS[bits7]
    return np.where((signs[..., None] & KMASK_IQ2XS) != 0, F32(-1.0), F32(1.0))


def dequant_iq2_xxs(b):
    nb = len(b)
    d = _f16(b, 0)
    q16 = _u16(b, 2, 32).reshape(nb, 8, 2, 2)  # (nb, ib32, aux32 idx, u16 pair)
    aux32 = (q16[..., 0].astype(np.uint32) | (q16[..., 1].astype(np.uint32) << 16))  # (nb, 8, 2)
    aux8 = np.ascontiguousarray(aux32[..., 0]).view(np.uint8).reshape(nb, 8, 4)
    db = d[:, None] * (F32(0.5) + (aux32[..., 1] >> 28).astype(F32)) * F32(0.25)  # (nb, 8)
    grid = IQ2XXS_GRID[aux8].astype(F32)  # (nb, 8, 4, 8)
    shifts = (7 * np.arange(4))[None, None, :]
    signs = _signs_for((aux32[..., 1:2] >> shifts) & 127)  # (nb, 8, 4, 8)
    return (db[:, :, None, None] * grid * signs).reshape(nb, QK_K)


def dequant_iq2_xs(b):
    nb = len(b)
    d = _f16(b, 0)
    q16 = _u16(b, 2, 32).reshape(nb, 8, 4)
    scales = b[:, 66:74]
    sc = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(F32)  # (nb, 8, 2)
    db = d[:, None, None] * (F32(0.5) + sc) * F32(0.25)  # (nb, 8, 2)
    grid = IQ2XS_GRID[q16 & 511].astype(F32)  # (nb, 8, 4, 8)
    signs = _signs_for(q16 >> 9)
    l_half = np.arange(4) // 2
    db_l = db[:, :, l_half]  # (nb, 8, 4)
    return (db_l[..., None] * grid * signs).reshape(nb, QK_K)


def dequant_iq2_s(b):
    nb = len(b)
    d = _f16(b, 0)
    qs = b[:, 2:34].reshape(nb, 8, 4)
    signs_b = b[:, 34:66].reshape(nb, 8, 4)
    qh = b[:, 66:74]
    scales = b[:, 74:82]
    sc = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(F32)
    db = d[:, None, None] * (F32(0.5) + sc) * F32(0.25)
    l = np.arange(4)
    idx = qs.astype(np.int32) | ((qh[:, :, None].astype(np.int32) << (8 - 2 * l)) & 0x300)
    grid = IQ2S_GRID[idx].astype(F32)
    signs = np.where((signs_b[..., None] & KMASK_IQ2XS) != 0, F32(-1.0), F32(1.0))
    db_l = db[:, :, l // 2]
    return (db_l[..., None] * grid * signs).reshape(nb, QK_K)


def dequant_iq3_xxs(b):
    nb = len(b)
    d = _f16(b, 0)
    qs = b[:, 2:66].reshape(nb, 8, 8)  # 8 grid-bytes per ib32
    aux32 = _u32(b, 66, 8)  # scales and signs, one u32 per ib32
    db = d[:, None] * (F32(0.5) + (aux32 >> 28).astype(F32)) * F32(0.5)  # (nb, 8)
    grid = IQ3XXS_GRID[qs].astype(F32).reshape(nb, 8, 4, 8)  # pairs of 4-value rows
    shifts = (7 * np.arange(4))[None, None, :]
    signs = _signs_for((aux32[..., None] >> shifts) & 127)  # (nb, 8, 4, 8)
    return (db[:, :, None, None] * grid * signs).reshape(nb, QK_K)


def dequant_iq3_s(b):
    nb = len(b)
    d = _f16(b, 0)
    qs = b[:, 2:66].reshape(nb, 16, 4)  # per half-ib32 step: 8 bytes -> here (16 groups, 4... )
    # regroup exactly as the reference: per ib32 (8 of them), 8 qs bytes, 1 qh byte, 4 sign bytes
    qs = b[:, 2:66].reshape(nb, 8, 8)
    qh = b[:, 66:74]
    signs_b = b[:, 74:106].reshape(nb, 8, 4)
    scales = b[:, 106:110]
    sc_pair = np.stack([scales & 0xF, scales >> 4], axis=-1).reshape(nb, 8)  # per ib32
    db = d[:, None] * (1 + 2 * sc_pair).astype(F32)  # (nb, 8)
    l = np.arange(4)
    idx1 = qs[:, :, 0::2].astype(np.int32) | ((qh[:, :, None].astype(np.int32) << (8 - 2 * l)) & 256)
    idx2 = qs[:, :, 1::2].astype(np.int32) | ((qh[:, :, None].astype(np.int32) << (7 - 2 * l)) & 256)
    grid1 = IQ3S_GRID[idx1].astype(F32)  # (nb, 8, 4, 4)
    grid2 = IQ3S_GRID[idx2].astype(F32)
    grid = np.concatenate([grid1, grid2], axis=-1)  # (nb, 8, 4, 8) j: 0-3 grid1, 4-7 grid2
    signs = np.where((signs_b[..., None] & KMASK_IQ2XS) != 0, F32(-1.0), F32(1.0))
    return (db[:, :, None, None] * grid * signs).reshape(nb, QK_K)


def dequant_iq1_s(b):
    nb = len(b)
    d = _f16(b, 0)
    qs = b[:, 2:34].reshape(nb, 8, 4)
    qh = _u16(b, 34, 8)  # (nb, 8)
    dl = d[:, None] * (2 * ((qh >> 12) & 7) + 1).astype(F32)  # (nb, 8)
    delta = np.where((qh & 0x8000) != 0, -IQ1S_DELTA, IQ1S_DELTA)  # (nb, 8)
    l = np.arange(4)
    idx = qs.astype(np.int32) | (((qh[:, :, None].astype(np.int32) >> (3 * l)) & 7) << 8)
    grid = IQ1S_GRID[idx].astype(F32)  # (nb, 8, 4, 8)
    return (dl[:, :, None, None] * (grid + delta[:, :, None, None])).reshape(nb, QK_K)


def dequant_iq1_m(b):
    nb = len(b)
    qs = b[:, 0:32].reshape(nb, 8, 4)
    qh = b[:, 32:48].reshape(nb, 8, 2)
    sc = _u16(b, 48, 4)  # (nb, 4)
    scale_bits = (
        (sc[:, 0] >> 12) | ((sc[:, 1] >> 8) & 0x00F0) | ((sc[:, 2] >> 4) & 0x0F00) | (sc[:, 3] & 0xF000)
    ).astype(np.uint16)
    d = fp16_bits_to_fp32(scale_bits)
    ib = np.arange(8)
    dl1 = d[:, None] * (2 * ((sc[:, ib // 2] >> (6 * (ib % 2) + 0)) & 0x7) + 1).astype(F32)
    dl2 = d[:, None] * (2 * ((sc[:, ib // 2] >> (6 * (ib % 2) + 3)) & 0x7) + 1).astype(F32)
    dl = np.stack([dl1, dl1, dl2, dl2], axis=-1)  # (nb, 8, 4) per l
    idx = np.empty((nb, 8, 4), dtype=np.int32)
    idx[..., 0] = qs[..., 0] | ((qh[..., 0].astype(np.int32) << 8) & 0x700)
    idx[..., 1] = qs[..., 1] | ((qh[..., 0].astype(np.int32) << 4) & 0x700)
    idx[..., 2] = qs[..., 2] | ((qh[..., 1].astype(np.int32) << 8) & 0x700)
    idx[..., 3] = qs[..., 3] | ((qh[..., 1].astype(np.int32) << 4) & 0x700)
    delta = np.empty((nb, 8, 4), dtype=F32)
    delta[..., 0] = np.where((qh[..., 0] & 0x08) != 0, -IQ1S_DELTA, IQ1S_DELTA)
    delta[..., 1] = np.where((qh[..., 0] & 0x80) != 0, -IQ1S_DELTA, IQ1S_DELTA)
    delta[..., 2] = np.where((qh[..., 1] & 0x08) != 0, -IQ1S_DELTA, IQ1S_DELTA)
    delta[..., 3] = np.where((qh[..., 1] & 0x80) != 0, -IQ1S_DELTA, IQ1S_DELTA)
    grid = IQ1S_GRID[idx].astype(F32)
    return (dl[..., None] * (grid + delta[..., None])).reshape(nb, QK_K)


def dequant_iq4_nl(b):
    d = _f16(b, 0)[:, None]
    qs = b[:, 2:18]
    lo = KVALUES_IQ4NL[qs & 0xF].astype(F32)
    hi = KVALUES_IQ4NL[qs >> 4].astype(F32)
    return d * np.concatenate([lo, hi], axis=1)


def dequant_iq4_xs(b):
    nb = len(b)
    d = _f16(b, 0)
    scales_h = _u16(b, 2).reshape(-1)
    scales_l = b[:, 4:8]
    qs = b[:, 8:136].reshape(nb, 8, 16)
    ib = np.arange(8)
    ls = ((scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0xF).astype(np.int32) | (
        ((scales_h[:, None].astype(np.int32) >> (2 * ib)) & 3) << 4
    )
    dl = d[:, None] * (ls - 32).astype(F32)  # (nb, 8)
    lo = KVALUES_IQ4NL[qs & 0xF].astype(F32)
    hi = KVALUES_IQ4NL[qs >> 4].astype(F32)
    vals = np.concatenate([lo, hi], axis=-1)  # (nb, 8, 32)
    return (dl[:, :, None] * vals).reshape(nb, QK_K)


_DEQUANT = {
    GGMLType.Q4_0: dequant_q4_0,
    GGMLType.Q4_1: dequant_q4_1,
    GGMLType.Q5_0: dequant_q5_0,
    GGMLType.Q5_1: dequant_q5_1,
    GGMLType.Q8_0: dequant_q8_0,
    GGMLType.Q2_K: dequant_q2_k,
    GGMLType.Q3_K: dequant_q3_k,
    GGMLType.Q4_K: dequant_q4_k,
    GGMLType.Q5_K: dequant_q5_k,
    GGMLType.Q6_K: dequant_q6_k,
    GGMLType.Q8_K: dequant_q8_k,
    GGMLType.TQ1_0: dequant_tq1_0,
    GGMLType.TQ2_0: dequant_tq2_0,
    GGMLType.IQ2_XXS: dequant_iq2_xxs,
    GGMLType.IQ2_XS: dequant_iq2_xs,
    GGMLType.IQ2_S: dequant_iq2_s,
    GGMLType.IQ3_XXS: dequant_iq3_xxs,
    GGMLType.IQ3_S: dequant_iq3_s,
    GGMLType.IQ1_S: dequant_iq1_s,
    GGMLType.IQ1_M: dequant_iq1_m,
    GGMLType.IQ4_NL: dequant_iq4_nl,
    GGMLType.IQ4_XS: dequant_iq4_xs,
}


def dequantize(data: np.ndarray, ggml_type: GGMLType, n_elements: int) -> np.ndarray:
    """Raw bytes -> flat float32 array of n_elements (reference: to_float traits,
    include/ggml.h:2148-2158)."""
    t = GGMLType(ggml_type)
    data = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else data
    data = data.reshape(-1).view(np.uint8)
    if t == GGMLType.F32:
        return data.view("<f4")[:n_elements].astype(F32)
    if t == GGMLType.F16:
        return data.view("<f2")[:n_elements].astype(F32)
    if t == GGMLType.BF16:
        return bf16_bits_to_fp32(data.view("<u2")[:n_elements])
    if t == GGMLType.F64:
        return data.view("<f8")[:n_elements].astype(F32)
    if t in (GGMLType.I8, GGMLType.I16, GGMLType.I32, GGMLType.I64):
        return data.view({GGMLType.I8: np.int8, GGMLType.I16: "<i2", GGMLType.I32: "<i4", GGMLType.I64: "<i8"}[t])[
            :n_elements
        ].astype(F32)
    tr = get_type_traits(t)
    assert n_elements % tr.block_size == 0
    nb = n_elements // tr.block_size
    blocks = data[: nb * tr.type_size].reshape(nb, tr.type_size)
    return _DEQUANT[t](blocks).reshape(-1)


# ---------------------------------------------------------------------------
# Quantizers — bit-exact with the strict-IEEE reference build.
# reference: quantize_row_*_ref in src/ggml-quants.c
# ---------------------------------------------------------------------------


def _signed_absmax(x: np.ndarray):
    """Per-row (amax, signed max) with first-occurrence tie-breaking
    (reference pattern: `if (amax < fabsf(v))`)."""
    ax = np.abs(x)
    idx = np.argmax(ax, axis=1)
    rows = np.arange(len(x))
    return ax[rows, idx], x[rows, idx]


def quant_q4_0(x):
    """x: (nb, 32) f32 -> (nb, 18) u8. reference: src/ggml-quants.c:31-66."""
    nb = len(x)
    _, smax = _signed_absmax(x)
    d = smax / F32(-8.0)
    id_ = np.where(d != 0, F32(1.0) / d, F32(0.0))
    xq = x * id_[:, None]
    xi = np.minimum(15, np.trunc(xq + F32(8.5)).astype(np.int32)).astype(np.uint8)
    out = np.empty((nb, 18), dtype=np.uint8)
    out[:, 0:2] = fp32_to_fp16_bits(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:18] = xi[:, :16] | (xi[:, 16:] << 4)
    return out


def quant_q4_1(x):
    nb = len(x)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = (mx - mn) / F32(15.0)
    id_ = np.where(d != 0, F32(1.0) / d, F32(0.0))
    xq = (x - mn[:, None]) * id_[:, None]
    xi = np.minimum(15, np.trunc(xq + F32(0.5)).astype(np.int32)).astype(np.uint8)
    out = np.empty((nb, 20), dtype=np.uint8)
    out[:, 0:2] = fp32_to_fp16_bits(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = fp32_to_fp16_bits(mn).view(np.uint8).reshape(nb, 2)
    out[:, 4:20] = xi[:, :16] | (xi[:, 16:] << 4)
    return out


def _pack_q5(xi: np.ndarray, out_qs: np.ndarray, nb: int) -> np.ndarray:
    """xi: (nb,32) 5-bit values -> writes nibbles into out_qs, returns qh u32."""
    out_qs[:] = (xi[:, :16] & 0x0F) | ((xi[:, 16:] & 0x0F) << 4)
    bits = (xi >> 4) & 1  # 5th bit
    qh = np.zeros(nb, dtype=np.uint32)
    for j in range(16):
        qh |= bits[:, j].astype(np.uint32) << j
        qh |= bits[:, 16 + j].astype(np.uint32) << (j + 16)
    return qh


def quant_q5_0(x):
    nb = len(x)
    _, smax = _signed_absmax(x)
    d = smax / F32(-16.0)
    id_ = np.where(d != 0, F32(1.0) / d, F32(0.0))
    xq = x * id_[:, None]
    xi = np.minimum(31, np.trunc(xq + F32(16.5)).astype(np.int32)).astype(np.uint8)
    out = np.empty((nb, 22), dtype=np.uint8)
    out[:, 0:2] = fp32_to_fp16_bits(d).view(np.uint8).reshape(nb, 2)
    qh = _pack_q5(xi, out[:, 6:22], nb)
    out[:, 2:6] = qh.view(np.uint8).reshape(nb, 4)
    return out


def quant_q5_1(x):
    nb = len(x)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = (mx - mn) / F32(31.0)
    id_ = np.where(d != 0, F32(1.0) / d, F32(0.0))
    xq = (x - mn[:, None]) * id_[:, None]
    xi = np.trunc(xq + F32(0.5)).astype(np.int32).astype(np.uint8)
    out = np.empty((nb, 24), dtype=np.uint8)
    out[:, 0:2] = fp32_to_fp16_bits(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = fp32_to_fp16_bits(mn).view(np.uint8).reshape(nb, 2)
    qh = _pack_q5(xi, out[:, 8:24], nb)
    out[:, 4:8] = qh.view(np.uint8).reshape(nb, 4)
    return out


def _roundf(x: np.ndarray) -> np.ndarray:
    """C roundf: round half away from zero."""
    return np.where(x >= 0, np.floor(x + F32(0.5)), np.ceil(x - F32(0.5)))


def quant_q8_0(x):
    nb = len(x)
    amax = np.abs(x).max(axis=1)
    d = amax / F32(127.0)
    id_ = np.where(d != 0, F32(1.0) / d, F32(0.0))
    q = _roundf(x * id_[:, None]).astype(np.int8)
    out = np.empty((nb, 34), dtype=np.uint8)
    out[:, 0:2] = fp32_to_fp16_bits(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:34] = q.view(np.uint8)
    return out


def quant_q8_1(x):
    nb = len(x)
    amax = np.abs(x).max(axis=1)
    d = amax / F32(127.0)
    id_ = np.where(d != 0, F32(1.0) / d, F32(0.0))
    q = _roundf(x * id_[:, None]).astype(np.int32)
    s = q.sum(axis=1).astype(F32) * d
    out = np.empty((nb, 36), dtype=np.uint8)
    out[:, 0:2] = fp32_to_fp16_bits(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = fp32_to_fp16_bits(s).view(np.uint8).reshape(nb, 2)
    out[:, 4:36] = q.astype(np.int8).view(np.uint8)
    return out


def quant_q8_k(x):
    """reference: quantize_row_q8_K_ref (src/ggml-quants.c:2479)."""
    nb = len(x)
    amax, smax = _signed_absmax(x)
    out = np.zeros((nb, 292), dtype=np.uint8)
    nz = amax != 0
    iscale = np.where(nz, F32(-127.0) / np.where(smax != 0, smax, F32(1.0)), F32(0.0))
    q = np.minimum(127, nearest_int(iscale[:, None] * x)).astype(np.int8)
    q = np.where(nz[:, None], q, 0)
    d = np.where(nz, np.where(iscale != 0, F32(1.0) / np.where(iscale != 0, iscale, F32(1.0)), F32(0.0)), F32(0.0))
    bsums = q.astype(np.int32).reshape(nb, 16, 16).sum(axis=2).astype("<i2")
    out[:, 0:4] = d.astype("<f4").view(np.uint8).reshape(nb, 4)
    out[:, 4:260] = q.view(np.uint8)
    out[:, 260:292] = bsums.view(np.uint8).reshape(nb, 32)
    return out


# --- scale-search helpers for K-quants (reference: src/ggml-quants.c:379-560) ---


def _seq_sum3(w, x, l):
    """Sequential float32 sum of w*x*l over axis 1 (matches C accumulation order)."""
    acc = np.zeros(len(w), dtype=F32)
    for j in range(w.shape[1]):
        acc = acc + w[:, j] * x[:, j] * l[:, j].astype(F32)
    return acc


def _seq_sum2(w, l):
    acc = np.zeros(len(w), dtype=F32)
    for j in range(w.shape[1]):
        acc = acc + w[:, j] * l[:, j].astype(F32) * l[:, j].astype(F32)
    return acc


def make_qx_quants(x, nmax, rmse_type=1, qw=None):
    """Vectorized over rows. x: (nr, n). Returns (scale (nr,), L (nr, n) ints in
    [0, 2*nmax-1]). reference: make_qx_quants src/ggml-quants.c:379."""
    nr, n = x.shape
    amax, smax = _signed_absmax(x)
    dead = amax < GROUP_MAX_EPS
    safe_max = np.where(smax != 0, smax, F32(1.0))
    iscale = F32(-nmax) / safe_max
    assert rmse_type == 1
    if qw is None:
        w_all = x * x
    else:
        w_all = qw
    l = np.clip(nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
    L = l + nmax
    sumlx = _seq_sum3(w_all, x, l)
    suml2 = _seq_sum2(w_all, l)
    scale = np.where(suml2 != 0, sumlx / np.where(suml2 != 0, suml2, F32(1.0)), F32(0.0))
    best = scale * sumlx
    for is_ in range(-9, 10):
        if is_ == 0:
            continue
        iscale_is = -(F32(nmax) + F32(0.1) * F32(is_)) / safe_max
        l2 = np.clip(nearest_int(iscale_is[:, None] * x), -nmax, nmax - 1)
        sumlx2 = _seq_sum3(w_all, x, l2)
        suml22 = _seq_sum2(w_all, l2)
        better = (suml22 > 0) & (sumlx2 * sumlx2 > best * suml22)
        L = np.where(better[:, None], l2 + nmax, L)
        new_scale = sumlx2 / np.where(suml22 != 0, suml22, F32(1.0))
        scale = np.where(better, new_scale, scale)
        best = np.where(better, new_scale * sumlx2, best)
    scale = np.where(dead, F32(0.0), scale)
    L = np.where(dead[:, None], 0, L)
    return scale, L


def make_qkx2_quants(x, weights, nmax, rmin, rdelta, nstep, use_mad):
    """Vectorized over rows. Returns (scale, the_min, L).
    reference: make_qkx2_quants src/ggml-quants.c:550."""
    nr, n = x.shape
    mn = np.minimum(x.min(axis=1), F32(0.0))
    mx = x.max(axis=1)
    sum_w = np.zeros(nr, dtype=F32)
    sum_x = np.zeros(nr, dtype=F32)
    for j in range(n):
        sum_w = sum_w + weights[:, j]
        sum_x = sum_x + weights[:, j] * x[:, j]
    dead = mx == mn
    rng = np.where(dead, F32(1.0), mx - mn)
    iscale = F32(nmax) / rng
    scale = F32(1.0) / iscale
    L = np.clip(nearest_int(iscale[:, None] * (x - mn[:, None])), 0, nmax)
    diff = scale[:, None] * L.astype(F32) + mn[:, None] - x
    diff = np.abs(diff) if use_mad else diff * diff
    best_mad = np.zeros(nr, dtype=F32)
    for j in range(n):
        best_mad = best_mad + weights[:, j] * diff[:, j]
    # NOTE: the reference mutates `min` inside the candidate loop — each
    # iteration's iscale and shift use the best min found so far.
    minv = mn.copy()
    for is_ in range(nstep + 1):
        rng_cur = np.where(dead, F32(1.0), mx - minv)
        iscale_is = (F32(rmin) + F32(rdelta) * F32(is_) + F32(nmax)) / rng_cur
        laux = np.clip(nearest_int(iscale_is[:, None] * (x - minv[:, None])), 0, nmax)
        sum_l = np.zeros(nr, dtype=F32)
        sum_l2 = np.zeros(nr, dtype=F32)
        sum_xl = np.zeros(nr, dtype=F32)
        for j in range(n):
            wl = weights[:, j] * laux[:, j].astype(F32)
            sum_l = sum_l + wl
            sum_l2 = sum_l2 + wl * laux[:, j].astype(F32)
            sum_xl = sum_xl + wl * x[:, j]
        D = sum_w * sum_l2 - sum_l * sum_l
        safe_D = np.where(D > 0, D, F32(1.0))
        this_scale = (sum_w * sum_xl - sum_x * sum_l) / safe_D
        this_min = (sum_l2 * sum_x - sum_l * sum_xl) / safe_D
        pos = this_min > 0
        this_min = np.where(pos, F32(0.0), this_min)
        safe_l2 = np.where(sum_l2 != 0, sum_l2, F32(1.0))
        this_scale = np.where(pos, sum_xl / safe_l2, this_scale)
        diff = this_scale[:, None] * laux.astype(F32) + this_min[:, None] - x
        diff = np.abs(diff) if use_mad else diff * diff
        mad = np.zeros(nr, dtype=F32)
        for j in range(n):
            mad = mad + weights[:, j] * diff[:, j]
        better = (D > 0) & (mad < best_mad)
        L = np.where(better[:, None], laux, L)
        best_mad = np.where(better, mad, best_mad)
        scale = np.where(better, this_scale, scale)
        minv = np.where(better, this_min, minv)
    scale = np.where(dead, F32(0.0), scale)
    L = np.where(dead[:, None], 0, L)
    minv = np.where(dead, mn, minv)
    return scale, -minv, L


def quant_q2_k(x):
    """x: (nb, 256) -> (nb, 84). reference: quantize_row_q2_K_ref src/ggml-quants.c:643."""
    nb = len(x)
    xg = x.reshape(nb * 16, 16)
    weights = np.abs(xg)
    scales, mins, L = make_qkx2_quants(xg, weights, 3, -0.5, 0.1, 15, True)
    scales = scales.reshape(nb, 16)
    mins = mins.reshape(nb, 16)
    L = L.reshape(nb, QK_K)
    q4scale = F32(15.0)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    sc_pos = max_scale > 0
    iscale_s = np.where(sc_pos, q4scale / np.where(sc_pos, max_scale, F32(1.0)), F32(0.0))
    packed_sc = np.where(sc_pos[:, None], nearest_int(iscale_s[:, None] * scales), 0).astype(np.uint8)
    d_out = np.where(sc_pos, max_scale / q4scale, F32(0.0))
    mn_pos = max_min > 0
    iscale_m = np.where(mn_pos, q4scale / np.where(mn_pos, max_min, F32(1.0)), F32(0.0))
    packed_mn = np.where(mn_pos[:, None], nearest_int(iscale_m[:, None] * mins), 0).astype(np.uint8)
    dmin_out = np.where(mn_pos, max_min / q4scale, F32(0.0))
    sc_bytes = packed_sc | (packed_mn << 4)
    d16 = fp16_bits_to_fp32(fp32_to_fp16_bits(d_out))
    dmin16 = fp16_bits_to_fp32(fp32_to_fp16_bits(dmin_out))
    # requantize with the coded scales
    dgl = d16[:, None] * (sc_bytes & 0xF).astype(F32)  # (nb,16)
    dml = dmin16[:, None] * (sc_bytes >> 4).astype(F32)
    g = _Q2K_G
    dg = dgl[:, g]
    dm = dml[:, g]
    safe = np.where(dg != 0, dg, F32(1.0))
    newL = np.clip(nearest_int((x + dm) / safe), 0, 3)
    L = np.where(dg != 0, newL, L)
    # pack 2-bit values: y.qs[j/4 + l] = L[j+l] | L[j+l+32]<<2 | L[j+l+64]<<4 | L[j+l+96]<<6
    Lb = L.astype(np.uint8).reshape(nb, 2, 4, 32)  # [128-half][32-group][l]
    qs = Lb[:, :, 0] | (Lb[:, :, 1] << 2) | (Lb[:, :, 2] << 4) | (Lb[:, :, 3] << 6)
    out = np.empty((nb, 84), dtype=np.uint8)
    out[:, 0:16] = sc_bytes
    out[:, 16:80] = qs.reshape(nb, 64)
    out[:, 80:82] = fp32_to_fp16_bits(d_out).view(np.uint8).reshape(nb, 2)
    out[:, 82:84] = fp32_to_fp16_bits(dmin_out).view(np.uint8).reshape(nb, 2)
    return out


def make_q3_quants(x, nmax, do_rmse=True):
    """reference: make_q3_quants src/ggml-quants.c:449. Iterative per-element
    refinement is inherently sequential; vectorized across rows."""
    nr, n = x.shape
    amax, smax = _signed_absmax(x)
    dead = amax < GROUP_MAX_EPS
    safe_max = np.where(smax != 0, smax, F32(1.0))
    iscale = F32(-nmax) / safe_max
    assert do_rmse
    L = np.clip(nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
    w = x * x
    sumlx = _seq_sum3(w, x, L)
    suml2 = _seq_sum2(w, L)
    for _ in range(5):
        n_changed = 0
        for i in range(n):
            wi = w[:, i]
            slx = sumlx - wi * x[:, i] * L[:, i].astype(F32)
            sl2 = suml2 - wi * L[:, i].astype(F32) * L[:, i].astype(F32)
            pos = slx > 0
            safe_slx = np.where(pos, slx, F32(1.0))
            new_l = np.clip(nearest_int(x[:, i] * sl2 / safe_slx), -nmax, nmax - 1)
            cand_slx = slx + wi * x[:, i] * new_l.astype(F32)
            cand_sl2 = sl2 + wi * new_l.astype(F32) * new_l.astype(F32)
            better = pos & (new_l != L[:, i]) & (cand_sl2 > 0) & (cand_slx * cand_slx * suml2 > sumlx * sumlx * cand_sl2)
            L[:, i] = np.where(better, new_l, L[:, i])
            sumlx = np.where(better, cand_slx, sumlx)
            suml2 = np.where(better, cand_sl2, suml2)
            n_changed += int(better.sum())
        if n_changed == 0:
            break
    L = L + nmax
    scale = sumlx / np.where(suml2 != 0, suml2, F32(1.0))
    scale = np.where(dead, F32(0.0), scale)
    L = np.where(dead[:, None], 0, L)
    return scale, L


def _pack_q3k_scales(Ls: np.ndarray) -> np.ndarray:
    """(nb, 16) 6-bit values -> (nb, 12) packed (reference: quantize_row_q3_K_ref)."""
    nb = len(Ls)
    out = np.zeros((nb, 12), dtype=np.uint8)
    for j in range(16):
        l = Ls[:, j].astype(np.uint8)
        if j < 8:
            out[:, j] |= l & 0xF
        else:
            out[:, j - 8] |= (l & 0xF) << 4
        out[:, 8 + j % 4] |= (l >> 4) << (2 * (j // 4))
    return out


def quant_q3_k(x):
    """reference: quantize_row_q3_K_ref src/ggml-quants.c:995."""
    nb = len(x)
    xg = x.reshape(nb * 16, 16)
    scales, L = make_q3_quants(xg, 4, True)
    scales = scales.reshape(nb, 16)
    L = L.reshape(nb, QK_K).astype(np.int32)
    absc = np.abs(scales)
    idx = np.argmax(absc, axis=1)
    rows = np.arange(nb)
    amax_sc = absc[rows, idx]
    max_scale = scales[rows, idx]
    has = amax_sc != 0  # matches `if (max_scale)`
    safe_ms = np.where(max_scale != 0, max_scale, F32(1.0))
    iscale = F32(-32.0) / safe_ms
    lvals = np.clip(nearest_int(iscale[:, None] * scales), -32, 31) + 32
    lvals = np.where(has[:, None], lvals, 0)
    packed = _pack_q3k_scales(lvals)
    d_out = np.where(has, F32(1.0) / iscale, F32(0.0))
    d16 = fp16_bits_to_fp32(fp32_to_fp16_bits(d_out))
    sc16 = _q3k_scales(packed)
    dscale = d16[:, None] * sc16.astype(F32)  # (nb, 16)
    g = _Q2K_G
    dg = dscale[:, g]
    safe = np.where(dg != 0, dg, F32(1.0))
    newL = np.clip(nearest_int(x / safe), -4, 3) + 4
    L = np.where(dg != 0, newL, L)
    # high-bit mask: bit m of hmask[byte] for element j: byte = j % 32, bit = j // 32
    hbit = (L > 3).astype(np.uint8)
    L = np.where(L > 3, L - 4, L)
    hm = np.zeros((nb, 32), dtype=np.uint8)
    for bit in range(8):
        seg = hbit[:, 32 * bit : 32 * (bit + 1)]
        hm |= seg << bit
    Lb = L.astype(np.uint8).reshape(nb, 2, 4, 32)
    qs = Lb[:, :, 0] | (Lb[:, :, 1] << 2) | (Lb[:, :, 2] << 4) | (Lb[:, :, 3] << 6)
    out = np.empty((nb, 110), dtype=np.uint8)
    out[:, 0:32] = hm
    out[:, 32:96] = qs.reshape(nb, 64)
    out[:, 96:108] = packed
    out[:, 108:110] = fp32_to_fp16_bits(d_out).view(np.uint8).reshape(nb, 2)
    return out


def _pack_k4_scales(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """(nb, 8) 6-bit scales/mins -> (nb, 12) (reference: quantize_row_q4_K_ref)."""
    nb = len(ls)
    out = np.zeros((nb, 12), dtype=np.uint8)
    for j in range(8):
        if j < 4:
            out[:, j] = ls[:, j]
            out[:, j + 4] = lm[:, j]
        else:
            out[:, j + 4] = (ls[:, j] & 0xF) | ((lm[:, j] & 0xF) << 4)
            out[:, j - 4] |= (ls[:, j] >> 4) << 6
            out[:, j - 0] |= (lm[:, j] >> 4) << 6
    return out


def _quant_k45(x, nmax, rmin, rdelta, nstep):
    """Shared q4_K/q5_K scale computation. Returns sc_bytes, d16, dmin16, d_out, dmin_out, L."""
    nb = len(x)
    xg = x.reshape(nb * 8, 32)
    sum_x2 = np.zeros(nb * 8, dtype=F32)
    for l in range(32):
        sum_x2 = sum_x2 + xg[:, l] * xg[:, l]
    av_x = np.sqrt(sum_x2 / F32(32.0), dtype=F32)
    weights = av_x[:, None] + np.abs(xg)
    scales, mins, L = make_qkx2_quants(xg, weights, nmax, rmin, rdelta, nstep, False)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    L = L.reshape(nb, QK_K).astype(np.int32)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(max_scale > 0, F32(63.0) / np.where(max_scale > 0, max_scale, F32(1.0)), F32(0.0))
    inv_min = np.where(max_min > 0, F32(63.0) / np.where(max_min > 0, max_min, F32(1.0)), F32(0.0))
    ls = np.minimum(63, nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, nearest_int(inv_min[:, None] * mins)).astype(np.uint8)
    sc_bytes = _pack_k4_scales(ls, lm)
    d_out = max_scale / F32(63.0)
    dmin_out = max_min / F32(63.0)
    d16 = fp16_bits_to_fp32(fp32_to_fp16_bits(d_out))
    dmin16 = fp16_bits_to_fp32(fp32_to_fp16_bits(dmin_out))
    # requantize
    sc, m = _k4_scale_min(sc_bytes)
    dgl = d16[:, None] * sc  # (nb, 8)
    dml = dmin16[:, None] * m
    j8 = _E // 32  # 8 groups of 32
    dg = dgl[:, j8]
    dm = dml[:, j8]
    safe = np.where(dg != 0, dg, F32(1.0))
    newL = np.clip(nearest_int((x + dm) / safe), 0, nmax)
    L = np.where(dg != 0, newL, L)
    return sc_bytes, d_out, dmin_out, L


def quant_q4_k(x):
    """reference: quantize_row_q4_K_ref src/ggml-quants.c:1207."""
    nb = len(x)
    sc_bytes, d_out, dmin_out, L = _quant_k45(x, 15, -1.0, 0.1, 20)
    Lb = L.astype(np.uint8).reshape(nb, 4, 2, 32)  # [64-half][sub][l]
    qs = Lb[:, :, 0] | (Lb[:, :, 1] << 4)
    out = np.empty((nb, 144), dtype=np.uint8)
    out[:, 0:2] = fp32_to_fp16_bits(d_out).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = fp32_to_fp16_bits(dmin_out).view(np.uint8).reshape(nb, 2)
    out[:, 4:16] = sc_bytes
    out[:, 16:144] = qs.reshape(nb, 128)
    return out


def quant_q5_k(x):
    """reference: quantize_row_q5_K_ref src/ggml-quants.c:1398."""
    nb = len(x)
    sc_bytes, d_out, dmin_out, L = _quant_k45(x, 31, -0.5, 0.1, 15)
    Lb = L.reshape(nb, 4, 2, 32)
    hi = (Lb > 15).astype(np.uint8)
    lo = np.where(Lb > 15, Lb - 16, Lb).astype(np.uint8)
    qs = lo[:, :, 0] | (lo[:, :, 1] << 4)
    qh = np.zeros((nb, 32), dtype=np.uint8)
    for n4 in range(4):
        qh |= hi[:, n4, 0] << (2 * n4)
        qh |= hi[:, n4, 1] << (2 * n4 + 1)
    out = np.empty((nb, 176), dtype=np.uint8)
    out[:, 0:2] = fp32_to_fp16_bits(d_out).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = fp32_to_fp16_bits(dmin_out).view(np.uint8).reshape(nb, 2)
    out[:, 4:16] = sc_bytes
    out[:, 16:48] = qh
    out[:, 48:176] = qs.reshape(nb, 128)
    return out


def quant_q6_k(x):
    """reference: quantize_row_q6_K_ref src/ggml-quants.c:1620."""
    nb = len(x)
    xg = x.reshape(nb * 16, 16)
    scales, L = make_qx_quants(xg, 32, 1, None)
    scales = scales.reshape(nb, 16)
    L = L.reshape(nb, QK_K).astype(np.int32)
    absc = np.abs(scales)
    idx = np.argmax(absc, axis=1)
    rows = np.arange(nb)
    max_abs_scale = absc[rows, idx]
    max_scale = scales[rows, idx]
    dead = max_abs_scale < GROUP_MAX_EPS
    safe_ms = np.where(max_scale != 0, max_scale, F32(1.0))
    iscale = F32(-128.0) / safe_ms
    d_out = np.where(dead, F32(0.0), F32(1.0) / iscale)
    sc8 = np.minimum(127, nearest_int(iscale[:, None] * scales)).astype(np.int8)
    sc8 = np.where(dead[:, None], 0, sc8)
    d16 = fp16_bits_to_fp32(fp32_to_fp16_bits(d_out))
    dscale = d16[:, None] * sc8.astype(F32)
    g = _E // 16
    dg = dscale[:, g]
    safe = np.where(dg != 0, dg, F32(1.0))
    newL = np.clip(nearest_int(x / safe), -32, 31) + 32
    L = np.where(dg != 0, newL, L)
    L = np.where(dead[:, None], 0, L).astype(np.uint8)
    Lb = L.reshape(nb, 2, 4, 32)  # [128-half][quadrant][l]
    ql = np.empty((nb, 2, 2, 32), dtype=np.uint8)
    ql[:, :, 0] = (Lb[:, :, 0] & 0xF) | ((Lb[:, :, 2] & 0xF) << 4)
    ql[:, :, 1] = (Lb[:, :, 1] & 0xF) | ((Lb[:, :, 3] & 0xF) << 4)
    qh = (Lb[:, :, 0] >> 4) | ((Lb[:, :, 1] >> 4) << 2) | ((Lb[:, :, 2] >> 4) << 4) | ((Lb[:, :, 3] >> 4) << 6)
    out = np.zeros((nb, 210), dtype=np.uint8)
    out[:, 0:128] = ql.reshape(nb, 128)
    out[:, 128:192] = qh.reshape(nb, 64)
    out[:, 192:208] = sc8.view(np.uint8)
    out[:, 208:210] = fp32_to_fp16_bits(d_out).view(np.uint8).reshape(nb, 2)
    return out


def _lroundf(x):
    return np.where(x >= 0, np.floor(x + F32(0.5)), np.ceil(x - F32(0.5))).astype(np.int32)


def quant_tq1_0(x):
    """reference: quantize_row_tq1_0_ref src/ggml-quants.c:2043."""
    nb = len(x)
    amax = np.abs(x).max(axis=1)
    d = amax
    id_ = np.where(d != 0, F32(1.0) / np.where(d != 0, d, F32(1.0)), F32(0.0))
    xi = (_lroundf(x * id_[:, None]) + 1).astype(np.uint16)  # 0,1,2
    out = np.zeros((nb, 54), dtype=np.uint8)
    # qs[0:32]: 5 trits per byte from elements m + 32n
    q = np.zeros((nb, 32), dtype=np.uint16)
    for n in range(5):
        q = q * 3 + xi[:, 32 * n : 32 * (n + 1)]
    out[:, 0:32] = ((q * 256 + 242) // 243).astype(np.uint8)
    q = np.zeros((nb, 16), dtype=np.uint16)
    for n in range(5):
        q = q * 3 + xi[:, 160 + 16 * n : 160 + 16 * (n + 1)]
    out[:, 32:48] = ((q * 256 + 242) // 243).astype(np.uint8)
    q = np.zeros((nb, 4), dtype=np.uint16)
    for m in range(4):
        q = q * 3 + xi[:, 240 + 4 * m : 240 + 4 * (m + 1)]
    q = q * 3
    out[:, 48:52] = ((q * 256 + 242) // 243).astype(np.uint8)
    out[:, 52:54] = fp32_to_fp16_bits(d).view(np.uint8).reshape(nb, 2)
    return out


def quant_tq2_0(x):
    """reference: quantize_row_tq2_0_ref src/ggml-quants.c:2090."""
    nb = len(x)
    amax = np.abs(x).max(axis=1)
    d = amax
    id_ = np.where(d != 0, F32(1.0) / np.where(d != 0, d, F32(1.0)), F32(0.0))
    xi = ((_lroundf(x * id_[:, None]) + 1) & 3).astype(np.uint8)
    xb = xi.reshape(nb, 2, 4, 32)
    qs = xb[:, :, 0] | (xb[:, :, 1] << 2) | (xb[:, :, 2] << 4) | (xb[:, :, 3] << 6)
    out = np.zeros((nb, 66), dtype=np.uint8)
    out[:, 0:64] = qs.reshape(nb, 64)
    out[:, 64:66] = fp32_to_fp16_bits(d).view(np.uint8).reshape(nb, 2)
    return out


_QUANT = {
    GGMLType.Q4_0: quant_q4_0,
    GGMLType.Q4_1: quant_q4_1,
    GGMLType.Q5_0: quant_q5_0,
    GGMLType.Q5_1: quant_q5_1,
    GGMLType.Q8_0: quant_q8_0,
    GGMLType.Q8_1: quant_q8_1,
    GGMLType.Q2_K: quant_q2_k,
    GGMLType.Q3_K: quant_q3_k,
    GGMLType.Q4_K: quant_q4_k,
    GGMLType.Q5_K: quant_q5_k,
    GGMLType.Q6_K: quant_q6_k,
    GGMLType.Q8_K: quant_q8_k,
    GGMLType.TQ1_0: quant_tq1_0,
    GGMLType.TQ2_0: quant_tq2_0,
}


def supported_quant_types():
    """Types quantize() accepts without an imatrix.  The imatrix-required
    grid quants (IQ2_XXS/IQ2_XS/IQ1_S) go through
    quant.imatrix.quantize_with_imatrix."""
    return sorted(
        set(_QUANT.keys())
        | {
            GGMLType.IQ4_NL,
            GGMLType.IQ4_XS,
            GGMLType.IQ2_S,
            GGMLType.IQ3_XXS,
            GGMLType.IQ3_S,
            GGMLType.IQ1_M,
        }
    )


def supported_dequant_types():
    return sorted(_DEQUANT.keys())


def quantize(x: np.ndarray, ggml_type: GGMLType) -> np.ndarray:
    """float32 array -> packed bytes (reference: ggml_quantize_chunk,
    src/ggml.c:6373). Rows = trailing dimension."""
    t = GGMLType(ggml_type)
    x = np.ascontiguousarray(x, dtype=np.float32)
    if t == GGMLType.F32:
        return x.reshape(-1).view(np.uint8).copy()
    if t == GGMLType.F16:
        return x.reshape(-1).astype(np.float16).view(np.uint8).copy()
    if t == GGMLType.BF16:
        return fp32_to_bf16_bits(x.reshape(-1)).view(np.uint8).copy()
    if t in (GGMLType.IQ4_NL, GGMLType.IQ4_XS):
        # non-linear LUT quantizers live with the weighted paths
        from .imatrix import quant_iq4_nl, quant_iq4_xs

        fn = quant_iq4_nl if t == GGMLType.IQ4_NL else quant_iq4_xs
        blk = get_type_traits(t).block_size
        return fn(x.reshape(-1, blk) if t == GGMLType.IQ4_NL else x.reshape(-1, QK_K)).reshape(-1)
    if t in (GGMLType.IQ2_S, GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_M):
        # grid-codebook encoders that allow a missing imatrix
        # (reference: quantize_row_iq*_ref in src/ggml-quants.c)
        from . import iquant_encode as IE

        fn = {
            GGMLType.IQ2_S: IE.quant_iq2_s,
            GGMLType.IQ3_XXS: IE.quant_iq3_xxs,
            GGMLType.IQ3_S: IE.quant_iq3_s,
            GGMLType.IQ1_M: IE.quant_iq1_m,
        }[t]
        return fn(x.reshape(-1, QK_K), None).reshape(-1)
    if t in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ1_S):
        raise ValueError(
            f"{t.name} requires an importance matrix; use "
            "quant.imatrix.quantize_with_imatrix "
            "(reference: ggml_quantize_requires_imatrix, include/ggml.h:2119)"
        )
    tr = get_type_traits(t)
    n = x.size
    assert n % tr.block_size == 0, (t, x.shape)
    blocks = x.reshape(-1, tr.block_size)
    return _QUANT[t](blocks).reshape(-1)
