"""Grid-codebook i-quant encoders: IQ2_XXS / IQ2_XS / IQ2_S, IQ3_XXS / IQ3_S,
IQ1_S / IQ1_M.

Reference: iq2xs_init_impl / iq3xs_init_impl neighbour-map construction
(src/ggml-quants.c:2564-2918, :3358-3522) and the quantize_row impls
(quantize_row_iq2_xxs_impl :2954, iq2_xs :3127, iq3_xxs :3548, iq3_s :3778,
iq1_s :4116, iq1_m :4294, iq2_s :4749).  Bit-exact with a strict-IEEE build
of the reference; validated against tools/gen_golden.c vectors.

Design notes (TPU-repo idiom, not a port):
- The reference precomputes a packed neighbour table for every missing point
  of the code lattice at init.  We instead build the candidate list lazily
  per queried lattice point and memoise — the encoder only ever touches a few
  hundred distinct off-grid points.  The candidate *set* is identical (all
  grid points within the `nwant` smallest distinct L2 distances) and the
  *order* is identical too, because the reference sorts with an explicit
  (distance, index) tie-break (iq2_compare_func, src/ggml-quants.c:2558).
- All float arithmetic is float32 with the reference's scalar accumulation
  order: we vectorise across independent sub-blocks and keep the sequential
  axes (element accumulation, scale-candidate scan, split search) as Python
  loops so every intermediate rounds exactly like the C code.
- The 2-bit code grids are reconstructed from the dequantisation grids in
  data/iq_grids.npz by inverting the per-type value maps (e.g. the IQ2 grid
  bytes {8,25,43} are the images of codes {0,1,2}); this reproduces the
  reference's private kgrid_* tables without copying them.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..dtypes import QK_K, fp32_to_fp16_bits
from . import reference as R
from .reference import F32, nearest_int


def _imatrix_helpers():
    """Deferred import: imatrix.py registers this module's encoders in its
    dispatch table at import time, so a module-level import here would be
    circular."""
    from .imatrix import _seq_sumsq, make_qp_quants

    return _seq_sumsq, make_qp_quants

GROUP_MAX_EPS = F32(1e-15)
GROUP_MAX_EPS_IQ3_XXS = F32(1e-8)
GROUP_MAX_EPS_IQ2_S = F32(1e-8)
GROUP_MAX_EPS_IQ1_M = F32(1e-7)
GROUP_MAX_EPS_IQ1_S = F32(1e-12)
FLT_MIN = np.finfo(np.float32).tiny  # 1.17549435e-38
IQ1S_DELTA = F32(0.125)  # src/ggml-common.h:1072
IQ1M_DELTA = F32(0.125)  # src/ggml-common.h:1073


# ---------------------------------------------------------------------------
# Lattice helpers
# ---------------------------------------------------------------------------


class _Lattice:
    """Code lattice for one i-quant family: the grid's integer codes, the
    code->grid-index map, and lazily-built nearest-neighbour candidate lists
    (analog of iq2_data/iq3_data in src/ggml-quants.c:2530,3341)."""

    def __init__(self, codes: np.ndarray, kmap_size: int, nwant: int, shift: int):
        self.L = codes.astype(np.int8)  # (ngrid, dim) integer codes l
        self.pos = (2 * codes + 1).astype(np.int8)  # the kgrid byte values
        self.posf = self.pos.astype(F32)  # pre-cast: the hot gather in the
        # neighbour search then skips a per-call astype over (B, maxn, dim)
        self.dim = codes.shape[1]
        self.shift = shift  # bits per code field in the packed index
        self.nwant = nwant
        ngrid = len(codes)
        idx = np.zeros(ngrid, np.int64)
        for i in range(self.dim):
            idx |= codes[:, i].astype(np.int64) << (shift * i)
        self.kmap = np.full(kmap_size, -1, np.int32)
        self.kmap[idx] = np.arange(ngrid, dtype=np.int32)
        self._neigh: dict[int, np.ndarray] = {}

    def neighbours(self, u: int) -> np.ndarray:
        """Grid indices within the nwant smallest distinct squared distances
        of lattice point u, ordered by (distance, index) — exactly the
        reference's qsort(iq2_compare_func) order."""
        r = self._neigh.get(u)
        if r is None:
            mask = (1 << self.shift) - 1
            pu = np.array(
                [2 * ((u >> (self.shift * i)) & mask) + 1 for i in range(self.dim)],
                np.int32,
            )
            d2 = ((self.pos.astype(np.int32) - pu) ** 2).sum(1)
            order = np.lexsort((np.arange(len(d2)), d2))
            ds = d2[order]
            cutoff = np.unique(ds)[: self.nwant][-1]
            r = order[: int(np.searchsorted(ds, cutoff, side="right"))].astype(np.int32)
            self._neigh[u] = r
        return r


def _codes_from_values(grid_u8: np.ndarray, values) -> np.ndarray:
    """Invert a bijective dequant-value -> code map."""
    lut = np.full(256, -1, np.int16)
    lut[np.asarray(values)] = np.arange(len(values))
    codes = lut[grid_u8]
    assert (codes >= 0).all()
    return codes


@lru_cache(maxsize=None)
def _lat_iq2_xxs():
    return _Lattice(_codes_from_values(R.IQ2XXS_GRID, [8, 25, 43]), 43692, 2, 2)


@lru_cache(maxsize=None)
def _lat_iq2_xs():
    return _Lattice(_codes_from_values(R.IQ2XS_GRID, [8, 25, 43]), 43692, 2, 2)


@lru_cache(maxsize=None)
def _lat_iq2_s():
    return _Lattice(_codes_from_values(R.IQ2S_GRID, [8, 25, 43]), 43692, 1, 2)


@lru_cache(maxsize=None)
def _lat_iq1():
    return _Lattice((R.IQ1S_GRID.astype(np.int16) + 1), 43692, 3, 2)


@lru_cache(maxsize=None)
def _lat_iq3_xxs():
    return _Lattice(
        _codes_from_values(R.IQ3XXS_GRID, [4, 12, 20, 28, 36, 44, 52, 62]), 4096, 2, 3
    )


@lru_cache(maxsize=None)
def _lat_iq3_s():
    return _Lattice(((R.IQ3S_GRID.astype(np.int16) - 1) // 2), 4096, 3, 3)


# ---------------------------------------------------------------------------
# Sequential float32 reductions (C scalar accumulation order)
# ---------------------------------------------------------------------------


def _seq_wab(w, a, b):
    """acc += (w[i]*a[i])*b[i] over the last axis, float32 sequential."""
    acc = np.zeros(w.shape[:-1], F32)
    for i in range(w.shape[-1]):
        acc = acc + (w[..., i] * a[..., i]) * b[..., i]
    return acc


def _sum_qx_q2(weight, xval, L):
    """The reference's per-candidate score sums with q = 2L+1
    (`sumqx += w*xval[i]*q; sumq2 += w*q*q`)."""
    q = (2 * L.astype(np.int32) + 1).astype(F32)
    return _seq_wab(weight, xval, q), _seq_wab(weight, q, q)


def _gather_candidates(lat, us):
    """Padded candidate matrix for a batch of lattice points.  Python only
    touches the DISTINCT points (memoised on the lattice), so the cost is
    bounded by kmap_size across a whole model, not by the batch."""
    uniq, inv = np.unique(np.asarray(us, np.int64), return_inverse=True)
    cands = [lat.neighbours(int(u)) for u in uniq]
    maxn = max(len(c) for c in cands)
    cu = np.empty((len(uniq), maxn), np.int32)
    for i, c in enumerate(cands):
        cu[i, : len(c)] = c
        cu[i, len(c) :] = c[-1]  # pad: duplicate of a real candidate, argmin-safe
    return cu[inv]


def _best_neighbours(lat, us, xval, w, scales):
    """Vectorised iq2/iq3_find_best_neighbour (src/ggml-quants.c:2930,3524):
    weighted L2 argmin over the candidate list, first minimum wins."""
    B = len(us)
    cm = _gather_candidates(lat, us)
    maxn = cm.shape[1]
    q = lat.posf[cm]  # (B, maxn, dim) f32
    acc = np.zeros((B, maxn), F32)
    for i in range(lat.dim):
        diff = scales[:, None] * q[:, :, i]
        np.subtract(diff, xval[:, i, None], out=diff)
        t = np.multiply(w[:, i, None], diff)
        np.multiply(t, diff, out=t)
        np.add(acc, t, out=acc)
    return cm[np.arange(B), np.argmin(acc, axis=1)]


def _best_neighbours_iq1(lat, us, xb, w, scales, xg):
    """Vectorised iq1_find_best_neighbour2 (src/ggml-quants.c:4051): L2 with
    the per-block ternary value table xg[3] instead of the raw codes."""
    B = len(us)
    cm = _gather_candidates(lat, us)
    maxn = cm.shape[1]
    lcodes = lat.L[cm].astype(np.int32)  # (B, maxn, dim) in {0,1,2}
    q = np.take_along_axis(
        xg[:, None, :], lcodes.reshape(B, -1, 1), axis=2
    ).reshape(B, maxn, lat.dim)
    acc = np.zeros((B, maxn), F32)
    for i in range(lat.dim):
        diff = scales[:, None] * q[:, :, i] - xb[:, i, None]
        acc = acc + (w[:, i, None] * diff) * diff
    return cm[np.arange(B), np.argmin(acc, axis=1)]


def _lookup_groups(lat, Laux, xval, w, scales):
    """Per dim-sized group: pack codes into a lattice index, map to a grid
    point, fall back to the best neighbour for off-grid points.  Returns the
    (possibly corrected) codes, grid indices, and the on-grid mask."""
    B, bs = Laux.shape
    ng = bs // lat.dim
    Lg = Laux.reshape(B, ng, lat.dim).astype(np.int64)
    u = np.zeros((B, ng), np.int64)
    for i in range(lat.dim):
        u |= Lg[:, :, i] << (lat.shift * i)
    gi = lat.kmap[u]
    on = gi >= 0
    if not on.all():
        bb, gg = np.nonzero(~on)
        xg = xval.reshape(B, ng, lat.dim)[bb, gg]
        wg = w.reshape(B, ng, lat.dim)[bb, gg]
        gi2 = _best_neighbours(lat, u[bb, gg], xg, wg, scales[bb])
        gi[bb, gg] = gi2
        Lg[bb, gg] = lat.L[gi2]
    return Lg.reshape(B, bs).astype(np.int8), gi, on


def _signed_split(xb, weight, parity: bool):
    """Split per-8 groups into magnitudes + sign bytes.  With parity=True,
    flip the least-important element of odd-negative groups and mask to 7
    bits (IQ2_XXS/XS, IQ3_XXS use sign-parity codes; IQ2_S/IQ3_S store all
    8 sign bits)."""
    B, bs = xb.shape
    ng = bs // 8
    xg = xb.reshape(B, ng, 8)
    wg = weight.reshape(B, ng, 8)
    neg = ~(xg >= 0)  # matches C's `if (xb >= 0) ... else flip`
    xval = np.where(neg, -xg, xg)
    s = np.zeros((B, ng), np.int32)
    for i in range(8):
        s |= neg[:, :, i].astype(np.int32) << i
    if parity:
        odd = (neg.sum(-1) % 2) == 1
        prod = (wg * xg) * xg
        imin = np.argmin(prod, axis=-1)  # first minimum, like the strict < scan
        bb, gg = np.nonzero(odd)
        xval[bb, gg, imin[bb, gg]] = -xval[bb, gg, imin[bb, gg]]
        s[bb, gg] ^= 1 << imin[bb, gg]
        s &= 127
    return xval.reshape(B, bs), s.astype(np.uint8)


def _prep(x, qw, sigma_mul):
    """Common superblock prep: flatten to superblocks, per-superblock sigma2
    (sequential f32 sum of squares), tiled imatrix rows."""
    x = np.ascontiguousarray(x, F32)
    if x.ndim == 1:
        x = x[None, :]
    nr, npr = x.shape
    assert npr % QK_K == 0
    nsb = nr * npr // QK_K
    xsb = x.reshape(nsb, QK_K)
    _seq_sumsq, _ = _imatrix_helpers()
    sigma2 = (F32(sigma_mul) * _seq_sumsq(xsb)) / F32(QK_K)
    if qw is None:
        qwsb = None
    else:
        qw = np.ascontiguousarray(qw, F32).reshape(-1)
        assert qw.shape[0] == npr
        qwsb = np.tile(qw.reshape(npr // QK_K, QK_K), (nr, 1))
    return xsb, qwsb, sigma2, nsb


def _block_weights(xb, qwb, s2):
    """weight[i] = qw[i]*sqrtf(sigma2 + x^2) or the unweighted fallback is
    handled by the callers."""
    return qwb * np.sqrt(s2[:, None] + xb * xb)


def _safe_div(a, b):
    return a / np.where(b != 0, b, F32(1))


def _pack_nibbles(lo, hi):
    return (lo | (hi << 4)).astype(np.uint8)


def _scale_nibble(id_, scales, lo, hi):
    """l = clamp(nearest_int(0.5f*(id*scale-1))) — the shared scale encoder."""
    l = nearest_int(F32(0.5) * (id_[:, None] * scales - F32(1)))
    return np.clip(l, lo, hi).astype(np.int64)


# ---------------------------------------------------------------------------
# IQ2_XXS / IQ2_XS / IQ2_S
# ---------------------------------------------------------------------------


def quant_iq2_xxs(x, qw):
    """reference: quantize_row_iq2_xxs_impl (src/ggml-quants.c:2954)."""
    if qw is None:
        raise ValueError("IQ2_XXS requires an importance matrix")
    lat = _lat_iq2_xxs()
    xsb, qwsb, sigma2, nsb = _prep(x, qw, 1)
    B = nsb * 8  # QK_K/32 sub-blocks
    xb = xsb.reshape(B, 32)
    qwb = qwsb.reshape(B, 32)
    s2 = np.repeat(sigma2, 8)
    weight = _block_weights(xb, qwb, s2)
    waux = np.sqrt(weight)
    xval, signs = _signed_split(xb, weight, parity=True)
    maxv = xval.max(axis=1)
    dead = maxv < GROUP_MAX_EPS

    with np.errstate(all="ignore"):
        _, make_qp_quants = _imatrix_helpers()
        scale, _ = make_qp_quants(xval, 4, weight)  # kMaxQ+1 = 4
        eff_max = scale * F32(3)
        safe_eff = np.where(eff_max != 0, eff_max, F32(1))
        best = np.zeros(B, F32)
        L = np.zeros((B, 32), np.int8)
        for is_ in range(-6, 7):
            id_ = (F32(5) + F32(is_) * F32(0.1)) / safe_eff
            this_scale = F32(1) / id_
            Laux = np.clip(
                nearest_int(F32(0.5) * (id_[:, None] * xval - F32(1))), 0, 2
            ).astype(np.int8)
            Laux, _, _ = _lookup_groups(lat, Laux, xval, waux, this_scale)
            sumqx, sumq2 = _sum_qx_q2(weight, xval, Laux)
            cond = (sumq2 > 0) & (sumqx * sumqx > best * sumq2)
            new_scale = _safe_div(sumqx, sumq2)
            scale = np.where(cond, new_scale, scale)
            best = np.where(cond, new_scale * sumqx, best)
            L = np.where(cond[:, None], Laux, L)

        pos = scale > 0
        id_ = F32(1) / np.where(pos, scale, F32(1))
        Lq = np.clip(
            nearest_int(F32(0.5) * (id_[:, None] * xval - F32(1))), 0, 2
        ).astype(np.int8)
        Lq, _, _ = _lookup_groups(lat, Lq, xval, waux, scale)
        L = np.where(pos[:, None], Lq, L)
        sumqx, sumq2 = _sum_qx_q2(weight, xval, L)
        scale = np.where(pos & (sumq2 > 0), _safe_div(sumqx, sumq2), scale)

        negs = scale < 0
        scale = np.where(negs, -scale, scale)
        signs = np.where(negs[:, None], (~signs.astype(np.int32)) & 127, signs).astype(
            np.uint8
        )

        # final grid indices (must be on-grid)
        _, gi, on = _lookup_groups(lat, L, xval, waux, scale)
        assert on.all()
        gi = np.where(dead[:, None], 0, gi)
        signs = np.where(dead[:, None], 0, signs)
        scales_ib = np.where(dead, F32(0), scale).reshape(nsb, 8)

        max_scale = scales_ib.max(axis=1)
        sb_live = max_scale != 0
        d = max_scale / F32(31)
        id_sb = F32(1) / np.where(sb_live, d, F32(1))
        l_ib = np.where(
            sb_live[:, None], _scale_nibble(id_sb, scales_ib, 0, 15), 0
        )

    idx_word = np.zeros(B, np.uint32)
    sign_word = np.zeros(B, np.uint32)
    for k in range(4):
        idx_word |= gi[:, k].astype(np.uint32) << (8 * k)
        sign_word |= signs[:, k].astype(np.uint32) << (7 * k)
    sign_word = sign_word.reshape(nsb, 8) | (l_ib.astype(np.uint32) << 28)
    idx_word = idx_word.reshape(nsb, 8)
    idx_word = np.where(sb_live[:, None], idx_word, 0)
    sign_word = np.where(sb_live[:, None], sign_word, 0)

    out = np.zeros((nsb, 66), np.uint8)
    out[:, 0:2] = (
        fp32_to_fp16_bits(np.where(sb_live, d, F32(0))).view(np.uint8).reshape(nsb, 2)
    )
    words = np.empty((nsb, 16), np.uint32)
    words[:, 0::2] = idx_word
    words[:, 1::2] = sign_word
    out[:, 2:66] = words.astype("<u4").view(np.uint8).reshape(nsb, 64)
    return out


def _quant_iq2_fine(x, qw, lat, *, is_range, parity, eps, d_fudge, variant):
    """Shared body of IQ2_XS and IQ2_S (16-element sub-blocks, per-sub-block
    4-bit scales; reference :3127 and :4749)."""
    xsb, qwsb, sigma2, nsb = _prep(x, qw, 1 if variant == "xs" else 2)
    B = nsb * 16  # QK_K/16 sub-blocks
    xb = xsb.reshape(B, 16)
    s2 = np.repeat(sigma2, 16)
    if qwsb is not None:
        weight = _block_weights(xb, qwsb.reshape(B, 16), s2)
    elif variant == "s":
        weight = F32(0.25) * s2[:, None] + xb * xb
    else:
        raise ValueError("IQ2_XS requires an importance matrix")
    waux = np.sqrt(weight)
    xval, signs = _signed_split(xb, weight, parity=parity)
    maxv = xval.max(axis=1)
    dead = maxv < eps

    with np.errstate(all="ignore"):
        safe_max = np.where(maxv != 0, maxv, F32(1))
        scale = safe_max / F32(5)  # max/(2*kMaxQ-1)
        best = np.zeros(B, F32)
        L = np.zeros((B, 16), np.int8)
        on_grid = np.ones((B, 2), bool)
        for is_ in range(-is_range, is_range + 1):
            id_ = (F32(5) + F32(is_) * F32(0.1)) / safe_max
            this_scale = F32(1) / id_
            Laux = np.clip(
                nearest_int(F32(0.5) * (id_[:, None] * xval - F32(1))), 0, 2
            ).astype(np.int8)
            Laux, _, on_aux = _lookup_groups(lat, Laux, xval, waux, this_scale)
            sumqx, sumq2 = _sum_qx_q2(weight, xval, Laux)
            cond = (sumq2 > 0) & (sumqx * sumqx > best * sumq2)
            new_scale = _safe_div(sumqx, sumq2)
            scale = np.where(cond, new_scale, scale)
            best = np.where(cond, new_scale * sumqx, best)
            L = np.where(cond[:, None], Laux, L)
            on_grid = np.where(cond[:, None], on_aux, on_grid)

        # refresh only off-grid groups with the final scale
        fix = (~on_grid.all(axis=1)) & (scale > 0)
        if fix.any():
            id_ = F32(1) / scale
            Lg = L.reshape(B, 2, 8).copy()
            bb, gg = np.nonzero(fix[:, None] & ~on_grid)
            lq = np.clip(
                nearest_int(
                    F32(0.5) * (id_[bb, None] * xval.reshape(B, 2, 8)[bb, gg] - F32(1))
                ),
                0,
                2,
            ).astype(np.int8)
            u = np.zeros(len(bb), np.int64)
            for i in range(8):
                u |= lq[:, i].astype(np.int64) << (2 * i)
            gi = lat.kmap[u]
            off = gi < 0
            Lsub = lq
            if off.any():
                gi2 = _best_neighbours(
                    lat,
                    u[off],
                    xval.reshape(B, 2, 8)[bb, gg][off],
                    waux.reshape(B, 2, 8)[bb, gg][off],
                    scale[bb][off],
                )
                Lsub[off] = lat.L[gi2]
            Lg[bb, gg] = Lsub
            Lg = Lg.reshape(B, 16)
            sumqx, sumq2 = _sum_qx_q2(weight, xval, Lg)
            new_scale = np.where(sumq2 > 0, _safe_div(sumqx, sumq2), scale)
            scale = np.where(fix, new_scale, scale)
            L = np.where(fix[:, None], Lg, L)

        negs = scale < 0
        scale = np.where(negs, -scale, scale)
        smask = 127 if parity else 255
        signs = np.where(
            negs[:, None], (~signs.astype(np.int32)) & smask, signs
        ).astype(np.uint8)

        _, gi, on = _lookup_groups(lat, L, xval, waux, scale)
        assert on.all()
        gi = np.where(dead[:, None], 0, gi)
        signs = np.where(dead[:, None], 0, signs)
        scales_ib = np.where(dead, F32(0), scale).reshape(nsb, 16)

        max_scale = scales_ib.max(axis=1)
        sb_live = max_scale != 0
        d = max_scale / F32(31)
        id_sb = F32(1) / np.where(sb_live, d, F32(1))
        l_ib = np.where(sb_live[:, None], _scale_nibble(id_sb, scales_ib, 0, 15), 0)

    d16 = fp32_to_fp16_bits(np.where(sb_live, d * d_fudge, F32(0)))
    scale_bytes = _pack_nibbles(l_ib[:, 0::2], l_ib[:, 1::2])  # (nsb, 8)

    if variant == "xs":
        # reference memsets qs on !max_scale (src/ggml-quants.c:3289)
        gi = np.where(sb_live.repeat(16)[:, None], gi, 0)
        signs = np.where(sb_live.repeat(16)[:, None], signs, 0)
        q2 = (gi.astype(np.uint16) | (signs.astype(np.uint16) << 9)).reshape(nsb, 32)
        out = np.zeros((nsb, 74), np.uint8)
        out[:, 0:2] = d16.view(np.uint8).reshape(nsb, 2)
        out[:, 2:66] = q2.astype("<u2").view(np.uint8).reshape(nsb, 64)
        out[:, 66:74] = scale_bytes
        return out

    # iq2_s: qs (32 idx bytes + 32 sign bytes), qh, scales; packed bytes are
    # retained even when max_scale == 0 (no memset on the continue path)
    gi_sb = gi.reshape(nsb, 32)
    signs_sb = signs.reshape(nsb, 32)
    qh = np.zeros((nsb, 8), np.uint8)
    for i8 in range(32):
        qh[:, i8 // 4] |= ((gi_sb[:, i8] >> 8) << (2 * (i8 % 4))).astype(np.uint8)
    out = np.zeros((nsb, 82), np.uint8)
    out[:, 0:2] = d16.view(np.uint8).reshape(nsb, 2)
    out[:, 2:34] = (gi_sb & 255).astype(np.uint8)
    out[:, 34:66] = signs_sb.astype(np.uint8)
    out[:, 66:74] = qh
    out[:, 74:82] = scale_bytes
    return out


def quant_iq2_xs(x, qw):
    """reference: quantize_row_iq2_xs_impl (src/ggml-quants.c:3127)."""
    if qw is None:
        raise ValueError("IQ2_XS requires an importance matrix")
    return _quant_iq2_fine(
        x, qw, _lat_iq2_xs(), is_range=9, parity=True, eps=GROUP_MAX_EPS,
        d_fudge=F32(1.0), variant="xs",
    )


def quant_iq2_s(x, qw=None):
    """reference: quantize_row_iq2_s_impl (src/ggml-quants.c:4749)."""
    return _quant_iq2_fine(
        x, qw, _lat_iq2_s(), is_range=9, parity=False, eps=GROUP_MAX_EPS_IQ2_S,
        d_fudge=F32(0.9875), variant="s",
    )


# ---------------------------------------------------------------------------
# IQ3_XXS / IQ3_S
# ---------------------------------------------------------------------------


def _quant_iq3_core(x, qw, lat, *, is_range, step, parity, eps, refresh_all,
                    on_init):
    """Shared search for IQ3_XXS / IQ3_S (32-element sub-blocks over 4-wide
    grid groups, kMaxQ=8; reference :3548 / :3778). Returns per-sub-block
    (gi (B,8), signs (B,4), scales (B,), dead mask, nsb)."""
    xsb, qwsb, sigma2, nsb = _prep(x, qw, 2)
    B = nsb * 8  # QK_K/32 sub-blocks
    xb = xsb.reshape(B, 32)
    s2 = np.repeat(sigma2, 8)
    if qwsb is not None:
        weight = _block_weights(xb, qwsb.reshape(B, 32), s2)
    else:
        weight = xb * xb
    waux = np.sqrt(weight)
    xval, signs = _signed_split(xb, weight, parity=parity)
    maxv = xval.max(axis=1)
    dead = maxv < eps if eps is not None else maxv == 0

    with np.errstate(all="ignore"):
        safe_max = np.where(maxv != 0, maxv, F32(1))
        scale = safe_max / F32(15)  # max/(2*kMaxQ-1)
        best = np.zeros(B, F32)
        L = np.zeros((B, 32), np.int8)
        on_grid = np.full((B, 8), on_init, bool)
        for is_ in range(-is_range, is_range + 1):
            id_ = (F32(15) + F32(is_) * step) / safe_max
            this_scale = F32(1) / id_
            Laux = np.clip(
                nearest_int(F32(0.5) * (id_[:, None] * xval - F32(1))), 0, 7
            ).astype(np.int8)
            Laux, _, on_aux = _lookup_groups(lat, Laux, xval, waux, this_scale)
            sumqx, sumq2 = _sum_qx_q2(weight, xval, Laux)
            cond = (sumq2 > 0) & (sumqx * sumqx > best * sumq2)
            new_scale = _safe_div(sumqx, sumq2)
            scale = np.where(cond, new_scale, scale)
            best = np.where(cond, new_scale * sumqx, best)
            L = np.where(cond[:, None], Laux, L)
            on_grid = np.where(cond[:, None], on_aux, on_grid)

        fix = (~on_grid.all(axis=1)) & (scale > 0)
        if fix.any():
            id_ = np.where(fix, F32(1) / np.where(scale != 0, scale, F32(1)), F32(0))
            Lg = L.reshape(B, 8, 4).copy()
            if refresh_all:
                sel = np.broadcast_to(fix[:, None], (B, 8))
            else:
                sel = fix[:, None] & ~on_grid
            bb, gg = np.nonzero(sel)
            lq = np.clip(
                nearest_int(
                    F32(0.5) * (id_[bb, None] * xval.reshape(B, 8, 4)[bb, gg] - F32(1))
                ),
                0,
                7,
            ).astype(np.int8)
            u = np.zeros(len(bb), np.int64)
            for i in range(4):
                u |= lq[:, i].astype(np.int64) << (3 * i)
            gi = lat.kmap[u]
            off = gi < 0
            Lsub = lq.copy()  # on-grid: pg codes == the fresh quantisation
            if off.any():
                gi2 = _best_neighbours(
                    lat,
                    u[off],
                    xval.reshape(B, 8, 4)[bb, gg][off],
                    waux.reshape(B, 8, 4)[bb, gg][off],
                    scale[bb][off],
                )
                Lsub[off] = lat.L[gi2]
            Lg[bb, gg] = Lsub
            Lg = Lg.reshape(B, 32)
            sumqx, sumq2 = _sum_qx_q2(weight, xval, Lg)
            new_scale = np.where(sumq2 > 0, _safe_div(sumqx, sumq2), scale)
            scale = np.where(fix, new_scale, scale)
            L = np.where(fix[:, None], Lg, L)

        negs = scale < 0
        scale = np.where(negs, -scale, scale)
        smask = 127 if parity else 255
        signs = np.where(
            negs[:, None], (~signs.astype(np.int32)) & smask, signs
        ).astype(np.uint8)

        _, gi, on = _lookup_groups(lat, L, xval, waux, scale)
        assert on.all()
        gi = np.where(dead[:, None], 0, gi)
        signs = np.where(dead[:, None], 0, signs)
        scales_ib = np.where(dead, F32(0), scale)
    return gi, signs, scales_ib, dead, nsb


def quant_iq3_xxs(x, qw=None):
    """reference: quantize_row_iq3_xxs_impl (src/ggml-quants.c:3548)."""
    gi, signs, scales_ib, _dead, nsb = _quant_iq3_core(
        x, qw, _lat_iq3_xxs(), is_range=15, step=F32(0.2), parity=True,
        eps=GROUP_MAX_EPS_IQ3_XXS, refresh_all=False, on_init=True,
    )
    scales_sb = scales_ib.reshape(nsb, 8)
    with np.errstate(all="ignore"):
        max_scale = scales_sb.max(axis=1)
        sb_live = max_scale != 0
        d = max_scale / F32(31)
        id_sb = F32(1) / np.where(sb_live, d, F32(1))
        l_ib = np.where(sb_live[:, None], _scale_nibble(id_sb, scales_sb, 0, 15), 0)
    sw = np.zeros(nsb * 8, np.uint32)
    for k in range(4):
        sw |= signs[:, k].astype(np.uint32) << (7 * k)
    sw = sw.reshape(nsb, 8) | (l_ib.astype(np.uint32) << 28)
    qs = gi.astype(np.uint8).reshape(nsb, 64)
    qs = np.where(sb_live[:, None], qs, 0)
    sw = np.where(sb_live[:, None], sw, 0)
    out = np.zeros((nsb, 98), np.uint8)
    out[:, 0:2] = (
        fp32_to_fp16_bits(np.where(sb_live, d * F32(1.0125), F32(0)))
        .view(np.uint8)
        .reshape(nsb, 2)
    )
    out[:, 2:66] = qs
    out[:, 66:98] = sw.astype("<u4").view(np.uint8).reshape(nsb, 32)
    return out


def quant_iq3_s(x, qw=None):
    """reference: quantize_row_iq3_s_impl (src/ggml-quants.c:3778)."""
    gi, signs, scales_ib, dead, nsb = _quant_iq3_core(
        x, qw, _lat_iq3_s(), is_range=9, step=F32(0.2), parity=False,
        eps=None, refresh_all=True, on_init=False,
    )
    scales_sb = scales_ib.reshape(nsb, 8)
    with np.errstate(all="ignore"):
        max_scale = scales_sb.max(axis=1)
        sb_live = max_scale != 0
        d = max_scale / F32(31)
        id_sb = F32(1) / np.where(sb_live, d, F32(1))
        l_ib = np.where(sb_live[:, None], _scale_nibble(id_sb, scales_sb, 0, 15), 0)
    # The reference advances its qs/signs write pointers only for live
    # sub-blocks (src/ggml-quants.c:3934-3936) while qh bits use the absolute
    # sub-block index — replicate that compaction quirk exactly.  Unlike
    # iq2_xxs/xs/iq3_xxs there is no memset on !max_scale, so packed bytes of
    # zero-d superblocks are retained.
    live_blk = (~dead).reshape(nsb, 8)
    gi_g = gi.reshape(nsb, 8, 8)  # (sb, ib, group)
    signs_g = signs.reshape(nsb, 8, 4)
    gi_sb = np.zeros((nsb, 64), np.int64)
    signs_sb = np.zeros((nsb, 32), np.int64)
    qh = np.zeros((nsb, 8), np.uint8)
    if live_blk.all():
        gi_sb = gi_g.reshape(nsb, 64).astype(np.int64)
        signs_sb = signs_g.reshape(nsb, 32).astype(np.int64)
        for j in range(64):
            qh[:, j // 8] |= ((gi_sb[:, j] >> 8) << (j % 8)).astype(np.uint8)
    else:
        for sb in range(nsb):
            nlive = 0
            for ib in range(8):
                if not live_blk[sb, ib]:
                    continue
                for k in range(8):
                    g = int(gi_g[sb, ib, k])
                    gi_sb[sb, 8 * nlive + k] = g
                    qh[sb, ib] |= (g >> 8) << k
                signs_sb[sb, 4 * nlive : 4 * nlive + 4] = signs_g[sb, ib]
                nlive += 1
    out = np.zeros((nsb, 110), np.uint8)
    out[:, 0:2] = (
        fp32_to_fp16_bits(np.where(sb_live, d * F32(1.033), F32(0)))
        .view(np.uint8)
        .reshape(nsb, 2)
    )
    out[:, 2:66] = (gi_sb & 255).astype(np.uint8)
    out[:, 66:74] = qh
    out[:, 74:106] = signs_sb.astype(np.uint8)
    out[:, 106:110] = _pack_nibbles(l_ib[:, 0::2], l_ib[:, 1::2])
    return out


# ---------------------------------------------------------------------------
# IQ1_S / IQ1_M
# ---------------------------------------------------------------------------


def _iq1_prefix_split(xb, weight):
    """Sort each block, build sequential-f32 prefix sums Si/Wi (the exact-SSD
    ternary split machinery of quantize_row_iq1_s_impl :4174-4192)."""
    B, bs = xb.shape
    order = np.argsort(xb, axis=1, kind="stable")
    rows = np.arange(B)[:, None]
    xs = xb[rows, order]
    ws = weight[rows, order]
    sumx = np.zeros((B, bs + 1), F32)
    sumw = np.zeros((B, bs + 1), F32)
    for j in range(bs):
        sumx[:, j + 1] = sumx[:, j] + ws[:, j] * xs[:, j]
        sumw[:, j + 1] = sumw[:, j] + ws[:, j]
    rank = np.empty((B, bs), np.int64)
    rank[rows, order] = np.arange(bs)
    return order, rank, xs, ws, sumx, sumw


def quant_iq1_s(x, qw):
    """reference: quantize_row_iq1_s_impl (src/ggml-quants.c:4116)."""
    if qw is None:
        raise ValueError("IQ1_S requires an importance matrix")
    lat = _lat_iq1()
    xsb, qwsb, sigma2, nsb = _prep(x, qw, 2)
    bs = 32
    B = nsb * (QK_K // bs)
    xb = xsb.reshape(B, bs)
    s2 = np.repeat(sigma2, QK_K // bs)
    weight = _block_weights(xb, qwsb.reshape(B, bs), s2)
    maxv = np.abs(xb).max(axis=1)
    dead = maxv < GROUP_MAX_EPS_IQ1_S

    x_p = np.array([-1 + IQ1S_DELTA, IQ1S_DELTA, 1 + IQ1S_DELTA], F32)
    x_m = np.array([-1 - IQ1S_DELTA, -IQ1S_DELTA, 1 - IQ1S_DELTA], F32)

    with np.errstate(all="ignore"):
        _, rank, _, _, sumx, sumw = _iq1_prefix_split(xb, weight)
        best = np.full(B, -FLT_MIN, F32)
        scale = maxv.copy()
        bi1 = np.zeros(B, np.int64)
        bi2 = np.zeros(B, np.int64)
        shift = np.zeros(B, np.int8)
        for i1 in range(bs + 1):
            for i2 in range(i1, bs + 1):
                for xx, sh in ((x_p, 1), (x_m, -1)):
                    sumqx = (
                        (sumx[:, i1] - sumx[:, 0]) * xx[0]
                        + (sumx[:, i2] - sumx[:, i1]) * xx[1]
                        + (sumx[:, bs] - sumx[:, i2]) * xx[2]
                    )
                    sumq2 = (
                        ((sumw[:, i1] - sumw[:, 0]) * xx[0]) * xx[0]
                        + ((sumw[:, i2] - sumw[:, i1]) * xx[1]) * xx[1]
                        + ((sumw[:, bs] - sumw[:, i2]) * xx[2]) * xx[2]
                    )
                    cond = (sumq2 > 0) & (sumqx * sumqx > best * sumq2)
                    new_scale = _safe_div(sumqx, sumq2)
                    scale = np.where(cond, new_scale, scale)
                    best = np.where(cond, new_scale * sumqx, best)
                    bi1 = np.where(cond, i1, bi1)
                    bi2 = np.where(cond, i2, bi2)
                    shift = np.where(cond, sh, shift)

        L = (
            (rank >= bi1[:, None]).astype(np.int8)
            + (rank >= bi2[:, None]).astype(np.int8)
        )
        negs = scale < 0
        L = np.where(negs[:, None], 2 - L, L)
        scale = np.where(negs, -scale, scale)
        shift = np.where(negs, -shift, shift)

        xg = np.where(shift[:, None] == 1, x_p[None, :], x_m[None, :])
        ng = bs // 8
        Lg = L.reshape(B, ng, 8).astype(np.int64)
        u = np.zeros((B, ng), np.int64)
        for i in range(8):
            u |= Lg[:, :, i] << (2 * i)
        gi = lat.kmap[u]
        off = gi < 0
        if off.any():
            bb, gg = np.nonzero(off)
            gi2 = _best_neighbours_iq1(
                lat,
                u[bb, gg],
                xb.reshape(B, ng, 8)[bb, gg],
                weight.reshape(B, ng, 8)[bb, gg],
                scale[bb],
                xg[bb],
            )
            gi[bb, gg] = gi2
        # rescale where any group was off-grid: q = xg[L_grid]
        fixed = off.any(axis=1)
        if fixed.any():
            Lfin = lat.L[gi].reshape(B, bs).astype(np.int64)
            q = np.take_along_axis(xg, Lfin, axis=1)
            sumqx = _seq_wab(weight, q, xb)
            sumq2 = _seq_wab(weight, q, q)
            cond = fixed & (sumqx > 0) & (sumq2 > 0)
            scale = np.where(cond, _safe_div(sumqx, sumq2), scale)

        gi = np.where(dead[:, None], 0, gi)
        scales_ib = np.where(dead, F32(0), scale).reshape(nsb, 8)
        shift_sb = np.where(dead, 1, shift).reshape(nsb, 8)

        max_scale = scales_ib.max(axis=1)
        sb_live = max_scale != 0
        d = max_scale / F32(15)
        id_sb = F32(1) / np.where(sb_live, d, F32(1))
        l_ib = np.where(sb_live[:, None], _scale_nibble(id_sb, scales_ib, 0, 7), 0)
    l_ib = np.where(shift_sb == -1, l_ib | 8, l_ib)

    gi_sb = gi.reshape(nsb, 32)  # packed bytes retained even when d == 0
    qh = np.zeros((nsb, 8), np.uint16)
    for ib in range(8):
        h = np.zeros(nsb, np.uint16)
        for k in range(4):
            h |= ((gi_sb[:, 4 * ib + k] >> 8).astype(np.uint16)) << (3 * k)
        qh[:, ib] = h
    qh |= np.where(sb_live[:, None], l_ib, 0).astype(np.uint16) << 12
    out = np.zeros((nsb, 50), np.uint8)
    out[:, 0:2] = (
        fp32_to_fp16_bits(np.where(sb_live, d * F32(1.125), F32(0)))
        .view(np.uint8)
        .reshape(nsb, 2)
    )
    out[:, 2:34] = (gi_sb & 255).astype(np.uint8)
    out[:, 34:50] = qh.astype("<u2").view(np.uint8).reshape(nsb, 16)
    return out


def quant_iq1_m(x, qw=None):
    """reference: quantize_row_iq1_m_impl (src/ggml-quants.c:4294)."""
    lat = _lat_iq1()
    xsb, qwsb, sigma2, nsb = _prep(x, qw, 2)
    bs = 16
    nib = QK_K // bs  # 16
    B = nsb * nib
    xb = xsb.reshape(B, bs)
    s2 = np.repeat(sigma2, nib)
    if qwsb is not None:
        weight = _block_weights(xb, qwsb.reshape(B, bs), s2)
    else:
        weight = xb * xb
    maxv = np.abs(xb).max(axis=1)
    dead = maxv < GROUP_MAX_EPS_IQ1_M

    x_p = np.array([-1 + IQ1M_DELTA, IQ1M_DELTA, 1 + IQ1M_DELTA], F32)
    x_m = np.array([-1 - IQ1M_DELTA, -IQ1M_DELTA, 1 - IQ1M_DELTA], F32)
    masks = np.array([0x00, 0x80, 0x08, 0x88], np.uint8)

    with np.errstate(all="ignore"):
        order, rank, xs, ws, _, _ = _iq1_prefix_split(xb, weight)
        in_lo_half = order < (bs // 2)  # element index < block_size/2, sorted order
        best = np.full(B, -FLT_MIN, F32)
        scale = maxv.copy()
        bi1 = np.zeros(B, np.int64)
        bi2 = np.zeros(B, np.int64)
        bk = np.zeros(B, np.int64)
        # variant table: for k in 0..3, first half uses x_p if k<2, second half
        # if k%2==0 (src/ggml-quants.c:4371-4443)
        for i1 in range(bs + 1):
            for i2 in range(i1, bs + 1):
                sqx = [np.zeros(B, F32) for _ in range(4)]
                sq2 = [np.zeros(B, F32) for _ in range(4)]
                for j in range(bs):
                    seg = 0 if j < i1 else (1 if j < i2 else 2)
                    w = ws[:, j]
                    xv = xs[:, j]
                    lo = in_lo_half[:, j]
                    for k in range(4):
                        qk = np.where(
                            lo,
                            x_p[seg] if k < 2 else x_m[seg],
                            x_p[seg] if k % 2 == 0 else x_m[seg],
                        ).astype(F32)
                        sqx[k] = sqx[k] + (w * qk) * xv
                        sq2[k] = sq2[k] + (w * qk) * qk
                for k in range(4):
                    cond = (sq2[k] > 0) & (sqx[k] * sqx[k] > best * sq2[k])
                    new_scale = _safe_div(sqx[k], sq2[k])
                    scale = np.where(cond, new_scale, scale)
                    best = np.where(cond, new_scale * sqx[k], best)
                    bi1 = np.where(cond, i1, bi1)
                    bi2 = np.where(cond, i2, bi2)
                    bk = np.where(cond, k, bk)

        L = (
            (rank >= bi1[:, None]).astype(np.int8)
            + (rank >= bi2[:, None]).astype(np.int8)
        )
        negs = scale < 0
        L = np.where(negs[:, None], 2 - L, L)
        scale = np.where(negs, -scale, scale)
        flipped_k = np.choose(bk, [3, 2, 1, 0])
        bk = np.where(negs, flipped_k, bk)

        # per-(block, group) ternary value table: k=0 group -> p if bk<2,
        # k=1 group -> p if bk%2==0
        use_p = np.stack([bk < 2, bk % 2 == 0], axis=1)  # (B, 2)
        xg = np.where(use_p[:, :, None], x_p[None, None, :], x_m[None, None, :]).astype(
            F32
        )  # (B, 2, 3)

        ng = bs // 8  # 2
        Lg = L.reshape(B, ng, 8).astype(np.int64)
        u = np.zeros((B, ng), np.int64)
        for i in range(8):
            u |= Lg[:, :, i] << (2 * i)
        gi = lat.kmap[u]
        off = gi < 0
        if off.any():
            bb, gg = np.nonzero(off)
            gi2 = _best_neighbours_iq1(
                lat,
                u[bb, gg],
                xb.reshape(B, ng, 8)[bb, gg],
                weight.reshape(B, ng, 8)[bb, gg],
                scale[bb],
                xg[bb, gg],
            )
            gi[bb, gg] = gi2
        fixed = off.any(axis=1)
        if fixed.any():
            Lfin = lat.L[gi].astype(np.int64)  # (B, 2, 8)
            q = np.take_along_axis(xg, Lfin, axis=2).reshape(B, bs)
            sumqx = _seq_wab(weight, q, xb)
            sumq2 = _seq_wab(weight, q, q)
            cond = fixed & (sumqx > 0) & (sumq2 > 0)
            scale = np.where(cond, _safe_div(sumqx, sumq2), scale)

        gi = np.where(dead[:, None], 0, gi)
        scales_ib = np.where(dead, F32(0), scale).reshape(nsb, nib)
        bk_sb = np.where(dead, 0, bk).reshape(nsb, nib)

        max_scale = scales_ib.max(axis=1)
        sb_live = max_scale != 0
        d0 = max_scale / F32(15)
        id_sb = F32(1) / np.where(sb_live, d0, F32(1))
        l_ib = np.where(sb_live[:, None], _scale_nibble(id_sb, scales_ib, 0, 7), 0)

    gi_sb = gi.reshape(nsb, nib, 2)  # packed bytes retained even when d == 0
    qs = (gi_sb & 255).astype(np.uint8).reshape(nsb, 32)
    qh = ((gi_sb[:, :, 0] >> 8) | ((gi_sb[:, :, 1] >> 8) << 4)).astype(np.uint8)
    qh |= np.where(sb_live[:, None], masks[bk_sb], 0)

    # final superblock d: weighted LSQ refit over the packed codes
    # (src/ggml-quants.c:4505-4538)
    with np.errstate(all="ignore"):
        sumqx_f = np.zeros(nsb, F32)
        sumq2_f = np.zeros(nsb, F32)
        weight_sb = weight.reshape(nsb, nib, bs)
        xb_sb = xb.reshape(nsb, nib, bs)
        use_p_sb = np.stack([bk_sb < 2, bk_sb % 2 == 0], axis=2)  # (nsb, nib, 2)
        for ib in range(nib):
            l = l_ib[:, ib].astype(F32)
            for k in range(2):
                idx_full = qs[:, 2 * ib + k].astype(np.int64) | (
                    ((qh[:, ib].astype(np.int64) << (8 - 4 * k)) & 0x700)
                )
                Lg = lat.L[idx_full].astype(np.int64)  # (nsb, 8)
                xg_k = np.where(
                    use_p_sb[:, ib, k][:, None], x_p[None, :], x_m[None, :]
                )
                qv = np.take_along_axis(xg_k, Lg, axis=1)  # (nsb, 8)
                qv = qv * (F32(2) * l[:, None] + F32(1))
                for j in range(8):
                    w = weight_sb[:, ib, 8 * k + j]
                    sumqx_f = sumqx_f + (w * qv[:, j]) * xb_sb[:, ib, 8 * k + j]
                    sumq2_f = sumq2_f + (w * qv[:, j]) * qv[:, j]
        d_fin = np.where(sumq2_f > 0, _safe_div(sumqx_f, sumq2_f), d0)
        d16 = fp32_to_fp16_bits(np.where(sb_live, d_fin * F32(1.1125), F32(0)))

    sc = np.zeros((nsb, 4), np.uint16)
    for ib in range(nib):
        sc[:, ib // 4] |= (l_ib[:, ib].astype(np.uint16)) << (3 * (ib % 4))
    d16u = d16.astype(np.uint16)
    sc[:, 0] |= np.where(sb_live, (d16u & 0x000F) << 12, 0)
    sc[:, 1] |= np.where(sb_live, (d16u & 0x00F0) << 8, 0)
    sc[:, 2] |= np.where(sb_live, (d16u & 0x0F00) << 4, 0)
    sc[:, 3] |= np.where(sb_live, d16u & 0xF000, 0)

    out = np.zeros((nsb, 56), np.uint8)
    out[:, 0:32] = qs
    out[:, 32:48] = qh
    out[:, 48:56] = sc.astype("<u2").view(np.uint8).reshape(nsb, 8)
    return out
