"""Round-3 decode-GEMV bandwidth ladder.

Finds where the q4 GEMV's 643 GB/s sits between v5e's 819 GB/s HBM peak and
reality, by measuring in order:
  1. dma      — a touch-only kernel streaming the same code tiles (DMA
                speed-of-light for this shape; no unpack, no dots)
  2. q8half   — int8 GEMV at the same byte count (zero-unpack bound)
  3. q4loop   — the shipping per-group-loop kernel (i32-domain unpack)
  4. q4u8     — unpack in the u8/i8 domain (fewer widening VPU passes)
  5. tiles    — (kt2, bn) sweep on the best unpack variant

All variants share bf16 scales (the model's planar layout). Iterations are
chained in one jitted lax.scan with a data dependency; the timed window is
>= 1.5 s (axon relay hygiene, see PLAN.md).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

import ml_dtypes

G = 32
rng = np.random.default_rng(0)
BF16 = np.dtype(ml_dtypes.bfloat16)


# ---------------------------------------------------------------------- DMA
def touch_kernel(qp, out):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    out[:] += qp[0:8, :].astype(jnp.int32).astype(jnp.float32)


def dma_touch(xq, packed, scales, kt2, bn):
    k2, npad = packed.shape
    return pl.pallas_call(
        touch_kernel,
        grid=(npad // bn, k2 // kt2),
        in_specs=[pl.BlockSpec((kt2, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(packed)


# ------------------------------------------------------------------- q8 bound
def gemv_q8(xq, codes, scales, kt, bn):
    m, k = xq.shape
    _, npad = codes.shape
    ng = kt // G

    def kernel(x, q, s, out):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out[:] = jnp.zeros_like(out)

        xv, qv, sv = x[:], q[:], s[:].astype(jnp.float32)
        acc = out[:]
        for j in range(ng):
            p = jax.lax.dot_general(
                xv[:, j * G : (j + 1) * G], qv[j * G : (j + 1) * G, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = acc + p.astype(jnp.float32) * sv[j : j + 1, :]
        out[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(npad // bn, k // kt),
        in_specs=[
            pl.BlockSpec((m, kt), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt // G, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(xq, codes, scales)


# ------------------------------------------------------------ q4 variants
def _q4_body_i32(qp):
    codes = qp[:].astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.int8)
    hi = (codes >> 4).astype(jnp.int8)
    return lo, hi


def _q4_body_u8(qp):
    raw = qp[:]
    lo = (raw & jnp.uint8(0xF)).astype(jnp.int8)
    hi = (raw >> jnp.uint8(4)).astype(jnp.int8)
    return lo, hi


def _q4_body_i16(qp):
    codes = qp[:].astype(jnp.int16)
    lo = (codes & jnp.int16(0xF)).astype(jnp.int8)
    hi = (codes >> jnp.int16(4)).astype(jnp.int8)
    return lo, hi


def _q4_body_none(qp):
    # numerically WRONG (perf bound only): feed packed bytes straight to MXU
    raw = pltpu.bitcast(qp[:], jnp.int8)
    return raw, raw


def gemv_q4(xq, packed, scales, kt2, bn, unpack=_q4_body_i32):
    m, k = xq.shape
    k2, npad = packed.shape
    ng = kt2 // G
    n_ktiles = k2 // kt2

    def kernel(x_lo, x_hi, qp, s_lo, s_hi, out):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out[:] = jnp.zeros_like(out)

        lo, hi = unpack(qp)
        sl = s_lo[0].astype(jnp.float32)
        sh = s_hi[0].astype(jnp.float32)
        xl, xh = x_lo[:], x_hi[:]
        acc = out[:]
        for j in range(ng):
            p = jax.lax.dot_general(
                xl[:, j * G : (j + 1) * G], lo[j * G : (j + 1) * G, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = acc + p.astype(jnp.float32) * sl[j : j + 1, :]
            p = jax.lax.dot_general(
                xh[:, j * G : (j + 1) * G], hi[j * G : (j + 1) * G, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = acc + p.astype(jnp.float32) * sh[j : j + 1, :]
        out[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(npad // bn, n_ktiles),
        in_specs=[
            pl.BlockSpec((m, kt2), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, kt2), lambda i, kk: (0, kk + n_ktiles), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt2, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng, bn), lambda i, kk: (0, kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng, bn), lambda i, kk: (1, kk, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(xq, xq, packed, scales, scales)


# ----------------------------------------------------------------- harness
def bench(tag, K, N, fn, args, nbytes, min_window=1.5):
    xq0 = jnp.asarray(rng.integers(-127, 127, (1, K), dtype=np.int8))

    def make_run(iters):
        @jax.jit
        def run(xq):
            def body(x, _):
                out = fn(x, *args)
                nx = x + (out[0, 0] > 0).astype(jnp.int8)  # data dep, shape-agnostic
                return nx, out[0, 0]

            x, outs = jax.lax.scan(body, xq, jnp.zeros((iters,), jnp.int32))
            return outs

        return run

    probe = make_run(64)
    _ = np.asarray(probe(xq0))
    t0 = time.perf_counter()
    _ = np.asarray(probe(xq0))
    dt0 = (time.perf_counter() - t0) / 64
    iters = max(64, int(min_window / max(dt0, 1e-7)))
    run = make_run(iters)
    _ = np.asarray(run(xq0))
    t0 = time.perf_counter()
    _ = np.asarray(run(xq0))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:28s} K={K} N={N}  {dt*1e6:9.1f} us  {nbytes/dt/1e9:7.1f} GB/s", flush=True)
    return dt


def make_q4_args(K, N, kt2, bn):
    packed = jnp.asarray(rng.integers(0, 256, (K // 2, N), dtype=np.uint8))
    scales = jnp.asarray((rng.standard_normal((2, K // 2 // G, N)) * 0.01).astype(BF16))
    return (packed, scales, kt2, bn), K * N // 2 + scales.nbytes


# ------------------------------------------- compact sub-scale q4 bd GEMV
def gemv_q4_bd_compact(xq, packed, sc, mm, dd, dmin, kt2, bn):
    """Block-diagonal q4 GEMV with K-quant-style compact scales:
    sc/mm int8 codes per 32-group, dd/dmin bf16 per 8-group superblock.
    Effective scale s[g,n] = dd[g//8,n] * sc[g,n]; offset o = -dmin * mm."""
    m, k = xq.shape
    k2, npad = packed.shape
    ng = kt2 // G
    ng8 = ng // 8
    n_ktiles = k2 // kt2

    def kernel(x_lo, x_hi, qp, sc_lo, sc_hi, m_lo, m_hi, d_lo, d_hi, dm_lo, dm_hi, out):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out[:] = jnp.zeros_like(out)

        codes = qp[:].astype(jnp.int32)
        lo = (codes & 0xF).astype(jnp.int8)
        hi = (codes >> 4).astype(jnp.int8)
        kt2_ = ng * G
        gi = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2_), 0)
        gk = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2_), 1) // G
        mask = gi == gk

        def bd(x):
            xb = jnp.broadcast_to(x.astype(jnp.int32), (ng, kt2_))
            return jnp.where(mask, xb, 0).astype(jnp.int8)

        def expand(d):  # (ng8, bn) bf16 -> (ng, bn) f32, element-repeat rows
            d = d.astype(jnp.float32)
            return jnp.broadcast_to(d[:, None, :], (ng8, 8, bn)).reshape(ng, bn)

        bdl, bdh = bd(x_lo[:]), bd(x_hi[:])
        Pl = jax.lax.dot_general(bdl, lo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        Ph = jax.lax.dot_general(bdh, hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        sl = expand(d_lo[0]) * sc_lo[0].astype(jnp.int32).astype(jnp.float32)
        sh = expand(d_hi[0]) * sc_hi[0].astype(jnp.int32).astype(jnp.float32)
        ol = -expand(dm_lo[:]) * m_lo[:].astype(jnp.int32).astype(jnp.float32)
        oh = -expand(dm_hi[:]) * m_hi[:].astype(jnp.int32).astype(jnp.float32)
        xsl = bdl.astype(jnp.int32).sum(axis=1, keepdims=True).astype(jnp.float32)
        xsh = bdh.astype(jnp.int32).sum(axis=1, keepdims=True).astype(jnp.float32)
        contrib = (Pl.astype(jnp.float32) * sl + xsl * ol
                   + Ph.astype(jnp.float32) * sh + xsh * oh)
        out[:] = out[:] + contrib.sum(axis=0, keepdims=True)

    return pl.pallas_call(
        kernel,
        grid=(npad // bn, n_ktiles),
        in_specs=[
            pl.BlockSpec((m, kt2), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, kt2), lambda i, kk: (0, kk + n_ktiles), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt2, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng, bn), lambda i, kk: (0, kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng, bn), lambda i, kk: (1, kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, bn), lambda i, kk: (kk + n_ktiles, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng8, bn), lambda i, kk: (0, kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng8, bn), lambda i, kk: (1, kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng8, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng8, bn), lambda i, kk: (kk + n_ktiles, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(xq, xq, packed, sc, sc, mm, mm, dd, dd, dmin, dmin)


def make_compact_args(K, N, kt2, bn):
    import ml_dtypes
    packed = jnp.asarray(rng.integers(0, 256, (K // 2, N), dtype=np.uint8))
    sc = jnp.asarray(rng.integers(0, 64, (2, K // 2 // G, N), dtype=np.int8))
    mm = jnp.asarray(rng.integers(0, 64, (K // G, N), dtype=np.int8))
    dd = jnp.asarray((np.abs(rng.standard_normal((2, K // 2 // G // 8, N))) * 0.001).astype(BF16))
    dmin = jnp.asarray((np.abs(rng.standard_normal((K // G // 8, N))) * 0.0003).astype(BF16))
    nbytes = packed.nbytes + sc.nbytes + mm.nbytes + dd.nbytes + dmin.nbytes
    return (packed, sc, mm, dd, dmin, kt2, bn), nbytes


def check_compact():
    # K large enough that the d/dmin superblock tiles satisfy Mosaic's
    # 8-sublane minimum: kt2=K/2=4096 -> ng8=16 rows per block
    K, N = 8192, 256
    (packed, sc, mm, dd, dmin, _, _), _ = make_compact_args(K, N, K // 2, N)
    xq = rng.integers(-127, 127, (1, K), dtype=np.int8)
    y = np.asarray(gemv_q4_bd_compact(jnp.asarray(xq), packed, sc, mm, dd, dmin, K // 2, N))
    scn, mn = np.asarray(sc, np.float32), np.asarray(mm, np.float32)
    ddn, dmn = np.asarray(dd, np.float32), np.asarray(dmin, np.float32)
    s = np.concatenate([ddn[0].repeat(8, 0) * scn[0], ddn[1].repeat(8, 0) * scn[1]], 0)
    o = -dmn.repeat(8, 0) * mn
    lo = (np.asarray(packed) & 0xF).astype(np.float32)
    hi = (np.asarray(packed) >> 4).astype(np.float32)
    q = np.concatenate([lo, hi], 0)
    w = s.repeat(G, 0) * q + o.repeat(G, 0)
    ref = xq.astype(np.float32) @ w
    err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"compact bd gemv correctness: max rel err {err:.2e}", flush=True)
    assert err < 2e-2, err  # bf16 d/dmin rounding in-kernel vs f32 numpy


# ------------------------------------------------- contiguous tile-major DMA
def dma_touch_contig(xq, packed_tiled, kt2, bn):
    """packed_tiled: (n_tiles, kt2, bn) — every grid step reads one fully
    contiguous (kt2*bn)-byte chunk."""
    n_tiles = packed_tiled.shape[0]

    def kernel(qp, out):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out[:] = jnp.zeros_like(out)

        out[:] += qp[0, 0:8, :].astype(jnp.int32).astype(jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, kt2, bn), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, bn), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, bn), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(packed_tiled)


def dma_touch_manual(xq, packed, kt2, bn, n_buffers=4):
    """Manual multi-buffer DMA pipeline from an HBM-resident ref: measures
    whether deeper buffering (vs the auto-pipeliner's 2) hides HBM latency."""
    k2, npad = packed.shape
    n_k = k2 // kt2
    n_n = npad // bn
    num_chunks = n_k * n_n

    def kernel(qp_hbm, out):
        def body(scratch, sem):
            def get_dma(slot, idx):
                kk = idx % n_k
                i = idx // n_k
                return pltpu.make_async_copy(
                    qp_hbm.at[pl.ds(kk * kt2, kt2), pl.ds(i * bn, bn)],
                    scratch.at[slot], sem.at[slot])

            for s in range(n_buffers - 1):
                get_dma(s, s).start()

            def loop(idx, acc):
                slot = idx % n_buffers
                nxt = idx + n_buffers - 1

                @pl.when(nxt < num_chunks)
                def _():
                    get_dma(nxt % n_buffers, nxt).start()

                get_dma(slot, idx).wait()
                return acc + scratch[slot, 0:8, :].astype(jnp.int32).astype(jnp.float32)

            out[:] = jax.lax.fori_loop(0, num_chunks, loop, jnp.zeros((8, bn), jnp.float32))

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((n_buffers, kt2, bn), jnp.uint8),
            sem=pltpu.SemaphoreType.DMA((n_buffers,)),
        )

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, bn), jnp.float32),
    )(packed)


def main():
    steps = sys.argv[1:] or ["dma", "q8half", "q4loop", "q4u8", "q4i16", "q4none", "tiles"]
    K, N = 4096, 16384

    if "dma" in steps:
        args, nb = make_q4_args(K, N, 1024, 2048)
        bench("dma-touch kt2=1024 bn=2048", K, N, dma_touch, args, K * N // 2)
        args, nb = make_q4_args(K, N, 2048, 2048)
        bench("dma-touch kt2=2048 bn=2048", K, N, dma_touch, args, K * N // 2)

    if "contig" in steps:
        for kt2, bn in [(1024, 2048), (2048, 2048), (512, 4096)]:
            n_tiles = (K // 2 // kt2) * (N // bn)
            tiled = jnp.asarray(
                rng.integers(0, 256, (n_tiles, kt2, bn), dtype=np.uint8))
            bench(f"dma-contig kt2={kt2} bn={bn}", K, N,
                  functools.partial(dma_touch_contig, kt2=kt2, bn=bn),
                  (tiled,), K * N // 2)

    if "manual" in steps:
        packed = jnp.asarray(rng.integers(0, 256, (K // 2, N), dtype=np.uint8))
        for nb_, kt2, bn in [(2, 1024, 2048), (4, 1024, 2048), (4, 512, 2048), (6, 512, 1024)]:
            try:
                bench(f"dma-manual nbuf={nb_} kt2={kt2} bn={bn}", K, N,
                      functools.partial(dma_touch_manual, kt2=kt2, bn=bn, n_buffers=nb_),
                      (packed,), K * N // 2)
            except Exception as e:
                print(f"manual nbuf={nb_} FAILED: {str(e)[:140]}", flush=True)

    if "compact" in steps:
        check_compact()
        for kt2, bn in [(2048, 2048), (1024, 2048), (2048, 1024)]:
            args, nb = make_compact_args(K, N, kt2, bn)
            try:
                bench(f"q4 bd COMPACT kt2={kt2} bn={bn}", K, N, gemv_q4_bd_compact, args, nb)
            except Exception as e:
                print(f"compact kt2={kt2} bn={bn} FAILED: {str(e)[:140]}", flush=True)
        # reference point: current bf16-scales bd at same shape
        import tools.microbench_gemv_bd as mbd
        packed = jnp.asarray(rng.integers(0, 256, (K // 2, N), dtype=np.uint8))
        scales = jnp.asarray((rng.standard_normal((2, K // 2 // G, N)) * 0.01).astype(BF16))
        offsets = jnp.asarray((rng.standard_normal((K // G, N)) * 0.003).astype(BF16))
        bench("q4 bd bf16-scales ref", K, N,
              lambda x, *a: mbd.gemv_q4_bd(x, *a), (packed, scales, offsets, 1024, 2048),
              packed.nbytes + scales.nbytes + offsets.nbytes)

    if "q8half" in steps:
        codes = jnp.asarray(rng.integers(-127, 127, (K // 2, N), dtype=np.int8))
        scales = jnp.asarray((rng.standard_normal((K // 2 // G, N)) * 0.01).astype(BF16))
        bench("q8 equal-bytes bound", K // 2, N, gemv_q8, (codes, scales, 1024, 2048),
              K * N // 2 + scales.nbytes)

    for tag, key, unpack in [
        ("q4 loop i32-unpack", "q4loop", _q4_body_i32),
        ("q4 loop u8-unpack", "q4u8", _q4_body_u8),
        ("q4 loop i16-unpack", "q4i16", _q4_body_i16),
        ("q4 loop NO-unpack (wrong)", "q4none", _q4_body_none),
    ]:
        if key in steps:
            args, nb = make_q4_args(K, N, 1024, 2048)
            try:
                bench(tag, K, N, functools.partial(gemv_q4, unpack=unpack), args, nb)
            except Exception as e:  # Mosaic may reject a variant — report, move on
                print(f"{tag:28s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

    if "tiles" in steps:
        for kt2, bn in [(512, 2048), (2048, 2048), (1024, 1024), (1024, 4096), (2048, 4096)]:
            args, nb = make_q4_args(K, N, kt2, bn)
            try:
                bench(f"q4 loop tiles kt2={kt2} bn={bn}", K, N,
                      functools.partial(gemv_q4, unpack=_q4_body_i32), args, nb)
            except Exception as e:
                print(f"tiles kt2={kt2} bn={bn} FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
