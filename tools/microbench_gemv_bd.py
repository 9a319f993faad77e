"""Block-diagonal grouped-dot GEMV vs the per-group-loop GEMV.

Hypothesis: at M=1 the per-group dots ((1,32)x(32,bn)) issue 4x more MXU
passes than the K=128 minimum — the kernel is MXU-pass-bound below the HBM
stream rate.  Stacking the activation groups block-diagonally into the
(otherwise idle) row dimension — lhs row g holds x_g at columns [g*G,(g+1)*G)
— yields ALL per-group partial sums in ONE full-K dot:

    P = blockdiag(x) @ codes        # (ng, bn) int32, minimum pass count
    y = sum_g P[g] * s[g]           # VPU reduce

Measurement rules per the axon relay: iterations chained in one lax.scan,
>=1.5 s timed window, marginal comparisons only.
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

G = 32
ITERS = 64
rng = np.random.default_rng(0)


# -- current kernel (per-group loop), copied shape of qmatmul._q4gemv_off --


def gemv_q4_loop(xq, packed, scales, offsets, kt2, bn):
    m, k = xq.shape
    k2, npad = packed.shape
    ng = kt2 // G
    n_ktiles = k2 // kt2

    def kernel(x_lo, x_hi, qp, s_lo, s_hi, o_lo, o_hi, out):
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
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(xq, xq, packed, scales, scales, offsets, offsets)


# -- block-diagonal variant (M=1) --


def gemv_q4_bd(xq, packed, scales, offsets, kt2, bn):
    m, k = xq.shape
    assert m == 1
    k2, npad = packed.shape
    ng = kt2 // G
    n_ktiles = k2 // kt2

    def kernel(x_lo, x_hi, qp, s_lo, s_hi, o_lo, o_hi, out):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out[:] = jnp.zeros_like(out)

        codes = qp[:].astype(jnp.int32)
        lo = (codes & 0xF).astype(jnp.int8)
        hi = (codes >> 4).astype(jnp.int8)
        sl = s_lo[0].astype(jnp.float32)  # (ng, bn)
        sh = s_hi[0].astype(jnp.float32)
        ol = o_lo[:].astype(jnp.float32)
        oh = o_hi[:].astype(jnp.float32)

        gidx = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2), 0)
        kidx = jax.lax.broadcasted_iota(jnp.int32, (ng, kt2), 1) // G

        def bd(x):  # (1, kt2) int8 -> (ng, kt2) block-diagonal
            xb = jnp.broadcast_to(x.astype(jnp.int32), (ng, kt2))
            return jnp.where(gidx == kidx, xb, 0).astype(jnp.int8)

        xl, xh = x_lo[:], x_hi[:]
        Pl = jax.lax.dot_general(bd(xl), lo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)  # (ng, bn)
        Ph = jax.lax.dot_general(bd(xh), hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        xsl = bd(xl).astype(jnp.int32).sum(axis=1, keepdims=True).astype(jnp.float32)
        xsh = bd(xh).astype(jnp.int32).sum(axis=1, keepdims=True).astype(jnp.float32)
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
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(xq, xq, packed, scales, scales, offsets, offsets)


def make_args(K, N):
    packed = jnp.asarray(rng.integers(0, 256, (K // 2, N), dtype=np.uint8))
    scales = jnp.asarray((rng.standard_normal((2, K // 2 // G, N)) * 0.01).astype(np.float32))
    offsets = jnp.asarray((rng.standard_normal((K // G, N)) * 0.003).astype(np.float32))
    return packed, scales, offsets


def correctness():
    K, N = 512, 256
    packed, scales, offsets = make_args(K, N)
    xq = jnp.asarray(rng.integers(-127, 127, (1, K), dtype=np.int8))
    a = np.asarray(gemv_q4_loop(xq, packed, scales, offsets, K // 2, N))
    b = np.asarray(gemv_q4_bd(xq, packed, scales, offsets, K // 2, N))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"bd-vs-loop max rel err {err:.2e}", flush=True)
    assert err < 1e-5


def bench(K, N, fn, kt2, bn, tag):
    packed, scales, offsets = make_args(K, N)
    nbytes = K * N // 2 + scales.nbytes + offsets.nbytes
    xq0 = jnp.asarray(rng.integers(-127, 127, (1, K), dtype=np.int8))

    @jax.jit
    def run(xq):
        def body(x, _):
            out = fn(x, packed, scales, offsets, kt2, bn)
            nx = (out[:, :K] > 0).astype(jnp.int8) - (out[:, :K] < 0).astype(jnp.int8)
            return nx, out[0, 0]

        x, outs = jax.lax.scan(body, xq, jnp.zeros((ITERS,), jnp.int32))
        return outs

    _ = np.asarray(run(xq0))
    t0 = time.perf_counter()
    _ = np.asarray(run(xq0))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag}: K={K} N={N} kt2={kt2} bn={bn}  {dt*1e6:9.1f} us  "
          f"{nbytes/dt/1e9:7.1f} GB/s", flush=True)
    return dt


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("check", "all"):
        correctness()
    if mode in ("bench", "all"):
        shapes = [(4096, 16384)] if mode == "all" else [(4096, 16384), (4096, 51200), (16384, 4096)]
        for K, N in shapes:
            bench(K, N, gemv_q4_loop, 1024, 2048, "loop")
            bench(K, N, gemv_q4_bd, 1024, 2048, "bd  ")
