"""Packed-nibble (q4) GEMV vs int8 GEMV on decode-critical shapes.

The S4 transfer path is broken on this platform, so int4 codes are stored two
per int8 byte (half-plane packing: k < K/2 in the low nibble, k+K/2 in the
high nibble — same layout as the q4 prefill plane, quant/planar.py).  The
kernel unpacks on the VPU with integer shift/mask and feeds int8 MXU dots, so
HBM code traffic halves while the MXU path stays int8.

Measurement: iterations inside ONE jitted lax.scan with a data-dependency
chain + final fetch (block_until_ready lies over the axon relay).
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


def gemv_q4(xq, packed, scales, kt2, bn):
    """packed (K/2, N) uint8; scales (2, K/2/G, N); xq (m, K) int8."""
    m, k = xq.shape
    k2, npad = packed.shape
    assert k == 2 * k2
    ng = kt2 // G
    n_ktiles = k2 // kt2

    def kernel(x_lo, x_hi, qp, s_lo, s_hi, out):
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
            pl.BlockSpec((1, kt2 // G, bn), lambda i, kk: (0, kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt2 // G, bn), lambda i, kk: (1, kk, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(xq, xq, packed, scales, scales)


def bench(K, N, fn, make_args, nbytes, tag):
    args = make_args(K, N)
    xq0 = jnp.asarray(rng.integers(-127, 127, (1, K), dtype=np.int8))

    @jax.jit
    def run(xq):
        def body(x, _):
            out = fn(x, *args)
            nx = (out[:, :K] > 0).astype(jnp.int8) - (out[:, :K] < 0).astype(jnp.int8)
            return nx, out[0, 0]

        x, outs = jax.lax.scan(body, xq, jnp.zeros((ITERS,), jnp.int32))
        return outs

    outs = run(xq0)
    _ = np.asarray(outs)
    t0 = time.perf_counter()
    outs = run(xq0)
    _ = np.asarray(outs)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag}: K={K} N={N}  {dt*1e6:9.1f} us  {nbytes/dt/1e9:7.1f} GB/s (code bytes)", flush=True)
    return dt


def q8_args(kt, bn):
    def make(K, N):
        codes = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
        scales = jnp.asarray((rng.standard_normal((K // G, N)) * 0.01).astype(np.float32))
        return (codes, scales, kt, bn)

    return make


def q4_args(kt2, bn):
    def make(K, N):
        packed = jnp.asarray(rng.integers(0, 256, (K // 2, N), dtype=np.uint8))
        scales = jnp.asarray((rng.standard_normal((2, K // 2 // G, N)) * 0.01).astype(np.float32))
        return (packed, scales, kt2, bn)

    return make


def correctness():
    K, N = 512, 256
    packed = rng.integers(0, 256, (K // 2, N), dtype=np.uint8)
    scales = (rng.standard_normal((2, K // 2 // G, N)) * 0.01).astype(np.float32)
    xq = rng.integers(-127, 127, (1, K), dtype=np.int8)
    y = np.asarray(gemv_q4(jnp.asarray(xq), jnp.asarray(packed), jnp.asarray(scales), K // 2, N))
    lo = (packed & 0xF).astype(np.float32) * np.repeat(scales[0], G, axis=0)
    hi = (packed >> 4).astype(np.float32) * np.repeat(scales[1], G, axis=0)
    w = np.concatenate([lo, hi], axis=0)
    ref = xq.astype(np.float32) @ w
    err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"q4 gemv correctness: max rel err {err:.2e}", flush=True)
    assert err < 1e-5


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("check", "all"):
        correctness()
    if mode in ("bench", "all"):
        for K, N in [(4096, 16384)]:
            bench(K, N, gemv_q8, q8_args(1024, 1024), K * N, "q8 kt=1024 bn=1024")
            bench(K, N, gemv_q4, q4_args(512, 1024), K * N // 2, "q4 kt2=512 bn=1024")
            bench(K, N, gemv_q4, q4_args(1024, 1024), K * N // 2, "q4 kt2=1024 bn=1024")
            bench(K, N, gemv_q4, q4_args(512, 512), K * N // 2, "q4 kt2=512 bn=512")


def bench_controls():
    # q8 at half the bytes = the zero-unpack-cost bound for q4
    bench(2048, 16384, gemv_q8, q8_args(1024, 1024), 2048 * 16384, "q8 half-K (32MB bound)")
    bench(4096, 16384, gemv_q4, q4_args(1024, 1024), 4096 * 16384 // 2, "q4 kt2=1024 bn=1024")
    bench(4096, 16384, gemv_q4, q4_args(512, 512), 4096 * 16384 // 2, "q4 kt2=512 bn=512")


if __name__ == "__main__" and sys.argv[1:2] == ["controls"]:
    bench_controls()
