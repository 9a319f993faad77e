"""Sweep int8 GEMV tile configs on decode-critical shapes.

IMPORTANT measurement note: over the axon relay, block_until_ready does NOT
wait for device completion — every iteration must be inside ONE jitted
program with a data dependency chain, and the result must be fetched.
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


def gemv(xq, codes, scales, kt, bn):
    m, k = xq.shape
    _, npad = codes.shape
    ng_step = kt // G

    def kernel(x, q, s, out):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out[:] = jnp.zeros_like(out)

        xv, qv, sv = x[:], q[:], s[:]
        acc = out[:]
        for j in range(ng_step):
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
            pl.BlockSpec((ng_step, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(xq, codes, scales)


def bench_config(K, N, kt, bn):
    codes = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
    scales = jnp.asarray((rng.standard_normal((K // G, N)) * 0.01).astype(np.float32))
    xq0 = jnp.asarray(rng.integers(-127, 127, (1, K), dtype=np.int8))

    @jax.jit
    def run(xq):
        def body(x, _):
            out = gemv(x, codes, scales, kt, bn)
            # data dependency: next x derived from out (cheap, value-chaos)
            nx = (out[:, :K] > 0).astype(jnp.int8) - (out[:, :K] < 0).astype(jnp.int8)
            return nx, out[0, 0]

        x, outs = jax.lax.scan(body, xq, jnp.zeros((ITERS,), jnp.int32))
        return outs

    outs = run(xq0)
    _ = np.asarray(outs)  # warmup + compile + fetch
    t0 = time.perf_counter()
    outs = run(xq0)
    _ = np.asarray(outs)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"K={K} N={N} kt={kt} bn={bn}: {dt*1e6:9.1f} us  {K*N/dt/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    shapes = [(4096, 4096), (4096, 12288), (16384, 4096), (4096, 50688)]
    for (K, N) in shapes:
        for kt, bn in ((256, 256), (256, 512), (512, 512), (512, 1024), (1024, 512)):
            if N % bn or K % kt:
                continue
            try:
                bench_config(K, N, kt, bn)
            except Exception as e:
                print(f"K={K} N={N} kt={kt} bn={bn} FAILED {type(e).__name__}: {e}", flush=True)
