"""Per-op performance harness — the test-backend-ops MODE_PERF analog
(reference: tests/test-backend-ops.cpp:581 eval_perf, op_flops :366).

Measures each case INSIDE one jitted scan with a data dependency and fetches
the result (over the axon relay, naive block_until_ready lies — see
tools/microbench_gemv_tiles.py). Reports us/iter + TFLOP/s or GB/s.

Usage: python tools/op_perf.py [op-name-filter]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ggml_tpu.ops import core as ops

ITERS = 32
RNG = np.random.default_rng(0)


def _r(*shape, s=0.5):
    return jnp.asarray((RNG.standard_normal(shape) * s).astype(np.float32))


_FLOOR = None  # per-iteration fixed cost of the chain harness itself


def _measure(fn, x0):
    @jax.jit
    def run(x):
        def body(x, _):
            y = fn(x)
            return x * (1.0 + 0.0 * jnp.sum(y).astype(x.dtype)), jnp.sum(y)

        x, outs = jax.lax.scan(body, x, jnp.zeros((ITERS,), jnp.int32))
        return outs

    np.asarray(run(x0))  # compile + warmup
    t0 = time.perf_counter()
    np.asarray(run(x0))
    return (time.perf_counter() - t0) / ITERS


def harness_floor():
    """Per-iteration fixed cost (scan step + chain + dispatch): measured with
    a near-empty op and subtracted from every case — the axon relay's floor
    is hundreds of us and would otherwise bury small ops."""
    global _FLOOR
    if _FLOOR is None:
        tiny = _r(8, 128)
        _FLOOR = _measure(lambda x: x * 1.000001, tiny)
        print(f"# harness floor {_FLOOR*1e6:.1f} us/iter (subtracted)", flush=True)
    return _FLOOR


def bench(name, fn, x0, flops=0.0, bytes_=0.0):
    dt_raw = _measure(fn, x0)
    dt = max(dt_raw - harness_floor(), 1e-9)
    msg = f"{name:36s} {dt*1e6:10.1f} us (+floor {1e6*harness_floor():.0f})"
    if flops:
        msg += f" {flops/dt/1e12:8.2f} TFLOP/s"
    if bytes_:
        msg += f" {bytes_/dt/1e9:8.1f} GB/s"
    print(msg, flush=True)


def cases():
    M, K, N = 512, 4096, 4096
    a_mm = _r(N, K)
    yield ("mul_mat f32 512x4096x4096", lambda x: ops.mul_mat(a_mm, x), _r(M, K),
           dict(flops=2 * M * K * N))
    yield ("soft_max_ext 8x16x512x512", lambda x: ops.soft_max_ext(x, scale=0.1),
           _r(8, 16, 512, 512), dict(bytes_=8 * 16 * 512 * 512 * 8))
    yield ("rms_norm 512x4096", ops.rms_norm, _r(512, 4096), dict(bytes_=512 * 4096 * 8))
    yield ("gelu 512x4096", ops.gelu, _r(512, 4096), dict(bytes_=512 * 4096 * 8))

    kv = _r(1, 16, 512, 128)
    yield ("flash_attn_ext 16h 512q 128d",
           lambda q: ops.flash_attn_ext(q, kv, kv, scale=0.088),
           _r(1, 16, 512, 128), dict(flops=4 * 16 * 512 * 512 * 128))

    w_conv = _r(64, 32, 3, 3)
    yield ("conv_2d 32->64 ch 64x64",
           lambda x: ops.conv_2d(x, w_conv, pw=1, ph=1),
           _r(1, 32, 64, 64), dict(flops=2 * 64 * 32 * 9 * 64 * 64))

    from ggml_tpu.kernels.flash_attn import flash_attention

    yield ("pallas flash_attn 16h 512q 128d",
           lambda q: flash_attention(q, kv, kv, scale=0.088),
           _r(1, 16, 512, 128), dict(flops=4 * 16 * 512 * 512 * 128))


def main(filt=""):
    for name, f, x0, kw in cases():
        if filt and filt not in name:
            continue
        try:
            bench(name, f, x0, **kw)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "")
