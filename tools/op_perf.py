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
MAX_ITERS = 2048
RNG = np.random.default_rng(0)


def _r(*shape, s=0.5):
    return jnp.asarray((RNG.standard_normal(shape) * s).astype(np.float32))


def _measure_total(fn, x0, iters: int) -> float:
    """Wall seconds for ONE dispatched run of `iters` chained applications
    of fn (jitted scan with a data dependency; result FETCHED — over the
    axon relay block_until_ready returns early)."""

    @jax.jit
    def run(x):
        def body(x, _):
            y = fn(x)
            return x * (1.0 + 0.0 * jnp.sum(y).astype(x.dtype)), jnp.sum(y)

        x, outs = jax.lax.scan(body, x, jnp.zeros((iters,), jnp.int32))
        return outs

    np.asarray(run(x0))  # compile + warmup
    t0 = time.perf_counter()
    np.asarray(run(x0))
    return time.perf_counter() - t0


_CALIB = None  # (fixed_cost_s, per_iter_overhead_s)


def harness_calib():
    """Calibrate the harness cost model total = F + iters*(c + op) with a
    near-empty op at two trip counts: F is the per-dispatch fixed cost
    (relay round trip — tens of ms some days) and c the per-scan-step
    overhead.  Every case subtracts both; cases whose total signal is
    smaller than F re-measure at higher trip counts (relay noise would
    otherwise bury them — this round's F regressed 30x vs round 3 and
    turned small-op numbers into garbage)."""
    global _CALIB
    if _CALIB is None:
        tiny = _r(8, 128)
        f = lambda x: x * 1.000001
        t_a = min(_measure_total(f, tiny, 32), _measure_total(f, tiny, 32))
        t_b = min(_measure_total(f, tiny, 512), _measure_total(f, tiny, 512))
        c = max((t_b - t_a) / 480.0, 0.0)
        F = max(t_a - 32 * c, 0.0)
        _CALIB = (F, c)
        print(f"# harness fixed {F*1e3:.1f} ms/dispatch, {c*1e6:.2f} us/step",
              flush=True)
    return _CALIB


RESULTS: dict[str, dict] = {}


def bench(name, fn, x0, flops=0.0, bytes_=0.0):
    F, c = harness_calib()
    iters = ITERS
    while True:
        total = _measure_total(fn, x0, iters)
        signal = total - F - iters * c
        if signal >= F or iters >= MAX_ITERS:
            break
        iters = min(iters * 8, MAX_ITERS)
    dt = max(signal / iters, 1e-9)
    msg = f"{name:36s} {dt*1e6:10.1f} us ({iters} iters)"
    rec = {"us": round(dt * 1e6, 2)}
    if flops:
        msg += f" {flops/dt/1e12:8.2f} TFLOP/s"
        rec["tflops"] = round(flops / dt / 1e12, 3)
    if bytes_:
        msg += f" {bytes_/dt/1e9:8.1f} GB/s"
        rec["gbps"] = round(bytes_ / dt / 1e9, 2)
    RESULTS[name] = rec
    print(msg, flush=True)


def bench_host(name, fn, nbytes, iters=3):
    """Host-side conversion-pipeline case (the test-quantize-perf analog,
    reference tests/test-quantize-perf.cpp): MB/s of quantize / dequantize /
    planar repack.  This is where round 2's 8.5x synth+repack regression
    would have been caught."""
    fn()  # warm (allocations, codebook tables)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters
    RESULTS[name] = {"us": round(dt * 1e6, 2), "mbps": round(nbytes / dt / 1e6, 1)}
    print(f"{name:36s} {dt*1e6:10.1f} us {nbytes/dt/1e6:10.1f} MB/s", flush=True)


def cases():
    M, K, N = 512, 4096, 4096
    a_mm = _r(N, K)
    yield ("mul_mat f32 512x4096x4096", lambda x: ops.mul_mat(a_mm, x), _r(M, K),
           dict(flops=2 * M * K * N))

    # bf16 reference rate: what the fused dequant-matmul prefill kernels
    # feed the MXU with today
    a_bf = a_mm.astype(jnp.bfloat16)
    yield ("mul_mat bf16 512x4096x4096",
           lambda x: jnp.dot(x.astype(jnp.bfloat16), a_bf.T,
                             preferred_element_type=jnp.float32),
           _r(M, K), dict(flops=2 * M * K * N))

    # raw int8 MXU rate (the vec_dot_type premise at M>1): if int8 through
    # XLA is ~2x the bf16 rate, an int8 prefill matmul path pays; if not,
    # that is the compute-bound analysis (VERDICT r3 item 5)
    wq8 = jnp.asarray(RNG.integers(-127, 128, (N, K)), jnp.int8)

    def int8_mm(x):
        xq = x.astype(jnp.int8)
        return jax.lax.dot_general(xq, wq8, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    yield ("mul_mat int8 512x4096x4096", int8_mm, _r(M, K),
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

    # head-dim + GQA breadth (VERDICT r4 weak #8: floors existed only at
    # 16h/128d and 16h/256d): 64d and 256d MHA, and 32q/8kv grouped heads
    for dd in (64, 256):
        kvd = _r(1, 16, 512, dd)
        yield (f"pallas flash_attn 16h 512q {dd}d",
               lambda q, kvd=kvd: flash_attention(q, kvd, kvd, scale=0.088),
               _r(1, 16, 512, dd), dict(flops=4 * 16 * 512 * 512 * dd))
    kvg = _r(1, 8, 512, 128)
    yield ("pallas flash_attn GQA 32q/8kv 512q 128d",
           lambda q: flash_attention(q, kvg, kvg, scale=0.088),
           _r(1, 32, 512, 128), dict(flops=4 * 32 * 512 * 512 * 128))


def decode_cases():
    """Decode-shaped (m=1) cases on GPT-J-6B geometry — the shapes the
    flagship tokens/s metric is built from, each individually floor-gated
    (VERDICT r3 item 7; the reference's eval_perf covers every case,
    tests/test-backend-ops.cpp:581).  bytes_ counts the quantized weight
    stream (compact-scale Q4_K ~0.578 B/param), so gbps here is directly
    comparable to the 635 GB/s measured chip rate."""
    from ggml_tpu.dtypes import GGMLType
    from ggml_tpu.kernels.qmatmul import planar_matmul
    from ggml_tpu.native import fast_quantize
    from ggml_tpu.quant.planar import repack

    if jax.devices()[0].platform == "cpu":
        # host smoke: interpret-mode pallas at 6B shapes takes minutes on
        # one core; the real numbers only mean anything on the chip
        shapes = [("q4k gemv 4096x4096 m=1", 512, 512)]
    else:
        d, f, v = 4096, 16384, 50400
        shapes = [("q4k gemv 4096x4096 m=1", 4096, d),
                  ("q4k gemv 16384x4096 m=1", f, d),
                  ("q4k gemv 4096x16384 m=1", d, f),
                  ("q4k gemv lmhead 50400x4096 m=1", v, d)]
    for name, n, k in shapes:
        w = (RNG.standard_normal((n, k)) * 0.05).astype(np.float32)
        raw = np.asarray(fast_quantize(w, GGMLType.Q4_K)).reshape(n, -1)
        pw = repack(raw, GGMLType.Q4_K, (n, k))
        del w
        yield (name, lambda x, pw=pw: planar_matmul(x, pw), _r(1, k),
               dict(bytes_=n * k * 0.578))

    # fused single-token decode attention over a populated bf16 cache
    from ggml_tpu.kernels.decode_attn import fused_decode_attention

    hq, dd, s = 16, 256, 256
    kc = jnp.asarray((RNG.standard_normal((1, hq, s, dd)) * 0.3).astype(np.float32), jnp.bfloat16)
    vc = jnp.asarray((RNG.standard_normal((1, hq, s, dd)) * 0.3).astype(np.float32), jnp.bfloat16)
    pos = jnp.int32(s - 2)

    def dec_attn(q):
        q4 = q.reshape(1, hq, 1, dd)
        o = fused_decode_attention(q4, q4.astype(jnp.bfloat16),
                                   q4.astype(jnp.bfloat16), kc, vc, pos,
                                   scale=0.0625)
        return o.reshape(1, hq * dd)

    yield ("decode_attn 16h 256d S=256", dec_attn, _r(1, hq * dd),
           dict(bytes_=2 * hq * s * dd * 2))

    # shape breadth: 64/128 head-dims and a 32q/8kv GQA case (llama-70B-class
    # grouping) — each reads its own cache, so bytes_ scales with hkv
    def _mk_dec(hq2, hkv2, dd2, s2=256):
        kc2 = jnp.asarray((RNG.standard_normal((1, hkv2, s2, dd2)) * 0.3
                           ).astype(np.float32), jnp.bfloat16)
        vc2 = jnp.asarray((RNG.standard_normal((1, hkv2, s2, dd2)) * 0.3
                           ).astype(np.float32), jnp.bfloat16)
        pos2 = jnp.int32(s2 - 2)

        def f(q):
            qq = q.reshape(1, hq2, 1, dd2)
            kn = qq[:, :hkv2].astype(jnp.bfloat16)
            o = fused_decode_attention(qq, kn, kn, kc2, vc2, pos2,
                                       scale=dd2 ** -0.5)
            return o.reshape(1, hq2 * dd2)

        return f, dict(bytes_=2 * hkv2 * s2 * dd2 * 2)

    for name2, hq2, hkv2, dd2 in (("decode_attn 16h 64d S=256", 16, 16, 64),
                                  ("decode_attn 16h 128d S=256", 16, 16, 128),
                                  ("decode_attn GQA 32q/8kv 128d S=256", 32, 8, 128)):
        f2, meta2 = _mk_dec(hq2, hkv2, dd2)
        yield (name2, f2, _r(1, hq2 * dd2), meta2)

    # decode-latency glue shapes (us-tracked; too small for a GB/s floor)
    yield ("rms_norm 1x4096 m=1", ops.rms_norm, _r(1, 4096),
           dict(bytes_=1 * 4096 * 8))
    yield ("gelu 1x16384 m=1", ops.gelu, _r(1, 16384),
           dict(bytes_=1 * 16384 * 8))


def quant_cases():
    """Conversion-pipeline throughput (host): quantize, dequantize, planar
    repack — numpy and the native csrc/repack.cpp path when built."""
    from ggml_tpu.dtypes import GGMLType, row_size
    from ggml_tpu.quant import reference as R
    from ggml_tpu.quant import planar as P

    n, k = 1024, 4096  # 16 MB f32 per pass
    w = (RNG.standard_normal((n, k)) * 0.5).astype(np.float32)
    nbytes = w.nbytes
    # grid i-quant encoders (neighbour-search types): native only — the
    # NumPy spec runs at ~0.1 MB/s and exists for bit-exactness, not speed
    qwm = np.abs(RNG.standard_normal(k)).astype(np.float32) + 0.01
    from ggml_tpu.native import native_quantize as _nq

    for t in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
              GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
              GGMLType.IQ1_M):
        if _nq(w[:1], t, qw=qwm) is not None:
            yield (f"quantize-native {t.name} imatrix 1024x4096",
                   lambda t=t: _nq(w, t, qw=qwm), nbytes)

    for t in (GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q6_K,
              GGMLType.IQ4_NL, GGMLType.IQ4_XS):
        from ggml_tpu.native import fast_quantize

        # fast_quantize: byte-identical native path when built — the NumPy
        # IQ4 spec alone would cost ~2x16MB of slow-spec time just to seed
        # the dequant/repack cases below
        raw = np.asarray(fast_quantize(w, t)).reshape(n, -1)
        if t not in (GGMLType.IQ4_NL, GGMLType.IQ4_XS):  # numpy iq4 is the
            yield (f"quantize {t.name} 1024x4096",       # slow spec; skip
                   lambda t=t: R.quantize(w, t), nbytes)
        from ggml_tpu.native import native_quantize

        if native_quantize(w[:1], t) is not None:
            yield (f"quantize-native {t.name} 1024x4096",
                   lambda t=t: native_quantize(w, t), nbytes)
        yield (f"dequantize {t.name} 1024x4096",
               lambda raw=raw, t=t: R.dequantize(raw, t, n * k), nbytes)
        yield (f"repack-numpy {t.name} 1024x4096",
               lambda raw=raw, t=t: P._repack_numpy(raw, t, (n, k)), nbytes)
        try:
            from ggml_tpu.native import native_repack

            if native_repack(raw, t, (n, k)) is not None:
                yield (f"repack-native {t.name} 1024x4096",
                       lambda raw=raw, t=t: native_repack(raw, t, (n, k)), nbytes)
        except ImportError:
            pass


def check_floors() -> list[str]:
    """Per-op regression gate (the BENCH_FLOOR idiom at op granularity):
    OP_PERF_FLOOR.json stores the minimum acceptable gbps/tflops/mbps per
    case; any measured case below its floor is a failure."""
    import json as _json
    import pathlib

    fp = pathlib.Path(__file__).resolve().parent.parent / "OP_PERF_FLOOR.json"
    if not fp.exists():
        return []
    floors = _json.loads(fp.read_text())
    failures = []
    for name, spec in floors.items():
        if name.startswith("_"):  # _comment etc.
            continue
        got = RESULTS.get(name)
        if got is None:
            failures.append(f"{name}: floor exists but the case did not run")
            continue
        for metric, floor in spec.items():
            val = got.get(metric)
            if val is None or val < floor:
                failures.append(f"{name}: {metric} = {val} < floor {floor}")
    return failures


def main(filt="", json_out=None, gate=False):
    for name, f, x0, kw in cases():
        if filt and filt not in name:
            continue
        try:
            bench(name, f, x0, **kw)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
    for name, f, x0, kw in decode_cases():
        if filt and filt not in name:
            continue
        try:
            bench(name, f, x0, **kw)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
    for name, f, nbytes in quant_cases():
        if filt and filt not in name:
            continue
        try:
            bench_host(name, f, nbytes)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
    if json_out:
        import json as _json
        import pathlib

        pathlib.Path(json_out).write_text(_json.dumps(RESULTS, indent=1) + "\n")
        print(f"# wrote {json_out} ({len(RESULTS)} cases)", flush=True)
    if gate:
        failures = check_floors()
        for f_ in failures:
            print(f"# OP PERF REGRESSION: {f_}", flush=True)
        if failures:
            sys.exit(1)
        print("# op-perf floors: all green", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = "OP_PERF.json" if "--json" in sys.argv else None
    main(args[0] if args else "", json_out=json_out, gate="--gate" in sys.argv)
