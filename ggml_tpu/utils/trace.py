"""Tracing / profiling utilities.

Reference analogs: ggml_time_us/ggml_cycles (include/ggml.h:630-634), the
per-phase timers in examples (examples/gpt-2/main-backend.cpp:930-932), and
test-backend-ops perf mode (FLOPS/bandwidth per op). On TPU the real tracer is
XLA's: profile_to() wraps jax.profiler and produces a trace viewable in
TensorBoard/Perfetto — strictly more powerful than the reference's printf
timing, and the idiomatic tool for kernel roofline work.
"""

from __future__ import annotations

import contextlib
import time


def time_us() -> int:
    """reference: ggml_time_us (include/ggml.h:631)."""
    return time.perf_counter_ns() // 1000


@contextlib.contextmanager
def timer(label: str, sink=None):
    """Wall-clock a block, ggml-example style ('load time = %8.2f ms')."""
    t0 = time.perf_counter()
    yield
    dt = (time.perf_counter() - t0) * 1000.0
    msg = f"{label:>16} = {dt:8.2f} ms"
    if sink is None:
        print(msg)
    else:
        sink(msg)


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in the XLA profiler timeline (per-op observability —
    the analog of ggml_backend_sched_eval_callback's observe hook)."""
    try:
        import jax.profiler

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a device trace: python -c '... with profile_to("/tmp/trace"): run()'
    then inspect in TensorBoard. The TPU answer to GGML_SCHED_DEBUG +
    test-backend-ops perf."""
    import jax.profiler

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def op_flops_report(fn, *args, label: str = "op", iters: int = 10, flops: float | None = None):
    """Time a jitted callable and report ms + optional TFLOP/s — the
    test-backend-ops MODE_PERF analog for ad-hoc kernels."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    line = f"{label}: {dt*1000:.3f} ms/iter"
    if flops:
        line += f", {flops / dt / 1e12:.2f} TFLOP/s"
    print(line)
    return dt
