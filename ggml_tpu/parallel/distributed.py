"""Multi-host runtime initialization — the RPC-backend replacement.

Reference: the RPC backend (src/ggml-rpc/ggml-rpc.cpp) is a blocking TCP star
that forwards per-tensor/per-graph commands to remote workers. The TPU-native
equivalent is jax.distributed: every host runs the SAME program, the XLA
runtime wires collectives over ICI/DCN, and "send the graph to the worker" is
replaced by each host compiling the shared pjit program (SURVEY.md §5
'Distributed communication backend').

Fail-fast error model mirrors the reference (RPC treats socket errors as hard
failures, ggml-rpc.cpp:350-420): initialization errors raise; liveness is
checked by a collective barrier with a timeout.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def init_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize the multi-host runtime. Arguments default to the standard
    env vars (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID) or the TPU
    metadata auto-detection jax.distributed performs on real pods.
    No-op on a single process. Returns a topology report."""
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "0")) or None
    process_id = process_id if process_id is not None else (
        int(os.environ["PROCESS_ID"]) if "PROCESS_ID" in os.environ else None
    )
    if coordinator or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return topology_report()


def topology_report() -> dict:
    """Device/host topology (the ggml_backend_dev_* introspection analog)."""
    devs = jax.devices()
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(devs),
        "local_devices": len(jax.local_devices()),
        "platform": devs[0].platform if devs else "none",
        "device_kind": devs[0].device_kind if devs else "none",
    }


def device_memory(device=None) -> dict:
    """Per-device memory introspection (the ggml_backend_dev_memory analog,
    include/ggml-backend.h:163): bytes in use / limit where the platform
    reports them, else zeros (CPU devices report nothing)."""
    dev = device or jax.local_devices()[0]
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        pass
    return {
        "bytes_in_use": int(stats.get("bytes_in_use", 0)),
        "bytes_limit": int(stats.get("bytes_limit", 0)),
        "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
        "device": str(dev),
    }


def barrier(tag: str = "barrier") -> None:
    """Cross-host liveness check: a tiny psum over all devices. Hangs -> a
    host is gone; the surrounding deployment should treat that as fatal and
    restart the step from the last checkpoint (slice health is the TPU
    equivalent of the reference's fail-fast RPC errors)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    import jax.numpy as jnp

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("all",))
    sharding = jax.sharding.NamedSharding(mesh, P("all"))
    # per-shard construction works across processes (a host-local jnp.ones
    # cannot be bound to a global mesh when process_count > 1)
    ones = jax.make_array_from_callback(
        (len(devs),), sharding, lambda idx: np.ones((1,), np.float32)
    )
    out = shard_map(
        lambda x: jax.lax.psum(x, "all"),
        mesh=mesh,
        in_specs=P("all"),
        out_specs=P(),
    )(ones)
    assert int(np.asarray(out).reshape(-1)[0]) == len(devs), f"{tag}: barrier psum mismatch"


def make_global_mesh(axes: dict[str, int]) -> "jax.sharding.Mesh":
    """Build a named mesh over ALL processes' devices, e.g.
    make_global_mesh({'dp': 2, 'tp': 8}). Axis order follows dict order; the
    product must equal the global device count."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    shape = tuple(axes.values())
    assert int(np.prod(shape)) == len(devs), (shape, len(devs))
    return Mesh(devs.reshape(shape), tuple(axes))


def health_check(timeout_s: float = 30.0) -> dict:
    """Bounded-time slice health probe: run the liveness barrier on a worker
    thread with a deadline.  A hung collective (dead host / wedged ICI link)
    reports unhealthy instead of blocking forever — the detectable failure
    signal the reference lacks (its RPC client just blocks,
    src/ggml-rpc/ggml-rpc.cpp:350-420), enabling restart-from-checkpoint
    (checkpoint.py) in a supervising trainer."""
    import threading
    import time

    result: dict = {"healthy": False, "latency_s": None, "error": None}
    t0 = time.monotonic()

    def probe():
        try:
            barrier("health_check")
            result["healthy"] = True
        except Exception as e:  # collective failed outright
            result["error"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        result["error"] = f"barrier did not complete within {timeout_s}s"
    result["latency_s"] = time.monotonic() - t0
    result.update(topology_report())
    return result
