"""Distributed runtime wrapper: single-process no-op init + barrier + global
mesh on the 8-device virtual mesh (subprocess)."""

import os
import pathlib
import subprocess
import sys

_SCRIPT = r"""
from ggml_tpu.parallel.distributed import barrier, init_multihost, make_global_mesh, topology_report

rep = init_multihost()  # single process: no-op
assert rep["process_count"] == 1 and rep["global_devices"] == 8, rep
barrier("t")
mesh = make_global_mesh({"dp": 2, "tp": 4})
assert mesh.shape == {"dp": 2, "tp": 4}
print("DIST-OK")
"""


def test_distributed_singlehost():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True, env=env,
        cwd=pathlib.Path(__file__).resolve().parent.parent, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "DIST-OK" in r.stdout


def test_health_check_reports_healthy():
    from ggml_tpu.parallel.distributed import health_check

    r = health_check(timeout_s=60.0)
    assert r["healthy"] is True and r["error"] is None
    assert r["latency_s"] < 60.0 and r["process_count"] >= 1


def test_device_memory_introspection():
    from ggml_tpu.parallel.distributed import device_memory

    r = device_memory()
    assert set(r) >= {"bytes_in_use", "bytes_limit", "device"}
    assert r["bytes_in_use"] >= 0
