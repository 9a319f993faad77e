"""Test config: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (see README / driver contract)."""

import os

# FORCE the CPU mesh (not setdefault): the agent shell exports
# JAX_PLATFORMS=axon + PALLAS_AXON_POOL_IPS, which would silently route the
# whole suite through the one-chip TPU tunnel (minutes per remote compile,
# and bench contention).  GGML_TPU_TESTS=1 opts real-hardware tests back in
# (ci/run.sh on-TPU conformance stage).
if os.environ.get("GGML_TPU_TESTS", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

if os.environ.get("GGML_TPU_TESTS", "0") != "1":
    # the agent-shell sitecustomize registers the axon TPU plugin at
    # interpreter startup (before this conftest), and once registered it wins
    # over the JAX_PLATFORMS env var — the jax.config update is authoritative
    import jax

    jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
