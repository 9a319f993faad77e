#!/usr/bin/env bash
# CI runner — the analog of the reference's ci/run.sh staged pipeline
# (reference: ci/run.sh — ctest stages then real-model integration runs).
#
# Stage 1: full differential test suite on a virtual 8-device CPU mesh
# Stage 2: multichip dry-run (dp/tp/ep/pp shardings compile + execute)
# Stage 3: flagship compile check (quantized GPT-J through Pallas kernels)
# Stage 4 (TPU only, opt-in: CI_TPU=1): end-to-end decode benchmark
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== stage 0: reference parity harness build (ours-vs-reference-binary gate) =="
bash ci/build_ref.sh

echo "== stage 1: test suite (CPU mesh) =="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu CI_REQUIRE_REF=1 \
    XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8" \
    python -m pytest tests/ -q

echo "== stage 2: multichip dryrun =="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8" \
    python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

echo "== stage 3: flagship compile check =="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -c "
from __graft_entry__ import entry
import jax
fn, args = entry()
out = jax.jit(fn)(*args)
print('entry ok', jax.tree.map(lambda x: x.shape, out)[0])
"

echo "== stage 3.5: real-model smoke (tiny llama -> Q4_K -> HTTP server, 3 concurrent) =="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m pytest tests/test_ci_smoke.py -q

if [ "${CI_TPU:-0}" = "1" ]; then
  echo "== stage 4a: on-chip kernel conformance (Mosaic-compiled, interpret=False) =="
  # the CPU suite runs Pallas in interpret mode; this stage catches
  # Mosaic-only miscompiles on the real chip: EVERY planar dtype compiles
  # and runs at GEMV + batched shapes (test_planar_matmul_compiled over the
  # full type list), plus a per-node compare_graph decode step TPU-vs-spec
  GGML_TPU_TESTS=1 python -m pytest tests/test_planar_qmatmul.py \
      -q -k "compiled or compact or block_diagonal or int8_gemv"
  GGML_TPU_TESTS=1 python -m pytest tests/test_compare_graph.py \
      -q -k "on_chip"

  echo "== stage 4b: TPU benchmarks (gated vs BENCH_FLOOR.json) =="
  CI_BENCH_GATE=1 python bench.py
  CI_BENCH_GATE=1 BENCH=prefill python bench.py
  CI_BENCH_GATE=1 BENCH=batch python bench.py
  CI_BENCH_GATE=1 BENCH=batch BENCH_BATCH=8 python bench.py
  CI_BENCH_GATE=1 BENCH=serve python bench.py
  CI_BENCH_GATE=1 BENCH=serve_long python bench.py
  CI_BENCH_GATE=1 BENCH=serve_paged python bench.py
  CI_BENCH_GATE=1 BENCH=spec python bench.py
  CI_BENCH_GATE=1 BENCH=spec_serve python bench.py
  CI_BENCH_GATE=1 BENCH=moe python bench.py
  CI_BENCH_GATE=1 BENCH=mla python bench.py
  CI_BENCH_GATE=1 BENCH=train python bench.py
  CI_BENCH_GATE=1 BENCH=qlora python bench.py

  echo "== stage 4c: per-op perf snapshot + floors (OP_PERF.json vs OP_PERF_FLOOR.json) =="
  python tools/op_perf.py --json --gate
fi
echo "CI OK"
