"""One-shot decode perf ladder — run FIRST when TPU hardware returns.

Measures, in one serialized process (the relay wedges under concurrency):
  1. q4 GEMV microbench: per-group-loop vs block-diagonal kernels at the
     three decode-critical shapes (qkv/ffn, lm head, ffn_down);
  2. e2e GPT-J-6B Q4_K decode with GGML_TPU_GEMV_BD=0 vs =1.

Prints a table + a verdict line; if bd wins e2e, flip _GEMV_BD's default in
kernels/qmatmul.py and raise BENCH_FLOOR.json.

Timing rules (memory: axon relay): iterations chained in one jitted scan,
warm-up at the SAME trip count, >=1.5 s windows, np.asarray() fetch.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_microbench():
    print("== microbench: loop vs block-diagonal ==", flush=True)
    r = subprocess.run([sys.executable, "-u", "tools/microbench_gemv_bd.py", "bench"],
                       capture_output=True, text=True, timeout=3600)
    print(r.stdout)
    if r.returncode != 0:
        print(r.stderr[-2000:])


def run_e2e(bd: str) -> float:
    env = dict(os.environ)
    env["GGML_TPU_GEMV_BD"] = bd
    t0 = time.time()
    r = subprocess.run([sys.executable, "bench.py"], capture_output=True, text=True,
                       env=env, timeout=3600)
    print(f"-- GGML_TPU_GEMV_BD={bd} ({time.time()-t0:.0f}s):")
    print(r.stdout.strip())
    print((r.stderr.strip().splitlines() or [""])[-1])
    import json

    try:
        return json.loads(r.stdout.strip().splitlines()[-1])["value"]
    except Exception:
        return 0.0


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("micro", "all"):
        run_microbench()
    if which in ("e2e", "all"):
        base = run_e2e("0")
        bd = run_e2e("1")
        print(f"\ne2e decode: loop {base:.1f} tok/s vs block-diag {bd:.1f} tok/s "
              f"-> {'FLIP DEFAULT ON' if bd > base * 1.02 else 'keep loop default'}")
