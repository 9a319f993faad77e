"""Profile one decode scan and print the top device ops from the perfetto
trace (no tensorboard needed — parse the trace.json.gz directly)."""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.models.gptj import GPTJ, GPTJConfig, synth_quantized_params

n_layer = int(os.environ.get("NL", "2"))
cfg = GPTJConfig(n_vocab=50400, n_ctx=2048, n_embd=4096, n_head=16, n_layer=n_layer)
params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=0)
m = GPTJ(params, cfg, max_seq=256, batch=1)
cache = m.new_cache(jnp.bfloat16)
prompt = np.random.default_rng(0).integers(0, cfg.n_vocab, (1, 32)).astype(np.int32)

logits, cache, n_past = m.prefill(cache, prompt)
first = np.asarray(jnp.argmax(logits, -1))[:, None].astype(np.int32)
cache, _ = m.decode_greedy(cache, first, n_past, 16)  # compile
print("compiled", flush=True)

logdir = "/tmp/jax_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    cache, toks = m.decode_greedy(cache, first, n_past + 16, 16)
    jax.block_until_ready(toks)
print("traced", flush=True)

files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
if not files:
    sys.exit(0)

with gzip.open(files[0], "rt") as f:
    trace = json.load(f)

by_name = defaultdict(float)
count = defaultdict(int)
pid_names = {}
for ev in trace.get("traceEvents", []):
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
for ev in trace.get("traceEvents", []):
    if ev.get("ph") == "X" and "dur" in ev:
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" in pname or "/device" in pname.lower() or "xla" in pname.lower():
            by_name[ev["name"]] += ev["dur"]
            count[ev["name"]] += 1

if not by_name:  # fall back: all complete events
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            by_name[ev["name"]] += ev["dur"]
            count[ev["name"]] += 1

total = sum(by_name.values())
print(f"\ntop ops by total us (sum {total:.0f} us over 16 tokens):")
for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{dur:12.0f} us {count[name]:6d}x  {name[:110]}")

# aggregate by op FAMILY: per-layer instances get distinct HLO names
# (fusion.123 vs fusion.456), which buries the glue total in the tail
import re

fam_tot = defaultdict(float)
fam_cnt = defaultdict(int)
for name, dur in by_name.items():
    fam = re.sub(r"[.\d]+$", "", name)
    fam_tot[fam] += dur
    fam_cnt[fam] += count[name]
print("\nby op family (us over 16 tokens | us/token):")
for fam, dur in sorted(fam_tot.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{dur:12.0f} us {dur/16:9.1f}/tok {fam_cnt[fam]:7d}x  {fam[:90]}")
