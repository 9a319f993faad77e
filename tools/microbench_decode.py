"""Isolate decode-step overhead: full-width GPT-J layers, variable count.

If per-token time scales super-linearly with n_layer (or has a huge constant),
the overhead is in the cache carry / scan / non-matmul ops, not the kernels.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.models.gptj import GPTJ, GPTJConfig, synth_quantized_params

n_layer = int(os.environ.get("NL", "2"))
max_seq = int(os.environ.get("MS", "256"))
cfg = GPTJConfig(n_vocab=50400, n_ctx=2048, n_embd=4096, n_head=16, n_layer=n_layer)

t0 = time.perf_counter()
params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=0)
print(f"synth {time.perf_counter()-t0:.1f}s", flush=True)

m = GPTJ(params, cfg, max_seq=max_seq, batch=1)
cache = m.new_cache(jnp.bfloat16)
prompt = np.random.default_rng(0).integers(0, cfg.n_vocab, (1, 32)).astype(np.int32)

t0 = time.perf_counter()
logits, cache, n_past = m.prefill(cache, prompt)
first = np.asarray(jnp.argmax(logits, -1))[:, None].astype(np.int32)
cache, _ = m.decode_greedy(cache, first, n_past, 4)
print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)

for n_tok in (16, 64):
    t0 = time.perf_counter()
    cache, toks = m.decode_greedy(cache, first, n_past + 4, n_tok)
    dt = time.perf_counter() - t0
    print(f"n_layer={n_layer} decode {n_tok} toks: {1000*dt/n_tok:.2f} ms/tok", flush=True)
