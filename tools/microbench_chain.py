"""Isolate: a scan over a chain of planar GEMVs (one GPT-J layer's matmuls,
no attention / cache / embedding). If this is slow, the problem is pallas-call
composition; if fast, the overhead is in attention/cache/lm-head."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.models.gptj import GPTJConfig, synth_quantized_params
from ggml_tpu.kernels.qmatmul import planar_matmul

E = 4096
cfg = GPTJConfig(n_vocab=512, n_ctx=64, n_embd=E, n_head=16, n_layer=1)
params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=0, fuse_qkv=False)
pre = "blk.0."
wq = params[pre + "attn_q.weight"]
wk = params[pre + "attn_k.weight"]
wv = params[pre + "attn_v.weight"]
wo = params[pre + "attn_output.weight"]
wu = params[pre + "ffn_up.weight"]
wd = params[pre + "ffn_down.weight"]

LAYER_BYTES = 4 * E * E + 2 * 4 * E * E  # int8 codes


def layer_chain(x):
    q = planar_matmul(x, wq)
    k = planar_matmul(x, wk)
    v = planar_matmul(x, wv)
    o = planar_matmul(q + k + v, wo)
    u = planar_matmul(x + o, wu)
    d = planar_matmul(jax.nn.gelu(u), wd)
    return x + d


@jax.jit
def run(x, n_iter_dummy):
    def body(carry, _):
        return layer_chain(carry), ()

    out, _ = jax.lax.scan(body, x, n_iter_dummy)
    return out


x = jnp.asarray(np.random.default_rng(0).standard_normal((1, E)).astype(np.float32)).astype(jnp.bfloat16)
dummy = jnp.zeros((64,), jnp.int32)

t0 = time.perf_counter()
out = run(x, dummy)
jax.block_until_ready(out)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
out = run(x, dummy)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 64
print(f"chain: {dt*1000:.3f} ms/iter, {LAYER_BYTES/dt/1e9:.1f} GB/s", flush=True)

# same chain, no scan: sequential python-level jit calls
one = jax.jit(layer_chain)
out = one(x); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(32):
    out = one(out)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 32
print(f"no-scan chain: {dt*1000:.3f} ms/iter, {LAYER_BYTES/dt/1e9:.1f} GB/s", flush=True)
