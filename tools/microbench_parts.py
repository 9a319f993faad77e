"""Bisect decode-step cost: matmuls vs attention+cache vs embedding+lm head."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.models.gptj import GPTJConfig, synth_quantized_params, init_cache
from ggml_tpu.kernels.qmatmul import planar_matmul

cfg = GPTJConfig(n_vocab=50400, n_ctx=2048, n_embd=4096, n_head=16, n_layer=2)
params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=0, fuse_qkv=False)
E, H, D = cfg.n_embd, cfg.n_head, cfg.head_dim
MAX_SEQ = 256
print("synth done", flush=True)


def timeit(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 64
    print(f"{label:36s} {dt*1000:8.3f} ms/tok", flush=True)


dummy = jnp.zeros((64,), jnp.int32)
x0 = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1, E)).astype(np.float32)).astype(jnp.bfloat16)


def scan64(step):
    """step(*carry) -> tuple(new_carry). Returns jitted 64-iter scan runner."""

    @jax.jit
    def run(*c):
        def body(carry, _):
            new = step(*carry)
            return (new if isinstance(new, tuple) else (new,)), ()

        out, _ = jax.lax.scan(body, c, dummy)
        return out

    return run


# 1) matmuls only (both layers)
def mm_step(x):
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        q = planar_matmul(x, params[pre + "attn_q.weight"])
        k = planar_matmul(x, params[pre + "attn_k.weight"])
        v = planar_matmul(x, params[pre + "attn_v.weight"])
        o = planar_matmul(q + k + v, params[pre + "attn_output.weight"])
        u = planar_matmul(x + o, params[pre + "ffn_up.weight"])
        d = planar_matmul(jax.nn.gelu(u), params[pre + "ffn_down.weight"])
        x = x + d
    return (x,)


timeit("matmuls only", scan64(mm_step), x0)


# 2) attention + cache only
cache = init_cache(cfg, 1, MAX_SEQ, jnp.bfloat16)


def att_step(x, cache, n):
    b, t = 1, 1
    positions = n[None, None] + jnp.arange(1)[None, :]
    new_cache = cache
    for i in range(cfg.n_layer):
        k = x.reshape(b, t, H, D).transpose(0, 2, 1, 3)
        v = k
        kc = jax.lax.dynamic_update_slice(new_cache[i, 0], k.astype(new_cache.dtype), (0, 0, n, 0))
        vc = jax.lax.dynamic_update_slice(new_cache[i, 1], v.astype(new_cache.dtype), (0, 0, n, 0))
        new_cache = new_cache.at[i, 0].set(kc).at[i, 1].set(vc)
        q = k
        att = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kc.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        kv_pos = jnp.arange(MAX_SEQ)[None, None, None, :]
        att = jnp.where(kv_pos <= positions[:, None, :, None], att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vc)
        x = x + out.transpose(0, 2, 1, 3).reshape(b, t, E).astype(x.dtype)
    return x, new_cache, n + 1


timeit("attention+cache only", scan64(att_step), x0, cache, jnp.int32(4))

# 3) lm head only
wout = params["output.weight"]
timeit("lm head only", scan64(lambda x: (x + planar_matmul(x, wout)[..., :1, :E],)), x0)

# 4) embedding gather + argmax only
embd = params["token_embd.weight"]


def emb_step(tok):
    x = embd[tok]
    logits = jnp.einsum("bte,ve->btv", x.astype(jnp.bfloat16), embd[:, :].astype(jnp.bfloat16))
    return (jnp.argmax(logits[:, -1], -1)[:, None],)


timeit("embed + dense-lmhead + argmax", scan64(emb_step), jnp.zeros((1, 1), jnp.int32))
