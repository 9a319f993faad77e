"""Shared model plumbing: per-slot KV-cache writes and causal masks."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def cache_write(cache_layer, kv, cache_len):
    """Write kv (b, h, t, d) into cache_layer (b, h, S, d) at position(s)
    cache_len: scalar (all rows share one position — the single-sequence
    path) or (b,) vector (per-slot positions — continuous batching;
    vmapped dynamic_update_slice lowers to a scatter)."""
    if getattr(cache_len, "ndim", 0) == 0:
        return jax.lax.dynamic_update_slice(cache_layer, kv, (0, 0, cache_len, 0))
    return jax.vmap(
        lambda c, k, p: jax.lax.dynamic_update_slice(c, k, (0, p, 0))
    )(cache_layer, kv, cache_len)


@functools.lru_cache(maxsize=32)
def causal_mask(t: int):
    """Additive (t, t) causal mask with a finite -inf (flash-kernel safe)."""
    i = np.arange(t)[:, None]
    j = np.arange(t)[None, :]
    return jnp.asarray(np.where(j <= i, 0.0, -1e30).astype(np.float32))
