"""Token sampling — analog of gpt_sample_top_k_top_p (reference:
examples/common.cpp:655-753) plus a jitted TPU-side sampler for the decode loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("top_k",))
def warp_logits(logits, temperature: float = 1.0, top_k: int = 40, top_p: float = 0.9,
                repeat_penalty: float = 1.0, recent_tokens=None):
    """The reference sampler's filtering pipeline as a pure logit transform:
    repeat-penalty -> temperature -> top-k -> top-p, returning filtered
    logits (-inf outside the kept set).  softmax of the result IS the
    sampling distribution — speculative rejection sampling needs it
    explicitly (speculative.py), the plain sampler draws from it."""
    lg = logits.astype(jnp.float32)
    if recent_tokens is not None and repeat_penalty != 1.0:
        # reference: examples/common.cpp repeat-penalty on plogits of last_n tokens
        penal = jnp.where(lg > 0, lg / repeat_penalty, lg * repeat_penalty)
        onehot_any = jax.nn.one_hot(recent_tokens, lg.shape[-1], dtype=jnp.bool_).any(axis=-2)
        lg = jnp.where(onehot_any, penal, lg)
    lg = lg / jnp.maximum(temperature, 1e-6)
    # top-k
    kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
    lg = jnp.where(lg < kth, -jnp.inf, lg)
    # top-p over the sorted distribution
    sorted_lg = jnp.sort(lg, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_lg, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)  # first index where cum >= top_p included
    cutoff_val = jnp.take_along_axis(sorted_lg, cutoff_idx, axis=-1)
    return jnp.where(lg < cutoff_val, -jnp.inf, lg)


@partial(jax.jit, static_argnames=("top_k",))
def sample_top_k_top_p(logits, key, temperature: float = 1.0, top_k: int = 40, top_p: float = 0.9, repeat_penalty: float = 1.0, recent_tokens=None):
    """logits: (batch, vocab). Returns (tokens (batch,), next_key).

    Mirrors the reference's pipeline: temperature scale -> top-k -> top-p
    renormalize -> categorical draw. Runs on device so the decode loop never
    syncs except for the sampled token itself."""
    key, sub = jax.random.split(key)
    lg = warp_logits(logits, temperature, top_k, top_p, repeat_penalty, recent_tokens)
    tok = jax.random.categorical(sub, lg, axis=-1)
    return tok.astype(jnp.int32), key


def greedy(logits):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
