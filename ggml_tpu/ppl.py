"""Perplexity harness — the WikiText-2 Δppl gate machinery.

The reference ecosystem measures quantization quality as perplexity delta vs
the f32 model over a token stream (llama.cpp `perplexity` tool downstream of
ggml; the BASELINE gate here is Δppl ≤ 0.01 vs reference CPU Q4_K/Q8_0).
This module computes windowed ppl for any model exposing
forward(params, cfg, tokens, pos_start, cache, cache_len).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def perplexity(
    forward_fn,
    params,
    cfg,
    tokens: np.ndarray,
    window: int = 256,
    stride: int | None = None,
    init_cache_fn=None,
    cache_dtype=None,
) -> float:
    """Sliding-window perplexity: mean NLL of each window's second half
    (the llama.cpp convention: first half is context only)."""
    import jax.numpy as jnp

    tokens = np.asarray(tokens).reshape(-1)
    stride = stride or window // 2
    if not (1 <= stride <= window - 1):
        raise ValueError(f"stride must be in [1, window-1], got {stride}")
    if cache_dtype is None:
        cache_dtype = jnp.float32

    @jax.jit
    def window_nll(params, toks, cache):
        logits, _ = forward_fn(params, cfg, toks[None, :], jnp.zeros((1,), jnp.int32), cache, jnp.int32(0),
                               prefill=True)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp[:-1], toks[1:, None], axis=-1)[:, 0]
        return nll  # (window-1,)

    total_nll = 0.0
    total_cnt = 0
    pos = 0
    while pos + window <= len(tokens):
        toks = jnp.asarray(tokens[pos : pos + window].astype(np.int32))
        cache = init_cache_fn(cfg, 1, window, cache_dtype)
        nll = np.asarray(window_nll(params, toks, cache))
        # score each token exactly once: the first window scores everything,
        # later windows score only the `stride` new positions at their end
        # (a caller-supplied stride != window//2 would otherwise double-count
        # or skip tokens)
        half = (window - 1) - stride if pos > 0 else 0
        total_nll += float(nll[half:].sum())
        total_cnt += len(nll) - half
        pos += stride
    if total_cnt == 0:
        raise ValueError("token stream shorter than one window")
    return math.exp(total_nll / total_cnt)
