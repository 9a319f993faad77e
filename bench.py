#!/usr/bin/env python
"""Benchmark driver: GPT-2 117M decode tokens/sec on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline: reference GPT-2 117M decode = 5 ms/token (200 tok/s) on M1 Pro CPU
(reference: examples/gpt-2/README.md:18-22; BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from ggml_tpu.models.gpt2 import GPT2, GPT2Config, init_random_params

    cfg = GPT2Config(n_vocab=50257, n_ctx=1024, n_embd=768, n_head=12, n_layer=12)
    dtype = jnp.bfloat16
    params = init_random_params(cfg, seed=0, dtype=dtype)
    m = GPT2(params, cfg, max_seq=512, batch=1)
    cache = m.new_cache(dtype=dtype)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.n_vocab, (1, 32)).astype(np.int32)

    # prefill + warmup decode (compilation)
    logits, cache, n_past = m.prefill(cache, prompt)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
    logits, cache = m.decode_step(cache, tok, n_past)
    jax.block_until_ready(logits)
    n_past += 1

    # timed decode
    n_tokens = 64
    t0 = time.perf_counter()
    for _ in range(n_tokens):
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        logits, cache = m.decode_step(cache, tok, n_past)
        n_past += 1
    jax.block_until_ready(logits)
    dt = time.perf_counter() - t0

    toks_per_s = n_tokens / dt
    baseline = 200.0  # tok/s, reference M1 Pro CPU
    print(json.dumps({
        "metric": "gpt2_117m_bf16_decode_tokens_per_sec_per_chip",
        "value": round(toks_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(toks_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
