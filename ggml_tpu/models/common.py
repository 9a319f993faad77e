"""Shared model plumbing: per-slot KV-cache writes and causal masks."""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class QuantKV:
    """int8-quantized KV cache buffer: codes (B, H, S, D) int8 with one f32
    scale per (B, H, S) row — the llama.cpp `-ctk q8_0` analog.  Halves KV
    HBM traffic vs bf16; XLA fuses the dequant multiply into the attention
    reads.  Registered as a pytree node so slot views, snapshots and
    donation treat it like any cache leaf."""

    def __init__(self, codes, scales):
        self.codes = codes
        self.scales = scales

    # array-like surface the family forwards touch
    @property
    def shape(self):
        return self.codes.shape

    @property
    def dtype(self):
        # the dtype incoming rows are cast to BEFORE quantization — callers
        # do k.astype(cache.dtype) generically, so this must be castable
        return jnp.bfloat16

    def dequant(self):
        return self.codes.astype(jnp.bfloat16) * self.scales.astype(jnp.bfloat16)

    def tree_flatten(self):
        return (self.codes, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


QUANT_KV_DTYPE = "q8_kv"  # pass as cache dtype to quantize the KV cache


def _quantize_rows(kv):
    """kv (b, h, t, d) f32/bf16 -> (int8 codes, (b, h, t, 1) f32 scales)."""
    kf = kv.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kf), axis=-1, keepdims=True)
    scale = amax / 127.0
    codes = jnp.round(kf / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
    return codes, scale


def dequant_cache(c):
    """Dense view of a cache leaf: QuantKV -> bf16, arrays pass through."""
    return c.dequant() if isinstance(c, QuantKV) else c


def init_layer_cache(n_layer: int, batch: int, n_kv_head: int, max_seq: int,
                     head_dim: int, dtype=jnp.bfloat16):
    """KV cache as a tuple of per-layer (k, v) pairs, each (B, H, S, D).

    A pytree (not one stacked (L,2,B,H,S,D) array) so layer reads/writes are
    whole-buffer: the stacked layout made XLA materialise a dynamic-slice
    copy of every layer's K and V each step (~1.8 GB/s of pure copy traffic
    at GPT-J-6B decode scale) and re-insert them with
    dynamic-update-slices.  With per-layer leaves the donated buffers update
    in place — the zero-alloc steady state at pytree granularity.

    dtype=QUANT_KV_DTYPE ("q8_kv") stores int8 codes + per-row scales
    (QuantKV) instead of a dense array."""
    if dtype == QUANT_KV_DTYPE:
        mk = lambda: QuantKV(
            jnp.zeros((batch, n_kv_head, max_seq, head_dim), jnp.int8),
            jnp.zeros((batch, n_kv_head, max_seq, 1), jnp.float32))
        return tuple((mk(), mk()) for _ in range(n_layer))
    mk = lambda: jnp.zeros((batch, n_kv_head, max_seq, head_dim), dtype)
    return tuple((mk(), mk()) for _ in range(n_layer))


def cache_leaf(cache):
    """First K buffer — carries the cache dtype/shape metadata."""
    return cache[0][0]


def cache_slot(cache, i: int, width: int = 1):
    """Per-slot view for continuous batching: slice the batch axis of every
    leaf (analog of the seq-id slot views in examples/gpt-2/main-batched.cpp)."""
    return jax.tree.map(lambda a: a[i : i + width], cache)


def cache_set_slot(cache, slot_cache, i: int):
    return jax.tree.map(lambda a, s: a.at[i : i + s.shape[0]].set(s), cache, slot_cache)


def cache_write(cache_layer, kv, cache_len):
    """Write kv (b, h, t, d) into cache_layer (b, h, S, d) at position(s)
    cache_len: scalar (all rows share one position — the single-sequence
    path) or (b,) vector (per-slot positions — continuous batching;
    vmapped dynamic_update_slice lowers to a scatter).  A QuantKV cache
    quantizes the incoming rows (codes + per-row scale) on write."""
    if isinstance(cache_layer, QuantKV):
        codes, scales = _quantize_rows(kv)
        return QuantKV(cache_write(cache_layer.codes, codes, cache_len),
                       cache_write(cache_layer.scales, scales, cache_len))
    if getattr(cache_len, "ndim", 0) == 0:
        return jax.lax.dynamic_update_slice(cache_layer, kv, (0, 0, cache_len, 0))
    return jax.vmap(
        lambda c, k, p: jax.lax.dynamic_update_slice(c, k, (0, p, 0))
    )(cache_layer, kv, cache_len)


def layer_norm(x, w, b, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * w + b


# -- imatrix collection hook --------------------------------------------------
#
# The llama.cpp examples/imatrix analog: every model family routes its
# projections through linear(), so one observation point sees the input
# activations of every quantizable weight.  Collection runs the family
# forward EAGERLY (tracers are skipped — a jitted forward contributes
# nothing); the accumulated mean squared activations feed
# quant.imatrix.quantize_with_imatrix via tools/collect_imatrix.py.

_imatrix_collector = None


class ImatrixCollector:
    """Accumulates sum/count of squared input activations per weight name
    (identity-keyed off the params dict, so shared/tied weights accumulate
    under one name).  sums/counts (not the mean) are stored so separate
    calibration runs merge exactly."""

    def __init__(self, params: dict):
        from ..quant.planar import PlanarWeight

        self._names = {}
        for name, w in params.items():
            if name.endswith(".weight") and (
                isinstance(w, PlanarWeight) or getattr(w, "ndim", 0) == 2
            ):
                self._names[id(w)] = name
        self.sums: dict[str, np.ndarray] = {}
        self.counts: dict[str, int] = {}

    def observe(self, w, x):
        name = self._names.get(id(w))
        if name is None or isinstance(x, jax.core.Tracer):
            return
        xs = np.asarray(x, np.float64).reshape(-1, x.shape[-1])
        prev = self.sums.get(name)
        self.sums[name] = (xs * xs).sum(0) + (0.0 if prev is None else prev)
        self.counts[name] = self.counts.get(name, 0) + xs.shape[0]

    def imatrix(self) -> dict:
        """{weight name: (n_per_row,) f32 mean squared activation}."""
        return {
            n: (self.sums[n] / self.counts[n]).astype(np.float32) for n in self.sums
        }


@contextlib.contextmanager
def collect_imatrix(params: dict):
    """Context manager installing an ImatrixCollector over linear()."""
    global _imatrix_collector
    c = ImatrixCollector(params)
    prev = _imatrix_collector
    _imatrix_collector = c
    try:
        yield c
    finally:
        _imatrix_collector = prev


@jax.tree_util.register_pytree_node_class
class LoRAWeight:
    """A weight with a low-rank adapter riding it: W_eff = base + scale·B@A.

    The QLoRA shape: `base` stays a PlanarWeight (frozen quantized codes in
    HBM, streamed by the fused kernels; gradients flow to activations through
    planar_matmul's custom VJP) while `a` (r, k) / `b` (n, r) are small dense
    trainables.  linear() applies the adapter as (x@Aᵀ)@Bᵀ — rank-r matmuls,
    never materializing B@A.  Works over dense bases too.  The reference
    restricts training to F32/F16 params entirely (src/ggml.c:5859); llama.cpp
    applies adapters by merging at load (common/common.cpp)."""

    def __init__(self, base, a, b, scale: float = 1.0):
        self.base = base
        self.a = a
        self.b = b
        self.scale = scale

    @property
    def shape(self):  # ggml orientation (N, K), like PlanarWeight
        return (self.b.shape[0], self.a.shape[1])

    @property
    def ndim(self):
        return 2

    def tree_flatten(self):
        return (self.base, self.a, self.b), (self.scale,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, scale=aux[0])


def linear(x, w, b=None):
    """Dense or planar-quantized matmul: y = x @ W^T (+ b)."""
    from ..quant.planar import PlanarWeight

    if _imatrix_collector is not None:
        _imatrix_collector.observe(w, x)
    if isinstance(w, LoRAWeight):
        out = linear(x, w.base)
        lo = jnp.einsum("...k,rk->...r", x, w.a.astype(x.dtype),
                        precision=jax.lax.Precision.HIGHEST)
        out = out + w.scale * jnp.einsum("...r,nr->...n", lo, w.b.astype(x.dtype),
                                         precision=jax.lax.Precision.HIGHEST)
    elif isinstance(w, PlanarWeight):
        from ..kernels.qmatmul import planar_matmul

        out = planar_matmul(x, w)
    else:
        out = jnp.einsum("...k,nk->...n", x, w, precision=jax.lax.Precision.HIGHEST)
    if b is not None:
        out = out + b
    return out


def generate(model, prompt_tokens: np.ndarray, n_tokens: int, sampler=None, key=None,
             cache_dtype=None):
    """Host-driven generation loop shared by the model wrappers (greedy when
    sampler is None). model must expose new_cache/prefill/_step/params.
    For pure-greedy bulk decoding prefer the on-device decode_greedy loop."""
    cache = model.new_cache() if cache_dtype is None else model.new_cache(dtype=cache_dtype)
    logits, cache, n_past = model.prefill(cache, prompt_tokens)
    out = []
    for _ in range(n_tokens):
        if sampler is None:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            tok, key = sampler(logits, key)
        out.append(int(tok[0]))
        pos0 = jnp.full((tok.shape[0],), n_past, jnp.int32)
        logits, cache = model._step(model.params, tok[:, None], pos0, cache, jnp.int32(n_past))
        logits = logits[:, -1, :]
        n_past += 1
    return out


def make_sampled_decode(model, forward_fn, cfg):
    """Build an on-device sampled decode loop (top-k/top-p/temperature inside
    the lax.scan, PRNG key in the carry — zero host round-trips, the sampled
    analog of decode_greedy). Returns decode_sampled(cache, first_token,
    n_past, n_tokens, key, **sampler_kw) -> (cache, token ids)."""
    from ..sampling import sample_top_k_top_p

    @functools.lru_cache(maxsize=8)
    def compiled(temperature: float, top_k: int, top_p: float):
        def loop(params, cache, first_token, n_past, key, steps_tokens):
            def body(carry, _):
                cache, tok, n_past, key = carry
                pos0 = jnp.full((tok.shape[0],), n_past, jnp.int32)
                logits, cache = forward_fn(params, cfg, tok, pos0, cache, n_past)
                nxt, key = sample_top_k_top_p(
                    logits[:, -1, :], key, temperature=temperature, top_k=top_k, top_p=top_p
                )
                return (cache, nxt[:, None], n_past + 1, key), nxt

            (cache, tok, n_past, key), toks = jax.lax.scan(
                body, (cache, first_token, n_past, key), steps_tokens
            )
            return cache, toks

        return jax.jit(loop, donate_argnums=(1,))

    def decode_sampled(cache, first_token, n_past, n_tokens, key,
                       temperature=0.8, top_k=40, top_p=0.95):
        fn = compiled(float(temperature), int(top_k), float(top_p))
        cache, toks = fn(
            model.params, cache, jnp.asarray(first_token), jnp.int32(n_past), key,
            jnp.zeros((n_tokens,), jnp.int32),
        )
        return cache, np.asarray(toks)

    return decode_sampled


@functools.lru_cache(maxsize=32)
def causal_mask(t: int):
    """Additive (t, t) causal mask with a finite -inf (flash-kernel safe)."""
    i = np.arange(t)[:, None]
    j = np.arange(t)[None, :]
    return jnp.asarray(np.where(j <= i, 0.0, -1e30).astype(np.float32))
