"""Phi-3.5-MoE family (llama.cpp arch 'phimoe') — 16-expert top-2 MoE with
SPARSEMIXER routing (threshold-masked softmax per selected expert, paper
2409.12136 — NOT the Mixtral softmax-topk), LongRoPE context extension
with EXPLICIT long/short mscales, biased LayerNorms (not RMS), biased
qkv/o projections, and a biased untied lm head.

Routing (inference path of HF sparsemixer, deterministic): expert 1 =
argmax(scores) with weight softmax(scores masked where
(max-s)/max(|s|,max) > 2*jitter_eps)[argmax]; expert 2 = the same
procedure on scores with expert 1 removed.

Long/short rope selection is STATIC per compiled program, keyed on the
allocated KV length (see models.phi3 — the same rule, with the mscale
taken from rope_scaling long_mscale/short_mscale instead of computed).
Architecture semantics match HF transformers.models.phimoe
(PhimoeForCausalLM).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import layer_norm as _layer_norm
from .common import linear as _linear


@dataclass(frozen=True)
class PhiMoEConfig:
    n_vocab: int = 32064
    n_ctx: int = 131072
    n_ctx_orig: int = 4096
    n_embd: int = 4096
    n_head: int = 32
    n_head_kv: int = 8
    head_dim: int = 128
    n_layer: int = 32
    n_ff: int = 6400
    n_expert: int = 16
    n_expert_used: int = 2
    router_jitter: float = 0.01
    rope_base: float = 10000.0
    longrope: bool = False
    long_mscale: float = 1.0
    short_mscale: float = 1.0
    eps: float = 1e-5


def config_from_gguf(g: GGUFFile) -> PhiMoEConfig:
    md = g.metadata
    a = "phimoe"
    n_head = int(md[f"{a}.attention.head_count"])
    n_embd = int(md[f"{a}.embedding_length"])
    n_ctx = int(md[f"{a}.context_length"])
    return PhiMoEConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 32064)),
        n_ctx=n_ctx,
        n_ctx_orig=int(md.get(f"{a}.rope.scaling.original_context_length", n_ctx)),
        n_embd=n_embd,
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        head_dim=int(md.get(f"{a}.attention.key_length", n_embd // n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_expert=int(md[f"{a}.expert_count"]),
        n_expert_used=int(md[f"{a}.expert_used_count"]),
        router_jitter=float(md.get(f"{a}.router_jitter", 0.01)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        longrope="rope_factors_long.weight" in g.tensors,
        long_mscale=float(md.get(f"{a}.rope.scaling.long_mscale", 1.0)),
        short_mscale=float(md.get(f"{a}.rope.scaling.short_mscale", 1.0)),
        eps=float(md.get(f"{a}.attention.layer_norm_epsilon", 1e-5)),
    )


def init_cache(cfg: PhiMoEConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head_kv, max_seq,
                            cfg.head_dim, dtype)


def _rope_phimoe(x, positions, cfg: PhiMoEConfig, factors, mscale):
    """rotate-half rope with optional per-dim divisors and explicit mscale
    (x (b,t,h,d))."""
    d = x.shape[-1]
    half = d // 2
    base_pow = (cfg.rope_base ** (np.arange(half, dtype=np.float64) / half)
                ).astype(np.float32)
    inv_freq = (1.0 / (factors.astype(jnp.float32) * base_pow)
                if factors is not None else 1.0 / base_pow)
    theta = positions.astype(jnp.float32)[..., None] * inv_freq
    cos = (jnp.cos(theta) * mscale)[:, :, None, :]
    sin = (jnp.sin(theta) * mscale)[:, :, None, :]
    x0, x1 = x[..., :half], x[..., half:]
    return jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)


def sparsemixer_top2_gates(scores, jitter_eps: float):
    """Deterministic (inference) sparsemixer: returns dense gate weights
    (..., E) with exactly two nonzeros per row."""
    s = scores.astype(jnp.float32)
    E = s.shape[-1]

    def pick(sc, base):
        """One sparsemixer selection round over `sc` (argmax source), with
        the threshold mask computed against the ORIGINAL scores `base`."""
        m = sc.max(axis=-1, keepdims=True)
        idx = sc.argmax(axis=-1)
        factor = jnp.maximum(jnp.abs(base), m)
        mask = ((m - base) / factor) > (2 * jitter_eps)
        gates = jax.nn.softmax(jnp.where(mask, -jnp.inf, sc), axis=-1)
        wt = jnp.take_along_axis(gates, idx[..., None], axis=-1)[..., 0]
        return idx, wt

    idx1, w1 = pick(s, s)
    s2 = jnp.where(jax.nn.one_hot(idx1, E, dtype=bool), -jnp.inf, s)
    idx2, w2 = pick(s2, s)
    dense = (jax.nn.one_hot(idx1, E, dtype=jnp.float32) * w1[..., None]
             + jax.nn.one_hot(idx2, E, dtype=jnp.float32) * w2[..., None])
    return dense


def forward(params: dict, cfg: PhiMoEConfig, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    from .llama import moe_expert_sum

    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    dt = x.dtype
    rep = cfg.n_head // cfg.n_head_kv
    hd = cfg.head_dim
    scale = hd ** -0.5
    factors, mscale = None, 1.0
    if cfg.longrope:  # static long/short by allocated context (phi3 rule)
        long = max_seq > cfg.n_ctx_orig
        factors = params["rope_factors_long.weight" if long
                         else "rope_factors_short.weight"]
        mscale = cfg.long_mscale if long else cfg.short_mscale

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _layer_norm(x, params[pre + "attn_norm.weight"],
                        params[pre + "attn_norm.bias"], cfg.eps)
        q = _linear(h, params[pre + "attn_q.weight"], params.get(pre + "attn_q.bias"))
        k = _linear(h, params[pre + "attn_k.weight"], params.get(pre + "attn_k.bias"))
        v = _linear(h, params[pre + "attn_v.weight"], params.get(pre + "attn_v.bias"))
        q = q.reshape(b, t, cfg.n_head, hd)
        k = k.reshape(b, t, cfg.n_head_kv, hd)
        v = v.reshape(b, t, cfg.n_head_kv, hd)

        q = _rope_phimoe(q, positions, cfg, factors, mscale).transpose(0, 2, 1, 3)
        k = _rope_phimoe(k, positions, cfg, factors, mscale).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        qg = q.reshape(b, cfg.n_head_kv, rep, t, hd)
        att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                         kc.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
        kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
        q_pos = positions[:, None, None, :, None]
        att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)
        out = out.reshape(b, cfg.n_head, t, hd).transpose(0, 2, 1, 3)
        attn_out = _linear(out.reshape(b, t, cfg.n_head * hd).astype(dt),
                           params[pre + "attn_output.weight"],
                           params.get(pre + "attn_output.bias"))
        x = x + attn_out

        h = _layer_norm(x, params[pre + "ffn_norm.weight"],
                        params[pre + "ffn_norm.bias"], cfg.eps)
        router = _linear(h, params[pre + "ffn_gate_inp.weight"])
        gates = sparsemixer_top2_gates(router, cfg.router_jitter).astype(h.dtype)
        x = x + moe_expert_sum(h, params[pre + "ffn_gate_exps.weight"],
                               params[pre + "ffn_up_exps.weight"],
                               params[pre + "ffn_down_exps.weight"], gates)

    x = _layer_norm(x, params["output_norm.weight"], params["output_norm.bias"],
                    cfg.eps)
    logits = _linear(x, params["output.weight"], params.get("output.bias"))
    return logits, tuple(new_cache)


class PhiMoE:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: PhiMoEConfig, max_seq: int = 2048,
                 batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_seq = max_seq
        self.batch = batch

        self._step = jax.jit(
            lambda p, tok, pos, cache, clen: forward(p, cfg, tok, pos, cache, clen),
            donate_argnums=(3,))

        def decode_loop(params, cache, first_token, n_past, steps_tokens):
            def body(carry, _):
                cache, tok, n_past = carry
                pos0 = jnp.full((tok.shape[0],), n_past, jnp.int32)
                logits, cache = forward(params, cfg, tok, pos0, cache, n_past)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
                return (cache, nxt, n_past + 1), nxt[:, 0]

            (cache, tok, n_past), toks = jax.lax.scan(
                body, (cache, first_token, n_past), steps_tokens)
            return cache, toks

        self._decode_loop = jax.jit(decode_loop, donate_argnums=(1,))

    @classmethod
    def from_gguf(cls, path, dtype=jnp.float32, keep_quantized: bool = False, **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        return cls(load_params(g, dtype, keep_quantized=keep_quantized),
                   config_from_gguf(g), **kw)

    def new_cache(self, dtype=jnp.bfloat16):
        return init_cache(self.cfg, self.batch, self.max_seq, dtype)

    def prefill(self, cache, tokens: np.ndarray):
        tokens = np.asarray(tokens)
        logits, cache = self._step(self.params, jnp.asarray(tokens),
                                   jnp.zeros((tokens.shape[0],), jnp.int32),
                                   cache, jnp.int32(0))
        return logits[:, -1, :], cache, tokens.shape[1]

    def decode_greedy(self, cache, first_token, n_past: int, n_tokens: int):
        cache, toks = self._decode_loop(
            self.params, cache, jnp.asarray(first_token), jnp.int32(n_past),
            jnp.zeros((n_tokens,), jnp.int32))
        return cache, np.asarray(toks)

    def generate(self, prompt_tokens: np.ndarray, n_tokens: int, sampler=None,
                 key=None):
        from .common import generate

        return generate(self, prompt_tokens, n_tokens, sampler=sampler, key=key)
