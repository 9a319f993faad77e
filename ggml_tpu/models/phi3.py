"""Phi-3 / Phi-3.5 / Phi-4 family (llama.cpp arch 'phi3') — llama-style
pre-norm GQA decoder with LongRoPE context extension and an optional
uniform sliding window.

LongRoPE (HF rope_type 'longrope', llama.cpp rope_factors_long/short
tensors): per-dimension frequency divisors — the LONG set when the
sequence exceeds the original training context, the SHORT set otherwise —
with cos/sin scaled by attn_factor =
sqrt(1 + ln(max_ctx/orig_ctx)/ln(orig_ctx)).  The op-level analog
(freq_factors input of rope_ext) is golden-gated in ops/core.

Long/short selection is STATIC per compiled program, keyed on the
allocated KV length (max_seq > n_ctx_orig -> long), the same rule
llama.cpp applies per context; HF instead re-prefills the whole sequence
with long factors the moment generation crosses n_ctx_orig
(Phi3ForCausalLM.prepare_inputs_for_generation drops past_key_values), so
a mixed short/long KV cache never exists in either implementation.  A
static choice keeps the cache consistent and avoids a traced branch; it
matches HF logits exactly whenever the allocation regime agrees with the
sequence regime (tests cover both).

The HF checkpoint fuses qkv_proj and gate_up_proj; the converter splits
them offline into the repo's attn_q/k/v + ffn_gate/ffn_up naming.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import dequant_cache as _dq
from .common import linear as _linear
from .llama import _rms_norm


@dataclass(frozen=True)
class Phi3Config:
    n_vocab: int = 32064
    n_ctx: int = 4096
    n_ctx_orig: int = 4096  # original_max_position_embeddings
    n_embd: int = 3072
    n_head: int = 32
    n_head_kv: int = 32
    head_dim: int = 96
    n_layer: int = 32
    n_ff: int = 8192
    rope_base: float = 10000.0
    rms_eps: float = 1e-5
    sliding_window: int = 0  # 0 = off; else uniform across layers
    longrope: bool = False  # rope_factors_long/short tensors present
    attn_factor: float = 1.0  # cos/sin magnitude correction


def config_from_gguf(g: GGUFFile) -> Phi3Config:
    md = g.metadata
    a = "phi3"
    n_head = int(md[f"{a}.attention.head_count"])
    n_ctx = int(md[f"{a}.context_length"])
    n_ctx_orig = int(md.get(f"{a}.rope.scaling.original_context_length", n_ctx))
    longrope = "rope_factors_long.weight" in g.tensors
    attn_factor = float(md.get(f"{a}.rope.scaling.attn_factor", 0.0))
    if longrope and attn_factor == 0.0:
        attn_factor = (np.sqrt(1.0 + np.log(n_ctx / n_ctx_orig) / np.log(n_ctx_orig))
                       if n_ctx > n_ctx_orig else 1.0)
    return Phi3Config(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_ctx=n_ctx,
        n_ctx_orig=n_ctx_orig,
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        head_dim=int(md.get(f"{a}.attention.key_length",
                            int(md[f"{a}.embedding_length"]) // n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        sliding_window=int(md.get(f"{a}.attention.sliding_window", 0)),
        longrope=longrope,
        attn_factor=attn_factor or 1.0,
    )


def _rope_phi3(x, positions, cfg: Phi3Config, factors):
    """rotate-half rope with LongRoPE per-dim divisors.  x (b, t, h, d);
    factors (d/2,) or None (plain rope)."""
    d = x.shape[-1]
    half = d // 2
    base_pow = (cfg.rope_base ** (np.arange(half, dtype=np.float64) / half)
                ).astype(np.float32)
    if factors is None:
        inv_freq = 1.0 / base_pow
        mscale = 1.0
    else:
        inv_freq = 1.0 / (factors.astype(jnp.float32) * base_pow)
        mscale = cfg.attn_factor
    theta = positions.astype(jnp.float32)[..., None] * inv_freq  # (b, t, d/2)
    cos = (jnp.cos(theta) * mscale)[:, :, None, :]
    sin = (jnp.sin(theta) * mscale)[:, :, None, :]
    x0, x1 = x[..., :half], x[..., half:]
    return jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)


def init_cache(cfg: Phi3Config, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head_kv, max_seq,
                            cfg.head_dim, dtype)


def forward(params: dict, cfg: Phi3Config, tokens, pos_start, cache, cache_len,
            *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    dt = x.dtype
    rep = cfg.n_head // cfg.n_head_kv
    scale = cfg.head_dim ** -0.5
    # static long/short selection by the ALLOCATED context (llama.cpp rule;
    # see module docstring) — max_seq is a compile-time shape
    factors = None
    if cfg.longrope:
        factors = (params["rope_factors_long.weight"]
                   if max_seq > cfg.n_ctx_orig
                   else params["rope_factors_short.weight"])

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
        q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, t, cfg.n_head, cfg.head_dim)
        k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, t, cfg.n_head_kv, cfg.head_dim)
        v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, t, cfg.n_head_kv, cfg.head_dim)

        q = _rope_phi3(q, positions, cfg, factors).transpose(0, 2, 1, 3)
        k = _rope_phi3(k, positions, cfg, factors).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        qg = q.reshape(b, cfg.n_head_kv, rep, t, cfg.head_dim)
        att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                         _dq(kc).astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
        kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
        q_pos = positions[:, None, None, :, None]
        keep = kv_pos <= q_pos
        if cfg.sliding_window:
            keep = keep & (kv_pos > q_pos - cfg.sliding_window)
        att = jnp.where(keep, att, -jnp.inf)
        vcd = _dq(vc)  # q8_kv cache: dequantize on read (XLA fuses the mul)
        att = jax.nn.softmax(att, axis=-1).astype(vcd.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vcd)
        out = out.reshape(b, cfg.n_head, t, cfg.head_dim).transpose(0, 2, 1, 3)
        attn_out = out.reshape(b, t, cfg.n_head * cfg.head_dim).astype(dt)
        x = x + _linear(attn_out, params[pre + "attn_output.weight"])

        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        gate = _linear(h, params[pre + "ffn_gate.weight"])
        up = _linear(h, params[pre + "ffn_up.weight"])
        x = x + _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"])

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class Phi3:
    """Inference wrapper (mirrors models.llama.Llama)."""

    def __init__(self, params: dict, cfg: Phi3Config, max_seq: int = 2048,
                 batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_seq = max_seq
        self.batch = batch

        self._step = jax.jit(
            lambda p, tok, pos, cache, clen:
            forward(p, cfg, tok, pos, cache, clen, prefill=True),
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
    def from_gguf(cls, path, dtype=jnp.float32, keep_quantized: bool = False,
                  **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        return cls(load_params(g, dtype, keep_quantized=keep_quantized),
                   config_from_gguf(g), **kw)

    def new_cache(self, dtype=jnp.bfloat16):
        return init_cache(self.cfg, self.batch, self.max_seq, dtype)

    def prefill(self, cache, tokens: np.ndarray):
        pos0 = jnp.zeros((tokens.shape[0],), jnp.int32)
        logits, cache = self._step(self.params, jnp.asarray(tokens), pos0,
                                   cache, jnp.int32(0))
        return logits[:, -1, :], cache, tokens.shape[1]

    def decode_greedy(self, cache, first_token, n_past: int, n_tokens: int):
        dummy = jnp.zeros((n_tokens,), jnp.int32)
        cache, toks = self._decode_loop(
            self.params, cache, jnp.asarray(first_token), jnp.int32(n_past), dummy)
        return cache, np.asarray(toks)

    def generate(self, prompt_tokens: np.ndarray, n_tokens: int, sampler=None,
                 key=None):
        from .common import generate

        return generate(self, prompt_tokens, n_tokens, sampler=sampler, key=key)
