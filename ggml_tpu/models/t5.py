"""T5 family (llama.cpp arch 't5') — the encoder-decoder modality:
bidirectional encoder + causal decoder with CROSS-attention, relative
position-bucket attention bias (no RoPE, no learned positions), T5
RMSNorm (no bias, no (1+w)), UNSCALED attention logits (no 1/sqrt(d)),
bias-free projections, relu or gated-gelu FFN, and a d_model^-0.5-scaled
tied lm head.

Architecture semantics match HF transformers.models.t5
(T5ForConditionalGeneration).  llama.cpp tensor names are used:
enc.blk.N.* / dec.blk.N.* stacks, attn_rel_b on block 0 of each stack
(shared by all blocks), dec.blk.N.cross_attn_{q,k,v,o}, enc/dec
output_norm.

TPU notes: encode once -> cross K/V precomputed per layer; decode is the
usual jitted lax.scan with a donated self-attn KV cache; the relative
bias at decode position p is a gather over precomputed buckets (static
shapes, no recompile per step).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import linear as _linear


@dataclass(frozen=True)
class T5Config:
    n_vocab: int = 32128
    n_ctx: int = 512
    n_embd: int = 512  # d_model
    n_head: int = 8
    head_dim: int = 64  # d_kv: NOT tied to n_embd // n_head in T5
    n_layer: int = 6  # encoder == decoder depth
    n_ff: int = 2048
    rel_buckets: int = 32
    rel_max_dist: int = 128
    eps: float = 1e-6
    gated_act: bool = False  # v1.1 gated-gelu vs classic relu
    tie_lm_head: bool = True  # lm head = embedding * d_model^-0.5

    @property
    def inner_dim(self):
        return self.n_head * self.head_dim


def config_from_gguf(g: GGUFFile) -> T5Config:
    md = g.metadata
    a = "t5"
    return T5Config(
        n_vocab=int(md.get(f"{a}.vocab_size", 32128)),
        n_ctx=int(md.get(f"{a}.context_length", 512)),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=int(md[f"{a}.attention.head_count"]),
        head_dim=int(md.get(f"{a}.attention.key_length",
                            int(md[f"{a}.embedding_length"])
                            // int(md[f"{a}.attention.head_count"]))),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        rel_buckets=int(md.get(f"{a}.attention.relative_buckets_count", 32)),
        rel_max_dist=int(md.get(f"{a}.attention.relative_max_distance", 128)),
        eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)),
        gated_act=bool(md.get(f"{a}.feed_forward_gated", False)),
        tie_lm_head="output.weight" not in g.tensors,
    )


def _rms_norm_t5(x, w, eps):
    """T5LayerNorm: rms over f32, multiply by w (no mean sub, no bias)."""
    xf = x.astype(jnp.float32)
    v = jnp.mean(xf ** 2, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(v + eps)).astype(x.dtype) * w


def _rel_bucket(rel_pos, bidirectional: bool, num_buckets: int, max_dist: int):
    """HF T5Attention._relative_position_bucket.  rel_pos = key - query."""
    ret = jnp.zeros_like(rel_pos)
    n = rel_pos
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(-n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_dist / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, n, large)


def _rel_bias(rel_b, q_pos, k_pos, bidirectional: bool, cfg: T5Config):
    """rel_b (rel_buckets, n_head); q_pos (q,), k_pos (k,) ->
    bias (1, n_head, q, k)."""
    rel = k_pos[None, :] - q_pos[:, None]
    bucket = _rel_bucket(rel, bidirectional, cfg.rel_buckets, cfg.rel_max_dist)
    return rel_b[bucket].transpose(2, 0, 1)[None]  # (1, h, q, k)


def _attn(q, k, v, bias):
    """T5 attention: UNSCALED logits + additive bias, fp32 softmax.
    q (b,h,t,d), k/v (b,h,s,d), bias (b|1,h,t,s) -> (b,h,t,d)."""
    att = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                     k.astype(jnp.float32),
                     preferred_element_type=jnp.float32) + bias
    att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)


def _heads(z, b, t, cfg):
    return z.reshape(b, t, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)


def _unheads(z, b, t, cfg):
    return z.transpose(0, 2, 1, 3).reshape(b, t, cfg.inner_dim)


def _ffn(x, params, pre, cfg):
    if cfg.gated_act:  # v1.1: gelu(wi_0) * wi_1
        gate = _linear(x, params[pre + "ffn_gate.weight"])
        up = _linear(x, params[pre + "ffn_up.weight"])
        h = jax.nn.gelu(gate, approximate=True) * up
    else:  # classic: relu(wi)
        h = jax.nn.relu(_linear(x, params[pre + "ffn_up.weight"]))
    return _linear(h, params[pre + "ffn_down.weight"])


def encode(params: dict, cfg: T5Config, tokens, attn_mask=None):
    """Encoder stack: tokens (b, t) -> hidden (b, t, n_embd).
    attn_mask (b, t) 1=real/0=pad."""
    b, t = tokens.shape
    x = params["token_embd.weight"][tokens]
    rel_b = params["enc.blk.0.attn_rel_b.weight"]  # shared across blocks
    pos = jnp.arange(t)
    bias = _rel_bias(rel_b, pos, pos, True, cfg)
    if attn_mask is not None:
        bias = bias + jnp.where(attn_mask > 0.5, 0.0, -jnp.inf)[:, None, None, :]

    for i in range(cfg.n_layer):
        pre = f"enc.blk.{i}."
        h = _rms_norm_t5(x, params[pre + "attn_norm.weight"], cfg.eps)
        q = _heads(_linear(h, params[pre + "attn_q.weight"]), b, t, cfg)
        k = _heads(_linear(h, params[pre + "attn_k.weight"]), b, t, cfg)
        v = _heads(_linear(h, params[pre + "attn_v.weight"]), b, t, cfg)
        o = _unheads(_attn(q, k, v, bias), b, t, cfg)
        x = x + _linear(o, params[pre + "attn_o.weight"])
        h = _rms_norm_t5(x, params[pre + "ffn_norm.weight"], cfg.eps)
        x = x + _ffn(h, params, pre, cfg)
    return _rms_norm_t5(x, params["enc.output_norm.weight"], cfg.eps)


def cross_kv(params: dict, cfg: T5Config, enc_hidden):
    """Precompute per-layer cross-attention K/V from encoder output
    (one-time cost per request — the decoder reuses them every step)."""
    b, s, _ = enc_hidden.shape
    out = []
    for i in range(cfg.n_layer):
        pre = f"dec.blk.{i}."
        k = _heads(_linear(enc_hidden, params[pre + "cross_attn_k.weight"]), b, s, cfg)
        v = _heads(_linear(enc_hidden, params[pre + "cross_attn_v.weight"]), b, s, cfg)
        out.append((k, v))
    return tuple(out)


def init_cache(cfg: T5Config, batch: int, max_seq: int, dtype=jnp.float32):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head, max_seq,
                            cfg.head_dim, dtype)


def decode_step(params: dict, cfg: T5Config, tokens, pos_start, cache,
                cache_len, xkv, enc_mask=None):
    """Decoder forward over t tokens against a populated self-attn cache +
    precomputed cross K/V.  Returns (logits (b, t, vocab), new_cache)."""
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]  # (b, t)
    x = params["token_embd.weight"][tokens]
    rel_b = params["dec.blk.0.attn_rel_b.weight"]

    # causal self-attn bias over the static cache window, per batch row
    # (vmap the (q, k) bias over per-row positions)
    k_pos = jnp.arange(max_seq)
    bias_qk = jax.vmap(
        lambda qp: _rel_bias(rel_b, qp, k_pos, False, cfg)[0]
    )(positions)  # (b, h, t, max_seq)
    causal = positions[:, None, :, None] >= k_pos[None, None, None, :]
    self_bias = jnp.where(causal, bias_qk, -jnp.inf)

    xbias = 0.0
    if enc_mask is not None:
        xbias = jnp.where(enc_mask > 0.5, 0.0, -jnp.inf)[:, None, None, :]

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"dec.blk.{i}."
        h = _rms_norm_t5(x, params[pre + "attn_norm.weight"], cfg.eps)
        q = _heads(_linear(h, params[pre + "attn_q.weight"]), b, t, cfg)
        k = _heads(_linear(h, params[pre + "attn_k.weight"]), b, t, cfg)
        v = _heads(_linear(h, params[pre + "attn_v.weight"]), b, t, cfg)
        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)
        o = _unheads(_attn(q, kc, vc, self_bias), b, t, cfg)
        x = x + _linear(o, params[pre + "attn_o.weight"])

        h = _rms_norm_t5(x, params[pre + "cross_attn_norm.weight"], cfg.eps)
        qx = _heads(_linear(h, params[pre + "cross_attn_q.weight"]), b, t, cfg)
        ox = _unheads(_attn(qx, xkv[i][0], xkv[i][1], xbias), b, t, cfg)
        x = x + _linear(ox, params[pre + "cross_attn_o.weight"])

        h = _rms_norm_t5(x, params[pre + "ffn_norm.weight"], cfg.eps)
        x = x + _ffn(h, params, pre, cfg)

    x = _rms_norm_t5(x, params["dec.output_norm.weight"], cfg.eps)
    if cfg.tie_lm_head:
        # tied head is scaled by d_model^-0.5 (HF tie_word_embeddings)
        logits = _linear(x * (cfg.n_embd ** -0.5), params["token_embd.weight"])
    else:
        logits = _linear(x, params["output.weight"])
    return logits, tuple(new_cache)


class T5:
    """Seq2seq wrapper: jitted encode + on-device greedy decode loop."""

    def __init__(self, params: dict, cfg: T5Config, max_seq: int = 256,
                 batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_seq = max_seq
        self.batch = batch

        self._encode = jax.jit(lambda p, t, m: encode(p, cfg, t, m))
        self._xkv = jax.jit(lambda p, h: cross_kv(p, cfg, h))
        self._step = jax.jit(
            lambda p, tok, pos, cache, clen, xkv, em:
            decode_step(p, cfg, tok, pos, cache, clen, xkv, em),
            donate_argnums=(3,),
        )

        def decode_loop(params, cache, first_token, n_past, xkv, enc_mask,
                        steps_tokens):
            def body(carry, _):
                cache, tok, n_past = carry
                pos0 = jnp.full((tok.shape[0],), n_past, jnp.int32)
                logits, cache = decode_step(params, cfg, tok, pos0, cache,
                                            n_past, xkv, enc_mask)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
                return (cache, nxt, n_past + 1), nxt[:, 0]

            (cache, tok, n_past), toks = jax.lax.scan(
                body, (cache, first_token, n_past), steps_tokens
            )
            return cache, toks

        self._decode_loop = jax.jit(decode_loop, donate_argnums=(1,))

    @classmethod
    def from_gguf(cls, path, dtype=jnp.float32, **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        return cls(load_params(g, dtype), config_from_gguf(g), **kw)

    def generate(self, input_tokens: np.ndarray, n_tokens: int,
                 decoder_start_id: int = 0, eos_id: int | None = 1,
                 enc_mask: np.ndarray | None = None):
        """Greedy seq2seq generation: encode once, decode on device."""
        input_tokens = np.asarray(input_tokens, np.int32)
        b = input_tokens.shape[0]
        em = (jnp.asarray(enc_mask, jnp.float32) if enc_mask is not None
              else jnp.ones(input_tokens.shape, jnp.float32))
        enc = self._encode(self.params, jnp.asarray(input_tokens), em)
        xkv = self._xkv(self.params, enc)
        cache = init_cache(self.cfg, b, self.max_seq, jnp.float32)
        start = jnp.full((b, 1), decoder_start_id, jnp.int32)
        cache, toks = self._decode_loop(
            self.params, cache, start, jnp.int32(0), xkv, em,
            jnp.zeros((n_tokens,), jnp.int32),
        )
        out = [int(x) for x in np.asarray(toks).reshape(-1)]
        if eos_id is not None and eos_id in out:
            out = out[: out.index(eos_id) + 1]
        return out
