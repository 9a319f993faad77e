"""Chameleon family (Meta Chameleon-7B/30B, HF arch 'chameleon', text
path) — llama-shaped GQA decoder with PER-HEAD-AFFINE q/k LayerNorm
(weight/bias shaped (heads, head_dim): stats over head_dim, each head
its own gamma/beta — ChameleonLayerNorm) applied before rope, SwiGLU
MLP, and two residual layouts: standard pre-norm, or the 30B "swin"
POST-norm (x += norm(block(x))).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import init_layer_cache
from .common import layer_norm as _layer_norm
from .common import linear as _linear
from .llama import _rms_norm, _rope_half


@dataclass(frozen=True)
class ChameleonConfig:
    n_vocab: int = 65536
    n_ctx: int = 4096
    n_embd: int = 4096
    n_head: int = 32
    n_head_kv: int = 32
    n_layer: int = 32
    n_ff: int = 11008
    rope_base: float = 10000.0
    rms_eps: float = 1e-5
    ln_eps: float = 1e-5  # qk LayerNorm epsilon (torch default)
    swin_norm: bool = False  # post-norm residuals (30B)

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def config_from_gguf(g: GGUFFile) -> ChameleonConfig:
    md = g.metadata
    a = "chameleon"
    n_head = int(md[f"{a}.attention.head_count"])
    return ChameleonConfig(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        swin_norm=bool(md.get(f"{a}.swin_norm", False)),
    )


def init_cache(cfg: ChameleonConfig, batch: int, max_seq: int,
               dtype=jnp.bfloat16):
    return init_layer_cache(cfg.n_layer, batch, cfg.n_head_kv, max_seq,
                            cfg.head_dim, dtype)


def _attn(params, cfg: ChameleonConfig, pre, h, state, positions, cache_len,
          max_seq):
    b, t = h.shape[:2]
    hd = cfg.head_dim
    rep = cfg.n_head // cfg.n_head_kv
    dt_ = h.dtype
    q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, t, cfg.n_head, hd)
    k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    # per-head-affine LayerNorm: weights (H, hd), stats over hd
    q = _layer_norm(q, params[pre + "attn_q_norm.weight"],
                    params[pre + "attn_q_norm.bias"], cfg.ln_eps)
    k = _layer_norm(k, params[pre + "attn_k_norm.weight"],
                    params[pre + "attn_k_norm.bias"], cfg.ln_eps)
    q = _rope_half(q, positions, cfg.rope_base).transpose(0, 2, 1, 3)
    k = _rope_half(k, positions, cfg.rope_base).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    cache_dtype = state[0].dtype
    kc = _cache_write(state[0], k.astype(cache_dtype), cache_len)
    vc = _cache_write(state[1], v.astype(cache_dtype), cache_len)

    qg = q.reshape(b, cfg.n_head_kv, rep, t, hd)
    att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                     kc.astype(jnp.float32),
                     preferred_element_type=jnp.float32) * (hd ** -0.5)
    kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
    q_pos = positions[:, None, None, :, None]
    att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
    out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)
    out = out.reshape(b, cfg.n_head, t, hd).transpose(0, 2, 1, 3)
    out = _linear(out.reshape(b, t, cfg.n_head * hd).astype(dt_),
                  params[pre + "attn_output.weight"])
    return out, (kc, vc)


def _mlp(params, pre, h):
    gate = _linear(h, params[pre + "ffn_gate.weight"])
    up = _linear(h, params[pre + "ffn_up.weight"])
    return _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"])


def forward(params: dict, cfg: ChameleonConfig, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    max_seq = cache[0][0].shape[-2]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        if cfg.swin_norm:  # post-norm: x += norm(block(x))
            out, new_cache[i] = _attn(params, cfg, pre, x, new_cache[i],
                                      positions, cache_len, max_seq)
            x = x + _rms_norm(out, params[pre + "attn_norm.weight"], cfg.rms_eps)
            x = x + _rms_norm(_mlp(params, pre, x),
                              params[pre + "ffn_norm.weight"], cfg.rms_eps)
        else:
            h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
            out, new_cache[i] = _attn(params, cfg, pre, h, new_cache[i],
                                      positions, cache_len, max_seq)
            x = x + out
            h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
            x = x + _mlp(params, pre, h)

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class Chameleon:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: ChameleonConfig, max_seq: int = 2048,
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
