"""LFM2 family (llama.cpp arch 'lfm2', Liquid Foundation Model 2) — the
gated short-convolution hybrid: most layers run a multiplicative-gated
depthwise causal conv (in_proj -> B, C, x; conv(B*x); out = C ⊙ conv),
with periodic full GQA attention layers carrying per-head q/k RMSNorm
(qwen3-style) and llama rope; SwiGLU MLP, final embedding norm, tied lm
head.  Architecture semantics match HF transformers.models.lfm2
(Lfm2ForCausalLM slow path).

The conv reuses ops.ssm_conv (golden-gated vs GGML_OP_SSM_CONV,
include/ggml.h:1811); the mixed per-layer cache and exact-length engine
prefill follow models.bamba.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from ..ops import core as O
from .common import cache_write as _cache_write
from .common import linear as _linear
from .llama import _rms_norm, _rope_half


@dataclass(frozen=True)
class LFM2Config:
    n_vocab: int = 65536
    n_ctx: int = 128000
    n_embd: int = 2560
    n_head: int = 32
    n_head_kv: int = 8
    n_layer: int = 32
    n_ff: int = 8192
    head_dim: int = 80
    rope_base: float = 1e6
    rms_eps: float = 1e-5
    attn_layers: tuple = ()  # full-attention layer indices; rest short-conv
    l_cache: int = 3  # short conv width


def config_from_gguf(g: GGUFFile) -> LFM2Config:
    md = g.metadata
    a = "lfm2"
    n_head = int(md[f"{a}.attention.head_count"])
    n_embd = int(md[f"{a}.embedding_length"])
    return LFM2Config(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=n_embd,
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        head_dim=int(md.get(f"{a}.attention.key_length", n_embd // n_head)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 1e6)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        attn_layers=tuple(int(i) for i in md.get(f"{a}.attention.layer_indices", ())),
        l_cache=int(md[f"{a}.shortconv.l_cache"]),
    )


def init_cache(cfg: LFM2Config, batch: int, max_seq: int, dtype=jnp.bfloat16):
    """Mixed per-layer state: (k, v) on attention layers, a (conv window,)
    singleton tuple on short-conv layers (trailing l_cache-1 gated inputs)."""
    layers = []
    for i in range(cfg.n_layer):
        if i in cfg.attn_layers:
            mk = lambda: jnp.zeros((batch, cfg.n_head_kv, max_seq, cfg.head_dim),
                                   dtype)
            layers.append((mk(), mk()))
        else:
            layers.append(
                (jnp.zeros((batch, cfg.n_embd, cfg.l_cache - 1), jnp.float32),))
    return tuple(layers)


def _conv_layer(params, cfg: LFM2Config, pre, h, state):
    """Gated short conv: in_proj -> (B, C, x); y = C ⊙ conv1d(B ⊙ x)."""
    bcx = _linear(h, params[pre + "shortconv_in.weight"],
                  params.get(pre + "shortconv_in.bias"))
    Bg, Cg, x = jnp.split(bcx, 3, axis=-1)
    bx = Bg * x

    (conv_state,) = state
    sx = jnp.concatenate([conv_state.astype(bx.dtype),
                          jnp.swapaxes(bx, 1, 2)], axis=2)
    new_conv = sx[:, :, -(cfg.l_cache - 1):]
    conv = O.ssm_conv(sx, params[pre + "shortconv_conv.weight"])
    if pre + "shortconv_conv.bias" in params:
        conv = conv + params[pre + "shortconv_conv.bias"]

    out = _linear(Cg * conv, params[pre + "shortconv_out.weight"],
                  params.get(pre + "shortconv_out.bias"))
    return out, (new_conv.astype(conv_state.dtype),)


def _attn_layer(params, cfg: LFM2Config, pre, h, state, positions, cache_len,
                max_seq):
    """GQA with per-head q/k RMSNorm applied before rope (Lfm2Attention)."""
    b, t = h.shape[:2]
    hd = cfg.head_dim
    rep = cfg.n_head // cfg.n_head_kv
    dt_ = h.dtype
    q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, t, cfg.n_head, hd)
    k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    q = _rms_norm(q, params[pre + "attn_q_norm.weight"], cfg.rms_eps)
    k = _rms_norm(k, params[pre + "attn_k_norm.weight"], cfg.rms_eps)
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


def forward(params: dict, cfg: LFM2Config, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    max_seq = next(cache[i][0].shape[-2] for i in range(cfg.n_layer)
                   if i in cfg.attn_layers)
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
        if i in cfg.attn_layers:
            out, new_cache[i] = _attn_layer(params, cfg, pre, h, new_cache[i],
                                            positions, cache_len, max_seq)
        else:
            out, new_cache[i] = _conv_layer(params, cfg, pre, h, new_cache[i])
        x = x + out

        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        gate = _linear(h, params[pre + "ffn_gate.weight"])
        up = _linear(h, params[pre + "ffn_up.weight"])
        x = x + _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"])

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class LFM2:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: LFM2Config, max_seq: int = 2048,
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
