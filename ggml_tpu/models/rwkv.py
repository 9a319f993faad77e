"""RWKV v4 family (HF arch 'rwkv', BlinkDL RWKV-4) — the attention-free
linear-time RNN transformer: time-mixing blocks run the max-stabilized
WKV recurrence (per-channel decay w and bonus u over exp(k)-weighted
values) on token-shift lerped k/v/r, channel-mixing blocks square-ReLU a
token-shift lerped key under a sigmoid receptance gate.  State per layer
is O(1): two token-shift vectors + the (num, den, max) WKV accumulators
— the same recurrent-serving shape as models.mamba.

The WKV recurrence is this family's analog of the reference's fused
rwkv_wkv6 op (include/ggml.h:1875, GGML_OP_RWKV_WKV6 — v6's evolution of
this recurrence); v4 needs the log-sum-exp stabilized form, implemented
here as a `lax.scan` in f32 (HF rwkv_linear_attention_cpu is the
reference semantics, looped per token in Python).

HF's fp16 rescale trick (rescale_every: divide output/value weights by
2^(layer//k) and halve the hidden stream every k layers) is an exact
no-op in real arithmetic — this implementation runs the unrescaled math
(bf16/f32 have fp32 exponent range on TPU), which matches HF eval at
rescale_every=0 exactly and real checkpoints up to fp rounding.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import layer_norm as _layer_norm
from .common import linear as _linear


@dataclass(frozen=True)
class RWKVConfig:
    n_vocab: int = 50277
    n_ctx: int = 1024
    n_embd: int = 768
    n_attn: int = 768  # attention_hidden_size
    n_ff: int = 3072
    n_layer: int = 12
    eps: float = 1e-5


def config_from_gguf(g: GGUFFile) -> RWKVConfig:
    md = g.metadata
    a = "rwkv"
    n_embd = int(md[f"{a}.embedding_length"])
    return RWKVConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 50277)),
        n_ctx=int(md.get(f"{a}.context_length", 1024)),
        n_embd=n_embd,
        n_attn=int(md.get(f"{a}.attention_hidden_size", n_embd)),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_layer=int(md[f"{a}.block_count"]),
        eps=float(md.get(f"{a}.attention.layer_norm_epsilon", 1e-5)),
    )


def init_state(cfg: RWKVConfig, batch: int, dtype=jnp.float32):
    """Per-layer: (attn token-shift, ffn token-shift, wkv num, wkv den,
    wkv max).  max starts at -1e38 (empty log-sum-exp)."""
    return tuple(
        (
            jnp.zeros((batch, cfg.n_embd), dtype),
            jnp.zeros((batch, cfg.n_embd), dtype),
            jnp.zeros((batch, cfg.n_attn), jnp.float32),
            jnp.zeros((batch, cfg.n_attn), jnp.float32),
            jnp.full((batch, cfg.n_attn), -1e38, jnp.float32),
        )
        for _ in range(cfg.n_layer)
    )


def _token_shift(h, shift_state):
    """Previous token's hidden per position (0/state before the first)."""
    prev = jnp.concatenate([shift_state[:, None, :].astype(h.dtype),
                            h[:, :-1, :]], axis=1)
    return prev, h[:, -1, :]


def wkv4(w, u, k, v, num, den, mx):
    """Max-stabilized WKV recurrence over k/v (b, t, A); w = -exp(time_decay),
    u = time_first; carries (num, den, max).  Returns (out (b,t,A), state)."""
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    def step(carry, kv):
        num, den, mx = carry
        ck, cv = kv
        m_out = jnp.maximum(mx, ck + u)
        e1 = jnp.exp(mx - m_out)
        e2 = jnp.exp(ck + u - m_out)
        out = (e1 * num + e2 * cv) / (e1 * den + e2)
        m_st = jnp.maximum(mx + w, ck)
        e1 = jnp.exp(mx + w - m_st)
        e2 = jnp.exp(ck - m_st)
        return (e1 * num + e2 * cv, e1 * den + e2, m_st), out

    (num, den, mx), out = jax.lax.scan(
        step, (num, den, mx), (kf.swapaxes(0, 1), vf.swapaxes(0, 1)))
    return out.swapaxes(0, 1), (num, den, mx)


def forward(params: dict, cfg: RWKVConfig, tokens, state):
    """tokens (B, T) + per-layer state -> (logits, new_state); serves both
    prefill (fresh state) and decode (T=1 carrying state)."""
    b, t = tokens.shape
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    new_state = list(state)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        if i == 0:
            x = _layer_norm(x, params[pre + "pre_norm.weight"],
                            params[pre + "pre_norm.bias"], cfg.eps)
        attn_shift, ffn_shift, num, den, mx = new_state[i]

        # --- time mixing (WKV attention) ---
        h = _layer_norm(x, params[pre + "attn_norm.weight"],
                        params[pre + "attn_norm.bias"], cfg.eps)
        prev, new_attn_shift = _token_shift(h, attn_shift)
        mix_k = params[pre + "rwkv_mix_k"]
        mix_v = params[pre + "rwkv_mix_v"]
        mix_r = params[pre + "rwkv_mix_r"]
        k = _linear(h * mix_k + prev * (1 - mix_k), params[pre + "rwkv_key.weight"])
        v = _linear(h * mix_v + prev * (1 - mix_v), params[pre + "rwkv_value.weight"])
        r = jax.nn.sigmoid(_linear(h * mix_r + prev * (1 - mix_r),
                                   params[pre + "rwkv_receptance.weight"]))
        w = -jnp.exp(params[pre + "rwkv_time_decay"].astype(jnp.float32))
        u = params[pre + "rwkv_time_first"].astype(jnp.float32)
        wkv, (num, den, mx) = wkv4(w, u, k, v, num, den, mx)
        x = x + _linear(r * wkv.astype(r.dtype), params[pre + "rwkv_output.weight"])

        # --- channel mixing ---
        h = _layer_norm(x, params[pre + "ffn_norm.weight"],
                        params[pre + "ffn_norm.bias"], cfg.eps)
        prev, new_ffn_shift = _token_shift(h, ffn_shift)
        fmix_k = params[pre + "rwkv_ffn_mix_k"]
        fmix_r = params[pre + "rwkv_ffn_mix_r"]
        kk = _linear(h * fmix_k + prev * (1 - fmix_k),
                     params[pre + "rwkv_ffn_key.weight"])
        kk = jnp.square(jax.nn.relu(kk))
        rr = jax.nn.sigmoid(_linear(h * fmix_r + prev * (1 - fmix_r),
                                    params[pre + "rwkv_ffn_receptance.weight"]))
        x = x + rr * _linear(kk, params[pre + "rwkv_ffn_value.weight"])

        new_state[i] = (new_attn_shift.astype(attn_shift.dtype),
                        new_ffn_shift.astype(ffn_shift.dtype), num, den, mx)

    x = _layer_norm(x, params["output_norm.weight"], params["output_norm.bias"],
                    cfg.eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    return _linear(x, w_out), tuple(new_state)


class RWKV:
    """Inference wrapper: O(1)-state decode via a jitted lax.scan loop
    (recurrent-family signature — see models.mamba.Mamba)."""

    def __init__(self, params: dict, cfg: RWKVConfig, batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.batch = batch

        def step(params, tokens, state):
            return forward(params, cfg, tokens, state)

        self._step = jax.jit(step, donate_argnums=(2,))

        def decode_loop(params, state, first_token, steps_tokens):
            def body(carry, _):
                state, tok = carry
                logits, state = forward(params, cfg, tok, state)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
                return (state, nxt), nxt[:, 0]

            (state, tok), toks = jax.lax.scan(body, (state, first_token),
                                              steps_tokens)
            return state, toks

        self._decode_loop = jax.jit(decode_loop, donate_argnums=(1,))

    @classmethod
    def from_gguf(cls, path, dtype=jnp.float32, keep_quantized: bool = False, **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        return cls(load_params(g, dtype, keep_quantized=keep_quantized),
                   config_from_gguf(g), **kw)

    def new_state(self, dtype=jnp.float32):
        return init_state(self.cfg, self.batch, dtype)

    def prefill(self, state, tokens: np.ndarray):
        logits, state = self._step(self.params, jnp.asarray(tokens), state)
        return logits[:, -1, :], state

    def decode_greedy(self, state, first_token, n_tokens: int):
        state, toks = self._decode_loop(self.params, state,
                                        jnp.asarray(first_token),
                                        jnp.zeros((n_tokens,), jnp.int32))
        return state, np.asarray(toks)

    def generate(self, prompt_tokens: np.ndarray, n_tokens: int):
        state = self.new_state()
        logits, state = self.prefill(state, np.asarray(prompt_tokens, np.int32))
        first = np.argmax(np.asarray(logits), -1).astype(np.int32)[:, None]
        state, toks = self.decode_greedy(state, first, n_tokens - 1)
        return [int(first[0, 0])] + [int(x) for x in toks.reshape(-1)]
