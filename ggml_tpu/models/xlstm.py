"""xLSTM family (HF arch 'xlstm', NX-AI xLSTM-7B) — the mLSTM recurrence:
per-head matrix memory C (dqk, dv) with vector normalizer N and scalar
log-max stabilizer M, exponential input/forget gating (per-head scalar
preactivations, soft-capped at gate_soft_cap), multi-head LayerNorm and
a sigmoid output gate around the memory readout, gated-silu FFN, final
tanh logit soft cap.

    m' = max(logsigmoid(f) + m, i)
    C' = e^{logsig f + m - m'} C + e^{i - m'} k vᵀ
    N' = e^{logsig f + m - m'} N + e^{i - m'} k
    h  = (q̂ C') / (max(|q̂·N'|, e^{-m'}) + eps),  q̂ = q/sqrt(dqk)

Implemented as an f32 `lax.scan` over tokens — the exact semantics of HF
mlstm_recurrent_step_native (transformers.models.xlstm); HF's chunkwise
kernels are an algebraically-equal reformulation.  O(1) recurrent state
in the mamba serving shape.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import linear as _linear


@dataclass(frozen=True)
class XLSTMConfig:
    n_vocab: int = 50304
    n_ctx: int = 8192
    n_embd: int = 4096
    n_head: int = 8
    n_layer: int = 32
    n_ff: int = 10944
    qk_dim: int = 2048
    v_dim: int = 4096
    eps: float = 1e-6
    gate_softcap: float = 15.0
    out_softcap: float = 30.0
    backend_eps: float = 1e-6  # denominator eps in the readout

    @property
    def dqk(self):
        return self.qk_dim // self.n_head

    @property
    def dv(self):
        return self.v_dim // self.n_head


def config_from_gguf(g: GGUFFile) -> XLSTMConfig:
    md = g.metadata
    a = "xlstm"
    return XLSTMConfig(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=int(md[f"{a}.attention.head_count"]),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        qk_dim=int(md[f"{a}.qk_dim"]),
        v_dim=int(md[f"{a}.v_dim"]),
        eps=float(md.get(f"{a}.attention.layer_norm_epsilon", 1e-6)),
        gate_softcap=float(md.get(f"{a}.gate_softcap", 15.0)),
        out_softcap=float(md.get(f"{a}.output_softcap", 30.0)),
    )


def init_state(cfg: XLSTMConfig, batch: int, dtype=jnp.float32):
    """Per-layer (C, N, M) in f32 (HF keeps the mLSTM state in f32)."""
    return tuple(
        (
            jnp.zeros((batch, cfg.n_head, cfg.dqk, cfg.dv), jnp.float32),
            jnp.zeros((batch, cfg.n_head, cfg.dqk), jnp.float32),
            jnp.zeros((batch, cfg.n_head, 1), jnp.float32),
        )
        for _ in range(cfg.n_layer)
    )


def _softcap(x, cap: float):
    return cap * jnp.tanh(x / cap)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    v = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(v + eps)).astype(x.dtype) * w


def _mh_layer_norm(h, w, eps):
    """Per-head LayerNorm over dv, then flatten and scale (nh*dv) weight."""
    hf = h.astype(jnp.float32)
    m = jnp.mean(hf, axis=-1, keepdims=True)
    v = jnp.mean((hf - m) ** 2, axis=-1, keepdims=True)
    n = ((hf - m) * jax.lax.rsqrt(v + eps)).astype(h.dtype)
    b, t = h.shape[:2]
    return n.reshape(b, t, -1) * w


def mlstm_scan(q, k, v, i_pre, f_pre, state, eps: float):
    """q/k (b,t,nh,dqk), v (b,t,nh,dv), gates (b,t,nh); state (C, N, M).
    Returns (h (b,t,nh,dv), new state); all recurrence math in f32."""
    dqk = q.shape[-1]
    qf = q.astype(jnp.float32) * (dqk ** -0.5)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logf = jax.nn.log_sigmoid(f_pre.astype(jnp.float32))[..., None]  # (b,t,nh,1)
    ig = i_pre.astype(jnp.float32)[..., None]

    def step(carry, inp):
        C, N, M = carry
        qt, kt, vt, lf, it = inp  # (b,nh,*)
        m_new = jnp.maximum(lf + M, it)
        f_act = jnp.exp(lf + M - m_new)
        i_act = jnp.exp(it - m_new)
        C = f_act[..., None] * C + i_act[..., None] * (kt[..., :, None]
                                                       * vt[..., None, :])
        N = f_act * N + i_act * kt
        num = jnp.einsum("bhq,bhqv->bhv", qt, C)
        qn = jnp.einsum("bhq,bhq->bh", qt, N)[..., None]
        den = jnp.maximum(jnp.abs(qn), jnp.exp(-m_new)) + eps
        return (C, N, m_new), num / den

    xs = (qf.transpose(1, 0, 2, 3), kf.transpose(1, 0, 2, 3),
          vf.transpose(1, 0, 2, 3), logf.transpose(1, 0, 2, 3),
          ig.transpose(1, 0, 2, 3))
    state, hs = jax.lax.scan(step, state, xs)
    return hs.transpose(1, 0, 2, 3).astype(q.dtype), state


def forward(params: dict, cfg: XLSTMConfig, tokens, state):
    """tokens (B, T) + per-layer (C, N, M) -> (logits, new_state)."""
    b, t = tokens.shape
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    new_state = list(state)
    for li in range(cfg.n_layer):
        pre = f"blk.{li}."
        h = _rms(x, params[pre + "attn_norm.weight"], cfg.eps)
        q = _linear(h, params[pre + "xlstm_q.weight"],
                    params.get(pre + "xlstm_q.bias"))
        k = _linear(h, params[pre + "xlstm_k.weight"],
                    params.get(pre + "xlstm_k.bias"))
        v = _linear(h, params[pre + "xlstm_v.weight"],
                    params.get(pre + "xlstm_v.bias"))
        o_pre = _linear(h, params[pre + "xlstm_ogate.weight"],
                        params.get(pre + "xlstm_ogate.bias"))
        i_pre = _softcap(_linear(h, params[pre + "xlstm_igate.weight"],
                                 params[pre + "xlstm_igate.bias"]),
                         cfg.gate_softcap)
        f_pre = _softcap(_linear(h, params[pre + "xlstm_fgate.weight"],
                                 params[pre + "xlstm_fgate.bias"]),
                         cfg.gate_softcap)
        q = q.reshape(b, t, cfg.n_head, cfg.dqk)
        k = k.reshape(b, t, cfg.n_head, cfg.dqk)
        v = v.reshape(b, t, cfg.n_head, cfg.dv)

        hmem, new_state[li] = mlstm_scan(q, k, v, i_pre, f_pre, new_state[li],
                                         cfg.backend_eps)
        hn = _mh_layer_norm(hmem, params[pre + "xlstm_mh_norm.weight"], cfg.eps)
        out = jax.nn.sigmoid(o_pre) * hn
        x = x + _linear(out, params[pre + "xlstm_out.weight"],
                        params.get(pre + "xlstm_out.bias"))

        h = _rms(x, params[pre + "ffn_norm.weight"], cfg.eps)
        gate = _linear(h, params[pre + "ffn_gate.weight"],
                       params.get(pre + "ffn_gate.bias"))
        up = _linear(h, params[pre + "ffn_up.weight"],
                     params.get(pre + "ffn_up.bias"))
        x = x + _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"],
                        params.get(pre + "ffn_down.bias"))

    x = _rms(x, params["output_norm.weight"], cfg.eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out).astype(jnp.float32)
    if cfg.out_softcap:
        logits = _softcap(logits, cfg.out_softcap)
    return logits, tuple(new_state)


class XLSTM:
    """Inference wrapper: O(1)-state decode via a jitted lax.scan loop
    (recurrent-family signature — see models.mamba.Mamba)."""

    def __init__(self, params: dict, cfg: XLSTMConfig, batch: int = 1):
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
