"""Mamba (selective state space) — the model family the reference's SSM ops
exist for (GGML_OP_SSM_CONV / GGML_OP_SSM_SCAN, include/ggml.h:1811-1823;
llama.cpp's 'mamba' architecture is the downstream consumer).

Built ON the op layer: every token-mixing step goes through ops.ssm_conv and
ops.ssm_scan — the same golden-tested functions the op-conformance suite
gates against the reference CPU backend — so the model doubles as their
integration test.  O(1)-state decode: the recurrent state is (conv window,
ssm state) per layer instead of a KV cache.

GGUF tensor naming follows llama.cpp's mamba converter (ssm_in / ssm_conv1d /
ssm_x / ssm_dt / ssm_a / ssm_d / ssm_out).

Also serves the 'falcon_mamba' arch (TII FalconMamba): identical mixer
plus a WEIGHTLESS RMS normalization of the dt/B/C selection streams
(HF falcon_mamba rms_forward, eps = mixer_rms_eps > 0 enables it).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from ..ops import core as O


@dataclass(frozen=True)
class MambaConfig:
    n_vocab: int = 50280
    n_ctx: int = 2048
    n_embd: int = 768  # d_model
    d_inner: int = 1536  # expand * d_model
    d_conv: int = 4
    d_state: int = 16
    dt_rank: int = 48
    n_layer: int = 24
    rms_eps: float = 1e-5
    mixer_rms_eps: float = 0.0  # falcon_mamba: weightless rms on dt/B/C


def config_from_gguf(g: GGUFFile) -> MambaConfig:
    md = g.metadata
    a = md.get("general.architecture", "mamba")
    if a not in ("mamba", "falcon_mamba"):
        a = "mamba"
    return MambaConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 50280)),
        n_ctx=int(md.get(f"{a}.context_length", 2048)),
        n_embd=int(md[f"{a}.embedding_length"]),
        d_inner=int(md[f"{a}.ssm.inner_size"]),
        d_conv=int(md[f"{a}.ssm.conv_kernel"]),
        d_state=int(md[f"{a}.ssm.state_size"]),
        dt_rank=int(md[f"{a}.ssm.time_step_rank"]),
        n_layer=int(md[f"{a}.block_count"]),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        mixer_rms_eps=float(md.get(f"{a}.ssm.mixer_rms_eps", 0.0)),
    )


def _rms_plain(x, eps):
    """Weightless RMS normalization (falcon_mamba rms_forward)."""
    xf = x.astype(jnp.float32)
    v = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(v + eps)).astype(x.dtype)


def _rms_norm(x, w, eps):
    v = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(v + eps)).astype(x.dtype) * w


from .common import linear as _linear  # noqa: E402


def init_state(cfg: MambaConfig, batch: int, dtype=jnp.float32):
    """Per-layer recurrent state: (conv rolling window (B, d_inner, d_conv-1),
    ssm state (B, d_inner, d_state)) — the O(1) analog of a KV cache."""
    return tuple(
        (
            jnp.zeros((batch, cfg.d_inner, cfg.d_conv - 1), dtype),
            jnp.zeros((batch, cfg.d_inner, cfg.d_state), dtype),
        )
        for _ in range(cfg.n_layer)
    )


def forward(params: dict, cfg: MambaConfig, tokens, state):
    """tokens (B, T) + per-layer state -> (logits (B, T, V), new_state).

    The same function serves prefill (T tokens from fresh state) and decode
    (T=1 carrying state) — the conv window and ssm state replace positions.
    """
    b, t = tokens.shape
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    new_state = list(state)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
        xz = _linear(h, params[pre + "ssm_in.weight"])  # (B, T, 2*d_inner)
        xs, z = jnp.split(xz, 2, axis=-1)

        # causal depthwise conv over the rolling window (ops.ssm_conv)
        conv_state, ssm_state = new_state[i]
        sx = jnp.concatenate([conv_state.astype(xs.dtype),
                              jnp.swapaxes(xs, 1, 2)], axis=2)  # (B, d_inner, T + d_conv - 1)
        new_conv = sx[:, :, -(cfg.d_conv - 1):]
        xc = O.ssm_conv(sx, params[pre + "ssm_conv1d.weight"])  # (B, T, d_inner)
        xc = jax.nn.silu(xc + params[pre + "ssm_conv1d.bias"])

        x_dbl = _linear(xc, params[pre + "ssm_x.weight"])
        dt, Bm, Cm = jnp.split(x_dbl, [cfg.dt_rank, cfg.dt_rank + cfg.d_state], axis=-1)
        if cfg.mixer_rms_eps:  # falcon_mamba: weightless rms on the selection
            dt = _rms_plain(dt, cfg.mixer_rms_eps)
            Bm = _rms_plain(Bm, cfg.mixer_rms_eps)
            Cm = _rms_plain(Cm, cfg.mixer_rms_eps)
        dt = _linear(dt, params[pre + "ssm_dt.weight"], params[pre + "ssm_dt.bias"])
        A = -jnp.exp(params[pre + "ssm_a"].astype(jnp.float32))  # (d_inner, d_state)

        y, s_out = O.ssm_scan(ssm_state, xc, dt, A, Bm, Cm)
        y = y + xc * params[pre + "ssm_d"][None, None, :]
        y = y * jax.nn.silu(z)
        x = x + _linear(y, params[pre + "ssm_out.weight"])
        new_state[i] = (new_conv.astype(conv_state.dtype), s_out.astype(ssm_state.dtype))

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params.get("token_embd.weight@dense",
                                                   params["token_embd.weight"]))
    return _linear(x, w_out), tuple(new_state)


class Mamba:
    """Inference wrapper: O(1)-state decode via a jitted lax.scan loop."""

    def __init__(self, params: dict, cfg: MambaConfig, batch: int = 1):
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

            (state, _), toks = jax.lax.scan(body, (state, first_token), steps_tokens)
            return state, toks

        self._decode_loop = jax.jit(decode_loop, donate_argnums=(1,))

    @classmethod
    def from_gguf(cls, path, dtype=jnp.float32, keep_quantized: bool = True, **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        cfg = config_from_gguf(g)
        return cls(load_params(g, dtype, keep_quantized=keep_quantized), cfg, **kw)

    def new_state(self, dtype=jnp.float32):
        return init_state(self.cfg, self.batch, dtype)

    def prefill(self, state, tokens: np.ndarray):
        logits, state = self._step(self.params, jnp.asarray(tokens), state)
        return logits[:, -1, :], state

    def decode_greedy(self, state, first_token, n_tokens: int):
        dummy = jnp.zeros((n_tokens,), jnp.int32)
        state, toks = self._decode_loop(self.params, state, jnp.asarray(first_token), dummy)
        return state, np.asarray(toks)

    def generate(self, prompt_tokens: np.ndarray, n_tokens: int):
        state = self.new_state()
        logits, state = self.prefill(state, np.asarray(prompt_tokens, np.int32))
        first = np.argmax(np.asarray(logits), -1).astype(np.int32)[:, None]
        state, toks = self.decode_greedy(state, first, n_tokens - 1)
        return [int(first[0, 0])] + [int(x) for x in toks.reshape(-1)]
