"""Mamba-2 (State Space Duality) family — llama.cpp arch 'mamba2'
(Mamba-2 / Mamba-Codestral).  Differences from models.mamba (v1): the
selective scan is PER-HEAD with a SCALAR decay A per head (state
(B, H, head_dim, N) instead of (B, d_inner, N)), B/C are shared across
head groups (n_groups, GQA-style), dt comes straight out of in_proj (one
per head, softplus + dt_bias + clamp), and the output passes through a
GATED RMSNorm (rmsnorm(y * silu(z)) * w) before out_proj.

Reference analog: the SSM_CONV op is shared with v1 (ops.ssm_conv,
golden-gated vs GGML_OP_SSM_CONV); the per-head scalar-decay scan is the
mamba2 extension of GGML_OP_SSM_SCAN (include/ggml.h:1811-1823).
Architecture semantics match HF transformers.models.mamba2 torch_forward
(scan computed in f32, like HF).

TPU notes: decode carries O(1) per-layer state (conv window + ssm state)
through a donated lax.scan; prefill runs one jitted scan over time.  The
chunked SSD matmul formulation (HF's chunk_size blocks, all-MXU) is the
known perf upgrade for long prefill — the recurrence here is the exact
semantics it must reproduce.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from ..ops import core as O
from .common import linear as _linear
from .llama import _rms_norm


@dataclass(frozen=True)
class Mamba2Config:
    n_vocab: int = 50288
    n_ctx: int = 2048
    n_embd: int = 768
    d_inner: int = 1536  # expand * d_model = num_heads * head_dim
    d_conv: int = 4
    d_state: int = 128
    n_head: int = 24  # ssm heads (time_step_rank in gguf)
    n_group: int = 1
    n_layer: int = 24
    rms_eps: float = 1e-5
    dt_min: float = 0.0
    dt_max: float = float("inf")

    @property
    def head_dim(self):
        return self.d_inner // self.n_head

    @property
    def conv_dim(self):
        return self.d_inner + 2 * self.n_group * self.d_state


def config_from_gguf(g: GGUFFile) -> Mamba2Config:
    md = g.metadata
    a = "mamba2"
    return Mamba2Config(
        n_vocab=int(md.get(f"{a}.vocab_size", 50288)),
        n_ctx=int(md.get(f"{a}.context_length", 2048)),
        n_embd=int(md[f"{a}.embedding_length"]),
        d_inner=int(md[f"{a}.ssm.inner_size"]),
        d_conv=int(md[f"{a}.ssm.conv_kernel"]),
        d_state=int(md[f"{a}.ssm.state_size"]),
        n_head=int(md[f"{a}.ssm.time_step_rank"]),
        n_group=int(md.get(f"{a}.ssm.group_count", 1)),
        n_layer=int(md[f"{a}.block_count"]),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
    )


def init_state(cfg: Mamba2Config, batch: int, dtype=jnp.float32):
    """Per-layer recurrent state: (conv rolling window over ALL conv
    channels (x|B|C), per-head ssm state (B, H, head_dim, d_state))."""
    return tuple(
        (
            jnp.zeros((batch, cfg.conv_dim, cfg.d_conv - 1), dtype),
            jnp.zeros((batch, cfg.n_head, cfg.head_dim, cfg.d_state), dtype),
        )
        for _ in range(cfg.n_layer)
    )


def _ssd_scan(state, x, dt, A, Bm, Cm):
    """Per-head scalar-decay selective scan (the SSD recurrence), f32.
    state (B,H,P,N); x (B,T,H,P); dt (B,T,H) post-softplus; A (H,) negative;
    Bm/Cm (B,T,H,N) already group-broadcast.  Returns (y (B,T,H,P), state)."""
    state = state.astype(jnp.float32)

    def step(s, inp):
        xt, dtt, bt, ct = inp  # (B,H,P), (B,H), (B,H,N), (B,H,N)
        da = jnp.exp(dtt * A[None, :])[..., None, None]  # (B,H,1,1)
        dbx = (dtt[..., None, None] * bt[:, :, None, :]) * xt[..., None]
        s = s * da + dbx
        y = jnp.einsum("bhpn,bhn->bhp", s, ct)
        return s, y

    xs = (x.transpose(1, 0, 2, 3), dt.transpose(1, 0, 2),
          Bm.transpose(1, 0, 2, 3), Cm.transpose(1, 0, 2, 3))
    state, ys = jax.lax.scan(step, state, xs)
    return ys.transpose(1, 0, 2, 3), state  # (B,T,H,P)


def forward(params: dict, cfg: Mamba2Config, tokens, state):
    """tokens (B, T) + per-layer state -> (logits, new_state); serves both
    prefill (fresh state) and decode (T=1, carried state)."""
    b, t = tokens.shape
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    H, P, N, G = cfg.n_head, cfg.head_dim, cfg.d_state, cfg.n_group
    rep = H // G
    new_state = list(state)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
        proj = _linear(h, params[pre + "ssm_in.weight"])
        z, xBC, dt = jnp.split(proj, [cfg.d_inner, cfg.d_inner + cfg.conv_dim],
                               axis=-1)

        conv_state, ssm_state = new_state[i]
        sx = jnp.concatenate([conv_state.astype(xBC.dtype),
                              jnp.swapaxes(xBC, 1, 2)], axis=2)
        new_conv = sx[:, :, -(cfg.d_conv - 1):]
        xc = O.ssm_conv(sx, params[pre + "ssm_conv1d.weight"])
        xc = jax.nn.silu(xc + params[pre + "ssm_conv1d.bias"])

        xs, Bm, Cm = jnp.split(xc, [cfg.d_inner, cfg.d_inner + G * N], axis=-1)
        dtf = jax.nn.softplus(dt.astype(jnp.float32)
                              + params[pre + "ssm_dt.bias"].astype(jnp.float32))
        dtf = jnp.clip(dtf, cfg.dt_min, cfg.dt_max)  # (B,T,H)
        A = -jnp.exp(params[pre + "ssm_a"].astype(jnp.float32))  # (H,)
        xh = xs.astype(jnp.float32).reshape(b, t, H, P)
        Bh = jnp.repeat(Bm.astype(jnp.float32).reshape(b, t, G, N), rep, axis=2)
        Ch = jnp.repeat(Cm.astype(jnp.float32).reshape(b, t, G, N), rep, axis=2)

        y, s_out = _ssd_scan(ssm_state, xh, dtf, A, Bh, Ch)
        y = y + xh * params[pre + "ssm_d"].astype(jnp.float32)[None, None, :, None]
        y = y.reshape(b, t, cfg.d_inner)
        # gated RMSNorm (HF MambaRMSNormGated): norm AFTER the silu gate
        y = _rms_norm((y * jax.nn.silu(z.astype(jnp.float32))).astype(x.dtype),
                      params[pre + "ssm_norm.weight"], cfg.rms_eps)
        x = x + _linear(y, params[pre + "ssm_out.weight"])
        new_state[i] = (new_conv.astype(conv_state.dtype),
                        s_out.astype(ssm_state.dtype))

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params.get("token_embd.weight@dense",
                                                   params["token_embd.weight"]))
    return _linear(x, w_out), tuple(new_state)


class Mamba2:
    """Inference wrapper: O(1)-state decode via a jitted lax.scan loop
    (mirrors models.mamba.Mamba; serve.Engine drives it the same way)."""

    def __init__(self, params: dict, cfg: Mamba2Config, batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.batch = batch

        self._step = jax.jit(
            lambda p, tok, st: forward(p, cfg, tok, st), donate_argnums=(2,))

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
        return cls(load_params(g, dtype, keep_quantized=keep_quantized),
                   config_from_gguf(g), **kw)

    def new_state(self, dtype=jnp.float32):
        return init_state(self.cfg, self.batch, dtype)

    def prefill(self, state, tokens: np.ndarray):
        logits, state = self._step(self.params, jnp.asarray(tokens), state)
        return logits[:, -1, :], state

    def decode_greedy(self, state, first_token, n_tokens: int):
        dummy = jnp.zeros((n_tokens,), jnp.int32)
        state, toks = self._decode_loop(self.params, state,
                                        jnp.asarray(first_token), dummy)
        return state, np.asarray(toks)

    def generate(self, prompt_tokens: np.ndarray, n_tokens: int):
        state = self.new_state()
        logits, state = self.prefill(state, np.asarray(prompt_tokens, np.int32))
        first = np.argmax(np.asarray(logits), -1).astype(np.int32)[:, None]
        state, toks = self.decode_greedy(state, first, n_tokens - 1)
        return [int(first[0, 0])] + [int(x) for x in toks.reshape(-1)]
