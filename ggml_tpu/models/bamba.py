"""Bamba family (llama.cpp arch 'bamba', IBM Bamba-9B) — the HYBRID
decoder: most layers are Mamba-2 SSD mixers (O(1) state), a few are
GQA attention layers with PARTIAL rotate-half rope; every layer is
followed by a SwiGLU MLP under its own pre-norm.

The per-layer cache is a MIXED pytree: (conv window, ssm state) on mamba
layers, (k, v) on attention layers — positions drive only the attention
layers; the SSD state carries sequence memory elsewhere.  serve.Engine
drives the family on its DENSE path (exact-length prefill keeps pads out
of the recurrence; slot snapshot/restore works leaf-wise on the mixed
pytree).

Architecture semantics match HF transformers.models.bamba
(BambaForCausalLM); the SSD math is shared with models.mamba2.
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
from .llama import _rms_norm
from .mamba2 import _ssd_scan
from .phi2 import _rope_half_partial


@dataclass(frozen=True)
class BambaConfig:
    n_vocab: int = 128256
    n_ctx: int = 4096
    n_embd: int = 4096
    n_head: int = 32
    n_head_kv: int = 8
    n_layer: int = 32
    n_ff: int = 14336
    n_rot: int = 64  # partial_rotary_factor * head_dim
    rope_base: float = 10000.0
    rms_eps: float = 1e-5
    attn_layers: tuple = ()  # indices of attention layers; rest are mamba
    # mamba2 mixer geometry
    d_inner: int = 8192
    d_conv: int = 4
    d_state: int = 256
    m_head: int = 128  # mamba heads
    n_group: int = 1

    @property
    def head_dim(self):
        return self.n_embd // self.n_head

    @property
    def m_head_dim(self):
        return self.d_inner // self.m_head

    @property
    def conv_dim(self):
        return self.d_inner + 2 * self.n_group * self.d_state


def config_from_gguf(g: GGUFFile) -> BambaConfig:
    md = g.metadata
    a = "bamba"
    n_head = int(md[f"{a}.attention.head_count"])
    n_embd = int(md[f"{a}.embedding_length"])
    head_dim = n_embd // n_head
    return BambaConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 128256)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=n_embd,
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_rot=int(md.get(f"{a}.rope.dimension_count", head_dim // 2)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        attn_layers=tuple(int(i) for i in md.get(f"{a}.attention.layer_indices", ())),
        d_inner=int(md[f"{a}.ssm.inner_size"]),
        d_conv=int(md[f"{a}.ssm.conv_kernel"]),
        d_state=int(md[f"{a}.ssm.state_size"]),
        m_head=int(md[f"{a}.ssm.time_step_rank"]),
        n_group=int(md.get(f"{a}.ssm.group_count", 1)),
    )


def init_cache(cfg: BambaConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    """Mixed per-layer state: (k, v) KV cache on attention layers,
    (conv window, ssm state f32) on mamba layers."""
    layers = []
    for i in range(cfg.n_layer):
        if i in cfg.attn_layers:
            mk = lambda: jnp.zeros((batch, cfg.n_head_kv, max_seq, cfg.head_dim),
                                   dtype)
            layers.append((mk(), mk()))
        else:
            layers.append((
                jnp.zeros((batch, cfg.conv_dim, cfg.d_conv - 1), jnp.float32),
                jnp.zeros((batch, cfg.m_head, cfg.m_head_dim, cfg.d_state),
                          jnp.float32),
            ))
    return tuple(layers)


def _mamba_layer(params, cfg: BambaConfig, pre, h, state):
    """Mamba-2 mixer (shared SSD math with models.mamba2)."""
    b, t = h.shape[:2]
    H, P, N, G = cfg.m_head, cfg.m_head_dim, cfg.d_state, cfg.n_group
    proj = _linear(h, params[pre + "ssm_in.weight"])
    z, xBC, dt = jnp.split(proj, [cfg.d_inner, cfg.d_inner + cfg.conv_dim],
                           axis=-1)

    conv_state, ssm_state = state
    sx = jnp.concatenate([conv_state.astype(xBC.dtype),
                          jnp.swapaxes(xBC, 1, 2)], axis=2)
    new_conv = sx[:, :, -(cfg.d_conv - 1):]
    xc = O.ssm_conv(sx, params[pre + "ssm_conv1d.weight"])
    xc = jax.nn.silu(xc + params[pre + "ssm_conv1d.bias"])

    xs, Bm, Cm = jnp.split(xc, [cfg.d_inner, cfg.d_inner + G * N], axis=-1)
    dtf = jax.nn.softplus(dt.astype(jnp.float32)
                          + params[pre + "ssm_dt.bias"].astype(jnp.float32))
    A = -jnp.exp(params[pre + "ssm_a"].astype(jnp.float32))
    xh = xs.astype(jnp.float32).reshape(b, t, H, P)
    rep = H // G
    Bh = jnp.repeat(Bm.astype(jnp.float32).reshape(b, t, G, N), rep, axis=2)
    Ch = jnp.repeat(Cm.astype(jnp.float32).reshape(b, t, G, N), rep, axis=2)

    y, s_out = _ssd_scan(ssm_state, xh, dtf, A, Bh, Ch)
    y = y + xh * params[pre + "ssm_d"].astype(jnp.float32)[None, None, :, None]
    y = y.reshape(b, t, cfg.d_inner)
    y = _rms_norm((y * jax.nn.silu(z.astype(jnp.float32))).astype(h.dtype),
                  params[pre + "ssm_norm.weight"], cfg.rms_eps)
    out = _linear(y, params[pre + "ssm_out.weight"])
    return out, (new_conv.astype(conv_state.dtype), s_out)


def _attn_layer(params, cfg: BambaConfig, pre, h, state, positions, cache_len,
                max_seq):
    b, t = h.shape[:2]
    hd = cfg.head_dim
    rep = cfg.n_head // cfg.n_head_kv
    dt_ = h.dtype
    q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, t, cfg.n_head, hd)
    k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    q = _rope_half_partial(q, positions, cfg.n_rot, cfg.rope_base).transpose(0, 2, 1, 3)
    k = _rope_half_partial(k, positions, cfg.n_rot, cfg.rope_base).transpose(0, 2, 1, 3)
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


def forward(params: dict, cfg: BambaConfig, tokens, pos_start, cache,
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
            out, new_cache[i] = _mamba_layer(params, cfg, pre, h, new_cache[i])
        x = x + out

        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        gate = _linear(h, params[pre + "ffn_gate.weight"])
        up = _linear(h, params[pre + "ffn_up.weight"])
        x = x + _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"])

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class Bamba:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: BambaConfig, max_seq: int = 2048,
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
