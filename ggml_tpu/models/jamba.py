"""Jamba family (llama.cpp arch 'jamba', AI21 Jamba) — the triple hybrid:
Mamba-v1 selective-scan layers (with dt/B/C RMSNorms — Jamba's stability
addition to the v1 mixer), periodic GQA attention layers with NO
positional encoding at all (NoPE — the SSM layers carry order), and a
periodic sparse MoE (softmax-topk, NON-renormalized) replacing the dense
SwiGLU every expert_layer_period layers.

Built ON the op layer: ops.ssm_conv / ops.ssm_scan (golden-gated vs
GGML_OP_SSM_CONV/SSM_SCAN, include/ggml.h:1811-1823) mix the mamba
layers, like models.mamba; the mixed per-layer cache and exact-length
engine prefill follow models.bamba.  Architecture semantics match HF
transformers.models.jamba (JambaForCausalLM slow path).
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
from .llama import _rms_norm, moe_ffn_block


@dataclass(frozen=True)
class JambaConfig:
    n_vocab: int = 65536
    n_ctx: int = 262144
    n_embd: int = 4096
    n_head: int = 32
    n_head_kv: int = 8
    n_layer: int = 32
    n_ff: int = 14336
    rms_eps: float = 1e-6
    attn_layers: tuple = ()  # attention layer indices; rest are mamba
    moe_layers: tuple = ()  # MoE layer indices; rest are dense SwiGLU
    # mamba v1 geometry
    d_inner: int = 8192
    d_conv: int = 4
    d_state: int = 16
    dt_rank: int = 256
    # moe_ffn_block contract (Jamba: softmax over all, top-k, NO renorm)
    n_expert: int = 16
    n_expert_used: int = 2
    moe_renorm: bool = False
    moe_shared: bool = False

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def config_from_gguf(g: GGUFFile) -> JambaConfig:
    md = g.metadata
    a = "jamba"
    n_head = int(md[f"{a}.attention.head_count"])
    return JambaConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 65536)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)),
        attn_layers=tuple(int(i) for i in md.get(f"{a}.attention.layer_indices", ())),
        moe_layers=tuple(int(i) for i in md.get(f"{a}.expert_layer_indices", ())),
        d_inner=int(md[f"{a}.ssm.inner_size"]),
        d_conv=int(md[f"{a}.ssm.conv_kernel"]),
        d_state=int(md[f"{a}.ssm.state_size"]),
        dt_rank=int(md[f"{a}.ssm.time_step_rank"]),
        n_expert=int(md.get(f"{a}.expert_count", 0)),
        n_expert_used=int(md.get(f"{a}.expert_used_count", 0)),
    )


def init_cache(cfg: JambaConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    """Mixed per-layer state: (k, v) on attention layers, (conv window,
    ssm state) f32 on mamba layers."""
    layers = []
    for i in range(cfg.n_layer):
        if i in cfg.attn_layers:
            mk = lambda: jnp.zeros((batch, cfg.n_head_kv, max_seq, cfg.head_dim),
                                   dtype)
            layers.append((mk(), mk()))
        else:
            layers.append((
                jnp.zeros((batch, cfg.d_inner, cfg.d_conv - 1), jnp.float32),
                jnp.zeros((batch, cfg.d_inner, cfg.d_state), jnp.float32),
            ))
    return tuple(layers)


def _mamba_layer(params, cfg: JambaConfig, pre, h, state):
    """Mamba-v1 mixer + Jamba's dt/B/C RMSNorms."""
    xz = _linear(h, params[pre + "ssm_in.weight"])
    xs, z = jnp.split(xz, 2, axis=-1)

    conv_state, ssm_state = state
    sx = jnp.concatenate([conv_state.astype(xs.dtype),
                          jnp.swapaxes(xs, 1, 2)], axis=2)
    new_conv = sx[:, :, -(cfg.d_conv - 1):]
    xc = O.ssm_conv(sx, params[pre + "ssm_conv1d.weight"])
    if pre + "ssm_conv1d.bias" in params:
        xc = xc + params[pre + "ssm_conv1d.bias"]
    xc = jax.nn.silu(xc)

    x_dbl = _linear(xc, params[pre + "ssm_x.weight"])
    dt, Bm, Cm = jnp.split(x_dbl, [cfg.dt_rank, cfg.dt_rank + cfg.d_state],
                           axis=-1)
    dt = _rms_norm(dt, params[pre + "ssm_dt_norm.weight"], cfg.rms_eps)
    Bm = _rms_norm(Bm, params[pre + "ssm_b_norm.weight"], cfg.rms_eps)
    Cm = _rms_norm(Cm, params[pre + "ssm_c_norm.weight"], cfg.rms_eps)
    dt = _linear(dt, params[pre + "ssm_dt.weight"], params[pre + "ssm_dt.bias"])
    A = -jnp.exp(params[pre + "ssm_a"].astype(jnp.float32))

    y, s_out = O.ssm_scan(ssm_state, xc, dt, A, Bm, Cm)
    y = y + xc * params[pre + "ssm_d"][None, None, :]
    y = y * jax.nn.silu(z)
    out = _linear(y, params[pre + "ssm_out.weight"])
    return out, (new_conv.astype(conv_state.dtype), s_out.astype(ssm_state.dtype))


def _attn_layer(params, cfg: JambaConfig, pre, h, state, positions, cache_len,
                max_seq):
    """GQA attention with NO positional encoding (NoPE)."""
    b, t = h.shape[:2]
    hd = cfg.head_dim
    rep = cfg.n_head // cfg.n_head_kv
    dt_ = h.dtype
    q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, t, cfg.n_head, hd)
    k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))

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


def forward(params: dict, cfg: JambaConfig, tokens, pos_start, cache,
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
        if i in cfg.moe_layers:
            x = x + moe_ffn_block(params, pre, h, cfg)
        else:
            gate = _linear(h, params[pre + "ffn_gate.weight"])
            up = _linear(h, params[pre + "ffn_up.weight"])
            x = x + _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"])

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class Jamba:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: JambaConfig, max_seq: int = 2048,
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
