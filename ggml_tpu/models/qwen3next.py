"""Qwen3-Next family — the GATED DELTANET hybrid: 3 of every 4 layers mix
tokens with a gated delta-rule LINEAR attention (O(1) per-head (k,v)
associative state, delta-rule write: S <- S*exp(g) + k (v - S^T k)^T beta),
every 4th layer is GQA attention with per-head qk-norm, partial rope, and
a SIGMOID OUTPUT GATE fused into q_proj; every layer's FFN is a
qwen3moe-style sparse MoE with a sigmoid-gated shared expert.

DeltaNet details (HF transformers.models.qwen3_next semantics,
torch_recurrent_gated_delta_rule): q/k/v pass a causal depthwise conv
(silu), q/k are L2-normalized per head and q scaled by hk^-0.5, the decay
is g = -exp(A_log) * softplus(a + dt_bias) per value head, beta =
sigmoid(b); the output is RMS-normed per value head THEN gated by silu(z)
(norm-before-gate — the opposite order of mamba2's gated norm).

The per-layer cache is a mixed pytree: (conv window f32, state S f32
(B, Hv, hk, hv)) on deltanet layers, (k, v) on attention layers.
serve.Engine drives it like models.bamba (exact-length prefill).

TPU notes: the recurrence runs as one jitted lax.scan over time (exact
semantics); the chunked block-matmul formulation (HF chunk_size=64 blocks,
all-MXU) is the known prefill upgrade and must reproduce this scan.
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
from .llama import moe_ffn_block
from .phi2 import _rope_half_partial


def _rms_norm1p(x, w, eps):
    """Qwen3Next RMSNorm: zero-centred weight, (1 + w) scale, weight applied
    in f32 (gemma-style — unlike llama's cast-then-scale)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)
            * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


@dataclass(frozen=True)
class Qwen3NextConfig:
    n_vocab: int = 151936
    n_ctx: int = 262144
    n_embd: int = 2048
    n_head: int = 16
    n_head_kv: int = 2
    head_dim: int = 256
    n_layer: int = 48
    n_ff: int = 5632  # (unused when all layers are MoE)
    n_rot: int = 64  # partial_rotary_factor * head_dim
    rope_base: float = 10000.0
    rms_eps: float = 1e-6
    attn_layers: tuple = ()  # full-attention layer indices; rest deltanet
    # deltanet geometry
    d_conv: int = 4
    lk_head: int = 16  # linear_num_key_heads
    lv_head: int = 32  # linear_num_value_heads
    lk_dim: int = 128  # linear_key_head_dim
    lv_dim: int = 128  # linear_value_head_dim
    # MoE (moe_ffn_block contract; qwen3moe semantics: renorm + sigmoid-gated
    # shared expert)
    n_expert: int = 512
    n_expert_used: int = 10
    moe_renorm: bool = True
    moe_shared: bool = True

    @property
    def key_dim(self):
        return self.lk_head * self.lk_dim

    @property
    def value_dim(self):
        return self.lv_head * self.lv_dim

    @property
    def conv_dim(self):
        return 2 * self.key_dim + self.value_dim


def config_from_gguf(g: GGUFFile) -> Qwen3NextConfig:
    md = g.metadata
    a = "qwen3next"
    n_head = int(md[f"{a}.attention.head_count"])
    n_embd = int(md[f"{a}.embedding_length"])
    head_dim = int(md.get(f"{a}.attention.key_length", n_embd // n_head))
    return Qwen3NextConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 151936)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=n_embd,
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        head_dim=head_dim,
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md.get(f"{a}.feed_forward_length", 0)),
        n_rot=int(md.get(f"{a}.rope.dimension_count", head_dim // 4)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)),
        attn_layers=tuple(int(i) for i in md.get(f"{a}.attention.layer_indices", ())),
        d_conv=int(md[f"{a}.ssm.conv_kernel"]),
        lk_head=int(md[f"{a}.ssm.key_head_count"]),
        lv_head=int(md[f"{a}.ssm.value_head_count"]),
        lk_dim=int(md[f"{a}.ssm.key_head_dim"]),
        lv_dim=int(md[f"{a}.ssm.value_head_dim"]),
        n_expert=int(md[f"{a}.expert_count"]),
        n_expert_used=int(md[f"{a}.expert_used_count"]),
    )


def init_cache(cfg: Qwen3NextConfig, batch: int, max_seq: int,
               dtype=jnp.bfloat16):
    """Mixed per-layer state: (k, v) on full-attention layers,
    (conv window, delta state) on deltanet layers (both f32)."""
    layers = []
    for i in range(cfg.n_layer):
        if i in cfg.attn_layers:
            mk = lambda: jnp.zeros((batch, cfg.n_head_kv, max_seq, cfg.head_dim),
                                   dtype)
            layers.append((mk(), mk()))
        else:
            layers.append((
                jnp.zeros((batch, cfg.conv_dim, cfg.d_conv - 1), jnp.float32),
                jnp.zeros((batch, cfg.lv_head, cfg.lk_dim, cfg.lv_dim),
                          jnp.float32),
            ))
    return tuple(layers)


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt((x * x).sum(-1, keepdims=True) + eps)


def _delta_scan(S, q, k, v, g, beta):
    """Gated delta-rule recurrence, f32.  S (B,H,K,V); q,k (B,T,H,K)
    (L2-normed, q pre-scaled); v (B,T,H,V); g (B,T,H) log-decay;
    beta (B,T,H).  Returns (out (B,T,H,V), S)."""
    S = S.astype(jnp.float32)

    def step(s, inp):
        qt, kt, vt, gt, bt = inp
        s = s * jnp.exp(gt)[..., None, None]
        kv_mem = jnp.einsum("bhkv,bhk->bhv", s, kt)
        delta = (vt - kv_mem) * bt[..., None]
        s = s + kt[..., :, None] * delta[..., None, :]
        out = jnp.einsum("bhkv,bhk->bhv", s, qt)
        return s, out

    xs = (q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
          v.transpose(1, 0, 2, 3), g.transpose(1, 0, 2),
          beta.transpose(1, 0, 2))
    S, outs = jax.lax.scan(step, S, xs)
    return outs.transpose(1, 0, 2, 3), S


def _deltanet_layer(params, cfg: Qwen3NextConfig, pre, h, state):
    b, t = h.shape[:2]
    Hk, Hv = cfg.lk_head, cfg.lv_head
    dk, dv = cfg.lk_dim, cfg.lv_dim
    rep = Hv // Hk
    # converter de-interleaves the fused qkvz/ba projections
    q = _linear(h, params[pre + "ssm_q.weight"])
    k = _linear(h, params[pre + "ssm_k.weight"])
    v = _linear(h, params[pre + "ssm_v.weight"])
    z = _linear(h, params[pre + "ssm_z.weight"]).reshape(b, t, Hv, dv)
    bproj = _linear(h, params[pre + "ssm_beta.weight"])  # (b,t,Hv)
    aproj = _linear(h, params[pre + "ssm_alpha.weight"])  # (b,t,Hv)

    conv_state, S = state
    qkv = jnp.concatenate([q, k, v], axis=-1)  # (b,t,conv_dim)
    sx = jnp.concatenate([conv_state.astype(qkv.dtype),
                          jnp.swapaxes(qkv, 1, 2)], axis=2)
    new_conv = sx[:, :, -(cfg.d_conv - 1):]
    xc = O.ssm_conv(sx, params[pre + "ssm_conv1d.weight"])
    if pre + "ssm_conv1d.bias" in params:
        xc = xc + params[pre + "ssm_conv1d.bias"]
    xc = jax.nn.silu(xc)

    q, k, v = jnp.split(xc, [cfg.key_dim, 2 * cfg.key_dim], axis=-1)
    q = q.reshape(b, t, Hk, dk).astype(jnp.float32)
    k = k.reshape(b, t, Hk, dk).astype(jnp.float32)
    v = v.reshape(b, t, Hv, dv).astype(jnp.float32)

    beta = jax.nn.sigmoid(bproj.astype(jnp.float32))
    g = (-jnp.exp(params[pre + "ssm_a"].astype(jnp.float32))
         * jax.nn.softplus(aproj.astype(jnp.float32)
                           + params[pre + "ssm_dt.bias"].astype(jnp.float32)))
    # L2-normalize q/k per head, scale q; broadcast k-heads to v-heads
    q = _l2norm(q) * (dk ** -0.5)
    k = _l2norm(k)
    if rep > 1:
        q = jnp.repeat(q, rep, axis=2)
        k = jnp.repeat(k, rep, axis=2)

    out, S = _delta_scan(S, q, k, v, g, beta)  # (b,t,Hv,dv)
    # per-head gated RMSNorm: norm BEFORE the silu(z) gate
    w = params[pre + "ssm_norm.weight"].astype(jnp.float32)
    var = jnp.mean(out * out, axis=-1, keepdims=True)
    out = out * jax.lax.rsqrt(var + cfg.rms_eps) * w
    out = out * jax.nn.silu(z.astype(jnp.float32))
    out = out.reshape(b, t, Hv * dv).astype(h.dtype)
    return _linear(out, params[pre + "ssm_out.weight"]), (
        new_conv.astype(conv_state.dtype), S)


def _attn_layer(params, cfg: Qwen3NextConfig, pre, h, state, positions,
                cache_len, max_seq):
    b, t = h.shape[:2]
    hd = cfg.head_dim
    rep = cfg.n_head // cfg.n_head_kv
    dt_ = h.dtype
    q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, t, cfg.n_head, hd)
    gate = _linear(h, params[pre + "attn_gate.weight"])  # (b,t,H*hd)
    k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    q = _rms_norm1p(q, params[pre + "attn_q_norm.weight"], cfg.rms_eps)
    k = _rms_norm1p(k, params[pre + "attn_k_norm.weight"], cfg.rms_eps)

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
    out = out.reshape(b, t, cfg.n_head * hd)
    out = (out * jax.nn.sigmoid(gate.astype(out.dtype))).astype(dt_)
    return _linear(out, params[pre + "attn_output.weight"]), (kc, vc)


def forward(params: dict, cfg: Qwen3NextConfig, tokens, pos_start, cache,
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
        h = _rms_norm1p(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
        if i in cfg.attn_layers:
            out, new_cache[i] = _attn_layer(params, cfg, pre, h, new_cache[i],
                                            positions, cache_len, max_seq)
        else:
            out, new_cache[i] = _deltanet_layer(params, cfg, pre, h,
                                                new_cache[i])
        x = x + out

        h = _rms_norm1p(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        x = x + moe_ffn_block(params, pre, h, cfg)

    x = _rms_norm1p(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class Qwen3Next:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: Qwen3NextConfig, max_seq: int = 2048,
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
