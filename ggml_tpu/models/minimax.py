"""MiniMax-Text-01 family (HF arch 'minimax') — LIGHTNING ATTENTION
hybrid: alternating linear-attention layers (decayed, normalizer-free
linear attention: per-head ALiBi-style slopes scaled by depth, silu'd
fused qkv, whole-width RMSNorm + sigmoid output gate) and full GQA rope
attention, Mixtral sparse MoE everywhere, and alpha/beta residual
factors where the residual is the POST-norm stream (each sublayer
re-normalizes — there is no un-normed skip path).

TPU-first mapping: the lightning recurrence S_t = r·S_{t-1} + k_tᵀv_t,
o_t = q_t·S_t runs as ONE chunk of closed-form block math per forward —
out = (QKᵀ ⊙ D)V + (Q ⊙ r^i)·S,  S' = r^L·S + (K ⊙ r^{L-i})ᵀV — the
whole-prompt specialization of HF's per-256-block loop
(MiniMaxLightningAttention.forward), algebraically identical and one
matmul pair instead of a Python loop.  Decode is the same formula at
L=1.  MoE reuses models.llama.moe_ffn_block (Mixtral semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import linear as _linear
from .llama import _rms_norm, _rope_half, moe_ffn_block


@dataclass(frozen=True)
class MiniMaxConfig:
    n_vocab: int = 32000
    n_ctx: int = 4096
    n_embd: int = 4096
    n_head: int = 32
    n_head_kv: int = 8
    n_layer: int = 32
    n_ff: int = 14336
    head_dim: int = 128
    rope_base: float = 1e6
    rms_eps: float = 1e-5
    full_attn_layers: tuple = ()  # rest are lightning linear attention
    # residual factors (post-norm stream scaling)
    attn_alpha: float = 1.0
    attn_beta: float = 1.0
    lin_alpha: float = 1.0
    lin_beta: float = 1.0
    mlp_alpha: float = 1.0
    mlp_beta: float = 1.0
    # moe_ffn_block contract (Mixtral semantics)
    n_expert: int = 8
    n_expert_used: int = 2
    moe_renorm: bool = True
    moe_shared: bool = False


def config_from_gguf(g: GGUFFile) -> MiniMaxConfig:
    md = g.metadata
    a = "minimax"
    n_head = int(md[f"{a}.attention.head_count"])
    n_embd = int(md[f"{a}.embedding_length"])
    return MiniMaxConfig(
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
        full_attn_layers=tuple(int(i) for i in
                               md.get(f"{a}.attention.layer_indices", ())),
        attn_alpha=float(md.get(f"{a}.full_attn_alpha", 1.0)),
        attn_beta=float(md.get(f"{a}.full_attn_beta", 1.0)),
        lin_alpha=float(md.get(f"{a}.linear_attn_alpha", 1.0)),
        lin_beta=float(md.get(f"{a}.linear_attn_beta", 1.0)),
        mlp_alpha=float(md.get(f"{a}.mlp_alpha", 1.0)),
        mlp_beta=float(md.get(f"{a}.mlp_beta", 1.0)),
        n_expert=int(md[f"{a}.expert_count"]),
        n_expert_used=int(md[f"{a}.expert_used_count"]),
    )


def init_cache(cfg: MiniMaxConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    """Mixed per-layer state: (k, v) on full-attention layers, the (d, d)
    per-head decayed KV-sum on lightning layers (f32 — it accumulates)."""
    layers = []
    for i in range(cfg.n_layer):
        if i in cfg.full_attn_layers:
            mk = lambda: jnp.zeros((batch, cfg.n_head_kv, max_seq, cfg.head_dim),
                                   dtype)
            layers.append((mk(), mk()))
        else:
            layers.append(
                (jnp.zeros((batch, cfg.n_head, cfg.head_dim, cfg.head_dim),
                           jnp.float32),))
    return tuple(layers)


def _slopes(cfg: MiniMaxConfig, layer_idx: int) -> np.ndarray:
    """Per-head decay rates (HF get_slope_rate): ALiBi-style base slopes
    scaled towards 0 with depth."""
    base = 1.0 / (2.0 ** (8.0 / cfg.n_head))
    rate = base ** (np.arange(cfg.n_head, dtype=np.float64) + 1)
    factor = 1.0 - layer_idx / (cfg.n_layer - 1 + 1e-5) + 1e-5
    return (rate * factor).astype(np.float32)  # (H,)


def _lightning_layer(params, cfg: MiniMaxConfig, pre, h, state, layer_idx: int):
    b, t = h.shape[:2]
    H, d = cfg.n_head, cfg.head_dim
    qkv = jax.nn.silu(_linear(h, params[pre + "attn_qkv.weight"]))
    qkv = qkv.reshape(b, t, H, 3 * d)
    q, k, v = (x.transpose(0, 2, 1, 3).astype(jnp.float32)
               for x in jnp.split(qkv, 3, axis=-1))  # (b,H,t,d)

    s = jnp.asarray(_slopes(cfg, layer_idx))[None, :, None, None]  # (1,H,1,1)
    idx = jnp.arange(1, t + 1, dtype=jnp.float32)
    # intra-chunk: (QK^T ⊙ exp(-s(i-j)) for i>=j) V
    rel = idx[:, None] - idx[None, :]  # i - j
    dmask = jnp.where(rel >= 0, jnp.exp(-s * rel), 0.0)  # (1,H,t,t)
    intra = jnp.einsum("bhqd,bhkd->bhqk", q, k) * dmask
    out = jnp.einsum("bhqk,bhkd->bhqd", intra, v)
    # inter-chunk: (Q ⊙ r^i) S_prev
    (S,) = state
    qdec = jnp.exp(-s * idx[None, None, :, None])  # (1,H,t,1)
    out = out + jnp.einsum("bhqd,bhde->bhqe", q * qdec, S)
    # state update: S' = r^L S + (K ⊙ r^{L-i})^T V
    kdec = jnp.exp(-s * (t - idx)[None, None, :, None])
    S_new = S * jnp.exp(-s[..., 0] * t)[..., None] + jnp.einsum(
        "bhkd,bhke->bhde", k * kdec, v)

    out = out.transpose(0, 2, 1, 3).reshape(b, t, H * d).astype(h.dtype)
    # the whole-width out-norm is constructed WITHOUT an eps argument in HF
    # (MiniMaxLightningAttention.__init__) — always 1e-6, NOT rms_norm_eps.
    # It matters: the normalizer-free linear attention output can have tiny
    # variance, where rsqrt(v + eps) is eps-dominated.
    out = _rms_norm(out, params[pre + "attn_out_norm.weight"], 1e-6)
    gate = jax.nn.sigmoid(_linear(h, params[pre + "attn_gate.weight"]))
    out = _linear(gate * out, params[pre + "attn_output.weight"])
    return out, (S_new,)


def _full_attn_layer(params, cfg: MiniMaxConfig, pre, h, state, positions,
                     cache_len, max_seq):
    b, t = h.shape[:2]
    hd = cfg.head_dim
    rep = cfg.n_head // cfg.n_head_kv
    dt_ = h.dtype
    q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, t, cfg.n_head, hd)
    k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, t, cfg.n_head_kv, hd)
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


def forward(params: dict, cfg: MiniMaxConfig, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    max_seq = next((cache[i][0].shape[-2] for i in range(cfg.n_layer)
                    if i in cfg.full_attn_layers), 0)
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        # NOTE: the residual is the POST-norm stream (HF MiniMaxDecoderLayer)
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
        if i in cfg.full_attn_layers:
            out, new_cache[i] = _full_attn_layer(params, cfg, pre, h,
                                                 new_cache[i], positions,
                                                 cache_len, max_seq)
            x = h * cfg.attn_alpha + out * cfg.attn_beta
        else:
            out, new_cache[i] = _lightning_layer(params, cfg, pre, h,
                                                 new_cache[i], i)
            x = h * cfg.lin_alpha + out * cfg.lin_beta

        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        x = h * cfg.mlp_alpha + moe_ffn_block(params, pre, h, cfg) * cfg.mlp_beta

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class MiniMax:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: MiniMaxConfig, max_seq: int = 2048,
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
