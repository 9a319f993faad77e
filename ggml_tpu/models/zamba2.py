"""Zamba2 family (Zyphra Zamba2-1.2B/2.7B/7B, HF arch 'zamba2') — the
SHARED-TRANSFORMER-BLOCK hybrid: every layer is a Mamba-2 SSD mixer, and
periodic "hybrid" layers additionally run one of num_mem_blocks SHARED
transformer blocks (cycled) whose input is concat(hidden, original
embeddings) — 2×width attention with scale (head_dim/2)^-0.5 and
optional rope — followed by a gelu gate_up MLP.  Because the block
weights are tied across uses, each USE adds its own small low-rank
adapters (gate_up always; q/k/v when use_shared_attention_adapter); the
block output enters the mamba path through a per-layer linear, OUTSIDE
the residual (HF ZambaMambaDecoderLayer: residual excludes it).

Mixer deltas vs models.bamba: dt is clamped at time_step_min after the
softplus, and the gated RMSNorm is GROUPED (variance per
d_inner/n_groups slice — Zamba2RMSNormGated).  Reuses mamba2._ssd_scan.
Matches HF transformers.models.zamba2 (Zamba2ForCausalLM, torch path).
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
from .mamba2 import _ssd_scan


@dataclass(frozen=True)
class Zamba2Config:
    n_vocab: int = 32000
    n_ctx: int = 4096
    n_embd: int = 2560
    n_head: int = 32  # shared-block attention heads (over 2*n_embd)
    n_head_kv: int = 32
    n_layer: int = 54
    n_ff: int = 10240  # shared-block MLP intermediate
    rms_eps: float = 1e-5
    hybrid_layers: tuple = ()  # layer indices that run a shared block
    n_mem_blocks: int = 1
    adapter_rank: int = 128
    qkv_adapter: bool = False  # use_shared_attention_adapter
    use_rope: bool = False  # use_mem_rope
    rope_base: float = 10000.0
    # mamba2 mixer geometry
    d_inner: int = 5120
    d_conv: int = 4
    d_state: int = 64
    m_head: int = 8  # n_mamba_heads
    n_group: int = 1
    dt_min: float = 0.001  # time_step_min clamp

    @property
    def head_dim(self):  # attention head dim over the concatenated width
        return 2 * self.n_embd // self.n_head

    @property
    def m_head_dim(self):
        return self.d_inner // self.m_head

    @property
    def conv_dim(self):
        return self.d_inner + 2 * self.n_group * self.d_state


def config_from_gguf(g: GGUFFile) -> Zamba2Config:
    md = g.metadata
    a = "zamba2"
    n_head = int(md[f"{a}.attention.head_count"])
    return Zamba2Config(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        hybrid_layers=tuple(int(i) for i in md.get(f"{a}.hybrid_layer_indices", ())),
        n_mem_blocks=int(md.get(f"{a}.shared_block_count", 1)),
        adapter_rank=int(md.get(f"{a}.adapter_rank", 0)),
        qkv_adapter=bool(md.get(f"{a}.attention.qkv_adapter", False)),
        use_rope=bool(md.get(f"{a}.attention.use_rope", False)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        d_inner=int(md[f"{a}.ssm.inner_size"]),
        d_conv=int(md[f"{a}.ssm.conv_kernel"]),
        d_state=int(md[f"{a}.ssm.state_size"]),
        m_head=int(md[f"{a}.ssm.time_step_rank"]),
        n_group=int(md.get(f"{a}.ssm.group_count", 1)),
        dt_min=float(md.get(f"{a}.ssm.time_step_min", 0.001)),
    )


def init_cache(cfg: Zamba2Config, batch: int, max_seq: int, dtype=jnp.bfloat16):
    """Every layer carries mamba state (conv window, ssm state); hybrid
    layers carry the shared block's (k, v) too."""
    layers = []
    for i in range(cfg.n_layer):
        mamba = (
            jnp.zeros((batch, cfg.conv_dim, cfg.d_conv - 1), jnp.float32),
            jnp.zeros((batch, cfg.m_head, cfg.m_head_dim, cfg.d_state),
                      jnp.float32),
        )
        if i in cfg.hybrid_layers:
            mk = lambda: jnp.zeros((batch, cfg.n_head_kv, max_seq, cfg.head_dim),
                                   dtype)  # two arrays: donation forbids aliases
            layers.append(mamba + (mk(), mk()))
        else:
            layers.append(mamba)
    return tuple(layers)


def _grouped_gated_rms(y, z, w, group: int, eps: float):
    """Zamba2RMSNormGated: silu-gate then per-group variance."""
    yf = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
    shp = yf.shape
    g = yf.reshape(*shp[:-1], shp[-1] // group, group)
    v = jnp.mean(g * g, axis=-1, keepdims=True)
    g = g * jax.lax.rsqrt(v + eps)
    return (w * g.reshape(shp).astype(y.dtype).astype(jnp.float32)).astype(y.dtype)


def _mamba_layer(params, cfg: Zamba2Config, pre, h, state):
    """Mamba-2 SSD mixer with the zamba2 dt clamp and grouped gated norm."""
    b, t = h.shape[:2]
    H, P, N, G = cfg.m_head, cfg.m_head_dim, cfg.d_state, cfg.n_group
    proj = _linear(h, params[pre + "ssm_in.weight"])
    z, xBC, dt = jnp.split(proj, [cfg.d_inner, cfg.d_inner + cfg.conv_dim],
                           axis=-1)

    conv_state, ssm_state = state[0], state[1]
    sx = jnp.concatenate([conv_state.astype(xBC.dtype),
                          jnp.swapaxes(xBC, 1, 2)], axis=2)
    new_conv = sx[:, :, -(cfg.d_conv - 1):]
    xc = O.ssm_conv(sx, params[pre + "ssm_conv1d.weight"])
    xc = jax.nn.silu(xc + params[pre + "ssm_conv1d.bias"])

    xs, Bm, Cm = jnp.split(xc, [cfg.d_inner, cfg.d_inner + G * N], axis=-1)
    dtf = jax.nn.softplus(dt.astype(jnp.float32)
                          + params[pre + "ssm_dt.bias"].astype(jnp.float32))
    dtf = jnp.maximum(dtf, cfg.dt_min)  # zamba2: clamp(dt, time_step_min)
    A = -jnp.exp(params[pre + "ssm_a"].astype(jnp.float32))
    xh = xs.astype(jnp.float32).reshape(b, t, H, P)
    rep = H // G
    Bh = jnp.repeat(Bm.astype(jnp.float32).reshape(b, t, G, N), rep, axis=2)
    Ch = jnp.repeat(Cm.astype(jnp.float32).reshape(b, t, G, N), rep, axis=2)

    y, s_out = _ssd_scan(ssm_state, xh, dtf, A, Bh, Ch)
    y = y + xh * params[pre + "ssm_d"].astype(jnp.float32)[None, None, :, None]
    y = y.reshape(b, t, cfg.d_inner).astype(h.dtype)
    y = _grouped_gated_rms(y, z, params[pre + "ssm_norm.weight"],
                           cfg.d_inner // G, cfg.rms_eps)
    out = _linear(y, params[pre + "ssm_out.weight"])
    return out, (new_conv.astype(conv_state.dtype), s_out)


def _adapter(params, name, h):
    """Low-rank un-tied adapter: h @ A^T @ B^T (zero when absent)."""
    a = params.get(name + "_a.weight")
    if a is None:
        return 0.0
    return _linear(_linear(h, a), params[name + "_b.weight"])


def _shared_block(params, cfg: Zamba2Config, bidx: int, pre_use: str, cat,
                  kv_state, positions, cache_len, max_seq):
    """One use of shared transformer block bidx on concat(hidden, embeds)."""
    sp = f"shared.{bidx}."
    h = _rms_norm(cat, params[sp + "attn_norm.weight"], cfg.rms_eps)
    b, t = h.shape[:2]
    hd = cfg.head_dim
    rep = cfg.n_head // cfg.n_head_kv
    dt_ = h.dtype
    q = _linear(h, params[sp + "attn_q.weight"])
    k = _linear(h, params[sp + "attn_k.weight"])
    v = _linear(h, params[sp + "attn_v.weight"])
    if cfg.qkv_adapter:
        q = q + _adapter(params, pre_use + "attn_q_adapter", h)
        k = k + _adapter(params, pre_use + "attn_k_adapter", h)
        v = v + _adapter(params, pre_use + "attn_v_adapter", h)
    q = q.reshape(b, t, cfg.n_head, hd)
    k = k.reshape(b, t, cfg.n_head_kv, hd)
    v = v.reshape(b, t, cfg.n_head_kv, hd)
    if cfg.use_rope:
        q = _rope_half(q, positions, cfg.rope_base)
        k = _rope_half(k, positions, cfg.rope_base)
    q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))

    cache_dtype = kv_state[0].dtype
    kc = _cache_write(kv_state[0], k.astype(cache_dtype), cache_len)
    vc = _cache_write(kv_state[1], v.astype(cache_dtype), cache_len)

    qg = q.reshape(b, cfg.n_head_kv, rep, t, hd)
    # zamba scale: 1/sqrt(head_dim / 2) — the 2x width is an input artifact
    att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                     kc.astype(jnp.float32),
                     preferred_element_type=jnp.float32) * ((hd / 2) ** -0.5)
    kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
    q_pos = positions[:, None, None, :, None]
    att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
    out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)
    out = out.reshape(b, cfg.n_head, t, hd).transpose(0, 2, 1, 3)
    out = _linear(out.reshape(b, t, cfg.n_head * hd).astype(dt_),
                  params[sp + "attn_output.weight"])

    h2 = _rms_norm(out, params[sp + "ffn_norm.weight"], cfg.rms_eps)
    gu = _linear(h2, params[sp + "ffn_gate_up.weight"])
    gu = gu + _adapter(params, pre_use + "ffn_gate_up_adapter", h2)
    gate, up = jnp.split(gu, 2, axis=-1)
    ff = _linear(jax.nn.gelu(gate, approximate=False) * up,
                 params[sp + "ffn_down.weight"])
    return ff, (kc, vc)


def forward(params: dict, cfg: Zamba2Config, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    max_seq = next((cache[i][2].shape[-2] for i in range(cfg.n_layer)
                    if i in cfg.hybrid_layers), 0)
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    orig = x
    new_cache = list(cache)
    use_idx = 0
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        tr = None
        if i in cfg.hybrid_layers:
            bidx = use_idx % cfg.n_mem_blocks
            cat = jnp.concatenate([x, orig], axis=-1)
            ff, kv = _shared_block(params, cfg, bidx, pre, cat,
                                   (new_cache[i][2], new_cache[i][3]),
                                   positions, cache_len, max_seq)
            tr = _linear(ff, params[pre + "hybrid_proj.weight"])
            use_idx += 1
        residual = x
        xin = x if tr is None else x + tr
        h = _rms_norm(xin, params[pre + "attn_norm.weight"], cfg.rms_eps)
        out, mstate = _mamba_layer(params, cfg, pre, h, new_cache[i])
        x = residual + out
        new_cache[i] = mstate + ((kv[0], kv[1]) if tr is not None else ())

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class Zamba2:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: Zamba2Config, max_seq: int = 2048,
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
