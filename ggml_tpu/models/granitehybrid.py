"""GraniteMoeHybrid family (IBM Granite 4.0, HF arch 'granitemoehybrid')
— Mamba-2 SSD layers + periodic GQA attention with NO positional
encoding (NoPE default; optional rope), granite's fixed scalar
multipliers (embedding/residual/attention/logits), and an FFN that is a
shared GeGLU MLP plus an OPTIONAL granitemoe-style MoE (softmax over the
top-k router logits; fused gate|up expert blobs) — num_local_experts=0
checkpoints (Granite-4.0-Micro) run just the shared MLP.

Reuses models.bamba._mamba_layer for the SSD mixer (identical HF
BambaMixer semantics) and models.llama.moe_ffn_block for the routed
experts (granitemoe gating == softmax-all-then-topk-renorm).  The mixed
cache + exact-length engine prefill follow models.bamba.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .bamba import _mamba_layer
from .common import cache_write as _cache_write
from .common import linear as _linear
from .llama import _rms_norm, _rope_half, moe_ffn_block


@dataclass(frozen=True)
class GraniteHybridConfig:
    n_vocab: int = 49160
    n_ctx: int = 131072
    n_embd: int = 1536
    n_head: int = 12
    n_head_kv: int = 4
    n_layer: int = 40
    n_ff: int = 512  # routed-expert width
    n_ff_shared: int = 4096  # shared MLP width
    rope_base: float = 10000.0
    use_rope: bool = False  # granite 4.0 attention is NoPE by default
    rms_eps: float = 1e-5
    attn_layers: tuple = ()
    # granite scalar multipliers
    embd_scale: float = 1.0
    resid_scale: float = 1.0
    attn_scale: float = 0.0  # 0 -> default 1/sqrt(head_dim)
    logit_scale: float = 1.0  # logits are DIVIDED by this
    # moe_ffn_block contract (granitemoe: softmax over top-k logits)
    n_expert: int = 0
    n_expert_used: int = 0
    moe_renorm: bool = True
    moe_shared: bool = False
    # mamba2 mixer geometry (bamba contract)
    d_inner: int = 3072
    d_conv: int = 4
    d_state: int = 128
    m_head: int = 48
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


def config_from_gguf(g: GGUFFile) -> GraniteHybridConfig:
    md = g.metadata
    a = "granitehybrid"
    n_head = int(md[f"{a}.attention.head_count"])
    return GraniteHybridConfig(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md.get(f"{a}.expert_feed_forward_length", 0)),
        n_ff_shared=int(md[f"{a}.feed_forward_length"]),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        use_rope=bool(md.get(f"{a}.attention.use_rope", False)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        attn_layers=tuple(int(i) for i in md.get(f"{a}.attention.layer_indices", ())),
        embd_scale=float(md.get(f"{a}.embedding_scale", 1.0)),
        resid_scale=float(md.get(f"{a}.residual_scale", 1.0)),
        attn_scale=float(md.get(f"{a}.attention.scale", 0.0)),
        logit_scale=float(md.get(f"{a}.logit_scale", 1.0)),
        n_expert=int(md.get(f"{a}.expert_count", 0)),
        n_expert_used=int(md.get(f"{a}.expert_used_count", 0)),
        d_inner=int(md[f"{a}.ssm.inner_size"]),
        d_conv=int(md[f"{a}.ssm.conv_kernel"]),
        d_state=int(md[f"{a}.ssm.state_size"]),
        m_head=int(md[f"{a}.ssm.time_step_rank"]),
        n_group=int(md.get(f"{a}.ssm.group_count", 1)),
    )


def init_cache(cfg: GraniteHybridConfig, batch: int, max_seq: int,
               dtype=jnp.bfloat16):
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


def _attn_layer(params, cfg: GraniteHybridConfig, pre, h, state, positions,
                cache_len, max_seq):
    """GQA with granite's fixed attention_multiplier; NoPE by default."""
    b, t = h.shape[:2]
    hd = cfg.head_dim
    rep = cfg.n_head // cfg.n_head_kv
    dt_ = h.dtype
    scale = cfg.attn_scale or hd ** -0.5
    q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, t, cfg.n_head, hd)
    k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, t, cfg.n_head_kv, hd)
    if cfg.use_rope:
        q = _rope_half(q, positions, cfg.rope_base)
        k = _rope_half(k, positions, cfg.rope_base)
    q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))

    cache_dtype = state[0].dtype
    kc = _cache_write(state[0], k.astype(cache_dtype), cache_len)
    vc = _cache_write(state[1], v.astype(cache_dtype), cache_len)

    qg = q.reshape(b, cfg.n_head_kv, rep, t, hd)
    att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                     kc.astype(jnp.float32),
                     preferred_element_type=jnp.float32) * scale
    kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
    q_pos = positions[:, None, None, :, None]
    att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
    out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)
    out = out.reshape(b, cfg.n_head, t, hd).transpose(0, 2, 1, 3)
    out = _linear(out.reshape(b, t, cfg.n_head * hd).astype(dt_),
                  params[pre + "attn_output.weight"])
    return out, (kc, vc)


def forward(params: dict, cfg: GraniteHybridConfig, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    max_seq = next((cache[i][0].shape[-2] for i in range(cfg.n_layer)
                    if i in cfg.attn_layers), 0)
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens] * jnp.asarray(cfg.embd_scale, embd.dtype)
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
        if i in cfg.attn_layers:
            out, new_cache[i] = _attn_layer(params, cfg, pre, h, new_cache[i],
                                            positions, cache_len, max_seq)
        else:
            out, new_cache[i] = _mamba_layer(params, cfg, pre, h, new_cache[i])
        x = x + out * cfg.resid_scale

        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        # shared GeGLU MLP always on; routed experts added when present
        gate = _linear(h, params[pre + "ffn_gate_shexp.weight"])
        up = _linear(h, params[pre + "ffn_up_shexp.weight"])
        ff = _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down_shexp.weight"])
        if cfg.n_expert > 0:
            ff = ff + moe_ffn_block(params, pre, h, cfg)
        x = x + ff * cfg.resid_scale

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    if cfg.logit_scale != 1.0:
        logits = logits / cfg.logit_scale
    return logits, tuple(new_cache)


class GraniteHybrid:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: GraniteHybridConfig,
                 max_seq: int = 2048, batch: int = 1):
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
