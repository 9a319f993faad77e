"""JetMoE family (HF arch 'jetmoe', JetMoE-8B) — Mixture of Attention
heads (MoA) + MoE MLP: every layer routes each token to top-k ATTENTION
experts (per-expert query and output projections around a SHARED kv
projection — the token attends once per selected expert, gated by the
softmax over its top-k router logits) and to top-k MLP experts (fused
gate|up silu blobs), both with an output bias.

TPU-first mapping: routing is dense-over-experts — one-hot expert masks
turn the per-expert gathers into mul_mat_id-shaped einsums (see
models/llama.moe_ffn_block for the rationale), so q/k/v stay batched on
the MXU and decode streams every expert anyway.  Matches HF
transformers.models.jetmoe (JetMoeForCausalLM, eager path; norms use
the module's fixed eps=1e-6 regardless of config.rms_norm_eps).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import linear as _linear
from .llama import _rms_norm, _rope_half


@dataclass(frozen=True)
class JetMoeConfig:
    n_vocab: int = 32000
    n_ctx: int = 4096
    n_embd: int = 2048
    n_head_kv: int = 16
    head_dim: int = 128  # kv_channels
    n_layer: int = 24
    n_ff: int = 5632
    n_expert: int = 8
    n_expert_used: int = 2  # top_k: q heads = top_k * n_head_kv
    rope_base: float = 10000.0
    eps: float = 1e-6

    @property
    def kv_proj(self):
        return self.n_head_kv * self.head_dim


def config_from_gguf(g: GGUFFile) -> JetMoeConfig:
    md = g.metadata
    a = "jetmoe"
    return JetMoeConfig(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head_kv=int(md[f"{a}.attention.head_count_kv"]),
        head_dim=int(md[f"{a}.attention.key_length"]),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_expert=int(md[f"{a}.expert_count"]),
        n_expert_used=int(md[f"{a}.expert_used_count"]),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)),
    )


def init_cache(cfg: JetMoeConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head_kv, max_seq,
                            cfg.head_dim, dtype)


def _route(params, name, h, cfg: JetMoeConfig):
    """Top-k routing: softmax over the selected logits (JetMoeTopKGating).
    Returns (onehot (b,t,k,E), gates (b,t,k))."""
    logits = jnp.einsum("btd,ed->bte", h.astype(jnp.float32),
                        params[name].astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)
    top, idx = jax.lax.top_k(logits, cfg.n_expert_used)
    gates = jax.nn.softmax(top, axis=-1).astype(h.dtype)
    onehot = jax.nn.one_hot(idx, cfg.n_expert, dtype=h.dtype)
    return onehot, gates


def _attn_layer(params, cfg: JetMoeConfig, pre, h, state, positions, cache_len,
                max_seq):
    b, t = h.shape[:2]
    hd, Hkv, k = cfg.head_dim, cfg.n_head_kv, cfg.n_expert_used
    dt_ = h.dtype
    onehot, gates = _route(params, pre + "attn_router.weight", h, cfg)

    # per-slot query: q_j = W_q^{e_j} x  (dense over experts + one-hot mask)
    q_all = jnp.einsum("btd,evd->btev", h, params[pre + "attn_qexp.weight"])
    q = jnp.einsum("btev,btke->btkv", q_all, onehot)  # (b,t,k,kv_proj)
    kv = _linear(h, params[pre + "attn_kv.weight"])
    kk, vv = jnp.split(kv, 2, axis=-1)

    q = q.reshape(b, t, k * Hkv, hd)
    kk = kk.reshape(b, t, Hkv, hd)
    vv = vv.reshape(b, t, Hkv, hd)
    q = _rope_half(q, positions, cfg.rope_base).transpose(0, 2, 1, 3)
    kk = _rope_half(kk, positions, cfg.rope_base).transpose(0, 2, 1, 3)
    vv = vv.transpose(0, 2, 1, 3)

    cache_dtype = state[0].dtype
    kc = _cache_write(state[0], kk.astype(cache_dtype), cache_len)
    vc = _cache_write(state[1], vv.astype(cache_dtype), cache_len)

    # expert-major q head blocks share the Hkv kv heads (HF repeat(top_k))
    qg = q.reshape(b, k, Hkv, t, hd).transpose(0, 2, 1, 3, 4)  # (b,Hkv,k,t,hd)
    att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                     kc.astype(jnp.float32),
                     preferred_element_type=jnp.float32) * (hd ** -0.5)
    kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
    q_pos = positions[:, None, None, :, None]
    att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
    out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)  # (b,Hkv,k,t,hd)
    out = out.transpose(0, 3, 2, 1, 4).reshape(b, t, k, cfg.kv_proj).astype(dt_)

    # per-slot output expert, gated, summed (MoA.reduce)
    y = jnp.einsum("btkv,btk,btke->btev", out, gates, onehot)
    proj = jnp.einsum("btev,edv->btd", y, params[pre + "attn_oexp.weight"])
    return proj + params[pre + "attn_moa_bias"], (kc, vc)


def _moe_layer(params, cfg: JetMoeConfig, pre, h):
    """Gates scale the expert OUTPUT (after the silu), so the selected-copy
    inputs are unscaled and the gate multiplies at the end."""
    onehot, gates = _route(params, pre + "ffn_gate_inp.weight", h, cfg)
    x_sel = jnp.einsum("btd,btke->bted", h, onehot)  # (b,t,E,d) selected copies
    g = jnp.einsum("bted,efd->btef", x_sel, params[pre + "ffn_gate_exps.weight"])
    u = jnp.einsum("bted,efd->btef", x_sel, params[pre + "ffn_up_exps.weight"])
    act = jax.nn.silu(g) * u
    y = jnp.einsum("btef,edf->bted", act, params[pre + "ffn_down_exps.weight"])
    gate_e = jnp.einsum("btke,btk->bte", onehot, gates)  # per-expert gate
    out = jnp.einsum("bted,bte->btd", y, gate_e)
    return out + params[pre + "ffn_bias"]


def forward(params: dict, cfg: JetMoeConfig, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    max_seq = cache[0][0].shape[-2]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.eps)
        out, new_cache[i] = _attn_layer(params, cfg, pre, h, new_cache[i],
                                        positions, cache_len, max_seq)
        x = x + out
        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.eps)
        x = x + _moe_layer(params, cfg, pre, h)

    x = _rms_norm(x, params["output_norm.weight"], cfg.eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class JetMoe:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: JetMoeConfig, max_seq: int = 2048,
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
