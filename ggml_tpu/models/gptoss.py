"""GPT-OSS family (llama.cpp arch 'gpt-oss') — OpenAI's open-weight MoE:
attention SINKS (a learned per-head logit that joins the softmax and soaks
probability mass, then is dropped), alternating sliding/full attention
(even layers slide), biased q/k/v/o projections, and an all-MoE FFN stack
with the clamped gate: glu = min(gate,7)*sigmoid(1.702*min(gate,7)),
out = (clamp(up,±7)+1)*glu, per-expert biases, router softmax over the
top-k logits.

Architecture semantics match HF transformers.models.gpt_oss.  Rope is
rotate-half (llama convention); the released checkpoints use YaRN scaling,
which rides the same ggml-yarn machinery as the llama family
(rope_scaling KVs).

TPU notes: sinks fold into the softmax as one extra column — implemented
as exp-normalize against max(logits, sink) so one fused program handles
it; MoE runs gate-masked dense at decode and the sorted ragged grouped
GEMM at prefill (the converter de-interleaves HF's fused gate_up tensor
into the repo's stacked (E, F, D) layout offline).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import linear as _linear
from .llama import _rms_norm, _rope_half, _rope_half_scaled, moe_topk


@dataclass(frozen=True)
class GptOssConfig:
    n_vocab: int = 201088
    n_ctx: int = 131072
    n_embd: int = 2880
    n_head: int = 64
    n_head_kv: int = 8
    head_dim: int = 64
    n_layer: int = 24
    n_ff: int = 2880
    n_expert: int = 32
    n_expert_used: int = 4
    sliding_window: int = 128
    rope_base: float = 150000.0
    rope_scaling: str = "none"
    rope_scale: float = 1.0
    n_ctx_orig: int = 0
    rms_eps: float = 1e-5
    swiglu_limit: float = 7.0
    swiglu_alpha: float = 1.702


def config_from_gguf(g: GGUFFile) -> GptOssConfig:
    md = g.metadata
    a = "gpt-oss"
    n_head = int(md[f"{a}.attention.head_count"])
    return GptOssConfig(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        head_dim=int(md.get(f"{a}.attention.key_length",
                            int(md[f"{a}.embedding_length"]) // n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_expert=int(md[f"{a}.expert_count"]),
        n_expert_used=int(md[f"{a}.expert_used_count"]),
        sliding_window=int(md.get(f"{a}.attention.sliding_window", 128)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 150000.0)),
        rope_scaling=str(md.get(f"{a}.rope.scaling.type", "none")),
        rope_scale=float(md.get(f"{a}.rope.scaling.factor", 1.0)),
        n_ctx_orig=int(md.get(f"{a}.rope.scaling.original_context_length", 0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
    )


def _oai_glu(gate, up, limit: float, alpha: float):
    """GPT-OSS clamped SwiGLU: gate capped above, up clamped both ways,
    (up + 1) * gate * sigmoid(alpha * gate)."""
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    return (up + 1.0) * gate * jax.nn.sigmoid(alpha * gate)


def moe_block(params, pre, h, cfg: GptOssConfig):
    """Router (biased linear, softmax over top-k) + clamped-SwiGLU experts
    with per-expert biases.  Weight layout (converter): ffn_gate_exps /
    ffn_up_exps (E, F, D) + .bias (E, F); ffn_down_exps (E, D, F) + (E, D)."""
    router = (_linear(h, params[pre + "ffn_gate_inp.weight"])
              + params[pre + "ffn_gate_inp.bias"])
    probs, idx = moe_topk(router, cfg.n_expert_used)  # softmax over top-k
    w_gate = params[pre + "ffn_gate_exps.weight"]
    b_gate = params[pre + "ffn_gate_exps.bias"]
    w_up = params[pre + "ffn_up_exps.weight"]
    b_up = params[pre + "ffn_up_exps.bias"]
    w_down = params[pre + "ffn_down_exps.weight"]
    b_down = params[pre + "ffn_down_exps.bias"]
    hp = jax.lax.Precision.HIGHEST

    n_tokens = h.shape[0] * h.shape[1]
    mode = os.environ.get("GGML_TPU_MOE_GROUPED", "auto")
    if mode == "1" or (mode == "auto" and n_tokens >= 16):
        return _moe_grouped(h, w_gate, b_gate, w_up, b_up, w_down, b_down,
                            probs, idx, cfg)

    onehot = jax.nn.one_hot(idx, cfg.n_expert, dtype=jnp.float32)
    gates = jnp.einsum("btk,btke->bte", probs, onehot)
    hg = jnp.einsum("btd,efd->btef", h, w_gate, precision=hp) + b_gate
    hu = jnp.einsum("btd,efd->btef", h, w_up, precision=hp) + b_up
    y = _oai_glu(hg, hu, cfg.swiglu_limit, cfg.swiglu_alpha)
    y = jnp.einsum("btef,edf->bted", y, w_down, precision=hp) + b_down
    return jnp.einsum("bted,bte->btd", y, gates.astype(y.dtype)).astype(h.dtype)


def _moe_grouped(h, w_gate, b_gate, w_up, b_up, w_down, b_down, probs, idx,
                 cfg: GptOssConfig):
    """Sorted ragged grouped GEMM (see llama.moe_expert_sum_grouped) with
    the GPT-OSS per-expert biases gathered per row."""
    b, t, d = h.shape
    k = idx.shape[-1]
    n = b * t
    flat_e = idx.reshape(n * k)
    order = jnp.argsort(flat_e, stable=True)
    e_sorted = flat_e[order]
    tok = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)[order]
    xs = h.reshape(n, d)[tok]
    gsz = jnp.bincount(flat_e, length=cfg.n_expert)
    dn = jax.lax.RaggedDotDimensionNumbers(
        dot_dimension_numbers=(((1,), (2,)), ((), ())),
        lhs_ragged_dimensions=[0], rhs_group_dimensions=[0])
    rdot = lambda a, w: jax.lax.ragged_dot_general(
        a, w, gsz, dn, precision=jax.lax.Precision.HIGHEST)
    hg = rdot(xs, w_gate) + b_gate[e_sorted]
    hu = rdot(xs, w_up) + b_up[e_sorted]
    y = _oai_glu(hg, hu, cfg.swiglu_limit, cfg.swiglu_alpha)
    down = rdot(y, w_down.astype(y.dtype)) + b_down[e_sorted]
    wts = probs.reshape(n * k)[order]
    out = jnp.zeros((n, d), down.dtype).at[tok].add(down * wts[:, None].astype(down.dtype))
    return out.reshape(b, t, d).astype(h.dtype)


def init_cache(cfg: GptOssConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head_kv, max_seq,
                            cfg.head_dim, dtype)


def forward(params: dict, cfg: GptOssConfig, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    dt = x.dtype
    rep = cfg.n_head // cfg.n_head_kv
    scale = cfg.head_dim ** -0.5

    def rope(z):
        if cfg.rope_scaling in ("none", ""):
            return _rope_half(z, positions, cfg.rope_base)
        return _rope_half_scaled(z, positions, cfg)

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
        q = _linear(h, params[pre + "attn_q.weight"], params[pre + "attn_q.bias"]).reshape(
            b, t, cfg.n_head, cfg.head_dim)
        k = _linear(h, params[pre + "attn_k.weight"], params[pre + "attn_k.bias"]).reshape(
            b, t, cfg.n_head_kv, cfg.head_dim)
        v = _linear(h, params[pre + "attn_v.weight"], params[pre + "attn_v.bias"]).reshape(
            b, t, cfg.n_head_kv, cfg.head_dim)

        q = rope(q).transpose(0, 2, 1, 3)
        k = rope(k).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        qg = q.reshape(b, cfg.n_head_kv, rep, t, cfg.head_dim)
        att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                         kc.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
        kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
        q_pos = positions[:, None, None, :, None]
        keep = kv_pos <= q_pos
        if i % 2 == 0:  # HF layer_types: even layers slide, odd are full
            keep = keep & (kv_pos > q_pos - cfg.sliding_window)
        att = jnp.where(keep, att, -jnp.inf)

        # attention sinks: one learned extra logit per head joins the
        # softmax, its probability mass is dropped from the value sum
        sink = params[pre + "attn_sinks.weight"].astype(jnp.float32).reshape(
            1, cfg.n_head_kv, rep, 1, 1)
        m = jnp.maximum(jnp.max(att, axis=-1, keepdims=True), sink)
        e = jnp.exp(att - m)
        denom = e.sum(-1, keepdims=True) + jnp.exp(sink - m)
        att = (e / denom).astype(vc.dtype)

        out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)
        out = out.reshape(b, cfg.n_head, t, cfg.head_dim).transpose(0, 2, 1, 3)
        attn_out = out.reshape(b, t, cfg.n_head * cfg.head_dim).astype(dt)
        x = x + _linear(attn_out, params[pre + "attn_output.weight"],
                        params[pre + "attn_output.bias"])

        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        x = x + moe_block(params, pre, h, cfg)

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class GptOss:
    """Inference wrapper (mirrors models.llama.Llama)."""

    def __init__(self, params: dict, cfg: GptOssConfig, max_seq: int = 2048,
                 batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_seq = max_seq
        self.batch = batch

        self._step = jax.jit(
            lambda p, tok, pos, cache, clen:
            forward(p, cfg, tok, pos, cache, clen, prefill=True),
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
    def from_gguf(cls, path, dtype=jnp.float32, keep_quantized: bool = False,
                  **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        return cls(load_params(g, dtype, keep_quantized=keep_quantized),
                   config_from_gguf(g), **kw)

    def new_cache(self, dtype=jnp.bfloat16):
        return init_cache(self.cfg, self.batch, self.max_seq, dtype)

    def prefill(self, cache, tokens: np.ndarray):
        pos0 = jnp.zeros((tokens.shape[0],), jnp.int32)
        logits, cache = self._step(self.params, jnp.asarray(tokens), pos0,
                                   cache, jnp.int32(0))
        return logits[:, -1, :], cache, tokens.shape[1]

    def decode_greedy(self, cache, first_token, n_past: int, n_tokens: int):
        dummy = jnp.zeros((n_tokens,), jnp.int32)
        cache, toks = self._decode_loop(
            self.params, cache, jnp.asarray(first_token), jnp.int32(n_past), dummy)
        return cache, np.asarray(toks)

    def generate(self, prompt_tokens: np.ndarray, n_tokens: int, sampler=None,
                 key=None):
        from .common import generate

        return generate(self, prompt_tokens, n_tokens, sampler=sampler, key=key)
