"""Gemma-2 family: (1+w) RMSNorm sandwich layers, logit softcapping, and
interleaved sliding-window / global attention.

llama.cpp serves this as arch 'gemma2' (its tensor names are used here:
attn_norm / attn_post_norm / ffn_norm / ffn_post_norm per block); the ggml
ops it leans on — softcap (GGML_OP via ggml_softcap) and the KQ mask — are
golden-gated in ops/core.  Architecture semantics match HF
transformers.models.gemma2.modeling_gemma2:

- embeddings scaled by sqrt(n_embd);
- RMSNorm multiplies by (1 + w) and keeps the product in f32 before the
  downcast (Gemma2RMSNorm);
- every layer is a norm SANDWICH: x += post_norm(block(pre_norm(x)));
- attention: rotate-half rope (theta 10000), scale =
  query_pre_attn_scalar^-0.5 (NOT 1/sqrt(head_dim)), attn-logit softcap
  BEFORE the causal mask, f32 softmax;
- EVEN layers use a sliding window (kv in (q-W, q]), odd layers are global
  (HF layer_types alternation);
- GeGLU ffn (tanh-approx gelu on the gate);
- tied lm head with a final logit softcap.

TPU notes: the sliding window is a positional mask over the static cache —
one compiled program regardless of window/global mix; a ring-buffer cache
(O(W) memory for sliding layers) is a serving optimization the mask
semantics already permit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import (cache_write as _cache_write, dequant_cache as _dq,
                     linear as _linear)
from .llama import _rope_half


@dataclass(frozen=True)
class Gemma2Config:
    n_vocab: int = 256000
    n_ctx: int = 8192
    n_embd: int = 2304
    n_head: int = 8
    n_head_kv: int = 4
    head_dim: int = 256
    n_layer: int = 26
    n_ff: int = 9216
    rope_base: float = 10000.0
    rms_eps: float = 1e-6
    sliding_window: int = 4096
    attn_softcap: float = 50.0  # 0 disables (gemma3, gemma1)
    final_softcap: float = 30.0  # 0 disables (gemma3, gemma1)
    sandwich: bool = True  # False (gemma1): pre-norm only, no post-norms
    query_pre_attn_scalar: float = 256.0
    # gemma3 additions: layers slide except every `sliding_pattern`-th
    # (gemma2 == pattern 2: even slide, odd global; gemma3 == pattern 6),
    # per-head q/k RMSNorm, a separate (smaller) rope base for sliding
    # layers, and linear rope position scaling on the GLOBAL layers only
    sliding_pattern: int = 2
    qk_norm: bool = False
    rope_local_base: float = 0.0  # 0 -> rope_base everywhere
    rope_scale_global: float = 1.0


def config_from_gguf(g: GGUFFile) -> Gemma2Config:
    md = g.metadata
    a = md.get("general.architecture", "gemma2")
    if a not in ("gemma", "gemma2", "gemma3"):
        a = "gemma2"
    g3 = a == "gemma3"
    g1 = a == "gemma"  # v1: pre-norm only, no softcaps, no sliding window
    n_head = int(md[f"{a}.attention.head_count"])
    return Gemma2Config(
        sandwich=not g1,
        sliding_pattern=int(md.get(f"{a}.attention.sliding_window_pattern",
                                   6 if g3 else 2)),
        qk_norm=g3,
        rope_local_base=float(md.get(f"{a}.rope.local_freq_base",
                                     10000.0 if g3 else 0.0)),
        rope_scale_global=float(md.get(f"{a}.rope.scaling.factor", 1.0)),
        n_vocab=int(md.get(f"{a}.vocab_size", 256000)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        head_dim=int(md.get(f"{a}.attention.key_length",
                            int(md[f"{a}.embedding_length"]) // n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)),
        sliding_window=int(md.get(f"{a}.attention.sliding_window",
                                  0 if g1 else 4096)),
        attn_softcap=float(md.get(f"{a}.attn_logit_softcapping",
                                  0.0 if (g3 or g1) else 50.0)),
        final_softcap=float(md.get(f"{a}.final_logit_softcapping",
                                   0.0 if (g3 or g1) else 30.0)),
        query_pre_attn_scalar=float(md.get(
            f"{a}.attention.query_pre_attn_scalar",
            int(md.get(f"{a}.attention.key_length",
                       int(md[f"{a}.embedding_length"]) // n_head)))),
    )


def _rms_norm_gemma(x, w, eps):
    """Gemma2RMSNorm: f32 normalize, multiply by (1 + w) in f32, downcast."""
    xf = x.astype(jnp.float32)
    v = jnp.mean(xf ** 2, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(v + eps) * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def _softcap(s, cap: float):
    return jnp.tanh(s / cap) * cap


def init_cache(cfg: Gemma2Config, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head_kv, max_seq,
                            cfg.head_dim, dtype)


def forward(params: dict, cfg: Gemma2Config, tokens, pos_start, cache, cache_len,
            *, prefill: bool = False):
    """Family-signature forward (serve.Engine drives it directly); per-row
    cache_len vectors supported.  prefill is accepted for signature parity —
    the masked-einsum path keeps softcap + window semantics exact (the
    fused flash kernel supports softcap for inference, but the per-layer
    window alternation is simplest as one positional mask)."""
    del prefill
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens] * np.sqrt(cfg.n_embd).astype(np.float32)
    dt = x.dtype
    rep = cfg.n_head // cfg.n_head_kv
    scale = cfg.query_pre_attn_scalar ** -0.5

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm_gemma(x, params[pre + "attn_norm.weight"], cfg.rms_eps)

        q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, t, cfg.n_head, cfg.head_dim)
        k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, t, cfg.n_head_kv, cfg.head_dim)
        v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, t, cfg.n_head_kv, cfg.head_dim)

        if cfg.qk_norm:  # gemma3: per-head (1+w) RMSNorm before rope
            q = _rms_norm_gemma(q, params[pre + "attn_q_norm.weight"], cfg.rms_eps)
            k = _rms_norm_gemma(k, params[pre + "attn_k_norm.weight"], cfg.rms_eps)

        sliding = i % cfg.sliding_pattern != cfg.sliding_pattern - 1
        base = cfg.rope_local_base if (sliding and cfg.rope_local_base) else cfg.rope_base
        # linear rope context scaling applies to the GLOBAL layers only
        rp = positions if (sliding or cfg.rope_scale_global == 1.0) else (
            positions.astype(jnp.float32) / cfg.rope_scale_global)
        q = _rope_half(q, rp, base).transpose(0, 2, 1, 3)
        k = _rope_half(k, rp, base).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        qg = q.reshape(b, cfg.n_head_kv, rep, t, cfg.head_dim)
        att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                         _dq(kc).astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
        if cfg.attn_softcap:
            att = _softcap(att, cfg.attn_softcap)
        kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
        q_pos = positions[:, None, None, :, None]
        keep = kv_pos <= q_pos
        if sliding and cfg.sliding_window:  # gemma2: 1:1, gemma3: 5:1; gemma1: none
            keep = keep & (kv_pos > q_pos - cfg.sliding_window)
        att = jnp.where(keep, att, -jnp.inf)
        vcd = _dq(vc)  # q8_kv cache: dequantize on read (XLA fuses the mul)
        att = jax.nn.softmax(att, axis=-1).astype(vcd.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vcd)
        out = out.reshape(b, cfg.n_head, t, cfg.head_dim).transpose(0, 2, 1, 3)
        attn_out = out.reshape(b, t, cfg.n_head * cfg.head_dim).astype(dt)
        o = _linear(attn_out, params[pre + "attn_output.weight"])
        x = x + (_rms_norm_gemma(o, params[pre + "attn_post_norm.weight"],
                                 cfg.rms_eps) if cfg.sandwich else o)

        h = _rms_norm_gemma(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        gate = _linear(h, params[pre + "ffn_gate.weight"])
        up = _linear(h, params[pre + "ffn_up.weight"])
        f = _linear(jax.nn.gelu(gate, approximate=True) * up,
                    params[pre + "ffn_down.weight"])
        x = x + (_rms_norm_gemma(f, params[pre + "ffn_post_norm.weight"],
                                 cfg.rms_eps) if cfg.sandwich else f)

    x = _rms_norm_gemma(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])  # tied
    if "output.weight" not in params and "token_embd.weight@dense" in params:
        w_out = params["token_embd.weight@dense"]
    logits = _linear(x, w_out).astype(jnp.float32)
    if cfg.final_softcap:
        logits = _softcap(logits, cfg.final_softcap)
    return logits, tuple(new_cache)


class Gemma2:
    """Inference wrapper: compiled step + on-device greedy decode loop."""

    def __init__(self, params: dict, cfg: Gemma2Config, max_seq: int = 2048,
                 batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_seq = max_seq
        self.batch = batch

        def step(params, tokens, pos_start, cache, cache_len):
            return forward(params, cfg, tokens, pos_start, cache, cache_len)

        self._step = jax.jit(step, donate_argnums=(3,))

        def decode_loop(params, cache, first_token, n_past, steps_tokens):
            def body(carry, _):
                cache, tok, n_past = carry
                pos0 = jnp.full((tok.shape[0],), n_past, jnp.int32)
                logits, cache = forward(params, cfg, tok, pos0, cache, n_past)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
                return (cache, nxt, n_past + 1), nxt[:, 0]

            (cache, tok, n_past), toks = jax.lax.scan(
                body, (cache, first_token, n_past), steps_tokens
            )
            return cache, toks

        self._decode_loop = jax.jit(decode_loop, donate_argnums=(1,))

    @classmethod
    def from_gguf(cls, path, dtype=jnp.bfloat16, keep_quantized: bool = True, **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        return cls(load_params(g, dtype, keep_quantized=keep_quantized),
                   config_from_gguf(g), **kw)

    def new_cache(self, dtype=jnp.bfloat16):
        return init_cache(self.cfg, self.batch, self.max_seq, dtype)

    def prefill(self, cache, tokens: np.ndarray):
        tokens = np.asarray(tokens)
        b, t = tokens.shape
        logits, cache = self._step(
            self.params, jnp.asarray(tokens), jnp.zeros((b,), jnp.int32),
            cache, jnp.int32(0),
        )
        return logits[:, -1, :], cache, t

    def decode_greedy(self, cache, first_token, n_past: int, n_tokens: int):
        cache, toks = self._decode_loop(
            self.params, cache, jnp.asarray(first_token), jnp.int32(n_past),
            jnp.zeros((n_tokens,), jnp.int32),
        )
        return cache, np.asarray(toks)

    def generate(self, prompt_tokens: np.ndarray, n_tokens: int, sampler=None, key=None):
        if sampler is not None:
            from .common import generate

            return generate(self, prompt_tokens, n_tokens, sampler=sampler,
                            key=key, cache_dtype=jnp.float32)
        cache = self.new_cache(jnp.float32)
        logits, cache, n_past = self.prefill(cache, prompt_tokens)
        first = np.argmax(np.asarray(logits), -1).astype(np.int32)[:, None]
        cache, toks = self.decode_greedy(cache, first, n_past, n_tokens - 1)
        return [int(first[0, 0])] + [int(x) for x in toks.reshape(-1)]
