"""Falcon family (llama.cpp arch 'falcon'): parallel attention+MLP residual
with MULTI-QUERY attention (n_head_kv=1, the 7B shape) or grouped KV with
separate attn/mlp LayerNorms (new_decoder_architecture, the 40B shape),
full-head NeoX rotary, bias-free projections, erf GELU, tied lm head.

Architecture semantics match HF transformers.models.falcon
(FalconForCausalLM, alibi=False).  Reference analog: rope mode 2 (NeoX,
/root/reference/include/ggml.h:1443-1463); MQA is the extreme point of the
GQA head-repeat the other families use.

The HF fused query_key_value layout ([q heads | k | v] for the 7B shape,
per-kv-group interleaved for the 40B shape) is de-interleaved by the
converter into plain attn_q/k/v.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import layer_norm as _layer_norm
from .common import linear as _linear
from .llama import _rope_half


@dataclass(frozen=True)
class FalconConfig:
    n_vocab: int = 65024
    n_ctx: int = 2048
    n_embd: int = 4544
    n_head: int = 71
    n_head_kv: int = 1  # MQA (7B); 40B uses 8 (GQA)
    n_layer: int = 32
    rope_base: float = 10000.0
    eps: float = 1e-5
    dual_norm: bool = False  # 40B new_decoder_architecture: ln_attn + ln_mlp

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def config_from_gguf(g: GGUFFile) -> FalconConfig:
    md = g.metadata
    a = "falcon"
    n_head = int(md[f"{a}.attention.head_count"])
    return FalconConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 65024)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", 1)),
        n_layer=int(md[f"{a}.block_count"]),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        eps=float(md.get(f"{a}.attention.layer_norm_epsilon", 1e-5)),
        dual_norm=f"blk.0.attn_norm_2.weight" in g.tensors,
    )


def init_cache(cfg: FalconConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head_kv, max_seq,
                            cfg.head_dim, dtype)


def forward(params: dict, cfg: FalconConfig, tokens, pos_start, cache, cache_len,
            *, prefill: bool = False):
    """Family-signature forward; per-row cache_len vectors supported."""
    del prefill
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    dt = x.dtype
    rep = cfg.n_head // cfg.n_head_kv
    scale = 1.0 / np.sqrt(cfg.head_dim)

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _layer_norm(x, params[pre + "attn_norm.weight"],
                        params[pre + "attn_norm.bias"], cfg.eps)

        q = _linear(h, params[pre + "attn_q.weight"]).reshape(
            b, t, cfg.n_head, cfg.head_dim)
        k = _linear(h, params[pre + "attn_k.weight"]).reshape(
            b, t, cfg.n_head_kv, cfg.head_dim)
        v = _linear(h, params[pre + "attn_v.weight"]).reshape(
            b, t, cfg.n_head_kv, cfg.head_dim)

        q = _rope_half(q, positions, cfg.rope_base).transpose(0, 2, 1, 3)
        k = _rope_half(k, positions, cfg.rope_base).transpose(0, 2, 1, 3)
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
        att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)
        out = out.reshape(b, cfg.n_head, t, cfg.head_dim).transpose(0, 2, 1, 3)
        attn_out = out.reshape(b, t, cfg.n_embd).astype(dt)
        attn_out = _linear(attn_out, params[pre + "attn_output.weight"])

        # parallel residual; the MLP input is ln_mlp(x) when dual_norm
        # (40B) or the SAME shared h (7B)
        h_mlp = (_layer_norm(x, params[pre + "attn_norm_2.weight"],
                             params[pre + "attn_norm_2.bias"], cfg.eps)
                 if cfg.dual_norm else h)
        ff = _linear(h_mlp, params[pre + "ffn_up.weight"])
        ff = jax.nn.gelu(ff, approximate=False)
        ff = _linear(ff, params[pre + "ffn_down.weight"])

        x = x + attn_out + ff

    x = _layer_norm(x, params["output_norm.weight"], params["output_norm.bias"],
                    cfg.eps)
    w_out = params.get("output.weight")
    if w_out is None:  # tied
        w_out = params.get("token_embd.weight@dense", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class Falcon:
    """Inference wrapper: compiled step + on-device greedy decode loop."""

    def __init__(self, params: dict, cfg: FalconConfig, max_seq: int = 2048,
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
