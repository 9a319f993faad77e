"""MPT family (llama.cpp arch 'mpt') — MosaicML's ALiBi decoder: bias-free
everywhere (LayerNorms carry weight only), straight-concat fused Wqkv with
an optional qkv CLAMP (gguf mpt.attention.clamp_kqv, ggml_clamp analog),
exact-erf GELU MLP at 4x width, tied lm head.

Architecture (HF transformers.models.mpt.modeling_mpt):
  per layer: h = LN1(x); x = x + O(attn(clamp(Wqkv h)));
             h = LN2(x); x = x + W2 gelu_erf(W1 h)
ALiBi slopes follow the same max_bias=8 two-geometric-sequence recipe as
BLOOM (ops.core.alibi_slopes == HF build_mpt_alibi_tensor after its
odd/even reorder); HF anchors the bias at the LAST key position, ours at
absolute key positions — a per-matrix constant shift that softmax ignores.

TPU notes: identical shape discipline to models.bloom; the clamp is one
fused VPU op between the qkv matmul and the head split.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from ..ops.core import alibi_slopes
from .common import cache_write as _cache_write
from .common import linear as _linear


@dataclass(frozen=True)
class MPTConfig:
    n_vocab: int = 50432
    n_ctx: int = 2048
    n_embd: int = 4096
    n_head: int = 32
    n_layer: int = 32
    n_ff: int = 16384
    max_alibi_bias: float = 8.0
    clamp_kqv: float = 0.0  # 0 = no clamp
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.n_embd // self.n_head

    @property
    def n_head_kv(self):
        return self.n_head


def config_from_gguf(g: GGUFFile) -> MPTConfig:
    md = g.metadata
    a = "mpt"
    return MPTConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 50432)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=int(md[f"{a}.attention.head_count"]),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        max_alibi_bias=float(md.get(f"{a}.attention.max_alibi_bias", 8.0)),
        clamp_kqv=float(md.get(f"{a}.attention.clamp_kqv", 0.0)),
        eps=float(md.get(f"{a}.attention.layer_norm_epsilon", 1e-5)),
    )


def init_cache(cfg: MPTConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head, max_seq,
                            cfg.head_dim, dtype)


def _ln_nobias(x, w, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * w


def forward(params: dict, cfg: MPTConfig, tokens, pos_start, cache, cache_len,
            *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    dt = x.dtype
    scale = cfg.head_dim ** -0.5
    slopes = alibi_slopes(cfg.n_head, cfg.max_alibi_bias)
    kv_pos = jnp.arange(max_seq)
    bias = (slopes[None, :, None, None]
            * kv_pos.astype(jnp.float32)[None, None, None, :])

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _ln_nobias(x, params[pre + "attn_norm.weight"], cfg.eps)
        q = _linear(h, params[pre + "attn_q.weight"])
        k = _linear(h, params[pre + "attn_k.weight"])
        v = _linear(h, params[pre + "attn_v.weight"])
        if cfg.clamp_kqv:
            c = cfg.clamp_kqv
            q, k, v = (jnp.clip(z, -c, c) for z in (q, k, v))
        q = q.reshape(b, t, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)

        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        att = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                         kc.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
        att = att + bias
        keep = kv_pos[None, None, None, :] <= positions[:, None, :, None]
        att = jnp.where(keep, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vc).transpose(0, 2, 1, 3)
        attn_out = out.reshape(b, t, cfg.n_embd).astype(dt)
        x = x + _linear(attn_out, params[pre + "attn_output.weight"])

        h = _ln_nobias(x, params[pre + "ffn_norm.weight"], cfg.eps)
        ff = jax.nn.gelu(_linear(h, params[pre + "ffn_up.weight"]),
                         approximate=False)
        x = x + _linear(ff, params[pre + "ffn_down.weight"])

    x = _ln_nobias(x, params["output_norm.weight"], cfg.eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class MPT:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: MPTConfig, max_seq: int = 2048,
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
