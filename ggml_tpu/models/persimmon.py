"""Persimmon family (llama.cpp arch 'persimmon', Adept Persimmon-8B — the
Fuyu text backbone) — MHA decoder with per-head q/k LAYERNORM (weight AND
bias), partial rotate-half rope, biases on every projection, and a
non-gated relu² MLP; LayerNorm everywhere, untied head.

HF stores qkv fused and per-head INTERLEAVED ((H, 3, hd) blocks); the
converter de-interleaves into plain attn_q/attn_k/attn_v so the forward
is the standard family shape.  Matches HF
transformers.models.persimmon (PersimmonForCausalLM).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import init_layer_cache
from .common import layer_norm as _layer_norm
from .common import linear as _linear
from .phi2 import _rope_half_partial


@dataclass(frozen=True)
class PersimmonConfig:
    n_vocab: int = 262144
    n_ctx: int = 16384
    n_embd: int = 4096
    n_head: int = 64
    n_layer: int = 36
    n_ff: int = 16384
    n_rot: int = 32  # partial_rotary_factor * head_dim
    rope_base: float = 25000.0
    qk_norm: bool = True
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.n_embd // self.n_head

    @property
    def n_head_kv(self):
        return self.n_head  # MHA


def config_from_gguf(g: GGUFFile) -> PersimmonConfig:
    md = g.metadata
    a = "persimmon"
    n_head = int(md[f"{a}.attention.head_count"])
    n_embd = int(md[f"{a}.embedding_length"])
    return PersimmonConfig(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=n_embd,
        n_head=n_head,
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_rot=int(md.get(f"{a}.rope.dimension_count", (n_embd // n_head) // 2)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 25000.0)),
        qk_norm="blk.0.attn_q_norm.weight" in g.tensors,
        eps=float(md.get(f"{a}.attention.layer_norm_epsilon", 1e-5)),
    )


def init_cache(cfg: PersimmonConfig, batch: int, max_seq: int,
               dtype=jnp.bfloat16):
    return init_layer_cache(cfg.n_layer, batch, cfg.n_head, max_seq,
                            cfg.head_dim, dtype)


def forward(params: dict, cfg: PersimmonConfig, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    max_seq = cache[0][0].shape[-2]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    hd = cfg.head_dim
    kv_pos = jnp.arange(max_seq)[None, None, None, :]
    q_pos = positions[:, None, :, None]

    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _layer_norm(x, params[pre + "attn_norm.weight"],
                        params[pre + "attn_norm.bias"], cfg.eps)
        dt_ = h.dtype
        q = _linear(h, params[pre + "attn_q.weight"],
                    params[pre + "attn_q.bias"]).reshape(b, t, cfg.n_head, hd)
        k = _linear(h, params[pre + "attn_k.weight"],
                    params[pre + "attn_k.bias"]).reshape(b, t, cfg.n_head, hd)
        v = _linear(h, params[pre + "attn_v.weight"],
                    params[pre + "attn_v.bias"]).reshape(b, t, cfg.n_head, hd)
        if cfg.qk_norm:  # per-head LayerNorm with weight AND bias over hd
            q = _layer_norm(q, params[pre + "attn_q_norm.weight"],
                            params[pre + "attn_q_norm.bias"], cfg.eps)
            k = _layer_norm(k, params[pre + "attn_k_norm.weight"],
                            params[pre + "attn_k_norm.bias"], cfg.eps)
        q = _rope_half_partial(q, positions, cfg.n_rot, cfg.rope_base).transpose(0, 2, 1, 3)
        k = _rope_half_partial(k, positions, cfg.n_rot, cfg.rope_base).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        cache_dtype = new_cache[i][0].dtype
        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        att = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                         kc.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * (hd ** -0.5)
        att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vc).transpose(0, 2, 1, 3)
        x = x + _linear(out.reshape(b, t, cfg.n_embd).astype(dt_),
                        params[pre + "attn_output.weight"],
                        params[pre + "attn_output.bias"])

        h = _layer_norm(x, params[pre + "ffn_norm.weight"],
                        params[pre + "ffn_norm.bias"], cfg.eps)
        up = _linear(h, params[pre + "ffn_up.weight"], params[pre + "ffn_up.bias"])
        act = jnp.square(jax.nn.relu(up))  # relu² (hidden_act="relu2")
        x = x + _linear(act, params[pre + "ffn_down.weight"],
                        params[pre + "ffn_down.bias"])

    x = _layer_norm(x, params["output_norm.weight"], params["output_norm.bias"],
                    cfg.eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class Persimmon:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: PersimmonConfig, max_seq: int = 2048,
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
