"""OLMo-2 family (llama.cpp arch 'olmo2') — llama ops reordered: NO input
norms; each sublayer reads the raw residual stream and its OUTPUT is
RMS-normed before the residual add (x = x + norm(attn(x)), x = x +
norm(mlp(x))), plus whole-projection-width RMSNorm on q and k (across all
heads jointly, unlike qwen3's per-head norm) applied before rope.

Architecture semantics match HF transformers.models.olmo2.modeling_olmo2
(Olmo2ForCausalLM): GQA, rotate-half rope, SwiGLU, untied head.
Reference analog: the same rms_norm/rope/mul_mat op set as llama
(include/ggml.h:1127,1419) in the reordered dataflow.
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
class Olmo2Config:
    n_vocab: int = 100352
    n_ctx: int = 4096
    n_embd: int = 4096
    n_head: int = 32
    n_head_kv: int = 32
    n_layer: int = 32
    n_ff: int = 11008
    rope_base: float = 500000.0
    rms_eps: float = 1e-6
    # olmo3: every full_interval-th layer is global, the rest slide
    sliding_window: int = 0  # 0 disables (olmo2)
    full_interval: int = 4

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def config_from_gguf(g: GGUFFile) -> Olmo2Config:
    """Also reads the 'olmo3' arch: olmo2 ops plus a sliding window on all
    but every full_interval-th layer (HF Olmo3 layer_types default)."""
    md = g.metadata
    a = md.get("general.architecture", "olmo2")
    if a not in ("olmo2", "olmo3"):
        a = "olmo2"
    n_head = int(md[f"{a}.attention.head_count"])
    return Olmo2Config(
        n_vocab=int(md.get(f"{a}.vocab_size", 100352)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        rope_base=float(md.get(f"{a}.rope.freq_base", 500000.0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)),
        sliding_window=int(md.get(f"{a}.attention.sliding_window", 0)),
        full_interval=int(md.get(f"{a}.attention.full_attention_interval", 4)),
    )


def init_cache(cfg: Olmo2Config, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head_kv, max_seq,
                            cfg.head_dim, dtype)


def forward(params: dict, cfg: Olmo2Config, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    dt = x.dtype
    rep = cfg.n_head // cfg.n_head_kv
    hd = cfg.head_dim
    scale = hd ** -0.5

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        # attention reads the RAW residual stream (no input norm);
        # q/k normed across the FULL projection width before the head split
        q = _rms_norm(_linear(x, params[pre + "attn_q.weight"]),
                      params[pre + "attn_q_norm.weight"], cfg.rms_eps)
        k = _rms_norm(_linear(x, params[pre + "attn_k.weight"]),
                      params[pre + "attn_k_norm.weight"], cfg.rms_eps)
        v = _linear(x, params[pre + "attn_v.weight"])
        q = q.reshape(b, t, cfg.n_head, hd)
        k = k.reshape(b, t, cfg.n_head_kv, hd)
        v = v.reshape(b, t, cfg.n_head_kv, hd)

        q = _rope_half(q, positions, cfg.rope_base).transpose(0, 2, 1, 3)
        k = _rope_half(k, positions, cfg.rope_base).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        qg = q.reshape(b, cfg.n_head_kv, rep, t, hd)
        att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                         kc.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
        kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
        q_pos = positions[:, None, None, :, None]
        keep = kv_pos <= q_pos
        if cfg.sliding_window and (i + 1) % cfg.full_interval != 0:
            keep = keep & (kv_pos > q_pos - cfg.sliding_window)
        att = jnp.where(keep, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)
        out = out.reshape(b, cfg.n_head, t, hd).transpose(0, 2, 1, 3)
        attn_out = _linear(out.reshape(b, t, cfg.n_head * hd).astype(dt),
                           params[pre + "attn_output.weight"])
        # post-norm on the sublayer OUTPUT, then the residual add
        x = x + _rms_norm(attn_out, params[pre + "attn_post_norm.weight"],
                          cfg.rms_eps)

        gate = _linear(x, params[pre + "ffn_gate.weight"])
        up = _linear(x, params[pre + "ffn_up.weight"])
        ff = _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"])
        x = x + _rms_norm(ff, params[pre + "ffn_post_norm.weight"], cfg.rms_eps)

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class Olmo2:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: Olmo2Config, max_seq: int = 2048,
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
