"""GPT-NeoX family (Pythia / llama.cpp arch 'gptneox'): parallel residual
with TWO LayerNorms — attention reads ln1(x), the MLP reads ln2(x) of the
SAME pre-block x — partial NeoX rotary (rotate-half on the first
rotary_pct * head_dim dims), biased projections, erf GELU, untied unbiased
lm head.

Architecture semantics match HF transformers.models.gpt_neox
(GPTNeoXForCausalLM, use_parallel_residual=True; the sequential variant is
cfg.parallel_residual=False).  Reference analog: rope mode 2 (NeoX,
/root/reference/include/ggml.h:1443-1463); the parallel-residual shape is
the GPT-J example's with a second norm.

HF fuses q/k/v into query_key_value with rows interleaved PER HEAD
([head, (q|k|v), head_dim]); the converter de-interleaves into separate
attn_q/k/v so the kernels see plain (n_embd, n_embd) matmuls.
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
from .phi2 import _rope_half_partial


@dataclass(frozen=True)
class NeoXConfig:
    n_vocab: int = 50304
    n_ctx: int = 2048
    n_embd: int = 2048
    n_head: int = 16
    n_layer: int = 24
    n_ff: int = 8192
    n_rot: int = 32  # rotary_pct * head_dim
    rope_base: float = 10000.0
    eps: float = 1e-5
    parallel_residual: bool = True

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def config_from_gguf(g: GGUFFile) -> NeoXConfig:
    md = g.metadata
    a = "gptneox"
    n_embd = int(md[f"{a}.embedding_length"])
    n_head = int(md[f"{a}.attention.head_count"])
    return NeoXConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 50304)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=n_embd,
        n_head=n_head,
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_rot=int(md.get(f"{a}.rope.dimension_count", n_embd // n_head)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        eps=float(md.get(f"{a}.attention.layer_norm_epsilon", 1e-5)),
        parallel_residual=bool(md.get(f"{a}.use_parallel_residual", True)),
    )


def init_cache(cfg: NeoXConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head, max_seq,
                            cfg.head_dim, dtype)


def forward(params: dict, cfg: NeoXConfig, tokens, pos_start, cache, cache_len,
            *, prefill: bool = False):
    """Family-signature forward; per-row cache_len vectors supported."""
    del prefill
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    dt = x.dtype
    scale = 1.0 / np.sqrt(cfg.head_dim)

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _layer_norm(x, params[pre + "attn_norm.weight"],
                        params[pre + "attn_norm.bias"], cfg.eps)

        q = _linear(h, params[pre + "attn_q.weight"], params[pre + "attn_q.bias"])
        k = _linear(h, params[pre + "attn_k.weight"], params[pre + "attn_k.bias"])
        v = _linear(h, params[pre + "attn_v.weight"], params[pre + "attn_v.bias"])
        q = q.reshape(b, t, cfg.n_head, cfg.head_dim)
        k = k.reshape(b, t, cfg.n_head, cfg.head_dim)
        v = v.reshape(b, t, cfg.n_head, cfg.head_dim)

        q = _rope_half_partial(q, positions, cfg.n_rot, cfg.rope_base).transpose(0, 2, 1, 3)
        k = _rope_half_partial(k, positions, cfg.n_rot, cfg.rope_base).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        att = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                         kc.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
        kv_pos = jnp.arange(max_seq)[None, None, None, :]
        q_pos = positions[:, None, :, None]
        att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vc)
        attn_out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_embd).astype(dt)
        attn_out = _linear(attn_out, params[pre + "attn_output.weight"],
                           params[pre + "attn_output.bias"])

        def mlp(z):
            f = _linear(z, params[pre + "ffn_up.weight"], params[pre + "ffn_up.bias"])
            f = jax.nn.gelu(f, approximate=False)  # HF hidden_act='gelu' (erf)
            return _linear(f, params[pre + "ffn_down.weight"],
                           params[pre + "ffn_down.bias"])

        if cfg.parallel_residual:
            # mlp reads ln2 of the PRE-BLOCK x, not x + attn
            h2 = _layer_norm(x, params[pre + "ffn_norm.weight"],
                             params[pre + "ffn_norm.bias"], cfg.eps)
            x = x + attn_out + mlp(h2)
        else:
            x = x + attn_out
            h2 = _layer_norm(x, params[pre + "ffn_norm.weight"],
                             params[pre + "ffn_norm.bias"], cfg.eps)
            x = x + mlp(h2)

    x = _layer_norm(x, params["output_norm.weight"], params["output_norm.bias"],
                    cfg.eps)
    logits = _linear(x, params["output.weight"], params.get("output.bias"))
    return logits, tuple(new_cache)


class NeoX:
    """Inference wrapper: compiled step + on-device greedy decode loop."""

    def __init__(self, params: dict, cfg: NeoXConfig, max_seq: int = 2048,
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
