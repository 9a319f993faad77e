"""GLM-4 family (llama.cpp arch 'glm4', ZhipuAI GLM-4 / GLM-Z1) — GQA with
INTERLEAVED-pair PARTIAL rope (ggml rope mode 0 on the first
partial_rotary_factor * head_dim dims), qkv biases (o_proj bias-free),
gemma2-style SANDWICH RMSNorms (input + post-attn, pre-mlp + post-mlp),
and a fused gate_up MLP computed as up * silu(gate).

Architecture semantics match HF transformers.models.glm4.modeling_glm4
(Glm4ForCausalLM); the converter splits gate_up_proj offline.
Reference analog: ggml rope mode 0 with n_dims < head size
(/root/reference/include/ggml.h:1407-1443) + rms_norm.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import linear as _linear
from .gptj import _rope_interleaved
from .llama import _rms_norm


@dataclass(frozen=True)
class GLM4Config:
    n_vocab: int = 151552
    n_ctx: int = 131072
    n_embd: int = 4096
    n_head: int = 32
    n_head_kv: int = 2
    head_dim: int = 128
    n_layer: int = 40
    n_ff: int = 13696
    n_rot: int = 64  # partial_rotary_factor * head_dim
    rope_base: float = 10000.0
    rms_eps: float = 1.5625e-07
    sandwich: bool = True  # False ('glm'/chatglm, GLM-4-9b-hf): pre-norm only


def config_from_gguf(g: GGUFFile) -> GLM4Config:
    """Also reads the 'glm' arch (HF transformers glm, GLM-4-9b-chat-hf):
    identical layout minus the sandwich post-norms."""
    md = g.metadata
    a = md.get("general.architecture", "glm4")
    if a not in ("glm4", "glm"):
        a = "glm4"
    n_head = int(md[f"{a}.attention.head_count"])
    n_embd = int(md[f"{a}.embedding_length"])
    head_dim = int(md.get(f"{a}.attention.key_length", n_embd // n_head))
    return GLM4Config(
        n_vocab=int(md.get(f"{a}.vocab_size", 151552)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=n_embd,
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        head_dim=head_dim,
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_rot=int(md.get(f"{a}.rope.dimension_count", head_dim // 2)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1.5625e-07)),
        sandwich=(a == "glm4"),
    )


def init_cache(cfg: GLM4Config, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head_kv, max_seq,
                            cfg.head_dim, dtype)


def forward(params: dict, cfg: GLM4Config, tokens, pos_start, cache,
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
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
        q = _linear(h, params[pre + "attn_q.weight"], params.get(pre + "attn_q.bias"))
        k = _linear(h, params[pre + "attn_k.weight"], params.get(pre + "attn_k.bias"))
        v = _linear(h, params[pre + "attn_v.weight"], params.get(pre + "attn_v.bias"))
        q = q.reshape(b, t, cfg.n_head, hd)
        k = k.reshape(b, t, cfg.n_head_kv, hd)
        v = v.reshape(b, t, cfg.n_head_kv, hd)

        q = _rope_interleaved(q, positions, cfg.n_rot, cfg.rope_base).transpose(0, 2, 1, 3)
        k = _rope_interleaved(k, positions, cfg.n_rot, cfg.rope_base).transpose(0, 2, 1, 3)
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
        att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)
        out = out.reshape(b, cfg.n_head, t, hd).transpose(0, 2, 1, 3)
        attn_out = _linear(out.reshape(b, t, cfg.n_head * hd).astype(dt),
                           params[pre + "attn_output.weight"])
        # sandwich: post-norm on the sublayer output, then residual add
        x = x + (_rms_norm(attn_out, params[pre + "attn_post_norm.weight"],
                           cfg.rms_eps) if cfg.sandwich else attn_out)

        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        gate = _linear(h, params[pre + "ffn_gate.weight"])
        up = _linear(h, params[pre + "ffn_up.weight"])
        ff = _linear(up * jax.nn.silu(gate), params[pre + "ffn_down.weight"])
        x = x + (_rms_norm(ff, params[pre + "ffn_post_norm.weight"],
                           cfg.rms_eps) if cfg.sandwich else ff)

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class GLM4:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: GLM4Config, max_seq: int = 2048,
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
