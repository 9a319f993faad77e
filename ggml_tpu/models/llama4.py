"""Llama-4 text family (HF arch 'llama4', Scout/Maverick) — iRoPE MoE:

- chunked-attention layers carry interleaved-pair rope (GPT-J mode) and
  restrict attention to position chunks (kv visible iff same
  attention_chunk_size chunk and causal);
- every no_rope_layer_interval-th layer is NoPE with GLOBAL attention and
  log-temperature query scaling
  q *= 1 + attn_scale * log1p(floor((pos+1)/floor_scale))  (scalable
  softmax, HF Llama4TextAttention.attn_temperature_tuning);
- optional weightless qk L2 norm after rope (the 16E/Scout models);
- FFN interleaves dense SwiGLU with MoE layers: sigmoid(top-k logits)
  scores applied to the expert INPUT (x*s into the expert, not the
  output — HF Llama4TextMoe), plus an always-on shared SwiGLU expert.

Architecture semantics match HF transformers.models.llama4
(Llama4ForCausalLM, eager path).  The MoE runs dense-over-experts: with
bias-free experts, unselected scores are exactly 0 and expert(0)=0, so
the all-experts einsum IS the gather (the TPU shape of MUL_MAT_ID,
include/ggml.h:1121; see models/llama.moe_ffn_block for the rationale).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import init_layer_cache
from .common import linear as _linear
from .gptj import _rope_interleaved
from .llama import _rms_norm


@dataclass(frozen=True)
class Llama4Config:
    n_vocab: int = 202048
    n_ctx: int = 262144
    n_embd: int = 5120
    n_head: int = 40
    n_head_kv: int = 8
    n_layer: int = 48
    n_ff: int = 16384  # dense-layer SwiGLU width
    n_ff_exp: int = 8192  # per-expert (and shared-expert) width
    head_dim: int = 128
    rope_base: float = 500000.0
    rms_eps: float = 1e-5
    chunk_size: int = 8192  # chunked-attention window
    nope_layers: tuple = ()  # NoPE + global attention layer indices
    moe_layers: tuple = ()
    n_expert: int = 16
    n_expert_used: int = 1
    use_qk_norm: bool = True
    temperature_tuning: bool = True
    attn_scale: float = 0.1
    floor_scale: float = 8192.0


def config_from_gguf(g: GGUFFile) -> Llama4Config:
    md = g.metadata
    a = "llama4"
    n_head = int(md[f"{a}.attention.head_count"])
    n_embd = int(md[f"{a}.embedding_length"])
    return Llama4Config(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=n_embd,
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_ff_exp=int(md.get(f"{a}.expert_feed_forward_length", 8192)),
        head_dim=int(md.get(f"{a}.attention.key_length", n_embd // n_head)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 500000.0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        chunk_size=int(md.get(f"{a}.attention.chunk_size", 8192)),
        nope_layers=tuple(int(i) for i in
                          md.get(f"{a}.attention.no_rope_layer_indices", ())),
        moe_layers=tuple(int(i) for i in md.get(f"{a}.expert_layer_indices", ())),
        n_expert=int(md.get(f"{a}.expert_count", 0)),
        n_expert_used=int(md.get(f"{a}.expert_used_count", 1)),
        use_qk_norm=bool(md.get(f"{a}.attention.use_qk_norm", True)),
        temperature_tuning=bool(md.get(f"{a}.attention.temperature_tuning", True)),
        attn_scale=float(md.get(f"{a}.attention.attn_scale", 0.1)),
        floor_scale=float(md.get(f"{a}.attention.floor_scale", 8192.0)),
    )


def init_cache(cfg: Llama4Config, batch: int, max_seq: int, dtype=jnp.bfloat16):
    return init_layer_cache(cfg.n_layer, batch, cfg.n_head_kv, max_seq,
                            cfg.head_dim, dtype)


def _l2_norm(x, eps: float):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
            ).astype(x.dtype)


def _moe_block(params, pre, h, cfg: Llama4Config):
    """Llama-4 MoE: scores = sigmoid(top-k router logits), expert input
    scaled by its score (x*s into the expert), + shared SwiGLU expert."""
    b, t, d = h.shape
    x = h.reshape(b * t, d)
    logits = _linear(x, params[pre + "ffn_gate_inp.weight"]).astype(jnp.float32)
    if cfg.n_expert_used < cfg.n_expert:
        # threshold at the k-th largest logit (== HF's scatter of top-k
        # values into a -inf field; exact ties have measure zero)
        kth = jax.lax.top_k(logits, cfg.n_expert_used)[0][:, -1:]
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
    scores = jax.nn.sigmoid(logits).astype(h.dtype)  # sigmoid(-inf) = 0

    w_gate = params[pre + "ffn_gate_exps.weight"]  # (E, F, D)
    w_up = params[pre + "ffn_up_exps.weight"]
    w_down = params[pre + "ffn_down_exps.weight"]  # (E, D, F)
    xs = x[None, :, :] * scores.T[:, :, None]  # (E, T, D) scaled inputs
    gate = jnp.einsum("etd,efd->etf", xs, w_gate)
    up = jnp.einsum("etd,efd->etf", xs, w_up)
    routed = jnp.einsum("etf,edf->td", jax.nn.silu(gate) * up, w_down)

    sg = _linear(x, params[pre + "ffn_gate_shexp.weight"])
    su = _linear(x, params[pre + "ffn_up_shexp.weight"])
    shared = _linear(jax.nn.silu(sg) * su, params[pre + "ffn_down_shexp.weight"])
    return (routed + shared).reshape(b, t, d)


def forward(params: dict, cfg: Llama4Config, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    max_seq = cache[0][0].shape[-2]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    hd = cfg.head_dim
    rep = cfg.n_head // cfg.n_head_kv
    kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
    q_pos = positions[:, None, None, :, None]
    causal = kv_pos <= q_pos
    chunked = causal & ((kv_pos // cfg.chunk_size) == (q_pos // cfg.chunk_size))

    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        nope = i in cfg.nope_layers
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
        dt_ = h.dtype
        q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, t, cfg.n_head, hd)
        k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, t, cfg.n_head_kv, hd)
        v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, t, cfg.n_head_kv, hd)
        if not nope:
            q = _rope_interleaved(q, positions, hd, cfg.rope_base)
            k = _rope_interleaved(k, positions, hd, cfg.rope_base)
            if cfg.use_qk_norm:
                q = _l2_norm(q, cfg.rms_eps)
                k = _l2_norm(k, cfg.rms_eps)
        elif cfg.temperature_tuning:
            # scalable-softmax query temperature (arXiv:2501.19399)
            scale = 1.0 + cfg.attn_scale * jnp.log1p(
                jnp.floor((positions.astype(jnp.float32) + 1.0) / cfg.floor_scale))
            q = (q.astype(jnp.float32) * scale[:, :, None, None]).astype(q.dtype)
        q, k, v = (y.transpose(0, 2, 1, 3) for y in (q, k, v))

        cache_dtype = new_cache[i][0].dtype
        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        qg = q.reshape(b, cfg.n_head_kv, rep, t, hd)
        att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                         kc.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * (hd ** -0.5)
        att = jnp.where(causal if nope else chunked, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)
        out = out.reshape(b, cfg.n_head, t, hd).transpose(0, 2, 1, 3)
        out = _linear(out.reshape(b, t, cfg.n_head * hd).astype(dt_),
                      params[pre + "attn_output.weight"])
        x = x + out

        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        if i in cfg.moe_layers:
            x = x + _moe_block(params, pre, h, cfg)
        else:
            gate = _linear(h, params[pre + "ffn_gate.weight"])
            up = _linear(h, params[pre + "ffn_up.weight"])
            x = x + _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"])

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class Llama4:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: Llama4Config, max_seq: int = 2048,
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
