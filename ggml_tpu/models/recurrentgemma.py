"""RecurrentGemma family (Griffin/Hawk, HF arch 'recurrent_gemma') — the
RG-LRU hybrid: Real-Gated Linear Recurrent Unit blocks (depthwise causal
conv1d + per-head block-diagonal input/recurrent gates + diagonal linear
recurrence) cycling with sliding-window GQA attention layers
(recurrent, recurrent, attention), GeGLU MLP with biases, gemma-style
(1+w) RMSNorms, bf16-rounded sqrt(n_embd) embedding scale, tied lm head
under a tanh logit softcap.

TPU-first mapping: the RG-LRU diagonal recurrence h_t = a_t h_{t-1} + b_t
runs as a log-depth `jax.lax.associative_scan` at prefill (the reference
point, HF transformers.models.recurrent_gemma, loops per token) and a
single fused update at decode; the sliding window is masked by POSITION
DISTANCE (kv in (q-W, q]) over the dense cache rather than HF's
ring-buffer shifts — same semantics, no gather.  Attention follows the
family conventions of models/gemma2.py; conv reuses ops.ssm_conv
(golden-gated vs GGML_OP_SSM_CONV, include/ggml.h:1811).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ..gguf import GGUFFile
from ..ops import core as O
from .common import cache_write as _cache_write
from .common import linear as _linear
from .gemma2 import _rms_norm_gemma, _softcap
from .phi2 import _rope_half_partial


@dataclass(frozen=True)
class RecurrentGemmaConfig:
    n_vocab: int = 256000
    n_ctx: int = 8192
    n_embd: int = 2560
    n_head: int = 10
    n_head_kv: int = 1
    n_layer: int = 26
    n_ff: int = 7680  # live GeGLU width (HF intermediate_size // 2)
    head_dim: int = 256
    n_rot: int = 128  # partial rotary dims
    rope_base: float = 10000.0
    rms_eps: float = 1e-6
    window: int = 2048  # attention sliding window
    final_softcap: float = 30.0
    attn_layers: tuple = ()  # attention layer indices; rest are RG-LRU
    # recurrent block geometry
    lru_width: int = 2560
    d_conv: int = 4

    @property
    def block_width(self):
        return self.lru_width // self.n_head


def config_from_gguf(g: GGUFFile) -> RecurrentGemmaConfig:
    md = g.metadata
    a = "recurrentgemma"
    n_head = int(md[f"{a}.attention.head_count"])
    n_embd = int(md[f"{a}.embedding_length"])
    hd = int(md.get(f"{a}.attention.key_length", n_embd // n_head))
    return RecurrentGemmaConfig(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=n_embd,
        n_head=n_head,
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", n_head)),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        head_dim=hd,
        n_rot=int(md.get(f"{a}.rope.dimension_count", hd // 2)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)),
        window=int(md.get(f"{a}.attention.sliding_window", 2048)),
        final_softcap=float(md.get(f"{a}.final_logit_softcapping", 30.0)),
        attn_layers=tuple(int(i) for i in md.get(f"{a}.attention.layer_indices", ())),
        lru_width=int(md[f"{a}.recurrent.lru_width"]),
        d_conv=int(md[f"{a}.recurrent.conv_kernel"]),
    )


def init_cache(cfg: RecurrentGemmaConfig, batch: int, max_seq: int,
               dtype=jnp.bfloat16):
    """Mixed per-layer state: (k, v) on attention layers, (conv window,
    RG-LRU hidden) f32 on recurrent layers (HF keeps the LRU state in full
    precision — RecurrentGemmaRecurrentBlock._setup_cache)."""
    layers = []
    for i in range(cfg.n_layer):
        if i in cfg.attn_layers:
            mk = lambda: jnp.zeros((batch, cfg.n_head_kv, max_seq, cfg.head_dim),
                                   dtype)
            layers.append((mk(), mk()))
        else:
            layers.append((
                jnp.zeros((batch, cfg.lru_width, cfg.d_conv - 1), jnp.float32),
                jnp.zeros((batch, cfg.lru_width), jnp.float32),
            ))
    return tuple(layers)


def _rglru(params, cfg: RecurrentGemmaConfig, pre, x, positions, state):
    """Real-Gated LRU (HF RecurrentGemmaRglru): per-head block-diagonal
    sigmoid gates, a = exp(-8 * r_gate * softplus(a_param)), input scaled
    by sqrt(1 - a^2) (1 at document start), diagonal recurrence in f32."""
    b, t, _ = x.shape
    xf = x.astype(jnp.float32)
    xh = xf.reshape(b, t, cfg.n_head, cfg.block_width)
    igate = jax.nn.sigmoid(
        jnp.einsum("bthi,hij->bthj", xh, params[pre + "rglru_in_gate.weight"],
                   precision=jax.lax.Precision.HIGHEST)
        + params[pre + "rglru_in_gate.bias"]).reshape(b, t, cfg.lru_width)
    rgate = jax.nn.sigmoid(
        jnp.einsum("bthi,hij->bthj", xh, params[pre + "rglru_rec_gate.weight"],
                   precision=jax.lax.Precision.HIGHEST)
        + params[pre + "rglru_rec_gate.bias"]).reshape(b, t, cfg.lru_width)

    log_a = -8.0 * rgate * jax.nn.softplus(params[pre + "rglru_a"])  # (b,t,w)
    a = jnp.exp(log_a)
    reset = (positions == 0)[:, :, None]  # document starts: no history
    a = jnp.where(reset, 0.0, a)
    multiplier = jnp.where(reset, 1.0, jnp.sqrt(1.0 - jnp.exp(2.0 * log_a)))
    bterm = xf * igate * multiplier

    if t == 1:
        h = a[:, 0] * state + bterm[:, 0]
        return h[:, None, :].astype(x.dtype), h
    # h_t = a_t h_{t-1} + b_t as a log-depth scan; fold the carried state
    # back in via the cumulative decay (first scan component)
    cum_a, h = jax.lax.associative_scan(
        lambda l, r: (l[0] * r[0], l[1] * r[0] + r[1]), (a, bterm), axis=1)
    h = h + cum_a * state[:, None, :]
    return h.astype(x.dtype), h[:, -1]


def _recurrent_layer(params, cfg: RecurrentGemmaConfig, pre, h, state, positions):
    """Griffin recurrent block: gelu(y) ⊙ RG-LRU(conv1d(x)) -> out proj."""
    y = jax.nn.gelu(_linear(h, params[pre + "rec_y.weight"],
                            params[pre + "rec_y.bias"]), approximate=True)
    x = _linear(h, params[pre + "rec_x.weight"], params[pre + "rec_x.bias"])

    conv_state, rec_state = state
    sx = jnp.concatenate([conv_state.astype(x.dtype),
                          jnp.swapaxes(x, 1, 2)], axis=2)
    new_conv = sx[:, :, -(cfg.d_conv - 1):]
    xc = O.ssm_conv(sx, params[pre + "rec_conv1d.weight"])
    xc = xc + params[pre + "rec_conv1d.bias"]

    xr, new_rec = _rglru(params, cfg, pre, xc, positions, rec_state)
    out = _linear(xr * y, params[pre + "rec_out.weight"],
                  params[pre + "rec_out.bias"])
    return out, (new_conv.astype(conv_state.dtype), new_rec)


def _attn_layer(params, cfg: RecurrentGemmaConfig, pre, h, state, positions,
                cache_len, max_seq):
    """Sliding-window GQA with partial rotary embedding and o_proj bias."""
    b, t = h.shape[:2]
    hd = cfg.head_dim
    rep = cfg.n_head // cfg.n_head_kv
    dt_ = h.dtype
    q = _linear(h, params[pre + "attn_q.weight"],
                params.get(pre + "attn_q.bias")).reshape(b, t, cfg.n_head, hd)
    k = _linear(h, params[pre + "attn_k.weight"],
                params.get(pre + "attn_k.bias")).reshape(b, t, cfg.n_head_kv, hd)
    v = _linear(h, params[pre + "attn_v.weight"],
                params.get(pre + "attn_v.bias")).reshape(b, t, cfg.n_head_kv, hd)
    q = _rope_half_partial(q, positions, cfg.n_rot, cfg.rope_base).transpose(0, 2, 1, 3)
    k = _rope_half_partial(k, positions, cfg.n_rot, cfg.rope_base).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    cache_dtype = state[0].dtype
    kc = _cache_write(state[0], k.astype(cache_dtype), cache_len)
    vc = _cache_write(state[1], v.astype(cache_dtype), cache_len)

    qg = q.reshape(b, cfg.n_head_kv, rep, t, hd)
    att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                     kc.astype(jnp.float32),
                     preferred_element_type=jnp.float32) * (hd ** -0.5)
    kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
    q_pos = positions[:, None, None, :, None]
    ok = (kv_pos <= q_pos) & (kv_pos > q_pos - cfg.window)
    att = jnp.where(ok, att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
    out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)
    out = out.reshape(b, cfg.n_head, t, hd).transpose(0, 2, 1, 3)
    out = _linear(out.reshape(b, t, cfg.n_head * hd).astype(dt_),
                  params[pre + "attn_output.weight"],
                  params[pre + "attn_output.bias"])
    return out, (kc, vc)


def forward(params: dict, cfg: RecurrentGemmaConfig, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    del prefill
    b, t = tokens.shape
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    max_seq = next(cache[i][0].shape[-2] for i in range(cfg.n_layer)
                   if i in cfg.attn_layers)
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    # HF rounds the sqrt(n_embd) normalizer through bfloat16
    scale = float(np.asarray(np.sqrt(cfg.n_embd), dtype=ml_dtypes.bfloat16))
    x = embd[tokens] * jnp.asarray(scale, embd.dtype)
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm_gemma(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
        if i in cfg.attn_layers:
            out, new_cache[i] = _attn_layer(params, cfg, pre, h, new_cache[i],
                                            positions, cache_len, max_seq)
        else:
            out, new_cache[i] = _recurrent_layer(params, cfg, pre, h,
                                                 new_cache[i], positions)
        x = x + out

        h = _rms_norm_gemma(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        gate = jax.nn.gelu(_linear(h, params[pre + "ffn_gate.weight"],
                                   params[pre + "ffn_gate.bias"]),
                           approximate=True)
        up = _linear(h, params[pre + "ffn_up.weight"], params[pre + "ffn_up.bias"])
        x = x + _linear(gate * up, params[pre + "ffn_down.weight"],
                        params[pre + "ffn_down.bias"])

    x = _rms_norm_gemma(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    if cfg.final_softcap:
        logits = _softcap(logits, cfg.final_softcap)
    return logits, tuple(new_cache)


class RecurrentGemma:
    """Inference wrapper (family signature — see models.phi2.Phi2)."""

    def __init__(self, params: dict, cfg: RecurrentGemmaConfig,
                 max_seq: int = 2048, batch: int = 1):
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
