"""Llama family (Llama-2/3 style): GQA attention, RMSNorm, SwiGLU MLP,
rotate-half (NeoX-mode) RoPE.

The reference library provides every op this model needs (RMS_NORM
include/ggml.h:1127, ROPE NeoX mode :1419, SILU :535, GQA via broadcasted
mul_mat) and llama.cpp assembles them downstream; this is the equivalent
assembly on our stack, plus the quantized planar path and an on-device scan
decode loop (same design as models/gptj.py).

RoPE convention: rotate_half over each head's dims (HF transformers layout).
GGUF files converted by llama.cpp store q/k weights with an extra per-head
permutation; `Llama.from_gguf(..., llamacpp_permuted=True)` undoes it at load
(dequantizing q/k to dense in that case — the permutation cannot be applied
to packed planes).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import GGMLType
from ..gguf import GGUFFile


@dataclass(frozen=True)
class LlamaConfig:
    n_vocab: int = 32000
    n_ctx: int = 4096
    n_embd: int = 4096
    n_head: int = 32
    n_head_kv: int = 32
    n_layer: int = 32
    n_ff: int = 11008
    rope_base: float = 10000.0
    # context-extension rope scaling (reference: ggml_rope_ext YaRN params,
    # include/ggml.h:1424-1437; GGUF llama.rope.scaling.* keys)
    rope_scaling: str = "none"  # none | linear | yarn
    rope_scale: float = 1.0  # scaling factor (freq_scale = 1/factor)
    n_ctx_orig: int = 0  # original context length (YaRN ramp)
    rms_eps: float = 1e-5
    # qwen3: per-head RMSNorm on q/k before rope, head_dim decoupled from
    # n_embd // n_head (llama.cpp arch 'qwen3')
    qk_norm: bool = False
    head_dim_override: int = 0
    # mixture-of-experts (Mixtral-style; llama.cpp keys llama.expert_count /
    # llama.expert_used_count; the routed matmul is the GGML_OP_MUL_MAT_ID
    # analog, reference include/ggml.h:1121-1125)
    n_expert: int = 0
    n_expert_used: int = 0
    # qwen2moe: gate probs NOT renormalized after top-k (HF norm_topk_prob
    # False; llama.cpp build_moe_ffn norm_w=false) + sigmoid-gated shared
    # expert alongside the routed experts
    moe_renorm: bool = True
    moe_shared: bool = False
    # granite/granitemoe: fixed scalar multipliers (HF Granite*Config; gguf
    # keys granite.embedding_scale / residual_scale / attention.scale /
    # logit_scale — llama.cpp LLM_KV_*_SCALE)
    embd_scale: float = 1.0
    resid_scale: float = 1.0
    attn_scale: float = 0.0  # 0 -> default 1/sqrt(head_dim)
    logit_scale: float = 1.0  # logits are DIVIDED by this (HF semantics)
    # smollm3: every nope_interval-th layer (1-indexed) skips rope entirely
    # (NoPE — the layer attends with no positional signal; gguf key
    # smollm3.no_rope_layer_interval)
    nope_interval: int = 0
    # ernie4_5: GLM-style INTERLEAVED-pair rope over the full head dim
    # (ggml rope mode 0) instead of rotate-half
    rope_interleaved: bool = False
    # fused Pallas flash attention for multi-token (prefill-from-empty) steps
    use_flash_prefill: bool = False
    # crossover on v5e: XLA's fused attention wins below ~1-2k tokens, the
    # Pallas flash kernel above (2.3x at 2048); prefill auto-selects by length
    flash_min_seq: int = 1024

    @property
    def head_dim(self):
        return self.head_dim_override or self.n_embd // self.n_head


def config_from_gguf(g: GGUFFile) -> LlamaConfig:
    """Reads llama-family metadata; the qwen2 arch (llama.cpp's modern
    headline: llama layout + qkv biases + often tied embeddings) shares this
    model with its own key prefix; qwen3 adds per-head q/k RMSNorm and a
    decoupled head_dim (attention.key_length)."""
    md = g.metadata
    a = md.get("general.architecture", "llama")
    if a not in ("llama", "qwen2", "qwen3", "qwen2moe", "qwen3moe",
                 "granite", "granitemoe", "smollm3", "ernie4_5",
                 "helium", "seed_oss"):
        a = "llama"
    return LlamaConfig(
        nope_interval=int(md.get(f"{a}.no_rope_layer_interval", 0)),
        rope_interleaved=(a in ("ernie4_5", "helium")),
        qk_norm=a in ("qwen3", "qwen3moe"),
        embd_scale=float(md.get(f"{a}.embedding_scale", 1.0)),
        resid_scale=float(md.get(f"{a}.residual_scale", 1.0)),
        attn_scale=float(md.get(f"{a}.attention.scale", 0.0)),
        logit_scale=float(md.get(f"{a}.logit_scale", 1.0)),
        moe_renorm=(a != "qwen2moe"),
        moe_shared=(a == "qwen2moe"),
        head_dim_override=int(md.get(f"{a}.attention.key_length", 0)),
        n_vocab=int(md.get(f"{a}.vocab_size", 32000)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=int(md[f"{a}.attention.head_count"]),
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", md[f"{a}.attention.head_count"])),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        rope_scaling=str(md.get(f"{a}.rope.scaling.type", "none")),
        rope_scale=float(md.get(f"{a}.rope.scaling.factor", 1.0)),
        n_ctx_orig=int(md.get(f"{a}.rope.scaling.original_context_length", 0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)),
        n_expert=int(md.get(f"{a}.expert_count", 0)),
        n_expert_used=int(md.get(f"{a}.expert_used_count", 0)),
    )


def _rms_norm(x, w, eps):
    v = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(v + eps)).astype(x.dtype) * w


from .common import linear as _linear  # noqa: E402


def _rope_half(x, positions, base: float):
    """rotate_half RoPE over the full head dim (ggml NeoX mode / HF llama)."""
    d = x.shape[-1]
    half = d // 2
    inv_freq = (base ** (-np.arange(half) / half)).astype(np.float32)
    theta = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    cos = jnp.cos(theta)[:, :, None, :]
    sin = jnp.sin(theta)[:, :, None, :]
    x0, x1 = x[..., :half], x[..., half:]
    return jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)


def _rope_half_scaled(x, positions, cfg):
    """_rope_half with context-extension scaling: linear position
    interpolation or YaRN per-dim ramp + magnitude correction, reusing the
    op-level rope machinery (ops.core._rope_cos_sin, the ggml_rope_ext
    semantics)."""
    if cfg.rope_scaling in ("none", "") or (
        cfg.rope_scaling == "linear" and cfg.rope_scale == 1.0
    ):
        return _rope_half(x, positions, cfg.rope_base)
    from ..ops.core import _rope_cos_sin, rope_yarn_corr_dims

    d = x.shape[-1]
    b, t = positions.shape
    freq_scale = 1.0 / cfg.rope_scale if cfg.rope_scale else 1.0
    if cfg.rope_scaling == "yarn":
        n_ctx_orig = cfg.n_ctx_orig or cfg.n_ctx
        corr = rope_yarn_corr_dims(d, n_ctx_orig, cfg.rope_base, 32.0, 1.0)
        ext_factor, attn_factor = 1.0, 1.0
    else:  # linear
        corr = (0.0, d - 1.0)
        ext_factor, attn_factor = 0.0, 1.0
    cos, sin = _rope_cos_sin(
        positions.reshape(-1), d, cfg.rope_base, freq_scale, ext_factor,
        attn_factor, corr, None,
    )
    cos = cos.reshape(b, t, 1, d // 2)
    sin = sin.reshape(b, t, 1, d // 2)
    half = d // 2
    x0, x1 = x[..., :half], x[..., half:]
    return jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)


def permute_llamacpp_qk(w, n_head: int):
    """llama.cpp convert-style q/k permutation: rows regrouped per head so the
    interleaved rope kernel sees rotate-half layout (llama.cpp convert
    `permute`): (N, K) -> reshape (H, 2, N/H/2, K) -> swap -> (N, K)."""
    n, k = w.shape
    return w.reshape(n_head, 2, n // n_head // 2, k).swapaxes(1, 2).reshape(n, k)


def unpermute_llamacpp_qk(w, n_head: int):
    """Inverse of permute_llamacpp_qk."""
    n, k = w.shape
    return w.reshape(n_head, n // n_head // 2, 2, k).swapaxes(1, 2).reshape(n, k)


def moe_ffn_block(params: dict, pre: str, h, cfg: LlamaConfig):
    """Mixtral-style sparse-MoE FFN (shared by the dense forward and the paged
    decode step so paged == dense holds for MoE models too).

    Routing = HF Mixtral semantics: softmax over all expert logits, top-k,
    renormalize — algebraically identical to a softmax over just the top-k
    logits.  Compute is dense-over-experts with gate masking: at decode every
    expert's weights must stream from HBM anyway under continuous batching, so
    the all-experts einsum is the TPU shape of the reference's MUL_MAT_ID
    gather (include/ggml.h:1121-1125; llama.cpp llm_build_moe_ffn).

    Weights (llama.cpp Mixtral GGUF layout):
      ffn_gate_inp.weight (E, D) router; ffn_gate_exps/ffn_up_exps (E, F, D);
      ffn_down_exps (E, D, F).
    """
    w_gate = params[pre + "ffn_gate_exps.weight"]
    w_up = params[pre + "ffn_up_exps.weight"]
    w_down = params[pre + "ffn_down_exps.weight"]
    router = _linear(h, params[pre + "ffn_gate_inp.weight"])
    n_tokens = h.shape[0] * h.shape[1]  # static under jit
    mode = os.environ.get("GGML_TPU_MOE_GROUPED", "auto")
    if mode == "1" or (mode == "auto" and n_tokens >= 16):
        # prefill shape: sorted grouped GEMM does k/E of the dense FLOPs
        probs, idx = moe_topk(router, cfg.n_expert_used, cfg.moe_renorm)
        out = moe_expert_sum_grouped(h, w_gate, w_up, w_down, probs, idx,
                                     cfg.n_expert)
    else:
        gates = moe_gates(router, cfg.n_expert, cfg.n_expert_used,
                          cfg.moe_renorm)
        out = moe_expert_sum(h, w_gate, w_up, w_down, gates)
    if cfg.moe_shared:  # qwen2moe: sigmoid-gated dense SwiGLU shared expert
        sg = jax.nn.sigmoid(_linear(h, params[pre + "ffn_gate_inp_shexp.weight"]))
        gate = _linear(h, params[pre + "ffn_gate_shexp.weight"])
        up = _linear(h, params[pre + "ffn_up_shexp.weight"])
        out = out + sg * _linear(jax.nn.silu(gate) * up,
                                 params[pre + "ffn_down_shexp.weight"])
    return out


def moe_topk(router_logits, n_expert_used: int, renorm: bool = True):
    """Top-k routing weights. renorm=True (Mixtral/qwen3moe): softmax over all
    logits then top-k renormalize == softmax over just the top-k logits.
    renorm=False (qwen2moe): the raw full-softmax probs of the top-k experts
    (do NOT sum to 1). Returns (probs, idx), each (..., k)."""
    logits = router_logits.astype(jnp.float32)
    top_vals, top_idx = jax.lax.top_k(logits, n_expert_used)  # (..., k)
    if renorm:
        return jax.nn.softmax(top_vals, axis=-1), top_idx
    lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    return jnp.exp(top_vals - lse), top_idx


def moe_gates(router_logits, n_expert: int, n_expert_used: int,
              renorm: bool = True):
    """(..., E) top-k gate weights, zeros elsewhere."""
    probs, top_idx = moe_topk(router_logits, n_expert_used, renorm)
    onehot = jax.nn.one_hot(top_idx, n_expert, dtype=jnp.float32)  # (..., k, E)
    return jnp.einsum("...k,...ke->...e", probs, onehot)


def moe_expert_sum(h, w_gate, w_up, w_down, gates):
    """Gate-weighted sum of SwiGLU expert FFNs. w_gate/w_up (E, F, D),
    w_down (E, D, F), gates (..., E) — the expert axis may be a local shard
    (expert parallelism: parallel.moe.mixtral_ffn_ep)."""
    hp = jax.lax.Precision.HIGHEST
    hg = jnp.einsum("btd,efd->btef", h.astype(w_gate.dtype), w_gate, precision=hp)
    hu = jnp.einsum("btd,efd->btef", h.astype(w_up.dtype), w_up, precision=hp)
    y = jnp.einsum("btef,edf->bted", jax.nn.silu(hg) * hu, w_down, precision=hp)
    return jnp.einsum("bted,bte->btd", y, gates.astype(y.dtype)).astype(h.dtype)


def moe_expert_sum_grouped(h, w_gate, w_up, w_down, top_probs, top_idx,
                           n_expert: int):
    """Sort-by-expert grouped GEMM (megablocks-style dropless token choice):
    flatten the (token, expert) pairs, stable-sort by expert id, run three
    `ragged_dot_general` grouped contractions, scatter-add the gate-weighted
    results back.  == moe_expert_sum on the dense gates built from
    (top_probs, top_idx) but does k/E of its FLOPs — the prefill shape of the
    reference's MUL_MAT_ID row gather (include/ggml.h:1121-1125).
    Differentiable (used by MoE finetuning at sequence shapes)."""
    b, t, d = h.shape
    k = top_idx.shape[-1]
    n = b * t
    x = h.reshape(n, d)
    flat_e = top_idx.reshape(n * k)
    order = jnp.argsort(flat_e, stable=True)
    tok = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)[order]
    xs = x[tok].astype(w_gate.dtype)                    # (n*k, D) expert-sorted
    gsz = jnp.bincount(flat_e, length=n_expert)         # (E,)
    # contract the last (D or F) axis of the 3-D weight, group on axis 0
    dn = jax.lax.RaggedDotDimensionNumbers(
        dot_dimension_numbers=(((1,), (2,)), ((), ())),
        lhs_ragged_dimensions=[0], rhs_group_dimensions=[0])
    rdot = lambda a, w: jax.lax.ragged_dot_general(
        a, w, gsz, dn, precision=jax.lax.Precision.HIGHEST)
    hg = rdot(xs, w_gate)                               # (n*k, F)
    hu = rdot(xs, w_up)
    down = rdot(jax.nn.silu(hg) * hu, w_down.astype(hg.dtype))  # (n*k, D)
    wts = top_probs.reshape(n * k)[order]
    out = jnp.zeros((n, d), down.dtype).at[tok].add(down * wts[:, None].astype(down.dtype))
    return out.reshape(b, t, d).astype(h.dtype)


def init_cache(cfg: LlamaConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head_kv, max_seq, cfg.head_dim, dtype)


from .common import cache_write as _cache_write, causal_mask as _causal_mask  # noqa: E402
from .common import dequant_cache as _dq  # noqa: E402  (q8 KV cache view)


def forward(params: dict, cfg: LlamaConfig, tokens, pos_start, cache, cache_len,
            *, prefill: bool = False):
    """prefill=True asserts (statically) the cache is empty below pos_start —
    only then may the fused flash path attend just the current tokens.  A
    multi-token step against a POPULATED cache (speculative verify) must
    leave it False so attention reads the cache window."""
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    if cfg.embd_scale != 1.0:  # granite embedding_multiplier
        x = x * cfg.embd_scale
    dt = x.dtype
    rep = cfg.n_head // cfg.n_head_kv
    scale = cfg.attn_scale or 1.0 / np.sqrt(cfg.head_dim)
    # granite residual_multiplier on every sublayer output (static no-op
    # for resid_scale == 1.0 — the Python branch folds at trace time)
    res = (lambda y: y) if cfg.resid_scale == 1.0 else (lambda y: cfg.resid_scale * y)

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)

        # optional qkv biases (Qwen2-family GGUFs carry them; plain Llama
        # does not — reference: llama.cpp qwen2 arch tensors)
        q = _linear(h, params[pre + "attn_q.weight"], params.get(pre + "attn_q.bias")).reshape(b, t, cfg.n_head, cfg.head_dim)
        k = _linear(h, params[pre + "attn_k.weight"], params.get(pre + "attn_k.bias")).reshape(b, t, cfg.n_head_kv, cfg.head_dim)
        v = _linear(h, params[pre + "attn_v.weight"], params.get(pre + "attn_v.bias")).reshape(b, t, cfg.n_head_kv, cfg.head_dim)

        if cfg.qk_norm:  # qwen3: per-head RMSNorm over head_dim, pre-rope
            q = _rms_norm(q, params[pre + "attn_q_norm.weight"], cfg.rms_eps)
            k = _rms_norm(k, params[pre + "attn_k_norm.weight"], cfg.rms_eps)

        if not (cfg.nope_interval and (i + 1) % cfg.nope_interval == 0):
            if cfg.rope_interleaved:
                from .gptj import _rope_interleaved

                q = _rope_interleaved(q, positions, cfg.head_dim, cfg.rope_base)
                k = _rope_interleaved(k, positions, cfg.head_dim, cfg.rope_base)
            else:
                q = _rope_half_scaled(q, positions, cfg)
                k = _rope_half_scaled(k, positions, cfg)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        if t > 1 and prefill and (cfg.use_flash_prefill or t >= cfg.flash_min_seq):
            from ..kernels.flash_attn import flash_attention

            out = flash_attention(q, k, v, mask=_causal_mask(t), scale=scale)
            attn_out = out.reshape(b, t, cfg.n_head * cfg.head_dim).astype(dt)
        else:
            # GQA: each kv head serves n_head/n_head_kv query heads
            qg = q.reshape(b, cfg.n_head_kv, rep, t, cfg.head_dim)
            att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32),
                             _dq(kc).astype(jnp.float32),
                             preferred_element_type=jnp.float32) * scale
            kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
            q_pos = positions[:, None, None, :, None]
            att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
            vcd = _dq(vc)
            att = jax.nn.softmax(att, axis=-1).astype(vcd.dtype)
            out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vcd)
            out = out.reshape(b, cfg.n_head, t, cfg.head_dim).transpose(0, 2, 1, 3)
            attn_out = out.reshape(b, t, cfg.n_head * cfg.head_dim).astype(dt)
        x = x + res(_linear(attn_out, params[pre + "attn_output.weight"]))

        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        if cfg.n_expert > 0:
            x = x + res(moe_ffn_block(params, pre, h, cfg))
        else:
            gate = _linear(h, params[pre + "ffn_gate.weight"])
            up = _linear(h, params[pre + "ffn_up.weight"])
            x = x + res(_linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"]))

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])  # tied fallback
    if "output.weight" not in params and "token_embd.weight@dense" in params:
        w_out = params["token_embd.weight@dense"]
    logits = _linear(x, w_out)
    if cfg.logit_scale != 1.0:  # granite logits_scaling divisor
        logits = logits / cfg.logit_scale
    return logits, tuple(new_cache)


class Llama:
    """Inference wrapper: compiled step + on-device multi-token decode."""

    def __init__(self, params: dict, cfg: LlamaConfig, max_seq: int = 2048, batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_seq = max_seq
        self.batch = batch

        def step(params, tokens, pos_start, cache, cache_len):
            # .prefill() always starts from an empty cache
            return forward(params, cfg, tokens, pos_start, cache, cache_len, prefill=True)

        self._step = jax.jit(step, donate_argnums=(3,))

        def decode_loop(params, cache, first_token, n_past, steps_tokens):
            def body(carry, _):
                cache, tok, n_past = carry
                pos0 = jnp.full((tok.shape[0],), n_past, jnp.int32)
                logits, cache = forward(params, cfg, tok, pos0, cache, n_past)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
                return (cache, nxt, n_past + 1), nxt[:, 0]

            (cache, tok, n_past), toks = jax.lax.scan(body, (cache, first_token, n_past), steps_tokens)
            return cache, toks

        self._decode_loop = jax.jit(decode_loop, donate_argnums=(1,))

    @classmethod
    def from_gguf(cls, path, dtype=jnp.bfloat16, keep_quantized: bool = True,
                  llamacpp_permuted: bool = False, **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        cfg = config_from_gguf(g)
        params = load_params(g, dtype, keep_quantized=keep_quantized)
        if llamacpp_permuted:
            # undo llama.cpp's per-head q/k permutation (its converter packs
            # rotary pairs for the interleaved kernel); must act on dense rows
            for i in range(cfg.n_layer):
                for nm, nh in ((f"blk.{i}.attn_q.weight", cfg.n_head),
                               (f"blk.{i}.attn_k.weight", cfg.n_head_kv)):
                    w = params[nm]
                    if not hasattr(w, "ndim"):  # PlanarWeight: reload dense
                        w = jnp.asarray(g.to_float32(nm), dtype=dtype)
                    params[nm] = unpermute_llamacpp_qk(w, nh)
        return cls(params, cfg, **kw)

    def new_cache(self, dtype=jnp.bfloat16):
        return init_cache(self.cfg, self.batch, self.max_seq, dtype)

    def prefill(self, cache, tokens: np.ndarray):
        t = tokens.shape[1]
        pos0 = jnp.zeros((tokens.shape[0],), jnp.int32)
        logits, cache = self._step(self.params, jnp.asarray(tokens), pos0, cache, jnp.int32(0))
        return logits[:, -1, :], cache, t

    def decode_greedy(self, cache, first_token, n_past: int, n_tokens: int):
        dummy = jnp.zeros((n_tokens,), jnp.int32)
        cache, toks = self._decode_loop(
            self.params, cache, jnp.asarray(first_token), jnp.int32(n_past), dummy
        )
        return cache, np.asarray(toks)

    def generate(self, prompt_tokens: np.ndarray, n_tokens: int, sampler=None, key=None):
        from .common import generate

        return generate(self, prompt_tokens, n_tokens, sampler=sampler, key=key)

    def decode_sampled(self, cache, first_token, n_past, n_tokens, key, **sampler_kw):
        """On-device top-k/top-p sampled decode (see common.make_sampled_decode)."""
        from .common import make_sampled_decode

        if not hasattr(self, "_decode_sampled"):
            self._decode_sampled = make_sampled_decode(self, forward, self.cfg)
        return self._decode_sampled(cache, first_token, n_past, n_tokens, key, **sampler_kw)
