"""DeepSeek V2/V3 family (llama.cpp arch 'deepseek2') — Multi-head Latent
Attention (MLA) + sigmoid/softmax-routed group-limited MoE with shared
experts and leading dense layers.

MLA is implemented in the ABSORBED form everywhere (prefill and decode):
the cache stores only the rank-`kv_lora_rank` latent c_kv plus the shared
rope key k_rot — (kv_lora_rank + qk_rope_dim) floats/token regardless of
head count (DeepSeek-V3: 576 vs 32768 for the expanded cache, a 57x KV
memory/bandwidth win).  Instead of expanding keys/values per head, the
per-head non-rope query is projected INTO the latent space through
W_uk (q_eff = q_nope @ W_uk) and attention runs against c_kv directly;
the context is mapped back out through W_uv.  Algebraically identical to
the expanded attention (gated parity tests vs HF torch prove it).

Routing matches HF transformers.models.deepseek_v3: scores (sigmoid for V3,
softmax for V2) + e_score_correction_bias for SELECTION only, top-2-sum
group limiting over n_group groups, top-k inside surviving groups, gate
weights taken from the ORIGINAL scores, optional renormalize, times
routed_scaling_factor.  Expert compute reuses the llama-family MoE engines
(dense gate-masked sum at decode, sorted ragged grouped GEMM at prefill).

Reference parity: llama.cpp's deepseek2 arch; GGUF keys follow its naming
(attention.{q,kv}_lora_rank, leading_dense_block_count, expert_gating_func,
expert_weights_scale/_norm, exp_probs_b).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import dequant_cache as _dq
from .common import linear as _linear
from .llama import _rms_norm, _rope_half, moe_expert_sum, moe_expert_sum_grouped


@dataclass(frozen=True)
class DeepseekConfig:
    n_vocab: int = 32000
    n_ctx: int = 4096
    n_embd: int = 1024
    n_head: int = 16
    n_layer: int = 2
    n_ff: int = 4096
    n_dense_lead: int = 1  # first_k_dense_replace
    q_lora_rank: int = 0  # 0 = direct q projection
    kv_lora_rank: int = 512
    qk_nope_dim: int = 128
    qk_rope_dim: int = 64
    v_head_dim: int = 128
    n_expert: int = 0
    n_expert_used: int = 0
    n_shared: int = 2  # shared-expert multiplier (compute uses tensor shapes)
    n_group: int = 1
    topk_group: int = 1
    score_func: str = "sigmoid"  # V3; V2 uses softmax
    moe_renorm: bool = True
    routed_scale: float = 1.0
    rope_base: float = 10000.0
    rms_eps: float = 1e-6
    rope_interleave: bool = True  # HF checkpoints keep interleaved rope dims
    attn_scale: float = 0.0  # 0 -> qk_head_dim**-0.5 (yarn mscale folds here)

    @property
    def qk_head_dim(self):
        return self.qk_nope_dim + self.qk_rope_dim


def config_from_gguf(g: GGUFFile) -> DeepseekConfig:
    md = g.metadata
    a = "deepseek2"
    gating = int(md.get(f"{a}.expert_gating_func", 1))  # 1 softmax, 2 sigmoid
    return DeepseekConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 32000)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=int(md[f"{a}.attention.head_count"]),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_dense_lead=int(md.get(f"{a}.leading_dense_block_count", 0)),
        q_lora_rank=int(md.get(f"{a}.attention.q_lora_rank", 0)),
        kv_lora_rank=int(md[f"{a}.attention.kv_lora_rank"]),
        qk_rope_dim=int(md[f"{a}.rope.dimension_count"]),
        qk_nope_dim=int(md[f"{a}.attention.key_length"])
        - int(md[f"{a}.rope.dimension_count"]),
        v_head_dim=int(md[f"{a}.attention.value_length"]),
        n_expert=int(md.get(f"{a}.expert_count", 0)),
        n_expert_used=int(md.get(f"{a}.expert_used_count", 0)),
        n_shared=int(md.get(f"{a}.expert_shared_count", 0)),
        n_group=int(md.get(f"{a}.expert_group_count", 1)),
        topk_group=int(md.get(f"{a}.expert_group_used_count", 1)),
        score_func="sigmoid" if gating == 2 else "softmax",
        moe_renorm=bool(md.get(f"{a}.expert_weights_norm", True)),
        routed_scale=float(md.get(f"{a}.expert_weights_scale", 1.0)),
        rope_base=float(md.get(f"{a}.rope.freq_base", 10000.0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)),
        rope_interleave=bool(md.get(f"{a}.rope_interleave", True)),
    )


def _deinterleave(x):
    """(..., d) interleaved rope pairs -> rotate-half layout (HF
    apply_rotary_pos_emb_interleave's view/transpose)."""
    *lead, d = x.shape
    return x.reshape(*lead, d // 2, 2).swapaxes(-1, -2).reshape(*lead, d)


def deepseek_route(h, w_router, bias, cfg: DeepseekConfig):
    """Group-limited top-k routing.  h (b,t,D), w_router (E,D), bias (E,).
    Returns (weights, idx) each (b,t,k)."""
    logits = jnp.einsum("btd,ed->bte", h.astype(jnp.float32),
                        w_router.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)
    if cfg.score_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    choice = scores + bias.astype(jnp.float32)  # bias biases SELECTION only
    E, g = cfg.n_expert, cfg.n_group
    if g > 1:
        per = E // g
        grouped = choice.reshape(*choice.shape[:-1], g, per)
        # group score = sum of its top-2 member scores (HF get_topk_indices)
        gscore = jax.lax.top_k(grouped, min(2, per))[0].sum(-1)  # (b,t,g)
        _, gidx = jax.lax.top_k(gscore, cfg.topk_group)
        gmask = jax.nn.one_hot(gidx, g, dtype=choice.dtype).sum(-2)  # (b,t,g)
        choice = jnp.where(gmask[..., None] > 0.5, grouped, 0.0).reshape(
            *choice.shape[:-1], E)
    _, idx = jax.lax.top_k(choice, cfg.n_expert_used)
    wts = jnp.take_along_axis(scores, idx, axis=-1)
    if cfg.moe_renorm:
        wts = wts / (wts.sum(-1, keepdims=True) + 1e-20)
    return wts * cfg.routed_scale, idx


def _moe_block(params, pre, h, cfg: DeepseekConfig):
    wts, idx = deepseek_route(h, params[pre + "ffn_gate_inp.weight"],
                              params[pre + "exp_probs_b.bias"], cfg)
    w_gate = params[pre + "ffn_gate_exps.weight"]
    w_up = params[pre + "ffn_up_exps.weight"]
    w_down = params[pre + "ffn_down_exps.weight"]
    n_tokens = h.shape[0] * h.shape[1]
    mode = os.environ.get("GGML_TPU_MOE_GROUPED", "auto")
    if mode == "1" or (mode == "auto" and n_tokens >= 16):
        out = moe_expert_sum_grouped(h, w_gate, w_up, w_down, wts, idx,
                                     cfg.n_expert)
    else:
        onehot = jax.nn.one_hot(idx, cfg.n_expert, dtype=jnp.float32)
        gates = jnp.einsum("btk,btke->bte", wts, onehot)
        out = moe_expert_sum(h, w_gate, w_up, w_down, gates)
    # shared experts: plain SwiGLU, always added (no gate scalar)
    gate = _linear(h, params[pre + "ffn_gate_shexp.weight"])
    up = _linear(h, params[pre + "ffn_up_shexp.weight"])
    return out + _linear(jax.nn.silu(gate) * up,
                         params[pre + "ffn_down_shexp.weight"])


def init_cache(cfg: DeepseekConfig, batch: int, max_seq: int,
               dtype=jnp.bfloat16):
    """Per-layer (c_kv (b,1,S,kv_lora_rank), k_rot (b,1,S,qk_rope_dim)) —
    the compressed MLA cache (the whole point of the architecture).

    dtype="q8_kv" quantizes the LATENT rows (int8 codes + one f32 scale per
    (b, pos) row for both the kv_lora_rank latent and the shared rope key) —
    on top of MLA's 57x compression, another ~2x for ~0.3% of a dense bf16
    cache per token."""
    from .common import QUANT_KV_DTYPE, QuantKV

    if dtype == QUANT_KV_DTYPE:
        def mk(d):
            return QuantKV(jnp.zeros((batch, 1, max_seq, d), jnp.int8),
                           jnp.zeros((batch, 1, max_seq, 1), jnp.float32))
        return tuple((mk(cfg.kv_lora_rank), mk(cfg.qk_rope_dim))
                     for _ in range(cfg.n_layer))
    return tuple(
        (jnp.zeros((batch, 1, max_seq, cfg.kv_lora_rank), dtype),
         jnp.zeros((batch, 1, max_seq, cfg.qk_rope_dim), dtype))
        for _ in range(cfg.n_layer))


def forward(params: dict, cfg: DeepseekConfig, tokens, pos_start, cache,
            cache_len, *, prefill: bool = False):
    """Absorbed-MLA forward over t tokens.  Returns (logits, new_cache)."""
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]  # (b, t)
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    H, nope, rope_d = cfg.n_head, cfg.qk_nope_dim, cfg.qk_rope_dim
    scale = cfg.attn_scale or cfg.qk_head_dim ** -0.5
    hp = jax.lax.Precision.HIGHEST

    k_pos = jnp.arange(max_seq)
    causal = positions[:, None, :, None] >= k_pos[None, None, None, :]
    written = k_pos[None, None, None, :] <= positions[:, None, :, None]
    mask = causal & written  # (b,1,t,S) -> broadcasts over heads

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)

        if cfg.q_lora_rank:
            qa = _rms_norm(_linear(h, params[pre + "attn_q_a.weight"]),
                           params[pre + "attn_q_a_norm.weight"], cfg.rms_eps)
            q = _linear(qa, params[pre + "attn_q_b.weight"])
        else:
            q = _linear(h, params[pre + "attn_q.weight"])
        q = q.reshape(b, t, H, cfg.qk_head_dim)
        q_pass, q_rot = q[..., :nope], q[..., nope:]

        ckv = _linear(h, params[pre + "attn_kv_a_mqa.weight"])
        c_t, krot_t = ckv[..., : cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank:]
        c_t = _rms_norm(c_t, params[pre + "attn_kv_a_norm.weight"], cfg.rms_eps)

        if cfg.rope_interleave:
            q_rot = _deinterleave(q_rot)
            krot_t = _deinterleave(krot_t)
        q_rot = _rope_half(q_rot, positions, cfg.rope_base)
        krot_t = _rope_half(krot_t[:, :, None, :], positions,
                            cfg.rope_base)[:, :, 0, :]

        cc = _cache_write(new_cache[i][0], c_t[:, None].astype(cache_dtype), cache_len)
        kc = _cache_write(new_cache[i][1], krot_t[:, None].astype(cache_dtype), cache_len)
        new_cache[i] = (cc, kc)
        c_all = _dq(cc)[:, 0]  # (b, S, rank); q8 latent dequants on read
        krot_all = _dq(kc)[:, 0]  # (b, S, rope_d)

        # absorb: project per-head q_nope into the latent space through W_uk
        w_kv_b = params[pre + "attn_kv_b.weight"].reshape(
            H, nope + cfg.v_head_dim, cfg.kv_lora_rank)
        w_uk, w_uv = w_kv_b[:, :nope, :], w_kv_b[:, nope:, :]
        q_eff = jnp.einsum("bthn,hnr->bthr", q_pass, w_uk, precision=hp)

        att = (jnp.einsum("bthr,bsr->bhts", q_eff.astype(jnp.float32),
                          c_all.astype(jnp.float32), precision=hp)
               + jnp.einsum("bthp,bsp->bhts", q_rot.astype(jnp.float32),
                            krot_all.astype(jnp.float32), precision=hp))
        att = jnp.where(mask, att * scale, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)

        ctx = jnp.einsum("bhts,bsr->bthr", att, c_all.astype(jnp.float32),
                         precision=hp).astype(x.dtype)
        o = jnp.einsum("bthr,hvr->bthv", ctx, w_uv, precision=hp)
        x = x + _linear(o.reshape(b, t, H * cfg.v_head_dim),
                        params[pre + "attn_output.weight"])

        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        if i < cfg.n_dense_lead or cfg.n_expert == 0:
            gate = _linear(h, params[pre + "ffn_gate.weight"])
            up = _linear(h, params[pre + "ffn_up.weight"])
            x = x + _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"])
        else:
            x = x + _moe_block(params, pre, h, cfg)

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


class Deepseek:
    """Inference wrapper: compiled step + on-device greedy decode (mirrors
    models.llama.Llama)."""

    def __init__(self, params: dict, cfg: DeepseekConfig, max_seq: int = 2048,
                 batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_seq = max_seq
        self.batch = batch

        self._step = jax.jit(
            lambda p, tok, pos, cache, clen:
            forward(p, cfg, tok, pos, cache, clen, prefill=True),
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
    def from_gguf(cls, path, dtype=jnp.float32, keep_quantized: bool = False,
                  **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        params = load_params(g, dtype, keep_quantized=keep_quantized)
        # attn_kv_b is consumed reshaped into per-head W_uk/W_uv blocks (the
        # absorption), not as a row matmul — keep it dense regardless
        for name in list(params):
            if name.endswith("attn_kv_b.weight") and not hasattr(params[name], "ndim"):
                params[name] = jnp.asarray(g.to_float32(name), dtype=dtype)
        return cls(params, config_from_gguf(g), **kw)

    def new_cache(self, dtype=jnp.bfloat16):
        return init_cache(self.cfg, self.batch, self.max_seq, dtype)

    def prefill(self, cache, tokens: np.ndarray):
        pos0 = jnp.zeros((tokens.shape[0],), jnp.int32)
        logits, cache = self._step(self.params, jnp.asarray(tokens), pos0,
                                   cache, jnp.int32(0))
        return logits[:, -1, :], cache, tokens.shape[1]

    def decode_greedy(self, cache, first_token, n_past: int, n_tokens: int):
        dummy = jnp.zeros((n_tokens,), jnp.int32)
        cache, toks = self._decode_loop(
            self.params, cache, jnp.asarray(first_token), jnp.int32(n_past), dummy)
        return cache, np.asarray(toks)

    def generate(self, prompt_tokens: np.ndarray, n_tokens: int, sampler=None,
                 key=None):
        from .common import generate

        return generate(self, prompt_tokens, n_tokens, sampler=sampler, key=key)
