"""GPT-2 — flagship end-to-end model (reference: examples/gpt-2/main-backend.cpp).

TPU-native design:
- weights live as a pytree of jax arrays (bf16/f32 on HBM, or packed quantized
  bytes consumed by Pallas fused dequant-matmul kernels);
- a single jitted decode step with a donated KV cache buffer — the analog of
  ggml's zero-allocation steady state (reserve-once, reuse per token;
  reference: gpt2_eval/main-backend.cpp:730, KV cache :444);
- prefill and decode share one function over a static max sequence length with
  position masking, so XLA compiles exactly two programs (prefill bucket +
  single-token decode).

Weight layout convention: GGUF tensors come in ggml ne order; after load we
keep numpy C-order. Linear weights are stored (out_features, in_features)
(= ggml ne [in, out]) and applied as x @ w.T via ops.mul_mat semantics.
NOTE ggml's gpt-2 conv-era checkpoints store attn/mlp weights transposed
(in, out); the converter normalizes to (out, in).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import os

import numpy as np

from ..dtypes import GGMLType
from ..gguf import GGUFFile
from ..quant import reference as qref


@dataclass(frozen=True)
class GPT2Config:
    n_vocab: int = 50257
    n_ctx: int = 1024
    n_embd: int = 768
    n_head: int = 12
    n_layer: int = 12
    eps: float = 1e-5
    # reference-CPU-compatible gelu: the reference CPU backend evaluates gelu
    # through an fp16 lookup table (GGML_GELU_FP16, src/ggml-cpu/ggml-cpu.c:93,
    # 104-105: out = fp16(gelu(fp16(x)))).  Off by default — exact tanh-gelu
    # is the better numeric — but the e2e parity gate enables it to compare
    # against the reference binary without its ~1e-3 activation noise.
    gelu_fp16: bool = False

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def config_from_gguf(g: GGUFFile) -> GPT2Config:
    md = g.metadata
    return GPT2Config(
        n_vocab=int(md.get("gpt2.vocab_size", md.get("tokenizer.ggml.tokens") and len(md["tokenizer.ggml.tokens"]) or 50257)),
        n_ctx=int(md["gpt2.context_length"]),
        n_embd=int(md["gpt2.embedding_length"]),
        n_head=int(md["gpt2.attention.head_count"]),
        n_layer=int(md["gpt2.block_count"]),
    )


def load_params(g: GGUFFile, dtype=jnp.float32, keep_quantized: bool = False) -> dict:
    """Load GGUF tensors.

    keep_quantized=False: dequantize everything to `dtype` (correctness
    baseline — the analog of gpt-2 f32 models).
    keep_quantized=True: 2-D quantized matmul weights are repacked to the
    planar layout and stay packed in HBM, consumed by the Pallas fused
    dequant-matmul kernels (the analog of ggml computing directly on Q tensors
    via vec_dot; reference: src/ggml-cpu/ggml-cpu.c:7428). The token embedding
    is additionally kept dense for get_rows lookups.
    """
    from ..quant.planar import planar_types, repack

    params: dict[str, Any] = {}
    for name, info in g.tensors.items():
        is_matmul_weight = (
            name.endswith(".weight")
            and len(info.shape) == 2
            and "norm" not in name
            and name != "position_embd.weight"
        )
        if (
            keep_quantized
            and is_matmul_weight
            and GGMLType(info.ggml_type) in planar_types()
        ):
            n, k = info.shape
            # packed-nibble planes where the format allows (half the HBM code
            # traffic; the GEMV unpacks for free), int8 codes otherwise.
            # GGML_TPU_LOAD_Q8=1 forces int8 (needed for TP row sharding).
            force_q8 = os.environ.get("GGML_TPU_LOAD_Q8", "0") == "1"
            pw = repack(g.tensor_bytes(name), GGMLType(info.ggml_type), (int(n), int(k)), force_q8=force_q8)
            params[name] = pw.to_device()
            if name == "token_embd.weight":  # dense copy for the row gather
                params["token_embd.weight@dense"] = jnp.asarray(g.to_float32(name), dtype=dtype)
        else:
            params[name] = jnp.asarray(g.to_float32(name), dtype=dtype)
    return params


def init_random_params(cfg: GPT2Config, seed: int = 0, dtype=jnp.float32) -> dict:
    """Random-initialized weights in the same naming scheme the converter emits."""
    rng = np.random.default_rng(seed)

    def t(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * scale, dtype=dtype)

    p = {
        "token_embd.weight": t(cfg.n_vocab, cfg.n_embd),
        "position_embd.weight": t(cfg.n_ctx, cfg.n_embd),
        "output_norm.weight": jnp.ones((cfg.n_embd,), dtype),
        "output_norm.bias": jnp.zeros((cfg.n_embd,), dtype),
    }
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        p[pre + "attn_norm.weight"] = jnp.ones((cfg.n_embd,), dtype)
        p[pre + "attn_norm.bias"] = jnp.zeros((cfg.n_embd,), dtype)
        p[pre + "attn_qkv.weight"] = t(3 * cfg.n_embd, cfg.n_embd)
        p[pre + "attn_qkv.bias"] = jnp.zeros((3 * cfg.n_embd,), dtype)
        p[pre + "attn_output.weight"] = t(cfg.n_embd, cfg.n_embd)
        p[pre + "attn_output.bias"] = jnp.zeros((cfg.n_embd,), dtype)
        p[pre + "ffn_norm.weight"] = jnp.ones((cfg.n_embd,), dtype)
        p[pre + "ffn_norm.bias"] = jnp.zeros((cfg.n_embd,), dtype)
        p[pre + "ffn_up.weight"] = t(4 * cfg.n_embd, cfg.n_embd)
        p[pre + "ffn_up.bias"] = jnp.zeros((4 * cfg.n_embd,), dtype)
        p[pre + "ffn_down.weight"] = t(cfg.n_embd, 4 * cfg.n_embd)
        p[pre + "ffn_down.bias"] = jnp.zeros((cfg.n_embd,), dtype)
    return p


def init_cache(cfg: GPT2Config, batch: int, max_seq: int, dtype=jnp.float32):
    """KV cache pytree: per layer (k, v), each (batch, n_head, max_seq, head_dim)."""
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head, max_seq, cfg.head_dim, dtype)


from .common import layer_norm as _layer_norm, linear as _linear  # noqa: E402


def _gelu(x):
    return 0.5 * x * (1.0 + jnp.tanh(0.79788456080286535588 * x * (1.0 + 0.044715 * x * x)))


def _gelu_fp16(x):
    """The reference CPU backend's gelu: fp16-quantized input indexes a
    precomputed fp16 table (GGML_GELU_FP16) — out = fp16(gelu(fp16(x)))."""
    xh = x.astype(jnp.float16).astype(jnp.float32)
    return _gelu(xh).astype(jnp.float16).astype(x.dtype)


def forward(params: dict, cfg: GPT2Config, tokens, pos_start, cache, cache_len,
            *, prefill: bool = False, train_flash: bool = False):
    """One step over `tokens` (batch, T): returns (logits, new_cache).

    prefill is accepted for forward-signature parity with gptj/llama (no
    fused flash path here — attention always reads the cache window).

    train_flash=True (training from an empty cache only): attention runs
    through the differentiable fused flash kernel
    (kernels.flash_attn.flash_attention_train) — O(seq) residuals instead
    of the (B, H, T, T) attention matrices the einsum path saves for the
    backward, which dominate training-step HBM traffic at LM shapes.  The
    cache writes become dead code under jit (training discards the cache),
    so XLA removes them.

    pos_start: (batch,) starting position of tokens in each sequence (static
    shapes; cache_len = positions already in cache for attention masking).
    """
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens] + params["position_embd.weight"][positions]

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    scale = 1.0 / np.sqrt(cfg.head_dim)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _layer_norm(x, params[pre + "attn_norm.weight"], params[pre + "attn_norm.bias"], cfg.eps)
        qkv = _linear(h, params[pre + "attn_qkv.weight"], params[pre + "attn_qkv.bias"])
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(b, t, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)  # (b, h, t, d)
        # write into the cache (scalar cache_len: same start per batch row;
        # (b,) vector: per-slot continuous-batching positions)
        from .common import cache_write

        kc = cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        if train_flash and t > 1:
            from .common import causal_mask
            from ..kernels.flash_attn import flash_attention_train

            out = flash_attention_train(q, k, v, mask=causal_mask(t),
                                        scale=scale)  # (b, t, h, d)
            out = out.reshape(b, t, cfg.n_embd).astype(x.dtype)
        else:
            # attention over the full cache with causal+length mask
            att = jnp.einsum("bhqd,bhkd->bhqk", q, kc, precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32) * scale
            kv_pos = jnp.arange(max_seq)[None, None, None, :]
            q_pos = positions[:, None, :, None]
            mask = kv_pos <= q_pos
            att = jnp.where(mask, att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", att, vc, precision=jax.lax.Precision.HIGHEST)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_embd).astype(x.dtype)
        x = x + _linear(out, params[pre + "attn_output.weight"], params[pre + "attn_output.bias"])

        h = _layer_norm(x, params[pre + "ffn_norm.weight"], params[pre + "ffn_norm.bias"], cfg.eps)
        gelu = _gelu_fp16 if cfg.gelu_fp16 else _gelu
        h = gelu(_linear(h, params[pre + "ffn_up.weight"], params[pre + "ffn_up.bias"]))
        x = x + _linear(h, params[pre + "ffn_down.weight"], params[pre + "ffn_down.bias"])

    x = _layer_norm(x, params["output_norm.weight"], params["output_norm.bias"], cfg.eps)
    logits = _linear(x, params["token_embd.weight"])  # tied lm head
    return logits, tuple(new_cache)


class GPT2:
    """Inference wrapper with compiled prefill + decode (zero-alloc steady state
    via donated cache, the gallocr-reserve analog)."""

    def __init__(self, params: dict, cfg: GPT2Config, max_seq: int = 512, batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_seq = max_seq
        self.batch = batch

        def step(params, tokens, pos_start, cache, cache_len):
            return forward(params, cfg, tokens, pos_start, cache, cache_len)

        # donate the cache so XLA updates it in place; cache_len stays traced so
        # the decode step compiles ONCE and is reused for every token
        self._step = jax.jit(step, donate_argnums=(3,))

    @classmethod
    def from_gguf(cls, path, dtype=jnp.float32, keep_quantized: bool = False, **kw):
        g = GGUFFile(path)
        cfg = config_from_gguf(g)
        params = load_params(g, dtype, keep_quantized=keep_quantized)
        return cls(params, cfg, **kw)

    def new_cache(self, dtype=jnp.float32):
        return init_cache(self.cfg, self.batch, self.max_seq, dtype)

    def prefill(self, cache, tokens: np.ndarray):
        """tokens: (batch, T). Returns (logits_last, cache, n_past)."""
        t = tokens.shape[1]
        pos0 = jnp.zeros((tokens.shape[0],), jnp.int32)
        logits, cache = self._step(self.params, jnp.asarray(tokens), pos0, cache, jnp.int32(0))
        return logits[:, -1, :], cache, t

    def decode_step(self, cache, token, n_past: int):
        """token: (batch, 1) int32. Returns (logits, cache)."""
        pos0 = jnp.full((token.shape[0],), n_past, jnp.int32)
        logits, cache = self._step(self.params, token, pos0, cache, jnp.int32(n_past))
        return logits[:, -1, :], cache

    def generate(self, prompt_tokens: np.ndarray, n_tokens: int, sampler=None, key=None):
        """Greedy/sampled generation loop. Returns list of generated token ids."""
        cache = self.new_cache()
        logits, cache, n_past = self.prefill(cache, prompt_tokens)
        out = []
        for _ in range(n_tokens):
            if sampler is None:
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                tok, key = sampler(logits, key)
            out.append(int(tok[0]))
            logits, cache = self.decode_step(cache, tok[:, None], n_past)
            n_past += 1
        return out
