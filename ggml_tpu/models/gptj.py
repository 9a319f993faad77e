"""GPT-J 6B — the north-star quantized decode config.

Reference: examples/gpt-j/main.cpp — parallel residual (attn and mlp both read
the SAME post-layernorm activations and add into the residual stream,
main.cpp:449-565), separate unbiased q/k/v projections (:463-468), interleaved
RoPE on the first n_rot=64 dims (ggml_rope mode 0, :463-464), biased mlp
(:539-556) and biased untied lm head (:582-585).

TPU-native points:
- quantized weights stay packed in HBM as PlanarWeight planes and run through
  the fused dequant-matmul Pallas kernels (ggml_tpu.kernels.qmatmul);
- decode_loop runs the WHOLE multi-token generation as one jitted lax.scan —
  the host never round-trips per token (ggml's zero-alloc steady state, taken
  one step further because dispatch latency over PCIe/ICI matters on TPU);
- the KV cache is a donated carry, so XLA updates it in place.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import GGMLType
from ..gguf import GGUFFile


@dataclass(frozen=True)
class GPTJConfig:
    n_vocab: int = 50400
    n_ctx: int = 2048
    n_embd: int = 4096
    n_head: int = 16
    n_layer: int = 28
    n_rot: int = 64
    eps: float = 1e-5
    # fused Pallas flash attention for multi-token (prefill-from-empty) steps;
    # bf16 MXU rounding (~1e-5 NMSE) vs the fp32 jnp path.  Measured
    # crossover on v5e: XLA's own attention fusion wins below ~1-2k tokens,
    # the flash kernel wins above (2.3x at 2048) — so prefill picks
    # automatically by length unless use_flash_prefill forces it on
    use_flash_prefill: bool = False
    flash_min_seq: int = 1024
    # reference-CPU-compatible gelu (GGML_GELU_FP16 table: out =
    # fp16(gelu(fp16(x))), src/ggml-cpu/ggml-cpu.c:93,104-105) — off by
    # default; the e2e reference parity gate enables it
    gelu_fp16: bool = False
    # q/k weight columns were permuted at load (rope_permutation) so RoPE
    # runs deinterleaved — see _rope_deinterleaved.  Set by from_gguf and
    # synth_quantized_params; leave False for unpermuted weights
    rope_deinterleaved: bool = False

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def config_from_gguf(g: GGUFFile) -> GPTJConfig:
    md = g.metadata
    return GPTJConfig(
        n_vocab=int(md.get("gptj.vocab_size", 50400)),
        n_ctx=int(md["gptj.context_length"]),
        n_embd=int(md["gptj.embedding_length"]),
        n_head=int(md["gptj.attention.head_count"]),
        n_layer=int(md["gptj.block_count"]),
        n_rot=int(md.get("gptj.rope.dimension_count", 64)),
    )


from .common import layer_norm as _layer_norm, linear as _linear  # noqa: E402


def _rope_interleaved(x, positions, n_rot: int, base: float = 10000.0):
    """ggml rope mode 0 (GPT-J interleaved pairs) on the first n_rot dims.
    x: (b, t, h, d); positions: (b, t)."""
    d = x.shape[-1]
    half = n_rot // 2
    inv_freq = (base ** (-2.0 * np.arange(half) / n_rot)).astype(np.float32)
    theta = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]  # (b,t,half)
    cos = jnp.cos(theta)[:, :, None, :]
    sin = jnp.sin(theta)[:, :, None, :]
    rot, rest = x[..., :n_rot], x[..., n_rot:]
    x0 = rot[..., 0::2]
    x1 = rot[..., 1::2]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    out = jnp.stack([o0, o1], axis=-1).reshape(rot.shape)
    return jnp.concatenate([out, rest], axis=-1) if rest.shape[-1] else out


def _rope_deinterleaved(x, positions, n_rot: int, base: float = 10000.0):
    """Mode-0 RoPE in a DEINTERLEAVED head layout: the q/k weight output
    columns were permuted at load (rope_permutation) so logical pair
    (2j, 2j+1) lives at dims (j, j+n_rot/2) — the rotation becomes two
    contiguous half-slices and a concat, with no even/odd strided slice, no
    stack, and no interleave relayout copy on the decode hot path (the
    stack+reshape in _rope_interleaved costs an XLA relayout copy per q and
    per k per layer).  Attention dots are invariant to the fixed per-head
    permutation because q and k are permuted identically; v is untouched."""
    half = n_rot // 2
    inv_freq = (base ** (-2.0 * np.arange(half) / n_rot)).astype(np.float32)
    theta = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    cos = jnp.cos(theta)[:, :, None, :]
    sin = jnp.sin(theta)[:, :, None, :]
    x0, x1, rest = x[..., :half], x[..., half:n_rot], x[..., n_rot:]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    parts = (o0, o1, rest) if rest.shape[-1] else (o0, o1)
    return jnp.concatenate(parts, axis=-1)


def rope_permutation(head_dim: int, n_head: int, n_rot: int) -> np.ndarray:
    """Output-feature permutation that moves each head's even rotary dims
    first and odd second ([0,2,..,n_rot-2, 1,3,..,n_rot-1, n_rot..]) so
    _rope_deinterleaved applies mode-0 RoPE with contiguous slices."""
    within = np.concatenate([
        np.arange(0, n_rot, 2), np.arange(1, n_rot, 2), np.arange(n_rot, head_dim)
    ])
    return (np.arange(n_head)[:, None] * head_dim + within[None, :]).reshape(-1)


def init_cache(cfg: GPTJConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_layer, batch, cfg.n_head, max_seq, cfg.head_dim, dtype)


def forward(params: dict, cfg: GPTJConfig, tokens, pos_start, cache, cache_len,
            *, prefill: bool = False):
    """tokens (b, t) -> (logits (b, t, n_vocab), new_cache).

    prefill=True asserts (statically) that the cache is empty below pos_start —
    only then may the fused flash path attend just the current tokens.  A
    multi-token step against a POPULATED cache (speculative verify) must leave
    it False so attention reads the cache window."""
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    compute_dtype = x.dtype

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    scale = 1.0 / np.sqrt(cfg.head_dim)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _layer_norm(x, params[pre + "attn_norm.weight"], params[pre + "attn_norm.bias"], cfg.eps)

        ff_pre = None
        if pre + "attn_qkvup.weight" in params:  # qkv + ffn_up in ONE kernel
            fused = _linear(h, params[pre + "attn_qkvup.weight"])
            q, k, v, ff_pre = jnp.split(fused, [cfg.n_embd, 2 * cfg.n_embd, 3 * cfg.n_embd], axis=-1)
        elif pre + "attn_qkv.weight" in params:  # fused projection (fewer, wider kernels)
            qkv = _linear(h, params[pre + "attn_qkv.weight"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = _linear(h, params[pre + "attn_q.weight"])
            k = _linear(h, params[pre + "attn_k.weight"])
            v = _linear(h, params[pre + "attn_v.weight"])

        def heads(z):
            return z.reshape(b, t, cfg.n_head, cfg.head_dim)

        rope = _rope_deinterleaved if cfg.rope_deinterleaved else _rope_interleaved
        q = rope(heads(q), positions, cfg.n_rot).transpose(0, 2, 1, 3)
        k = rope(heads(k), positions, cfg.n_rot).transpose(0, 2, 1, 3)
        v = heads(v).transpose(0, 2, 1, 3)

        from .common import cache_write, causal_mask

        fuse_decode = (
            t == 1 and b == 1 and not jnp.ndim(cache_len)
            and isinstance(new_cache[i][0], jnp.ndarray)
            and os.environ.get("GGML_TPU_FUSED_DECODE_ATTN", "1") == "1"
        )
        if fuse_decode:
            # single-token decode: the attention block (two einsums, mask,
            # softmax, casts — ~10 small XLA ops of ~1-2 us launch latency
            # each) runs as ONE pallas call per layer over the PRE-update
            # cache with the new row inserted in registers; the HBM row
            # write below overlaps it (kernels/decode_attn.py)
            from ..kernels.decode_attn import fused_decode_attention

            out = fused_decode_attention(
                q, k.astype(cache_dtype), v.astype(cache_dtype),
                new_cache[i][0], new_cache[i][1], cache_len, scale=scale)
            attn_out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_embd).astype(compute_dtype)

        kc = cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        if fuse_decode:
            pass
        elif t > 1 and prefill and (cfg.use_flash_prefill or t >= cfg.flash_min_seq):
            # prefill-from-empty: attend the current tokens only through the
            # fused Pallas kernel (cache history is empty by contract)
            from ..kernels.flash_attn import flash_attention
            _causal_mask = causal_mask

            out = flash_attention(q, k, v, mask=_causal_mask(t), scale=scale)
            attn_out = out.reshape(b, t, cfg.n_embd).astype(compute_dtype)
        else:
            from .common import dequant_cache as _dq  # q8 KV cache view

            att = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                             _dq(kc).astype(jnp.float32),
                             preferred_element_type=jnp.float32) * scale
            kv_pos = jnp.arange(max_seq)[None, None, None, :]
            q_pos = positions[:, None, :, None]
            att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
            vcd = _dq(vc)
            att = jax.nn.softmax(att, axis=-1).astype(vcd.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", att, vcd)
            attn_out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_embd).astype(compute_dtype)
        attn_out = _linear(attn_out, params[pre + "attn_output.weight"])

        # parallel residual: mlp reads the SAME normed input (main.cpp:538-541)
        if ff_pre is not None:
            ff = ff_pre + params[pre + "ffn_up.bias"]
        else:
            ff = _linear(h, params[pre + "ffn_up.weight"], params[pre + "ffn_up.bias"])
        if cfg.gelu_fp16:
            from .gpt2 import _gelu_fp16

            ff = _gelu_fp16(ff)
        else:
            ff = 0.5 * ff * (1.0 + jnp.tanh(0.79788456080286535588 * ff * (1.0 + 0.044715 * ff * ff)))
        ff = _linear(ff, params[pre + "ffn_down.weight"], params[pre + "ffn_down.bias"])

        x = x + attn_out + ff

    x = _layer_norm(x, params["output_norm.weight"], params["output_norm.bias"], cfg.eps)
    logits = _linear(x, params["output.weight"], params.get("output.bias"))
    return logits, tuple(new_cache)


class GPTJ:
    """Inference wrapper: compiled prefill + on-device multi-token decode."""

    def __init__(self, params: dict, cfg: GPTJConfig, max_seq: int = 2048, batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_seq = max_seq
        self.batch = batch

        def step(params, tokens, pos_start, cache, cache_len):
            # .prefill() always starts from an empty cache
            return forward(params, cfg, tokens, pos_start, cache, cache_len, prefill=True)

        self._step = jax.jit(step, donate_argnums=(3,))

        def decode_loop(params, cache, first_token, n_past, steps_tokens):
            """Greedy-decode len(steps_tokens) tokens entirely on device.
            steps_tokens is a dummy (n,) array fixing the trip count."""

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
    def from_gguf(cls, path, dtype=jnp.bfloat16, keep_quantized: bool = True,
                  rope_deinterleaved: bool = True, **kw):
        from .gpt2 import load_params  # same GGUF tensor-naming loader

        g = GGUFFile(path)
        cfg = config_from_gguf(g)
        params = load_params(g, dtype, keep_quantized=keep_quantized)
        if rope_deinterleaved:
            # on-load q/k column permutation -> contiguous-slice RoPE on the
            # decode hot path (exact: see _rope_deinterleaved)
            import dataclasses

            from ..quant.planar import PlanarWeight, permute_output_columns

            perm = rope_permutation(cfg.head_dim, cfg.n_head, cfg.n_rot)
            for i in range(cfg.n_layer):
                for nm in ("attn_q.weight", "attn_k.weight"):
                    key = f"blk.{i}.{nm}"
                    v = params[key]
                    params[key] = (
                        permute_output_columns(v, perm)
                        if isinstance(v, PlanarWeight) else v[perm]
                    )
            cfg = dataclasses.replace(cfg, rope_deinterleaved=True)
        return cls(params, cfg, **kw)

    def new_cache(self, dtype=jnp.bfloat16):
        return init_cache(self.cfg, self.batch, self.max_seq, dtype)

    def prefill(self, cache, tokens: np.ndarray):
        t = tokens.shape[1]
        pos0 = jnp.zeros((tokens.shape[0],), jnp.int32)
        logits, cache = self._step(self.params, jnp.asarray(tokens), pos0, cache, jnp.int32(0))
        return logits[:, -1, :], cache, t

    def decode_greedy(self, cache, first_token, n_past: int, n_tokens: int):
        """Generate n_tokens with zero host round-trips. Returns (cache, ids)."""
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


def random_config(scale: str = "6b") -> GPTJConfig:
    # rope_deinterleaved: synthetic codes are value-free, so the bench takes
    # the contiguous-slice RoPE path directly (no permutation needed)
    if scale == "6b":
        return GPTJConfig(rope_deinterleaved=True)
    if scale == "tiny":
        return GPTJConfig(n_vocab=512, n_ctx=256, n_embd=256, n_head=4, n_layer=2, n_rot=32,
                          rope_deinterleaved=True)
    raise ValueError(scale)


def synth_quantized_params(
    cfg: GPTJConfig,
    ggml_type: GGMLType = GGMLType.Q4_K,
    seed: int = 0,
    dtype=jnp.bfloat16,
    fuse_qkv: bool = True,
    use_q4: bool | None = None,
) -> dict:
    """Synthesize a full parameter set with weights ALREADY in planar-quantized
    form (random codes, small scales) — for benchmarking the quantized decode
    path without a 6B-parameter quantization pass or model download.
    Values are well-scaled so the forward pass stays finite.

    use_q4: keep 4-bit formats as packed-nibble planes (half the HBM code
    traffic; the packed GEMV unpacks for free — tools/microbench_gemv_q4.py).
    Default on for q4-capable types; GGML_TPU_SYNTH_Q4=0 forces int8 codes."""
    from ..quant.planar import _Q4_PLANE_TYPES, PlanarWeight

    if use_q4 is None:
        use_q4 = (
            os.environ.get("GGML_TPU_SYNTH_Q4", "1") != "0"
            and ggml_type in _Q4_PLANE_TYPES
        )
    G = 32 if ggml_type not in (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q6_K) else 16
    affine = ggml_type in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q2_K, GGMLType.Q3_K,
                           GGMLType.Q4_K, GGMLType.Q5_K)
    s_val = np.float32(0.02 / 8)

    # Synthesis happens ON DEVICE: codes come straight from the on-device
    # PRNG (jax.random.bits) — nothing but PRNG keys crosses the host->TPU
    # tunnel.  Shipping the full ~3.4 GB of synthesized planes through the
    # tunnel instead is what blew round 2's bench window (85 s -> 722 s when
    # the relay was slow), and device-side jnp.tile/broadcast+reshape of a
    # byte pool compiles in O(minutes) at this size.  All plane builders for
    # one weight group collapse into a single jitted program per DISTINCT
    # SHAPE SET (one for the 28 identical layers, one for the head) so
    # remote-compile count and dispatch round-trips stay O(1), not O(params).
    sdt = jnp.bfloat16  # group scales/offsets in bf16: -10% HBM traffic/token

    # compact K-quant planes (int8 sub-scale/min codes + bf16 d/dmin per
    # superblock) exactly when the repack path would produce them
    from ..quant.planar import _compact_applicable

    SB = 8

    def _compact(k):
        return _compact_applicable(ggml_type, k, force_q8=not use_q4)

    def _plane_graph(key, n, k):
        """Traced plane builders for one weight (runs inside jit)."""
        wide_pad = int(os.environ.get("GGML_TPU_SYNTH_PAD", "2048"))
        pad_to = wide_pad if n > 8192 else 128
        npad = -(-n // pad_to) * pad_to
        if use_q4:
            codes = jax.random.bits(key, (k // 2, npad), jnp.uint8)
            if _compact(k):
                # factored planes with the SAME effective values the dense
                # planes would carry: d*sc == s_val, -dmin*m == -8*s_val
                return {
                    "codes": codes,
                    "scales": jnp.full((2, (k // 2) // G, npad), 32, jnp.int8),
                    "offsets": jnp.full((k // G, npad), 32, jnp.int8),
                    "supers": (
                        jnp.full((2, (k // 2) // (G * SB), npad), s_val / 32, sdt),
                        jnp.full((2, (k // 2) // (G * SB), npad), 8.0 * s_val / 32, sdt),
                    ),
                }
            scales = jnp.full((2, (k // 2) // G, npad), s_val, sdt)
        else:
            codes = jax.lax.bitcast_convert_type(
                jax.random.bits(key, (k, npad), jnp.uint8), jnp.int8)
            scales = jnp.full((k // G, npad), s_val, sdt)
        offsets = jnp.full((k // G, npad), -8.0 * s_val, sdt) if affine else None
        return {"codes": codes, "scales": scales, "offsets": offsets}

    def _wrap(planes, n, k):
        return PlanarWeight(
            kind="q4" if use_q4 else "q8", codes=planes["codes"],
            scales=planes["scales"], offsets=planes.get("offsets"),
            group=G, n=n, k=k, orig_type=ggml_type,
            supers=planes.get("supers"), sb=SB,
        )

    @functools.lru_cache(maxsize=None)
    def _group_prog(shapes: tuple):
        """One compiled program building the planes for a tuple of (n, k)."""

        @jax.jit
        def build(key):
            keys = jax.random.split(key, len(shapes))
            return [_plane_graph(keys[i], n, k) for i, (n, k) in enumerate(shapes)]

        return build

    _qkey = [jax.random.PRNGKey(seed + 7)]

    def qweights(*shapes):
        _qkey[0], sub = jax.random.split(_qkey[0])
        planes = _group_prog(tuple(shapes))(sub)
        return [_wrap(p, n, k) for p, (n, k) in zip(planes, shapes)]

    def qweight(n, k):
        return qweights((n, k))[0]

    _key = [jax.random.PRNGKey(seed)]

    def dense(*shape, s=0.02):
        _key[0], sub = jax.random.split(_key[0])
        return (jax.random.normal(sub, shape, jnp.float32) * s).astype(dtype)

    E = cfg.n_embd
    # DEFAULT ON since round 3 (measured on v5e 2026-08-19: 6.45 -> 6.33
    # ms/tok): parallel residual lets qkv AND ffn_up read the same normed h,
    # so they fuse into one widest (7E x E) kernel per layer
    fuse_up = fuse_qkv and os.environ.get("GGML_TPU_FUSE_QKVUP", "1") == "1"

    # every small dense tensor (embedding, norms, biases) in ONE program:
    # a compile + dispatch per tensor costs ~0.1-1 s each over the relay
    @jax.jit
    def small_tensors(key):
        embd = (jax.random.normal(key, (cfg.n_vocab, E), jnp.float32) * 0.02).astype(dtype)
        ones_e = jnp.ones((E,), dtype)
        zeros_e = jnp.zeros((E,), dtype)
        zeros_4e = jnp.zeros((4 * E,), dtype)
        zeros_v = jnp.zeros((cfg.n_vocab,), dtype)
        return embd, ones_e, zeros_e, zeros_4e, zeros_v

    embd, ones_e, zeros_e, zeros_4e, zeros_v = small_tensors(jax.random.PRNGKey(seed))
    p: dict[str, Any] = {
        "token_embd.weight": embd,
        "output_norm.weight": ones_e,
        "output_norm.bias": zeros_e,
        "output.weight": qweight(cfg.n_vocab, E),
        "output.bias": zeros_v,
    }
    if fuse_up:  # parallel residual: qkv AND ffn_up read the same h ->
        # one widest kernel per layer (N = 7E), one fewer ramp
        layer_shapes = [(7 * E, E), (E, E), (E, 4 * E)]
        layer_names = ["attn_qkvup.weight", "attn_output.weight", "ffn_down.weight"]
    elif fuse_qkv:  # fused q|k|v: fewer, wider kernels (single-chip decode)
        layer_shapes = [(3 * E, E), (E, E), (4 * E, E), (E, 4 * E)]
        layer_names = ["attn_qkv.weight", "attn_output.weight",
                       "ffn_up.weight", "ffn_down.weight"]
    else:  # separate projections (column-sharded tensor parallelism)
        layer_shapes = [(E, E), (E, E), (E, E), (E, E), (4 * E, E), (E, 4 * E)]
        layer_names = ["attn_q.weight", "attn_k.weight", "attn_v.weight",
                       "attn_output.weight", "ffn_up.weight", "ffn_down.weight"]
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        for name, pw in zip(layer_names, qweights(*layer_shapes)):
            p[pre + name] = pw
        p[pre + "attn_norm.weight"] = ones_e
        p[pre + "attn_norm.bias"] = zeros_e
        p[pre + "ffn_up.bias"] = zeros_4e
        p[pre + "ffn_down.bias"] = zeros_e
    return p
