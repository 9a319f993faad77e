"""Qwen2-VL family: Qwen2 text decoder with multi-section mRoPE plus a ViT
vision tower with 2D rotary embedding and a spatial patch merger.

This is the model family that exercises the reference's mRoPE / vision rope
modes end to end (reference: GGML_ROPE_TYPE_MROPE / GGML_ROPE_TYPE_VISION,
include/ggml.h:1443-1463, theta cache ggml_mrope_cache_init in
src/ggml-cpu/ggml-cpu.c; llama.cpp serves the text side as arch 'qwen2vl'
with the vision tower in a separate clip/mmproj graph).

TPU design notes:
- The text decoder reuses the llama-family machinery (RMSNorm, GQA, SwiGLU,
  planar-quantized linears); only the rope differs: each head-dim PAIR picks
  its position stream (temporal/height/width) by which mrope section it
  falls in — implemented as one vectorized gather over a static section map,
  no per-sector loop (the ggml CPU kernel walks sectors per element).
- Decode positions: multimodal rope positions are NOT the cache slot index
  (vision blocks advance all three streams by max(t,h,w), not by token
  count).  The decode loop therefore carries the rope position delta
  (HF mrope_position_deltas) separately from the cache write index, and the
  causal mask is computed from SLOT indices, which stays correct for any
  position layout.
- The vision tower is a plain full-attention ViT: patches arrive already
  flattened (t*h*w, C*tps*ps*ps) so the conv3d patch embed is one matmul on
  the MXU; the 2D rotary cos/sin table is computed host-side per grid (it
  is data-dependent host metadata, like the page tables in paged_kv.py) and
  passed in as an array; multi-image batches attend block-diagonally via a
  static mask built from the grids.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import layer_norm as _layer_norm, linear as _linear
from .common import cache_write as _cache_write
from .llama import LlamaConfig, _rms_norm, init_cache


@dataclass(frozen=True)
class Qwen2VLTextConfig(LlamaConfig):
    # pair-unit section widths for (temporal, height, width); sum must equal
    # head_dim // 2 (reference: GGUF key qwen2vl.rope.dimension_sections)
    mrope_sections: tuple = (16, 24, 24)


@dataclass(frozen=True)
class Qwen2VLVisionConfig:
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    hidden_size: int = 3584  # output (text-embedding) width after the merger
    patch_size: int = 14
    temporal_patch_size: int = 2
    in_channels: int = 3
    spatial_merge_size: int = 2
    mlp_ratio: float = 4.0
    eps: float = 1e-6
    rope_theta: float = 10000.0

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads


# --------------------------------------------------------------------------
# text side: multi-section mRoPE


def rope_mrope_half(x, pos3, base: float, sections: tuple):
    """rotate-half RoPE where head-dim pair p takes its position from stream
    sections[p]: pairs [0,s0) from temporal, [s0,s0+s1) from height,
    [s0+s1,half) from width.  pos3: (3, b, t) int32.  Equal streams reduce
    this to plain NeoX rope (the text-only case).

    Matches ggml's mrope theta cache (sector -> stream select, then the
    standard rotate-half application) and HF's apply_multimodal_rotary_pos_emb
    (sections doubled over both halves == pair-unit sections, since
    rotate-half duplicates cos/sin across halves)."""
    d = x.shape[-1]
    half = d // 2
    assert sum(sections) == half, (sections, half)
    inv_freq = (base ** (-np.arange(half) / half)).astype(np.float32)
    sect = np.concatenate(
        [np.full(s, i % 3, np.int32) for i, s in enumerate(sections)]
    )
    pos_sel = pos3[sect]  # (half, b, t): per-pair stream gather
    theta = pos_sel.astype(jnp.float32).transpose(1, 2, 0) * inv_freq  # (b,t,half)
    cos = jnp.cos(theta)[:, :, None, :]
    sin = jnp.sin(theta)[:, :, None, :]
    x0, x1 = x[..., :half], x[..., half:]
    return jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)


def forward_text(params: dict, cfg: Qwen2VLTextConfig, tokens, pos3, cache,
                 cache_len, *, embeds=None):
    """Qwen2-VL text decoder step.  pos3: (3, b, t) rope position streams
    (equal for pure text).  cache_len: scalar or (b,) slot write base — the
    causal mask uses SLOT indices (cache_len + local offset), decoupled from
    the rope positions.  embeds overrides the token embedding lookup (the
    merged text+vision input sequence)."""
    b, t = tokens.shape
    max_seq = cache[0][0].shape[-2]
    if embeds is None:
        embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
        x = embd[tokens]
    else:
        x = embeds
    dt = x.dtype
    rep = cfg.n_head // cfg.n_head_kv
    scale = 1.0 / np.sqrt(cfg.head_dim)
    base = jnp.asarray(cache_len)
    slot_pos = (base[..., None] if base.ndim else base) + jnp.arange(t)[None, :]
    slot_pos = jnp.broadcast_to(slot_pos, (b, t))

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)

        q = _linear(h, params[pre + "attn_q.weight"], params.get(pre + "attn_q.bias")).reshape(b, t, cfg.n_head, cfg.head_dim)
        k = _linear(h, params[pre + "attn_k.weight"], params.get(pre + "attn_k.bias")).reshape(b, t, cfg.n_head_kv, cfg.head_dim)
        v = _linear(h, params[pre + "attn_v.weight"], params.get(pre + "attn_v.bias")).reshape(b, t, cfg.n_head_kv, cfg.head_dim)

        q = rope_mrope_half(q, pos3, cfg.rope_base, cfg.mrope_sections).transpose(0, 2, 1, 3)
        k = rope_mrope_half(k, pos3, cfg.rope_base, cfg.mrope_sections).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)

        qg = q.reshape(b, cfg.n_head_kv, rep, t, cfg.head_dim)
        att = jnp.einsum("bgrqd,bgkd->bgrqk", qg.astype(jnp.float32), kc.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
        kv_pos = jnp.arange(max_seq)[None, None, None, None, :]
        q_pos = slot_pos[:, None, None, :, None]
        att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", att, vc)
        out = out.reshape(b, cfg.n_head, t, cfg.head_dim).transpose(0, 2, 1, 3)
        attn_out = out.reshape(b, t, cfg.n_embd).astype(dt)
        x = x + _linear(attn_out, params[pre + "attn_output.weight"])

        h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
        gate = _linear(h, params[pre + "ffn_gate.weight"])
        up = _linear(h, params[pre + "ffn_up.weight"])
        x = x + _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"])

    x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
    w_out = params.get("output.weight", params["token_embd.weight"])
    if "output.weight" not in params and "token_embd.weight@dense" in params:
        w_out = params["token_embd.weight@dense"]
    logits = _linear(x, w_out)
    return logits, tuple(new_cache)


# --------------------------------------------------------------------------
# 3D rope index computation (host side)


def get_rope_index(input_ids: np.ndarray, grid_thw: np.ndarray | None,
                   spatial_merge_size: int, image_token_id: int,
                   vision_start_token_id: int):
    """(3, b, t) rope positions + per-row position delta.

    Text runs advance all three streams together; each vision block of
    (t, h/m, w/m) tokens gets separate temporal/row/column indices offset
    from the preceding text, and the following text resumes at
    max(vision positions) + 1.  delta = max_pos + 1 - seq_len feeds decode.
    (HF Qwen2VLModel.get_rope_index semantics; llama.cpp mirrors this in its
    qwen2vl mrope position build.)"""
    input_ids = np.asarray(input_ids)
    b, t = input_ids.shape
    pos = np.zeros((3, b, t), np.int32)
    deltas = np.zeros((b,), np.int32)
    if grid_thw is None or len(np.atleast_2d(grid_thw)) == 0:
        pos[:] = np.arange(t, dtype=np.int32)[None, None, :]
        return pos, deltas
    grid_thw = np.atleast_2d(np.asarray(grid_thw))
    m = spatial_merge_size
    img_idx = 0
    for i in range(b):
        row = input_ids[i].tolist()
        chunks = []
        st = 0
        while img_idx < len(grid_thw) and image_token_id in row[st:]:
            ed = row.index(image_token_id, st)
            gt, gh, gw = (int(grid_thw[img_idx][0]), int(grid_thw[img_idx][1]) // m,
                          int(grid_thw[img_idx][2]) // m)
            img_idx += 1
            st_idx = chunks[-1].max() + 1 if chunks else 0
            text_len = ed - st
            chunks.append(np.broadcast_to(np.arange(text_len), (3, text_len)) + st_idx)
            ti = np.repeat(np.arange(gt), gh * gw)
            hi = np.tile(np.repeat(np.arange(gh), gw), gt)
            wi = np.tile(np.arange(gw), gt * gh)
            chunks.append(np.stack([ti, hi, wi]) + text_len + st_idx)
            st = ed + gt * gh * gw
        if st < t:
            st_idx = chunks[-1].max() + 1 if chunks else 0
            n = t - st
            chunks.append(np.broadcast_to(np.arange(n), (3, n)) + st_idx)
        p = np.concatenate(chunks, axis=1)
        assert p.shape[1] == t, (p.shape, t)
        pos[:, i, :] = p
        deltas[i] = p.max() + 1 - t
    return pos, deltas


# --------------------------------------------------------------------------
# vision tower


def vision_rot_pos_ids(grid_thw: np.ndarray, merge: int) -> np.ndarray:
    """(seq, 2) (row, col) ids per patch, in the merge-block traversal order
    the patch sequence uses (2x2 blocks contiguous)."""
    out = []
    for t, h, w in np.atleast_2d(grid_thw):
        t, h, w = int(t), int(h), int(w)
        hp = np.arange(h)[:, None] * np.ones((1, w), np.int64)
        wp = np.ones((h, 1), np.int64) * np.arange(w)[None, :]
        reorder = lambda a: a.reshape(h // merge, merge, w // merge, merge).transpose(0, 2, 1, 3).reshape(-1)
        pid = np.stack([reorder(hp), reorder(wp)], axis=-1)
        out.append(np.tile(pid, (t, 1)))
    return np.concatenate(out, axis=0)


def vision_cos_sin(grid_thw: np.ndarray, vcfg: Qwen2VLVisionConfig):
    """Host-built (seq, head_dim) cos/sin for the 2D vision rotary: the first
    half of the PAIRS encodes the row index, the second half the column
    (reference vision-mode theta cache: sections split h/w streams)."""
    dim = vcfg.head_dim // 2
    inv_freq = 1.0 / (vcfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    pos = vision_rot_pos_ids(grid_thw, vcfg.spatial_merge_size)  # (seq, 2)
    freqs = pos[:, :, None] * inv_freq[None, None, :]  # (seq, 2, dim/2)
    freqs = freqs.reshape(pos.shape[0], -1)  # (seq, head_dim/2): h then w
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _rotate_half_table(x, cos, sin):
    """Apply rotate-half rope from a precomputed (seq, d) cos/sin table.
    x: (seq, heads, d)."""
    half = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    c = cos[:, None, :]
    s = sin[:, None, :]
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * c + rot * s).astype(x.dtype)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def vision_forward(params: dict, vcfg: Qwen2VLVisionConfig, pixels, cos, sin,
                   block_mask=None):
    """ViT encode: pixels (seq, C*tps*ps*ps) flattened patches -> merged
    embeddings (seq/merge^2, hidden_size).  cos/sin from vision_cos_sin;
    block_mask (seq, seq) additive mask for multi-image batches (None = one
    image, full attention)."""
    x = pixels @ params["v.patch_embd.weight"].T  # conv3d == matmul on flat patches
    seq = x.shape[0]
    nh, hd = vcfg.num_heads, vcfg.head_dim
    scale = 1.0 / np.sqrt(hd)
    for i in range(vcfg.depth):
        pre = f"v.blk.{i}."
        h = _layer_norm(x, params[pre + "ln1.weight"], params[pre + "ln1.bias"], vcfg.eps)
        qkv = h @ params[pre + "attn_qkv.weight"].T + params[pre + "attn_qkv.bias"]
        q, k, v = (qkv.reshape(seq, 3, nh, hd)[:, j] for j in range(3))
        q = _rotate_half_table(q, cos, sin)
        k = _rotate_half_table(k, cos, sin)
        att = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32), k.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
        if block_mask is not None:
            att = att + block_mask[None, :, :]
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("hqk,khd->qhd", att, v.astype(jnp.float32)).reshape(seq, vcfg.embed_dim)
        out = out.astype(x.dtype)
        x = x + (out @ params[pre + "attn_out.weight"].T + params[pre + "attn_out.bias"])
        h = _layer_norm(x, params[pre + "ln2.weight"], params[pre + "ln2.bias"], vcfg.eps)
        h = _quick_gelu(h @ params[pre + "ffn_up.weight"].T + params[pre + "ffn_up.bias"])
        x = x + (h @ params[pre + "ffn_down.weight"].T + params[pre + "ffn_down.bias"])

    # spatial merger: LN, then fold merge^2 neighbouring patches into one row
    x = _layer_norm(x, params["v.merger.ln_q.weight"], params["v.merger.ln_q.bias"], vcfg.eps)
    x = x.reshape(-1, vcfg.embed_dim * vcfg.spatial_merge_size ** 2)
    x = jax.nn.gelu(x @ params["v.merger.mlp.0.weight"].T + params["v.merger.mlp.0.bias"],
                    approximate=False)
    return x @ params["v.merger.mlp.2.weight"].T + params["v.merger.mlp.2.bias"]


def vision_block_mask(grid_thw: np.ndarray) -> np.ndarray | None:
    """Additive block-diagonal mask: patches attend within their own image
    (cu_seqlens splitting in the reference HF implementation)."""
    grid = np.atleast_2d(grid_thw)
    if len(grid) <= 1:
        return None
    lens = [int(t) * int(h) * int(w) for t, h, w in grid]
    seq = sum(lens)
    mask = np.full((seq, seq), -np.inf, np.float32)
    o = 0
    for ln in lens:
        mask[o:o + ln, o:o + ln] = 0.0
        o += ln
    return mask


# --------------------------------------------------------------------------
# GGUF metadata


def config_from_gguf(g: GGUFFile) -> tuple[Qwen2VLTextConfig, Qwen2VLVisionConfig | None]:
    md = g.metadata
    a = "qwen2vl"
    sections = tuple(int(s) for s in md[f"{a}.rope.dimension_sections"] if int(s) > 0)
    text = Qwen2VLTextConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 32000)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=int(md[f"{a}.attention.head_count"]),
        n_head_kv=int(md.get(f"{a}.attention.head_count_kv", md[f"{a}.attention.head_count"])),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        rope_base=float(md.get(f"{a}.rope.freq_base", 1000000.0)),
        rms_eps=float(md.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)),
        mrope_sections=sections,
    )
    vis = None
    if "clip.vision.block_count" in md:
        vis = Qwen2VLVisionConfig(
            embed_dim=int(md["clip.vision.embedding_length"]),
            depth=int(md["clip.vision.block_count"]),
            num_heads=int(md["clip.vision.attention.head_count"]),
            hidden_size=int(md["clip.vision.projection_dim"]),
            patch_size=int(md["clip.vision.patch_size"]),
            temporal_patch_size=int(md.get("clip.vision.temporal_patch_size", 2)),
            in_channels=int(md.get("clip.vision.in_channels", 3)),
            spatial_merge_size=int(md.get("clip.vision.spatial_merge_size", 2)),
            mlp_ratio=float(md.get("clip.vision.mlp_ratio", 4.0)),
        )
    return text, vis


class Qwen2VL:
    """Multimodal inference wrapper: vision encode + merged-sequence prefill
    + delta-corrected decode."""

    def __init__(self, params: dict, cfg: Qwen2VLTextConfig,
                 vcfg: Qwen2VLVisionConfig | None = None,
                 image_token_id: int = 151655, vision_start_token_id: int = 151652,
                 max_seq: int = 2048, batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.vcfg = vcfg
        self.image_token_id = image_token_id
        self.vision_start_token_id = vision_start_token_id
        self.max_seq = max_seq
        self.batch = batch

        self._step = jax.jit(
            lambda params, tokens, pos3, cache, cache_len, embeds: forward_text(
                params, cfg, tokens, pos3, cache, cache_len, embeds=embeds
            ),
            donate_argnums=(3,),
        )

        def decode_loop(params, cache, first_token, n_past, delta, steps):
            def body(carry, _):
                cache, tok, n_past = carry
                b = tok.shape[0]
                pos = (n_past + delta)[:, None]  # (b, 1) rope position
                pos3 = jnp.broadcast_to(pos[None], (3, b, 1))
                logits, cache = forward_text(params, cfg, tok, pos3, cache, n_past)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
                return (cache, nxt, n_past + 1), nxt[:, 0]

            (cache, tok, n_past), toks = jax.lax.scan(body, (cache, first_token, n_past), steps)
            return cache, toks

        self._decode_loop = jax.jit(decode_loop, donate_argnums=(1,))

    @classmethod
    def from_gguf(cls, path, dtype=jnp.bfloat16, keep_quantized: bool = True, **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        cfg, vcfg = config_from_gguf(g)
        # vision tensors stay dense f32/bf16 (ViT weights are small next to
        # the decoder; the reference keeps its mmproj in f16 too)
        params = load_params(g, dtype, keep_quantized=keep_quantized)
        md = g.metadata
        return cls(params, cfg, vcfg,
                   image_token_id=int(md.get("qwen2vl.image_token_id", 151655)),
                   vision_start_token_id=int(md.get("qwen2vl.vision_start_token_id", 151652)),
                   **kw)

    def new_cache(self, dtype=jnp.bfloat16):
        return init_cache(self.cfg, self.batch, self.max_seq, dtype)

    def encode_images(self, pixels: np.ndarray, grid_thw: np.ndarray):
        """pixels: (n_patches, C*tps*ps*ps) flattened patches (the HF
        processor layout); returns (n_patches/merge^2, n_embd)."""
        cos, sin = vision_cos_sin(grid_thw, self.vcfg)
        mask = vision_block_mask(grid_thw)
        return vision_forward(self.params, self.vcfg, jnp.asarray(pixels),
                              jnp.asarray(cos), jnp.asarray(sin),
                              None if mask is None else jnp.asarray(mask))

    def prefill(self, cache, tokens: np.ndarray, pixels: np.ndarray | None = None,
                grid_thw: np.ndarray | None = None):
        """Merged text+vision prefill.  Returns (last logits, cache, n_past,
        delta) — feed delta back into decode_greedy."""
        tokens = np.asarray(tokens)
        b, t = tokens.shape
        embd = self.params.get("token_embd.weight@dense", self.params["token_embd.weight"])
        embeds = jnp.asarray(embd)[jnp.asarray(tokens)]
        if pixels is not None:
            img = self.encode_images(pixels, grid_thw).astype(embeds.dtype)
            flat = embeds.reshape(b * t, -1)
            idx = np.nonzero(tokens.reshape(-1) == self.image_token_id)[0]
            assert len(idx) == img.shape[0], (len(idx), img.shape)
            flat = flat.at[jnp.asarray(idx)].set(img)
            embeds = flat.reshape(b, t, -1)
        pos3, deltas = get_rope_index(
            tokens, grid_thw, self.vcfg.spatial_merge_size if self.vcfg else 2,
            self.image_token_id, self.vision_start_token_id)
        logits, cache = self._step(self.params, jnp.asarray(tokens), jnp.asarray(pos3),
                                   cache, jnp.zeros((b,), jnp.int32), embeds)
        return logits[:, -1, :], cache, t, deltas

    def decode_greedy(self, cache, first_token, n_past: int, n_tokens: int,
                      deltas: np.ndarray | None = None):
        b = np.asarray(first_token).shape[0]
        deltas = np.zeros((b,), np.int32) if deltas is None else deltas
        cache, toks = self._decode_loop(
            self.params, cache, jnp.asarray(first_token),
            jnp.full((b,), n_past, jnp.int32), jnp.asarray(deltas, jnp.int32),
            jnp.zeros((n_tokens,), jnp.int32),
        )
        return cache, np.asarray(toks)

    def generate(self, prompt_tokens: np.ndarray, n_tokens: int,
                 pixels: np.ndarray | None = None, grid_thw: np.ndarray | None = None):
        cache = self.new_cache(jnp.float32)
        logits, cache, n_past, deltas = self.prefill(cache, prompt_tokens, pixels, grid_thw)
        first = np.argmax(np.asarray(logits), axis=-1).astype(np.int32)[:, None]
        cache, toks = self.decode_greedy(cache, first, n_past, n_tokens - 1, deltas)
        return np.concatenate([first, np.asarray(toks).T], axis=1)[0]
