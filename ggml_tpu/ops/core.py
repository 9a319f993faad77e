"""Core op semantics on JAX arrays — the executable specification.

This is the analog of ggml's op surface (reference: op enum include/ggml.h:429-524,
builders src/ggml.c:1813-5200, CPU semantics src/ggml-cpu/ggml-cpu.c). Every op
here is a pure function on jax arrays, jit-friendly (static shapes, no Python
control flow on traced values), and differentiable through jax.grad.

Shape convention: numpy C-order. A ggml tensor with ne = (ne0, ne1, ne2, ne3)
maps to array shape (ne3, ne2, ne1, ne0) — ggml's ne[0] (contiguous) axis is
our LAST axis. "Rows" in ggml = our last axis.

These functions are the correctness oracle that Pallas kernels and sharded
execution are differentially tested against (the reference's
"CPU backend = specification" idiom, tests/test-backend-ops.cpp).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# broadcast helper (reference: ggml_can_repeat, src/ggml.c — dims must divide)
# ---------------------------------------------------------------------------


def _repeat_to(x: jnp.ndarray, shape: tuple[int, ...]) -> jnp.ndarray:
    """ggml-style repeat broadcast: each target dim must be a multiple of x's."""
    x = jnp.reshape(x, (1,) * (len(shape) - x.ndim) + x.shape)
    reps = tuple(int(t // s) for t, s in zip(shape, x.shape))
    if all(r == 1 for r in reps):
        return x
    return jnp.tile(x, reps)


def _binary(f, a, b):
    if a.shape != b.shape:
        b = _repeat_to(b, a.shape)
    return f(a, b)


# -- elementwise binary (reference: include/ggml.h ggml_add..ggml_div) -------


def add(a, b):
    return _binary(jnp.add, a, b)


def sub(a, b):
    return _binary(jnp.subtract, a, b)


def mul(a, b):
    return _binary(jnp.multiply, a, b)


def div(a, b):
    return _binary(jnp.divide, a, b)


def add1(a, b):
    return a + jnp.reshape(b, ())


def diag(a):
    """reference: ggml_diag (include/ggml.h:1340, CPU impl
    src/ggml-cpu/ggml-cpu.c:8700): rows (..., 1, n) become diagonal
    matrices (..., n, n), zeros off-diagonal."""
    n = a.shape[-1]
    return a[..., 0, :][..., None, :] * jnp.eye(n, dtype=a.dtype)


def scale(a, s: float):
    return a * jnp.asarray(s, dtype=a.dtype)


def clamp(a, lo: float, hi: float):
    return jnp.clip(a, lo, hi)


# -- unary (reference: ggml_unary_op enum include/ggml.h:526-543) ------------


def neg(x):
    return -x


def abs_(x):
    return jnp.abs(x)


def sgn(x):
    return jnp.sign(x)


def step(x):
    return (x > 0).astype(x.dtype)


def tanh(x):
    return jnp.tanh(x)


def elu(x):
    return jnp.where(x > 0, x, jnp.expm1(x))


def relu(x):
    return jnp.maximum(x, 0)


def sigmoid(x):
    return jax.nn.sigmoid(x)


_SQRT_2_OVER_PI = 0.79788456080286535587989211986876
_GELU_COEF_A = 0.044715
_GELU_QUICK_COEF = -1.702


def gelu(x):
    """tanh-approx GELU (reference: ggml_gelu_f32, src/ggml-cpu/ggml-cpu.c)."""
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * x * (1.0 + _GELU_COEF_A * x * x)))


def gelu_quick(x):
    return x * (1.0 / (1.0 + jnp.exp(_GELU_QUICK_COEF * x)))


def silu(x):
    return x * jax.nn.sigmoid(x)


def hardswish(x):
    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def hardsigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def leaky_relu(x, negative_slope: float = 0.1):
    return jnp.where(x > 0, x, x * negative_slope)


def sqr(x):
    return x * x


def sqrt(x):
    return jnp.sqrt(x)


def log(x):
    return jnp.log(x)


def exp(x):
    return jnp.exp(x)


def sin(x):
    return jnp.sin(x)


def cos(x):
    return jnp.cos(x)


def silu_back(x, grad):
    """reference: ggml_silu_back (dx of silu)."""
    s = jax.nn.sigmoid(x)
    return grad * s * (1.0 + x * (1.0 - s))


# -- reductions ---------------------------------------------------------------


def sum_(x):
    """Total sum -> shape (1,) (reference: ggml_sum)."""
    return jnp.sum(x).reshape(1)


def sum_rows(x):
    """Sum over the contiguous axis, keepdim (reference: ggml_sum_rows)."""
    return jnp.sum(x, axis=-1, keepdims=True)


def mean(x):
    return jnp.mean(x, axis=-1, keepdims=True)


def argmax(x):
    """Argmax over rows -> int32 (reference: ggml_argmax)."""
    return jnp.argmax(x, axis=-1).astype(jnp.int32)


def count_equal(a, b):
    """Number of equal elements as int64 scalar-in-(1,) (reference: ggml_count_equal)."""
    return jnp.sum(a == b).astype(jnp.int64).reshape(1)


# -- shape ops ----------------------------------------------------------------


def repeat(a, target_shape):
    return _repeat_to(a, tuple(target_shape))


def repeat_back(a, target_shape):
    """Fold repeats back by summation (reference: ggml_repeat_back)."""
    out = a
    tgt = (1,) * (a.ndim - len(target_shape)) + tuple(target_shape)
    for ax, (s_out, s_tgt) in enumerate(zip(a.shape, tgt)):
        if s_out != s_tgt:
            out = out.reshape(out.shape[:ax] + (s_out // s_tgt, s_tgt) + out.shape[ax + 1 :]).sum(axis=ax)
    return out.reshape(target_shape)


def concat(a, b, axis: int):
    return jnp.concatenate([a, b], axis=axis)


def pad(x, pads):
    """pads: per-axis (extra trailing size), ggml_pad semantics (zeros at end)."""
    cfg = tuple((0, int(p)) for p in pads)
    return jnp.pad(x, cfg)


def pad_reflect_1d(x, p0: int, p1: int):
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(p0, p1)], mode="reflect")


def arange(start: float, stop: float, step: float):
    n = max(int(math.ceil((stop - start) / step)), 0)
    return start + step * jnp.arange(n, dtype=jnp.float32)


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """reference: ggml_timestep_embedding (src/ggml.c, stable-diffusion.cpp style).
    timesteps: (N,) -> (N, dim) [cos | sin] with zero pad if dim is odd."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


# -- indexed ------------------------------------------------------------------


def get_rows(a, ids):
    """Gather rows (reference: ggml_get_rows). a: (..., n, k); ids int32 (..., m)
    -> (..., m, k). In ggml, a's batch dims broadcast against ids' extra dims."""
    if ids.ndim == 1:
        return jnp.take(a, ids, axis=-2)
    # batched: ids (b2, b1, m), a (b2', b1', n, k) with broadcastable batch
    def gather2(mat, idx):
        return jnp.take(mat, idx, axis=0)

    bshape = ids.shape[:-1]
    a_b = jnp.broadcast_to(a, bshape + a.shape[-2:])
    flat_a = a_b.reshape((-1,) + a.shape[-2:])
    flat_ids = ids.reshape(-1, ids.shape[-1])
    out = jax.vmap(gather2)(flat_a, flat_ids)
    return out.reshape(bshape + (ids.shape[-1], a.shape[-1]))


def get_rows_back(grad, ids, n_rows: int):
    """Scatter-add of row grads (reference: ggml_get_rows_back)."""
    out = jnp.zeros((n_rows, grad.shape[-1]), dtype=grad.dtype)
    return out.at[ids].add(grad)


def set_(a, b, offset_elems: int, inplace_shape=None):
    """reference: ggml_set — overwrite a view of a (flat offset) with b."""
    flat = a.reshape(-1)
    flat = jax.lax.dynamic_update_slice(flat, b.reshape(-1), (offset_elems,))
    return flat.reshape(a.shape)


def acc(a, b, offset_elems: int):
    flat = a.reshape(-1)
    seg = jax.lax.dynamic_slice(flat, (offset_elems,), (b.size,))
    flat = jax.lax.dynamic_update_slice(flat, seg + b.reshape(-1), (offset_elems,))
    return flat.reshape(a.shape)


def argsort(x, descending: bool = False):
    """Row-wise argsort -> int32 (reference: ggml_argsort)."""
    order = jnp.argsort(-x if descending else x, axis=-1, stable=True)
    return order.astype(jnp.int32)


def top_k(x, k: int):
    """Indices of top-k per row, sorted desc (reference: ggml_top_k = argsort desc + view)."""
    return argsort(x, descending=True)[..., :k]


def diag_mask_inf(x, n_past: int):
    """Mask upper-diagonal entries (col > n_past + row) with -inf (reference: ggml_diag_mask_inf)."""
    n_r, n_c = x.shape[-2], x.shape[-1]
    rows = jnp.arange(n_r)[:, None]
    cols = jnp.arange(n_c)[None, :]
    mask = cols > (n_past + rows)
    return jnp.where(mask, jnp.asarray(-jnp.inf, dtype=x.dtype), x)


def diag_mask_zero(x, n_past: int):
    """Like diag_mask_inf but writes 0 (reference: ggml_diag_mask_zero)."""
    n_r, n_c = x.shape[-2], x.shape[-1]
    mask = jnp.arange(n_c)[None, :] > (n_past + jnp.arange(n_r)[:, None])
    return jnp.where(mask, jnp.zeros((), x.dtype), x)


def soft_max(x):
    """Plain row softmax (reference: ggml_soft_max; the fused
    scale/mask/ALiBi form is soft_max_ext)."""
    return jax.nn.softmax(x.astype(jnp.float32), axis=-1).astype(x.dtype)


# -- norms (reference: ggml_norm/ggml_rms_norm/ggml_group_norm) ---------------


def norm(x, eps: float = 1e-5):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps)


def rms_norm(x, eps: float = 1e-6):
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(ms + eps)


def group_norm(x, n_groups: int, eps: float = 1e-6):
    """x: (N, C, *spatial) in our convention = ggml ne (W, H, C, N)
    normalized per group of channels (reference: ggml_group_norm over ne2 groups)."""
    n, c = x.shape[0], x.shape[1]
    spatial = x.shape[2:]
    g = x.reshape(n, n_groups, c // n_groups, *spatial)
    axes = tuple(range(2, g.ndim))
    m = jnp.mean(g, axis=axes, keepdims=True)
    v = jnp.mean((g - m) ** 2, axis=axes, keepdims=True)
    return ((g - m) / jnp.sqrt(v + eps)).reshape(x.shape)


def l2_norm(x, eps: float = 1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


# -- matmul -------------------------------------------------------------------


def _block_repeat_to(x, batch):
    """mul_mat-style batch broadcast: src batch index = dst index // r
    (reference: ggml_compute_forward_mul_mat uses i02 = i12/r2) — block repeat,
    unlike ggml_repeat's periodic tiling."""
    x = jnp.reshape(x, (1,) * (len(batch) + 2 - x.ndim) + x.shape)
    for ax, tgt in enumerate(batch):
        if x.shape[ax] != tgt:
            x = jnp.repeat(x, tgt // x.shape[ax], axis=ax)
    return x


def mul_mat(a, b):
    """reference: ggml_mul_mat. a = weights, ggml ne (k, n, ...) = our (..., n, k);
    b = activations (..., m, k). out = (..., m, n) — i.e. b @ a^T with ggml's
    block broadcast over batch dims (i02 = i12/r2)."""
    nd = max(a.ndim, b.ndim)
    ab = (1,) * (nd - a.ndim) + a.shape[:-2]
    bb = (1,) * (nd - b.ndim) + b.shape[:-2]
    out_batch = tuple(max(sa, sb) for sa, sb in zip(ab, bb))
    a_b = _block_repeat_to(a, out_batch)
    b_b = _block_repeat_to(b, out_batch)
    return jnp.einsum("...mk,...nk->...mn", b_b, a_b, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST).astype(b.dtype)


def mul_mat_id(as_, b, ids):
    """MoE indirect matmul (reference: ggml_mul_mat_id, include/ggml.h:1121-1125).
    as_: (n_expert, n, k) expert weights; b: (n_token, n_expert_used, k) activations
    (ggml ne: [k, n_expert_used, n_tokens]); ids: (n_token, n_expert_used) int32.
    out: (n_token, n_expert_used, n)."""
    w = as_[ids]  # (n_token, n_used, n, k)
    return jnp.einsum("tuk,tunk->tun", b, w, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST).astype(b.dtype)


def out_prod(a, b):
    """reference: ggml_out_prod. a: (..., n, k)?? ggml: a ne (n, k_rows...) —
    out[i,j] = sum_r a[r, i] * b[r, j] in our convention:
    a: (..., k, n), b: (..., k, m) -> out (..., m, n) = b^T @ a ... matching
    ggml's out = a * b^T in its (ne0=n from a, ne1=m from b) layout."""
    return jnp.einsum("...km,...kn->...mn", b, a, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST).astype(a.dtype)


# -- softmax ext (reference: ggml_soft_max_ext include/ggml.h:1380,
#    CPU: ggml_compute_forward_soft_max_f32) ----------------------------------


def alibi_slopes(n_head: int, max_bias: float) -> jnp.ndarray:
    n_head_log2 = 1 << int(math.floor(math.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n_head_log2)
    m1 = 2.0 ** (-(max_bias / 2.0) / n_head_log2)
    h = np.arange(n_head)
    slopes = np.where(h < n_head_log2, m0 ** (h + 1), m1 ** (2 * (h - n_head_log2) + 1))
    if max_bias <= 0.0:
        slopes = np.ones(n_head)
    return jnp.asarray(slopes, dtype=jnp.float32)


def soft_max_ext(x, mask=None, scale: float = 1.0, max_bias: float = 0.0):
    """x: (batch, n_head, n_q, n_kv). mask broadcast over rows: (..., n_q', n_kv)
    with n_q' >= n_q (rows beyond are the KQ pad). Computes
    softmax(x*scale + slope(head)*mask) row-wise in f32."""
    xf = x.astype(jnp.float32) * scale
    if mask is not None:
        m = mask.astype(jnp.float32)
        # broadcast mask rows like the reference: row i1 uses mask row (i1 % mask rows)
        m = m[..., : x.shape[-2], :]
        if max_bias > 0.0:
            n_head = x.shape[-3]
            slopes = alibi_slopes(n_head, max_bias).reshape((n_head, 1, 1))
            m = m * slopes
        xf = xf + m
    out = jax.nn.softmax(xf, axis=-1)
    return out.astype(x.dtype)


# -- RoPE (reference: ggml_rope_ext include/ggml.h:1407-1536,
#    CPU: ggml_compute_forward_rope_f32) --------------------------------------

ROPE_TYPE_NORMAL = 0
ROPE_TYPE_NEOX = 2
ROPE_TYPE_MROPE = 8
ROPE_TYPE_VISION = 24


def _yarn_corr_dim(n_dims, n_ctx_orig, n_rot, base):
    return n_dims * math.log(n_ctx_orig / (n_rot * 2 * math.pi)) / (2 * math.log(base))


def rope_yarn_corr_dims(n_dims, n_ctx_orig, freq_base, beta_fast, beta_slow):
    """reference: ggml_rope_yarn_corr_dims src/ggml.c:3699."""
    start = math.floor(_yarn_corr_dim(n_dims, n_ctx_orig, beta_fast, freq_base))
    end = math.ceil(_yarn_corr_dim(n_dims, n_ctx_orig, beta_slow, freq_base))
    return max(0.0, start), min(n_dims - 1.0, end)


def _rope_cos_sin(
    pos, n_dims, freq_base, freq_scale, ext_factor, attn_factor, corr_dims, freq_factors
):
    """Returns cos/sin of shape (n_pos, n_dims/2) following rope_yarn
    (reference: src/ggml-cpu/ggml-cpu.c rope_yarn/ggml_rope_cache_init)."""
    i0 = 2.0 * jnp.arange(n_dims // 2, dtype=jnp.float32)
    theta_scale = jnp.float_power(freq_base, -i0 / n_dims).astype(jnp.float32)
    theta_base = pos.astype(jnp.float32)[:, None] * theta_scale[None, :]
    ff = freq_factors if freq_factors is not None else 1.0
    theta_extrap = theta_base / ff
    theta_interp = freq_scale * theta_extrap
    mscale = attn_factor
    if ext_factor != 0.0:
        low, high = corr_dims
        ramp = 1.0 - jnp.clip((i0 / 2 - low) / max(0.001, high - low), 0.0, 1.0)
        ramp_mix = ramp * ext_factor
        theta = theta_interp * (1 - ramp_mix) + theta_extrap * ramp_mix
        mscale = mscale * (1.0 + 0.1 * math.log(1.0 / freq_scale))
    else:
        theta = theta_interp
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def _mrope_cos_sin(
    pos4, n_dims, head_dim, sections, is_vision, freq_base, freq_scale,
    ext_factor, attn_factor, corr_dims, freq_factors,
):
    """Multi-section (mRoPE) theta cache (reference: ggml_mrope_cache_init,
    src/ggml-cpu/ggml-cpu.c:9197-9253).  pos4: (4, n_pos) — one position
    stream per section kind (time/height/width/extra).  Each pair index ic
    picks its stream by `sector = ic % sum(sections)`; vision mode
    additionally restarts the theta progression at each section boundary
    (indep_sects).  Returns cos/sin of shape (n_pos, n_pairs) where
    n_pairs = head_dim // 2 (the cache covers the FULL head dim — vision
    rotates all of it)."""
    s0, s1, s2, s3 = sections
    sect_dims = s0 + s1 + s2 + s3
    n_pairs = head_dim // 2
    ic = np.arange(n_pairs)
    sector = ic % sect_dims
    sect_id = np.select(
        [sector < s0, sector < s0 + s1, sector < s0 + s1 + s2], [0, 1, 2], default=3
    )
    if is_vision:
        # theta resets at each section boundary: exponent restarts per section
        sect_start = np.array([0, s0, s0 + s1, s0 + s1 + s2])[sect_id]
        expo = sector - sect_start
    else:
        expo = ic
    # theta_scale^expo with theta_scale = freq_base^(-2/n_dims) — note the
    # exponent base is n_dims even where ic ranges past it (vision)
    theta_scale_pow = np.power(np.float32(freq_base), -2.0 * expo / n_dims).astype(np.float32)
    p_sel = pos4.astype(jnp.float32)[sect_id, :].T  # (n_pos, n_pairs)
    theta_base = p_sel * theta_scale_pow[None, :]
    ff = freq_factors if freq_factors is not None else 1.0
    theta_extrap = theta_base / ff
    theta_interp = freq_scale * theta_extrap
    mscale = attn_factor
    if ext_factor != 0.0:
        low, high = corr_dims
        i0 = 2.0 * ic
        ramp = 1.0 - jnp.clip((i0 / 2 - low) / max(0.001, high - low), 0.0, 1.0)
        ramp_mix = ramp * ext_factor
        theta = theta_interp * (1 - ramp_mix) + theta_extrap * ramp_mix
        mscale = mscale * (1.0 + 0.1 * math.log(1.0 / freq_scale))
    else:
        theta = theta_interp
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def rope_ext(
    x,
    pos,
    freq_factors=None,
    *,
    n_dims: int,
    mode: int = ROPE_TYPE_NORMAL,
    n_ctx_orig: int = 0,
    freq_base: float = 10000.0,
    freq_scale: float = 1.0,
    ext_factor: float = 0.0,
    attn_factor: float = 1.0,
    beta_fast: float = 32.0,
    beta_slow: float = 1.0,
    sections: tuple = (0, 0, 0, 0),
    forward: bool = True,
):
    """x: (batch, n_pos, n_head, head_dim) [= ggml ne (head_dim, n_head, n_pos, batch)],
    pos: (n_pos,) int32 — or (4, n_pos) / flat (4*n_pos,) for mRoPE/vision
    modes (reference: ggml_rope_multi, include/ggml.h:1443-1463).  Supports
    normal, NeoX, multi-section mRoPE and vision modes with full YaRN params."""
    corr_dims = rope_yarn_corr_dims(n_dims, n_ctx_orig or 1, freq_base, beta_fast, beta_slow) if n_ctx_orig else (0.0, n_dims - 1.0)
    is_mrope = bool(mode & ROPE_TYPE_MROPE)
    is_vision = mode == ROPE_TYPE_VISION
    head_dim = x.shape[-1]
    if is_mrope:
        assert any(s > 0 for s in sections[:3]), "mRoPE needs non-empty sections"
        pos4 = jnp.asarray(pos)
        if pos4.ndim == 1:
            pos4 = pos4.reshape(4, -1)
        if is_vision:
            assert n_dims == head_dim // 2, "vision rope requires n_dims == head_dim/2"
        cos_t, sin_t = _mrope_cos_sin(
            pos4, n_dims, head_dim, sections, is_vision, freq_base, freq_scale,
            ext_factor, attn_factor, corr_dims, freq_factors,
        )
    else:
        cos_t, sin_t = _rope_cos_sin(
            pos, n_dims, freq_base, freq_scale, ext_factor, attn_factor, corr_dims, freq_factors
        )
    if not forward:
        sin_t = -sin_t
    # broadcast: (n_pos, 1, n_pairs) over heads
    cos_t = cos_t[:, None, :]
    sin_t = sin_t[:, None, :]
    if is_vision:
        # pairs are (ic, ic + n_dims) over the WHOLE head dim (the second
        # half-loop of the reference impl); no passthrough dims
        half = n_dims  # == head_dim // 2
        x0, x1 = x[..., :half], x[..., half:]
        o0 = x0 * cos_t - x1 * sin_t
        o1 = x0 * sin_t + x1 * cos_t
        return jnp.concatenate([o0, o1], axis=-1)
    rot, rest = x[..., :n_dims], x[..., n_dims:]
    if is_mrope or (mode & ROPE_TYPE_NEOX):
        half = n_dims // 2
        x0, x1 = rot[..., :half], rot[..., half:]
        o0 = x0 * cos_t[..., :half] - x1 * sin_t[..., :half]
        o1 = x0 * sin_t[..., :half] + x1 * cos_t[..., :half]
        out = jnp.concatenate([o0, o1], axis=-1)
    else:
        x0 = rot[..., 0::2]
        x1 = rot[..., 1::2]
        o0 = x0 * cos_t - x1 * sin_t
        o1 = x0 * sin_t + x1 * cos_t
        out = jnp.stack([o0, o1], axis=-1).reshape(rot.shape)
    return jnp.concatenate([out, rest], axis=-1) if rest.shape[-1] else out


# -- attention ---------------------------------------------------------------


def flash_attn_ext(q, k, v, mask=None, scale: float = 1.0, max_bias: float = 0.0, logit_softcap: float = 0.0):
    """reference: ggml_flash_attn_ext (include/ggml.h:1785-1800).
    Our convention: q (b, h, n_q, d), k (b, h_kv, n_kv, d), v (b, h_kv, n_kv, d_v),
    mask (n_q_pad, n_kv) or None. Returns (b, n_q, h, d_v) — note the reference's
    permuted result layout (res ne = [d, h, n_q, b]).
    GQA broadcast: h % h_kv == 0."""
    b, h, n_q, d = q.shape
    h_kv = k.shape[1]
    rep = h // h_kv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    if logit_softcap != 0.0:
        s = jnp.tanh(s * (scale / logit_softcap)) * logit_softcap
    else:
        s = s * scale
    if mask is not None:
        m = mask.astype(jnp.float32)[..., :n_q, :]
        if max_bias > 0.0:
            slopes = alibi_slopes(h, max_bias).reshape((h, 1, 1))
            m = m * slopes
        s = s + m
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkv->bhqv", p, vf, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


# -- convolutions -------------------------------------------------------------


def im2col(
    x, kw: int, kh: int = 1, sw: int = 1, sh: int = 1, pw: int = 0, ph: int = 0, dw: int = 1, dh: int = 1, is_2d: bool = True
):
    """reference: ggml_im2col. x: (N, C, H, W) [2D] or (N, C, L) [1D].
    Returns (N, OH, OW, KH*KW*C) for 2D, (N, OL, KW*C) for 1D — matching ggml's
    [C*KH*KW, OW, OH, N] ne layout with channel fastest."""
    if not is_2d:
        n, c, L = x.shape
        ol = (L + 2 * pw - dw * (kw - 1) - 1) // sw + 1
        xp = jnp.pad(x, [(0, 0), (0, 0), (pw, pw)])
        idx = (jnp.arange(ol) * sw)[:, None] + (jnp.arange(kw) * dw)[None, :]
        cols = xp[:, :, idx]  # (N, C, OL, KW)
        # row layout [IC, KW] — channel slowest (reference dst_data[iic*KW + ikw])
        return jnp.transpose(cols, (0, 2, 1, 3)).reshape(n, ol, c * kw)
    n, c, h, w = x.shape
    oh = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    ow = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    xp = jnp.pad(x, [(0, 0), (0, 0), (ph, ph), (pw, pw)])
    ridx = (jnp.arange(oh) * sh)[:, None] + (jnp.arange(kh) * dh)[None, :]  # (OH, KH)
    cidx = (jnp.arange(ow) * sw)[:, None] + (jnp.arange(kw) * dw)[None, :]  # (OW, KW)
    cols = xp[:, :, ridx[:, :, None, None], cidx[None, None, :, :]]  # (N, C, OH, KH, OW, KW)
    # row layout [IC, KH, KW] (reference dst_data[iic*(KH*KW) + ikh*KW + ikw])
    cols = jnp.transpose(cols, (0, 2, 4, 1, 3, 5))  # (N, OH, OW, C, KH, KW)
    return cols.reshape(n, oh, ow, c * kh * kw)


def conv_1d(x, w, s: int = 1, p: int = 0, d: int = 1):
    """x: (N, C_in, L); w: (C_out, C_in, K) -> (N, C_out, OL) (reference: ggml_conv_1d
    = im2col + mul_mat)."""
    cols = im2col(x, kw=w.shape[-1], sw=s, pw=p, dw=d, is_2d=False)  # (N, OL, C*K)
    wf = w.reshape(w.shape[0], -1)  # (C_out, C_in*K) — matches im2col row layout
    out = jnp.einsum("nlk,ok->nol", cols, wf, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return out.astype(x.dtype)


def conv_2d(x, w, sw: int = 1, sh: int = 1, pw: int = 0, ph: int = 0, dw: int = 1, dh: int = 1):
    """x: (N, C_in, H, W); w: (C_out, C_in, KH, KW) -> (N, C_out, OH, OW)."""
    cols = im2col(x, kw=w.shape[-1], kh=w.shape[-2], sw=sw, sh=sh, pw=pw, ph=ph, dw=dw, dh=dh)
    wf = w.reshape(w.shape[0], -1)  # (C_out, C_in*KH*KW) — matches im2col row layout
    out = jnp.einsum("nhwk,ok->nohw", cols, wf, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return out.astype(x.dtype)


def conv_2d_dw(x, w, sw: int = 1, sh: int = 1, pw: int = 0, ph: int = 0, dw: int = 1, dh: int = 1):
    """Depthwise conv: w (C, 1, KH, KW) (reference: ggml_conv_2d_dw)."""
    n, c, h, wd = x.shape
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.reshape(c, 1, w.shape[-2], w.shape[-1]).astype(jnp.float32),
        window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        rhs_dilation=(dh, dw),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(x.dtype)


def conv_transpose_1d(x, w, s: int = 1, p: int = 0, d: int = 1):
    """x: (N, C_in, L); w: (C_in, C_out, K) (ggml ne [K, C_out, C_in]).
    Scatter semantics out[i*s + k] += x[i] * w[k] (reference:
    ggml_conv_transpose_1d, CPU ggml_compute_forward_conv_transpose_1d) =
    input-dilated cross-correlation with the spatially flipped kernel."""
    assert p == 0 and d == 1  # the reference asserts this too
    wk = jnp.flip(jnp.transpose(w, (1, 0, 2)), axis=-1).astype(jnp.float32)  # (C_out, C_in, K)
    K = w.shape[-1]
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        wk,
        window_strides=(1,),
        padding=[(K - 1, K - 1)],
        lhs_dilation=(s,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(x.dtype)


def conv_transpose_2d(x, w, stride: int = 1):
    """x: (N, C_in, H, W); w: (C_in, C_out, KH, KW) (ggml ne [KW, KH, C_out, C_in]).
    reference: ggml_conv_transpose_2d_p0 (stride only, no padding)."""
    wk = jnp.flip(jnp.transpose(w, (1, 0, 2, 3)), axis=(-2, -1)).astype(jnp.float32)
    kh, kw = w.shape[-2], w.shape[-1]
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        wk,
        window_strides=(1, 1),
        padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(x.dtype)


def pool_1d(x, op: str, k: int, s: int, p: int = 0):
    return pool_2d(x[:, :, None, :], op, (1, k), (1, s), (0, p))[:, :, 0, :]


def pool_2d(x, op: str, k, s, p):
    """x: (N, C, H, W); op in {'max', 'avg'} (reference: ggml_pool_2d).
    Average counts the full kernel window (count_include_pad) like ggml."""
    kh, kw = (k, k) if isinstance(k, int) else k
    sh, sw = (s, s) if isinstance(s, int) else s
    ph, pw = (p, p) if isinstance(p, int) else p
    if op == "max":
        init = -jnp.inf
        fn = jax.lax.max
    else:
        init = 0.0
        fn = jax.lax.add
    xp = x.astype(jnp.float32)
    out = jax.lax.reduce_window(
        xp,
        init,
        fn,
        window_dimensions=(1, 1, kh, kw),
        window_strides=(1, 1, sh, sw),
        padding=[(0, 0), (0, 0), (ph, ph), (pw, pw)],
    )
    if op == "avg":
        out = out / (kh * kw)
    return out.astype(x.dtype)


def upscale(x, scale_factor: int):
    """Nearest-neighbor upscale of the spatial dims (reference: ggml_upscale)."""
    n, c, h, w = x.shape
    return jnp.repeat(jnp.repeat(x, scale_factor, axis=2), scale_factor, axis=3)


def interpolate_bilinear(x, oh: int, ow: int, align_corners: bool = False):
    n, c, h, w = x.shape
    return jax.image.resize(x, (n, c, oh, ow), method="bilinear")


# -- SSM / linear attention ----------------------------------------------------


def ssm_conv(sx, c):
    """reference: ggml_ssm_conv (CPU: ggml_compute_forward_ssm_conv_f32).
    sx: (n_s, d_inner, n_t + d_conv - 1) rolling buffer; c: (d_inner, d_conv).
    out: (n_s, n_t, d_inner)."""
    n_s, d_inner, total = sx.shape
    d_conv = c.shape[-1]
    n_t = total - d_conv + 1
    idx = jnp.arange(n_t)[:, None] + jnp.arange(d_conv)[None, :]  # (n_t, d_conv)
    windows = sx[:, :, idx]  # (n_s, d_inner, n_t, d_conv)
    out = jnp.einsum("sdtc,dc->std", windows, c, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return out.astype(sx.dtype)


def ssm_scan(s, x, dt, A, B, C):
    """Mamba selective scan (reference: ggml_ssm_scan, CPU
    ggml_compute_forward_ssm_scan_f32). Shapes (our convention):
    s: (n_s, d_inner, d_state) initial state; x: (n_s, n_t, d_inner);
    dt: (n_s, n_t, d_inner); A: (d_inner, d_state);
    B, C: (n_s, n_t, d_state). Returns (y, s_out): y (n_s, n_t, d_inner)."""
    dtsp = jax.nn.softplus(dt.astype(jnp.float32))
    xf = x.astype(jnp.float32)

    def step_fn(state, inp):
        xt, dtt, Bt, Ct = inp  # (n_s, d_inner), (n_s, d_inner), (n_s, d_state) x2
        dA = jnp.exp(dtt[..., None] * A[None])  # (n_s, d_inner, d_state)
        dBx = (dtt * xt)[..., None] * Bt[:, None, :]
        state = state * dA + dBx
        y = jnp.einsum("sde,se->sd", state, Ct)
        return state, y

    xs = (jnp.swapaxes(xf, 0, 1), jnp.swapaxes(dtsp, 0, 1), jnp.swapaxes(B.astype(jnp.float32), 0, 1), jnp.swapaxes(C.astype(jnp.float32), 0, 1))
    s_out, ys = jax.lax.scan(step_fn, s.astype(jnp.float32), xs)
    return jnp.swapaxes(ys, 0, 1).astype(x.dtype), s_out.astype(s.dtype)


def rwkv_wkv6(k, v, r, tf, td, state):
    """RWKV v6 attention (reference: ggml_rwkv_wkv6, CPU
    ggml_compute_forward_rwkv_wkv6_f32). Shapes:
    k, v, r, td: (B, T, H, S); tf: (H, S); state: (B, H, S, S).
    Returns (out (B, T, H, S), state_out)."""
    kf, vf, rf, tdf = (a.astype(jnp.float32) for a in (k, v, r, td))
    tff = tf.astype(jnp.float32)

    def step_fn(st, inp):
        kt, vt, rt, tdt = inp  # (B, H, S)
        kv = kt[..., :, None] * vt[..., None, :]  # (B, H, S, S) outer product k_i * v_j
        y = jnp.einsum("bhij,bhi->bhj", st + tff[None, :, :, None] * kv, rt)
        st = st * tdt[..., :, None] + kv
        return st, y

    xs = tuple(jnp.swapaxes(a, 0, 1) for a in (kf, vf, rf, tdf))
    st_out, ys = jax.lax.scan(step_fn, state.astype(jnp.float32), xs)
    return jnp.swapaxes(ys, 0, 1), st_out


def gated_linear_attn(k, v, q, g, state, scale: float = 1.0):
    """reference: ggml_gated_linear_attn (CPU ggml_compute_forward_gla).
    k, v, q, g: (B, T, H, S); state: (B, H, S, S). Returns (out, state_out)."""
    kf, vf, qf, gf = (a.astype(jnp.float32) for a in (k, v, q, g))

    def step_fn(st, inp):
        kt, vt, qt, gt = inp
        st = st * gt[..., :, None] + kt[..., :, None] * vt[..., None, :]
        y = jnp.einsum("bhij,bhi->bhj", st, qt) * scale
        return st, y

    xs = tuple(jnp.swapaxes(a, 0, 1) for a in (kf, vf, qf, gf))
    st_out, ys = jax.lax.scan(step_fn, state.astype(jnp.float32), xs)
    return jnp.swapaxes(ys, 0, 1), st_out


# -- SAM helpers ---------------------------------------------------------------


def win_part(x, w: int):
    """Partition into non-overlapping windows with zero pad (reference: ggml_win_part).
    x: (N=1, C, H, W)... ggml uses ne (C, W, H, 1) -> here x: (1, H, W, C)
    -> (nw, w, w, C)."""
    _, h, wd, c = x.shape
    ph, pw = (-h) % w, (-wd) % w
    xp = jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)])
    nh, nw = (h + ph) // w, (wd + pw) // w
    xw = xp.reshape(1, nh, w, nw, w, c)
    return jnp.transpose(xw, (0, 1, 3, 2, 4, 5)).reshape(nh * nw, w, w, c)


def win_unpart(x, h: int, wd: int, w: int):
    """Inverse of win_part (reference: ggml_win_unpart)."""
    nh, nw = (h + (-h) % w) // w, (wd + (-wd) % w) // w
    c = x.shape[-1]
    xw = x.reshape(1, nh, nw, w, w, c)
    xp = jnp.transpose(xw, (0, 1, 3, 2, 4, 5)).reshape(1, nh * w, nw * w, c)
    return xp[:, :h, :wd, :]


def get_rel_pos(rel_pos, qh: int, kh: int):
    """reference: ggml_get_rel_pos (SAM decomposed rel positions).
    rel_pos: (2*max(qh,kh)-1, C) -> (qh, kh, C)."""
    q = jnp.arange(qh)[:, None]
    k = jnp.arange(kh)[None, :]
    idx = (q * max(kh / qh, 1.0) - k * max(qh / kh, 1.0) + (kh - 1) * max(qh / kh, 1.0)).astype(jnp.int32)
    return rel_pos[idx]


def add_rel_pos(attn, rel_w, rel_h):
    """reference: ggml_add_rel_pos. attn: (B*nh, qh*qw, kh*kw);
    rel_h: (B*nh, qh, qw, kh); rel_w: (B*nh, qh, qw, kw).
    attn += rel_h broadcast over kw + rel_w broadcast over kh."""
    b, q, _ = attn.shape
    qh, qw, kh = rel_h.shape[1:]
    kw = rel_w.shape[-1]
    a = attn.reshape(b, qh, qw, kh, kw)
    a = a + rel_h[..., :, None] + rel_w[..., None, :]
    return a.reshape(attn.shape)


# -- losses / training ops -----------------------------------------------------


def cross_entropy_loss(logits, labels):
    """Mean-free total CE over rows * ... (reference: ggml_cross_entropy_loss —
    sum over rows of -sum(labels * log_softmax(logits)) / nr ... CPU impl sums
    -(labels . (logsoftmax)) over all rows then, at graph level, callers divide).
    Returns scalar shape (1,): sum_i CE_i / nr with nr = number of rows? The
    reference computes total sum over rows divided by nr at loss-type level;
    here: total sum (matching GGML_OP_CROSS_ENTROPY_LOSS which outputs one scalar
    = sum over all rows of CE)."""
    ls = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.sum(labels.astype(jnp.float32) * ls, axis=-1)
    nr = ce.size
    return (jnp.sum(ce) / nr).reshape(1)


def opt_step_adamw(w, g, m, v, adamw_params):
    """Fused AdamW step (reference: ggml_opt_step_adamw include/ggml.h:2043,
    CPU ggml_compute_forward_opt_step_adamw_f32). adamw_params: 7-vector
    [alpha, beta1, beta2, eps, wd, beta1h, beta2h] where beta1h/2h are the
    bias-correction-adjusted learning rates."""
    alpha, beta1, beta2, eps, wd, beta1h, beta2h = (adamw_params[i] for i in range(7))
    m = m * beta1 + g * (1.0 - beta1)
    v = v * beta2 + g * g * (1.0 - beta2)
    mh = m * beta1h
    vh = jnp.sqrt(v * beta2h) + eps
    w = w * (1.0 - alpha * wd) - mh / vh
    return w, m, v
