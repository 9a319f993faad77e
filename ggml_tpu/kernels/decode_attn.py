"""Fused single-token decode attention.

The decode hot loop's attention block is ~10 small XLA ops per layer (two
einsums, mask, softmax, casts, transposes) — each carries ~1-2 us of fixed
launch latency, which at 28 layers costs ~0.3 ms/token against a ~6 ms step.
This kernel folds the whole block into ONE pallas_call per layer:

    att = softmax(mask(q . K'^T * scale))   K' = cache with k_new inserted
    out = att . V'                          (insert happens in registers)

The HBM cache row write itself stays OUTSIDE as a dynamic_update_slice —
in-place, one row, and overlappable with this kernel; an aliased full-block
write inside the kernel doubles attention HBM traffic (measured 6.36 vs
6.28 ms/tok e2e on GPT-J-6B).

Reference analog: GGML_OP_FLASH_ATTN_EXT specialized to q_len == 1
(include/ggml.h:1785; the CUDA side ships dedicated decode fattn-vec
kernels, src/ggml-cuda/fattn-vec*.cu* — same specialization, TPU-style).

Grid: one step per KV head; each step holds that head's whole cache window
in VMEM ((S, d) bf16 — 128 KB at S=256, d=256).  The current position
arrives as a scalar-prefetch argument so page-in addressing is known before
the body runs.  Works for MHA and GQA (q heads grouped over KV heads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, q, k_new, v_new, kc, vc, out, *, scale, rep):
    """One grid step = a BLOCK of KV heads (hb).  Blocks:
    q (hb, rep, d), k_new/v_new (hb, 1, d), kc/vc (hb, S, d) — read-only;
    the new row is inserted IN REGISTERS for this step's attention while the
    caller's dynamic_update_slice writes it to HBM in parallel (a full-block
    aliased write here would double attention HBM traffic — measured 6.36 vs
    6.28 ms/tok e2e).  Multiple heads per step matter: at one 256 KB head
    per step the per-step grid cost capped the kernel at ~408 GB/s of cache
    read (OP_PERF.json 2026-08-19); ~1-2 MB blocks keep the DMA pipeline
    full."""
    pos = pos_ref[0]
    hb, s, d = kc.shape
    row3 = jax.lax.broadcasted_iota(jnp.int32, (hb, s, d), 1)
    kc_full = jnp.where(row3 == pos, k_new[:], kc[:]).reshape(hb * s, d)
    vc_full = jnp.where(row3 == pos, v_new[:], vc[:]).reshape(hb * s, d)

    # TWO flat 2D MXU dots across the whole head block (batch-dim
    # dot_general lowers to a slow per-head loop in Mosaic — measured 238 vs
    # 10 us): score ALL (query-head, key-head) pairs in one (hb*rep, d) x
    # (d, hb*s) pass, then mask the off-diagonal head pairs together with
    # the causal tail to -inf so softmax zeroes them — the second dot's
    # cross-head terms then contribute exactly 0.  The 8x flop redundancy is
    # free under the DMA stream (~17 MFLOP vs ~2 MB per step).
    q2 = q[:].reshape(hb * rep, d)
    att = jax.lax.dot_general(
        q2.astype(jnp.float32), kc_full.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale  # (hb*rep, hb*s)
    rh = jax.lax.broadcasted_iota(jnp.int32, (hb * rep, hb * s), 0) // rep
    cc = jax.lax.broadcasted_iota(jnp.int32, (hb * rep, hb * s), 1)
    keep = (rh == cc // s) & ((cc % s) <= pos)
    att = jnp.where(keep, att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1)
    out[:] = jax.lax.dot_general(
        att, vc_full.astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(hb, rep, d).astype(out.dtype)


def fused_decode_attention(q, k_new, v_new, kc, vc, pos, *, scale,
                           interpret: bool | None = None):
    """q (b, hq, 1, d); k_new/v_new (b, hkv, 1, d); kc/vc (b, hkv, S, d);
    pos: scalar int32 (same position for every row — the jitted-scan decode
    shape).  kc/vc are the PRE-update caches; the new row is inserted in
    registers for this step's attention (the caller writes it to HBM with a
    plain dynamic_update_slice, overlapping this kernel).  Returns out
    (b, hq, 1, d) f32.  b must be 1 (the flagship decode shape); callers
    fall back to the jnp path otherwise."""
    if interpret is None:
        from .qmatmul import _interpret_default

        interpret = _interpret_default()
    b, hq, one, d = q.shape
    _, hkv, s, _ = kc.shape
    assert b == 1 and one == 1 and hq % hkv == 0
    rep = hq // hkv

    qh = q.reshape(hkv, rep, d)
    kn = k_new.reshape(hkv, 1, d)
    vn = v_new.reshape(hkv, 1, d)
    kc3 = kc.reshape(hkv, s, d)
    vc3 = vc.reshape(hkv, s, d)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    # heads per grid step: ~1-2 MB of cache per block keeps the DMA pipeline
    # full without hogging VMEM at long S (k+v = 2*hb*S*d*2 bytes);
    # GGML_TPU_DECODE_ATTN_HB overrides for A/B measurement
    import os

    hb = int(os.environ.get("GGML_TPU_DECODE_ATTN_HB", "0"))
    if hb <= 0 or hkv % hb != 0:
        hb = 1
        for cand in (16, 8, 4, 2):
            if hkv % cand == 0 and 2 * cand * s * d * 2 <= (2 << 20):
                hb = cand
                break

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(hkv // hb,),
        in_specs=[
            pl.BlockSpec((hb, rep, d), lambda h, p: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, 1, d), lambda h, p: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, 1, d), lambda h, p: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, s, d), lambda h, p: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, s, d), lambda h, p: (h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, rep, d), lambda h, p: (h, 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, rep=rep),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hkv, rep, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pos_arr, qh, kn, vn, kc3, vc3)
    return out.reshape(b, hq, 1, d)
