"""Tensor-parallel quantized inference: shard_map around the Pallas kernels.

This is the TPU equivalent of ggml's CUDA split-buffer row-parallelism
(reference: src/ggml-cuda/ggml-cuda.cu:750-960 shards each weight matrix
across GPUs with per-GPU partial matmuls) — except the collective is an XLA
psum over ICI instead of per-tensor PCIe copies, and it composes with any mesh
size via jax.sharding.

Pallas custom calls are opaque to GSPMD, so sharded execution is written
explicitly with shard_map: every device runs planar_matmul on its weight
shard; GPT-J's parallel residual (attn and mlp read the same normed input)
means the attn-out and ffn-down partial sums share ONE psum per layer.

Layout (Megatron-style, per tp shard):
  attn_q/k/v, ffn_up       column-parallel: N (heads / ffn) sharded
  attn_output, ffn_down    row-parallel: K sharded, outputs partial -> psum
  lm head (output.weight)  column-parallel on vocab, all-gather at the end
  embeddings, norms        replicated
  KV cache                 sharded on heads
"""

from __future__ import annotations

import functools
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..quant.planar import PlanarWeight


def _pw_spec(pw: PlanarWeight, mode: str) -> PlanarWeight:
    """A PlanarWeight whose leaves are PartitionSpecs (pytree-shaped specs)."""
    if mode == "col":  # shard N (last axis of every plane)
        codes = P(None, "tp")
        scales = P(None, None, "tp") if pw.kind == "q4" else P(None, "tp")
        offsets = None if pw.offsets is None else P(None, "tp")
        sup = P(None, None, "tp")
    elif mode == "row":  # shard K (leading axis)
        codes = P("tp", None)
        scales = P(None, "tp", None) if pw.kind == "q4" else P("tp", None)
        offsets = None if pw.offsets is None else P("tp", None)
        sup = P(None, "tp", None)
    else:  # replicated
        codes = P(None, None)
        scales = P(None, None, None) if pw.kind == "q4" else P(None, None)
        offsets = None if pw.offsets is None else P(None, None)
        sup = P(None, None, None)
    supers = None if pw.supers is None else tuple(
        None if s is None else sup for s in pw.supers)
    return replace(pw, codes=codes, scales=scales, offsets=offsets, supers=supers)


def _localize(pw: PlanarWeight) -> PlanarWeight:
    """Fix the static n/k metadata to match this shard's actual planes
    (inside shard_map the leaves are local shards but aux is global)."""
    if pw.kind == "q4":
        k = 2 * pw.codes.shape[0]
    else:
        k = pw.codes.shape[0]
    return replace(pw, n=pw.codes.shape[1], k=k)


def _slice_pw_cols(pw: PlanarWeight, a: int, b: int, n_pad_to: int = 128) -> PlanarWeight:
    """Logical column slice [a, b) of a planar weight.  Planar columns are
    independent (codes/scales/offsets all carry N as the last axis), so the
    slice is exact; it is re-padded to the kernel's lane multiple."""
    width = b - a
    npad = -(-width // n_pad_to) * n_pad_to

    def cut(plane):
        s = np.asarray(plane)[..., a:b]
        if npad != width:
            s = np.pad(s, [(0, 0)] * (s.ndim - 1) + [(0, npad - width)])
        return s

    return replace(
        pw,
        codes=cut(pw.codes),
        scales=cut(pw.scales),
        offsets=None if pw.offsets is None else cut(pw.offsets),
        supers=None if pw.supers is None else tuple(
            None if s is None else cut(s) for s in pw.supers),
        n=width,
    )


def unfuse_qkv(params: dict) -> dict:
    """Split fused attn_qkv projections into attn_q/k/v.

    The fused [q|k|v] column layout is a single-chip decode optimization
    (fewer, wider kernels); tensor parallelism needs each projection sharded
    over its own heads, so the TP load path repartitions on entry — the same
    on-load relayout idea as the reference's repacked CUDA split buffers
    (src/ggml-cuda/ggml-cuda.cu:750-960)."""
    out = {}
    for name, v in params.items():
        if name.endswith("attn_qkvup.weight"):
            # [q|k|v|ffn_up] widest-kernel fusion (synth default since r3):
            # q/k/v are E columns each, ffn_up the remaining 4E
            pre = name[: -len("attn_qkvup.weight")]
            ntot = v.n if isinstance(v, PlanarWeight) else v.shape[0]
            e = ntot // 7
            cuts = [("attn_q.weight", 0, e), ("attn_k.weight", e, 2 * e),
                    ("attn_v.weight", 2 * e, 3 * e),
                    ("ffn_up.weight", 3 * e, ntot)]
            for nm, a, b2 in cuts:
                out[pre + nm] = (_slice_pw_cols(v, a, b2)
                                 if isinstance(v, PlanarWeight) else v[a:b2])
        elif name.endswith("attn_qkv.weight"):
            pre = name[: -len("attn_qkv.weight")]
            if isinstance(v, PlanarWeight):
                e = v.n // 3
                for j, s in enumerate("qkv"):
                    out[pre + f"attn_{s}.weight"] = _slice_pw_cols(v, j * e, (j + 1) * e)
            else:
                e = v.shape[0] // 3
                for j, s in enumerate("qkv"):
                    out[pre + f"attn_{s}.weight"] = v[j * e : (j + 1) * e]
        elif name.endswith("attn_qkv.bias"):
            pre = name[: -len("attn_qkv.bias")]
            e = v.shape[0] // 3
            for j, s in enumerate("qkv"):
                out[pre + f"attn_{s}.bias"] = v[j * e : (j + 1) * e]
        else:
            out[name] = v
    return out


def _weight_mode(name: str) -> str:
    if name.endswith(("attn_q.weight", "attn_k.weight", "attn_v.weight", "ffn_up.weight")):
        return "col"
    if name.endswith(("attn_output.weight", "ffn_down.weight")):
        return "row"
    if name == "output.weight":
        return "col"
    return "rep"


def gptj_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a GPT-J param dict (dense or planar)."""
    specs = {}
    for name, v in params.items():
        mode = _weight_mode(name)
        if isinstance(v, PlanarWeight):
            specs[name] = _pw_spec(v, mode)
        elif mode == "col" and getattr(v, "ndim", 0) == 2:
            specs[name] = P("tp", None)  # dense (N, K): N sharded
        elif mode == "row" and getattr(v, "ndim", 0) == 2:
            specs[name] = P(None, "tp")
        elif name.endswith("ffn_up.bias"):
            specs[name] = P("tp")
        else:
            specs[name] = P() if getattr(v, "ndim", 0) == 0 else P(*([None] * v.ndim))
    return specs


def prepare_tp_params(params: dict, tp: int) -> dict:
    """Host-side TP load-path relayout: split fused qkv projections and
    nibble-re-pair q4 row-sharded planes so a 'tp'-axis sharding is legal at
    full packed density.  Pure numpy transform — callers place the result
    (device_put on a single-controller mesh, or global-array construction on
    a multi-process mesh)."""
    from ..quant.planar import repack_q4_rows_for_tp

    if any(name.endswith(("attn_qkv.weight", "attn_qkv.bias", "attn_qkvup.weight"))
           for name in params):
        params = unfuse_qkv(params)
    if tp > 1:
        # q4 packed planes row-shard at full density after a one-time nibble
        # re-pair so each shard's contiguous rows decode its own element
        # range (the CUDA split-buffer repack analog) — TP keeps the 2x HBM
        # win instead of falling back to q8 codes
        params = {
            name: (repack_q4_rows_for_tp(v, tp)
                   if isinstance(v, PlanarWeight) and v.kind == "q4"
                   and _weight_mode(name) == "row" else v)
            for name, v in params.items()
        }
    return params


def shard_gptj_params(params: dict, mesh: Mesh) -> dict:
    params = prepare_tp_params(params, mesh.shape.get("tp", 1))
    specs = gptj_param_specs(params)
    return jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: x is None,
    )


CACHE_SPEC = P(None, "tp", None, None)  # per-leaf (B, H, S, D): heads sharded


def _linear_local(x, w, b=None):
    from ..models.gptj import _linear

    return _linear(x, _localize(w) if isinstance(w, PlanarWeight) else w, b)


def _forward_tp_body(params, tokens, pos_start, cache, cache_len, *, cfg):
    """Runs per-shard inside shard_map. Returns (local vocab-shard logits, cache)."""
    b, t = tokens.shape
    tp = jax.lax.axis_size("tp")
    h_local = cfg.n_head // tp
    d = cfg.head_dim
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]
    embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
    x = embd[tokens]
    compute_dtype = x.dtype

    from ..models.gptj import _layer_norm, _rope_interleaved

    new_cache = list(cache)
    scale = 1.0 / np.sqrt(d)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = _layer_norm(x, params[pre + "attn_norm.weight"], params[pre + "attn_norm.bias"], cfg.eps)

        q = _linear_local(h, params[pre + "attn_q.weight"])
        k = _linear_local(h, params[pre + "attn_k.weight"])
        v = _linear_local(h, params[pre + "attn_v.weight"])

        def heads(z):
            return z.reshape(b, t, h_local, d)

        q = _rope_interleaved(heads(q), positions, cfg.n_rot).transpose(0, 2, 1, 3)
        k = _rope_interleaved(heads(k), positions, cfg.n_rot).transpose(0, 2, 1, 3)
        v = heads(v).transpose(0, 2, 1, 3)

        from ..models.common import cache_write

        cdt = cache[0][0].dtype
        # cache_write handles scalar cache_len (single sequence) AND (B,)
        # per-slot position vectors (continuous batching via serve.Engine)
        kc = cache_write(new_cache[i][0], k.astype(cdt), cache_len)
        vc = cache_write(new_cache[i][1], v.astype(cdt), cache_len)
        new_cache[i] = (kc, vc)

        att = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kc.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
        kv_pos = jnp.arange(max_seq)[None, None, None, :]
        q_pos = positions[:, None, :, None]
        att = jnp.where(kv_pos <= q_pos, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vc)
        attn_out = out.transpose(0, 2, 1, 3).reshape(b, t, h_local * d).astype(compute_dtype)
        attn_partial = _linear_local(attn_out, params[pre + "attn_output.weight"])

        ff = _linear_local(h, params[pre + "ffn_up.weight"], params[pre + "ffn_up.bias"])
        ff = 0.5 * ff * (1.0 + jnp.tanh(0.79788456080286535588 * ff * (1.0 + 0.044715 * ff * ff)))
        ff_partial = _linear_local(ff, params[pre + "ffn_down.weight"])

        # ONE collective per layer: the parallel residual lets attn + mlp
        # partials ride a single psum over ICI
        x = x + jax.lax.psum(attn_partial + ff_partial, "tp") + params[pre + "ffn_down.bias"]

    x = _layer_norm(x, params["output_norm.weight"], params["output_norm.bias"], cfg.eps)
    # vocab-sharded lm head; the (replicated) bias is added after the gather
    # because the planar pad columns live only on the last shard
    logits_local = _linear_local(x, params["output.weight"])
    return logits_local, tuple(new_cache)


def make_tp_engine_forward(cfg, mesh: Mesh):
    """Tensor-parallel forward with the MODEL-FAMILY signature
    (params, cfg, tokens, pos_start, cache, cache_len, *, prefill=False) so
    serve.Engine can drive a TP-sharded model directly — single-controller
    multi-chip serving (continuous batching × tensor parallelism; the
    composition the reference's RPC star cannot express).  Pass as
    Engine(model, forward_fn=make_tp_engine_forward(cfg, mesh),
    cache_put=...); per-slot (B,) position vectors are supported."""

    def fwd(params, cfgv, tokens, pos_start, cache, cache_len, *, prefill=False):
        del cfgv, prefill  # cfg is closed over; no flash path in the TP body
        specs = gptj_param_specs(params)
        body = functools.partial(_forward_tp_body, cfg=cfg)
        cl_spec = P() if getattr(cache_len, "ndim", 0) == 0 else P(None)
        logits_local, new_cache = shard_map(
            body,
            mesh=mesh,
            in_specs=(specs, P(None, None), P(None), CACHE_SPEC, cl_spec),
            out_specs=(P(None, None, "tp"), CACHE_SPEC),
            check_rep=False,
        )(params, tokens, pos_start, cache, cache_len)
        logits = logits_local[..., : cfg.n_vocab]
        if "output.bias" in params:
            logits = logits + params["output.bias"]
        return logits, new_cache

    return fwd


TPDP_CACHE_SPEC = P("dp", "tp", None, None)  # (B, H, S, D): slots x heads


def make_tp_dp_engine_forward(cfg, mesh: Mesh):
    """Decode forward for the tp x dp composition: KV slots sharded over
    'dp' (each host computes only its own slots) AND heads/weights sharded
    over 'tp' (each chip streams 1/tp of the weights).  Same model-family
    signature as make_tp_engine_forward; per-slot (B,) position vectors
    required (the batch axis is shard_mapped, so scalar broadcast positions
    would desync).  This is the serving shape the reference's RPC star
    cannot express: intra-host collectives ride ICI ('tp'), inter-host
    traffic is only the replicated token/logit vectors."""

    def fwd(params, cfgv, tokens, pos_start, cache, cache_len, *, prefill=False):
        del cfgv, prefill
        specs = gptj_param_specs(params)
        body = functools.partial(_forward_tp_body, cfg=cfg)
        logits_local, new_cache = shard_map(
            body,
            mesh=mesh,
            in_specs=(specs, P("dp", None), P("dp"), TPDP_CACHE_SPEC, P("dp")),
            out_specs=(P("dp", None, "tp"), TPDP_CACHE_SPEC),
            check_rep=False,
        )(params, tokens, pos_start, cache, cache_len)
        logits = logits_local[..., : cfg.n_vocab]
        if "output.bias" in params:
            logits = logits + params["output.bias"]
        return logits, new_cache

    return fwd


def make_tp_forward(cfg, mesh: Mesh):
    """Build a jitted tensor-parallel forward: (params, tokens, pos_start,
    cache, cache_len) -> (full logits, cache). Cache stays sharded on heads."""

    def fwd(params, tokens, pos_start, cache, cache_len):
        specs = gptj_param_specs(params)
        body = functools.partial(_forward_tp_body, cfg=cfg)
        logits_local, new_cache = shard_map(
            body,
            mesh=mesh,
            in_specs=(specs, P(None, None), P(None), CACHE_SPEC, P()),
            out_specs=(P(None, None, "tp"), CACHE_SPEC),
            check_rep=False,
        )(params, tokens, pos_start, cache, cache_len)
        logits = logits_local[..., : cfg.n_vocab]
        if "output.bias" in params:
            logits = logits + params["output.bias"]
        return logits, new_cache

    return jax.jit(fwd, donate_argnums=(3,))
