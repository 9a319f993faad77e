"""Guard-band sentinels for the Pallas kernels — the out-of-bounds detection
idiom of the reference test harness (tests/test-backend-ops.cpp:374-419:
1 KB sentinel tensors interleaved between allocations, checked after
compute), adapted to XLA/Pallas semantics:

- OOB *reads* are caught by NaN-poisoning every padding region a kernel
  must never read (pad columns of the planar weight planes beyond `n`,
  pad rows of the activation chunking, mask rows beyond n_q).  One stray
  read contaminates the accumulator and the NMSE check fails — NaN is the
  sentinel that survives any arithmetic.
- OOB *writes* within a kernel land in its own output buffer (XLA buffers
  are otherwise immutable), so they corrupt real output rows — caught by
  comparing real rows against the padding-free run.  Cross-buffer stomps
  can only happen through donation aliasing, checked here by verifying a
  donated decode step leaves non-donated inputs intact.

Runs in interpret mode on CPU (exact) and compiles unchanged on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.quant.planar import PlanarWeight


def _mk_planar(kind: str, n: int, k: int, npad: int, g: int = 32, seed: int = 0):
    """Random planar weight with npad >= n padded output columns."""
    rng = np.random.default_rng(seed)
    if kind == "q4":
        codes = rng.integers(0, 256, (k // 2, npad), np.uint8)
        scales = rng.standard_normal((2, (k // 2) // g, npad)).astype(np.float32) * 0.05
    else:
        codes = rng.integers(-127, 128, (k, npad), np.int8)
        scales = rng.standard_normal((k // g, npad)).astype(np.float32) * 0.05
    offsets = rng.standard_normal((k // g, npad)).astype(np.float32) * 0.01
    return PlanarWeight(kind=kind, codes=codes, scales=scales, offsets=offsets,
                        group=g, n=n, k=k, orig_type=GGMLType.Q4_K)


def _poison_pad_columns(pw: PlanarWeight) -> PlanarWeight:
    """NaN/garbage in every weight-plane column beyond pw.n — the guard
    band a correct kernel never lets reach a real output column."""
    scales = np.asarray(pw.scales).copy()
    scales[..., pw.n:] = np.nan
    codes = np.asarray(pw.codes).copy()
    codes[..., pw.n:] = 255 if codes.dtype == np.uint8 else -128
    offsets = None
    if pw.offsets is not None:
        offsets = np.asarray(pw.offsets).copy()
        offsets[..., pw.n:] = np.nan
    return PlanarWeight(kind=pw.kind, codes=codes, scales=scales, offsets=offsets,
                        group=pw.group, n=pw.n, k=pw.k, orig_type=pw.orig_type)


@pytest.mark.parametrize("kind", ["q8", "q4"])
@pytest.mark.parametrize("m", [1, 64, 700])  # gemv, matmul, chunked-matmul paths
def test_planar_matmul_ignores_poisoned_pad_columns(kind, m):
    from ggml_tpu.kernels.qmatmul import planar_matmul

    n, k, npad = 384, 256, 512  # npad > n: a 128-col guard band
    pw = _mk_planar(kind, n, k, npad)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((m, k)), jnp.float32)

    y_clean = np.asarray(planar_matmul(x, pw.to_device(), interpret=True))
    y_poison = np.asarray(planar_matmul(x, _poison_pad_columns(pw).to_device(), interpret=True))

    assert y_clean.shape == (m, n)
    assert np.isfinite(y_poison).all(), "NaN guard leaked into real output columns"
    np.testing.assert_array_equal(y_clean, y_poison)


def test_flash_attention_ignores_poisoned_mask_pad_rows():
    """Mask rows beyond n_q are padding (the GGML_KQ_MASK_PAD idiom,
    include/ggml.h:1778-1785); poisoned pad rows must not change real rows."""
    from ggml_tpu.kernels.flash_attn import flash_attention

    b, h, n_q, n_kv, d = 1, 2, 48, 64, 32
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((b, h, n_q, d)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((b, h, n_kv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n_kv, d)), jnp.float32)

    pad = 16
    mask = np.zeros((n_q + pad, n_kv), np.float32)
    mask[:n_q, 32:] = -np.inf  # real mask content
    clean = np.asarray(flash_attention(q, kk, v, mask=jnp.asarray(mask), interpret=True))

    mask_p = mask.copy()
    mask_p[n_q:, :] = np.nan  # guard band
    poison = np.asarray(flash_attention(q, kk, v, mask=jnp.asarray(mask_p), interpret=True))

    assert np.isfinite(poison).all()
    np.testing.assert_array_equal(clean, poison)


def test_donated_step_leaves_inputs_intact():
    """Donation aliasing is the only way a kernel write can stomp another
    live buffer; verify a donated cache update leaves the params (weights)
    bit-identical — the cross-allocation sentinel check."""
    from ggml_tpu.models import gptj

    cfg = gptj.random_config("tiny")
    rng = np.random.default_rng(3)
    params = {}
    E = cfg.n_embd
    params["token_embd.weight"] = jnp.asarray(rng.standard_normal((cfg.n_vocab, E)) * 0.02, jnp.float32)
    params["output_norm.weight"] = jnp.ones((E,), jnp.float32)
    params["output_norm.bias"] = jnp.zeros((E,), jnp.float32)
    params["output.weight"] = jnp.asarray(rng.standard_normal((cfg.n_vocab, E)) * 0.02, jnp.float32)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        for nm, shp in [("attn_norm.weight", (E,)), ("attn_norm.bias", (E,)),
                        ("attn_q.weight", (E, E)), ("attn_k.weight", (E, E)),
                        ("attn_v.weight", (E, E)), ("attn_output.weight", (E, E)),
                        ("ffn_up.weight", (4 * E, E)), ("ffn_up.bias", (4 * E,)),
                        ("ffn_down.weight", (E, 4 * E)), ("ffn_down.bias", (E,))]:
            params[pre + nm] = jnp.asarray(rng.standard_normal(shp) * 0.02, jnp.float32)

    m = gptj.GPTJ(params, cfg, max_seq=32, batch=1)
    before = {k: np.asarray(v).copy() for k, v in params.items()}
    cache = m.new_cache(jnp.float32)
    _, cache, t = m.prefill(cache, np.array([[1, 2, 3]], np.int32))
    m.decode_greedy(cache, np.array([[4]], np.int32), t, 4)
    for k, v in params.items():
        np.testing.assert_array_equal(before[k], np.asarray(v), err_msg=k)
