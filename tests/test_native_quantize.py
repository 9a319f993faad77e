"""Native C++ quantizer (csrc/quantize.cpp) vs the NumPy executable spec:
byte-identical output for every supported type across value scales
(including dead/constant blocks), so the fast conversion path can never
change model bits."""

import numpy as np
import pytest

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.native import fast_quantize, native_quantize
from ggml_tpu.quant import reference as R

TYPES = [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
         GGMLType.Q6_K, GGMLType.Q8_0, GGMLType.IQ4_NL, GGMLType.IQ4_XS,
         # grid types with an unweighted spec path
         GGMLType.IQ2_S, GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_M]

# grid types whose spec REQUIRES an imatrix (covered by the imatrix test)
IMAT_ONLY = [GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ1_S]


@pytest.mark.parametrize("ggml_type", TYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("scale", [1e-4, 1.0, 100.0])
def test_native_matches_numpy_spec(ggml_type, scale):
    if native_quantize(np.zeros((1, 256), np.float32), ggml_type) is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(int(scale * 10) + int(ggml_type))
    x = (rng.standard_normal((48, 512)) * scale).astype(np.float32)
    a = native_quantize(x, ggml_type)
    b = np.asarray(R.quantize(x, ggml_type))
    assert np.array_equal(a.reshape(-1), b.reshape(-1))


@pytest.mark.parametrize("ggml_type", TYPES, ids=lambda t: t.name)
def test_native_edge_blocks(ggml_type):
    if native_quantize(np.zeros((1, 256), np.float32), ggml_type) is None:
        pytest.skip("native toolchain unavailable")
    rows = np.stack([
        np.zeros(512, np.float32),                      # dead blocks
        np.full(512, 0.37, np.float32),                 # constant positive
        np.full(512, -1.25, np.float32),                # constant negative
        np.linspace(-2, 2, 512).astype(np.float32),     # smooth ramp
    ])
    a = native_quantize(rows, ggml_type)
    b = np.asarray(R.quantize(rows, ggml_type))
    assert np.array_equal(a.reshape(-1), b.reshape(-1))


IMAT_TYPES = [GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.IQ2_XXS,
              GGMLType.IQ2_XS, GGMLType.IQ2_S, GGMLType.IQ3_XXS,
              GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M]


@pytest.mark.parametrize("ggml_type", IMAT_TYPES, ids=lambda t: t.name)
def test_native_imatrix_matches_numpy_spec(ggml_type):
    """Imatrix-weighted native i-quant encoders == the NumPy spec
    byte-for-byte — the IQ4 LUT fits AND every grid-codebook type
    (quantize_row_iq2_xxs_impl et al., src/ggml-quants.c:2954 onward,
    neighbour search included)."""
    from ggml_tpu.quant.imatrix import _IMAT_QUANT, quantize_with_imatrix

    if native_quantize(np.zeros((1, 256), np.float32), ggml_type,
                       qw=np.ones(256, np.float32)) is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    x = rng.standard_normal((24, 512)).astype(np.float32)
    qw = (np.abs(rng.standard_normal(512)) + 0.01).astype(np.float32)
    a = native_quantize(x, ggml_type, qw=qw)
    b = np.asarray(_IMAT_QUANT[ggml_type](x, qw))
    assert np.array_equal(a.reshape(-1), b.reshape(-1))
    # and the public imatrix entry point routes through the native path
    c = quantize_with_imatrix(x, ggml_type, qw)
    assert np.array_equal(np.asarray(c).reshape(-1), b.reshape(-1))


@pytest.mark.parametrize("ggml_type", IMAT_TYPES, ids=lambda t: t.name)
def test_native_imatrix_sparse_extreme(ggml_type):
    """Dead/sparse/huge blocks through the weighted native encoders."""
    from ggml_tpu.quant.imatrix import _IMAT_QUANT

    if native_quantize(np.zeros((1, 256), np.float32), ggml_type,
                       qw=np.ones(256, np.float32)) is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(13)
    qw = (np.abs(rng.standard_normal(512)) + 0.01).astype(np.float32)
    rows = np.concatenate([
        np.zeros((1, 512), np.float32),
        np.where(rng.random((4, 512)) < 0.9, 0.0,
                 rng.standard_normal((4, 512))).astype(np.float32),
        (rng.standard_normal((2, 512)) * 1e6).astype(np.float32),
        np.linspace(-2, 2, 512, dtype=np.float32)[None, :],
    ])
    a = native_quantize(rows, ggml_type, qw=qw)
    b = np.asarray(_IMAT_QUANT[ggml_type](rows, qw))
    assert np.array_equal(a.reshape(-1), b.reshape(-1))


def test_fast_quantize_fallback():
    """Types without a native kernel fall back to the spec transparently."""
    x = np.random.default_rng(0).standard_normal((4, 512)).astype(np.float32)
    out = fast_quantize(x, GGMLType.Q4_0)
    assert np.array_equal(np.asarray(out).reshape(-1),
                          np.asarray(R.quantize(x, GGMLType.Q4_0)).reshape(-1))


@pytest.mark.parametrize("ggml_type", TYPES, ids=lambda t: t.name)
def test_native_sparse_and_extreme(ggml_type):
    """90%-sparse rows (zero-heavy groups stress the dead/min branches) and
    1e8-magnitude rows (fp16 scale saturation) — both must stay
    byte-identical to the spec."""
    if native_quantize(np.zeros((1, 256), np.float32), ggml_type) is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    sparse = np.where(rng.random((8, 512)) < 0.9, 0.0,
                      rng.standard_normal((8, 512))).astype(np.float32)
    big = (rng.standard_normal((4, 512)) * 1e8).astype(np.float32)
    tiny = (rng.standard_normal((4, 512)) * 1e-18).astype(np.float32)
    x = np.concatenate([sparse, big, tiny])
    a = native_quantize(x, ggml_type)
    b = np.asarray(R.quantize(x, ggml_type))
    assert np.array_equal(a.reshape(-1), b.reshape(-1))
