"""Quantization conformance tests vs golden vectors from the reference library.

Mirrors the reference's test strategy (tests/test-quantize-fns.cpp): round-trip
error thresholds, plus — stronger than the reference — bit-exact comparison of
both dequantized floats and quantized bytes against the actual C implementation
output (tools/gen_golden.c fixtures).
"""

import numpy as np
import pytest

from ggml_tpu.dtypes import GGMLType, get_type_traits, row_size
from ggml_tpu.quant import reference as qref
from tests.golden_io import load_golden

DEQUANT_TYPES = [
    ("q4_0", GGMLType.Q4_0),
    ("q4_1", GGMLType.Q4_1),
    ("q5_0", GGMLType.Q5_0),
    ("q5_1", GGMLType.Q5_1),
    ("q8_0", GGMLType.Q8_0),
    ("q2_k", GGMLType.Q2_K),
    ("q3_k", GGMLType.Q3_K),
    ("q4_k", GGMLType.Q4_K),
    ("q5_k", GGMLType.Q5_K),
    ("q6_k", GGMLType.Q6_K),
    ("tq1_0", GGMLType.TQ1_0),
    ("tq2_0", GGMLType.TQ2_0),
    ("iq4_nl", GGMLType.IQ4_NL),
    ("iq4_xs", GGMLType.IQ4_XS),
    ("iq3_xxs", GGMLType.IQ3_XXS),
    ("iq3_s", GGMLType.IQ3_S),
    ("iq2_xxs", GGMLType.IQ2_XXS),
    ("iq2_xs", GGMLType.IQ2_XS),
    ("iq2_s", GGMLType.IQ2_S),
    ("iq1_s", GGMLType.IQ1_S),
    ("iq1_m", GGMLType.IQ1_M),
]

QUANT_TYPES = [
    ("q4_0", GGMLType.Q4_0),
    ("q4_1", GGMLType.Q4_1),
    ("q5_0", GGMLType.Q5_0),
    ("q5_1", GGMLType.Q5_1),
    ("q8_0", GGMLType.Q8_0),
    ("q2_k", GGMLType.Q2_K),
    ("q3_k", GGMLType.Q3_K),
    ("q4_k", GGMLType.Q4_K),
    ("q5_k", GGMLType.Q5_K),
    ("q6_k", GGMLType.Q6_K),
    ("tq1_0", GGMLType.TQ1_0),
    ("tq2_0", GGMLType.TQ2_0),
]


@pytest.mark.parametrize("name,gt", DEQUANT_TYPES)
def test_dequantize_bit_exact(name, gt):
    """Our dequantizer must reproduce the reference's to_float output exactly."""
    g = load_golden(name)
    out = qref.dequantize(g["qbytes"], gt, g["n"])
    np.testing.assert_array_equal(out, g["deq"], err_msg=f"dequant mismatch for {name}")


@pytest.mark.parametrize("name,gt", [("f16", GGMLType.F16), ("bf16", GGMLType.BF16)])
def test_float_casts_bit_exact(name, gt):
    g = load_golden(name)
    out = qref.dequantize(g["qbytes"], gt, g["n"])
    np.testing.assert_array_equal(out, g["deq"])
    q = qref.quantize(g["src"], gt)
    np.testing.assert_array_equal(q, g["qbytes"])


@pytest.mark.parametrize("name,gt", QUANT_TYPES)
def test_quantize_bit_exact(name, gt):
    """Our quantizer must produce byte-identical output to the reference
    (strict-IEEE build) on the same inputs."""
    g = load_golden(name)
    q = qref.quantize(g["src"].reshape(g["nrow"], g["n_per_row"]), gt)
    np.testing.assert_array_equal(q, g["qbytes"], err_msg=f"quant bytes mismatch for {name}")


# Error thresholds from reference tests/test-quantize-fns.cpp:17-25
MAX_QUANTIZATION_TOTAL_ERROR = 0.002
MAX_QUANTIZATION_TOTAL_ERROR_TERNARY = 0.01
MAX_QUANTIZATION_TOTAL_ERROR_2BITS = 0.0075
MAX_QUANTIZATION_TOTAL_ERROR_3BITS = 0.0040


def total_quantization_error(src, deq):
    """sqrt(sum(diff^2))/n (reference: array_rmse, tests/test-quantize-fns.cpp:38-45)."""
    d = (src - deq).astype(np.float64)
    return np.sqrt(d @ d) / len(src)


def synthetic_data(n, offset=0.0):
    """reference: tests/test-quantize-fns.cpp generate_data: 0.1 + 2*cos(i+offset)."""
    i = np.arange(n, dtype=np.float32)
    return (np.float32(0.1) + 2 * np.cos(i + np.float32(offset))).astype(np.float32)


@pytest.mark.parametrize("name,gt", QUANT_TYPES)
def test_round_trip_error_threshold(name, gt):
    src = synthetic_data(4096)
    q = qref.quantize(src.reshape(4, 1024), gt)
    deq = qref.dequantize(q, gt, src.size)
    err = total_quantization_error(src, deq)
    thresh = {
        GGMLType.Q2_K: MAX_QUANTIZATION_TOTAL_ERROR_2BITS,
        GGMLType.Q3_K: MAX_QUANTIZATION_TOTAL_ERROR_3BITS,
        GGMLType.TQ1_0: MAX_QUANTIZATION_TOTAL_ERROR_TERNARY,
        GGMLType.TQ2_0: MAX_QUANTIZATION_TOTAL_ERROR_TERNARY,
    }.get(gt, MAX_QUANTIZATION_TOTAL_ERROR)
    assert err < thresh, f"{name}: rmse {err} > {thresh}"


def test_q8_k_round_trip():
    src = synthetic_data(4096)
    q = qref.quantize(src.reshape(4, 1024), GGMLType.Q8_K)
    deq = qref.dequantize(q, GGMLType.Q8_K, src.size)
    err = total_quantization_error(src, deq)
    assert err < MAX_QUANTIZATION_TOTAL_ERROR


def test_q8_1_round_trip_sums():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 32), dtype=np.float32)
    q = qref.quantize(x, GGMLType.Q8_1).reshape(8, 36)
    d = q[:, 0:2].copy().view("<f2").astype(np.float32).reshape(-1)
    s = q[:, 2:4].copy().view("<f2").astype(np.float32).reshape(-1)
    qs = q[:, 4:36].view(np.int8)
    np.testing.assert_allclose(s, qs.sum(axis=1) * d, rtol=1e-2, atol=1e-2)


def test_row_sizes_match_reference_layouts():
    # static_asserted sizes from reference src/ggml-common.h
    assert row_size(GGMLType.Q4_0, 32) == 18
    assert row_size(GGMLType.Q4_K, 256) == 144
    assert row_size(GGMLType.Q5_K, 256) == 176
    assert row_size(GGMLType.Q6_K, 256) == 210
    assert row_size(GGMLType.Q8_0, 32) == 34
    assert row_size(GGMLType.IQ1_M, 256) == 56
    assert row_size(GGMLType.TQ1_0, 256) == 54


def test_golden_input_generator_matches():
    """Our Python xorshift32 reproduces the C fixture generator's inputs."""
    from tests.golden_io import xorshift32_fill

    g = load_golden("q8_0")
    mine = xorshift32_fill(g["n"], 0xC0FFEE42 + int(GGMLType.Q8_0))
    np.testing.assert_array_equal(mine, g["src"])
