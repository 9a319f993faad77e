"""Grid-codebook i-quant encoders: bit-exact vs reference golden vectors.

Reference: quantize_row_iq2_xxs/xs/s_impl, iq3_xxs/s_impl, iq1_s/m_impl in
src/ggml-quants.c (goldens from tools/gen_golden.c via ggml_quantize_chunk).
"""

import numpy as np
import pytest

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.quant import iquant_encode as E
from ggml_tpu.quant import reference as R
from ggml_tpu.quant.imatrix import quantize_with_imatrix, requires_imatrix
from tests.golden_io import golden_exists, load_golden

# (golden name, quantizer, ggml type, use imatrix)
CASES = [
    ("iq2_xxs", E.quant_iq2_xxs, GGMLType.IQ2_XXS, True),
    ("iq2_xs", E.quant_iq2_xs, GGMLType.IQ2_XS, True),
    ("iq2_s", E.quant_iq2_s, GGMLType.IQ2_S, True),
    ("iq2_s_noimat", E.quant_iq2_s, GGMLType.IQ2_S, False),
    ("iq3_xxs", E.quant_iq3_xxs, GGMLType.IQ3_XXS, False),
    ("iq3_xxs_imat", E.quant_iq3_xxs, GGMLType.IQ3_XXS, True),
    ("iq3_s", E.quant_iq3_s, GGMLType.IQ3_S, False),
    ("iq3_s_imat", E.quant_iq3_s, GGMLType.IQ3_S, True),
    ("iq1_s", E.quant_iq1_s, GGMLType.IQ1_S, True),
    ("iq1_m", E.quant_iq1_m, GGMLType.IQ1_M, True),
    ("iq1_m_noimat", E.quant_iq1_m, GGMLType.IQ1_M, False),
]


@pytest.mark.parametrize("name,fn,t,use_imat", CASES, ids=[c[0] for c in CASES])
def test_encoder_bit_exact(name, fn, t, use_imat):
    if not golden_exists(name):
        pytest.skip("golden not generated")
    g = load_golden(name, with_imatrix=use_imat)
    x = g["src"].reshape(g["nrow"], g["n_per_row"])
    qw = g["imatrix"] if use_imat else None
    got = fn(x, qw).reshape(-1)
    want = g["qbytes"]
    assert got.nbytes == want.nbytes
    mismatch = np.nonzero(got != want)[0]
    assert mismatch.size == 0, f"{name}: {mismatch.size} byte mismatches at {mismatch[:5]}"


@pytest.mark.parametrize(
    "name,fn,t,use_imat",
    [c for c in CASES if c[3]],
    ids=[c[0] for c in CASES if c[3]],
)
def test_imatrix_dispatch(name, fn, t, use_imat):
    """quantize_with_imatrix routes to the same encoders."""
    if not golden_exists(name):
        pytest.skip("golden not generated")
    g = load_golden(name, with_imatrix=True)
    x = g["src"].reshape(g["nrow"], g["n_per_row"])
    got = quantize_with_imatrix(x, t, g["imatrix"]).reshape(-1)
    assert (got == g["qbytes"]).all()


def test_unweighted_quantize_dispatch():
    """reference.quantize handles the optional-imatrix grid quants and the
    encode->decode round trip reproduces the reference dequantisation."""
    for name, t in [
        ("iq2_s_noimat", GGMLType.IQ2_S),
        ("iq3_xxs", GGMLType.IQ3_XXS),
        ("iq3_s", GGMLType.IQ3_S),
        ("iq1_m_noimat", GGMLType.IQ1_M),
    ]:
        if not golden_exists(name):
            continue
        g = load_golden(name)
        q = R.quantize(g["src"], t)
        assert (q == g["qbytes"]).all()
        deq = R.dequantize(q, t, g["src"].size)
        np.testing.assert_array_equal(deq, g["deq"], err_msg=name)


def test_requires_imatrix():
    """reference: ggml_quantize_requires_imatrix (include/ggml.h:2119)."""
    for t in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ1_S):
        assert requires_imatrix(t)
        with pytest.raises(ValueError):
            R.quantize(np.zeros(256, np.float32), t)
    for t in (GGMLType.IQ2_S, GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_M,
              GGMLType.Q4_K):
        assert not requires_imatrix(t)


def test_all_zero_input_safe():
    """Dead sub-blocks (the reference's GROUP_MAX_EPS continue paths) must not
    crash and must produce d == 0 superblocks."""
    x = np.zeros((1, 256), np.float32)
    qw = np.ones(256, np.float32)
    for fn, use_qw in [
        (E.quant_iq2_xxs, True), (E.quant_iq2_xs, True), (E.quant_iq2_s, False),
        (E.quant_iq3_xxs, False), (E.quant_iq3_s, False),
        (E.quant_iq1_s, True), (E.quant_iq1_m, False),
    ]:
        out = fn(x, qw if use_qw else None)
        assert np.count_nonzero(out) == 0, fn.__name__
