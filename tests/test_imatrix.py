"""Imatrix-weighted quantization: bit-exact vs reference golden vectors
(reference: quantize_<T>(.., quant_weights) in src/ggml-quants.c; goldens from
tools/gen_golden.c use_imatrix=1)."""

import numpy as np
import pytest

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.quant.imatrix import quantize_with_imatrix, supported_imatrix_types
from tests.golden_io import golden_exists, load_golden

CASES = [
    ("q4_0_imat", GGMLType.Q4_0),
    ("q4_1_imat", GGMLType.Q4_1),
    ("q5_0_imat", GGMLType.Q5_0),
    ("q5_1_imat", GGMLType.Q5_1),
    ("q2_k_imat", GGMLType.Q2_K),
    ("q3_k_imat", GGMLType.Q3_K),
    ("q4_k_imat", GGMLType.Q4_K),
    ("q5_k_imat", GGMLType.Q5_K),
    ("q6_k_imat", GGMLType.Q6_K),
]


@pytest.mark.parametrize("name,t", CASES, ids=[c[0] for c in CASES])
def test_imatrix_quantize_bit_exact(name, t):
    if not golden_exists(name):
        pytest.skip("golden not generated")
    g = load_golden(name, with_imatrix=True)
    x = g["src"].reshape(g["nrow"], g["n_per_row"])
    got = quantize_with_imatrix(x, t, g["imatrix"]).reshape(-1)
    want = g["qbytes"]
    assert got.nbytes == want.nbytes
    mismatch = np.nonzero(got != want)[0]
    assert mismatch.size == 0, f"{name}: {mismatch.size} byte mismatches, first at {mismatch[:5]}"


def test_supported_types_reported():
    assert GGMLType.Q4_K in supported_imatrix_types()


def test_quantize_gguf_with_imatrix(tmp_path):
    """End-to-end: imatrix-weighted GGUF requantization round-trips and the
    weighted tensors dequantize to lower weighted error than unweighted."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    from tools.quantize_gguf import quantize_gguf

    from ggml_tpu.gguf import GGUFFile, GGUFWriter
    from ggml_tpu.quant import reference as R

    rng = np.random.default_rng(3)
    wmat = (rng.standard_normal((64, 512)) * 0.3).astype(np.float32)
    src = tmp_path / "src.gguf"
    w = GGUFWriter()
    w.add_string("general.architecture", "test")
    w.add_tensor("blk.0.ffn_up.weight", wmat, GGMLType.F32)
    w.write(src)

    qw = (0.5 + rng.random(512)).astype(np.float32)
    dst = tmp_path / "q.gguf"
    quantize_gguf(src, dst, GGMLType.Q4_K, verbose=False,
                  imatrix={"blk.0.ffn_up.weight": qw})
    g = GGUFFile(dst)
    info = g.tensors["blk.0.ffn_up.weight"]
    assert info.ggml_type == GGMLType.Q4_K
    deq = g.to_float32("blk.0.ffn_up.weight")

    plain = R.dequantize(R.quantize(wmat, GGMLType.Q4_K), GGMLType.Q4_K, wmat.size).reshape(wmat.shape)
    werr_im = (qw[None, :] * (deq - wmat) ** 2).sum()
    werr_pl = (qw[None, :] * (plain - wmat) ** 2).sum()
    assert werr_im <= werr_pl * 1.02, (werr_im, werr_pl)  # weighted err no worse


IQ4_CASES = [
    ("iq4_nl", GGMLType.IQ4_NL, False),
    ("iq4_xs", GGMLType.IQ4_XS, False),
    ("iq4_nl_imat", GGMLType.IQ4_NL, True),
    ("iq4_xs_imat", GGMLType.IQ4_XS, True),
]


@pytest.mark.parametrize("name,t,weighted", IQ4_CASES, ids=[c[0] for c in IQ4_CASES])
def test_iq4_quantize_bit_exact(name, t, weighted):
    from ggml_tpu.quant.imatrix import quant_iq4_nl, quant_iq4_xs

    if not golden_exists(name):
        pytest.skip("golden not generated")
    g = load_golden(name, with_imatrix=weighted)
    x = g["src"].reshape(g["nrow"], g["n_per_row"])
    qw = g.get("imatrix") if weighted else None
    fn = quant_iq4_nl if t == GGMLType.IQ4_NL else quant_iq4_xs
    got = fn(x, qw).reshape(-1)
    want = g["qbytes"]
    assert got.nbytes == want.nbytes
    mismatch = np.nonzero(got != want)[0]
    assert mismatch.size == 0, f"{name}: {mismatch.size} mismatches, first {mismatch[:5]}"
