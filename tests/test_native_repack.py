"""Native C++ repack vs the NumPy reference repack — bit-identical planes.
(The reference validates its native repack paths the same way: reference
quantizer vs SIMD quantizer, tests/test-quantize-fns.cpp.)"""

import numpy as np
import pytest

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.native import get_lib, native_repack
from ggml_tpu.quant import reference as R
from ggml_tpu.quant.planar import repack

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no native toolchain")

RNG = np.random.default_rng(17)

NATIVE_TYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0,
                GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K]


@pytest.mark.parametrize("ggml_type", NATIVE_TYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("force_q8", [False, True])
def test_native_matches_numpy(ggml_type, force_q8, monkeypatch):
    n, k = 48, 512  # n deliberately not a multiple of the 128 pad
    w = (RNG.standard_normal((n, k)) * 0.5).astype(np.float32)
    raw = R.quantize(w, ggml_type)

    # the native repacker emits multiplied-out fp32 planes; compact K-quant
    # layouts take the numpy path by design (quant.planar.repack routing)
    monkeypatch.setenv("GGML_TPU_COMPACT_SCALES", "0")
    ref = repack(raw, ggml_type, (n, k), force_q8=force_q8, backend="numpy")
    nat = native_repack(raw, ggml_type, (n, k), force_q8=force_q8)
    assert nat is not None

    assert nat.kind == ref.kind and nat.group == ref.group
    np.testing.assert_array_equal(np.asarray(nat.codes), np.asarray(ref.codes))
    np.testing.assert_allclose(np.asarray(nat.scales), np.asarray(ref.scales), rtol=1e-6, atol=1e-8)
    if ref.offsets is None:
        assert nat.offsets is None
    else:
        np.testing.assert_allclose(np.asarray(nat.offsets), np.asarray(ref.offsets), rtol=1e-6, atol=1e-8)
