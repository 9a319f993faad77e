"""Streaming GGUF write: meta-only declaration + tensor-at-a-time append
(reference: the 3 write modes of include/gguf.h:164-192 / src/gguf.cpp:1303,
which exist so a larger-than-RAM model can be quantized in bounded memory)."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFFile, GGUFWriter


def _tensors(rng, n=5):
    out = []
    for i in range(n):
        out.append((f"t{i}.weight", (rng.standard_normal((64, 256)) * 0.3).astype(np.float32)))
    return out


def test_streaming_write_matches_single_pass(tmp_path):
    rng = np.random.default_rng(0)
    ts = _tensors(rng)

    w1 = GGUFWriter()
    w1.add_string("general.architecture", "test")
    w1.add_u32("test.block_count", 5)
    for name, data in ts:
        w1.add_tensor(name, data, GGMLType.Q8_0)
    w1.write(tmp_path / "single.gguf")

    from ggml_tpu.quant import reference as R

    w2 = GGUFWriter()
    w2.add_string("general.architecture", "test")
    w2.add_u32("test.block_count", 5)
    for name, data in ts:
        w2.add_tensor_info(name, tuple(reversed(data.shape)), GGMLType.Q8_0)
    with w2.write_meta(tmp_path / "streamed.gguf") as app:
        for name, data in ts:
            app.append(name, R.quantize(data, GGMLType.Q8_0))

    a = (tmp_path / "single.gguf").read_bytes()
    b = (tmp_path / "streamed.gguf").read_bytes()
    assert a == b  # byte-identical files from the two write modes

    g = GGUFFile(tmp_path / "streamed.gguf")
    got = g.to_float32("t3.weight")
    ref = R.dequantize(R.quantize(ts[3][1], GGMLType.Q8_0).reshape(64, -1),
                       GGMLType.Q8_0, 64 * 256).reshape(64, 256)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    g.close()


def test_appender_validates_order_and_size(tmp_path):
    w = GGUFWriter()
    w.add_string("general.architecture", "test")
    w.add_tensor_info("a", (256, 2), GGMLType.F32)
    w.add_tensor_info("b", (256, 2), GGMLType.F32)
    app = w.write_meta(tmp_path / "x.gguf")
    with pytest.raises(ValueError, match="declared order"):
        app.append("b", np.zeros((2, 256), np.float32))
    with pytest.raises(ValueError, match="needs"):
        app.append("a", np.zeros((2, 128), np.float32))
    app.append("a", np.zeros((2, 256), np.float32))
    with pytest.raises(ValueError, match="declared tensors were appended"):
        app.close()


def test_quantize_gguf_bounded_memory(tmp_path):
    """tools/quantize_gguf.py converts a file whose TENSOR DATA alone exceeds
    the address-space limit headroom, proving tensor-at-a-time streaming:
    holding all quantized blobs (the old single-pass write) could not fit."""
    src = tmp_path / "big.gguf"
    dst = tmp_path / "big.q8.gguf"
    n_rows, k, n_tensors = 1024, 4096, 40  # 40 x 16 MB = 640 MB of f32 data
    script = f"""
import resource, sys
import numpy as np
sys.path.insert(0, {str(pathlib.Path(__file__).resolve().parent.parent)!r})
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter

w = GGUFWriter()
w.add_string("general.architecture", "test")
for i in range({n_tensors}):
    w.add_tensor_info(f"blk.{{i}}.ffn.weight", ({k}, {n_rows}), GGMLType.F32)
row = None
with w.write_meta({str(src)!r}) as app:
    for i in range({n_tensors}):
        data = np.full(({n_rows}, {k}), 0.01 * (i + 1), np.float32)
        app.append(f"blk.{{i}}.ffn.weight", data)
        del data

# cap address space at ~2x ONE tensor above the current usage: streaming
# conversion fits, holding every output blob (~160 MB) + inputs would not
used = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
resource.setrlimit(resource.RLIMIT_AS, (used + 420 * 1024 * 1024,) * 2)
from tools.quantize_gguf import quantize_gguf
quantize_gguf({str(src)!r}, {str(dst)!r}, GGMLType.Q8_0, verbose=False)
print("STREAM_OK")
"""
    p = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=600,
                       cwd=str(pathlib.Path(__file__).resolve().parent.parent))
    assert "STREAM_OK" in p.stdout, p.stderr[-2000:]

    g = GGUFFile(dst)
    assert len(g.tensors) == n_tensors
    got = g.to_float32("blk.7.ffn.weight")
    np.testing.assert_allclose(got, np.full((n_rows, k), 0.08, np.float32),
                               rtol=2e-3, atol=1e-4)
    g.close()
