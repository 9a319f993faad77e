"""GGUF reader/writer tests: differential vs the reference library's file
(tests/golden/sample.gguf, written by tools/gguf_roundtrip.c) plus full
round-trip through our writer, re-parsed by both our reader and (when the
reference build is present) the reference parser."""

import json
import shutil
import subprocess

import numpy as np
import pytest

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFFile, GGUFValueType, GGUFWriter
from ggml_tpu.quant import reference as qref
from tests.golden_io import GOLDEN_DIR

SAMPLE = GOLDEN_DIR / "sample.gguf"
REF_TOOL = GOLDEN_DIR.parent.parent / ".ref_build" / "gguf_roundtrip"


def test_read_reference_written_file():
    with GGUFFile(SAMPLE) as g:
        assert g.version == 3
        assert g.alignment == 32
        md = g.metadata
        assert md["test.u32"] == 42
        assert md["test.f32"] == pytest.approx(2.5)
        assert md["test.str"] == "hello gguf"
        assert md["test.bool"] is True
        assert md["test.i64"] == -123456789012345
        np.testing.assert_array_equal(md["test.arr_i32"], [1, -2, 3, -4])
        assert md["test.arr_str"] == ["alpha", "beta"]
        assert set(g.tensors) == {"weight_f32", "weight_q8_0", "weight_q4_k"}
        tf = g.tensors["weight_f32"]
        assert tf.shape_ne == (64, 8) and tf.shape == (8, 64)
        assert tf.ggml_type == GGMLType.F32
        w = g.to_float32("weight_f32")
        np.testing.assert_allclose(w.reshape(-1), 0.01 * np.arange(512, dtype=np.float32) - 2.0, rtol=1e-6)
        # quantized tensors dequantize exactly like the reference would
        q8 = g.tensors["weight_q8_0"]
        assert q8.ggml_type == GGMLType.Q8_0 and q8.n_bytes == 2176
        i = np.arange(2048, dtype=np.float32)
        src = (np.float32(0.1) + 2 * np.cos(i)).astype(np.float32)
        # reference wrote quantize(src); our independent quantize must match its bytes
        np.testing.assert_array_equal(g.tensor_bytes("weight_q8_0"), qref.quantize(src.reshape(4, 512), GGMLType.Q8_0))
        src2 = (np.float32(0.1) + 2 * np.cos(np.arange(2048, dtype=np.float32) * np.float32(0.7))).astype(np.float32)
        np.testing.assert_array_equal(g.tensor_bytes("weight_q4_k"), qref.quantize(src2.reshape(2, 1024), GGMLType.Q4_K))


def test_write_read_roundtrip(tmp_path):
    w = GGUFWriter()
    w.add_u32("general.file_type", 7)
    w.add_string("general.architecture", "gpt2")
    w.add_f32("alpha", -1.25)
    w.add_bool("flag", False)
    w.add_array("layers", [1, 2, 3])
    w.add_array("names", ["a", "bb"])
    rng = np.random.default_rng(7)
    wt = rng.standard_normal((16, 256), dtype=np.float32)
    w.add_tensor("w.f32", wt)
    w.add_tensor("w.q8", wt, GGMLType.Q8_0)
    w.add_tensor("w.q6k", wt, GGMLType.Q6_K)
    w.add_tensor("w.f16", wt, GGMLType.F16)
    path = tmp_path / "rt.gguf"
    w.write(path)
    with GGUFFile(path) as g:
        assert g.metadata["general.file_type"] == 7
        assert g.metadata["alpha"] == pytest.approx(-1.25)
        assert g.metadata["flag"] is False
        np.testing.assert_array_equal(g.metadata["layers"], [1, 2, 3])
        assert g.metadata["names"] == ["a", "bb"]
        np.testing.assert_array_equal(g.to_float32("w.f32"), wt)
        np.testing.assert_array_equal(
            g.tensor_bytes("w.q8"), qref.quantize(wt, GGMLType.Q8_0)
        )
        np.testing.assert_array_equal(g.to_float32("w.f16"), wt.astype(np.float16).astype(np.float32))
        assert g.tensors["w.q6k"].shape == (16, 256)


@pytest.mark.skipif(not REF_TOOL.exists(), reason="reference build not present")
def test_reference_parser_reads_our_file(tmp_path):
    w = GGUFWriter()
    w.add_string("general.architecture", "test")
    w.add_u32("n", 3)
    x = np.linspace(-1, 1, 32 * 64, dtype=np.float32).reshape(64, 32)
    w.add_tensor("t0", x)
    w.add_tensor("t1", x, GGMLType.Q4_0)
    path = tmp_path / "ours.gguf"
    w.write(path)
    out = subprocess.run([str(REF_TOOL), "read", str(path)], capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "version=3" in out.stdout
    assert "tensor t0 type=0" in out.stdout
    assert "tensor t1 type=2" in out.stdout
    assert "n_kv=2" in out.stdout


def test_strict_validation_rejects_corrupt_files(tmp_path):
    """The reader's strict-validation paths (reference: gguf_init_from_file_impl
    rejects bad magic/version/dims/offsets, src/gguf.cpp:319-560)."""
    import struct

    import numpy as np
    import pytest

    from ggml_tpu.gguf import GGUFFile, GGUFWriter

    good = tmp_path / "good.gguf"
    w = GGUFWriter()
    w.add_string("general.architecture", "test")
    w.add_tensor("t", np.arange(8, dtype=np.float32))
    w.write(good)
    blob = bytearray(good.read_bytes())

    def variant(name, mutate):
        b = bytearray(blob)
        mutate(b)
        p = tmp_path / name
        p.write_bytes(bytes(b))
        return p

    bad_magic = variant("magic.gguf", lambda b: b.__setitem__(slice(0, 4), b"XXXX"))
    with pytest.raises(ValueError):
        GGUFFile(bad_magic)

    bad_version = variant("ver.gguf", lambda b: b.__setitem__(slice(4, 8), struct.pack("<I", 99)))
    with pytest.raises(ValueError):
        GGUFFile(bad_version)

    truncated = tmp_path / "trunc.gguf"
    truncated.write_bytes(bytes(blob[: len(blob) // 3]))
    with pytest.raises((EOFError, ValueError)):
        GGUFFile(truncated)

    # tensor data sliced off the end -> extends-past-EOF rejection
    sliced = tmp_path / "sliced.gguf"
    sliced.write_bytes(bytes(blob[:-16]))
    with pytest.raises((EOFError, ValueError)):
        GGUFFile(sliced)


def test_gguf_dump_tool(tmp_path, capsys):
    """tools/gguf_dump.py (the gguf-dump analog) reports KVs + tensor table."""
    from tools.gguf_dump import dump

    w = GGUFWriter()
    w.add_string("general.architecture", "gpt2")
    w.add_array("layers", [1, 2, 3])
    wt = np.ones((8, 256), dtype=np.float32)
    w.add_tensor("w.f32", wt)
    w.add_tensor("w.q8", wt, GGMLType.Q8_0)
    path = tmp_path / "d.gguf"
    w.write(path)

    info = dump(str(path))
    out = capsys.readouterr().out
    assert info["n_tensors"] == 2 and info["n_kv"] == 2
    assert {t["name"] for t in info["tensors"]} == {"w.f32", "w.q8"}
    assert info["metadata"]["general.architecture"] == "gpt2"
    assert "w.q8" in out and "Q8_0" in out and "general.architecture" in out

    info_j = dump(str(path), as_json=True)
    assert json.loads(capsys.readouterr().out)["n_tensors"] == 2
    assert info_j["tensors"][0]["bytes"] > 0
