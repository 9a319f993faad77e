"""GGUF v3 reader/writer (reference: src/gguf.cpp, spec docs/gguf.md,
API include/gguf.h).

Reader mmaps the file and exposes tensors as zero-copy numpy views over the
aligned data blob; `to_float32()` dequantizes via ggml_tpu.quant.reference.
Writer produces spec-conformant files (validated against the reference parser
in tests via a round-trip through files the C library wrote / can read).

Tensor shape convention: GGUF stores dims as ne[0..n) with ne[0] the
fastest-moving (contiguous) dimension — the REVERSE of numpy's C-order shape.
We expose `shape_ne` (ggml order) and `shape` (numpy order = reversed ne).
"""

from __future__ import annotations

import enum
import io
import mmap
import os
import re
import struct
from dataclasses import dataclass, field

import numpy as np

from .dtypes import GGMLType, get_type_traits, row_size
from .quant import reference as qref

GGUF_MAGIC = b"GGUF"
GGUF_VERSION = 3
GGUF_DEFAULT_ALIGNMENT = 32  # reference: include/gguf.h:46


class GGUFValueType(enum.IntEnum):
    """reference: enum gguf_type, include/gguf.h:53-68."""

    UINT8 = 0
    INT8 = 1
    UINT16 = 2
    INT16 = 3
    UINT32 = 4
    INT32 = 5
    FLOAT32 = 6
    BOOL = 7
    STRING = 8
    ARRAY = 9
    UINT64 = 10
    INT64 = 11
    FLOAT64 = 12


_SCALAR_FMT = {
    GGUFValueType.UINT8: ("<B", 1),
    GGUFValueType.INT8: ("<b", 1),
    GGUFValueType.UINT16: ("<H", 2),
    GGUFValueType.INT16: ("<h", 2),
    GGUFValueType.UINT32: ("<I", 4),
    GGUFValueType.INT32: ("<i", 4),
    GGUFValueType.FLOAT32: ("<f", 4),
    GGUFValueType.BOOL: ("<?", 1),
    GGUFValueType.UINT64: ("<Q", 8),
    GGUFValueType.INT64: ("<q", 8),
    GGUFValueType.FLOAT64: ("<d", 8),
}


@dataclass
class GGUFTensorInfo:
    name: str
    shape_ne: tuple[int, ...]  # ggml order: ne[0] contiguous
    ggml_type: GGMLType
    offset: int  # relative to data blob start

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(reversed(self.shape_ne))

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.shape_ne:
            n *= d
        return n

    @property
    def n_bytes(self) -> int:
        return row_size(self.ggml_type, self.shape_ne[0]) * (self.n_elements // max(self.shape_ne[0], 1))


class _Reader:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def read(self, n):
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise EOFError("truncated GGUF file")
        self.pos += n
        return out

    def scalar(self, fmt, size):
        return struct.unpack(fmt, self.read(size))[0]

    def u32(self):
        return self.scalar("<I", 4)

    def u64(self):
        return self.scalar("<Q", 8)

    def string(self):
        n = self.u64()
        return bytes(self.read(n)).decode("utf-8")

    def value(self, vt: GGUFValueType):
        if vt == GGUFValueType.STRING:
            return self.string()
        if vt == GGUFValueType.ARRAY:
            et = GGUFValueType(self.u32())
            n = self.u64()
            if et == GGUFValueType.STRING:
                return [self.string() for _ in range(n)]
            if et == GGUFValueType.ARRAY:
                raise ValueError("nested arrays are not allowed in GGUF")
            fmt, sz = _SCALAR_FMT[et]
            raw = self.read(n * sz)
            return np.frombuffer(raw, dtype=np.dtype(fmt)).copy()
        fmt, sz = _SCALAR_FMT[vt]
        return self.scalar(fmt, sz)


class GGUFFile:
    """Parsed GGUF file with lazy, zero-copy tensor access."""

    def __init__(self, path: str | os.PathLike):
        self.path = os.fspath(path)
        self._f = open(self.path, "rb")
        try:
            self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        except ValueError:  # empty file
            raise ValueError(f"not a GGUF file: {self.path}")
        r = _Reader(memoryview(self._mm))
        if r.read(4) != GGUF_MAGIC:
            raise ValueError(f"bad GGUF magic in {self.path}")
        self.version = r.u32()
        if self.version not in (2, 3):
            raise ValueError(f"unsupported GGUF version {self.version}")
        n_tensors = r.u64()
        n_kv = r.u64()
        self.metadata: dict[str, object] = {}
        for _ in range(n_kv):
            key = r.string()
            vt = GGUFValueType(r.u32())
            self.metadata[key] = r.value(vt)
        self.tensors: dict[str, GGUFTensorInfo] = {}
        for _ in range(n_tensors):
            name = r.string()
            n_dims = r.u32()
            if n_dims > 4:
                raise ValueError(f"tensor {name}: n_dims {n_dims} > 4")
            ne = tuple(r.u64() for _ in range(n_dims))
            ttype = GGMLType(r.u32())
            offset = r.u64()
            info = GGUFTensorInfo(name, ne, ttype, offset)
            if name in self.tensors:
                raise ValueError(f"duplicate tensor name {name}")
            self.tensors[name] = info
        self.alignment = int(self.metadata.get("general.alignment", GGUF_DEFAULT_ALIGNMENT))
        pos = r.pos
        self.data_offset = (pos + self.alignment - 1) // self.alignment * self.alignment
        # validate offsets/sizes
        for t in self.tensors.values():
            if t.offset % self.alignment != 0:
                raise ValueError(f"tensor {t.name}: misaligned offset {t.offset}")
            if self.data_offset + t.offset + t.n_bytes > len(self._mm):
                raise ValueError(f"tensor {t.name} extends past end of file")

        # multi-shard models (llama.cpp gguf-split convention): opening the
        # FIRST shard transparently merges the siblings' tensor tables, so
        # every consumer (load_params, converters, tools) sees one file.
        # Shard names: <prefix>-00001-of-0000N.gguf; keys split.no/count.
        self._shards: dict[str, "GGUFFile"] = {}
        self._shard_files: list["GGUFFile"] = []
        n_split = int(self.metadata.get("split.count", 0) or 0)
        if n_split > 1 and int(self.metadata.get("split.no", 0)) == 0:
            m = re.match(r"^(.*)-(\d{5})-of-(\d{5})\.gguf$", self.path)
            if m is None:
                raise ValueError(
                    f"{self.path}: split.count={n_split} but the filename does "
                    "not follow <prefix>-00001-of-0000N.gguf")
            prefix, _, total = m.groups()
            for i in range(1, n_split):
                sib_path = f"{prefix}-{i + 1:05d}-of-{total}.gguf"
                sib = GGUFFile(sib_path)
                if int(sib.metadata.get("split.no", -1)) != i:
                    raise ValueError(f"{sib_path}: unexpected split.no")
                self._shard_files.append(sib)
                for name, info in sib.tensors.items():
                    if name in self.tensors:
                        raise ValueError(f"duplicate tensor {name} in {sib_path}")
                    self.tensors[name] = info
                    self._shards[name] = sib

    def close(self):
        for sib in self._shard_files:
            sib.close()
        self._mm.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def tensor_bytes(self, name: str) -> np.ndarray:
        """Raw packed bytes as a zero-copy uint8 view."""
        if name in self._shards:
            return self._shards[name].tensor_bytes(name)
        t = self.tensors[name]
        start = self.data_offset + t.offset
        return np.frombuffer(self._mm, dtype=np.uint8, count=t.n_bytes, offset=start)

    def tensor_data(self, name: str) -> np.ndarray:
        """Zero-copy typed view for scalar dtypes; raw bytes for quantized."""
        t = self.tensors[name]
        raw = self.tensor_bytes(name)
        tr = get_type_traits(t.ggml_type)
        if tr.np_dtype is not None:
            return raw.view(tr.np_dtype).reshape(t.shape)
        return raw

    def to_float32(self, name: str) -> np.ndarray:
        """Dequantize to float32 in numpy (C-order) shape."""
        t = self.tensors[name]
        return qref.dequantize(self.tensor_bytes(name), t.ggml_type, t.n_elements).reshape(t.shape)


class GGUFWriter:
    """Single-pass GGUF v3 writer (reference: gguf_write_to_file, src/gguf.cpp:1303)."""

    def __init__(self, alignment: int = GGUF_DEFAULT_ALIGNMENT):
        self.alignment = alignment
        self.kv: dict[str, tuple[GGUFValueType, object]] = {}
        self._tensors: list[tuple[str, tuple[int, ...], GGMLType, bytes]] = []
        if alignment != GGUF_DEFAULT_ALIGNMENT:
            self.add_u32("general.alignment", alignment)

    # -- metadata -----------------------------------------------------------
    def add_value(self, key, vt: GGUFValueType, val):
        self.kv[key] = (vt, val)

    def add_u32(self, key, val):
        self.add_value(key, GGUFValueType.UINT32, int(val))

    def add_i32(self, key, val):
        self.add_value(key, GGUFValueType.INT32, int(val))

    def add_u64(self, key, val):
        self.add_value(key, GGUFValueType.UINT64, int(val))

    def add_f32(self, key, val):
        self.add_value(key, GGUFValueType.FLOAT32, float(val))

    def add_bool(self, key, val):
        self.add_value(key, GGUFValueType.BOOL, bool(val))

    def add_string(self, key, val):
        self.add_value(key, GGUFValueType.STRING, str(val))

    def add_array(self, key, vals, elem_type: GGUFValueType | None = None):
        if elem_type is None:
            if len(vals) and isinstance(vals[0], str):
                elem_type = GGUFValueType.STRING
            elif len(vals) and isinstance(vals[0], float):
                elem_type = GGUFValueType.FLOAT32
            else:
                elem_type = GGUFValueType.INT32
        self.add_value(key, GGUFValueType.ARRAY, (elem_type, list(vals)))

    # -- tensors ------------------------------------------------------------
    def add_tensor(
        self,
        name: str,
        data: np.ndarray,
        ggml_type: GGMLType | None = None,
        raw_shape_ne: tuple[int, ...] | None = None,
    ):
        """data: numpy array (C-order). If ggml_type is a quantized type and data
        is float32, it is quantized here. raw_shape_ne overrides the stored ne
        (needed when passing pre-quantized bytes)."""
        if ggml_type is None:
            ggml_type = {
                np.dtype(np.float32): GGMLType.F32,
                np.dtype(np.float16): GGMLType.F16,
                np.dtype(np.int8): GGMLType.I8,
                np.dtype(np.int16): GGMLType.I16,
                np.dtype(np.int32): GGMLType.I32,
                np.dtype(np.int64): GGMLType.I64,
                np.dtype(np.float64): GGMLType.F64,
            }[np.dtype(data.dtype)]
        ggml_type = GGMLType(ggml_type)
        if raw_shape_ne is not None:
            ne = tuple(int(d) for d in raw_shape_ne)
            blob = np.ascontiguousarray(data).tobytes()
        elif data.dtype == np.uint8:
            raise ValueError("raw byte tensors need raw_shape_ne")
        else:
            ne = tuple(reversed(data.shape)) if data.ndim else (1,)
            if get_type_traits(ggml_type).is_quantized or ggml_type in (GGMLType.F16, GGMLType.BF16, GGMLType.F32):
                from .native import fast_quantize

                blob = fast_quantize(np.ascontiguousarray(data, dtype=np.float32), ggml_type).tobytes()
            else:
                blob = np.ascontiguousarray(data).tobytes()
        self._tensors.append((name, ne, ggml_type, blob))

    # -- serialization ------------------------------------------------------
    def _write_str(self, out, s: str):
        b = s.encode("utf-8")
        out.write(struct.pack("<Q", len(b)))
        out.write(b)

    def _write_value(self, out, vt: GGUFValueType, val):
        if vt == GGUFValueType.STRING:
            self._write_str(out, val)
        elif vt == GGUFValueType.ARRAY:
            et, vals = val
            out.write(struct.pack("<I", int(et)))
            out.write(struct.pack("<Q", len(vals)))
            if et == GGUFValueType.STRING:
                for v in vals:
                    self._write_str(out, v)
            else:
                fmt, _ = _SCALAR_FMT[et]
                for v in vals:
                    out.write(struct.pack(fmt, v))
        else:
            fmt, _ = _SCALAR_FMT[vt]
            out.write(struct.pack(fmt, val))

    # -- meta-only tensor declaration (streaming write) ----------------------
    def add_tensor_info(self, name: str, ne: tuple[int, ...], ggml_type: GGMLType):
        """Declare a tensor WITHOUT its data — the meta-only write mode
        (reference: gguf_write_to_file(..., only_meta=true), include/
        gguf.h:164-192, src/gguf.cpp:1303).  The data blob is streamed later
        through the GGUFAppender returned by write_meta(), so a file larger
        than RAM can be produced tensor-at-a-time."""
        ggml_type = GGMLType(ggml_type)
        ne = tuple(int(d) for d in ne)
        self._tensors.append((name, ne, ggml_type, None))

    def _tensor_nbytes(self, ne, ttype) -> int:
        n_elems = 1
        for d in ne:
            n_elems *= d
        tt = get_type_traits(ttype)
        assert n_elems % tt.block_size == 0
        return n_elems // tt.block_size * tt.type_size

    def _serialize_meta(self) -> tuple[bytes, list[int]]:
        out = io.BytesIO()
        out.write(GGUF_MAGIC)
        out.write(struct.pack("<IQQ", GGUF_VERSION, len(self._tensors), len(self.kv)))
        for key, (vt, val) in self.kv.items():
            self._write_str(out, key)
            out.write(struct.pack("<I", int(vt)))
            self._write_value(out, vt, val)
        offset = 0
        offsets = []
        for name, ne, ttype, blob in self._tensors:
            self._write_str(out, name)
            out.write(struct.pack("<I", len(ne)))
            for d in ne:
                out.write(struct.pack("<Q", d))
            out.write(struct.pack("<I", int(ttype)))
            out.write(struct.pack("<Q", offset))
            offsets.append(offset)
            sz = len(blob) if blob is not None else self._tensor_nbytes(ne, ttype)
            offset += (sz + self.alignment - 1) // self.alignment * self.alignment
        return out.getvalue(), offsets

    def write(self, path: str | os.PathLike):
        """Single-pass write: every declared tensor must carry its blob."""
        assert all(blob is not None for *_, blob in self._tensors), (
            "meta-only tensors present: use write_meta() + GGUFAppender"
        )
        appender = self.write_meta(path)
        for name, _, _, blob in self._tensors:
            appender.append(name, blob)
        appender.close()

    def write_meta(self, path: str | os.PathLike) -> "GGUFAppender":
        """Write header + KV + tensor-info table (+ alignment pad) and return
        an appender that streams tensor data in DECLARED ORDER — the
        reference's meta-only + append write modes (include/gguf.h:164-192)
        in one object, bounding writer memory to one tensor."""
        meta, offsets = self._serialize_meta()
        f = open(path, "wb")
        f.write(meta)
        f.write(b"\x00" * ((-len(meta)) % self.alignment))
        return GGUFAppender(f, self._tensors, offsets, self.alignment)


class GGUFAppender:
    """Streams tensor blobs into a file opened by GGUFWriter.write_meta().
    Tensors must arrive in declaration order; each is validated against the
    declared type/shape byte size and padded to the file alignment."""

    def __init__(self, f, tensors, offsets, alignment):
        self._f = f
        self._tensors = tensors
        self._offsets = offsets
        self._alignment = alignment
        self._base = f.tell()
        self._next = 0

    def append(self, name: str, blob: bytes | np.ndarray):
        if self._next >= len(self._tensors):
            raise ValueError(f"all {len(self._tensors)} tensors already written")
        want_name, ne, ttype, _ = self._tensors[self._next]
        if name != want_name:
            raise ValueError(
                f"tensor #{self._next}: expected {want_name!r} (declared order), got {name!r}"
            )
        if isinstance(blob, np.ndarray):
            blob = np.ascontiguousarray(blob).tobytes()
        n_elems = 1
        for d in ne:
            n_elems *= d
        tt = get_type_traits(ttype)
        want = n_elems // tt.block_size * tt.type_size
        if len(blob) != want:
            raise ValueError(
                f"{name}: blob is {len(blob)} bytes, {ttype.name} {ne} needs {want}"
            )
        self._f.seek(self._base + self._offsets[self._next])
        self._f.write(blob)
        self._f.write(b"\x00" * ((-len(blob)) % self._alignment))
        self._next += 1

    def close(self):
        if self._next != len(self._tensors):
            raise ValueError(
                f"only {self._next} of {len(self._tensors)} declared tensors were appended"
            )
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, et, ev, tb):
        if et is None:
            self.close()
        else:  # error path: close the handle, leave the partial file
            self._f.close()
        return False
