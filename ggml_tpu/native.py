"""ctypes binding for the native C++ runtime components (csrc/).

The reference's load path is native C++ (src/gguf.cpp + per-backend repack in
src/ggml-cpu/ggml-cpu-aarch64.cpp, amx/amx.cpp); ours mirrors that split:
Python orchestrates, multithreaded C++ does the byte work. Compiled lazily
with g++ on first use and cached under build/; every native path has a NumPy
fallback (quant.planar) so the library works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_PKG = pathlib.Path(__file__).resolve().parent
_SRC = _PKG / "csrc" / "repack.cpp"


def _default_build_dir() -> pathlib.Path:
    """Where compiled .so files land: GGML_TPU_BUILD_DIR, else <repo>/build
    (package-adjacent, the checkout layout), else ~/.cache/ggml_tpu (read-only
    installs)."""
    env = os.environ.get("GGML_TPU_BUILD_DIR")
    if env:
        return pathlib.Path(env)
    repo_build = _PKG.parent / "build"
    try:
        repo_build.mkdir(exist_ok=True)
        probe = repo_build / ".write_probe"
        probe.touch()
        probe.unlink()
        return repo_build
    except OSError:
        return pathlib.Path.home() / ".cache" / "ggml_tpu"


_BUILD = _default_build_dir()
_LIB = _BUILD / "libggml_tpu_repack.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    _BUILD.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (compiling if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        lib.gt_repack_supported.restype = ctypes.c_int
        lib.gt_repack_supported.argtypes = [ctypes.c_int]
        lib.gt_repack.restype = ctypes.c_int
        lib.gt_repack.argtypes = [
            ctypes.c_int,                      # ggml_type
            ctypes.c_void_p,                   # raw
            ctypes.c_int64, ctypes.c_int64,    # n, k
            ctypes.c_int64,                    # npad
            ctypes.c_void_p,                   # codes
            ctypes.c_void_p,                   # scales
            ctypes.c_void_p,                   # offsets (nullable)
            ctypes.c_int,                      # nthreads
            ctypes.c_int,                      # force_q8
        ]
        _lib = lib
        return _lib


def native_supported(ggml_type: int) -> bool:
    lib = get_lib()
    return bool(lib and lib.gt_repack_supported(int(ggml_type)))


def native_repack(raw: np.ndarray, ggml_type, shape, n_pad_to: int = 128, force_q8: bool = False):
    """Multithreaded C++ planar repack. Returns a PlanarWeight or None if the
    type is unsupported natively (caller falls back to quant.planar.repack)."""
    from .quant.planar import _Q4_PLANE_TYPES, PlanarWeight

    lib = get_lib()
    if lib is None or not lib.gt_repack_supported(int(ggml_type)):
        return None
    n, k = shape
    npad = -(-n // n_pad_to) * n_pad_to
    # mirror quant.planar.repack's layout decisions
    group = {2: 32, 3: 32, 6: 32, 7: 32, 8: 32, 10: 16, 11: 16, 12: 32, 13: 32, 14: 16}[int(ggml_type)]
    q4_capable = int(ggml_type) in (2, 3, 10, 11, 12)
    use_q4 = q4_capable and (k // 2) % group == 0 and not force_q8 and int(ggml_type) in {int(t) for t in _Q4_PLANE_TYPES}
    affine = int(ggml_type) in (2, 3, 7, 10, 11, 12, 13)

    raw = np.ascontiguousarray(raw.reshape(-1).view(np.uint8))
    if use_q4:
        codes = np.empty((k // 2, npad), np.uint8)
    else:
        codes = np.empty((k, npad), np.int8)
    scales = np.empty((k // group, npad), np.float32)
    offsets = np.empty((k // group, npad), np.float32) if affine else None

    rc = lib.gt_repack(
        int(ggml_type),
        raw.ctypes.data_as(ctypes.c_void_p),
        n, k, npad,
        codes.ctypes.data_as(ctypes.c_void_p),
        scales.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p) if offsets is not None else None,
        os.cpu_count() or 1,
        0 if use_q4 else 1,
    )
    if rc != 0:
        raise RuntimeError(f"native repack failed rc={rc} for type {ggml_type}")
    if use_q4:
        scales = np.ascontiguousarray(scales.reshape(2, (k // 2) // group, npad))
    from .dtypes import GGMLType

    return PlanarWeight(
        kind="q4" if use_q4 else "q8",
        codes=codes,
        scales=scales,
        offsets=offsets,
        group=group,
        n=n,
        k=k,
        orig_type=GGMLType(int(ggml_type)),
    )


# ---------------------------------------------------------------------------
# Native quantizer (csrc/quantize.cpp): f32 -> ggml blocks, bit-exact with
# quant.reference (tests/test_native_quantize.py).  The NumPy Q4_K quantizer
# runs at ~3 MB/s (OP_PERF.json) — this path threads the per-superblock
# scale/min search over rows.
# ---------------------------------------------------------------------------

_QSRC = _PKG / "csrc" / "quantize.cpp"
_QLIB = _BUILD / "libggml_tpu_quantize.so"
_qlib = None
_qtried = False


def _get_qlib():
    global _qlib, _qtried
    with _lock:
        if _qlib is not None or _qtried:
            return _qlib
        _qtried = True
        if not _QLIB.exists() or _QLIB.stat().st_mtime < _QSRC.stat().st_mtime:
            _BUILD.mkdir(parents=True, exist_ok=True)
            # -march=native unlocks the 8-lane AVX2 group-search kernels;
            # -ffp-contract=off forbids fma contraction (would change fp32
            # rounding vs the spec); -fno-math-errno lets sqrtf/nearbyintf
            # inline to sqrtss/vroundss (identical correctly-rounded results,
            # no errno bookkeeping).  Falls back to the portable build when
            # the host compiler rejects -march=native.
            base = ["g++", "-O3", "-std=c++17", "-ffp-contract=off",
                    "-fno-math-errno", "-shared",
                    "-fPIC", "-pthread", str(_QSRC), "-o", str(_QLIB)]
            try:
                subprocess.run(base[:2] + ["-march=native"] + base[2:],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                try:
                    subprocess.run(base, check=True, capture_output=True,
                                   timeout=120)
                except Exception:
                    return None
        try:
            lib = ctypes.CDLL(str(_QLIB))
        except OSError:
            return None
        lib.gt_quantize_supported.restype = ctypes.c_int
        lib.gt_quantize_supported.argtypes = [ctypes.c_int]
        lib.gt_quantize.restype = ctypes.c_int
        lib.gt_quantize.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.gt_quantize_imatrix_supported.restype = ctypes.c_int
        lib.gt_quantize_imatrix_supported.argtypes = [ctypes.c_int]
        lib.gt_quantize2.restype = ctypes.c_int
        lib.gt_quantize2.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.gt_iq_set_lattice.restype = ctypes.c_int
        lib.gt_iq_set_lattice.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _qlib = lib
        return _qlib


# grid-codebook lattices for the IQ2*/IQ3*/IQ1* native encoders: uploaded
# once per process from the Python lattice objects (grid data stays
# single-sourced in quant/data/iq_grids.npz)
_LAT_SLOT = {"iq2_xxs": 0, "iq2_xs": 1, "iq2_s": 2, "iq3_xxs": 3,
             "iq3_s": 4, "iq1": 5}
_lat_uploaded: set[str] = set()


def _ensure_lattice(name: str) -> bool:
    lib = _get_qlib()
    if lib is None:
        return False
    if name in _lat_uploaded:
        return True
    from .quant import iquant_encode as IE

    lat = getattr(IE, f"_lat_{name}")()
    codes = np.ascontiguousarray(lat.L, np.int8)
    rc = lib.gt_iq_set_lattice(
        _LAT_SLOT[name], codes.ctypes.data_as(ctypes.c_void_p),
        codes.shape[0], lat.dim, lat.shift, lat.nwant, len(lat.kmap),
    )
    if rc == 0:
        _lat_uploaded.add(name)
    return rc == 0


# GGMLType value -> lattice name
_GRID_TYPE_LATTICE = {16: "iq2_xxs", 17: "iq2_xs", 22: "iq2_s",
                      18: "iq3_xxs", 21: "iq3_s", 19: "iq1", 29: "iq1"}


def native_quantize(x: np.ndarray, ggml_type, qw: np.ndarray | None = None
                    ) -> np.ndarray | None:
    """Quantize (nrows, k) f32 to packed blocks via the native path, or None
    when unsupported (callers fall back to quant.reference.quantize).

    qw: optional (k,) f32 imatrix column weights (types reporting
    gt_quantize_imatrix_supported only — currently IQ4_NL/IQ4_XS)."""
    lib = _get_qlib()
    if lib is None:
        return None
    lat_name = _GRID_TYPE_LATTICE.get(int(ggml_type))
    if lat_name is not None and not _ensure_lattice(lat_name):
        return None
    if not lib.gt_quantize_supported(int(ggml_type)):
        return None
    if qw is not None and not lib.gt_quantize_imatrix_supported(int(ggml_type)):
        return None
    from .dtypes import get_type_traits

    x = np.ascontiguousarray(x, np.float32)
    nrows, k = (1, x.size) if x.ndim == 1 else (int(np.prod(x.shape[:-1])), x.shape[-1])
    tt = get_type_traits(ggml_type)
    if k % tt.block_size:
        return None
    if qw is not None:
        qw = np.ascontiguousarray(qw, np.float32).reshape(-1)
        if qw.size != k:
            return None
    out = np.empty((nrows, k // tt.block_size * tt.type_size), np.uint8)
    rc = lib.gt_quantize2(
        int(ggml_type), x.ctypes.data_as(ctypes.c_void_p),
        None if qw is None else qw.ctypes.data_as(ctypes.c_void_p), nrows, k,
        out.ctypes.data_as(ctypes.c_void_p), os.cpu_count() or 1,
    )
    if rc == 4:  # grid type without imatrix/lattice: graceful fallback
        return None
    if rc != 0:
        raise RuntimeError(f"native quantize failed rc={rc} for type {ggml_type}")
    return out


def fast_quantize(x: np.ndarray, ggml_type) -> np.ndarray:
    """Native quantizer when available, NumPy reference otherwise — always
    bit-identical output (the native path reproduces the spec's exact fp32
    operation order)."""
    out = native_quantize(x, ggml_type)
    if out is not None:
        return out
    from .quant import reference as R

    return R.quantize(np.ascontiguousarray(x, np.float32), ggml_type)
