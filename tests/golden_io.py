"""Reader for golden vectors produced by tools/gen_golden.c, plus the matching
deterministic input generator (xorshift32) for cross-checking."""

import os
import pathlib

import numpy as np

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"


def xorshift32_fill(n, seed):
    out = np.empty(n, dtype=np.float32)
    x = np.uint32(seed)
    vals = np.empty(n, dtype=np.uint32)
    for i in range(n):
        x ^= np.uint32((int(x) << 13) & 0xFFFFFFFF)
        x ^= x >> np.uint32(17)
        x ^= np.uint32((int(x) << 5) & 0xFFFFFFFF)
        vals[i] = x
    u = (vals >> 8).astype(np.float32) / np.float32(16777216.0)
    out = (u - np.float32(0.5)) * np.float32(8.0)
    return out


def load_golden(name, with_imatrix=False):
    """Returns dict with src (f32), qbytes (u8), deq (f32), nrow, n_per_row."""
    path = GOLDEN_DIR / f"{name}.bin"
    raw = path.read_bytes()
    hdr = np.frombuffer(raw, dtype=np.int64, count=4)
    n, qsize, nrow, n_per_row = (int(v) for v in hdr)
    off = 32
    src = np.frombuffer(raw, dtype=np.float32, count=n, offset=off)
    off += 4 * n
    qbytes = np.frombuffer(raw, dtype=np.uint8, count=qsize, offset=off)
    off += qsize
    deq = np.frombuffer(raw, dtype=np.float32, count=n, offset=off)
    off += 4 * n
    res = dict(src=src, qbytes=qbytes, deq=deq, n=n, nrow=nrow, n_per_row=n_per_row)
    if with_imatrix:
        res["imatrix"] = np.frombuffer(raw, dtype=np.float32, count=n_per_row, offset=off)
    return res


def golden_exists(name):
    return (GOLDEN_DIR / f"{name}.bin").exists()
