"""Checkpoint / resume: GGUF-backed training state serialization.

The reference stores model weights as GGUF (src/gguf.cpp:1303) and keeps
optimizer momenta as ordinary tensors the caller *could* serialize, but ships
no built-in training checkpoint/resume (SURVEY.md §5). This module closes that
gap: the full Optimizer state (params + m/v momenta + step counters) round-trips
through a single GGUF file, so a training run is restartable and the artifact
stays compatible with every GGUF tool.

Pytree paths are flattened to '/'-joined tensor names; counters ride in KV
metadata.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .gguf import GGUFFile, GGUFWriter


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            assert "/" not in k, f"checkpoint keys may not contain '/': {k!r}"
            out.update(_flatten(v, f"{prefix}{k}/"))
        return out
    out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> Any:
    tree: dict[str, Any] = {}
    for path, arr in flat.items():
        parts = path.split("/")
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = arr
    return tree


def save_params(path, params: Any, metadata: dict | None = None) -> None:
    """Write a pytree of arrays (nested dicts of jax/np arrays) to GGUF."""
    import jax.numpy as jnp

    w = GGUFWriter()
    w.add_string("general.architecture", "ggml_tpu.checkpoint")
    for k, v in (metadata or {}).items():
        if isinstance(v, str):
            w.add_string(k, v)
        elif isinstance(v, bool):
            w.add_bool(k, v)
        elif isinstance(v, float):
            w.add_f32(k, v)
        else:
            w.add_i32(k, int(v))
    for name, arr in _flatten(params).items():
        a = np.asarray(arr)
        if a.dtype == jnp.bfloat16:
            a = a.astype(np.float32)
        if a.ndim == 0:
            a = a.reshape(1)
        w.add_tensor(name, np.ascontiguousarray(a))
    # atomic publish: a process killed mid-write leaves only a stale .tmp,
    # never a truncated checkpoint (the restartable-training contract —
    # tests/test_fault_recovery.py kills training mid-run and resumes)
    import os

    tmp = f"{path}.tmp"
    w.write(tmp)
    os.replace(tmp, path)


def load_params(path, dtype=None) -> tuple[Any, dict]:
    """Read a GGUF checkpoint back into a nested-dict pytree + metadata."""
    import jax.numpy as jnp

    g = GGUFFile(path)
    flat = {}
    for name in g.tensors:
        a = g.to_float32(name) if g.tensors[name].ggml_type not in (24, 25, 26, 27) else g.tensor_data(name)
        flat[name] = jnp.asarray(a, dtype=dtype) if dtype else jnp.asarray(a)
    md = dict(g.metadata)
    g.close()
    return _unflatten(flat), md


def save_optimizer(path, opt) -> None:
    """Checkpoint a ggml_tpu.opt.Optimizer (params + momenta + counters)."""
    st = opt.state_dict()
    arrays = {k: v for k, v in st.items() if k not in ("t", "i_acc")}
    save_params(
        path,
        arrays,
        metadata={
            "opt.t": int(np.asarray(st["t"])),
            "opt.i_acc": int(np.asarray(st["i_acc"])),
            "opt.loss_type": opt.loss_type,
            "opt.period": opt.opt_period,
        },
    )


def load_optimizer(path, opt) -> None:
    """Restore state saved by save_optimizer into an Optimizer of the same
    structure (resume training exactly where it stopped)."""
    import jax.numpy as jnp

    tree, md = load_params(path)
    ref = opt.state_dict()

    def cast_like(saved, like):
        import jax

        return jax.tree.map(lambda s, l: jnp.asarray(s, l.dtype).reshape(l.shape), saved, like)

    state = {
        "params": cast_like(tree["params"], ref["params"]),
        "m": cast_like(tree["m"], ref["m"]),
        "v": cast_like(tree["v"], ref["v"]),
        "g_acc": cast_like(tree["g_acc"], ref["g_acc"]),
        "t": jnp.asarray(int(md["opt.t"]), jnp.int32),
        "i_acc": jnp.asarray(int(md["opt.i_acc"]), jnp.int32),
    }
    opt.load_state_dict(state)


def latest_checkpoint(ckpt_dir, prefix: str = "step"):
    """Newest VALID checkpoint in a directory of '<prefix>NNN.gguf' files.

    Skips unreadable/truncated files (a crash can only leave a stale '.tmp'
    thanks to the atomic publish, but storage-level corruption is still
    survivable: the loader falls back to the previous intact checkpoint —
    the elastic-recovery behavior the reference lacks, SURVEY.md §5).
    Returns (path, step) or (None, -1)."""
    import pathlib
    import re

    best, best_step = None, -1
    for p in pathlib.Path(ckpt_dir).glob(f"{prefix}*.gguf"):
        m = re.fullmatch(rf"{re.escape(prefix)}(\d+)\.gguf", p.name)
        if not m or int(m.group(1)) <= best_step:
            continue
        try:
            g = GGUFFile(p)
            g.close()
        except Exception:
            continue  # truncated/corrupt: fall back
        best, best_step = p, int(m.group(1))
    return best, best_step
