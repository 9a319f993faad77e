"""Numerical sanitizers — the debug-mode tier.

The reference's opt-in debug modes are memory/thread sanitizers and allocator
guards (TSAN/ASAN/UBSAN CMake flags, GGML_ALLOCATOR_DEBUG, test buffer
sentinels; SURVEY.md §5 'Race detection / sanitizers').  Under XLA those bug
classes are impossible by construction — no shared mutable state, compiler
bounds-checked buffers — so the debug modes that matter on TPU are numerical:
NaN/Inf detection inside jitted programs and pytree-wide finiteness audits.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def enable_nan_checks(on: bool = True) -> None:
    """Global NaN sanitizer: re-runs any jitted computation that produced a
    NaN in op-by-op mode and raises at the faulting op (jax_debug_nans) —
    the GGML_SANITIZE analog for numerics."""
    jax.config.update("jax_debug_nans", on)


def checked(fn):
    """Wrap a jittable function with checkify so internal ggml-style
    assertions (checkify.check(...)) and automatic NaN/div checks become
    raised Python errors instead of silent garbage.  Returns a callable with
    the same signature that raises on the first failed check."""
    from jax.experimental import checkify

    errs = checkify.user_checks | checkify.nan_checks | checkify.div_checks
    cfn = checkify.checkify(fn, errors=errs)

    def run(*args, **kw):
        err, out = cfn(*args, **kw)
        err.throw()
        return out

    return run


def find_nonfinite(tree: Any, prefix: str = "") -> list[str]:
    """Audit a pytree of arrays for NaN/Inf; returns the paths of offending
    leaves (host-side, fetches each leaf).  The model-load 'validate tensor
    data' analog (reference: ggml_validate_row_data, src/ggml-quants.c:4936)."""
    bad: list[str] = []

    def visit(path, leaf):
        if leaf is None:
            return
        try:
            arr = np.asarray(leaf)
        except Exception:
            return
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    return bad


def assert_finite(tree: Any, what: str = "tree") -> None:
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(f"{what}: non-finite values in {bad[:8]}"
                                 + (f" (+{len(bad)-8} more)" if len(bad) > 8 else ""))
