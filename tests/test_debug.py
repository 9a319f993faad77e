"""Numerical sanitizers (utils/debug.py) — the TSAN/ASAN/allocator-guard
analog tier (SURVEY.md §5); on TPU the failure class is numerical."""

import jax.numpy as jnp
import numpy as np
import pytest

from ggml_tpu.utils.debug import assert_finite, checked, find_nonfinite


def test_find_nonfinite_and_assert():
    tree = {
        "ok": jnp.ones((4,)),
        "bad": jnp.array([1.0, np.nan]),
        "inf": {"x": jnp.array([np.inf])},
        "ints": jnp.arange(3),
    }
    bad = find_nonfinite(tree)
    assert len(bad) == 2 and any("bad" in p for p in bad) and any("inf" in p for p in bad)
    with pytest.raises(FloatingPointError):
        assert_finite(tree, "params")
    assert_finite({"w": jnp.zeros((2, 2))})


def test_checked_raises_on_nan():
    def f(x):
        return jnp.log(x)  # log(-1) -> NaN

    g = checked(f)
    np.testing.assert_allclose(g(jnp.array([1.0])), [0.0], atol=1e-6)
    with pytest.raises(Exception):
        g(jnp.array([-1.0]))


def test_checked_user_checks():
    from jax.experimental import checkify

    def f(x):
        checkify.check(jnp.all(x < 10), "value out of range")
        return x * 2

    g = checked(f)
    assert np.asarray(g(jnp.array([3.0])))[0] == 6.0
    with pytest.raises(Exception):
        g(jnp.array([11.0]))
