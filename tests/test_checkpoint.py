"""Checkpoint/resume round trip: training resumed from a checkpoint must
continue exactly where it stopped (a capability the reference lacks —
SURVEY.md §5 'no built-in training checkpoint/resume')."""

import numpy as np

import jax.numpy as jnp

from ggml_tpu.checkpoint import load_optimizer, load_params, save_optimizer, save_params
from ggml_tpu.opt import AdamWConfig, Optimizer

RNG = np.random.default_rng(21)


def _model(p, x):
    return x @ p["w"] + p["b"]


def _setup():
    params = {"w": jnp.asarray(RNG.standard_normal((4, 3)).astype(np.float32)),
              "b": jnp.zeros((3,), jnp.float32)}
    x = RNG.standard_normal((16, 4)).astype(np.float32)
    y = (x @ RNG.standard_normal((4, 3)).astype(np.float32)).astype(np.float32)
    return params, x, y


def test_params_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "nested": {"b": jnp.ones((4,), jnp.float32)}}
    p = tmp_path / "p.gguf"
    save_params(p, tree, metadata={"step": 7, "note": "hi"})
    back, md = load_params(p)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(back["nested"]["b"]), np.ones(4))
    assert int(md["step"]) == 7 and md["note"] == "hi"


def test_optimizer_resume_is_exact(tmp_path):
    params, x, y = _setup()
    cfg = AdamWConfig(alpha=0.01)

    # run A: 10 contiguous steps
    opt_a = Optimizer(_model, params, loss_type="mse", adamw=cfg)
    for _ in range(10):
        opt_a.step(x, y)

    # run B: 5 steps, checkpoint, fresh optimizer, resume, 5 more
    opt_b = Optimizer(_model, params, loss_type="mse", adamw=cfg)
    for _ in range(5):
        opt_b.step(x, y)
    ck = tmp_path / "opt.gguf"
    save_optimizer(ck, opt_b)

    opt_c = Optimizer(_model, params, loss_type="mse", adamw=cfg)
    load_optimizer(ck, opt_c)
    assert int(np.asarray(opt_c.state["t"])) == 5
    for _ in range(5):
        opt_c.step(x, y)

    np.testing.assert_allclose(
        np.asarray(opt_a.params["w"]), np.asarray(opt_c.params["w"]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(opt_a.state["m"]["w"]), np.asarray(opt_c.state["m"]["w"]), rtol=1e-6, atol=1e-7
    )
