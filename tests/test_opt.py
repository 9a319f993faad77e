"""Training subsystem tests — the analog of the reference's tests/test-opt.cpp
(892 LoC): dataset shuffling invariants (:170), gradient values (:253),
forward/backward weight+loss evolution (:302), idata_split, and
regression convergence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ggml_tpu.opt import AdamWConfig, Dataset, Optimizer, epoch, fit

RNG = np.random.default_rng(11)


def test_dataset_shuffle_invariants():
    # reference: test_dataset (tests/test-opt.cpp:170): shuffling preserves the
    # multiset of shards, and shuffle(idata) leaves the tail untouched
    data = np.arange(64).reshape(16, 4).astype(np.float32)
    labels = np.arange(16).astype(np.int32)
    ds = Dataset(data, labels, ndata_shard=2)
    rng = np.random.default_rng(0)
    ds.shuffle(rng)
    xs = [ds.get_batch(i, 4)[0] for i in range(4)]
    seen = np.sort(np.concatenate([x.reshape(-1) for x in xs]))
    np.testing.assert_array_equal(seen, np.arange(64, dtype=np.float32))
    # shards stay contiguous
    for x in xs:
        rows = x.reshape(4, 4)
        for j in range(0, 4, 2):
            assert rows[j + 1, 0] == rows[j, 0] + 4  # second row of shard follows first

    perm_tail = ds.perm[4:].copy()
    ds.shuffle(rng, idata=8)  # only first 8 datapoints = 4 shards
    np.testing.assert_array_equal(ds.perm[4:], perm_tail)


def _linreg_setup(loss_type="mse"):
    # y = 3x - 1 regression, the reference's canonical test problem
    x = RNG.uniform(-1, 1, (256, 1)).astype(np.float32)
    y = (3.0 * x - 1.0).astype(np.float32)

    def model(params, inputs):
        return inputs * params["a"] + params["b"]

    params = {"a": jnp.zeros((1,), jnp.float32), "b": jnp.zeros((1,), jnp.float32)}
    return x, y, model, params


def test_gradient_values():
    # reference: test_grad (tests/test-opt.cpp:253) checks the accumulated grads
    x, y, model, params = _linreg_setup()

    def loss(p, xx, yy):
        d = model(p, xx) - yy
        return jnp.mean(d * d)

    g = jax.grad(loss)(params, x[:8], y[:8])
    # analytic: dL/da = 2*mean(x*(ax+b-y)), at a=b=0 -> 2*mean(x*(-y))
    expected_a = 2 * np.mean(x[:8] * (-y[:8]))
    expected_b = 2 * np.mean(-y[:8])
    np.testing.assert_allclose(np.asarray(g["a"]), [expected_a], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g["b"]), [expected_b], rtol=1e-5)


def test_forward_backward_loss_decreases():
    # reference: test_forward_backward (tests/test-opt.cpp:302)
    x, y, model, params = _linreg_setup()
    opt = Optimizer(model, params, loss_type="mse", adamw=AdamWConfig(alpha=0.1))
    losses = []
    for i in range(100):
        m = opt.step(x, y)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.05


def test_grad_accumulation_matches_big_batch():
    # opt_period=2 on half-batches == one step on the full batch
    x, y, model, params = _linreg_setup()
    cfg = AdamWConfig(alpha=0.01)
    opt_full = Optimizer(model, dict(params), loss_type="mse", adamw=cfg)
    opt_acc = Optimizer(model, dict(params), loss_type="mse", adamw=cfg, opt_period=2)
    opt_full.step(x[:32], y[:32])
    opt_acc.step(x[:16], y[:16])
    opt_acc.step(x[16:32], y[16:32])
    a_full = np.asarray(opt_full.params["a"])
    a_acc = np.asarray(opt_acc.params["a"])
    # mse means differ between half and full batches -> close, not exact
    np.testing.assert_allclose(a_acc, a_full, rtol=0.2, atol=1e-4)
    # and the accumulated path did exactly one optimizer step
    assert int(opt_acc.state["t"]) == 1


def test_regression_convergence():
    # reference: regression test at tests/test-opt.cpp tail — fit converges to
    # the true coefficients
    x, y, model, params = _linreg_setup()
    ds = Dataset(x, y)
    opt = Optimizer(model, params, loss_type="mse", adamw=AdamWConfig(alpha=0.05))
    fit(opt, ds, batch_size=32, epochs=50, val_split=0.25, silent=True)
    a = float(np.asarray(opt.params["a"])[0])
    b = float(np.asarray(opt.params["b"])[0])
    assert abs(a - 3.0) < 0.05
    assert abs(b + 1.0) < 0.05


def test_epoch_split_and_metrics():
    # reference: test_idata_split (tests/test-opt.cpp:425)
    n = 128
    xs = RNG.standard_normal((n, 8)).astype(np.float32)
    w_true = RNG.standard_normal((8, 4)).astype(np.float32)
    labels = np.argmax(xs @ w_true, axis=-1)
    onehot = np.eye(4, dtype=np.float32)[labels]
    ds = Dataset(xs, onehot)

    def model(p, inp):
        return inp @ p["w"]

    params = {"w": jnp.zeros((8, 4), jnp.float32)}
    opt = Optimizer(model, params, loss_type="cross_entropy", adamw=AdamWConfig(alpha=0.1))
    for _ in range(30):
        res_train, res_eval = epoch(opt, ds, batch_size=32, idata_split=96)
    loss_t, unc_t = res_train.loss()
    acc_e, acc_unc = res_eval.accuracy()
    assert np.isfinite(loss_t) and np.isfinite(unc_t)
    assert acc_e > 0.9  # linearly separable by construction
    assert 0.0 <= acc_unc < 0.2


def test_fused_sparse_ce_matches_spec():
    # cross_entropy_sparse_fused is a fusion-friendly restructuring of
    # cross_entropy_sparse (custom VJP, lse residual instead of the f32
    # log_softmax): value AND gradient must match the spec, in f32 and
    # from bf16 logits
    from ggml_tpu.opt.optimizer import (
        loss_cross_entropy_sparse,
        loss_cross_entropy_sparse_fused,
    )

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((4, 7, 33)).astype(np.float32)) * 5.0
    labels = jnp.asarray(rng.integers(0, 33, (4, 7)).astype(np.int32))

    v_spec = loss_cross_entropy_sparse(logits, labels)
    v_fused = loss_cross_entropy_sparse_fused(logits, labels)
    np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_spec), rtol=1e-6)

    g_spec = jax.grad(lambda x: loss_cross_entropy_sparse(x, labels))(logits)
    g_fused = jax.grad(lambda x: loss_cross_entropy_sparse_fused(x, labels))(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_spec),
                               rtol=1e-5, atol=1e-8)

    # bf16 logits: fused path still accumulates in f32; the gradient comes
    # back in bf16 (the point of the fusion) — compare after upcasting the
    # spec's gradient-of-upcast to bf16
    lb = logits.astype(jnp.bfloat16)
    v_fused16 = loss_cross_entropy_sparse_fused(lb, labels)
    v_spec16 = loss_cross_entropy_sparse(lb.astype(jnp.float32), labels)
    np.testing.assert_allclose(np.asarray(v_fused16), np.asarray(v_spec16), rtol=1e-6)
    g_fused16 = jax.grad(lambda x: loss_cross_entropy_sparse_fused(x, labels))(lb)
    assert g_fused16.dtype == jnp.bfloat16
    g_spec16 = jax.grad(
        lambda x: loss_cross_entropy_sparse(x.astype(jnp.float32), labels))(lb)
    np.testing.assert_allclose(
        np.asarray(g_fused16, np.float32), np.asarray(g_spec16, np.float32),
        rtol=2e-2, atol=1e-6)


def test_period_one_step_matches_analytic_adamw():
    # the opt_period==1 fast path (no g_acc round trip, no lax.cond) must
    # produce the exact AdamW update
    x, y, model, params = _linreg_setup()
    cfg = AdamWConfig(alpha=0.01)
    opt = Optimizer(model, dict(params), loss_type="mse", adamw=cfg)
    opt.step(x[:32], y[:32])

    def loss(p):
        d = model(p, x[:32]) - y[:32]
        return jnp.mean(d * d)

    g = jax.grad(loss)(params)
    for k in ("a", "b"):
        gk = np.asarray(g[k], np.float64)
        m = (1 - cfg.beta1) * gk
        v = (1 - cfg.beta2) * gk * gk
        mhat = m / (1 - cfg.beta1)
        vhat = v / (1 - cfg.beta2)
        expect = 0.0 - cfg.alpha * (mhat / (np.sqrt(vhat) + cfg.eps))
        np.testing.assert_allclose(np.asarray(opt.params[k]), expect, rtol=1e-5)
        # g_acc never participates: stays zero
        np.testing.assert_array_equal(np.asarray(opt.state["g_acc"][k]), 0.0)
    assert int(opt.state["t"]) == 1
