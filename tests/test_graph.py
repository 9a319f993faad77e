"""Graph layer tests: building, execution vs direct op calls, autodiff vs
finite differences (the reference's MODE_GRAD idiom, tests/test-backend-ops.cpp:732)."""

import jax.numpy as jnp
import numpy as np
import pytest

import ggml_tpu.ops.core as O
from ggml_tpu.graph import Context, build_forward, value_and_grad


def test_build_and_run_mlp():
    ctx = Context()
    x = ctx.new_tensor((4, 16), name="x")
    w1 = ctx.new_tensor((32, 16), name="w1")
    b1 = ctx.new_tensor((32,), name="b1")
    w2 = ctx.new_tensor((8, 32), name="w2")
    h = ctx.gelu(ctx.add(ctx.mul_mat(w1, x), b1))
    out = ctx.mul_mat(w2, h)
    g = build_forward(out)
    assert g.n_nodes == 4
    f = g.compile()
    rng = np.random.default_rng(0)
    xv = rng.standard_normal((4, 16), dtype=np.float32)
    w1v = rng.standard_normal((32, 16), dtype=np.float32)
    b1v = rng.standard_normal(32, dtype=np.float32)
    w2v = rng.standard_normal((8, 32), dtype=np.float32)
    (got,) = f(x=xv, w1=w1v, b1=b1v, w2=w2v)
    want = O.mul_mat(w2v, O.gelu(O.add(O.mul_mat(w1v, xv), b1v)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_graph_topological_order():
    ctx = Context()
    a = ctx.new_tensor((4,), name="a")
    b = ctx.add(a, a)
    c = ctx.mul(b, b)
    d = ctx.add(c, b)
    g = build_forward(d)
    order = [id(n) for n in g.nodes]
    assert order.index(id(b)) < order.index(id(c)) < order.index(id(d))


def test_value_and_grad_vs_finite_difference():
    ctx = Context()
    x = ctx.new_tensor((3, 8), name="x")
    w = ctx.new_tensor((4, 8), name="w").set_param()
    labels = ctx.new_tensor((3, 4), name="labels")
    logits = ctx.mul_mat(w, x)
    loss = ctx.cross_entropy_loss(logits, labels).set_loss()
    g = build_forward([loss, logits])
    run = value_and_grad(g, loss, [w])

    rng = np.random.default_rng(1)
    xv = rng.standard_normal((3, 8), dtype=np.float32)
    wv = rng.standard_normal((4, 8), dtype=np.float32)
    lv = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 3)]
    loss_val, outs, grads = run({"w": wv}, {"x": xv, "labels": lv})
    gw = np.asarray(grads["w"])

    # central differences (reference grad_precise idiom)
    eps = 1e-3
    fd = np.zeros_like(wv)
    fn = g.compile()
    for i in range(4):
        for j in range(8):
            wp = wv.copy()
            wp[i, j] += eps
            lp = np.asarray(fn(x=xv, w=wp, labels=lv)[0])[0]
            wm = wv.copy()
            wm[i, j] -= eps
            lm = np.asarray(fn(x=xv, w=wm, labels=lv)[0])[0]
            fd[i, j] = (lp - lm) / (2 * eps)
    np.testing.assert_allclose(gw, fd, rtol=2e-2, atol=2e-3)


def test_graph_print_and_dot(tmp_path):
    ctx = Context()
    x = ctx.new_tensor((2, 4), name="x")
    y = ctx.silu(ctx.rms_norm(x))
    g = build_forward(y)
    g.print()
    p = tmp_path / "g.dot"
    g.dump_dot(p)
    txt = p.read_text()
    assert "digraph" in txt and "rms_norm" in txt


def test_graph_extended_op_coverage():
    """The widened builder surface lowers and evaluates (conv/pool/ssm/rwkv/
    sam-helper ops through the cgraph-analog layer)."""
    import numpy as np
    import jax.numpy as jnp

    from ggml_tpu.graph import Context, build_forward
    from ggml_tpu.ops import core as O

    rng = np.random.default_rng(0)
    ctx = Context()
    x = ctx.new_tensor((1, 2, 16), name="x", data=rng.standard_normal((1, 2, 16)).astype(np.float32))
    w = ctx.new_tensor((3, 2, 3), name="w", data=rng.standard_normal((3, 2, 3)).astype(np.float32))
    y = ctx.conv_1d(x, w, s=1, p=1)
    y2 = ctx.pool_1d(y, "max", 2, 2)
    g = build_forward([y2])
    out = g.compile()( )
    ref = O.pool_1d(O.conv_1d(jnp.asarray(x.data), jnp.asarray(w.data), 1, 1), "max", 2, 2, 0)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref), rtol=1e-5, atol=1e-6)

    # ssm_conv through the graph
    ctx2 = Context()
    sx = ctx2.new_tensor((1, 4, 10), name="sx", data=rng.standard_normal((1, 4, 10)).astype(np.float32))
    c = ctx2.new_tensor((4, 3), name="c", data=rng.standard_normal((4, 3)).astype(np.float32))
    out2 = build_forward([ctx2.ssm_conv(sx, c)]).compile()()
    ref2 = O.ssm_conv(jnp.asarray(sx.data), jnp.asarray(c.data))
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(ref2), rtol=1e-5, atol=1e-6)

    # arange + timestep embedding (leaf-less op)
    ctx3 = Context()
    ts = ctx3.arange(0.0, 4.0, 1.0)
    emb = ctx3.timestep_embedding(ts, 8)
    out3 = build_forward([emb]).compile()()
    ref3 = O.timestep_embedding(O.arange(0.0, 4.0, 1.0), 8, 10000)
    np.testing.assert_allclose(np.asarray(out3[0]), np.asarray(ref3), rtol=1e-5, atol=1e-6)

    # diag + add1 (ggml_diag / ggml_add1)
    ctx4 = Context()
    row = ctx4.new_tensor((2, 1, 5), name="row",
                          data=rng.standard_normal((2, 1, 5)).astype(np.float32))
    one = ctx4.new_tensor((1,), name="one", data=np.asarray([2.5], np.float32))
    d = ctx4.add1(ctx4.diag(row), one)
    (out4,) = build_forward([d]).compile()()
    assert out4.shape == (2, 5, 5)
    want = np.stack([np.diag(np.asarray(row.data)[i, 0]) for i in range(2)]) + 2.5
    np.testing.assert_allclose(np.asarray(out4), want, rtol=1e-6)


def test_run_debug_and_compare():
    """Per-node observation hook + differential compare (analogs of
    ggml_backend_sched_eval_callback and ggml_backend_compare_graph_backend)."""
    import numpy as np

    from ggml_tpu.graph import Context, build_forward

    rng = np.random.default_rng(1)
    ctx = Context()
    a = ctx.new_tensor((4, 8), name="a", data=rng.standard_normal((4, 8)).astype(np.float32))
    b = ctx.new_tensor((8, 8), name="w", data=rng.standard_normal((8, 8)).astype(np.float32))
    y = ctx.gelu(ctx.mul_mat(b, a)).set_name("y")
    g = build_forward([y])

    seen = []
    out = g.run_debug(lambda t, v: seen.append((t.op, v.shape)))
    assert out is not None and [op for op, _ in seen] == ["mul_mat", "gelu"]

    aborted = g.run_debug(lambda t, v: False)  # abort after first node
    assert aborted is None

    cmp = g.compare(g.compile(jit=True))
    assert len(cmp) == 1 and cmp[0][1] < 1e-8  # eager vs jit fusion rounding


def test_map_custom_ops():
    """Custom callback ops (reference: ggml_map_custom1..3, include/ggml.h:1972-2025;
    test mirror of tests/test-customop.cpp: x2 / elementwise add / a*b+c)."""
    import jax
    import jax.numpy as jnp

    ctx = Context()
    a = ctx.new_tensor((4, 8), name="a")
    b = ctx.new_tensor((4, 8), name="b")
    c = ctx.new_tensor((4, 8), name="c")
    t1 = ctx.map_custom(lambda x: x * 2, a, name="x2")            # custom1
    t2 = ctx.map_custom(lambda x, y: x + y, t1, b, name="add")    # custom2
    t3 = ctx.map_custom(lambda x, y, z: x * y + z, t2, b, c)      # custom3
    g = build_forward([t3])
    run = g.compile()
    rng = np.random.default_rng(0)
    av, bv, cv = (rng.standard_normal((4, 8)).astype(np.float32) for _ in range(3))
    (out,) = run(a=av, b=bv, c=cv)
    np.testing.assert_allclose(out, (av * 2 + bv) * bv + cv, rtol=1e-6)

    # traceable custom ops differentiate through jax.grad like any node:
    # d/da sum((2a+b)*b + c) = 2b
    loss = ctx.sum(t3)
    gr = value_and_grad(build_forward([loss]), loss, [a])
    _, _, grads = gr({"a": av}, {"b": bv, "c": cv})
    np.testing.assert_allclose(np.asarray(grads["a"]), bv * 2, rtol=1e-5)


def test_map_custom_host_callback():
    """Host-side custom op via pure_callback — arbitrary Python (the
    reference's C-function-pointer analog), still usable under jit."""
    import jax as _jax
    import numpy as _np

    if _jax.devices()[0].platform not in ("cpu",):
        pytest.skip("host callbacks need a host<->device tunnel the axon relay lacks")

    calls = []

    def host_fn(x):  # closes over Python state = the userdata analog
        calls.append(1)
        return _np.asarray(x) ** 2 + 1.0

    ctx = Context()
    a = ctx.new_tensor((8,), name="a")
    t = ctx.map_custom_host(host_fn, a)
    run = build_forward([t]).compile()
    av = np.arange(8, dtype=np.float32)
    (out,) = run(a=av)
    np.testing.assert_allclose(out, av**2 + 1.0, rtol=1e-6)
    assert calls  # really ran on the host
