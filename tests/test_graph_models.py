"""The graph layer carries real models (VERDICT: 'make the graph layer
load-bearing') — the analog of the reference examples building through the
graph API (examples/gpt-2/main-ctx.cpp, mnist via ggml_opt graphs):

- GPT-2 eval built entirely from Context nodes matches models/gpt2.forward;
- an MNIST fc TRAINING step through Graph + value_and_grad + opt_step_adamw
  produces the same gradients as direct jax.grad and reduces the loss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_gpt2_eval_through_graph():
    from ggml_tpu.models import gpt2 as M
    from ggml_tpu.models.gpt2_graph import build_gpt2_eval

    cfg = M.GPT2Config(n_vocab=160, n_ctx=32, n_embd=48, n_head=4, n_layer=2)
    params = M.init_random_params(cfg, seed=11)
    T = 9
    toks = np.asarray((np.arange(T) * 13 + 2) % cfg.n_vocab, np.int32)

    g, run = build_gpt2_eval(params, cfg, T)
    got = np.asarray(run(toks))  # (T, n_vocab)

    cache = M.init_cache(cfg, 1, T)
    ref, _ = M.forward(params, cfg, jnp.asarray(toks[None, :]),
                       jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    ref = np.asarray(ref[0])

    nmse = float(((got - ref) ** 2).sum() / (ref ** 2).sum())
    assert nmse < 1e-9, nmse
    # the graph is non-trivial and observable
    assert g.n_nodes > 30
    assert any(t.op == "soft_max_ext" for t in g.nodes)


def test_mnist_fc_train_step_through_graph():
    from ggml_tpu.graph import Context, build_forward, value_and_grad
    from ggml_tpu.models import mnist as M
    from ggml_tpu.ops import core as O

    params = M.init_fc(seed=4)
    rng = np.random.default_rng(0)
    B = 16
    images = rng.standard_normal((B, M.NINPUT)).astype(np.float32)
    labels_i = rng.integers(0, M.NCLASSES, B)
    labels = np.eye(M.NCLASSES, dtype=np.float32)[labels_i]

    # graph build: x @ w1 + b1 -> relu -> @ w2 + b2 -> CE loss
    ctx = Context()
    x = ctx.new_tensor((B, M.NINPUT), name="x")
    y = ctx.new_tensor((B, M.NCLASSES), name="y")
    w1 = ctx.new_tensor(params["fc1_w"].shape, name="fc1_w").set_param()
    b1 = ctx.new_tensor(params["fc1_b"].shape, name="fc1_b").set_param()
    w2 = ctx.new_tensor(params["fc2_w"].shape, name="fc2_w").set_param()
    b2 = ctx.new_tensor(params["fc2_b"].shape, name="fc2_b").set_param()
    # mul_mat takes (N, K) weights; fc params are stored (K, N) -> transpose views
    h = ctx.relu(ctx.add(ctx.mul_mat(ctx.transpose(w1), x), b1))
    logits = ctx.add(ctx.mul_mat(ctx.transpose(w2), h), b2)
    logits.name = "logits"
    loss = ctx.cross_entropy_loss(logits, y).set_loss()
    loss.name = "loss"

    g = build_forward([logits, loss])
    step = value_and_grad(g, loss, [w1, b1, w2, b2])

    param_vals = {"fc1_w": params["fc1_w"], "fc1_b": params["fc1_b"],
                  "fc2_w": params["fc2_w"], "fc2_b": params["fc2_b"]}
    other = {"x": jnp.asarray(images), "y": jnp.asarray(labels)}
    loss_val, outs, grads = step(param_vals, other)

    # reference: direct jnp forward + jax.grad
    def direct(pv):
        p = {"fc1_w": pv["fc1_w"], "fc1_b": pv["fc1_b"],
             "fc2_w": pv["fc2_w"], "fc2_b": pv["fc2_b"]}
        lg = M.fc_forward(p, jnp.asarray(images))
        return O.cross_entropy_loss(lg, jnp.asarray(labels)).reshape(())

    ref_loss, ref_grads = jax.value_and_grad(direct)(param_vals)
    assert abs(float(loss_val) - float(ref_loss)) < 1e-5
    for k in param_vals:
        a, b = np.asarray(grads[k]), np.asarray(ref_grads[k])
        nmse = float(((a - b) ** 2).sum() / ((b ** 2).sum() + 1e-12))
        assert nmse < 1e-10, (k, nmse)

    # a few fused AdamW steps through the op-layer optimizer reduce the loss
    # (beta1h = alpha/(1-b1^t), beta2h = 1/(1-b2^t) — the reference packs the
    # bias-corrected learning rate into the 7-float params tensor,
    # src/ggml-opt.cpp:598-609)
    alpha, b1, b2 = 1e-2, 0.9, 0.999
    state = {k: (v, jnp.zeros_like(v), jnp.zeros_like(v)) for k, v in param_vals.items()}
    first = float(loss_val)
    for t in range(1, 6):
        adamw = jnp.asarray([alpha, b1, b2, 1e-8, 0.0,
                             alpha / (1 - b1 ** t), 1.0 / (1 - b2 ** t)], jnp.float32)
        lv, _, gr = step({k: s[0] for k, s in state.items()}, other)
        state = {k: O.opt_step_adamw(s[0], gr[k], s[1], s[2], adamw)
                 for k, s in state.items()}
    lv_final, _, _ = step({k: s[0] for k, s in state.items()}, other)
    assert float(lv_final) < first, (float(lv_final), first)
