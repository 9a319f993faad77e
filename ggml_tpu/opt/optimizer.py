"""Optimizer context: loss construction + fused AdamW step.

Reference: ggml_opt_init/ggml_opt_eval_graph (src/ggml-opt.cpp:293-673):
loss types GGML_OPT_LOSS_TYPE_{MEAN,SUM,CROSS_ENTROPY,MEAN_SQUARED_ERROR}
(include/ggml-opt.h:60-66), pred=argmax and ncorrect=count_equal metric nodes
(src/ggml-opt.cpp:402-414), AdamW hyperparams with beta^t bias correction
(src/ggml-opt.cpp:436-438,598-609), gradient accumulation via opt_period
(src/ggml-opt.cpp:659-673).

TPU redesign: the whole train step — forward, jax.grad backward, grad-accum
bookkeeping and the AdamW parameter update — is ONE jitted function with all
state buffers donated, so steady-state training allocates nothing (the analog
of ggml's zero-malloc graph re-execution + fused OPT_STEP_ADAMW node).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def loss_mean(outputs, labels):
    return jnp.mean(outputs.astype(jnp.float32))


def loss_sum(outputs, labels):
    return jnp.sum(outputs.astype(jnp.float32))


def loss_mse(outputs, labels):
    d = outputs.astype(jnp.float32) - labels.astype(jnp.float32)
    return jnp.mean(d * d)


def loss_cross_entropy(outputs, labels):
    """Soft-label cross entropy over the last axis, mean over rows
    (reference: ggml_cross_entropy_loss semantics used by ggml-opt,
    src/ggml-opt.cpp:381-386 scales by 1/ndata)."""
    logp = jax.nn.log_softmax(outputs.astype(jnp.float32), axis=-1)
    per_row = -jnp.sum(labels.astype(jnp.float32) * logp, axis=-1)
    return jnp.mean(per_row)


def loss_cross_entropy_sparse(outputs, labels):
    """Integer-label cross entropy (LM next-token loss): outputs (..., V),
    labels (...) int — avoids materializing (B, T, V) one-hots at LM vocab
    sizes (the ggml_cross_entropy_loss semantics with index labels)."""
    logp = jax.nn.log_softmax(outputs.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


@jax.custom_vjp
def _ce_sparse_fused(logits, labels):
    return _ce_sparse_fused_fwd(logits, labels)[0]


def _ce_sparse_fused_fwd(logits, labels):
    xf = logits.astype(jnp.float32)
    m = jnp.max(xf, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(xf - m), axis=-1, keepdims=True))
    gold = jnp.take_along_axis(xf, labels[..., None].astype(jnp.int32), axis=-1)
    loss = jnp.mean(lse - gold)
    return loss, (logits, lse, labels)


def _ce_sparse_fused_bwd(res, g):
    logits, lse, labels = res
    n = labels.size
    probs = jnp.exp(logits.astype(jnp.float32) - lse)
    onehot = (
        jnp.arange(logits.shape[-1], dtype=jnp.int32)
        == labels[..., None].astype(jnp.int32)
    )
    # one elementwise fusion emitting the cotangent in the logits' own dtype
    # (bf16 under mixed precision) — the lm-head backward streams half the
    # bytes of the f32 log_softmax residual path
    dx = ((probs - onehot.astype(jnp.float32)) * (g / n)).astype(logits.dtype)
    return dx, None


_ce_sparse_fused.defvjp(_ce_sparse_fused_fwd, _ce_sparse_fused_bwd)


def loss_cross_entropy_sparse_fused(outputs, labels):
    """Fused integer-label cross entropy: identical semantics to
    loss_cross_entropy_sparse, restructured so nothing vocab-sized ever
    materializes in f32.  Forward computes nll = lse(logits) - logits[label]
    with f32 accumulation fused into the reductions (the reference's
    ggml_cross_entropy_loss forward is the same max/exp/sum ladder,
    src/ggml.c CROSS_ENTROPY_LOSS region); backward is a custom VJP whose
    residuals are the logits themselves (compute dtype) plus a (B, T) f32
    logsumexp — log_softmax's (B, T, V) f32 residual is gone."""
    return _ce_sparse_fused(outputs, labels)


LOSS_TYPES: dict[str, Callable] = {
    "mean": loss_mean,
    "sum": loss_sum,
    "mse": loss_mse,
    "cross_entropy": loss_cross_entropy,
    "cross_entropy_sparse": loss_cross_entropy_sparse,
    "cross_entropy_sparse_fused": loss_cross_entropy_sparse_fused,
}


@dataclass(frozen=True)
class AdamWConfig:
    """reference defaults: ggml_opt_get_default_optimizer_params
    (src/ggml-opt.cpp:223-235)."""

    alpha: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    wd: float = 0.0
    # "bfloat16" stores the m/v moments in bf16 (HALVES the optimizer-state
    # HBM traffic — the dominant per-step stream once forward/backward run
    # bf16); the moment UPDATE still computes in f32 and rounds once on
    # store.  Quality-gated vs f32 moments in tests/test_finetune.py.
    state_dtype: str = "float32"


class Optimizer:
    """Functional train/eval step over an arbitrary params pytree.

    model_fn(params, inputs) -> outputs (logits for classification).

    Multi-chip training: pass ``mesh`` (a jax.sharding.Mesh) to run the SAME
    fused step SPMD over a device mesh. The batch axis of inputs/labels is
    sharded over ``data_axis`` (data parallelism — GSPMD inserts the gradient
    all-reduce, the NCCL-allreduce analog the reference never had); parameters
    follow ``param_spec`` (a pytree of PartitionSpec matching params, default
    fully replicated) so tensor-parallel layouts compose with dp. Optimizer state (m/v/g_acc)
    mirrors the parameter sharding, which is exactly ZeRO-style state
    partitioning when param_spec shards, for free.
    """

    def __init__(
        self,
        model_fn: Callable,
        params: Any,
        loss_type: str = "cross_entropy",
        adamw: AdamWConfig = AdamWConfig(),
        opt_period: int = 1,
        classify: bool = True,
        mesh: Mesh | None = None,
        data_axis: str = "dp",
        param_spec: Any = None,
        frozen: Any = None,
    ):
        """frozen: optional pytree of NON-trained tensors (e.g. a QLoRA
        quantized base) passed to model_fn as `model_fn(params, inputs,
        frozen)`.  It rides the jitted step as an ARGUMENT — closing over a
        multi-GB base instead would embed it as lowered CONSTANTS (hours of
        compile + a doubled HLO); no optimizer state is allocated for it."""
        self.model_fn = model_fn
        self.frozen = frozen
        self.loss_fn = LOSS_TYPES[loss_type]
        self.loss_type = loss_type
        self.cfg = adamw
        self.opt_period = int(opt_period)
        self.classify = classify
        self.mesh = mesh
        self.data_axis = data_axis
        sdt = jnp.bfloat16 if adamw.state_dtype == "bfloat16" else jnp.float32
        f32 = lambda p: jnp.zeros_like(p, dtype=sdt)
        # own a private copy: step() donates state buffers to XLA, which would
        # otherwise invalidate arrays the caller still holds
        params = jax.tree.map(lambda p: jnp.array(p, copy=True), params)
        if mesh is not None:
            if param_spec is None:
                param_spec = jax.tree.map(lambda p: P(), params)
            put = lambda p, s: jax.device_put(p, NamedSharding(mesh, s))
            params = jax.tree.map(put, params, param_spec)
            self._param_spec = param_spec
            self._scalar_sharding = NamedSharding(mesh, P())
        self.state = {
            "params": params,
            "m": jax.tree.map(f32, params),
            "v": jax.tree.map(f32, params),
            # grad accumulation stays f32 regardless of the moment dtype
            # (bf16 += across opt_period micro-steps loses small gradients)
            "g_acc": jax.tree.map(
                lambda p: jnp.zeros_like(p, dtype=jnp.float32), params),
            "t": jnp.zeros((), jnp.int32),  # optimizer step (post-accumulation)
            "i_acc": jnp.zeros((), jnp.int32),  # position within opt_period
        }
        if mesh is not None:
            self.state["t"] = jax.device_put(self.state["t"], self._scalar_sharding)
            self.state["i_acc"] = jax.device_put(self.state["i_acc"], self._scalar_sharding)
        self._train_step = jax.jit(
            functools.partial(_train_step, self), donate_argnums=(0,), static_argnums=()
        )
        self._eval_step = jax.jit(functools.partial(_eval_step, self))

    # -- public API -----------------------------------------------------------

    def _shard_batch(self, inputs, labels):
        """Place host batches over the mesh: batch dim split on data_axis,
        remaining dims replicated (§7 TPU translation of the reference's
        per-device dataset slicing in examples/mnist)."""
        spec = lambda a: NamedSharding(
            self.mesh, P(self.data_axis, *([None] * (jnp.ndim(a) - 1)))
        )
        inputs = jax.device_put(inputs, spec(inputs))
        if labels is not None:
            labels = jax.device_put(labels, spec(labels))
        return inputs, labels

    def step(self, inputs, labels):
        """One forward/backward (+ parameter update every opt_period calls).
        Returns {'loss': float, 'ncorrect': int, 'n': int}."""
        if self.mesh is not None:
            inputs, labels = self._shard_batch(inputs, labels)
        self.state, metrics = self._train_step(self.state, self.frozen,
                                               inputs, labels)
        return metrics

    def eval(self, inputs, labels):
        if self.mesh is not None:
            inputs, labels = self._shard_batch(inputs, labels)
        return self._eval_step(self.state["params"], self.frozen, inputs, labels)

    @property
    def params(self):
        return self.state["params"]

    # serialization hook: full optimizer state (params + momenta + counters),
    # which the reference leaves to callers (SURVEY.md §5 checkpoint/resume)
    def state_dict(self):
        return self.state

    def load_state_dict(self, state):
        if self.mesh is not None:
            put = lambda p, s: jax.device_put(jnp.asarray(p), NamedSharding(self.mesh, s))
            for key in ("params", "m", "v", "g_acc"):
                state[key] = jax.tree.map(put, state[key], self._param_spec)
            for key in ("t", "i_acc"):
                state[key] = jax.device_put(jnp.asarray(state[key]), self._scalar_sharding)
        self.state = state


def _loss_and_metrics(opt: Optimizer, params, frozen, inputs, labels):
    outputs = (opt.model_fn(params, inputs) if frozen is None
               else opt.model_fn(params, inputs, frozen))
    loss = opt.loss_fn(outputs, labels)
    if opt.classify and labels is not None and outputs.ndim >= 2:
        pred = jnp.argmax(outputs, axis=-1)
        truth = jnp.argmax(labels, axis=-1) if labels.shape == outputs.shape else labels
        ncorrect = jnp.sum(pred == truth)
        n = pred.size
    else:
        ncorrect = jnp.zeros((), jnp.int32)
        n = 0
    return loss, (ncorrect, n)


def _adamw_apply(cfg: AdamWConfig, params, m, v, g_acc, t):
    t = t + 1
    tf = t.astype(jnp.float32)
    b1c = 1.0 - jnp.power(cfg.beta1, tf)  # 1 - beta1^t (reference: src/ggml-opt.cpp:598-609)
    b2c = 1.0 - jnp.power(cfg.beta2, tf)
    # moments may live in bf16 (state_dtype): update in f32, round on store
    m = jax.tree.map(
        lambda mm, g: (cfg.beta1 * mm.astype(jnp.float32)
                       + (1 - cfg.beta1) * g).astype(mm.dtype), m, g_acc)
    v = jax.tree.map(
        lambda vv, g: (cfg.beta2 * vv.astype(jnp.float32)
                       + (1 - cfg.beta2) * g * g).astype(vv.dtype), v, g_acc)

    def upd(p, mm, vv):
        mhat = mm.astype(jnp.float32) / b1c
        vhat = vv.astype(jnp.float32) / b2c
        step = mhat / (jnp.sqrt(vhat) + cfg.eps) + cfg.wd * p.astype(jnp.float32)
        return (p.astype(jnp.float32) - cfg.alpha * step).astype(p.dtype)

    params = jax.tree.map(upd, params, m, v)
    return params, m, v, t


def _train_step(opt: Optimizer, state, frozen, inputs, labels):
    cfg = opt.cfg
    (loss, (ncorrect, n)), grads = jax.value_and_grad(
        lambda p: _loss_and_metrics(opt, p, frozen, inputs, labels), has_aux=True
    )(state["params"])

    period = opt.opt_period
    if period == 1:
        # every step updates: no g_acc read/modify/zero round trip (3 extra
        # f32 param-sized streams) and no lax.cond — grads feed AdamW
        # directly and the donated g_acc buffer passes through untouched
        g = jax.tree.map(lambda x: x.astype(jnp.float32), grads)
        params, m, v, t = _adamw_apply(
            cfg, state["params"], state["m"], state["v"], g, state["t"]
        )
        new_state = {
            "params": params,
            "m": m,
            "v": v,
            "g_acc": state["g_acc"],
            "t": t,
            "i_acc": jnp.zeros((), jnp.int32),
        }
        return new_state, {"loss": loss, "ncorrect": ncorrect, "n": n}

    g_acc = jax.tree.map(
        lambda a, g: a + g.astype(jnp.float32) / period, state["g_acc"], grads
    )
    i_acc = state["i_acc"] + 1
    do_update = i_acc >= period

    def apply(carry):
        params, m, v, g_acc, t = carry
        params, m, v, t = _adamw_apply(cfg, params, m, v, g_acc, t)
        g_acc = jax.tree.map(jnp.zeros_like, g_acc)
        return params, m, v, g_acc, t

    params, m, v, g_acc, t = jax.lax.cond(
        do_update,
        apply,
        lambda c: c,
        (state["params"], state["m"], state["v"], g_acc, state["t"]),
    )
    new_state = {
        "params": params,
        "m": m,
        "v": v,
        "g_acc": g_acc,
        "t": t,
        "i_acc": jnp.where(do_update, 0, i_acc),
    }
    return new_state, {"loss": loss, "ncorrect": ncorrect, "n": n}


def _eval_step(opt: Optimizer, params, frozen, inputs, labels):
    loss, (ncorrect, n) = _loss_and_metrics(opt, params, frozen, inputs, labels)
    return {"loss": loss, "ncorrect": ncorrect, "n": n}
