"""Expert-parallel MoE and pipeline parallelism vs dense references, on an
8-device virtual CPU mesh (subprocess: the main process is pinned to the TPU).
Reference analogs: GGML_OP_MUL_MAT_ID (include/ggml.h:1121) and the
scheduler's n_copies pipeline (src/ggml-backend.cpp:617-619)."""

import os
import pathlib
import subprocess
import sys

_SCRIPT = r"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

assert jax.device_count() == 8

from ggml_tpu.parallel.moe import moe_ffn, moe_ffn_ep, shard_experts
from ggml_tpu.parallel.pp import pipeline_apply

rng = np.random.default_rng(0)

# --- expert parallel -----------------------------------------------------
E, D, H, B = 8, 16, 32, 12
x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
w_router = jnp.asarray(rng.standard_normal((D, E)).astype(np.float32))
w_up = jnp.asarray(rng.standard_normal((E, D, H)).astype(np.float32) * 0.1)
w_down = jnp.asarray(rng.standard_normal((E, H, D)).astype(np.float32) * 0.1)

dense = moe_ffn(x, w_router, w_up, w_down, top_k=2)

mesh = Mesh(np.array(jax.devices()), ("ep",))
w_up_s, w_down_s = shard_experts(mesh, w_up, w_down)
ep = moe_ffn_ep(mesh, x, w_router, w_up_s, w_down_s, top_k=2)
np.testing.assert_allclose(np.asarray(dense), np.asarray(ep), rtol=1e-5, atol=1e-6)
print("MOE-EP-OK")

# --- pipeline parallel ----------------------------------------------------
S, MB, NM = 8, 4, 6  # 8 stages, microbatch 4, 6 microbatches
Dp = 16
ws = jnp.asarray(rng.standard_normal((S, Dp, Dp)).astype(np.float32) * 0.2)
xm = jnp.asarray(rng.standard_normal((NM, MB, Dp)).astype(np.float32))

def stage_fn(w, x):
    return jnp.tanh(x @ w)

mesh_pp = Mesh(np.array(jax.devices()), ("pp",))
out = pipeline_apply(mesh_pp, stage_fn, ws, xm)

# dense reference: apply all stages sequentially
ref = xm
for s in range(S):
    ref = jnp.tanh(ref @ ws[s])
np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
print("PP-OK")
"""


def test_moe_ep_and_pipeline():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    root = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True, env=env,
        cwd=root, timeout=600,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert "MOE-EP-OK" in r.stdout and "PP-OK" in r.stdout


_SP_SCRIPT = r"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

assert jax.device_count() == 8
from ggml_tpu.parallel.sp import ring_attention
from ggml_tpu.ops import core as ops

rng = np.random.default_rng(2)
B, H, S, D = 1, 4, 64, 32  # S sharded 8 ways -> chunk 8
q = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32) * 0.5)
k = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32) * 0.5)
v = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32) * 0.5)
mesh = Mesh(np.array(jax.devices()), ("sp",))

for causal in (False, True):
    out = ring_attention(mesh, q, k, v, scale=0.2, causal=causal)
    mask = None
    if causal:
        i = np.arange(S)[:, None]; j = np.arange(S)[None, :]
        mask = jnp.asarray(np.where(j <= i, 0.0, -np.inf).astype(np.float32))
    ref = ops.flash_attn_ext(q, k, v, mask=mask, scale=0.2)  # (b, s, h, d)
    ref = jnp.transpose(ref, (0, 2, 1, 3))
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 1e-5, (causal, err)
print("RING-ATTN-OK")
"""


_DP_TRAIN_SCRIPT = r"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

assert jax.device_count() == 8
from ggml_tpu.opt.optimizer import Optimizer, AdamWConfig

rng = np.random.default_rng(7)
D, H, C, B, STEPS = 16, 32, 10, 32, 12

def init_params():
    return {
        "w1": jnp.asarray(rng.standard_normal((D, H)).astype(np.float32) * 0.1),
        "b1": jnp.zeros((H,), jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.1),
        "b2": jnp.zeros((C,), jnp.float32),
    }

def model_fn(params, x):
    h = jax.nn.relu(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]

params0 = init_params()
# cycle over a pool of 3 batches with teacher-derived labels so the loss is
# actually learnable (loss-decrease gate below)
pool_x = rng.standard_normal((3, B, D)).astype(np.float32)
teacher = rng.standard_normal((D, C)).astype(np.float32)
pool_y = np.argmax(pool_x @ teacher, axis=-1)
xs = np.stack([pool_x[i % 3] for i in range(STEPS)])
labels = np.eye(C, dtype=np.float32)[np.stack([pool_y[i % 3] for i in range(STEPS)])]

def train(mesh=None, param_spec=None, opt_period=1):
    opt = Optimizer(model_fn, params0, loss_type="cross_entropy",
                    adamw=AdamWConfig(alpha=1e-2), opt_period=opt_period,
                    mesh=mesh, param_spec=param_spec)
    losses = []
    for i in range(STEPS):
        m = opt.step(jnp.asarray(xs[i]), jnp.asarray(labels[i]))
        losses.append(float(m["loss"]))
    return jax.tree.map(np.asarray, opt.params), losses

ref_params, ref_losses = train()
assert ref_losses[-1] < ref_losses[0], "training must reduce loss"

# --- pure data parallel: batch sharded 8 ways, params replicated ----------
devs = np.array(jax.devices())
mesh_dp = Mesh(devs, ("dp",))
dp_params, dp_losses = train(mesh=mesh_dp)
for k in ref_params:
    np.testing.assert_allclose(dp_params[k], ref_params[k], rtol=2e-4, atol=2e-5)
np.testing.assert_allclose(dp_losses, ref_losses, rtol=1e-4, atol=1e-5)
print("DP-TRAIN-OK")

# --- dp x tp: batch over 4-way dp, hidden dim over 2-way tp ---------------
mesh_tp = Mesh(devs.reshape(4, 2), ("dp", "tp"))
spec = {"w1": P(None, "tp"), "b1": P("tp"), "w2": P("tp", None), "b2": P()}
tp_params, tp_losses = train(mesh=mesh_tp, param_spec=spec)
for k in ref_params:
    np.testing.assert_allclose(tp_params[k], ref_params[k], rtol=2e-4, atol=2e-5)
np.testing.assert_allclose(tp_losses, ref_losses, rtol=1e-4, atol=1e-5)
print("DPTP-TRAIN-OK")

# --- grad accumulation under dp: opt_period=3 == batch x3 semantics -------
acc_params, _ = train(mesh=mesh_dp, opt_period=3)
# reference for opt_period: single-device accumulated run
acc_ref, _ = train(opt_period=3)
for k in acc_ref:
    np.testing.assert_allclose(acc_params[k], acc_ref[k], rtol=2e-4, atol=2e-5)
print("DP-ACCUM-OK")
"""


def test_dp_tp_training_through_optimizer():
    """Data-parallel + tensor-parallel training through the REAL Optimizer
    stack (fused donated AdamW step) must match single-device training.
    The reference has no dp trainer; this is the §7 TPU-native equivalent of
    scaling ggml_opt_fit over devices (SURVEY.md §2e mode 1)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    root = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, "-c", _DP_TRAIN_SCRIPT], capture_output=True, text=True, env=env,
        cwd=root, timeout=600,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert "DP-TRAIN-OK" in r.stdout and "DPTP-TRAIN-OK" in r.stdout and "DP-ACCUM-OK" in r.stdout


def test_ring_attention_sequence_parallel():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    root = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, "-c", _SP_SCRIPT], capture_output=True, text=True, env=env,
        cwd=root, timeout=600,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert "RING-ATTN-OK" in r.stdout
