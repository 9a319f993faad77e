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
