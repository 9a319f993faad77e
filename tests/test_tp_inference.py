"""Tensor-parallel inference vs single-device forward — the analog of the
reference's multi-GPU split-buffer being validated against single-GPU results.
Runs on an 8-device virtual CPU mesh in a subprocess (the main test process is
pinned to the real TPU chip)."""

import os
import pathlib
import subprocess
import sys

import pytest

_SCRIPT = r"""
import numpy as np
import jax
import jax.numpy as jnp

assert jax.device_count() == 8, jax.devices()

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.models.gptj import GPTJConfig, forward, init_cache, synth_quantized_params
from ggml_tpu.parallel.tp_inference import (
    CACHE_SPEC, make_tp_forward, shard_gptj_params,
)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

cfg = GPTJConfig(n_vocab=512, n_ctx=64, n_embd=256, n_head=8, n_layer=2, n_rot=32)
params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=3, dtype=jnp.float32, fuse_qkv=False,
                               use_q4=False)  # row-sharded planes need int8 codes

rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(0, 512, (1, 8)).astype(np.int32))
pos0 = jnp.zeros((1,), jnp.int32)

# single-device reference
cache1 = init_cache(cfg, 1, 32, jnp.float32)
ref_logits, ref_cache = jax.jit(
    lambda p, t, s, c, l: forward(p, cfg, t, s, c, l)
)(params, tokens, pos0, cache1, jnp.int32(0))

# 8-way tensor parallel
mesh = Mesh(np.array(jax.devices()).reshape(1, 8), ("dp", "tp"))
params_tp = shard_gptj_params(params, mesh)
cache8 = jax.device_put(init_cache(cfg, 1, 32, jnp.float32), NamedSharding(mesh, CACHE_SPEC))
fwd = make_tp_forward(cfg, mesh)
tp_logits, tp_cache = fwd(params_tp, tokens, pos0, cache8, jnp.int32(0))

a = np.asarray(ref_logits, np.float64)
b = np.asarray(tp_logits, np.float64)
nmse = ((a - b) ** 2).sum() / (a * a).sum()
print("NMSE:", nmse)
# per-shard int8 activation quantization adds ~1e-4 noise vs the single-device
# quantization of the full row; reference matmul gate is 5e-4
assert nmse < 2e-3, nmse
assert (a.argmax(-1) == b.argmax(-1)).mean() >= 0.75
print("TP-INFERENCE-OK")
"""


def _run_tp_script(script, marker="TP-INFERENCE-OK"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disarm the axon sitecustomize hook
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    root = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        env=env,
        cwd=root,
        timeout=600,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert marker in r.stdout


def test_tp_matches_single_device():
    _run_tp_script(_SCRIPT)


def test_tp_matches_single_device_q4_packed():
    """Packed-nibble q4 planes row-shard at FULL density after the per-shard
    nibble re-pair (quant.planar.repack_q4_rows_for_tp) — multi-chip decode
    keeps the 2x HBM win.  n_embd=512 so each of 8 shards' local half is a
    whole quant group (Kl/2 = 32 = G)."""
    script = _SCRIPT.replace(
        "n_embd=256, n_head=8, n_layer=2, n_rot=32",
        "n_embd=512, n_head=8, n_layer=2, n_rot=32",
    ).replace("use_q4=False)  # row-sharded planes need int8 codes",
              "use_q4=True)  # q4 planes repack per shard")
    assert "use_q4=True" in script and "n_embd=512" in script
    _run_tp_script(script)


def test_repack_q4_rows_roundtrip():
    """Host-side invariant: concatenating each shard's dequantized rows
    reproduces the original weight exactly (the repack is a pure relayout)."""
    import numpy as np

    from ggml_tpu.dtypes import GGMLType
    from ggml_tpu.quant.planar import (
        PlanarWeight, dequant_planar, repack_q4_rows_for_tp,
    )

    rng = np.random.default_rng(5)
    n, k, g, D = 96, 512, 32, 8
    pw = PlanarWeight(
        kind="q4",
        codes=rng.integers(0, 256, (k // 2, 128), np.uint8),
        scales=rng.standard_normal((2, (k // 2) // g, 128)).astype(np.float32),
        offsets=rng.standard_normal((k // g, 128)).astype(np.float32),
        group=g, n=n, k=k, orig_type=GGMLType.Q4_K,
    )
    want = dequant_planar(pw)  # (N, K)
    rp = repack_q4_rows_for_tp(pw, D)
    Kl = k // D
    got = np.concatenate(
        [
            dequant_planar(
                PlanarWeight(
                    kind="q4",
                    codes=np.asarray(rp.codes)[d * Kl // 2 : (d + 1) * Kl // 2],
                    scales=np.asarray(rp.scales)[:, d * (Kl // 2) // g : (d + 1) * (Kl // 2) // g],
                    offsets=np.asarray(rp.offsets)[d * Kl // g : (d + 1) * Kl // g],
                    group=g, n=n, k=Kl, orig_type=GGMLType.Q4_K,
                )
            )
            for d in range(D)
        ],
        axis=1,
    )
    np.testing.assert_array_equal(want, got)


def test_tp_fused_qkv_matches_single_device():
    """Fused [q|k|v] weights are repartitioned on the TP load path
    (unfuse_qkv): sharded forward must match the single-device fused
    forward."""
    _run_tp_script(_SCRIPT.replace("fuse_qkv=False", "fuse_qkv=True"))


_ENGINE_SCRIPT = r"""
import numpy as np
import jax
import jax.numpy as jnp

assert jax.device_count() == 8, jax.devices()

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.models.gptj import GPTJConfig, synth_quantized_params
from ggml_tpu.parallel.tp_inference import (
    CACHE_SPEC, make_tp_engine_forward, shard_gptj_params,
)
from ggml_tpu.serve import Engine
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

cfg = GPTJConfig(n_vocab=512, n_ctx=64, n_embd=512, n_head=8, n_layer=2, n_rot=32)
params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=3, dtype=jnp.float32,
                                fuse_qkv=False, use_q4=True)

mesh = Mesh(np.array(jax.devices()).reshape(1, 8), ("dp", "tp"))
params_tp = shard_gptj_params(params, mesh)


class TPModel:  # the Engine only needs .params/.cfg with forward_fn given
    pass

m = TPModel()
m.params = params_tp
m.cfg = cfg

fwd = make_tp_engine_forward(cfg, mesh)
put = lambda c: jax.device_put(c, NamedSharding(mesh, CACHE_SPEC))

def run(prompts, max_batch):
    eng = Engine(m, max_batch=max_batch, max_seq=48, cache_dtype=jnp.float32,
                 forward_fn=fwd, cache_put=put)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    return [res[r] for r in rids]

prompts = [[1, 2, 3], [4, 5], [9, 9, 1, 7]]
solo = [run([p], 1)[0] for p in prompts]
batched = run(prompts, 2)  # 3 requests through 2 slots: interleaved + queued
assert batched == solo, (batched, solo)
print("TP-ENGINE-OK")
"""


def test_tp_engine_continuous_batching():
    """serve.Engine drives a tensor-parallel (8-way, packed-q4) model via
    forward_fn=make_tp_engine_forward: interleaved continuous batching over
    the sharded model equals solo runs — serving x TP composition the
    reference's RPC star cannot express."""
    _run_tp_script(_ENGINE_SCRIPT, marker="TP-ENGINE-OK")
