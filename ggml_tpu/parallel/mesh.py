"""Mesh + sharding layer — the TPU-native replacement for ggml's multi-device
machinery (SURVEY.md §2e):

- ggml "buffer on backend X"            -> NamedSharding placement
- CUDA split-buffer row-parallelism     -> tensor-parallel ('tp') axis sharding
  (reference: src/ggml-cuda/ggml-cuda.cu:750-960)
- sched splits + cross-device copies    -> GSPMD partitioning; XLA inserts
  all-gather/reduce-scatter over ICI (reference analog: ggml_backend_sched_split_graph,
  src/ggml-backend.cpp:861-1315)
- RPC multi-host star                   -> jax.distributed + the same pjit program

Axes: ('dp', 'tp') — data parallel × tensor parallel. Weights are sharded
row-wise or col-wise on 'tp' exactly like the CUDA split-buffer does row-wise
splits; activations are sharded on 'dp' (batch).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if tp is None:
        # favor tp up to 8 if it divides n
        tp = 1
        for cand in (8, 4, 2):
            if n % cand == 0:
                tp = cand
                break
    assert n % tp == 0, f"tp={tp} must divide device count {n}"
    dp = n // tp
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def gpt2_param_spec(name: str) -> P:
    """Tensor-parallel layout for GPT-2 params (Megatron-style):
    qkv/ffn_up row-sharded (output features on tp), attn_output/ffn_down
    col-sharded (input features on tp) so each block needs one psum."""
    if name.endswith("attn_qkv.weight") or name.endswith("ffn_up.weight"):
        return P("tp", None)
    if name.endswith("attn_qkv.bias") or name.endswith("ffn_up.bias"):
        return P("tp")
    if name.endswith("attn_output.weight") or name.endswith("ffn_down.weight"):
        return P(None, "tp")
    if name.endswith("token_embd.weight"):
        return P("tp", None)  # vocab-sharded embedding/lm-head
    return P()  # replicated (norms, biases, position embd)


def shard_gpt2_params(params: dict, mesh: Mesh) -> dict:
    out = {}
    for name, v in params.items():
        spec = gpt2_param_spec(name)
        # drop tp sharding when the dim doesn't divide
        dims_ok = all(
            s is None or v.shape[i] % mesh.shape[s] == 0 for i, s in enumerate(spec)
        )
        sh = NamedSharding(mesh, spec if dims_ok else P())
        out[name] = jax.device_put(v, sh)
    return out


# ---------------------------------------------------------------------------
# Sharded training step (forward + backward + fused AdamW) — exercised by the
# driver's dryrun_multichip and by tests on the 8-device virtual CPU mesh.
# ---------------------------------------------------------------------------


def _loss_fn(params, cfg, tokens, targets):
    from ..models.gpt2 import forward, init_cache

    cache = init_cache(cfg, tokens.shape[0], tokens.shape[1], dtype=jnp.float32)
    logits, _ = forward(params, cfg, tokens, jnp.zeros((tokens.shape[0],), jnp.int32), cache, jnp.int32(0))
    ls = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(ls, targets[..., None], axis=-1)
    return jnp.mean(ce)


def adamw_update(params, grads, m, v, step, lr=1e-3, beta1=0.9, beta2=0.999, eps=1e-8, wd=0.01):
    """Fused AdamW (reference: GGML_OP_OPT_STEP_ADAMW / src/ggml-opt.cpp:436-450
    — bias correction via beta^t, decoupled weight decay)."""
    b1t = beta1**step
    b2t = beta2**step

    def upd(p, g, mm, vv):
        mm = beta1 * mm + (1 - beta1) * g
        vv = beta2 * vv + (1 - beta2) * g * g
        mh = mm / (1 - b1t)
        vh = jnp.sqrt(vv / (1 - b2t)) + eps
        return p * (1 - lr * wd) - lr * mh / vh, mm, vv

    flat = {k: upd(params[k], grads[k], m[k], v[k]) for k in params}
    return (
        {k: f[0] for k, f in flat.items()},
        {k: f[1] for k, f in flat.items()},
        {k: f[2] for k, f in flat.items()},
    )


def train_step_spec(mesh: Mesh, cfg, batch: int, seq: int):
    """Build + jit + execute ONE sharded training step on tiny shapes.
    Returns the loss (float) — used by __graft_entry__.dryrun_multichip."""
    from ..models.gpt2 import init_random_params

    params = init_random_params(cfg, seed=0, dtype=jnp.float32)

    with mesh:
        params = shard_gpt2_params(params, mesh)
        m_state = jax.tree.map(jnp.zeros_like, params)
        v_state = jax.tree.map(jnp.zeros_like, params)
        data_sh = NamedSharding(mesh, P("dp", None))
        rng = np.random.default_rng(0)
        tokens = jax.device_put(rng.integers(0, cfg.n_vocab, (batch, seq)).astype(np.int32), data_sh)
        targets = jax.device_put(rng.integers(0, cfg.n_vocab, (batch, seq)).astype(np.int32), data_sh)

        def step(params, m_state, v_state, tokens, targets):
            loss, grads = jax.value_and_grad(lambda p: _loss_fn(p, cfg, tokens, targets))(params)
            params, m_state, v_state = adamw_update(params, grads, m_state, v_state, step=1)
            return loss, params, m_state, v_state

        jstep = jax.jit(step, donate_argnums=(0, 1, 2))
        loss, params, m_state, v_state = jstep(params, m_state, v_state, tokens, targets)
        return float(loss)


def shard_inference(params: dict, cache, mesh: Mesh):
    """Place weights TP-sharded and the KV cache head-sharded for serving."""
    params = shard_gpt2_params(params, mesh)
    cache_sh = NamedSharding(mesh, P(None, None, "dp", "tp", None, None))
    cache = jax.device_put(cache, cache_sh)
    return params, cache
