"""Pipeline parallelism: GPipe-style microbatch pipeline over a 'pp' axis.

Reference analog: ggml's scheduler pipeline mode — n_copies in-flight
micro-batches with event hand-off between backends
(src/ggml-backend.cpp:617-619,1170-1192,1443). Here each stage is a mesh
shard; activations hand off with lax.ppermute over ICI; the schedule runs
n_micro + n_stages - 1 steps with warmup/drain bubbles, all inside one jitted
shard_map (XLA overlaps the permute with the next microbatch's compute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def pipeline_apply(mesh: Mesh, stage_fn, stage_params, x_micro):
    """Run x_micro (n_micro, mb, D) through n_stages pipeline stages.

    stage_fn(params_local, x) -> x: one stage's compute; stage_params pytree
    leaves have a leading 'pp'-sharded stage axis. Returns (n_micro, mb, D)
    outputs of the LAST stage.
    """
    n_stages = mesh.shape["pp"]
    n_micro, mb, d = x_micro.shape
    n_steps = n_micro + n_stages - 1

    def body(params_l, xs):
        stage = jax.lax.axis_index("pp")
        params_l = jax.tree.map(lambda p: p[0], params_l)  # drop stage axis

        def step(carry, t):
            buf, outs = carry  # buf: (mb, d) current activation on this stage
            # stage 0 injects microbatch t (when valid), others use what
            # arrived from the left neighbor last step
            inject = jax.lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            cur = jnp.where(stage == 0, inject, buf)
            y = stage_fn(params_l, cur)
            # last stage records its result for microbatch (t - n_stages + 1)
            out_idx = t - (n_stages - 1)
            record = jnp.logical_and(stage == n_stages - 1, out_idx >= 0)
            outs = jax.lax.cond(
                record,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y, jnp.clip(out_idx, 0, n_micro - 1), 0
                ),
                lambda o: o,
                outs,
            )
            # hand activations to the right neighbor (ring; wrap output unused)
            nxt = jax.lax.ppermute(y, "pp", [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (nxt, outs), None

        outs0 = jnp.zeros((n_micro, mb, d), xs.dtype)
        (buf, outs), _ = jax.lax.scan(step, (jnp.zeros((mb, d), xs.dtype), outs0), jnp.arange(n_steps))
        # every stage computed an 'outs'; only the last stage's is real -> share it
        outs = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)), "pp"
        )
        return outs

    def specs_of(leaf):
        return P("pp", *([None] * (leaf.ndim - 1)))

    in_params_spec = jax.tree.map(specs_of, stage_params)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(in_params_spec, P(None, None, None)),
        out_specs=P(None, None, None),
        check_rep=False,
    )(stage_params, x_micro)
