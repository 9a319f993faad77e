"""Mixture-of-experts with expert parallelism.

Reference analog: GGML_OP_MUL_MAT_ID — indirect matmul over a tensor of expert
matrices selected per row (include/ggml.h:1121-1125, CPU impl
src/ggml-cpu/ggml-cpu.c:7609). ggml executes the routed matmul on one device;
the TPU-native scaling axis is expert parallelism: experts sharded over an
'ep' mesh axis, every device computes its local experts' contributions for
all tokens (dense-einsum MoE), one psum combines — collectives ride ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def router_weights(x, w_router, top_k: int):
    """Softmax-renormalized top-k gate weights, dense over experts.
    Returns (gates (B, E) with zeros outside the top-k)."""
    logits = x @ w_router  # (B, E)
    top_vals, top_idx = jax.lax.top_k(logits, top_k)
    probs = jax.nn.softmax(top_vals, axis=-1)
    out = jnp.zeros_like(logits)
    b = jnp.arange(logits.shape[0])[:, None]
    return out.at[b, top_idx].set(probs)


def moe_ffn(x, w_router, w_up, w_down, top_k: int = 2):
    """Dense reference MoE FFN. x (B, D); w_up (E, D, H); w_down (E, H, D)."""
    gates = router_weights(x, w_router, top_k)  # (B, E)
    h = jnp.einsum("bd,edh->ebh", x, w_up)
    h = jax.nn.gelu(h)
    y = jnp.einsum("ebh,ehd->ebd", h, w_down)
    return jnp.einsum("ebd,be->bd", y, gates)


def moe_ffn_ep(mesh: Mesh, x, w_router, w_up, w_down, top_k: int = 2):
    """Expert-parallel MoE: experts sharded on 'ep', router replicated, one
    psum combines local contributions. Exactly equals moe_ffn."""

    def body(x, w_router, w_up_l, w_down_l):
        ep = jax.lax.axis_index("ep")
        n_local = w_up_l.shape[0]
        gates = router_weights(x, w_router, top_k)  # (B, E) full router
        lo = ep * n_local
        gates_l = jax.lax.dynamic_slice_in_dim(gates, lo, n_local, axis=1)
        h = jax.nn.gelu(jnp.einsum("bd,edh->ebh", x, w_up_l))
        y = jnp.einsum("ebh,ehd->ebd", h, w_down_l)
        out = jnp.einsum("ebd,be->bd", y, gates_l)
        return jax.lax.psum(out, "ep")

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None), P(None, None), P("ep", None, None), P("ep", None, None)),
        out_specs=P(None, None),
        check_rep=False,
    )(x, w_router, w_up, w_down)


def shard_experts(mesh: Mesh, w_up, w_down):
    s = NamedSharding(mesh, P("ep", None, None))
    return jax.device_put(w_up, s), jax.device_put(w_down, s)


def mixtral_ffn_ep(mesh: Mesh, h, w_inp, w_gate, w_up, w_down,
                   n_expert_used: int, renorm: bool = True):
    """Expert-parallel Mixtral FFN == models.llama.moe_expert_sum over the full
    expert set: router replicated, expert tensors sharded on 'ep', every device
    computes its local experts' gate-weighted contributions for all tokens,
    one psum combines.  h (B, T, D); w_inp (E, D); w_gate/w_up (E, F, D);
    w_down (E, D, F)."""
    from ..models.llama import moe_expert_sum, moe_gates

    n_expert = w_gate.shape[0]

    def body(h, w_inp, w_gate_l, w_up_l, w_down_l):
        ep = jax.lax.axis_index("ep")
        n_local = w_gate_l.shape[0]
        gates = moe_gates(h @ w_inp.T, n_expert, n_expert_used, renorm)  # (B, T, E)
        gates_l = jax.lax.dynamic_slice_in_dim(gates, ep * n_local, n_local, axis=2)
        out = moe_expert_sum(h, w_gate_l, w_up_l, w_down_l, gates_l)
        return jax.lax.psum(out, "ep")

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P("ep", None, None), P("ep", None, None), P("ep", None, None)),
        out_specs=P(),
        check_rep=False,
    )(h, w_inp, w_gate, w_up, w_down)
