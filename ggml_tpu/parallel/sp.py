"""Sequence parallelism: ring attention over an 'sp' mesh axis.

The reference has NO sequence/context parallelism (SURVEY.md §2e item 7 —
"ring attention, Ulysses ... absent"); its only long-context tool is the
fused flash-attention op. This module adds what the reference lacks, the
TPU-native way: the KV sequence is sharded over 'sp', each device holds one
KV chunk, and chunks rotate around the ring with lax.ppermute while every
device accumulates the online-softmax statistics (m, l, acc) for its local
queries — O(S/sp) memory per device, collectives riding ICI, exact equality
with dense attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

_NEG = -1e30


def ring_attention(mesh: Mesh, q, k, v, scale: float = 1.0, causal: bool = False):
    """q (b, h, S, d) sharded over S on 'sp'; k/v likewise. Returns attention
    output (b, h, S, d) with the same sharding. Exact (up to fp reassociation)
    equality with softmax(q k^T * scale) v."""
    n_sp = mesh.shape["sp"]
    S = q.shape[2]
    chunk = S // n_sp

    def body(q_l, k_l, v_l):
        sp = jax.lax.axis_index("sp")
        b, h, cq, d = q_l.shape

        # local query absolute positions (for causal masking across chunks)
        q_pos = sp * chunk + jnp.arange(cq)

        def step(i, carry):
            m, l, acc, k_c, v_c = carry
            # k_c/v_c currently hold the chunk that ORIGINATED at ring index
            # (sp - i) mod n_sp
            src = jnp.mod(sp - i, n_sp)
            k_pos = src * chunk + jnp.arange(chunk)

            s = jnp.einsum("bhqd,bhkd->bhqk", q_l.astype(jnp.float32), k_c.astype(jnp.float32),
                           preferred_element_type=jnp.float32) * scale
            if causal:
                s = jnp.where(k_pos[None, None, None, :] <= q_pos[None, None, :, None], s, _NEG)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p, v_c.astype(jnp.float32))
            # rotate KV chunks one step around the ring
            perm = [(j, (j + 1) % n_sp) for j in range(n_sp)]
            k_c = jax.lax.ppermute(k_c, "sp", perm)
            v_c = jax.lax.ppermute(v_c, "sp", perm)
            return m_new, l, acc, k_c, v_c

        m0 = jnp.full((b, h, cq, 1), _NEG, jnp.float32)
        l0 = jnp.zeros((b, h, cq, 1), jnp.float32)
        a0 = jnp.zeros((b, h, cq, q_l.shape[-1]), jnp.float32)
        m, l, acc, _, _ = jax.lax.fori_loop(0, n_sp, step, (m0, l0, a0, k_l, v_l))
        l = jnp.where(l == 0.0, 1.0, l)
        return (acc / l).astype(q_l.dtype)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
        check_rep=False,
    )(q, k, v)
