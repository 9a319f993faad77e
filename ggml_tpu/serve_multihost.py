"""Multi-host continuous batching — the serving control plane across
jax.distributed processes.

The reference has no design to copy here: its distribution story is the RPC
backend, a blocking client-server star that forwards per-graph commands
(src/ggml-rpc/ggml-rpc.cpp:1099-1143).  The TPU-native shape inverts it:

- every host runs the SAME jitted decode step over a GLOBAL mesh; the KV
  cache (and optionally the model) is sharded across hosts, so "send work to
  the worker" is just XLA SPMD — collectives ride ICI/DCN, not a TCP star;
- what *does* go over TCP is only the tiny control plane: the coordinator
  (process 0) owns the request queue and broadcasts each tick's decisions
  (admissions, cancellations) so every host applies the identical,
  deterministic engine transition.  Engine state (slot table, positions,
  PRNG key) is replicated by construction — no state needs gathering;
- streaming fan-in is free: outputs are replicated, so the coordinator's
  callbacks fire locally as tokens are produced.

Slot layout: the batch axis is sharded over the 'dp' mesh axis (slots live
on their owning host's devices — the "shards Engine slots across processes"
design), while control state stays replicated.  Prefill runs replicated
(batch-1) and the slot install is a sharded dynamic-update-slice, which
GSPMD routes to the owning host.

Proven on 2 simulated hosts (CPU devices + gloo collectives) in
tests/test_serve_multihost.py: interleaved multi-host outputs == solo
single-process Engine outputs.
"""

from __future__ import annotations

import pickle
import socket
import struct
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .serve import Engine, Request


# -- control-plane channel (coordinator -> workers) --------------------------


class ControlChannel:
    """Length-prefixed pickle broadcast from the coordinator to every worker.
    This is the only non-XLA communication in the engine — a few hundred
    bytes per tick (the reference's RPC forwards whole graphs/tensors over
    the same kind of socket; here the tensors ride the mesh instead)."""

    def __init__(self, is_coord: bool, n_workers: int, port: int, host: str = "127.0.0.1"):
        self.is_coord = is_coord
        self.conns: list[socket.socket] = []
        if is_coord:
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            srv.bind((host, port))
            srv.listen(n_workers)
            for _ in range(n_workers):
                c, _ = srv.accept()
                self.conns.append(c)
            srv.close()
        else:
            c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            for _ in range(300):
                try:
                    c.connect((host, port))
                    break
                except OSError:
                    import time

                    time.sleep(0.1)
            else:
                raise ConnectionError(f"cannot reach coordinator at {host}:{port}")
            self.conns.append(c)

    def broadcast(self, obj) -> None:
        assert self.is_coord
        blob = pickle.dumps(obj)
        hdr = struct.pack("<I", len(blob))
        for c in self.conns:
            c.sendall(hdr + blob)

    def recv(self):
        assert not self.is_coord
        c = self.conns[0]
        hdr = b""
        while len(hdr) < 4:
            chunk = c.recv(4 - len(hdr))
            if not chunk:
                raise ConnectionError("coordinator closed the control channel")
            hdr += chunk
        (n,) = struct.unpack("<I", hdr)
        blob = b""
        while len(blob) < n:
            chunk = c.recv(n - len(blob))
            if not chunk:
                raise ConnectionError("coordinator closed mid-message")
            blob += chunk
        return pickle.loads(blob)

    def close(self):
        for c in self.conns:
            try:
                c.close()
            except OSError:
                pass


# -- the engine ---------------------------------------------------------------


class MultiHostEngine(Engine):
    """Engine whose KV-cache slots are sharded over a global multi-process
    mesh ('dp' axis on batch).  With a 'tp' mesh axis the weights and KV
    heads are ALSO tensor-parallel within each dp group (the tp x dp
    composition: each host computes only its own slots, each chip streams
    1/tp of the weights; tp collectives ride intra-host ICI, inter-host
    traffic is just the replicated token vectors).  Dense-cache
    greedy/sampled modes only (no paged/draft — those compose later).
    max_batch must divide by the dp size.  Every process constructs it with
    the same arguments."""

    def __init__(self, model, mesh: Mesh, channel: ControlChannel,
                 max_batch: int = 4, max_seq: int = 512, **kw):
        assert kw.get("paged") is None and kw.get("draft") is None, (
            "multi-host engine drives the dense-cache path"
        )
        from .models import mamba as _mamba

        assert not isinstance(model, _mamba.Mamba), (
            "multi-host engine drives KV-cache families (recurrent state "
            "slots compose with the single-host Engine)"
        )
        dp = mesh.shape["dp"]
        tp = mesh.shape.get("tp", 1)
        assert max_batch % dp == 0, f"max_batch {max_batch} must divide dp={dp}"
        self.mesh = mesh
        self.channel = channel
        self._rep_sharding = NamedSharding(mesh, P())
        if tp > 1:
            from .parallel.tp_inference import (
                make_tp_dp_engine_forward, make_tp_engine_forward,
            )

            self._cache_sharding = NamedSharding(mesh, P("dp", "tp", None, None))
            # prefill runs dp-replicated (batch 1) but stays tp-sharded
            self._slot_sharding = NamedSharding(mesh, P(None, "tp", None, None))
            kw.setdefault("forward_fn", make_tp_dp_engine_forward(model.cfg, mesh))
            self._fwd_prefill = make_tp_engine_forward(model.cfg, mesh)
        else:
            self._cache_sharding = NamedSharding(mesh, P("dp", None, None, None))
            self._slot_sharding = self._rep_sharding
            self._fwd_prefill = None
        super().__init__(model, max_batch=max_batch, max_seq=max_seq, **kw)

        # reshard: params + slot-control arrays replicated on the GLOBAL
        # mesh (tp-sharded when a 'tp' axis exists); the cache sharded on
        # batch across hosts
        if tp > 1:
            from .parallel.tp_inference import gptj_param_specs, prepare_tp_params

            params = prepare_tp_params(self.model.params, tp)
            specs = gptj_param_specs(params)
            self.model.params = jax.tree.map(
                lambda v, s: None if v is None else self._mk_global(
                    np.asarray(v), NamedSharding(mesh, s)
                ),
                params, specs, is_leaf=lambda x: x is None,
            )
            cfgv = self.cfg
            fwd_p = self._fwd_prefill

            def prefill_one(params, cache_slot, tokens):
                logits, cache_slot = fwd_p(
                    params, cfgv, tokens, jnp.zeros((1,), jnp.int32), cache_slot,
                    jnp.int32(0), prefill=True,
                )
                return logits[:, -1, :], cache_slot

            self._prefill_one = prefill_one
        else:
            self.model.params = jax.tree.map(self._rep, self.model.params)
        self.cache = jax.tree.map(
            lambda a: self._mk_global(np.asarray(a), self._cache_sharding), self.cache
        )

        # _emit_first samples eagerly; with non-fully-addressable global
        # arrays that must go through a jitted, sharded computation
        base_pick = self._pick
        self._pick = jax.jit(
            base_pick,
            in_shardings=(self._rep_sharding, self._rep_sharding),
            out_shardings=(self._rep_sharding, self._rep_sharding),
        )

        cfgv = self.cfg

        def step(params, cache, tokens, n_past, active, key):
            logits, cache = self._fwd(params, cfgv, tokens, n_past, cache, n_past)
            nxt, key = self._pick(logits[:, -1, :], key)
            nxt = jnp.where(active, nxt, 0)
            return nxt, cache, key

        # tokens/positions replicated in, next-token replicated out — every
        # host sees every slot's token, keeping control state in lockstep
        self._step = jax.jit(
            step,
            donate_argnums=(1,),
            in_shardings=(None, self._cache_sharding, self._rep_sharding,
                          self._rep_sharding, self._rep_sharding, self._rep_sharding),
            out_shardings=(self._rep_sharding, self._cache_sharding, self._rep_sharding),
        )
        self._key = self._rep(np.asarray(self._key))

        from .models.common import cache_write  # noqa: F401  (docs pointer)

        def install(cache, slot_cache, i):
            return jax.tree.map(
                lambda c, s: jax.lax.dynamic_update_slice_in_dim(c, s.astype(c.dtype), i, 0),
                cache, slot_cache,
            )

        self._install = jax.jit(
            install,
            donate_argnums=(0,),
            in_shardings=(self._cache_sharding, self._slot_sharding, self._rep_sharding),
            out_shardings=self._cache_sharding,
        )

    # -- global-array plumbing ------------------------------------------------

    def _mk_global(self, host_value: np.ndarray, sharding):
        return jax.make_array_from_callback(
            host_value.shape, sharding, lambda idx: host_value[idx]
        )

    def _rep(self, x):
        x = np.asarray(x)
        return self._mk_global(x, self._rep_sharding)

    # -- overridden internals -------------------------------------------------

    def _prefill(self, seq, bucket: int):
        """Replicated batch-1 prefill (identical on every host)."""
        t = len(seq)
        tb = min(self.max_seq, -(-t // bucket) * bucket)
        if tb not in self._prefill_cache:
            self._prefill_cache[tb] = jax.jit(
                self._prefill_one,
                in_shardings=(None, self._slot_sharding, self._rep_sharding),
                out_shardings=(self._rep_sharding, self._slot_sharding),
            )
        toks = np.zeros((1, tb), np.int32)
        toks[0, :t] = seq
        n_kv = getattr(self.cfg, "n_head_kv", self.cfg.n_head)
        from .models.common import init_layer_cache

        slot_cache = jax.tree.map(
            lambda a: self._mk_global(np.asarray(a), self._slot_sharding),
            init_layer_cache(self.cfg.n_layer, 1, n_kv, self.max_seq,
                             self.cfg.head_dim, self._cache_dtype),
        )
        self.prefill_count += 1
        logits, slot_cache = self._prefill_cache[tb](
            self.model.params, slot_cache, self._rep(toks)
        )
        return (logits if t == tb else None), slot_cache, t, tb

    def _admit(self, bucket: int):
        self._preempt_for_priority()
        for i in range(self.max_batch):
            if self.slots[i] is None and self.queue:
                req = min(self.queue, key=lambda r: r.priority)
                self.queue.remove(req)
                if req.snapshot is not None:  # evicted mid-run: restore KV
                    self._resume_from_snapshot(i, req)
                    continue
                seq = req.seq
                t = len(seq)
                if t >= self.max_seq:
                    req.done = True
                    self.slots[i] = req
                    continue
                logits, slot_cache, t, _ = self._prefill(seq, bucket)
                self.cache = self._install(self.cache, slot_cache, self._rep(np.int32(i)))
                self.slots[i] = req
                self.n_past[i] = t
                if logits is not None:
                    self._emit_first(req, i, logits)
                else:
                    self.n_past[i] = t - 1
                    self.cur_tok[i] = int(seq[-1])

    def _snapshot_slot(self, i: int, req: Request):
        """Cross-host KV eviction: the slot's KV lives on ONE host's devices
        (dp sharding), so the spill is a jitted gather-to-replicated program
        — every host then holds the same host-side snapshot and resume stays
        a deterministic SPMD transition (no side-channel transfer)."""
        n_past = int(self.n_past[i])
        if n_past <= 0:
            return
        if not hasattr(self, "_gather_slot"):
            self._gather_slot = jax.jit(
                lambda c, j: jax.tree.map(
                    lambda a: jax.lax.dynamic_slice_in_dim(a, j, 1, 0), c
                ),
                in_shardings=(self._cache_sharding, self._rep_sharding),
                out_shardings=self._rep_sharding,
            )
        slot = self._gather_slot(self.cache, self._rep(np.int32(i)))
        req.snapshot = {
            "cache": jax.tree.map(np.asarray, slot),
            "n_past": n_past,
            "cur_tok": int(self.cur_tok[i]),
            "draft": None,
        }

    def _resume_from_snapshot(self, i: int, req: Request) -> bool:
        snap = req.snapshot
        slot = jax.tree.map(
            lambda a: self._mk_global(np.asarray(a), self._slot_sharding),
            snap["cache"],
        )
        self.cache = self._install(self.cache, slot, self._rep(np.int32(i)))
        self.slots[i] = req
        self.n_past[i] = snap["n_past"]
        self.cur_tok[i] = snap["cur_tok"]
        req.snapshot = None
        return True

    def _tick(self):
        active = np.array([s is not None and not s.done for s in self.slots])
        if not active.any():
            return
        toks = self._rep(self.cur_tok.reshape(-1, 1))
        nxt, self.cache, self._key = self._step(
            self.model.params, self.cache, toks, self._rep(self.n_past),
            self._rep(active), self._key,
        )
        nxt = np.asarray(nxt)
        for i, s in enumerate(self.slots):
            if s is None or s.done:
                continue
            self.n_past[i] += 1
            tok = int(nxt[i])
            s.out.append(tok)
            self.cur_tok[i] = tok
            if tok == self.eos_id or len(s.out) >= s.max_new_tokens or self.n_past[i] >= self.max_seq - 1:
                s.done = True
            if s.on_token is not None:
                s.on_token(s.rid, tok, s.done)

    # -- the distributed drive loop -------------------------------------------

    def run(self, bucket: int = 32, abort_callback=None) -> dict[int, list[int]]:
        """Coordinator: drain the queue, broadcasting each tick's decisions.
        Workers: apply broadcast decisions until the stop message.  Every
        process returns the same {rid: tokens} map (replicated state)."""
        results: dict[int, list[int]] = {}
        if self.channel.is_coord:
            while self.queue or any(s is not None for s in self.slots):
                if abort_callback is not None and abort_callback():
                    break
                # ship the control delta BEFORE applying it, so workers make
                # the identical admission decisions this tick
                pending = [
                    (r.rid, r.prompt.tolist(), r.max_new_tokens, r.priority)
                    for r in self.queue if not r.out
                ]
                self.channel.broadcast({"type": "tick", "submits": pending})
                self._sweep(bucket, results)
            self.channel.broadcast({"type": "stop"})
        else:
            known: set[int] = set()
            while True:
                msg = self.channel.recv()
                if msg["type"] == "stop":
                    break
                for rid, prompt, max_new, prio in msg["submits"]:
                    if rid not in known and all(
                        r.rid != rid for r in self.queue
                    ) and all(s is None or s.rid != rid for s in self.slots):
                        self._rid = max(self._rid, rid)
                        self.queue.append(Request(
                            rid, np.asarray(prompt, np.int32), max_new, priority=prio
                        ))
                        known.add(rid)
                self._sweep(bucket, results)
        return results

    def _sweep(self, bucket, results):
        self._admit(bucket)
        self._tick()
        for i, s in enumerate(self.slots):
            if s is not None and s.done:
                results[s.rid] = s.out
                self.slots[i] = None


def make_multihost_engine(model, channel: ControlChannel, dp: int | None = None,
                          tp: int = 1, **engine_kw) -> MultiHostEngine:
    """Build the engine over a global mesh spanning every process's devices:
    ('dp',) by default, or ('dp', 'tp') when tp > 1 — dp groups run across
    hosts (each owns max_batch/dp KV slots), tp shards weights/heads within
    each group (device order keeps tp peers host-local so the per-layer psum
    rides ICI).  All processes call this with identical arguments after
    jax.distributed initialization."""
    devs = np.array(jax.devices())
    dp = dp or len(devs) // tp
    if tp > 1:
        mesh = Mesh(devs[: dp * tp].reshape(dp, tp), ("dp", "tp"))
    else:
        mesh = Mesh(devs[:dp].reshape(dp), ("dp",))
    return MultiHostEngine(model, mesh, channel, **engine_kw)
