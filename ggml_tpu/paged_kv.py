"""Paged KV cache — physical page pool + logical page tables, TPU style.

The engine's dense cache reserves max_batch × max_seq KV per slot.  Paging
decouples capacity from the worst case: a shared pool of fixed-size pages is
allocated to sequences on demand, so total KV memory follows the SUM of live
context lengths instead of the product of worst cases (the reference has no
analog; the design point is vLLM's PagedAttention re-expressed for XLA's
static shapes).

TPU adaptation:
- the page POOL and page TABLES have static shapes; allocation is host-side
  (a free list) and reaches the device only as int32 table entries — the
  jitted step never recompiles as pages move;
- the decode step gathers each slot's pages (`pool[table[b]]`) into its
  logical KV window and runs standard masked attention over it — the gather
  reads exactly the window the dense cache would, so decode HBM traffic is
  unchanged; only CAPACITY is pooled;
- writes scatter one (page, offset) row per slot via advanced indexing (one
  XLA scatter per layer).

Equivalence gate (tests/test_paged_kv.py): logits from the paged decode ==
the dense-cache decode for the same tokens.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PagedConfig:
    n_pages: int  # pool size (shared by all slots, per layer)
    page_size: int  # tokens per page; multiple of 8 keeps sublane tiling clean
    max_pages_per_seq: int  # logical window = page_size * max_pages_per_seq
    # automatic prefix caching (the vLLM idea): completed prompt prefills
    # publish their FULL pages under a token-chain hash; a new request whose
    # prompt shares a page-aligned prefix attaches those pages read-only and
    # prefills only the suffix.  Unreferenced published pages form an LRU
    # reserve reclaimed under memory pressure.
    prefix_cache: bool = False


class PagedKVManager:
    """Host-side allocator + device-side pools for one model.

    Pools: per layer (k_pool, v_pool) of (n_pages, n_kv_heads, page_size, d).
    Tables: (max_batch, max_pages_per_seq) int32 — page ids; unallocated
    entries hold 0 but are masked out by per-slot lengths.
    """

    def __init__(self, n_layer: int, n_kv_heads: int, head_dim,
                 max_batch: int, pcfg: PagedConfig, dtype=jnp.bfloat16):
        """head_dim: int for symmetric (k, v) pools, or a (dk, dv) tuple for
        asymmetric pairs (DeepSeek MLA pools the compressed latent and the
        rope key side by side: dk=kv_lora_rank, dv=qk_rope_dim)."""
        self.pcfg = pcfg
        dk, dv = head_dim if isinstance(head_dim, (tuple, list)) else (head_dim, head_dim)
        # one extra TRASH page absorbs the scatter rows of inactive slots (a
        # batched scatter always writes every row; pointing dead rows at a
        # never-allocated page keeps them harmless)
        mk = lambda d: jnp.zeros(
            (pcfg.n_pages + 1, n_kv_heads, pcfg.page_size, d), dtype
        )
        self.trash_page = pcfg.n_pages
        self.pools = tuple((mk(dk), mk(dv)) for _ in range(n_layer))
        self.tables = np.zeros((max_batch, pcfg.max_pages_per_seq), np.int32)
        self.lengths = np.zeros((max_batch,), np.int32)
        self._free = list(range(pcfg.n_pages - 1, -1, -1))  # pop() -> page 0 first
        self._owned: list[list[int]] = [[] for _ in range(max_batch)]
        # prefix cache state: published pages are keyed by the hash CHAIN of
        # their page-aligned token history; _shared_ref counts live slot
        # users; _lru orders reclaimable (ref==0) published pages.
        self._attached: list[list[int]] = [[] for _ in range(max_batch)]
        self._hash_to_page: dict = {}
        self._page_hash: dict[int, object] = {}
        self._shared_ref: dict[int, int] = {}
        self._lru: list[int] = []  # ref==0 published pages, oldest first
        self._install_cache: dict = {}  # (n_pages, from_page) -> jitted install

    # -- prefix cache -------------------------------------------------------------

    @staticmethod
    def _chain_hashes(tokens, page_size: int):
        """Hash chain over full pages of the token sequence."""
        out, h = [], "root"
        for j in range(len(tokens) // page_size):
            h = hash((h, tuple(int(t) for t in
                               tokens[j * page_size:(j + 1) * page_size])))
            out.append(h)
        return out

    def match_prefix(self, tokens) -> list[int]:
        """Longest chain of published pages covering a page-aligned prefix."""
        if not self.pcfg.prefix_cache:
            return []
        pages = []
        for h in self._chain_hashes(tokens, self.pcfg.page_size):
            pg = self._hash_to_page.get(h)
            if pg is None:
                break
            pages.append(pg)
        return pages

    def attach_prefix(self, slot: int, pages: list[int]):
        """Point the slot's leading table entries at shared pages."""
        for j, pg in enumerate(pages):
            self.tables[slot, j] = pg
            self._shared_ref[pg] = self._shared_ref.get(pg, 0) + 1
            if pg in self._lru:
                self._lru.remove(pg)
        self._attached[slot] = list(pages)

    def publish_prefix(self, slot: int, tokens):
        """Publish the slot's FULL prompt pages (beyond any attached prefix)
        so later prompts can share them."""
        if not self.pcfg.prefix_cache:
            return
        hashes = self._chain_hashes(tokens, self.pcfg.page_size)
        n_att = len(self._attached[slot])
        own = list(self._owned[slot])
        for j in range(n_att, len(hashes)):
            h = hashes[j]
            if h in self._hash_to_page:
                continue
            pg = int(self.tables[slot, j])
            if pg not in own:
                continue  # page is attached/shared already
            # transfer ownership: the page becomes shared (this slot holds
            # one reference); it outlives the slot in the LRU reserve
            own.remove(pg)
            self._attached[slot].append(pg)
            self._hash_to_page[h] = pg
            self._page_hash[pg] = h
            self._shared_ref[pg] = self._shared_ref.get(pg, 0) + 1
        self._owned[slot] = own

    def _reclaim_one(self) -> bool:
        """Unpublish the least-recently-used unreferenced shared page."""
        if not self._lru:
            return False
        pg = self._lru.pop(0)
        h = self._page_hash.pop(pg)
        del self._hash_to_page[h]
        self._shared_ref.pop(pg, None)
        self._free.append(pg)
        return True

    def step_coords(self, active: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(wpage, woff) for EVERY batch row: live rows get their next
        position's coordinates, inactive rows get the trash page."""
        b = len(active)
        wpage = np.full((b,), self.trash_page, np.int32)
        woff = np.zeros((b,), np.int32)
        ps = self.pcfg.page_size
        for i in range(b):
            if active[i]:
                pos = int(self.lengths[i])
                wpage[i] = self.tables[i, pos // ps]
                woff[i] = pos % ps
        return wpage, woff

    def step_coords_multi(self, active: np.ndarray, t: int) -> tuple[np.ndarray, np.ndarray]:
        """(wpages, woffs) of shape (B, t): write coordinates for the next t
        positions per live row (the speculative-verify write window);
        inactive rows point every write at the trash page.  Callers must
        have ensured capacity for lengths+t first."""
        b = len(active)
        wpages = np.full((b, t), self.trash_page, np.int32)
        woffs = np.zeros((b, t), np.int32)
        ps = self.pcfg.page_size
        for i in range(b):
            if active[i]:
                for j in range(t):
                    pos = int(self.lengths[i]) + j
                    wpages[i, j] = self.tables[i, pos // ps]
                    woffs[i, j] = pos % ps
        return wpages, woffs

    # -- host-side allocation ---------------------------------------------------

    def free_pages(self) -> int:
        return len(self._free) + len(self._lru)  # LRU pages are reclaimable

    def ensure_capacity(self, slot: int, n_tokens: int) -> bool:
        """Grow slot's page list to cover n_tokens positions.  Returns False
        (allocating nothing) if the pool cannot satisfy the request — the
        caller should evict or queue."""
        ps = self.pcfg.page_size
        need = -(-n_tokens // ps)
        if need > self.pcfg.max_pages_per_seq:
            raise ValueError(
                f"{n_tokens} tokens exceed the logical window "
                f"({self.pcfg.max_pages_per_seq} pages x {ps})"
            )
        have = len(self._attached[slot]) + len(self._owned[slot])
        if need - have > self.free_pages():
            return False
        for j in range(have, need):
            if not self._free:
                assert self._reclaim_one()
            pg = self._free.pop()
            self._owned[slot].append(pg)
            self.tables[slot, j] = pg
        return True

    def install_prefill(self, slot: int, slot_cache, t: int, from_page: int = 0):
        """Copy a dense single-slot prefill cache (tuple of (k, v) with
        (1, H, S, D) leaves) into this slot's pages — prefill runs through
        the ordinary dense forward, then pages take over for decode.
        from_page skips attached (shared) prefix pages.

        One jitted scatter installs EVERY layer's pages (cached per page
        count): the per-page eager .at[].set loop was ~2 dispatches x layers
        x pages per request — thousands of relay round trips per admission
        wave at 6B scale."""
        ps = self.pcfg.page_size
        npg = -(-t // ps)
        n_eff = npg - from_page
        if n_eff <= 0:
            self.lengths[slot] = t
            return
        key = (n_eff, from_page)
        fn = self._install_cache.get(key)
        if fn is None:
            def install(pools, slot_cache, pages):
                def upd(pool, buf):
                    # buf (1, H, S, D): rows [from_page*ps, npg*ps) as
                    # (n_eff, H, ps, D) page blocks scattered into the pool
                    rows = buf[0, :, from_page * ps: npg * ps, :]
                    h, _, d = rows.shape
                    blocks = jnp.swapaxes(
                        rows.reshape(h, n_eff, ps, d), 0, 1)
                    return pool.at[pages].set(blocks.astype(pool.dtype))

                return tuple(
                    (upd(kp, kc), upd(vp, vc))
                    for (kp, vp), (kc, vc) in zip(pools, slot_cache))

            fn = jax.jit(install, donate_argnums=(0,))
            self._install_cache[key] = fn
        pages = jnp.asarray(
            np.asarray(self.tables[slot, from_page:npg], np.int32))
        self.pools = fn(self.pools, slot_cache, pages)
        self.lengths[slot] = t

    def gather_prefix(self, slot: int, n_pages: int):
        """Dense (1, H, n_pages*ps, D) views of the slot's leading pages per
        layer — the context for suffix prefill after a prefix-cache hit."""
        table = self.tables[slot, :n_pages]
        out = []
        for kp, vp in self.pools:
            kd = kp[table]  # (n, H, ps, D)
            vd = vp[table]
            to_dense = lambda a: a.transpose(1, 0, 2, 3).reshape(
                1, a.shape[1], n_pages * self.pcfg.page_size, a.shape[3])
            out.append((to_dense(kd), to_dense(vd)))
        return tuple(out)

    def release(self, slot: int):
        for pg in self._attached[slot]:
            self._shared_ref[pg] -= 1
            if self._shared_ref[pg] == 0:
                self._lru.append(pg)  # stays published, reclaimable
        self._attached[slot] = []
        for pg in self._owned[slot]:
            self._free.append(pg)
        self._owned[slot] = []
        self.tables[slot] = 0
        self.lengths[slot] = 0



def paged_write(pool_kv, kv, page_ids, offsets):
    """Scatter one token per slot into the pool.

    pool_kv: (n_pages, H, ps, D); kv: (B, H, D) this step's K or V rows;
    page_ids/offsets: (B,) int32.  Duplicate (page, offset) pairs cannot
    occur (each live slot owns its pages)."""
    return pool_kv.at[page_ids, :, offsets, :].set(kv)


def paged_gather(pool_kv, table_row):
    """(max_pages, H, ps, D) -> (H, max_pages*ps, D) logical window for one
    slot (rows beyond the slot's length are garbage the mask removes)."""
    g = pool_kv[table_row]  # (P, H, ps, D)
    p, h, ps, d = g.shape
    return g.transpose(1, 0, 2, 3).reshape(h, p * ps, d)


def make_paged_decode_step(model, pcfg: PagedConfig, forward_fn=None):
    """Jitted one-token decode step over paged KV.

    Returns step(params, pools, tokens (B,1), lengths (B,), tables (B,P),
    write_pages (B,), write_offs (B,), active (B,)) ->
    (logits (B, vocab), pools).  Works for any batch of slots at distinct
    positions (continuous batching).

    Specialized steps exist for the high-traffic families (llama, gptj,
    gemma2, phi3, deepseek-MLA); EVERY other dense-KV attention family runs
    the generic adapter over its own forward (pass forward_fn — serve.Engine
    passes its family forward)."""
    from .models import deepseek as _deepseek
    from .models import gemma2 as _gemma2
    from .models import gptj as _gptj

    if isinstance(model, _gptj.GPTJ):
        return _make_paged_step_gptj(model, pcfg)
    if isinstance(model, _gemma2.Gemma2):
        return _make_paged_step_gemma2(model, pcfg)
    if isinstance(model, _deepseek.Deepseek):
        return _make_paged_step_deepseek(model, pcfg)
    from .models import llama as _llama
    from .models import phi3 as _phi3

    if isinstance(model, _phi3.Phi3):
        return _make_paged_step_phi3(model, pcfg)
    if isinstance(model, _llama.Llama):
        gen = _make_paged_llama_general(model, pcfg)

        def step(params, pools, tokens, lengths, tables, wpage, woff, active):
            logits, pools = gen(params, pools, tokens, lengths, tables,
                                wpage[:, None], woff[:, None], active)
            return logits[:, 0], pools

        return jax.jit(step, donate_argnums=(1,))
    if forward_fn is None:
        raise TypeError(
            f"no specialized paged step for {type(model).__name__} and no "
            "forward_fn given for the generic adapter")
    return _make_paged_step_generic(model, pcfg, forward_fn)


def _make_paged_step_generic(model, pcfg: PagedConfig, forward_fn):
    """ANY dense-KV attention family paged, by composition: gather each
    layer's paged window into a dense per-layer cache VIEW, run the family's
    OWN forward over it (the exact program the dense engine serves — paged ==
    dense by construction, masks/ALiBi/softcaps/rope variants included), then
    scatter the row each slot just wrote back into its page.  The gather is
    the same traffic the hand-specialized steps pay; the extra dense-row
    write+read per layer is noise.  llama.cpp hand-builds paged attention
    into every per-arch graph (src/llama-kv-cache); here the family forward
    is reused verbatim.

    Memory caveat: the views for ALL layers are materialized before the
    forward runs, so peak HBM on this path can approach pools + one dense
    cache copy (the hand-specialized steps effectively gather per layer).
    Fine for the generic families this serves; a 6B-class model at large
    windows should use a specialized step (llama/gptj/gemma2/phi3/deepseek
    have them)."""
    cfg = model.cfg

    def step(params, pools, tokens, lengths, tables, wpage, woff, active):
        views = tuple(
            (jax.vmap(lambda tr, p=kp: paged_gather(p, tr))(tables),
             jax.vmap(lambda tr, p=vp: paged_gather(p, tr))(tables))
            for kp, vp in pools)
        logits, new_views = forward_fn(params, cfg, tokens, lengths, views,
                                       lengths)
        pick = jax.vmap(
            lambda c, p: jax.lax.dynamic_index_in_dim(c, p, axis=1,
                                                      keepdims=False))
        new_pools = []
        for (kp, vp), (kv, vv) in zip(pools, new_views):
            krow, vrow = pick(kv, lengths), pick(vv, lengths)
            new_pools.append(
                (paged_write(kp, krow.astype(kp.dtype), wpage, woff),
                 paged_write(vp, vrow.astype(vp.dtype), wpage, woff)))
        logits = jnp.where(active[:, None], logits[:, -1], 0.0)
        return logits, tuple(new_pools)

    return jax.jit(step, donate_argnums=(1,))


def make_paged_decode_scan(step_fn):
    """Multi-step paged decode: h greedy ticks inside ONE jitted lax.scan —
    one dispatch + one (h, B) token fetch per stretch instead of a host
    round trip per token (over a remote-TPU relay each trip is ~150 ms,
    which made per-tick paged decode ~30x slower than the compute).

    step_fn: a single-token paged step (the jitted per-family or generic
    step — tracing through it inside the scan inlines it).  Page-table
    rows and write coordinates for all h future positions are precomputed
    host-side (PagedKVManager.step_coords_multi after ensure_capacity);
    slots that stop mid-stretch keep writing junk rows past their final
    length — never attended (position-masked) and rewritten on reuse, the
    same rollback-free invariant the speculative verify relies on."""

    @functools.partial(jax.jit, static_argnums=(8,), donate_argnums=(1,))
    def scan_fn(params, pools, tok, lengths, tables, wpages, woffs, active, h):
        def body(carry, xs):
            pools, tok, lengths = carry
            wp, wo = xs
            logits, pools = step_fn(params, pools, tok, lengths, tables,
                                    wp, wo, active)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(active, nxt, 0)
            lengths = lengths + active.astype(jnp.int32)
            return (pools, nxt[:, None], lengths), nxt

        (pools, _, _), toks = jax.lax.scan(
            body, (pools, tok, lengths),
            (jnp.swapaxes(wpages, 0, 1), jnp.swapaxes(woffs, 0, 1)), length=h)
        return toks, pools

    return scan_fn


def make_paged_verify_step(model, pcfg: PagedConfig, forward_fn=None):
    """Jitted MULTI-TOKEN paged step — the speculative-verify shape: write
    T = draft_k+1 new KV rows per slot into their pages and evaluate all T
    positions causally in one forward.  Returns step(params, pools,
    tokens (B,T), lengths (B,), tables (B,P), wpages (B,T), woffs (B,T),
    active (B,)) -> (logits (B,T,V), pools).  Rejected drafts need no
    rollback: their page rows sit past the slot's accepted length, masked by
    position, and the next tick overwrites the same (page, offset) rows —
    the paged restatement of the dense engine's rollback-free invariant.
    Specialized for llama; EVERY other dense-KV family composes via the
    generic family-forward adapter (pass forward_fn)."""
    from .models import llama as _llama

    if isinstance(model, _llama.Llama):
        return jax.jit(_make_paged_llama_general(model, pcfg), donate_argnums=(1,))
    if forward_fn is None:
        raise TypeError(
            "paged speculative verify needs forward_fn for non-llama families")
    return jax.jit(_make_paged_multi_generic(model, pcfg, forward_fn),
                   donate_argnums=(1,))


def _make_paged_multi_generic(model, pcfg: PagedConfig, forward_fn):
    """Generic MULTI-TOKEN paged step (verify shape), by the same
    composition as _make_paged_step_generic: gather each layer's window
    into a dense view, run the family's own forward over the T tokens, then
    scatter the T freshly written rows back to their pages."""
    cfg = model.cfg

    def step(params, pools, tokens, lengths, tables, wpages, woffs, active):
        t = tokens.shape[1]
        views = tuple(
            (jax.vmap(lambda tr, p=kp: paged_gather(p, tr))(tables),
             jax.vmap(lambda tr, p=vp: paged_gather(p, tr))(tables))
            for kp, vp in pools)
        logits, new_views = forward_fn(params, cfg, tokens, lengths, views,
                                       lengths)
        pick = jax.vmap(
            lambda c, p: jax.lax.dynamic_slice_in_dim(c, p, t, axis=1))
        new_pools = []
        for (kp, vp), (kv, vv) in zip(pools, new_views):
            krows, vrows = pick(kv, lengths), pick(vv, lengths)  # (B,H,t,D)
            for j in range(t):  # t is small and static (draft_k+1)
                kp = paged_write(kp, krows[:, :, j].astype(kp.dtype),
                                 wpages[:, j], woffs[:, j])
                vp = paged_write(vp, vrows[:, :, j].astype(vp.dtype),
                                 wpages[:, j], woffs[:, j])
            new_pools.append((kp, vp))
        logits = jnp.where(active[:, None, None], logits, 0.0)
        return logits, tuple(new_pools)

    return step


def _make_paged_llama_general(model, pcfg: PagedConfig):
    """Shared llama-family paged forward over T>=1 tokens per slot (T=1 is
    the decode step; T=k+1 the speculative verify).  Query j of slot b sits
    at position lengths[b]+j and attends kv_pos <= lengths[b]+j."""
    from .models.llama import _linear, _rms_norm, _rope_half_scaled

    cfg = model.cfg
    rep = cfg.n_head // cfg.n_head_kv
    # granite multipliers (1.0/0.0 for plain llama — static no-ops); paged
    # must match the dense forward exactly or paged == dense breaks
    scale = getattr(cfg, "attn_scale", 0.0) or 1.0 / np.sqrt(cfg.head_dim)
    embd_scale = getattr(cfg, "embd_scale", 1.0)
    logit_scale = getattr(cfg, "logit_scale", 1.0)
    rs = getattr(cfg, "resid_scale", 1.0)
    res = (lambda y: y) if rs == 1.0 else (lambda y: rs * y)
    window = pcfg.max_pages_per_seq * pcfg.page_size

    def step(params, pools, tokens, lengths, tables, wpage, woff, active):
        b, t = tokens.shape
        positions = lengths[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
        x = embd[tokens]
        if embd_scale != 1.0:
            x = x * embd_scale
        dt = x.dtype
        new_pools = list(pools)
        for i in range(cfg.n_layer):
            pre = f"blk.{i}."
            h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
            q = _linear(h, params[pre + "attn_q.weight"], params.get(pre + "attn_q.bias")).reshape(b, t, cfg.n_head, cfg.head_dim)
            k = _linear(h, params[pre + "attn_k.weight"], params.get(pre + "attn_k.bias")).reshape(b, t, cfg.n_head_kv, cfg.head_dim)
            v = _linear(h, params[pre + "attn_v.weight"], params.get(pre + "attn_v.bias")).reshape(b, t, cfg.n_head_kv, cfg.head_dim)
            if getattr(cfg, "qk_norm", False):  # qwen3 per-head q/k RMSNorm
                q = _rms_norm(q, params[pre + "attn_q_norm.weight"], cfg.rms_eps)
                k = _rms_norm(k, params[pre + "attn_k_norm.weight"], cfg.rms_eps)
            # scaled rope (linear/YaRN) must match the dense forward exactly —
            # a scaled-rope GGUF served paged would otherwise silently diverge
            nope = getattr(cfg, "nope_interval", 0)
            if not (nope and (i + 1) % nope == 0):  # smollm3 NoPE layers
                if getattr(cfg, "rope_interleaved", False):  # ernie4_5
                    from .models.gptj import _rope_interleaved

                    q = _rope_interleaved(q, positions, cfg.head_dim, cfg.rope_base)
                    k = _rope_interleaved(k, positions, cfg.head_dim, cfg.rope_base)
                else:
                    q = _rope_half_scaled(q, positions, cfg)
                    k = _rope_half_scaled(k, positions, cfg)

            kp, vp = new_pools[i]
            cdt = kp.dtype
            for j in range(t):  # T is small and static (1 or draft_k+1)
                kp = paged_write(kp, k[:, j].astype(cdt), wpage[:, j], woff[:, j])
                vp = paged_write(vp, v[:, j].astype(cdt), wpage[:, j], woff[:, j])
            new_pools[i] = (kp, vp)

            kwin = jax.vmap(lambda tr: paged_gather(kp, tr))(tables)  # (B,Hkv,W,D)
            vwin = jax.vmap(lambda tr: paged_gather(vp, tr))(tables)

            qh = q.reshape(b, t, cfg.n_head_kv, rep, cfg.head_dim)
            att = jnp.einsum(
                "btgrd,bgkd->btgrk", qh.astype(jnp.float32), kwin.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * scale
            kv_pos = jnp.arange(window)[None, None, None, None, :]
            att = jnp.where(kv_pos <= positions[:, :, None, None, None], att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1).astype(vwin.dtype)
            out = jnp.einsum("btgrk,bgkd->btgrd", att, vwin)
            attn_out = out.reshape(b, t, cfg.n_head * cfg.head_dim).astype(dt)
            x = x + res(_linear(attn_out, params[pre + "attn_output.weight"]))

            h2 = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
            if getattr(cfg, "n_expert", 0) > 0:  # Mixtral-style MoE
                from .models.llama import moe_ffn_block

                x = x + res(moe_ffn_block(params, pre, h2, cfg))
            else:
                gate = _linear(h2, params[pre + "ffn_gate.weight"])
                up = _linear(h2, params[pre + "ffn_up.weight"])
                x = x + res(_linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"]))

        x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
        w_out = params.get("output.weight", params.get("token_embd.weight@dense",
                                                       params["token_embd.weight"]))
        logits = _linear(x, w_out)
        if logit_scale != 1.0:
            logits = logits / logit_scale
        logits = jnp.where(active[:, None, None], logits, 0.0)
        return logits, tuple(new_pools)

    return step


def _make_paged_step_gptj(model, pcfg: PagedConfig):
    """GPT-J-family paged step: MHA, interleaved rope, parallel residual."""
    from .models.gptj import _linear, _layer_norm, _rope_deinterleaved, _rope_interleaved

    cfg = model.cfg
    # weights loaded with the RoPE deinterleave permutation need the matching
    # rotation here too, or paged == dense breaks (models/gptj.py)
    _rope_interleaved = (_rope_deinterleaved if getattr(cfg, "rope_deinterleaved", False)
                         else _rope_interleaved)
    scale = 1.0 / np.sqrt(cfg.head_dim)
    window = pcfg.max_pages_per_seq * pcfg.page_size

    def step(params, pools, tokens, lengths, tables, wpage, woff, active):
        b, t = tokens.shape
        assert t == 1
        positions = lengths[:, None]
        embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
        x = embd[tokens]
        dt = x.dtype
        new_pools = list(pools)
        for i in range(cfg.n_layer):
            pre = f"blk.{i}."
            h = _layer_norm(x, params[pre + "attn_norm.weight"],
                            params[pre + "attn_norm.bias"], cfg.eps)
            ff_pre = None
            if pre + "attn_qkvup.weight" in params:
                fused = _linear(h, params[pre + "attn_qkvup.weight"])
                q, k, v, ff_pre = jnp.split(
                    fused, [cfg.n_embd, 2 * cfg.n_embd, 3 * cfg.n_embd], axis=-1)
            elif pre + "attn_qkv.weight" in params:
                qkv = _linear(h, params[pre + "attn_qkv.weight"])
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = _linear(h, params[pre + "attn_q.weight"])
                k = _linear(h, params[pre + "attn_k.weight"])
                v = _linear(h, params[pre + "attn_v.weight"])
            hd = cfg.head_dim
            q = _rope_interleaved(q.reshape(b, 1, cfg.n_head, hd), positions, cfg.n_rot)[:, 0]
            k = _rope_interleaved(k.reshape(b, 1, cfg.n_head, hd), positions, cfg.n_rot)[:, 0]
            v = v.reshape(b, cfg.n_head, hd)

            kp, vp = new_pools[i]
            cdt = kp.dtype
            kp = paged_write(kp, k.astype(cdt), wpage, woff)
            vp = paged_write(vp, v.astype(cdt), wpage, woff)
            new_pools[i] = (kp, vp)

            kwin = jax.vmap(lambda tr: paged_gather(kp, tr))(tables)  # (B,H,W,D)
            vwin = jax.vmap(lambda tr: paged_gather(vp, tr))(tables)
            att = jnp.einsum(
                "bhd,bhkd->bhk", q.astype(jnp.float32), kwin.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * scale
            kv_pos = jnp.arange(window)[None, None, :]
            att = jnp.where(kv_pos <= lengths[:, None, None], att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1).astype(vwin.dtype)
            out = jnp.einsum("bhk,bhkd->bhd", att, vwin)
            attn_out = out.reshape(b, 1, cfg.n_embd).astype(dt)
            attn_out = _linear(attn_out, params[pre + "attn_output.weight"])

            if ff_pre is not None:
                ff = ff_pre + params[pre + "ffn_up.bias"]
            else:
                ff = _linear(h, params[pre + "ffn_up.weight"], params[pre + "ffn_up.bias"])
            ff = 0.5 * ff * (1.0 + jnp.tanh(0.79788456080286535588 * ff * (1.0 + 0.044715 * ff * ff)))
            ff = _linear(ff, params[pre + "ffn_down.weight"], params[pre + "ffn_down.bias"])
            x = x + attn_out + ff

        x = _layer_norm(x, params["output_norm.weight"], params["output_norm.bias"], cfg.eps)
        logits = _linear(x, params["output.weight"], params.get("output.bias"))[:, 0]
        logits = jnp.where(active[:, None], logits, 0.0)
        return logits, tuple(new_pools)

    return jax.jit(step, donate_argnums=(1,))


def _make_paged_step_gemma2(model, pcfg: PagedConfig):
    """Gemma family (gemma1/2/3) paged step: embedding scale, sandwich
    norms, attention + final logit softcaps, per-layer sliding/global window
    alternation with separate rope bases, optional per-head qk RMSNorm and
    global-layer rope position scaling — matching models/gemma2.forward
    exactly (paged == dense is gated by tests/test_paged_gemma2.py)."""
    from .models.gemma2 import _linear, _rms_norm_gemma, _rope_half, _softcap

    cfg = model.cfg
    rep = cfg.n_head // cfg.n_head_kv
    scale = cfg.query_pre_attn_scalar ** -0.5
    window = pcfg.max_pages_per_seq * pcfg.page_size
    embd_mult = np.sqrt(cfg.n_embd).astype(np.float32)

    def step(params, pools, tokens, lengths, tables, wpage, woff, active):
        b, t = tokens.shape
        assert t == 1
        positions = lengths[:, None]
        embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
        x = embd[tokens] * embd_mult
        dt = x.dtype
        new_pools = list(pools)
        for i in range(cfg.n_layer):
            pre = f"blk.{i}."
            h = _rms_norm_gemma(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
            q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, 1, cfg.n_head, cfg.head_dim)
            k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, 1, cfg.n_head_kv, cfg.head_dim)
            v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, 1, cfg.n_head_kv, cfg.head_dim)
            if cfg.qk_norm:  # gemma3
                q = _rms_norm_gemma(q, params[pre + "attn_q_norm.weight"], cfg.rms_eps)
                k = _rms_norm_gemma(k, params[pre + "attn_k_norm.weight"], cfg.rms_eps)

            sliding = i % cfg.sliding_pattern != cfg.sliding_pattern - 1
            base = cfg.rope_local_base if (sliding and cfg.rope_local_base) else cfg.rope_base
            rp = positions if (sliding or cfg.rope_scale_global == 1.0) else (
                positions.astype(jnp.float32) / cfg.rope_scale_global)
            q = _rope_half(q, rp, base)[:, 0]   # (B, Hq, D)
            k = _rope_half(k, rp, base)[:, 0]   # (B, Hkv, D)
            v = v[:, 0]

            kp, vp = new_pools[i]
            cdt = kp.dtype
            kp = paged_write(kp, k.astype(cdt), wpage, woff)
            vp = paged_write(vp, v.astype(cdt), wpage, woff)
            new_pools[i] = (kp, vp)

            kwin = jax.vmap(lambda tr: paged_gather(kp, tr))(tables)  # (B,Hkv,W,D)
            vwin = jax.vmap(lambda tr: paged_gather(vp, tr))(tables)

            qh = q.reshape(b, cfg.n_head_kv, rep, cfg.head_dim)
            att = jnp.einsum(
                "bgrd,bgkd->bgrk", qh.astype(jnp.float32), kwin.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * scale
            if cfg.attn_softcap:
                att = _softcap(att, cfg.attn_softcap)
            kv_pos = jnp.arange(window)[None, None, None, :]
            q_pos = lengths[:, None, None, None]
            keep = kv_pos <= q_pos
            if sliding and cfg.sliding_window:
                keep = keep & (kv_pos > q_pos - cfg.sliding_window)
            att = jnp.where(keep, att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1).astype(vwin.dtype)
            out = jnp.einsum("bgrk,bgkd->bgrd", att, vwin)
            attn_out = out.reshape(b, 1, cfg.n_head * cfg.head_dim).astype(dt)
            o = _linear(attn_out, params[pre + "attn_output.weight"])
            x = x + (_rms_norm_gemma(o, params[pre + "attn_post_norm.weight"],
                                     cfg.rms_eps) if cfg.sandwich else o)

            h2 = _rms_norm_gemma(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
            gate = _linear(h2, params[pre + "ffn_gate.weight"])
            up = _linear(h2, params[pre + "ffn_up.weight"])
            f = _linear(jax.nn.gelu(gate, approximate=True) * up,
                        params[pre + "ffn_down.weight"])
            x = x + (_rms_norm_gemma(f, params[pre + "ffn_post_norm.weight"],
                                     cfg.rms_eps) if cfg.sandwich else f)

        x = _rms_norm_gemma(x, params["output_norm.weight"], cfg.rms_eps)
        w_out = params.get("output.weight", params.get("token_embd.weight@dense",
                                                       params["token_embd.weight"]))
        logits = _linear(x, w_out)[:, 0].astype(jnp.float32)
        if cfg.final_softcap:
            logits = _softcap(logits, cfg.final_softcap)
        logits = jnp.where(active[:, None], logits, 0.0)
        return logits, tuple(new_pools)

    return jax.jit(step, donate_argnums=(1,))


def _make_paged_step_phi3(model, pcfg: PagedConfig):
    """Phi-3/3.5/4 paged step: LongRoPE per-dim frequency divisors with the
    STATIC long/short regime keyed on the paged window (the allocated
    context, same rule the dense forward applies to max_seq — the Engine
    requires window >= max_seq, and paged == dense is gated with both in the
    same regime), attn-factor cos/sin scaling, uniform sliding window —
    matching models/phi3.forward exactly."""
    from .models.common import linear as _linear
    from .models.llama import _rms_norm
    from .models.phi3 import _rope_phi3

    cfg = model.cfg
    rep = cfg.n_head // cfg.n_head_kv
    scale = cfg.head_dim ** -0.5
    window = pcfg.max_pages_per_seq * pcfg.page_size

    def step(params, pools, tokens, lengths, tables, wpage, woff, active):
        b, t = tokens.shape
        assert t == 1
        positions = lengths[:, None]
        embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
        x = embd[tokens]
        dt = x.dtype
        factors = None
        if cfg.longrope:
            factors = (params["rope_factors_long.weight"]
                       if window > cfg.n_ctx_orig
                       else params["rope_factors_short.weight"])
        new_pools = list(pools)
        for i in range(cfg.n_layer):
            pre = f"blk.{i}."
            h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)
            q = _linear(h, params[pre + "attn_q.weight"]).reshape(b, 1, cfg.n_head, cfg.head_dim)
            k = _linear(h, params[pre + "attn_k.weight"]).reshape(b, 1, cfg.n_head_kv, cfg.head_dim)
            v = _linear(h, params[pre + "attn_v.weight"]).reshape(b, 1, cfg.n_head_kv, cfg.head_dim)
            q = _rope_phi3(q, positions, cfg, factors)[:, 0]  # (B, Hq, D)
            k = _rope_phi3(k, positions, cfg, factors)[:, 0]  # (B, Hkv, D)
            v = v[:, 0]

            kp, vp = new_pools[i]
            cdt = kp.dtype
            kp = paged_write(kp, k.astype(cdt), wpage, woff)
            vp = paged_write(vp, v.astype(cdt), wpage, woff)
            new_pools[i] = (kp, vp)

            kwin = jax.vmap(lambda tr: paged_gather(kp, tr))(tables)  # (B,Hkv,W,D)
            vwin = jax.vmap(lambda tr: paged_gather(vp, tr))(tables)

            qh = q.reshape(b, cfg.n_head_kv, rep, cfg.head_dim)
            att = jnp.einsum(
                "bgrd,bgkd->bgrk", qh.astype(jnp.float32), kwin.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * scale
            kv_pos = jnp.arange(window)[None, None, None, :]
            q_pos = lengths[:, None, None, None]
            keep = kv_pos <= q_pos
            if cfg.sliding_window:
                keep = keep & (kv_pos > q_pos - cfg.sliding_window)
            att = jnp.where(keep, att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1).astype(vwin.dtype)
            out = jnp.einsum("bgrk,bgkd->bgrd", att, vwin)
            attn_out = out.reshape(b, 1, cfg.n_head * cfg.head_dim).astype(dt)
            x = x + _linear(attn_out, params[pre + "attn_output.weight"])

            h2 = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
            gate = _linear(h2, params[pre + "ffn_gate.weight"])
            up = _linear(h2, params[pre + "ffn_up.weight"])
            x = x + _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"])

        x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
        w_out = params.get("output.weight", params["token_embd.weight"])
        logits = _linear(x, w_out)[:, 0]
        logits = jnp.where(active[:, None], logits, 0.0)
        return logits, tuple(new_pools)

    return jax.jit(step, donate_argnums=(1,))


def _make_paged_step_deepseek(model, pcfg: PagedConfig):
    """DeepSeek absorbed-MLA paged step: the page pools hold the COMPRESSED
    latent (kv_lora_rank) and the shared rope key (qk_rope_dim) per token —
    the ~57x-per-byte cache win survives paging.  Matches
    models/deepseek.forward exactly (paged == dense gated by
    tests/test_paged_deepseek.py)."""
    from .models.deepseek import _linear, _rms_norm, _rope_half, _deinterleave, _moe_block

    cfg = model.cfg
    H, nope, rope_d = cfg.n_head, cfg.qk_nope_dim, cfg.qk_rope_dim
    scale = cfg.attn_scale or cfg.qk_head_dim ** -0.5
    window = pcfg.max_pages_per_seq * pcfg.page_size
    hp = jax.lax.Precision.HIGHEST

    def step(params, pools, tokens, lengths, tables, wpage, woff, active):
        b, t = tokens.shape
        assert t == 1
        positions = lengths[:, None]
        embd = params.get("token_embd.weight@dense", params["token_embd.weight"])
        x = embd[tokens]
        new_pools = list(pools)
        for i in range(cfg.n_layer):
            pre = f"blk.{i}."
            h = _rms_norm(x, params[pre + "attn_norm.weight"], cfg.rms_eps)

            if cfg.q_lora_rank:
                qa = _rms_norm(_linear(h, params[pre + "attn_q_a.weight"]),
                               params[pre + "attn_q_a_norm.weight"], cfg.rms_eps)
                q = _linear(qa, params[pre + "attn_q_b.weight"])
            else:
                q = _linear(h, params[pre + "attn_q.weight"])
            q = q.reshape(b, 1, H, cfg.qk_head_dim)
            q_pass, q_rot = q[..., :nope], q[..., nope:]

            ckv = _linear(h, params[pre + "attn_kv_a_mqa.weight"])
            c_t, krot_t = ckv[..., : cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank:]
            c_t = _rms_norm(c_t, params[pre + "attn_kv_a_norm.weight"], cfg.rms_eps)

            if cfg.rope_interleave:
                q_rot = _deinterleave(q_rot)
                krot_t = _deinterleave(krot_t)
            q_rot = _rope_half(q_rot, positions, cfg.rope_base)
            krot_t = _rope_half(krot_t[:, :, None, :], positions,
                                cfg.rope_base)[:, :, 0, :]

            cp, kp = new_pools[i]
            cdt = cp.dtype
            cp = paged_write(cp, c_t.astype(cdt), wpage, woff)   # (B,1,rank)
            kp = paged_write(kp, krot_t.astype(cdt), wpage, woff)
            new_pools[i] = (cp, kp)

            cwin = jax.vmap(lambda tr: paged_gather(cp, tr))(tables)[:, 0]   # (B,W,rank)
            kwin = jax.vmap(lambda tr: paged_gather(kp, tr))(tables)[:, 0]   # (B,W,rope_d)

            w_kv_b = params[pre + "attn_kv_b.weight"].reshape(
                H, nope + cfg.v_head_dim, cfg.kv_lora_rank)
            w_uk, w_uv = w_kv_b[:, :nope, :], w_kv_b[:, nope:, :]
            q_eff = jnp.einsum("bthn,hnr->bthr", q_pass, w_uk, precision=hp)

            att = (jnp.einsum("bthr,bsr->bhts", q_eff.astype(jnp.float32),
                              cwin.astype(jnp.float32), precision=hp)
                   + jnp.einsum("bthp,bsp->bhts", q_rot.astype(jnp.float32),
                                kwin.astype(jnp.float32), precision=hp))
            kv_pos = jnp.arange(window)[None, None, None, :]
            mask = kv_pos <= lengths[:, None, None, None]
            att = jnp.where(mask, att * scale, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1)

            ctx = jnp.einsum("bhts,bsr->bthr", att, cwin.astype(jnp.float32),
                             precision=hp).astype(x.dtype)
            o = jnp.einsum("bthr,hvr->bthv", ctx, w_uv, precision=hp)
            x = x + _linear(o.reshape(b, 1, H * cfg.v_head_dim),
                            params[pre + "attn_output.weight"])

            h = _rms_norm(x, params[pre + "ffn_norm.weight"], cfg.rms_eps)
            if i < cfg.n_dense_lead or cfg.n_expert == 0:
                gate = _linear(h, params[pre + "ffn_gate.weight"])
                up = _linear(h, params[pre + "ffn_up.weight"])
                x = x + _linear(jax.nn.silu(gate) * up, params[pre + "ffn_down.weight"])
            else:
                x = x + _moe_block(params, pre, h, cfg)

        x = _rms_norm(x, params["output_norm.weight"], cfg.rms_eps)
        w_out = params.get("output.weight", params.get("token_embd.weight@dense",
                                                       params["token_embd.weight"]))
        logits = _linear(x, w_out)[:, 0]
        logits = jnp.where(active[:, None], logits, 0.0)
        return logits, tuple(new_pools)

    return jax.jit(step, donate_argnums=(1,))
