"""Continuous-batching generation engine — the serving control plane.

The reference has no serving design to mirror (its RPC backend is a blocking
star topology, SURVEY.md §5); its closest analog is the slot/seq-id KV cache
in examples/gpt-2/main-batched.cpp:41-145. This engine is the TPU-native
production shape: a fixed pool of KV-cache slots, ONE compiled batched decode
step reused every tick (static shapes, donated cache), per-slot sequence
positions (vmapped cache writes), admission when slots free up, and greedy or
top-k sampling. Requests enter and leave the batch at any tick without
recompilation — the "zero-alloc steady state" idea extended to multi-tenant
serving.
"""

from __future__ import annotations

import collections
import os
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class _PrefillShare:
    """Lazily-computed shared prefill for forked requests (the shared-prefix
    batching of examples/gpt-2/main-batched.cpp:81-145: one prompt evaluated
    once, its KV cache copied into every sequence's slot)."""

    logits: Any = None  # (1, vocab) last-position logits
    cache: Any = None  # single-slot cache pytree
    t: int = 0


@dataclass
class Request:
    rid: int
    prompt: np.ndarray  # (t,) int32
    max_new_tokens: int
    out: list = field(default_factory=list)
    done: bool = False
    on_token: Callable | None = None  # streaming callback (rid, token, done)
    priority: int = 0  # lower = more urgent
    preempted: int = 0  # times evicted back to the queue
    # per-request sampling overrides ({"temperature", "top_p"}; top_k is
    # engine-static): temperature == 0 means exact greedy for this request
    sampling: dict | None = None
    share: "_PrefillShare | None" = None  # forked-generation prefill share
    # device->host KV snapshot taken at eviction: {"cache": host pytree,
    # "n_past": int, "cur_tok": int, "draft": host pytree | None}.  Resume
    # restores it instead of re-prefilling the whole sequence (prefill is
    # counted once per request even under preemption).
    snapshot: dict | None = None

    @property
    def seq(self) -> np.ndarray:
        """Prompt plus generated-so-far: the prefill input on (re)admission —
        a preempted request resumes by re-prefilling its full sequence."""
        if not self.out:
            return self.prompt
        return np.concatenate([self.prompt, np.asarray(self.out, np.int32)])


def _recurrent_engine_forward(fwd):
    """Family-signature adapter for recurrent models (Mamba v1/v2):
    positions/cache_len are vestigial (the conv window + ssm state ARE the
    sequence memory)."""

    def adapted(params, cfg, tokens, pos_start, state, cache_len, *,
                prefill=False):
        del pos_start, cache_len, prefill
        return fwd(params, cfg, tokens, state)

    return adapted


# rounds per pipelined greedy speculative stretch: one dispatch + one fetch
# covers R draft+verify rounds (window margin reserves R*(draft_k+1) rows)
SPEC_STRETCH = 4


class Engine:
    """model: object exposing params, cfg, and a forward(params, cfg, tokens,
    pos_start, cache, cache_len) supporting per-row cache_len vectors
    (models/llama.py). max_batch slots share one cache."""

    def __init__(self, model, max_batch: int = 4, max_seq: int = 512, eos_id: int = -1,
                 cache_dtype=jnp.bfloat16, sampler: dict | None = None, seed: int = 0,
                 paged=None, draft=None, draft_k: int = 4,
                 forward_fn=None, cache_put=None, prefill_chunk: int | None = None,
                 horizon: int | None = None):
        """sampler: None = greedy argmax; or kwargs for
        sampling.sample_top_k_top_p (temperature/top_k/top_p) applied
        per-slot on device with an engine-owned PRNG key.

        paged: optional paged_kv.PagedConfig — KV memory becomes a shared
        page pool (capacity = sum of live contexts, not max_batch x max_seq);
        slots that run out of pages evict the lowest-priority running
        request back to the queue.  Llama-family models only.

        draft: optional smaller model of the same family — every tick runs
        draft_k speculative tokens per slot and ONE (B, k+1) target verify.
        Greedy engines emit tokens IDENTICAL to plain decoding; with a
        sampler configured the tick runs batched rejection sampling
        (lossless in distribution — speculative.py semantics).  Composes
        with paged for llama-family targets (tests/test_serve.py).

        forward_fn: override the model-family forward with any function of
        the same signature — e.g. parallel.tp_inference.make_tp_engine_forward
        for tensor-parallel multi-chip serving.  cache_put: optional callable
        applied to the freshly created KV cache (e.g. a device_put with a
        head-sharded NamedSharding)."""
        from .models import (apertus, bamba, bloom, cohere, dbrx, deepseek,
                             falcon,
                             gemma2, glm4, glm4moe, gpt2, gptj, gptoss,
                             granitehybrid,
                             jamba, lfm2, llama, llama4, mamba, mamba2,
                             minimax,
                             mpt, nemotron, neox, olmo, olmo2, olmoe,
                             persimmon, phi2, phi3,
                             phimoe, qwen3next, recurrentgemma, stablelm,
                             starcoder, starcoder2, zamba2)

        self.model = model
        self.cfg = model.cfg
        self.max_batch = max_batch
        self.max_seq = max_seq
        self.eos_id = eos_id
        # recurrent (O(1)-state) families: the "cache" is per-slot conv/ssm
        # state, positions are vestigial, and prefill must be EXACT-length
        # (pad tokens would pollute the recurrence — there is no attention
        # mask to hide them behind).  The llama.cpp analog is its recurrent
        # slot cache for the mamba arch.
        self._recurrent = isinstance(model, (mamba.Mamba, mamba2.Mamba2))
        if forward_fn is not None:
            self._fwd = forward_fn
        elif isinstance(model, llama.Llama):
            self._fwd = llama.forward
        elif isinstance(model, gptj.GPTJ):
            self._fwd = gptj.forward
        elif isinstance(model, gpt2.GPT2):
            self._fwd = gpt2.forward
        elif isinstance(model, gemma2.Gemma2):
            self._fwd = gemma2.forward
        elif isinstance(model, phi2.Phi2):
            self._fwd = phi2.forward
        elif isinstance(model, phi3.Phi3):
            self._fwd = phi3.forward
        elif isinstance(model, bloom.Bloom):
            self._fwd = bloom.forward
        elif isinstance(model, mpt.MPT):
            self._fwd = mpt.forward
        elif isinstance(model, starcoder.StarCoder):
            self._fwd = starcoder.forward
        elif isinstance(model, starcoder2.StarCoder2):
            self._fwd = starcoder2.forward
        elif isinstance(model, cohere.Cohere):
            self._fwd = cohere.forward
        elif isinstance(model, olmo2.Olmo2):
            self._fwd = olmo2.forward
        elif isinstance(model, nemotron.Nemotron):
            self._fwd = nemotron.forward
        elif isinstance(model, stablelm.StableLM):
            self._fwd = stablelm.forward
        elif isinstance(model, glm4.GLM4):
            self._fwd = glm4.forward
        elif isinstance(model, glm4moe.GLM4MoE):
            self._fwd = glm4moe.forward
        elif isinstance(model, dbrx.DBRX):
            self._fwd = dbrx.forward
        elif isinstance(model, phimoe.PhiMoE):
            self._fwd = phimoe.forward
        elif isinstance(model, olmoe.OlmoE):
            self._fwd = olmoe.forward
        elif isinstance(model, bamba.Bamba):
            # hybrid: positions drive the attention layers; the SSD layers
            # carry their own state in the same (mixed) cache pytree.
            # Prefill must be EXACT-length — bucket pads would pollute the
            # SSD recurrence (the attention mask can't hide them there).
            self._fwd = bamba.forward
            self._exact_prefill = True
        elif isinstance(model, qwen3next.Qwen3Next):
            # deltanet hybrid: same mixed-state discipline as bamba
            self._fwd = qwen3next.forward
            self._exact_prefill = True
        elif isinstance(model, jamba.Jamba):
            self._fwd = jamba.forward
            self._exact_prefill = True
        elif isinstance(model, granitehybrid.GraniteHybrid):
            self._fwd = granitehybrid.forward
            self._exact_prefill = True
        elif isinstance(model, minimax.MiniMax):
            # lightning-attention hybrid: pads would decay into the state
            self._fwd = minimax.forward
            self._exact_prefill = True
        elif isinstance(model, zamba2.Zamba2):
            self._fwd = zamba2.forward
            self._exact_prefill = True
        elif isinstance(model, recurrentgemma.RecurrentGemma):
            # RG-LRU hybrid: pads would poison the conv/LRU recurrence
            self._fwd = recurrentgemma.forward
            self._exact_prefill = True
        elif isinstance(model, lfm2.LFM2):
            # short-conv hybrid: trailing pads would poison the conv window
            self._fwd = lfm2.forward
            self._exact_prefill = True
        elif isinstance(model, llama4.Llama4):
            self._fwd = llama4.forward
        elif isinstance(model, apertus.Apertus):
            self._fwd = apertus.forward
        elif isinstance(model, olmo.Olmo):
            self._fwd = olmo.forward
        elif isinstance(model, persimmon.Persimmon):
            self._fwd = persimmon.forward
        elif isinstance(model, neox.NeoX):
            self._fwd = neox.forward
        elif isinstance(model, falcon.Falcon):
            self._fwd = falcon.forward
        elif isinstance(model, gptoss.GptOss):
            self._fwd = gptoss.forward
        elif isinstance(model, deepseek.Deepseek):
            # MLA family: the engine carries the COMPRESSED latent cache per
            # slot — (kv_lora_rank + rope_dim)/token instead of 2*H*head_dim,
            # so continuous batching holds ~57x more context per HBM byte on
            # DeepSeek-V3 shapes
            self._fwd = deepseek.forward
        elif self._recurrent:
            self._fwd = _recurrent_engine_forward(
                mamba2.forward if isinstance(model, mamba2.Mamba2)
                else mamba.forward)
        else:
            raise TypeError(f"Engine cannot drive {type(model).__name__}")
        if (self._recurrent or getattr(self, "_exact_prefill", False)) and (
                paged is not None or draft is not None or prefill_chunk):
            raise ValueError(
                "recurrent-state (and hybrid SSD) models drive the plain "
                "dense engine path (no paged KV, no speculative draft, no "
                "chunked prefill — state cannot be paged or rolled back)"
            )

        # feature x family gate: every request is checked against the
        # test-enforced capability matrix (serving_matrix.features_for), so
        # an unsupported combination fails HERE with the matrix's answer
        # instead of crashing downstream (docs/serving.md carries the table)
        from .models.common import QUANT_KV_DTYPE as _QKV
        from .serving_matrix import features_for as _features_for

        _feats = _features_for(model)
        for _flag, _feat in ((paged is not None, "paged_kv"),
                             (draft is not None, "speculative"),
                             (cache_dtype == _QKV, "q8_kv"),
                             (bool(prefill_chunk), "chunked_prefill")):
            if _flag and not _feats[_feat]:
                raise TypeError(
                    f"{type(model).__name__} does not support '{_feat}' "
                    "(see docs/serving.md feature matrix)"
                )

        cfgv = self.cfg
        from .models.common import init_layer_cache

        if self._recurrent:
            _rinit = (mamba2.init_state if isinstance(model, mamba2.Mamba2)
                      else mamba.init_state)
            self._make_cache = lambda b: _rinit(cfgv, b, cache_dtype)
        elif isinstance(model, deepseek.Deepseek):
            self._make_cache = lambda b: deepseek.init_cache(
                cfgv, b, max_seq, cache_dtype)
        elif isinstance(model, bamba.Bamba):
            self._make_cache = lambda b: bamba.init_cache(
                cfgv, b, max_seq, cache_dtype)
        elif isinstance(model, qwen3next.Qwen3Next):
            self._make_cache = lambda b: qwen3next.init_cache(
                cfgv, b, max_seq, cache_dtype)
        elif isinstance(model, jamba.Jamba):
            self._make_cache = lambda b: jamba.init_cache(
                cfgv, b, max_seq, cache_dtype)
        elif isinstance(model, recurrentgemma.RecurrentGemma):
            self._make_cache = lambda b: recurrentgemma.init_cache(
                cfgv, b, max_seq, cache_dtype)
        elif isinstance(model, lfm2.LFM2):
            self._make_cache = lambda b: lfm2.init_cache(
                cfgv, b, max_seq, cache_dtype)
        elif isinstance(model, granitehybrid.GraniteHybrid):
            self._make_cache = lambda b: granitehybrid.init_cache(
                cfgv, b, max_seq, cache_dtype)
        elif isinstance(model, minimax.MiniMax):
            self._make_cache = lambda b: minimax.init_cache(
                cfgv, b, max_seq, cache_dtype)
        elif isinstance(model, zamba2.Zamba2):
            self._make_cache = lambda b: zamba2.init_cache(
                cfgv, b, max_seq, cache_dtype)
        else:
            n_kv = getattr(cfgv, "n_head_kv", cfgv.n_head)
            self._make_cache = lambda b: init_layer_cache(
                cfgv.n_layer, b, n_kv, max_seq, cfgv.head_dim, cache_dtype
            )
        self.paged = paged
        if paged is not None:
            from .models import llama as _llama
            from .paged_kv import PagedKVManager, make_paged_decode_step

            from .models import deepseek as _deepseek
            from .models.common import QUANT_KV_DTYPE

            if cache_dtype == QUANT_KV_DTYPE:
                raise ValueError("q8 KV cache is dense-engine only (the page "
                                 "pools keep their own dtype)")
            if paged.page_size * paged.max_pages_per_seq < max_seq:
                raise ValueError("paged logical window smaller than max_seq")
            if isinstance(model, _deepseek.Deepseek):
                # MLA pools the compressed latent + rope key (asymmetric pair)
                self.mgr = PagedKVManager(
                    cfgv.n_layer, 1, (cfgv.kv_lora_rank, cfgv.qk_rope_dim),
                    max_batch, paged, cache_dtype
                )
            else:
                self.mgr = PagedKVManager(
                    cfgv.n_layer, n_kv, cfgv.head_dim, max_batch, paged, cache_dtype
                )
            self._paged_step = make_paged_decode_step(model, paged,
                                                      forward_fn=self._fwd)
            from .paged_kv import make_paged_decode_scan

            self._paged_scan = make_paged_decode_scan(self._paged_step)
            self.cache = None
        else:
            self.cache = self._make_cache(max_batch)
            if cache_put is not None:
                self.cache = cache_put(self.cache)
        self._cache_dtype = cache_dtype
        self._cache_put_slot = cache_put  # single-slot prefill caches too
        self.prefill_chunk = prefill_chunk  # fixed-chunk prefill (one program)
        self._chunk_step = None
        self._chunk_multi = None  # compiled (B, C) batched chunk program
        self._chunk_scatter = None  # compiled group->engine cache install
        # multi-step dense ticks: h decode steps per host dispatch (CUDA
        # Graphs analog; ~140 ms relay round trip per dispatch otherwise).
        # Greedy output is identical to horizon=1 — EOS/budget/window stops
        # run ON DEVICE inside the scan (identical rules to the host trim);
        # tokens stream to on_token in horizon-sized bursts.
        self.tick_horizon = (horizon if horizon is not None
                             else int(os.environ.get("GGML_TPU_TICK_HORIZON", "16")))
        # largest power of two <= horizon: ONE compiled scan program (the
        # in-scan window/budget guards make shrinking h unnecessary)
        self._hb = 1
        while self._hb * 2 <= self.tick_horizon:
            self._hb *= 2
        self._prefill_batch_cache = {}  # per-tb compiled multi-slot prefill
        self._draft_prefill_batch_cache = {}  # per-tb batched draft prefill

        self.sampler = dict(sampler) if sampler else None
        self._key = jax.random.PRNGKey(seed)

        def pick(logits2d, key):
            """(B, vocab) logits -> (B,) tokens; greedy or sampled."""
            if self.sampler is None:
                return jnp.argmax(logits2d, axis=-1).astype(jnp.int32), key
            from .sampling import sample_top_k_top_p

            return sample_top_k_top_p(logits2d, key, **self.sampler)

        self._pick = pick
        self._pick_jit = jax.jit(pick)

        # -- per-request sampling (the server path) --------------------------
        # slot-vector temperature/top_p with an engine-static top_k; a slot
        # with temperature == 0 gets exact greedy argmax.  Activated by the
        # first submit(sampling=...) — pure engine-level sampling keeps the
        # original (cheaper) paths and token-for-token reproducibility.
        base_s = self.sampler or {}
        self._default_temp = float(base_s.get("temperature", 1.0)) if self.sampler else 0.0
        self._default_topp = float(base_s.get("top_p", 0.9)) if self.sampler else 1.0
        self._slot_top_k = int(base_s.get("top_k", 40))
        self._slot_temp = np.full(max_batch, self._default_temp, np.float32)
        self._slot_topp = np.full(max_batch, self._default_topp, np.float32)
        self._any_slot_sampling = False

        def pick_slot_vec(logits2d, key, temp, topp):
            """(B, vocab) logits + per-slot (B,) temperature/top_p."""
            from .sampling import sample_top_k_top_p

            k = min(self._slot_top_k, logits2d.shape[-1])
            sampled, key = sample_top_k_top_p(
                logits2d, key, temperature=jnp.maximum(temp, 1e-6)[:, None],
                top_k=k, top_p=topp[:, None])
            greedy = jnp.argmax(logits2d, axis=-1).astype(jnp.int32)
            return jnp.where(temp > 0, sampled, greedy), key

        self._pick_slot_vec_jit = jax.jit(pick_slot_vec)

        def step_vec(params, cache, tokens, n_past, active, key, temp, topp):
            logits, cache = self._fwd(params, cfgv, tokens, n_past, cache, n_past)
            nxt, key = pick_slot_vec(logits[:, -1, :], key, temp, topp)
            nxt = jnp.where(active, nxt, 0)
            return nxt, cache, key

        self._step_vec = jax.jit(step_vec, donate_argnums=(1,))

        def step(params, cache, tokens, n_past, active, key):
            """tokens (B,1); n_past (B,) per-slot positions; active (B,) bool.
            Returns (next_token (B,), cache, key)."""
            logits, cache = self._fwd(params, cfgv, tokens, n_past, cache, n_past)
            nxt, key = pick(logits[:, -1, :], key)
            nxt = jnp.where(active, nxt, 0)
            return nxt, cache, key

        self._step = jax.jit(step, donate_argnums=(1,))

        max_seq_v = self.max_seq
        eos_v = self.eos_id

        def step_scan(params, cache, tokens, n_past, alive, budget, key,
                      temp, topp, h: int, sampled: bool):
            """h decode steps in ONE dispatch (jitted lax.scan) — the analog
            of the reference capturing repeated decode graphs as CUDA Graphs
            (src/ggml-cuda/ggml-cuda.cu:2418): per-step host round trips cost
            ~140 ms over the relay, so multi-step ticks dominate serve
            throughput.  EOS / token-budget / context-window stops apply IN
            the scan with exactly the host's trim rules, so the returned
            (token, n_past, alive, budget) state is the true post-tick decode
            state — the next tick can be dispatched from these device arrays
            BEFORE this tick's tokens are fetched (run()'s pipelined
            stretch).  Dead slots keep riding the batch with masked tokens
            and frozen positions; their lane cost is zero extra HBM traffic
            (the weight stream is shared)."""

            def body(carry, _):
                cache, toks, n_past, alive, budget, key = carry
                logits, cache = self._fwd(params, cfgv, toks, n_past, cache, n_past)
                if sampled:
                    nxt, key = pick_slot_vec(logits[:, -1, :], key, temp, topp)
                else:
                    nxt, key = pick(logits[:, -1, :], key)
                nxt = jnp.where(alive, nxt, 0)
                live = alive.astype(jnp.int32)
                n_past = n_past + live
                budget = budget - live
                alive = alive & (nxt != eos_v) & (budget > 0) & (n_past < max_seq_v - 1)
                return (cache, nxt[:, None].astype(jnp.int32), n_past, alive,
                        budget, key), nxt

            (cache, tok, n_past, alive, budget, key), outs = jax.lax.scan(
                body, (cache, tokens, n_past, alive, budget, key), None, length=h)
            # outs (h, B); the scalar state mirrors the host's trim exactly
            return outs, cache, tok, n_past, alive, budget, key

        self._step_scan = jax.jit(step_scan, donate_argnums=(1,),
                                  static_argnums=(9, 10))

        def prefill_one(params, cache_slot, tokens):
            """tokens (1, t) into an empty single-slot cache pytree."""
            logits, cache_slot = self._fwd(
                params, cfgv, tokens, jnp.zeros((1,), jnp.int32), cache_slot, jnp.int32(0),
                prefill=True,
            )
            return logits[:, -1, :], cache_slot

        self._prefill_cache = {}  # per prompt-length compiled prefill
        self._suffix_cache = {}  # per suffix-length compiled prefix-hit prefill
        self._suffix_seed_cache = {}  # per prefix-page-count cache seeding
        self.cached_prefix_tokens = 0  # prefix-cache observability

        self.draft = draft
        self.draft_k = draft_k
        if draft is not None:
            if paged is not None and isinstance(model, deepseek.Deepseek):
                raise ValueError(
                    "speculative + paged KV does not compose for MLA targets "
                    "(asymmetric latent pools need their own verify step)")
            # the draft's forward is its family module's `forward` (every
            # model wrapper lives beside one — the same contract the engine
            # relies on for targets), so ANY dense-KV family drafts
            import importlib

            dfwd = importlib.import_module(type(draft).__module__).forward
            self._draft_fwd = dfwd
            dcfg = draft.cfg
            d_kv = getattr(dcfg, "n_head_kv", dcfg.n_head)
            self.draft_cache = init_layer_cache(
                dcfg.n_layer, max_batch, d_kv, max_seq, dcfg.head_dim, cache_dtype
            )
            kk = draft_k
            # stop margin: room for kk+1 verify writes inside the window
            # (the paged logical window may be tighter than max_seq)
            self._spec_margin = max_seq - draft_k - 2
            if paged is not None:
                self._spec_margin = min(
                    self._spec_margin,
                    paged.max_pages_per_seq * paged.page_size - draft_k - 1)

            def spec_tick(params, dparams, cache, dcache, tokens, n_past, active):
                """One speculative tick for all slots: draft kk tokens each,
                verify with one (B, kk+1) target forward.  Returns per-slot
                draft tokens, target greedy tokens, caches."""

                # draft autoregressively with per-slot positions
                dc = dcache
                tok = tokens
                drafts = []
                for j in range(kk):
                    lg, dc = dfwd(dparams, dcfg, tok, n_past + j, dc, n_past + j)
                    tok = jnp.argmax(lg[:, -1, :], -1).astype(jnp.int32)[:, None]
                    drafts.append(tok[:, 0])
                # extra draft step writes d_kk's KV at n_past+kk so a fully
                # accepted round leaves no permanent hole in the draft cache
                # (see speculative.py one_round); its logits are discarded
                _, dc = dfwd(dparams, dcfg, tok, n_past + kk, dc, n_past + kk)
                drafts = jnp.stack(drafts, 1)  # (B, kk)
                seq = jnp.concatenate([tokens, drafts], 1)  # (B, kk+1)
                tlg, cache = self._fwd(params, cfgv, seq, n_past, cache, n_past)
                greedy = jnp.argmax(tlg, -1).astype(jnp.int32)  # (B, kk+1)
                return drafts, greedy, cache, dc

            self._spec_tick = jax.jit(spec_tick, donate_argnums=(2, 3))

            # pipelined GREEDY spec stretch: R draft+verify rounds with the
            # accept rule computed IN-scan — one dispatch + one fetch per R
            # rounds instead of a host round trip per round (the relay trip
            # costs more than the verify itself; measured 42-128 tok/s of
            # pure drift on the per-tick path).  Device state advances
            # optimistically (EOS unknowable on device); the host consumes
            # blocks with the real stop rules and re-passes corrected
            # n_past next stretch — junk rows past it are position-masked.
            def spec_stretch(params, dparams, cache, dcache, tokens, n_past,
                             active):
                kk1 = kk + 1

                def body(carry, _):
                    cache, dcache, tok, np_ = carry
                    drafts, greedy, cache, dcache = spec_tick(
                        params, dparams, cache, dcache, tok, np_, active)
                    match = drafts == greedy[:, :kk]
                    ext = jnp.concatenate(
                        [match, jnp.zeros((match.shape[0], 1), bool)], 1)
                    n_acc = jnp.argmin(ext, axis=1).astype(jnp.int32)
                    correction = jnp.take_along_axis(
                        greedy, n_acc[:, None], 1)[:, 0]
                    block = jnp.concatenate(
                        [drafts, jnp.zeros((drafts.shape[0], 1), jnp.int32)], 1)
                    block = jnp.where(
                        jnp.arange(kk1)[None, :] == n_acc[:, None],
                        correction[:, None], block)
                    np_ = np_ + jnp.where(active, n_acc + 1, 0)
                    tok = jnp.where(active, correction, tok[:, 0])[:, None]
                    return (cache, dcache, tok, np_), (block, n_acc)

                (cache, dcache, _, _), (blocks, n_accs) = jax.lax.scan(
                    body, (cache, dcache, tokens, n_past), None,
                    length=SPEC_STRETCH)
                return blocks, n_accs, cache, dcache

            self._spec_stretch = jax.jit(spec_stretch, donate_argnums=(2, 3))

            def spec_tick_sampled(params, dparams, cache, dcache, tokens, n_past,
                                  active, key):
                """Batched rejection-sampling tick (speculative.py semantics
                per slot): drafts sampled from the draft's warped dist, one
                (B, kk+1) target verify, accept d_i w.p. min(1, p/q), the
                correction drawn from norm(max(p-q, 0)) (or p on full
                acceptance).  Returns (drafts, n_acc, correction, caches,
                key) — the host emits drafts[:n_acc] + correction."""
                from .sampling import warp_logits

                skw = self.sampler
                key, k_draft, k_acc, k_corr = jax.random.split(key, 4)
                dc = dcache
                tok = tokens
                drafts, q_rows = [], []
                for j, dk in enumerate(jax.random.split(k_draft, kk)):
                    lg, dc = dfwd(dparams, dcfg, tok, n_past + j, dc, n_past + j)
                    wl = warp_logits(lg[:, -1, :], **skw)
                    q_rows.append(jax.nn.log_softmax(wl, axis=-1))
                    tok = jax.random.categorical(dk, wl, axis=-1).astype(jnp.int32)[:, None]
                    drafts.append(tok[:, 0])
                # extra draft step: write d_kk's KV (no hole on full accept)
                _, dc = dfwd(dparams, dcfg, tok, n_past + kk, dc, n_past + kk)
                drafts = jnp.stack(drafts, 1)  # (B, kk)
                q_logp = jnp.stack(q_rows, 1)  # (B, kk, V)

                seq = jnp.concatenate([tokens, drafts], 1)
                tlg, cache = self._fwd(params, cfgv, seq, n_past, cache, n_past)
                p_logp = jax.nn.log_softmax(warp_logits(tlg, **skw), axis=-1)  # (B, kk+1, V)

                p_d = jnp.take_along_axis(p_logp[:, :kk, :], drafts[..., None], -1)[..., 0]
                q_d = jnp.take_along_axis(q_logp, drafts[..., None], -1)[..., 0]
                accept = jax.random.uniform(k_acc, drafts.shape) < jnp.exp(p_d - q_d)
                b = drafts.shape[0]
                ext = jnp.concatenate([accept, jnp.zeros((b, 1), bool)], 1)
                n_acc = jnp.argmin(ext, axis=1).astype(jnp.int32)  # (B,)

                p_row = jnp.take_along_axis(p_logp, n_acc[:, None, None], 1)[:, 0]
                q_row = jnp.where(
                    (n_acc < kk)[:, None],
                    jnp.take_along_axis(q_logp, jnp.minimum(n_acc, kk - 1)[:, None, None], 1)[:, 0],
                    -jnp.inf,
                )
                residual = jnp.clip(jnp.exp(p_row) - jnp.exp(q_row), 0.0, None)
                total = residual.sum(-1, keepdims=True)
                probs = jnp.where(total > 1e-12, residual / jnp.maximum(total, 1e-12),
                                  jnp.exp(p_row))
                correction = jax.random.categorical(
                    k_corr, jnp.log(probs + 1e-30), axis=-1
                ).astype(jnp.int32)
                return drafts, n_acc, correction, cache, dc, key

            self._spec_tick_sampled = jax.jit(spec_tick_sampled, donate_argnums=(2, 3))

            # pipelined SAMPLED spec stretch (the greedy stretch's sibling):
            # R rejection-sampling rounds per dispatch; the emitted block is
            # assembled in-scan exactly as the host loop would
            def spec_stretch_sampled(params, dparams, cache, dcache, tokens,
                                     n_past, active, key):
                kk1 = kk + 1

                def body(carry, _):
                    cache, dcache, tok, np_, key = carry
                    (drafts, n_acc, correction, cache, dcache, key) = (
                        spec_tick_sampled(params, dparams, cache, dcache,
                                          tok, np_, active, key))
                    block = jnp.concatenate(
                        [drafts, jnp.zeros((drafts.shape[0], 1), jnp.int32)], 1)
                    block = jnp.where(
                        jnp.arange(kk1)[None, :] == n_acc[:, None],
                        correction[:, None], block)
                    np_ = np_ + jnp.where(active, n_acc + 1, 0)
                    tok = jnp.where(active, correction, tok[:, 0])[:, None]
                    return (cache, dcache, tok, np_, key), (block, n_acc)

                (cache, dcache, _, _, key), (blocks, n_accs) = jax.lax.scan(
                    body, (cache, dcache, tokens, n_past, key), None,
                    length=SPEC_STRETCH)
                return blocks, n_accs, cache, dcache, key

            self._spec_stretch_sampled = jax.jit(
                spec_stretch_sampled, donate_argnums=(2, 3))
            self._draft_prefill = jax.jit(
                lambda dp, dc, toks: dfwd(dp, dcfg, toks, jnp.zeros((toks.shape[0],), jnp.int32), dc, jnp.int32(0), prefill=True)[1]
            )
            # speculative x paged compose: the verify forward writes its
            # kk+1 KV rows straight into the slots' PAGES (one multi-token
            # paged step); the draft keeps its own dense cache.  Rejected
            # rows are junk past the accepted length — masked by position
            # and overwritten by the next tick at the same (page, offset).
            if paged is not None:
                from .paged_kv import (_make_paged_llama_general,
                                       _make_paged_multi_generic)

                # llama keeps its specialized multi-token body; every other
                # dense-KV family verifies through the generic family-forward
                # adapter (same composition as the paged decode step)
                pverify = (_make_paged_llama_general(model, paged)
                           if isinstance(model, llama.Llama)
                           else _make_paged_multi_generic(model, paged,
                                                          self._fwd))

                def spec_tick_paged(params, dparams, pools, dcache, tokens,
                                    n_past, tables, wpages, woffs, active):
                    dc = dcache
                    tok = tokens
                    drafts = []
                    for j in range(kk):
                        lg, dc = dfwd(dparams, dcfg, tok, n_past + j, dc, n_past + j)
                        tok = jnp.argmax(lg[:, -1, :], -1).astype(jnp.int32)[:, None]
                        drafts.append(tok[:, 0])
                    _, dc = dfwd(dparams, dcfg, tok, n_past + kk, dc, n_past + kk)
                    drafts = jnp.stack(drafts, 1)  # (B, kk)
                    seq = jnp.concatenate([tokens, drafts], 1)  # (B, kk+1)
                    tlg, pools = pverify(params, pools, seq, n_past, tables,
                                         wpages, woffs, active)
                    greedy = jnp.argmax(tlg, -1).astype(jnp.int32)  # (B, kk+1)
                    return drafts, greedy, pools, dc

                self._spec_tick_paged = jax.jit(
                    spec_tick_paged, donate_argnums=(2, 3))

                def spec_tick_paged_sampled(params, dparams, pools, dcache,
                                            tokens, n_past, tables, wpages,
                                            woffs, active, key):
                    from .sampling import warp_logits

                    skw = self.sampler
                    key, k_draft, k_acc, k_corr = jax.random.split(key, 4)
                    dc = dcache
                    tok = tokens
                    drafts, q_rows = [], []
                    for j, dk in enumerate(jax.random.split(k_draft, kk)):
                        lg, dc = dfwd(dparams, dcfg, tok, n_past + j, dc, n_past + j)
                        wl = warp_logits(lg[:, -1, :], **skw)
                        q_rows.append(jax.nn.log_softmax(wl, axis=-1))
                        tok = jax.random.categorical(dk, wl, axis=-1).astype(jnp.int32)[:, None]
                        drafts.append(tok[:, 0])
                    _, dc = dfwd(dparams, dcfg, tok, n_past + kk, dc, n_past + kk)
                    drafts = jnp.stack(drafts, 1)
                    q_logp = jnp.stack(q_rows, 1)
                    seq = jnp.concatenate([tokens, drafts], 1)
                    tlg, pools = pverify(params, pools, seq, n_past, tables,
                                         wpages, woffs, active)
                    p_logp = jax.nn.log_softmax(warp_logits(tlg, **skw), axis=-1)
                    p_d = jnp.take_along_axis(p_logp[:, :kk, :], drafts[..., None], -1)[..., 0]
                    q_d = jnp.take_along_axis(q_logp, drafts[..., None], -1)[..., 0]
                    accept = jax.random.uniform(k_acc, drafts.shape) < jnp.exp(p_d - q_d)
                    b = drafts.shape[0]
                    ext = jnp.concatenate([accept, jnp.zeros((b, 1), bool)], 1)
                    n_acc = jnp.argmin(ext, axis=1).astype(jnp.int32)
                    p_row = jnp.take_along_axis(p_logp, n_acc[:, None, None], 1)[:, 0]
                    q_row = jnp.where(
                        (n_acc < kk)[:, None],
                        jnp.take_along_axis(q_logp, jnp.minimum(n_acc, kk - 1)[:, None, None], 1)[:, 0],
                        -jnp.inf,
                    )
                    residual = jnp.clip(jnp.exp(p_row) - jnp.exp(q_row), 0.0, None)
                    total = residual.sum(-1, keepdims=True)
                    probs = jnp.where(total > 1e-12,
                                      residual / jnp.maximum(total, 1e-12),
                                      jnp.exp(p_row))
                    correction = jax.random.categorical(
                        k_corr, jnp.log(probs + 1e-30), axis=-1
                    ).astype(jnp.int32)
                    return drafts, n_acc, correction, pools, dc, key

                self._spec_tick_paged_sampled = jax.jit(
                    spec_tick_paged_sampled, donate_argnums=(2, 3))

        self.slots: list[Request | None] = [None] * max_batch
        self.n_past = np.zeros(max_batch, np.int32)
        self.cur_tok = np.zeros(max_batch, np.int32)
        self.queue: collections.deque[Request] = collections.deque()
        self._rid = 0
        self._prefill_one = prefill_one
        self.prefill_count = 0  # observability (and shared-prefill tests)

    # -- public API -------------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int, on_token=None, priority: int = 0,
               sampling: dict | None = None) -> int:
        """on_token: optional streaming callback (rid, token, done) invoked as
        each token is produced — tokens arrive before the request completes.
        priority: lower is more urgent; when all slots are busy, an arriving
        higher-priority request preempts the lowest-priority running one
        (which is requeued and later resumes by re-prefilling its sequence).
        sampling: per-request {"temperature", "top_p"} overrides (top_k is
        engine-static); temperature == 0 -> exact greedy for this request."""
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        if len(prompt) >= self.max_seq:
            raise ValueError(
                f"prompt length {len(prompt)} exceeds engine max_seq {self.max_seq}"
            )
        if sampling is not None:
            if self.draft is not None:
                raise ValueError("per-request sampling is not supported in "
                                 "speculative mode (engine-level sampler only)")
            bad = set(sampling) - {"temperature", "top_p"}
            if bad:
                raise ValueError(f"unknown sampling keys: {sorted(bad)}")
            self._any_slot_sampling = True
        self._rid += 1
        self.queue.append(
            Request(self._rid, prompt, max_new_tokens, on_token=on_token,
                    priority=priority, sampling=sampling)
        )
        return self._rid

    def submit_many(self, prompt, n: int, max_new_tokens: int, on_token=None,
                    priority: int = 0, sampling: dict | None = None) -> list[int]:
        """Fork n sampled continuations of ONE prompt: the prompt is prefilled
        once and its KV cache copied into every sequence's slot — the
        shared-prefix batching of examples/gpt-2/main-batched.cpp:81-145.
        Meaningful with sampling configured (greedy forks are identical).
        sampling: per-request overrides, as in submit()."""
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        if len(prompt) >= self.max_seq:
            raise ValueError(
                f"prompt length {len(prompt)} exceeds engine max_seq {self.max_seq}"
            )
        if sampling is not None:
            if self.draft is not None:
                raise ValueError("per-request sampling is not supported in "
                                 "speculative mode (engine-level sampler only)")
            self._any_slot_sampling = True
        share = _PrefillShare()
        rids = []
        for _ in range(n):
            self._rid += 1
            self.queue.append(
                Request(self._rid, prompt, max_new_tokens, on_token=on_token,
                        priority=priority, share=share, sampling=sampling)
            )
            rids.append(self._rid)
        return rids

    def cancel(self, rid: int) -> bool:
        """Cancel a queued or in-flight request; its slot frees on the next
        run() sweep.  Returns True if the request was found."""
        for req in list(self.queue):
            if req.rid == rid:
                self.queue.remove(req)
                return True
        for s in self.slots:
            if s is not None and s.rid == rid and not s.done:
                s.done = True
                return True
        return False

    def run(self, bucket: int = 32, abort_callback=None) -> dict[int, list[int]]:
        """Drive to completion; returns {rid: generated token ids}.
        abort_callback: checked per tick, return True to stop early
        (the ggml_abort_callback analog).

        Dense non-speculative engines with a multi-step horizon decode in
        PIPELINED stretches: tick t+1 is dispatched from tick t's
        device-resident (token, position, alive, budget) state BEFORE tick
        t's tokens are fetched, so the per-tick relay round trip and the
        host's token bookkeeping overlap device compute.  The stretch breaks
        back to admission as soon as a slot finishes while work is queued."""
        results: dict[int, list[int]] = {}
        scan_mode = (self.paged is None and self.draft is None and self._hb > 1)
        aborted = False
        while (self.queue or any(s is not None for s in self.slots)) and not aborted:
            if abort_callback is not None and abort_callback():
                break
            self._admit(bucket)
            if scan_mode:
                aborted = self._run_scan_stretch(abort_callback, results, bucket)
            else:
                self._tick()
            for i, s in enumerate(self.slots):
                if s is not None and s.done:
                    results[s.rid] = s.out
                    self.slots[i] = None  # free the slot
                    if self.paged is not None:
                        self.mgr.release(i)
        return results

    # -- internals ----------------------------------------------------------------

    def _consume_spec_blocks(self, blocks: np.ndarray, n_accs: np.ndarray,
                             active) -> None:
        """Apply a fetched speculative stretch — blocks (R, B, kk+1) with
        each round's accepted drafts + correction, n_accs (R, B) — with the
        real EOS/budget/window stops (the device ran optimistically)."""
        for r in range(blocks.shape[0]):
            for i, sl in enumerate(self.slots):
                if sl is None or sl.done or not active[i]:
                    continue
                for tok in blocks[r, i, : n_accs[r, i] + 1]:
                    if sl.done:
                        break
                    tok = int(tok)
                    self.n_past[i] += 1
                    sl.out.append(tok)
                    self.cur_tok[i] = tok
                    if (tok == self.eos_id
                            or len(sl.out) >= sl.max_new_tokens
                            or self.n_past[i] >= self._spec_margin):
                        sl.done = True
                    if sl.on_token is not None:
                        sl.on_token(sl.rid, tok, sl.done)

    def _slot_budget(self) -> np.ndarray:
        """(B,) remaining token budget per slot (0 for empty/done slots) —
        the in-scan stop rule's view of max_new_tokens."""
        return np.array(
            [(s.max_new_tokens - len(s.out))
             if (s is not None and not s.done) else 0 for s in self.slots],
            np.int32)

    def _consume_scan_outs(self, outs: np.ndarray, rids=None) -> bool:
        """Apply one fetched scan tick (h, B) to host state with the SAME
        stop rules the device scan applied (EOS / budget / window), emitting
        streaming callbacks.  rids: per-slot request ids AT DISPATCH TIME —
        a slot freed and re-admitted while this tick was in flight must not
        receive the old request's masked garbage tokens.  Returns True when
        any slot is done (newly or pending sweep)."""
        for j in range(outs.shape[0]):
            for i, s in enumerate(self.slots):
                if s is None or s.done:
                    continue
                if rids is not None and s.rid != rids[i]:
                    continue  # slot re-admitted mid-flight
                self.n_past[i] += 1
                tok = int(outs[j, i])
                s.out.append(tok)
                self.cur_tok[i] = tok
                if (tok == self.eos_id or len(s.out) >= s.max_new_tokens
                        or self.n_past[i] >= self.max_seq - 1):
                    s.done = True
                if s.on_token is not None:
                    s.on_token(s.rid, tok, s.done)
        return any(s is not None and s.done for s in self.slots)

    def _sim_tick(self, n_past, budget, alive, h: int):
        """Advance the host's ALIVE PREDICTION by one in-flight tick using
        the budget/window rules (EOS is unpredictable: predicted optimistic —
        an eos'd slot wastes its lane for at most one extra tick)."""
        emit = np.minimum(h, np.minimum(budget, self.max_seq - 1 - n_past))
        emit = np.where(alive, np.maximum(emit, 0), 0)
        n_past = n_past + emit
        budget = budget - emit
        alive = alive & (budget > 0) & (n_past < self.max_seq - 1)
        return n_past, budget, alive

    def _stretch_admit(self, bucket: int, sampled: bool):
        """Admission WITHOUT draining the pipeline: pop batchable fresh
        requests for the free slots and run ONE chained prefill dispatch
        (XLA orders it after the in-flight tick via the cache data
        dependency; _prefill_into_slots never fetches).  Returns
        (admitted [(slot, req, t)], must_break) — must_break when the
        highest-priority queued request needs the out-of-stretch path
        (snapshot restore, fork share, over-window, or a sampling-mode flip
        that changes the compiled scan program)."""
        admitted: list[tuple[int, Request, int]] = []
        must_break = False
        for i in range(self.max_batch):
            if self.slots[i] is not None or not self.queue:
                continue
            req = min(self.queue, key=lambda r: r.priority)
            if (req.snapshot is not None or req.share is not None
                    or len(req.seq) >= self.max_seq
                    or bool(self._any_slot_sampling) != sampled):
                must_break = True
                break
            self.queue.remove(req)
            self.slots[i] = req
            self._slot_sampling_set(i, req)
            admitted.append((i, req, len(req.seq)))
        if admitted:
            if self.prefill_chunk:
                # one wave of fixed-(B, C) chunk dispatches: no per-bucket
                # compiles, bounded per-dispatch latency inside the stretch
                self._prefill_into_slots_chunked(admitted)
            else:
                groups: dict[int, list] = {}
                for item in admitted:
                    tb = min(self.max_seq, -(-item[2] // bucket) * bucket)
                    groups.setdefault(tb, []).append(item)
                for tb in sorted(groups):
                    self._prefill_into_slots(groups[tb], tb)
        return admitted, must_break

    def _scatter_slot_state(self, tok_d, np_d, alive_d, budget_d, admitted):
        """Overwrite the device-resident decode state for freshly admitted
        slots (one jitted scatter; chains after the prefill dispatch)."""
        B = self.max_batch
        idx = np.full((B,), B, np.int32)  # out of range -> dropped
        v_tok = np.zeros((B,), np.int32)
        v_np = np.zeros((B,), np.int32)
        v_bud = np.zeros((B,), np.int32)
        for r, (i, req, _t) in enumerate(admitted):
            idx[r] = i
            v_tok[r] = self.cur_tok[i]
            v_np[r] = self.n_past[i]
            v_bud[r] = req.max_new_tokens - len(req.out)
        if not hasattr(self, "_scatter_state_jit"):
            def sc(tok, np_, alive, budget, idx, vt, vn, vb):
                tok = tok.at[idx, 0].set(vt, mode="drop")
                np_ = np_.at[idx].set(vn, mode="drop")
                alive = alive.at[idx].set(jnp.ones_like(idx, jnp.bool_),
                                          mode="drop")
                budget = budget.at[idx].set(vb, mode="drop")
                return tok, np_, alive, budget

            self._scatter_state_jit = jax.jit(sc, donate_argnums=(0, 1, 2, 3))
        return self._scatter_state_jit(
            tok_d, np_d, alive_d, budget_d, jnp.asarray(idx),
            jnp.asarray(v_tok), jnp.asarray(v_np), jnp.asarray(v_bud))

    def _run_scan_stretch(self, abort_callback=None, results=None,
                          bucket: int = 32) -> bool:
        """Pipelined multi-step decode (dense path): keep (token, n_past,
        alive, budget, key) DEVICE-resident across ticks and dispatch tick
        t+1 before fetching tick t's outputs — the host's np.asarray fetch
        (one relay round trip) and its token bookkeeping then overlap the
        device executing tick t+1 (the reference amortizes the same per-step
        host cost with CUDA-graph capture, ggml-cuda.cu:2418-2474).

        With `results` provided, ADMISSION RIDES THE PIPELINE TOO: finished
        slots are swept in place and queued fresh requests prefill via a
        chained dispatch + a device scatter of their decode state — the
        pipeline never drains between requests (each in-flight tick carries
        a slot->rid snapshot so a re-admitted slot ignores the old lane's
        masked tokens).  Returns True if the abort callback fired."""
        alive_h = np.array([s is not None and not s.done for s in self.slots])
        if not alive_h.any():
            return False
        hb = self._hb
        budget_h = self._slot_budget()
        tok_d = jnp.asarray(self.cur_tok.reshape(-1, 1))
        np_d = jnp.asarray(self.n_past)
        alive_d = jnp.asarray(alive_h)
        budget_d = jnp.asarray(budget_h)
        temp_d = jnp.asarray(self._slot_temp)
        topp_d = jnp.asarray(self._slot_topp)
        sampled = bool(self._any_slot_sampling)
        # host prediction of which slots are still alive after the in-flight
        # tick (exact for budget/window, optimistic for EOS)
        p_np, p_budget, p_alive = self.n_past.copy(), budget_h.copy(), alive_h.copy()
        pending = None  # (outs, rid-snapshot)

        def rid_snapshot():
            return [s.rid if s is not None else -1 for s in self.slots]

        def drain():
            if pending is not None:
                self._consume_scan_outs(np.asarray(pending[0]), pending[1])

        def sweep():
            freed = False
            for i, s in enumerate(self.slots):
                if s is not None and s.done:
                    results[s.rid] = s.out
                    self.slots[i] = None
                    freed = True
            return freed

        while True:
            if abort_callback is not None and abort_callback():
                drain()
                return True
            must_break = False
            if results is not None and self.queue and any(
                    s is None for s in self.slots):
                admitted, must_break = self._stretch_admit(bucket, sampled)
                if admitted:
                    tok_d, np_d, alive_d, budget_d = self._scatter_slot_state(
                        tok_d, np_d, alive_d, budget_d, admitted)
                    temp_d = jnp.asarray(self._slot_temp)
                    topp_d = jnp.asarray(self._slot_topp)
                    # exact resync: new slots enter the alive prediction;
                    # the in-flight tick never advances them (dead lanes at
                    # ITS dispatch; rid snapshot guards the consume)
                    for (i, req, _t) in admitted:
                        p_np[i] = self.n_past[i]
                        p_budget[i] = req.max_new_tokens - len(req.out)
                        p_alive[i] = True
            if must_break:
                drain()
                if results is not None:
                    sweep()
                return False
            newtick = None
            if p_alive.any():
                (outs, self.cache, tok_d, np_d, alive_d, budget_d,
                 self._key) = self._step_scan(
                    self.model.params, self.cache, tok_d, np_d, alive_d,
                    budget_d, self._key, temp_d, topp_d, hb, sampled)
                newtick = (outs, rid_snapshot())
                p_np, p_budget, p_alive = self._sim_tick(p_np, p_budget, p_alive, hb)
            if pending is not None:
                finished = self._consume_scan_outs(np.asarray(pending[0]),
                                                   pending[1])
                if finished:
                    # resync the prediction from real post-consume state
                    p_alive = np.array(
                        [s is not None and not s.done for s in self.slots])
                    p_budget = self._slot_budget()
                    p_np = self.n_past.copy()
                    if newtick is not None:
                        p_np, p_budget, p_alive = self._sim_tick(
                            p_np, p_budget, p_alive, hb)
                    if results is not None:
                        sweep()  # free slots; next iteration admits in-pipe
                    elif self.queue:
                        # no in-stretch admission (direct _tick-style use):
                        # drain and return to run() for the admission sweep
                        if newtick is not None:
                            self._consume_scan_outs(np.asarray(newtick[0]),
                                                    newtick[1])
                        return False
                if self.queue and not all(s is None or s.done for s in self.slots):
                    # preemption check: an urgent arrival (submitted from a
                    # streaming callback) outranking a running slot must not
                    # wait out the whole stretch
                    head = min(self.queue, key=lambda r: r.priority)
                    running = [s for s in self.slots if s is not None and not s.done]
                    if running and max(r.priority for r in running) > head.priority:
                        if newtick is not None:
                            self._consume_scan_outs(np.asarray(newtick[0]),
                                                    newtick[1])
                        if results is not None:
                            sweep()
                        return False
            pending = newtick
            if pending is None:
                if results is not None:
                    sweep()
                return False

    def _snapshot_slot(self, i: int, req: Request):
        """Device->host KV eviction: spill the slot's KV so resume restores
        it instead of re-prefilling O(context) tokens (the production
        preempt shape; the seq-based recompute path remains as fallback for
        requests without a snapshot)."""
        from .models.common import cache_slot

        n_past = int(self.mgr.lengths[i]) if self.paged is not None else int(self.n_past[i])
        if n_past <= 0:
            return
        if self.paged is None:
            host = jax.device_get(cache_slot(self.cache, i))
        else:
            ps = self.paged.page_size
            npg = -(-n_past // ps)
            pages = np.asarray(self.mgr.tables[i, :npg])
            host = []
            for kp, vp in self.mgr.pools:
                kk = jax.device_get(kp[pages])  # (P, H, ps, D)
                vv = jax.device_get(vp[pages])
                to_slot = lambda a: np.ascontiguousarray(
                    a.transpose(1, 0, 2, 3).reshape(1, a.shape[1], npg * ps, a.shape[3])
                )
                host.append((to_slot(kk), to_slot(vv)))
            host = tuple(host)
        draft_host = None
        if self.draft is not None:
            draft_host = jax.device_get(cache_slot(self.draft_cache, i))
        req.snapshot = {
            "cache": host, "n_past": n_past, "cur_tok": int(self.cur_tok[i]),
            "draft": draft_host,
        }

    def _resume_from_snapshot(self, i: int, req: Request) -> bool:
        """Restore an evicted slot's KV from its host snapshot.  Returns
        False (requeueing the request) when pages are not yet available."""
        from .models.common import cache_set_slot

        snap = req.snapshot
        t = snap["n_past"]
        if self.paged is not None:
            ps = self.paged.page_size
            need = -(-(t + 1) // ps)
            if need > self.mgr.free_pages():
                if self.mgr.free_pages() == self.paged.n_pages:
                    raise ValueError(
                        f"snapshot of {t} tokens cannot fit an empty page "
                        f"pool ({self.paged.n_pages} pages)"
                    )
                self.queue.append(req)
                return False
            assert self.mgr.ensure_capacity(i, t + 1)
            self.mgr.install_prefill(i, jax.tree.map(jnp.asarray, snap["cache"]), t)
            self.mgr.lengths[i] = t
        else:
            self.cache = cache_set_slot(
                self.cache, jax.tree.map(jnp.asarray, snap["cache"]), i
            )
        if self.draft is not None and snap["draft"] is not None:
            self.draft_cache = cache_set_slot(
                self.draft_cache, jax.tree.map(jnp.asarray, snap["draft"]), i
            )
        self.slots[i] = req
        self._slot_sampling_set(i, req)
        self.n_past[i] = t
        self.cur_tok[i] = snap["cur_tok"]
        req.snapshot = None
        return True

    def _preempt_for_priority(self):
        """If the most urgent queued request outranks the least urgent running
        one and no slot is free, evict that slot back to the queue with its
        KV snapshotted to host (restored on resume — no recompute)."""
        if not self.queue or any(s is None for s in self.slots):
            return
        head = min(self.queue, key=lambda r: r.priority)
        running = [
            (i, s) for i, s in enumerate(self.slots) if s is not None and not s.done
        ]
        if not running:
            return
        i, worst = max(running, key=lambda kv: kv[1].priority)
        if worst.priority > head.priority:
            worst.preempted += 1
            self._snapshot_slot(i, worst)
            self.queue.append(worst)
            self.slots[i] = None
            if self.paged is not None:
                self.mgr.release(i)

    def _prefill(self, seq, bucket: int):
        """Run (cached, bucketed) prefill; returns (last logits|None, cache, t, tb).
        logits is None when the bucket padded past t (the caller re-decodes
        the true last token for position-exact logits).

        With prefill_chunk set, long prompts run as ceil(t/chunk) steps of
        ONE compiled fixed-shape program carrying the cache (XLA recompiles
        nothing as prompt lengths vary — the static-shape answer to vLLM's
        chunked prefill, which also bounds per-tick latency spikes)."""
        if self.prefill_chunk:
            return self._prefill_chunked(seq)
        if self._recurrent or getattr(self, "_exact_prefill", False):
            bucket = 1  # exact length: pads would pollute the recurrent state
        t = len(seq)
        tb = min(self.max_seq, -(-t // bucket) * bucket)  # padded prompt bucket
        if tb not in self._prefill_cache:
            self._prefill_cache[tb] = jax.jit(self._prefill_one)
        toks = np.zeros((1, tb), np.int32)
        toks[0, :t] = seq
        slot_cache = self._make_cache(1)
        if self._cache_put_slot is not None:
            slot_cache = self._cache_put_slot(slot_cache)
        self.prefill_count += 1
        logits, slot_cache = self._prefill_cache[tb](
            self.model.params, slot_cache, jnp.asarray(toks)
        )
        if self.draft is not None:  # mirror the prefix into the draft's cache
            from .models.common import init_layer_cache

            dcfg = self.draft.cfg
            d_kv = getattr(dcfg, "n_head_kv", dcfg.n_head)
            dslot = init_layer_cache(
                dcfg.n_layer, 1, d_kv, self.max_seq, dcfg.head_dim,
                self._cache_dtype,
            )
            dslot = self._draft_prefill(self.draft.params, dslot, jnp.asarray(toks))
            self._pending_draft_slot = dslot
        return (logits if t == tb else None), slot_cache, t, tb

    def _prefill_suffix(self, seq, pre_len: int, slot: int, bucket: int):
        """Prefix-cache hit: the shared pages already hold KV for positions
        [0, pre_len); gather them as the dense context and run the
        populated-cache forward over only the suffix tokens.  Returns
        (last logits | None, dense slot cache) following _prefill's
        bucket-padding contract."""
        t = len(seq)
        suffix = list(seq[pre_len:])
        st = len(suffix)
        sb = min(self.max_seq - pre_len, -(-st // bucket) * bucket)
        toks = np.zeros((1, sb), np.int32)
        toks[0, :st] = suffix
        slot_cache = self._make_cache(1)
        if self._cache_put_slot is not None:
            slot_cache = self._cache_put_slot(slot_cache)
        # gather the shared pages AND seed the dense slot cache in ONE jitted
        # program (the eager per-layer gather + .at[].set pair was ~5 ops x
        # layers of relay dispatches per prefix hit)
        n_pg = pre_len // self.paged.page_size
        ps = self.paged.page_size
        seed_fn = self._suffix_seed_cache.get(n_pg)
        if seed_fn is None:
            def seed(pools, pages, slot_cache):
                def one(pool, buf):
                    blocks = pool[pages]  # (n_pg, H, ps, D)
                    dense = blocks.transpose(1, 0, 2, 3).reshape(
                        1, blocks.shape[1], n_pg * ps, blocks.shape[3])
                    return buf.at[:, :, : n_pg * ps, :].set(
                        dense.astype(buf.dtype))

                return tuple((one(kp, kc), one(vp, vc))
                             for (kp, vp), (kc, vc) in zip(pools, slot_cache))

            seed_fn = jax.jit(seed, donate_argnums=(2,))
            self._suffix_seed_cache[n_pg] = seed_fn
        pages = jnp.asarray(np.asarray(self.mgr.tables[slot, :n_pg], np.int32))
        slot_cache = seed_fn(self.mgr.pools, pages, slot_cache)
        if sb not in self._suffix_cache:
            cfgv = self.cfg

            def suffix_step(params, cache_slot, toks, pos0):
                logits, cache_slot = self._fwd(params, cfgv, toks, pos0,
                                               cache_slot, pos0)
                return logits[:, -1, :], cache_slot

            self._suffix_cache[sb] = jax.jit(suffix_step, donate_argnums=(1,))
        self.prefill_count += 1
        self.cached_prefix_tokens += pre_len
        logits, slot_cache = self._suffix_cache[sb](
            self.model.params, slot_cache, jnp.asarray(toks),
            jnp.full((1,), pre_len, jnp.int32))
        return (logits if st == sb else None), slot_cache

    def _prefill_chunked(self, seq):
        """Fixed-chunk prefill: every chunk reuses the same compiled forward
        (positions carried via cache_len, attention masks the pad).  Returns
        (None, cache, t, t) — the caller re-decodes the last token for
        position-exact logits, exactly like the bucket-padding path."""
        C = self.prefill_chunk
        t = len(seq)
        slot_cache = self._make_cache(1)
        if self._cache_put_slot is not None:
            slot_cache = self._cache_put_slot(slot_cache)
        if self._chunk_step is None:
            cfgv = self.cfg

            def chunk_step(params, cache_slot, toks, pos0):
                # populated-cache multi-token step: masked-attention path
                _, cache_slot = self._fwd(params, cfgv, toks, pos0, cache_slot, pos0)
                return cache_slot

            self._chunk_step = jax.jit(chunk_step, donate_argnums=(1,))
        self.prefill_count += 1
        for a in range(0, t, C):
            chunk = np.zeros((1, C), np.int32)
            chunk[0, : min(C, t - a)] = seq[a : a + C]
            slot_cache = self._chunk_step(
                self.model.params, slot_cache, jnp.asarray(chunk),
                jnp.full((1,), a, jnp.int32),
            )
        # pad positions past t hold junk KV; attention masks them by position
        # until the decode loop overwrites (the bucket-padding invariant)
        if self.draft is not None:
            from .models.common import init_layer_cache

            dcfg = self.draft.cfg
            d_kv = getattr(dcfg, "n_head_kv", dcfg.n_head)
            dslot = init_layer_cache(
                dcfg.n_layer, 1, d_kv, self.max_seq, dcfg.head_dim, self._cache_dtype
            )
            toks = np.zeros((1, -(-t // C) * C), np.int32)
            toks[0, :t] = seq
            dslot = self._draft_prefill(self.draft.params, dslot, jnp.asarray(toks))
            self._pending_draft_slot = dslot
        return None, slot_cache, t, t

    def _slot_sampling_set(self, i: int, req: Request):
        """Install the slot's sampling params when it takes slot i."""
        s = req.sampling or {}
        self._slot_temp[i] = float(s.get("temperature", self._default_temp))
        self._slot_topp[i] = float(s.get("top_p", self._default_topp))

    def _emit_first(self, req: Request, i: int, logits):
        """Sample/argmax the first post-prefill token for slot i."""
        if self._any_slot_sampling:
            tok_arr, self._key = self._pick_slot_vec_jit(
                logits, self._key,
                jnp.asarray(self._slot_temp[i:i + 1]),
                jnp.asarray(self._slot_topp[i:i + 1]))
        else:
            tok_arr, self._key = self._pick(logits, self._key)
        tok = int(np.asarray(tok_arr)[0])
        self.cur_tok[i] = tok
        req.out.append(tok)
        if tok == self.eos_id or len(req.out) >= req.max_new_tokens:
            req.done = True
        if req.on_token is not None:
            req.on_token(req.rid, tok, req.done)

    def _admit(self, bucket: int):
        from .models.common import cache_set_slot

        self._preempt_for_priority()
        # plain dense fresh prefills batch into ONE dispatch per bucket size
        # (prefill round trips dominated admission cost at high request
        # rates); everything with per-slot state (snapshots, forks, paged
        # pools, draft mirrors, sharded caches, exact-length recurrent
        # prefills) keeps the per-request path.
        # draft engines batch too: _prefill_into_slots mirrors the wave with
        # one batched DRAFT prefill (per-request target+draft prefills were
        # ~2 relay dispatches each and dominated spec-serve admission)
        batchable_mode = (
            self.paged is None
            and self._cache_put_slot is None
            and not (self._recurrent or getattr(self, "_exact_prefill", False)))
        deferred: list[tuple[int, Request, int]] = []
        for i in range(self.max_batch):
            if self.slots[i] is None and self.queue:
                req = min(self.queue, key=lambda r: r.priority)  # stable: first min
                self.queue.remove(req)
                if req.snapshot is not None:  # evicted mid-run: restore KV
                    self._resume_from_snapshot(i, req)
                    continue
                seq = req.seq  # prompt, or prompt+output when resuming
                t = len(seq)
                if t >= self.max_seq:  # cannot resume within the window
                    req.done = True
                    self.slots[i] = req
                    continue
                if batchable_mode and req.share is None:
                    self.slots[i] = req
                    self._slot_sampling_set(i, req)
                    deferred.append((i, req, t))
                    continue
                matched_pages = 0
                if self.paged is not None:
                    # reserve prompt + one decode step BEFORE prefilling so a
                    # request that cannot get pages is not re-prefilled on
                    # every admission sweep while it waits (and a fresh
                    # admission cannot immediately trigger eviction ping-pong)
                    ps = self.paged.page_size
                    # automatic prefix caching: attach published pages that
                    # cover a page-aligned prompt prefix (keep >= 1 suffix
                    # token so prefill still yields next-token logits)
                    matched = (self.mgr.match_prefix(seq)
                               if req.share is None and self.draft is None
                               else [])
                    matched = matched[: max(0, (t - 1) // ps)]
                    matched_pages = len(matched)
                    need = -(-(t + 1) // ps) - matched_pages
                    if need > self.mgr.free_pages():
                        if self.mgr.free_pages() == self.paged.n_pages:
                            raise ValueError(
                                f"request of {t} tokens cannot fit an empty "
                                f"page pool ({self.paged.n_pages} pages)"
                            )
                        self.queue.append(req)  # wait for pages
                        continue
                    if matched_pages:
                        self.mgr.attach_prefix(i, matched)
                if req.share is not None and not req.out:
                    if req.share.cache is None:  # first of the fork group
                        req.share.logits, req.share.cache, req.share.t, _ = (
                            self._prefill(seq, bucket)
                        )
                    logits, slot_cache, t = req.share.logits, req.share.cache, req.share.t
                elif matched_pages:
                    assert self.mgr.ensure_capacity(i, t + 1)
                    logits, slot_cache = self._prefill_suffix(
                        seq, matched_pages * self.paged.page_size, i, bucket)
                else:
                    logits, slot_cache, t, _ = self._prefill(seq, bucket)
                if self.paged is not None:
                    assert self.mgr.ensure_capacity(i, t + 1)
                    self.mgr.install_prefill(i, slot_cache, t,
                                             from_page=matched_pages)
                    self.mgr.publish_prefix(i, req.prompt)
                else:
                    self.cache = cache_set_slot(self.cache, slot_cache, i)
                if self.draft is not None:
                    self.draft_cache = cache_set_slot(
                        self.draft_cache, self._pending_draft_slot, i
                    )
                self.slots[i] = req
                self._slot_sampling_set(i, req)
                self.n_past[i] = t
                if logits is not None:
                    self._emit_first(req, i, logits)
                else:
                    # bucket padding wrote junk past t: re-decode the true
                    # last sequence token for position-exact logits (cache
                    # already contains it, attention masks by pos)
                    self.n_past[i] = t - 1
                    self.cur_tok[i] = int(seq[-1])
                if self.paged is not None:
                    self.mgr.lengths[i] = self.n_past[i]
        if deferred:
            if self.prefill_chunk:
                self._prefill_into_slots_chunked(deferred)
            else:
                groups: dict[int, list] = {}
                for item in deferred:
                    tb = min(self.max_seq, -(-item[2] // bucket) * bucket)
                    groups.setdefault(tb, []).append(item)
                for tb in sorted(groups):
                    self._prefill_into_slots(groups[tb], tb)

    def _prefill_into_slots(self, group, tb: int):
        """ONE dispatch admits every request in `group` [(slot, req, t)]: a
        (max_batch, tb) prefill over a fresh multi-slot cache, scattered into
        the engine cache at the group's slot indices INSIDE the same compiled
        program (rows past the group drop via out-of-bounds scatter indices).
        Replaces per-request prefill dispatches — each cost a full relay
        round trip, which dominated serve throughput under bursty admission."""
        B = self.max_batch
        toks = np.zeros((B, tb), np.int32)
        idx = np.full((B,), B, np.int32)  # out of range -> dropped row
        for r, (i, req, t) in enumerate(group):
            toks[r, :t] = req.seq
            idx[r] = i
        if tb not in self._prefill_batch_cache:
            cfgv = self.cfg
            mk = self._make_cache

            def prefill_slots(params, cache, toks, idx):
                slot_cache = mk(B)
                _, slot_cache = self._fwd(
                    params, cfgv, toks, jnp.zeros((B,), jnp.int32), slot_cache,
                    jnp.int32(0), prefill=True)
                cache = jax.tree.map(
                    lambda big, s: big.at[idx].set(s.astype(big.dtype), mode="drop"),
                    cache, slot_cache)
                return cache

            self._prefill_batch_cache[tb] = jax.jit(
                prefill_slots, donate_argnums=(1,))
        self.prefill_count += len(group)
        self.cache = self._prefill_batch_cache[tb](
            self.model.params, self.cache, jnp.asarray(toks), jnp.asarray(idx))
        if self.draft is not None:
            self._batched_draft_prefill(toks, idx, tb)
        for r, (i, req, t) in enumerate(group):
            # re-decode the true last sequence token for position-exact
            # logits (its cache row gets rewritten identically: k/v depend
            # only on the token + position) — uniform for every t, so
            # admission NEVER fetches and can ride inside a pipelined
            # stretch as a pure device-chained dispatch
            self.n_past[i] = t - 1
            self.cur_tok[i] = int(req.seq[-1])

    def _prefill_into_slots_chunked(self, group):
        """Batched CHUNKED admission: every request in `group` [(slot, req,
        t)] prefills over a fresh multi-slot cache in ceil(max_t/C)
        dispatches of ONE compiled (max_batch, C) chunk program, then ONE
        compiled scatter installs the group's rows into the engine cache.
        Fixed shapes end to end — no per-bucket programs, so a long prompt
        admitted mid-stretch never triggers a compile stall, and each
        dispatch is C tokens wide, bounding the latency spike running slots
        see (the static-shape answer to vLLM's chunked prefill).  Nothing
        fetches: every dispatch chains on the cache data dependency, so this
        rides inside a pipelined stretch exactly like _prefill_into_slots."""
        B, C = self.max_batch, self.prefill_chunk
        maxt = max(t for (_i, _r, t) in group)
        if self._chunk_multi is None:
            cfgv = self.cfg

            def chunk_multi(params, slot_cache, toks, pos0):
                _, slot_cache = self._fwd(
                    params, cfgv, toks, jnp.full((B,), pos0, jnp.int32),
                    slot_cache, pos0)
                return slot_cache

            self._chunk_multi = jax.jit(chunk_multi, donate_argnums=(1,))

            def chunk_scatter(cache, slot_cache, idx):
                return jax.tree.map(
                    lambda big, s: big.at[idx].set(s.astype(big.dtype),
                                                   mode="drop"),
                    cache, slot_cache)

            self._chunk_scatter = jax.jit(chunk_scatter, donate_argnums=(0, 1))
        idx = np.full((B,), B, np.int32)  # out of range -> dropped row
        for r, (i, req, t) in enumerate(group):
            idx[r] = i
        slot_cache = self._make_cache(B)
        if self._cache_put_slot is not None:
            slot_cache = self._cache_put_slot(slot_cache)
        for a in range(0, maxt, C):
            toks = np.zeros((B, C), np.int32)
            for r, (i, req, t) in enumerate(group):
                if a < t:
                    seg = req.seq[a:a + C]
                    toks[r, :len(seg)] = seg
            slot_cache = self._chunk_multi(
                self.model.params, slot_cache, jnp.asarray(toks),
                jnp.int32(a))
        self.cache = self._chunk_scatter(self.cache, slot_cache,
                                         jnp.asarray(idx))
        self.prefill_count += len(group)
        if self.draft is not None:
            # mirror the wave into the DRAFT cache (one batched prefill over
            # the C-rounded width) — without this the draft would decode
            # against stale/zero KV and speculative acceptance silently
            # degrades to ~chance
            tb = -(-maxt // C) * C
            dtoks = np.zeros((B, tb), np.int32)
            for r, (i, req, t) in enumerate(group):
                dtoks[r, :t] = req.seq
            self._batched_draft_prefill(dtoks, idx, tb)
        for r, (i, req, t) in enumerate(group):
            # same position-exact re-decode contract as _prefill_into_slots
            self.n_past[i] = t - 1
            self.cur_tok[i] = int(req.seq[-1])

    def _batched_draft_prefill(self, toks: np.ndarray, idx: np.ndarray,
                               tb: int) -> None:
        """One batched draft-cache prefill for an admission wave: (B, tb)
        prompts over a fresh multi-slot draft cache, scattered into
        self.draft_cache at the wave's slot indices (compiled per tb)."""
        B = self.max_batch
        if tb not in self._draft_prefill_batch_cache:
            dcfgv = self.draft.cfg
            from .models.common import init_layer_cache as _ilc

            d_kv = getattr(dcfgv, "n_head_kv", dcfgv.n_head)
            dfwd = self._draft_fwd
            mseq, cdt = self.max_seq, self._cache_dtype

            def prefill_draft_slots(dparams, dcache, toks, idx):
                slot = _ilc(dcfgv.n_layer, B, d_kv, mseq, dcfgv.head_dim, cdt)
                _, slot = dfwd(dparams, dcfgv, toks,
                               jnp.zeros((B,), jnp.int32), slot,
                               jnp.int32(0), prefill=True)
                return jax.tree.map(
                    lambda big, s: big.at[idx].set(
                        s.astype(big.dtype), mode="drop"),
                    dcache, slot)

            self._draft_prefill_batch_cache[tb] = jax.jit(
                prefill_draft_slots, donate_argnums=(1,))
        self.draft_cache = self._draft_prefill_batch_cache[tb](
            self.draft.params, self.draft_cache, jnp.asarray(toks),
            jnp.asarray(idx))

    def _evict_for_pages(self, need_slot: int) -> bool:
        """Free pages by preempting the lowest-priority OTHER running slot
        (eviction under memory pressure; recompute-on-resume)."""
        victims = [
            (j, s) for j, s in enumerate(self.slots)
            if s is not None and not s.done and j != need_slot
        ]
        if not victims:
            return False
        j, worst = max(victims, key=lambda kv: kv[1].priority)
        worst.preempted += 1
        self._snapshot_slot(j, worst)
        self.queue.append(worst)
        self.slots[j] = None
        self.mgr.release(j)
        return True

    def _tick(self):
        active = np.array([s is not None and not s.done for s in self.slots])
        if self.paged is not None:
            # speculative ticks write kk+1 rows; plain decode writes 1
            grow = (self.draft_k + 1) if self.draft is not None else 1
            for i in np.nonzero(active)[0]:
                while not self.mgr.ensure_capacity(int(i), int(self.mgr.lengths[i]) + grow):
                    if not self._evict_for_pages(int(i)):
                        # nothing left to evict: requeue this request too
                        req = self.slots[int(i)]
                        req.preempted += 1
                        self._snapshot_slot(int(i), req)
                        self.queue.append(req)
                        self.slots[int(i)] = None
                        self.mgr.release(int(i))
                        active[i] = False
                        break
        if not active.any():
            return
        toks = jnp.asarray(self.cur_tok.reshape(-1, 1))
        if self.draft is not None:
            kk = self.draft_k
            if self.paged is not None:
                wpages, woffs = self.mgr.step_coords_multi(active, kk + 1)
                pargs = (jnp.asarray(self.mgr.tables), jnp.asarray(wpages),
                         jnp.asarray(woffs), jnp.asarray(active))
                if self.sampler is not None:
                    (drafts, n_accs, corrections, self.mgr.pools,
                     self.draft_cache, self._key) = self._spec_tick_paged_sampled(
                        self.model.params, self.draft.params, self.mgr.pools,
                        self.draft_cache, toks, jnp.asarray(self.n_past),
                        *pargs, self._key)
                    drafts = np.asarray(drafts)
                    n_accs, corrections = np.asarray(n_accs), np.asarray(corrections)
                else:
                    drafts, greedy, self.mgr.pools, self.draft_cache = (
                        self._spec_tick_paged(
                            self.model.params, self.draft.params,
                            self.mgr.pools, self.draft_cache, toks,
                            jnp.asarray(self.n_past), *pargs))
                    drafts, greedy = np.asarray(drafts), np.asarray(greedy)
            elif self.sampler is not None:
                # pipelined sampled stretch under the same margin rule as
                # the greedy one (R rejection-sampling rounds per dispatch)
                live = [i for i in range(self.max_batch) if active[i]]
                worst = SPEC_STRETCH * (kk + 1)
                if live and all(self.n_past[i] + worst < self._spec_margin
                                for i in live):
                    (blocks, n_accs, self.cache, self.draft_cache,
                     self._key) = self._spec_stretch_sampled(
                        self.model.params, self.draft.params, self.cache,
                        self.draft_cache, toks, jnp.asarray(self.n_past),
                        jnp.asarray(active), self._key)
                    self._consume_spec_blocks(np.asarray(blocks),
                                              np.asarray(n_accs), active)
                    return
                drafts, n_accs, corrections, self.cache, self.draft_cache, self._key = (
                    self._spec_tick_sampled(
                        self.model.params, self.draft.params, self.cache,
                        self.draft_cache, toks, jnp.asarray(self.n_past),
                        jnp.asarray(active), self._key,
                    )
                )
                drafts = np.asarray(drafts)
                n_accs, corrections = np.asarray(n_accs), np.asarray(corrections)
            else:
                # pipelined stretch when every live slot has window margin
                # for SPEC_STRETCH worst-case rounds (R*(k+1) new positions)
                live = [i for i in range(self.max_batch) if active[i]]
                worst = SPEC_STRETCH * (kk + 1)
                if live and all(self.n_past[i] + worst < self._spec_margin
                                for i in live):
                    blocks, n_accs, self.cache, self.draft_cache = (
                        self._spec_stretch(
                            self.model.params, self.draft.params, self.cache,
                            self.draft_cache, toks, jnp.asarray(self.n_past),
                            jnp.asarray(active)))
                    self._consume_spec_blocks(np.asarray(blocks),
                                              np.asarray(n_accs), active)
                    return
                drafts, greedy, self.cache, self.draft_cache = self._spec_tick(
                    self.model.params, self.draft.params, self.cache,
                    self.draft_cache, toks, jnp.asarray(self.n_past),
                    jnp.asarray(active),
                )
                drafts, greedy = np.asarray(drafts), np.asarray(greedy)
            for i, sl in enumerate(self.slots):
                if sl is None or sl.done or not active[i]:
                    continue
                if self.sampler is not None:
                    n_acc = int(n_accs[i])
                    emitted = list(drafts[i, :n_acc]) + [int(corrections[i])]
                else:
                    n_acc = 0
                    while n_acc < kk and drafts[i, n_acc] == greedy[i, n_acc]:
                        n_acc += 1
                    emitted = list(drafts[i, :n_acc]) + [int(greedy[i, n_acc])]
                for tok in emitted:
                    if sl.done:
                        break
                    tok = int(tok)
                    self.n_past[i] += 1
                    sl.out.append(tok)
                    self.cur_tok[i] = tok
                    if (tok == self.eos_id or len(sl.out) >= sl.max_new_tokens
                            or self.n_past[i] >= self._spec_margin):
                        sl.done = True
                    if sl.on_token is not None:
                        sl.on_token(sl.rid, tok, sl.done)
                if self.paged is not None:
                    # accepted tokens advance the page-table view; rejected
                    # rows stay as junk past lengths, rewritten next tick
                    self.mgr.lengths[i] = self.n_past[i]
            return
        if self.paged is None and self._hb > 1:
            outs, self.cache, _, _, _, _, self._key = self._step_scan(
                self.model.params, self.cache, toks, jnp.asarray(self.n_past),
                jnp.asarray(active), jnp.asarray(self._slot_budget()),
                self._key,
                jnp.asarray(self._slot_temp), jnp.asarray(self._slot_topp),
                self._hb, bool(self._any_slot_sampling))
            self._consume_scan_outs(np.asarray(outs))
            return
        if self.paged is not None:
            # multi-step greedy stretch: h ticks in one jitted scan (one
            # dispatch + one fetch) when every live slot has budget/window
            # for h tokens and pages can be preallocated — the paged analog
            # of the dense engine's pipelined horizon scan
            if not self._any_slot_sampling and self._hb > 1:
                budgets = self._slot_budget()
                live = [i for i in range(self.max_batch) if active[i]]
                win = self.paged.max_pages_per_seq * self.paged.page_size
                room = min((min(budgets[i],
                                win - 1 - int(self.mgr.lengths[i]))
                            for i in live), default=0)
                h = self._hb
                while h > 1 and h > room:
                    h //= 2
                if h > 1 and all(self.mgr.ensure_capacity(
                        i, int(self.mgr.lengths[i]) + h) for i in live):
                    wpages, woffs = self.mgr.step_coords_multi(active, h)
                    outs, self.mgr.pools = self._paged_scan(
                        self.model.params, self.mgr.pools, toks,
                        jnp.asarray(self.mgr.lengths),
                        jnp.asarray(self.mgr.tables),
                        jnp.asarray(wpages), jnp.asarray(woffs),
                        jnp.asarray(active), h,
                    )
                    self._consume_scan_outs(np.asarray(outs))
                    for i in live:  # rewind junk-advanced page views
                        self.mgr.lengths[i] = self.n_past[i]
                    return
            wpage, woff = self.mgr.step_coords(active)
            logits, self.mgr.pools = self._paged_step(
                self.model.params, self.mgr.pools, toks,
                jnp.asarray(self.mgr.lengths), jnp.asarray(self.mgr.tables),
                jnp.asarray(wpage), jnp.asarray(woff), jnp.asarray(active),
            )
            if self._any_slot_sampling:
                nxt_arr, self._key = self._pick_slot_vec_jit(
                    logits, self._key, jnp.asarray(self._slot_temp),
                    jnp.asarray(self._slot_topp))
            else:
                nxt_arr, self._key = self._pick_jit(logits, self._key)
            nxt = np.where(active, np.asarray(nxt_arr), 0)
            self.mgr.lengths[active] += 1
        elif self._any_slot_sampling:
            nxt, self.cache, self._key = self._step_vec(
                self.model.params, self.cache, toks, jnp.asarray(self.n_past),
                jnp.asarray(active), self._key,
                jnp.asarray(self._slot_temp), jnp.asarray(self._slot_topp),
            )
            nxt = np.asarray(nxt)
        else:
            nxt, self.cache, self._key = self._step(
                self.model.params, self.cache, toks, jnp.asarray(self.n_past),
                jnp.asarray(active), self._key,
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
