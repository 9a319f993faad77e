"""Speculative decoding — draft-and-verify generation, fully on device.

The reference has no speculation (its downstream, llama.cpp, added it later);
memory-bound quantized decode makes it a first-class TPU serving lever: a
target forward over k+1 tokens streams the SAME weight bytes as a 1-token
step, so every extra accepted draft token is nearly free.

Design (greedy, lossless): each round the draft model decodes `k` tokens
autoregressively, the target model runs ONE forward over [current, d_1..d_k],
and the emitted tokens are the longest prefix of draft tokens that match the
target's own greedy choices, plus the target's correction token — so the
output sequence is IDENTICAL to plain greedy decoding of the target
(verified by tests/test_speculative.py).  Everything (draft scan, verify,
accept, cache bookkeeping) runs inside one jitted `lax.while_loop`: no
host round trips per token (the axon relay costs ~150 ms per sync).

KV-cache consistency relies on the models' position-masked attention: a
verify forward writes positions p..p+k before attending, so rejected
positions are always overwritten by the next round before any query can
attend them — speculation needs NO cache rollback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _forward_for(model):
    from .models import gpt2, gptj, llama

    if isinstance(model, llama.Llama):
        return llama.forward
    if isinstance(model, gptj.GPTJ):
        return gptj.forward
    if isinstance(model, gpt2.GPT2):
        return gpt2.forward
    raise TypeError(f"no forward for {type(model).__name__}")


def make_speculative_decoder(target, draft, k: int = 4, max_new: int = 64):
    """Build a jitted greedy speculative decoder.

    target, draft: model wrappers (GPTJ/Llama/GPT2) with .params/.cfg;
    vocabularies must match.  k: draft tokens per round.  max_new: static
    output budget (the function always fills exactly max_new tokens).

    Returns decode(tcache, dcache, first_token, n_past) ->
    (tokens (max_new,) int32, rounds, tcache, dcache) where `rounds` is the
    number of target forwards executed — max_new / rounds is the effective
    tokens-per-target-step speedup.
    """
    tfwd = _forward_for(target)
    dfwd = _forward_for(draft)
    tcfg, dcfg = target.cfg, draft.cfg

    def one_round(tparams, dparams, tok, pos, tcache, dcache):
        # --- draft k tokens autoregressively (t=1 steps) ---
        def dstep(carry, _):
            dtok, dpos, dc = carry
            logits, dc = dfwd(dparams, dcfg, dtok[None, None], dpos[None], dc, dpos)
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            return (nxt, dpos + 1, dc), nxt

        # k+1 steps: the extra step writes d_k's KV at pos+k (its sampled
        # token is discarded).  Without it a fully-accepted round leaves a
        # permanent zero row at pos+k in the draft cache — output stays
        # lossless but draft acceptance silently degrades over long
        # generations (llama.cpp drafts the accepted tokens for the same
        # reason).  Partially-accepted rounds overwrite the slot anyway.
        (_, _, dcache), drafts = jax.lax.scan(
            dstep, (tok, pos, dcache), None, length=k + 1
        )
        drafts = drafts[:k]  # (k,)

        # --- one target forward over [tok, d_1..d_k] ---
        seq = jnp.concatenate([tok[None], drafts])  # (k+1,)
        tlogits, tcache = tfwd(
            tparams, tcfg, seq[None, :], pos[None], tcache, pos
        )
        greedy = jnp.argmax(tlogits[0], axis=-1).astype(jnp.int32)  # (k+1,)

        # --- longest matching prefix + correction ---
        # accept d_i while d_i == greedy[i-1]; n_acc in [0, k]
        match = drafts == greedy[:-1]
        n_acc = jnp.argmin(jnp.concatenate([match, jnp.array([False])])).astype(jnp.int32)
        correction = greedy[n_acc]
        return drafts, n_acc, correction, tcache, dcache

    # params ride the jitted loop as ARGUMENTS — closing over them embeds
    # multi-GB weights as lowered constants (compile never finishes at 6B)
    def decode_impl(tparams, dparams, tcache, dcache, first_token, n_past):
        out = jnp.zeros((max_new + k + 1,), jnp.int32)  # slack for the last round

        def cond(st):
            return st[0] < max_new

        def body(st):
            count, tok, pos, out, rounds, tc, dc = st
            drafts, n_acc, correction, tc, dc = one_round(
                tparams, dparams, tok, pos, tc, dc)
            # block = [d_1..d_k, _] with the correction at index n_acc; entries
            # past n_acc are junk that the next round overwrites (count only
            # advances n_acc+1) or the final slice drops
            block = jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)])
            block = jnp.where(jnp.arange(k + 1) == n_acc, correction, block)
            out = jax.lax.dynamic_update_slice(out, block, (count,))
            return (
                count + n_acc + 1,
                correction,
                pos + n_acc + 1,
                out,
                rounds + 1,
                tc,
                dc,
            )

        count, _, _, out, rounds, tcache, dcache = jax.lax.while_loop(
            cond, body, (jnp.int32(0), first_token, n_past, out, jnp.int32(0), tcache, dcache)
        )
        return out[:max_new], rounds, tcache, dcache

    jitted = jax.jit(decode_impl, donate_argnums=(2, 3))

    def decode(tcache, dcache, first_token, n_past):
        return jitted(target.params, draft.params, tcache, dcache,
                      first_token, n_past)

    return decode


def make_speculative_decoder_sampled(target, draft, k: int = 4, max_new: int = 64,
                                     sampler: dict | None = None,
                                     draft_sampler: dict | None = None):
    """Sampled speculative decoding — LOSSLESS IN DISTRIBUTION via rejection
    sampling (Leviathan et al. / Chen et al., the standard scheme; the
    reference ecosystem's analog is llama.cpp's common_sampler speculative
    path).  Each draft token d with draft prob q(d) and target prob p(d) is
    accepted with prob min(1, p(d)/q(d)); on rejection the correction token
    is drawn from the residual distribution norm(max(p - q, 0)); if all k
    drafts are accepted the bonus token is drawn from the target's k+1-th
    distribution.  The emitted sequence is distributed EXACTLY as plain
    autoregressive sampling from the warped target distribution
    (tests/test_speculative.py::test_sampled_speculative_distribution).

    sampler/draft_sampler: kwargs for sampling.warp_logits (temperature /
    top_k / top_p); the target's warped distribution is the one being
    reproduced.  draft_sampler defaults to sampler.

    Returns decode(tcache, dcache, first_token, n_past, key) ->
    (tokens (max_new,), rounds, tcache, dcache, key).
    """
    from .sampling import warp_logits

    tfwd = _forward_for(target)
    dfwd = _forward_for(draft)
    tcfg, dcfg = target.cfg, draft.cfg
    skw = dict(sampler or {})
    dkw = dict(draft_sampler if draft_sampler is not None else skw)

    def one_round(tparams, dparams, tok, pos, tcache, dcache, key):
        key, k_draft, k_acc, k_corr = jax.random.split(key, 4)

        # --- draft k tokens sampled from the draft's warped distribution ---
        def dstep(carry, subkey):
            dtok, dpos, dc = carry
            logits, dc = dfwd(dparams, dcfg, dtok[None, None], dpos[None], dc, dpos)
            wl = warp_logits(logits[0, -1:][..., :], **dkw)  # (1, V)
            q_logp = jax.nn.log_softmax(wl, axis=-1)[0]
            nxt = jax.random.categorical(subkey, wl, axis=-1)[0].astype(jnp.int32)
            return (nxt, dpos + 1, dc), (nxt, q_logp)

        # k+1 steps: the extra one writes d_k's KV at pos+k (token discarded)
        # so fully-accepted rounds leave no hole in the draft cache
        (_, _, dcache), (drafts_all, q_all) = jax.lax.scan(
            dstep, (tok, pos, dcache), jax.random.split(k_draft, k + 1)
        )
        drafts = drafts_all[:k]  # (k,)
        q_logp = q_all[:k]  # (k, V)

        # --- one target forward over [tok, d_1..d_k] ---
        seq = jnp.concatenate([tok[None], drafts])
        tlogits, tcache = tfwd(
            tparams, tcfg, seq[None, :], pos[None], tcache, pos
        )
        p_logp = jax.nn.log_softmax(warp_logits(tlogits[0], **skw), axis=-1)  # (k+1, V)

        # --- rejection sampling ---
        # d_{j+1} = drafts[j]: target dist p_logp[j], draft dist q_logp[j]
        jj = jnp.arange(k)
        ratio = jnp.exp(p_logp[jj, drafts] - q_logp[jj, drafts])
        accept = jax.random.uniform(k_acc, (k,)) < ratio
        n_acc = jnp.argmin(jnp.concatenate([accept, jnp.array([False])])).astype(jnp.int32)

        # correction: residual norm(max(p-q, 0)) at the rejected position;
        # q := 0 past the last draft makes the all-accepted bonus draw
        # (correction ~ p_{k+1}) the same formula
        p_row = p_logp[n_acc]
        q_row = jnp.where(n_acc < k, q_logp[jnp.minimum(n_acc, k - 1)], -jnp.inf)
        residual = jnp.clip(jnp.exp(p_row) - jnp.exp(q_row), 0.0, None)
        total = residual.sum()
        # total == 0 only if p == q exactly at a rejected position (measure-
        # zero numerically); fall back to p for a safe draw
        probs = jnp.where(total > 1e-12, residual / jnp.maximum(total, 1e-12), jnp.exp(p_row))
        correction = jax.random.categorical(k_corr, jnp.log(probs + 1e-30)).astype(jnp.int32)
        return drafts, n_acc, correction, tcache, dcache, key

    # params as jit ARGUMENTS (capturing them lowers multi-GB constants)
    def decode_impl(tparams, dparams, tcache, dcache, first_token, n_past, key):
        out = jnp.zeros((max_new + k + 1,), jnp.int32)

        def cond(st):
            return st[0] < max_new

        def body(st):
            count, tok, pos, out, rounds, tc, dc, key = st
            drafts, n_acc, correction, tc, dc, key = one_round(
                tparams, dparams, tok, pos, tc, dc, key)
            block = jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)])
            block = jnp.where(jnp.arange(k + 1) == n_acc, correction, block)
            out = jax.lax.dynamic_update_slice(out, block, (count,))
            return (count + n_acc + 1, correction, pos + n_acc + 1, out,
                    rounds + 1, tc, dc, key)

        count, _, _, out, rounds, tcache, dcache, key = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), first_token, n_past, out, jnp.int32(0), tcache, dcache, key),
        )
        return out[:max_new], rounds, tcache, dcache, key

    jitted = jax.jit(decode_impl, donate_argnums=(2, 3))

    def decode(tcache, dcache, first_token, n_past, key):
        return jitted(target.params, draft.params, tcache, dcache,
                      first_token, n_past, key)

    return decode


def speculative_generate(target, draft, prompt_tokens, n_tokens: int, k: int = 4):
    """Convenience driver: prefill both models on the prompt (host side),
    then run the jitted speculative loop.  Greedy; returns (tokens list,
    rounds executed)."""
    prompt = np.asarray(prompt_tokens, np.int32).reshape(1, -1)
    t = prompt.shape[1]
    tfwd = _forward_for(target)
    dfwd = _forward_for(draft)

    # default cache dtypes match models.common.generate so speculative and
    # plain greedy see bit-identical cache rounding
    tcache = target.new_cache()
    dcache = draft.new_cache()
    zero = jnp.zeros((1,), jnp.int32)
    from functools import partial

    tlog, tcache = jax.jit(partial(tfwd, prefill=True), static_argnums=1)(
        target.params, target.cfg, jnp.asarray(prompt), zero, tcache, jnp.int32(0)
    )
    _, dcache = jax.jit(partial(dfwd, prefill=True), static_argnums=1)(
        draft.params, draft.cfg, jnp.asarray(prompt), zero, dcache, jnp.int32(0)
    )
    first = jnp.argmax(tlog[0, -1]).astype(jnp.int32)

    dec = make_speculative_decoder(target, draft, k=k, max_new=n_tokens - 1)
    toks, rounds, _, _ = dec(tcache, dcache, first, jnp.int32(t))
    return [int(first)] + [int(x) for x in np.asarray(toks)], int(rounds) + 1


def speculative_generate_sampled(target, draft, prompt_tokens, n_tokens: int,
                                 k: int = 4, sampler: dict | None = None, seed: int = 0):
    """Sampled speculation driver: prefill both models, sample the first
    token from the warped target distribution, then run the jitted
    rejection-sampling loop.  Returns (tokens list, rounds)."""
    from functools import partial

    from .sampling import warp_logits

    prompt = np.asarray(prompt_tokens, np.int32).reshape(1, -1)
    t = prompt.shape[1]
    tfwd = _forward_for(target)
    dfwd = _forward_for(draft)
    tcache = target.new_cache()
    dcache = draft.new_cache()
    zero = jnp.zeros((1,), jnp.int32)
    tlog, tcache = jax.jit(partial(tfwd, prefill=True), static_argnums=1)(
        target.params, target.cfg, jnp.asarray(prompt), zero, tcache, jnp.int32(0)
    )
    _, dcache = jax.jit(partial(dfwd, prefill=True), static_argnums=1)(
        draft.params, draft.cfg, jnp.asarray(prompt), zero, dcache, jnp.int32(0)
    )
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    first = jax.random.categorical(
        k0, warp_logits(tlog[:, -1, :], **(sampler or {}))
    )[0].astype(jnp.int32)

    dec = make_speculative_decoder_sampled(
        target, draft, k=k, max_new=n_tokens - 1, sampler=sampler
    )
    toks, rounds, _, _, _ = dec(tcache, dcache, first, jnp.int32(t), key)
    return [int(first)] + [int(x) for x in np.asarray(toks)], int(rounds) + 1
