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

    def one_round(tok, pos, tcache, dcache):
        # --- draft k tokens autoregressively (t=1 steps) ---
        def dstep(carry, _):
            dtok, dpos, dc = carry
            logits, dc = dfwd(draft.params, dcfg, dtok[None, None], dpos[None], dc, dpos)
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            return (nxt, dpos + 1, dc), nxt

        (_, _, dcache), drafts = jax.lax.scan(
            dstep, (tok, pos, dcache), None, length=k
        )  # drafts: (k,)

        # --- one target forward over [tok, d_1..d_k] ---
        seq = jnp.concatenate([tok[None], drafts])  # (k+1,)
        tlogits, tcache = tfwd(
            target.params, tcfg, seq[None, :], pos[None], tcache, pos
        )
        greedy = jnp.argmax(tlogits[0], axis=-1).astype(jnp.int32)  # (k+1,)

        # --- longest matching prefix + correction ---
        # accept d_i while d_i == greedy[i-1]; n_acc in [0, k]
        match = drafts == greedy[:-1]
        n_acc = jnp.argmin(jnp.concatenate([match, jnp.array([False])])).astype(jnp.int32)
        correction = greedy[n_acc]
        return drafts, n_acc, correction, tcache, dcache

    def decode(tcache, dcache, first_token, n_past):
        out = jnp.zeros((max_new + k + 1,), jnp.int32)  # slack for the last round

        def cond(st):
            return st[0] < max_new

        def body(st):
            count, tok, pos, out, rounds, tc, dc = st
            drafts, n_acc, correction, tc, dc = one_round(tok, pos, tc, dc)
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

    return jax.jit(decode, donate_argnums=(0, 1))


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
    tlog, tcache = jax.jit(tfwd, static_argnums=1)(
        target.params, target.cfg, jnp.asarray(prompt), zero, tcache, jnp.int32(0)
    )
    _, dcache = jax.jit(dfwd, static_argnums=1)(
        draft.params, draft.cfg, jnp.asarray(prompt), zero, dcache, jnp.int32(0)
    )
    first = jnp.argmax(tlog[0, -1]).astype(jnp.int32)

    dec = make_speculative_decoder(target, draft, k=k, max_new=n_tokens - 1)
    toks, rounds, _, _ = dec(tcache, dcache, first, jnp.int32(t))
    return [int(first)] + [int(x) for x in np.asarray(toks)], int(rounds) + 1
