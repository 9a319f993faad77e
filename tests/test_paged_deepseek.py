"""DeepSeek absorbed-MLA paged decode == dense decode: the page pools hold
the COMPRESSED latent + rope key (asymmetric pair), so MLA's per-byte cache
win survives paging."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ggml_tpu.models.deepseek import Deepseek, DeepseekConfig, forward
from ggml_tpu.paged_kv import PagedConfig, PagedKVManager, make_paged_decode_step


@pytest.fixture(scope="module")
def model():
    cfg = DeepseekConfig(n_vocab=128, n_embd=64, n_head=4, n_layer=2, n_ff=96,
                         n_dense_lead=1, kv_lora_rank=32, qk_nope_dim=16,
                         qk_rope_dim=8, v_head_dim=16, q_lora_rank=0,
                         n_expert=4, n_expert_used=2)
    rng = np.random.default_rng(9)

    def t(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)

    d, f = cfg.n_embd, cfg.n_ff
    p = {"token_embd.weight": t(cfg.n_vocab, d), "output_norm.weight": jnp.ones((d,)),
         "output.weight": t(cfg.n_vocab, d)}
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        p[pre + "attn_norm.weight"] = jnp.ones((d,))
        p[pre + "ffn_norm.weight"] = jnp.ones((d,))
        p[pre + "attn_q.weight"] = t(cfg.n_head * cfg.qk_head_dim, d)
        p[pre + "attn_kv_a_mqa.weight"] = t(cfg.kv_lora_rank + cfg.qk_rope_dim, d)
        p[pre + "attn_kv_a_norm.weight"] = jnp.ones((cfg.kv_lora_rank,))
        p[pre + "attn_kv_b.weight"] = t(
            cfg.n_head * (cfg.qk_nope_dim + cfg.v_head_dim), cfg.kv_lora_rank)
        p[pre + "attn_output.weight"] = t(d, cfg.n_head * cfg.v_head_dim)
        if i < cfg.n_dense_lead:
            p[pre + "ffn_gate.weight"] = t(f, d)
            p[pre + "ffn_up.weight"] = t(f, d)
            p[pre + "ffn_down.weight"] = t(d, f)
        else:
            p[pre + "ffn_gate_inp.weight"] = t(cfg.n_expert, d)
            p[pre + "exp_probs_b.bias"] = jnp.zeros((cfg.n_expert,))
            p[pre + "ffn_gate_exps.weight"] = t(cfg.n_expert, f, d)
            p[pre + "ffn_up_exps.weight"] = t(cfg.n_expert, f, d)
            p[pre + "ffn_down_exps.weight"] = t(cfg.n_expert, d, f)
            p[pre + "ffn_gate_shexp.weight"] = t(f, d)
            p[pre + "ffn_up_shexp.weight"] = t(f, d)
            p[pre + "ffn_down_shexp.weight"] = t(d, f)
    return Deepseek(p, cfg, max_seq=32, batch=1)


def _dense_logits(m, seq):
    cache = m.new_cache(dtype=jnp.float32)
    outs = []
    for pos, tok in enumerate(seq):
        logits, cache = jax.jit(forward, static_argnums=1)(
            m.params, m.cfg, jnp.asarray([[tok]], jnp.int32),
            jnp.asarray([pos], jnp.int32), cache, jnp.int32(pos),
        )
        outs.append(np.asarray(logits[0, 0]))
    return outs


def test_mla_paged_matches_dense(model):
    m = model
    pcfg = PagedConfig(n_pages=14, page_size=4, max_pages_per_seq=7)
    mgr = PagedKVManager(m.cfg.n_layer, 1, (m.cfg.kv_lora_rank, m.cfg.qk_rope_dim),
                         max_batch=2, pcfg=pcfg, dtype=jnp.float32)
    step = make_paged_decode_step(m, pcfg)
    assert mgr.pools[0][0].shape[-1] == m.cfg.kv_lora_rank
    assert mgr.pools[0][1].shape[-1] == m.cfg.qk_rope_dim

    rng = np.random.default_rng(2)
    seqs = [rng.integers(0, 128, 11), rng.integers(0, 128, 8)]
    dense = [_dense_logits(m, s) for s in seqs]

    pools = mgr.pools
    paged_out = [[], []]
    for t in range(11):
        slots = [0] + ([1] if 0 <= t - 2 < 8 else [])
        for b in slots:
            assert mgr.ensure_capacity(b, int(mgr.lengths[b]) + 1)
        tokens = np.zeros((2, 1), np.int32)
        active = np.zeros((2,), bool)
        for b in slots:
            tokens[b, 0] = seqs[b][t - (2 if b == 1 else 0)]
            active[b] = True
        wpage, woff = mgr.step_coords(active)
        logits, pools = step(
            m.params, pools, jnp.asarray(tokens), jnp.asarray(mgr.lengths),
            jnp.asarray(mgr.tables), jnp.asarray(wpage), jnp.asarray(woff),
            jnp.asarray(active),
        )
        logits = np.asarray(logits)
        for b in slots:
            paged_out[b].append(logits[b])
            mgr.lengths[b] += 1

    for b in range(2):
        for pos, (got, want) in enumerate(zip(paged_out[b], dense[b])):
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                       err_msg=f"slot {b} pos {pos}")


def test_mla_paged_through_engine(model):
    from ggml_tpu.serve import Engine
    from ggml_tpu.serving_matrix import features_for

    m = model
    assert features_for(m)["paged_kv"]
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, 128, 5).tolist(), rng.integers(0, 128, 3).tolist()]

    dense_eng = Engine(m, max_batch=2, max_seq=28, cache_dtype=jnp.float32)
    for p in prompts:
        dense_eng.submit(p, 8)
    want = dense_eng.run(bucket=8)

    paged_eng = Engine(m, max_batch=2, max_seq=28, cache_dtype=jnp.float32,
                       paged=PagedConfig(n_pages=14, page_size=4, max_pages_per_seq=7))
    for p in prompts:
        paged_eng.submit(p, 8)
    got = paged_eng.run(bucket=8)
    assert got == want
