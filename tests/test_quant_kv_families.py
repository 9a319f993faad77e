"""q8 KV cache across the widened family set (VERDICT r4 weak #4):
gemma2 (softcaps + sliding/global alternation), phi3 (LongRoPE + sliding
window), and deepseek (the q8 MLA LATENT cache — int8 codes over the
kv_lora_rank latent + shared rope key).  Per family: q8 ≈ f32 accuracy,
chunked == full exactness within the representation, and engine serving.
llama/gptj coverage lives in test_quant_kv_cache.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from ggml_tpu.models.common import QUANT_KV_DTYPE, QuantKV
from ggml_tpu.serve import Engine

from tests.test_serving_matrix import _gemma2, _phi3


def _deepseek():
    from ggml_tpu.models.deepseek import Deepseek, DeepseekConfig

    cfg = DeepseekConfig(n_vocab=128, n_embd=64, n_head=4, n_layer=2, n_ff=96,
                         n_dense_lead=2, kv_lora_rank=32, qk_nope_dim=16,
                         qk_rope_dim=8, v_head_dim=16, q_lora_rank=0,
                         n_expert=0, n_expert_used=0)
    rng = np.random.default_rng(9)

    def t(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)

    d, f = cfg.n_embd, cfg.n_ff
    p = {"token_embd.weight": t(cfg.n_vocab, d),
         "output_norm.weight": jnp.ones((d,)), "output.weight": t(cfg.n_vocab, d)}
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
        p[pre + "ffn_gate.weight"] = t(f, d)
        p[pre + "ffn_up.weight"] = t(f, d)
        p[pre + "ffn_down.weight"] = t(d, f)
    return Deepseek(p, cfg, max_seq=32, batch=1)


BUILDERS = {"gemma2": _gemma2, "phi3": _phi3, "deepseek": _deepseek}


def _fwd_mod(m):
    from ggml_tpu.models import deepseek, gemma2, phi3

    return {"Gemma2": gemma2, "Phi3": phi3, "Deepseek": deepseek}[
        type(m).__name__]


def _mk_cache(m, dtype):
    return _fwd_mod(m).init_cache(m.cfg, 1, 32, dtype)


@pytest.fixture(scope="module", params=sorted(BUILDERS))
def model(request):
    return BUILDERS[request.param]()


def test_q8_kv_close_to_f32(model):
    m = model
    fwd = _fwd_mod(m).forward
    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30]], np.int32)
    ref, _ = fwd(m.params, m.cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                 _mk_cache(m, jnp.float32), jnp.int32(0))
    got, qc = fwd(m.params, m.cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                  _mk_cache(m, QUANT_KV_DTYPE), jnp.int32(0))
    ref = np.asarray(ref[0], np.float32)
    got = np.asarray(got[0], np.float32)
    nmse = float(((got - ref) ** 2).sum() / (ref ** 2).sum())
    assert nmse < 5e-3, nmse  # int8-per-row KV noise only
    assert isinstance(qc[0][0], QuantKV) and qc[0][0].codes.dtype == jnp.int8


def test_q8_kv_incremental_equals_full(model):
    """Quantized rows for a position are identical whether written by one-shot
    prefill or token-by-token — exact WITHIN the q8 representation."""
    m = model
    fwd = _fwd_mod(m).forward
    toks = np.asarray([[5, 9, 33, 71, 2, 40, 18, 120]], np.int32)
    full, _ = fwd(m.params, m.cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                  _mk_cache(m, QUANT_KV_DTYPE), jnp.int32(0))
    cache = _mk_cache(m, QUANT_KV_DTYPE)
    outs, pos = [], 0
    for chunk in (toks[:, :3],) + tuple(toks[:, j:j + 1] for j in range(3, 8)):
        lg, cache = fwd(m.params, m.cfg, jnp.asarray(chunk),
                        jnp.full((1,), pos, jnp.int32), cache, jnp.int32(pos))
        outs.append(np.asarray(lg[0]))
        pos += chunk.shape[1]
    inc = np.concatenate(outs, axis=0)
    want = np.asarray(full[0])
    nmse = float(((inc - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-9, nmse


def test_q8_kv_engine_serving(model):
    m = model
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    f32 = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [f32.submit(p, 6) for p in prompts]
    want = f32.run()
    q8 = Engine(m, max_batch=2, max_seq=32, cache_dtype=QUANT_KV_DTYPE)
    sids = [q8.submit(p, 6) for p in prompts]
    got = q8.run()
    for r, s in zip(rids, sids):
        assert len(got[s]) == len(want[r])
        assert got[s][0] == want[r][0]


def test_spec_gemma2_engine_lossless():
    """Speculative ticks with a gemma2 target AND gemma2 draft emit tokens
    identical to plain greedy serving (the spec==greedy gate for the new
    matrix cell)."""
    m = _gemma2()
    d = _gemma2()  # same tiny family; the engine only requires matching vocab
    prompts = [[1, 2, 3, 4], [7, 8], [5, 6, 9]]
    plain = Engine(m, max_batch=2, max_seq=64, cache_dtype=jnp.float32)
    rids = [plain.submit(p, 8) for p in prompts]
    want = plain.run()
    spec = Engine(m, max_batch=2, max_seq=64, cache_dtype=jnp.float32,
                  draft=d, draft_k=3)
    sids = [spec.submit(p, 8) for p in prompts]
    got = spec.run()
    for r, s in zip(rids, sids):
        assert got[s] == want[r], (got[s], want[r])
