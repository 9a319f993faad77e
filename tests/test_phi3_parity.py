"""Phi-3 family parity vs HF transformers through the GGUF round trip:
fused qkv/gate_up splits, LongRoPE per-dim frequency divisors with the
dynamic long/short switch, attn-factor cos/sin scaling, and the uniform
sliding window — llama.cpp arch 'phi3'."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_phi3 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.phi3 import Phi3, config_from_gguf, forward, init_cache


def _tiny(tmp, longrope: bool, sliding: int = 0):
    rng = np.random.default_rng(4)
    kw = {}
    if longrope:
        kw["rope_scaling"] = {
            "type": "longrope",
            "long_factor": [float(f) for f in rng.uniform(1.5, 4.0, 8)],
            "short_factor": [float(f) for f in rng.uniform(1.0, 1.2, 8)],
        }
        kw["original_max_position_embeddings"] = 8
    cfg = transformers.Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        pad_token_id=0, sliding_window=sliding or None, attention_dropout=0.0,
        resid_pdrop=0.0, embd_pdrop=0.0, tie_word_embeddings=False, **kw,
    )
    torch.manual_seed(21)
    hf = transformers.Phi3ForCausalLM(cfg).eval()
    path = tmp / f"phi3_{longrope}_{sliding}.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_phi3_longrope_logits_match_hf(tmp_path):
    hf, path = _tiny(tmp_path, longrope=True)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.longrope and cfg.n_ctx_orig == 8
    assert abs(cfg.attn_factor - np.sqrt(1 + np.log(8.0) / np.log(8.0))) < 1e-6
    params = load_params(g)

    # 20 tokens > orig_ctx=8: the LONG factors are live
    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30,
                        200, 4, 99, 12, 63, 7, 151, 41, 2, 88]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]

    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse


def test_phi3_longrope_short_regime_generation(tmp_path):
    """Greedy generation entirely within orig_ctx (allocated cache == 8 ==
    orig_ctx -> SHORT factors statically) matches HF, whose dynamic update
    also stays on the short factors for seq_len <= 8."""
    hf, path = _tiny(tmp_path, longrope=True)
    g = GGUFFile(path)
    m = Phi3(load_params(g), config_from_gguf(g), max_seq=8, batch=1)

    toks = np.asarray([[3, 14, 15, 92]], np.int32)
    out = m.generate(toks, 4)  # ends at position 7 < orig_ctx=8
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=4, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_phi3_longrope_long_regime_generation(tmp_path):
    """Greedy generation with the prompt already beyond orig_ctx: HF's
    re-prefill rule has the LONG factors live for every position, matching
    our static allocation rule (max_seq=32 > orig_ctx=8 -> long)."""
    hf, path = _tiny(tmp_path, longrope=True)
    g = GGUFFile(path)
    m = Phi3(load_params(g), config_from_gguf(g), max_seq=32, batch=1)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30]], np.int32)  # 10 > 8
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_phi3_serving_engine(tmp_path):
    """serve.Engine drives the family (interleaved == solo), with the
    LongRoPE factors live through the engine's compiled step."""
    hf, path = _tiny(tmp_path, longrope=True)
    from ggml_tpu.serve import Engine

    g = GGUFFile(path)
    m = Phi3(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    prompts = [[3, 14, 15], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])


def test_phi3_sliding_window_logits_match_hf(tmp_path):
    hf, path = _tiny(tmp_path, longrope=False, sliding=8)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.sliding_window == 8 and not cfg.longrope
    params = load_params(g)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30,
                        200, 4, 99, 12, 63, 7, 151, 41, 2, 88]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse


def test_phi3_paged_equals_dense(tmp_path):
    """Paged decode (paged_kv._make_paged_step_phi3) reproduces the dense
    engine token-for-token — LongRoPE factors, attn-factor scaling and the
    sliding window all live in the paged step."""
    from ggml_tpu.paged_kv import PagedConfig
    from ggml_tpu.serve import Engine

    for longrope, sliding in ((True, 0), (False, 6)):
        hf, path = _tiny(tmp_path, longrope=longrope, sliding=sliding)
        g = GGUFFile(path)
        m = Phi3(load_params(g), config_from_gguf(g), max_seq=32, batch=1)

        prompts = [[1, 2, 3], [9, 7]]
        dense = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
        rids = [dense.submit(p, 6) for p in prompts]
        dres = dense.run()
        want = {tuple(p): dres[r] for p, r in zip(prompts, rids)}

        # window (4*8=32) == max_seq: the static LongRoPE regime agrees
        eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32,
                     paged=PagedConfig(n_pages=10, page_size=8,
                                       max_pages_per_seq=4))
        rids = [eng.submit(p, 6) for p in prompts]
        res = eng.run()
        for p, r in zip(prompts, rids):
            assert res[r] == want[tuple(p)], (longrope, sliding, p)


def test_phi3_speculative_equals_greedy(tmp_path):
    """Greedy speculative decoding with a phi3 draft emits tokens IDENTICAL
    to plain decoding (lossless draft-and-verify through the engine)."""
    from ggml_tpu.serve import Engine

    hf, path = _tiny(tmp_path, longrope=False)
    g = GGUFFile(path)
    m = Phi3(load_params(g), config_from_gguf(g), max_seq=48, batch=1)
    # the draft is the same tiny model — acceptance is 100%, losslessness is
    # what the gate proves (mixed-size drafts ride the same code path)
    d = Phi3(load_params(g), config_from_gguf(g), max_seq=48, batch=1)

    prompts = [[4, 5, 6, 2], [11]]
    plain = Engine(m, max_batch=2, max_seq=48, cache_dtype=jnp.float32)
    rids = [plain.submit(p, 7) for p in prompts]
    pres = plain.run()
    want = {tuple(p): pres[r] for p, r in zip(prompts, rids)}

    spec = Engine(m, max_batch=2, max_seq=48, cache_dtype=jnp.float32,
                  draft=d, draft_k=3)
    rids = [spec.submit(p, 7) for p in prompts]
    sres = spec.run()
    for p, r in zip(prompts, rids):
        assert sres[r] == want[tuple(p)], (p, sres[r], want[tuple(p)])
