"""Continuous batching for the recurrent (Mamba) family: per-slot conv/ssm
STATE replaces the KV cache (the llama.cpp recurrent slot-cache analog for
its 'mamba' arch).  Prefill is exact-length — pads would pollute the
recurrence — and preemption snapshots the O(1) state (cheapest possible
eviction: a few KB per slot, restored losslessly)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_mamba import convert_state_dict

from ggml_tpu.models.mamba import Mamba
from ggml_tpu.serve import Engine


@pytest.fixture(scope="module")
def mamba_model(tmp_path_factory):
    cfg = transformers.MambaConfig(
        vocab_size=128, hidden_size=32, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank=4,
    )
    torch.manual_seed(7)
    hf = transformers.MambaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("mamba_serve") / "m.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return Mamba.from_gguf(str(path))


PROMPTS = [[1, 2, 3], [4, 5], [9, 9, 1, 7], [3, 3], [8, 2, 6]]
MAX_NEW = 6


def _solo(m):
    return {tuple(p): m.generate(np.asarray([p], np.int32), MAX_NEW) for p in PROMPTS}


def test_mamba_engine_matches_solo(mamba_model):
    """Interleaved continuous batching over recurrent state slots == solo
    generate() per prompt (2 slots, 5 requests: admission churn included)."""
    m = mamba_model
    solo = _solo(m)
    eng = Engine(m, max_batch=2, max_seq=64, cache_dtype=jnp.float32)
    rids = [eng.submit(p, MAX_NEW) for p in PROMPTS]
    res = eng.run()
    for rid, p in zip(rids, PROMPTS):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])


def test_mamba_engine_priority_preemption_snapshots_state(mamba_model):
    """An urgent request preempts a running one; the evicted slot's conv/ssm
    state is snapshotted and restored (prefill runs exactly once per
    request), outputs stay lossless."""
    m = mamba_model
    solo = _solo(m)

    eng = Engine(m, max_batch=2, max_seq=64, cache_dtype=jnp.float32)
    state = {"n": 0, "sub": False}

    def on_tok(rid, tok, done):
        state["n"] += 1
        if state["n"] == 2 and not state["sub"]:
            state["sub"] = True
            eng.submit([9, 9, 1, 7], MAX_NEW, priority=0)

    r1 = eng.submit([1, 2, 3], MAX_NEW, priority=5, on_token=on_tok)
    r2 = eng.submit([4, 5], MAX_NEW, priority=5)
    res = eng.run()
    assert res[r1] == solo[(1, 2, 3)]
    assert res[r2] == solo[(4, 5)]
    assert res[3] == solo[(9, 9, 1, 7)]
    assert eng.prefill_count == 3  # snapshot resume: no re-prefill
    assert state["sub"]


def test_mamba_engine_rejects_kv_only_modes(mamba_model):
    from ggml_tpu.paged_kv import PagedConfig

    with pytest.raises(ValueError, match="recurrent"):
        Engine(mamba_model, max_batch=2,
               paged=PagedConfig(page_size=8, n_pages=16, max_pages_per_seq=8))
    with pytest.raises(ValueError, match="recurrent"):
        Engine(mamba_model, max_batch=2, draft=mamba_model)
    with pytest.raises(ValueError, match="recurrent"):
        Engine(mamba_model, max_batch=2, prefill_chunk=8)


def test_mamba_engine_sampled_and_streaming(mamba_model):
    """Sampled decode + streaming callbacks run on the recurrent engine
    (per-slot on-device top-k sampling is family-agnostic)."""
    m = mamba_model
    eng = Engine(m, max_batch=2, max_seq=64, cache_dtype=jnp.float32,
                 sampler=dict(temperature=0.8, top_k=20), seed=3)
    got = []
    rid = eng.submit([5, 6, 7], 5, on_token=lambda r, t, d: got.append(t))
    res = eng.run()
    assert res[rid] == got and len(got) == 5
    assert all(0 <= t < 128 for t in got)
