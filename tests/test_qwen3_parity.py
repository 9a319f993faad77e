"""Qwen3 parity vs HF transformers through the GGUF round trip (llama.cpp
arch 'qwen3' on the llama family): per-head q/k RMSNorm before rope and a
head_dim DECOUPLED from n_embd // n_head (the tiny config uses head_dim=16
with n_embd=64, n_head=8 -> inner width 128 != 64, so the decoupling is
load-bearing)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_qwen3 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.llama import Llama, config_from_gguf, forward, init_cache
from ggml_tpu.models.gpt2 import load_params


def _nmse(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return float(((got - want) ** 2).sum() / ((want ** 2).sum() + 1e-30))


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=8, num_key_value_heads=4,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(47)
    hf = transformers.Qwen3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("qwen3") / "tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def _load(path, **kw):
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.qk_norm and cfg.head_dim == 16
    assert cfg.n_head * cfg.head_dim != cfg.n_embd  # decoupled width in play
    return Llama(load_params(g, jnp.float32), cfg, max_seq=64, batch=1, **kw)


def test_qwen3_logits_match_hf(tiny):
    hf, path = tiny
    m = _load(path)
    rng = np.random.default_rng(18)
    toks = rng.integers(0, 128, (1, 20)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(m.cfg, 1, 64, jnp.float32)
    got, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                     jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    assert _nmse(got[0], want) < 1e-8, _nmse(got[0], want)


def test_qwen3_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    m = _load(path)
    toks = np.asarray([[3, 14, 15, 9, 2, 6]], np.int32)
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(toks.astype(np.int64)), max_new_tokens=12,
            do_sample=False, num_beams=1,
        ).numpy()[0, toks.shape[1]:]
    got = m.generate(toks, 12)
    assert got == [int(x) for x in want], (got, want)


def test_qwen3_paged_equals_dense(tiny):
    """Engine(paged=...) drives qwen3: the paged decode step must apply the
    same qk-norm as the dense path."""
    hf, path = tiny
    from ggml_tpu.paged_kv import PagedConfig
    from ggml_tpu.serve import Engine

    m = _load(path)
    prompts = [[1, 2, 3], [9, 9, 1, 7]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=64, cache_dtype=jnp.float32,
                 paged=PagedConfig(page_size=16, n_pages=32, max_pages_per_seq=4))
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
