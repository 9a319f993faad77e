"""Cohere Command-R family parity vs HF transformers through the GGUF
round trip: single-norm parallel residual, interleaved-pair rope,
mean-subtracted norms, per-head qk-norm (R+/Aya variant), logit_scale."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_cohere import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.cohere import Cohere, config_from_gguf, forward, init_cache
from ggml_tpu.models.gpt2 import load_params


def _tiny(tmp, qk_norm=False):
    cfg = transformers.CohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, logit_scale=0.25,
        use_qk_norm=qk_norm, layer_norm_eps=1e-5, attention_dropout=0.0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(29)
    hf = transformers.CohereForCausalLM(cfg).eval()
    path = tmp / f"cohere_{qk_norm}.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def _load(path, max_seq=32):
    g = GGUFFile(path)
    return Cohere(load_params(g), config_from_gguf(g), max_seq=max_seq, batch=1)


@pytest.mark.parametrize("qk_norm", [False, True])
def test_cohere_logits_match_hf(tmp_path, qk_norm):
    hf, path = _tiny(tmp_path, qk_norm=qk_norm)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.qk_norm == qk_norm and cfg.logit_scale == 0.25
    params = load_params(g)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse


def test_cohere_greedy_generation_matches_hf(tmp_path):
    hf, path = _tiny(tmp_path)
    m = _load(path)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_cohere_serving_engine(tmp_path):
    _, path = _tiny(tmp_path, qk_norm=True)
    from ggml_tpu.serve import Engine

    m = _load(path)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
