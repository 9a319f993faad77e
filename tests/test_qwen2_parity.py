"""Qwen2 family parity vs HF transformers through the GGUF round trip:
llama layout + per-projection q/k/v biases + tied embeddings — llama.cpp's
'qwen2' architecture served by models/llama.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_qwen2 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf


def _tiny(tmp, tie: bool):
    cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=tie,
        attention_dropout=0.0,
    )
    torch.manual_seed(3)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    path = tmp / f"qwen2_{tie}.gguf"
    sd = dict(hf.state_dict())
    if tie:
        sd.pop("lm_head.weight", None)  # tied: llama.cpp omits output.weight
    convert_state_dict(sd, cfg).write(path)
    return hf, path


@pytest.mark.parametrize("tie", [False, True])
def test_qwen2_logits_match_hf(tmp_path, tie):
    hf, path = _tiny(tmp_path, tie)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_head_kv == 2  # GQA survives the round trip
    m = Llama(load_params(g), cfg, max_seq=32, batch=1)

    toks = np.asarray([[3, 14, 15, 92, 6, 53]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]

    cache = m.new_cache(jnp.float32)
    logits, cache, t = m.prefill(cache, toks)
    # prefill returns last-position logits; get full seq via forward
    from ggml_tpu.models.llama import forward

    cache2 = m.new_cache(jnp.float32)
    full, _ = forward(m.params, m.cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache2, jnp.int32(0))
    got = np.asarray(full[0], np.float32)

    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse

    # greedy continuation matches HF's
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)), max_new_tokens=8,
                             do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_qwen2_paged_equals_dense(tmp_path):
    """The paged decode path picks up the qkv biases too (paged == dense
    invariant holds for the qwen2 family)."""
    from ggml_tpu.paged_kv import PagedConfig
    from ggml_tpu.serve import Engine

    hf, path = _tiny(tmp_path, False)
    g = GGUFFile(path)
    m = Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)

    prompts = [[1, 2, 3], [9, 7]]
    dense = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [dense.submit(p, 6) for p in prompts]
    dres = dense.run()
    want = {tuple(p): dres[r] for p, r in zip(prompts, rids)}

    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32,
                 paged=PagedConfig(n_pages=8, page_size=8, max_pages_per_seq=4))
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for p, r in zip(prompts, rids):
        assert res[r] == want[tuple(p)], (p, res[r], want[tuple(p)])
