"""SmolLM3 parity vs HF transformers through the llama family: NoPE every
4th layer (no positional signal in those layers), tied embeddings; the
paged decode step skips rope on the same layers (paged == dense)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_smollm3 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf, forward, init_cache


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.SmolLM3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-6,
        no_rope_layer_interval=4, use_sliding_window=False,
        tie_word_embeddings=True, attention_dropout=0.0, pad_token_id=0,
        eos_token_id=1, bos_token_id=2,
    )
    assert cfg.no_rope_layers == [1, 1, 1, 0]  # layer 4 is NoPE
    torch.manual_seed(71)
    hf = transformers.SmolLM3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("smollm3") / "smollm3_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_smollm3_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.nope_interval == 4
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
    # the NoPE config is load-bearing: applying rope everywhere diverges
    cfg_all_rope = type(cfg)(**{**cfg.__dict__, "nope_interval": 0})
    cache = init_cache(cfg, 1, 32, jnp.float32)
    roped, _ = forward(params, cfg_all_rope, jnp.asarray(toks),
                       jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    assert not np.allclose(np.asarray(roped[0]), got)


def test_smollm3_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    m = Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_smollm3_paged_equals_dense(tiny):
    _, path = tiny
    from ggml_tpu.paged_kv import PagedConfig
    from ggml_tpu.serve import Engine

    g = GGUFFile(path)
    m = Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    prompts = [[1, 2, 3], [9, 9, 1, 7]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32,
                 paged=PagedConfig(page_size=8, n_pages=16, max_pages_per_seq=4))
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
