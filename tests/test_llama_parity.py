"""Llama parity: random-init HF LlamaForCausalLM vs our model through GGUF —
GQA, RMSNorm, SwiGLU, rotate-half RoPE."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from tools.convert_hf_llama import convert_state_dict


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,  # GQA
        max_position_embeddings=128, rms_norm_eps=1e-5, attention_dropout=0.0,
    )
    torch.manual_seed(5)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("llama") / "tiny.gguf"
    convert_state_dict(model.state_dict(), cfg).write(path)
    return model, cfg, path


def test_llama_logits_match_hf(tiny_llama):
    model, cfg, path = tiny_llama
    g = GGUFFile(path)
    mcfg = config_from_gguf(g)
    assert mcfg.n_head_kv == 2 and mcfg.n_ff == 128

    rng = np.random.default_rng(7)
    toks = rng.integers(0, 512, (1, 11)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks, dtype=torch.long)).logits.numpy()

    import jax.numpy as jnp

    m = Llama(load_params(g), mcfg, max_seq=32, batch=1)
    cache = m.new_cache(dtype=jnp.float32)
    logits, _ = m._step(m.params, jnp.asarray(toks), jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=3e-3, atol=2e-3)


def test_llama_decode_loop(tiny_llama):
    model, cfg, path = tiny_llama
    g = GGUFFile(path)
    m = Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    import jax.numpy as jnp

    prompt = np.asarray([[3, 5, 7]], np.int32)
    cache = m.new_cache(dtype=jnp.float32)
    logits, cache, n_past = m.prefill(cache, prompt)
    first = np.asarray(jnp.argmax(logits, -1))[:, None].astype(np.int32)
    cache, toks = m.decode_greedy(cache, first, n_past, 6)
    assert toks.shape == (6, 1) or toks.shape == (6,)
    with torch.no_grad():
        hf = model.generate(
            torch.tensor(prompt, dtype=torch.long), max_new_tokens=7, do_sample=False,
            pad_token_id=0,
        ).numpy()[0, 3:]
    ours = [int(first[0, 0])] + [int(t) for t in np.asarray(toks).reshape(-1)]
    assert ours == list(hf), (ours, list(hf))


def test_rope_linear_scaling_equals_fractional_positions():
    """Linear rope scaling by factor f == plain rope at positions/f
    (ggml_rope_ext freq_scale semantics)."""
    import jax.numpy as jnp
    from dataclasses import replace as dc_replace

    from ggml_tpu.models.llama import LlamaConfig, _rope_half, _rope_half_scaled

    cfg = LlamaConfig(n_vocab=32, n_ctx=64, n_embd=32, n_head=2, n_head_kv=2,
                      n_layer=1, n_ff=64, rope_scaling="linear", rope_scale=4.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 5, 2, 16)).astype(np.float32))
    pos = jnp.asarray(np.arange(8, 13)[None, :])
    got = _rope_half_scaled(x, pos, cfg)
    want = _rope_half(x, pos / 4.0, cfg.rope_base)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_rope_scaling_metadata_roundtrip(tmp_path):
    """HF rope_scaling config -> GGUF scaling keys -> LlamaConfig."""
    import torch
    import transformers

    from tools.convert_hf_llama import convert_state_dict
    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.models.llama import config_from_gguf

    cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2, max_position_embeddings=64,
        rope_scaling={"rope_type": "linear", "factor": 2.0},
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp_path / "scaled.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    jcfg = config_from_gguf(GGUFFile(path))
    assert jcfg.rope_scaling == "linear" and jcfg.rope_scale == 2.0
