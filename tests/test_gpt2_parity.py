"""End-to-end GPT-2 parity: random-initialized HF GPT2LMHeadModel (torch CPU)
vs our JAX implementation loaded through the full GGUF round trip.

This is the model-level analog of the reference's 'examples as integration
tests' idiom (SURVEY.md §4) — validates converter + GGUF + model assembly +
KV-cache decode in one shot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import GPT2, config_from_gguf, load_params

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from tools.convert_hf_gpt2 import convert_state_dict


@pytest.fixture(scope="module")
def tiny_hf_model():
    cfg = transformers.GPT2Config(
        vocab_size=512, n_positions=128, n_embd=64, n_layer=3, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(7)
    model = transformers.GPT2LMHeadModel(cfg)
    model.eval()
    return model, cfg


def test_logits_match_hf(tiny_hf_model, tmp_path):
    model, cfg = tiny_hf_model
    w = convert_state_dict(model.state_dict(), cfg)
    path = tmp_path / "tiny.gguf"
    w.write(path)

    g = GGUFFile(path)
    mcfg = config_from_gguf(g)
    assert mcfg.n_layer == 3 and mcfg.n_embd == 64

    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 512, (1, 17)).astype(np.int32)

    with torch.no_grad():
        hf_logits = model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()

    m = GPT2(load_params(g), mcfg, max_seq=64, batch=1)
    cache = m.new_cache()
    import jax.numpy as jnp

    logits, _ = m._step(m.params, jnp.asarray(tokens), jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    logits = np.asarray(logits)

    np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward(tiny_hf_model, tmp_path):
    """Decoding token-by-token through the KV cache must equal one full pass."""
    model, cfg = tiny_hf_model
    w = convert_state_dict(model.state_dict(), cfg)
    path = tmp_path / "tiny2.gguf"
    w.write(path)
    g = GGUFFile(path)
    m = GPT2(load_params(g), config_from_gguf(g), max_seq=32, batch=1)

    rng = np.random.default_rng(5)
    toks = rng.integers(0, 512, (1, 12)).astype(np.int32)

    import jax.numpy as jnp

    cache = m.new_cache()
    full_logits, _ = m._step(m.params, jnp.asarray(toks), jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    full_logits = np.asarray(full_logits)

    # prefill 6, then decode 6 one at a time
    cache = m.new_cache()
    logits, cache, n_past = m.prefill(cache, toks[:, :6])
    np.testing.assert_allclose(np.asarray(logits), full_logits[:, 5], rtol=1e-4, atol=1e-5)
    for i in range(6, 12):
        logits, cache = m.decode_step(cache, toks[:, i : i + 1], i)
        np.testing.assert_allclose(
            np.asarray(logits), full_logits[:, i], rtol=1e-4, atol=1e-5,
            err_msg=f"decode step {i}",
        )


def test_q8_0_quantized_model_close(tiny_hf_model, tmp_path):
    model, cfg = tiny_hf_model
    w = convert_state_dict(model.state_dict(), cfg, GGMLType.Q8_0)
    path = tmp_path / "tiny_q8.gguf"
    w.write(path)
    g = GGUFFile(path)
    # embeddings padded to 64 wide aren't multiples of 256 -> stay f32; qkv etc quantize
    assert any(t.ggml_type == GGMLType.Q8_0 for t in g.tensors.values())
    m = GPT2(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 512, (1, 9)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks, dtype=torch.long)).logits.numpy()
    import jax.numpy as jnp

    cache = m.new_cache()
    logits, _ = m._step(m.params, jnp.asarray(toks), jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    # quantization noise: correlation must stay very high
    a = np.asarray(logits).ravel()
    b = hf_logits.ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, corr


def test_keep_quantized_planar_path_matches_dequant(tmp_path):
    """The Pallas fused dequant-matmul inference path must match the
    dequantize-on-load path on the SAME quantized weights (bf16 MXU rounding
    only). Exercises repack + planar_matmul + the dense embedding copy."""
    cfg = transformers.GPT2Config(
        vocab_size=512, n_positions=128, n_embd=256, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(11)
    model = transformers.GPT2LMHeadModel(cfg)
    model.eval()
    w = convert_state_dict(model.state_dict(), cfg, GGMLType.Q4_K)
    path = tmp_path / "tiny_q4k.gguf"
    w.write(path)
    g = GGUFFile(path)
    assert any(t.ggml_type == GGMLType.Q4_K for t in g.tensors.values())
    mcfg = config_from_gguf(g)

    from ggml_tpu.quant.planar import PlanarWeight

    params_dq = load_params(g)
    params_q = load_params(g, keep_quantized=True)
    assert any(isinstance(v, PlanarWeight) for v in params_q.values())
    assert "token_embd.weight@dense" in params_q

    m_dq = GPT2(params_dq, mcfg, max_seq=32, batch=1)
    m_q = GPT2(params_q, mcfg, max_seq=32, batch=1)
    rng = np.random.default_rng(5)
    toks = rng.integers(0, 512, (1, 16)).astype(np.int32)
    import jax.numpy as jnp

    l_dq, _ = m_dq._step(m_dq.params, jnp.asarray(toks), jnp.zeros((1,), jnp.int32), m_dq.new_cache(), jnp.int32(0))
    l_q, _ = m_q._step(m_q.params, jnp.asarray(toks), jnp.zeros((1,), jnp.int32), m_q.new_cache(), jnp.int32(0))
    a = np.asarray(l_dq, np.float64)
    b = np.asarray(l_q, np.float64)
    nmse = ((a - b) ** 2).sum() / (a * a).sum()
    assert nmse < 5e-4, nmse
    # same argmax predictions on every position
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.9
