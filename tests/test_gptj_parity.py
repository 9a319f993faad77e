"""GPT-J parity: random-init HF GPTJForCausalLM (torch CPU) vs our JAX model
through the GGUF round trip — interleaved RoPE, parallel residual, untied
biased lm head (reference: examples/gpt-j/main.cpp:449-585)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.gptj import GPTJ, config_from_gguf

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from tools.convert_hf_gptj import convert_state_dict


@pytest.fixture(scope="module")
def tiny_gptj(tmp_path_factory):
    cfg = transformers.GPTJConfig(
        vocab_size=512, n_positions=128, n_embd=64, n_layer=2, n_head=4,
        rotary_dim=8, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(13)
    model = transformers.GPTJForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("gptj") / "tiny.gguf"
    convert_state_dict(model.state_dict(), cfg).write(path)
    return model, cfg, path


def test_gptj_logits_match_hf(tiny_gptj):
    model, cfg, path = tiny_gptj
    g = GGUFFile(path)
    mcfg = config_from_gguf(g)
    assert mcfg.n_layer == 2 and mcfg.n_rot == 8

    rng = np.random.default_rng(3)
    toks = rng.integers(0, 512, (1, 13)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks, dtype=torch.long)).logits.numpy()

    import jax.numpy as jnp

    m = GPTJ(load_params(g), mcfg, max_seq=32, batch=1)
    cache = m.new_cache(dtype=jnp.float32)
    logits, _ = m._step(m.params, jnp.asarray(toks), jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=2e-3, atol=2e-3)


def test_gptj_decode_loop_matches_stepwise(tiny_gptj):
    """The fused lax.scan decode loop must produce the same tokens as
    step-by-step decoding."""
    model, cfg, path = tiny_gptj
    g = GGUFFile(path)
    m = GPTJ(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    prompt = rng.integers(0, 512, (1, 5)).astype(np.int32)

    # step-by-step
    cache = m.new_cache(dtype=jnp.float32)
    logits, cache, n_past = m.prefill(cache, prompt)
    tok = np.asarray(jnp.argmax(logits, -1))[:, None].astype(np.int32)
    seq = []
    for i in range(8):
        l, cache = m._step(m.params, jnp.asarray(tok), jnp.full((1,), n_past, jnp.int32), cache, jnp.int32(n_past))
        n_past += 1
        tok = np.asarray(jnp.argmax(l[:, -1], -1))[:, None].astype(np.int32)
        seq.append(int(tok[0, 0]))

    # scan loop
    cache2 = m.new_cache(dtype=jnp.float32)
    logits2, cache2, n_past2 = m.prefill(cache2, prompt)
    first = np.asarray(jnp.argmax(logits2, -1))[:, None].astype(np.int32)
    _, toks = m.decode_greedy(cache2, first, n_past2, 8)
    assert seq == list(toks.reshape(-1)), (seq, toks)
