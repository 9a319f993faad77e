"""BERT parity vs HF transformers through the GGUF round trip (llama.cpp
arch 'bert') — the encoder/embedding modality: bidirectional attention,
padding masks over a ragged batch, post-LN blocks, CLS/mean/pooler
pooling."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_bert import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.bert import Bert, config_from_gguf, forward, pool
from ggml_tpu.models.gpt2 import load_params


def _nmse(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return float(((got - want) ** 2).sum() / ((want ** 2).sum() + 1e-30))


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=64, type_vocab_size=2, layer_norm_eps=1e-12,
        attn_implementation="eager",
    )
    torch.manual_seed(31)
    hf = transformers.BertModel(cfg).eval()
    path = tmp_path_factory.mktemp("bert") / "tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def _load(path):
    g = GGUFFile(path)
    return Bert(load_params(g, jnp.float32), config_from_gguf(g))


def test_bert_hidden_states_match_hf(tiny):
    hf, path = tiny
    m = _load(path)
    rng = np.random.default_rng(8)
    toks = rng.integers(0, 128, (2, 12)).astype(np.int32)
    types = (rng.integers(0, 2, (2, 12))).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64)),
                  token_type_ids=torch.from_numpy(types.astype(np.int64))
                  ).last_hidden_state.numpy()
    got = forward(m.params, m.cfg, jnp.asarray(toks), None, jnp.asarray(types))
    assert _nmse(got, want) < 1e-9, _nmse(got, want)


def test_bert_padding_mask_matches_hf(tiny):
    """Ragged batch through one static program: padded keys must not leak
    into real positions (bidirectional attention over the mask)."""
    hf, path = tiny
    m = _load(path)
    rng = np.random.default_rng(9)
    toks = rng.integers(0, 128, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.float32)
    mask[0, 6:] = 0.0  # row 0 is a 6-token sequence
    mask[1, 8:] = 0.0
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64)),
                  attention_mask=torch.from_numpy(mask.astype(np.int64))
                  ).last_hidden_state.numpy()
    got = np.asarray(forward(m.params, m.cfg, jnp.asarray(toks), jnp.asarray(mask)))
    # only REAL positions are comparable (HF computes garbage at pads too)
    for r, n in ((0, 6), (1, 8)):
        assert _nmse(got[r, :n], want[r, :n]) < 1e-9


def test_bert_pooler_and_mean_embeddings(tiny):
    hf, path = tiny
    m = _load(path)
    rng = np.random.default_rng(10)
    toks = rng.integers(0, 128, (2, 8)).astype(np.int32)
    mask = np.ones((2, 8), np.float32)
    with torch.no_grad():
        o = hf(torch.from_numpy(toks.astype(np.int64)))
        want_pooled = o.pooler_output.numpy()
        want_mean = o.last_hidden_state.numpy().mean(1)
    h, e_mean = m.encode(toks, mask)
    assert _nmse(e_mean, want_mean) < 1e-9
    e_pool = pool(m.params, m.cfg, h, jnp.asarray(mask), kind="pooler")
    assert _nmse(e_pool, want_pooled) < 1e-8

    _, e_norm = m.encode(toks, mask, normalize=True)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e_norm), axis=-1), 1.0,
                               rtol=1e-5)


def test_bert_retrieval_self_similarity(tiny):
    """Embedding sanity: identical inputs embed identically; cosine of a
    sequence with itself > with a different one."""
    hf, path = tiny
    m = _load(path)
    a = np.asarray([[5, 6, 7, 8]], np.int32)
    b = np.asarray([[40, 81, 9, 3]], np.int32)
    _, ea = m.encode(a, normalize=True)
    _, ea2 = m.encode(a.copy(), normalize=True)
    _, eb = m.encode(b, normalize=True)
    ea, ea2, eb = map(np.asarray, (ea, ea2, eb))
    np.testing.assert_allclose(ea, ea2, atol=1e-6)
    assert float(ea @ ea.T) > float(ea @ eb.T)
