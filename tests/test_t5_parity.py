"""T5 parity vs HF transformers through the GGUF round trip (llama.cpp arch
't5') — the encoder-decoder modality: relative position buckets,
cross-attention, unscaled attention, T5 RMSNorm, tied scaled lm head.
Covers classic (relu) AND v1.1 (gated-gelu) FFNs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_t5 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.t5 import (T5, config_from_gguf, cross_kv, decode_step,
                                encode, init_cache)
from ggml_tpu.models.gpt2 import load_params


def _nmse(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return float(((got - want) ** 2).sum() / ((want ** 2).sum() + 1e-30))


def _make(tmp, ff_proj: str, seed: int):
    cfg = transformers.T5Config(
        vocab_size=128, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj=ff_proj,
        decoder_start_token_id=0, eos_token_id=1, pad_token_id=0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(seed)
    hf = transformers.T5ForConditionalGeneration(cfg).eval()
    path = tmp / f"t5_{ff_proj.replace('-', '')}.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return _make(tmp_path_factory.mktemp("t5"), "relu", 23)


def _load(path, **kw):
    g = GGUFFile(path)
    return T5(load_params(g, jnp.float32), config_from_gguf(g), **kw)


def test_t5_encoder_matches_hf(tiny):
    """Bidirectional relative-bucket attention + T5 RMSNorm, with a padding
    mask over a ragged batch."""
    hf, path = tiny
    m = _load(path)
    rng = np.random.default_rng(12)
    toks = rng.integers(2, 128, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.float32)
    mask[1, 7:] = 0.0
    with torch.no_grad():
        want = hf.encoder(torch.from_numpy(toks.astype(np.int64)),
                          attention_mask=torch.from_numpy(mask.astype(np.int64))
                          ).last_hidden_state.numpy()
    got = np.asarray(encode(m.params, m.cfg, jnp.asarray(toks), jnp.asarray(mask)))
    assert _nmse(got[0], want[0]) < 1e-9
    assert _nmse(got[1, :7], want[1, :7]) < 1e-9  # real positions only


def test_t5_seq2seq_logits_match_hf(tiny):
    """Full enc->dec forward: cross-attention + causal relative bias +
    scaled tied head."""
    hf, path = tiny
    m = _load(path)
    rng = np.random.default_rng(13)
    src = rng.integers(2, 128, (1, 9)).astype(np.int32)
    tgt = rng.integers(2, 128, (1, 6)).astype(np.int32)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(src.astype(np.int64)),
                  decoder_input_ids=torch.from_numpy(tgt.astype(np.int64))
                  ).logits.numpy()[0]
    enc = encode(m.params, m.cfg, jnp.asarray(src))
    xkv = cross_kv(m.params, m.cfg, enc)
    cache = init_cache(m.cfg, 1, 32, jnp.float32)
    got, _ = decode_step(m.params, m.cfg, jnp.asarray(tgt),
                         jnp.zeros((1,), jnp.int32), cache, jnp.int32(0), xkv)
    assert _nmse(got[0], want) < 1e-8, _nmse(got[0], want)


def test_t5_gated_gelu_variant(tmp_path):
    """v1.1 gated-gelu FFN flows through GGUF metadata (ffn_gate tensor)."""
    hf, path = _make(tmp_path, "gated-gelu", 29)
    m = _load(path)
    assert m.cfg.gated_act
    rng = np.random.default_rng(14)
    src = rng.integers(2, 128, (1, 8)).astype(np.int32)
    tgt = rng.integers(2, 128, (1, 5)).astype(np.int32)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(src.astype(np.int64)),
                  decoder_input_ids=torch.from_numpy(tgt.astype(np.int64))
                  ).logits.numpy()[0]
    enc = encode(m.params, m.cfg, jnp.asarray(src))
    xkv = cross_kv(m.params, m.cfg, enc)
    cache = init_cache(m.cfg, 1, 32, jnp.float32)
    got, _ = decode_step(m.params, m.cfg, jnp.asarray(tgt),
                         jnp.zeros((1,), jnp.int32), cache, jnp.int32(0), xkv)
    assert _nmse(got[0], want) < 1e-8, _nmse(got[0], want)


def test_t5_incremental_decode_equals_full(tiny):
    """1-token cached steps == one full decoder forward (relative bias must
    be exact at every absolute position)."""
    hf, path = tiny
    m = _load(path)
    rng = np.random.default_rng(15)
    src = rng.integers(2, 128, (1, 7)).astype(np.int32)
    tgt = rng.integers(2, 128, (1, 8)).astype(np.int32)
    enc = encode(m.params, m.cfg, jnp.asarray(src))
    xkv = cross_kv(m.params, m.cfg, enc)

    cache = init_cache(m.cfg, 1, 32, jnp.float32)
    full, _ = decode_step(m.params, m.cfg, jnp.asarray(tgt),
                          jnp.zeros((1,), jnp.int32), cache, jnp.int32(0), xkv)

    cache = init_cache(m.cfg, 1, 32, jnp.float32)
    outs = []
    for j in range(8):
        lg, cache = decode_step(m.params, m.cfg, jnp.asarray(tgt[:, j:j + 1]),
                                jnp.full((1,), j, jnp.int32), cache,
                                jnp.int32(j), xkv)
        outs.append(np.asarray(lg[0]))
    inc = np.concatenate(outs, axis=0)
    assert _nmse(inc, np.asarray(full[0])) < 1e-10


def test_t5_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    m = _load(path, max_seq=32)
    src = np.asarray([[5, 14, 25, 9, 3, 6, 77]], np.int32)
    with torch.no_grad():
        want = hf.generate(torch.from_numpy(src.astype(np.int64)),
                           max_new_tokens=10, do_sample=False, num_beams=1
                           ).numpy()[0]
    # HF output starts with decoder_start_token_id; ours returns generated only
    want = [int(x) for x in want[1:]]
    got = m.generate(src, 10, decoder_start_id=0, eos_id=1)
    assert got == want[:len(got)] and len(got) > 0, (got, want)
