"""Whisper family parity vs HF transformers through the GGUF round trip:
log-mel frontend == WhisperFeatureExtractor, encoder-decoder logits == HF,
greedy transcription == a manual torch greedy loop."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_whisper import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.whisper import (Whisper, config_from_gguf, cross_kv,
                                     decode_step, encode, init_cache,
                                     log_mel_spectrogram)


def _tiny(tmp):
    cfg = transformers.WhisperConfig(
        vocab_size=256, num_mel_bins=8, d_model=32, encoder_layers=2,
        encoder_attention_heads=4, decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_source_positions=40,
        max_target_positions=32, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(5)
    hf = transformers.WhisperForConditionalGeneration(cfg).eval()
    path = tmp / "whisper.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def _mel(cfg_hf, rng):
    # tiny config: 40 source positions -> 80 input frames
    return jnp.asarray(rng.standard_normal((1, cfg_hf.num_mel_bins,
                                            2 * cfg_hf.max_source_positions)),
                       jnp.float32)


def test_log_mel_matches_hf_feature_extractor():
    fe = transformers.WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    want = fe(audio, sampling_rate=16000, return_tensors="np",
              padding="max_length").input_features[0]  # (80, 3000)
    got = log_mel_spectrogram(audio, n_mels=80)
    assert got.shape == want.shape, (got.shape, want.shape)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-10, nmse


def test_whisper_logits_match_hf(tmp_path):
    hf, path = _tiny(tmp_path)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_mels == 8 and cfg.n_audio_ctx == 40
    params = load_params(g)

    rng = np.random.default_rng(1)
    mel = _mel(hf.config, rng)
    dec_ids = np.asarray([[5, 17, 100, 3, 42]], np.int32)

    with torch.no_grad():
        out = hf(input_features=torch.from_numpy(np.asarray(mel)),
                 decoder_input_ids=torch.from_numpy(dec_ids.astype(np.int64)))
        want = out.logits.numpy()[0]
        want_enc = hf.model.encoder(
            torch.from_numpy(np.asarray(mel))).last_hidden_state.numpy()[0]

    enc = encode(params, cfg, mel)
    got_enc = np.asarray(enc[0], np.float32)
    nmse_e = float(((got_enc - want_enc) ** 2).sum() / (want_enc ** 2).sum())
    assert nmse_e < 1e-9, nmse_e

    xkv = cross_kv(params, cfg, enc)
    cache = init_cache(cfg, 1, 16)
    logits, _ = decode_step(params, cfg, jnp.asarray(dec_ids),
                            jnp.zeros((1,), jnp.int32), cache, jnp.int32(0), xkv)
    got = np.asarray(logits[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-9, nmse


def test_whisper_greedy_transcribe_matches_hf(tmp_path):
    hf, path = _tiny(tmp_path)
    g = GGUFFile(path)
    m = Whisper(load_params(g), config_from_gguf(g), max_seq=24, batch=1)

    rng = np.random.default_rng(2)
    mel = np.asarray(_mel(hf.config, rng))
    prompt = [7, 3]  # stands in for <|sot|>... forced ids
    n_new = 10

    # manual HF greedy loop (sidesteps generation-config forced/suppress ids)
    with torch.no_grad():
        feats = torch.from_numpy(mel)
        ids = torch.tensor([prompt], dtype=torch.int64)
        for _ in range(n_new):
            logits = hf(input_features=feats, decoder_input_ids=ids).logits
            nxt = logits[:, -1, :].argmax(-1, keepdim=True)
            ids = torch.cat([ids, nxt], dim=1)
    want = [int(x) for x in ids[0, len(prompt):]]

    got = m.transcribe_tokens(mel[0], prompt, n_new)
    assert got == want, (got, want)

    # eot truncation (stop at the first occurrence of the chosen id)
    eot = want[3]
    got_trunc = m.transcribe_tokens(mel[0], prompt, n_new, eot_id=eot)
    assert got_trunc == want[: want.index(eot)]
