"""WAV loader round trip (examples/common.cpp read_wav analog)."""

import numpy as np

from ggml_tpu.utils.wav import read_wav, write_wav


def test_wav_roundtrip(tmp_path):
    rate = 16000
    t = np.arange(rate) / rate
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, sig, rate)
    back, r = read_wav(p)
    assert r == rate and back.shape == sig.shape
    assert np.abs(back - sig).max() < 2e-4  # 16-bit quantization

    down, r2 = read_wav(p, target_rate=8000)
    assert r2 == 8000 and abs(len(down) - rate // 2) <= 1
