"""WAV loading — the examples/common.cpp audio-input analog
(reference: read_wav in examples/common.cpp; 16-bit PCM -> float32 mono)."""

from __future__ import annotations

import wave

import numpy as np


def read_wav(path, target_rate: int | None = None) -> tuple[np.ndarray, int]:
    """Read a 16-bit PCM WAV file -> (float32 samples in [-1, 1], sample_rate).
    Multi-channel audio is averaged to mono (the reference's behavior).
    target_rate: optionally linearly resample."""
    with wave.open(str(path), "rb") as w:
        n_ch = w.getnchannels()
        rate = w.getframerate()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got {8 * width}-bit")
    pcm = np.frombuffer(frames, np.int16).astype(np.float32) / 32768.0
    if n_ch > 1:
        pcm = pcm.reshape(-1, n_ch).mean(axis=1)
    if target_rate and target_rate != rate:
        n_out = int(round(len(pcm) * target_rate / rate))
        x_old = np.linspace(0.0, 1.0, len(pcm), endpoint=False)
        x_new = np.linspace(0.0, 1.0, n_out, endpoint=False)
        pcm = np.interp(x_new, x_old, pcm).astype(np.float32)
        rate = target_rate
    return pcm, rate


def write_wav(path, samples: np.ndarray, rate: int) -> None:
    """Write float32 mono samples in [-1, 1] as 16-bit PCM."""
    pcm = np.clip(np.asarray(samples, np.float32), -1.0, 1.0)
    data = (pcm * 32767.0).astype(np.int16).tobytes()
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(data)
