"""Whisper family — speech-to-text encoder-decoder (the whisper.cpp model,
ggml's flagship downstream application; reference repo ships the WAV loader
idiom in examples/common.cpp read_wav, which utils/wav.py mirrors).

Pipeline: 16 kHz audio -> log-mel spectrogram (host-side numpy, matching HF
WhisperFeatureExtractor semantics) -> conv subsample encoder (+ fixed
sinusoidal positions) -> causal decoder with learned positions, self-attn KV
cache and per-layer precomputed cross K/V -> tied lm head.

Architecture semantics match HF transformers.models.whisper
(WhisperForConditionalGeneration): pre-LN blocks with biased LayerNorm,
q/v/out projections biased while k_proj is bias-free, gelu FFN, q scaled by
head_dim^-0.5.

TPU notes: the mel frontend is host-side feature prep (like magika's); both
convs are one lax.conv_general_dilated each; encode once -> cross K/V cached;
decode is the standard jitted lax.scan with a donated cache (same shape as
models/t5.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import cache_write as _cache_write
from .common import linear as _linear

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds per encoder window
N_FRAMES = SAMPLE_RATE // HOP_LENGTH * CHUNK_LENGTH  # 3000


@dataclass(frozen=True)
class WhisperConfig:
    n_vocab: int = 51865
    n_mels: int = 80
    n_audio_ctx: int = 1500  # frames after the stride-2 conv
    n_embd: int = 384  # d_model (tiny)
    n_head: int = 6
    n_layer: int = 4  # encoder depth
    n_text_ctx: int = 448
    n_text_head: int = 6
    n_text_layer: int = 4
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def config_from_gguf(g: GGUFFile) -> WhisperConfig:
    md = g.metadata
    a = "whisper"
    return WhisperConfig(
        n_vocab=int(md[f"{a}.vocab_size"]),
        n_mels=int(md[f"{a}.encoder.mels_count"]),
        n_audio_ctx=int(md[f"{a}.encoder.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=int(md[f"{a}.encoder.attention.head_count"]),
        n_layer=int(md[f"{a}.encoder.block_count"]),
        n_text_ctx=int(md[f"{a}.decoder.context_length"]),
        n_text_head=int(md[f"{a}.decoder.attention.head_count"]),
        n_text_layer=int(md[f"{a}.decoder.block_count"]),
        eps=float(md.get(f"{a}.attention.layer_norm_epsilon", 1e-5)),
    )


# ---------------------------------------------------------------- mel frontend


def mel_filter_bank(n_mels: int = 80, n_fft: int = N_FFT,
                    sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-scale/slaney-normalized triangular mel filters,
    (n_mels, n_fft // 2 + 1) — HF WhisperFeatureExtractor's filterbank."""

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mels = 3.0 * f / 200.0
        log_reg = f >= 1000.0
        return np.where(
            log_reg, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
            mels)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_reg = m >= 15.0
        return np.where(log_reg, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)

    fft_freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sample_rate / 2),
                                    n_mels + 2))
    fdiff = np.diff(mel_pts)
    slopes = mel_pts[None, :] - fft_freqs[:, None]  # (freq, n_mels+2)
    down = -slopes[:, :-2] / fdiff[None, :-1]
    up = slopes[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up)).T  # (n_mels, freq)
    enorm = 2.0 / (mel_pts[2:] - mel_pts[:-2])  # slaney normalization
    return (fb * enorm[:, None]).astype(np.float32)


def log_mel_spectrogram(audio: np.ndarray, n_mels: int = 80,
                        pad_to_chunk: bool = True) -> np.ndarray:
    """16 kHz float audio -> (n_mels, frames) log-mel features, HF
    WhisperFeatureExtractor semantics: pad/truncate to 30 s, centered
    reflect-padded STFT with a periodic Hann window, power spectrum, slaney
    mel, log10 clipped to (max - 8), then (x + 4) / 4."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    if pad_to_chunk:
        n = CHUNK_LENGTH * SAMPLE_RATE
        audio = np.pad(audio[:n], (0, max(0, n - len(audio))))
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float64)  # periodic Hann
    x = np.pad(audio.astype(np.float64), (N_FFT // 2, N_FFT // 2), mode="reflect")
    n_frames = 1 + (len(x) - N_FFT) // HOP_LENGTH
    idx = (np.arange(N_FFT)[None, :]
           + HOP_LENGTH * np.arange(n_frames)[:, None])  # (frames, n_fft)
    frames = x[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # (frames, n_fft//2+1)
    spec = spec[:-1]  # HF drops the trailing frame
    mel = mel_filter_bank(n_mels) @ spec.T  # (n_mels, frames)
    logspec = np.log10(np.maximum(mel, 1e-10))
    logspec = np.maximum(logspec, logspec.max() - 8.0)
    return ((logspec + 4.0) / 4.0).astype(np.float32)


# -------------------------------------------------------------------- encoder


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def _conv1d(x, w, b, stride: int):
    """x (b, t, cin), w (cout, cin, k) [torch layout], pad 1."""
    out = jax.lax.conv_general_dilated(
        x, w.transpose(2, 1, 0), window_strides=(stride,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST)
    return out + b


def _attn(q, k, v, mask=None):
    """Scaled dot-product attention, fp32 softmax. q (b,h,t,d)."""
    att = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                     k.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    att = att * (q.shape[-1] ** -0.5)
    if mask is not None:
        att = jnp.where(mask, att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)


def _heads(z, b, t, n_head, head_dim):
    return z.reshape(b, t, n_head, head_dim).transpose(0, 2, 1, 3)


def _unheads(z, b, t):
    return z.transpose(0, 2, 1, 3).reshape(b, t, -1)


def _mha_block(params, pre, x, cfg, n_head):
    """Pre-LN self-attention block body (encoder: full bidirectional)."""
    b, t, _ = x.shape
    hd = x.shape[-1] // n_head
    h = _ln(x, params[pre + "attn_norm.weight"], params[pre + "attn_norm.bias"], cfg.eps)
    q = _heads(_linear(h, params[pre + "attn_q.weight"], params[pre + "attn_q.bias"]), b, t, n_head, hd)
    k = _heads(_linear(h, params[pre + "attn_k.weight"]), b, t, n_head, hd)  # no bias
    v = _heads(_linear(h, params[pre + "attn_v.weight"], params[pre + "attn_v.bias"]), b, t, n_head, hd)
    o = _unheads(_attn(q, k, v), b, t)
    x = x + _linear(o, params[pre + "attn_output.weight"], params[pre + "attn_output.bias"])
    h = _ln(x, params[pre + "ffn_norm.weight"], params[pre + "ffn_norm.bias"], cfg.eps)
    h = jax.nn.gelu(_linear(h, params[pre + "ffn_up.weight"], params[pre + "ffn_up.bias"]),
                    approximate=False)
    return x + _linear(h, params[pre + "ffn_down.weight"], params[pre + "ffn_down.bias"])


def encode(params: dict, cfg: WhisperConfig, mel):
    """mel (b, n_mels, 3000) -> encoder hidden (b, n_audio_ctx, n_embd)."""
    x = mel.transpose(0, 2, 1)  # (b, frames, n_mels)
    x = jax.nn.gelu(_conv1d(x, params["enc.conv1.weight"], params["enc.conv1.bias"], 1),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["enc.conv2.weight"], params["enc.conv2.bias"], 2),
                    approximate=False)
    x = x + params["enc.position_embd.weight"][: x.shape[1]]
    for i in range(cfg.n_layer):
        x = _mha_block(params, f"enc.blk.{i}.", x, cfg, cfg.n_head)
    return _ln(x, params["enc.output_norm.weight"], params["enc.output_norm.bias"], cfg.eps)


# -------------------------------------------------------------------- decoder


def cross_kv(params: dict, cfg: WhisperConfig, enc_hidden):
    """Per-layer cross-attention K/V from the encoder output (computed once
    per audio window; the decoder reuses them every step)."""
    b, s, _ = enc_hidden.shape
    hd = cfg.n_embd // cfg.n_text_head
    out = []
    for i in range(cfg.n_text_layer):
        pre = f"dec.blk.{i}."
        k = _heads(_linear(enc_hidden, params[pre + "cross_attn_k.weight"]), b, s,
                   cfg.n_text_head, hd)  # k_proj: no bias
        v = _heads(_linear(enc_hidden, params[pre + "cross_attn_v.weight"],
                           params[pre + "cross_attn_v.bias"]), b, s, cfg.n_text_head, hd)
        out.append((k, v))
    return tuple(out)


def init_cache(cfg: WhisperConfig, batch: int, max_seq: int, dtype=jnp.float32):
    from .common import init_layer_cache

    return init_layer_cache(cfg.n_text_layer, batch, cfg.n_text_head, max_seq,
                            cfg.n_embd // cfg.n_text_head, dtype)


def decode_step(params: dict, cfg: WhisperConfig, tokens, pos_start, cache,
                cache_len, xkv):
    """Decoder forward over t tokens against a populated self-attn cache +
    precomputed cross K/V.  Returns (logits (b, t, vocab), new_cache)."""
    b, t = tokens.shape
    n_head = cfg.n_text_head
    hd = cfg.n_embd // n_head
    max_seq = cache[0][0].shape[-2]
    positions = pos_start[:, None] + jnp.arange(t)[None, :]  # (b, t)
    x = (params["dec.token_embd.weight"][tokens]
         + params["dec.position_embd.weight"][positions])

    k_pos = jnp.arange(max_seq)
    causal = positions[:, None, :, None] >= k_pos[None, None, None, :]
    written = k_pos[None, None, None, :] <= positions[:, None, :, None]
    mask = causal & written

    cache_dtype = cache[0][0].dtype
    new_cache = list(cache)
    for i in range(cfg.n_text_layer):
        pre = f"dec.blk.{i}."
        h = _ln(x, params[pre + "attn_norm.weight"], params[pre + "attn_norm.bias"], cfg.eps)
        q = _heads(_linear(h, params[pre + "attn_q.weight"], params[pre + "attn_q.bias"]), b, t, n_head, hd)
        k = _heads(_linear(h, params[pre + "attn_k.weight"]), b, t, n_head, hd)
        v = _heads(_linear(h, params[pre + "attn_v.weight"], params[pre + "attn_v.bias"]), b, t, n_head, hd)
        kc = _cache_write(new_cache[i][0], k.astype(cache_dtype), cache_len)
        vc = _cache_write(new_cache[i][1], v.astype(cache_dtype), cache_len)
        new_cache[i] = (kc, vc)
        o = _unheads(_attn(q, kc, vc, mask), b, t)
        x = x + _linear(o, params[pre + "attn_output.weight"], params[pre + "attn_output.bias"])

        h = _ln(x, params[pre + "cross_attn_norm.weight"],
                params[pre + "cross_attn_norm.bias"], cfg.eps)
        qx = _heads(_linear(h, params[pre + "cross_attn_q.weight"],
                            params[pre + "cross_attn_q.bias"]), b, t, n_head, hd)
        ox = _unheads(_attn(qx, xkv[i][0], xkv[i][1]), b, t)
        x = x + _linear(ox, params[pre + "cross_attn_output.weight"],
                        params[pre + "cross_attn_output.bias"])

        h = _ln(x, params[pre + "ffn_norm.weight"], params[pre + "ffn_norm.bias"], cfg.eps)
        h = jax.nn.gelu(_linear(h, params[pre + "ffn_up.weight"], params[pre + "ffn_up.bias"]),
                        approximate=False)
        x = x + _linear(h, params[pre + "ffn_down.weight"], params[pre + "ffn_down.bias"])

    x = _ln(x, params["dec.output_norm.weight"], params["dec.output_norm.bias"], cfg.eps)
    logits = _linear(x, params["dec.token_embd.weight"])  # tied head, unscaled
    return logits, tuple(new_cache)


class Whisper:
    """Speech-to-text wrapper: jitted encode + on-device greedy decode."""

    def __init__(self, params: dict, cfg: WhisperConfig, max_seq: int = 224,
                 batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_seq = max_seq
        self.batch = batch

        self._encode = jax.jit(lambda p, m: encode(p, cfg, m))
        self._xkv = jax.jit(lambda p, h: cross_kv(p, cfg, h))
        self._step = jax.jit(
            lambda p, tok, pos, cache, clen, xkv:
            decode_step(p, cfg, tok, pos, cache, clen, xkv),
            donate_argnums=(3,),
        )

        def decode_loop(params, cache, first_token, n_past, xkv, steps_tokens):
            def body(carry, _):
                cache, tok, n_past = carry
                pos0 = jnp.full((tok.shape[0],), n_past, jnp.int32)
                logits, cache = decode_step(params, cfg, tok, pos0, cache,
                                            n_past, xkv)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
                return (cache, nxt, n_past + 1), nxt[:, 0]

            (cache, tok, n_past), toks = jax.lax.scan(
                body, (cache, first_token, n_past), steps_tokens
            )
            return cache, toks

        self._decode_loop = jax.jit(decode_loop, donate_argnums=(1,))

    @classmethod
    def from_gguf(cls, path, dtype=jnp.float32, **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        return cls(load_params(g, dtype), config_from_gguf(g), **kw)

    def transcribe_tokens(self, mel: np.ndarray, prompt_tokens, n_tokens: int,
                          eot_id: int | None = None):
        """mel (n_mels, frames) or (b, n_mels, frames); prompt_tokens = the
        forced decoder prefix (<|sot|>[lang][task][notimestamps] ids).
        Greedy-decodes n_tokens continuations; truncates at eot_id."""
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        b = mel.shape[0]
        enc = self._encode(self.params, jnp.asarray(mel))
        xkv = self._xkv(self.params, enc)
        cache = init_cache(self.cfg, b, self.max_seq, jnp.float32)

        prompt = np.asarray(prompt_tokens, np.int32).reshape(1, -1)
        prompt = np.broadcast_to(prompt, (b, prompt.shape[1]))
        # teacher-force the prompt in one multi-token step
        logits, cache = self._step(self.params, jnp.asarray(prompt),
                                   jnp.zeros((b,), jnp.int32), cache,
                                   jnp.int32(0), xkv)
        first = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        cache, toks = self._decode_loop(
            self.params, cache, first, jnp.int32(prompt.shape[1]), xkv,
            jnp.zeros((n_tokens - 1,), jnp.int32))
        out = np.concatenate([np.asarray(first), np.asarray(toks).T], axis=1)
        res = []
        for row in out:
            row = [int(x) for x in row]
            if eot_id is not None and eot_id in row:
                row = row[: row.index(eot_id)]
            res.append(row)
        return res if len(res) > 1 else res[0]
