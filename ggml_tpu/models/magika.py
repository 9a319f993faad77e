"""Magika file-type detection model (Google).

Reference: examples/magika/main.cpp:196-246 — one-hot bytes (beg/mid/end 512
each = 1536 positions x 257 classes) -> dense(257->128)+gelu -> regroup 4
positions into 512-wide vectors -> layernorm -> dense(512->256)+gelu ->
dense(256->256)+gelu -> global max pool over the 384 positions -> layernorm
-> label head + softmax. Input prep mirrors :300-320 (pad byte = 256).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BEG = MID = END = 512
N_POS = BEG + MID + END  # 1536
N_SYM = 257  # 256 byte values + pad
N_LABEL = 113  # magika model_v1 label count


def init_random_params(seed: int = 0, n_label: int = N_LABEL):
    rng = np.random.default_rng(seed)

    def t(*shape):
        fan = shape[0]
        return jnp.asarray((rng.standard_normal(shape) / np.sqrt(fan)).astype(np.float32))

    return {
        "dense/kernel": t(N_SYM, 128),
        "dense/bias": jnp.zeros((128,), jnp.float32),
        "layer_norm/gamma": jnp.ones((384,), jnp.float32),
        "layer_norm/beta": jnp.zeros((384,), jnp.float32),
        "dense_1/kernel": t(512, 256),
        "dense_1/bias": jnp.zeros((256,), jnp.float32),
        "dense_2/kernel": t(256, 256),
        "dense_2/bias": jnp.zeros((256,), jnp.float32),
        "layer_norm_1/gamma": jnp.ones((256,), jnp.float32),
        "layer_norm_1/beta": jnp.zeros((256,), jnp.float32),
        "target_label/kernel": t(256, n_label),
        "target_label/bias": jnp.zeros((n_label,), jnp.float32),
    }


def load_gguf(path):
    """Load a magika GGUF with the reference tensor naming
    ('dense/kernel:0' etc.; reference loader examples/magika/main.cpp:92-137,
    converter examples/magika/convert.py writes Keras h5 variables).  Kernels
    are stored ne-(out, in) = numpy (in, out), matching our x @ W layout."""
    from ..gguf import GGUFFile

    g = GGUFFile(path)

    def vec(name, n):
        return jnp.asarray(g.to_float32(name + ":0").reshape(n))

    def ker(name, cin, cout):
        # the reference converter stores Keras kernels TRANSPOSED (out, in)
        # C-order (convert.py: add_tensor(weight.name, weight_data.T))
        return jnp.asarray(g.to_float32(name + ":0").reshape(cout, cin).T.copy())

    n_label = g.to_float32("target_label/bias:0").size
    return {
        "dense/kernel": ker("dense/kernel", N_SYM, 128),
        "dense/bias": vec("dense/bias", 128),
        "layer_norm/gamma": vec("layer_normalization/gamma", 384),
        "layer_norm/beta": vec("layer_normalization/beta", 384),
        "dense_1/kernel": ker("dense_1/kernel", 512, 256),
        "dense_1/bias": vec("dense_1/bias", 256),
        "dense_2/kernel": ker("dense_2/kernel", 256, 256),
        "dense_2/bias": vec("dense_2/bias", 256),
        "layer_norm_1/gamma": vec("layer_normalization_1/gamma", 256),
        "layer_norm_1/beta": vec("layer_normalization_1/beta", 256),
        "target_label/kernel": ker("target_label/kernel", 256, n_label),
        "target_label/bias": vec("target_label/bias", n_label),
    }


def _ln(x, g, b, eps=1e-12):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * g + b


def forward(params, one_hot):
    """one_hot (n_files, 1536, 257) -> label probabilities (n_files, n_label)."""
    nf = one_hot.shape[0]
    x = jax.nn.gelu(one_hot @ params["dense/kernel"] + params["dense/bias"], approximate=True)
    # regroup: 4 consecutive 128-vectors -> one 512 vector, transpose to put
    # the 384-position axis last for the norm (reference :212-218)
    x = x.reshape(nf, 384, 512).transpose(0, 2, 1)  # (nf, 512, 384)
    x = _ln(x, params["layer_norm/gamma"], params["layer_norm/beta"])
    x = x.transpose(0, 2, 1)  # (nf, 384, 512)
    x = jax.nn.gelu(x @ params["dense_1/kernel"] + params["dense_1/bias"], approximate=True)
    x = jax.nn.gelu(x @ params["dense_2/kernel"] + params["dense_2/bias"], approximate=True)
    x = jnp.max(x, axis=1)  # global max pool over positions -> (nf, 256)
    x = _ln(x, params["layer_norm_1/gamma"], params["layer_norm_1/beta"])
    logits = x @ params["target_label/kernel"] + params["target_label/bias"]
    return jax.nn.softmax(logits, axis=-1)


def file_features(data: bytes) -> np.ndarray:
    """One file -> (1536, 257) one-hot (reference input prep :300-320):
    first 512 bytes, middle 512, last 512; pad symbol 256 when short."""
    buf = np.frombuffer(data, np.uint8)
    n = len(buf)

    def take(start, cnt):
        seg = buf[max(0, start) : max(0, start) + cnt]
        out = np.full(cnt, 256, np.int32)
        out[: len(seg)] = seg
        return out

    beg = take(0, BEG)
    mid_start = max(0, (n - MID) // 2)
    mid = take(mid_start, MID)
    end = np.full(END, 256, np.int32)
    tail = buf[max(0, n - END) :]
    if len(tail):
        end[-len(tail) :] = tail
    ids = np.concatenate([beg, mid, end])
    return np.eye(N_SYM, dtype=np.float32)[ids]
