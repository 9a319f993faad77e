"""MNIST fc + cnn models: the end-to-end training proof.

Reference: examples/mnist/mnist-common.cpp — fc variant (784 -> relu(500) ->
10, :252-254,318) and cnn variant (2x [conv2d 3x3 pad 1 + relu + maxpool 2x2]
with NCB=8 base channels, then dense, :334-357; hyperparams
examples/mnist/mnist-common.h:28-35). Both train with AdamW cross-entropy via
the opt subsystem (the reference calls ggml_opt_fit,
examples/mnist/mnist-train.cpp:34-36).

Layout convention: images (batch, 28, 28) fp32 in [0, 1]; logits (batch, 10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HW = 28
NINPUT = HW * HW
NCLASSES = 10
NHIDDEN = 500
NCB = 8  # conv channel base


def init_fc(seed: int = 0):
    rng = np.random.default_rng(seed)
    # reference init: uniform(-irange, irange), irange = 1/sqrt(fan_in)
    def u(shape, fan_in):
        r = 1.0 / np.sqrt(fan_in)
        return jnp.asarray(rng.uniform(-r, r, shape).astype(np.float32))

    return {
        "fc1_w": u((NINPUT, NHIDDEN), NINPUT),
        "fc1_b": u((NHIDDEN,), NINPUT),
        "fc2_w": u((NHIDDEN, NCLASSES), NHIDDEN),
        "fc2_b": u((NCLASSES,), NHIDDEN),
    }


def fc_forward(params, images):
    x = images.reshape(images.shape[0], NINPUT)
    h = jax.nn.relu(x @ params["fc1_w"] + params["fc1_b"])
    return h @ params["fc2_w"] + params["fc2_b"]


def init_cnn(seed: int = 0):
    rng = np.random.default_rng(seed)

    def u(shape, fan_in):
        r = 1.0 / np.sqrt(fan_in)
        return jnp.asarray(rng.uniform(-r, r, shape).astype(np.float32))

    return {
        "conv1_k": u((3, 3, 1, NCB), 3 * 3),  # HWIO
        "conv1_b": u((NCB,), 3 * 3),
        "conv2_k": u((3, 3, NCB, NCB * 2), 3 * 3 * NCB),
        "conv2_b": u((NCB * 2,), 3 * 3 * NCB),
        "dense_w": u(((HW // 4) * (HW // 4) * NCB * 2, NCLASSES), (HW // 4) ** 2 * NCB * 2),
        "dense_b": u((NCLASSES,), (HW // 4) ** 2 * NCB * 2),
    }


def cnn_forward(params, images):
    x = images.reshape(images.shape[0], HW, HW, 1)  # NHWC
    x = jax.lax.conv_general_dilated(
        x, params["conv1_k"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    x = jax.nn.relu(x + params["conv1_b"])
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    x = jax.lax.conv_general_dilated(
        x, params["conv2_k"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    x = jax.nn.relu(x + params["conv2_b"])
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    x = x.reshape(x.shape[0], -1)
    return x @ params["dense_w"] + params["dense_b"]


def synthetic_mnist(n: int, seed: int = 0):
    """Structured synthetic stand-in for the MNIST files (no network egress in
    this environment): each class is a fixed smooth prototype plus noise,
    linearly non-trivial but learnable to >95%."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:HW, 0:HW].astype(np.float32) / HW
    protos = []
    for c in range(NCLASSES):
        f1, f2 = 1 + c % 4, 1 + c // 4
        p = 0.5 + 0.5 * np.sin(2 * np.pi * f1 * xx + c) * np.cos(2 * np.pi * f2 * yy - c)
        protos.append(p.astype(np.float32))
    protos = np.stack(protos)
    labels = rng.integers(0, NCLASSES, n)
    images = protos[labels] + rng.normal(0, 0.35, (n, HW, HW)).astype(np.float32)
    images = np.clip(images, 0.0, 1.0)
    onehot = np.eye(NCLASSES, dtype=np.float32)[labels]
    return images.astype(np.float32), onehot, labels
