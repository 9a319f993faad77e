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


def save_gguf(params, path, arch=None):
    """Write reference-format mnist GGUF (tensor naming and layouts of
    examples/mnist/mnist-common.cpp:147-210: fc1.weight ne (784, 500) i.e.
    numpy (out, in); conv kernels OIHW; the cnn dense input dim uses ggml's
    channel-major flatten order)."""
    from ..gguf import GGUFWriter

    w = GGUFWriter()
    is_fc = "fc1_w" in params
    w.add_string("general.architecture", arch or ("mnist-fc" if is_fc else "mnist-cnn"))
    if is_fc:
        w.add_tensor("fc1.weight", np.asarray(params["fc1_w"]).T.copy())
        w.add_tensor("fc1.bias", np.asarray(params["fc1_b"]))
        w.add_tensor("fc2.weight", np.asarray(params["fc2_w"]).T.copy())
        w.add_tensor("fc2.bias", np.asarray(params["fc2_b"]))
    else:
        w.add_tensor("conv1.kernel", np.asarray(params["conv1_k"]).transpose(3, 2, 0, 1).copy())
        w.add_tensor("conv1.bias", np.asarray(params["conv1_b"]).reshape(NCB, 1, 1))
        w.add_tensor("conv2.kernel", np.asarray(params["conv2_k"]).transpose(3, 2, 0, 1).copy())
        w.add_tensor("conv2.bias", np.asarray(params["conv2_b"]).reshape(NCB * 2, 1, 1))
        dw = np.asarray(params["dense_w"])  # rows in our NHWC flatten order
        w.add_tensor("dense.weight", dw[_cnn_flat_perm()].T.copy())
        w.add_tensor("dense.bias", np.asarray(params["dense_b"]))
    w.write(path)
    return path


def _cnn_flat_perm():
    """Index map from ggml's channel-major pooled-feature flatten (c, y, x)
    to our NHWC flatten (y, x, c): perm[ggml_index] = our_index."""
    s = HW // 4
    c = NCB * 2
    idx = np.arange(s * s * c).reshape(s, s, c)  # our (y, x, c) order
    return idx.transpose(2, 0, 1).reshape(-1)  # walk in (c, y, x) order


def load_gguf(path):
    """Load a reference-format mnist GGUF (fc or cnn) into our param layout."""
    from ..gguf import GGUFFile

    g = GGUFFile(path)
    arch = g.metadata.get("general.architecture", "mnist-fc")
    if arch == "mnist-fc":
        return {
            "fc1_w": jnp.asarray(g.to_float32("fc1.weight").reshape(NHIDDEN, NINPUT).T.copy()),
            "fc1_b": jnp.asarray(g.to_float32("fc1.bias").reshape(NHIDDEN)),
            "fc2_w": jnp.asarray(g.to_float32("fc2.weight").reshape(NCLASSES, NHIDDEN).T.copy()),
            "fc2_b": jnp.asarray(g.to_float32("fc2.bias").reshape(NCLASSES)),
        }
    s = HW // 4
    perm = _cnn_flat_perm()
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    dw = g.to_float32("dense.weight").reshape(NCLASSES, s * s * NCB * 2).T
    return {
        "conv1_k": jnp.asarray(g.to_float32("conv1.kernel").reshape(NCB, 1, 3, 3).transpose(2, 3, 1, 0)),
        "conv1_b": jnp.asarray(g.to_float32("conv1.bias").reshape(NCB)),
        "conv2_k": jnp.asarray(g.to_float32("conv2.kernel").reshape(NCB * 2, NCB, 3, 3).transpose(2, 3, 1, 0)),
        "conv2_b": jnp.asarray(g.to_float32("conv2.bias").reshape(NCB * 2)),
        "dense_w": jnp.asarray(np.ascontiguousarray(dw[inv])),
        "dense_b": jnp.asarray(g.to_float32("dense.bias").reshape(NCLASSES)),
    }


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
