"""End-to-end MNIST training: the analog of the reference's mnist example
being its training integration test (examples/mnist/mnist-train.cpp;
ci/run.sh mnist stage). Uses the synthetic dataset (no egress) — the gate is
that full fit() training reaches high accuracy from random init."""

import numpy as np

from ggml_tpu.models import mnist
from ggml_tpu.opt import AdamWConfig, Dataset, Optimizer, fit


def _train_eval(model_fn, params, epochs=2, n=2048, alpha=1e-3):
    images, onehot, _ = mnist.synthetic_mnist(n, seed=1)
    ds = Dataset(images, onehot)
    opt = Optimizer(model_fn, params, loss_type="cross_entropy", adamw=AdamWConfig(alpha=alpha))
    res_train, res_eval = fit(opt, ds, batch_size=256, epochs=epochs, val_split=0.125, silent=True)
    acc, unc = res_eval.accuracy()
    return acc


def test_mnist_fc_trains():
    acc = _train_eval(mnist.fc_forward, mnist.init_fc(0), epochs=4)
    assert acc > 0.92, f"fc accuracy {acc}"


def test_mnist_cnn_trains():
    acc = _train_eval(mnist.cnn_forward, mnist.init_cnn(0), epochs=3, alpha=3e-3)
    assert acc > 0.92, f"cnn accuracy {acc}"


def test_gguf_save_load_roundtrip():
    """Reference-format GGUF round trip (fc + cnn): layouts/permutations
    (transposed fc weights, OIHW kernels, channel-major dense flatten —
    examples/mnist/mnist-common.cpp:147-210) invert exactly."""
    import tempfile

    import jax.numpy as jnp
    import numpy as np

    from ggml_tpu.models import mnist

    imgs = jnp.asarray(np.random.default_rng(0).random((4, 28, 28)).astype(np.float32))
    with tempfile.TemporaryDirectory() as d:
        for init, fwd, name in [
            (mnist.init_fc, mnist.fc_forward, "fc"),
            (mnist.init_cnn, mnist.cnn_forward, "cnn"),
        ]:
            p = init(3)
            path = f"{d}/{name}.gguf"
            mnist.save_gguf(p, path)
            q = mnist.load_gguf(path)
            a = np.asarray(fwd(p, imgs))
            b = np.asarray(fwd(q, imgs))
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6, err_msg=name)
