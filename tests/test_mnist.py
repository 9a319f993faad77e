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
