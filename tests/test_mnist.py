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


def test_mnist_fc_matches_torch_adamw_quality():
    """Differential optimizer-quality gate (the absolute >=92% gate alone
    would pass a mediocre optimizer): train the SAME fc architecture with
    torch AdamW on identical data/hyperparams and require our training
    stack to reach torch's accuracy within 2 points.  (The reference's own
    quality claim is 97.94% on real MNIST, examples/mnist/README.md:24 —
    unreachable here without egress, so torch-on-the-same-data is the
    calibrated bar.)"""
    import torch
    import jax.numpy as jnp

    n, epochs, bs, lr = 2048, 4, 256, 1e-3
    images, onehot, labels = mnist.synthetic_mnist(n, seed=1)
    flat = images.reshape(n, -1)
    n_tr = int(n * 0.875)

    # ours: real Optimizer stack
    opt = Optimizer(mnist.fc_forward, mnist.init_fc(0), loss_type="cross_entropy",
                    adamw=AdamWConfig(alpha=lr))
    for _ in range(epochs):
        for i in range(0, n_tr - bs + 1, bs):
            opt.step(jnp.asarray(flat[i:i + bs]), jnp.asarray(onehot[i:i + bs]))
    pred = np.asarray(mnist.fc_forward(opt.state["params"], jnp.asarray(flat[n_tr:]))).argmax(-1)
    ours_acc = float((pred == labels[n_tr:]).mean())

    # torch: same architecture/data/hyperparams, its own init
    torch.manual_seed(0)
    tm = torch.nn.Sequential(
        torch.nn.Linear(mnist.NINPUT, mnist.NHIDDEN), torch.nn.ReLU(),
        torch.nn.Linear(mnist.NHIDDEN, mnist.NCLASSES),
    )
    topt = torch.optim.AdamW(tm.parameters(), lr=lr, weight_decay=0.0)
    lossf = torch.nn.CrossEntropyLoss()
    X = torch.from_numpy(flat)
    Y = torch.from_numpy(labels[:n_tr].astype(np.int64))
    for _ in range(epochs):
        for i in range(0, n_tr - bs + 1, bs):
            topt.zero_grad()
            loss = lossf(tm(X[i:i + bs]), Y[i:i + bs])
            loss.backward()
            topt.step()
    with torch.no_grad():
        tpred = tm(X[n_tr:]).argmax(-1).numpy()
    torch_acc = float((tpred == labels[n_tr:]).mean())

    assert ours_acc >= torch_acc - 0.02, (ours_acc, torch_acc)
