"""Epoch/fit training loops with uncertainty-carrying metrics.

Reference: ggml_opt_epoch (src/ggml-opt.cpp:677-766: train on the first
idata_split datapoints, eval on the rest, per-batch callbacks with a progress
bar) and ggml_opt_fit (src/ggml-opt.cpp:779-854: epochs + val_split + silent
mode). Metrics mirror ggml_opt_result_loss/accuracy
(src/ggml-opt.cpp:531-581): loss mean +- stderr, accuracy +- binomial stderr.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from .dataset import Dataset
from .optimizer import Optimizer


class Result:
    """Accumulates per-batch metrics (analog of ggml_opt_result)."""

    def __init__(self):
        self.losses: list[float] = []
        self.ncorrect = 0
        self.npred = 0

    def update(self, metrics) -> None:
        self.losses.append(float(metrics["loss"]))
        n = int(metrics["n"])
        if n:
            self.ncorrect += int(metrics["ncorrect"])
            self.npred += n

    def loss(self) -> tuple[float, float]:
        """mean +- stderr (reference: ggml_opt_result_loss src/ggml-opt.cpp:531)."""
        if not self.losses:
            return float("nan"), float("nan")
        a = np.asarray(self.losses, np.float64)
        mean = a.mean()
        unc = a.std(ddof=1) / np.sqrt(len(a)) if len(a) > 1 else float("nan")
        return float(mean), float(unc)

    def accuracy(self) -> tuple[float, float]:
        """fraction +- binomial stderr (reference: src/ggml-opt.cpp:566-581)."""
        if self.npred == 0:
            return float("nan"), float("nan")
        p = self.ncorrect / self.npred
        unc = np.sqrt(p * (1.0 - p) / (self.npred - 1)) if self.npred > 1 else float("nan")
        return float(p), float(unc)


def _progress(prefix: str, ibatch: int, nbatches: int, result: Result, t0: float, file):
    loss, loss_unc = result.loss()
    acc, acc_unc = result.accuracy()
    bar_n = 8
    filled = (ibatch + 1) * bar_n // max(1, nbatches)
    bar = "=" * filled + ">" + "-" * (bar_n - filled)
    dt = time.time() - t0
    msg = f"\r{prefix}[{bar}] loss={loss:.5f}+-{loss_unc:.5f}"
    if result.npred:
        msg += f" acc={100*acc:.2f}+-{100*acc_unc:.2f}%"
    msg += f" t={dt:.1f}s "
    print(msg, end="", file=file, flush=True)
    if ibatch + 1 == nbatches:
        print(file=file)


def epoch(
    opt: Optimizer,
    dataset: Dataset,
    batch_size: int,
    idata_split: int | None = None,
    callback_train=None,
    callback_eval=None,
    abort_callback=None,
) -> tuple[Result, Result]:
    """Train on batches [0, idata_split), evaluate on the rest.
    reference: ggml_opt_epoch (include/ggml-opt.h:181-196). abort_callback:
    checked between batches, return True to stop (the ggml_abort_callback
    analog, include/ggml.h:613-615 — cooperative cancellation)."""
    ndata = dataset.ndata
    if idata_split is None:
        idata_split = ndata
    assert idata_split % batch_size == 0
    nbatches = ndata // batch_size
    split_batch = idata_split // batch_size

    res_train, res_eval = Result(), Result()
    t0 = time.time()
    for ib in range(nbatches):
        if abort_callback is not None and abort_callback():
            break
        x, y = dataset.get_batch(ib, batch_size)
        if ib < split_batch:
            m = opt.step(x, y)
            res_train.update(m)
            if callback_train:
                callback_train(ib, split_batch, res_train, t0)
        else:
            m = opt.eval(x, y)
            res_eval.update(m)
            if callback_eval:
                callback_eval(ib - split_batch, nbatches - split_batch, res_eval, t0)
    return res_train, res_eval


def fit(
    opt: Optimizer,
    dataset: Dataset,
    batch_size: int,
    epochs: int,
    val_split: float = 0.0,
    silent: bool = False,
    seed: int = 0,
    file=sys.stderr,
) -> tuple[Result, Result]:
    """reference: ggml_opt_fit (include/ggml-opt.h:198-212, src/ggml-opt.cpp:779)."""
    ndata = dataset.ndata
    nbatches = ndata // batch_size
    ibatch_split = int((1.0 - val_split) * nbatches)
    idata_split = ibatch_split * batch_size
    rng = np.random.default_rng(seed)

    res_train = res_eval = None
    for ep in range(1, epochs + 1):
        if ep == 1:
            dataset.shuffle(rng)  # shuffle everything once, incl. the val tail
        else:
            dataset.shuffle(rng, idata_split)  # keep the val split fixed
        cb_t = cb_e = None
        if not silent:
            print(f"epoch {ep}/{epochs}:", file=file)
            cb_t = lambda i, n, r, t0: _progress("  train: ", i, n, r, t0, file)
            cb_e = lambda i, n, r, t0: _progress("  val:   ", i, n, r, t0, file)
        res_train, res_eval = epoch(opt, dataset, batch_size, idata_split, cb_t, cb_e)
    return res_train, res_eval
