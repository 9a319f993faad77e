"""Dataset: host-resident data+labels with shard-wise shuffle.

Reference: ggml_opt_dataset_* (include/ggml-opt.h:39-58, src/ggml-opt.cpp:16-90):
data and labels live in host tensors, shuffling permutes whole shards
(ndata_shard granularity) with the opt context's RNG, get_batch copies a batch
into device tensors. Here the device copy is a device_put at step time.
"""

from __future__ import annotations

import numpy as np


class Dataset:
    def __init__(self, data: np.ndarray, labels: np.ndarray | None, ndata_shard: int = 1):
        assert labels is None or len(data) == len(labels)
        assert len(data) % ndata_shard == 0
        self.data = np.asarray(data)
        self.labels = None if labels is None else np.asarray(labels)
        self.ndata_shard = ndata_shard
        # permutation over shards (reference keeps a shard permutation vector)
        self.perm = np.arange(len(data) // ndata_shard)

    @property
    def ndata(self) -> int:
        return len(self.data)

    def shuffle(self, rng: np.random.Generator, idata: int | None = None) -> None:
        """Fisher-Yates over shards; idata limits shuffling to the first idata
        datapoints (the train split), as in ggml_opt_dataset_shuffle
        (src/ggml-opt.cpp:72-90)."""
        if idata is None:
            n = len(self.perm)
        else:
            assert idata % self.ndata_shard == 0
            n = idata // self.ndata_shard
        sub = self.perm[:n]
        rng.shuffle(sub)
        self.perm[:n] = sub

    def get_batch(self, ibatch: int, batch_size: int):
        """Gather batch ibatch under the current permutation."""
        assert batch_size % self.ndata_shard == 0
        spb = batch_size // self.ndata_shard
        shards = self.perm[ibatch * spb : (ibatch + 1) * spb]
        idx = (shards[:, None] * self.ndata_shard + np.arange(self.ndata_shard)).reshape(-1)
        x = self.data[idx]
        y = None if self.labels is None else self.labels[idx]
        return x, y
