"""Sharded GGUF (gguf-split convention): split/merge round trip and
transparent model loading through the first shard."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_gpt2 import convert_state_dict
from tools.gguf_split import merge, split

from ggml_tpu.gguf import GGUFFile


@pytest.fixture(scope="module")
def src(tmp_path_factory):
    cfg = transformers.GPT2Config(vocab_size=128, n_positions=64, n_embd=32,
                                  n_layer=2, n_head=4)
    torch.manual_seed(21)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    tmp = tmp_path_factory.mktemp("split")
    path = tmp / "model.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, str(path), tmp


def test_split_roundtrips_tensors(src):
    _, path, tmp = src
    shards = split(path, str(tmp / "model"), max_tensors=7)
    assert len(shards) > 2
    orig = GGUFFile(path)
    g = GGUFFile(shards[0])  # transparent shard merge
    assert set(g.tensors) == set(orig.tensors)
    assert int(g.metadata["split.count"]) == len(shards)
    assert g.metadata["general.architecture"] == "gpt2"
    for name in orig.tensors:
        a = orig.tensor_bytes(name)
        b = g.tensor_bytes(name)
        assert a.shape == b.shape and (a == b).all(), name
        assert orig.tensors[name].shape_ne == g.tensors[name].shape_ne

    merged = merge(shards[0], str(tmp / "merged.gguf"))
    gm = GGUFFile(merged)
    assert "split.count" not in gm.metadata
    for name in orig.tensors:
        assert (orig.tensor_bytes(name) == gm.tensor_bytes(name)).all(), name
    # no explicit close: zero-copy views pin the mmaps until GC


def test_model_loads_from_split(src):
    hf, path, tmp = src
    shards = split(path, str(tmp / "m2"), n_split=3)
    from ggml_tpu.models.gpt2 import GPT2

    m = GPT2.from_gguf(shards[0], max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6, 53]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    logits, _, _ = m.prefill(m.new_cache(dtype=jnp.float32), toks)
    # prefill returns last-position logits
    nmse = float(((np.asarray(logits[0]) - want[-1]) ** 2).sum()
                 / (want[-1] ** 2).sum())
    assert nmse < 1e-7, nmse
