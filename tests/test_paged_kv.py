"""Paged KV cache: the paged decode step must produce the SAME logits as the
dense-cache decode for identical token streams, while pages allocate and
recycle on demand."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from tools.convert_hf_llama import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf, forward
from ggml_tpu.paged_kv import PagedConfig, PagedKVManager, make_paged_decode_step

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        rms_norm_eps=1e-5, attention_dropout=0.0,
    )
    torch.manual_seed(11)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("paged") / "m.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    g = GGUFFile(path)
    return Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)


def _dense_logits(m, seq):
    """Per-position logits decoding seq token by token with the dense cache."""
    cache = m.new_cache(dtype=jnp.float32)
    outs = []
    for p, tok in enumerate(seq):
        logits, cache = jax.jit(forward, static_argnums=1)(
            m.params, m.cfg, jnp.asarray([[tok]], jnp.int32),
            jnp.asarray([p], jnp.int32), cache, jnp.int32(p),
        )
        outs.append(np.asarray(logits[0, 0]))
    return outs


def test_paged_matches_dense(model):
    m = model
    pcfg = PagedConfig(n_pages=12, page_size=4, max_pages_per_seq=6)
    mgr = PagedKVManager(m.cfg.n_layer, m.cfg.n_head_kv, m.cfg.head_dim,
                         max_batch=2, pcfg=pcfg, dtype=jnp.float32)
    step = make_paged_decode_step(m, pcfg)

    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 128, 11), rng.integers(0, 128, 7)]
    dense = [_dense_logits(m, s) for s in seqs]

    pools = mgr.pools
    # interleave the two slots; slot 1 starts 3 steps late
    paged_out = [[], []]
    for t in range(11):
        slots = [0] + ([1] if 0 <= t - 3 < 7 else [])
        for b in slots:
            assert mgr.ensure_capacity(b, int(mgr.lengths[b]) + 1)
        B = 2
        tokens = np.zeros((B, 1), np.int32)
        active = np.zeros((B,), bool)
        for b in slots:
            tokens[b, 0] = seqs[b][t - (3 if b == 1 else 0)]
            active[b] = True
        wpage, woff = mgr.step_coords(active)
        logits, pools = step(
            m.params, pools, jnp.asarray(tokens), jnp.asarray(mgr.lengths),
            jnp.asarray(mgr.tables), jnp.asarray(wpage), jnp.asarray(woff),
            jnp.asarray(active),
        )
        logits = np.asarray(logits)
        for b in slots:
            paged_out[b].append(logits[b])
            mgr.lengths[b] += 1

    for b in range(2):
        for p, (got, want) in enumerate(zip(paged_out[b], dense[b])):
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                       err_msg=f"slot {b} pos {p}")


def test_page_recycling(model):
    m = model
    pcfg = PagedConfig(n_pages=4, page_size=4, max_pages_per_seq=3)
    mgr = PagedKVManager(m.cfg.n_layer, m.cfg.n_head_kv, m.cfg.head_dim,
                         max_batch=2, pcfg=pcfg, dtype=jnp.float32)
    assert mgr.free_pages() == 4
    assert mgr.ensure_capacity(0, 9)  # 3 pages
    assert mgr.free_pages() == 1
    assert not mgr.ensure_capacity(1, 8)  # needs 2, only 1 free -> refuse
    assert mgr.free_pages() == 1  # refusal allocates nothing
    mgr.release(0)
    assert mgr.free_pages() == 4
    assert mgr.ensure_capacity(1, 8)
    with pytest.raises(ValueError):
        mgr.ensure_capacity(1, 100)  # beyond the logical window
