"""q8-quantized KV cache (the llama.cpp -ctk q8_0 analog): int8 codes +
per-row scales behind the same cache interface — accuracy, exactness of
the chunked-vs-full contract, and engine serving."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_llama import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.common import QUANT_KV_DTYPE, init_layer_cache
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf, forward


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, attention_dropout=0.0,
    )
    torch.manual_seed(17)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("qkv") / "m.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    g = GGUFFile(path)
    return Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)


def _cache(m, dtype):
    return init_layer_cache(m.cfg.n_layer, 1, m.cfg.n_head_kv, 32,
                            m.cfg.head_dim, dtype)


def test_q8_kv_close_to_f32(model):
    m = model
    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30]], np.int32)
    ref, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                     jnp.zeros((1,), jnp.int32), _cache(m, jnp.float32),
                     jnp.int32(0))
    got, qc = forward(m.params, m.cfg, jnp.asarray(toks),
                      jnp.zeros((1,), jnp.int32), _cache(m, QUANT_KV_DTYPE),
                      jnp.int32(0))
    ref = np.asarray(ref[0], np.float32)
    got = np.asarray(got[0], np.float32)
    nmse = float(((got - ref) ** 2).sum() / (ref ** 2).sum())
    assert nmse < 5e-3, nmse  # int8-per-row KV noise only
    assert qc[0][0].codes.dtype == jnp.int8


def test_q8_kv_incremental_equals_full(model):
    """The quantized codes for a position are identical whether written by
    one-shot prefill or token-by-token — the cache contract is exact
    WITHIN the q8 representation."""
    m = model
    toks = np.asarray([[5, 9, 33, 71, 2, 40, 18, 120]], np.int32)
    full, _ = forward(m.params, m.cfg, jnp.asarray(toks),
                      jnp.zeros((1,), jnp.int32), _cache(m, QUANT_KV_DTYPE),
                      jnp.int32(0))
    cache = _cache(m, QUANT_KV_DTYPE)
    outs, pos = [], 0
    for chunk in (toks[:, :3],) + tuple(toks[:, j:j + 1] for j in range(3, 8)):
        lg, cache = forward(m.params, m.cfg, jnp.asarray(chunk),
                            jnp.full((1,), pos, jnp.int32), cache,
                            jnp.int32(pos))
        outs.append(np.asarray(lg[0]))
        pos += chunk.shape[1]
    inc = np.concatenate(outs, axis=0)
    want = np.asarray(full[0])
    nmse = float(((inc - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-9, nmse


def test_q8_kv_engine_serving(model):
    from ggml_tpu.serve import Engine

    m = model
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    f32 = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [f32.submit(p, 6) for p in prompts]
    want = f32.run()
    q8 = Engine(m, max_batch=2, max_seq=32, cache_dtype=QUANT_KV_DTYPE)
    sids = [q8.submit(p, 6) for p in prompts]
    got = q8.run()
    # greedy tokens usually survive int8 KV noise on a tiny model; require
    # the first token (pure prefill logits path) to match and all requests
    # to complete
    for r, s in zip(rids, sids):
        assert len(got[s]) == len(want[r])
        assert got[s][0] == want[r][0]


def test_q8_rejected_for_paged(model):
    from ggml_tpu.paged_kv import PagedConfig
    from ggml_tpu.serve import Engine

    with pytest.raises(ValueError):
        Engine(model, max_batch=2, max_seq=32, cache_dtype=QUANT_KV_DTYPE,
               paged=PagedConfig(page_size=8, n_pages=16, max_pages_per_seq=4))
