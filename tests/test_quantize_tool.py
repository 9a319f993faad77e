"""GGUF requantize tool round trip (examples/gpt-2/quantize.cpp analog)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from tools.convert_hf_gpt2 import convert_state_dict
from tools.quantize_gguf import quantize_gguf

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import GPT2, config_from_gguf, load_params


def test_quantize_tool_roundtrip(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=512, n_positions=128, n_embd=256, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(2)
    model = transformers.GPT2LMHeadModel(cfg).eval()
    f32_path = tmp_path / "f32.gguf"
    q_path = tmp_path / "q4k.gguf"
    convert_state_dict(model.state_dict(), cfg).write(f32_path)
    quantize_gguf(f32_path, q_path, GGMLType.Q4_K, verbose=False)

    g = GGUFFile(q_path)
    assert g.metadata["gpt2.embedding_length"] == 256
    types = {t.ggml_type for t in g.tensors.values()}
    assert GGMLType.Q4_K in types and GGMLType.F32 in types
    assert f32_path.stat().st_size > 1.5 * q_path.stat().st_size

    # quantized file loads and predicts like the f32 one
    import jax.numpy as jnp

    toks = np.random.default_rng(0).integers(0, 512, (1, 8)).astype(np.int32)
    outs = []
    for path in (f32_path, q_path):
        gg = GGUFFile(path)
        m = GPT2(load_params(gg), config_from_gguf(gg), max_seq=16, batch=1)
        l, _ = m._step(m.params, jnp.asarray(toks), jnp.zeros((1,), jnp.int32), m.new_cache(), jnp.int32(0))
        outs.append(np.asarray(l))
    corr = np.corrcoef(outs[0].ravel(), outs[1].ravel())[0, 1]
    assert corr > 0.97, corr  # random (untrained) weights quantize worse than trained
