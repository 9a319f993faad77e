"""Perplexity harness sanity: finite, and quantization moves ppl only a little
(the Δppl gate machinery from BASELINE)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from tools.convert_hf_gpt2 import convert_state_dict

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models import gpt2
from ggml_tpu.ppl import perplexity


def test_ppl_finite_and_quant_delta(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=512, n_positions=128, n_embd=256, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(3)
    model = transformers.GPT2LMHeadModel(cfg).eval()
    convert_state_dict(model.state_dict(), cfg).write(tmp_path / "f32.gguf")
    convert_state_dict(model.state_dict(), cfg, GGMLType.Q8_0).write(tmp_path / "q8.gguf")

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 512, 200).astype(np.int32)

    def ppl_of(path):
        g = GGUFFile(path)
        mcfg = gpt2.config_from_gguf(g)
        params = gpt2.load_params(g)
        return perplexity(
            gpt2.forward, params, mcfg, tokens, window=64,
            init_cache_fn=gpt2.init_cache,
        )

    p_f32 = ppl_of(tmp_path / "f32.gguf")
    p_q8 = ppl_of(tmp_path / "q8.gguf")
    assert np.isfinite(p_f32) and p_f32 > 1.0
    # random model on random tokens: ppl ~ vocab size; Q8_0 barely moves it
    assert abs(p_q8 - p_f32) / p_f32 < 0.02, (p_f32, p_q8)


def test_delta_ppl_quant_kernels_vs_dequant(tmp_path):
    """The Δppl gate mechanics (BASELINE: Δppl ≤ 0.01 vs reference kernels on
    WikiText-2; no egress here, so the stream is synthetic): perplexity through
    the fused quantized kernels must match perplexity with the SAME weights
    dequantized to f32 within a small delta."""
    cfg = transformers.GPT2Config(
        vocab_size=512, n_positions=256, n_embd=256, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(9)
    model = transformers.GPT2LMHeadModel(cfg).eval()
    path = tmp_path / "q.gguf"
    convert_state_dict(model.state_dict(), cfg, GGMLType.Q4_K).write(path)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 512, 300).astype(np.int32)

    g = GGUFFile(path)
    mcfg = gpt2.config_from_gguf(g)

    def ppl(keep_quantized):
        params = gpt2.load_params(g, keep_quantized=keep_quantized)
        return perplexity(gpt2.forward, params, mcfg, tokens, window=128,
                          init_cache_fn=gpt2.init_cache)

    p_dequant = ppl(False)   # f32 dequantized weights (the reference value)
    p_kernels = ppl(True)    # packed weights through the Pallas kernels
    # int8-activation GEMV noise; relative ppl delta must stay small
    assert abs(p_kernels - p_dequant) / p_dequant < 0.01, (p_dequant, p_kernels)
