"""DeepSeek-V3 (llama.cpp 'deepseek2') parity vs HF transformers through the
GGUF round trip.  The strongest claim here: our ABSORBED-MLA forward (which
caches only the compressed latent + rope key) produces the same logits as
HF's expanded per-head attention — proving the compressed-cache formulation
is exact, not an approximation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_deepseek import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.deepseek import (Deepseek, config_from_gguf, forward,
                                      init_cache)
from ggml_tpu.models.gpt2 import load_params


def _tiny(tmp, q_lora: bool, interleave: bool = True):
    cfg = transformers.DeepseekV3Config(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=4, n_routed_experts=8, n_shared_experts=2,
        num_experts_per_tok=3, n_group=4, topk_group=2,
        first_k_dense_replace=1, norm_topk_prob=True, routed_scaling_factor=2.5,
        kv_lora_rank=32, q_lora_rank=(48 if q_lora else None),
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=12,
        max_position_embeddings=128, rope_interleave=interleave,
        attention_dropout=0.0, rope_scaling=None,
    )
    torch.manual_seed(31)
    hf = transformers.DeepseekV3ForCausalLM(cfg).eval()
    # give the selection bias real (nonzero) values so it's load-bearing
    with torch.no_grad():
        for layer in hf.model.layers[cfg.first_k_dense_replace:]:
            layer.mlp.gate.e_score_correction_bias.normal_(0.0, 0.5)
    path = tmp / f"dsv3_{q_lora}_{interleave}.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


@pytest.mark.parametrize("q_lora", [False, True])
def test_deepseek_logits_match_hf(tmp_path, q_lora):
    hf, path = _tiny(tmp_path, q_lora)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.kv_lora_rank == 32 and cfg.qk_rope_dim == 8
    assert cfg.q_lora_rank == (48 if q_lora else 0)
    assert cfg.score_func == "sigmoid" and cfg.routed_scale == 2.5
    assert cfg.n_group == 4 and cfg.topk_group == 2 and cfg.n_dense_lead == 1
    params = load_params(g)

    # 20 tokens: grouped ragged-GEMM MoE prefill; absorbed-MLA attention
    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30,
                        200, 4, 99, 12, 63, 7, 151, 41, 2, 88]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]

    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse


def test_deepseek_greedy_and_incremental(tmp_path):
    """Greedy generation through the compressed cache == HF; decode steps
    against the populated cache == the full forward."""
    hf, path = _tiny(tmp_path, True)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    m = Deepseek(load_params(g), cfg, max_seq=40, batch=1)

    toks = np.asarray([[3, 14, 15, 92, 6, 53]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_deepseek_engine_interleaved_equals_solo(tmp_path):
    """serve.Engine drives the MLA family on its compressed per-slot cache:
    interleaved continuous batching == solo greedy decode."""
    from ggml_tpu.serve import Engine

    hf, path = _tiny(tmp_path, True)
    g = GGUFFile(path)
    m = Deepseek(load_params(g), config_from_gguf(g), max_seq=32, batch=1)

    prompts = [[1, 2, 3], [9, 7], [100, 5, 31, 2]]
    want = {}
    for p in prompts:
        solo = Engine(m, max_batch=1, max_seq=32, cache_dtype=jnp.float32)
        r = solo.submit(p, 6)
        want[tuple(p)] = solo.run()[r]

    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for p, r in zip(prompts, rids):
        assert res[r] == want[tuple(p)], (p, res[r], want[tuple(p)])


def test_deepseek_rope_interleave_flag(tmp_path):
    """rope_interleave=False checkpoints round-trip too (the de-interleave
    permute is gated by the GGUF flag)."""
    hf, path = _tiny(tmp_path, False, interleave=False)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.rope_interleave is False
    params = load_params(g)
    toks = np.asarray([[9, 2, 44, 17]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 8, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse
