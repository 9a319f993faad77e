"""Qwen2-MoE / Qwen3-MoE parity vs HF transformers through the GGUF round
trip: stacked-experts MoE with (qwen2moe) non-renormalized gates + a
sigmoid-gated shared expert and (qwen3moe) renormalized gates + per-head
q/k RMSNorm — llama.cpp archs 'qwen2moe'/'qwen3moe' served by
models/llama.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_qwen_moe import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf, forward


def _tiny(tmp, arch):
    torch.manual_seed(23)
    if arch == "qwen2moe":
        cfg = transformers.Qwen2MoeConfig(
            vocab_size=256, hidden_size=64, intermediate_size=96,
            moe_intermediate_size=48, shared_expert_intermediate_size=80,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, num_experts=4, num_experts_per_tok=2,
            decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=False,
            attention_dropout=0.0, tie_word_embeddings=False,
        )
        hf = transformers.Qwen2MoeForCausalLM(cfg).eval()
    else:
        cfg = transformers.Qwen3MoeConfig(
            vocab_size=256, hidden_size=64, intermediate_size=96,
            moe_intermediate_size=48, head_dim=16,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, num_experts=4, num_experts_per_tok=2,
            decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=True,
            attention_dropout=0.0, tie_word_embeddings=False,
        )
        hf = transformers.Qwen3MoeForCausalLM(cfg).eval()
    path = tmp / f"{arch}.gguf"
    convert_state_dict(hf.state_dict(), cfg, arch).write(path)
    return hf, path


@pytest.mark.parametrize("arch", ["qwen2moe", "qwen3moe"])
def test_qwen_moe_logits_match_hf(tmp_path, arch):
    hf, path = _tiny(tmp_path, arch)
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_expert == 4 and cfg.n_expert_used == 2
    assert cfg.moe_renorm == (arch == "qwen3moe")
    assert cfg.moe_shared == (arch == "qwen2moe")
    m = Llama(load_params(g), cfg, max_seq=40, batch=1)

    # 20 tokens -> the grouped ragged-GEMM prefill path; decode = dense path
    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30,
                        200, 4, 99, 12, 63, 7, 151, 41, 2, 88]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]

    cache = m.new_cache(jnp.float32)
    full, _ = forward(m.params, m.cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse

    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)), max_new_tokens=8,
                             do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_qwen2moe_paged_equals_dense(tmp_path):
    """Paged decode picks up the shared expert + non-renorm gates too."""
    from ggml_tpu.paged_kv import PagedConfig
    from ggml_tpu.serve import Engine

    hf, path = _tiny(tmp_path, "qwen2moe")
    g = GGUFFile(path)
    m = Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)

    prompts = [[1, 2, 3], [9, 7]]
    dense = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [dense.submit(p, 6) for p in prompts]
    dres = dense.run()
    want = {tuple(p): dres[r] for p, r in zip(prompts, rids)}

    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32,
                 paged=PagedConfig(n_pages=8, page_size=8, max_pages_per_seq=4))
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for p, r in zip(prompts, rids):
        assert res[r] == want[tuple(p)], (p, res[r], want[tuple(p)])


def test_qwen3moe_speculative_equals_greedy(tmp_path):
    """Greedy speculative decoding through the MoE forward (stacked experts
    in both the draft loop and the (B, k+1) verify) is lossless — the
    serving-matrix 'speculative' cell for the qwen-MoE archs."""
    from ggml_tpu.serve import Engine

    hf, path = _tiny(tmp_path, "qwen3moe")
    g = GGUFFile(path)
    m = Llama(load_params(g), config_from_gguf(g), max_seq=48, batch=1)
    d = Llama(load_params(g), config_from_gguf(g), max_seq=48, batch=1)

    prompts = [[1, 2, 3], [7]]
    plain = Engine(m, max_batch=2, max_seq=48, cache_dtype=jnp.float32)
    rids = [plain.submit(p, 7) for p in prompts]
    pres = plain.run()
    want = {tuple(p): pres[r] for p, r in zip(prompts, rids)}

    spec = Engine(m, max_batch=2, max_seq=48, cache_dtype=jnp.float32,
                  draft=d, draft_k=3)
    rids = [spec.submit(p, 7) for p in prompts]
    sres = spec.run()
    for p, r in zip(prompts, rids):
        assert sres[r] == want[tuple(p)], (p, sres[r], want[tuple(p)])
