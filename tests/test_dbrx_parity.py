"""DBRX family parity vs HF transformers through the GGUF round trip:
fused Wqkv split + clamp, bias-free LayerNorms, 16-expert-style top-k MoE
through the shared moe_ffn_block."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_dbrx import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.dbrx import DBRX, config_from_gguf, forward, init_cache
from ggml_tpu.models.gpt2 import load_params


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=64, vocab_size=256,
        attn_config={"kv_n_heads": 2, "clip_qkv": 0.3, "rope_theta": 10000.0,
                     "attn_pdrop": 0.0},
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4, "moe_top_k": 2,
                    "moe_normalize_expert_weights": 1.0, "moe_jitter_eps": None},
        resid_pdrop=0.0, emb_pdrop=0.0,
    )
    torch.manual_seed(59)
    hf = transformers.DbrxForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("dbrx") / "dbrx_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def _load(path, max_seq=32):
    g = GGUFFile(path)
    return DBRX(load_params(g), config_from_gguf(g), max_seq=max_seq, batch=1)


def test_dbrx_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_expert == 4 and cfg.n_expert_used == 2
    assert abs(cfg.clamp_kqv - 0.3) < 1e-6
    params = load_params(g)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_dbrx_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    m = _load(path)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_dbrx_serving_engine(tiny):
    _, path = tiny
    from ggml_tpu.serve import Engine

    m = _load(path)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
