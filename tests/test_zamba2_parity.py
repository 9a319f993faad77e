"""Zamba2 (shared transformer blocks over concat(hidden, embeds) +
per-use LoRA adapters + Mamba-2 mixers everywhere) parity vs HF
transformers through the GGUF round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_zamba2 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.zamba2 import (Zamba2, config_from_gguf, forward,
                                    init_cache)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.Zamba2Config(
        vocab_size=256, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4,
        layers_block_type=["mamba", "hybrid", "mamba", "hybrid"],
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2, mamba_ngroups=2,
        n_mamba_heads=4, num_attention_heads=4, num_key_value_heads=4,
        num_mem_blocks=2, use_shared_attention_adapter=True, adapter_rank=4,
        use_mem_rope=True, rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=64, pad_token_id=0, use_mem_eff_path=False,
        tie_word_embeddings=False, attention_dropout=0.0,
    )
    torch.manual_seed(909)
    hf = transformers.Zamba2ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("zamba2") / "zamba2_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_zamba2_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.hybrid_layers == (1, 3) and cfg.n_mem_blocks == 2
    assert cfg.qkv_adapter and cfg.use_rope and cfg.n_group == 2
    assert cfg.head_dim == 16  # 2*hidden/heads: attention over the concat
    params = load_params(g)
    assert "shared.1.attn_q.weight" in params
    assert "blk.3.attn_q_adapter_a.weight" in params

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    cache = init_cache(cfg, 1, 32, jnp.float32)
    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      cache, jnp.int32(0))
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_zamba2_incremental_equals_full(tiny):
    _, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    params = load_params(g)
    toks = np.asarray([[5, 9, 33, 71, 2, 40, 18, 250, 7, 64]], np.int32)

    full, _ = forward(params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                      init_cache(cfg, 1, 32, jnp.float32), jnp.int32(0))
    cache = init_cache(cfg, 1, 32, jnp.float32)
    outs, pos = [], 0
    for chunk in (toks[:, :4],) + tuple(toks[:, j:j + 1] for j in range(4, 10)):
        lg, cache = forward(params, cfg, jnp.asarray(chunk),
                            jnp.full((1,), pos, jnp.int32), cache, jnp.int32(pos))
        outs.append(np.asarray(lg[0]))
        pos += chunk.shape[1]
    inc = np.concatenate(outs, axis=0)
    want = np.asarray(full[0])
    nmse = float(((inc - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-9, nmse


def test_zamba2_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    m = Zamba2(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]


def test_zamba2_serving_engine(tiny):
    _, path = tiny
    from ggml_tpu.models.common import generate
    from ggml_tpu.serve import Engine

    g = GGUFFile(path)
    m = Zamba2(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): generate(m, np.asarray([p], np.int32), 6,
                               cache_dtype=jnp.float32) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=32, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])
