"""Mamba-2 family parity vs HF transformers through the GGUF round trip:
per-head scalar-decay SSD scan, group-broadcast B/C, gated RMSNorm, and
the O(1) recurrent-state decode (incremental == full forward)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_mamba2 import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.mamba2 import (Mamba2, config_from_gguf, forward,
                                    init_state)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = transformers.Mamba2Config(
        vocab_size=256, hidden_size=32, num_hidden_layers=2, expand=2,
        conv_kernel=4, state_size=8, num_heads=8, head_dim=8, n_groups=2,
        chunk_size=8, layer_norm_epsilon=1e-5, tie_word_embeddings=False,
        use_conv_bias=True, use_bias=False, rescale_prenorm_residual=False,
    )
    torch.manual_seed(61)
    hf = transformers.Mamba2ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("mamba2") / "mamba2_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_mamba2_logits_match_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    assert cfg.n_head == 8 and cfg.n_group == 2 and cfg.head_dim == 8
    params = load_params(g)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 8, 1, 77, 30, 200, 4]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    state = init_state(cfg, 1)
    full, _ = forward(params, cfg, jnp.asarray(toks), state)
    got = np.asarray(full[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_mamba2_incremental_equals_full(tiny):
    """Chunked recurrent decode == one full forward (the SSD state carries
    everything; there are no positions)."""
    _, path = tiny
    g = GGUFFile(path)
    cfg = config_from_gguf(g)
    params = load_params(g)
    toks = np.asarray([[5, 9, 33, 71, 2, 40, 18, 250, 7, 64]], np.int32)

    full, _ = forward(params, cfg, jnp.asarray(toks), init_state(cfg, 1))

    state = init_state(cfg, 1)
    outs = []
    for chunk in (toks[:, :4],) + tuple(toks[:, j:j + 1] for j in range(4, 10)):
        lg, state = forward(params, cfg, jnp.asarray(chunk), state)
        outs.append(np.asarray(lg[0]))
    inc = np.concatenate(outs, axis=0)
    want = np.asarray(full[0])
    nmse = float(((inc - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-9, nmse


def test_mamba2_serving_engine(tiny):
    """serve.Engine drives Mamba-2 on per-slot recurrent state (the same
    recurrent path as v1: exact-length prefill, state snapshot-on-preempt)."""
    _, path = tiny
    from ggml_tpu.serve import Engine

    g = GGUFFile(path)
    m = Mamba2(load_params(g), config_from_gguf(g), batch=1)
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    solo = {tuple(p): m.generate(np.asarray([p], np.int32), 6) for p in prompts}
    eng = Engine(m, max_batch=2, max_seq=64, cache_dtype=jnp.float32)
    rids = [eng.submit(p, 6) for p in prompts]
    res = eng.run()
    for rid, p in zip(rids, prompts):
        assert res[rid] == solo[tuple(p)], (p, res[rid], solo[tuple(p)])


def test_mamba2_greedy_generation_matches_hf(tiny):
    hf, path = tiny
    g = GGUFFile(path)
    m = Mamba2(load_params(g), config_from_gguf(g), batch=1)
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]
