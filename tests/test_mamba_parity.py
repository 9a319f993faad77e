"""Mamba parity vs HF transformers (sequential/slow path) through the GGUF
round trip — the SSM ops' integration test (ops.ssm_conv / ops.ssm_scan are
golden-gated against the reference CPU backend; this proves a real model
composes them correctly), plus the O(1)-state decode invariant: chunked
prefill+decode through the recurrent state equals one full forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_mamba import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.mamba import Mamba, config_from_gguf, forward, init_state


@pytest.fixture(scope="module")
def model_pair(tmp_path_factory):
    cfg = transformers.MambaConfig(
        vocab_size=128, hidden_size=32, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank=4,
    )
    torch.manual_seed(5)
    hf = transformers.MambaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("mamba") / "m.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_mamba_logits_match_hf(model_pair):
    hf, path = model_pair
    m = Mamba.from_gguf(str(path))
    assert m.cfg.d_inner == 64 and m.cfg.dt_rank == 4

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 58, 9]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]

    got, _ = forward(m.params, m.cfg, jnp.asarray(toks), init_state(m.cfg, 1))
    got = np.asarray(got[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse


def test_mamba_recurrent_state_equals_full_forward(model_pair):
    """Splitting a sequence across prefill chunks + 1-token decode steps,
    carrying (conv window, ssm state), reproduces the one-shot forward —
    the O(1)-state analog of KV-cache position masking."""
    _, path = model_pair
    m = Mamba.from_gguf(str(path))
    toks = np.asarray([[7, 1, 20, 9, 33, 4, 18]], np.int32)

    full, _ = forward(m.params, m.cfg, jnp.asarray(toks), init_state(m.cfg, 1))
    full = np.asarray(full[0])

    state = init_state(m.cfg, 1)
    outs = []
    lg, state = forward(m.params, m.cfg, jnp.asarray(toks[:, :3]), state)
    outs.append(np.asarray(lg[0]))
    for j in range(3, toks.shape[1]):
        lg, state = forward(m.params, m.cfg, jnp.asarray(toks[:, j:j + 1]), state)
        outs.append(np.asarray(lg[0]))
    chunked = np.concatenate(outs, axis=0)
    np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)


def test_mamba_greedy_generation_matches_hf(model_pair):
    hf, path = model_pair
    m = Mamba.from_gguf(str(path))
    toks = np.asarray([[3, 14, 15]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)), max_new_tokens=8,
                             do_sample=False)
    assert out == [int(x) for x in hf_out[0, toks.shape[1]:]]
