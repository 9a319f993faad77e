"""FalconMamba (TII) parity vs HF transformers: mamba-v1 mixer plus
weightless RMS normalization of the dt/B/C selection streams."""

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
from ggml_tpu.models.mamba import Mamba, forward, init_state


@pytest.fixture(scope="module")
def model_pair(tmp_path_factory):
    cfg = transformers.FalconMambaConfig(
        vocab_size=128, hidden_size=32, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank=4, mixer_rms_eps=1e-6,
        use_mambapy=False,
    )
    torch.manual_seed(15)
    hf = transformers.FalconMambaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("falconmamba") / "fm.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_falcon_mamba_logits_match_hf(model_pair):
    hf, path = model_pair
    m = Mamba.from_gguf(str(path))
    assert m.cfg.mixer_rms_eps == pytest.approx(1e-6)

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 58, 9]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    got, _ = forward(m.params, m.cfg, jnp.asarray(toks), init_state(m.cfg, 1))
    got = np.asarray(got[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse
    # the mixer rms is load-bearing: disabling it diverges
    cfg_off = type(m.cfg)(**{**m.cfg.__dict__, "mixer_rms_eps": 0.0})
    off, _ = forward(m.params, cfg_off, jnp.asarray(toks), init_state(m.cfg, 1))
    assert not np.allclose(np.asarray(off[0]), got)


def test_falcon_mamba_greedy_generation_matches_hf(model_pair):
    hf, path = model_pair
    m = Mamba.from_gguf(str(path))
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]
