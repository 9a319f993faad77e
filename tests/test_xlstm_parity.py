"""xLSTM (mLSTM matrix-memory recurrence) parity vs HF transformers
through the GGUF round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_xlstm import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.xlstm import XLSTM, forward, init_state


@pytest.fixture(scope="module")
def model_pair(tmp_path_factory):
    cfg = transformers.xLSTMConfig(
        vocab_size=128, hidden_size=32, num_blocks=3, num_heads=2,
        qk_dim_factor=0.5, v_dim_factor=1.0, ffn_proj_factor=2.0,
        ffn_round_up_to_multiple_of=8, gate_soft_cap=15.0,
        output_logit_soft_cap=30.0, norm_eps=1e-6, use_bias=False,
        weight_mode="single", chunk_size=64, mode="inference",
        tie_word_embeddings=False,
    )
    torch.manual_seed(77)
    hf = transformers.xLSTMForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("xlstm") / "xlstm_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_xlstm_logits_match_hf(model_pair):
    hf, path = model_pair
    m = XLSTM.from_gguf(str(path))
    assert m.cfg.dqk == 8 and m.cfg.dv == 16 and m.cfg.gate_softcap == 15.0

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 58, 9, 101, 27]], np.int32)
    with torch.no_grad():
        # use_cache=False: HF's xLSTMCache allocates head dims from
        # hidden_size ignoring qk/v_dim_factor (crashes its own step path)
        want = hf(torch.from_numpy(toks.astype(np.int64)),
                  use_cache=False).logits.numpy()[0]
    got, _ = forward(m.params, m.cfg, jnp.asarray(toks), init_state(m.cfg, 1))
    got = np.asarray(got[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-6, nmse


def test_xlstm_recurrent_state_equals_full_forward(model_pair):
    """Chunked prefill + 1-token decode carrying (C, N, M) reproduces the
    one-shot forward — the O(1)-state serving contract."""
    _, path = model_pair
    m = XLSTM.from_gguf(str(path))
    toks = np.asarray([[7, 1, 20, 9, 33, 4, 18, 90]], np.int32)

    full, _ = forward(m.params, m.cfg, jnp.asarray(toks), init_state(m.cfg, 1))
    state = init_state(m.cfg, 1)
    outs = []
    for chunk in (toks[:, :3], toks[:, 3:5]) + tuple(
            toks[:, j:j + 1] for j in range(5, 8)):
        lg, state = forward(m.params, m.cfg, jnp.asarray(chunk), state)
        outs.append(np.asarray(lg[0]))
    inc = np.concatenate(outs, axis=0)
    want = np.asarray(full[0])
    nmse = float(((inc - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-9, nmse


def test_xlstm_greedy_generation_matches_hf(model_pair):
    hf, path = model_pair
    m = XLSTM.from_gguf(str(path))
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    cur, want = toks.copy(), []
    for _ in range(8):
        with torch.no_grad():
            lg = hf(torch.from_numpy(cur.astype(np.int64)),
                    use_cache=False).logits
        nxt = int(lg[0, -1].argmax())
        want.append(nxt)
        cur = np.concatenate([cur, [[nxt]]], axis=1)
    assert [int(x) for x in out] == want
