"""RWKV-4 (attention-free WKV recurrence + channel mixing) parity vs HF
transformers through the GGUF round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_rwkv import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.rwkv import RWKV, forward, init_state


@pytest.fixture(scope="module")
def model_pair(tmp_path_factory):
    cfg = transformers.RwkvConfig(
        vocab_size=128, hidden_size=32, attention_hidden_size=32,
        intermediate_size=64, num_hidden_layers=3, context_length=64,
        layer_norm_epsilon=1e-5, rescale_every=0,  # rescale is an fp16 trick
        tie_word_embeddings=False,
    )
    torch.manual_seed(42)
    hf = transformers.RwkvForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("rwkv") / "rwkv_tiny.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return hf, path


def test_rwkv_logits_match_hf(model_pair):
    hf, path = model_pair
    m = RWKV.from_gguf(str(path))
    assert m.cfg.n_attn == 32 and m.cfg.n_ff == 64

    toks = np.asarray([[3, 14, 15, 92, 6, 53, 58, 9, 101, 27]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(toks.astype(np.int64))).logits.numpy()[0]
    got, _ = forward(m.params, m.cfg, jnp.asarray(toks), init_state(m.cfg, 1))
    got = np.asarray(got[0], np.float32)
    nmse = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nmse < 1e-7, nmse


def test_rwkv_recurrent_state_equals_full_forward(model_pair):
    """Chunked prefill + 1-token steps carrying (shifts, num, den, max)
    reproduce the one-shot forward — the O(1)-state serving contract."""
    _, path = model_pair
    m = RWKV.from_gguf(str(path))
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


def test_rwkv_greedy_generation_matches_hf(model_pair):
    hf, path = model_pair
    m = RWKV.from_gguf(str(path))
    toks = np.asarray([[3, 14, 15, 92, 6]], np.int32)
    out = m.generate(toks, 8)
    with torch.no_grad():
        # eos_token_id=None: the random-init model emits token 0 (= RWKV's
        # default eos id) which would otherwise stop HF generation early
        hf_out = hf.generate(torch.from_numpy(toks.astype(np.int64)),
                             max_new_tokens=8, eos_token_id=None,
                             do_sample=False, num_beams=1)
    assert [int(x) for x in out] == [int(x) for x in hf_out[0, toks.shape[1]:]]
