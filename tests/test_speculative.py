"""Speculative decoding: lossless greedy invariant.

The output must be IDENTICAL to plain greedy decoding of the target model,
whatever the draft proposes — with a perfect draft (the target itself) every
round accepts k+1 tokens; with an unrelated draft acceptance drops but the
tokens do not change."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from tools.convert_hf_llama import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf
from ggml_tpu.speculative import speculative_generate

import jax.numpy as jnp


def _tiny(seed, tmp, name):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=128,
        rms_norm_eps=1e-5, attention_dropout=0.0,
    )
    torch.manual_seed(seed)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp / f"{name}.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    g = GGUFFile(path)
    return Llama(load_params(g), config_from_gguf(g), max_seq=96, batch=1)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("spec")
    return _tiny(23, tmp, "target"), _tiny(77, tmp, "draft")


def _plain_greedy(m, prompt, n):
    out = m.generate(np.asarray([prompt], np.int32), n)
    return [int(t) for t in np.asarray(out).reshape(-1)]


def test_self_draft_accepts_everything(models):
    target, _ = models
    prompt = [3, 14, 15, 92]
    n = 17
    ref = _plain_greedy(target, prompt, n)
    toks, rounds = speculative_generate(target, target, prompt, n, k=4)
    assert toks == ref
    # perfect draft: every round advances k+1 = 5 tokens -> ceil(16/5)+1 rounds
    assert rounds <= -(-(n - 1) // 5) + 1


def test_unrelated_draft_is_lossless(models):
    target, draft = models
    prompt = [7, 1, 20]
    n = 13
    ref = _plain_greedy(target, prompt, n)
    toks, rounds = speculative_generate(target, draft, prompt, n, k=3)
    assert toks == ref  # losslessness: output never depends on the draft
    assert rounds >= 2


def test_k1_and_short_outputs(models):
    target, draft = models
    ref = _plain_greedy(target, [5, 6], 4)
    toks, _ = speculative_generate(target, draft, [5, 6], 4, k=1)
    assert toks == ref
    toks1, _ = speculative_generate(target, draft, [5, 6], 1, k=2)
    assert toks1 == ref[:1]
