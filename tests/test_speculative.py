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


# -- sampled speculation (rejection sampling, lossless in distribution) --------


def test_sampled_speculative_runs_and_is_plausible(models):
    """Smoke: sampled speculation emits n tokens in-vocab with a mismatched
    draft, and a self-draft accepts everything (p == q => no rejections)."""
    from ggml_tpu.speculative import speculative_generate_sampled

    target, draft = models
    skw = dict(temperature=0.9, top_k=16, top_p=0.95)
    toks, rounds = speculative_generate_sampled(
        target, draft, [3, 14, 15], 12, k=3, sampler=skw, seed=5
    )
    assert len(toks) == 12 and all(0 <= t < 256 for t in toks)
    toks2, rounds2 = speculative_generate_sampled(
        target, target, [3, 14, 15], 12, k=3, sampler=skw, seed=5
    )
    # identical p/q: min(1, p/q) = 1, every round advances k+1 tokens
    assert rounds2 <= -(-11 // 4) + 1


def test_sampled_speculative_distribution(models):
    """The rejection-sampling theorem in practice: the marginal distribution
    of the first emitted token equals the warped target distribution exactly
    — measured over many seeds against the analytic distribution."""
    import jax
    import jax.numpy as jnp

    from ggml_tpu.models.llama import forward as lfwd
    from ggml_tpu.sampling import warp_logits
    from ggml_tpu.speculative import make_speculative_decoder_sampled

    target, draft = models
    skw = dict(temperature=1.0, top_k=12, top_p=0.92)
    prompt = np.asarray([[7, 1, 20, 9]], np.int32)
    t = prompt.shape[1]
    first = jnp.int32(33)  # fixed carry token

    # analytic distribution of the next token after prompt+[first]
    seq = np.concatenate([prompt, [[33]]], axis=1)
    cache0 = target.new_cache()
    lg, _ = lfwd(target.params, target.cfg, jnp.asarray(seq),
                 jnp.zeros((1,), jnp.int32), cache0, jnp.int32(0))
    p_exact = np.asarray(jax.nn.softmax(warp_logits(lg[:, -1, :], **skw), axis=-1))[0]

    # prefill caches once; the decoder donates them, so pass copies per trial
    zero = jnp.zeros((1,), jnp.int32)
    tc0 = target.new_cache()
    _, tc0 = jax.jit(lfwd, static_argnums=1)(
        target.params, target.cfg, jnp.asarray(prompt), zero, tc0, jnp.int32(0))
    dc0 = draft.new_cache()
    _, dc0 = jax.jit(lfwd, static_argnums=1)(
        draft.params, draft.cfg, jnp.asarray(prompt), zero, dc0, jnp.int32(0))

    dec = make_speculative_decoder_sampled(target, draft, k=3, max_new=1, sampler=skw)
    n_trials = 400
    counts = np.zeros(256)
    for i in range(n_trials):
        tc = jax.tree.map(jnp.copy, tc0)
        dc = jax.tree.map(jnp.copy, dc0)
        toks, _, _, _, _ = dec(tc, dc, first, jnp.int32(t), jax.random.PRNGKey(1000 + i))
        counts[int(np.asarray(toks)[0])] += 1
    emp = counts / n_trials

    tv = 0.5 * np.abs(emp - p_exact).sum()
    # expected TV of a 400-sample empirical dist over ~12 active bins ~ 0.07
    assert tv < 0.15, f"total variation {tv:.3f} vs analytic distribution"
    # nothing outside the warped support may ever be emitted
    assert counts[p_exact < 1e-12].sum() == 0
