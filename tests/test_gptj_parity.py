"""GPT-J parity: random-init HF GPTJForCausalLM (torch CPU) vs our JAX model
through the GGUF round trip — interleaved RoPE, parallel residual, untied
biased lm head (reference: examples/gpt-j/main.cpp:449-585)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.gptj import GPTJ, config_from_gguf

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from tools.convert_hf_gptj import convert_state_dict


@pytest.fixture(scope="module")
def tiny_gptj(tmp_path_factory):
    cfg = transformers.GPTJConfig(
        vocab_size=512, n_positions=128, n_embd=64, n_layer=2, n_head=4,
        rotary_dim=8, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(13)
    model = transformers.GPTJForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("gptj") / "tiny.gguf"
    convert_state_dict(model.state_dict(), cfg).write(path)
    return model, cfg, path


def test_gptj_logits_match_hf(tiny_gptj):
    model, cfg, path = tiny_gptj
    g = GGUFFile(path)
    mcfg = config_from_gguf(g)
    assert mcfg.n_layer == 2 and mcfg.n_rot == 8

    rng = np.random.default_rng(3)
    toks = rng.integers(0, 512, (1, 13)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks, dtype=torch.long)).logits.numpy()

    import jax.numpy as jnp

    m = GPTJ(load_params(g), mcfg, max_seq=32, batch=1)
    cache = m.new_cache(dtype=jnp.float32)
    logits, _ = m._step(m.params, jnp.asarray(toks), jnp.zeros((1,), jnp.int32), cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=2e-3, atol=2e-3)


def test_gptj_decode_loop_matches_stepwise(tiny_gptj):
    """The fused lax.scan decode loop must produce the same tokens as
    step-by-step decoding."""
    model, cfg, path = tiny_gptj
    g = GGUFFile(path)
    m = GPTJ(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    prompt = rng.integers(0, 512, (1, 5)).astype(np.int32)

    # step-by-step
    cache = m.new_cache(dtype=jnp.float32)
    logits, cache, n_past = m.prefill(cache, prompt)
    tok = np.asarray(jnp.argmax(logits, -1))[:, None].astype(np.int32)
    seq = []
    for i in range(8):
        l, cache = m._step(m.params, jnp.asarray(tok), jnp.full((1,), n_past, jnp.int32), cache, jnp.int32(n_past))
        n_past += 1
        tok = np.asarray(jnp.argmax(l[:, -1], -1))[:, None].astype(np.int32)
        seq.append(int(tok[0, 0]))

    # scan loop
    cache2 = m.new_cache(dtype=jnp.float32)
    logits2, cache2, n_past2 = m.prefill(cache2, prompt)
    first = np.asarray(jnp.argmax(logits2, -1))[:, None].astype(np.int32)
    _, toks = m.decode_greedy(cache2, first, n_past2, 8)
    assert seq == list(toks.reshape(-1)), (seq, toks)


def test_fused_qkvup_matches_unfused():
    """The qkv+ffn_up single-kernel fusion (parallel residual: both read the
    same normed input) is numerically identical to separate projections —
    the planes are the same bytes, concatenated along N."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggml_tpu.dtypes import GGMLType
    from ggml_tpu.models.gptj import GPTJConfig, forward, init_cache, synth_quantized_params
    from ggml_tpu.quant.planar import PlanarWeight

    cfg = GPTJConfig(n_vocab=512, n_ctx=64, n_embd=256, n_head=4, n_layer=2, n_rot=32)
    params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=3, dtype=jnp.float32, fuse_qkv=False)
    fused = dict(params)
    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        names = ("attn_q.weight", "attn_k.weight", "attn_v.weight", "ffn_up.weight")
        pws = [params[pre + n] for n in names]
        cat = lambda f: jnp.concatenate([getattr(w, f) for w in pws], axis=-1)
        fused[pre + "attn_qkvup.weight"] = PlanarWeight(
            kind=pws[0].kind, codes=cat("codes"), scales=cat("scales"),
            offsets=None if pws[0].offsets is None else cat("offsets"),
            group=pws[0].group, n=sum(w.n for w in pws), k=pws[0].k,
            orig_type=pws[0].orig_type,
        )
        for n in names:
            del fused[pre + n]

    toks = jnp.asarray(np.random.default_rng(0).integers(0, 512, (1, 5)).astype(np.int32))
    z = jnp.zeros((1,), jnp.int32)
    l1, _ = jax.jit(forward, static_argnums=1)(
        params, cfg, toks, z, init_cache(cfg, 1, 16, jnp.float32), jnp.int32(0))
    l2, _ = jax.jit(forward, static_argnums=1)(
        fused, cfg, toks, z, init_cache(cfg, 1, 16, jnp.float32), jnp.int32(0))
    a, b = np.asarray(l1, np.float64), np.asarray(l2, np.float64)
    nmse = ((a - b) ** 2).sum() / (a * a).sum()
    # CPU interpret mode is exact (0.0); on hardware the fused weight's
    # different N tiling reassociates the bf16 dequant matmul -> gate at the
    # reference matmul NMSE (tests/test-backend-ops.cpp:1915)
    assert nmse < 5e-4, nmse


def test_rope_deinterleaved_from_gguf_matches_hf(tiny_gptj):
    """from_gguf permutes q/k output columns at load and runs mode-0 RoPE
    deinterleaved (contiguous slices, no interleave relayout) — logits must
    still match HF: attention dots are invariant to the fixed per-head
    permutation applied to both q and k."""
    model, cfg, path = tiny_gptj
    import jax.numpy as jnp

    m = GPTJ.from_gguf(path, dtype=jnp.float32, keep_quantized=False,
                       rope_deinterleaved=True, max_seq=32, batch=1)
    assert m.cfg.rope_deinterleaved

    rng = np.random.default_rng(5)
    toks = rng.integers(0, 512, (1, 11)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks, dtype=torch.long)).logits.numpy()
    cache = m.new_cache(dtype=jnp.float32)
    logits, _ = m._step(m.params, jnp.asarray(toks), jnp.zeros((1,), jnp.int32),
                        cache, jnp.int32(0))
    got = np.asarray(logits[0], np.float32)
    nmse = float(((got - hf_logits[0]) ** 2).sum() / (hf_logits[0] ** 2).sum())
    assert nmse < 1e-9, nmse


def test_fused_decode_attention_matches_unfused(monkeypatch):
    """The fused cache-write+attention pallas kernel (kernels/decode_attn.py)
    must reproduce the unfused XLA decode path token for token."""
    import jax
    import jax.numpy as jnp
    from ggml_tpu.dtypes import GGMLType
    from ggml_tpu.models.gptj import GPTJ, random_config, synth_quantized_params

    cfg = random_config("tiny")
    params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=0)

    def decode(env):
        monkeypatch.setenv("GGML_TPU_FUSED_DECODE_ATTN", env)
        m = GPTJ(params, cfg, max_seq=64, batch=1)
        cache = m.new_cache(jnp.float32)
        logits, cache, n = m.prefill(cache, np.asarray([[3, 5, 7]], np.int32))
        cache, toks = m.decode_greedy(cache, np.asarray([[9]], np.int32), n, 12)
        return toks.ravel().tolist()

    assert decode("1") == decode("0")
