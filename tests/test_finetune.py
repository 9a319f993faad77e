"""LM finetuning end to end: GGUF -> next-token training -> GGUF.

Gates: the loss falls, the model memorizes a synthetic pattern (greedy
continuation reproduces it), the saved GGUF reloads through the normal
model loader, dp-mesh training matches single-device, and the periodic
checkpoint restores into a fresh Optimizer."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_gpt2 import convert_state_dict

from ggml_tpu.opt import AdamWConfig, finetune, token_windows


@pytest.fixture(scope="module")
def tiny_gpt2(tmp_path_factory):
    cfg = transformers.GPT2Config(
        vocab_size=64, n_positions=64, n_embd=64, n_layer=2, n_head=4,
    )
    torch.manual_seed(3)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    path = tmp_path_factory.mktemp("ft") / "m.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return str(path)


def _pattern_tokens(n):
    pat = [7, 11, 23, 42]
    return np.asarray((pat * (n // len(pat) + 1))[:n], np.int32)


def test_token_windows_shapes():
    ds = token_windows(np.arange(65, dtype=np.int32), 16)
    assert ds.ndata == 4
    x, y = ds.get_batch(0, 2)
    np.testing.assert_array_equal(y, x + 1)  # next-token shift on arange


def test_finetune_memorizes_pattern_and_roundtrips(tiny_gpt2, tmp_path):
    toks = _pattern_tokens(400)
    out = tmp_path / "trained.gguf"
    ck = tmp_path / "ckpts"
    ck.mkdir()
    losses, opt = finetune(
        tiny_gpt2, toks, arch="gpt2", seq_len=16, batch=4, steps=60,
        adamw=AdamWConfig(alpha=3e-3), out_path=out,
        checkpoint_path=str(ck), checkpoint_every=30,
    )
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # the trained GGUF loads through the standard loader and has memorized
    # the repeating pattern
    from ggml_tpu.models.gpt2 import GPT2

    m = GPT2.from_gguf(str(out), dtype=jnp.float32, max_seq=32, batch=1)
    gen = m.generate(np.asarray([[7, 11, 23]], np.int32), 8)
    want = [42, 7, 11, 23, 42, 7, 11, 23]
    assert [int(t) for t in gen] == want, gen

    # periodic checkpoints restore into a fresh Optimizer (resume path)
    from ggml_tpu.checkpoint import load_optimizer

    assert (ck / "step30.gguf").exists() and (ck / "step60.gguf").exists()
    load_optimizer(str(ck / "step60.gguf"), opt)
    assert int(np.asarray(opt.state_dict()["t"])) == 60


def test_finetune_dp_mesh_matches_single_device(tiny_gpt2):
    """Data-parallel finetuning over a 2-device mesh produces the same loss
    trajectory as single-device (GSPMD gradient all-reduce == serial batch)."""
    import jax
    from jax.sharding import Mesh

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    toks = _pattern_tokens(200)
    l1, _ = finetune(tiny_gpt2, toks, arch="gpt2", seq_len=16, batch=4,
                     steps=10, adamw=AdamWConfig(alpha=1e-3), seed=1)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("dp",))
    l2, _ = finetune(tiny_gpt2, toks, arch="gpt2", seq_len=16, batch=4,
                     steps=10, adamw=AdamWConfig(alpha=1e-3), seed=1, mesh=mesh)
    np.testing.assert_allclose(l1, l2, rtol=2e-4)


def test_finetune_mixtral_moe(tmp_path):
    """MoE finetuning: expert gradients flow through the grouped ragged-GEMM
    path (seq_len >= the grouped threshold); loss falls and the trained GGUF
    (with its stacked 3-D expert tensors) round-trips and memorizes."""
    from tools.convert_hf_mixtral import convert_state_dict as conv_mix

    cfg = transformers.MixtralConfig(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, num_local_experts=4, num_experts_per_tok=2,
        attention_dropout=0.0,
    )
    torch.manual_seed(9)
    hf = transformers.MixtralForCausalLM(cfg).eval()
    path = tmp_path / "mix.gguf"
    sd = dict(hf.state_dict())
    sd.pop("lm_head.weight", None)  # tied
    conv_mix(sd, cfg).write(path)

    toks = _pattern_tokens(400)
    out = tmp_path / "trained.gguf"
    losses, _ = finetune(
        str(path), toks, seq_len=16, batch=4, steps=60,
        adamw=AdamWConfig(alpha=3e-3), out_path=out,
    )
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    from ggml_tpu.models.gpt2 import load_params
    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.models.llama import Llama, config_from_gguf

    g = GGUFFile(str(out))
    m = Llama(load_params(g), config_from_gguf(g), max_seq=32, batch=1)
    gen = m.generate(np.asarray([[7, 11, 23]], np.int32), 8)
    want = [42, 7, 11, 23, 42, 7, 11, 23]
    assert [int(t) for t in gen] == want, gen


def test_mixed_precision_training_matches_f32_quality(tiny_gpt2):
    """compute_dtype=bf16 (f32 master params + AdamW state, bf16 fwd/bwd —
    the production MXU recipe) reaches the same training quality as the
    all-f32 pass: both memorize the pattern and final losses agree within
    a loose band."""
    import jax.numpy as jnp

    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.models import gpt2 as gpt2_mod
    from ggml_tpu.models.gpt2 import load_params
    from ggml_tpu.opt.finetune import make_lm_model_fn
    from ggml_tpu.opt.optimizer import AdamWConfig, Optimizer

    g = GGUFFile(tiny_gpt2)
    cfg = gpt2_mod.config_from_gguf(g)
    base = load_params(g, jnp.float32)
    base = {k: v for k, v in base.items() if "@" not in k}
    toks = _pattern_tokens(129)
    ds = token_windows(toks, 16)

    finals = {}
    n_batches = max(1, ds.ndata // 4)
    for name, cdt in (("f32", None), ("bf16", jnp.bfloat16)):
        model_fn = make_lm_model_fn(gpt2_mod, cfg, 16, 4, compute_dtype=cdt)
        opt = Optimizer(model_fn, base, loss_type="cross_entropy_sparse",
                        adamw=AdamWConfig(alpha=3e-3), classify=False)
        loss = None
        for step in range(80):
            x, y = ds.get_batch(step % n_batches, 4)
            loss = float(opt.step(jnp.asarray(x), jnp.asarray(y))["loss"])
        finals[name] = loss
    # the 4-token repeating pattern is memorizable to near-zero loss
    assert finals["f32"] < 0.15, finals
    assert finals["bf16"] < 0.15, finals


def test_bf16_adamw_moments_match_f32_quality(tiny_gpt2):
    """AdamWConfig(state_dtype='bfloat16') — bf16 m/v moments (the remaining
    optimizer-state HBM stream halved; updates still compute in f32 and round
    once on store) — reaches the same training quality as f32 moments."""
    import jax.numpy as jnp

    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.models import gpt2 as gpt2_mod
    from ggml_tpu.models.gpt2 import load_params
    from ggml_tpu.opt.finetune import make_lm_model_fn
    from ggml_tpu.opt.optimizer import AdamWConfig, Optimizer

    g = GGUFFile(tiny_gpt2)
    cfg = gpt2_mod.config_from_gguf(g)
    base = load_params(g, jnp.float32)
    base = {k: v for k, v in base.items() if "@" not in k}
    toks = _pattern_tokens(129)
    ds = token_windows(toks, 16)

    finals = {}
    n_batches = max(1, ds.ndata // 4)
    for name in ("float32", "bfloat16"):
        model_fn = make_lm_model_fn(gpt2_mod, cfg, 16, 4,
                                    compute_dtype=jnp.bfloat16)
        opt = Optimizer(model_fn, base, loss_type="cross_entropy_sparse",
                        adamw=AdamWConfig(alpha=3e-3, state_dtype=name),
                        classify=False)
        assert opt.state["m"]["blk.0.attn_qkv.weight"].dtype == jnp.dtype(name)
        loss = None
        for step in range(80):
            x, y = ds.get_batch(step % n_batches, 4)
            loss = float(opt.step(jnp.asarray(x), jnp.asarray(y))["loss"])
        finals[name] = loss
    assert finals["float32"] < 0.15, finals
    assert finals["bfloat16"] < 0.15, finals


def test_train_flash_matches_einsum_attention():
    """make_lm_model_fn(train_flash=True) routes attention through the
    differentiable fused flash kernel (O(seq) residuals); loss and gradients
    must match the einsum-attention path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggml_tpu.models import gpt2 as gpt2_mod
    from ggml_tpu.models.gpt2 import GPT2Config, init_random_params
    from ggml_tpu.opt.finetune import make_lm_model_fn
    from ggml_tpu.opt.optimizer import loss_cross_entropy_sparse_fused

    cfg = GPT2Config(n_vocab=128, n_ctx=64, n_embd=64, n_head=4, n_layer=2)
    params = init_random_params(cfg, seed=0, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 128, (2, 64)).astype(np.int32))

    def loss(p, tf):
        mf = make_lm_model_fn(gpt2_mod, cfg, 64, 2, cast_logits_f32=False,
                              train_flash=tf)
        return loss_cross_entropy_sparse_fused(mf(p, x), x)

    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, True)
    assert abs(float(l0) - float(l1)) < 1e-3
    for k in g0:
        a, b = np.asarray(g0[k], np.float64), np.asarray(g1[k], np.float64)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert rel < 2e-2, (k, rel)
