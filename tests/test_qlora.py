"""QLoRA: LoRA finetuning over a FROZEN planar-quantized base.

The base weights stay packed in HBM exactly as at inference (the same fused
dequant-matmul kernels serve the forward); gradients reach the bf16/f32
adapters through planar_matmul's activation VJP (dx = dy @ dequant(W)ᵀ,
dequantized per-weight in the backward only).  Beyond the reference, which
restricts training to F32/F16 params (src/ggml.c:5859 ggml_opt checks).

Gates:
- init identity: b=0 ⇒ wrapped quantized forward == plain quantized forward
  bit-for-bit (the adapter path contributes exactly zero);
- activation-VJP correctness: grad through planar_matmul matches grad through
  the exactly-dequantized dense weight;
- memorization: a Q4_K llama base + rank-8 adapters learns a repeating
  pattern (loss → ~0, greedy generation reproduces it) while every
  non-adapted tensor stays bit-identical;
- adapter GGUF round trip + merged dense export == wrapped forward.
"""

import pathlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tools.convert_hf_llama import convert_state_dict as convert_llama

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.opt import AdamWConfig, finetune_lora
from ggml_tpu.opt.lora import DEFAULT_TARGETS, init_lora, load_lora_gguf, wrap_lora

# Q4_K needs 256-elem superblock rows: every 2-D weight in-dim ≥ 256
# (vocab stays small so the memorization gate converges fast)
V, E, FF, LAYERS, HEADS = 64, 256, 512, 2, 4


@pytest.fixture(scope="module")
def q4k_llama(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=E, intermediate_size=FF,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=HEADS, max_position_embeddings=64,
    )
    torch.manual_seed(5)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("qlora") / "llama_q4k.gguf"
    convert_llama(hf.state_dict(), cfg, ftype=GGMLType.Q4_K).write(path)
    return str(path)


def _pattern_tokens(n):
    pat = [7, 11, 23, 42]
    return np.asarray((pat * (n // len(pat) + 1))[:n], np.int32)


def test_qlora_init_identity(q4k_llama):
    """b=0 adapters wrapped over the quantized base change NOTHING: the
    wrapped forward equals the plain quantized forward bitwise."""
    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.models.gpt2 import load_params
    from ggml_tpu.models import llama as fam
    from ggml_tpu.quant.planar import PlanarWeight

    g = GGUFFile(q4k_llama)
    base = dict(load_params(g, jnp.float32, keep_quantized=True))
    cfg = fam.config_from_gguf(g)
    lora = init_lora(base, rank=4)
    assert any(isinstance(base[n], PlanarWeight) for n in lora), (
        "QLoRA targets must include planar-quantized weights")

    toks = jnp.asarray(_pattern_tokens(16)[None, :])

    def fwd(params):
        cache = fam.init_cache(cfg, 1, 16, jnp.float32)
        logits, _ = fam.forward(params, cfg, toks, jnp.zeros((1,), jnp.int32),
                                cache, jnp.int32(0))
        return np.asarray(logits)

    np.testing.assert_array_equal(fwd(wrap_lora(base, lora, 1.0)), fwd(base))


def test_qlora_vjp_matches_dense_grad():
    """jax.grad through planar_matmul == grad through the exactly-dequantized
    dense weight (the VJP is dy @ dequant(W)ᵀ by construction; bf16 backward
    operands give the only slack)."""
    from ggml_tpu.quant.planar import repack
    from ggml_tpu.quant.reference import quantize, dequantize
    from ggml_tpu.kernels.qmatmul import planar_matmul

    rng = np.random.default_rng(0)
    n, k = 64, 256
    w = rng.standard_normal((n, k)).astype(np.float32)
    q = quantize(w, GGMLType.Q4_K)
    pw = repack(q, GGMLType.Q4_K, (n, k)).to_device()
    wd = jnp.asarray(dequantize(q, GGMLType.Q4_K, n * k).reshape(n, k))
    x = jnp.asarray(rng.standard_normal((3, k)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))

    g_q = jax.grad(lambda x: ((planar_matmul(x, pw) - t) ** 2).sum())(x)
    g_d = jax.grad(lambda x: ((x @ wd.T - t) ** 2).sum())(x)
    num = float(((g_q - g_d) ** 2).mean())
    den = float((g_d ** 2).mean()) + 1e-12
    assert num / den < 1e-4, num / den


def test_qlora_memorizes_base_stays_quantized(q4k_llama, tmp_path):
    toks = _pattern_tokens(400)
    adapter = tmp_path / "adapter.gguf"
    merged_path = tmp_path / "merged.gguf"
    targets = DEFAULT_TARGETS + ("output.weight",)
    losses, trained = finetune_lora(
        q4k_llama, toks, rank=8, arch="llama", seq_len=16, batch=4, steps=100,
        adamw=AdamWConfig(alpha=1e-2), targets=targets, keep_quantized=True,
        adapter_out=adapter, merged_out=merged_path,
    )
    assert losses[-1] < 0.05, (losses[0], losses[-1])

    # the merged dense export memorized the repeating pattern
    from ggml_tpu.models.llama import Llama

    m = Llama.from_gguf(str(merged_path), dtype=jnp.float32, max_seq=32, batch=1)
    gen = m.generate(np.asarray([[7, 11, 23]], np.int32), 8)
    assert [int(t) for t in gen] == [42, 7, 11, 23, 42, 7, 11, 23], gen

    # non-adapted tensors bit-identical to the base (only adapters trained)
    from ggml_tpu.gguf import GGUFFile

    base_g, merged_g = GGUFFile(q4k_llama), GGUFFile(str(merged_path))
    for name in ("blk.0.attn_norm.weight", "output_norm.weight"):
        np.testing.assert_array_equal(base_g.to_float32(name),
                                      merged_g.to_float32(name))

    # adapter round trip: wrapped-quantized forward == merged dense forward
    # within kernel-vs-einsum numerics
    lora_loaded, alpha = load_lora_gguf(adapter)
    assert alpha == 8.0 and set(lora_loaded) == set(trained)

    from ggml_tpu.models.gpt2 import load_params
    from ggml_tpu.models import llama as fam

    base = dict(load_params(base_g, jnp.float32, keep_quantized=True))
    cfg = fam.config_from_gguf(base_g)
    wrapped = wrap_lora(base, {k: {kk: jnp.asarray(vv) for kk, vv in ab.items()}
                               for k, ab in lora_loaded.items()}, alpha / 8.0)
    t_in = jnp.asarray(_pattern_tokens(16)[None, :])
    cache = fam.init_cache(cfg, 1, 16, jnp.float32)
    lq, _ = fam.forward(wrapped, cfg, t_in, jnp.zeros((1,), jnp.int32),
                        cache, jnp.int32(0))
    md = Llama.from_gguf(str(merged_path), dtype=jnp.float32, max_seq=16, batch=1)
    cache2 = fam.init_cache(cfg, 1, 16, jnp.float32)
    ld, _ = fam.forward(md.params, cfg, t_in, jnp.zeros((1,), jnp.int32),
                        cache2, jnp.int32(0))
    nmse = float(((np.asarray(lq) - np.asarray(ld)) ** 2).mean()
                 / (np.asarray(ld) ** 2).mean())
    assert nmse < 1e-4, nmse
