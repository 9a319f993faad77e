"""LoRA adapters end to end: init invariants, low-rank training that
memorizes a pattern while the base stays frozen, adapter GGUF round trip,
and merged-export == load-time apply.

The memorization gate runs on a Llama base with its (untied) lm head in the
target set: a frozen random-init head caps how low the loss can go (the
full-rank control plateaus identically), so the head must be adaptable for
the 'reaches ~zero loss' signal."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_gpt2 import convert_state_dict as convert_gpt2
from tools.convert_hf_llama import convert_state_dict as convert_llama

from ggml_tpu.opt import AdamWConfig, finetune_lora
from ggml_tpu.opt.lora import (
    DEFAULT_TARGETS, apply_lora_to_params, init_lora, load_lora_gguf,
    merge_lora, save_lora_gguf,
)


@pytest.fixture(scope="module")
def tiny_gpt2(tmp_path_factory):
    cfg = transformers.GPT2Config(
        vocab_size=64, n_positions=64, n_embd=64, n_layer=2, n_head=4,
    )
    torch.manual_seed(3)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    path = tmp_path_factory.mktemp("lora") / "gpt2.gguf"
    convert_gpt2(hf.state_dict(), cfg).write(path)
    return str(path)


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    torch.manual_seed(3)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("lora") / "llama.gguf"
    convert_llama(hf.state_dict(), cfg).write(path)
    return str(path)


def _pattern_tokens(n):
    pat = [7, 11, 23, 42]
    return np.asarray((pat * (n // len(pat) + 1))[:n], np.int32)


def test_init_is_identity_and_targets_matched(tiny_gpt2):
    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.models.gpt2 import load_params

    params = load_params(GGUFFile(tiny_gpt2), jnp.float32)
    lora = init_lora(params, rank=4)
    # gpt2 fuses qkv: expect attn_qkv + attn_output + ffn_up + ffn_down per blk
    assert "blk.0.attn_qkv.weight" in lora and "blk.1.ffn_down.weight" in lora
    merged = merge_lora(params, lora, scale=1.0)
    for name in lora:  # b=0 => adapted == base at step 0
        np.testing.assert_allclose(np.asarray(merged[name]),
                                   np.asarray(params[name], np.float32))
        r, k = np.asarray(lora[name]["a"]).shape
        n, r2 = np.asarray(lora[name]["b"]).shape
        assert r == r2 == 4 and (n, k) == params[name].shape


def test_lora_memorizes_pattern_base_frozen(tiny_llama, tmp_path):
    toks = _pattern_tokens(400)
    adapter = tmp_path / "adapter.gguf"
    merged_path = tmp_path / "merged.gguf"
    targets = DEFAULT_TARGETS + ("output.weight",)
    losses, trained = finetune_lora(
        tiny_llama, toks, rank=8, arch="llama", seq_len=16, batch=4, steps=60,
        adamw=AdamWConfig(alpha=1e-2), targets=targets,
        adapter_out=adapter, merged_out=merged_path,
    )
    assert losses[-1] < 0.1, (losses[0], losses[-1])

    # the merged model memorized the repeating pattern...
    from ggml_tpu.models.llama import Llama

    m = Llama.from_gguf(str(merged_path), dtype=jnp.float32, max_seq=32, batch=1)
    gen = m.generate(np.asarray([[7, 11, 23]], np.int32), 8)
    assert [int(t) for t in gen] == [42, 7, 11, 23, 42, 7, 11, 23], gen

    # ...while unadapted tensors are bit-identical to the base (norms,
    # embeddings: LoRA trains ONLY the adapters)
    from ggml_tpu.gguf import GGUFFile

    base_g, merged_g = GGUFFile(tiny_llama), GGUFFile(str(merged_path))
    for name in ("blk.0.attn_norm.weight", "token_embd.weight",
                 "output_norm.weight"):
        np.testing.assert_array_equal(base_g.to_float32(name),
                                      merged_g.to_float32(name))

    # adapter round trip: load-time apply == the merged export
    lora_loaded, alpha = load_lora_gguf(adapter)
    assert alpha == 8.0 and set(lora_loaded) == set(trained)
    from ggml_tpu.models.gpt2 import load_params

    base_params = {k: v for k, v in load_params(base_g, jnp.float32).items()
                   if "@" not in k}
    applied = apply_lora_to_params(base_params, adapter)
    for name in lora_loaded:
        np.testing.assert_allclose(np.asarray(applied[name]),
                                   merged_g.to_float32(name), atol=1e-6)


def test_adapter_gguf_rejects_non_adapter(tiny_gpt2):
    with pytest.raises(AssertionError):
        load_lora_gguf(tiny_gpt2)  # a model file, not an adapter
