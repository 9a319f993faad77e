"""LoRA adapters: low-rank finetuning + adapter GGUF save/load/merge.

The llama.cpp adapter analog (its GGUF lora files carry <name>.lora_a /
<name>.lora_b tensor pairs; common/common.cpp applies them at load).

TPU-native training shape: instead of threading adapter matmuls through
every family forward, the jitted train step MERGES W + (alpha/r)·B@A and
differentiates through the merge w.r.t. the adapters only — XLA fuses the
rank-r update into the weight load, the optimizer state is O(r·(n+k)) per
weight (the entire point of LoRA), and the family forwards stay untouched.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..dtypes import GGMLType
from ..gguf import GGUFFile, GGUFWriter

DEFAULT_TARGETS = (
    "attn_q.weight", "attn_k.weight", "attn_v.weight", "attn_qkv.weight",
    "attn_output.weight", "ffn_up.weight", "ffn_gate.weight", "ffn_down.weight",
)


def init_lora(params: dict, rank: int, targets=DEFAULT_TARGETS, seed: int = 0):
    """{weight name: {'a': (r, k) ~ N(0, 1/r), 'b': (n, r) zeros}} for every
    2-D target (dense OR planar-quantized — QLoRA) — b=0 makes the adapted
    model exactly the base at step 0 (the standard LoRA init)."""
    from ..quant.planar import PlanarWeight

    rng = np.random.default_rng(seed)
    lora = {}
    for name, w in params.items():
        if not name.endswith(tuple(targets)):
            continue
        if not (isinstance(w, PlanarWeight) or getattr(w, "ndim", 0) == 2):
            continue
        n, k = w.shape
        lora[name] = {
            "a": jnp.asarray(rng.standard_normal((rank, k)) / np.sqrt(rank),
                             jnp.float32),
            "b": jnp.zeros((n, rank), jnp.float32),
        }
    if not lora:
        raise ValueError(f"no LoRA targets matched among {len(params)} params")
    return lora


def wrap_lora(params: dict, lora: dict, scale: float = 1.0) -> dict:
    """params with every adapted weight wrapped as a models.common.LoRAWeight
    (base + scale·B@A applied as rank-r matmuls inside linear()).  The QLoRA
    apply: quantized bases stay packed in HBM — only the adapters train."""
    from ..models.common import LoRAWeight

    out = dict(params)
    for name, ab in lora.items():
        out[name] = LoRAWeight(params[name], ab["a"], ab["b"], scale)
    return out


def merge_lora(params: dict, lora: dict, scale: float = 1.0) -> dict:
    """params with W <- W + scale * B @ A for every adapted weight.  Used
    inside the train step (traced: gradients flow to a/b) and for export."""
    out = dict(params)
    for name, ab in lora.items():
        w = params[name]
        out[name] = (jnp.asarray(w, jnp.float32)
                     + scale * (ab["b"] @ ab["a"])).astype(jnp.float32)
    return out


def save_lora_gguf(path, lora: dict, alpha: float, base_arch: str = ""):
    """Adapter-only GGUF (llama.cpp layout: general.type=adapter,
    adapter.type=lora, adapter.lora.alpha, <name>.lora_a/.lora_b tensors)."""
    w = GGUFWriter()
    w.add_string("general.type", "adapter")
    w.add_string("general.architecture", base_arch or "unknown")
    w.add_string("adapter.type", "lora")
    w.add_f32("adapter.lora.alpha", float(alpha))
    for name, ab in lora.items():
        w.add_tensor(name + ".lora_a", np.asarray(ab["a"], np.float32), GGMLType.F32)
        w.add_tensor(name + ".lora_b", np.asarray(ab["b"], np.float32), GGMLType.F32)
    w.write(path)


def load_lora_gguf(path) -> tuple[dict, float]:
    """-> (lora dict, alpha).  Scale at apply time = alpha / rank."""
    g = GGUFFile(path)
    assert g.metadata.get("adapter.type") == "lora", path
    alpha = float(g.metadata.get("adapter.lora.alpha", 1.0))
    lora: dict = {}
    for tname in g.tensors:
        for suf, key in ((".lora_a", "a"), (".lora_b", "b")):
            if tname.endswith(suf):
                lora.setdefault(tname[: -len(suf)], {})[key] = g.to_float32(tname)
    for name, ab in lora.items():
        assert set(ab) == {"a", "b"}, (name, set(ab))
    return lora, alpha


def apply_lora_to_params(params: dict, path, scale: float | None = None) -> dict:
    """Load an adapter GGUF and merge it into dense params (the
    common/common.cpp load-time apply)."""
    lora, alpha = load_lora_gguf(path)
    rank = next(iter(lora.values()))["a"].shape[0]
    s = (alpha / rank) if scale is None else scale
    merged = merge_lora(
        {k: jnp.asarray(v) for k, v in params.items() if k in lora}, lora, s
    )
    out = dict(params)
    out.update(merged)
    return out


def finetune_lora(model_path, tokens, *, rank: int = 8, alpha: float | None = None,
                  arch: str | None = None, seq_len: int = 64, batch: int = 2,
                  steps: int = 100, adamw=None, targets=DEFAULT_TARGETS,
                  seed: int = 0, adapter_out=None, merged_out=None, log=None,
                  keep_quantized: bool = False):
    """LoRA next-token finetuning.  Returns (losses, lora dict).

    alpha defaults to rank (scale 1.0).  adapter_out: write the adapter
    GGUF; merged_out: write base+adapter merged as a full model GGUF.

    keep_quantized=True is QLoRA: the base stays planar-quantized in HBM
    (the same fused kernels as inference serve the forward; gradients reach
    the adapters through planar_matmul's activation VJP), so a 6B Q4_K base
    finetunes on one 16 GB chip.  Beyond the reference, which restricts
    training to F32/F16 params (src/ggml.c:5859)."""
    from .finetune import _family, make_lm_model_fn, save_params_gguf, token_windows
    from .optimizer import AdamWConfig, Optimizer

    g = GGUFFile(model_path)
    arch = arch or g.metadata.get("general.architecture", "gpt2")
    fam = _family(arch)
    from ..models.gpt2 import load_params

    base = load_params(g, jnp.float32, keep_quantized=keep_quantized)
    if keep_quantized:
        # keep loader aliases (token_embd.weight@dense: the embedding lookup
        # needs a dense table even when the matmul view stays packed)
        base = dict(base)
    else:
        base = {k: jnp.asarray(v) for k, v in base.items() if "@" not in k}
    cfg = fam.config_from_gguf(g)
    metadata = dict(g.metadata)

    alpha = float(rank if alpha is None else alpha)
    scale = alpha / rank
    lora = init_lora(base, rank, targets=targets, seed=seed)
    lm_fn = make_lm_model_fn(fam, cfg, seq_len, batch)

    if keep_quantized:
        # QLoRA: the quantized base rides the jitted step as the `frozen`
        # argument (capturing it would embed GBs of planes as constants)
        def model_fn(lora_params, toks, frozen_base):
            return lm_fn(wrap_lora(frozen_base, lora_params, scale), toks)

        opt = Optimizer(model_fn, lora, loss_type="cross_entropy_sparse",
                        adamw=adamw or AdamWConfig(alpha=1e-3), frozen=base)
    else:
        def model_fn(lora_params, toks):
            return lm_fn(merge_lora(base, lora_params, scale), toks)

        opt = Optimizer(model_fn, lora, loss_type="cross_entropy_sparse",
                        adamw=adamw or AdamWConfig(alpha=1e-3))
    ds = token_windows(tokens, seq_len)
    rng = np.random.default_rng(seed)
    n_batches = max(1, ds.ndata // batch)
    losses = []
    for step in range(steps):
        if step % n_batches == 0:
            ds.shuffle(rng)
        x, y = ds.get_batch(step % n_batches, batch)
        metrics = opt.step(jnp.asarray(x), jnp.asarray(y))
        losses.append(float(metrics["loss"]))
        if log is not None and (step % 10 == 0 or step == steps - 1):
            log(f"step {step:5d}  loss {losses[-1]:.4f}")
    trained = opt.params
    if adapter_out is not None:
        save_lora_gguf(adapter_out, trained, alpha, base_arch=arch)
    if merged_out is not None:
        if keep_quantized:
            # merged export is a dense model: dequantize the base once
            # (llama.cpp merges adapters into dequantized weights the same
            # way, src/llama-adapter.cpp apply path)
            dense = load_params(g, jnp.float32, keep_quantized=False)
            dense = {k: jnp.asarray(v) for k, v in dense.items() if "@" not in k}
            save_params_gguf(merged_out, merge_lora(dense, trained, scale), metadata)
        else:
            save_params_gguf(merged_out, merge_lora(base, trained, scale), metadata)
    return losses, trained
