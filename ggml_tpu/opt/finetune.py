"""LM finetuning: GGUF in -> next-token training -> GGUF out.

Scope: the reference's ggml-opt trains mnist (examples/mnist); the
downstream analog of THIS flow is llama.cpp's finetune example.  TPU-native
shape: one fused donated train step (forward + backward + AdamW), optional
dp mesh via the Optimizer's GSPMD path, windows shuffled with the
reference's shard-permutation Dataset, checkpoints through checkpoint.py
(atomic publish + bit-exact resume).

Training runs the family forward with the masked-einsum attention path
(differentiable everywhere); the fused flash-attention VJP
(kernels.flash_attn.flash_attention_train) is available for custom training
loops at long context.
"""

from __future__ import annotations

import numpy as np

import jax

import jax.numpy as jnp

from ..gguf import GGUFFile, GGUFWriter
from ..dtypes import GGMLType
from .dataset import Dataset
from .optimizer import AdamWConfig, Optimizer


def _family(arch: str):
    if arch == "gptj":
        from ..models import gptj as fam
    elif arch in ("llama", "qwen2", "qwen3", "qwen2moe", "qwen3moe"):
        # incl. MoE configs: expert grads flow through the grouped
        # ragged-GEMM prefill path (differentiable by construction)
        from ..models import llama as fam
    elif arch == "deepseek2":
        from ..models import deepseek as fam
    elif arch == "gemma2":
        from ..models import gemma2 as fam
    elif arch == "phi2":
        from ..models import phi2 as fam
    elif arch == "gptneox":
        from ..models import neox as fam
    elif arch == "falcon":
        from ..models import falcon as fam
    elif arch == "gpt2":
        from ..models import gpt2 as fam
    else:
        raise ValueError(
            "finetune supports gpt2/gptj/llama(+qwen2/3, qwen*moe)/deepseek2/"
            f"gemma2/phi2/gptneox/falcon, not {arch}")
    return fam


def make_lm_model_fn(fam, cfg, seq_len: int, batch: int, compute_dtype=None,
                     cast_logits_f32: bool = True, remat_policy: str | None = None,
                     train_flash: bool = False):
    """(params, tokens (B, T)) -> logits (B, T, V) through the family
    forward from an empty cache (masked-einsum attention: differentiable;
    positions enter via the zeroed cache_len).

    compute_dtype=jnp.bfloat16: mixed-precision training — f32 master
    params (the optimizer state stays f32) cast to bf16 at the forward
    boundary, so matmuls run at the full MXU bf16 rate and gradients
    accumulate back into f32 through the cast's VJP.  None keeps the f32
    pass (bit-stable differential tests).

    cast_logits_f32=False keeps logits in the compute dtype — pair with the
    cross_entropy_sparse_fused loss, which does its own f32 accumulation
    fused into the reductions, so the (B, T, V) f32 copy never exists.

    remat_policy: name of a jax.checkpoint_policies policy (e.g.
    'dots_with_no_batch_dims_saveable' keeps weight-matmul outputs but
    recomputes attention einsums and elementwise residuals in the backward
    — trading MXU-cheap recompute for HBM residual traffic, the
    jax.checkpoint rematerialization lever from the prompt's HBM playbook)."""
    def model_fn(params, tokens):
        if compute_dtype is not None:
            params = jax.tree.map(
                lambda v: v.astype(compute_dtype)
                if getattr(v, "dtype", None) == jnp.float32 else v, params)
        # family-owned cache shape (MLA families cache the compressed
        # latent, not per-head K/V)
        cache = fam.init_cache(cfg, tokens.shape[0], seq_len,
                               compute_dtype or jnp.float32)
        kw = {"train_flash": True} if train_flash else {}
        logits, _ = fam.forward(
            params, cfg, tokens, jnp.zeros((tokens.shape[0],), jnp.int32),
            cache, jnp.int32(0), **kw,
        )
        return logits.astype(jnp.float32) if cast_logits_f32 else logits

    if remat_policy:
        model_fn = jax.checkpoint(
            model_fn, policy=getattr(jax.checkpoint_policies, remat_policy))
    return model_fn


def token_windows(tokens: np.ndarray, seq_len: int) -> Dataset:
    """Non-overlapping (input, target) next-token windows as a Dataset."""
    tokens = np.asarray(tokens, np.int32).reshape(-1)
    n = (len(tokens) - 1) // seq_len
    if n == 0:
        raise ValueError(f"need more than seq_len={seq_len} tokens, got {len(tokens)}")
    x = np.stack([tokens[i * seq_len:(i + 1) * seq_len] for i in range(n)])
    y = np.stack([tokens[i * seq_len + 1:(i + 1) * seq_len + 1] for i in range(n)])
    return Dataset(x, y)


def save_params_gguf(path, params: dict, metadata: dict, half: bool = False):
    """Write a params dict back to GGUF, carrying the source metadata so the
    result loads anywhere the original did (tensor names ARE GGUF names)."""
    w = GGUFWriter()
    for key, val in metadata.items():
        if isinstance(val, bool):
            w.add_u32(key, int(val))
        elif isinstance(val, (int, np.integer)):
            (w.add_u32 if 0 <= int(val) < 2**32 else w.add_u64)(key, int(val))
        elif isinstance(val, (float, np.floating)):
            w.add_f32(key, float(val))
        elif isinstance(val, str):
            w.add_string(key, val)
        elif isinstance(val, (list, tuple, np.ndarray)):
            w.add_array(key, list(val))
    t = GGMLType.F16 if half else GGMLType.F32
    for name, p in params.items():
        if "@" in name:  # loader-synthesized aliases, not file tensors
            continue
        arr = np.asarray(p, np.float32)
        w.add_tensor(name, arr, t if arr.ndim >= 2 else GGMLType.F32)
    w.write(path)


def finetune(model_path, tokens, *, arch: str | None = None, seq_len: int = 64,
             batch: int = 2, steps: int = 100, adamw: AdamWConfig | None = None,
             mesh=None, seed: int = 0, out_path=None, checkpoint_path=None,
             checkpoint_every: int = 0, log=None):
    """Next-token finetuning loop.  Returns (losses, opt).

    tokens: flat int array of training token ids.  out_path: write the
    trained weights as GGUF.  checkpoint_path + checkpoint_every: periodic
    atomic optimizer-state checkpoints (resumable via checkpoint.py)."""
    g = GGUFFile(model_path)
    arch = arch or g.metadata.get("general.architecture", "gpt2")
    fam = _family(arch)
    from ..models.gpt2 import load_params

    params = load_params(g, jnp.float32, keep_quantized=False)
    params = {k: v for k, v in params.items() if "@" not in k}
    cfg = fam.config_from_gguf(g)
    metadata = dict(g.metadata)

    ds = token_windows(tokens, seq_len)
    model_fn = make_lm_model_fn(fam, cfg, seq_len, batch)
    opt = Optimizer(model_fn, params, loss_type="cross_entropy_sparse",
                    adamw=adamw or AdamWConfig(), mesh=mesh)

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
        if checkpoint_path and checkpoint_every and (step + 1) % checkpoint_every == 0:
            from ..checkpoint import save_optimizer

            save_optimizer(f"{checkpoint_path}/step{step + 1}.gguf", opt)
    if out_path is not None:
        save_params_gguf(out_path, opt.params, metadata)
    return losses, opt
