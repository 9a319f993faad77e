"""BERT family (llama.cpp arch 'bert') — the embedding-model modality:
encoder-only, BIDIRECTIONAL attention over a padding mask, learned position
embeddings, token-type embeddings, post-LN blocks, erf GELU, and pooling
(CLS / mean / CLS+tanh pooler) instead of an lm head.

Architecture semantics match HF transformers.models.bert (BertModel).
llama.cpp tensor names are used: token_embd / token_types / position_embd /
token_embd_norm, per block attn_q/k/v/attn_output + attn_output_norm +
ffn_up/ffn_down + layer_output_norm.

TPU notes: one jitted encode over a static (B, T) bucket — padding rides a
mask (additive -inf bias), so ragged batches share one compiled program;
embeddings come out L2-normalizable for retrieval use.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile
from .common import layer_norm as _layer_norm
from .common import linear as _linear


@dataclass(frozen=True)
class BertConfig:
    n_vocab: int = 30522
    n_ctx: int = 512
    n_embd: int = 768
    n_head: int = 12
    n_layer: int = 12
    n_ff: int = 3072
    n_token_types: int = 2
    eps: float = 1e-12
    pooling: str = "mean"  # 'mean' | 'cls' | 'pooler' (CLS + dense + tanh)

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


def config_from_gguf(g: GGUFFile) -> BertConfig:
    md = g.metadata
    a = "bert"
    return BertConfig(
        n_vocab=int(md.get(f"{a}.vocab_size", 30522)),
        n_ctx=int(md[f"{a}.context_length"]),
        n_embd=int(md[f"{a}.embedding_length"]),
        n_head=int(md[f"{a}.attention.head_count"]),
        n_layer=int(md[f"{a}.block_count"]),
        n_ff=int(md[f"{a}.feed_forward_length"]),
        n_token_types=int(md.get(f"{a}.token_type_count", 2)),
        eps=float(md.get(f"{a}.attention.layer_norm_epsilon", 1e-12)),
        pooling=str(md.get(f"{a}.pooling_type", "mean")),
    )


def forward(params: dict, cfg: BertConfig, tokens, attn_mask=None,
            token_types=None):
    """tokens (b, t) int32; attn_mask (b, t) 1=real/0=pad (None = all real);
    token_types (b, t) segment ids (None = zeros).
    Returns hidden states (b, t, n_embd)."""
    b, t = tokens.shape
    if attn_mask is None:
        attn_mask = jnp.ones((b, t), jnp.float32)
    attn_mask = attn_mask.astype(jnp.float32)
    if token_types is None:
        token_types = jnp.zeros((b, t), jnp.int32)

    x = (params["token_embd.weight"][tokens]
         + params["position_embd.weight"][jnp.arange(t)][None]
         + params["token_types.weight"][token_types])
    x = _layer_norm(x, params["token_embd_norm.weight"],
                    params["token_embd_norm.bias"], cfg.eps)

    # additive bias: padded keys get -inf before softmax (bidirectional
    # otherwise — no causal mask in an encoder)
    bias = jnp.where(attn_mask > 0.5, 0.0, -jnp.inf)[:, None, None, :]
    scale = 1.0 / np.sqrt(cfg.head_dim)

    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        q = _linear(x, params[pre + "attn_q.weight"], params[pre + "attn_q.bias"])
        k = _linear(x, params[pre + "attn_k.weight"], params[pre + "attn_k.bias"])
        v = _linear(x, params[pre + "attn_v.weight"], params[pre + "attn_v.bias"])
        q = q.reshape(b, t, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)

        att = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                         k.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale + bias
        att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        attn_out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_embd)
        attn_out = _linear(attn_out, params[pre + "attn_output.weight"],
                           params[pre + "attn_output.bias"])
        # post-LN: LayerNorm AFTER the residual add (original transformer)
        x = _layer_norm(x + attn_out, params[pre + "attn_output_norm.weight"],
                        params[pre + "attn_output_norm.bias"], cfg.eps)

        ff = _linear(x, params[pre + "ffn_up.weight"], params[pre + "ffn_up.bias"])
        ff = jax.nn.gelu(ff, approximate=False)
        ff = _linear(ff, params[pre + "ffn_down.weight"], params[pre + "ffn_down.bias"])
        x = _layer_norm(x + ff, params[pre + "layer_output_norm.weight"],
                        params[pre + "layer_output_norm.bias"], cfg.eps)
    return x


def pool(params: dict, cfg: BertConfig, hidden, attn_mask, kind: str | None = None):
    """Sequence embedding from encoder hidden states."""
    kind = kind or cfg.pooling
    m = attn_mask.astype(hidden.dtype)[..., None]
    if kind == "mean":
        return (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)
    if kind == "cls":
        return hidden[:, 0, :]
    if kind == "pooler":
        return jnp.tanh(_linear(hidden[:, 0, :], params["pooler.weight"],
                                params["pooler.bias"]))
    raise ValueError(f"unknown pooling {kind!r}")


class Bert:
    """Embedding-model wrapper: one jitted encode per (B, T) bucket."""

    def __init__(self, params: dict, cfg: BertConfig):
        self.params = params
        self.cfg = cfg

        def encode_fn(params, tokens, attn_mask, token_types):
            h = forward(params, cfg, tokens, attn_mask, token_types)
            return h, pool(params, cfg, h, attn_mask)

        self._encode = jax.jit(encode_fn)

    @classmethod
    def from_gguf(cls, path, dtype=jnp.float32, **kw):
        from .gpt2 import load_params

        g = GGUFFile(path)
        return cls(load_params(g, dtype), config_from_gguf(g), **kw)

    def encode(self, tokens: np.ndarray, attn_mask: np.ndarray | None = None,
               token_types: np.ndarray | None = None, normalize: bool = False):
        """tokens (b, t) -> (hidden (b, t, E), embedding (b, E))."""
        tokens = np.asarray(tokens, np.int32)
        b, t = tokens.shape
        if attn_mask is None:
            attn_mask = np.ones((b, t), np.float32)
        if token_types is None:
            token_types = np.zeros((b, t), np.int32)
        h, e = self._encode(self.params, jnp.asarray(tokens),
                            jnp.asarray(attn_mask), jnp.asarray(token_types))
        if normalize:
            e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        return h, e
