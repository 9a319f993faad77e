"""GPT-2 eval built THROUGH the cgraph-analog layer — the load-bearing proof
that Context/Graph.compile can carry a real model end to end.

This mirrors the reference's graph-API build path (examples/gpt-2/
main-ctx.cpp: gpt2_graph builds ggml ops into a cgraph, then
ggml_graph_compute runs it): every op below is a graph NODE (get_rows, norm,
mul_mat, diag_mask_inf, soft_max, gelu, views/permutes), the weights are
graph LEAFS, and Graph.compile lowers the whole node list into one XLA
program.  tests/test_gpt2_graph.py gates its logits against the direct
models/gpt2.forward implementation.

Full-sequence eval (no KV cache) — the graph path is the pedagogical/
compat surface; the production decode path stays models/gpt2.py.
"""

from __future__ import annotations

import numpy as np

from ..graph import Context, build_forward
from .gpt2 import GPT2Config


def build_gpt2_eval(params: dict, cfg: GPT2Config, n_tokens: int):
    """params: dense numpy/jax arrays (GGUF names).  Returns (graph, fn)
    where fn(token_ids (T,) int32) -> logits (T, n_vocab)."""
    T, E, H = n_tokens, cfg.n_embd, cfg.n_head
    hd = cfg.head_dim
    ctx = Context()

    def leaf(name):
        arr = np.asarray(params[name], np.float32)
        return ctx.new_tensor(arr.shape, name=name, data=arr)

    tokens = ctx.new_tensor((T,), dtype=np.int32, name="tokens")
    pos = ctx.new_tensor((T,), dtype=np.int32, name="pos",
                         data=np.arange(T, dtype=np.int32))

    wte = leaf("token_embd.weight")
    x = ctx.add(ctx.get_rows(wte, tokens), ctx.get_rows(leaf("position_embd.weight"), pos))

    def layer_norm(t, w, b):
        return ctx.add(ctx.mul(ctx.norm(t, cfg.eps), w, ), b)

    for i in range(cfg.n_layer):
        pre = f"blk.{i}."
        h = layer_norm(x, leaf(pre + "attn_norm.weight"), leaf(pre + "attn_norm.bias"))

        # fused qkv weight: ROW slices are contiguous views of the (3E, E)
        # leaf (the ggml_view_2d idiom of main-ctx.cpp)
        w_qkv = leaf(pre + "attn_qkv.weight")
        b_qkv = leaf(pre + "attn_qkv.bias")
        qkv = []
        for j in range(3):
            wj = ctx.view(w_qkv, (E, E), offset_elems=j * E * E)
            bj = ctx.view(b_qkv, (E,), offset_elems=j * E)
            zj = ctx.add(ctx.mul_mat(wj, h), bj)  # (T, E)
            zj = ctx.permute(ctx.reshape(zj, (T, H, hd)), (1, 0, 2))  # (H, T, hd)
            qkv.append(zj)
        q, k, v = qkv

        att = ctx.mul_mat(k, q)  # (H, T, T): att[h,tq,tk]
        att = ctx.scale(att, 1.0 / np.sqrt(hd))
        att = ctx.diag_mask_inf(att, 0)
        att = ctx.soft_max(att)
        vt = ctx.permute(v, (0, 2, 1))  # (H, hd, T)
        out = ctx.mul_mat(vt, att)  # (H, T, hd)
        merged = ctx.reshape(ctx.permute(out, (1, 0, 2)), (T, E))
        proj = ctx.add(ctx.mul_mat(leaf(pre + "attn_output.weight"), merged),
                       leaf(pre + "attn_output.bias"))
        x = ctx.add(x, proj)

        h2 = layer_norm(x, leaf(pre + "ffn_norm.weight"), leaf(pre + "ffn_norm.bias"))
        fc = ctx.add(ctx.mul_mat(leaf(pre + "ffn_up.weight"), h2), leaf(pre + "ffn_up.bias"))
        fc = ctx.gelu(fc)
        down = ctx.add(ctx.mul_mat(leaf(pre + "ffn_down.weight"), fc), leaf(pre + "ffn_down.bias"))
        x = ctx.add(x, down)

    x = layer_norm(x, leaf("output_norm.weight"), leaf("output_norm.bias"))
    logits = ctx.mul_mat(wte, x)  # tied lm head: (T, n_vocab)
    logits.name = "logits"

    g = build_forward([logits])
    fn = g.compile()

    def run(token_ids):
        return fn(tokens=np.asarray(token_ids, np.int32))[0]

    return g, run
