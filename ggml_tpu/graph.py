"""Declarative compute-graph layer — the ggml_cgraph analog.

reference: struct ggml_tensor (include/ggml.h:576-608), graph building
(ggml_build_forward_expand, src/ggml.c:5790), autodiff
(ggml_build_backward_expand, src/ggml.c:5794).

TPU-native translation (SURVEY.md §7): op builders record a symbolic node
(op + params + srcs) with inferred shape, exactly like ggml's deferred tensors.
`Graph.compile()` lowers the node list to a single jax-traced function executed
via the op semantics in ggml_tpu.ops.core and jit-compiled by XLA — XLA plays
the role of gallocr (memory planning) and the CPU threadpool (scheduling).
Reverse-mode autodiff is jax.grad through the same traced function — we do NOT
rebuild per-op adjoint tables (the reference's ggml_compute_backward switch).

Observability parity: Graph.print() mirrors ggml_graph_print
(src/ggml.c:6147), Graph.dump_dot() mirrors ggml_graph_dump_dot
(src/ggml.c:6223).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from . import dtypes
from .ops import core as O

# flags (reference: include/ggml.h:561-566)
FLAG_INPUT = 1
FLAG_OUTPUT = 2
FLAG_PARAM = 4
FLAG_LOSS = 8

_counter = itertools.count()


@dataclass
class Tensor:
    """Symbolic tensor node (analog of struct ggml_tensor)."""

    ctx: "Context"
    shape: tuple[int, ...]
    dtype: Any
    op: str = "none"
    srcs: tuple["Tensor", ...] = ()
    params: dict = field(default_factory=dict)
    name: str = ""
    flags: int = 0
    data: Any = None  # leaf value (np/jax array) for constants/weights

    def __post_init__(self):
        if not self.name:
            self.name = f"t{next(_counter)}"

    # -- ggml-style helpers ---------------------------------------------------
    def set_name(self, name: str) -> "Tensor":
        self.name = name
        return self

    def set_input(self) -> "Tensor":
        self.flags |= FLAG_INPUT
        return self

    def set_output(self) -> "Tensor":
        self.flags |= FLAG_OUTPUT
        return self

    def set_param(self) -> "Tensor":
        """reference: ggml_set_param — mark as trainable."""
        self.flags |= FLAG_PARAM
        return self

    def set_loss(self) -> "Tensor":
        self.flags |= FLAG_LOSS
        return self

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    # python sugar
    def __add__(self, other):
        return self.ctx.add(self, other)

    def __sub__(self, other):
        return self.ctx.sub(self, other)

    def __mul__(self, other):
        return self.ctx.mul(self, other)

    def __truediv__(self, other):
        return self.ctx.div(self, other)

    def __repr__(self):
        return f"Tensor({self.name}: {self.op} {self.shape} {np.dtype(self.dtype).name})"


def _bshape(a: tuple[int, ...], b: tuple[int, ...]) -> tuple[int, ...]:
    nd = max(len(a), len(b))
    a = (1,) * (nd - len(a)) + a
    b = (1,) * (nd - len(b)) + b
    out = []
    for x, y in zip(a, b):
        assert x % y == 0 or y % x == 0, (a, b)
        out.append(max(x, y))
    return tuple(out)


class Context:
    """Graph-building namespace (analog of ggml_context, but metadata only —
    XLA owns the actual memory planning)."""

    def __init__(self):
        self.tensors: list[Tensor] = []

    def _node(self, shape, dtype, op, srcs=(), name="", **params) -> Tensor:
        t = Tensor(self, tuple(int(s) for s in shape), dtype, op, tuple(srcs), params, name)
        self.tensors.append(t)
        return t

    # -- leaves ----------------------------------------------------------------
    def new_tensor(self, shape, dtype=jnp.float32, name="", data=None) -> Tensor:
        t = self._node(shape, dtype, "none", name=name)
        if data is not None:
            t.data = data
        return t

    def constant(self, value, name="") -> Tensor:
        arr = np.asarray(value)
        return self.new_tensor(arr.shape, arr.dtype, name=name, data=arr)

    # -- binary ------------------------------------------------------------------
    def _binary(self, op, a: Tensor, b: Tensor) -> Tensor:
        if not isinstance(b, Tensor):
            b = self.constant(np.asarray(b, dtype=np.float32))
        return self._node(_bshape(a.shape, b.shape), a.dtype, op, (a, b))

    def add(self, a, b):
        return self._binary("add", a, b)

    def sub(self, a, b):
        return self._binary("sub", a, b)

    def mul(self, a, b):
        return self._binary("mul", a, b)

    def div(self, a, b):
        return self._binary("div", a, b)

    def scale(self, a, s: float):
        return self._node(a.shape, a.dtype, "scale", (a,), s=float(s))

    def clamp(self, a, lo, hi):
        return self._node(a.shape, a.dtype, "clamp", (a,), lo=lo, hi=hi)

    # -- unary --------------------------------------------------------------------
    def _unary(self, op, a: Tensor) -> Tensor:
        return self._node(a.shape, a.dtype, op, (a,))

    def __getattr__(self, item):
        # route unary op names straight through (gelu, silu, relu, ...)
        if item in _UNARY_OPS:
            return lambda a: self._unary(item, a)
        raise AttributeError(item)

    def leaky_relu(self, a, slope=0.1):
        return self._node(a.shape, a.dtype, "leaky_relu", (a,), slope=slope)

    # -- shape ----------------------------------------------------------------------
    def reshape(self, a, shape):
        return self._node(shape, a.dtype, "reshape", (a,))

    def permute(self, a, axes):
        return self._node(tuple(a.shape[i] for i in axes), a.dtype, "permute", (a,), axes=tuple(axes))

    def transpose(self, a):
        axes = tuple(range(len(a.shape) - 2)) + (len(a.shape) - 1, len(a.shape) - 2)
        return self.permute(a, axes)

    def cont(self, a):  # no-op: XLA manages layouts
        return a

    def view(self, a, shape, offset_elems=0):
        return self._node(shape, a.dtype, "view", (a,), offset=offset_elems)

    def dup(self, a):
        """reference: ggml_dup — a materialized copy (XLA decides whether a
        physical copy is needed; the node exists for graph-API parity)."""
        return self._node(a.shape, a.dtype, "dup", (a,))

    def cpy(self, a, b):
        """reference: ggml_cpy(a, b) — a cast/reshaped into b's shape+dtype
        (the KV-cache-write idiom of the examples; our models use functional
        cache_write instead, this node covers the graph-API surface)."""
        return self._node(b.shape, b.dtype, "cpy", (a,))

    def concat(self, a, b, axis):
        shape = list(a.shape)
        shape[axis] += b.shape[axis]
        return self._node(shape, a.dtype, "concat", (a, b), axis=axis)

    def repeat(self, a, target):
        shape = target.shape if isinstance(target, Tensor) else tuple(target)
        return self._node(shape, a.dtype, "repeat", (a,), target=shape)

    def pad(self, a, pads):
        shape = tuple(s + int(p) for s, p in zip(a.shape, pads))
        return self._node(shape, a.dtype, "pad", (a,), pads=tuple(pads))

    # -- reductions --------------------------------------------------------------------
    def sum(self, a):
        return self._node((1,), a.dtype, "sum", (a,))

    def sum_rows(self, a):
        return self._node(a.shape[:-1] + (1,), a.dtype, "sum_rows", (a,))

    def mean(self, a):
        return self._node(a.shape[:-1] + (1,), a.dtype, "mean", (a,))

    def argmax(self, a):
        return self._node(a.shape[:-1], jnp.int32, "argmax", (a,))

    def count_equal(self, a, b):
        return self._node((1,), jnp.int64, "count_equal", (a, b))

    # -- norms -------------------------------------------------------------------------
    def norm(self, a, eps=1e-5):
        return self._node(a.shape, a.dtype, "norm", (a,), eps=eps)

    def rms_norm(self, a, eps=1e-6):
        return self._node(a.shape, a.dtype, "rms_norm", (a,), eps=eps)

    def group_norm(self, a, n_groups, eps=1e-6):
        return self._node(a.shape, a.dtype, "group_norm", (a,), n_groups=n_groups, eps=eps)

    # -- matmul -------------------------------------------------------------------------
    def mul_mat(self, a, b):
        batch = _bshape(a.shape[:-2], b.shape[:-2])
        return self._node(batch + (b.shape[-2], a.shape[-2]), b.dtype, "mul_mat", (a, b))

    def mul_mat_id(self, as_, b, ids):
        return self._node((b.shape[0], b.shape[1], as_.shape[-2]), b.dtype, "mul_mat_id", (as_, b, ids))

    def out_prod(self, a, b):
        batch = _bshape(a.shape[:-2], b.shape[:-2])
        return self._node(batch + (b.shape[-1], a.shape[-1]), a.dtype, "out_prod", (a, b))

    # -- indexed ------------------------------------------------------------------------
    def get_rows(self, a, ids):
        if len(ids.shape) == 1:
            return self._node(a.shape[:-2] + (ids.shape[0], a.shape[-1]), a.dtype, "get_rows", (a, ids))
        return self._node(ids.shape + (a.shape[-1],), a.dtype, "get_rows", (a, ids))

    def diag(self, a):
        """ggml_diag: (..., 1, n) row -> (..., n, n) diagonal matrix."""
        assert a.shape[-2] == 1, a.shape
        n = a.shape[-1]
        return self._node(a.shape[:-2] + (n, n), a.dtype, "diag", (a,))

    def add1(self, a, b):
        """ggml_add1: broadcast-add the scalar tensor b to a."""
        return self._node(a.shape, a.dtype, "add1", (a, b))

    def diag_mask_inf(self, a, n_past):
        return self._node(a.shape, a.dtype, "diag_mask_inf", (a,), n_past=n_past)

    def diag_mask_zero(self, a, n_past):
        return self._node(a.shape, a.dtype, "diag_mask_zero", (a,), n_past=n_past)

    def argsort(self, a, descending=False):
        return self._node(a.shape, jnp.int32, "argsort", (a,), descending=descending)

    def top_k(self, a, k):
        return self._node(a.shape[:-1] + (k,), jnp.int32, "top_k", (a,), k=k)

    # -- fused attention / position ops ---------------------------------------------------
    def soft_max(self, a):
        return self.soft_max_ext(a, None, 1.0, 0.0)

    def soft_max_ext(self, a, mask, scale=1.0, max_bias=0.0):
        srcs = (a, mask) if mask is not None else (a,)
        return self._node(a.shape, a.dtype, "soft_max_ext", srcs, scale=scale, max_bias=max_bias, has_mask=mask is not None)

    def rope_ext(self, a, pos, freq_factors=None, **kw):
        srcs = (a, pos) + ((freq_factors,) if freq_factors is not None else ())
        return self._node(a.shape, a.dtype, "rope_ext", srcs, has_ff=freq_factors is not None, **kw)

    def flash_attn_ext(self, q, k, v, mask=None, scale=1.0, max_bias=0.0, logit_softcap=0.0):
        b, h, n_q, _ = q.shape
        srcs = (q, k, v) + ((mask,) if mask is not None else ())
        return self._node(
            (b, n_q, h, v.shape[-1]), q.dtype, "flash_attn_ext", srcs,
            scale=scale, max_bias=max_bias, logit_softcap=logit_softcap, has_mask=mask is not None,
        )

    # -- conv ------------------------------------------------------------------------------
    def conv_2d(self, x, w, sw=1, sh=1, pw=0, ph=0, dw=1, dh=1):
        n, c, hh, ww = x.shape
        oc, _, kh, kw = w.shape
        oh = (hh + 2 * ph - dh * (kh - 1) - 1) // sh + 1
        ow = (ww + 2 * pw - dw * (kw - 1) - 1) // sw + 1
        return self._node((n, oc, oh, ow), x.dtype, "conv_2d", (x, w), sw=sw, sh=sh, pw=pw, ph=ph, dw=dw, dh=dh)

    def pool_2d(self, x, op, k, s, p):
        n, c, hh, ww = x.shape
        kh, kw = (k, k) if isinstance(k, int) else k
        sh, sw = (s, s) if isinstance(s, int) else s
        ph, pw = (p, p) if isinstance(p, int) else p
        oh = (hh + 2 * ph - kh) // sh + 1
        ow = (ww + 2 * pw - kw) // sw + 1
        return self._node((n, c, oh, ow), x.dtype, "pool_2d", (x,), pool_op=op, k=(kh, kw), s=(sh, sw), p=(ph, pw))

    def conv_1d(self, x, w, s=1, p=0, d=1):
        n, c, ll = x.shape
        oc, _, k = w.shape
        ol = (ll + 2 * p - d * (k - 1) - 1) // s + 1
        return self._node((n, oc, ol), x.dtype, "conv_1d", (x, w), s=s, p=p, d=d)

    def conv_transpose_1d(self, x, w, s=1, p=0, d=1):
        n, c, ll = x.shape
        _, oc, k = w.shape
        ol = (ll - 1) * s - 2 * p + d * (k - 1) + 1
        return self._node((n, oc, ol), x.dtype, "conv_transpose_1d", (x, w), s=s, p=p, d=d)

    def conv_transpose_2d(self, x, w, stride=1):
        n, c, hh, ww = x.shape
        _, oc, kh, kw = w.shape
        return self._node(
            (n, oc, (hh - 1) * stride + kh, (ww - 1) * stride + kw),
            x.dtype, "conv_transpose_2d", (x, w), stride=stride,
        )

    def pool_1d(self, x, op, k, s, p=0):
        n, c, ll = x.shape
        ol = (ll + 2 * p - k) // s + 1
        return self._node((n, c, ol), x.dtype, "pool_1d", (x,), pool_op=op, k=k, s=s, p=p)

    def conv_2d_dw(self, x, w, sw=1, sh=1, pw=0, ph=0, dw=1, dh=1):
        """Depthwise conv (reference: ggml_conv_2d_dw); w (C, 1, KH, KW)."""
        n, c, hh, ww = x.shape
        kh, kw = w.shape[-2], w.shape[-1]
        oh = (hh + 2 * ph - dh * (kh - 1) - 1) // sh + 1
        ow = (ww + 2 * pw - dw * (kw - 1) - 1) // sw + 1
        return self._node((n, c, oh, ow), x.dtype, "conv_2d_dw", (x, w),
                          sw=sw, sh=sh, pw=pw, ph=ph, dw=dw, dh=dh)

    def interpolate_bilinear(self, x, oh, ow, align_corners=False):
        """Bilinear resize (reference: ggml_interpolate / GGML_SCALE_MODE_BILINEAR)."""
        n, c = x.shape[0], x.shape[1]
        return self._node((n, c, oh, ow), x.dtype, "interpolate_bilinear", (x,),
                          oh=oh, ow=ow, align_corners=align_corners)

    def upscale(self, x, scale_factor):
        n, c, hh, ww = x.shape
        return self._node((n, c, hh * scale_factor, ww * scale_factor), x.dtype,
                          "upscale", (x,), scale_factor=scale_factor)

    def im2col(self, x, w, sw=1, sh=1, pw=0, ph=0, dw=1, dh=1):
        n, c, hh, ww = x.shape
        oc, _, kh, kw = w.shape
        oh = (hh + 2 * ph - dh * (kh - 1) - 1) // sh + 1
        ow = (ww + 2 * pw - dw * (kw - 1) - 1) // sw + 1
        return self._node((n, oh, ow, kh * kw * c), x.dtype, "im2col", (x, w),
                          sw=sw, sh=sh, pw=pw, ph=ph, dw=dw, dh=dh)

    def acc(self, a, b, offset_elems):
        return self._node(a.shape, a.dtype, "acc", (a, b), offset=offset_elems)

    def set(self, a, b, offset_elems):
        return self._node(a.shape, a.dtype, "set", (a, b), offset=offset_elems)

    def l2_norm(self, a, eps=1e-12):
        return self._node(a.shape, a.dtype, "l2_norm", (a,), eps=eps)

    def pad_reflect_1d(self, a, p0, p1):
        shape = tuple(a.shape[:-1]) + (a.shape[-1] + p0 + p1,)
        return self._node(shape, a.dtype, "pad_reflect_1d", (a,), p0=p0, p1=p1)

    def arange(self, start, stop, step_):
        import math as _m

        n = int(_m.ceil((stop - start) / step_))
        return self._node((n,), jnp.float32, "arange", (), start=start, stop=stop, step=step_)

    def timestep_embedding(self, timesteps, dim, max_period=10000):
        return self._node((timesteps.shape[0], dim), jnp.float32, "timestep_embedding",
                          (timesteps,), dim=dim, max_period=max_period)

    # -- state-space / linear-attention ops ----------------------------------
    def ssm_conv(self, sx, c):
        n_s, d_inner, total = sx.shape
        n_t = total - c.shape[1] + 1
        return self._node((n_s, n_t, d_inner), sx.dtype, "ssm_conv", (sx, c))

    def ssm_scan(self, s, x, dt, A, B, C):
        return self._node(x.shape, x.dtype, "ssm_scan", (s, x, dt, A, B, C))

    def rwkv_wkv6(self, k, v, r, tf, td, state):
        """k/v/r/td: (B, T, H, S); tf: (H, S); state: (B, H, S, S).  One fused
        output like the reference (ggml_rwkv_wkv6 result ne = {S*H,
        n_tokens + S*n_seqs}): B*T output rows then B*S final-state rows."""
        B, T, H, S = k.shape
        return self._node((B * T + B * S, H * S), k.dtype, "rwkv_wkv6", (k, v, r, tf, td, state))

    def gated_linear_attn(self, k, v, q, g, state, scale=1.0):
        """k/v/q/g: (B, T, H, S); state: (B, H, S, S).  Fused output rows as
        in rwkv_wkv6 (reference: ggml_gated_linear_attn)."""
        B, T, H, S = k.shape
        return self._node((B * T + B * S, H * S), k.dtype, "gated_linear_attn", (k, v, q, g, state), scale=scale)

    # -- SAM helpers ---------------------------------------------------------
    def win_part(self, x, w):
        c, hh, ww = x.shape[-3], x.shape[-2], x.shape[-1]
        import math as _m

        npx = _m.ceil(ww / w) * _m.ceil(hh / w)
        return self._node((npx, c, w, w), x.dtype, "win_part", (x,), w=w)

    def win_unpart(self, x, h, wd, w):
        c = x.shape[-3]
        return self._node((c, h, wd), x.dtype, "win_unpart", (x,), h=h, wd=wd, w=w)

    def get_rel_pos(self, rel, qh, kh):
        return self._node((qh, kh, rel.shape[-1]), rel.dtype, "get_rel_pos", (rel,), qh=qh, kh=kh)

    def add_rel_pos(self, attn, rel_w, rel_h):
        return self._node(attn.shape, attn.dtype, "add_rel_pos", (attn, rel_w, rel_h))

    # -- custom ops ---------------------------------------------------------------------------
    def map_custom(self, fn, *srcs, shape=None, dtype=None, name=""):
        """User-defined op on traced arrays (reference: ggml_map_custom1..3,
        include/ggml.h:1972-2025).  fn(*arrays) -> array must be
        jax-traceable; it fuses into the compiled program like any other node.
        The reference's n_tasks/userdata threading knobs are subsumed by XLA
        (userdata: close over it in fn)."""
        assert srcs, "map_custom needs at least one source"
        shape = tuple(shape) if shape is not None else srcs[0].shape
        dtype = dtype if dtype is not None else srcs[0].dtype
        return self._node(shape, dtype, "map_custom", srcs, name=name, fn=fn)

    def map_custom_host(self, fn, *srcs, shape=None, dtype=None, name=""):
        """Host-callback op: fn receives numpy arrays and runs in Python on
        the host per evaluation (jax.pure_callback) — the full analog of the
        reference's arbitrary C callback ops for code XLA cannot trace.
        fn must be pure; results are shipped back to the device."""
        assert srcs, "map_custom_host needs at least one source"
        shape = tuple(shape) if shape is not None else srcs[0].shape
        dtype = dtype if dtype is not None else srcs[0].dtype
        return self._node(shape, dtype, "map_custom_host", srcs, name=name, fn=fn)

    # -- losses -------------------------------------------------------------------------------
    def cross_entropy_loss(self, logits, labels):
        return self._node((1,), jnp.float32, "cross_entropy_loss", (logits, labels))


_UNARY_OPS = {
    "neg", "sgn", "step", "tanh", "elu", "relu", "sigmoid", "gelu",
    "gelu_quick", "silu", "hardswish", "hardsigmoid", "sqr", "sqrt", "log",
    "exp", "sin", "cos",
}

# op name -> evaluator(args, srcs_vals) producing a jax array
def _fuse_out_state(out, st):
    """(out (B,T,H,S), state (B,H,S,S)) -> one (B*T + B*S, H*S) tensor, the
    reference's fused rwkv/gla result layout (output rows then state rows)."""
    B, T, H, S = out.shape
    out_rows = out.reshape(B * T, H * S)
    st_rows = st.transpose(0, 2, 1, 3).reshape(B * S, H * S)
    return jnp.concatenate([out_rows, st_rows], axis=0)


_EVAL: dict[str, Callable] = {}


def _ev(name):
    def reg(f):
        _EVAL[name] = f
        return f

    return reg


for _u in _UNARY_OPS:
    _EVAL[_u] = (lambda fn: (lambda t, vals: fn(vals[0])))(getattr(O, _u if _u not in ("abs",) else "abs_"))

_EVAL.update(
    add=lambda t, v: O.add(v[0], v[1]),
    sub=lambda t, v: O.sub(v[0], v[1]),
    mul=lambda t, v: O.mul(v[0], v[1]),
    div=lambda t, v: O.div(v[0], v[1]),
    scale=lambda t, v: O.scale(v[0], t.params["s"]),
    clamp=lambda t, v: O.clamp(v[0], t.params["lo"], t.params["hi"]),
    leaky_relu=lambda t, v: O.leaky_relu(v[0], t.params["slope"]),
    reshape=lambda t, v: jnp.reshape(v[0], t.shape),
    dup=lambda t, v: v[0] + 0,  # forced materialization
    cpy=lambda t, v: jnp.reshape(v[0], t.shape).astype(t.dtype),
    permute=lambda t, v: jnp.transpose(v[0], t.params["axes"]),
    view=lambda t, v: jax.lax.dynamic_slice(
        v[0].reshape(-1), (t.params["offset"],), (t.n_elements,)
    ).reshape(t.shape),
    concat=lambda t, v: O.concat(v[0], v[1], t.params["axis"]),
    repeat=lambda t, v: O.repeat(v[0], t.params["target"]),
    pad=lambda t, v: O.pad(v[0], t.params["pads"]),
    sum=lambda t, v: O.sum_(v[0]),
    sum_rows=lambda t, v: O.sum_rows(v[0]),
    mean=lambda t, v: O.mean(v[0]),
    argmax=lambda t, v: O.argmax(v[0]),
    count_equal=lambda t, v: O.count_equal(v[0], v[1]),
    norm=lambda t, v: O.norm(v[0], t.params["eps"]),
    rms_norm=lambda t, v: O.rms_norm(v[0], t.params["eps"]),
    group_norm=lambda t, v: O.group_norm(v[0], t.params["n_groups"], t.params["eps"]),
    mul_mat=lambda t, v: O.mul_mat(v[0], v[1]),
    mul_mat_id=lambda t, v: O.mul_mat_id(v[0], v[1], v[2]),
    out_prod=lambda t, v: O.out_prod(v[0], v[1]),
    get_rows=lambda t, v: O.get_rows(v[0], v[1]),
    diag=lambda t, v: O.diag(v[0]),
    add1=lambda t, v: O.add1(v[0], v[1]),
    diag_mask_inf=lambda t, v: O.diag_mask_inf(v[0], t.params["n_past"]),
    diag_mask_zero=lambda t, v: O.diag_mask_zero(v[0], t.params["n_past"]),
    soft_max=lambda t, v: O.soft_max(v[0]),
    argsort=lambda t, v: O.argsort(v[0], t.params["descending"]),
    top_k=lambda t, v: O.top_k(v[0], t.params["k"]),
    soft_max_ext=lambda t, v: O.soft_max_ext(
        v[0], v[1] if t.params["has_mask"] else None, t.params["scale"], t.params["max_bias"]
    ),
    rope_ext=lambda t, v: O.rope_ext(
        v[0], v[1], v[2] if t.params["has_ff"] else None,
        **{k: w for k, w in t.params.items() if k not in ("has_ff",)},
    ),
    flash_attn_ext=lambda t, v: O.flash_attn_ext(
        v[0], v[1], v[2], v[3] if t.params["has_mask"] else None,
        t.params["scale"], t.params["max_bias"], t.params["logit_softcap"],
    ),
    conv_2d=lambda t, v: O.conv_2d(v[0], v[1], **t.params),
    pool_2d=lambda t, v: O.pool_2d(v[0], t.params["pool_op"], t.params["k"], t.params["s"], t.params["p"]),
    cross_entropy_loss=lambda t, v: O.cross_entropy_loss(v[0], v[1]),
    conv_1d=lambda t, v: O.conv_1d(v[0], v[1], **t.params),
    conv_transpose_1d=lambda t, v: O.conv_transpose_1d(v[0], v[1], **t.params),
    conv_transpose_2d=lambda t, v: O.conv_transpose_2d(v[0], v[1], **t.params),
    pool_1d=lambda t, v: O.pool_1d(v[0], t.params["pool_op"], t.params["k"], t.params["s"], t.params["p"]),
    upscale=lambda t, v: O.upscale(v[0], t.params["scale_factor"]),
    conv_2d_dw=lambda t, v: O.conv_2d_dw(
        v[0], v[1], t.params["sw"], t.params["sh"], t.params["pw"],
        t.params["ph"], t.params["dw"], t.params["dh"]),
    interpolate_bilinear=lambda t, v: O.interpolate_bilinear(
        v[0], t.params["oh"], t.params["ow"], t.params["align_corners"]),
    im2col=lambda t, v: O.im2col(v[0], v[1], **t.params),
    acc=lambda t, v: O.acc(v[0], v[1], t.params["offset"]),
    set=lambda t, v: O.set_(v[0], v[1], t.params["offset"]),
    l2_norm=lambda t, v: O.l2_norm(v[0], t.params["eps"]),
    pad_reflect_1d=lambda t, v: O.pad_reflect_1d(v[0], t.params["p0"], t.params["p1"]),
    arange=lambda t, v: O.arange(t.params["start"], t.params["stop"], t.params["step"]),
    timestep_embedding=lambda t, v: O.timestep_embedding(v[0], t.params["dim"], t.params["max_period"]),
    ssm_conv=lambda t, v: O.ssm_conv(v[0], v[1]),
    ssm_scan=lambda t, v: O.ssm_scan(*v),
    rwkv_wkv6=lambda t, v: _fuse_out_state(*O.rwkv_wkv6(*v)),
    gated_linear_attn=lambda t, v: _fuse_out_state(*O.gated_linear_attn(*v, t.params["scale"])),
    win_part=lambda t, v: O.win_part(v[0], t.params["w"]),
    win_unpart=lambda t, v: O.win_unpart(v[0], t.params["h"], t.params["wd"], t.params["w"]),
    get_rel_pos=lambda t, v: O.get_rel_pos(v[0], t.params["qh"], t.params["kh"]),
    add_rel_pos=lambda t, v: O.add_rel_pos(v[0], v[1], v[2]),
    map_custom=lambda t, v: jnp.asarray(t.params["fn"](*v), t.dtype).reshape(t.shape),
    map_custom_host=lambda t, v: jax.pure_callback(
        lambda *a: np.asarray(t.params["fn"](*(np.asarray(x) for x in a)), t.dtype).reshape(t.shape),
        jax.ShapeDtypeStruct(t.shape, t.dtype),
        *v,
        vmap_method="sequential",
    ),
)


class Graph:
    """Topologically-ordered node list (analog of ggml_cgraph)."""

    def __init__(self, outputs: list[Tensor]):
        self.outputs = list(outputs)
        self.nodes: list[Tensor] = []
        self.leafs: list[Tensor] = []
        visited = set()

        def visit(t: Tensor):  # reference: ggml_visit_parents (src/ggml.c:5733)
            if id(t) in visited:
                return
            visited.add(id(t))
            for s in t.srcs:
                visit(s)
            (self.nodes if t.op != "none" else self.leafs).append(t)

        for out in outputs:
            visit(out)

    @property
    def n_nodes(self):
        return len(self.nodes)

    def inputs(self) -> list[Tensor]:
        return [t for t in self.leafs if t.data is None]

    def compile(self, jit: bool = True) -> Callable:
        """Lower to a callable f(**leaf_values) -> tuple(outputs).

        XLA compiles the whole node list as one fused program — the analog of
        ggml_backend_graph_compute over the full cgraph, with gallocr's memory
        planning done by the compiler."""
        input_names = [t.name for t in self.inputs()]

        def run(**kw):
            env: dict[int, Any] = {}
            for leaf in self.leafs:
                if leaf.data is not None:
                    env[id(leaf)] = jnp.asarray(leaf.data)
                else:
                    env[id(leaf)] = kw[leaf.name]
            for node in self.nodes:
                vals = [env[id(s)] for s in node.srcs]
                env[id(node)] = _EVAL[node.op](node, vals)
            return tuple(env[id(o)] for o in self.outputs)

        if jit:
            return jax.jit(run)
        return run

    def run_debug(self, callback=None, **leaf_values):
        """Eager node-by-node execution with a per-node observation hook —
        the analog of ggml_backend_sched_eval_callback's observe mode
        (include/ggml-backend.h:282-289) and of
        ggml_backend_compare_graph_backend's per-node comparison callback
        (include/ggml-backend.h:342). callback(tensor, value) is invoked after
        each node with its concrete array; return False to abort (the
        ggml_abort_callback idiom). Returns the output tuple (or None on abort)."""
        env: dict[int, Any] = {}
        for leaf in self.leafs:
            env[id(leaf)] = jnp.asarray(leaf.data) if leaf.data is not None else jnp.asarray(leaf_values[leaf.name])
        for node in self.nodes:
            vals = [env[id(s)] for s in node.srcs]
            env[id(node)] = _EVAL[node.op](node, vals)
            if callback is not None and callback(node, env[id(node)]) is False:
                return None
        return tuple(env[id(o)] for o in self.outputs)

    def compare(self, other_exec: Callable, **leaf_values) -> list[tuple[str, float]]:
        """Differential harness analog of ggml_backend_compare_graph_backend:
        run the graph eagerly and compare each OUTPUT against other_exec's
        (e.g. the jitted/compiled program). Returns [(name, nmse), ...]."""
        ref = self.run_debug(**leaf_values)
        got = other_exec(**leaf_values)
        out = []
        for o, a, b in zip(self.outputs, ref, got):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            denom = (a * a).sum()
            nmse = float(((a - b) ** 2).sum() / denom) if denom else float((b * b).sum())
            out.append((o.name, nmse))
        return out

    # -- observability (reference: ggml_graph_print src/ggml.c:6147) ------------
    def print(self, file=None):
        print(f"=== graph: {len(self.nodes)} nodes, {len(self.leafs)} leafs ===", file=file)
        for i, n in enumerate(self.nodes):
            print(f"node {i:4d}: {n.op:>16} {str(n.shape):>24} {n.name}", file=file)
        for i, l in enumerate(self.leafs):
            print(f"leaf {i:4d}: {str(l.shape):>24} {l.name}", file=file)

    def dump_dot(self, path: str):
        """reference: ggml_graph_dump_dot (src/ggml.c:6223)."""
        with open(path, "w") as f:
            f.write("digraph G {\n  rankdir = LR;\n")
            for t in self.leafs + self.nodes:
                label = f"{t.name}|{t.op}|{t.shape}"
                shape = "record"
                f.write(f'  "{t.name}" [shape={shape}, label="{label}"];\n')
            for t in self.nodes:
                for s in t.srcs:
                    f.write(f'  "{s.name}" -> "{t.name}";\n')
            f.write("}\n")


def build_forward(outputs) -> Graph:
    """reference: ggml_build_forward_expand."""
    if isinstance(outputs, Tensor):
        outputs = [outputs]
    return Graph(outputs)


def value_and_grad(graph: Graph, loss: Tensor, params: list[Tensor]) -> Callable:
    """Reverse-mode autodiff via jax.grad through the compiled graph —
    the TPU-native replacement for ggml_build_backward_expand
    (reference: src/ggml.c:5794; see SURVEY.md §7 'autodiff')."""
    assert loss in graph.outputs
    loss_idx = graph.outputs.index(loss)
    fn = graph.compile(jit=False)
    param_names = [p.name for p in params]
    input_names = [t.name for t in graph.inputs()]

    def f(param_vals: dict, other: dict):
        out = fn(**param_vals, **other)
        return out[loss_idx].reshape(()), out

    vag = jax.value_and_grad(f, has_aux=True)

    @jax.jit
    def run(param_vals: dict, other: dict):
        (loss_val, outs), grads = vag(param_vals, other)
        return loss_val, outs, grads

    return run
