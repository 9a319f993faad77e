"""Op conformance vs the reference CPU backend (analog of test-backend-ops
MODE_TEST): load fixture graphs dumped by tools/gen_op_golden.c and check our
jnp op implementations produce the same outputs within NMSE tolerance
(reference default 1e-7, relaxed per case like tests/test-backend-ops.cpp:319)."""

import numpy as np
import pytest

import ggml_tpu.ops.core as O
from tests.golden_io import GOLDEN_DIR

OPS_DIR = GOLDEN_DIR / "ops"


def load_case(name):
    raw = (OPS_DIR / f"{name}.bin").read_bytes()
    pos = 0

    def u32():
        nonlocal pos
        v = int(np.frombuffer(raw, np.uint32, 1, pos)[0])
        pos += 4
        return v

    n = u32()
    tensors = {}
    for _ in range(n):
        nlen = u32()
        nm = raw[pos : pos + nlen].decode()
        pos += nlen
        dtype = u32()
        nd = u32()
        ne = np.frombuffer(raw, np.uint64, nd, pos).astype(int)
        pos += 8 * nd
        count = int(np.prod(ne))
        dt = np.int32 if dtype == 1 else np.float32
        data = np.frombuffer(raw, dt, count, pos)
        pos += 4 * count
        # ggml ne order -> numpy C-order shape is reversed
        tensors[nm] = data.reshape(tuple(reversed(ne.tolist())))
    return tensors


def nmse(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    denom = np.sum(b * b)
    if denom == 0:
        return float(np.sum((a - b) ** 2))
    return float(np.sum((a - b) ** 2) / denom)


def check(name, fn, tol=1e-7):
    t = load_case(name)
    out = np.asarray(fn(t))
    exp = t["__out__"]
    assert out.shape == exp.shape, f"{name}: shape {out.shape} != {exp.shape}"
    finite = np.isfinite(exp)
    np.testing.assert_array_equal(np.isfinite(out), finite, err_msg=f"{name}: inf/nan mismatch")
    e = nmse(out[finite], exp[finite])
    assert e <= tol, f"{name}: nmse {e} > {tol}"


# -- rope ----------------------------------------------------------------------


def test_rope_norm():
    check("rope_norm", lambda t: O.rope_ext(t["x"], t["pos"], n_dims=32, mode=0), 1e-10)


def test_rope_neox():
    check("rope_neox", lambda t: O.rope_ext(t["x"], t["pos"], n_dims=64, mode=O.ROPE_TYPE_NEOX), 1e-10)


def test_rope_neox_yarn():
    check(
        "rope_neox_yarn",
        lambda t: O.rope_ext(
            t["x"], t["pos"], n_dims=64, mode=O.ROPE_TYPE_NEOX, n_ctx_orig=2048,
            freq_base=500000.0, freq_scale=0.25, ext_factor=1.0, attn_factor=1.2,
            beta_fast=32.0, beta_slow=1.0,
        ),
        1e-10,
    )


def test_rope_mrope():
    check(
        "rope_mrope",
        lambda t: O.rope_ext(
            t["x"], t["pos"], n_dims=64, mode=O.ROPE_TYPE_MROPE,
            sections=(16, 8, 4, 4),
        ),
        1e-10,
    )


def test_rope_mrope_yarn():
    check(
        "rope_mrope_yarn",
        lambda t: O.rope_ext(
            t["x"], t["pos"], n_dims=64, mode=O.ROPE_TYPE_MROPE,
            sections=(16, 8, 8, 0), n_ctx_orig=2048, freq_base=500000.0,
            freq_scale=0.25, ext_factor=1.0, attn_factor=1.2,
        ),
        1e-10,
    )


def test_rope_vision():
    check(
        "rope_vision",
        lambda t: O.rope_ext(
            t["x"], t["pos"], n_dims=32, mode=O.ROPE_TYPE_VISION,
            sections=(16, 16, 0, 0),
        ),
        1e-10,
    )


def test_rope_norm_freq_factors():
    check(
        "rope_norm_ff",
        lambda t: O.rope_ext(
            t["x"], t["pos"], t["freq_factors"], n_dims=64, mode=0, n_ctx_orig=4096,
            freq_base=10000.0, freq_scale=0.5, ext_factor=0.7, attn_factor=1.1,
            beta_fast=32.0, beta_slow=1.5,
        ),
        1e-10,
    )


# -- softmax / norms -------------------------------------------------------------


def test_soft_max_ext():
    check("soft_max_ext", lambda t: O.soft_max_ext(t["x"], t["mask"], scale=0.5, max_bias=8.0), 1e-10)


def test_rms_norm():
    check("rms_norm", lambda t: O.rms_norm(t["x"], 1e-6), 1e-10)


def test_norm():
    check("norm", lambda t: O.norm(t["x"], 1e-5), 1e-9)


def test_group_norm():
    check("group_norm", lambda t: O.group_norm(t["x"], 4, 1e-6), 1e-9)


# -- unary -----------------------------------------------------------------------

UNARY = [
    ("gelu", O.gelu, 1e-6),  # CPU uses fp16 LUT
    ("gelu_quick", O.gelu_quick, 1e-6),
    ("silu", O.silu, 1e-10),
    ("tanh", O.tanh, 1e-9),
    ("elu", O.elu, 1e-10),
    ("relu", O.relu, 0.0),
    ("sigmoid", O.sigmoid, 1e-10),
    ("hardswish", O.hardswish, 1e-10),
    ("hardsigmoid", O.hardsigmoid, 1e-10),
    ("exp", O.exp, 1e-10),
    ("sqr", O.sqr, 0.0),
    ("abs", O.abs_, 0.0),
    ("sgn", O.sgn, 0.0),
    ("step", O.step, 0.0),
    ("sin", O.sin, 1e-12),
    ("cos", O.cos, 1e-12),
    ("leaky_relu", lambda x: O.leaky_relu(x, 0.1), 1e-12),
    ("scale", lambda x: O.scale(x, -1.5), 0.0),
]


@pytest.mark.parametrize("name,fn,tol", UNARY, ids=[u[0] for u in UNARY])
def test_unary(name, fn, tol):
    check(name, lambda t: fn(t["x"]), tol)


# -- matmul ------------------------------------------------------------------------


def test_mul_mat():
    check("mul_mat", lambda t: O.mul_mat(t["a"], t["b"]), 5e-7)


def test_mul_mat_id():
    check("mul_mat_id", lambda t: O.mul_mat_id(t["as"], t["b"], t["ids"]), 5e-7)


def test_out_prod():
    check("out_prod", lambda t: O.out_prod(t["a"], t["b"]), 5e-7)


def test_get_rows():
    check("get_rows", lambda t: O.get_rows(t["a"], t["ids"]), 0.0)


# -- conv --------------------------------------------------------------------------


def test_im2col_2d():
    check("im2col_2d", lambda t: O.im2col(t["x"], kw=3, kh=3, sw=2, sh=1, pw=1, ph=2), 1e-10)


def test_conv_2d():
    check("conv_2d", lambda t: O.conv_2d(t["x"], t["w"], sw=2, sh=1, pw=1, ph=2), 5e-7)


def test_conv_1d():
    # ggml_conv_1d's final reshape reinterprets memory: the reference output's
    # actual layout is (OC, N, OL) though its ne claims (OL, OC, N). Our op
    # returns the sane (N, OC, OL); remap the fixture accordingly.
    t = load_case("conv_1d")
    out = np.asarray(O.conv_1d(t["x"], t["w"], s=2, p=1, d=1))
    gold = t["__out__"].ravel().reshape(6, 2, 9).transpose(1, 0, 2)
    assert nmse(out, gold) < 5e-6


def test_conv_transpose_1d():
    # fixture has N=1 so ggml collapsed the batch dim
    check("conv_transpose_1d", lambda t: O.conv_transpose_1d(t["x"][None], t["w"], s=2)[0], 5e-6)


def test_conv_transpose_2d():
    check("conv_transpose_2d", lambda t: O.conv_transpose_2d(t["x"][None], t["w"], stride=2)[0], 5e-6)


def test_pool_avg():
    check("pool_2d_avg", lambda t: O.pool_2d(t["x"], "avg", (3, 3), (2, 2), (1, 1)), 1e-9)


def test_pool_max():
    check("pool_2d_max", lambda t: O.pool_2d(t["x"], "max", (2, 2), (2, 2), (0, 0)), 0.0)


def test_upscale():
    check("upscale", lambda t: O.upscale(t["x"], 3), 0.0)


# -- attention -----------------------------------------------------------------------


def test_flash_attn_ext():
    check(
        "flash_attn_ext",
        lambda t: O.flash_attn_ext(t["q"], t["k"], t["v"], t["mask"], scale=0.25, max_bias=4.0, logit_softcap=5.0),
        5e-5,  # reference computes in fp16 accumulators
    )


# -- misc ----------------------------------------------------------------------------


def test_argsort():
    check("argsort", lambda t: O.argsort(t["x"], descending=True), 0.0)


def test_sum_rows():
    check("sum_rows", lambda t: O.sum_rows(t["x"]), 1e-9)


def test_diag_mask_inf():
    check("diag_mask_inf", lambda t: O.diag_mask_inf(t["x"], 2), 0.0)


def test_timestep_embedding():
    check("timestep_embedding", lambda t: O.timestep_embedding(t["x"], 64), 1e-7)


def test_cross_entropy_loss():
    check("cross_entropy_loss", lambda t: O.cross_entropy_loss(t["x"], t["labels"]), 1e-9)


def test_concat():
    check("concat", lambda t: O.concat(t["a"], t["b"], axis=1), 0.0)


def test_pad():
    check("pad", lambda t: O.pad(t["x"], (0, 2, 3)), 0.0)


def test_repeat():
    check("repeat", lambda t: O.repeat(t["x"], (4, 6, 8)), 0.0)


def test_add_broadcast():
    check("add_broadcast", lambda t: O.add(t["a"], t["b"]), 0.0)


def test_win_part():
    check("win_part", lambda t: O.win_part(t["x"][None], 4), 0.0)


def test_win_unpart():
    check("win_unpart", lambda t: O.win_unpart(t["x"], 11, 9, 4)[0], 0.0)


def test_get_rel_pos():
    check("get_rel_pos", lambda t: O.get_rel_pos(t["x"], 7, 7), 0.0)


# -- ssm / linear attention -----------------------------------------------------------


def test_ssm_conv():
    check("ssm_conv", lambda t: O.ssm_conv(t["sx"], t["c"]), 1e-9)


def test_ssm_scan():
    def fn(t):
        y, s_out = O.ssm_scan(t["s"], t["x"], t["dt"], t["A"], t["B"], t["C"])
        return np.concatenate([np.asarray(y).ravel(), np.asarray(s_out).ravel()])

    t = load_case("ssm_scan")
    out = fn(t)
    exp = t["__out__"].ravel()
    assert nmse(out, exp) < 1e-7


def _split_wkv(t, S, H, T_total, n_seqs):
    exp = t["__out__"].ravel()
    y = exp[: T_total * H * S].reshape(n_seqs, T_total // n_seqs, H, S)
    st = exp[T_total * H * S :].reshape(n_seqs, H, S, S)
    return y, st


def test_rwkv_wkv6():
    t = load_case("rwkv_wkv6")
    S, H, B, T = 8, 3, 2, 4
    k = t["k"].reshape(B, T, H, S)
    v = t["v"].reshape(B, T, H, S)
    r = t["r"].reshape(B, T, H, S)
    td = t["td"].reshape(B, T, H, S)
    st = t["state"].reshape(B, H, S, S)
    y, s_out = O.rwkv_wkv6(k, v, r, t["tf"], td, st)
    exp_y, exp_s = _split_wkv(t, S, H, B * T, B)
    assert nmse(np.asarray(y), exp_y) < 1e-9
    assert nmse(np.asarray(s_out), exp_s) < 1e-9


def test_gated_linear_attn():
    t = load_case("gated_linear_attn")
    S, H, B, T = 8, 3, 2, 4
    k = t["k"].reshape(B, T, H, S)
    v = t["v"].reshape(B, T, H, S)
    q = t["q"].reshape(B, T, H, S)
    g = t["g"].reshape(B, T, H, S)
    st = t["state"].reshape(B, H, S, S)
    y, s_out = O.gated_linear_attn(k, v, q, g, st, scale=0.25)
    exp_y, exp_s = _split_wkv(t, S, H, B * T, B)
    assert nmse(np.asarray(y), exp_y) < 1e-9
    assert nmse(np.asarray(s_out), exp_s) < 1e-9


# -- extended coverage (acc/set, reflect pad, ranges, top-k, counts, rel-pos) --


def test_acc():
    check("acc", lambda t: O.acc(t["a"], t["b"], 2 * 16), 1e-9)


def test_set():
    check("set", lambda t: O.set_(t["a"], t["b"], 3 * 16), 1e-9)


def test_pad_reflect_1d():
    check("pad_reflect_1d", lambda t: O.pad_reflect_1d(t["x"], 3, 2), 1e-9)


def test_arange():
    check("arange", lambda t: O.arange(0.5, 9.5, 0.75), 1e-12)


def test_top_k():
    check("top_k", lambda t: O.top_k(t["x"], 5), 0.0)


def test_count_equal():
    check("count_equal", lambda t: np.asarray(O.count_equal(t["a"], t["b"])).astype(np.int32), 0.0)


def test_argmax():
    check("argmax", lambda t: O.argmax(t["x"]), 0.0)


def test_mean():
    check("mean", lambda t: O.mean(t["x"]), 1e-10)


def test_diag_mask_zero():
    check("diag_mask_zero", lambda t: O.diag_mask_zero(t["x"], 1), 1e-12)


def test_diag():
    check("diag", lambda t: O.diag(t["x"]), 0.0)


def test_add1():
    check("add1", lambda t: O.add1(t["x"], t["b"]), 0.0)


def test_soft_max_plain():
    check("soft_max_plain", lambda t: O.soft_max(t["x"]), 1e-10)


def test_add_rel_pos_golden():
    check("add_rel_pos", lambda t: O.add_rel_pos(t["attn"], t["rw"], t["rh"]), 1e-9)
