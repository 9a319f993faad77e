// gen_op_golden.c — differential op-conformance fixtures.
//
// For each op case: build a tiny graph with deterministic inputs, execute it on
// the reference CPU backend (the "executable specification" per SURVEY.md §4),
// and dump every input and the output to tests/golden/ops/<case>.bin.
// Our jax.numpy op implementations are compared against these dumps
// (tests/test_ops_golden.py) — the analog of test-backend-ops MODE_TEST.
//
// File format: u32 n_tensors; per tensor:
//   u32 name_len; char name[]; u32 dtype(0=f32,1=i32); u32 n_dims; u64 ne[n_dims];
//   payload (f32 or i32), ggml memory order (ne0 contiguous).

#include <math.h>
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include "ggml.h"
#include "ggml-cpu.h"

static uint32_t xs_state = 1;
static uint32_t xorshift32(void) {
    uint32_t x = xs_state;
    x ^= x << 13; x ^= x >> 17; x ^= x << 5;
    return xs_state = x;
}
static float frand(void) { // uniform-ish in [-1, 1)
    return ((float)(xorshift32() >> 8) / 16777216.0f) * 2.0f - 1.0f;
}

static void fill_f32(struct ggml_tensor * t, float scale) {
    float * d = (float *) t->data;
    for (int64_t i = 0; i < ggml_nelements(t); i++) d[i] = frand() * scale;
}
static void fill_f16(struct ggml_tensor * t, float scale) {
    ggml_fp16_t * d = (ggml_fp16_t *) t->data;
    for (int64_t i = 0; i < ggml_nelements(t); i++) d[i] = ggml_fp32_to_fp16(frand() * scale);
}

static FILE * out_file;
static uint32_t out_count;

static void dump_tensor(const char * name, struct ggml_tensor * t) {
    uint32_t nlen = (uint32_t) strlen(name);
    fwrite(&nlen, 4, 1, out_file);
    fwrite(name, 1, nlen, out_file);
    uint32_t dtype = (t->type == GGML_TYPE_I32 || t->type == GGML_TYPE_I64) ? 1u : 0u;
    fwrite(&dtype, 4, 1, out_file);
    uint32_t nd = (uint32_t) ggml_n_dims(t);
    fwrite(&nd, 4, 1, out_file);
    for (uint32_t i = 0; i < nd; i++) {
        uint64_t ne = (uint64_t) t->ne[i];
        fwrite(&ne, 8, 1, out_file);
    }
    int64_t n = ggml_nelements(t);
    if (dtype == 1) {
        if (t->type == GGML_TYPE_I64) {  // downcast to i32 (small test values)
            const int64_t * src = (const int64_t *) t->data;
            for (int64_t i = 0; i < n; i++) {
                int32_t v = (int32_t) src[i];
                fwrite(&v, 4, 1, out_file);
            }
        } else {
            // walk strides: top_k outputs are VIEWS of argsort (non-contiguous)
            const int64_t * ne = t->ne; const size_t * nb = t->nb;
            for (int64_t i3 = 0; i3 < ne[3]; i3++)
            for (int64_t i2 = 0; i2 < ne[2]; i2++)
            for (int64_t i1 = 0; i1 < ne[1]; i1++)
            for (int64_t i0 = 0; i0 < ne[0]; i0++) {
                int32_t v = *(int32_t *)((char *)t->data + i3*nb[3] + i2*nb[2] + i1*nb[1] + i0*nb[0]);
                fwrite(&v, 4, 1, out_file);
            }
        }
    } else if (t->type == GGML_TYPE_F32 && ggml_is_contiguous(t)) {
        fwrite(t->data, 4, n, out_file);
    } else {
        float * tmp = malloc(n * 4);
        if (t->type == GGML_TYPE_F32) {
            // non-contiguous: walk strides
            const int64_t * ne = t->ne; const size_t * nb = t->nb;
            int64_t idx = 0;
            for (int64_t i3 = 0; i3 < ne[3]; i3++)
            for (int64_t i2 = 0; i2 < ne[2]; i2++)
            for (int64_t i1 = 0; i1 < ne[1]; i1++)
            for (int64_t i0 = 0; i0 < ne[0]; i0++)
                tmp[idx++] = *(float *)((char *)t->data + i3*nb[3] + i2*nb[2] + i1*nb[1] + i0*nb[0]);
        } else {
            const struct ggml_type_traits * tr = ggml_get_type_traits(t->type);
            tr->to_float(t->data, tmp, n);
        }
        fwrite(tmp, 4, n, out_file);
        free(tmp);
    }
    out_count++;
}

static struct ggml_context * ctx;
static const char * out_dir;

static void begin_case(const char * name) {
    char path[512];
    snprintf(path, sizeof(path), "%s/%s.bin", out_dir, name);
    out_file = fopen(path, "wb");
    if (!out_file) { perror(path); exit(1); }
    uint32_t placeholder = 0;
    fwrite(&placeholder, 4, 1, out_file);
    out_count = 0;
    struct ggml_init_params ip = { 512ull*1024*1024, NULL, false };
    ctx = ggml_init(ip);
    xs_state = 0x12345u;
}

static void run_and_end(struct ggml_tensor * result) {
    struct ggml_cgraph * gf = ggml_new_graph(ctx);
    ggml_build_forward_expand(gf, result);
    ggml_graph_compute_with_ctx(ctx, gf, 4);
    dump_tensor("__out__", result);
    fseek(out_file, 0, SEEK_SET);
    fwrite(&out_count, 4, 1, out_file);
    fclose(out_file);
    ggml_free(ctx);
}

// ---------------------------------------------------------------------------

static void case_rope(const char * name, int mode, int n_dims, float fb, float fs,
                      float ef, float af, float bf, float bs, int n_ctx_orig, int use_ff) {
    begin_case(name);
    const int hd = 64, nh = 4, np = 12, nb = 2;
    struct ggml_tensor * x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, hd, nh, np, nb);
    fill_f32(x, 1.0f);
    struct ggml_tensor * pos = ggml_new_tensor_1d(ctx, GGML_TYPE_I32, np);
    int32_t * pd = (int32_t *) pos->data;
    for (int i = 0; i < np; i++) pd[i] = 3 * i + 5;
    struct ggml_tensor * ff = NULL;
    if (use_ff) {
        ff = ggml_new_tensor_1d(ctx, GGML_TYPE_F32, n_dims/2);
        float * fd = (float *) ff->data;
        for (int i = 0; i < n_dims/2; i++) fd[i] = 1.0f + 0.1f*i;
    }
    dump_tensor("x", x);
    dump_tensor("pos", pos);
    if (ff) dump_tensor("freq_factors", ff);
    struct ggml_tensor * r = ggml_rope_ext(ctx, x, pos, ff, n_dims, mode, n_ctx_orig, fb, fs, ef, af, bf, bs);
    run_and_end(r);
}

static void case_rope_multi(const char * name, int mode, int n_dims, int sections[4],
                            float fb, float fs, float ef, float af, int n_ctx_orig) {
    // multi-section mRoPE / vision rope (ggml_rope_multi, include/ggml.h:1439-1463):
    // pos carries FOUR position streams (time/height/width/extra), 4*np entries
    begin_case(name);
    const int hd = 64, nh = 4, np = 12, nb = 2;
    struct ggml_tensor * x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, hd, nh, np, nb);
    fill_f32(x, 1.0f);
    struct ggml_tensor * pos = ggml_new_tensor_1d(ctx, GGML_TYPE_I32, 4 * np);
    int32_t * pd = (int32_t *) pos->data;
    for (int i = 0; i < 4 * np; i++) pd[i] = (7 * i + 3) % 29;
    dump_tensor("x", x);
    dump_tensor("pos", pos);
    struct ggml_tensor * r = ggml_rope_multi(ctx, x, pos, NULL, n_dims, sections,
                                             mode, n_ctx_orig, fb, fs, ef, af, 32.0f, 1.0f);
    run_and_end(r);
}

static void case_soft_max_ext(void) {
    begin_case("soft_max_ext");
    const int nkv = 24, nq = 8, nh = 8, nb = 2;
    struct ggml_tensor * x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, nkv, nq, nh, nb);
    fill_f32(x, 4.0f);
    struct ggml_tensor * mask = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, nkv, 16); // padded rows
    fill_f32(mask, 1.0f);
    dump_tensor("x", x);
    dump_tensor("mask", mask);
    run_and_end(ggml_soft_max_ext(ctx, x, mask, 0.5f, 8.0f));
}

static void case_norms(void) {
    begin_case("rms_norm");
    struct ggml_tensor * x = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 96, 5, 3);
    fill_f32(x, 2.0f);
    dump_tensor("x", x);
    run_and_end(ggml_rms_norm(ctx, x, 1e-6f));

    begin_case("norm");
    x = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 96, 5, 3);
    fill_f32(x, 2.0f);
    dump_tensor("x", x);
    run_and_end(ggml_norm(ctx, x, 1e-5f));

    begin_case("group_norm");
    x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 10, 6, 8, 2); // (W,H,C,N)
    fill_f32(x, 2.0f);
    dump_tensor("x", x);
    run_and_end(ggml_group_norm(ctx, x, 4, 1e-6f));
}

static void case_unary(const char * name, struct ggml_tensor * (*f)(struct ggml_context *, struct ggml_tensor *)) {
    begin_case(name);
    struct ggml_tensor * x = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 129, 7);
    fill_f32(x, 4.0f);
    dump_tensor("x", x);
    run_and_end(f(ctx, x));
}

static void case_mul_mat(void) {
    begin_case("mul_mat");
    struct ggml_tensor * a = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 32, 20, 2, 1); // weights (k=32, n=20)
    struct ggml_tensor * b = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 32, 6, 4, 3);  // (k=32, m=6) batches broadcast
    fill_f32(a, 1.0f); fill_f32(b, 1.0f);
    dump_tensor("a", a); dump_tensor("b", b);
    run_and_end(ggml_mul_mat(ctx, a, b));
}

static void case_mul_mat_id(void) {
    begin_case("mul_mat_id");
    const int k = 16, n = 8, n_expert = 4, n_used = 2, n_tok = 5;
    struct ggml_tensor * as = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, k, n, n_expert);
    struct ggml_tensor * b = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, k, n_used, n_tok);
    struct ggml_tensor * ids = ggml_new_tensor_2d(ctx, GGML_TYPE_I32, n_used, n_tok);
    fill_f32(as, 1.0f); fill_f32(b, 1.0f);
    int32_t * idd = (int32_t *) ids->data;
    for (int i = 0; i < n_used*n_tok; i++) idd[i] = (int32_t)(xorshift32() % n_expert);
    dump_tensor("as", as); dump_tensor("b", b); dump_tensor("ids", ids);
    run_and_end(ggml_mul_mat_id(ctx, as, b, ids));
}

static void case_out_prod(void) {
    begin_case("out_prod");
    struct ggml_tensor * a = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 12, 7); // ne (n=12, k=7)
    struct ggml_tensor * b = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 9, 7);  // ne (m=9, k=7)
    fill_f32(a, 1.0f); fill_f32(b, 1.0f);
    dump_tensor("a", a); dump_tensor("b", b);
    run_and_end(ggml_out_prod(ctx, a, b));
}

static void case_get_rows(void) {
    begin_case("get_rows");
    struct ggml_tensor * a = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 24, 10);
    struct ggml_tensor * ids = ggml_new_tensor_1d(ctx, GGML_TYPE_I32, 7);
    fill_f32(a, 1.0f);
    int32_t * idd = (int32_t *) ids->data;
    for (int i = 0; i < 7; i++) idd[i] = (int32_t)(xorshift32() % 10);
    dump_tensor("a", a); dump_tensor("ids", ids);
    run_and_end(ggml_get_rows(ctx, a, ids));
}

static void case_im2col(void) {
    begin_case("im2col_2d");
    struct ggml_tensor * w = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 3, 3, 5, 7); // kernel (KW,KH,Cin,Cout)
    struct ggml_tensor * x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 11, 9, 5, 2); // (W,H,C,N)
    fill_f32(w, 1.0f); fill_f32(x, 1.0f);
    dump_tensor("w", w); dump_tensor("x", x);
    run_and_end(ggml_im2col(ctx, w, x, 2, 1, 1, 2, 1, 1, true, GGML_TYPE_F32));

    begin_case("conv_2d");
    w = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 3, 3, 5, 7);
    x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 11, 9, 5, 2);
    fill_f32(w, 1.0f); fill_f32(x, 1.0f);
    dump_tensor("w", w); dump_tensor("x", x);
    run_and_end(ggml_conv_2d(ctx, w, x, 2, 1, 1, 2, 1, 1));

    begin_case("conv_1d");
    struct ggml_tensor * w16 = ggml_new_tensor_3d(ctx, GGML_TYPE_F16, 5, 4, 6); // (K, Cin, Cout)
    x = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 20, 4, 2); // (L, Cin, N)
    fill_f16(w16, 1.0f); fill_f32(x, 1.0f); w = w16;
    dump_tensor("w", w); dump_tensor("x", x);
    run_and_end(ggml_conv_1d(ctx, w, x, 2, 1, 1));

    begin_case("conv_transpose_1d");
    struct ggml_tensor * wt16 = ggml_new_tensor_3d(ctx, GGML_TYPE_F16, 4, 5, 3); // (K, Cout, Cin)
    x = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 12, 3, 1); // (L, Cin, N=1)
    fill_f16(wt16, 1.0f); fill_f32(x, 1.0f); w = wt16;
    dump_tensor("w", w); dump_tensor("x", x);
    run_and_end(ggml_conv_transpose_1d(ctx, w, x, 2, 0, 1));

    begin_case("conv_transpose_2d");
    w = ggml_new_tensor_4d(ctx, GGML_TYPE_F16, 3, 3, 4, 5); // (KW,KH,Cout,Cin) f16 required
    x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 8, 6, 5, 1);
    fill_f16(w, 1.0f); fill_f32(x, 1.0f);
    dump_tensor("w", w); dump_tensor("x", x);
    run_and_end(ggml_conv_transpose_2d_p0(ctx, w, x, 2));

    begin_case("pool_2d_avg");
    x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 10, 8, 3, 2);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_pool_2d(ctx, x, GGML_OP_POOL_AVG, 3, 3, 2, 2, 1, 1));

    begin_case("pool_2d_max");
    x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 10, 8, 3, 2);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_pool_2d(ctx, x, GGML_OP_POOL_MAX, 2, 2, 2, 2, 0, 0));

    begin_case("upscale");
    x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 6, 5, 3, 2);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_upscale(ctx, x, 3));
}

static void case_flash_attn(void) {
    begin_case("flash_attn_ext");
    const int d = 32, nq = 8, nkv = 32, nh = 4, nhkv = 2, nb = 2;
    struct ggml_tensor * q = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, d, nq, nh, nb);
    struct ggml_tensor * k = ggml_new_tensor_4d(ctx, GGML_TYPE_F16, d, nkv, nhkv, nb);
    struct ggml_tensor * v = ggml_new_tensor_4d(ctx, GGML_TYPE_F16, d, nkv, nhkv, nb);
    struct ggml_tensor * mask = ggml_new_tensor_2d(ctx, GGML_TYPE_F16, nkv, GGML_PAD(nq, 64));
    fill_f32(q, 1.0f); fill_f16(k, 1.0f); fill_f16(v, 1.0f); fill_f16(mask, 1.0f);
    dump_tensor("q", q); dump_tensor("k", k); dump_tensor("v", v); dump_tensor("mask", mask);
    run_and_end(ggml_flash_attn_ext(ctx, q, k, v, mask, 0.25f, 4.0f, 5.0f));
}

static void case_extra(void) {
    // indexed writes, reflect padding, ranges, top-k, counting, rel-pos add
    begin_case("acc");
    struct ggml_tensor * dst0 = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 16, 8);
    struct ggml_tensor * src0 = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 16, 3);
    fill_f32(dst0, 1.0f); fill_f32(src0, 1.0f);
    dump_tensor("a", dst0); dump_tensor("b", src0);
    run_and_end(ggml_acc(ctx, dst0, src0, dst0->nb[1], dst0->nb[2], dst0->nb[3], 2*dst0->nb[1]));

    begin_case("set");
    dst0 = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 16, 8);
    src0 = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 16, 3);
    fill_f32(dst0, 1.0f); fill_f32(src0, 1.0f);
    dump_tensor("a", dst0); dump_tensor("b", src0);
    run_and_end(ggml_set(ctx, dst0, src0, dst0->nb[1], dst0->nb[2], dst0->nb[3], 3*dst0->nb[1]));

    begin_case("pad_reflect_1d");
    struct ggml_tensor * x = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 11, 4);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_pad_reflect_1d(ctx, x, 3, 2));

    begin_case("arange");
    run_and_end(ggml_arange(ctx, 0.5f, 9.5f, 0.75f));

    begin_case("top_k");
    x = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 23, 3);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_top_k(ctx, x, 5));

    begin_case("count_equal");
    struct ggml_tensor * ia = ggml_new_tensor_2d(ctx, GGML_TYPE_I32, 10, 4);
    struct ggml_tensor * ib = ggml_new_tensor_2d(ctx, GGML_TYPE_I32, 10, 4);
    int32_t * pa = (int32_t *) ia->data;
    int32_t * pb = (int32_t *) ib->data;
    for (int i = 0; i < 40; i++) { pa[i] = i % 5; pb[i] = (i % 3 == 0) ? i % 5 : (i+1) % 5; }
    dump_tensor("a", ia); dump_tensor("b", ib);
    run_and_end(ggml_count_equal(ctx, ia, ib));

    begin_case("argmax");
    x = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 17, 6);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_argmax(ctx, x));

    begin_case("mean");
    x = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 29, 4);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_mean(ctx, x));

    begin_case("diag_mask_zero");
    x = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 10, 10, 2);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_diag_mask_zero(ctx, x, 1));

    begin_case("diag");
    x = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 9, 1, 3);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_diag(ctx, x));

    begin_case("add1");
    x = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 13, 4);
    struct ggml_tensor * one = ggml_new_tensor_1d(ctx, GGML_TYPE_F32, 1);
    fill_f32(x, 1.0f); fill_f32(one, 1.0f);
    dump_tensor("x", x); dump_tensor("b", one);
    run_and_end(ggml_add1(ctx, x, one));

    begin_case("soft_max_plain");
    x = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 31, 5);
    fill_f32(x, 2.0f);
    dump_tensor("x", x);
    run_and_end(ggml_soft_max(ctx, x));

    begin_case("add_rel_pos");
    struct ggml_tensor * attn = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 9, 9, 4); // (kh*kw, qh*qw, B*nh) ne order
    struct ggml_tensor * rw = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 3, 3, 3, 4);
    struct ggml_tensor * rh = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 3, 3, 3, 4);
    fill_f32(attn, 1.0f); fill_f32(rw, 1.0f); fill_f32(rh, 1.0f);
    dump_tensor("attn", attn); dump_tensor("rw", rw); dump_tensor("rh", rh);
    run_and_end(ggml_add_rel_pos(ctx, attn, rw, rh));
}

static void case_misc(void) {
    begin_case("argsort");
    struct ggml_tensor * x = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 37, 5);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_argsort(ctx, x, GGML_SORT_ORDER_DESC));

    begin_case("sum_rows");
    x = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 33, 4, 2);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_sum_rows(ctx, x));

    begin_case("diag_mask_inf");
    x = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 12, 12, 3);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_diag_mask_inf(ctx, x, 2));

    begin_case("timestep_embedding");
    x = ggml_new_tensor_1d(ctx, GGML_TYPE_F32, 6);
    float * xd = (float *) x->data;
    for (int i = 0; i < 6; i++) xd[i] = 100.0f * i + 0.5f;
    dump_tensor("x", x);
    run_and_end(ggml_timestep_embedding(ctx, x, 64, 10000));

    begin_case("cross_entropy_loss");
    x = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 30, 6);
    struct ggml_tensor * lbl = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 30, 6);
    fill_f32(x, 3.0f);
    float * ld = (float *) lbl->data;
    memset(ld, 0, 30*6*4);
    for (int r = 0; r < 6; r++) ld[r*30 + (r*5)%30] = 1.0f;
    dump_tensor("x", x); dump_tensor("labels", lbl);
    run_and_end(ggml_cross_entropy_loss(ctx, x, lbl));

    begin_case("ssm_conv");
    struct ggml_tensor * sx = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 9, 16, 2); // (n_t+d_conv-1, d_inner, n_s)
    struct ggml_tensor * c = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 4, 16);
    fill_f32(sx, 1.0f); fill_f32(c, 1.0f);
    dump_tensor("sx", sx); dump_tensor("c", c);
    run_and_end(ggml_ssm_conv(ctx, sx, c));

    begin_case("ssm_scan");
    const int d_state = 8, d_inner = 6, n_t = 5, n_s = 2;
    struct ggml_tensor * s = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, d_state, d_inner, n_s);
    struct ggml_tensor * sx2 = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, d_inner, n_t, n_s);
    struct ggml_tensor * dt = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, d_inner, n_t, n_s);
    struct ggml_tensor * A = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, d_state, d_inner);
    struct ggml_tensor * B = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, d_state, n_t, n_s);
    struct ggml_tensor * C = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, d_state, n_t, n_s);
    fill_f32(s, 0.5f); fill_f32(sx2, 1.0f); fill_f32(dt, 1.0f); fill_f32(A, 1.0f); fill_f32(B, 1.0f); fill_f32(C, 1.0f);
    dump_tensor("s", s); dump_tensor("x", sx2); dump_tensor("dt", dt);
    dump_tensor("A", A); dump_tensor("B", B); dump_tensor("C", C);
    run_and_end(ggml_ssm_scan(ctx, s, sx2, dt, A, B, C));

    begin_case("rwkv_wkv6");
    const int S = 8, H = 3, T = 4, B2 = 2; // T tokens per seq, B2 seqs stacked in time
    struct ggml_tensor * kk = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, S, H, T*B2);
    struct ggml_tensor * vv = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, S, H, T*B2);
    struct ggml_tensor * rr = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, S, H, T*B2);
    struct ggml_tensor * tf = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, S, H);
    struct ggml_tensor * td = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, S, H, T*B2);
    struct ggml_tensor * st = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, S*S*H, B2);
    fill_f32(kk, 1.0f); fill_f32(vv, 1.0f); fill_f32(rr, 1.0f); fill_f32(tf, 1.0f);
    fill_f32(td, 0.5f); fill_f32(st, 0.5f);
    dump_tensor("k", kk); dump_tensor("v", vv); dump_tensor("r", rr);
    dump_tensor("tf", tf); dump_tensor("td", td); dump_tensor("state", st);
    run_and_end(ggml_rwkv_wkv6(ctx, kk, vv, rr, tf, td, st));

    begin_case("gated_linear_attn");
    struct ggml_tensor * gk = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, S, H, T*B2);
    struct ggml_tensor * gv = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, S, H, T*B2);
    struct ggml_tensor * gq = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, S, H, T*B2);
    struct ggml_tensor * gg = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, S, H, T*B2);
    struct ggml_tensor * gs = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, S*S*H, B2);
    fill_f32(gk, 1.0f); fill_f32(gv, 1.0f); fill_f32(gq, 1.0f); fill_f32(gg, 0.5f); fill_f32(gs, 0.5f);
    dump_tensor("k", gk); dump_tensor("v", gv); dump_tensor("q", gq);
    dump_tensor("g", gg); dump_tensor("state", gs);
    run_and_end(ggml_gated_linear_attn(ctx, gk, gv, gq, gg, gs, 0.25f));

    begin_case("win_part");
    x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 16, 9, 11, 1); // (C, W, H, 1)
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_win_part(ctx, x, 4));

    begin_case("win_unpart");
    x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 16, 4, 4, 9); // windows from 9x11 w=4
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_win_unpart(ctx, x, 9, 11, 4));

    begin_case("get_rel_pos");
    struct ggml_tensor * x16 = ggml_new_tensor_2d(ctx, GGML_TYPE_F16, 8, 13); // (C, 2*max(qh,kh)-1)
    fill_f16(x16, 1.0f); x = x16;
    dump_tensor("x", x);
    run_and_end(ggml_get_rel_pos(ctx, x, 7, 7));

    begin_case("concat");
    x = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 8, 4, 3);
    struct ggml_tensor * y2 = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 8, 6, 3);
    fill_f32(x, 1.0f); fill_f32(y2, 1.0f);
    dump_tensor("a", x); dump_tensor("b", y2);
    run_and_end(ggml_concat(ctx, x, y2, 1));

    begin_case("pad");
    x = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 6, 4, 2);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_pad(ctx, x, 3, 2, 0, 0));

    begin_case("repeat");
    x = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 4, 3, 2);
    struct ggml_tensor * tgt = ggml_new_tensor_3d(ctx, GGML_TYPE_F32, 8, 6, 4);
    fill_f32(x, 1.0f);
    dump_tensor("x", x);
    run_and_end(ggml_repeat(ctx, x, tgt));

    begin_case("leaky_relu");
    x = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 40, 3);
    fill_f32(x, 2.0f);
    dump_tensor("x", x);
    run_and_end(ggml_leaky_relu(ctx, x, 0.1f, false));

    begin_case("scale");
    x = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 40, 3);
    fill_f32(x, 2.0f);
    dump_tensor("x", x);
    run_and_end(ggml_scale(ctx, x, -1.5f));

    begin_case("add_broadcast");
    x = ggml_new_tensor_4d(ctx, GGML_TYPE_F32, 8, 6, 4, 2);
    struct ggml_tensor * y3 = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 8, 1);
    fill_f32(x, 1.0f); fill_f32(y3, 1.0f);
    dump_tensor("a", x); dump_tensor("b", y3);
    run_and_end(ggml_add(ctx, x, y3));
}

int main(int argc, char ** argv) {
    out_dir = argc > 1 ? argv[1] : "tests/golden/ops";
    case_rope("rope_norm", 0, 32, 10000.0f, 1.0f, 0.0f, 1.0f, 32.0f, 1.0f, 0, 0);
    case_rope("rope_neox", GGML_ROPE_TYPE_NEOX, 64, 10000.0f, 1.0f, 0.0f, 1.0f, 32.0f, 1.0f, 0, 0);
    case_rope("rope_neox_yarn", GGML_ROPE_TYPE_NEOX, 64, 500000.0f, 0.25f, 1.0f, 1.2f, 32.0f, 1.0f, 2048, 0);
    case_rope("rope_norm_ff", 0, 64, 10000.0f, 0.5f, 0.7f, 1.1f, 32.0f, 1.5f, 4096, 1);
    {
        int sec_m[4] = {16, 8, 4, 4};   // sum = 32 = n_dims/2 (Qwen2-VL text shape)
        case_rope_multi("rope_mrope", GGML_ROPE_TYPE_MROPE, 64, sec_m,
                        10000.0f, 1.0f, 0.0f, 1.0f, 0);
        int sec_my[4] = {16, 8, 8, 0};
        case_rope_multi("rope_mrope_yarn", GGML_ROPE_TYPE_MROPE, 64, sec_my,
                        500000.0f, 0.25f, 1.0f, 1.2f, 2048);
        int sec_v[4] = {16, 16, 0, 0};  // vision: n_dims = head_dim/2
        case_rope_multi("rope_vision", GGML_ROPE_TYPE_VISION, 32, sec_v,
                        10000.0f, 1.0f, 0.0f, 1.0f, 0);
    }
    case_soft_max_ext();
    case_norms();
    case_unary("gelu", ggml_gelu);
    case_unary("gelu_quick", ggml_gelu_quick);
    case_unary("silu", ggml_silu);
    case_unary("tanh", ggml_tanh);
    case_unary("elu", ggml_elu);
    case_unary("relu", ggml_relu);
    case_unary("sigmoid", ggml_sigmoid);
    case_unary("hardswish", ggml_hardswish);
    case_unary("hardsigmoid", ggml_hardsigmoid);
    case_unary("exp", ggml_exp);
    case_unary("sqr", ggml_sqr);
    case_unary("abs", ggml_abs);
    case_unary("sgn", ggml_sgn);
    case_unary("step", ggml_step);
    case_unary("sin", ggml_sin);
    case_unary("cos", ggml_cos);
    case_mul_mat();
    case_mul_mat_id();
    case_out_prod();
    case_get_rows();
    case_im2col();
    case_flash_attn();
    case_misc();
    case_extra();
    printf("done\n");
    return 0;
}
