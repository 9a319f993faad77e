// ref_gpt2_eval.c — REFERENCE-side half of the end-to-end parity gate.
//
// Loads a GGUF GPT-2 model through the reference library (src/gguf.cpp) and
// evaluates the reference GPT-2 forward graph (the op sequence of
// examples/gpt-2/main-backend.cpp:444-720, full-sequence, no KV cache) on the
// reference CPU backend, dumping per-position logits to a raw f32 file.
// tests/test_reference_e2e.py compares these logits (and the perplexity
// computed from them) against our full pipeline — GGUF load -> planar repack
// -> kernels -> logits — at F32, Q8_0 and Q4_K.  This is the ours-vs-
// reference-binary gate that the piecewise goldens cannot give.
//
// Build: gcc tools/ref_gpt2_eval.c -I /root/reference/include -L .ref_build/src \
//          -lggml -lggml-base -lggml-cpu -lm -Wl,-rpath,$PWD/.ref_build/src \
//          -o .ref_build/ref_gpt2_eval
//
// Usage: ref_gpt2_eval model.gguf out_logits.bin tok0 tok1 ...
//        (output: u32 n_tokens, u32 n_vocab, then n_tokens*n_vocab f32)

#include <math.h>
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "ggml.h"
#include "ggml-cpu.h"
#include "gguf.h"

static struct ggml_tensor * t(struct ggml_context * ctx, const char * fmt, int i) {
    char name[256];
    snprintf(name, sizeof(name), fmt, i);
    struct ggml_tensor * r = ggml_get_tensor(ctx, name);
    if (!r) { fprintf(stderr, "missing tensor %s\n", name); exit(1); }
    return r;
}

static uint32_t kv_u32(struct gguf_context * g, const char * key) {
    int64_t id = gguf_find_key(g, key);
    if (id < 0) { fprintf(stderr, "missing kv %s\n", key); exit(1); }
    return gguf_get_val_u32(g, id);
}

int main(int argc, char ** argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s model.gguf out.bin tok0 [tok1 ...]\n", argv[0]);
        return 1;
    }
    const int n = argc - 3;
    int32_t * toks = malloc(n * sizeof(int32_t));
    for (int i = 0; i < n; i++) toks[i] = atoi(argv[3 + i]);

    struct ggml_context * wctx = NULL;
    struct gguf_init_params gp = { /*no_alloc=*/false, /*ctx=*/&wctx };
    struct gguf_context * g = gguf_init_from_file(argv[1], gp);
    if (!g) { fprintf(stderr, "cannot load %s\n", argv[1]); return 1; }

    const int n_embd  = (int) kv_u32(g, "gpt2.embedding_length");
    const int n_head  = (int) kv_u32(g, "gpt2.attention.head_count");
    const int n_layer = (int) kv_u32(g, "gpt2.block_count");
    const int n_vocab = (int) kv_u32(g, "gpt2.vocab_size");
    const int hd = n_embd / n_head;
    const float eps = 1e-5f;

    struct ggml_init_params ip = { 2ull*1024*1024*1024, NULL, false };
    struct ggml_context * ctx = ggml_init(ip);

    struct ggml_tensor * embd = ggml_new_tensor_1d(ctx, GGML_TYPE_I32, n);
    memcpy(embd->data, toks, n * sizeof(int32_t));
    struct ggml_tensor * pos = ggml_new_tensor_1d(ctx, GGML_TYPE_I32, n);
    for (int i = 0; i < n; i++) ((int32_t *) pos->data)[i] = i;

    // token + position embeddings (main-backend.cpp:553-558)
    struct ggml_tensor * inpL = ggml_add(ctx,
        ggml_get_rows(ctx, t(wctx, "token_embd.weight", 0), embd),
        ggml_get_rows(ctx, t(wctx, "position_embd.weight", 0), pos));

    for (int il = 0; il < n_layer; il++) {
        // ln_1
        struct ggml_tensor * cur = ggml_norm(ctx, inpL, eps);
        cur = ggml_add(ctx, ggml_mul(ctx, cur, t(wctx, "blk.%d.attn_norm.weight", il)),
                       t(wctx, "blk.%d.attn_norm.bias", il));
        // fused qkv projection
        cur = ggml_mul_mat(ctx, t(wctx, "blk.%d.attn_qkv.weight", il), cur);
        cur = ggml_add(ctx, cur, t(wctx, "blk.%d.attn_qkv.bias", il));

        struct ggml_tensor * q = ggml_view_2d(ctx, cur, n_embd, n, cur->nb[1], 0 * n_embd * sizeof(float));
        struct ggml_tensor * k = ggml_view_2d(ctx, cur, n_embd, n, cur->nb[1], 1 * n_embd * sizeof(float));
        struct ggml_tensor * v = ggml_view_2d(ctx, cur, n_embd, n, cur->nb[1], 2 * n_embd * sizeof(float));

        // (hd, nh, n) -> permute -> (hd, n, nh)
        struct ggml_tensor * Q = ggml_permute(ctx,
            ggml_cont_3d(ctx, q, hd, n_head, n), 0, 2, 1, 3);
        struct ggml_tensor * K = ggml_permute(ctx,
            ggml_cont_3d(ctx, k, hd, n_head, n), 0, 2, 1, 3);
        // V transposed for the V @ att matmul: (n, hd, nh)
        struct ggml_tensor * Vt = ggml_cont_3d(ctx,
            ggml_permute(ctx, ggml_cont_3d(ctx, v, hd, n_head, n), 1, 2, 0, 3),
            n, hd, n_head);

        struct ggml_tensor * KQ = ggml_mul_mat(ctx, K, Q);  // (n, n, nh)
        KQ = ggml_scale(ctx, KQ, 1.0f / sqrtf((float) hd));
        KQ = ggml_diag_mask_inf(ctx, KQ, 0);
        KQ = ggml_soft_max(ctx, KQ);
        struct ggml_tensor * KQV = ggml_mul_mat(ctx, Vt, KQ);  // (hd, n, nh)
        // merge heads back: (hd, nh, n) -> (n_embd, n)
        cur = ggml_cont_2d(ctx, ggml_permute(ctx, KQV, 0, 2, 1, 3), n_embd, n);

        cur = ggml_mul_mat(ctx, t(wctx, "blk.%d.attn_output.weight", il), cur);
        cur = ggml_add(ctx, cur, t(wctx, "blk.%d.attn_output.bias", il));
        inpL = ggml_add(ctx, inpL, cur);

        // ln_2 + mlp
        cur = ggml_norm(ctx, inpL, eps);
        cur = ggml_add(ctx, ggml_mul(ctx, cur, t(wctx, "blk.%d.ffn_norm.weight", il)),
                       t(wctx, "blk.%d.ffn_norm.bias", il));
        cur = ggml_mul_mat(ctx, t(wctx, "blk.%d.ffn_up.weight", il), cur);
        cur = ggml_add(ctx, cur, t(wctx, "blk.%d.ffn_up.bias", il));
        cur = ggml_gelu(ctx, cur);
        cur = ggml_mul_mat(ctx, t(wctx, "blk.%d.ffn_down.weight", il), cur);
        cur = ggml_add(ctx, cur, t(wctx, "blk.%d.ffn_down.bias", il));
        inpL = ggml_add(ctx, inpL, cur);
    }

    // final norm + tied lm head
    inpL = ggml_norm(ctx, inpL, eps);
    inpL = ggml_add(ctx, ggml_mul(ctx, inpL, t(wctx, "output_norm.weight", 0)),
                    t(wctx, "output_norm.bias", 0));
    struct ggml_tensor * logits = ggml_mul_mat(ctx, t(wctx, "token_embd.weight", 0), inpL);

    struct ggml_cgraph * gf = ggml_new_graph_custom(ctx, 4096, false);
    ggml_build_forward_expand(gf, logits);
    if (ggml_graph_compute_with_ctx(ctx, gf, 4) != GGML_STATUS_SUCCESS) {
        fprintf(stderr, "graph compute failed\n");
        return 1;
    }

    FILE * f = fopen(argv[2], "wb");
    if (!f) { perror(argv[2]); return 1; }
    uint32_t nn = n, nv = n_vocab;
    fwrite(&nn, 4, 1, f);
    fwrite(&nv, 4, 1, f);
    fwrite(logits->data, sizeof(float), (size_t) n * n_vocab, f);
    fclose(f);
    fprintf(stderr, "wrote %d x %d logits\n", n, n_vocab);
    return 0;
}
