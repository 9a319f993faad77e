// ref_gptj_eval.c — REFERENCE-side GPT-J half of the e2e parity gate.
//
// Same harness as ref_gpt2_eval.c but for the flagship GPT-J family: loads a
// GGUF written by tools/convert_hf_gptj.py through the reference library and
// evaluates the reference GPT-J graph (the op sequence of
// examples/gpt-j/main.cpp:421-585: interleaved rope on n_rot dims, parallel
// residual where attn and mlp both read the post-ln activations, biased
// untied lm head) on the reference CPU backend, dumping logits.
//
// Build: gcc tools/ref_gptj_eval.c -I /root/reference/include -L .ref_build/src \
//          -lggml -lggml-base -lggml-cpu -lm -Wl,-rpath,$PWD/.ref_build/src \
//          -o .ref_build/ref_gptj_eval
//
// Usage: ref_gptj_eval model.gguf out_logits.bin tok0 tok1 ...

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

    const int n_embd  = (int) kv_u32(g, "gptj.embedding_length");
    const int n_head  = (int) kv_u32(g, "gptj.attention.head_count");
    const int n_layer = (int) kv_u32(g, "gptj.block_count");
    const int n_vocab = (int) kv_u32(g, "gptj.vocab_size");
    const int n_rot   = (int) kv_u32(g, "gptj.rope.dimension_count");
    const int hd = n_embd / n_head;
    const float eps = 1e-5f;

    struct ggml_init_params ip = { 2ull*1024*1024*1024, NULL, false };
    struct ggml_context * ctx = ggml_init(ip);

    struct ggml_tensor * embd = ggml_new_tensor_1d(ctx, GGML_TYPE_I32, n);
    memcpy(embd->data, toks, n * sizeof(int32_t));
    struct ggml_tensor * pos = ggml_new_tensor_1d(ctx, GGML_TYPE_I32, n);
    for (int i = 0; i < n; i++) ((int32_t *) pos->data)[i] = i;

    struct ggml_tensor * inpL = ggml_get_rows(ctx, t(wctx, "token_embd.weight", 0), embd);

    for (int il = 0; il < n_layer; il++) {
        // ln_1 (the ONLY norm: attn and mlp both read it — parallel residual)
        struct ggml_tensor * sa = ggml_norm(ctx, inpL, eps);
        sa = ggml_add(ctx, ggml_mul(ctx, sa, t(wctx, "blk.%d.attn_norm.weight", il)),
                      t(wctx, "blk.%d.attn_norm.bias", il));

        // interleaved rope (mode 0) on the first n_rot dims of q/k
        struct ggml_tensor * Qc = ggml_rope(ctx,
            ggml_reshape_3d(ctx, ggml_mul_mat(ctx, t(wctx, "blk.%d.attn_q.weight", il), sa), hd, n_head, n),
            pos, n_rot, 0);
        struct ggml_tensor * Kc = ggml_rope(ctx,
            ggml_reshape_3d(ctx, ggml_mul_mat(ctx, t(wctx, "blk.%d.attn_k.weight", il), sa), hd, n_head, n),
            pos, n_rot, 0);
        struct ggml_tensor * Vc = ggml_mul_mat(ctx, t(wctx, "blk.%d.attn_v.weight", il), sa);

        struct ggml_tensor * Q = ggml_permute(ctx, Qc, 0, 2, 1, 3);
        struct ggml_tensor * K = ggml_permute(ctx, Kc, 0, 2, 1, 3);
        struct ggml_tensor * Vt = ggml_cont_3d(ctx,
            ggml_permute(ctx, ggml_reshape_3d(ctx, Vc, hd, n_head, n), 1, 2, 0, 3),
            n, hd, n_head);

        struct ggml_tensor * KQ = ggml_mul_mat(ctx, K, Q);
        KQ = ggml_scale(ctx, KQ, 1.0f / sqrtf((float) hd));
        KQ = ggml_diag_mask_inf(ctx, KQ, 0);
        KQ = ggml_soft_max(ctx, KQ);
        struct ggml_tensor * KQV = ggml_mul_mat(ctx, Vt, KQ);
        struct ggml_tensor * attn = ggml_cont_2d(ctx,
            ggml_permute(ctx, KQV, 0, 2, 1, 3), n_embd, n);
        attn = ggml_mul_mat(ctx, t(wctx, "blk.%d.attn_output.weight", il), attn);  // no bias

        // mlp reads the SAME post-ln activations (main.cpp:541 'pass inpSA')
        struct ggml_tensor * ff = ggml_mul_mat(ctx, t(wctx, "blk.%d.ffn_up.weight", il), sa);
        ff = ggml_add(ctx, ff, t(wctx, "blk.%d.ffn_up.bias", il));
        ff = ggml_gelu(ctx, ff);
        ff = ggml_mul_mat(ctx, t(wctx, "blk.%d.ffn_down.weight", il), ff);
        ff = ggml_add(ctx, ff, t(wctx, "blk.%d.ffn_down.bias", il));

        inpL = ggml_add(ctx, inpL, ggml_add(ctx, attn, ff));
    }

    inpL = ggml_norm(ctx, inpL, eps);
    inpL = ggml_add(ctx, ggml_mul(ctx, inpL, t(wctx, "output_norm.weight", 0)),
                    t(wctx, "output_norm.bias", 0));
    struct ggml_tensor * logits = ggml_mul_mat(ctx, t(wctx, "output.weight", 0), inpL);
    logits = ggml_add(ctx, logits, t(wctx, "output.bias", 0));

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
