// gen_golden.c — generate golden quantization vectors from the reference ggml
// library for differential testing of our TPU-native reimplementation.
//
// For each quantized dtype we:
//   1. generate a deterministic float32 input (xorshift32 PRNG, reproduced in
//      Python by tests/golden_gen.py check),
//   2. quantize it with ggml_quantize_chunk (reference implementation),
//   3. dequantize with the type traits' to_float,
//   4. write <name>.bin: [int64 n_elems][int64 n_bytes][quant bytes][dequant f32s]
//
// Build:  gcc tools/gen_golden.c -I reference/include -L .ref_build/src -lggml -lggml-base -o gen_golden
// This file is a *test fixture generator*; no reference code is copied.

#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include "ggml.h"

static uint32_t xs_state;
static uint32_t xorshift32(void) {
    uint32_t x = xs_state;
    x ^= x << 13; x ^= x >> 17; x ^= x << 5;
    xs_state = x;
    return x;
}

// deterministic test signal: roughly normal-ish values in [-4, 4]
static void fill_input(float * dst, int64_t n, uint32_t seed) {
    xs_state = seed;
    for (int64_t i = 0; i < n; i++) {
        // uniform in [0,1)
        float u = (float)(xorshift32() >> 8) / 16777216.0f;
        dst[i] = (u - 0.5f) * 8.0f;
    }
}

static int dump_type(enum ggml_type type, const char * name, const char * outdir,
                     int64_t nrow, int64_t n_per_row, int use_imatrix) {
    const int64_t n = nrow * n_per_row;
    float * src = malloc(n * sizeof(float));
    fill_input(src, n, 0xC0FFEE42u + (uint32_t)type);

    float * imatrix = NULL;
    if (use_imatrix) {
        imatrix = malloc(n_per_row * sizeof(float));
        // deterministic positive importance weights
        xs_state = 0xABCD1234u;
        for (int64_t i = 0; i < n_per_row; i++) {
            imatrix[i] = 0.5f + (float)(xorshift32() >> 8) / 16777216.0f;
        }
    }

    const size_t row_sz = ggml_row_size(type, n_per_row);
    const size_t qsize  = row_sz * nrow;
    uint8_t * qbuf = malloc(qsize);
    memset(qbuf, 0, qsize);

    size_t written = ggml_quantize_chunk(type, src, qbuf, 0, nrow, n_per_row, imatrix);
    if (written != qsize) {
        fprintf(stderr, "size mismatch for %s: %zu vs %zu\n", name, written, qsize);
        return 1;
    }

    float * deq = malloc(n * sizeof(float));
    const struct ggml_type_traits * traits = ggml_get_type_traits(type);
    traits->to_float(qbuf, deq, n);

    char path[512];
    snprintf(path, sizeof(path), "%s/%s.bin", outdir, name);
    FILE * f = fopen(path, "wb");
    if (!f) { perror(path); return 1; }
    int64_t hdr[4] = { n, (int64_t)qsize, nrow, n_per_row };
    fwrite(hdr, sizeof(int64_t), 4, f);
    fwrite(src, sizeof(float), n, f);
    fwrite(qbuf, 1, qsize, f);
    fwrite(deq, sizeof(float), n, f);
    if (imatrix) fwrite(imatrix, sizeof(float), n_per_row, f);
    fclose(f);

    free(src); free(qbuf); free(deq); if (imatrix) free(imatrix);
    printf("wrote %s (n=%lld qsize=%lld)\n", path, (long long)n, (long long)qsize);
    return 0;
}

int main(int argc, char ** argv) {
    const char * outdir = argc > 1 ? argv[1] : "tests/golden";
    // ggml_init populates the fp16->fp32 lookup table used by dequantizers
    struct ggml_init_params ip = { 1024, NULL, true };
    ggml_free(ggml_init(ip));
    ggml_quantize_init(GGML_TYPE_IQ2_XXS);
    ggml_quantize_init(GGML_TYPE_IQ2_XS);
    ggml_quantize_init(GGML_TYPE_IQ2_S);
    ggml_quantize_init(GGML_TYPE_IQ3_XXS);
    ggml_quantize_init(GGML_TYPE_IQ3_S);
    ggml_quantize_init(GGML_TYPE_IQ1_S);
    ggml_quantize_init(GGML_TYPE_IQ1_M);

    int rc = 0;
    // simple 32-elem block types: 4 rows x 512
    rc |= dump_type(GGML_TYPE_Q4_0, "q4_0", outdir, 4, 512, 0);
    rc |= dump_type(GGML_TYPE_Q4_1, "q4_1", outdir, 4, 512, 0);
    rc |= dump_type(GGML_TYPE_Q5_0, "q5_0", outdir, 4, 512, 0);
    rc |= dump_type(GGML_TYPE_Q5_1, "q5_1", outdir, 4, 512, 0);
    rc |= dump_type(GGML_TYPE_Q8_0, "q8_0", outdir, 4, 512, 0);
    // K-quants: 256-elem superblocks: 4 rows x 1024
    rc |= dump_type(GGML_TYPE_Q2_K, "q2_k", outdir, 4, 1024, 0);
    rc |= dump_type(GGML_TYPE_Q3_K, "q3_k", outdir, 4, 1024, 0);
    rc |= dump_type(GGML_TYPE_Q4_K, "q4_k", outdir, 4, 1024, 0);
    rc |= dump_type(GGML_TYPE_Q5_K, "q5_k", outdir, 4, 1024, 0);
    rc |= dump_type(GGML_TYPE_Q6_K, "q6_k", outdir, 4, 1024, 0);
    // ternary
    rc |= dump_type(GGML_TYPE_TQ1_0, "tq1_0", outdir, 4, 1024, 0);
    rc |= dump_type(GGML_TYPE_TQ2_0, "tq2_0", outdir, 4, 1024, 0);
    // i-quants (no imatrix needed)
    rc |= dump_type(GGML_TYPE_IQ4_NL, "iq4_nl", outdir, 4, 512, 0);
    rc |= dump_type(GGML_TYPE_IQ4_XS, "iq4_xs", outdir, 4, 1024, 0);
    rc |= dump_type(GGML_TYPE_IQ3_XXS, "iq3_xxs", outdir, 4, 1024, 0);
    rc |= dump_type(GGML_TYPE_IQ3_S, "iq3_s", outdir, 4, 1024, 0);
    rc |= dump_type(GGML_TYPE_IQ2_XXS, "iq2_xxs", outdir, 4, 1024, 1);
    rc |= dump_type(GGML_TYPE_IQ2_XS, "iq2_xs", outdir, 4, 1024, 1);
    // imatrix-required i-quants
    rc |= dump_type(GGML_TYPE_IQ2_S, "iq2_s", outdir, 4, 1024, 1);
    rc |= dump_type(GGML_TYPE_IQ1_S, "iq1_s", outdir, 4, 1024, 1);
    rc |= dump_type(GGML_TYPE_IQ1_M, "iq1_m", outdir, 4, 1024, 1);
    // f16 / bf16 casts
    rc |= dump_type(GGML_TYPE_F16, "f16", outdir, 4, 512, 0);
    rc |= dump_type(GGML_TYPE_BF16, "bf16", outdir, 4, 512, 0);
    // imatrix-weighted quantization paths (quantize_<T> with quant_weights)
    rc |= dump_type(GGML_TYPE_Q4_0, "q4_0_imat", outdir, 4, 512, 1);
    rc |= dump_type(GGML_TYPE_Q4_1, "q4_1_imat", outdir, 4, 512, 1);
    rc |= dump_type(GGML_TYPE_Q5_0, "q5_0_imat", outdir, 4, 512, 1);
    rc |= dump_type(GGML_TYPE_Q5_1, "q5_1_imat", outdir, 4, 512, 1);
    rc |= dump_type(GGML_TYPE_Q2_K, "q2_k_imat", outdir, 4, 1024, 1);
    rc |= dump_type(GGML_TYPE_Q3_K, "q3_k_imat", outdir, 4, 1024, 1);
    rc |= dump_type(GGML_TYPE_Q4_K, "q4_k_imat", outdir, 4, 1024, 1);
    rc |= dump_type(GGML_TYPE_Q5_K, "q5_k_imat", outdir, 4, 1024, 1);
    rc |= dump_type(GGML_TYPE_Q6_K, "q6_k_imat", outdir, 4, 1024, 1);
    rc |= dump_type(GGML_TYPE_IQ4_NL, "iq4_nl_imat", outdir, 4, 512, 1);
    rc |= dump_type(GGML_TYPE_IQ4_XS, "iq4_xs_imat", outdir, 4, 1024, 1);
    rc |= dump_type(GGML_TYPE_IQ3_XXS, "iq3_xxs_imat", outdir, 4, 1024, 1);
    rc |= dump_type(GGML_TYPE_IQ3_S, "iq3_s_imat", outdir, 4, 1024, 1);
    // unweighted variants of the optional-imatrix grid quants
    rc |= dump_type(GGML_TYPE_IQ2_S, "iq2_s_noimat", outdir, 4, 1024, 0);
    rc |= dump_type(GGML_TYPE_IQ1_M, "iq1_m_noimat", outdir, 4, 1024, 0);
    return rc;
}
