// gguf_roundtrip.c — differential test fixture for our GGUF implementation.
// mode "write": create a sample GGUF via the reference library.
// mode "read <path>": parse a GGUF with the reference parser, dump a summary.
#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include "ggml.h"
#include "gguf.h"

int main(int argc, char ** argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s write|read <path>\n", argv[0]); return 1; }
    if (strcmp(argv[1], "write") == 0) {
        struct gguf_context * g = gguf_init_empty();
        gguf_set_val_u32 (g, "test.u32", 42);
        gguf_set_val_f32 (g, "test.f32", 2.5f);
        gguf_set_val_str (g, "test.str", "hello gguf");
        gguf_set_val_bool(g, "test.bool", true);
        gguf_set_val_i64 (g, "test.i64", -123456789012345LL);
        int32_t arr[4] = {1, -2, 3, -4};
        gguf_set_arr_data(g, "test.arr_i32", GGUF_TYPE_INT32, arr, 4);
        const char * strs[2] = {"alpha", "beta"};
        gguf_set_arr_str(g, "test.arr_str", strs, 2);

        struct ggml_init_params ip = { 1024*1024*64, NULL, false };
        struct ggml_context * ctx = ggml_init(ip);
        struct ggml_tensor * a = ggml_new_tensor_2d(ctx, GGML_TYPE_F32, 64, 8);
        ggml_set_name(a, "weight_f32");
        float * ad = (float *) a->data;
        for (int i = 0; i < 64*8; i++) ad[i] = 0.01f*i - 2.0f;
        struct ggml_tensor * b = ggml_new_tensor_2d(ctx, GGML_TYPE_Q8_0, 512, 4);
        ggml_set_name(b, "weight_q8_0");
        float tmp[512*4];
        for (int i = 0; i < 512*4; i++) tmp[i] = 0.1f + 2.0f*cosf(i*1.0f);
        ggml_quantize_chunk(GGML_TYPE_Q8_0, tmp, b->data, 0, 4, 512, NULL);
        struct ggml_tensor * c = ggml_new_tensor_2d(ctx, GGML_TYPE_Q4_K, 1024, 2);
        ggml_set_name(c, "weight_q4_k");
        float tmp2[1024*2];
        for (int i = 0; i < 1024*2; i++) tmp2[i] = 0.1f + 2.0f*cosf(i*0.7f);
        ggml_quantize_chunk(GGML_TYPE_Q4_K, tmp2, c->data, 0, 2, 1024, NULL);
        gguf_add_tensor(g, a);
        gguf_add_tensor(g, b);
        gguf_add_tensor(g, c);
        bool ok = gguf_write_to_file(g, argv[2], false);
        printf("write %s: %s\n", argv[2], ok ? "ok" : "FAILED");
        gguf_free(g);
        ggml_free(ctx);
        return ok ? 0 : 1;
    }
    // read mode: print a parse summary our Python test compares against
    struct gguf_init_params gp = { true, NULL };
    struct gguf_context * g = gguf_init_from_file(argv[2], gp);
    if (!g) { printf("PARSE_FAILED\n"); return 1; }
    printf("version=%u alignment=%zu n_kv=%lld n_tensors=%lld\n",
           gguf_get_version(g), gguf_get_alignment(g),
           (long long)gguf_get_n_kv(g), (long long)gguf_get_n_tensors(g));
    for (int64_t i = 0; i < gguf_get_n_kv(g); i++) {
        printf("kv %s type=%d\n", gguf_get_key(g, i), (int)gguf_get_kv_type(g, i));
    }
    for (int64_t i = 0; i < gguf_get_n_tensors(g); i++) {
        printf("tensor %s type=%d offset=%zu size=%zu\n",
               gguf_get_tensor_name(g, i), (int)gguf_get_tensor_type(g, i),
               gguf_get_tensor_offset(g, i), gguf_get_tensor_size(g, i));
    }
    gguf_free(g);
    return 0;
}
