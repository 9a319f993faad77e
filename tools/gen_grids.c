// gen_grids.c — dump the i-quant codebook tables (constant data defined by the
// GGUF/ggml quantization formats) to raw binary files so they can be stored as
// .npy arrays. These tables are format-defining constants, like the fp16 bit
// layout — not code.
#define GGML_COMMON_DECL_C
#define GGML_COMMON_IMPL_C
#include "../.ref_build/_common_inc/ggml-common.h"
#include <stdio.h>

static void dump(const char * path, const void * data, size_t size) {
    FILE * f = fopen(path, "wb");
    fwrite(data, 1, size, f);
    fclose(f);
    printf("wrote %s (%zu bytes)\n", path, size);
}

int main(void) {
    dump("tests/golden/kmask_iq2xs.u8.bin",  kmask_iq2xs,  sizeof(kmask_iq2xs));
    dump("tests/golden/ksigns_iq2xs.u8.bin", ksigns_iq2xs, sizeof(ksigns_iq2xs));
    dump("tests/golden/iq2xxs_grid.u64.bin", iq2xxs_grid,  sizeof(iq2xxs_grid));
    dump("tests/golden/iq2xs_grid.u64.bin",  iq2xs_grid,   sizeof(iq2xs_grid));
    dump("tests/golden/iq2s_grid.u64.bin",   iq2s_grid,    sizeof(iq2s_grid));
    dump("tests/golden/iq3xxs_grid.u32.bin", iq3xxs_grid,  sizeof(iq3xxs_grid));
    dump("tests/golden/iq3s_grid.u32.bin",   iq3s_grid,    sizeof(iq3s_grid));
    dump("tests/golden/iq1s_grid.u64.bin",   iq1s_grid,    sizeof(iq1s_grid));
    return 0;
}
