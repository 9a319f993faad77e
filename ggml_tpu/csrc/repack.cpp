// Native planar repack: ggml block formats -> TPU planar layout.
//
// The runtime-side analog of ggml's native weight repackers
// (reference: src/ggml-cpu/ggml-cpu-aarch64.cpp:43-72 repack to NEON layouts,
// src/ggml-cpu/amx/amx.cpp:25-68 repack to AMX tiles) — here a multithreaded
// C++ path that turns raw GGUF tensor bytes into the code/scale planes
// consumed by the Pallas kernels (layouts defined in ggml_tpu/quant/planar.py,
// bit semantics from src/ggml-common.h block structs).
//
// Exposed as a plain C ABI for ctypes. Output layouts (must match planar.py):
//   q4 kind: codes uint8 (K/2, Npad)  byte(c,n) = q[c,n] | q[c+K/2,n]<<4
//            scales f32 (2, K/2/G, Npad)  plane-major
//   q8 kind: codes int8 (K, Npad), scales f32 (K/G, Npad)
//   offsets f32 (K/G, Npad) natural order, or null
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread repack.cpp -o libggml_tpu_repack.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>

namespace {

// ---- fp16 -> fp32 (scalar, table-free) ------------------------------------
static inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; --exp; }
            man &= 0x3FF;
            bits = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

static inline uint16_t rd16(const uint8_t* p) { uint16_t v; std::memcpy(&v, p, 2); return v; }
static inline uint32_t rd32(const uint8_t* p) { uint32_t v; std::memcpy(&v, p, 4); return v; }

// Per-row decode context: writes q codes (int16), per-group scale/offset for
// one row of K elements in natural order.
struct RowOut {
    int16_t* q;     // K
    float* s;       // K/G
    float* o;       // K/G or null
};

// ---- Q8_0: 32-elem blocks {f16 d; int8 qs[32]} (src/ggml-common.h:203) -----
static void row_q8_0(const uint8_t* src, int64_t k, RowOut out) {
    const int64_t nb = k / 32;
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = src + b * 34;
        out.s[b] = f16_to_f32(rd16(blk));
        const int8_t* qs = (const int8_t*)(blk + 2);
        for (int j = 0; j < 32; ++j) out.q[b * 32 + j] = qs[j];
    }
}

// ---- Q4_0: {f16 d; u8 qs[16]} (src/ggml-common.h:161) ----------------------
static void row_q4_0(const uint8_t* src, int64_t k, RowOut out) {
    const int64_t nb = k / 32;
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = src + b * 18;
        float d = f16_to_f32(rd16(blk));
        out.s[b] = d;
        out.o[b] = -8.0f * d;
        const uint8_t* qs = blk + 2;
        for (int j = 0; j < 16; ++j) {
            out.q[b * 32 + j] = qs[j] & 0xF;
            out.q[b * 32 + 16 + j] = qs[j] >> 4;
        }
    }
}

// ---- Q4_1: {f16 d; f16 m; u8 qs[16]} ---------------------------------------
static void row_q4_1(const uint8_t* src, int64_t k, RowOut out) {
    const int64_t nb = k / 32;
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = src + b * 20;
        out.s[b] = f16_to_f32(rd16(blk));
        out.o[b] = f16_to_f32(rd16(blk + 2));
        const uint8_t* qs = blk + 4;
        for (int j = 0; j < 16; ++j) {
            out.q[b * 32 + j] = qs[j] & 0xF;
            out.q[b * 32 + 16 + j] = qs[j] >> 4;
        }
    }
}

// ---- Q4_K: 256-superblock {f16 d,dmin; u8 scales[12]; u8 qs[128]}
//      (src/ggml-common.h:279-290; 6-bit scale decode = get_scale_min_k4) ----
static inline void k4_scale_min(const uint8_t* sc, int j, uint8_t* d, uint8_t* m) {
    if (j < 4) {
        *d = sc[j] & 63;
        *m = sc[j + 4] & 63;
    } else {
        *d = (sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4);
        *m = (sc[j + 4] >> 4) | ((sc[j] >> 6) << 4);
    }
}

static void row_q4_k(const uint8_t* src, int64_t k, RowOut out) {
    const int64_t nsb = k / 256;
    for (int64_t sb = 0; sb < nsb; ++sb) {
        const uint8_t* blk = src + sb * 144;
        float d = f16_to_f32(rd16(blk));
        float dmin = f16_to_f32(rd16(blk + 2));
        const uint8_t* scales = blk + 4;
        const uint8_t* qs = blk + 16;
        for (int j = 0; j < 8; ++j) {  // 8 groups of 32
            uint8_t sc, mn;
            k4_scale_min(scales, j, &sc, &mn);
            out.s[sb * 8 + j] = d * sc;
            out.o[sb * 8 + j] = -dmin * mn;
        }
        // elements: per 64-chunk, 32 bytes: low nibbles = elems 0-31, high = 32-63
        for (int c = 0; c < 4; ++c) {
            const uint8_t* q64 = qs + c * 32;
            int16_t* dst = out.q + sb * 256 + c * 64;
            for (int j = 0; j < 32; ++j) {
                dst[j] = q64[j] & 0xF;
                dst[32 + j] = q64[j] >> 4;
            }
        }
    }
}

// ---- Q5_K: {f16 d,dmin; u8 scales[12]; u8 qh[32]; u8 qs[128]} --------------
static void row_q5_k(const uint8_t* src, int64_t k, RowOut out) {
    const int64_t nsb = k / 256;
    for (int64_t sb = 0; sb < nsb; ++sb) {
        const uint8_t* blk = src + sb * 176;
        float d = f16_to_f32(rd16(blk));
        float dmin = f16_to_f32(rd16(blk + 2));
        const uint8_t* scales = blk + 4;
        const uint8_t* qh = blk + 16;
        const uint8_t* qs = blk + 48;
        for (int j = 0; j < 8; ++j) {
            uint8_t sc, mn;
            k4_scale_min(scales, j, &sc, &mn);
            out.s[sb * 8 + j] = d * sc;
            out.o[sb * 8 + j] = -dmin * mn;
        }
        for (int e = 0; e < 256; ++e) {
            int qidx = 32 * (e / 64) + (e % 32);
            int nib = (e % 64) / 32;
            int lo = nib == 0 ? (qs[qidx] & 0xF) : (qs[qidx] >> 4);
            int is = 2 * (e / 64) + (e % 64) / 32;
            int hi = ((qh[e % 32] >> is) & 1) << 4;
            out.q[sb * 256 + e] = (int16_t)(lo + hi);
        }
    }
}

// ---- Q6_K: {u8 ql[128]; u8 qh[64]; i8 scales[16]; f16 d} -------------------
static void row_q6_k(const uint8_t* src, int64_t k, RowOut out) {
    const int64_t nsb = k / 256;
    for (int64_t sb = 0; sb < nsb; ++sb) {
        const uint8_t* blk = src + sb * 210;
        const uint8_t* ql = blk;
        const uint8_t* qh = blk + 128;
        const int8_t* scales = (const int8_t*)(blk + 192);
        float d = f16_to_f32(rd16(blk + 208));
        for (int j = 0; j < 16; ++j) out.s[sb * 16 + j] = d * scales[j];
        for (int e = 0; e < 256; ++e) {
            int half = e / 128, r = e % 128, quad = r / 32, l = r % 32;
            int qli = 64 * half + 32 * (quad % 2) + l;
            int lo = (quad / 2) == 0 ? (ql[qli] & 0xF) : (ql[qli] >> 4);
            int hi = ((qh[32 * half + l] >> (2 * quad)) & 3) << 4;
            out.q[sb * 256 + e] = (int16_t)((lo | hi) - 32);
        }
    }
}

// ---- Q5_0: {f16 d; u32 qh; u8 qs[16]} --------------------------------------
static void row_q5_0(const uint8_t* src, int64_t k, RowOut out) {
    const int64_t nb = k / 32;
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = src + b * 22;
        out.s[b] = f16_to_f32(rd16(blk));
        uint32_t qh = rd32(blk + 2);
        const uint8_t* qs = blk + 6;
        for (int j = 0; j < 16; ++j) {
            int lo = qs[j] & 0xF, hi = qs[j] >> 4;
            int b0 = ((qh >> j) << 4) & 0x10;
            int b1 = (qh >> (j + 12)) & 0x10;
            out.q[b * 32 + j] = (int16_t)((lo | b0) - 16);
            out.q[b * 32 + 16 + j] = (int16_t)((hi | b1) - 16);
        }
    }
}

// ---- Q5_1: {f16 d; f16 m; u32 qh; u8 qs[16]} -------------------------------
static void row_q5_1(const uint8_t* src, int64_t k, RowOut out) {
    const int64_t nb = k / 32;
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = src + b * 24;
        out.s[b] = f16_to_f32(rd16(blk));
        out.o[b] = f16_to_f32(rd16(blk + 2));
        uint32_t qh = rd32(blk + 4);
        const uint8_t* qs = blk + 8;
        for (int j = 0; j < 16; ++j) {
            int lo = qs[j] & 0xF, hi = qs[j] >> 4;
            int b0 = ((qh >> j) << 4) & 0x10;
            int b1 = (qh >> (j + 12)) & 0x10;
            out.q[b * 32 + j] = (int16_t)(lo | b0);
            out.q[b * 32 + 16 + j] = (int16_t)(hi | b1);
        }
    }
}

// ---- Q2_K: {u8 scales[16]; u8 qs[64]; f16 d; f16 dmin} ---------------------
static void row_q2_k(const uint8_t* src, int64_t k, RowOut out) {
    const int64_t nsb = k / 256;
    for (int64_t sb = 0; sb < nsb; ++sb) {
        const uint8_t* blk = src + sb * 84;
        const uint8_t* scales = blk;
        const uint8_t* qs = blk + 16;
        float d = f16_to_f32(rd16(blk + 80));
        float dmin = f16_to_f32(rd16(blk + 82));
        for (int g = 0; g < 16; ++g) {
            out.s[sb * 16 + g] = d * (scales[g] & 0xF);
            out.o[sb * 16 + g] = -dmin * (scales[g] >> 4);
        }
        for (int e = 0; e < 256; ++e) {
            int g = e / 16, l = e % 16;
            int qidx = 32 * (g / 8) + 16 * (g % 2) + l;
            int shift = 2 * ((g % 8) / 2);
            out.q[sb * 256 + e] = (int16_t)((qs[qidx] >> shift) & 3);
        }
    }
}

// ---- Q3_K: {u8 hmask[32]; u8 qs[64]; u8 scales[12]; f16 d} -----------------
static void row_q3_k(const uint8_t* src, int64_t k, RowOut out) {
    const int64_t nsb = k / 256;
    for (int64_t sb = 0; sb < nsb; ++sb) {
        const uint8_t* blk = src + sb * 110;
        const uint8_t* hmask = blk;
        const uint8_t* qs = blk + 32;
        const uint8_t* scales = blk + 96;
        float d = f16_to_f32(rd16(blk + 108));
        for (int j = 0; j < 16; ++j) {  // 6-bit scales - 32 (kmask decode)
            int lo = j < 8 ? (scales[j] & 0xF) : (scales[j - 8] >> 4);
            int hi = (scales[8 + j % 4] >> (2 * (j / 4))) & 3;
            int sc = (lo | (hi << 4)) - 32;
            float s = d * sc;
            out.s[sb * 16 + j] = s;
            out.o[sb * 16 + j] = -4.0f * s;
        }
        for (int e = 0; e < 256; ++e) {
            int g = e / 16, l = e % 16;
            int qidx = 32 * (g / 8) + 16 * (g % 2) + l;
            int shift = 2 * ((g % 8) / 2);
            int mbit = g / 2;
            int hidx = 16 * (g % 2) + l;
            int hm = (hmask[hidx] >> mbit) & 1;
            int v = ((qs[qidx] >> shift) & 3) - (hm ? 0 : 4);
            out.q[sb * 256 + e] = (int16_t)(v + 4);  // store code in [0, 7]
        }
    }
}

// ---- other types fall back to Python ---------------------------------------

typedef void (*row_fn)(const uint8_t*, int64_t, RowOut);

struct TypeInfo {
    row_fn fn;
    int type_size;   // bytes per block
    int block;       // elements per block
    int group;       // scale group G
    bool affine;     // has offsets
    bool q4;         // codes fit unsigned 4-bit
};

static bool type_info(int ggml_type, TypeInfo* ti) {
    switch (ggml_type) {
        case 2:  *ti = {row_q4_0, 18, 32, 32, true, true};  return true;  // Q4_0
        case 3:  *ti = {row_q4_1, 20, 32, 32, true, true};  return true;  // Q4_1
        case 6:  *ti = {row_q5_0, 22, 32, 32, false, false}; return true; // Q5_0
        case 7:  *ti = {row_q5_1, 24, 32, 32, true, false}; return true;  // Q5_1
        case 8:  *ti = {row_q8_0, 34, 32, 32, false, false}; return true; // Q8_0
        case 10: *ti = {row_q2_k, 84, 256, 16, true, true}; return true;  // Q2_K
        case 11: *ti = {row_q3_k, 110, 256, 16, true, true}; return true; // Q3_K
        case 12: *ti = {row_q4_k, 144, 256, 32, true, true}; return true; // Q4_K
        case 13: *ti = {row_q5_k, 176, 256, 32, true, false}; return true; // Q5_K
        case 14: *ti = {row_q6_k, 210, 256, 16, false, false}; return true; // Q6_K
        default: return false;
    }
}

}  // namespace

extern "C" {

// Returns 1 if the type is supported by the native repacker.
int gt_repack_supported(int ggml_type) {
    TypeInfo ti;
    return type_info(ggml_type, &ti) ? 1 : 0;
}

// Repack raw bytes of an (N, K) ggml-quantized weight into planar layout.
//   raw:     n * (k/block) * type_size bytes, row-major rows
//   codes:   q4: (k/2, npad) uint8 | q8: (k, npad) int8
//   scales:  (k/group, npad) f32 — for q4 callers view it as (2, k/2/group, npad)
//   offsets: (k/group, npad) f32 or null (must be non-null for affine types)
// Returns 0 on success.
int gt_repack(int ggml_type, const uint8_t* raw, int64_t n, int64_t k,
              int64_t npad, uint8_t* codes, float* scales, float* offsets,
              int nthreads, int force_q8) {
    TypeInfo ti;
    if (!type_info(ggml_type, &ti)) return 1;
    if (force_q8) ti.q4 = false;  // int8 codes for the MXU GEMV path
    if (k % ti.block) return 2;
    if (ti.affine && !offsets) return 3;
    const int64_t row_bytes = (k / ti.block) * ti.type_size;
    const int64_t sg = k / ti.group;       // scale rows per source row
    const int64_t k2 = k / 2;

    if (nthreads < 1) nthreads = 1;
    std::vector<std::thread> threads;
    auto work = [&](int64_t n0, int64_t n1) {
        std::vector<int16_t> q(k);
        std::vector<float> s(sg), o(ti.affine ? sg : 0);
        for (int64_t row = n0; row < n1; ++row) {
            RowOut out{q.data(), s.data(), ti.affine ? o.data() : nullptr};
            ti.fn(raw + row * row_bytes, k, out);
            // scatter into K-major planes (strided by npad)
            if (ti.q4) {
                for (int64_t c = 0; c < k2; ++c) {
                    codes[c * npad + row] =
                        (uint8_t)((q[c] & 0xF) | ((q[c + k2] & 0xF) << 4));
                }
            } else {
                int8_t* c8 = (int8_t*)codes;
                for (int64_t c = 0; c < k; ++c) c8[c * npad + row] = (int8_t)q[c];
            }
            for (int64_t g = 0; g < sg; ++g) scales[g * npad + row] = s[g];
            if (ti.affine)
                for (int64_t g = 0; g < sg; ++g) offsets[g * npad + row] = o[g];
        }
    };
    const int64_t chunk = (n + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
        int64_t n0 = t * chunk, n1 = n0 + chunk > n ? n : n0 + chunk;
        if (n0 >= n1) break;
        threads.emplace_back(work, n0, n1);
    }
    for (auto& th : threads) th.join();

    // zero the N padding
    if (npad > n) {
        const int64_t code_rows = ti.q4 ? k2 : k;
        for (int64_t c = 0; c < code_rows; ++c)
            std::memset(codes + c * npad + n, 0, npad - n);
        for (int64_t g = 0; g < sg; ++g) {
            std::memset(scales + g * npad + n, 0, (npad - n) * 4);
            if (ti.affine) std::memset(offsets + g * npad + n, 0, (npad - n) * 4);
        }
    }
    return 0;
}

}  // extern "C"
