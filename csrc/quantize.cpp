// Native quantizers: f32 weights -> ggml block formats, bit-exact with the
// NumPy executable spec (ggml_tpu/quant/reference.py, itself golden-gated
// against the reference binary) and therefore with the reference quantizers
// (quantize_row_q4_K_ref src/ggml-quants.c:1207, quantize_row_q8_0_ref,
// make_qkx2_quants src/ggml-quants.c:550 — reimplemented from the spec's
// arithmetic, not copied).
//
// Motivation: the vectorized NumPy Q4_K quantizer runs at ~3 MB/s (the
// 20-step iterative scale/min search dominates; OP_PERF.json "quantize
// Q4_K"), which makes converting a 6B model take ~an hour.  This scalar
// C++ path threads over rows and reproduces the exact fp32 operation
// order, so outputs are byte-identical (tests/test_native_quantize.py).
//
// C ABI (ctypes):
//   int gt_quantize_supported(int ggml_type);
//   int gt_quantize(int ggml_type, const float* src, int64_t nrows,
//                   int64_t k, uint8_t* dst, int nthreads);
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread quantize.cpp -o libggml_tpu_quantize.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int QK_K = 256;

// ---- fp32 <-> fp16 (round-to-nearest-even, matching numpy astype) ---------
static inline uint16_t f32_to_f16_bits(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    uint32_t mant = x & 0x7FFFFFu;
    int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
    if (((x >> 23) & 0xFF) == 0xFF) {  // inf/nan
        return (uint16_t)(sign | 0x7C00u | (mant ? 0x200u | (mant >> 13) : 0));
    }
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00u);  // overflow -> inf
    if (exp <= 0) {                                      // subnormal / zero
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000u;
        int shift = 14 - exp;
        uint32_t half = mant >> shift;
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t mid = 1u << (shift - 1);
        if (rem > mid || (rem == mid && (half & 1))) half++;
        return (uint16_t)(sign | half);
    }
    uint32_t half = sign | ((uint32_t)exp << 10) | (mant >> 13);
    uint32_t rem = mant & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
    return (uint16_t)half;
}

static inline float f16_bits_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) bits = sign;
        else {
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

// ties-to-even (the reference's +2^23 trick; numpy rint)
static inline int nearest_int(float x) { return (int)nearbyintf(x); }

static inline int clip(int v, int lo, int hi) { return v < lo ? lo : (v > hi ? hi : v); }

// ---- make_qkx2_quants (use_mad=false variant; spec: reference.py) ---------
static void make_qkx2(const float* x, const float* w, int n, int nmax,
                      float rmin, float rdelta, int nstep,
                      float* out_scale, float* out_neg_min, uint8_t* L) {
    float mn = x[0], mx = x[0];
    for (int j = 1; j < n; ++j) {
        if (x[j] < mn) mn = x[j];
        if (x[j] > mx) mx = x[j];
    }
    if (mn > 0.0f) mn = 0.0f;
    float sum_w = 0.0f, sum_x = 0.0f;
    for (int j = 0; j < n; ++j) { sum_w += w[j]; sum_x += w[j] * x[j]; }
    bool dead = (mx == mn);
    float rng = dead ? 1.0f : mx - mn;
    float iscale = (float)nmax / rng;
    float scale = 1.0f / iscale;
    for (int j = 0; j < n; ++j) L[j] = (uint8_t)clip(nearest_int(iscale * (x[j] - mn)), 0, nmax);
    float best_mad = 0.0f;
    for (int j = 0; j < n; ++j) {
        float diff = scale * (float)L[j] + mn - x[j];
        best_mad += w[j] * (diff * diff);
    }
    float minv = mn;
    uint8_t laux[QK_K];
    for (int is = 0; is <= nstep; ++is) {
        float rng_cur = dead ? 1.0f : mx - minv;
        float iscale_is = (rmin + rdelta * (float)is + (float)nmax) / rng_cur;
        float sum_l = 0.0f, sum_l2 = 0.0f, sum_xl = 0.0f;
        for (int j = 0; j < n; ++j) {
            int l = clip(nearest_int(iscale_is * (x[j] - minv)), 0, nmax);
            laux[j] = (uint8_t)l;
            float wl = w[j] * (float)l;
            sum_l += wl;
            sum_l2 += wl * (float)l;
            sum_xl += wl * x[j];
        }
        float D = sum_w * sum_l2 - sum_l * sum_l;
        float safe_D = D > 0.0f ? D : 1.0f;
        float this_scale = (sum_w * sum_xl - sum_x * sum_l) / safe_D;
        float this_min = (sum_l2 * sum_x - sum_l * sum_xl) / safe_D;
        if (this_min > 0.0f) {
            this_min = 0.0f;
            this_scale = sum_xl / (sum_l2 != 0.0f ? sum_l2 : 1.0f);
        }
        float mad = 0.0f;
        for (int j = 0; j < n; ++j) {
            float diff = this_scale * (float)laux[j] + this_min - x[j];
            mad += w[j] * (diff * diff);
        }
        if (D > 0.0f && mad < best_mad) {
            std::memcpy(L, laux, n);
            best_mad = mad;
            scale = this_scale;
            minv = this_min;
        }
    }
    if (dead) {
        scale = 0.0f;
        std::memset(L, 0, n);
        minv = mn;
    }
    *out_scale = scale;
    *out_neg_min = -minv;
}

// ---- 6-bit scale pack/unpack (block_q4_K scales[12]) -----------------------
static void pack_k4_scales(const uint8_t* ls, const uint8_t* lm, uint8_t* out) {
    std::memset(out, 0, 12);
    for (int j = 0; j < 8; ++j) {
        if (j < 4) {
            out[j] = ls[j];
            out[j + 4] = lm[j];
        } else {
            out[j + 4] = (uint8_t)((ls[j] & 0xF) | ((lm[j] & 0xF) << 4));
            out[j - 4] |= (uint8_t)((ls[j] >> 4) << 6);
            out[j] |= (uint8_t)((lm[j] >> 4) << 6);
        }
    }
}

static void unpack_k4_scales(const uint8_t* sc, uint8_t* d_out, uint8_t* m_out) {
    for (int j = 0; j < 8; ++j) {
        if (j < 4) {
            d_out[j] = sc[j] & 63;
            m_out[j] = sc[j + 4] & 63;
        } else {
            d_out[j] = (uint8_t)((sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4));
            m_out[j] = (uint8_t)((sc[j + 4] >> 4) | ((sc[j] >> 6) << 4));
        }
    }
}

// ---- Q4_K: one 256-element superblock -> 144 bytes --------------------------
static void quant_q4_k_block(const float* x, uint8_t* out) {
    const int nmax = 15;
    const float rmin = -1.0f, rdelta = 0.1f;
    const int nstep = 20;
    float scales[8], mins[8];
    uint8_t L[QK_K];
    float w[32];
    for (int g = 0; g < 8; ++g) {
        const float* xg = x + 32 * g;
        float sum_x2 = 0.0f;
        for (int l = 0; l < 32; ++l) sum_x2 += xg[l] * xg[l];
        float av_x = sqrtf(sum_x2 / 32.0f);
        for (int l = 0; l < 32; ++l) w[l] = av_x + fabsf(xg[l]);
        make_qkx2(xg, w, 32, nmax, rmin, rdelta, nstep, &scales[g], &mins[g], L + 32 * g);
    }
    float max_scale = scales[0], max_min = mins[0];
    for (int g = 1; g < 8; ++g) {
        if (scales[g] > max_scale) max_scale = scales[g];
        if (mins[g] > max_min) max_min = mins[g];
    }
    float inv_scale = max_scale > 0.0f ? 63.0f / max_scale : 0.0f;
    float inv_min = max_min > 0.0f ? 63.0f / max_min : 0.0f;
    uint8_t ls[8], lm[8];
    for (int g = 0; g < 8; ++g) {
        int v = nearest_int(inv_scale * scales[g]);
        ls[g] = (uint8_t)(v < 63 ? v : 63);
        v = nearest_int(inv_min * mins[g]);
        lm[g] = (uint8_t)(v < 63 ? v : 63);
    }
    uint8_t sc_bytes[12];
    pack_k4_scales(ls, lm, sc_bytes);
    float d_out = max_scale / 63.0f;
    float dmin_out = max_min / 63.0f;
    uint16_t d_bits = f32_to_f16_bits(d_out);
    uint16_t dmin_bits = f32_to_f16_bits(dmin_out);
    float d16 = f16_bits_to_f32(d_bits);
    float dmin16 = f16_bits_to_f32(dmin_bits);
    // requantize against the roundtripped superblock scale
    uint8_t scd[8], scm[8];
    unpack_k4_scales(sc_bytes, scd, scm);
    for (int g = 0; g < 8; ++g) {
        float dg = d16 * (float)scd[g];
        float dm = dmin16 * (float)scm[g];
        if (dg != 0.0f) {
            for (int l = 0; l < 32; ++l) {
                int j = 32 * g + l;
                L[j] = (uint8_t)clip(nearest_int((x[j] + dm) / dg), 0, nmax);
            }
        }
    }
    std::memcpy(out + 0, &d_bits, 2);
    std::memcpy(out + 2, &dmin_bits, 2);
    std::memcpy(out + 4, sc_bytes, 12);
    // qs layout: Lb (4, 2, 32): byte[n4*32 + l] = L[n4*64+l] | L[n4*64+32+l]<<4
    for (int n4 = 0; n4 < 4; ++n4)
        for (int l = 0; l < 32; ++l)
            out[16 + 32 * n4 + l] = (uint8_t)(L[64 * n4 + l] | (L[64 * n4 + 32 + l] << 4));
}

// ---- Q8_0: one 32-element block -> 34 bytes --------------------------------
static void quant_q8_0_block(const float* x, uint8_t* out) {
    float amax = 0.0f;
    for (int l = 0; l < 32; ++l) {
        float a = fabsf(x[l]);
        if (a > amax) amax = a;
    }
    float d = amax / 127.0f;
    float id = d != 0.0f ? 1.0f / d : 0.0f;
    uint16_t d_bits = f32_to_f16_bits(d);
    std::memcpy(out, &d_bits, 2);
    for (int l = 0; l < 32; ++l) {
        // C roundf: half away from zero (spec: reference.py _roundf)
        out[2 + l] = (uint8_t)(int8_t)(int)roundf(x[l] * id);
    }
}

}  // namespace

extern "C" {

int gt_quantize_supported(int ggml_type) {
    return ggml_type == 8 /*Q8_0*/ || ggml_type == 12 /*Q4_K*/;
}

int gt_quantize(int ggml_type, const float* src, int64_t nrows, int64_t k,
                uint8_t* dst, int nthreads) {
    int64_t block, bsize;
    void (*fn)(const float*, uint8_t*);
    if (ggml_type == 12) { block = 256; bsize = 144; fn = quant_q4_k_block; }
    else if (ggml_type == 8) { block = 32; bsize = 34; fn = quant_q8_0_block; }
    else return 1;
    if (k % block) return 2;
    int64_t blocks_per_row = k / block;
    int64_t total = nrows * blocks_per_row;
    int nt = nthreads > 0 ? nthreads : (int)std::thread::hardware_concurrency();
    if (nt < 1) nt = 1;
    if (nt > total) nt = (int)total;
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; ++t) {
        ts.emplace_back([=]() {
            int64_t lo = total * t / nt, hi = total * (t + 1) / nt;
            for (int64_t b = lo; b < hi; ++b)
                fn(src + b * block, dst + b * bsize);
        });
    }
    for (auto& th : ts) th.join();
    return 0;
}

}  // extern "C"
