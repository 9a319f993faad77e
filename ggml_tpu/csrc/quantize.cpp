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
#include <algorithm>
#include <mutex>
#include <thread>
#include <vector>

#if defined(__AVX2__)
#include <immintrin.h>
#endif

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

constexpr float GROUP_MAX_EPS = 1e-15f;

// ---- make_qkx2_quants (spec: reference.py make_qkx2_quants) ----------------
static void make_qkx2(const float* x, const float* w, int n, int nmax,
                      float rmin, float rdelta, int nstep, bool use_mad,
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
        best_mad += w[j] * (use_mad ? fabsf(diff) : diff * diff);
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
            mad += w[j] * (use_mad ? fabsf(diff) : diff * diff);
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

#if defined(__AVX2__)
// ---- 8-lane make_qkx2 / make_qx: lane = GROUP ------------------------------
// The spec (reference.py) vectorizes the scale searches across groups with
// NumPy; these kernels do the same with AVX2 lanes.  Every lane executes the
// scalar code's exact per-element float sequence (same op order, IEEE mul/
// add/div/sqrt, cvtps_epi32 = ties-to-even like nearest_int), so outputs are
// bit-identical to the scalar path — verified by running both in the tests.
// Branches become lane masks; compile WITHOUT fma contraction (-ffp-contract
// =off; no fma intrinsics used) to keep scalar/vector rounding identical.

static inline __m256i mm_clamp_epi32(__m256i v, int lo, int hi) {
    v = _mm256_max_epi32(v, _mm256_set1_epi32(lo));
    return _mm256_min_epi32(v, _mm256_set1_epi32(hi));
}

// xs/ws: SoA [j][8] (lane = group).  Ls out: SoA [j][8] int32.
static void make_qkx2_v8(const float* xs, const float* ws, int n, int nmax,
                         float rmin, float rdelta, int nstep, bool use_mad,
                         float* out_scale8, float* out_neg_min8, int32_t* Ls) {
    const __m256 zero = _mm256_setzero_ps();
    __m256 mn = _mm256_loadu_ps(xs), mx = mn;
    for (int j = 1; j < n; ++j) {
        __m256 v = _mm256_loadu_ps(xs + 8 * j);
        mn = _mm256_min_ps(mn, v);
        mx = _mm256_max_ps(mx, v);
    }
    mn = _mm256_min_ps(mn, zero);
    __m256 sum_w = zero, sum_x = zero;
    for (int j = 0; j < n; ++j) {
        __m256 w = _mm256_loadu_ps(ws + 8 * j);
        __m256 x = _mm256_loadu_ps(xs + 8 * j);
        sum_w = _mm256_add_ps(sum_w, w);
        sum_x = _mm256_add_ps(sum_x, _mm256_mul_ps(w, x));
    }
    __m256 dead = _mm256_cmp_ps(mx, mn, _CMP_EQ_OQ);
    __m256 one = _mm256_set1_ps(1.0f);
    __m256 rng = _mm256_blendv_ps(_mm256_sub_ps(mx, mn), one, dead);
    __m256 iscale = _mm256_div_ps(_mm256_set1_ps((float)nmax), rng);
    __m256 scale = _mm256_div_ps(one, iscale);
    for (int j = 0; j < n; ++j) {
        __m256 x = _mm256_loadu_ps(xs + 8 * j);
        __m256i l = _mm256_cvtps_epi32(_mm256_mul_ps(iscale, _mm256_sub_ps(x, mn)));
        _mm256_storeu_si256((__m256i*)(Ls + 8 * j), mm_clamp_epi32(l, 0, nmax));
    }
    __m256 best_mad = zero;
    for (int j = 0; j < n; ++j) {
        __m256 lf = _mm256_cvtepi32_ps(_mm256_loadu_si256((const __m256i*)(Ls + 8 * j)));
        __m256 x = _mm256_loadu_ps(xs + 8 * j);
        __m256 w = _mm256_loadu_ps(ws + 8 * j);
        __m256 diff = _mm256_sub_ps(_mm256_add_ps(_mm256_mul_ps(scale, lf), mn), x);
        __m256 e = use_mad ? _mm256_andnot_ps(_mm256_set1_ps(-0.0f), diff)
                           : _mm256_mul_ps(diff, diff);
        best_mad = _mm256_add_ps(best_mad, _mm256_mul_ps(w, e));
    }
    __m256 minv = mn;
    int32_t laux[32 * 8];  // n <= 32 lanes x 8 groups
    for (int is = 0; is <= nstep; ++is) {
        __m256 rng_cur = _mm256_blendv_ps(_mm256_sub_ps(mx, minv), one, dead);
        float num = rmin + rdelta * (float)is + (float)nmax;
        __m256 iscale_is = _mm256_div_ps(_mm256_set1_ps(num), rng_cur);
        __m256 sum_l = zero, sum_l2 = zero, sum_xl = zero;
        for (int j = 0; j < n; ++j) {
            __m256 x = _mm256_loadu_ps(xs + 8 * j);
            __m256 w = _mm256_loadu_ps(ws + 8 * j);
            __m256i l = mm_clamp_epi32(
                _mm256_cvtps_epi32(_mm256_mul_ps(iscale_is, _mm256_sub_ps(x, minv))),
                0, nmax);
            _mm256_storeu_si256((__m256i*)(laux + 8 * j), l);
            __m256 lf = _mm256_cvtepi32_ps(l);
            __m256 wl = _mm256_mul_ps(w, lf);
            sum_l = _mm256_add_ps(sum_l, wl);
            sum_l2 = _mm256_add_ps(sum_l2, _mm256_mul_ps(wl, lf));
            sum_xl = _mm256_add_ps(sum_xl, _mm256_mul_ps(wl, x));
        }
        __m256 D = _mm256_sub_ps(_mm256_mul_ps(sum_w, sum_l2),
                                 _mm256_mul_ps(sum_l, sum_l));
        __m256 pos = _mm256_cmp_ps(D, zero, _CMP_GT_OQ);
        __m256 safe_D = _mm256_blendv_ps(one, D, pos);
        __m256 this_scale = _mm256_div_ps(
            _mm256_sub_ps(_mm256_mul_ps(sum_w, sum_xl), _mm256_mul_ps(sum_x, sum_l)),
            safe_D);
        __m256 this_min = _mm256_div_ps(
            _mm256_sub_ps(_mm256_mul_ps(sum_l2, sum_x), _mm256_mul_ps(sum_l, sum_xl)),
            safe_D);
        __m256 min_pos = _mm256_cmp_ps(this_min, zero, _CMP_GT_OQ);
        __m256 l2_zero = _mm256_cmp_ps(sum_l2, zero, _CMP_EQ_OQ);
        __m256 alt_scale = _mm256_div_ps(sum_xl, _mm256_blendv_ps(sum_l2, one, l2_zero));
        this_scale = _mm256_blendv_ps(this_scale, alt_scale, min_pos);
        this_min = _mm256_andnot_ps(min_pos, this_min);
        __m256 mad = zero;
        for (int j = 0; j < n; ++j) {
            __m256 lf = _mm256_cvtepi32_ps(_mm256_loadu_si256((const __m256i*)(laux + 8 * j)));
            __m256 x = _mm256_loadu_ps(xs + 8 * j);
            __m256 w = _mm256_loadu_ps(ws + 8 * j);
            __m256 diff = _mm256_sub_ps(_mm256_add_ps(_mm256_mul_ps(this_scale, lf), this_min), x);
            __m256 e = use_mad ? _mm256_andnot_ps(_mm256_set1_ps(-0.0f), diff)
                               : _mm256_mul_ps(diff, diff);
            mad = _mm256_add_ps(mad, _mm256_mul_ps(w, e));
        }
        __m256 better = _mm256_and_ps(pos, _mm256_cmp_ps(mad, best_mad, _CMP_LT_OQ));
        if (_mm256_movemask_ps(better)) {
            __m256i bi = _mm256_castps_si256(better);
            for (int j = 0; j < n; ++j) {
                __m256i cur = _mm256_loadu_si256((const __m256i*)(Ls + 8 * j));
                __m256i cand = _mm256_loadu_si256((const __m256i*)(laux + 8 * j));
                _mm256_storeu_si256((__m256i*)(Ls + 8 * j),
                                    _mm256_blendv_epi8(cur, cand, bi));
            }
            best_mad = _mm256_blendv_ps(best_mad, mad, better);
            scale = _mm256_blendv_ps(scale, this_scale, better);
            minv = _mm256_blendv_ps(minv, this_min, better);
        }
    }
    // dead lanes: scale = 0, L = 0, minv = mn
    scale = _mm256_andnot_ps(dead, scale);
    minv = _mm256_blendv_ps(minv, mn, dead);
    __m256i di = _mm256_castps_si256(dead);
    if (_mm256_movemask_ps(dead)) {
        for (int j = 0; j < n; ++j) {
            __m256i cur = _mm256_loadu_si256((const __m256i*)(Ls + 8 * j));
            _mm256_storeu_si256((__m256i*)(Ls + 8 * j), _mm256_andnot_si256(di, cur));
        }
    }
    _mm256_storeu_ps(out_scale8, scale);
    _mm256_storeu_ps(out_neg_min8, _mm256_xor_ps(minv, _mm256_set1_ps(-0.0f)));
}

// xs: SoA [j][8]; Ls out SoA [j][8] (already offset by +nmax, dead-zeroed).
static void make_qx_v8(const float* xs, int n, int nmax,
                       float* out_scale8, int32_t* Ls) {
    const __m256 zero = _mm256_setzero_ps();
    const __m256 one = _mm256_set1_ps(1.0f);
    const __m256 sgn = _mm256_set1_ps(-0.0f);
    __m256 amax = zero, smax = zero;
    for (int j = 0; j < n; ++j) {
        __m256 x = _mm256_loadu_ps(xs + 8 * j);
        __m256 a = _mm256_andnot_ps(sgn, x);
        __m256 m = _mm256_cmp_ps(a, amax, _CMP_GT_OQ);  // strict >: first max
        amax = _mm256_blendv_ps(amax, a, m);
        smax = _mm256_blendv_ps(smax, x, m);
    }
    __m256 dead = _mm256_cmp_ps(amax, _mm256_set1_ps(GROUP_MAX_EPS), _CMP_LT_OQ);
    __m256 safe = _mm256_blendv_ps(smax, one, _mm256_cmp_ps(smax, zero, _CMP_EQ_OQ));
    __m256 iscale = _mm256_div_ps(_mm256_set1_ps(-(float)nmax), safe);
    __m256 sumlx = zero, suml2 = zero;
    for (int j = 0; j < n; ++j) {
        __m256 x = _mm256_loadu_ps(xs + 8 * j);
        __m256i l = mm_clamp_epi32(_mm256_cvtps_epi32(_mm256_mul_ps(iscale, x)),
                                   -nmax, nmax - 1);
        _mm256_storeu_si256((__m256i*)(Ls + 8 * j), l);
        __m256 lf = _mm256_cvtepi32_ps(l);
        __m256 w = _mm256_mul_ps(x, x);
        sumlx = _mm256_add_ps(sumlx, _mm256_mul_ps(_mm256_mul_ps(w, x), lf));
        suml2 = _mm256_add_ps(suml2, _mm256_mul_ps(_mm256_mul_ps(w, lf), lf));
    }
    __m256 l2_zero = _mm256_cmp_ps(suml2, zero, _CMP_EQ_OQ);
    __m256 scale = _mm256_andnot_ps(
        l2_zero, _mm256_div_ps(sumlx, _mm256_blendv_ps(suml2, one, l2_zero)));
    __m256 best = _mm256_mul_ps(scale, sumlx);
    int32_t laux[64 * 8];
    for (int is = -9; is <= 9; ++is) {
        if (is == 0) continue;
        float num = -((float)nmax + 0.1f * (float)is);
        __m256 iscale_is = _mm256_div_ps(_mm256_set1_ps(num), safe);
        __m256 sumlx2 = zero, suml22 = zero;
        for (int j = 0; j < n; ++j) {
            __m256 x = _mm256_loadu_ps(xs + 8 * j);
            __m256i l = mm_clamp_epi32(_mm256_cvtps_epi32(_mm256_mul_ps(iscale_is, x)),
                                       -nmax, nmax - 1);
            _mm256_storeu_si256((__m256i*)(laux + 8 * j), l);
            __m256 lf = _mm256_cvtepi32_ps(l);
            __m256 w = _mm256_mul_ps(x, x);
            sumlx2 = _mm256_add_ps(sumlx2, _mm256_mul_ps(_mm256_mul_ps(w, x), lf));
            suml22 = _mm256_add_ps(suml22, _mm256_mul_ps(_mm256_mul_ps(w, lf), lf));
        }
        __m256 better = _mm256_and_ps(
            _mm256_cmp_ps(suml22, zero, _CMP_GT_OQ),
            _mm256_cmp_ps(_mm256_mul_ps(sumlx2, sumlx2),
                          _mm256_mul_ps(best, suml22), _CMP_GT_OQ));
        if (_mm256_movemask_ps(better)) {
            __m256i bi = _mm256_castps_si256(better);
            for (int j = 0; j < n; ++j) {
                __m256i cur = _mm256_loadu_si256((const __m256i*)(Ls + 8 * j));
                __m256i cand = _mm256_loadu_si256((const __m256i*)(laux + 8 * j));
                _mm256_storeu_si256((__m256i*)(Ls + 8 * j),
                                    _mm256_blendv_epi8(cur, cand, bi));
            }
            __m256 sl22_zero = _mm256_cmp_ps(suml22, zero, _CMP_EQ_OQ);
            __m256 new_scale = _mm256_div_ps(
                sumlx2, _mm256_blendv_ps(suml22, one, sl22_zero));
            scale = _mm256_blendv_ps(scale, new_scale, better);
            best = _mm256_blendv_ps(best, _mm256_mul_ps(new_scale, sumlx2), better);
        }
    }
    scale = _mm256_andnot_ps(dead, scale);
    __m256i di = _mm256_castps_si256(dead);
    __m256i off = _mm256_set1_epi32(nmax);
    for (int j = 0; j < n; ++j) {
        __m256i l = _mm256_add_epi32(
            _mm256_loadu_si256((const __m256i*)(Ls + 8 * j)), off);
        _mm256_storeu_si256((__m256i*)(Ls + 8 * j), _mm256_andnot_si256(di, l));
    }
    _mm256_storeu_ps(out_scale8, scale);
}
#endif  // __AVX2__

// ---- shared Q4_K/Q5_K superblock core (spec: reference.py _quant_k45) ------
// 8 groups of 32 with av_x+|x| weights through make_qkx2, 6-bit packed
// scales/mins, fp16 roundtrip, requantize against the coded scales.
static void quant_k45_core(const float* x, int nmax, float rmin, float rdelta,
                           int nstep, uint8_t* L, uint8_t* sc_bytes,
                           uint16_t* d_bits_out, uint16_t* dmin_bits_out) {
    float scales[8], mins[8];
#if defined(__AVX2__)
    {
        float xs[32 * 8], ws[32 * 8];
        for (int g = 0; g < 8; ++g) {
            const float* xg = x + 32 * g;
            float sum_x2 = 0.0f;
            for (int l = 0; l < 32; ++l) {
                float v = xg[l];
                xs[8 * l + g] = v;
                sum_x2 += v * v;
            }
            float av_x = sqrtf(sum_x2 / 32.0f);
            for (int l = 0; l < 32; ++l) ws[8 * l + g] = av_x + fabsf(xg[l]);
        }
        int32_t Ls[32 * 8];
        make_qkx2_v8(xs, ws, 32, nmax, rmin, rdelta, nstep, false,
                     scales, mins, Ls);
        for (int g = 0; g < 8; ++g)
            for (int l = 0; l < 32; ++l) L[32 * g + l] = (uint8_t)Ls[8 * l + g];
    }
#else
    float w[32];
    for (int g = 0; g < 8; ++g) {
        const float* xg = x + 32 * g;
        float sum_x2 = 0.0f;
        for (int l = 0; l < 32; ++l) sum_x2 += xg[l] * xg[l];
        float av_x = sqrtf(sum_x2 / 32.0f);
        for (int l = 0; l < 32; ++l) w[l] = av_x + fabsf(xg[l]);
        make_qkx2(xg, w, 32, nmax, rmin, rdelta, nstep, false,
                  &scales[g], &mins[g], L + 32 * g);
    }
#endif
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
    *d_bits_out = d_bits;
    *dmin_bits_out = dmin_bits;
}

// ---- Q4_K: one 256-element superblock -> 144 bytes --------------------------
// (reference: quantize_row_q4_K_ref src/ggml-quants.c:1207, via the spec)
static void quant_q4_k_block(const float* x, uint8_t* out) {
    uint8_t L[QK_K], sc_bytes[12];
    uint16_t d_bits, dmin_bits;
    quant_k45_core(x, 15, -1.0f, 0.1f, 20, L, sc_bytes, &d_bits, &dmin_bits);
    std::memcpy(out + 0, &d_bits, 2);
    std::memcpy(out + 2, &dmin_bits, 2);
    std::memcpy(out + 4, sc_bytes, 12);
    // qs layout: Lb (4, 2, 32): byte[n4*32 + l] = L[n4*64+l] | L[n4*64+32+l]<<4
    for (int n4 = 0; n4 < 4; ++n4)
        for (int l = 0; l < 32; ++l)
            out[16 + 32 * n4 + l] = (uint8_t)(L[64 * n4 + l] | (L[64 * n4 + 32 + l] << 4));
}

// ---- Q5_K: one 256-element superblock -> 176 bytes --------------------------
// (reference: quantize_row_q5_K_ref src/ggml-quants.c:1398, via the spec)
static void quant_q5_k_block(const float* x, uint8_t* out) {
    uint8_t L[QK_K], sc_bytes[12];
    uint16_t d_bits, dmin_bits;
    quant_k45_core(x, 31, -0.5f, 0.1f, 15, L, sc_bytes, &d_bits, &dmin_bits);
    std::memcpy(out + 0, &d_bits, 2);
    std::memcpy(out + 2, &dmin_bits, 2);
    std::memcpy(out + 4, sc_bytes, 12);
    uint8_t* qh = out + 16;   // 32 bytes of high bits
    uint8_t* qs = out + 48;   // 128 bytes of low nibbles
    std::memset(qh, 0, 32);
    for (int n4 = 0; n4 < 4; ++n4) {
        for (int l = 0; l < 32; ++l) {
            int v0 = L[64 * n4 + l], v1 = L[64 * n4 + 32 + l];
            if (v0 > 15) { qh[l] |= (uint8_t)(1u << (2 * n4)); v0 -= 16; }
            if (v1 > 15) { qh[l] |= (uint8_t)(1u << (2 * n4 + 1)); v1 -= 16; }
            qs[32 * n4 + l] = (uint8_t)(v0 | (v1 << 4));
        }
    }
}

// ---- make_qx_quants (rmse_type=1, w=x^2; spec: reference.py) ---------------
// scale search for Q6_K's 16-element groups; L out in [0, 2*nmax-1].
static void make_qx(const float* x, int n, int nmax, float* out_scale, int* L) {
    float amax = 0.0f, smax = 0.0f;
    for (int j = 0; j < n; ++j) {
        float a = fabsf(x[j]);
        if (a > amax) { amax = a; smax = x[j]; }  // first-occurrence max
    }
    if (amax < GROUP_MAX_EPS) {
        *out_scale = 0.0f;
        std::memset(L, 0, n * sizeof(int));
        return;
    }
    float safe_max = smax != 0.0f ? smax : 1.0f;
    float iscale = -(float)nmax / safe_max;
    float sumlx = 0.0f, suml2 = 0.0f;
    for (int j = 0; j < n; ++j) {
        int l = clip(nearest_int(iscale * x[j]), -nmax, nmax - 1);
        L[j] = l + nmax;
        float w = x[j] * x[j];
        sumlx += w * x[j] * (float)l;
        suml2 += w * (float)l * (float)l;
    }
    float scale = suml2 != 0.0f ? sumlx / suml2 : 0.0f;
    float best = scale * sumlx;
    int laux[64];
    for (int is = -9; is <= 9; ++is) {
        if (is == 0) continue;
        float iscale_is = -((float)nmax + 0.1f * (float)is) / safe_max;
        float sumlx2 = 0.0f, suml22 = 0.0f;
        for (int j = 0; j < n; ++j) {
            int l = clip(nearest_int(iscale_is * x[j]), -nmax, nmax - 1);
            laux[j] = l;
            float w = x[j] * x[j];
            sumlx2 += w * x[j] * (float)l;
            suml22 += w * (float)l * (float)l;
        }
        if (suml22 > 0.0f && sumlx2 * sumlx2 > best * suml22) {
            for (int j = 0; j < n; ++j) L[j] = laux[j] + nmax;
            float new_scale = sumlx2 / suml22;
            scale = new_scale;
            best = new_scale * sumlx2;
        }
    }
    *out_scale = scale;
}

// ---- Q6_K: one 256-element superblock -> 210 bytes --------------------------
// (reference: quantize_row_q6_K_ref src/ggml-quants.c:1620, via the spec)
static void quant_q6_k_block(const float* x, uint8_t* out) {
    const int nmax = 32;
    float scales[16];
    int L[QK_K];
#if defined(__AVX2__)
    for (int half = 0; half < 2; ++half) {
        float xs[16 * 8];
        for (int g = 0; g < 8; ++g) {
            const float* xg = x + 16 * (8 * half + g);
            for (int l = 0; l < 16; ++l) xs[8 * l + g] = xg[l];
        }
        int32_t Ls[16 * 8];
        make_qx_v8(xs, 16, nmax, scales + 8 * half, Ls);
        for (int g = 0; g < 8; ++g)
            for (int l = 0; l < 16; ++l)
                L[16 * (8 * half + g) + l] = Ls[8 * l + g];
    }
#else
    for (int g = 0; g < 16; ++g)
        make_qx(x + 16 * g, 16, nmax, &scales[g], L + 16 * g);
#endif
    float max_abs = 0.0f, max_scale = 0.0f;
    for (int g = 0; g < 16; ++g) {
        float a = fabsf(scales[g]);
        if (a > max_abs) { max_abs = a; max_scale = scales[g]; }
    }
    bool dead = max_abs < GROUP_MAX_EPS;
    float safe_ms = max_scale != 0.0f ? max_scale : 1.0f;
    float iscale = -128.0f / safe_ms;
    float d_out = dead ? 0.0f : 1.0f / iscale;
    int8_t sc8[16];
    for (int g = 0; g < 16; ++g) {
        int v = nearest_int(iscale * scales[g]);
        sc8[g] = dead ? 0 : (int8_t)(v < 127 ? v : 127);
    }
    uint16_t d_bits = f32_to_f16_bits(d_out);
    float d16 = f16_bits_to_f32(d_bits);
    for (int g = 0; g < 16; ++g) {
        float dg = d16 * (float)sc8[g];
        if (dg != 0.0f) {
            for (int l = 0; l < 16; ++l) {
                int j = 16 * g + l;
                L[j] = clip(nearest_int(x[j] / dg), -32, 31) + 32;
            }
        }
    }
    if (dead) std::memset(L, 0, sizeof(int) * QK_K);
    // ql (2,2,32) low nibbles, qh (2,32) high 2-bit pairs
    for (int half = 0; half < 2; ++half) {
        const int* Lb = L + 128 * half;
        uint8_t* ql = out + 64 * half;
        uint8_t* qh = out + 128 + 32 * half;
        for (int l = 0; l < 32; ++l) {
            ql[l] = (uint8_t)((Lb[l] & 0xF) | ((Lb[64 + l] & 0xF) << 4));
            ql[32 + l] = (uint8_t)((Lb[32 + l] & 0xF) | ((Lb[96 + l] & 0xF) << 4));
            qh[l] = (uint8_t)((Lb[l] >> 4) | ((Lb[32 + l] >> 4) << 2) |
                              ((Lb[64 + l] >> 4) << 4) | ((Lb[96 + l] >> 4) << 6));
        }
    }
    std::memcpy(out + 192, sc8, 16);
    std::memcpy(out + 208, &d_bits, 2);
}

// ---- Q2_K: one 256-element superblock -> 84 bytes ---------------------------
// (reference: quantize_row_q2_K_ref src/ggml-quants.c:643, via the spec)
static void quant_q2_k_block(const float* x, uint8_t* out) {
    const int nmax = 3;
    float scales[16], mins[16];
    uint8_t L[QK_K];
#if defined(__AVX2__)
    for (int half = 0; half < 2; ++half) {
        float xs[16 * 8], ws[16 * 8];
        for (int g = 0; g < 8; ++g) {
            const float* xg = x + 16 * (8 * half + g);
            for (int l = 0; l < 16; ++l) {
                xs[8 * l + g] = xg[l];
                ws[8 * l + g] = fabsf(xg[l]);
            }
        }
        int32_t Ls[16 * 8];
        make_qkx2_v8(xs, ws, 16, nmax, -0.5f, 0.1f, 15, true,
                     scales + 8 * half, mins + 8 * half, Ls);
        for (int g = 0; g < 8; ++g)
            for (int l = 0; l < 16; ++l)
                L[16 * (8 * half + g) + l] = (uint8_t)Ls[8 * l + g];
    }
#else
    float w[16];
    for (int g = 0; g < 16; ++g) {
        const float* xg = x + 16 * g;
        for (int l = 0; l < 16; ++l) w[l] = fabsf(xg[l]);
        make_qkx2(xg, w, 16, nmax, -0.5f, 0.1f, 15, true,
                  &scales[g], &mins[g], L + 16 * g);
    }
#endif
    float max_scale = scales[0], max_min = mins[0];
    for (int g = 1; g < 16; ++g) {
        if (scales[g] > max_scale) max_scale = scales[g];
        if (mins[g] > max_min) max_min = mins[g];
    }
    const float q4scale = 15.0f;
    float d_out = 0.0f, dmin_out = 0.0f;
    uint8_t sc_bytes[16];
    std::memset(sc_bytes, 0, 16);
    if (max_scale > 0.0f) {
        float iscale_s = q4scale / max_scale;
        for (int g = 0; g < 16; ++g)
            sc_bytes[g] = (uint8_t)nearest_int(iscale_s * scales[g]);
        d_out = max_scale / q4scale;
    }
    if (max_min > 0.0f) {
        float iscale_m = q4scale / max_min;
        for (int g = 0; g < 16; ++g)
            sc_bytes[g] |= (uint8_t)(nearest_int(iscale_m * mins[g]) << 4);
        dmin_out = max_min / q4scale;
    }
    uint16_t d_bits = f32_to_f16_bits(d_out);
    uint16_t dmin_bits = f32_to_f16_bits(dmin_out);
    float d16 = f16_bits_to_f32(d_bits);
    float dmin16 = f16_bits_to_f32(dmin_bits);
    for (int g = 0; g < 16; ++g) {
        float dg = d16 * (float)(sc_bytes[g] & 0xF);
        float dm = dmin16 * (float)(sc_bytes[g] >> 4);
        if (dg != 0.0f) {
            for (int l = 0; l < 16; ++l) {
                int j = 16 * g + l;
                L[j] = (uint8_t)clip(nearest_int((x[j] + dm) / dg), 0, nmax);
            }
        }
    }
    std::memcpy(out, sc_bytes, 16);
    for (int half = 0; half < 2; ++half) {
        const uint8_t* Lb = L + 128 * half;
        uint8_t* qs = out + 16 + 32 * half;
        for (int l = 0; l < 32; ++l)
            qs[l] = (uint8_t)(Lb[l] | (Lb[32 + l] << 2) | (Lb[64 + l] << 4) |
                              (Lb[96 + l] << 6));
    }
    std::memcpy(out + 80, &d_bits, 2);
    std::memcpy(out + 82, &dmin_bits, 2);
}

// ---- make_q3_quants (do_rmse; spec: reference.py) ---------------------------
// iterative per-element refinement; L out in [0, 2*nmax-1].
static void make_q3(const float* x, int n, int nmax, float* out_scale, int* L) {
    float amax = 0.0f, smax = 0.0f;
    for (int j = 0; j < n; ++j) {
        float a = fabsf(x[j]);
        if (a > amax) { amax = a; smax = x[j]; }
    }
    if (amax < GROUP_MAX_EPS) {
        *out_scale = 0.0f;
        std::memset(L, 0, n * sizeof(int));
        return;
    }
    float safe_max = smax != 0.0f ? smax : 1.0f;
    float iscale = -(float)nmax / safe_max;
    float w[64];
    float sumlx = 0.0f, suml2 = 0.0f;
    for (int j = 0; j < n; ++j) {
        L[j] = clip(nearest_int(iscale * x[j]), -nmax, nmax - 1);
        w[j] = x[j] * x[j];
        sumlx += w[j] * x[j] * (float)L[j];
        suml2 += w[j] * (float)L[j] * (float)L[j];
    }
    for (int pass = 0; pass < 5; ++pass) {
        int n_changed = 0;
        for (int i = 0; i < n; ++i) {
            float slx = sumlx - w[i] * x[i] * (float)L[i];
            float sl2 = suml2 - w[i] * (float)L[i] * (float)L[i];
            if (slx > 0.0f) {
                int new_l = clip(nearest_int(x[i] * sl2 / slx), -nmax, nmax - 1);
                if (new_l != L[i]) {
                    float cand_slx = slx + w[i] * x[i] * (float)new_l;
                    float cand_sl2 = sl2 + w[i] * (float)new_l * (float)new_l;
                    if (cand_sl2 > 0.0f &&
                        cand_slx * cand_slx * suml2 > sumlx * sumlx * cand_sl2) {
                        L[i] = new_l;
                        sumlx = cand_slx;
                        suml2 = cand_sl2;
                        ++n_changed;
                    }
                }
            }
        }
        if (n_changed == 0) break;
    }
    for (int j = 0; j < n; ++j) L[j] += nmax;
    *out_scale = sumlx / (suml2 != 0.0f ? suml2 : 1.0f);
}

// ---- Q3_K: one 256-element superblock -> 110 bytes --------------------------
// (reference: quantize_row_q3_K_ref src/ggml-quants.c:995, via the spec)
static void quant_q3_k_block(const float* x, uint8_t* out) {
    const int nmax = 4;
    float scales[16];
    int L[QK_K];
    for (int g = 0; g < 16; ++g)
        make_q3(x + 16 * g, 16, nmax, &scales[g], L + 16 * g);
    float max_abs = 0.0f, max_scale = 0.0f;
    for (int g = 0; g < 16; ++g) {
        float a = fabsf(scales[g]);
        if (a > max_abs) { max_abs = a; max_scale = scales[g]; }
    }
    bool has = max_abs != 0.0f;
    float safe_ms = max_scale != 0.0f ? max_scale : 1.0f;
    float iscale = -32.0f / safe_ms;
    uint8_t lvals[16];
    for (int g = 0; g < 16; ++g) {
        int v = clip(nearest_int(iscale * scales[g]), -32, 31) + 32;
        lvals[g] = has ? (uint8_t)v : 0;
    }
    // pack 16 6-bit values into 12 bytes (spec: _pack_q3k_scales)
    uint8_t packed[12];
    std::memset(packed, 0, 12);
    for (int j = 0; j < 16; ++j) {
        uint8_t l = lvals[j];
        if (j < 8) packed[j] |= (uint8_t)(l & 0xF);
        else packed[j - 8] |= (uint8_t)((l & 0xF) << 4);
        packed[8 + (j % 4)] |= (uint8_t)((l >> 4) << (2 * (j / 4)));
    }
    float d_out = has ? 1.0f / iscale : 0.0f;
    uint16_t d_bits = f32_to_f16_bits(d_out);
    float d16 = f16_bits_to_f32(d_bits);
    // decode the packed 6-bit scales (spec: _q3k_scales) and requantize
    for (int g = 0; g < 16; ++g) {
        int lo = g < 8 ? (packed[g] & 0xF) : (packed[g - 8] >> 4);
        int hi = (packed[8 + (g % 4)] >> (2 * (g / 4))) & 3;
        int sc16 = (lo | (hi << 4)) - 32;
        float dg = d16 * (float)sc16;
        if (dg != 0.0f) {
            for (int l = 0; l < 16; ++l) {
                int j = 16 * g + l;
                L[j] = clip(nearest_int(x[j] / dg), -4, 3) + 4;
            }
        }
    }
    // high-bit mask + 2-bit low values
    uint8_t* hm = out;        // 32 bytes
    uint8_t* qs = out + 32;   // 64 bytes
    std::memset(hm, 0, 32);
    for (int j = 0; j < QK_K; ++j) {
        if (L[j] > 3) {
            hm[j % 32] |= (uint8_t)(1u << (j / 32));
            L[j] -= 4;
        }
    }
    for (int half = 0; half < 2; ++half) {
        const int* Lb = L + 128 * half;
        for (int l = 0; l < 32; ++l)
            qs[32 * half + l] = (uint8_t)(Lb[l] | (Lb[32 + l] << 2) |
                                          (Lb[64 + l] << 4) | (Lb[96 + l] << 6));
    }
    std::memcpy(out + 96, packed, 12);
    std::memcpy(out + 108, &d_bits, 2);
}

// ---- IQ4_NL / IQ4_XS: non-linear LUT quantizers ----------------------------
// spec: ggml_tpu/quant/imatrix.py _quant_iq4 / _iq4_fit_blocks /
// _best_index_int8 (itself matching quantize_row_iq4_nl_impl,
// src/ggml-quants.c:4573-4683).  Supports both the unweighted chunk path
// (w = x^2) and the imatrix path (w = qw * sqrt(sigma2 + x^2)).

static const int8_t kvalues_iq4nl[16] = {
    -127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113,
};

static inline int best_index_int8(const int8_t* vals, int n, float x) {
    // mirror np.searchsorted(vals, x, side='right') + the spec's clip and
    // edge overrides (NaN inserts at n: every x < vals[mid] compare false)
    int lo = 0, hi = n;
    while (lo < hi) {
        int mid = (lo + hi) >> 1;
        if (x < (float)vals[mid]) hi = mid; else lo = mid + 1;
    }
    int mu = lo < 1 ? 1 : (lo > n - 1 ? n - 1 : lo);
    float l = (float)vals[mu - 1], h = (float)vals[mu];
    int idx = (x - l) < (h - x) ? mu - 1 : mu;
    if (x <= (float)vals[0]) idx = 0;
    if (x >= (float)vals[n - 1]) idx = n - 1;
    return idx;
}

// indices for 32 scaled elements: L[j] = best_index_int8(id * x[j]).
// AVX2 path replaces the per-element binary search with a 16-value argmin
// sweep — the tie rule (equidistant -> HIGHER index) maps to ascending-i
// `d <= best` updates, and the spec's edge overrides (x <= vals[0] -> 0,
// x >= vals[15] -> 15, NaN -> 15) are applied as masked blends, so the
// result is identical for every input including NaN/inf products.
static inline void iq4_indices32(float id, const float* x, int* L) {
#if defined(__AVX2__)
    const __m256 vid = _mm256_set1_ps(id);
    const __m256 absmask = _mm256_castsi256_ps(_mm256_set1_epi32(0x7FFFFFFF));
    const __m256 v0 = _mm256_set1_ps((float)kvalues_iq4nl[0]);
    const __m256 v15 = _mm256_set1_ps((float)kvalues_iq4nl[15]);
    for (int j0 = 0; j0 < 32; j0 += 8) {
        __m256 xv = _mm256_mul_ps(vid, _mm256_loadu_ps(x + j0));
        __m256 bestd = _mm256_set1_ps(INFINITY);
        __m256i besti = _mm256_set1_epi32(15);
        for (int i = 0; i < 16; ++i) {
            __m256 d = _mm256_and_ps(
                absmask,
                _mm256_sub_ps(xv, _mm256_set1_ps((float)kvalues_iq4nl[i])));
            __m256 m = _mm256_cmp_ps(d, bestd, _CMP_LE_OQ);
            besti = _mm256_blendv_epi8(besti, _mm256_set1_epi32(i),
                                       _mm256_castps_si256(m));
            bestd = _mm256_blendv_ps(bestd, d, m);
        }
        besti = _mm256_blendv_epi8(
            besti, _mm256_setzero_si256(),
            _mm256_castps_si256(_mm256_cmp_ps(xv, v0, _CMP_LE_OQ)));
        besti = _mm256_blendv_epi8(
            besti, _mm256_set1_epi32(15),
            _mm256_castps_si256(_mm256_cmp_ps(xv, v15, _CMP_GE_OQ)));
        _mm256_storeu_si256((__m256i*)(L + j0), besti);
    }
#else
    for (int j = 0; j < 32; ++j)
        L[j] = best_index_int8(kvalues_iq4nl, 16, id * x[j]);
#endif
}

// per-32-block scale fit (spec _iq4_fit_blocks, ntry=7); returns d and, via
// L, the FIRST-pass indices (the spec recomputes L from the final d later)
static void iq4_fit_block32(const float* xb, const float* wb,
                            float* out_d, int* L, int* dead_out) {
    const int8_t* vals = kvalues_iq4nl;
    int aidx = 0;
    float amax = std::fabs(xb[0]);
    for (int j = 1; j < 32; ++j) {
        float ax = std::fabs(xb[j]);
        if (ax > amax) { amax = ax; aidx = j; }
    }
    float mx = xb[aidx];
    int dead = amax < GROUP_MAX_EPS;
    float safe_mx = mx != 0.0f ? mx : 1.0f;
    float d = -safe_mx / (float)vals[0];  // ntry>0 path
    float idv = 1.0f / d;

    // indices vectorized; the fp32 ACCUMULATION stays scalar in j order
    // (vectorizing it would change rounding vs the spec)
    iq4_indices32(idv, xb, L);
    float sumqx = 0.0f, sumq2 = 0.0f;
    for (int j = 0; j < 32; ++j) {
        float q = (float)vals[L[j]];
        sumqx = sumqx + wb[j] * q * xb[j];
        sumq2 = sumq2 + wb[j] * q * q;
    }
    d = sumqx / sumq2;  // NaN on 0/0, as the spec allows
    float best = d * sumqx;
    int Lt[32];
    for (int itry = -7; itry <= 7; ++itry) {
        float id_try = ((float)itry + (float)vals[0]) / safe_mx;
        iq4_indices32(id_try, xb, Lt);
        float sqx = 0.0f, sq2 = 0.0f;
        for (int j = 0; j < 32; ++j) {
            float q = (float)vals[Lt[j]];
            sqx = sqx + wb[j] * q * xb[j];
            sq2 = sq2 + wb[j] * q * q;
        }
        if (sq2 > 0.0f && sqx * sqx > best * sq2) {
            d = sqx / sq2;
            best = d * sqx;
        }
    }
    if (dead) d = 0.0f;
    *out_d = d;
    *dead_out = dead;
}

#if defined(__AVX2__)
// ---- 8-lane IQ4 fit: lane = 32-block (the make_qkx2_v8 idiom) -------------
// Each lane runs the EXACT scalar fp32 op sequence of iq4_fit_block32; only
// independent blocks are parallelized, so outputs stay byte-identical.

static inline __m256 iq4_lut16(__m256i idx, __m256 v0, __m256 v1) {
    // vals[idx] for idx in [0,16): permutevar8x32 uses idx&7, select by bit 3
    __m256 a = _mm256_permutevar8x32_ps(v0, idx);
    __m256 b = _mm256_permutevar8x32_ps(v1, idx);
    __m256 sel = _mm256_castsi256_ps(_mm256_cmpgt_epi32(idx, _mm256_set1_epi32(7)));
    return _mm256_blendv_ps(a, b, sel);
}

// q = (float)vals[best_index_int8(vals, 16, xv)] for 8 lanes at once.
// searchsorted-right count + tie pick + the spec's edge/NaN overrides.
static inline __m256 iq4_nearest_q8(__m256 xv, __m256 v0, __m256 v1) {
    __m256i cnt = _mm256_setzero_si256();
    for (int i = 0; i < 16; ++i) {
        __m256 ge = _mm256_cmp_ps(xv, _mm256_set1_ps((float)kvalues_iq4nl[i]),
                                  _CMP_GE_OQ);
        cnt = _mm256_sub_epi32(cnt, _mm256_castps_si256(ge));
    }
    __m256i mu = _mm256_min_epi32(_mm256_max_epi32(cnt, _mm256_set1_epi32(1)),
                                  _mm256_set1_epi32(15));
    __m256 lo = iq4_lut16(_mm256_sub_epi32(mu, _mm256_set1_epi32(1)), v0, v1);
    __m256 hi = iq4_lut16(mu, v0, v1);
    __m256 pick_lo = _mm256_cmp_ps(_mm256_sub_ps(xv, lo), _mm256_sub_ps(hi, xv),
                                   _CMP_LT_OQ);
    __m256 q = _mm256_blendv_ps(hi, lo, pick_lo);
    const __m256 vmin = _mm256_set1_ps(-127.0f), vmax = _mm256_set1_ps(113.0f);
    q = _mm256_blendv_ps(q, vmin, _mm256_cmp_ps(xv, vmin, _CMP_LE_OQ));
    q = _mm256_blendv_ps(q, vmax, _mm256_cmp_ps(xv, vmax, _CMP_GE_OQ));
    q = _mm256_blendv_ps(q, vmax, _mm256_cmp_ps(xv, xv, _CMP_UNORD_Q));  // NaN -> idx 15
    return q;
}

static inline void iq4_pass8(const float xt[32][8], const float wt[32][8],
                             __m256 id, __m256 v0, __m256 v1,
                             __m256* sqx_out, __m256* sq2_out) {
    __m256 sqx = _mm256_setzero_ps(), sq2 = _mm256_setzero_ps();
    for (int j = 0; j < 32; ++j) {
        __m256 x = _mm256_loadu_ps(xt[j]);
        __m256 w = _mm256_loadu_ps(wt[j]);
        __m256 q = iq4_nearest_q8(_mm256_mul_ps(id, x), v0, v1);
        __m256 wq = _mm256_mul_ps(w, q);
        sqx = _mm256_add_ps(sqx, _mm256_mul_ps(wq, x));   // (w*q)*x, j order
        sq2 = _mm256_add_ps(sq2, _mm256_mul_ps(wq, q));
    }
    *sqx_out = sqx;
    *sq2_out = sq2;
}

// fit 8 independent 32-blocks (SoA xt/wt: [element][lane]) -> d per lane
static void iq4_fit8(const float xt[32][8], const float wt[32][8],
                     float d_out[8]) {
    const __m256 v0 = _mm256_setr_ps(-127, -104, -83, -65, -49, -35, -22, -10);
    const __m256 v1 = _mm256_setr_ps(1, 13, 25, 38, 53, 69, 89, 113);
    // first-max amax/mx (strict > keeps the earliest index, as np.argmax)
    __m256 absmask = _mm256_castsi256_ps(_mm256_set1_epi32(0x7FFFFFFF));
    __m256 mx = _mm256_loadu_ps(xt[0]);
    __m256 amax = _mm256_and_ps(absmask, mx);
    for (int j = 1; j < 32; ++j) {
        __m256 x = _mm256_loadu_ps(xt[j]);
        __m256 ax = _mm256_and_ps(absmask, x);
        __m256 m = _mm256_cmp_ps(ax, amax, _CMP_GT_OQ);
        amax = _mm256_blendv_ps(amax, ax, m);
        mx = _mm256_blendv_ps(mx, x, m);
    }
    __m256 dead = _mm256_cmp_ps(amax, _mm256_set1_ps(GROUP_MAX_EPS), _CMP_LT_OQ);
    __m256 safe_mx = _mm256_blendv_ps(
        mx, _mm256_set1_ps(1.0f),
        _mm256_cmp_ps(mx, _mm256_setzero_ps(), _CMP_EQ_OQ));
    __m256 d = _mm256_div_ps(
        _mm256_sub_ps(_mm256_setzero_ps(), safe_mx), _mm256_set1_ps(-127.0f));
    __m256 idv = _mm256_div_ps(_mm256_set1_ps(1.0f), d);

    __m256 sqx, sq2;
    iq4_pass8(xt, wt, idv, v0, v1, &sqx, &sq2);
    d = _mm256_div_ps(sqx, sq2);
    __m256 best = _mm256_mul_ps(d, sqx);
    for (int itry = -7; itry <= 7; ++itry) {
        // (itry + vals[0]) is an exact small-integer f32 constant
        __m256 id_try = _mm256_div_ps(_mm256_set1_ps((float)itry - 127.0f),
                                      safe_mx);
        iq4_pass8(xt, wt, id_try, v0, v1, &sqx, &sq2);
        __m256 better = _mm256_and_ps(
            _mm256_cmp_ps(sq2, _mm256_setzero_ps(), _CMP_GT_OQ),
            _mm256_cmp_ps(_mm256_mul_ps(sqx, sqx), _mm256_mul_ps(best, sq2),
                          _CMP_GT_OQ));
        __m256 d_new = _mm256_div_ps(sqx, sq2);
        d = _mm256_blendv_ps(d, d_new, better);
        best = _mm256_blendv_ps(best, _mm256_mul_ps(d_new, sqx), better);
    }
    d = _mm256_blendv_ps(d, _mm256_setzero_ps(), dead);
    _mm256_storeu_ps(d_out, d);
}
#endif  // __AVX2__

// weights for one 32-block: unweighted -> x^2; imatrix -> qw*sqrt(s2+x^2)
static inline void iq4_block_weights(const float* xb, const float* qw,
                                     float sigma2, float* wb) {
    if (qw == nullptr) {
        for (int j = 0; j < 32; ++j) wb[j] = xb[j] * xb[j];
    } else {
        for (int j = 0; j < 32; ++j)
            wb[j] = qw[j] * std::sqrt(sigma2 + xb[j] * xb[j]);
    }
}

// sequential fp32 sum of squares (spec _seq_sumsq order)
static inline float seq_sumsq(const float* x, int n) {
    float acc = 0.0f;
    for (int j = 0; j < n; ++j) acc = acc + x[j] * x[j];
    return acc;
}

static void quant_iq4_nl_block(const float* x, const float* qw, uint8_t* out) {
    float sigma2 = 2.0f * seq_sumsq(x, 32) / 32.0f;
    float wb[32];
    iq4_block_weights(x, qw, sigma2, wb);
    float d; int L[32]; int dead;
    iq4_fit_block32(x, wb, &d, L, &dead);
    // re-index every element with the final 1/d (dead blocks: id=0)
    float id0 = d != 0.0f ? 1.0f / d : 0.0f;
    iq4_indices32(id0, x, L);
    uint16_t dh = f32_to_f16_bits(d);
    out[0] = (uint8_t)(dh & 0xFF); out[1] = (uint8_t)(dh >> 8);
    for (int j = 0; j < 16; ++j)
        out[2 + j] = (uint8_t)(L[j] | (L[j + 16] << 4));
}

#if defined(__AVX2__)
// 8 consecutive 32-blocks at once, lane = block (per-lane qw pointers)
static void quant_iq4_nl_block8(const float* x, const float* const qws[8],
                                uint8_t* out) {
    float xt[32][8], wt[32][8], d8[8];
    for (int lane = 0; lane < 8; ++lane) {
        const float* xb = x + 32 * lane;
        float sigma2 = 2.0f * seq_sumsq(xb, 32) / 32.0f;
        float wb[32];
        iq4_block_weights(xb, qws[lane], sigma2, wb);
        for (int j = 0; j < 32; ++j) { xt[j][lane] = xb[j]; wt[j][lane] = wb[j]; }
    }
    iq4_fit8(xt, wt, d8);
    for (int lane = 0; lane < 8; ++lane) {
        const float* xb = x + 32 * lane;
        uint8_t* o = out + 18 * lane;
        float d = d8[lane];
        float id0 = d != 0.0f ? 1.0f / d : 0.0f;
        int L[32];
        iq4_indices32(id0, xb, L);
        uint16_t dh = f32_to_f16_bits(d);
        o[0] = (uint8_t)(dh & 0xFF); o[1] = (uint8_t)(dh >> 8);
        for (int j = 0; j < 16; ++j)
            o[2 + j] = (uint8_t)(L[j] | (L[j + 16] << 4));
    }
}
#endif

static void quant_iq4_xs_block(const float* x, const float* qw, uint8_t* out) {
    float sigma2 = 2.0f * seq_sumsq(x, QK_K) / (float)QK_K;
    float scales[8];
#if defined(__AVX2__)
    {   // lane = sub-block: one 8-lane fit per superblock
        float xt[32][8], wt[32][8];
        for (int ib = 0; ib < 8; ++ib) {
            const float* xb = x + 32 * ib;
            float wb[32];
            iq4_block_weights(xb, qw ? qw + 32 * ib : nullptr, sigma2, wb);
            for (int j = 0; j < 32; ++j) { xt[j][ib] = xb[j]; wt[j][ib] = wb[j]; }
        }
        iq4_fit8(xt, wt, scales);
    }
#else
    for (int ib = 0; ib < 8; ++ib) {
        float wb[32];
        const float* xb = x + 32 * ib;
        iq4_block_weights(xb, qw ? qw + 32 * ib : nullptr, sigma2, wb);
        int L[32]; int dead;
        iq4_fit_block32(xb, wb, &scales[ib], L, &dead);
    }
#endif
    int aidx = 0; float amax = std::fabs(scales[0]);
    for (int ib = 1; ib < 8; ++ib) {
        float as = std::fabs(scales[ib]);
        if (as > amax) { amax = as; aidx = ib; }
    }
    float max_scale = scales[aidx];
    float d_sb = -max_scale / 32.0f;
    float id_sb = d_sb != 0.0f ? 1.0f / d_sb : 0.0f;
    uint16_t dh = f32_to_f16_bits(d_sb);
    out[0] = (uint8_t)(dh & 0xFF); out[1] = (uint8_t)(dh >> 8);
    uint16_t scales_h = 0;
    uint8_t scales_l[4] = {0, 0, 0, 0};
    for (int ib = 0; ib < 8; ++ib) {
        int l6 = clip(nearest_int(id_sb * scales[ib]), -32, 31);
        // the spec keeps the UNROUNDED f32 d_sb when re-indexing
        float dl = d_sb * (float)l6;
        float idl = dl != 0.0f ? 1.0f / dl : 0.0f;
        const float* xb = x + 32 * ib;
        int Lb[32];
        iq4_indices32(idl, xb, Lb);
        int lq = l6 + 32;
        scales_h |= (uint16_t)((lq >> 4) << (2 * ib));
        if (ib % 2 == 0) scales_l[ib / 2] = (uint8_t)(lq & 0xF);
        else scales_l[ib / 2] |= (uint8_t)((lq & 0xF) << 4);
        uint8_t* qs = out + 8 + 16 * ib;
        for (int j = 0; j < 16; ++j) qs[j] = (uint8_t)(Lb[j] | (Lb[j + 16] << 4));
    }
    out[2] = (uint8_t)(scales_h & 0xFF); out[3] = (uint8_t)(scales_h >> 8);
    for (int j = 0; j < 4; ++j) out[4 + j] = scales_l[j];
}

// ---- grid-codebook i-quants (IQ2_XXS/XS/S, IQ3_XXS/S, IQ1_S/M) -------------
// spec: ggml_tpu/quant/iquant_encode.py (itself golden-gated vs the
// reference binary; algorithm of quantize_row_iq2_xxs_impl et al.,
// src/ggml-quants.c:2954 onward).  The code lattices are supplied from
// Python at init (gt_iq_set_lattice) so the grid data stays single-sourced
// in quant/data/iq_grids.npz; neighbour candidate lists are precomputed
// eagerly for every off-grid lattice point (the reference's iq2xs_init_impl
// idiom) — ~10M integer ops once, then lock-free lookups.

struct IQLattice {
    int dim = 0, shift = 0, nwant = 0, kmap_size = 0, ngrid = 0;
    std::vector<int8_t> L;       // ngrid*dim integer codes
    std::vector<float> posf;     // ngrid*dim grid bytes (2c+1) as float
    std::vector<int32_t> kmap;   // packed-code -> grid index or -1
    std::vector<int32_t> noff;   // CSR offsets (kmap_size+1) into ndata
    std::vector<int16_t> ndata;  // neighbour grid indices per off-grid point
    bool ready = false;
};

static IQLattice g_lat[8];  // slot per lattice id (see _LAT_SLOT in native.py)
static std::mutex g_lat_mu;

static void iq_lat_build(IQLattice& la, const int8_t* codes, int ngrid,
                         int dim, int shift, int nwant, int kmap_size) {
    la.dim = dim; la.shift = shift; la.nwant = nwant;
    la.kmap_size = kmap_size; la.ngrid = ngrid;
    la.L.assign(codes, codes + (size_t)ngrid * dim);
    la.posf.resize((size_t)ngrid * dim);
    for (size_t i = 0; i < la.posf.size(); ++i)
        la.posf[i] = (float)(2 * codes[i] + 1);
    la.kmap.assign(kmap_size, -1);
    for (int g = 0; g < ngrid; ++g) {
        int64_t u = 0;
        for (int i = 0; i < dim; ++i)
            u |= (int64_t)codes[g * dim + i] << (shift * i);
        la.kmap[u] = g;
    }
    // eager neighbour lists for every representable off-grid point
    la.noff.assign(kmap_size + 1, 0);
    std::vector<std::pair<int32_t, int32_t>> dist(ngrid);  // (d2, idx)
    std::vector<int16_t> all;
    int mask = (1 << shift) - 1;
    for (int64_t u = 0; u < kmap_size; ++u) {
        la.noff[u] = (int32_t)all.size();
        if (la.kmap[u] >= 0) continue;
        // reject impossible packings (fields beyond the code alphabet have
        // no kmap entry either — python never queries them, so lists for
        // them are never read; computing them anyway is harmless)
        int pu[8];
        for (int i = 0; i < dim; ++i)
            pu[i] = 2 * (int)((u >> (shift * i)) & mask) + 1;
        for (int g = 0; g < ngrid; ++g) {
            int32_t d2 = 0;
            for (int i = 0; i < dim; ++i) {
                int d = (int)la.posf[g * dim + i] - pu[i];
                d2 += d * d;
            }
            dist[g] = {d2, g};
        }
        std::sort(dist.begin(), dist.end());
        // all points within the nwant smallest DISTINCT distances
        int distinct = 0, last = -1, cut = dist[ngrid - 1].first;
        for (int g = 0; g < ngrid; ++g) {
            if (dist[g].first != last) {
                last = dist[g].first;
                if (++distinct == nwant) { cut = last; break; }
            }
        }
        for (int g = 0; g < ngrid && dist[g].first <= cut; ++g)
            all.push_back((int16_t)dist[g].second);
    }
    la.noff[kmap_size] = (int32_t)all.size();
    la.ndata = std::move(all);
    la.ready = true;
}

// weighted-L2 best neighbour (iq2/iq3_find_best_neighbour; spec
// _best_neighbours): first minimum wins (strict <).  The per-dim products
// are vectorized; the ACCUMULATION stays sequential in dim order (lane
// extract + ordered adds) so near-tie argmins round exactly like the spec.
static int iq_best_neighbour(const IQLattice& la, int64_t u, const float* xval,
                             const float* waux, float scale) {
    int32_t lo = la.noff[u], hi = la.noff[u + 1];
    int best = la.ndata[lo];
    float bestd = INFINITY;
#if defined(__AVX2__)
    if (la.dim == 8) {
        const __m256 xv = _mm256_loadu_ps(xval);
        const __m256 wv = _mm256_loadu_ps(waux);
        const __m256 sc = _mm256_set1_ps(scale);
        // two candidates in flight: each acc is a strictly sequential
        // 8-add chain (exactness), but the two chains are independent, so
        // interleaving hides most of the ~24-cycle latency; the compares
        // stay in candidate order (first-minimum semantics)
        int32_t n = lo;
        for (; n + 2 <= hi; n += 2) {
            int g0 = la.ndata[n], g1 = la.ndata[n + 1];
            __m256 q0 = _mm256_loadu_ps(&la.posf[(size_t)g0 * 8]);
            __m256 q1 = _mm256_loadu_ps(&la.posf[(size_t)g1 * 8]);
            __m256 d0 = _mm256_sub_ps(_mm256_mul_ps(sc, q0), xv);
            __m256 d1 = _mm256_sub_ps(_mm256_mul_ps(sc, q1), xv);
            __m256 p0 = _mm256_mul_ps(_mm256_mul_ps(wv, d0), d0);
            __m256 p1 = _mm256_mul_ps(_mm256_mul_ps(wv, d1), d1);
            float prod0[8], prod1[8];
            _mm256_storeu_ps(prod0, p0);
            _mm256_storeu_ps(prod1, p1);
            float a0 = 0.0f, a1 = 0.0f;
            for (int i = 0; i < 8; ++i) {
                a0 = a0 + prod0[i];
                a1 = a1 + prod1[i];
            }
            if (a0 < bestd) { bestd = a0; best = g0; }
            if (a1 < bestd) { bestd = a1; best = g1; }
        }
        for (; n < hi; ++n) {
            int g = la.ndata[n];
            __m256 q = _mm256_loadu_ps(&la.posf[(size_t)g * 8]);
            __m256 d = _mm256_sub_ps(_mm256_mul_ps(sc, q), xv);
            __m256 p = _mm256_mul_ps(_mm256_mul_ps(wv, d), d);
            float prod[8];
            _mm256_storeu_ps(prod, p);
            float acc = 0.0f;
            for (int i = 0; i < 8; ++i) acc = acc + prod[i];
            if (acc < bestd) { bestd = acc; best = g; }
        }
        return best;
    }
    if (la.dim == 4) {
        const __m128 xv = _mm_loadu_ps(xval);
        const __m128 wv = _mm_loadu_ps(waux);
        const __m128 sc = _mm_set1_ps(scale);
        int32_t n = lo;
        for (; n + 2 <= hi; n += 2) {
            int g0 = la.ndata[n], g1 = la.ndata[n + 1];
            __m128 q0 = _mm_loadu_ps(&la.posf[(size_t)g0 * 4]);
            __m128 q1 = _mm_loadu_ps(&la.posf[(size_t)g1 * 4]);
            __m128 d0 = _mm_sub_ps(_mm_mul_ps(sc, q0), xv);
            __m128 d1 = _mm_sub_ps(_mm_mul_ps(sc, q1), xv);
            __m128 p0 = _mm_mul_ps(_mm_mul_ps(wv, d0), d0);
            __m128 p1 = _mm_mul_ps(_mm_mul_ps(wv, d1), d1);
            float prod0[4], prod1[4];
            _mm_storeu_ps(prod0, p0);
            _mm_storeu_ps(prod1, p1);
            float a0 = 0.0f, a1 = 0.0f;
            for (int i = 0; i < 4; ++i) {
                a0 = a0 + prod0[i];
                a1 = a1 + prod1[i];
            }
            if (a0 < bestd) { bestd = a0; best = g0; }
            if (a1 < bestd) { bestd = a1; best = g1; }
        }
        for (; n < hi; ++n) {
            int g = la.ndata[n];
            __m128 q = _mm_loadu_ps(&la.posf[(size_t)g * 4]);
            __m128 d = _mm_sub_ps(_mm_mul_ps(sc, q), xv);
            __m128 p = _mm_mul_ps(_mm_mul_ps(wv, d), d);
            float prod[4];
            _mm_storeu_ps(prod, p);
            float acc = 0.0f;
            for (int i = 0; i < 4; ++i) acc = acc + prod[i];
            if (acc < bestd) { bestd = acc; best = g; }
        }
        return best;
    }
#endif
    for (int32_t n = lo; n < hi; ++n) {
        int g = la.ndata[n];
        float acc = 0.0f;
        for (int i = 0; i < la.dim; ++i) {
            float diff = scale * la.posf[g * la.dim + i] - xval[i];
            acc = acc + (waux[i] * diff) * diff;
        }
        if (acc < bestd) { bestd = acc; best = g; }
    }
    return best;
}

// pack dim codes -> lattice index
static inline int64_t iq_pack(const IQLattice& la, const int8_t* Lg) {
    int64_t u = 0;
    for (int i = 0; i < la.dim; ++i)
        u |= (int64_t)Lg[i] << (la.shift * i);
    return u;
}

// spec _lookup_groups for one dim-sized group: on-grid -> its index, else
// best neighbour (codes corrected in place).  Returns grid index.
static int iq_lookup_group(const IQLattice& la, int8_t* Lg, const float* xval,
                           const float* waux, float scale, int* on_grid) {
    int64_t u = iq_pack(la, Lg);
    int gi = la.kmap[u];
    if (gi >= 0) { *on_grid = 1; return gi; }
    *on_grid = 0;
    gi = iq_best_neighbour(la, u, xval, waux, scale);
    for (int i = 0; i < la.dim; ++i) Lg[i] = la.L[gi * la.dim + i];
    return gi;
}

// spec imatrix.make_qp_quants (reference make_qp_quants
// src/ggml-quants.c:829): weighted positive quantizer -> scale
static float iq_make_qp_scale(const float* x, int n, int nmax,
                              const float* qw) {
    float mx = 0.0f;
    for (int j = 0; j < n; ++j) if (x[j] > mx) mx = x[j];
    if (mx == 0.0f) return 0.0f;
    float iscale = (float)nmax / mx;
    float scale = 1.0f / iscale;
    float best_mse = 0.0f;
    for (int j = 0; j < n; ++j) {
        int l = nearest_int(iscale * x[j]);
        float d = x[j] - scale * (float)l;
        best_mse = best_mse + qw[j] * d * d;
    }
    for (int is = -4; is <= 4; ++is) {
        if (is == 0) continue;
        float iscale_is = (0.1f * (float)is + (float)nmax) / mx;
        float scale_is = 1.0f / iscale_is;
        float mse = 0.0f;
        for (int j = 0; j < n; ++j) {
            int l = nearest_int(iscale_is * x[j]);
            if (l > nmax) l = nmax;
            float d = x[j] - scale_is * (float)l;
            mse = mse + qw[j] * d * d;
        }
        if (mse < best_mse) { best_mse = mse; iscale = iscale_is; }
    }
    int L[32];
    float sumlx = 0.0f, suml2 = 0.0f;
    for (int j = 0; j < n; ++j) {
        int l = nearest_int(iscale * x[j]);
        if (l > nmax) l = nmax;
        L[j] = l;
        float lf = (float)l;
        sumlx = sumlx + qw[j] * x[j] * lf;
        suml2 = suml2 + qw[j] * lf * lf;
    }
    for (int round = 0; round < 5; ++round) {
        bool changed_any = false;
        for (int j = 0; j < n; ++j) {
            float w = qw[j], lf = (float)L[j];
            float slx = sumlx - w * x[j] * lf;
            float sl2 = suml2 - w * lf * lf;
            if (!(slx > 0.0f && sl2 > 0.0f)) continue;
            int new_l = nearest_int(x[j] * sl2 / slx);
            if (new_l > nmax) new_l = nmax;
            if (new_l == L[j]) continue;
            float nlf = (float)new_l;
            float slx2 = slx + w * x[j] * nlf;
            float sl22 = sl2 + w * nlf * nlf;
            if (slx2 * slx2 * suml2 > sumlx * sumlx * sl22) {
                L[j] = new_l;
                sumlx = slx2;
                suml2 = sl22;
                changed_any = true;
            }
        }
        if (!changed_any) break;
    }
    return suml2 != 0.0f ? sumlx / suml2 : 0.0f;
}

// spec _signed_split for one 8-group (parity variant): |x| magnitudes +
// 7-bit sign code, odd-negative groups flip the least-important element
static void iq_signed_split8(const float* xg, const float* wg, float* xval,
                             uint32_t* sign_out, bool parity) {
    uint32_t s = 0;
    int nneg = 0;
    for (int i = 0; i < 8; ++i) {
        bool neg = !(xg[i] >= 0.0f);
        xval[i] = neg ? -xg[i] : xg[i];
        if (neg) { s |= 1u << i; ++nneg; }
    }
    if (parity) {
        if ((nneg % 2) == 1) {
            int imin = 0;
            float bestp = INFINITY;
            for (int i = 0; i < 8; ++i) {
                float p = (wg[i] * xg[i]) * xg[i];
                if (p < bestp) { bestp = p; imin = i; }
            }
            xval[imin] = -xval[imin];
            s ^= 1u << imin;
        }
        s &= 127u;  // parity codes carry 7 explicit bits for EVERY group
    }
    *sign_out = s;
}

// spec _sum_qx_q2: q = 2L+1, sequential fp32
static inline void iq_sum_qx_q2(const float* w, const float* xval,
                                const int8_t* L, int n, float* sqx_out,
                                float* sq2_out) {
    float sqx = 0.0f, sq2 = 0.0f;
    for (int i = 0; i < n; ++i) {
        float q = (float)(2 * (int)L[i] + 1);
        sqx = sqx + (w[i] * xval[i]) * q;
        sq2 = sq2 + (w[i] * q) * q;
    }
    *sqx_out = sqx;
    *sq2_out = sq2;
}

// one IQ2_XXS superblock (256 elems) -> 66 bytes; qw REQUIRED
// (spec quant_iq2_xxs; reference quantize_row_iq2_xxs_impl :2954)
static void quant_iq2_xxs_block(const float* x, const float* qw, uint8_t* out) {
    const IQLattice& la = g_lat[0];
    float sigma2 = seq_sumsq(x, QK_K) / (float)QK_K;  // sigma_mul = 1
    float scales_ib[8];
    int gi_sb[8][4];
    uint32_t signs_sb[8][4];
    for (int ib = 0; ib < 8; ++ib) {
        const float* xb = x + 32 * ib;
        const float* qwb = qw + 32 * ib;
        float weight[32], waux[32], xval[32];
        for (int i = 0; i < 32; ++i)
            weight[i] = qwb[i] * std::sqrt(sigma2 + xb[i] * xb[i]);
        for (int i = 0; i < 32; ++i) waux[i] = std::sqrt(weight[i]);
        uint32_t signs[4];
        for (int g = 0; g < 4; ++g)
            iq_signed_split8(xb + 8 * g, weight + 8 * g, xval + 8 * g,
                             &signs[g], /*parity=*/true);
        float maxv = xval[0];
        for (int i = 1; i < 32; ++i) if (xval[i] > maxv) maxv = xval[i];
        bool dead = maxv < GROUP_MAX_EPS;

        float scale = iq_make_qp_scale(xval, 32, 4, weight);
        float eff_max = scale * 3.0f;
        float safe_eff = eff_max != 0.0f ? eff_max : 1.0f;
        float best = 0.0f;
        int8_t L[32] = {0};
        for (int is = -6; is <= 6; ++is) {
            float id = (5.0f + (float)is * 0.1f) / safe_eff;
            float this_scale = 1.0f / id;
            int8_t Laux[32];
            for (int i = 0; i < 32; ++i) {
                int l = nearest_int(0.5f * (id * xval[i] - 1.0f));
                Laux[i] = (int8_t)clip(l, 0, 2);
            }
            for (int g = 0; g < 4; ++g) {
                int on;
                iq_lookup_group(la, Laux + 8 * g, xval + 8 * g, waux + 8 * g,
                                this_scale, &on);
            }
            float sqx, sq2;
            iq_sum_qx_q2(weight, xval, Laux, 32, &sqx, &sq2);
            if (sq2 > 0.0f && sqx * sqx > best * sq2) {
                scale = sqx / sq2;
                best = scale * sqx;
                std::memcpy(L, Laux, 32);
            }
        }
        if (scale > 0.0f) {
            float id = 1.0f / scale;
            int8_t Lq[32];
            for (int i = 0; i < 32; ++i) {
                int l = nearest_int(0.5f * (id * xval[i] - 1.0f));
                Lq[i] = (int8_t)clip(l, 0, 2);
            }
            for (int g = 0; g < 4; ++g) {
                int on;
                iq_lookup_group(la, Lq + 8 * g, xval + 8 * g, waux + 8 * g,
                                scale, &on);
            }
            std::memcpy(L, Lq, 32);
            float sqx, sq2;
            iq_sum_qx_q2(weight, xval, L, 32, &sqx, &sq2);
            if (sq2 > 0.0f) scale = sqx / sq2;
        }
        if (scale < 0.0f) {
            scale = -scale;
            for (int g = 0; g < 4; ++g) signs[g] = (~signs[g]) & 127u;
        }
        for (int g = 0; g < 4; ++g) {
            int on;
            gi_sb[ib][g] = iq_lookup_group(la, L + 8 * g, xval + 8 * g,
                                           waux + 8 * g, scale, &on);
        }
        if (dead) {
            for (int g = 0; g < 4; ++g) { gi_sb[ib][g] = 0; signs[g] = 0; }
            scale = 0.0f;
        }
        for (int g = 0; g < 4; ++g) signs_sb[ib][g] = signs[g];
        scales_ib[ib] = scale;
    }

    float max_scale = scales_ib[0];
    for (int ib = 1; ib < 8; ++ib)
        if (scales_ib[ib] > max_scale) max_scale = scales_ib[ib];
    bool sb_live = max_scale != 0.0f;
    float d = max_scale / 31.0f;
    float id_sb = 1.0f / (sb_live ? d : 1.0f);

    uint16_t dh = f32_to_f16_bits(sb_live ? d : 0.0f);
    out[0] = (uint8_t)(dh & 0xFF); out[1] = (uint8_t)(dh >> 8);
    for (int ib = 0; ib < 8; ++ib) {
        uint32_t idx_word = 0, sign_word = 0;
        uint32_t l_ib = 0;
        if (sb_live) {
            int l = nearest_int(0.5f * (id_sb * scales_ib[ib] - 1.0f));
            l_ib = (uint32_t)clip(l, 0, 15);
        }
        for (int k = 0; k < 4; ++k) {
            idx_word |= (uint32_t)gi_sb[ib][k] << (8 * k);
            sign_word |= signs_sb[ib][k] << (7 * k);
        }
        sign_word |= l_ib << 28;
        if (!sb_live) { idx_word = 0; sign_word = 0; }
        std::memcpy(out + 2 + 8 * ib, &idx_word, 4);
        std::memcpy(out + 2 + 8 * ib + 4, &sign_word, 4);
    }
}

// shared IQ2_XS / IQ2_S body (16-element sub-blocks, per-sub-block 4-bit
// scales; spec _quant_iq2_fine; reference :3127 and :4749)
static void quant_iq2_fine_block(const float* x, const float* qw, uint8_t* out,
                                 const IQLattice& la, int is_range, bool parity,
                                 float eps, float d_fudge, bool variant_xs,
                                 float sigma_mul) {
    float sigma2 = (sigma_mul * seq_sumsq(x, QK_K)) / (float)QK_K;
    float scales_ib[16];
    int gi_sb[16][2];
    uint32_t signs_sb[16][2];
    for (int ib = 0; ib < 16; ++ib) {
        const float* xb = x + 16 * ib;
        float weight[16], waux[16], xval[16];
        if (qw != nullptr) {
            const float* qwb = qw + 16 * ib;
            for (int i = 0; i < 16; ++i)
                weight[i] = qwb[i] * std::sqrt(sigma2 + xb[i] * xb[i]);
        } else {  // iq2_s unweighted fallback
            for (int i = 0; i < 16; ++i)
                weight[i] = 0.25f * sigma2 + xb[i] * xb[i];
        }
        for (int i = 0; i < 16; ++i) waux[i] = std::sqrt(weight[i]);
        uint32_t signs[2];
        for (int g = 0; g < 2; ++g)
            iq_signed_split8(xb + 8 * g, weight + 8 * g, xval + 8 * g,
                             &signs[g], parity);
        float maxv = xval[0];
        for (int i = 1; i < 16; ++i) if (xval[i] > maxv) maxv = xval[i];
        bool dead = maxv < eps;

        float safe_max = maxv != 0.0f ? maxv : 1.0f;
        float scale = safe_max / 5.0f;  // max/(2*kMaxQ-1)
        float best = 0.0f;
        int8_t L[16] = {0};
        int on_grid[2] = {1, 1};
        for (int is = -is_range; is <= is_range; ++is) {
            float id = (5.0f + (float)is * 0.1f) / safe_max;
            float this_scale = 1.0f / id;
            int8_t Laux[16];
            int on_aux[2];
            for (int i = 0; i < 16; ++i)
                Laux[i] = (int8_t)clip(
                    nearest_int(0.5f * (id * xval[i] - 1.0f)), 0, 2);
            for (int g = 0; g < 2; ++g)
                iq_lookup_group(la, Laux + 8 * g, xval + 8 * g, waux + 8 * g,
                                this_scale, &on_aux[g]);
            float sqx, sq2;
            iq_sum_qx_q2(weight, xval, Laux, 16, &sqx, &sq2);
            if (sq2 > 0.0f && sqx * sqx > best * sq2) {
                scale = sqx / sq2;
                best = scale * sqx;
                std::memcpy(L, Laux, 16);
                on_grid[0] = on_aux[0]; on_grid[1] = on_aux[1];
            }
        }
        // refresh only off-grid groups with the final scale
        if ((!on_grid[0] || !on_grid[1]) && scale > 0.0f) {
            float id = 1.0f / scale;
            int8_t Lg[16];
            std::memcpy(Lg, L, 16);
            for (int g = 0; g < 2; ++g) {
                if (on_grid[g]) continue;
                int8_t lq[8];
                for (int i = 0; i < 8; ++i)
                    lq[i] = (int8_t)clip(
                        nearest_int(0.5f * (id * xval[8 * g + i] - 1.0f)), 0, 2);
                int64_t u = iq_pack(la, lq);
                int gi = la.kmap[u];
                if (gi < 0) {
                    gi = iq_best_neighbour(la, u, xval + 8 * g, waux + 8 * g,
                                           scale);
                    for (int i = 0; i < 8; ++i) lq[i] = la.L[gi * 8 + i];
                }
                std::memcpy(Lg + 8 * g, lq, 8);
            }
            float sqx, sq2;
            iq_sum_qx_q2(weight, xval, Lg, 16, &sqx, &sq2);
            if (sq2 > 0.0f) scale = sqx / sq2;
            std::memcpy(L, Lg, 16);
        }
        if (scale < 0.0f) {
            scale = -scale;
            uint32_t smask = parity ? 127u : 255u;
            for (int g = 0; g < 2; ++g) signs[g] = (~signs[g]) & smask;
        }
        for (int g = 0; g < 2; ++g) {
            int on;
            gi_sb[ib][g] = iq_lookup_group(la, L + 8 * g, xval + 8 * g,
                                           waux + 8 * g, scale, &on);
        }
        if (dead) {
            gi_sb[ib][0] = gi_sb[ib][1] = 0;
            signs[0] = signs[1] = 0;
            scale = 0.0f;
        }
        signs_sb[ib][0] = signs[0]; signs_sb[ib][1] = signs[1];
        scales_ib[ib] = scale;
    }

    float max_scale = scales_ib[0];
    for (int ib = 1; ib < 16; ++ib)
        if (scales_ib[ib] > max_scale) max_scale = scales_ib[ib];
    bool sb_live = max_scale != 0.0f;
    float d = max_scale / 31.0f;
    float id_sb = 1.0f / (sb_live ? d : 1.0f);
    int l_ib[16];
    for (int ib = 0; ib < 16; ++ib)
        l_ib[ib] = sb_live
            ? clip(nearest_int(0.5f * (id_sb * scales_ib[ib] - 1.0f)), 0, 15)
            : 0;

    uint16_t d16 = f32_to_f16_bits(sb_live ? d * d_fudge : 0.0f);
    uint8_t scale_bytes[8];
    for (int j = 0; j < 8; ++j)
        scale_bytes[j] = (uint8_t)(l_ib[2 * j] | (l_ib[2 * j + 1] << 4));

    if (variant_xs) {
        // reference memsets qs on !max_scale (src/ggml-quants.c:3289)
        out[0] = (uint8_t)(d16 & 0xFF); out[1] = (uint8_t)(d16 >> 8);
        for (int ib = 0; ib < 16; ++ib)
            for (int g = 0; g < 2; ++g) {
                uint16_t q2 = sb_live
                    ? (uint16_t)(gi_sb[ib][g] | (signs_sb[ib][g] << 9)) : 0;
                std::memcpy(out + 2 + 2 * (2 * ib + g), &q2, 2);
            }
        std::memcpy(out + 66, scale_bytes, 8);
        return;
    }
    // iq2_s: qs (32 idx bytes + 32 sign bytes), qh, scales; packed bytes are
    // retained even when max_scale == 0 (no memset on the continue path)
    out[0] = (uint8_t)(d16 & 0xFF); out[1] = (uint8_t)(d16 >> 8);
    uint8_t qh[8] = {0};
    for (int ib = 0; ib < 16; ++ib)
        for (int g = 0; g < 2; ++g) {
            int i8 = 2 * ib + g;
            out[2 + i8] = (uint8_t)(gi_sb[ib][g] & 255);
            out[34 + i8] = (uint8_t)signs_sb[ib][g];
            qh[i8 / 4] |= (uint8_t)((gi_sb[ib][g] >> 8) << (2 * (i8 % 4)));
        }
    std::memcpy(out + 66, qh, 8);
    std::memcpy(out + 74, scale_bytes, 8);
}

static void quant_iq2_xs_block(const float* x, const float* qw, uint8_t* out) {
    quant_iq2_fine_block(x, qw, out, g_lat[1], 9, /*parity=*/true,
                         GROUP_MAX_EPS, 1.0f, /*variant_xs=*/true, 1.0f);
}

static void quant_iq2_s_block(const float* x, const float* qw, uint8_t* out) {
    quant_iq2_fine_block(x, qw, out, g_lat[2], 9, /*parity=*/false,
                         1e-8f /*GROUP_MAX_EPS_IQ2_S*/, 0.9875f,
                         /*variant_xs=*/false, 2.0f);
}

// shared IQ3_XXS / IQ3_S search for ONE 32-element sub-block (8 groups of 4,
// kMaxQ=8; spec _quant_iq3_core; reference :3548 / :3778)
static void iq3_search_subblock(const IQLattice& la, const float* xb,
                                const float* qwb, float sigma2, int is_range,
                                float step, bool parity, bool eps_zero,
                                float eps, bool refresh_all, bool on_init,
                                int gi_out[8], uint32_t signs_out[4],
                                float* scale_out, int* dead_out) {
    float weight[32], waux[32], xval[32];
    if (qwb != nullptr) {
        for (int i = 0; i < 32; ++i)
            weight[i] = qwb[i] * std::sqrt(sigma2 + xb[i] * xb[i]);
    } else {
        for (int i = 0; i < 32; ++i) weight[i] = xb[i] * xb[i];
    }
    for (int i = 0; i < 32; ++i) waux[i] = std::sqrt(weight[i]);
    uint32_t signs[4];
    for (int g = 0; g < 4; ++g)
        iq_signed_split8(xb + 8 * g, weight + 8 * g, xval + 8 * g,
                         &signs[g], parity);
    float maxv = xval[0];
    for (int i = 1; i < 32; ++i) if (xval[i] > maxv) maxv = xval[i];
    bool dead = eps_zero ? (maxv == 0.0f) : (maxv < eps);

    float safe_max = maxv != 0.0f ? maxv : 1.0f;
    float scale = safe_max / 15.0f;  // max/(2*kMaxQ-1)
    float best = 0.0f;
    int8_t L[32] = {0};
    int on_grid[8];
    for (int g = 0; g < 8; ++g) on_grid[g] = on_init ? 1 : 0;
    for (int is = -is_range; is <= is_range; ++is) {
        float id = (15.0f + (float)is * step) / safe_max;
        float this_scale = 1.0f / id;
        int8_t Laux[32];
        int on_aux[8];
        for (int i = 0; i < 32; ++i)
            Laux[i] = (int8_t)clip(
                nearest_int(0.5f * (id * xval[i] - 1.0f)), 0, 7);
        for (int g = 0; g < 8; ++g)
            iq_lookup_group(la, Laux + 4 * g, xval + 4 * g, waux + 4 * g,
                            this_scale, &on_aux[g]);
        float sqx, sq2;
        iq_sum_qx_q2(weight, xval, Laux, 32, &sqx, &sq2);
        if (sq2 > 0.0f && sqx * sqx > best * sq2) {
            scale = sqx / sq2;
            best = scale * sqx;
            std::memcpy(L, Laux, 32);
            std::memcpy(on_grid, on_aux, sizeof(on_aux));
        }
    }
    bool all_on = true;
    for (int g = 0; g < 8; ++g) all_on = all_on && on_grid[g];
    if (!all_on && scale > 0.0f) {
        float id = 1.0f / (scale != 0.0f ? scale : 1.0f);
        int8_t Lg[32];
        std::memcpy(Lg, L, 32);
        for (int g = 0; g < 8; ++g) {
            if (!refresh_all && on_grid[g]) continue;
            int8_t lq[4];
            for (int i = 0; i < 4; ++i)
                lq[i] = (int8_t)clip(
                    nearest_int(0.5f * (id * xval[4 * g + i] - 1.0f)), 0, 7);
            int64_t u = iq_pack(la, lq);
            int gi = la.kmap[u];
            if (gi < 0) {
                gi = iq_best_neighbour(la, u, xval + 4 * g, waux + 4 * g, scale);
                for (int i = 0; i < 4; ++i) lq[i] = la.L[gi * 4 + i];
            }
            std::memcpy(Lg + 4 * g, lq, 4);
        }
        float sqx, sq2;
        iq_sum_qx_q2(weight, xval, Lg, 32, &sqx, &sq2);
        if (sq2 > 0.0f) scale = sqx / sq2;
        std::memcpy(L, Lg, 32);
    }
    if (scale < 0.0f) {
        scale = -scale;
        uint32_t smask = parity ? 127u : 255u;
        for (int g = 0; g < 4; ++g) signs[g] = (~signs[g]) & smask;
    }
    for (int g = 0; g < 8; ++g) {
        int on;
        gi_out[g] = iq_lookup_group(la, L + 4 * g, xval + 4 * g, waux + 4 * g,
                                    scale, &on);
    }
    if (dead) {
        for (int g = 0; g < 8; ++g) gi_out[g] = 0;
        for (int g = 0; g < 4; ++g) signs[g] = 0;
        scale = 0.0f;
    }
    for (int g = 0; g < 4; ++g) signs_out[g] = signs[g];
    *scale_out = scale;
    *dead_out = dead ? 1 : 0;
}

static void quant_iq3_xxs_block(const float* x, const float* qw, uint8_t* out) {
    const IQLattice& la = g_lat[3];
    float sigma2 = (2.0f * seq_sumsq(x, QK_K)) / (float)QK_K;
    int gi[8][8];
    uint32_t signs[8][4];
    float scales_ib[8];
    int dead;
    for (int ib = 0; ib < 8; ++ib)
        iq3_search_subblock(la, x + 32 * ib, qw ? qw + 32 * ib : nullptr,
                            sigma2, 15, 0.2f, /*parity=*/true,
                            /*eps_zero=*/false, 1e-8f /*IQ3_XXS eps*/,
                            /*refresh_all=*/false, /*on_init=*/true,
                            gi[ib], signs[ib], &scales_ib[ib], &dead);
    float max_scale = scales_ib[0];
    for (int ib = 1; ib < 8; ++ib)
        if (scales_ib[ib] > max_scale) max_scale = scales_ib[ib];
    bool sb_live = max_scale != 0.0f;
    float d = max_scale / 31.0f;
    float id_sb = 1.0f / (sb_live ? d : 1.0f);
    uint16_t d16 = f32_to_f16_bits(sb_live ? d * 1.0125f : 0.0f);
    out[0] = (uint8_t)(d16 & 0xFF); out[1] = (uint8_t)(d16 >> 8);
    for (int ib = 0; ib < 8; ++ib) {
        for (int k = 0; k < 8; ++k)
            out[2 + 8 * ib + k] = sb_live ? (uint8_t)gi[ib][k] : 0;
        uint32_t sw = 0;
        if (sb_live) {
            int l = clip(nearest_int(0.5f * (id_sb * scales_ib[ib] - 1.0f)),
                         0, 15);
            for (int k = 0; k < 4; ++k) sw |= signs[ib][k] << (7 * k);
            sw |= (uint32_t)l << 28;
        }
        std::memcpy(out + 66 + 4 * ib, &sw, 4);
    }
}

static void quant_iq3_s_block(const float* x, const float* qw, uint8_t* out) {
    const IQLattice& la = g_lat[4];
    float sigma2 = (2.0f * seq_sumsq(x, QK_K)) / (float)QK_K;
    int gi[8][8];
    uint32_t signs[8][4];
    float scales_ib[8];
    int dead[8];
    for (int ib = 0; ib < 8; ++ib)
        iq3_search_subblock(la, x + 32 * ib, qw ? qw + 32 * ib : nullptr,
                            sigma2, 9, 0.2f, /*parity=*/false,
                            /*eps_zero=*/true, 0.0f,
                            /*refresh_all=*/true, /*on_init=*/false,
                            gi[ib], signs[ib], &scales_ib[ib], &dead[ib]);
    float max_scale = scales_ib[0];
    for (int ib = 1; ib < 8; ++ib)
        if (scales_ib[ib] > max_scale) max_scale = scales_ib[ib];
    bool sb_live = max_scale != 0.0f;
    float d = max_scale / 31.0f;
    float id_sb = 1.0f / (sb_live ? d : 1.0f);
    uint16_t d16 = f32_to_f16_bits(sb_live ? d * 1.033f : 0.0f);
    std::memset(out, 0, 110);
    out[0] = (uint8_t)(d16 & 0xFF); out[1] = (uint8_t)(d16 >> 8);
    // the reference advances qs/signs write pointers only for LIVE
    // sub-blocks while qh uses the absolute sub-block index (:3934-3936)
    int nlive = 0;
    for (int ib = 0; ib < 8; ++ib) {
        if (!dead[ib]) {
            for (int k = 0; k < 8; ++k) {
                out[2 + 8 * nlive + k] = (uint8_t)(gi[ib][k] & 255);
                out[66 + ib] |= (uint8_t)((gi[ib][k] >> 8) << k);
            }
            for (int k = 0; k < 4; ++k)
                out[74 + 4 * nlive + k] = (uint8_t)signs[ib][k];
            ++nlive;
        }
    }
    int l_ib[8];
    for (int ib = 0; ib < 8; ++ib)
        l_ib[ib] = sb_live
            ? clip(nearest_int(0.5f * (id_sb * scales_ib[ib] - 1.0f)), 0, 15)
            : 0;
    for (int j = 0; j < 4; ++j)
        out[106 + j] = (uint8_t)(l_ib[2 * j] | (l_ib[2 * j + 1] << 4));
}

// ---- IQ1_S / IQ1_M (ternary codes over the iq1 grid) -----------------------
// spec: quant_iq1_s / quant_iq1_m (reference quantize_row_iq1_s_impl :4116,
// iq1_m :4294).  The exact-SSD ternary split scans every (i1, i2) cut of the
// sorted block via sequential-f32 prefix sums.

static const float IQ1_DELTA = 0.125f;

// iq1_find_best_neighbour2 (spec _best_neighbours_iq1): weighted L2 against
// the per-block ternary value table xg[3]; raw weight (not sqrt), raw
// SIGNED xb; first minimum wins
static int iq1_best_neighbour(const IQLattice& la, int64_t u, const float* xb,
                              const float* w, float scale, const float* xg) {
    int32_t lo = la.noff[u], hi = la.noff[u + 1];
    int best = la.ndata[lo];
    float bestd = INFINITY;
#if defined(__AVX2__)
    {
        // q = xg[code] via an 8-slot permute LUT (codes are 0..2); the
        // per-candidate accumulation stays a strictly sequential 8-add
        // chain, two independent chains in flight (exact values unchanged)
        const __m256 xgv = _mm256_setr_ps(xg[0], xg[1], xg[2], 0, 0, 0, 0, 0);
        const __m256 xv = _mm256_loadu_ps(xb);
        const __m256 wv = _mm256_loadu_ps(w);
        const __m256 sc = _mm256_set1_ps(scale);
        int32_t n = lo;
        for (; n + 2 <= hi; n += 2) {
            int g0 = la.ndata[n], g1 = la.ndata[n + 1];
            __m256i c0 = _mm256_cvtepi8_epi32(
                _mm_loadl_epi64((const __m128i*)&la.L[(size_t)g0 * 8]));
            __m256i c1 = _mm256_cvtepi8_epi32(
                _mm_loadl_epi64((const __m128i*)&la.L[(size_t)g1 * 8]));
            __m256 q0 = _mm256_permutevar8x32_ps(xgv, c0);
            __m256 q1 = _mm256_permutevar8x32_ps(xgv, c1);
            __m256 d0 = _mm256_sub_ps(_mm256_mul_ps(sc, q0), xv);
            __m256 d1 = _mm256_sub_ps(_mm256_mul_ps(sc, q1), xv);
            __m256 p0 = _mm256_mul_ps(_mm256_mul_ps(wv, d0), d0);
            __m256 p1 = _mm256_mul_ps(_mm256_mul_ps(wv, d1), d1);
            float prod0[8], prod1[8];
            _mm256_storeu_ps(prod0, p0);
            _mm256_storeu_ps(prod1, p1);
            float a0 = 0.0f, a1 = 0.0f;
            for (int i = 0; i < 8; ++i) {
                a0 = a0 + prod0[i];
                a1 = a1 + prod1[i];
            }
            if (a0 < bestd) { bestd = a0; best = g0; }
            if (a1 < bestd) { bestd = a1; best = g1; }
        }
        for (; n < hi; ++n) {
            int g = la.ndata[n];
            float acc = 0.0f;
            for (int i = 0; i < 8; ++i) {
                float q = xg[la.L[g * 8 + i]];
                float diff = scale * q - xb[i];
                acc = acc + (w[i] * diff) * diff;
            }
            if (acc < bestd) { bestd = acc; best = g; }
        }
        return best;
    }
#endif
    for (int32_t n = lo; n < hi; ++n) {
        int g = la.ndata[n];
        float acc = 0.0f;
        for (int i = 0; i < 8; ++i) {
            float q = xg[la.L[g * 8 + i]];
            float diff = scale * q - xb[i];
            acc = acc + (w[i] * diff) * diff;
        }
        if (acc < bestd) { bestd = acc; best = g; }
    }
    return best;
}

// stable ascending argsort + sequential prefix sums (spec _iq1_prefix_split)
static void iq1_prefix_split(const float* xb, const float* w, int bs,
                             int* order, int* rank, float* xs, float* ws,
                             float* sumx, float* sumw) {
    for (int j = 0; j < bs; ++j) order[j] = j;
    std::stable_sort(order, order + bs,
                     [&](int a, int b) { return xb[a] < xb[b]; });
    for (int j = 0; j < bs; ++j) {
        rank[order[j]] = j;
        xs[j] = xb[order[j]];
        ws[j] = w[order[j]];
    }
    sumx[0] = 0.0f; sumw[0] = 0.0f;
    for (int j = 0; j < bs; ++j) {
        sumx[j + 1] = sumx[j] + ws[j] * xs[j];
        sumw[j + 1] = sumw[j] + ws[j];
    }
}

static void quant_iq1_s_block(const float* x, const float* qw, uint8_t* out) {
    const IQLattice& la = g_lat[5];
    const int bs = 32;
    float sigma2 = (2.0f * seq_sumsq(x, QK_K)) / (float)QK_K;
    const float x_p[3] = {-1.0f + IQ1_DELTA, IQ1_DELTA, 1.0f + IQ1_DELTA};
    const float x_m[3] = {-1.0f - IQ1_DELTA, -IQ1_DELTA, 1.0f - IQ1_DELTA};
    const float FLT_MIN_F = 1.17549435e-38f;

    float scales_ib[8];
    int shift_sb[8];
    int gi_all[8][4];
    for (int ib = 0; ib < 8; ++ib) {
        const float* xb = x + bs * ib;
        const float* qwb = qw + bs * ib;
        float weight[32];
        for (int i = 0; i < bs; ++i)
            weight[i] = qwb[i] * std::sqrt(sigma2 + xb[i] * xb[i]);
        float maxv = std::fabs(xb[0]);
        for (int i = 1; i < bs; ++i) {
            float a = std::fabs(xb[i]);
            if (a > maxv) maxv = a;
        }
        bool dead = maxv < 1e-12f;  // GROUP_MAX_EPS_IQ1_S

        int order[32], rank[32];
        float xs[32], ws[32], sumx[33], sumw[33];
        iq1_prefix_split(xb, weight, bs, order, rank, xs, ws, sumx, sumw);

        float best = -FLT_MIN_F;
        float scale = maxv;
        int bi1 = 0, bi2 = 0;
        int shift = 0;
        for (int i1 = 0; i1 <= bs; ++i1)
            for (int i2 = i1; i2 <= bs; ++i2)
                for (int v = 0; v < 2; ++v) {
                    const float* xx = v == 0 ? x_p : x_m;
                    int sh = v == 0 ? 1 : -1;
                    float sumqx = (sumx[i1] - sumx[0]) * xx[0]
                                + (sumx[i2] - sumx[i1]) * xx[1]
                                + (sumx[bs] - sumx[i2]) * xx[2];
                    float sumq2 = ((sumw[i1] - sumw[0]) * xx[0]) * xx[0]
                                + ((sumw[i2] - sumw[i1]) * xx[1]) * xx[1]
                                + ((sumw[bs] - sumw[i2]) * xx[2]) * xx[2];
                    if (sumq2 > 0.0f && sumqx * sumqx > best * sumq2) {
                        scale = sumqx / sumq2;
                        best = scale * sumqx;
                        bi1 = i1; bi2 = i2; shift = sh;
                    }
                }
        int8_t L[32];
        for (int i = 0; i < bs; ++i)
            L[i] = (int8_t)((rank[i] >= bi1 ? 1 : 0) + (rank[i] >= bi2 ? 1 : 0));
        if (scale < 0.0f) {
            for (int i = 0; i < bs; ++i) L[i] = (int8_t)(2 - L[i]);
            scale = -scale;
            shift = -shift;
        }
        const float* xg = shift == 1 ? x_p : x_m;
        int gi[4];
        bool any_off = false;
        for (int g = 0; g < 4; ++g) {
            int64_t u = iq_pack(la, L + 8 * g);
            gi[g] = la.kmap[u];
            if (gi[g] < 0) {
                any_off = true;
                gi[g] = iq1_best_neighbour(la, u, xb + 8 * g, weight + 8 * g,
                                           scale, xg);
            }
        }
        if (any_off) {  // rescale over the packed codes (q = xg[L_grid])
            float sumqx = 0.0f, sumq2 = 0.0f;
            for (int g = 0; g < 4; ++g)
                for (int i = 0; i < 8; ++i) {
                    float q = xg[la.L[gi[g] * 8 + i]];
                    float w = weight[8 * g + i];
                    sumqx = sumqx + (w * q) * xb[8 * g + i];
                    sumq2 = sumq2 + (w * q) * q;
                }
            if (sumqx > 0.0f && sumq2 > 0.0f) scale = sumqx / sumq2;
        }
        if (dead) {
            for (int g = 0; g < 4; ++g) gi[g] = 0;
            scale = 0.0f;
            shift = 1;
        }
        for (int g = 0; g < 4; ++g) gi_all[ib][g] = gi[g];
        scales_ib[ib] = scale;
        shift_sb[ib] = shift;
    }

    float max_scale = scales_ib[0];
    for (int ib = 1; ib < 8; ++ib)
        if (scales_ib[ib] > max_scale) max_scale = scales_ib[ib];
    bool sb_live = max_scale != 0.0f;
    float d = max_scale / 15.0f;
    float id_sb = 1.0f / (sb_live ? d : 1.0f);
    uint16_t d16 = f32_to_f16_bits(sb_live ? d * 1.125f : 0.0f);
    out[0] = (uint8_t)(d16 & 0xFF); out[1] = (uint8_t)(d16 >> 8);
    for (int ib = 0; ib < 8; ++ib) {
        int l = sb_live
            ? clip(nearest_int(0.5f * (id_sb * scales_ib[ib] - 1.0f)), 0, 7)
            : 0;
        if (shift_sb[ib] == -1) l |= 8;
        uint16_t h = 0;
        for (int k = 0; k < 4; ++k) {
            out[2 + 4 * ib + k] = (uint8_t)(gi_all[ib][k] & 255);
            h |= (uint16_t)((gi_all[ib][k] >> 8) << (3 * k));
        }
        if (sb_live) h |= (uint16_t)l << 12;
        std::memcpy(out + 34 + 2 * ib, &h, 2);
    }
}

// IQ1_M: 16-element blocks, per-half ternary-table variants, final
// superblock-d weighted refit (spec quant_iq1_m; reference :4294)
static void quant_iq1_m_block(const float* x, const float* qw, uint8_t* out) {
    const IQLattice& la = g_lat[5];
    const int bs = 16, nib = 16;
    float sigma2 = (2.0f * seq_sumsq(x, QK_K)) / (float)QK_K;
    const float x_p[3] = {-1.0f + IQ1_DELTA, IQ1_DELTA, 1.0f + IQ1_DELTA};
    const float x_m[3] = {-1.0f - IQ1_DELTA, -IQ1_DELTA, 1.0f - IQ1_DELTA};
    const uint8_t masks[4] = {0x00, 0x80, 0x08, 0x88};
    const float FLT_MIN_F = 1.17549435e-38f;

    float weight_all[256];
    float scales_ib[16];
    int bk_sb[16];
    int gi_all[16][2];
    for (int ib = 0; ib < nib; ++ib) {
        const float* xb = x + bs * ib;
        float* weight = weight_all + bs * ib;
        if (qw != nullptr) {
            const float* qwb = qw + bs * ib;
            for (int i = 0; i < bs; ++i)
                weight[i] = qwb[i] * std::sqrt(sigma2 + xb[i] * xb[i]);
        } else {
            for (int i = 0; i < bs; ++i) weight[i] = xb[i] * xb[i];
        }
        float maxv = std::fabs(xb[0]);
        for (int i = 1; i < bs; ++i) {
            float a = std::fabs(xb[i]);
            if (a > maxv) maxv = a;
        }
        bool dead = maxv < 1e-7f;  // GROUP_MAX_EPS_IQ1_M

        int order[16], rank[16];
        float xs[16], ws[16], sumx[17], sumw[17];
        iq1_prefix_split(xb, weight, bs, order, rank, xs, ws, sumx, sumw);

        float best = -FLT_MIN_F;
        float scale = maxv;
        int bi1 = 0, bi2 = 0, bk = 0;
#if defined(__AVX2__)
        // vectorize the 4 k-variants across SSE lanes: each lane keeps the
        // spec's j-sequential fp32 accumulation (byte-identical); only the
        // 4 independent chains run together.  qk per (half, seg) lane
        // vector is one of 6 precomputed constants.
        __m128 qtab[2][3];
        for (int seg = 0; seg < 3; ++seg) {
            qtab[0][seg] = _mm_setr_ps(x_p[seg], x_p[seg], x_m[seg], x_m[seg]);
            qtab[1][seg] = _mm_setr_ps(x_p[seg], x_m[seg], x_p[seg], x_m[seg]);
        }
        for (int i1 = 0; i1 <= bs; ++i1)
            for (int i2 = i1; i2 <= bs; ++i2) {
                __m128 sqx4 = _mm_setzero_ps(), sq24 = _mm_setzero_ps();
                for (int j = 0; j < bs; ++j) {
                    int seg = j < i1 ? 0 : (j < i2 ? 1 : 2);
                    __m128 q = qtab[order[j] < bs / 2 ? 0 : 1][seg];
                    __m128 wq = _mm_mul_ps(_mm_set1_ps(ws[j]), q);
                    sqx4 = _mm_add_ps(sqx4, _mm_mul_ps(wq, _mm_set1_ps(xs[j])));
                    sq24 = _mm_add_ps(sq24, _mm_mul_ps(wq, q));
                }
                float sqx[4], sq2[4];
                _mm_storeu_ps(sqx, sqx4);
                _mm_storeu_ps(sq2, sq24);
                for (int k = 0; k < 4; ++k)
                    if (sq2[k] > 0.0f && sqx[k] * sqx[k] > best * sq2[k]) {
                        scale = sqx[k] / sq2[k];
                        best = scale * sqx[k];
                        bi1 = i1; bi2 = i2; bk = k;
                    }
            }
#else
        for (int i1 = 0; i1 <= bs; ++i1)
            for (int i2 = i1; i2 <= bs; ++i2) {
                float sqx[4] = {0, 0, 0, 0}, sq2[4] = {0, 0, 0, 0};
                for (int j = 0; j < bs; ++j) {
                    int seg = j < i1 ? 0 : (j < i2 ? 1 : 2);
                    float w = ws[j], xv = xs[j];
                    bool lo = order[j] < bs / 2;
                    for (int k = 0; k < 4; ++k) {
                        float qk = lo ? (k < 2 ? x_p[seg] : x_m[seg])
                                      : (k % 2 == 0 ? x_p[seg] : x_m[seg]);
                        sqx[k] = sqx[k] + (w * qk) * xv;
                        sq2[k] = sq2[k] + (w * qk) * qk;
                    }
                }
                for (int k = 0; k < 4; ++k)
                    if (sq2[k] > 0.0f && sqx[k] * sqx[k] > best * sq2[k]) {
                        scale = sqx[k] / sq2[k];
                        best = scale * sqx[k];
                        bi1 = i1; bi2 = i2; bk = k;
                    }
            }
#endif
        int8_t L[16];
        for (int i = 0; i < bs; ++i)
            L[i] = (int8_t)((rank[i] >= bi1 ? 1 : 0) + (rank[i] >= bi2 ? 1 : 0));
        if (scale < 0.0f) {
            for (int i = 0; i < bs; ++i) L[i] = (int8_t)(2 - L[i]);
            scale = -scale;
            bk = 3 - bk;  // np.choose(bk, [3,2,1,0])
        }
        // per-group ternary table: group 0 -> p if bk<2, group 1 -> p if bk%2==0
        const float* xg[2] = {bk < 2 ? x_p : x_m, bk % 2 == 0 ? x_p : x_m};
        int gi[2];
        bool any_off = false;
        for (int g = 0; g < 2; ++g) {
            int64_t u = iq_pack(la, L + 8 * g);
            gi[g] = la.kmap[u];
            if (gi[g] < 0) {
                any_off = true;
                gi[g] = iq1_best_neighbour(la, u, xb + 8 * g, weight + 8 * g,
                                           scale, xg[g]);
            }
        }
        if (any_off) {
            float sumqx = 0.0f, sumq2 = 0.0f;
            for (int g = 0; g < 2; ++g)
                for (int i = 0; i < 8; ++i) {
                    float q = xg[g][la.L[gi[g] * 8 + i]];
                    float w = weight[8 * g + i];
                    sumqx = sumqx + (w * q) * xb[8 * g + i];
                    sumq2 = sumq2 + (w * q) * q;
                }
            if (sumqx > 0.0f && sumq2 > 0.0f) scale = sumqx / sumq2;
        }
        if (dead) {
            gi[0] = gi[1] = 0;
            scale = 0.0f;
            bk = 0;
        }
        gi_all[ib][0] = gi[0]; gi_all[ib][1] = gi[1];
        scales_ib[ib] = scale;
        bk_sb[ib] = bk;
    }

    float max_scale = scales_ib[0];
    for (int ib = 1; ib < nib; ++ib)
        if (scales_ib[ib] > max_scale) max_scale = scales_ib[ib];
    bool sb_live = max_scale != 0.0f;
    float d0 = max_scale / 15.0f;
    float id_sb = 1.0f / (sb_live ? d0 : 1.0f);
    int l_ib[16];
    for (int ib = 0; ib < nib; ++ib)
        l_ib[ib] = sb_live
            ? clip(nearest_int(0.5f * (id_sb * scales_ib[ib] - 1.0f)), 0, 7)
            : 0;

    uint8_t qs[32], qh[16];
    for (int ib = 0; ib < nib; ++ib) {
        qs[2 * ib] = (uint8_t)(gi_all[ib][0] & 255);
        qs[2 * ib + 1] = (uint8_t)(gi_all[ib][1] & 255);
        qh[ib] = (uint8_t)((gi_all[ib][0] >> 8) | ((gi_all[ib][1] >> 8) << 4));
        if (sb_live) qh[ib] |= masks[bk_sb[ib]];
    }

    // final superblock d: weighted LSQ refit over the packed codes
    // (src/ggml-quants.c:4505-4538)
    float sumqx_f = 0.0f, sumq2_f = 0.0f;
    for (int ib = 0; ib < nib; ++ib) {
        float l = (float)l_ib[ib];
        for (int k = 0; k < 2; ++k) {
            int idx_full = (int)qs[2 * ib + k]
                | (((int)qh[ib] << (8 - 4 * k)) & 0x700);
            const float* xg = (k == 0 ? (bk_sb[ib] < 2) : (bk_sb[ib] % 2 == 0))
                ? x_p : x_m;
            for (int j = 0; j < 8; ++j) {
                float qv = xg[la.L[idx_full * 8 + j]] * (2.0f * l + 1.0f);
                float w = weight_all[16 * ib + 8 * k + j];
                float xv = x[16 * ib + 8 * k + j];
                sumqx_f = sumqx_f + (w * qv) * xv;
                sumq2_f = sumq2_f + (w * qv) * qv;
            }
        }
    }
    float d_fin = sumq2_f > 0.0f ? sumqx_f / sumq2_f : d0;
    uint16_t d16 = f32_to_f16_bits(sb_live ? d_fin * 1.1125f : 0.0f);

    uint16_t sc[4] = {0, 0, 0, 0};
    for (int ib = 0; ib < nib; ++ib)
        sc[ib / 4] |= (uint16_t)l_ib[ib] << (3 * (ib % 4));
    if (sb_live) {
        sc[0] |= (uint16_t)((d16 & 0x000F) << 12);
        sc[1] |= (uint16_t)((d16 & 0x00F0) << 8);
        sc[2] |= (uint16_t)((d16 & 0x0F00) << 4);
        sc[3] |= (uint16_t)(d16 & 0xF000);
    }
    std::memcpy(out, qs, 32);
    std::memcpy(out + 32, qh, 16);
    std::memcpy(out + 48, sc, 8);
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
    switch (ggml_type) {
        case 8:   // Q8_0
        case 10:  // Q2_K
        case 11:  // Q3_K
        case 12:  // Q4_K
        case 13:  // Q5_K
        case 14:  // Q6_K
        case 20:  // IQ4_NL
        case 23:  // IQ4_XS
            return 1;
        case 16:  // IQ2_XXS: needs its lattice uploaded (and an imatrix)
            return g_lat[0].ready ? 1 : 0;
        case 17:  // IQ2_XS
            return g_lat[1].ready ? 1 : 0;
        case 22:  // IQ2_S
            return g_lat[2].ready ? 1 : 0;
        case 18:  // IQ3_XXS
            return g_lat[3].ready ? 1 : 0;
        case 21:  // IQ3_S
            return g_lat[4].ready ? 1 : 0;
        case 19:  // IQ1_S
        case 29:  // IQ1_M
            return g_lat[5].ready ? 1 : 0;
    }
    return 0;
}

// which types take imatrix weights natively (qw != NULL honored)
int gt_quantize_imatrix_supported(int ggml_type) {
    switch (ggml_type) {
        case 20:  // IQ4_NL
        case 23:  // IQ4_XS
            return 1;
        case 16:  // IQ2_XXS (lattice types additionally need their lattice)
            return g_lat[0].ready ? 1 : 0;
        case 17:  // IQ2_XS
            return g_lat[1].ready ? 1 : 0;
        case 22:  // IQ2_S
            return g_lat[2].ready ? 1 : 0;
        case 18:  // IQ3_XXS
            return g_lat[3].ready ? 1 : 0;
        case 21:  // IQ3_S
            return g_lat[4].ready ? 1 : 0;
        case 19:  // IQ1_S
        case 29:  // IQ1_M
            return g_lat[5].ready ? 1 : 0;
    }
    return 0;
}

// upload a code lattice (slot ids: 0=iq2_xxs, 1=iq2_xs, 2=iq2_s, 3=iq3_xxs,
// 4=iq3_s, 5=iq1).  codes: (ngrid, dim) int8.  Idempotent per slot.
int gt_iq_set_lattice(int slot, const int8_t* codes, int ngrid, int dim,
                      int shift, int nwant, int kmap_size) {
    if (slot < 0 || slot >= 8) return 1;
    std::lock_guard<std::mutex> lk(g_lat_mu);
    if (g_lat[slot].ready) return 0;
    iq_lat_build(g_lat[slot], codes, ngrid, dim, shift, nwant, kmap_size);
    return 0;
}

// qw: optional (k,) f32 per-column imatrix weights, or NULL
int gt_quantize2(int ggml_type, const float* src, const float* qw,
                 int64_t nrows, int64_t k, uint8_t* dst, int nthreads) {
    int64_t block, bsize;
    void (*fn)(const float*, uint8_t*) = nullptr;
    void (*fnw)(const float*, const float*, uint8_t*) = nullptr;
    if (ggml_type == 12) { block = 256; bsize = 144; fn = quant_q4_k_block; }
    else if (ggml_type == 13) { block = 256; bsize = 176; fn = quant_q5_k_block; }
    else if (ggml_type == 14) { block = 256; bsize = 210; fn = quant_q6_k_block; }
    else if (ggml_type == 10) { block = 256; bsize = 84; fn = quant_q2_k_block; }
    else if (ggml_type == 11) { block = 256; bsize = 110; fn = quant_q3_k_block; }
    else if (ggml_type == 8) { block = 32; bsize = 34; fn = quant_q8_0_block; }
    else if (ggml_type == 20) { block = 32; bsize = 18; fnw = quant_iq4_nl_block; }
    else if (ggml_type == 23) { block = 256; bsize = 136; fnw = quant_iq4_xs_block; }
    else if (ggml_type == 16) {  // IQ2_XXS: imatrix + lattice mandatory
        if (!qw || !g_lat[0].ready) return 4;
        block = 256; bsize = 66; fnw = quant_iq2_xxs_block;
    }
    else if (ggml_type == 17) {  // IQ2_XS: imatrix + lattice mandatory
        if (!qw || !g_lat[1].ready) return 4;
        block = 256; bsize = 74; fnw = quant_iq2_xs_block;
    }
    else if (ggml_type == 22) {  // IQ2_S: lattice mandatory, imatrix optional
        if (!g_lat[2].ready) return 4;
        block = 256; bsize = 82; fnw = quant_iq2_s_block;
    }
    else if (ggml_type == 18) {  // IQ3_XXS: lattice mandatory, imatrix optional
        if (!g_lat[3].ready) return 4;
        block = 256; bsize = 98; fnw = quant_iq3_xxs_block;
    }
    else if (ggml_type == 21) {  // IQ3_S: lattice mandatory, imatrix optional
        if (!g_lat[4].ready) return 4;
        block = 256; bsize = 110; fnw = quant_iq3_s_block;
    }
    else if (ggml_type == 19) {  // IQ1_S: imatrix + lattice mandatory
        if (!qw || !g_lat[5].ready) return 4;
        block = 256; bsize = 50; fnw = quant_iq1_s_block;
    }
    else if (ggml_type == 29) {  // IQ1_M: lattice mandatory, imatrix optional
        if (!g_lat[5].ready) return 4;
        block = 256; bsize = 56; fnw = quant_iq1_m_block;
    }
    else return 1;
    if (fn && qw) return 3;  // imatrix not supported for this type natively
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
            int64_t b = lo;
#if defined(__AVX2__)
            if (ggml_type == 20) {  // IQ4_NL: 8 blocks per fit, lane = block
                for (; b + 8 <= hi; b += 8) {
                    const float* qws[8];
                    for (int l = 0; l < 8; ++l)
                        qws[l] = qw ? qw + ((b + l) % blocks_per_row) * block
                                    : nullptr;
                    quant_iq4_nl_block8(src + b * block, qws, dst + b * bsize);
                }
            }
#endif
            for (; b < hi; ++b) {
                const float* x = src + b * block;
                uint8_t* o = dst + b * bsize;
                if (fn) fn(x, o);
                else {
                    const float* w = qw ? qw + (b % blocks_per_row) * block : nullptr;
                    fnw(x, w, o);
                }
            }
        });
    }
    for (auto& th : ts) th.join();
    return 0;
}

int gt_quantize(int ggml_type, const float* src, int64_t nrows, int64_t k,
                uint8_t* dst, int nthreads) {
    return gt_quantize2(ggml_type, src, nullptr, nrows, k, dst, nthreads);
}

}  // extern "C"
