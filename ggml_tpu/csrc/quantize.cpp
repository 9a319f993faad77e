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
    }
    return 0;
}

// which types take imatrix weights natively (qw != NULL honored)
int gt_quantize_imatrix_supported(int ggml_type) {
    switch (ggml_type) {
        case 20:  // IQ4_NL
        case 23:  // IQ4_XS
            return 1;
    }
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
