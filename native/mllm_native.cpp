// mllm_tpu native runtime library.
//
// C++ (OpenMP) implementations of the host-side hot paths, the TPU-native
// counterpart of the reference's C++ runtime components (SURVEY.md §2.1-2.2):
//   - ggml block dequantization (Q4_0/Q8_0/Q4_K/Q6_K) used at checkpoint load
//     (reference: backends/cpu/third_party/ggml quant kernels)
//   - float -> int8/int4 repacking for the TPU quant-matmul layouts
//     (reference: tools/quantizer QuantWriter)
//   - byte-pair-encoding merge loop (reference: tokenizers/BPE/Bpe.cpp)
//
// Exposed as a plain C ABI consumed via ctypes (mllm_tpu/utils/native.py);
// every entry point has a pure-numpy fallback, so the library is an
// accelerator, not a dependency.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// fp16 helpers (bit-exact with numpy's float16)
// ---------------------------------------------------------------------------

static inline float fp16_to_fp32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t f;
    if (exp == 0) {
        if (mant == 0) {
            f = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(mant & 0x400)) { mant <<= 1; exp--; }
            mant &= 0x3FF;
            f = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        f = sign | 0x7F800000 | (mant << 13);
    } else {
        f = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    std::memcpy(&out, &f, 4);
    return out;
}

// ---------------------------------------------------------------------------
// Dequantization (ggml block layouts; see mllm_tpu/core/dtypes.py)
// ---------------------------------------------------------------------------

void dequant_q4_0(const uint8_t* raw, float* out, int64_t n_blocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; b++) {
        const uint8_t* blk = raw + b * 18;
        float d = fp16_to_fp32(*(const uint16_t*)blk);
        float* o = out + b * 32;
        for (int i = 0; i < 16; i++) {
            uint8_t q = blk[2 + i];
            o[i] = ((int)(q & 0x0F) - 8) * d;
            o[i + 16] = ((int)(q >> 4) - 8) * d;
        }
    }
}

void dequant_q8_0(const uint8_t* raw, float* out, int64_t n_blocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; b++) {
        const uint8_t* blk = raw + b * 34;
        float d = fp16_to_fp32(*(const uint16_t*)blk);
        const int8_t* q = (const int8_t*)(blk + 2);
        float* o = out + b * 32;
        for (int i = 0; i < 32; i++) o[i] = q[i] * d;
    }
}

static inline void q4k_scale_min(const uint8_t* sc, int j, uint8_t* s, uint8_t* m) {
    if (j < 4) {
        *s = sc[j] & 63;
        *m = sc[j + 4] & 63;
    } else {
        *s = (sc[j + 4] & 0x0F) | ((sc[j - 4] >> 6) << 4);
        *m = (sc[j + 4] >> 4) | ((sc[j] >> 6) << 4);
    }
}

void dequant_q4_k(const uint8_t* raw, float* out, int64_t n_blocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; b++) {
        const uint8_t* blk = raw + b * 144;
        float d = fp16_to_fp32(*(const uint16_t*)blk);
        float dmin = fp16_to_fp32(*(const uint16_t*)(blk + 2));
        const uint8_t* sc = blk + 4;
        const uint8_t* qs = blk + 16;
        float* o = out + b * 256;
        for (int chunk = 0; chunk < 4; chunk++) {
            uint8_t s_lo, m_lo, s_hi, m_hi;
            q4k_scale_min(sc, 2 * chunk, &s_lo, &m_lo);
            q4k_scale_min(sc, 2 * chunk + 1, &s_hi, &m_hi);
            float dl = d * s_lo, ml = dmin * m_lo;
            float dh = d * s_hi, mh = dmin * m_hi;
            const uint8_t* q = qs + chunk * 32;
            float* oc = o + chunk * 64;
            for (int i = 0; i < 32; i++) {
                oc[i] = (q[i] & 0x0F) * dl - ml;
                oc[i + 32] = (q[i] >> 4) * dh - mh;
            }
        }
    }
}

void dequant_q6_k(const uint8_t* raw, float* out, int64_t n_blocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; b++) {
        const uint8_t* blk = raw + b * 210;
        const uint8_t* ql = blk;
        const uint8_t* qh = blk + 128;
        const int8_t* sc = (const int8_t*)(blk + 192);
        float d = fp16_to_fp32(*(const uint16_t*)(blk + 208));
        float* o = out + b * 256;
        for (int half = 0; half < 2; half++) {
            const uint8_t* qlh = ql + half * 64;
            const uint8_t* qhh = qh + half * 32;
            const int8_t* sch = sc + half * 8;
            float* oh = o + half * 128;
            for (int l = 0; l < 32; l++) {
                int is = l / 16;
                int q1 = (int)((qlh[l] & 0xF) | (((qhh[l] >> 0) & 3) << 4)) - 32;
                int q2 = (int)((qlh[l + 32] & 0xF) | (((qhh[l] >> 2) & 3) << 4)) - 32;
                int q3 = (int)((qlh[l] >> 4) | (((qhh[l] >> 4) & 3) << 4)) - 32;
                int q4 = (int)((qlh[l + 32] >> 4) | (((qhh[l] >> 6) & 3) << 4)) - 32;
                oh[l] = d * sch[is] * q1;
                oh[l + 32] = d * sch[is + 2] * q2;
                oh[l + 64] = d * sch[is + 4] * q3;
                oh[l + 96] = d * sch[is + 6] * q4;
            }
        }
    }
}

// ---------------------------------------------------------------------------
// TPU-layout repacking (float [N, K] row-major inputs)
// ---------------------------------------------------------------------------

// -> values int8 [K, N] (k-major), scales f32 [N]
void repack_int8(const float* w, int64_t n, int64_t k, int8_t* out, float* scales) {
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n; r++) {
        const float* row = w + r * k;
        float amax = 0.f;
        for (int64_t i = 0; i < k; i++) amax = std::max(amax, std::fabs(row[i]));
        float s = amax > 0.f ? amax / 127.0f : 1.0f;
        scales[r] = s;
        float inv = 1.0f / s;
        for (int64_t i = 0; i < k; i++) {
            int v = (int)std::nearbyint(row[i] * inv);
            v = std::min(127, std::max(-127, v));
            out[i * n + r] = (int8_t)v;  // transposed store
        }
    }
}

// -> planar packed uint8 [K/2, N], scales f32 [K/G, N] (both k-major)
void repack_int4(const float* w, int64_t n, int64_t k, int64_t group,
                 uint8_t* packed, float* scales) {
    int64_t khalf = k / 2;
    int64_t ng = k / group;
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n; r++) {
        const float* row = w + r * k;
        std::vector<uint8_t> q(k);
        for (int64_t g = 0; g < ng; g++) {
            const float* seg = row + g * group;
            float amax = 0.f;
            for (int64_t i = 0; i < group; i++) amax = std::max(amax, std::fabs(seg[i]));
            float s = amax > 0.f ? amax / 7.0f : 1.0f;
            scales[g * n + r] = s;
            float inv = 1.0f / s;
            for (int64_t i = 0; i < group; i++) {
                int v = (int)std::nearbyint(seg[i] * inv);
                v = std::min(7, std::max(-8, v));
                q[g * group + i] = (uint8_t)(v & 0x0F);  // two's-complement nibble
            }
        }
        for (int64_t j = 0; j < khalf; j++) {
            packed[j * n + r] = (uint8_t)(q[j] | (q[j + khalf] << 4));
        }
    }
}

// ---------------------------------------------------------------------------
// Quantization to ggml blocks (offline quantizer hot loop)
// ---------------------------------------------------------------------------

// float -> half with round-to-nearest-even (bit-matches numpy's
// astype(float16) and ggml's conversion, subnormals included)
static inline uint16_t f32_to_f16_rne(float x) {
    uint32_t f;
    std::memcpy(&f, &x, 4);
    uint32_t sign = (f >> 16) & 0x8000;
    uint32_t fexp = (f >> 23) & 0xFF;
    uint32_t mant = f & 0x7FFFFF;
    if (fexp == 0xFF) return (uint16_t)(sign | 0x7C00 | (mant ? 0x200 : 0));
    int32_t exp = (int32_t)fexp - 127 + 15;
    if (exp >= 31) return (uint16_t)(sign | 0x7C00);
    if (exp <= 0) {  // subnormal half (or underflow to zero)
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t q = mant >> shift;
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t half = 1u << (shift - 1);
        if (rem > half || (rem == half && (q & 1))) q++;
        return (uint16_t)(sign | q);  // carry into exp bit = smallest normal: correct
    }
    uint32_t q = mant >> 13;
    uint32_t rem = mant & 0x1FFF;
    if (rem > 0x1000 || (rem == 0x1000 && (q & 1))) q++;
    uint32_t h = ((uint32_t)exp << 10) + q;  // mantissa carry propagates into exp
    if (h >= 0x7C00) h = 0x7C00;
    return (uint16_t)(sign | h);
}

void quant_q8_0(const float* x, uint8_t* out, int64_t n_blocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; b++) {
        const float* v = x + b * 32;
        uint8_t* blk = out + b * 34;
        float amax = 0.f;
        for (int i = 0; i < 32; i++) amax = std::max(amax, std::fabs(v[i]));
        float d = amax / 127.0f;
        float inv = d != 0.f ? 1.0f / d : 0.0f;
        uint16_t h = f32_to_f16_rne(d);
        std::memcpy(blk, &h, 2);
        int8_t* q = (int8_t*)(blk + 2);
        for (int i = 0; i < 32; i++) q[i] = (int8_t)std::nearbyint(v[i] * inv);
    }
}

// ---------------------------------------------------------------------------
// BPE merge loop (rank-based, operates on int32 symbol ids)
//
// The Python side interns the unit vocabulary to dense int ids and passes
// merge rules as a hash of (a<<32|b) -> (rank, merged_id).  One call merges a
// whole pre-tokenized word.  (Reference: Bpe.cpp tryMergeSymbol queue.)
// ---------------------------------------------------------------------------

struct BpeTable {
    std::unordered_map<uint64_t, std::pair<int32_t, int32_t>> rules;  // (a,b) -> (rank, merged)
};

void* bpe_new_table(const int32_t* a, const int32_t* b, const int32_t* rank,
                    const int32_t* merged, int64_t n) {
    auto* t = new BpeTable();
    t->rules.reserve((size_t)n * 2);
    for (int64_t i = 0; i < n; i++) {
        uint64_t key = ((uint64_t)(uint32_t)a[i] << 32) | (uint32_t)b[i];
        t->rules[key] = {rank[i], merged[i]};
    }
    return t;
}

void bpe_free_table(void* table) { delete (BpeTable*)table; }

// word: int32 symbol ids, length n; returns new length after merging in-place
int64_t bpe_merge(void* table, int32_t* word, int64_t n) {
    auto* t = (BpeTable*)table;
    while (n > 1) {
        int32_t best_rank = INT32_MAX;
        int64_t best_i = -1;
        int32_t best_m = -1;
        for (int64_t i = 0; i + 1 < n; i++) {
            uint64_t key = ((uint64_t)(uint32_t)word[i] << 32) | (uint32_t)word[i + 1];
            auto it = t->rules.find(key);
            if (it != t->rules.end() && it->second.first < best_rank) {
                best_rank = it->second.first;
                best_i = i;
                best_m = it->second.second;
            }
        }
        if (best_i < 0) break;
        int32_t a = word[best_i], bsym = word[best_i + 1];
        // merge ALL occurrences of (a, b)
        int64_t w = 0;
        for (int64_t i = 0; i < n;) {
            if (i + 1 < n && word[i] == a && word[i + 1] == bsym) {
                word[w++] = best_m;
                i += 2;
            } else {
                word[w++] = word[i++];
            }
        }
        n = w;
    }
    return n;
}

// ---------------------------------------------------------------------------
// PIL-exact bicubic image resize (uint8, HWC)
// ---------------------------------------------------------------------------
// Re-implementation of Pillow's two-pass fixed-point resampling
// (Resample.c, 8bpc path: precompute_coeffs + normalize_coeffs_8bpc +
// horizontal/vertical passes) so the host preprocessing stage
// (processor/image.py resize, the reference's stb-based bicubic
// processing_qwen2_vl.hpp:84-117 counterpart) runs multithreaded.  Bit-exact
// with PIL.Image.resize(..., BICUBIC) -- verified in tests/test_vision.py.

static const int kResamplePrecisionBits = 32 - 8 - 2;

static inline uint8_t resample_clip8(int in) {
    if (in >= (1 << kResamplePrecisionBits << 8)) return 255;
    if (in <= 0) return 0;
    return (uint8_t)(in >> kResamplePrecisionBits);
}

static inline double bicubic_filter(double x) {
    const double a = -0.5;
    if (x < 0.0) x = -x;
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

// returns ksize; fills bounds[2*out] (xmin, xmax) and int coeffs kk[out*ksize]
static int resample_coeffs(int in_size, int out_size, std::vector<int>& bounds,
                           std::vector<int32_t>& kk) {
    const double support_base = 2.0;  // bicubic
    double scale = (double)in_size / out_size;
    double filterscale = scale < 1.0 ? 1.0 : scale;
    double support = support_base * filterscale;
    int ksize = (int)ceil(support) * 2 + 1;
    bounds.resize(2 * out_size);
    kk.resize((size_t)out_size * ksize);
    std::vector<double> k(ksize);
    for (int xx = 0; xx < out_size; xx++) {
        double center = (xx + 0.5) * scale;
        double ww = 0.0, ss = 1.0 / filterscale;
        int xmin = (int)(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = (int)(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        int x = 0;
        for (; x < xmax; x++) {
            double w = bicubic_filter((x + xmin - center + 0.5) * ss);
            k[x] = w;
            ww += w;
        }
        for (x = 0; x < xmax; x++)
            if (ww != 0.0) k[x] /= ww;
        for (; x < ksize; x++) k[x] = 0.0;
        for (x = 0; x < ksize; x++) {
            double v = k[x] * (1 << kResamplePrecisionBits);
            kk[(size_t)xx * ksize + x] = (int32_t)(v < 0 ? v - 0.5 : v + 0.5);
        }
        bounds[2 * xx] = xmin;
        bounds[2 * xx + 1] = xmax;
    }
    return ksize;
}

// axis-0 resample: src [n_in, stride] -> dst [n_out, stride].  Tap-outer /
// pixel-inner with an int32 accumulator row: the inner loops are contiguous
// mul-adds the compiler auto-vectorizes (the bench host is single-core, so
// SIMD — not OpenMP — is where the time goes).  Arithmetic is identical to
// PIL's per-pixel int32 accumulate, so bit-exactness is preserved.
static void resample_axis0_u8(const uint8_t* src, uint8_t* dst, int n_out,
                              int stride, const std::vector<int>& b,
                              const std::vector<int32_t>& kk, int ksize,
                              int32_t* acc) {
    const int32_t half = 1 << (kResamplePrecisionBits - 1);
    for (int yy = 0; yy < n_out; yy++) {
        int ymin = b[2 * yy], ymax = b[2 * yy + 1];
        const int32_t* k = &kk[(size_t)yy * ksize];
        for (int i = 0; i < stride; i++) acc[i] = half;
        for (int y = 0; y < ymax; y++) {
            // __restrict__: uint8_t aliases everything by the char rule,
            // which otherwise stops gcc vectorizing the mul-add
            const uint8_t* __restrict__ row = src + (size_t)(y + ymin) * stride;
            int32_t* __restrict__ a = acc;
            const int32_t kv = k[y];
            for (int i = 0; i < stride; i++) a[i] += row[i] * kv;
        }
        uint8_t* orow = dst + (size_t)yy * stride;
        for (int i = 0; i < stride; i++) orow[i] = resample_clip8(acc[i]);
    }
}

// u8 transpose [h, w, c] -> [w, h, c], blocked for cache locality
static void transpose_hwc_u8(const uint8_t* src, uint8_t* dst, int h, int w,
                             int c) {
    const int B = 64;
    for (int y0 = 0; y0 < h; y0 += B) {
        int y1 = y0 + B < h ? y0 + B : h;
        for (int x0 = 0; x0 < w; x0 += B) {
            int x1 = x0 + B < w ? x0 + B : w;
            for (int y = y0; y < y1; y++)
                for (int x = x0; x < x1; x++)
                    for (int ch = 0; ch < c; ch++)
                        dst[((size_t)x * h + y) * c + ch] =
                            src[((size_t)y * w + x) * c + ch];
        }
    }
}

// uint8 HWC bicubic resize: src [ih, iw, c] -> dst [oh, ow, c].
// PIL's pass order (horizontal to clipped u8, then vertical) is preserved;
// the horizontal pass is realized as transpose -> axis-0 resample ->
// transpose so both passes run through the vectorized kernel.
struct ResampleCoeffs {
    int in = -1, out = -1, ksize = 0;
    std::vector<int> bounds;
    std::vector<int32_t> kk;
};

static ResampleCoeffs& cached_coeffs(ResampleCoeffs& c, int in_size,
                                     int out_size) {
    if (c.in != in_size || c.out != out_size) {
        c.ksize = resample_coeffs(in_size, out_size, c.bounds, c.kk);
        c.in = in_size;
        c.out = out_size;
    }
    return c;
}

static void grow(std::vector<uint8_t>& v, size_t n) {
    if (v.size() < n) v.resize(n);
}

void resize_bicubic_u8(const uint8_t* src, int ih, int iw, int c,
                       uint8_t* dst, int oh, int ow) {
    // coeff tables + scratch cached across calls (a camera path resizes
    // the same geometry every frame; ~6 MB of value-initialized vectors
    // per call is measurable on the single-core bench host)
    static thread_local ResampleCoeffs hc, vc;
    static thread_local std::vector<uint8_t> tr1, tr2, temp;
    static thread_local std::vector<int32_t> acc;
    cached_coeffs(hc, iw, ow);
    cached_coeffs(vc, ih, oh);
    size_t amax = (size_t)(ih > ow ? ih : ow) * c;
    if (acc.size() < amax) acc.resize(amax);

    // horizontal: [ih, iw, c] -T-> [iw, ih, c] -resample-> [ow, ih, c]
    //             -T-> temp [ih, ow, c]
    grow(tr1, (size_t)iw * ih * c);
    transpose_hwc_u8(src, tr1.data(), ih, iw, c);
    grow(tr2, (size_t)ow * ih * c);
    resample_axis0_u8(tr1.data(), tr2.data(), ow, ih * c, hc.bounds, hc.kk,
                      hc.ksize, acc.data());
    grow(temp, (size_t)ih * ow * c);
    transpose_hwc_u8(tr2.data(), temp.data(), ow, ih, c);

    // vertical: temp [ih, ow, c] -> dst [oh, ow, c]
    resample_axis0_u8(temp.data(), dst, oh, ow * c, vc.bounds, vc.kk,
                      vc.ksize, acc.data());
}

int mllm_native_version() { return 2; }

}  // extern "C"
