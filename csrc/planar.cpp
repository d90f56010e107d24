// Native GGUF → planar decoder (the data-loader hot path; the analog of the
// reference's native repack kernels, e.g. marlin_repack.cu, executed host-side
// at load time). Bit-exact with mistralrs_tpu/gguf/planar.py — validated by
// tests/test_native_planar.py.
//
// Built by mistralrs_tpu/gguf/native.py via g++ -O3 -shared; exposed through
// ctypes. Each entry decodes n_blocks GGUF superblocks into flat
// (codes, scale, bias) arrays, multithreaded over block ranges.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(mant & 0x400)) { mant <<= 1; exp--; }
            mant &= 0x3FF;
            bits = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

// Q4_K / Q5_K packed 6-bit (scale, min) pairs
inline void scale_min_k4(const uint8_t* s, int g, uint8_t* sc, uint8_t* mn) {
    if (g < 4) {
        *sc = s[g] & 63;
        *mn = s[g + 4] & 63;
    } else {
        *sc = (s[g + 4] & 15) | ((s[g - 4] >> 6) << 4);
        *mn = (s[g + 4] >> 4) | ((s[g] >> 6) << 4);
    }
}

template <typename F>
void parallel_blocks(int64_t n_blocks, F fn) {
    unsigned n_threads = std::thread::hardware_concurrency();
    if (n_threads == 0) n_threads = 1;
    if (n_blocks < 1024) n_threads = 1;
    std::vector<std::thread> ts;
    int64_t chunk = (n_blocks + n_threads - 1) / n_threads;
    for (unsigned t = 0; t < n_threads; t++) {
        int64_t lo = t * chunk;
        int64_t hi = std::min<int64_t>(n_blocks, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=] { for (int64_t i = lo; i < hi; i++) fn(i); });
    }
    for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Q4_K: 144-byte superblocks of 256 → uint8 codes, f32 scale/bias per 32
void planar_q4_k(const uint8_t* raw, int64_t n_blocks, uint8_t* q,
                 float* scale, float* bias) {
    parallel_blocks(n_blocks, [=](int64_t i) {
        const uint8_t* b = raw + i * 144;
        float d = f16_to_f32(*(const uint16_t*)(b));
        float dmin = f16_to_f32(*(const uint16_t*)(b + 2));
        const uint8_t* scales = b + 4;
        const uint8_t* qs = b + 16;
        for (int g = 0; g < 8; g++) {
            uint8_t sc, mn;
            scale_min_k4(scales, g, &sc, &mn);
            scale[i * 8 + g] = d * (float)sc;
            bias[i * 8 + g] = -dmin * (float)mn;
        }
        uint8_t* out = q + i * 256;
        for (int j = 0; j < 256; j++) {
            int chunk = j / 64, pos = j % 64;
            int byte = chunk * 32 + pos % 32;
            int hi = pos >= 32 ? 4 : 0;
            out[j] = (qs[byte] >> hi) & 15;
        }
    });
}

// Q5_K: 176-byte superblocks → uint8 codes (0..31), f32 scale/bias per 32
void planar_q5_k(const uint8_t* raw, int64_t n_blocks, uint8_t* q,
                 float* scale, float* bias) {
    parallel_blocks(n_blocks, [=](int64_t i) {
        const uint8_t* b = raw + i * 176;
        float d = f16_to_f32(*(const uint16_t*)(b));
        float dmin = f16_to_f32(*(const uint16_t*)(b + 2));
        const uint8_t* scales = b + 4;
        const uint8_t* qh = b + 16;
        const uint8_t* qs = b + 48;
        for (int g = 0; g < 8; g++) {
            uint8_t sc, mn;
            scale_min_k4(scales, g, &sc, &mn);
            scale[i * 8 + g] = d * (float)sc;
            bias[i * 8 + g] = -dmin * (float)mn;
        }
        uint8_t* out = q + i * 256;
        for (int j = 0; j < 256; j++) {
            int chunk = j / 64, pos = j % 64;
            int byte = chunk * 32 + pos % 32;
            int shift = pos >= 32 ? 4 : 0;
            uint8_t lo = (qs[byte] >> shift) & 15;
            uint8_t hi = (qh[j % 32] >> (j / 32)) & 1;
            out[j] = lo | (hi << 4);
        }
    });
}

// Q6_K: 210-byte superblocks → int8 codes (−32..31), f32 scale per 16
void planar_q6_k(const uint8_t* raw, int64_t n_blocks, int8_t* q, float* scale) {
    parallel_blocks(n_blocks, [=](int64_t i) {
        const uint8_t* b = raw + i * 210;
        const uint8_t* ql = b;
        const uint8_t* qh = b + 128;
        const int8_t* sc = (const int8_t*)(b + 192);
        float d = f16_to_f32(*(const uint16_t*)(b + 208));
        for (int g = 0; g < 16; g++) scale[i * 16 + g] = d * (float)sc[g];
        int8_t* out = q + i * 256;
        for (int j = 0; j < 256; j++) {
            int half = j / 128, pos = j % 32, quarter = (j % 128) / 32;
            int ql_byte = half * 64 + pos + (quarter % 2) * 32;
            int ql_shift = quarter >= 2 ? 4 : 0;
            int qh_byte = half * 32 + pos;
            int qh_shift = quarter * 2;
            int lo = (ql[ql_byte] >> ql_shift) & 15;
            int hi = (qh[qh_byte] >> qh_shift) & 3;
            out[j] = (int8_t)((lo | (hi << 4)) - 32);
        }
    });
}

// Q8_0: 34-byte blocks of 32 → int8 codes, f32 scale per 32
void planar_q8_0(const uint8_t* raw, int64_t n_blocks, int8_t* q, float* scale) {
    parallel_blocks(n_blocks, [=](int64_t i) {
        const uint8_t* b = raw + i * 34;
        scale[i] = f16_to_f32(*(const uint16_t*)(b));
        std::memcpy(q + i * 32, b + 2, 32);
    });
}

// Q4_0: 18-byte blocks of 32 → uint8 codes, scale d + bias −8d per 32
void planar_q4_0(const uint8_t* raw, int64_t n_blocks, uint8_t* q,
                 float* scale, float* bias) {
    parallel_blocks(n_blocks, [=](int64_t i) {
        const uint8_t* b = raw + i * 18;
        float d = f16_to_f32(*(const uint16_t*)(b));
        scale[i] = d;
        bias[i] = -8.0f * d;
        const uint8_t* qs = b + 2;
        uint8_t* out = q + i * 32;
        for (int j = 0; j < 16; j++) {
            out[j] = qs[j] & 15;
            out[j + 16] = qs[j] >> 4;
        }
    });
}

}  // extern "C"
