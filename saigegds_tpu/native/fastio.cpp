// Native decode kernels for the GDS data plane.
//
// The reference's data plane is C++ throughout (gdsfmt's CoreArray plus the
// SIMD helpers in src/vectorization.cpp); this library is the TPU-framework
// equivalent for the host-side ingestion path: branch-free 2-bit genotype
// unpacking, LEB128 string-offset scanning, and ploidy folding, exposed via
// a plain C ABI for ctypes (no Python.h dependency).
//
// Build: `make -C saigegds_tpu/native` (g++ -O3 -march=native -shared).

#include <cstddef>
#include <cstdint>

extern "C" {

// Unpack 2-bit codes, 4 per byte, little-endian within the byte
// (CoreArray dBit2 layout; cf. the reference's lookup decode in
// src/saige_fitnull.cpp:480-517).
void sg_unpack_bit2(const uint8_t* src, size_t nbytes, uint8_t* dst) {
    for (size_t i = 0; i < nbytes; ++i) {
        uint8_t b = src[i];
        dst[4 * i + 0] = b & 3u;
        dst[4 * i + 1] = (b >> 2) & 3u;
        dst[4 * i + 2] = (b >> 4) & 3u;
        dst[4 * i + 3] = (b >> 6) & 3u;
    }
}

// Scan n LEB128-length-prefixed strings (CoreArray dVStr8 payload).
// Writes byte offsets [start, end) per element; returns bytes consumed,
// or -1 if the buffer ends early.
int64_t sg_vstr8_offsets(const uint8_t* data, size_t len, size_t n,
                         int64_t* starts, int64_t* ends) {
    size_t p = 0;
    for (size_t i = 0; i < n; ++i) {
        uint64_t m = 0;
        int shift = 0;
        for (;;) {
            if (p >= len) return -1;
            uint8_t byte = data[p++];
            m |= (uint64_t)(byte & 0x7F) << shift;
            if (byte < 0x80) break;
            shift += 7;
        }
        if (p + m > len) return -1;
        starts[i] = (int64_t)p;
        ends[i] = (int64_t)(p + m);
        p += m;
    }
    return (int64_t)p;
}

// Fold a [M, N, ploidy] allele-code array (2-bit codes already unpacked,
// 3 = missing) into [M, N] int8 ALT dosages with 3 = missing.
void sg_geno_fold(const uint8_t* raw, int64_t mn, int64_t ploidy,
                  int8_t* out) {
    for (int64_t i = 0; i < mn; ++i) {
        const uint8_t* g = raw + i * ploidy;
        int sum = 0;
        int miss = 0;
        for (int64_t k = 0; k < ploidy; ++k) {
            miss |= (g[k] == 3);
            sum += g[k];
        }
        out[i] = miss ? (int8_t)3 : (int8_t)sum;
    }
}

// Fused: 2-bit packed [M, N, ploidy] stream -> [M, N] int8 dosages.
// nbytes must cover ceil(M*N*ploidy/4) packed bytes.
void sg_bit2_dosage(const uint8_t* src, int64_t mn, int64_t ploidy,
                    int8_t* out) {
    // walk the 2-bit stream without materializing the unpacked array
    int64_t idx = 0;     // genotype index within the stream
    for (int64_t i = 0; i < mn; ++i) {
        int sum = 0, miss = 0;
        for (int64_t k = 0; k < ploidy; ++k, ++idx) {
            uint8_t b = src[idx >> 2];
            uint8_t g = (b >> ((idx & 3) * 2)) & 3u;
            miss |= (g == 3);
            sum += g;
        }
        out[i] = miss ? (int8_t)3 : (int8_t)sum;
    }
}

// Same, starting `geno_offset` 2-bit codes into the buffer (for streamed
// variant blocks whose first genotype is not byte-aligned).
void sg_bit2_dosage_off(const uint8_t* src, int64_t geno_offset, int64_t mn,
                        int64_t ploidy, int8_t* out) {
    int64_t idx = geno_offset;
    for (int64_t i = 0; i < mn; ++i) {
        int sum = 0, miss = 0;
        for (int64_t k = 0; k < ploidy; ++k, ++idx) {
            uint8_t b = src[idx >> 2];
            uint8_t g = (b >> ((idx & 3) * 2)) & 3u;
            miss |= (g == 3);
            sum += g;
        }
        out[i] = miss ? (int8_t)3 : (int8_t)sum;
    }
}

// f64 ALT-dosage matrix from 2-bit stream: NaN for missing (the
// SeqData.dosage_block hot path).
void sg_bit2_dosage_f64(const uint8_t* src, int64_t mn, int64_t ploidy,
                        double* out) {
    const double kNaN = __builtin_nan("");
    int64_t idx = 0;
    for (int64_t i = 0; i < mn; ++i) {
        int sum = 0, miss = 0;
        for (int64_t k = 0; k < ploidy; ++k, ++idx) {
            uint8_t b = src[idx >> 2];
            uint8_t g = (b >> ((idx & 3) * 2)) & 3u;
            miss |= (g == 3);
            sum += g;
        }
        out[i] = miss ? kNaN : (double)sum;
    }
}

}  // extern "C"
