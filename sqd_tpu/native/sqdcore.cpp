// (C) 2026. Licensed under the Apache License, Version 2.0.
//
// Native host kernels for sqd_tpu.
//
// The TPU owns the compute path (JAX/XLA/Pallas); these C++ routines own the
// host-side bookkeeping that feeds it — the role PySCF's C extensions play
// for the reference (SURVEY.md N1/N8).  Bitstrings are packed little-endian
// uint32 words (word 0 = orbitals 0..31), matching sqd_tpu.ops.bitpack.
//
// Build: g++ -O3 -march=native -shared -fPIC sqdcore.cpp -o libsqdcore.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Per-row popcount of an (n, w) packed matrix.
void popcount_rows(const uint32_t* strs, int64_t n, int w, int64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t acc = 0;
        for (int j = 0; j < w; ++j) acc += __builtin_popcount(strs[i * w + j]);
        out[i] = acc;
    }
}

// Enumerate all two-hole intermediates K = I - u - v over every string I and
// every occupied pair (u < v).  Writes n * C(nelec, 2) rows of w words into
// `out` (caller-allocated).  Returns the number of rows written.
int64_t desdes_candidates(const uint32_t* strs, int64_t n, int w, int nelec,
                          uint32_t* out) {
    const int64_t pairs = (int64_t)nelec * (nelec - 1) / 2;
    std::vector<int> occ(nelec);
    int64_t row_out = 0;
    for (int64_t i = 0; i < n; ++i) {
        const uint32_t* s = strs + i * w;
        // collect occupied bit positions
        int cnt = 0;
        for (int j = 0; j < w && cnt < nelec; ++j) {
            uint32_t word = s[j];
            while (word && cnt < nelec) {
                int b = __builtin_ctz(word);
                occ[cnt++] = j * 32 + b;
                word &= word - 1;
            }
        }
        for (int a = 0; a < cnt; ++a) {
            for (int b = a + 1; b < cnt; ++b) {
                uint32_t* dst = out + row_out * w;
                std::memcpy(dst, s, w * sizeof(uint32_t));
                dst[occ[a] >> 5] ^= (uint32_t)1u << (occ[a] & 31);
                dst[occ[b] >> 5] ^= (uint32_t)1u << (occ[b] & 31);
                ++row_out;
            }
        }
        (void)pairs;
    }
    return row_out;
}

// Lexicographic (integer-value) sort + dedup of packed rows, in place into
// `out`.  Returns the number of unique rows.
static bool row_less(const uint32_t* a, const uint32_t* b, int w) {
    for (int j = w - 1; j >= 0; --j) {
        if (a[j] != b[j]) return a[j] < b[j];
    }
    return false;
}

int64_t sort_unique_rows(const uint32_t* rows, int64_t n, int w, uint32_t* out) {
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int64_t x, int64_t y) {
        return row_less(rows + x * w, rows + y * w, w);
    });
    int64_t n_out = 0;
    for (int64_t k = 0; k < n; ++k) {
        const uint32_t* r = rows + order[k] * w;
        if (n_out == 0 || std::memcmp(out + (n_out - 1) * w, r, w * sizeof(uint32_t)) != 0) {
            std::memcpy(out + n_out * w, r, w * sizeof(uint32_t));
            ++n_out;
        }
    }
    return n_out;
}

// Pack arbitrary-width integer strings given as (n, w) little-endian uint32
// from string form is handled in Python; here we provide the fused
// "desdes + sort + unique" used by the RDM builder.
int64_t desdes_unique(const uint32_t* strs, int64_t n, int w, int nelec,
                      uint32_t* scratch, uint32_t* out) {
    int64_t total = desdes_candidates(strs, n, w, nelec, scratch);
    return sort_unique_rows(scratch, total, w, out);
}

}  // extern "C"
