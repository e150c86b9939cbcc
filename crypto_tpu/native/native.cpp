// Native components for crypto_tpu (C++ counterparts of the reference's
// native pieces):
//  * keccak_f1600: the STROBE/merlin transcript permutation
//    (hot, sequential, host-side — the Python fallback is ~30x slower)
//  * bit_transpose: kappa x m bit-matrix transpose for OT extension
//    (reference `oblivious_transfer/c/transpose.c`)
//
// Built as a shared library via g++ (see build.py); loaded with ctypes.

#include <cstdint>
#include <cstring>

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

static inline uint64_t rotl(uint64_t x, unsigned n) {
    return (x << n) | (x >> (64 - n));
}

extern "C" void keccak_f1600(uint8_t* state /* 200 bytes, LE lanes */) {
    uint64_t a[25];
    std::memcpy(a, state, 200);

    for (int round = 0; round < 24; ++round) {
        // theta
        uint64_t c[5], d[5];
        for (int x = 0; x < 5; ++x)
            c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
        for (int x = 0; x < 5; ++x)
            d[x] = c[(x + 4) % 5] ^ rotl(c[(x + 1) % 5], 1);
        for (int i = 0; i < 25; ++i) a[i] ^= d[i % 5];
        // rho + pi
        uint64_t b[25];
        static const int rot[5][5] = {
            {0, 36, 3, 41, 18}, {1, 44, 10, 45, 2}, {62, 6, 43, 15, 61},
            {28, 55, 25, 21, 56}, {27, 20, 39, 8, 14}};
        for (int x = 0; x < 5; ++x)
            for (int y = 0; y < 5; ++y)
                b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(a[x + 5 * y], rot[x][y]);
        // chi
        for (int x = 0; x < 5; ++x)
            for (int y = 0; y < 5; ++y)
                a[x + 5 * y] =
                    b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
        // iota
        a[0] ^= RC[round];
    }
    std::memcpy(state, a, 200);
}

// Transpose a rows x cols bit matrix, both packed row-major MSB-first
// (numpy packbits layout).  rows and cols must be multiples of 8.
extern "C" void bit_transpose(const uint8_t* in, uint8_t* out,
                              uint32_t rows, uint32_t cols) {
    const uint32_t in_stride = cols / 8;
    const uint32_t out_stride = rows / 8;
    std::memset(out, 0, (size_t)cols * out_stride);
    for (uint32_t r = 0; r < rows; ++r) {
        const uint8_t* row = in + (size_t)r * in_stride;
        const uint32_t out_byte = r / 8;
        const uint8_t out_bit = 7 - (r % 8);
        for (uint32_t cb = 0; cb < in_stride; ++cb) {
            uint8_t v = row[cb];
            if (!v) continue;
            for (int b = 0; b < 8; ++b) {
                if (v & (0x80u >> b)) {
                    uint32_t c = cb * 8 + b;
                    out[(size_t)c * out_stride + out_byte] |=
                        (uint8_t)(1u << out_bit);
                }
            }
        }
    }
}
