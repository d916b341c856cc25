// Native host-side transcript kernels for sipp-tpu.
//
// The Fiat-Shamir prologue hashes 2n interleaved point appends through a
// Poseidon-Goldilocks chain (reference transcript_native.rs:25-54; SURVEY.md
// §3.5) — inherently serial, so it runs on host.  This is the C++ fast path
// (~100x the pure-Python transcript); fields/poseidon.py remains the
// reference implementation and the two are differentially tested.
//
// Round constants and the MDS matrix are injected from Python at load time
// (sipp_set_constants) so there is exactly one source of truth.
//
// Build: make -C csrc   (g++ -O2 -shared -fPIC)

#include <cstddef>
#include <cstdint>

using u64 = uint64_t;
using u128 = unsigned __int128;

static const u64 P = 0xFFFFFFFF00000001ull;  // Goldilocks
static const int WIDTH = 12, RATE = 8, N_ROUNDS = 30, N_FULL = 4, N_PARTIAL = 22;

static u64 RC[N_ROUNDS][WIDTH];
static u64 MDS[WIDTH][WIDTH];

extern "C" void sipp_set_constants(const u64* rc, const u64* mds) {
    for (int r = 0; r < N_ROUNDS; r++)
        for (int i = 0; i < WIDTH; i++) RC[r][i] = rc[r * WIDTH + i];
    for (int i = 0; i < WIDTH; i++)
        for (int j = 0; j < WIDTH; j++) MDS[i][j] = mds[i * WIDTH + j];
}

// LAZY Goldilocks arithmetic (plonky2-style): values live in [0, 2^64) and
// are only canonicalized (< p) at permute exit — every reduction below is
// branchless (compiles to cmov/sbb), which is worth ~6x over the branchy
// canonical form on the serial hash chain.  EPSILON = 2^64 - p = 2^32 - 1.
static const u64 EPSILON = 0xFFFFFFFFull;

static inline u64 add_lazy(u64 a, u64 b) {
    // PRECONDITION: b < p (canonical) — then a+b wraps at most once and the
    // single EPSILON fix-up cannot re-overflow.  Callers pass round
    // constants (canonical by construction) as b.
    u64 r = a + b;
    return r + (r < a ? EPSILON : 0);   // 2^64 ≡ 2^32 - 1 (mod p)
}

static inline u64 reduce128(u128 x) {
    // x = lo + 2^64*hi; 2^64 ≡ EPSILON, 2^96 ≡ -1 (mod p).  Result < 2^64.
    u64 lo = (u64)x;
    u64 hi = (u64)(x >> 64);
    u64 hi_hi = hi >> 32;
    u64 hi_lo = hi & EPSILON;
    u64 t1 = lo - hi_hi;
    t1 -= (lo < hi_hi ? EPSILON : 0);   // borrow wraps: -2^64 ≡ -EPSILON
    u64 t2 = hi_lo * EPSILON;           // < 2^64
    u64 r = t1 + t2;
    return r + (r < t1 ? EPSILON : 0);
}

static inline u64 canon(u64 x) { return x >= P ? x - P : x; }

static inline u64 mulmod(u64 a, u64 b) { return reduce128((u128)a * b); }

static inline u64 sbox(u64 x) {
    u64 x2 = mulmod(x, x);
    u64 x4 = mulmod(x2, x2);
    return mulmod(mulmod(x4, x2), x);
}

extern "C" void sipp_poseidon_permute(u64* s) {
    for (int r = 0; r < N_ROUNDS; r++) {
        for (int i = 0; i < WIDTH; i++) s[i] = add_lazy(s[i], RC[r][i]);
        if (r >= N_FULL && r < N_FULL + N_PARTIAL) {
            s[0] = sbox(s[0]);
        } else {
            for (int i = 0; i < WIDTH; i++) s[i] = sbox(s[i]);
        }
        u64 out[WIDTH];
        for (int i = 0; i < WIDTH; i++) {
            // 12 products of (2^64-1)*49: sum < 2^70, fits u128 easily
            u128 acc = 0;
            for (int j = 0; j < WIDTH; j++) acc += (u128)MDS[i][j] * s[j];
            out[i] = reduce128(acc);
        }
        for (int i = 0; i < WIDTH; i++) s[i] = out[i];
    }
    for (int i = 0; i < WIDTH; i++) s[i] = canon(s[i]);
}

// hash_n_to_hash_no_pad: overwrite-absorb rate-8 chunks; out = state[0:4]
extern "C" void sipp_hash_no_pad(const u64* in, size_t n, u64* out4) {
    u64 s[WIDTH] = {0};
    for (size_t i = 0; i < n; i += RATE) {
        size_t w = n - i < RATE ? n - i : RATE;
        // no % p: the lazy permute accepts any u64 (x ≡ x mod p) and its
        // output is canonical, so the digest is unchanged
        for (size_t j = 0; j < w; j++) s[j] = in[i + j];
        sipp_poseidon_permute(s);
    }
    for (int i = 0; i < 4; i++) out4[i] = s[i];
}

// Transcript chain: state' = hash_no_pad(state || msg) for each message.
// msgs: concatenated message elements; lens[k] = length of message k.
extern "C" void sipp_transcript_absorb(u64* state4, const u64* msgs,
                                       const size_t* lens, size_t n_msgs) {
    u64 buf[4 + 96];  // largest message is an Fq12 (96 elements)
    size_t pos = 0;
    for (size_t k = 0; k < n_msgs; k++) {
        size_t len = lens[k];
        for (int i = 0; i < 4; i++) buf[i] = state4[i];
        for (size_t j = 0; j < len; j++) buf[4 + j] = msgs[pos + j];
        pos += len;
        sipp_hash_no_pad(buf, 4 + len, state4);
    }
}
