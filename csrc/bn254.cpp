// Native host BN254 Fq12 kernels: final exponentiation and runtime pow.
//
// Rationale (see ARCH.md): after the batched Miller loop + product tree, the
// final exponentiation acts on a SINGLE Fq12 element — ~800 sequential
// multiplies with no batch parallelism.  On the TPU that is pure dispatch
// latency (~100 ms); on the host CPU it is ~1 ms.  This file implements
// 4x64-limb Montgomery arithmetic, the 2-3-2 tower, and the same
// lambda-chain final exponentiation as pairing/pairing.py — bit-exact and
// differentially tested against both the Python oracle and the device path.
//
// All curve/field constants are injected from Python (sipp_bn254_init):
// single source of truth, nothing hard-coded here.

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = unsigned __int128;

static u64 P[4], N0, R2[4], ONE_M[4];
// Frobenius constants: for k in {1,2,3}, position m in 0..5: an Fq2 value
// (Montgomery), laid out [k-1][m][c][limb].
static u64 FROB[3][6][2][4];
// xi = 9 + u in Montgomery form (for fq2_mul_xi we use 9*a etc. directly).
static u64 X_PARAM;       // BN parameter x (fits u64)
static u64 L0_EXP[4], L1_EXP[4];  // |l0|, |l1| hard-part chain not needed —
                                   // we reuse the structured chain instead.

extern "C" void sipp_bn254_init(const u64* p, u64 n0, const u64* r2,
                                const u64* one_m, const u64* frob,
                                u64 x_param) {
    std::memcpy(P, p, 32);
    N0 = n0;
    std::memcpy(R2, r2, 32);
    std::memcpy(ONE_M, one_m, 32);
    std::memcpy(FROB, frob, sizeof(FROB));
    X_PARAM = x_param;
}

// ------------------------------------------------------------------ Fq core

static inline int geq(const u64* a, const u64* b) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] > b[i]) return 1;
        if (a[i] < b[i]) return 0;
    }
    return 1;
}

static inline void sub4(u64* a, const u64* b) {  // a -= b (no borrow out)
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static void fq_add(const u64* a, const u64* b, u64* out) {
    u128 carry = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a[i] + b[i] + carry;
        t[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq(t, P)) sub4(t, P);
    std::memcpy(out, t, 32);
}

static void fq_sub(const u64* a, const u64* b, u64* out) {
    u64 t[4];
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        t[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)t[i] + P[i] + carry;
            t[i] = (u64)s;
            carry = s >> 64;
        }
    }
    std::memcpy(out, t, 32);
}

static void fq_mul(const u64* a, const u64* b, u64* out) {  // Montgomery CIOS
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)t[j] + (u128)a[i] * b[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);
        u64 m = t[0] * N0;
        carry = ((u128)t[0] + (u128)m * P[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 cur2 = (u128)t[j] + (u128)m * P[j] + carry;
            t[j - 1] = (u64)cur2;
            carry = cur2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
        t[5] = 0;
    }
    if (t[4] || geq(t, P)) sub4(t, P);
    std::memcpy(out, t, 32);
}

static void fq_neg(const u64* a, u64* out) {
    u64 zero[4] = {0, 0, 0, 0};
    int is_zero = !(a[0] | a[1] | a[2] | a[3]);
    if (is_zero) { std::memcpy(out, zero, 32); return; }
    u64 t[4];
    std::memcpy(t, P, 32);
    sub4(t, a);
    std::memcpy(out, t, 32);
}

static void fq_pow_pm2(const u64* a, u64* out) {  // a^(p-2): inverse
    u64 e[4];
    std::memcpy(e, P, 32);
    e[0] -= 2;  // p is odd, p[0] >= 2: no borrow
    u64 acc[4], base[4];
    std::memcpy(acc, ONE_M, 32);
    std::memcpy(base, a, 32);
    for (int limb = 0; limb < 4; limb++)
        for (int bit = 0; bit < 64; bit++) {
            if ((e[limb] >> bit) & 1) fq_mul(acc, base, acc);
            fq_mul(base, base, base);
        }
    std::memcpy(out, acc, 32);
}

// ----------------------------------------------------------------- Fq2 etc.

struct Fq2 { u64 c[2][4]; };
struct Fq6 { Fq2 c[3]; };
struct Fq12 { Fq6 c[2]; };

static void fq2_add(const Fq2& a, const Fq2& b, Fq2& o) {
    fq_add(a.c[0], b.c[0], o.c[0]);
    fq_add(a.c[1], b.c[1], o.c[1]);
}
static void fq2_sub(const Fq2& a, const Fq2& b, Fq2& o) {
    fq_sub(a.c[0], b.c[0], o.c[0]);
    fq_sub(a.c[1], b.c[1], o.c[1]);
}
static void fq2_neg(const Fq2& a, Fq2& o) {
    fq_neg(a.c[0], o.c[0]);
    fq_neg(a.c[1], o.c[1]);
}
static void fq2_mul(const Fq2& a, const Fq2& b, Fq2& o) {
    u64 v0[4], v1[4], s1[4], s2[4], t[4];
    fq_mul(a.c[0], b.c[0], v0);
    fq_mul(a.c[1], b.c[1], v1);
    fq_add(a.c[0], a.c[1], s1);
    fq_add(b.c[0], b.c[1], s2);
    fq_mul(s1, s2, t);
    fq_sub(v0, v1, o.c[0]);
    fq_sub(t, v0, t);
    fq_sub(t, v1, o.c[1]);
}
static void fq2_mul_xi(const Fq2& a, Fq2& o) {  // (9+u)*a
    u64 n9a0[4], n9a1[4], t[4];
    // 9x = 8x + x
    fq_add(a.c[0], a.c[0], t); fq_add(t, t, t); fq_add(t, t, t);
    fq_add(t, a.c[0], n9a0);
    fq_add(a.c[1], a.c[1], t); fq_add(t, t, t); fq_add(t, t, t);
    fq_add(t, a.c[1], n9a1);
    u64 r0[4];
    fq_sub(n9a0, a.c[1], r0);
    fq_add(n9a1, a.c[0], o.c[1]);
    std::memcpy(o.c[0], r0, 32);
}
static void fq2_conj(const Fq2& a, Fq2& o) {
    std::memcpy(o.c[0], a.c[0], 32);
    fq_neg(a.c[1], o.c[1]);
}
static void fq2_inv(const Fq2& a, Fq2& o) {
    u64 n0_[4], n1_[4], norm[4], ninv[4];
    fq_mul(a.c[0], a.c[0], n0_);
    fq_mul(a.c[1], a.c[1], n1_);
    fq_add(n0_, n1_, norm);
    fq_pow_pm2(norm, ninv);
    fq_mul(a.c[0], ninv, o.c[0]);
    u64 t[4];
    fq_mul(a.c[1], ninv, t);
    fq_neg(t, o.c[1]);
}

static void fq6_add(const Fq6& a, const Fq6& b, Fq6& o) {
    for (int i = 0; i < 3; i++) fq2_add(a.c[i], b.c[i], o.c[i]);
}
static void fq6_sub(const Fq6& a, const Fq6& b, Fq6& o) {
    for (int i = 0; i < 3; i++) fq2_sub(a.c[i], b.c[i], o.c[i]);
}
static void fq6_neg(const Fq6& a, Fq6& o) {
    for (int i = 0; i < 3; i++) fq2_neg(a.c[i], o.c[i]);
}
static void fq6_mul(const Fq6& a, const Fq6& b, Fq6& o) {
    Fq2 acc[5];
    std::memset(acc, 0, sizeof(acc));
    for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++) {
            Fq2 t;
            fq2_mul(a.c[i], b.c[j], t);
            fq2_add(acc[i + j], t, acc[i + j]);
        }
    Fq2 x;
    fq2_mul_xi(acc[3], x); fq2_add(acc[0], x, o.c[0]);
    fq2_mul_xi(acc[4], x); fq2_add(acc[1], x, o.c[1]);
    o.c[2] = acc[2];
}
static void fq6_mul_by_v(const Fq6& a, Fq6& o) {
    Fq2 t;
    fq2_mul_xi(a.c[2], t);
    Fq6 r;
    r.c[0] = t; r.c[1] = a.c[0]; r.c[2] = a.c[1];
    o = r;
}
static void fq6_inv(const Fq6& a, Fq6& o) {
    Fq2 A, B, C, t0, t1, t2;
    fq2_mul(a.c[0], a.c[0], t0);
    fq2_mul(a.c[1], a.c[2], t1);
    fq2_mul_xi(t1, t1);
    fq2_sub(t0, t1, A);
    fq2_mul(a.c[2], a.c[2], t0);
    fq2_mul_xi(t0, t0);
    fq2_mul(a.c[0], a.c[1], t1);
    fq2_sub(t0, t1, B);
    fq2_mul(a.c[1], a.c[1], t0);
    fq2_mul(a.c[0], a.c[2], t1);
    fq2_sub(t0, t1, C);
    Fq2 t;
    fq2_mul(a.c[2], B, t0);
    fq2_mul(a.c[1], C, t1);
    fq2_add(t0, t1, t0);
    fq2_mul_xi(t0, t0);
    fq2_mul(a.c[0], A, t1);
    fq2_add(t1, t0, t);
    Fq2 tinv;
    fq2_inv(t, tinv);
    fq2_mul(A, tinv, o.c[0]);
    fq2_mul(B, tinv, o.c[1]);
    fq2_mul(C, tinv, o.c[2]);
}

static void fq12_mul(const Fq12& a, const Fq12& b, Fq12& o) {
    Fq6 v0, v1, t0, t1, t2;
    fq6_mul(a.c[0], b.c[0], v0);
    fq6_mul(a.c[1], b.c[1], v1);
    fq6_add(a.c[0], a.c[1], t0);
    fq6_add(b.c[0], b.c[1], t1);
    fq6_mul(t0, t1, t2);
    Fq6 vv;
    fq6_mul_by_v(v1, vv);
    fq6_add(v0, vv, o.c[0]);
    fq6_sub(t2, v0, t2);
    fq6_sub(t2, v1, o.c[1]);
}
static void fq12_sqr(const Fq12& a, Fq12& o) { fq12_mul(a, a, o); }
static void fq12_conj(const Fq12& a, Fq12& o) {
    o.c[0] = a.c[0];
    fq6_neg(a.c[1], o.c[1]);
}
static void fq12_inv(const Fq12& a, Fq12& o) {
    Fq6 t0, t1;
    fq6_mul(a.c[0], a.c[0], t0);
    fq6_mul(a.c[1], a.c[1], t1);
    fq6_mul_by_v(t1, t1);
    fq6_sub(t0, t1, t0);
    Fq6 tinv;
    fq6_inv(t0, tinv);
    fq6_mul(a.c[0], tinv, o.c[0]);
    Fq6 t2;
    fq6_mul(a.c[1], tinv, t2);
    fq6_neg(t2, o.c[1]);
}
static void fq12_frob(const Fq12& a, int k, Fq12& o) {  // k in {1,2,3}
    // coefficient (i, j) at position m = 2j+i gets sigma^k(a_ij) * FROB[k-1][m]
    for (int i = 0; i < 2; i++)
        for (int j = 0; j < 3; j++) {
            int m = 2 * j + i;
            Fq2 t = a.c[i].c[j];
            if (k & 1) { Fq2 cj; fq2_conj(t, cj); t = cj; }
            Fq2 cst;
            std::memcpy(&cst, FROB[k - 1][m], sizeof(Fq2));
            fq2_mul(t, cst, o.c[i].c[j]);
        }
}
static void fq12_one(Fq12& o) {
    std::memset(&o, 0, sizeof(o));
    std::memcpy(o.c[0].c[0].c[0], ONE_M, 32);
}
static void fq12_pow_u64(const Fq12& a, u64 e, Fq12& o) {  // MSB-first
    Fq12 acc;
    fq12_one(acc);
    int started = 0;
    for (int bit = 63; bit >= 0; bit--) {
        if (started) fq12_sqr(acc, acc);
        if ((e >> bit) & 1) {
            if (started) fq12_mul(acc, a, acc);
            else { acc = a; started = 1; }
        }
    }
    o = acc;
}

extern "C" void sipp_fq12_mul(const u64* a, const u64* b, u64* out) {
    Fq12 fa, fb, fo;
    std::memcpy(&fa, a, sizeof(Fq12));
    std::memcpy(&fb, b, sizeof(Fq12));
    fq12_mul(fa, fb, fo);
    std::memcpy(out, &fo, sizeof(Fq12));
}

extern "C" void sipp_fq12_pow(const u64* a, const u64* e4, u64* out) {
    // a^e for a 256-bit exponent (LSB-first u64 limbs): plain square-multiply
    Fq12 base, acc;
    std::memcpy(&base, a, sizeof(Fq12));
    fq12_one(acc);
    for (int limb = 3; limb >= 0; limb--)
        for (int bit = 63; bit >= 0; bit--) {
            fq12_sqr(acc, acc);
            if ((e4[limb] >> bit) & 1) fq12_mul(acc, base, acc);
        }
    std::memcpy(out, &acc, sizeof(Fq12));
}

extern "C" void sipp_fq12_final_exp(const u64* in, u64* out) {
    Fq12 f, g, t;
    std::memcpy(&f, in, sizeof(Fq12));
    // easy part: f^(p^6-1) then ^(p^2+1)
    Fq12 cj, iv;
    fq12_conj(f, cj);
    fq12_inv(f, iv);
    fq12_mul(cj, iv, g);
    fq12_frob(g, 2, t);
    fq12_mul(t, g, g);
    // hard part: lambda chain (same schedule as pairing/pairing.py)
    Fq12 a, b, c;
    fq12_pow_u64(g, X_PARAM, a);
    fq12_pow_u64(a, X_PARAM, b);
    fq12_pow_u64(b, X_PARAM, c);
    Fq12 c2, c4, c8, c16, c32, c36;
    fq12_sqr(c, c2); fq12_sqr(c2, c4); fq12_sqr(c4, c8);
    fq12_sqr(c8, c16); fq12_sqr(c16, c32);
    fq12_mul(c32, c4, c36);
    Fq12 b2, b4, b8, b16, b30, b18, b6, tmp;
    fq12_sqr(b, b2); fq12_sqr(b2, b4); fq12_sqr(b4, b8); fq12_sqr(b8, b16);
    fq12_mul(b16, b8, tmp); fq12_mul(b4, b2, b6); fq12_mul(tmp, b6, b30);
    fq12_mul(b16, b2, b18);
    Fq12 a2, a4, a8, a16, a18, a12;
    fq12_sqr(a, a2); fq12_sqr(a2, a4); fq12_sqr(a4, a8); fq12_sqr(a8, a16);
    fq12_mul(a16, a2, a18); fq12_mul(a8, a4, a12);
    Fq12 f2;
    fq12_sqr(g, f2);
    Fq12 lam0, lam1, lam2;
    fq12_mul(c36, b30, tmp); fq12_mul(a18, f2, lam0);
    fq12_mul(tmp, lam0, lam0); fq12_conj(lam0, lam0);
    fq12_mul(c36, b18, tmp); fq12_mul(tmp, a12, lam1);
    fq12_conj(lam1, lam1); fq12_mul(lam1, g, lam1);
    fq12_mul(b6, g, lam2);
    Fq12 r, fr1, fr2, fr3;
    fq12_frob(lam1, 1, fr1);
    fq12_frob(lam2, 2, fr2);
    fq12_frob(g, 3, fr3);
    fq12_mul(lam0, fr1, r);
    fq12_mul(fr2, fr3, tmp);
    fq12_mul(r, tmp, r);
    std::memcpy(out, &r, sizeof(Fq12));
}

extern "C" void sipp_fq12_product(const u64* in, u64 n, u64* out) {
    // Product of n Fq12 elements (each 12*4 u64, Montgomery), in index order
    // matching the device product tree (pairwise halving) for bit-identical
    // association; multiplication is commutative+exact so order only matters
    // for determinism documentation.
    Fq12 acc;
    if (n == 0) { fq12_one(acc); std::memcpy(out, &acc, sizeof(Fq12)); return; }
    // pairwise tree to mirror pairing._product_tree exactly
    Fq12* buf = new Fq12[n];
    std::memcpy(buf, in, n * sizeof(Fq12));
    u64 m = n;
    while (m > 1) {
        u64 half = m / 2;
        for (u64 i = 0; i < half; i++) fq12_mul(buf[i], buf[half + i], buf[i]);
        if (m % 2) buf[half] = buf[m - 1];
        m = half + (m % 2);
    }
    std::memcpy(out, &buf[0], sizeof(Fq12));
    delete[] buf;
}
