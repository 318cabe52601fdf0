// Native BN254 host runtime for plonkit-tpu.
//
// Scope: the O(1)-per-proof / host-side work that the reference keeps in
// native code (SURVEY D1a): Montgomery field arithmetic on 4x64-bit limbs,
// G1 group ops + Pippenger MSM (host fallback / verifier-side muls), the
// Fq2/6/12 tower with the optimal ate pairing, and keccak-f[1600] for the
// rolling transcript.  Exposed through a small C ABI consumed via ctypes
// (plonkit_tpu/native.py); all values cross the boundary as 32-byte
// little-endian canonical integers.
//
// Build: see native/Makefile (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// ---------------------------------------------------------------------------
// 256-bit Montgomery field arithmetic, generic over the modulus constants
// ---------------------------------------------------------------------------

struct FieldCtx {
    u64 p[4];      // modulus, little-endian limbs
    u64 r2[4];     // R^2 mod p
    u64 inv;       // -p^-1 mod 2^64
    u64 one[4];    // R mod p (Montgomery one)
};

// BN254 base field q
static const FieldCtx FQ = {
    {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL, 0xb85045b68181585dULL, 0x30644e72e131a029ULL},
    {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL, 0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL},
    0x87d20782e4866389ULL,
    {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL, 0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL},
};

// BN254 scalar field r
static const FieldCtx FR = {
    {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL, 0xb85045b68181585dULL, 0x30644e72e131a029ULL},
    {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL, 0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL},
    0xc2e1f593efffffffULL,
    {0xac96341c4ffffffbULL, 0x36fc76959f60cd29ULL, 0x666ea36f7879462eULL, 0x0e0a77c19a07df2fULL},
};

typedef u64 fe[4];

static inline int fe_cmp(const u64* a, const u64* b) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] < b[i]) return -1;
        if (a[i] > b[i]) return 1;
    }
    return 0;
}

static inline bool fe_is_zero(const u64* a) {
    return (a[0] | a[1] | a[2] | a[3]) == 0;
}

static inline void fe_copy(u64* d, const u64* s) { memcpy(d, s, 32); }
static inline void fe_zero(u64* d) { memset(d, 0, 32); }

static inline u64 adc(u64 a, u64 b, u64& carry) {
    u128 t = (u128)a + b + carry;
    carry = (u64)(t >> 64);
    return (u64)t;
}

static inline u64 sbb(u64 a, u64 b, u64& borrow) {
    u128 t = (u128)a - b - borrow;
    borrow = (t >> 64) ? 1 : 0;
    return (u64)t;
}

static void fe_add(const FieldCtx& F, u64* out, const u64* a, const u64* b) {
    u64 c = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) t[i] = adc(a[i], b[i], c);
    // conditional subtract p
    u64 brw = 0, s[4];
    for (int i = 0; i < 4; i++) s[i] = sbb(t[i], F.p[i], brw);
    if (c || !brw) fe_copy(out, s); else fe_copy(out, t);
}

static void fe_sub(const FieldCtx& F, u64* out, const u64* a, const u64* b) {
    u64 brw = 0, t[4];
    for (int i = 0; i < 4; i++) t[i] = sbb(a[i], b[i], brw);
    if (brw) {
        u64 c = 0;
        for (int i = 0; i < 4; i++) t[i] = adc(t[i], F.p[i], c);
    }
    fe_copy(out, t);
}

static void fe_neg(const FieldCtx& F, u64* out, const u64* a) {
    if (fe_is_zero(a)) { fe_zero(out); return; }
    u64 brw = 0;
    for (int i = 0; i < 4; i++) out[i] = sbb(F.p[i], a[i], brw);
}

// CIOS Montgomery multiplication
static void fe_mul(const FieldCtx& F, u64* out, const u64* a, const u64* b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u64 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 prod = (u128)a[j] * b[i] + t[j] + carry;
            t[j] = (u64)prod;
            carry = (u64)(prod >> 64);
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);
        u64 m = t[0] * F.inv;
        u128 prod = (u128)m * F.p[0] + t[0];
        carry = (u64)(prod >> 64);
        for (int j = 1; j < 4; j++) {
            prod = (u128)m * F.p[j] + t[j] + carry;
            t[j - 1] = (u64)prod;
            carry = (u64)(prod >> 64);
        }
        s = (u128)t[4] + carry;
        t[3] = (u64)s;
        t[4] = t[5] + (u64)(s >> 64);
        t[5] = 0;
    }
    // t[0..3] holds the result (< 2p); t[4] the overflow bit
    u64 brw = 0, s[4];
    for (int i = 0; i < 4; i++) s[i] = sbb(t[i], F.p[i], brw);
    if (t[4] || !brw) fe_copy(out, s); else fe_copy(out, t);
}

static void fe_sqr(const FieldCtx& F, u64* out, const u64* a) { fe_mul(F, out, a, a); }

static void fe_pow(const FieldCtx& F, u64* out, const u64* base, const u64* e) {
    fe acc, b;
    fe_copy(acc, F.one);
    fe_copy(b, base);
    for (int limb = 0; limb < 4; limb++) {
        for (int bit = 0; bit < 64; bit++) {
            if ((e[limb] >> bit) & 1) fe_mul(F, acc, acc, b);
            fe_sqr(F, b, b);
        }
    }
    fe_copy(out, acc);
}

static void fe_inv(const FieldCtx& F, u64* out, const u64* a) {
    // Fermat: a^(p-2)
    u64 e[4];
    u64 brw = 0;
    u64 two[4] = {2, 0, 0, 0};
    for (int i = 0; i < 4; i++) e[i] = sbb(F.p[i], two[i], brw);
    fe_pow(F, out, a, e);
}

static void fe_from_bytes(const FieldCtx& F, u64* out, const uint8_t* le32) {
    u64 raw[4];
    memcpy(raw, le32, 32);
    fe_mul(F, out, raw, F.r2);  // to Montgomery
}

static void fe_to_bytes(const FieldCtx& F, uint8_t* le32, const u64* a) {
    u64 one[4] = {1, 0, 0, 0};
    u64 canon[4];
    fe_mul(F, canon, a, one);   // from Montgomery
    memcpy(le32, canon, 32);
}

// ---------------------------------------------------------------------------
// G1 (short Weierstrass y^2 = x^3 + 3 over Fq), Jacobian coordinates
// ---------------------------------------------------------------------------

struct G1 {
    fe x, y, z;  // z == 0 -> infinity
};

static void g1_set_infinity(G1& p) { fe_zero(p.x); fe_zero(p.y); fe_zero(p.z); }
static bool g1_is_infinity(const G1& p) { return fe_is_zero(p.z); }

static void g1_double(G1& out, const G1& p) {
    if (g1_is_infinity(p)) { out = p; return; }
    fe A, B, C, D, E, Fv, t;
    fe_sqr(FQ, A, p.x);
    fe_sqr(FQ, B, p.y);
    fe_sqr(FQ, C, B);
    fe_add(FQ, t, p.x, B);
    fe_sqr(FQ, t, t);
    fe_sub(FQ, t, t, A);
    fe_sub(FQ, t, t, C);
    fe_add(FQ, D, t, t);
    fe_add(FQ, E, A, A);
    fe_add(FQ, E, E, A);
    fe_sqr(FQ, Fv, E);
    G1 r;
    fe_sub(FQ, r.x, Fv, D);
    fe_sub(FQ, r.x, r.x, D);
    fe eight_c;
    fe_add(FQ, eight_c, C, C);
    fe_add(FQ, eight_c, eight_c, eight_c);
    fe_add(FQ, eight_c, eight_c, eight_c);
    fe_sub(FQ, t, D, r.x);
    fe_mul(FQ, r.y, E, t);
    fe_sub(FQ, r.y, r.y, eight_c);
    fe_mul(FQ, r.z, p.y, p.z);
    fe_add(FQ, r.z, r.z, r.z);
    out = r;
}

static void g1_add(G1& out, const G1& p, const G1& q) {
    if (g1_is_infinity(p)) { out = q; return; }
    if (g1_is_infinity(q)) { out = p; return; }
    fe z1z1, z2z2, u1, u2, s1, s2, t;
    fe_sqr(FQ, z1z1, p.z);
    fe_sqr(FQ, z2z2, q.z);
    fe_mul(FQ, u1, p.x, z2z2);
    fe_mul(FQ, u2, q.x, z1z1);
    fe_mul(FQ, t, q.z, z2z2);
    fe_mul(FQ, s1, p.y, t);
    fe_mul(FQ, t, p.z, z1z1);
    fe_mul(FQ, s2, q.y, t);
    fe h, r;
    fe_sub(FQ, h, u2, u1);
    fe_sub(FQ, r, s2, s1);
    if (fe_is_zero(h)) {
        if (fe_is_zero(r)) { g1_double(out, p); return; }
        g1_set_infinity(out);
        return;
    }
    fe hh, hhh, v;
    fe_sqr(FQ, hh, h);
    fe_mul(FQ, hhh, h, hh);
    fe_mul(FQ, v, u1, hh);
    G1 o;
    fe_sqr(FQ, o.x, r);
    fe_sub(FQ, o.x, o.x, hhh);
    fe_sub(FQ, o.x, o.x, v);
    fe_sub(FQ, o.x, o.x, v);
    fe_sub(FQ, t, v, o.x);
    fe_mul(FQ, o.y, r, t);
    fe_mul(FQ, t, s1, hhh);
    fe_sub(FQ, o.y, o.y, t);
    fe_mul(FQ, o.z, p.z, q.z);
    fe_mul(FQ, o.z, o.z, h);
    out = o;
}

static void g1_from_affine_bytes(G1& p, const uint8_t* x_le, const uint8_t* y_le, int inf) {
    if (inf) { g1_set_infinity(p); return; }
    fe_from_bytes(FQ, p.x, x_le);
    fe_from_bytes(FQ, p.y, y_le);
    fe_copy(p.z, FQ.one);
}

static void g1_to_affine_bytes(uint8_t* x_le, uint8_t* y_le, int* inf, const G1& p) {
    if (g1_is_infinity(p)) {
        *inf = 1;
        memset(x_le, 0, 32);
        memset(y_le, 0, 32);
        return;
    }
    *inf = 0;
    fe zi, zi2, zi3, ax, ay;
    fe_inv(FQ, zi, p.z);
    fe_sqr(FQ, zi2, zi);
    fe_mul(FQ, zi3, zi2, zi);
    fe_mul(FQ, ax, p.x, zi2);
    fe_mul(FQ, ay, p.y, zi3);
    fe_to_bytes(FQ, x_le, ax);
    fe_to_bytes(FQ, y_le, ay);
}

// ---------------------------------------------------------------------------
// Pippenger MSM (signed windows)
// ---------------------------------------------------------------------------

extern "C" int bn254_g1_msm(
    const uint8_t* points_xy,  // n * 64 bytes (x||y little-endian), infinity = all-zero y&x
    const uint8_t* scalars,    // n * 32 bytes little-endian canonical
    long n,
    uint8_t* out_xy,           // 64 bytes
    int* out_inf) {
    const int c = (n > 1024) ? 13 : 6;
    const int num_windows = (255 + c - 1) / c;
    const long nb = 1L << (c - 1);

    // decompose scalars into signed digits
    std::vector<int32_t> digits((size_t)num_windows * n);
    for (long i = 0; i < n; i++) {
        const uint8_t* s = scalars + 32 * i;
        int carry = 0;
        for (int w = 0; w < num_windows; w++) {
            long bit0 = (long)w * c;
            long byte0 = bit0 >> 3;
            int off = bit0 & 7;
            u64 chunk = 0;
            for (int b = 0; b < 4 && byte0 + b < 32; b++)
                chunk |= (u64)s[byte0 + b] << (8 * b);
            int32_t d = (int32_t)((chunk >> off) & ((1u << c) - 1)) + carry;
            if (d > (int32_t)nb) { d -= (1 << c); carry = 1; } else carry = 0;
            digits[(size_t)w * n + i] = d;
        }
    }

    std::vector<G1> pts(n);
    for (long i = 0; i < n; i++) {
        const uint8_t* px = points_xy + 64 * i;
        bool inf = true;
        for (int b = 0; b < 64; b++) if (px[b]) { inf = false; break; }
        g1_from_affine_bytes(pts[i], px, px + 32, inf ? 1 : 0);
    }

    G1 acc;
    g1_set_infinity(acc);
    std::vector<G1> buckets(nb + 1);
    for (int w = num_windows - 1; w >= 0; w--) {
        for (int k = 0; k < c; k++) g1_double(acc, acc);
        for (long b = 0; b <= nb; b++) g1_set_infinity(buckets[b]);
        for (long i = 0; i < n; i++) {
            int32_t d = digits[(size_t)w * n + i];
            if (d == 0 || g1_is_infinity(pts[i])) continue;
            if (d > 0) {
                g1_add(buckets[d], buckets[d], pts[i]);
            } else {
                G1 neg = pts[i];
                fe_neg(FQ, neg.y, neg.y);
                g1_add(buckets[-d], buckets[-d], neg);
            }
        }
        G1 running, winsum;
        g1_set_infinity(running);
        g1_set_infinity(winsum);
        for (long b = nb; b >= 1; b--) {
            g1_add(running, running, buckets[b]);
            g1_add(winsum, winsum, running);
        }
        g1_add(acc, acc, winsum);
    }
    g1_to_affine_bytes(out_xy, out_xy + 32, out_inf, acc);
    return 0;
}

// ---------------------------------------------------------------------------
// Fq2 / Fq6 / Fq12 tower + optimal ate pairing
// Fq2 = Fq[u]/(u^2+1); Fq6 = Fq2[v]/(v^3 - (9+u)); Fq12 = Fq6[w]/(w^2 - v)
// ---------------------------------------------------------------------------

struct Fq2 { fe c0, c1; };

static void fq2_add(Fq2& o, const Fq2& a, const Fq2& b) { fe_add(FQ, o.c0, a.c0, b.c0); fe_add(FQ, o.c1, a.c1, b.c1); }
static void fq2_sub(Fq2& o, const Fq2& a, const Fq2& b) { fe_sub(FQ, o.c0, a.c0, b.c0); fe_sub(FQ, o.c1, a.c1, b.c1); }
static void fq2_neg(Fq2& o, const Fq2& a) { fe_neg(FQ, o.c0, a.c0); fe_neg(FQ, o.c1, a.c1); }
static void fq2_mul(Fq2& o, const Fq2& a, const Fq2& b) {
    fe t0, t1, t2, t3;
    fe_mul(FQ, t0, a.c0, b.c0);
    fe_mul(FQ, t1, a.c1, b.c1);
    fe_add(FQ, t2, a.c0, a.c1);
    fe_add(FQ, t3, b.c0, b.c1);
    Fq2 r;
    fe_sub(FQ, r.c0, t0, t1);
    fe_mul(FQ, t2, t2, t3);
    fe_sub(FQ, t2, t2, t0);
    fe_sub(FQ, r.c1, t2, t1);
    o = r;
}
static void fq2_sqr(Fq2& o, const Fq2& a) { fq2_mul(o, a, a); }
static void fq2_inv(Fq2& o, const Fq2& a) {
    fe n0, n1, t;
    fe_sqr(FQ, n0, a.c0);
    fe_sqr(FQ, n1, a.c1);
    fe_add(FQ, n0, n0, n1);
    fe_inv(FQ, t, n0);
    Fq2 r;
    fe_mul(FQ, r.c0, a.c0, t);
    fe_mul(FQ, r.c1, a.c1, t);
    fe_neg(FQ, r.c1, r.c1);
    o = r;
}
static bool fq2_is_zero(const Fq2& a) { return fe_is_zero(a.c0) && fe_is_zero(a.c1); }
static void fq2_set_zero(Fq2& a) { fe_zero(a.c0); fe_zero(a.c1); }
static void fq2_set_one(Fq2& a) { fe_copy(a.c0, FQ.one); fe_zero(a.c1); }

// multiply by xi = 9 + u
static void fq2_mul_xi(Fq2& o, const Fq2& a) {
    fe t0, t1;
    // (9 a0 - a1) + (9 a1 + a0) u
    fe_add(FQ, t0, a.c0, a.c0); fe_add(FQ, t0, t0, t0); fe_add(FQ, t0, t0, t0); fe_add(FQ, t0, t0, a.c0); // 9 a0
    fe_add(FQ, t1, a.c1, a.c1); fe_add(FQ, t1, t1, t1); fe_add(FQ, t1, t1, t1); fe_add(FQ, t1, t1, a.c1); // 9 a1
    Fq2 r;
    fe_sub(FQ, r.c0, t0, a.c1);
    fe_add(FQ, r.c1, t1, a.c0);
    o = r;
}

struct Fq6 { Fq2 c0, c1, c2; };

static void fq6_add(Fq6& o, const Fq6& a, const Fq6& b) { fq2_add(o.c0, a.c0, b.c0); fq2_add(o.c1, a.c1, b.c1); fq2_add(o.c2, a.c2, b.c2); }
static void fq6_sub(Fq6& o, const Fq6& a, const Fq6& b) { fq2_sub(o.c0, a.c0, b.c0); fq2_sub(o.c1, a.c1, b.c1); fq2_sub(o.c2, a.c2, b.c2); }
static void fq6_neg(Fq6& o, const Fq6& a) { fq2_neg(o.c0, a.c0); fq2_neg(o.c1, a.c1); fq2_neg(o.c2, a.c2); }

static void fq6_mul(Fq6& o, const Fq6& a, const Fq6& b) {
    Fq2 aa, bb, cc, t1, t2, t3;
    fq2_mul(aa, a.c0, b.c0);
    fq2_mul(bb, a.c1, b.c1);
    fq2_mul(cc, a.c2, b.c2);
    Fq6 r;
    // c0 = aa + xi*((a1+a2)(b1+b2) - bb - cc)
    fq2_add(t1, a.c1, a.c2);
    fq2_add(t2, b.c1, b.c2);
    fq2_mul(t1, t1, t2);
    fq2_sub(t1, t1, bb);
    fq2_sub(t1, t1, cc);
    fq2_mul_xi(t1, t1);
    fq2_add(r.c0, t1, aa);
    // c1 = (a0+a1)(b0+b1) - aa - bb + xi*cc
    fq2_add(t1, a.c0, a.c1);
    fq2_add(t2, b.c0, b.c1);
    fq2_mul(t1, t1, t2);
    fq2_sub(t1, t1, aa);
    fq2_sub(t1, t1, bb);
    fq2_mul_xi(t3, cc);
    fq2_add(r.c1, t1, t3);
    // c2 = (a0+a2)(b0+b2) - aa - cc + bb
    fq2_add(t1, a.c0, a.c2);
    fq2_add(t2, b.c0, b.c2);
    fq2_mul(t1, t1, t2);
    fq2_sub(t1, t1, aa);
    fq2_sub(t1, t1, cc);
    fq2_add(r.c2, t1, bb);
    o = r;
}

static void fq6_mul_by_v(Fq6& o, const Fq6& a) {
    // v * (c0 + c1 v + c2 v^2) = xi*c2 + c0 v + c1 v^2
    Fq2 t;
    fq2_mul_xi(t, a.c2);
    Fq6 r;
    r.c0 = t;
    r.c1 = a.c0;
    r.c2 = a.c1;
    o = r;
}

static void fq6_inv(Fq6& o, const Fq6& a) {
    Fq2 c0, c1, c2, t;
    // c0 = a0^2 - xi a1 a2 ; c1 = xi a2^2 - a0 a1 ; c2 = a1^2 - a0 a2
    fq2_sqr(c0, a.c0);
    fq2_mul(t, a.c1, a.c2);
    fq2_mul_xi(t, t);
    fq2_sub(c0, c0, t);
    fq2_sqr(c1, a.c2);
    fq2_mul_xi(c1, c1);
    fq2_mul(t, a.c0, a.c1);
    fq2_sub(c1, c1, t);
    fq2_sqr(c2, a.c1);
    fq2_mul(t, a.c0, a.c2);
    fq2_sub(c2, c2, t);
    // norm = a0 c0 + xi(a2 c1 + a1 c2)
    Fq2 n, t2;
    fq2_mul(n, a.c0, c0);
    fq2_mul(t, a.c2, c1);
    fq2_mul(t2, a.c1, c2);
    fq2_add(t, t, t2);
    fq2_mul_xi(t, t);
    fq2_add(n, n, t);
    fq2_inv(n, n);
    fq2_mul(o.c0, c0, n);
    fq2_mul(o.c1, c1, n);
    fq2_mul(o.c2, c2, n);
}

struct Fq12 { Fq6 c0, c1; };

static void fq12_set_one(Fq12& a) {
    fq2_set_one(a.c0.c0); fq2_set_zero(a.c0.c1); fq2_set_zero(a.c0.c2);
    fq2_set_zero(a.c1.c0); fq2_set_zero(a.c1.c1); fq2_set_zero(a.c1.c2);
}

static void fq12_mul(Fq12& o, const Fq12& a, const Fq12& b) {
    Fq6 aa, bb, t1, t2;
    fq6_mul(aa, a.c0, b.c0);
    fq6_mul(bb, a.c1, b.c1);
    Fq12 r;
    fq6_add(t1, a.c0, a.c1);
    fq6_add(t2, b.c0, b.c1);
    fq6_mul(t1, t1, t2);
    fq6_sub(t1, t1, aa);
    fq6_sub(r.c1, t1, bb);
    fq6_mul_by_v(bb, bb);
    fq6_add(r.c0, aa, bb);
    o = r;
}

static void fq12_sqr(Fq12& o, const Fq12& a) { fq12_mul(o, a, a); }

static void fq12_inv(Fq12& o, const Fq12& a) {
    // (c0 - c1 w)^-1 = (c0 + c1 w)^bar / (c0^2 - v c1^2)
    Fq6 t0, t1;
    fq6_mul(t0, a.c0, a.c0);
    fq6_mul(t1, a.c1, a.c1);
    fq6_mul_by_v(t1, t1);
    fq6_sub(t0, t0, t1);
    fq6_inv(t0, t0);
    fq6_mul(o.c0, a.c0, t0);
    fq6_mul(o.c1, a.c1, t0);
    fq6_neg(o.c1, o.c1);
}

static void fq12_conj(Fq12& o, const Fq12& a) { o.c0 = a.c0; fq6_neg(o.c1, a.c1); }

static bool fq12_is_one(const Fq12& a) {
    u64 one[4];
    fe_copy(one, FQ.one);
    if (fe_cmp(a.c0.c0.c0, one) != 0) return false;
    const u64* rest[11] = {a.c0.c0.c1, a.c0.c1.c0, a.c0.c1.c1, a.c0.c2.c0, a.c0.c2.c1,
                           a.c1.c0.c0, a.c1.c0.c1, a.c1.c1.c0, a.c1.c1.c1, a.c1.c2.c0, a.c1.c2.c1};
    for (auto r : rest) if (!fe_is_zero(r)) return false;
    return true;
}

// Frobenius coefficients: gamma1[i] = xi^((p-1)*i/6) for i = 1..5 in Fq2
static Fq2 FROB_GAMMA1[5];
static bool FROB_INIT = false;

static void frob_init() {
    if (FROB_INIT) return;
    // compute xi^((p-1)/6) by exponentiation: e = (p-1)/6
    // p-1 = ...; (p-1)/6 fits in 4 limbs
    // e = (p - 1) / 6 computed in integer arithmetic on limbs
    // do schoolbook: convert p to 256-bit, subtract 1, divide by 6
    u64 p[4];
    memcpy(p, FQ.p, 32);
    // subtract 1
    u64 brw = 0;
    u64 one_[4] = {1, 0, 0, 0};
    u64 pm1[4];
    for (int i = 0; i < 4; i++) pm1[i] = sbb(p[i], one_[i], brw);
    // divide by 6
    u64 e[4];
    u128 rem = 0;
    for (int i = 3; i >= 0; i--) {
        u128 cur = (rem << 64) | pm1[i];
        e[i] = (u64)(cur / 6);
        rem = cur % 6;
    }
    // xi = 9 + u in Montgomery form
    Fq2 xi;
    u64 nine[4] = {9, 0, 0, 0};
    fe_mul(FQ, xi.c0, nine, FQ.r2);
    fe_copy(xi.c1, FQ.one);
    // xi^e via square and multiply in Fq2
    Fq2 acc;
    fq2_set_one(acc);
    Fq2 base = xi;
    for (int limb = 0; limb < 4; limb++) {
        for (int bit = 0; bit < 64; bit++) {
            if ((e[limb] >> bit) & 1) fq2_mul(acc, acc, base);
            fq2_sqr(base, base);
        }
    }
    FROB_GAMMA1[0] = acc;            // gamma1_1
    fq2_mul(FROB_GAMMA1[1], acc, acc);          // gamma1_2
    fq2_mul(FROB_GAMMA1[2], FROB_GAMMA1[1], acc); // gamma1_3
    fq2_mul(FROB_GAMMA1[3], FROB_GAMMA1[2], acc);
    fq2_mul(FROB_GAMMA1[4], FROB_GAMMA1[3], acc);
    FROB_INIT = true;
}

static void fq2_frob(Fq2& o, const Fq2& a) {
    // conjugate: (c0 + c1 u)^p = c0 - c1 u  (since u^p = -u, p ≡ 3 mod 4)
    fe_copy(o.c0, a.c0);
    fe_neg(FQ, o.c1, a.c1);
}

static void fq12_frob(Fq12& o, const Fq12& a) {
    frob_init();
    // component-wise conjugate then multiply by gamma powers:
    // a = sum_{i=0..2} (c0_i v^i) + w sum (c1_i v^i)
    // v^p = gamma1_2 * v ; w^p = gamma1_1 * w  (with our tower)
    Fq12 r;
    fq2_frob(r.c0.c0, a.c0.c0);
    fq2_frob(r.c0.c1, a.c0.c1);
    fq2_frob(r.c0.c2, a.c0.c2);
    fq2_frob(r.c1.c0, a.c1.c0);
    fq2_frob(r.c1.c1, a.c1.c1);
    fq2_frob(r.c1.c2, a.c1.c2);
    fq2_mul(r.c0.c1, r.c0.c1, FROB_GAMMA1[1]);            // v: gamma1_2
    fq2_mul(r.c0.c2, r.c0.c2, FROB_GAMMA1[3]);            // v^2: gamma1_4
    fq2_mul(r.c1.c0, r.c1.c0, FROB_GAMMA1[0]);            // w: gamma1_1
    fq2_mul(r.c1.c1, r.c1.c1, FROB_GAMMA1[2]);            // w v: gamma1_3
    fq2_mul(r.c1.c2, r.c1.c2, FROB_GAMMA1[4]);            // w v^2: gamma1_5
    o = r;
}

// G2 point (affine over Fq2)
struct G2A { Fq2 x, y; bool inf; };

// line evaluation in Miller loop, D-type twist:
// ell(P) with coefficients (ell_0, ell_vw, ell_vv):
// f * line = f * (ell_0 + ell_vw * w * yP-ish ...)
// We use the standard projective formulas computing line coefficients and
// sparse multiplication.

struct G2P { Fq2 x, y, z; };

static void fq2_mul_fe(Fq2& o, const Fq2& a, const u64* s) {
    fe_mul(FQ, o.c0, a.c0, s);
    fe_mul(FQ, o.c1, a.c1, s);
}

// sparse multiply: f *= (c0 + c1*w*? ...). We represent the line as
// l = a + b*w + c*w^3 where in Fq12 over Fq2 basis w^i... To keep things
// simple and correct we lift the line into a full Fq12 and use fq12_mul.
// (Slower than sparse but still ~instant per pairing on host.)

static void fq12_from_coeffs(Fq12& o, const Fq2& a, const Fq2& b, const Fq2& c) {
    // l = a + b * w + c * w^3 ; w^2 = v  => w^3 = v*w
    // c0 part (even powers of w): a (v^0)
    // c1 part (odd): b (v^0) + c (v^1)
    fq2_set_zero(o.c0.c1);
    fq2_set_zero(o.c0.c2);
    fq2_set_zero(o.c1.c2);
    o.c0.c0 = a;
    o.c1.c0 = b;
    o.c1.c1 = c;
}

// Affine Miller steps.  Untwist map: (x', y') on E' -> (x' w^2, y' w^3) in
// E(Fq12) with w^2 = v, w^6 = xi.  The line through T (slope lam' in Fq2,
// lifted slope lam = lam' * w) evaluated at P = (xp, yp):
//   l(P) = yp - lam'*xp * w + (lam'*x_T - y_T) * v*w
// components: c0.c0 = yp (Fq), c1.c0 = -lam'*xp, c1.c1 = lam'*x_T - y_T.

static void line_eval(Fq12& l, const Fq2& lam, const Fq2& xt, const Fq2& yt,
                      const u64* xp, const u64* yp) {
    fq2_set_zero(l.c0.c1);
    fq2_set_zero(l.c0.c2);
    fq2_set_zero(l.c1.c2);
    fq2_set_zero(l.c0.c0);
    fe_copy(l.c0.c0.c0, yp);
    Fq2 t;
    fq2_mul_fe(t, lam, xp);
    fq2_neg(l.c1.c0, t);
    fq2_mul(t, lam, xt);
    fq2_sub(l.c1.c1, t, yt);
}

static void miller_dbl(Fq12& line, G2A& T, const u64* xp, const u64* yp) {
    // lam' = 3 x^2 / (2 y)
    Fq2 num, den, lam, t;
    fq2_sqr(num, T.x);
    fq2_add(t, num, num);
    fq2_add(num, t, num);
    fq2_add(den, T.y, T.y);
    fq2_inv(den, den);
    fq2_mul(lam, num, den);
    line_eval(line, lam, T.x, T.y, xp, yp);
    // T = 2T
    Fq2 x3, y3;
    fq2_sqr(x3, lam);
    fq2_sub(x3, x3, T.x);
    fq2_sub(x3, x3, T.x);
    fq2_sub(t, T.x, x3);
    fq2_mul(y3, lam, t);
    fq2_sub(y3, y3, T.y);
    T.x = x3;
    T.y = y3;
}

static void miller_add(Fq12& line, G2A& T, const G2A& Q, const u64* xp, const u64* yp) {
    Fq2 num, den, lam, t;
    fq2_sub(num, Q.y, T.y);
    fq2_sub(den, Q.x, T.x);
    fq2_inv(den, den);
    fq2_mul(lam, num, den);
    line_eval(line, lam, T.x, T.y, xp, yp);
    Fq2 x3, y3;
    fq2_sqr(x3, lam);
    fq2_sub(x3, x3, T.x);
    fq2_sub(x3, x3, Q.x);
    fq2_sub(t, T.x, x3);
    fq2_mul(y3, lam, t);
    fq2_sub(y3, y3, T.y);
    T.x = x3;
    T.y = y3;
}

// 6u+2 = 29793968203157093288 needs 65 bits; bits little-endian (bit 0 first)
static const int SIX_U_PLUS_2_BITS = 65;
static const uint8_t SIX_U_PLUS_2_BIT[65] = {
    0,0,0,1,0,1,0,1,1,1,0,1,1,1,0,0,0,1,1,0,1,1,1,0,0,1,1,1,1,1,0,1,
    1,0,0,1,1,1,0,0,0,0,0,0,1,1,1,0,1,0,0,1,1,1,1,0,1,0,1,1,1,0,0,1,1,
};

static void miller_loop(Fq12& f, const G2A& Q, const u64* xp, const u64* yp) {
    fq12_set_one(f);
    if (Q.inf) return;
    G2A T = Q;
    Fq12 l;
    for (int i = SIX_U_PLUS_2_BITS - 2; i >= 0; i--) {
        fq12_sqr(f, f);
        miller_dbl(l, T, xp, yp);
        fq12_mul(f, f, l);
        if (SIX_U_PLUS_2_BIT[i]) {
            miller_add(l, T, Q, xp, yp);
            fq12_mul(f, f, l);
        }
    }
    // frobenius steps: Q1 = pi(Q); nQ2 = pi^2(Q) with y negated
    frob_init();
    G2A Q1, Q2;
    fq2_frob(Q1.x, Q.x);
    fq2_mul(Q1.x, Q1.x, FROB_GAMMA1[1]);   // gamma_{1,2} = xi^((p-1)/3)
    fq2_frob(Q1.y, Q.y);
    fq2_mul(Q1.y, Q1.y, FROB_GAMMA1[2]);   // gamma_{1,3} = xi^((p-1)/2)
    Q1.inf = false;
    Fq2 gamma2_2, gamma2_3, tmp;
    fq2_frob(tmp, FROB_GAMMA1[1]);
    fq2_mul(gamma2_2, FROB_GAMMA1[1], tmp);
    fq2_frob(tmp, FROB_GAMMA1[2]);
    fq2_mul(gamma2_3, FROB_GAMMA1[2], tmp);
    Q2.x = Q.x;
    fq2_mul(Q2.x, Q2.x, gamma2_2);
    Q2.y = Q.y;
    fq2_mul(Q2.y, Q2.y, gamma2_3);
    fq2_neg(Q2.y, Q2.y);
    Q2.inf = false;
    miller_add(l, T, Q1, xp, yp);
    fq12_mul(f, f, l);
    miller_add(l, T, Q2, xp, yp);
    fq12_mul(f, f, l);
}

static void fq12_pow_u64(Fq12& o, const Fq12& a, u64 e) {
    Fq12 acc;
    fq12_set_one(acc);
    Fq12 b = a;
    while (e) {
        if (e & 1) fq12_mul(acc, acc, b);
        fq12_sqr(b, b);
        e >>= 1;
    }
    o = acc;
}

// (q^4 - q^2 + 1) / r, little-endian 64-bit limbs (12 limbs)
static const u64 HARD_EXP[12] = {
    0xe81bb482ccdf42b1ULL, 0x5abf5cc4f49c36d4ULL, 0xf1154e7e1da014fdULL,
    0xdcc7b44c87cdbacfULL, 0xaaa441e3954bcf8aULL, 0x6b887d56d5095f23ULL,
    0x79581e16f3fd90c6ULL, 0x3b1b1355d189227dULL, 0x4e529a5861876f6bULL,
    0x6c0eb522d5b12278ULL, 0x331ec15183177fafULL, 0x01baaa710b0759adULL,
};

static void final_exponentiation(Fq12& o, const Fq12& f_in) {
    // easy part: f^((p^6 - 1)(p^2 + 1))
    Fq12 f = f_in;
    Fq12 f1, f2, r;
    fq12_conj(f1, f);        // f^(p^6)
    fq12_inv(f2, f);
    fq12_mul(r, f1, f2);     // f^(p^6 - 1)
    Fq12 r2;
    fq12_frob(r2, r);
    fq12_frob(r2, r2);       // r^(p^2)
    fq12_mul(r, r2, r);
    // hard part: generic exponentiation by (q^4 - q^2 + 1)/r
    Fq12 acc, base;
    fq12_set_one(acc);
    base = r;
    for (int limb = 0; limb < 12; limb++) {
        u64 e = HARD_EXP[limb];
        for (int bit = 0; bit < 64; bit++) {
            if ((e >> bit) & 1) fq12_mul(acc, acc, base);
            fq12_sqr(base, base);
        }
    }
    o = acc;
}

extern "C" int bn254_pairing_check(
    const uint8_t* g1_points,  // n * 64 bytes (x||y LE), zero => infinity
    const uint8_t* g2_points,  // n * 128 bytes (x.c0||x.c1||y.c0||y.c1 LE)
    long n,
    int* result) {
    Fq12 acc;
    fq12_set_one(acc);
    for (long i = 0; i < n; i++) {
        const uint8_t* p1 = g1_points + 64 * i;
        const uint8_t* p2 = g2_points + 128 * i;
        bool inf1 = true, inf2 = true;
        for (int b = 0; b < 64; b++) if (p1[b]) { inf1 = false; break; }
        for (int b = 0; b < 128; b++) if (p2[b]) { inf2 = false; break; }
        if (inf1 || inf2) continue;
        fe xp, yp;
        fe_from_bytes(FQ, xp, p1);
        fe_from_bytes(FQ, yp, p1 + 32);
        G2A Q;
        fe_from_bytes(FQ, Q.x.c0, p2);
        fe_from_bytes(FQ, Q.x.c1, p2 + 32);
        fe_from_bytes(FQ, Q.y.c0, p2 + 64);
        fe_from_bytes(FQ, Q.y.c1, p2 + 96);
        Q.inf = false;
        Fq12 f;
        miller_loop(f, Q, xp, yp);
        fq12_mul(acc, acc, f);
    }
    Fq12 out;
    final_exponentiation(out, acc);
    *result = fq12_is_one(out) ? 1 : 0;
    return 0;
}

// ---------------------------------------------------------------------------
// keccak-f[1600] / keccak-256
// ---------------------------------------------------------------------------

static const u64 KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL, 0x8000000080008000ULL,
    0x000000000000808bULL, 0x0000000080000001ULL, 0x8000000080008081ULL, 0x8000000000008009ULL,
    0x000000000000008aULL, 0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL, 0x8000000000008003ULL,
    0x8000000000008002ULL, 0x8000000000000080ULL, 0x000000000000800aULL, 0x800000008000000aULL,
    0x8000000080008081ULL, 0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

static inline u64 rotl64(u64 x, int n) { return (x << n) | (x >> (64 - n)); }

static void keccak_f(u64 st[25]) {
    static const int rho[25] = {0, 1, 62, 28, 27, 36, 44, 6, 55, 20,
                                3, 10, 43, 25, 39, 41, 45, 15, 21, 8,
                                18, 2, 61, 56, 14};
    for (int round = 0; round < 24; round++) {
        u64 c[5], d[5];
        for (int x = 0; x < 5; x++)
            c[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20];
        for (int x = 0; x < 5; x++) {
            d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
            for (int y = 0; y < 25; y += 5) st[x + y] ^= d[x];
        }
        u64 b[25];
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(st[x + 5 * y], rho[x + 5 * y]);
        for (int y = 0; y < 25; y += 5)
            for (int x = 0; x < 5; x++)
                st[x + y] = b[x + y] ^ ((~b[(x + 1) % 5 + y]) & b[(x + 2) % 5 + y]);
        st[0] ^= KECCAK_RC[round];
    }
}

extern "C" int bn254_keccak256(const uint8_t* data, long len, uint8_t* out32) {
    u64 st[25];
    memset(st, 0, sizeof(st));
    const long rate = 136;
    long off = 0;
    while (len - off >= rate) {
        for (int i = 0; i < rate / 8; i++) {
            u64 w;
            memcpy(&w, data + off + 8 * i, 8);
            st[i] ^= w;
        }
        keccak_f(st);
        off += rate;
    }
    uint8_t block[136];
    memset(block, 0, sizeof(block));
    memcpy(block, data + off, len - off);
    block[len - off] = 0x01;
    block[rate - 1] |= 0x80;
    for (int i = 0; i < rate / 8; i++) {
        u64 w;
        memcpy(&w, block + 8 * i, 8);
        st[i] ^= w;
    }
    keccak_f(st);
    memcpy(out32, st, 32);
    return 0;
}

// ---------------------------------------------------------------------------
// Witness-plan evaluation (frontend/transpiler.WitnessPlan native path)
//
// Replays the transpiler's witness extension and gathers the four wire
// columns in one call: the python plan evaluation is ~2 s of bigint work
// per 2^20 prove; this is the same computation at Fr-CIOS speed.  All
// values canonical little-endian 32-byte; indices are flat positions in
// [witness | extras | dummy-zero], matching WitnessPlan's layout.
// ---------------------------------------------------------------------------

extern "C" int bn254_witness_eval(
    const uint8_t* witness,      // [n_wit * 32] canonical LE, values < r
    long long n_wit,
    const long long* term_src,   // [n_terms] flat source indices
    const uint8_t* term_coeff,   // [n_terms * 32] canonical LE
    const long long* prog_off,   // [n_extras + 1] term ranges per extra
    const uint8_t* prog_const,   // [n_extras * 32] canonical LE
    long long n_extras,
    const long long* wire_idx,   // [n_cols * n_rows] flat value indices
    long long n_cols,
    long long n_rows,
    uint8_t* out_cols)           // [n_cols][16][n_rows] u16 LE limbs
{
    const long long n_vals = n_wit + n_extras + 1;  // + dummy zero slot
    fe* vals = new fe[n_vals];
    for (long long i = 0; i < n_wit; i++)
        fe_from_bytes(FR, vals[i], witness + 32 * i);
    for (long long e = 0; e < n_extras; e++) {
        fe acc;
        fe_from_bytes(FR, acc, prog_const + 32 * e);
        for (long long t = prog_off[e]; t < prog_off[e + 1]; t++) {
            fe c, prod;
            fe_from_bytes(FR, c, term_coeff + 32 * t);
            fe_mul(FR, prod, c, vals[term_src[t]]);
            fe_add(FR, acc, acc, prod);
        }
        fe_copy(vals[n_wit + e], acc);
    }
    fe_zero(vals[n_vals - 1]);
    // one from-Montgomery per DISTINCT value...
    uint16_t* canon = new uint16_t[(size_t)n_vals * 16];
    for (long long i = 0; i < n_vals; i++)
        fe_to_bytes(FR, (uint8_t*)(canon + 16 * i), vals[i]);
    // ...then gather into limb-planar [16, n_rows] layout per column (the
    // device wire format) so python needs no strided transpose
    uint16_t* out = (uint16_t*)out_cols;
    for (long long j = 0; j < n_cols; j++) {
        uint16_t* colbase = out + (size_t)j * 16 * n_rows;
        for (long long r = 0; r < n_rows; r++) {
            long long src = wire_idx[j * n_rows + r];
            if (src < 0 || src >= n_vals) { delete[] vals; delete[] canon; return 2; }
            const uint16_t* v = canon + 16 * src;
            for (int l = 0; l < 16; l++)
                colbase[(size_t)l * n_rows + r] = v[l];
        }
    }
    delete[] vals;
    delete[] canon;
    return 0;
}

// version probe for the ctypes loader
extern "C" int bn254_abi_version() { return 1; }

// ---------------------------------------------------------------------------
// debug exports (differential testing against the python implementation)
// ---------------------------------------------------------------------------

static void fq12_to_bytes(uint8_t* out, const Fq12& a) {
    const Fq2* cs[6] = {&a.c0.c0, &a.c0.c1, &a.c0.c2, &a.c1.c0, &a.c1.c1, &a.c1.c2};
    for (int i = 0; i < 6; i++) {
        fe_to_bytes(FQ, out + 64 * i, cs[i]->c0);
        fe_to_bytes(FQ, out + 64 * i + 32, cs[i]->c1);
    }
}

extern "C" int bn254_debug_miller(const uint8_t* g1xy, const uint8_t* g2x0x1y0y1,
                                  uint8_t* out384) {
    fe xp, yp;
    fe_from_bytes(FQ, xp, g1xy);
    fe_from_bytes(FQ, yp, g1xy + 32);
    G2A Q;
    fe_from_bytes(FQ, Q.x.c0, g2x0x1y0y1);
    fe_from_bytes(FQ, Q.x.c1, g2x0x1y0y1 + 32);
    fe_from_bytes(FQ, Q.y.c0, g2x0x1y0y1 + 64);
    fe_from_bytes(FQ, Q.y.c1, g2x0x1y0y1 + 96);
    Q.inf = false;
    Fq12 f;
    miller_loop(f, Q, xp, yp);
    fq12_to_bytes(out384, f);
    return 0;
}

extern "C" int bn254_debug_finalexp(const uint8_t* in384, uint8_t* out384) {
    Fq12 f;
    const uint8_t* p = in384;
    Fq2* cs[6] = {&f.c0.c0, &f.c0.c1, &f.c0.c2, &f.c1.c0, &f.c1.c1, &f.c1.c2};
    for (int i = 0; i < 6; i++) {
        fe_from_bytes(FQ, cs[i]->c0, p + 64 * i);
        fe_from_bytes(FQ, cs[i]->c1, p + 64 * i + 32);
    }
    Fq12 o;
    final_exponentiation(o, f);
    fq12_to_bytes(out384, o);
    return 0;
}
