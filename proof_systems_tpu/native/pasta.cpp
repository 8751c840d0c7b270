// Native host runtime: 256-bit Montgomery field arithmetic + Poseidon
// permutation for the Fiat-Shamir transcript sponges.
//
// Role: the host-side hot path of the prover is the sequential
// transcript (dozens of Poseidon permutations + challenge derivations
// per proof) and host EC fallbacks — the reference runs these on native
// Rust (poseidon/src/permutation.rs, arkworks field ops); this library
// is the C++ equivalent for the TPU framework, loaded via ctypes
// (proof_systems_tpu/native/__init__.py). Parameters (modulus, R^2,
// MDS, round constants) are injected at runtime so the same binary
// serves Fp and Fq of the Pasta cycle (and any future field).
//
// Arithmetic: 4x64-bit limbs, CIOS Montgomery multiplication using
// __uint128_t (one pass, no final subtraction loop beyond the standard
// conditional).

#include <cstdint>
#include <cstring>
#include <cstdlib>

typedef unsigned __int128 u128;

struct Fe {
    uint64_t v[4];
};

struct FieldCtx {
    Fe p;
    Fe r2;
    uint64_t pinv;  // -p^{-1} mod 2^64
};

static inline bool geq(const Fe &a, const Fe &b) {
    for (int i = 3; i >= 0; --i) {
        if (a.v[i] != b.v[i]) return a.v[i] > b.v[i];
    }
    return true;
}

static inline void sub_nored(Fe &r, const Fe &a, const Fe &b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        r.v[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

static inline void add_mod(const FieldCtx &f, Fe &r, const Fe &a, const Fe &b) {
    u128 carry = 0;
    Fe t;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        t.v[i] = (uint64_t)s;
        carry = s >> 64;
    }
    if (carry || geq(t, f.p)) {
        Fe u;
        sub_nored(u, t, f.p);
        r = u;
    } else {
        r = t;
    }
}

// CIOS Montgomery multiplication (Pasta moduli have top bit clear, so
// the 5-limb accumulator never overflows).
static inline void mont_mul(const FieldCtx &f, Fe &r, const Fe &a, const Fe &b) {
    uint64_t t[5] = {0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 cur = (u128)a.v[j] * b.v[i] + t[j] + carry;
            t[j] = (uint64_t)cur;
            carry = cur >> 64;
        }
        u128 t4 = (u128)t[4] + carry;
        uint64_t m = t[0] * f.pinv;
        carry = ((u128)m * f.p.v[0] + t[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 cur = (u128)m * f.p.v[j] + t[j] + carry;
            t[j - 1] = (uint64_t)cur;
            carry = cur >> 64;
        }
        t4 += carry;
        t[3] = (uint64_t)t4;
        t[4] = (uint64_t)(t4 >> 64);
    }
    Fe out{{t[0], t[1], t[2], t[3]}};
    if (t[4] || geq(out, f.p)) {
        Fe u;
        sub_nored(u, out, f.p);
        r = u;
    } else {
        r = out;
    }
}

static inline void mont_sqr(const FieldCtx &f, Fe &r, const Fe &a) {
    mont_mul(f, r, a, a);
}

struct SpongeCtx {
    FieldCtx f;
    int rounds;
    int sbox_e;
    int initial_ark;
    Fe mds[3][3];
    Fe *rc;  // (rounds + initial_ark) * 3, Montgomery form
};

static void to_mont(const FieldCtx &f, Fe &r, const Fe &a) { mont_mul(f, r, a, f.r2); }

static void from_mont(const FieldCtx &f, Fe &r, const Fe &a) {
    Fe one{{1, 0, 0, 0}};
    mont_mul(f, r, a, one);
}

static inline void sbox_apply(const SpongeCtx &s, Fe &x) {
    Fe x2, x3, r;
    mont_sqr(s.f, x2, x);
    mont_mul(s.f, x3, x2, x);
    if (s.sbox_e == 7) {
        Fe x6;
        mont_sqr(s.f, x6, x3);
        mont_mul(s.f, r, x6, x);
    } else {  // 5
        Fe x4;
        mont_sqr(s.f, x4, x2);
        mont_mul(s.f, r, x4, x);
    }
    x = r;
}

extern "C" {

void *ps_new(const uint8_t *p_le, const uint8_t *r2_le, uint64_t pinv,
             int rounds, int sbox_e, int initial_ark,
             const uint8_t *mds_le, const uint8_t *rc_le) {
    SpongeCtx *s = new SpongeCtx();
    std::memcpy(s->f.p.v, p_le, 32);
    std::memcpy(s->f.r2.v, r2_le, 32);
    s->f.pinv = pinv;
    s->rounds = rounds;
    s->sbox_e = sbox_e;
    s->initial_ark = initial_ark;
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
            Fe raw;
            std::memcpy(raw.v, mds_le + 32 * (3 * i + j), 32);
            to_mont(s->f, s->mds[i][j], raw);
        }
    int nrc = (rounds + initial_ark) * 3;
    s->rc = (Fe *)std::malloc(sizeof(Fe) * nrc);
    for (int i = 0; i < nrc; ++i) {
        Fe raw;
        std::memcpy(raw.v, rc_le + 32 * i, 32);
        to_mont(s->f, s->rc[i], raw);
    }
    return s;
}

void ps_free(void *ctx) {
    SpongeCtx *s = (SpongeCtx *)ctx;
    std::free(s->rc);
    delete s;
}

// state: 3 x 32 LE bytes, standard form; permuted in place.
void ps_permute(void *ctx, uint8_t *state_bytes) {
    SpongeCtx *s = (SpongeCtx *)ctx;
    Fe st[3];
    for (int i = 0; i < 3; ++i) {
        Fe raw;
        std::memcpy(raw.v, state_bytes + 32 * i, 32);
        to_mont(s->f, st[i], raw);
    }
    const Fe *rc = s->rc;
    if (s->initial_ark) {
        for (int i = 0; i < 3; ++i) add_mod(s->f, st[i], st[i], rc[i]);
        rc += 3;
    }
    for (int r = 0; r < s->rounds; ++r) {
        for (int i = 0; i < 3; ++i) sbox_apply(*s, st[i]);
        Fe nw[3];
        for (int i = 0; i < 3; ++i) {
            Fe acc, t;
            mont_mul(s->f, acc, s->mds[i][0], st[0]);
            mont_mul(s->f, t, s->mds[i][1], st[1]);
            add_mod(s->f, acc, acc, t);
            mont_mul(s->f, t, s->mds[i][2], st[2]);
            add_mod(s->f, acc, acc, t);
            add_mod(s->f, nw[i], acc, rc[3 * r + i]);
        }
        st[0] = nw[0];
        st[1] = nw[1];
        st[2] = nw[2];
    }
    for (int i = 0; i < 3; ++i) {
        Fe out;
        from_mont(s->f, out, st[i]);
        std::memcpy(state_bytes + 32 * i, out.v, 32);
    }
}

}  // extern "C"
