"""Keccak-f[1600] + keccak256, with execution-proof columns.

Capability mirror of o1vm/src/interpreters/keccak/ (dual-mode Keccak
interpreter: witness columns + constraints) and the kimchi Keccak
gadget circuits (kimchi/src/circuits/polynomials/keccak/).

TPU-first design: instead of the reference's 13/15-bit sparse-limb
representation (tuned for CPU u64 tricks + plookup), the state is
BIT-SLICED: one boolean column per state bit, one row per round.
Bitwise logic becomes low-degree field algebra over columns —
  xor(a,b)   = a + b - 2ab
  chi(b0,b1,b2) = b0 + (1-b1) b2 - 2 b0 (1-b1) b2
and the 5-way theta parity uses a carry trick: witness the parity bit
plus two carry bits (k0, k1) with  sum5 = parity + 2 k0 + 4 k1.
All constraints are degree <= 3; booleanity pins every column. This
maps to the VPU as massively batched elementwise work and removes the
lookup tables entirely (the reference needs them only because of its
sparse encoding).

Row layout (one row per round, NEXT row = post-round state):
  state bits a[x][y][z]        5*5*64 = 1600 columns
  theta parity[x][z]                    320 columns
  theta carries k0[x][z], k1[x][z]      640 columns
  post-theta bits t[x][y][z]           1600 columns   (total 4160)
"""

from __future__ import annotations

from ..circuits import expr as E
from ..fields import FieldParams

ROUNDS = 24
RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
# rho rotation offsets r[x][y]
RHO = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
MASK64 = (1 << 64) - 1


def _rotl(v: int, r: int) -> int:
    r %= 64
    return ((v << r) | (v >> (64 - r))) & MASK64


def keccak_f(state: list[list[int]]) -> list[list[int]]:
    """The permutation on a 5x5 matrix of 64-bit lanes (host golden)."""
    a = [row[:] for row in state]
    for rnd in range(ROUNDS):
        a = keccak_round(a, RC[rnd])
    return a


def keccak_round(a: list[list[int]], rc: int) -> list[list[int]]:
    c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
    d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
    t = [[(a[x][y] ^ d[x]) for y in range(5)] for x in range(5)]
    b = [[0] * 5 for _ in range(5)]
    for x in range(5):
        for y in range(5):
            b[y][(2 * x + 3 * y) % 5] = _rotl(t[x][y], RHO[x][y])
    out = [[0] * 5 for _ in range(5)]
    for x in range(5):
        for y in range(5):
            out[x][y] = b[x][y] ^ ((b[(x + 1) % 5][y] ^ MASK64) & b[(x + 2) % 5][y])
    out[0][0] ^= rc
    return out


def keccak256(data: bytes) -> bytes:
    """Ethereum-style Keccak-256 (pad 0x01, rate 1088)."""
    return _sponge(data, rate_bytes=136, out_bytes=32, pad_byte=0x01)


def sha3_256(data: bytes) -> bytes:
    """NIST SHA3-256 (pad 0x06)."""
    return _sponge(data, rate_bytes=136, out_bytes=32, pad_byte=0x06)


def _sponge(data: bytes, rate_bytes: int, out_bytes: int, pad_byte: int) -> bytes:
    state = [[0] * 5 for _ in range(5)]
    msg = bytearray(data)
    msg.append(pad_byte)
    while len(msg) % rate_bytes:
        msg.append(0)
    msg[-1] |= 0x80
    for off in range(0, len(msg), rate_bytes):
        block = msg[off : off + rate_bytes]
        for i in range(rate_bytes // 8):
            lane = int.from_bytes(block[8 * i : 8 * i + 8], "little")
            x, y = i % 5, i // 5
            state[x][y] ^= lane
        state = keccak_f(state)
    out = bytearray()
    while len(out) < out_bytes:
        for i in range(rate_bytes // 8):
            x, y = i % 5, i // 5
            out += state[x][y].to_bytes(8, "little")
            if len(out) >= out_bytes:
                break
        if len(out) < out_bytes:
            state = keccak_f(state)
    return bytes(out[:out_bytes])


# -- execution-proof columns ------------------------------------------------


class Layout:
    def __init__(self):
        idx = 0

        def block(n):
            nonlocal idx
            r = list(range(idx, idx + n))
            idx += n
            return r

        self.a = block(1600)  # bit (x*5 + y)*64 + z
        self.parity = block(320)  # x*64 + z
        self.k0 = block(320)
        self.k1 = block(320)
        self.t = block(1600)  # post-theta bits
        self.ncols = idx

    def abit(self, x, y, z):
        return self.a[(x * 5 + y) * 64 + z]

    def tbit(self, x, y, z):
        return self.t[(x * 5 + y) * 64 + z]


LAYOUT = Layout()


def build_columns(f: FieldParams, state0: list[list[int]], nrows: int | None = None):
    """Witness for one full permutation: ROUNDS rows + 1 output row."""
    L = LAYOUT
    n = nrows or (ROUNDS + 1)
    assert n >= ROUNDS + 1
    cols = [[0] * n for _ in range(L.ncols)]
    a = [row[:] for row in state0]
    for rnd in range(ROUNDS):
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                lane = a[x][y]
                tlane = lane ^ d[x]
                for z in range(64):
                    cols[L.abit(x, y, z)][rnd] = (lane >> z) & 1
                    cols[L.tbit(x, y, z)][rnd] = (tlane >> z) & 1
        for x in range(5):
            for z in range(64):
                s = sum((a[x][y] >> z) & 1 for y in range(5))
                cols[L.parity[x * 64 + z]][rnd] = s & 1
                cols[L.k0[x * 64 + z]][rnd] = (s >> 1) & 1
                cols[L.k1[x * 64 + z]][rnd] = (s >> 2) & 1
        a = keccak_round(a, RC[rnd])
    for x in range(5):
        for y in range(5):
            for z in range(64):
                cols[L.abit(x, y, z)][ROUNDS] = (a[x][y] >> z) & 1
    return cols, a


def _xor(a: E.Expr, b: E.Expr) -> E.Expr:
    return a + b - E.Literal(2) * a * b


def round_selector_column(f: FieldParams, n: int) -> list[int]:
    """1 on the ROUNDS active rows, 0 after (gates the transition)."""
    return [1 if i < ROUNDS else 0 for i in range(n)]


def constraints(f: FieldParams, sel_col: int, rc_cols: list[int]) -> list[E.Expr]:
    """Round-function constraints, gated by a selector column and fed the
    per-row round-constant bits from 64 fixed columns `rc_cols`.

    Degree <= 3 + selector: theta parity is linear given the carry bits;
    chi/iota read the witnessed post-theta bits through the rho/pi
    permutation (an index shuffle — free)."""
    from .pickles import col

    L = LAYOUT

    def c(i, row=E.CURR):
        return E.Cell(col(i), row)

    sel = c(sel_col)
    one = E.Literal(1)
    out = []

    # booleanity (ungated: all columns are bits everywhere)
    for i in [*L.a, *L.parity, *L.k0, *L.k1, *L.t]:
        out.append(c(i).boolean())

    # theta parity with carry bits: sum_y a - parity - 2 k0 - 4 k1 = 0
    for x in range(5):
        for z in range(64):
            s: E.Expr = E.Literal(0)
            for y in range(5):
                s = s + c(L.abit(x, y, z))
            i = x * 64 + z
            out.append(
                sel
                * (s - c(L.parity[i]) - E.Literal(2) * c(L.k0[i]) - E.Literal(4) * c(L.k1[i]))
            )

    # post-theta bits: t = a xor d, d[x][z] = parity[x-1][z] xor parity[x+1][z-1]
    for x in range(5):
        for z in range(64):
            d = _xor(
                c(L.parity[((x - 1) % 5) * 64 + z]),
                c(L.parity[((x + 1) % 5) * 64 + ((z - 1) % 64)]),
            )
            for y in range(5):
                out.append(sel * (c(L.tbit(x, y, z)) - _xor(c(L.abit(x, y, z)), d)))

    # chi + iota on rho/pi-shuffled post-theta bits -> next-row state
    # b[y][(2x+3y)%5][z] = t[x][y][(z - RHO[x][y]) % 64]
    def bbit(x, y, z):
        for sx in range(5):
            for sy in range(5):
                if (sy, (2 * sx + 3 * sy) % 5) == (x, y):
                    return c(L.tbit(sx, sy, (z - RHO[sx][sy]) % 64))
        raise AssertionError

    for x in range(5):
        for y in range(5):
            for z in range(64):
                b0 = bbit(x, y, z)
                b1 = bbit((x + 1) % 5, y, z)
                b2 = bbit((x + 2) % 5, y, z)
                chi = b0 + (one - b1) * b2 - E.Literal(2) * b0 * (one - b1) * b2
                nxt = c(L.abit(x, y, z), E.NEXT)
                if x == 0 and y == 0:
                    chi = _xor(chi, c(rc_cols[z]))
                out.append(sel * (nxt - chi))
    return out


# -- proving (pickles column prover, class-batched quotient) -----------------
#
# The permutation trace has 4,160 bit columns and 7,680 + 3,200 tiny
# constraints. The generic AST walk (expr.eval_dev) would inline every
# one into the XLA graph (~10^7 HLO ops); instead each CLASS of
# same-shape constraints is evaluated as ONE batched limb kernel over a
# stacked (K, ...) axis and folded with its alpha powers — the same
# numerator Σ alpha^i c_i, in a TPU-sized graph. The verifier side
# recomputes the AST at zeta (scalar, cheap), so the two must match the
# constraint ORDER exactly: booleanity, theta parity, post-theta bits,
# chi/iota, then the row-0 / row-ROUNDS state pins.


def _perm_index_maps():
    """Flat t-column offsets for b(x,y,z), b(x+1,y,z), b(x+2,y,z) in
    chi's x->y->z constraint order."""
    import numpy as np

    src = {}
    for sx in range(5):
        for sy in range(5):
            src[(sy, (2 * sx + 3 * sy) % 5)] = (sx, sy)
    maps = []
    for dx in range(3):
        idx = np.empty(1600, dtype=np.int32)
        k = 0
        for x in range(5):
            for y in range(5):
                sx, sy = src[((x + dx) % 5, y)]
                for z in range(64):
                    idx[k] = (sx * 5 + sy) * 64 + ((z - RHO[sx][sy]) % 64)
                    k += 1
        maps.append(idx)
    return maps


def state_pin_constraints(f: FieldParams, state0, final, rounds_row: int):
    """Boundary pins: row 0 holds state0's bits, row `rounds_row` the
    output bits (appended after constraints() in alpha order)."""
    from .pickles import col

    L = LAYOUT
    out = []
    for row, st in ((0, state0), (rounds_row, final)):
        lag = E.UnnormalizedLagrangeBasis(row)
        for x in range(5):
            for y in range(5):
                for z in range(64):
                    bit = (st[x][y] >> z) & 1
                    out.append(lag * (E.Cell(col(L.abit(x, y, z)), E.CURR)
                                      - E.Literal(bit)))
    return out


def batched_numerator(f: FieldParams, sel_idx: int, rc_idx, state0, final):
    """-> callable(evals8, ctx) computing the combined quotient
    numerator over d8 with class-batched kernels."""
    import jax.numpy as jnp
    import numpy as np

    from ..ops import limb

    L = LAYOUT
    p = f.p
    i0, i1, i2 = _perm_index_maps()

    def run(evals8, ctx):
        F = ctx.F
        alpha = ctx.challenges["alpha"]

        def tree_sum(v):
            # v: (16, K, n8) mod-p terms -> (16, n8)
            K = v.shape[1]
            while K > 1:
                if K % 2:
                    v = jnp.concatenate(
                        [v, jnp.zeros_like(v[:, :1])], axis=1)
                    K += 1
                v = limb.add(F, v[:, : K // 2], v[:, K // 2 :])
                K //= 2
            return v[:, 0]

        def weighted(vals, a_start):
            # vals: (16, K, n8); multiply by alpha^{a_start+i} and sum
            K = vals.shape[1]
            pows = [pow(alpha, a_start + i, p) for i in range(K)]
            ap = jnp.broadcast_to(
                F.pack_mont(pows, shape=(K,))[:, :, None], vals.shape
            )
            return tree_sum(limb.mont_mul(F, vals, ap))

        n8 = evals8.shape[-1]
        sel = evals8[:, sel_idx]  # (16, n8)

        def gated(v):  # broadcast sel over the class axis
            return limb.mont_mul(
                F, v, jnp.broadcast_to(sel[:, None], v.shape)
            )

        # A: booleanity x^2 - x for columns 0..4159
        xb = evals8[:, : L.ncols]
        A = weighted(limb.sub(F, limb.mont_sqr(F, xb), xb), 0)

        # B: theta parity (x -> z): sum_y a - parity - 2 k0 - 4 k1
        a_r = evals8[:, : 1600].reshape(NL, 5, 5, 64, n8)
        par = evals8[:, L.parity[0] : L.parity[0] + 320].reshape(NL, 5, 64, n8)
        k0 = evals8[:, L.k0[0] : L.k0[0] + 320].reshape(NL, 5, 64, n8)
        k1 = evals8[:, L.k1[0] : L.k1[0] + 320].reshape(NL, 5, 64, n8)
        s = limb.add(F, limb.add(F, a_r[:, :, 0], a_r[:, :, 1]),
                     limb.add(F, a_r[:, :, 2], a_r[:, :, 3]))
        s = limb.add(F, s, a_r[:, :, 4])
        tb = limb.sub(F, limb.sub(F, s, par), limb.double_mod(F, k0))
        tb = limb.sub(F, tb, limb.double_mod(F, limb.double_mod(F, k1)))
        B = weighted(gated(tb.reshape(NL, 320, n8)), L.ncols)

        # C: post-theta bits (x -> z -> y): t - a - d + 2 a d,
        #    d = p1 + p2 - 2 p1 p2 over (x, z)
        p1 = jnp.roll(par, 1, axis=1)                    # parity[x-1]
        p2 = jnp.roll(jnp.roll(par, -1, axis=1), 1, axis=2)  # parity[x+1][z-1]
        d = limb.sub(F, limb.add(F, p1, p2),
                     limb.double_mod(F, limb.mont_mul(F, p1, p2)))
        a_xzy = jnp.transpose(a_r, (0, 1, 3, 2, 4))      # (16,5,64,5,n8)
        t_xzy = jnp.transpose(
            evals8[:, L.t[0] : L.t[0] + 1600].reshape(NL, 5, 5, 64, n8),
            (0, 1, 3, 2, 4),
        )
        d_b = jnp.broadcast_to(d[:, :, :, None], a_xzy.shape)
        ad = limb.mont_mul(F, a_xzy, d_b)
        cv = limb.add(F, limb.sub(F, limb.sub(F, t_xzy, a_xzy), d_b),
                      limb.double_mod(F, ad))
        C = weighted(gated(cv.reshape(NL, 1600, n8)), L.ncols + 320)

        # D: chi/iota (x -> y -> z): a_next - chi', with the round
        #    constant xored in on the (0,0) lane (rc columns are zero
        #    elsewhere only by witness; the xor form with rc_t = 0 on
        #    other lanes is the identity, so one uniform formula works)
        t_flat = evals8[:, L.t[0] : L.t[0] + 1600]
        b0 = t_flat[:, i0]
        b1 = t_flat[:, i1]
        b2 = t_flat[:, i2]
        one = F.one_mont((1600, n8))
        u = limb.mont_mul(F, limb.sub(F, one, b1), b2)
        chi = limb.add(F, b0, limb.sub(F, u, limb.double_mod(
            F, limb.mont_mul(F, b0, u))))
        rc = evals8[:, rc_idx[0] : rc_idx[0] + 64]
        rc_t = jnp.concatenate(
            [rc, jnp.zeros((NL, 1536, n8), dtype=rc.dtype)], axis=1
        )
        chi = limb.add(F, chi, limb.sub(F, rc_t, limb.double_mod(
            F, limb.mont_mul(F, chi, rc_t))))
        a_next = jnp.roll(evals8[:, :1600], -8, axis=-1)
        D = weighted(gated(limb.sub(F, a_next, chi)), L.ncols + 1920)

        # E: state pins — lag_row * (sum_i alpha^i a_i - sum alpha^i bit_i)
        total = limb.add(F, limb.add(F, A, B), limb.add(F, C, D))
        a_start = L.ncols + 3520
        for row, st in ((0, state0), (ROUNDS, final)):
            lag = ctx.unnormalized_lagrange[row]  # (16, n8)
            wsum = weighted(evals8[:, :1600], a_start)
            litsum = 0
            k = 0
            for x in range(5):
                for y in range(5):
                    for z in range(64):
                        if (st[x][y] >> z) & 1:
                            litsum = (litsum + pow(alpha, a_start + k, p)) % p
                        k += 1
            pin = limb.sub(
                F, wsum,
                jnp.broadcast_to(F.const_mont(litsum)[:, None], wsum.shape),
            )
            total = limb.add(F, total, limb.mont_mul(F, pin, lag))
            a_start += 1600
        return total

    return run


NL = 16  # limb count (ops/limb.NLIMBS)


def prove_keccak(domain, srs, curve, state0, rng):
    """Prove one keccak-f permutation: ROUNDS+1 rows, all 4,160 bit
    columns + selector + 64 round-constant columns (pinned by the
    verifier via recommitment). Returns (proof, final_state)."""
    from ..ops import limb
    from .pickles import prove_columns

    f = curve.scalar
    n = domain.d1.n
    assert n >= ROUNDS + 1
    L = LAYOUT
    cols, final = build_columns(f, state0, n)
    sel_idx = L.ncols
    rc_idx = [L.ncols + 1 + z for z in range(64)]
    cols.append(round_selector_column(f, n))
    for z in range(64):
        cols.append([(RC[r] >> z) & 1 if r < ROUNDS else 0 for r in range(n)])

    cons = constraints(f, sel_idx, rc_idx) + state_pin_constraints(
        f, state0, final, ROUNDS
    )
    F = limb.device_field(f)
    flat = [v for colv in cols for v in colv]
    dev = F.pack_mont(flat, shape=(len(cols), n))
    proof = prove_columns(
        domain, srs, curve, dev, cons, rng,
        quotient_numerator=batched_numerator(f, sel_idx, rc_idx, state0, final),
    )
    return proof, final


def verify_keccak(domain, srs, curve, proof, state0, final, rng) -> bool:
    """Check a keccak-f proof against the public (state0 -> final)
    statement: rebuild the constraint AST (incl. boundary pins), pin
    the selector and round-constant columns by recommitment, verify."""
    from ..ops import limb
    from .pickles import verify_columns

    f = curve.scalar
    n = domain.d1.n
    L = LAYOUT
    sel_idx = L.ncols
    rc_idx = [L.ncols + 1 + z for z in range(64)]
    cons = constraints(f, sel_idx, rc_idx) + state_pin_constraints(
        f, state0, final, ROUNDS
    )
    F = limb.device_field(f)
    pin_cols = {sel_idx: round_selector_column(f, n)}
    for z in range(64):
        pin_cols[rc_idx[z]] = [
            (RC[r] >> z) & 1 if r < ROUNDS else 0 for r in range(n)
        ]
    for ci, colv in pin_cols.items():
        dev = F.pack_mont(colv, shape=(1, n))
        coeffs = domain.d1.intt(dev)
        expected = srs.mask(srs.commit_coeffs_dev(coeffs, 1)[0], [1])
        if proof.commitments[ci].chunks != expected.chunks:
            return False
    return verify_columns(domain, srs, curve, cons, proof, rng)
