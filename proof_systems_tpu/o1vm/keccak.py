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
