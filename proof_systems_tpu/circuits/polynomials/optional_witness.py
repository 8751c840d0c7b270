"""Gadget constructors + witness fillers for the optional gates.

Mirrors:
  - range_check/gadget.rs:30-110 + witness.rs:29-110 (multi-range-check:
    rows [RangeCheck0 v0, RangeCheck0 v1, RangeCheck1 v2, Zero] with the
    4 MSB-copy wire connections),
  - xor.rs:183-230 (num_xors 16-bit chunks + terminating Zero row),
  - rot.rs:47-110,311-360 (Rot64 + two RangeCheck0 rows for shifted and
    excess, excess wired into the Rot64 row).
"""

from __future__ import annotations

from ...fields import FieldParams
from ..gate import COLUMNS, CircuitGate, GateType, connect_cell_pair, new_wires

LIMB = 88


def _bits(v: int, lo: int, hi: int) -> int:
    return (v >> lo) & ((1 << (hi - lo)) - 1)


def _rc0_row_values(v: int) -> list[int]:
    return [
        v,
        _bits(v, 76, 88),
        _bits(v, 64, 76),
        _bits(v, 52, 64),
        _bits(v, 40, 52),
        _bits(v, 28, 40),
        _bits(v, 16, 28),
        _bits(v, 14, 16),
        _bits(v, 12, 14),
        _bits(v, 10, 12),
        _bits(v, 8, 10),
        _bits(v, 6, 8),
        _bits(v, 4, 6),
        _bits(v, 2, 4),
        _bits(v, 0, 2),
    ]


def create_multi_range_check(start_row: int, compact: bool = False) -> list[CircuitGate]:
    coeff = 1 if compact else 0
    gates = [
        CircuitGate(GateType.RangeCheck0, new_wires(start_row), [0]),
        CircuitGate(GateType.RangeCheck0, new_wires(start_row + 1), [coeff]),
        CircuitGate(GateType.RangeCheck1, new_wires(start_row + 2), []),
        CircuitGate.zero(start_row + 3),
    ]
    # MSB copies into the Zero row (gadget.rs:100-112)
    local = lambda r, c: (start_row + r, c)
    pairs = [((0, 1), (3, 3)), ((0, 2), (3, 4)), ((1, 1), (3, 5)), ((1, 2), (3, 6))]
    # connect within the local slice; gates list indices == relative rows
    for (r1, c1), (r2, c2) in pairs:
        w1 = gates[r1].wires[c1]
        w2 = gates[r2].wires[c2]
        ws1 = list(gates[r1].wires)
        ws1[c1] = w2
        gates[r1].wires = tuple(ws1)
        ws2 = list(gates[r2].wires)
        ws2[c2] = w1
        gates[r2].wires = tuple(ws2)
    return gates


def multi_range_check_witness(
    witness: list[list[int]], row: int, v0: int, v1: int, v2: int, compact: bool = False
) -> None:
    """witness.rs layout: 4 rows for (v0, v1, v2) 88-bit checks."""
    for c, val in enumerate(_rc0_row_values(v0)):
        witness[c][row] = val
    for c, val in enumerate(_rc0_row_values(v1)):
        witness[c][row + 1] = val
    if compact:
        # compact: row+1 col 0/1 hold (v12 decomposition) — handled by caller
        pass
    r2 = row + 2
    vals2 = [
        v2,
        0,  # v12 (optional, compact mode)
        _bits(v2, 86, 88),
        _bits(v2, 74, 86),
        _bits(v2, 62, 74),
        _bits(v2, 50, 62),
        _bits(v2, 38, 50),
        _bits(v2, 36, 38),
        _bits(v2, 34, 36),
        _bits(v2, 32, 34),
        _bits(v2, 30, 32),
        _bits(v2, 28, 30),
        _bits(v2, 26, 28),
        _bits(v2, 24, 26),
        _bits(v2, 22, 24),
    ]
    for c, val in enumerate(vals2):
        witness[c][r2] = val
    r3 = row + 3
    vals3 = [
        _bits(v2, 20, 22),
        _bits(v2, 18, 20),
        _bits(v2, 16, 18),
        _bits(v0, 76, 88),
        _bits(v0, 64, 76),
        _bits(v1, 76, 88),
        _bits(v1, 64, 76),
        _bits(v2, 14, 16),
        _bits(v2, 12, 14),
        _bits(v2, 10, 12),
        _bits(v2, 8, 10),
        _bits(v2, 6, 8),
        _bits(v2, 4, 6),
        _bits(v2, 2, 4),
        _bits(v2, 0, 2),
    ]
    for c, val in enumerate(vals3):
        witness[c][r3] = val


def num_xors(bits: int) -> int:
    return -(-bits // 16)


def create_xor_gadget(start_row: int, bits: int = 64) -> list[CircuitGate]:
    gates = [
        CircuitGate(GateType.Xor16, new_wires(start_row + i), [])
        for i in range(num_xors(bits))
    ]
    gates.append(CircuitGate.zero(start_row + num_xors(bits)))
    return gates


def xor_witness(
    witness: list[list[int]], row: int, in1: int, in2: int, bits: int = 64
) -> int:
    out = in1 ^ in2
    for chunk in range(num_xors(bits)):
        r = row + chunk
        s = 16 * chunk
        a, b, o = in1 >> s, in2 >> s, out >> s
        vals = [a, b, o]
        for x in (a, b, o):
            vals += [_bits(x, 0, 4), _bits(x, 4, 8), _bits(x, 8, 12), _bits(x, 12, 16)]
        # layout: cols 3-6 in1 nybbles, 7-10 in2, 11-14 out
        row_vals = [a, b, o]
        row_vals += [_bits(a, 0, 4), _bits(a, 4, 8), _bits(a, 8, 12), _bits(a, 12, 16)]
        row_vals += [_bits(b, 0, 4), _bits(b, 4, 8), _bits(b, 8, 12), _bits(b, 12, 16)]
        row_vals += [_bits(o, 0, 4), _bits(o, 4, 8), _bits(o, 8, 12), _bits(o, 12, 16)]
        for c, val in enumerate(row_vals):
            witness[c][r] = val
    # terminating zero row is already zero
    return out


def create_rot64_gadget(start_row: int, rot: int, f: FieldParams) -> list[CircuitGate]:
    gates = [
        CircuitGate(GateType.Rot64, new_wires(start_row), [pow(2, rot, f.p)]),
        CircuitGate(GateType.RangeCheck0, new_wires(start_row + 1), [0]),
        CircuitGate(GateType.RangeCheck0, new_wires(start_row + 2), [0]),
    ]
    # connect excess (row 0 col 2) with the second RangeCheck0's value cell
    w1 = gates[0].wires[2]
    w2 = gates[2].wires[0]
    ws = list(gates[0].wires)
    ws[2] = w2
    gates[0].wires = tuple(ws)
    ws = list(gates[2].wires)
    ws[0] = w1
    gates[2].wires = tuple(ws)
    return gates


def rot64_witness(
    witness: list[list[int]], row: int, word: int, rot: int
) -> int:
    """rot.rs:311-360: rotated = (word << rot | word >> (64-rot)) mod 2^64."""
    word &= (1 << 64) - 1
    rotated = ((word << rot) | (word >> (64 - rot))) & ((1 << 64) - 1) if rot else word
    excess = word >> (64 - rot) if rot else 0
    shifted = (word << rot) & ((1 << 64) - 1)
    bound = excess - (1 << rot) + (1 << 64)
    vals0 = [word, rotated, excess] + _rc0_row_values(bound)[3:]
    # bound occupies the limb/crumb columns of the Rot64 row (cols 3..14)
    row_vals = [word, rotated, excess]
    rc = _rc0_row_values(bound)
    row_vals += rc[3:7] + rc[7:]
    for c, val in enumerate(row_vals):
        witness[c][row] = val
    for c, val in enumerate(_rc0_row_values(shifted)):
        witness[c][row + 1] = val
    for c, val in enumerate(_rc0_row_values(excess)):
        witness[c][row + 2] = val
    return rotated
