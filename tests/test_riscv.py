"""RV32IM execution proofs (o1vm/src/interpreters/riscv32im analogue).

Same coverage shape as test_mips.py: semantics, decode, row-by-row
constraint+lookup satisfaction, soundness negatives, heavy e2e."""

import pytest

from proof_systems_tpu.circuits import expr as E
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.o1vm.riscv import (
    Instr,
    Layout,
    build_columns,
    constraints,
    decode,
    execute,
    make_logup,
)

P = Fp.p
TEST_LAYOUT = Layout(bitwise_bits=2)
M32 = (1 << 32) - 1


def rich_program():
    """One of every instruction class (no unreachable code)."""
    return [
        Instr("ADDI", rd=1, rs1=0, imm=6),        # 0:  r1 = 6
        Instr("ADDI", rd=2, rs1=0, imm=7),        # 1:  r2 = 7
        Instr("ADD", rd=3, rs1=1, rs2=2),         # 2:  r3 = 13
        Instr("SUB", rd=4, rs1=0, rs2=1),         # 3:  r4 = -6
        Instr("SLT", rd=5, rs1=4, rs2=1),         # 4:  -6 < 6 -> 1
        Instr("SLTU", rd=6, rs1=4, rs2=1),        # 5:  big < 6 -> 0
        Instr("SLTI", rd=7, rs1=4, imm=-2),       # 6:  -6 < -2 -> 1
        Instr("SLTIU", rd=8, rs1=1, imm=-1),      # 7:  6 < 2^32-1 -> 1
        Instr("XOR", rd=9, rs1=1, rs2=2),         # 8:  1
        Instr("OR", rd=10, rs1=1, rs2=2),         # 9:  7
        Instr("AND", rd=11, rs1=1, rs2=2),        # 10: 6
        Instr("XORI", rd=12, rs1=1, imm=-1),      # 11: ~6
        Instr("ORI", rd=13, rs1=1, imm=0x700),    # 12
        Instr("ANDI", rd=14, rs1=3, imm=5),       # 13: 13 & 5 = 5
        Instr("SLLI", rd=15, rs1=1, imm=4),       # 14: 96
        Instr("SRLI", rd=16, rs1=15, imm=2),      # 15: 24
        Instr("SRAI", rd=17, rs1=4, imm=1),       # 16: -3
        Instr("ADDI", rd=18, rs1=0, imm=3),       # 17: r18 = 3
        Instr("SLL", rd=19, rs1=1, rs2=18),       # 18: 48
        Instr("SRL", rd=20, rs1=15, rs2=18),      # 19: 12
        Instr("SRA", rd=21, rs1=4, rs2=18),       # 20: -1
        Instr("LUI", rd=22, imm=0xBEEF),          # 21
        Instr("AUIPC", rd=23, imm=1),             # 22: pc(88) + 4096
        Instr("MUL", rd=24, rs1=1, rs2=2),        # 23: 42
        Instr("MULH", rd=25, rs1=4, rs2=1),       # 24: high(-36) = -1
        Instr("MULHU", rd=26, rs1=4, rs2=1),      # 25: 5
        Instr("MULHSU", rd=27, rs1=4, rs2=1),     # 26: high(-36) = -1
        Instr("DIV", rd=28, rs1=4, rs2=2),        # 27: -6/7 = 0
        Instr("DIVU", rd=29, rs1=15, rs2=2),      # 28: 96/7 = 13
        Instr("REM", rd=30, rs1=4, rs2=2),        # 29: -6 rem 7 = -6
        Instr("REMU", rd=31, rs1=15, rs2=2),      # 30: 96 rem 7 = 5
        Instr("SW", rs1=0, rs2=3, imm=64),        # 31: mem[16] = 13
        Instr("LW", rd=5, rs1=0, imm=64),         # 32: r5 = 13
        Instr("SB", rs1=0, rs2=2, imm=65),        # 33: byte 1 of word 16
        Instr("LB", rd=6, rs1=0, imm=65),         # 34: r6 = 7
        Instr("SH", rs1=0, rs2=22, imm=66),       # 35: half 1 of word 16
        Instr("LHU", rd=7, rs1=0, imm=66),        # 36
        Instr("LBU", rd=8, rs1=0, imm=67),        # 37
        Instr("LH", rd=9, rs1=0, imm=66),         # 38
        Instr("BEQ", rs1=1, rs2=2, imm=8),        # 39: not taken
        Instr("BNE", rs1=1, rs2=2, imm=8),        # 40: taken -> 42
        Instr("ADDI", rd=10, rs1=0, imm=77),      # 41: skipped
        Instr("BLT", rs1=4, rs2=1, imm=8),        # 42: taken -> 44
        Instr("ADDI", rd=10, rs1=0, imm=78),      # 43: skipped
        Instr("BGE", rs1=4, rs2=1, imm=8),        # 44: not taken
        Instr("BLTU", rs1=1, rs2=4, imm=8),       # 45: taken -> 47
        Instr("ADDI", rd=10, rs1=0, imm=79),      # 46: skipped
        Instr("BGEU", rs1=1, rs2=4, imm=8),       # 47: not taken
        Instr("JAL", rd=11, imm=8),               # 48: jump -> 50
        Instr("ADDI", rd=10, rs1=0, imm=80),      # 49: skipped
        Instr("ADDI", rd=12, rs1=0, imm=216),     # 50: r12 = 4*54
        Instr("JALR", rd=13, rs1=12, imm=1),      # 51: to (216+1)&~1 = 216
        Instr("ADDI", rd=10, rs1=0, imm=81),      # 52: skipped
        Instr("ADDI", rd=10, rs1=0, imm=82),      # 53: skipped
        Instr("FENCE"),                           # 54
        Instr("ECALL"),                           # 55
        Instr("ADD", rd=14, rs1=1, rs2=1),        # 56: r14 = 12
    ]


def test_riscv_execute_semantics():
    rows, state = execute(rich_program(), 200)
    r = state["regs"]
    assert r[3] == 13 and r[4] == (-6) % (1 << 32)
    assert r[12] == 216  # overwritten later; mid-trace values checked below
    assert r[15] == 96 and r[16] == 24 and r[17] == (-3) % (1 << 32)
    assert r[19] == 48 and r[20] == 12 and r[21] == M32
    assert r[22] == 0xBEEF << 12
    assert r[23] == 88 + 4096
    assert r[24] == 42
    assert r[25] == M32 and r[27] == M32  # high word of -36
    assert r[26] == 5
    assert r[28] == 0                     # -6 / 7 rounds toward zero
    assert r[29] == 13
    assert r[30] == (-6) % (1 << 32)      # rem keeps dividend sign
    assert r[31] == 96 % 7
    # memory: word 16 = 13, then byte/half inserts
    w = state["memory"][16]
    assert w & 0xFF == 13
    assert (w >> 8) & 0xFF == 7           # SB at offset 1
    assert (w >> 16) & 0xFFFF == (0xBEEF << 12) & 0xFFFF  # SH at offset 2
    assert r[5] == 13  # LW before the SB/SH
    assert r[6] == 7
    assert r[7] == (w >> 16) & 0xFFFF
    assert r[8] == (w >> 24) & 0xFF
    lh = (w >> 16) & 0xFFFF
    assert r[9] == (lh | 0xFFFF0000 if lh & 0x8000 else lh)
    assert r[10] == 7                     # OR result; branch shadows skipped
    assert r[11] == 4 * 49                # JAL link
    assert r[13] == 4 * 52                # JALR link
    assert r[14] == 12
    # division by zero conventions
    _, st0 = execute([Instr("DIV", rd=1, rs1=0, rs2=0),
                      Instr("ADDI", rd=2, rs1=0, imm=9),
                      Instr("DIVU", rd=3, rs1=2, rs2=0),
                      Instr("REM", rd=4, rs1=2, rs2=0),
                      Instr("REMU", rd=5, rs1=2, rs2=0)], 10)
    assert st0["regs"][1] == M32 and st0["regs"][3] == M32
    assert st0["regs"][4] == 9 and st0["regs"][5] == 9
    # signed-overflow convention: -2^31 / -1
    _, st1 = execute([Instr("LUI", rd=1, imm=0x80000),
                      Instr("ADDI", rd=2, rs1=0, imm=-1),
                      Instr("DIV", rd=3, rs1=1, rs2=2),
                      Instr("REM", rd=4, rs1=1, rs2=2)], 10)
    assert st1["regs"][3] == 0x80000000 and st1["regs"][4] == 0


def test_riscv_decode():
    cases = [
        (0x002081B3, ("ADD", 3, 1, 2, 0)),
        (0x40208233, ("SUB", 4, 1, 2, 0)),
        (0xFFB08293, ("ADDI", 5, 1, 0, -5)),
        (0x0020F333, ("AND", 6, 1, 2, 0)),
        (0x0020C3B3, ("XOR", 7, 1, 2, 0)),
        (0x00209433, ("SLL", 8, 1, 2, 0)),
        (0x4020D4B3, ("SRA", 9, 1, 2, 0)),
        (0x00411513, ("SLLI", 10, 2, 0, 4)),
        (0x4020D593, ("SRAI", 11, 1, 0, 2)),
        (0x02208633, ("MUL", 12, 1, 2, 0)),
        (0x022096B3, ("MULH", 13, 1, 2, 0)),
        (0x0220C733, ("DIV", 14, 1, 2, 0)),
        (0x0220F7B3, ("REMU", 15, 1, 2, 0)),
        (0x0040A803, ("LW", 16, 1, 0, 4)),
        (0x00408883, ("LB", 17, 1, 0, 4)),
        (0x0020A223, ("SW", 0, 1, 2, 4)),
        (0x00208223, ("SB", 0, 1, 2, 4)),
        (0xDEAD0937, ("LUI", 18, 0, 0, 0xDEAD0)),
        (0x00001997, ("AUIPC", 19, 0, 0, 1)),
        (0x008000EF, ("JAL", 1, 0, 0, 8)),
        (0x00408067, ("JALR", 0, 1, 0, 4)),
        (0x00209463, ("BNE", 0, 1, 2, 8)),
        (0x0020C463, ("BLT", 0, 1, 2, 8)),
        (0x0020F463, ("BGEU", 0, 1, 2, 8)),
    ]
    for word, (op, rd, rs1, rs2, imm) in cases:
        ins = decode(word)
        assert ins.op == op, (hex(word), ins)
        assert (ins.rd, ins.rs1, ins.rs2, ins.imm) == (rd, rs1, rs2, imm), (
            hex(word), ins)


def _full_columns(program, n, L, beta=12345, joint=6789, memory=None):
    from proof_systems_tpu.circuits.domains import EvaluationDomains

    rows, state = execute(program, n // 2, None, memory)
    cols = build_columns(Fp, rows, state, n, L)
    lg = make_logup(Fp, program, n, L)
    full = lg.phase1_columns(cols)
    phase2 = lg.phase2_host(beta, joint)
    omega = EvaluationDomains.create(Fp, n).d1.group_gen
    cons = constraints(Fp, lg, len(rows), None, state, omega, L)
    return full + phase2, cons, omega, len(rows)


def test_riscv_constraints_and_lookups_satisfied():
    from tests.test_mips import _host_check

    n = 256
    beta, joint = 12345, 6789
    allcols, cons, omega, _ = _full_columns(rich_program(), n, TEST_LAYOUT,
                                            beta, joint)
    _host_check(allcols, cons, n, omega, beta, joint)


def test_riscv_corrupt_memory_breaks_balance():
    n = 256
    L = TEST_LAYOUT
    program = [
        Instr("ADDI", rd=1, rs1=0, imm=42),
        Instr("SW", rs1=0, rs2=1, imm=8),
        Instr("LW", rd=2, rs1=0, imm=8),
    ]
    rows, state = execute(program, 10)
    cols = build_columns(Fp, rows, state, n, L)
    cols[L.mval][2] = 43
    cols[L.mold][2] = 43
    for k, bv in enumerate([43, 0, 0, 0]):
        cols[L.mold_b[k]][2] = bv
    cols[L.res][2] = 43
    cols[L.res_b[0]][2] = 43
    lg = make_logup(Fp, program, n, L)
    lg.phase1_columns(cols)
    with pytest.raises(ValueError, match="does not hold"):
        lg.phase2_host(777, 888)


def test_riscv_corrupt_div_quotient_rejected():
    """A wrong DIVU quotient violates the Euclidean identity constraint."""
    from tests.test_mips import _host_check

    n = 256
    L = TEST_LAYOUT
    program = [
        Instr("ADDI", rd=1, rs1=0, imm=96),
        Instr("ADDI", rd=2, rs1=0, imm=7),
        Instr("DIVU", rd=3, rs1=1, rs2=2),
    ]
    allcols, cons, omega, _ = _full_columns(program, n, L)
    _host_check(allcols, cons, n, omega, 12345, 6789)  # sanity: valid
    # now corrupt the quotient
    allcols[L.qq][2] = 14
    with pytest.raises(AssertionError):
        _host_check(allcols, cons, n, omega, 12345, 6789)


@pytest.mark.heavy
def test_riscv_prove_verify_e2e():
    from proof_systems_tpu.circuits.domains import EvaluationDomains
    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.o1vm.riscv import prove_execution, verify_execution
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.utils import TestRng

    n = 256
    domain = EvaluationDomains.create(Fp, n)
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)],
        srs_mod.derive_h(Vesta),
    )
    program = [
        Instr("ADDI", rd=1, rs1=0, imm=96),
        Instr("ADDI", rd=2, rs1=0, imm=7),
        Instr("DIVU", rd=3, rs1=1, rs2=2),    # 13
        Instr("AND", rd=4, rs1=1, rs2=2),     # 96 & 7 = 0
        Instr("SW", rs1=0, rs2=3, imm=16),
        Instr("LB", rd=5, rs1=0, imm=16),     # 13
        Instr("MULH", rd=6, rs1=1, rs2=2),
    ]
    proof, statement = prove_execution(
        domain, srs, Vesta, program, n, TestRng(81), L=TEST_LAYOUT
    )
    assert statement["final"]["regs"][5] == 13
    assert verify_execution(domain, srs, Vesta, proof, statement, TestRng(82))

    bad = dict(statement)
    bad_final = dict(statement["final"])
    bad_final["regs"] = list(statement["final"]["regs"])
    bad_final["regs"][3] = 14
    bad["final"] = bad_final
    assert not verify_execution(domain, srs, Vesta, proof, bad, TestRng(83))
