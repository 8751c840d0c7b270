"""MIPS execution proofs (o1vm/src/interpreters/mips analogue).

Covers: concrete semantics (signed MULT, arithmetic shifts, variable
shifts, compares, bitwise, memory), instruction decode, full
constraint+lookup satisfaction row-by-row (including the LogUp h/phi
columns), soundness negatives (corrupted memory / bitwise results must
break the lookup balance), and — under PST_HEAVY — an end-to-end
prove+verify with a tampered-statement negative."""

import pytest

from proof_systems_tpu.circuits import expr as E
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.o1vm import mips
from proof_systems_tpu.o1vm.mips import (
    Instr,
    Layout,
    build_columns,
    constraints,
    decode,
    execute,
    make_logup,
)

P = Fp.p
TEST_LAYOUT = Layout(bitwise_bits=2)  # 64-entry bitwise table fits n=256


def fib_program(k: int):
    prog = [
        Instr("ADDIU", rt=1, rs=0, imm=0),
        Instr("ADDIU", rt=2, rs=0, imm=1),
    ]
    for _ in range(k):
        prog += [
            Instr("ADDU", rd=3, rs=1, rt=2),
            Instr("ADDU", rd=1, rs=2, rt=0),
            Instr("ADDU", rd=2, rs=3, rt=0),
        ]
    return prog


def rich_program():
    """Exercises every implemented instruction class incl. memory and
    all four control transfers under the Cannon delay-slot model."""
    return [
        Instr("ADDIU", rt=1, rs=0, imm=6),       # 0:  r1 = 6
        Instr("BEQ", rs=1, rt=0, imm=100),       # 1:  not taken
        Instr("ADDIU", rt=2, rs=0, imm=7),       # 2:  delay slot: r2 = 7
        Instr("MULT", rs=1, rt=2),               # 3:  hi:lo = 42
        Instr("MFLO", rd=4),                     # 4:  r4 = 42
        Instr("SLL", rd=5, rt=4, imm=3),         # 5:  r5 = 336
        Instr("SRL", rd=6, rt=5, imm=2),         # 6:  r6 = 84
        Instr("SUBU", rd=7, rs=0, rt=1),         # 7:  r7 = -6 (2^32-6)
        Instr("SRA", rd=8, rt=7, imm=1),         # 8:  r8 = -3
        Instr("MULT", rs=7, rt=1),               # 9:  hi:lo = -36 (signed!)
        Instr("MFHI", rd=9),                     # 10: r9 = 0xFFFFFFFF
        Instr("MULTU", rs=7, rt=1),              # 11: unsigned product
        Instr("MFHI", rd=10),                    # 12: r10 = 5
        Instr("ADDIU", rt=11, rs=0, imm=3),      # 13: r11 = 3
        Instr("SLLV", rd=12, rs=11, rt=1),       # 14: r12 = 6 << 3 = 48
        Instr("SRLV", rd=13, rs=11, rt=5),       # 15: r13 = 336 >> 3 = 42
        Instr("SRAV", rd=14, rs=11, rt=7),       # 16: r14 = -6 >> 3 = -1
        Instr("SLT", rd=15, rs=7, rt=1),         # 17: -6 < 6 -> 1
        Instr("SLTU", rd=16, rs=7, rt=1),        # 18: 2^32-6 < 6 -> 0
        Instr("SLTI", rt=17, rs=7, imm=-2),      # 19: -6 < -2 -> 1
        Instr("SLTIU", rt=18, rs=1, imm=-1),     # 20: 6 < 2^32-1 -> 1
        Instr("AND", rd=19, rs=1, rt=2),         # 21: 6 & 7 = 6
        Instr("OR", rd=20, rs=1, rt=2),          # 22: 7
        Instr("XOR", rd=21, rs=1, rt=2),         # 23: 1
        Instr("NOR", rd=22, rs=1, rt=2),         # 24: ~7
        Instr("ANDI", rt=23, rs=5, imm=0xFF),    # 25: 336 & 255 = 80
        Instr("ORI", rt=24, rs=5, imm=0xF00),    # 26: 336 | 0xF00
        Instr("XORI", rt=25, rs=5, imm=0xFFFF),  # 27
        Instr("LUI", rt=26, imm=0xDEAD),         # 28
        Instr("J", imm=31),                      # 29: jump to 31
        Instr("SW", rt=5, rs=0, imm=64),         # 30: delay slot: mem[64]=336
        Instr("LW", rt=27, rs=0, imm=64),        # 31: r27 = 336
        Instr("ADDI", rt=28, rs=27, imm=-36),    # 32: r28 = 300
        Instr("SW", rt=28, rs=11, imm=61),       # 33: mem[64] = 300 (3+61)
        Instr("LW", rt=29, rs=11, imm=61),       # 34: r29 = 300
        Instr("BNE", rs=1, rt=0, imm=2),         # 35: taken -> word 38
        Instr("ADDIU", rt=30, rs=0, imm=99),     # 36: delay slot: r30 = 99
        Instr("ADDIU", rt=30, rs=0, imm=1),      # 37: skipped
        Instr("ADDIU", rt=26, rs=0, imm=168),    # 38: r26 = 4*42
        Instr("JR", rs=26),                      # 39: jump to word 42
        Instr("ADDU", rd=3, rs=1, rt=2),         # 40: delay slot: r3 = 13
        Instr("ADDIU", rt=30, rs=30, imm=1),     # 41: skipped
        Instr("JAL", imm=45),                    # 42: jump to 45, link r31
        Instr("ADDU", rd=0, rs=1, rt=2),         # 43: delay slot (r0 fixed)
        Instr("ADDIU", rt=30, rs=30, imm=1),     # 44: skipped
        Instr("ADDU", rd=3, rs=1, rt=2),         # 45: r3 = 13
    ]


def test_mips_execute_semantics():
    rows, state = execute(fib_program(8), 100)
    fib = [0, 1]
    for _ in range(8):
        fib.append(fib[-1] + fib[-2])
    assert state["regs"][2] == fib[9]

    rows, state = execute(rich_program(), 200)
    r = state["regs"]
    assert r[4] == 42 and r[5] == 336 and r[6] == 84
    assert r[7] == (1 << 32) - 6
    assert r[8] == (1 << 32) - 3                     # SRA of -6 by 1
    assert r[9] == 0xFFFFFFFF                        # signed MULT high word
    assert r[10] == 5                                # MULTU high word
    assert r[12] == 48 and r[13] == 42
    assert r[14] == 0xFFFFFFFF                       # SRAV -6 >> 3 = -1
    assert r[15] == 1 and r[16] == 0 and r[17] == 1 and r[18] == 1
    assert r[19] == 6 and r[20] == 7 and r[21] == 1
    assert r[22] == (~7) % (1 << 32)
    assert r[23] == 336 & 0xFF and r[24] == 336 | 0xF00 and r[25] == 336 ^ 0xFFFF
    assert r[26] == 168                              # overwritten at word 38
    assert r[27] == 336 and r[28] == 300 and r[29] == 300
    assert state["memory"][64] == 300
    assert r[30] == 99 and r[3] == 13
    assert r[31] == 4 * 44                           # JAL link past delay slot


def test_mips_decode():
    words = [
        (1 << 21) | (2 << 16) | (3 << 11) | 0x21,           # addu
        (0x09 << 26) | (1 << 21) | (2 << 16) | 0xFFFB,      # addiu -5
        (0x0F << 26) | (4 << 16) | 0xDEAD,                  # lui
        (0x04 << 26) | (1 << 21) | (2 << 16) | 0xFFFC,      # beq -4
        (1 << 21) | (2 << 16) | (3 << 11) | 0x03,           # sra
        (1 << 21) | (2 << 16) | (3 << 11) | 0x04,           # sllv
        (0x0A << 26) | (1 << 21) | (2 << 16) | 0x0005,      # slti
        (1 << 21) | (2 << 16) | (3 << 11) | 0x19,           # multu
    ]
    i = [decode(w) for w in words]
    assert (i[0].op, i[0].rd, i[0].rs, i[0].rt) == ("ADDU", 3, 1, 2)
    assert (i[1].op, i[1].rt, i[1].imm) == ("ADDIU", 2, -5)
    assert (i[2].op, i[2].rt, i[2].imm) == ("LUI", 4, 0xDEAD)
    assert (i[3].op, i[3].imm) == ("BEQ", -4)
    assert i[4].op == "SRA" and i[5].op == "SLLV"
    assert (i[6].op, i[6].imm) == ("SLTI", 5)
    assert i[7].op == "MULTU"


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


def _host_check(allcols, cons, n, omega, beta, joint):
    """Evaluate every constraint at every row (cyclic), with lagrange
    nodes overridden to their on-domain values."""
    offsets = set()

    def collect(e, seen):
        if id(e) in seen:
            return
        seen.add(id(e))
        if isinstance(e, E.UnnormalizedLagrangeBasis):
            offsets.add(e.offset % n)
        for attr in ("a", "b"):
            ch = getattr(e, attr, None)
            if isinstance(ch, E.Expr):
                collect(ch, seen)

    seen: set = set()
    for c in cons:
        collect(c, seen)

    for j in range(n):
        overrides = {
            i: (n * pow(omega, (n - i) % n, P) % P if j == i else 0)
            for i in offsets
        }
        ctx = E.HostEvalContext(
            f=Fp,
            get_cell=lambda cell, row, j=j: allcols[cell[1]][(j + row) % n],
            challenges={"alpha": 1, "beta": beta, "gamma": 0,
                        "joint_combiner": joint},
            endo=0,
            mds=[],
            point=pow(omega, j, P),
            domain_n=n,
            omega=omega,
            zk_rows=0,
            lagrange_overrides=overrides,
        )
        for k, con in enumerate(cons):
            v = E.eval_host(con, ctx)
            assert v == 0, f"constraint {k} violated at row {j}"


def test_mips_constraints_and_lookups_satisfied():
    n = 256
    beta, joint = 12345, 6789
    allcols, cons, omega, _ = _full_columns(rich_program(), n, TEST_LAYOUT,
                                            beta, joint)
    _host_check(allcols, cons, n, omega, beta, joint)


def test_mips_corrupt_memory_breaks_balance():
    """A corrupted LW result must make the LogUp memory multiset
    unbalanced: phase2 construction fails (an actual prover would hit a
    nonzero quotient remainder / phi wrap)."""
    n = 256
    L = TEST_LAYOUT
    program = [
        Instr("ADDIU", rt=1, rs=0, imm=42),
        Instr("SW", rt=1, rs=0, imm=8),
        Instr("LW", rt=2, rs=0, imm=8),
    ]
    rows, state = execute(program, 10)
    cols = build_columns(Fp, rows, state, n, L)
    # tamper: claim the load returned 43
    cols[L.mval][2] = 43
    cols[L.res][2] = 43
    cols[L.res_b[0]][2] = 43
    lg = make_logup(Fp, program, n, L)
    lg.phase1_columns(cols)
    with pytest.raises(ValueError, match="does not hold"):
        lg.phase2_host(777, 888)


def test_mips_corrupt_bitwise_not_in_table():
    """A wrong AND result is not in the bitwise table: multiplicity
    counting rejects it."""
    n = 256
    L = TEST_LAYOUT
    program = [
        Instr("ADDIU", rt=1, rs=0, imm=6),
        Instr("ADDIU", rt=2, rs=0, imm=7),
        Instr("AND", rd=3, rs=1, rt=2),
    ]
    rows, state = execute(program, 10)
    cols = build_columns(Fp, rows, state, n, L)
    cols[L.zn[0]][2] = 3  # 6 & 7 = 6; claim low chunk is 3
    lg = make_logup(Fp, program, n, L)
    with pytest.raises(ValueError, match="not in table"):
        lg.phase1_columns(cols)


@pytest.mark.heavy
def test_mips_prove_verify_e2e():
    import random

    from proof_systems_tpu.circuits.domains import EvaluationDomains
    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.o1vm.mips import prove_execution, verify_execution
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.utils import TestRng

    n = 256
    domain = EvaluationDomains.create(Fp, n)
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)],
        srs_mod.derive_h(Vesta),
    )
    program = [
        Instr("ADDIU", rt=1, rs=0, imm=6),
        Instr("ADDIU", rt=2, rs=0, imm=7),
        Instr("AND", rd=3, rs=1, rt=2),       # bitwise
        Instr("MULT", rs=1, rt=2),            # signed multiply
        Instr("MFLO", rd=4),
        Instr("SW", rt=4, rs=0, imm=32),      # store 42
        Instr("LW", rt=5, rs=0, imm=32),      # load it back
        Instr("SRA", rd=6, rt=5, imm=1),
        Instr("SLT", rd=7, rs=1, rt=2),
    ]
    proof, statement = prove_execution(
        domain, srs, Vesta, program, n, TestRng(71), L=TEST_LAYOUT
    )
    assert statement["final"]["regs"][5] == 42
    assert verify_execution(domain, srs, Vesta, proof, statement, TestRng(72))

    # tampered statement: claim a different final register value
    bad = dict(statement)
    bad_final = dict(statement["final"])
    bad_final["regs"] = list(statement["final"]["regs"])
    bad_final["regs"][5] = 43
    bad["final"] = bad_final
    assert not verify_execution(domain, srs, Vesta, proof, bad, TestRng(73))

    # tampered public memory image: different initial memory must fail
    bad2 = dict(statement)
    bad2["init_memory"] = dict(statement["init_memory"])
    bad2["init_memory"][32] = 9
    assert not verify_execution(domain, srs, Vesta, proof, bad2, TestRng(74))
