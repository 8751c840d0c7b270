"""MIPS execution proofs (o1vm/src/interpreters/mips analogue, subset)."""

from proof_systems_tpu.circuits import expr as E
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.o1vm import mips
from proof_systems_tpu.o1vm.mips import Instr, build_columns, constraints, decode, execute
from proof_systems_tpu.o1vm.pickles import col

P = Fp.p


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


def host_check(cols, cons, n):
    """Evaluate every constraint at every row over the wrap-around domain."""
    def get_cell_at(j):
        def get(cell, row):
            i = cell[1]
            return cols[i][j] if row == E.CURR else cols[i][(j + 1) % n]
        return get

    ctx_proto = dict(
        f=Fp, challenges={"alpha": 1, "beta": 0, "gamma": 0, "joint_combiner": 0},
        endo=0, mds=[], point=0, domain_n=n, omega=1, zk_rows=0,
    )
    for j in range(n):
        ctx = E.HostEvalContext(get_cell=get_cell_at(j), **ctx_proto)
        for k, con in enumerate(cons):
            v = E.eval_host(con, ctx)
            assert v == 0, f"constraint {k} violated at row {j}"


def test_mips_execute_semantics():
    rows, state = execute(fib_program(8), 100)
    fib = [0, 1]
    for _ in range(8):
        fib.append(fib[-1] + fib[-2])
    assert state["regs"][2] == fib[9]

    # delay-slot branch/jump semantics + mult/mflo/mfhi + shifts
    prog = [
        Instr("ADDIU", rt=1, rs=0, imm=6),      # r1 = 6
        Instr("BEQ", rs=1, rt=0, imm=100),      # not taken
        Instr("ADDIU", rt=2, rs=0, imm=7),      # r2 = 7 (delay slot runs)
        Instr("MULT", rs=1, rt=2),              # hi:lo = 42
        Instr("MFLO", rd=4),                    # r4 = 42
        Instr("SLL", rd=5, rt=4, imm=3),        # r5 = 336
        Instr("SRL", rd=6, rt=5, imm=2),        # r6 = 84
        Instr("BNE", rs=1, rt=0, imm=2),        # taken: skip +2 after delay
        Instr("ADDIU", rt=7, rs=0, imm=1),      # delay slot: r7 = 1
        Instr("ADDIU", rt=7, rs=7, imm=10),     # SKIPPED
        Instr("AND", rd=8, rs=1, rt=2),         # r8 = 6 & 7 (witness mode)
        Instr("MFHI", rd=9),                    # r9 = 0
    ]
    rows, state = execute(prog, 100)
    r = state["regs"]
    assert r[4] == 42 and r[5] == 336 and r[6] == 84
    assert r[7] == 1 and r[8] == 6 and r[9] == 0


def test_mips_memory_and_negative_imm():
    prog = [
        Instr("ADDIU", rt=1, rs=0, imm=100),
        Instr("SW", rt=1, rs=0, imm=64),     # mem[64] = 100
        Instr("LW", rt=2, rs=0, imm=64),     # r2 = 100
        Instr("ADDIU", rt=3, rs=2, imm=-1),  # r3 = 99
    ]
    rows, state = execute(prog, 100)
    assert state["memory"][64] == 100
    assert state["regs"][2] == 100 and state["regs"][3] == 99
    kinds = [l[0] for l in state["lookups"]]
    assert "mem_write" in kinds and "mem_read" in kinds


def test_mips_decode():
    # addu $3, $1, $2 ; addiu $2, $1, -5 ; lui $4, 0xdead ; beq $1, $2, -4
    words = [
        (1 << 21) | (2 << 16) | (3 << 11) | 0x21,
        (0x09 << 26) | (1 << 21) | (2 << 16) | 0xFFFB,
        (0x0F << 26) | (4 << 16) | 0xDEAD,
        (0x04 << 26) | (1 << 21) | (2 << 16) | 0xFFFC,
    ]
    i0, i1, i2, i3 = (decode(w) for w in words)
    assert (i0.op, i0.rd, i0.rs, i0.rt) == ("ADDU", 3, 1, 2)
    assert (i1.op, i1.rt, i1.imm) == ("ADDIU", 2, -5)
    assert (i2.op, i2.rt, i2.imm) == ("LUI", 4, 0xDEAD)
    assert (i3.op, i3.imm) == ("BEQ", -4)


def test_mips_constraints_satisfied():
    n = 64
    prog = fib_program(5) + [
        Instr("MULT", rs=1, rt=2),
        Instr("MFLO", rd=4),
        Instr("MFHI", rd=5),
        Instr("SLL", rd=6, rt=4, imm=5),
        Instr("SRL", rd=7, rt=4, imm=3),
        Instr("SLT", rd=8, rs=1, rt=2),
        Instr("SLTU", rd=9, rs=2, rt=1),
        Instr("J", imm=26),
        Instr("ADDIU", rt=10, rs=0, imm=3),   # delay slot
        Instr("SUBU", rd=11, rs=2, rt=1),
    ]
    rows, state = execute(prog, n - 1)
    cols = build_columns(Fp, rows, state, n)
    cons = constraints(Fp)
    host_check(cols, cons, n)


def test_mips_constraints_catch_bad_write():
    n = 32
    rows, state = execute(fib_program(3), n - 1)
    cols = build_columns(Fp, rows, state, n)
    cols[mips.LAYOUT.regs[2]][3] = (cols[mips.LAYOUT.regs[2]][3] + 1) % P
    import pytest

    with pytest.raises(AssertionError):
        host_check(cols, constraints(Fp), n)
