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


def cannon_ext_program():
    """Exercises the Cannon full-ISA extension: zero-relative branches,
    JALR, DIV/DIVU (signed corner cases), MTHI/MTLO, MOVZ/MOVN, SYNC,
    sub-word loads/stores, LWL/LWR/SWL/SWR, LL/SC, and the non-memory
    syscalls (brk, clone, fcntl, unknown, mmap, exit_group)."""
    return [
        Instr("ADDIU", rt=1, rs=0, imm=-7),        # 0: r1 = -7
        Instr("ADDIU", rt=2, rs=0, imm=3),         # 1: r2 = 3
        Instr("DIV", rs=1, rt=2),                  # 2: lo=-2, hi=-1
        Instr("MFLO", rd=3),                       # 3: r3 = -2
        Instr("MFHI", rd=4),                       # 4: r4 = -1
        Instr("DIV", rs=1, rt=0),                  # 5: divide by zero: hi/lo kept
        Instr("MFLO", rd=6),                       # 6: r6 = -2 (unchanged)
        Instr("DIVU", rs=2, rt=1),                 # 7: 3 / (2^32-7) = 0 r 3
        Instr("MFHI", rd=5),                       # 8: r5 = 3
        Instr("MTHI", rs=2),                       # 9: hi = 3
        Instr("MTLO", rs=1),                       # 10: lo = -7
        Instr("MFHI", rd=7),                       # 11: r7 = 3
        Instr("BLTZ", rs=1, imm=2),                # 12: taken -> 15
        Instr("ADDIU", rt=8, rs=0, imm=11),        # 13: delay slot r8 = 11
        Instr("ADDIU", rt=8, rs=0, imm=99),        # 14: skipped
        Instr("BGEZ", rs=1, imm=5),                # 15: not taken
        Instr("SYNC"),                             # 16: delay slot no-op
        Instr("BLEZ", rs=0, imm=2),                # 17: taken (0 <= 0) -> 20
        Instr("MOVZ", rd=9, rs=2, rt=0),           # 18: delay: r9 = 3 (rt=0)
        Instr("MOVZ", rd=9, rs=1, rt=2),           # 19: skipped
        Instr("BGTZ", rs=2, imm=2),                # 20: taken -> 23
        Instr("MOVN", rd=10, rs=1, rt=2),          # 21: delay: r10 = -7
        Instr("MOVN", rd=10, rs=2, rt=0),          # 22: skipped (rt == 0)
        Instr("BLTZAL", rs=1, imm=2),              # 23: taken -> 26, r31 = 100
        Instr("ADDIU", rt=11, rs=0, imm=0x130),    # 24: delay: r11 = 0x130
        Instr("ADDIU", rt=12, rs=0, imm=77),       # 25: skipped
        Instr("JALR", rd=13, rs=11),               # 26: jump 0x130/4=76, r13=112
        Instr("SYNC"),                             # 27: delay slot no-op
        # words 28..75 are never executed; jalr target is word 76
    ] + _cannon_ext_tail()


def _cannon_ext_tail():
    # Place instructions so that word 76 (pc 0x130) continues the test.
    # Words 28..75 are never executed but must exist (ROM addresses).
    pad = [Instr("SYNC") for _ in range(76 - 28)]
    tail = [
        # save registers that the syscall block will clobber
        Instr("SW", rt=4, rs=0, imm=0x820),         # div hi
        Instr("SW", rt=5, rs=0, imm=0x824),         # divu remainder
        Instr("SW", rt=6, rs=0, imm=0x828),         # div-by-zero lo
        Instr("SW", rt=7, rs=0, imm=0x82C),         # mfhi after mthi
        # BGEZAL: taken (0 >= 0), links r31, delay slot runs, +2 skipped
        Instr("BGEZAL", rs=0, imm=2),
        Instr("SYNC"),
        Instr("ADDIU", rt=12, rs=0, imm=55),       # skipped
        # memory block at 0x800: store a pattern, then sub-word ops
        Instr("LUI", rt=14, imm=0x1122),           # 76: r14 = 0x11220000
        Instr("ORI", rt=14, rs=14, imm=0x3344),    # 77: r14 = 0x11223344
        Instr("SW", rt=14, rs=0, imm=0x800),        # 78: mem[0x800] = 0x11223344
        Instr("LB", rt=15, rs=0, imm=0x800),        # 79: r15 = 0x11
        Instr("LB", rt=16, rs=0, imm=0x803),        # 80: r16 = 0x804
        Instr("LBU", rt=17, rs=0, imm=0x801),       # 81: r17 = 0x22
        Instr("LH", rt=18, rs=0, imm=0x800),        # 82: r18 = 0x1122
        Instr("LHU", rt=19, rs=0, imm=0x802),       # 83: r19 = 0x3344
        Instr("SB", rt=1, rs=0, imm=0x801),         # 84: mem = 0x11F93344 (-7&0xFF=0xF9)
        Instr("SH", rt=1, rs=0, imm=0x802),         # 85: mem = 0x11F9FFF9
        Instr("LW", rt=20, rs=0, imm=0x800),        # 86: r20 = 0x11F9FFF9
        Instr("LWL", rt=21, rs=0, imm=0x802),       # 87: merge left from off 2
        Instr("LWR", rt=22, rs=0, imm=0x801),       # 88: merge right to off 1
        Instr("SWL", rt=14, rs=0, imm=0x806),       # 89: left store at off 2
        Instr("SWR", rt=14, rs=0, imm=0x809),       # 90: right store at off 1
        Instr("LW", rt=23, rs=0, imm=0x804),        # 91
        Instr("LW", rt=24, rs=0, imm=0x808),        # 92
        Instr("LL", rt=25, rs=0, imm=0x800),        # 93: r25 = word
        Instr("SC", rt=25, rs=0, imm=0x808),        # 94: store + r25 = 1
        # negative signed loads
        Instr("LH", rt=26, rs=0, imm=0x802),        # 95: r26 = sext(0xFFF9)
        # syscalls
        Instr("ADDIU", rt=2, rs=0, imm=4045),      # 96: SYS_BRK
        Instr("SYSCALL"),                          # 97: v0 = 0x40000000
        Instr("ADDU", rd=27, rs=2, rt=0),          # 98: r27 = BRK_BASE
        Instr("ADDIU", rt=2, rs=0, imm=4120),      # 99: SYS_CLONE
        Instr("SYSCALL"),                          # 100: v0 = 1
        Instr("ADDIU", rt=2, rs=0, imm=4055),      # SYS_FCNTL
        Instr("ADDIU", rt=4, rs=0, imm=5),         # a0 = 5 (pre read fd)
        Instr("ADDIU", rt=5, rs=0, imm=3),         # a1 = 3 (F_GETFL)
        Instr("SYSCALL"),                          # v0 = 0 (fcr)
        Instr("ADDIU", rt=2, rs=0, imm=4055),
        Instr("ADDIU", rt=4, rs=0, imm=6),         # a0 = 6 (write fd)
        Instr("SYSCALL"),                          # v0 = 1 (fcw)
        Instr("ADDIU", rt=2, rs=0, imm=4055),
        Instr("ADDIU", rt=4, rs=0, imm=9),         # a0 = 9 (bad fd)
        Instr("SYSCALL"),                          # v0 = -1, v1 = 0x9
        Instr("ADDU", rd=28, rs=7, rt=0),          # r28 = EBADF
        Instr("ADDIU", rt=2, rs=0, imm=4055),
        Instr("ADDIU", rt=5, rs=0, imm=1),         # a1 = 1 (!= F_GETFL)
        Instr("SYSCALL"),                          # v0 = -1, v1 = 0x16 (fceinval)
        Instr("ADDIU", rt=2, rs=0, imm=4999),      # unknown syscall
        Instr("SYSCALL"),                          # v0 = v1 = 0 (other)
        Instr("ADDIU", rt=2, rs=0, imm=4090),      # SYS_MMAP
        Instr("ADDIU", rt=4, rs=0, imm=0),         # a0 = 0
        Instr("ADDIU", rt=5, rs=0, imm=6000),      # a1 = size 6000
        Instr("SYSCALL"),                          # v0 = heap0, heap += 8192
        Instr("ADDU", rd=29, rs=2, rt=0),          # r29 = old heap
        Instr("ADDIU", rt=2, rs=0, imm=4090),      # SYS_MMAP again
        Instr("ADDIU", rt=4, rs=0, imm=0x60),      # a0 = hint addr != 0
        Instr("SYSCALL"),                          # mmap1: v0 = a0
        Instr("ADDU", rd=30, rs=2, rt=0),          # r30 = 0x60
        Instr("ADDIU", rt=2, rs=0, imm=4246),      # SYS_EXIT_GROUP
        Instr("ADDIU", rt=4, rs=0, imm=7),         # exit code 7
        Instr("SYSCALL"),                          # halt
        Instr("ADDIU", rt=8, rs=0, imm=1),         # never executed
    ]
    return pad + tail


def test_mips_cannon_ext_semantics():
    program = cannon_ext_program()
    rows, state = execute(program, 400, heap0=0x20000000)
    r = state["regs"]
    mem = state["memory"]
    assert r[3] == (1 << 32) - 2                              # -7 / 3 lo
    assert mem[0x820] == (1 << 32) - 1                         # -7 / 3 hi
    assert mem[0x824] == 3                                     # DIVU remainder
    assert mem[0x828] == (1 << 32) - 2                         # div-by-0 keeps lo
    assert mem[0x82C] == 3 and r[8] == 11
    assert r[9] == 3 and r[10] == (1 << 32) - 7
    bgezal_w = next(w for w, ins in enumerate(program) if ins.op == "BGEZAL")
    assert r[31] == 4 * bgezal_w + 8 and r[12] == 0
    assert r[13] == 112
    assert r[15] == 0x11 and r[16] == 0x44 and r[17] == 0x22
    assert r[18] == 0x1122 and r[19] == 0x3344
    assert r[20] == 0x11F9FFF9
    assert r[26] == (0xFFF9 - (1 << 16)) % (1 << 32)
    assert r[27] == 0x40000000 and r[28] == 0x9
    assert r[29] == 0x20000000 and r[30] == 0x60
    assert state["heap"] == 0x20000000 + 8192
    assert state["exited"] and state["exit_code"] == 7
    # LWL from offset 2: r21 = mem[2:4] || rt[2:4] of old r21 (0)
    assert r[21] == 0xFFF90000 and r[22] == 0x000011F9
    assert state["memory"][0x804] == 0x00001122 and r[23] == 0x00001122
    assert state["memory"][0x808] == 0x11F9FFF9  # SC overwrote SWR's 0x804...
    assert r[25] == 1


def test_mips_cannon_ext_matches_cannon_vm():
    """Bit-exact cross-validation of mips.execute against the Cannon
    witness runner (cannon.CannonVM) over the full-ISA program."""
    from proof_systems_tpu.o1vm.cannon import CannonVM, PagedMemory, State

    program = cannon_ext_program()
    rows, state = execute(program, 400, heap0=0x20000000)

    st = State(memory={}, heap=0x20000000)
    vm = CannonVM(st)
    for w, ins in enumerate(program):
        vm.mem.write_word(4 * w, _encode(ins))
    vm.run(max_steps=400)
    assert st.exited and st.exit == 7
    assert list(st.registers) == state["regs"]
    assert st.hi == state["hi"] and st.lo == state["lo"]
    assert st.heap == state["heap"]
    for addr, val in state["memory"].items():
        assert vm.mem.read_word(addr) == val, hex(addr)


def _encode(ins: Instr) -> int:
    """Assemble an Instr back to a 32-bit word (inverse of decode)."""
    R = {"SLL": 0x00, "SRL": 0x02, "SRA": 0x03, "SLLV": 0x04, "SRLV": 0x06,
         "SRAV": 0x07, "JR": 0x08, "JALR": 0x09, "MOVZ": 0x0A, "MOVN": 0x0B,
         "SYSCALL": 0x0C, "SYNC": 0x0F, "MFHI": 0x10, "MTHI": 0x11,
         "MFLO": 0x12, "MTLO": 0x13, "MULT": 0x18, "MULTU": 0x19,
         "DIV": 0x1A, "DIVU": 0x1B, "ADD": 0x20, "ADDU": 0x21, "SUB": 0x22,
         "SUBU": 0x23, "AND": 0x24, "OR": 0x25, "XOR": 0x26, "NOR": 0x27,
         "SLT": 0x2A, "SLTU": 0x2B}
    I = {"BEQ": 0x04, "BNE": 0x05, "BLEZ": 0x06, "BGTZ": 0x07, "ADDI": 0x08,
         "ADDIU": 0x09, "SLTI": 0x0A, "SLTIU": 0x0B, "ANDI": 0x0C,
         "ORI": 0x0D, "XORI": 0x0E, "LUI": 0x0F, "LB": 0x20, "LH": 0x21,
         "LWL": 0x22, "LW": 0x23, "LBU": 0x24, "LHU": 0x25, "LWR": 0x26,
         "SB": 0x28, "SH": 0x29, "SWL": 0x2A, "SW": 0x2B, "SWR": 0x2E,
         "LL": 0x30, "SC": 0x38}
    REGIMM = {"BLTZ": 0x00, "BGEZ": 0x01, "BLTZAL": 0x10, "BGEZAL": 0x11}
    if ins.op in R:
        sa = ins.imm if ins.op in ("SLL", "SRL", "SRA") else 0
        return ((ins.rs << 21) | (ins.rt << 16) | (ins.rd << 11)
                | (sa << 6) | R[ins.op])
    if ins.op in REGIMM:
        return ((0x01 << 26) | (ins.rs << 21) | (REGIMM[ins.op] << 16)
                | (ins.imm & 0xFFFF))
    if ins.op in ("J", "JAL"):
        return (({"J": 0x02, "JAL": 0x03}[ins.op]) << 26) | ins.imm
    return ((I[ins.op] << 26) | (ins.rs << 21) | (ins.rt << 16)
            | (ins.imm & 0xFFFF))


def test_mips_cannon_ext_constraints_satisfied():
    n = 512
    beta, joint = 9981, 7743
    from proof_systems_tpu.circuits.domains import EvaluationDomains

    program = cannon_ext_program()
    rows, state = execute(program, 400, heap0=0x20000000)
    cols = build_columns(Fp, rows, state, n, TEST_LAYOUT)
    lg = make_logup(Fp, program, n, TEST_LAYOUT)
    full = lg.phase1_columns(cols)
    phase2 = lg.phase2_host(beta, joint)
    omega = EvaluationDomains.create(Fp, n).d1.group_gen
    cons = constraints(Fp, lg, len(rows), None, state, omega, TEST_LAYOUT,
                       {"heap": 0x20000000})
    _host_check(full + phase2, cons, n, omega, beta, joint)


PK_KEY = bytes(range(2, 34))
PREIMAGES = {PK_KEY: b"\xDE\xAD\xBE\xEF\xCA\xFE"}


def preimage_program():
    """Writes a 32-byte preimage key via fd 6 (4 bytes at a time, with
    one unaligned write exercising the n = 4 - off clamp), then reads
    the length prefix and data back via fd 5, including a short read at
    the end of the stream."""
    prog = [
        # key bytes at 0x100..0x120 are in the initial memory image
        Instr("ADDIU", rt=4, rs=0, imm=6),         # fd 6 = preimage write
        Instr("ADDIU", rt=6, rs=0, imm=4),         # count 4
    ]
    for w in range(8):
        prog += [
            Instr("ADDIU", rt=2, rs=0, imm=4004),  # SYS_WRITE (v0 clobbers r2)
            Instr("ADDIU", rt=5, rs=0, imm=0x100 + 4 * w),
            Instr("SYSCALL"),
        ]

    def read_at(addr):
        return [
            Instr("ADDIU", rt=2, rs=0, imm=4003),  # SYS_READ
            Instr("ADDIU", rt=5, rs=0, imm=addr),
            Instr("SYSCALL"),
        ]

    prog += [
        Instr("ADDIU", rt=4, rs=0, imm=5),         # fd 5 = preimage read
    ]
    # the 8-byte length prefix to 0x200, then data: one UNALIGNED
    # destination (n = 4 - 2 = 2), then aligned, then a short read and
    # an n = 0 read at end-of-stream
    prog += read_at(0x200) + read_at(0x204) + read_at(0x20A)
    prog += read_at(0x20C) + read_at(0x210) + read_at(0x210)
    prog += [
        Instr("ADDU", rd=8, rs=2, rt=0),           # r8 = last v0 = 0
        Instr("LW", rt=9, rs=0, imm=0x200),        # len hi word (0)
        Instr("LW", rt=10, rs=0, imm=0x204),       # len lo word (6)
        Instr("LW", rt=11, rs=0, imm=0x208),       # first data bytes
    ]
    return prog


def _preimage_memory():
    mem = {}
    for w in range(8):
        mem[0x100 + 4 * w] = int.from_bytes(PK_KEY[4 * w : 4 * w + 4], "big")
    return mem


def test_mips_preimage_oracle_semantics():
    rows, state = execute(preimage_program(), 200, memory=_preimage_memory(),
                          preimages=PREIMAGES)
    r = state["regs"]
    assert state["pk"] == PK_KEY
    assert r[9] == 0 and r[10] == 6
    assert r[8] == 0                       # read past end returns 0
    assert state["po"] == 14               # 8 prefix + 6 data
    # data lands at 0x20A..0x20F (unaligned first write)
    assert state["memory"][0x208] == 0x0000DEAD
    assert state["memory"][0x20C] == 0xBEEFCAFE


def test_mips_preimage_constraints_satisfied():
    n = 512
    beta, joint = 5511, 8822
    from proof_systems_tpu.circuits.domains import EvaluationDomains

    program = preimage_program()
    memory = _preimage_memory()
    rows, state = execute(program, 200, memory=memory, preimages=PREIMAGES)
    cols = build_columns(Fp, rows, state, n, TEST_LAYOUT)
    lg = make_logup(Fp, program, n, TEST_LAYOUT, preimages=PREIMAGES)
    full = lg.phase1_columns(cols)
    phase2 = lg.phase2_host(beta, joint)
    omega = EvaluationDomains.create(Fp, n).d1.group_gen
    cons = constraints(Fp, lg, len(rows), None, state, omega, TEST_LAYOUT)
    _host_check(full + phase2, cons, n, omega, beta, joint)


def test_mips_corrupt_preimage_byte_not_in_table():
    """A preimage-read row claiming a wrong stream byte is not in the
    PREIMAGE table: multiplicity counting rejects it."""
    n = 512
    L = TEST_LAYOUT
    program = preimage_program()
    rows, state = execute(program, 200, memory=_preimage_memory(),
                          preimages=PREIMAGES)
    cols = build_columns(Fp, rows, state, n, L)
    # find the first rpre row with n > 0 and corrupt its first stream byte
    i = next(j for j, row in enumerate(rows)
             if row.get("sys_kind") == "rpre" and row.get("n", 0) > 0)
    cols[L.sb[0]][i] = (cols[L.sb[0]][i] + 1) % 256
    lg = make_logup(Fp, program, n, L, preimages=PREIMAGES)
    with pytest.raises(ValueError, match="not in table"):
        lg.phase1_columns(cols)


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


@pytest.mark.heavy
def test_mips_cannon_snapshot_preimage_prove_verify():
    """End-to-end: a Cannon snapshot segment that performs a preimage
    read is executed by the Cannon witness runner, then proven and
    verified from the snapshot fields (pc, regs, hi/lo, heap,
    preimage_key/offset, touched memory), with a corrupted-preimage
    negative. Reference flow: o1vm/src/pickles/main.rs:257 +
    interpreter.rs:1148-1463 (syscall constraint surface)."""
    from proof_systems_tpu.circuits.domains import EvaluationDomains
    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.o1vm.cannon import (
        CannonVM,
        InMemoryPreImageOracle,
        State,
    )
    from proof_systems_tpu.o1vm.mips import prove_execution, verify_execution
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.utils import TestRng

    pc0 = 0x1000
    key = bytes(range(64, 96))
    preimages = {key: b"\x11\x22\x33\x44"}
    # program: write the 32-byte key (already in memory at 0x100) to the
    # preimage-write fd, read the 8-byte length prefix + 4 data bytes,
    # then exit(fifth data word)
    prog = [
        Instr("ADDIU", rt=4, rs=0, imm=6),
        Instr("ADDIU", rt=6, rs=0, imm=4),
    ]
    for w in range(8):
        prog += [
            Instr("ADDIU", rt=2, rs=0, imm=4004),
            Instr("ADDIU", rt=5, rs=0, imm=0x100 + 4 * w),
            Instr("SYSCALL"),
        ]
    prog += [Instr("ADDIU", rt=4, rs=0, imm=5)]
    for a in (0x200, 0x204, 0x208):
        prog += [
            Instr("ADDIU", rt=2, rs=0, imm=4003),
            Instr("ADDIU", rt=5, rs=0, imm=a),
            Instr("SYSCALL"),
        ]
    prog += [
        Instr("LW", rt=9, rs=0, imm=0x208),        # r9 = data word
        Instr("ADDIU", rt=2, rs=0, imm=4246),      # exit_group
        Instr("ADDIU", rt=4, rs=0, imm=3),
        Instr("SYSCALL"),
    ]

    # build the snapshot and run the Cannon witness runner over it
    st = State(memory={}, pc=pc0, next_pc=pc0 + 4)
    vm = CannonVM(st, oracle=InMemoryPreImageOracle(preimages))
    for w, ins in enumerate(prog):
        vm.mem.write_word(pc0 + 4 * w, _encode(ins))
    data_mem = {0x100 + 4 * w: int.from_bytes(key[4 * w:4 * w + 4], "big")
                for w in range(8)}
    for addr, val in data_mem.items():
        vm.mem.write_word(addr, val)
    vm.run(max_steps=100)
    assert st.exited and st.exit == 3
    assert st.registers[9] == 0x11223344

    # prove the same segment from the snapshot's initial fields
    n = 512
    domain = EvaluationDomains.create(Fp, n)
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)],
        srs_mod.derive_h(Vesta),
    )
    proof, statement = prove_execution(
        domain, srs, Vesta, prog, n, TestRng(81), memory=data_mem,
        L=TEST_LAYOUT, pc0=pc0, preimages=preimages,
    )
    fin = statement["final"]
    assert fin["exited"] and fin["exit_code"] == 3
    assert fin["regs"][9] == 0x11223344
    assert fin["regs"] == list(st.registers)
    assert fin["pk"] == key and st.preimage_key == key
    assert verify_execution(domain, srs, Vesta, proof, statement, TestRng(82))

    # corrupted oracle: different preimage data must fail verification
    bad = dict(statement)
    bad["preimages"] = {key: b"\x11\x22\x33\x45"}
    assert not verify_execution(domain, srs, Vesta, proof, bad, TestRng(83))
