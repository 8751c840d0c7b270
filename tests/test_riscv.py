"""RISC-V execution proofs (o1vm interpreters analogue, subset)."""

from proof_systems_tpu.circuits.domains import EvaluationDomains
from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.o1vm.riscv import Instr, execute, prove_execution
from proof_systems_tpu.o1vm.pickles import verify_columns
from proof_systems_tpu.poly_commitment import srs as srs_mod
from proof_systems_tpu.utils import TestRng


def fib_program(k: int):
    # r1=0, r2=1; loop k times: r3=r1+r2; r1=r2; r2=r3
    prog = [
        Instr("ADDI", rd=1, rs1=0, imm=0),
        Instr("ADDI", rd=2, rs1=0, imm=1),
    ]
    for _ in range(k):
        prog += [
            Instr("ADD", rd=3, rs1=1, rs2=2),
            Instr("ADD", rd=1, rs1=2, rs2=0),
            Instr("ADD", rd=2, rs1=3, rs2=0),
        ]
    return prog


def test_riscv_execute_semantics():
    rows, regs, pc = execute(fib_program(8), 100)
    fib = [0, 1]
    for _ in range(8):
        fib.append(fib[-1] + fib[-2])
    assert regs[2] == fib[9]
    # branch + jal
    prog = [
        Instr("ADDI", rd=1, imm=5),
        Instr("BEQ", rs1=1, rs2=0, imm=12),   # not taken
        Instr("ADDI", rd=2, rs1=0, imm=7),
        Instr("JAL", rd=5, imm=8),            # skip next
        Instr("ADDI", rd=2, rs1=0, imm=99),   # skipped
        Instr("BNE", rs1=2, rs2=0, imm=8),    # taken -> skip next
        Instr("ADDI", rd=2, rs1=0, imm=98),   # skipped
        Instr("MUL", rd=4, rs1=1, rs2=2),
    ]
    rows, regs, pc = execute(prog, 100)
    assert regs[2] == 7 and regs[4] == 35 and regs[5] == 16


def test_riscv_prove_verify():
    n = 64
    domain = EvaluationDomains.create(Fp, n)
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )
    prog = fib_program(5)
    proof, cons, rows = prove_execution(domain, srs, Vesta, prog, n, TestRng(80))
    assert verify_columns(domain, srs, Vesta, cons, proof, TestRng(81))
    proof.zeta_evaluations[0] = (proof.zeta_evaluations[0] + 1) % Fp.p
    assert not verify_columns(domain, srs, Vesta, cons, proof, TestRng(82))


def test_elf_load_and_execute():
    """ELF32 round trip: build -> load -> decode -> execute (o1vm
    elf_loader.rs capability)."""
    import struct

    from proof_systems_tpu.o1vm import elf
    from proof_systems_tpu.o1vm.riscv import decode

    # addi x1,x0,5 ; addi x2,x0,7 ; add x3,x1,x2
    words = [0x00500093, 0x00700113, 0x002081B3]
    text = b"".join(struct.pack("<I", w) for w in words)
    blob = elf.build_elf(elf.EM_RISCV, 0x1000, text, data=(0x2000, b"\x2a\0\0\0"))
    prog = elf.load_elf(blob)
    assert prog.machine == elf.EM_RISCV and prog.entry == 0x1000
    assert prog.memory_image()[0x2000] == 42
    instrs = [decode(w) for w in prog.text_words()]
    rows, regs, pc = execute(instrs, 100)
    assert regs[3] == 12


def test_mips_elf_machine():
    from proof_systems_tpu.o1vm import elf

    blob = elf.build_elf(elf.EM_MIPS, 0, b"\0\0\0\0")
    assert elf.load_elf(blob).machine == elf.EM_MIPS


def test_riscv_negative_immediate_constraints():
    """ADDI with negative imm: signed-carry flag keeps constraints exact."""
    from proof_systems_tpu.circuits import expr as E
    from proof_systems_tpu.o1vm.riscv import LAYOUT, build_columns, constraints

    prog = [
        Instr("ADDI", rd=1, imm=5),
        Instr("ADDI", rd=2, rs1=1, imm=-9),   # wraps below zero
        Instr("ADDI", rd=3, rs1=2, imm=-1),
    ]
    n = 16
    rows, regs, pc = execute(prog, n - 1)
    assert regs[2] == (5 - 9) % (1 << 32)
    cols = build_columns(Fp, rows, regs, pc, n)
    cons = constraints(Fp)

    def get_cell_at(j):
        def get(cell, row):
            i = cell[1]
            return cols[i][j] if row == E.CURR else cols[i][(j + 1) % n]
        return get

    for j in range(n):
        ctx = E.HostEvalContext(
            f=Fp, get_cell=get_cell_at(j),
            challenges={"alpha": 1, "beta": 0, "gamma": 0, "joint_combiner": 0},
            endo=0, mds=[], point=0, domain_n=n, omega=1, zk_rows=0,
        )
        for k, con in enumerate(cons):
            assert E.eval_host(con, ctx) == 0, f"constraint {k} at row {j}"
