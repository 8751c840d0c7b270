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
