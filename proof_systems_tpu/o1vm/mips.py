"""MIPS (o1vm/Cannon flavour) execution proofs over the column prover.

The reference interprets MIPS with a dual-mode interpreter
(o1vm/src/interpreters/mips/interpreter.rs, 2,699 LoC: witness mode
fills columns, constraint mode emits Expr) driven by Cannon state
snapshots. This module keeps the dual-interpretation architecture and
the Cannon pc/next_pc delay-slot model, with the same TPU-friendly
register-file column layout as riscv.py (32 register columns propagated
row-to-row by selector-gated consistency constraints).

Constraint-backed instructions: ADD, ADDU, SUB, SUBU, ADDI, ADDIU, LUI,
SLT, SLTU, SLL, SRL (constant shift), MULT (hi/lo split), MFLO, MFHI,
BEQ, BNE, J, JAL, JR. Bitwise ops and loads/stores execute in witness
mode and are tracked for the LogUp range-check/memory argument
(o1vm/logup.py) — same staging as the reference's lookup environment
(o1vm/src/interpreters/mips/interpreter.rs lookup calls).

Row layout:
  pc | npc | hi | lo | r0..r31 | sel_op | rd_oh[32] | rs_oh[32] |
  rt_oh[32] | imm | res | flag | inv
"""

from __future__ import annotations

from dataclasses import dataclass

from ..circuits import expr as E
from ..fields import FieldParams

# constraint-backed ops get selectors; witness-mode ops share NoOp-style rows
OPS = [
    "ADD", "ADDU", "SUB", "SUBU", "ADDI", "ADDIU", "LUI",
    "SLT", "SLTU", "SLL", "SRL", "MULT", "MFLO", "MFHI",
    "BEQ", "BNE", "J", "JAL", "JR",
]
WITNESS_OPS = ["AND", "OR", "XOR", "NOR", "ANDI", "ORI", "XORI", "LW", "SW"]
TWO32 = 1 << 32


@dataclass
class Instr:
    op: str
    rd: int = 0
    rs: int = 0
    rt: int = 0
    imm: int = 0  # also shift amount for SLL/SRL, target for J/JAL


class Layout:
    def __init__(self):
        self.pc = 0
        self.npc = 1
        self.hi = 2
        self.lo = 3
        self.regs = [4 + i for i in range(32)]
        base = 36
        self.sel = {op: base + i for i, op in enumerate(OPS)}
        base += len(OPS)
        self.rd_oh = [base + i for i in range(32)]
        base += 32
        self.rs_oh = [base + i for i in range(32)]
        base += 32
        self.rt_oh = [base + i for i in range(32)]
        base += 32
        self.imm = base
        self.res = base + 1
        self.flag = base + 2
        self.inv = base + 3
        self.ncols = base + 4


LAYOUT = Layout()


def _signed(v: int) -> int:
    return v - TWO32 if v >= TWO32 // 2 else v


def _sext16(v: int) -> int:
    v &= 0xFFFF
    return v - (1 << 16) if v & 0x8000 else v


def decode(word: int) -> Instr:
    """Decode a 32-bit MIPS instruction word (subset; interpreter.rs
    decode_instruction capability)."""
    opcode = (word >> 26) & 0x3F
    rs = (word >> 21) & 31
    rt = (word >> 16) & 31
    rd = (word >> 11) & 31
    sa = (word >> 6) & 31
    funct = word & 0x3F
    imm16 = word & 0xFFFF
    target = word & 0x3FFFFFF
    if opcode == 0:
        table = {
            0x00: ("SLL", Instr("SLL", rd=rd, rt=rt, imm=sa)),
            0x02: ("SRL", Instr("SRL", rd=rd, rt=rt, imm=sa)),
            0x08: ("JR", Instr("JR", rs=rs)),
            0x10: ("MFHI", Instr("MFHI", rd=rd)),
            0x12: ("MFLO", Instr("MFLO", rd=rd)),
            0x18: ("MULT", Instr("MULT", rs=rs, rt=rt)),
            0x20: ("ADD", Instr("ADD", rd=rd, rs=rs, rt=rt)),
            0x21: ("ADDU", Instr("ADDU", rd=rd, rs=rs, rt=rt)),
            0x22: ("SUB", Instr("SUB", rd=rd, rs=rs, rt=rt)),
            0x23: ("SUBU", Instr("SUBU", rd=rd, rs=rs, rt=rt)),
            0x24: ("AND", Instr("AND", rd=rd, rs=rs, rt=rt)),
            0x25: ("OR", Instr("OR", rd=rd, rs=rs, rt=rt)),
            0x26: ("XOR", Instr("XOR", rd=rd, rs=rs, rt=rt)),
            0x27: ("NOR", Instr("NOR", rd=rd, rs=rs, rt=rt)),
            0x2A: ("SLT", Instr("SLT", rd=rd, rs=rs, rt=rt)),
            0x2B: ("SLTU", Instr("SLTU", rd=rd, rs=rs, rt=rt)),
        }
        if funct in table:
            return table[funct][1]
        raise ValueError(f"unsupported R funct {funct:#x}")
    table = {
        0x02: Instr("J", imm=target),
        0x03: Instr("JAL", imm=target),
        0x04: Instr("BEQ", rs=rs, rt=rt, imm=_sext16(imm16)),
        0x05: Instr("BNE", rs=rs, rt=rt, imm=_sext16(imm16)),
        0x08: Instr("ADDI", rt=rt, rs=rs, imm=_sext16(imm16)),
        0x09: Instr("ADDIU", rt=rt, rs=rs, imm=_sext16(imm16)),
        0x0C: Instr("ANDI", rt=rt, rs=rs, imm=imm16),
        0x0D: Instr("ORI", rt=rt, rs=rs, imm=imm16),
        0x0E: Instr("XORI", rt=rt, rs=rs, imm=imm16),
        0x0F: Instr("LUI", rt=rt, imm=imm16),
        0x23: Instr("LW", rt=rt, rs=rs, imm=_sext16(imm16)),
        0x2B: Instr("SW", rt=rt, rs=rs, imm=_sext16(imm16)),
    }
    if opcode in table:
        return table[opcode]
    raise ValueError(f"unsupported opcode {opcode:#x}")


def execute(program: list[Instr], max_steps: int, regs0=None, memory=None):
    """Concrete execution with the Cannon pc/npc delay-slot model.
    Returns (rows, final_state) where final_state carries regs/hi/lo/
    pc/npc/memory."""
    regs = list(regs0 or [0] * 32)
    regs[0] = 0
    mem = dict(memory or {})
    pc, npc = 0, 4
    hi = lo = 0
    rows = []
    lookups = []  # (kind, values) staged for the LogUp argument
    for _ in range(max_steps):
        idx = pc // 4
        if idx >= len(program):
            break
        ins = program[idx]
        row = {
            "pc": pc, "npc": npc, "hi": hi, "lo": lo,
            "regs": list(regs), "instr": ins,
        }
        a = regs[ins.rs]
        b = regs[ins.rt]
        imm = ins.imm
        res = 0
        flag = 0
        new_npc = npc + 4
        wreg = None  # register written this step
        if ins.op in ("ADD", "ADDU"):
            total = a + b
            flag, res = divmod(total, TWO32)
            wreg = ins.rd
        elif ins.op in ("SUB", "SUBU"):
            flag = 1 if a < b else 0
            res = (a - b) % TWO32
            wreg = ins.rd
        elif ins.op in ("ADDI", "ADDIU"):
            total = a + imm  # signed immediate
            res = total % TWO32
            flag = (total - res) // TWO32  # signed carry in {-1, 0, 1}
            wreg = ins.rt
        elif ins.op == "LUI":
            res = ((imm & 0xFFFF) << 16) % TWO32
            wreg = ins.rt
        elif ins.op == "SLT":
            res = 1 if _signed(a) < _signed(b) else 0
            wreg = ins.rd
        elif ins.op == "SLTU":
            res = 1 if a < b else 0
            wreg = ins.rd
        elif ins.op == "SLL":
            sa = imm & 31
            total = b << sa
            flag, res = total >> 32, total % TWO32
            wreg = ins.rd
            lookups.append(("range", flag, 1 << sa))
        elif ins.op == "SRL":
            sa = imm & 31
            res = b >> sa
            flag = b & ((1 << sa) - 1)
            wreg = ins.rd
            lookups.append(("range", flag, 1 << sa))
        elif ins.op == "MULT":
            total = a * b
            hi, lo = divmod(total, TWO32)
            res = lo
        elif ins.op == "MFLO":
            res = lo
            wreg = ins.rd
        elif ins.op == "MFHI":
            res = hi
            wreg = ins.rd
        elif ins.op in ("BEQ", "BNE"):
            flag = 1 if a == b else 0
            taken = flag if ins.op == "BEQ" else 1 - flag
            new_npc = (npc + 4 * imm) if taken else npc + 4
        elif ins.op == "J":
            new_npc = 4 * imm
        elif ins.op == "JAL":
            res = npc + 4
            wreg = 31
            new_npc = 4 * imm
        elif ins.op == "JR":
            new_npc = a
        elif ins.op in ("AND", "OR", "XOR", "NOR"):
            res = {
                "AND": a & b, "OR": a | b, "XOR": a ^ b,
                "NOR": (~(a | b)) % TWO32,
            }[ins.op]
            wreg = ins.rd
            lookups.append(("bitwise", ins.op, a, b, res))
        elif ins.op in ("ANDI", "ORI", "XORI"):
            m = imm & 0xFFFF
            res = {"ANDI": a & m, "ORI": a | m, "XORI": a ^ m}[ins.op]
            wreg = ins.rt
            lookups.append(("bitwise", ins.op, a, m, res))
        elif ins.op == "LW":
            addr = (a + imm) % TWO32
            res = mem.get(addr, 0)
            wreg = ins.rt
            lookups.append(("mem_read", addr, res))
        elif ins.op == "SW":
            addr = (a + imm) % TWO32
            mem[addr] = b
            lookups.append(("mem_write", addr, b))
        else:
            raise ValueError(f"unsupported op {ins.op}")
        row["res"] = res
        row["flag"] = flag
        rows.append(row)
        if wreg is not None and wreg != 0:
            regs[wreg] = res
        pc, npc = npc, new_npc
    state = {
        "regs": regs, "hi": hi, "lo": lo, "pc": pc, "npc": npc,
        "memory": mem, "lookups": lookups,
    }
    return rows, state


def build_columns(f: FieldParams, rows, state, n: int) -> list[list[int]]:
    """Witness columns (LAYOUT.ncols x n); the row after the trace holds
    the final machine state (register consistency reads NEXT)."""
    L = LAYOUT
    assert len(rows) < n, "trace must leave at least one padding row"
    cols = [[0] * n for _ in range(L.ncols)]
    p = f.p
    for i, row in enumerate(rows):
        ins: Instr = row["instr"]
        cols[L.pc][i] = row["pc"]
        cols[L.npc][i] = row["npc"]
        cols[L.hi][i] = row["hi"]
        cols[L.lo][i] = row["lo"]
        for r in range(32):
            cols[L.regs[r]][i] = row["regs"][r]
        if ins.op in L.sel:
            cols[L.sel[ins.op]][i] = 1
            wd = 31 if ins.op == "JAL" else (
                ins.rt if ins.op in ("ADDI", "ADDIU", "LUI") else ins.rd
            )
            cols[L.rd_oh[wd]][i] = 1
            cols[L.rs_oh[ins.rs]][i] = 1
            cols[L.rt_oh[ins.rt]][i] = 1
        # witness-mode rows (no selector) leave one-hots zero: sel_any
        # gates every semantic constraint, so they are free rows whose
        # soundness comes from the staged LogUp arguments.
        cols[L.imm][i] = ins.imm % p
        cols[L.res][i] = row["res"]
        cols[L.flag][i] = row["flag"] % p
        a = row["regs"][ins.rs]
        b = row["regs"][ins.rt]
        if ins.op in ("BEQ", "BNE"):
            diff = (a - b) % p
            cols[L.inv][i] = pow(diff, -1, p) if diff else 0
        elif ins.op in ("SLL", "SRL"):
            cols[L.inv][i] = pow(2, ins.imm & 31, p)
    if rows:
        i = len(rows)
        for r in range(32):
            cols[L.regs[r]][i] = state["regs"][r]
        cols[L.pc][i] = state["pc"]
        cols[L.npc][i] = state["npc"]
        cols[L.hi][i] = state["hi"]
        cols[L.lo][i] = state["lo"]
    return cols


def constraints(f: FieldParams) -> list[E.Expr]:
    """Selector-gated MIPS semantics (constraint mode of the dual
    interpreter, interpreter.rs interpret_rtype/itype/jtype)."""
    from .pickles import col

    L = LAYOUT
    p = f.p
    one = E.Literal(1)

    def c(i, row=E.CURR):
        return E.Cell(col(i), row)

    sel = {op: c(L.sel[op]) for op in OPS}
    sel_any: E.Expr = E.Literal(0)
    for op in OPS:
        sel_any = sel_any + sel[op]

    rsv: E.Expr = E.Literal(0)
    rtv: E.Expr = E.Literal(0)
    for r in range(32):
        rsv = rsv + c(L.rs_oh[r]) * c(L.regs[r])
        rtv = rtv + c(L.rt_oh[r]) * c(L.regs[r])

    imm = c(L.imm)
    res = c(L.res)
    flag = c(L.flag)
    inv = c(L.inv)
    pc, npc = c(L.pc), c(L.npc)
    pc_n, npc_n = c(L.pc, E.NEXT), c(L.npc, E.NEXT)
    hi, lo = c(L.hi), c(L.lo)
    hi_n, lo_n = c(L.hi, E.NEXT), c(L.lo, E.NEXT)
    two32 = E.Literal(TWO32 % p)

    out = []
    for op in OPS:
        out.append(sel[op].boolean())
    out.append(sel_any * (sel_any - one))
    for group in (L.rd_oh, L.rs_oh, L.rt_oh):
        total: E.Expr = E.Literal(0)
        for i in group:
            out.append(c(i).boolean())
            total = total + c(i)
        out.append(total - sel_any)
    out.append(c(L.regs[0]))

    bitflag = (
        sel["ADD"] + sel["ADDU"] + sel["SUB"] + sel["SUBU"]
        + sel["BEQ"] + sel["BNE"]
    )
    out.append(bitflag * flag.boolean())

    writes = (
        sel["ADD"] + sel["ADDU"] + sel["SUB"] + sel["SUBU"] + sel["ADDI"]
        + sel["ADDIU"] + sel["LUI"] + sel["SLT"] + sel["SLTU"] + sel["SLL"]
        + sel["SRL"] + sel["MFLO"] + sel["MFHI"] + sel["JAL"]
    )
    for r in range(32):
        reg = c(L.regs[r])
        reg_n = c(L.regs[r], E.NEXT)
        wr = c(L.rd_oh[r]) * writes if r != 0 else E.Literal(0)
        out.append(sel_any * (wr * (reg_n - res) + (one - wr) * (reg_n - reg)))

    # hi/lo registers: MULT writes both, everything else propagates
    out.append(
        sel_any * (sel["MULT"] * (lo_n - res) + (one - sel["MULT"]) * (lo_n - lo))
    )
    out.append(sel["MULT"] * (rsv * rtv - res - hi_n * two32))
    out.append(sel_any * (one - sel["MULT"]) * (hi_n - hi))

    # ALU
    out.append((sel["ADD"] + sel["ADDU"]) * (rsv + rtv - flag * two32 - res))
    out.append((sel["SUB"] + sel["SUBU"]) * (rsv - rtv + flag * two32 - res))
    # ADDI: imm is the SIGNED immediate embedded in F; flag is the signed
    # carry (range-checked via LogUp, like SLT)
    out.append((sel["ADDI"] + sel["ADDIU"]) * (rsv + imm - flag * two32 - res))
    out.append(sel["LUI"] * (imm * E.Literal(1 << 16) - res))
    out.append((sel["SLT"] + sel["SLTU"]) * res.boolean())
    out.append(sel["MFLO"] * (res - lo))
    out.append(sel["MFHI"] * (res - hi))
    out.append(sel["JAL"] * (res - npc - E.Literal(4)))
    # constant shifts: witness provides pw = 2^sa in the inv column
    # (selector-disjoint with the branch inverse use of the same column);
    # SLL: rt * 2^sa = flag * 2^32 + res, flag < 2^sa (LogUp)
    # SRL: rt = res * 2^sa + flag,        flag < 2^sa (LogUp)
    pw = inv
    out.append(sel["SLL"] * (rtv * pw - flag * two32 - res))
    out.append(sel["SRL"] * (res * pw + flag - rtv))

    # branch equality flag via inverse witness
    diff = rsv - rtv
    br = sel["BEQ"] + sel["BNE"]
    out.append(br * (diff * flag))
    out.append(br * (diff * inv - (one - flag)))

    # program counter chain (Cannon delay-slot model): pc' = npc always
    out.append(sel_any * (pc_n - npc))
    seq = (
        sel["ADD"] + sel["ADDU"] + sel["SUB"] + sel["SUBU"] + sel["ADDI"]
        + sel["ADDIU"] + sel["LUI"] + sel["SLT"] + sel["SLTU"] + sel["SLL"]
        + sel["SRL"] + sel["MULT"] + sel["MFLO"] + sel["MFHI"]
    )
    four = E.Literal(4)
    out.append(seq * (npc_n - npc - four))
    out.append(sel["J"] * (npc_n - imm * four))
    out.append(sel["JAL"] * (npc_n - imm * four))
    out.append(sel["JR"] * (npc_n - rsv))
    out.append(sel["BEQ"] * (npc_n - npc - four - flag * (four * imm - four)))
    out.append(
        sel["BNE"] * (npc_n - npc - four - (one - flag) * (four * imm - four))
    )
    return out


def prove_execution(domain, srs, curve, program: list[Instr], n: int, rng, regs0=None, memory=None):
    """Execute + prove; returns (proof, constraints, rows, state)."""
    from ..ops import limb
    from .pickles import prove_columns

    f = curve.scalar
    rows, state = execute(program, n - 1, regs0, memory)
    cols = build_columns(f, rows, state, n)
    F = limb.device_field(f)
    flat = [v for colv in cols for v in colv]
    dev = F.pack_mont(flat, shape=(len(cols), n))
    cons = constraints(f)
    proof = prove_columns(domain, srs, curve, dev, cons, rng)
    return proof, cons, rows, state
