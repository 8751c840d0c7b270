"""MIPS (o1vm/Cannon flavour) execution proofs over the column prover.

The reference interprets MIPS with a dual-mode interpreter
(o1vm/src/interpreters/mips/interpreter.rs, 2,699 LoC: witness mode
fills columns, constraint mode emits Expr) driven by Cannon state
snapshots, and gets its soundness from RAM lookups: every register and
memory access emits signed LogUp records with access counters
(interpreter.rs:302-486, ramlookup.rs), and every decomposition goes
through fixed range tables (lookups.rs ByteLookup/RangeCheck16).

This module keeps the dual-interpretation architecture and the Cannon
pc/next_pc delay-slot model, with a TPU-friendly register-file column
layout (32 register columns propagated row-to-row by selector-gated
consistency constraints — no register RAM argument needed) plus the
full lookup environment via MultiLogup (logup.py):

  - program ROM pinning: every executing row looks up
    (pc, op/reg descriptor, imm) in a fixed per-program ROM table, so
    the proof is bound to THE program (reference: instruction fetch is
    a memory lookup at pc);
  - byte range checks: the written result and three aux values are
    decomposed into bytes looked up in a 256-entry byte table
    (lookups.rs:41 ByteLookup), which bounds every register value to
    32 bits by induction from the pinned initial state;
  - bitwise AND/OR/XOR/NOR(+immediates) via a 1024-entry
    (op, x, y, z) nibble product table;
  - shifts via a 32-entry POW2 table (sa, 2^sa, 2^{32-sa});
  - memory via the offline memory-checking argument: each access emits
    write(addr, last_t, old_v) [+1] and read(addr, t+1, new_v) [-1]
    (interpreter.rs:455-486 access_memory), elapsed time is
    range-checked, and the public initial/final memory enters through
    boundary records on padding rows whose columns the verifier pins
    by recommitting them (prove_execution/verify_execution).

Statement proved: "running program P for k steps from public initial
state (pc=0, regs0, memory0) yields public final state (regs_k, pc_k,
hi/lo_k, memory_k)" — boundary rows are pinned with
UnnormalizedLagrangeBasis constraints at rows 0 and k.

Row layout: see Layout. Witness-mode-only rows no longer exist: every
supported opcode is selector-backed and fully constrained.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..circuits import expr as E
from ..fields import FieldParams
from .logup import (
    BITWISE_NOR,
    BITWISE_OR,
    BITWISE_XOR,
    FixedTable,
    LookupSpec,
    MultiLogup,
    bitwise_table,
)

TWO32 = 1 << 32

# all ops are constraint-backed (selector + semantics + lookups)
OPS = [
    "ADD", "ADDU", "SUB", "SUBU", "ADDI", "ADDIU", "LUI",
    "SLT", "SLTU", "SLTI", "SLTIU",
    "SLL", "SRL", "SRA", "SLLV", "SRLV", "SRAV",
    "MULT", "MULTU", "MFLO", "MFHI",
    "BEQ", "BNE", "J", "JAL", "JR",
    "AND", "OR", "XOR", "NOR", "ANDI", "ORI", "XORI",
    "LW", "SW",
]
OP_ID = {op: i for i, op in enumerate(OPS)}

R_BITWISE = ["AND", "OR", "XOR", "NOR"]
I_BITWISE = ["ANDI", "ORI", "XORI"]
BITWISE = R_BITWISE + I_BITWISE
CONST_SHIFTS = ["SLL", "SRL", "SRA"]
VAR_SHIFTS = ["SLLV", "SRLV", "SRAV"]
SHIFTS = CONST_SHIFTS + VAR_SHIFTS
COMPARES = ["SLT", "SLTU", "SLTI", "SLTIU"]
MEM_OPS = ["LW", "SW"]

# lookup table ids
TBL_BYTE = 3        # lookups.rs:41 ByteLookup
TBL_BITWISE = 20
TBL_POW2 = 21
TBL_ROM = 22
TBL_MEMORY = 7      # lookups.rs:54 MemoryLookup (RAM, no fixed column)

_BITWISE_OPID = {
    "AND": 0, "ANDI": 0, "OR": BITWISE_OR, "ORI": BITWISE_OR,
    "XOR": BITWISE_XOR, "XORI": BITWISE_XOR, "NOR": BITWISE_NOR,
}


@dataclass
class Instr:
    op: str
    rd: int = 0
    rs: int = 0
    rt: int = 0
    imm: int = 0  # shift amount for SLL/SRL/SRA, target for J/JAL


def write_dest(ins: Instr) -> int:
    """Destination register index (normalized: I-type writes rt)."""
    if ins.op == "JAL":
        return 31
    if ins.op in ("ADDI", "ADDIU", "LUI", "SLTI", "SLTIU",
                  "ANDI", "ORI", "XORI", "LW"):
        return ins.rt
    return ins.rd


WRITING_OPS = [
    op for op in OPS
    if op not in ("MULT", "MULTU", "BEQ", "BNE", "J", "JR", "SW")
]


class Layout:
    """Column layout. `bitwise_bits` sets the bitwise chunk width: 4
    (1024-entry table, production) or 2 (64-entry table, small test
    domains) — the tradeoff is table length vs chunk-column count."""

    def __init__(self, bitwise_bits: int = 4):
        assert 32 % bitwise_bits == 0
        self.bw_bits = bitwise_bits
        nbw = 32 // bitwise_bits
        i = 0

        def take(k=1):
            nonlocal i
            out = list(range(i, i + k))
            i += k
            return out if k > 1 else out[0]

        self.pc = take()
        self.npc = take()
        self.hi = take()
        self.lo = take()
        self.regs = take(32)
        self.sel = {}
        for op in OPS:
            self.sel[op] = take()
        self.rd_oh = take(32)
        self.rs_oh = take(32)
        self.rt_oh = take(32)
        self.imm = take()
        self.res = take()
        self.flag = take()
        self.inv = take()     # branch diff inverse
        self.idx = take()     # time counter: row j has idx = j + 1
        self.pw = take()      # 2^sa for shifts (POW2-pinned)
        self.pw2b = take()    # 2^{32-sa} for shifts (POW2-pinned)
        self.sa = take()      # shift amount (imm or rs&31)
        self.shq = take()     # (rsv - sa)/32 for variable shifts
        self.msb_a = take()   # msb of rsv (signed ops)
        self.msb_b = take()   # msb of rtv (signed ops)
        self.imm32 = take()   # imm mod 2^32 (SLTI/SLTIU)
        self.ineg = take()    # sign bit of the 16-bit immediate
        self.res_b = take(4)  # byte decomposition of res
        self.auxa_b = take(4)
        self.auxb_b = take(4)
        self.auxc_b = take(4)
        self.auxd_b = take(4)
        self.an = take(nbw)   # bitwise chunks of operand a (rsv)
        self.bn = take(nbw)   # operand b (rtv or imm)
        self.zn = take(nbw)   # result
        self.maddr = take()   # memory address
        self.mold = take()    # old value at maddr
        self.mval = take()    # new value at maddr
        self.mlast = take()   # last access time of maddr
        self.mcarry = take()  # address wrap carry in {-1,0,1}
        self.isel = take()    # boundary: initial-memory record selector
        self.iaddr = take()
        self.ival = take()
        self.fsel = take()    # boundary: final-memory record selector
        self.faddr = take()
        self.fval = take()
        self.ftime = take()
        self.ncols = i


LAYOUT = Layout()


def _signed(v: int) -> int:
    return v - TWO32 if v >= TWO32 // 2 else v


def _sext16(v: int) -> int:
    v &= 0xFFFF
    return v - (1 << 16) if v & 0x8000 else v


def decode(word: int) -> Instr:
    """Decode a 32-bit MIPS instruction word (interpreter.rs
    decode_instruction capability, supported subset)."""
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
            0x00: Instr("SLL", rd=rd, rt=rt, imm=sa),
            0x02: Instr("SRL", rd=rd, rt=rt, imm=sa),
            0x03: Instr("SRA", rd=rd, rt=rt, imm=sa),
            0x04: Instr("SLLV", rd=rd, rs=rs, rt=rt),
            0x06: Instr("SRLV", rd=rd, rs=rs, rt=rt),
            0x07: Instr("SRAV", rd=rd, rs=rs, rt=rt),
            0x08: Instr("JR", rs=rs),
            0x10: Instr("MFHI", rd=rd),
            0x12: Instr("MFLO", rd=rd),
            0x18: Instr("MULT", rs=rs, rt=rt),
            0x19: Instr("MULTU", rs=rs, rt=rt),
            0x20: Instr("ADD", rd=rd, rs=rs, rt=rt),
            0x21: Instr("ADDU", rd=rd, rs=rs, rt=rt),
            0x22: Instr("SUB", rd=rd, rs=rs, rt=rt),
            0x23: Instr("SUBU", rd=rd, rs=rs, rt=rt),
            0x24: Instr("AND", rd=rd, rs=rs, rt=rt),
            0x25: Instr("OR", rd=rd, rs=rs, rt=rt),
            0x26: Instr("XOR", rd=rd, rs=rs, rt=rt),
            0x27: Instr("NOR", rd=rd, rs=rs, rt=rt),
            0x2A: Instr("SLT", rd=rd, rs=rs, rt=rt),
            0x2B: Instr("SLTU", rd=rd, rs=rs, rt=rt),
        }
        if funct in table:
            return table[funct]
        raise ValueError(f"unsupported R funct {funct:#x}")
    table = {
        0x02: Instr("J", imm=target),
        0x03: Instr("JAL", imm=target),
        0x04: Instr("BEQ", rs=rs, rt=rt, imm=_sext16(imm16)),
        0x05: Instr("BNE", rs=rs, rt=rt, imm=_sext16(imm16)),
        0x08: Instr("ADDI", rt=rt, rs=rs, imm=_sext16(imm16)),
        0x09: Instr("ADDIU", rt=rt, rs=rs, imm=_sext16(imm16)),
        0x0A: Instr("SLTI", rt=rt, rs=rs, imm=_sext16(imm16)),
        0x0B: Instr("SLTIU", rt=rt, rs=rs, imm=_sext16(imm16)),
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
    Returns (rows, final_state); rows carry per-step memory access
    metadata (old value, last access time) for the RAM argument."""
    regs = list(regs0 or [0] * 32)
    regs[0] = 0
    mem = dict(memory or {})
    init_mem = dict(memory or {})
    last_access: dict[int, int] = {}
    pc, npc = 0, 4
    hi = lo = 0
    rows = []
    for step in range(max_steps):
        word_idx = pc // 4
        if word_idx >= len(program):
            break
        ins = program[word_idx]
        t = step + 1  # idx column value on this row
        row = {
            "pc": pc, "npc": npc, "hi": hi, "lo": lo,
            "regs": list(regs), "instr": ins, "t": t,
        }
        a = regs[ins.rs]
        b = regs[ins.rt]
        imm = ins.imm
        res = 0
        flag = 0
        new_npc = npc + 4
        wreg = None
        if ins.op in ("ADD", "ADDU"):
            total = a + b
            flag, res = divmod(total, TWO32)
            wreg = ins.rd
        elif ins.op in ("SUB", "SUBU"):
            flag = 1 if a < b else 0
            res = (a - b) % TWO32
            wreg = ins.rd
        elif ins.op in ("ADDI", "ADDIU"):
            total = a + imm
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
        elif ins.op == "SLTI":
            res = 1 if _signed(a) < imm else 0
            wreg = ins.rt
        elif ins.op == "SLTIU":
            res = 1 if a < imm % TWO32 else 0
            wreg = ins.rt
        elif ins.op in SHIFTS:
            sa = (imm if ins.op in CONST_SHIFTS else a) & 31
            row["sa"] = sa
            if ins.op in ("SLL", "SLLV"):
                total = b << sa
                flag, res = total >> 32, total % TWO32
            elif ins.op in ("SRL", "SRLV"):
                res = b >> sa
                flag = b & ((1 << sa) - 1)
            else:  # SRA / SRAV: arithmetic shift
                res = (_signed(b) >> sa) % TWO32
                flag = b & ((1 << sa) - 1)
            wreg = ins.rd
        elif ins.op == "MULT":
            sprod = _signed(a) * _signed(b)
            flag = 1 if sprod < 0 else 0  # product sign (constraint witness)
            total = sprod % (1 << 64)
            hi, lo = total >> 32, total % TWO32
            res = lo
        elif ins.op == "MULTU":
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
        elif ins.op in R_BITWISE:
            res = {
                "AND": a & b, "OR": a | b, "XOR": a ^ b,
                "NOR": (~(a | b)) % TWO32,
            }[ins.op]
            wreg = ins.rd
        elif ins.op in I_BITWISE:
            m = imm & 0xFFFF
            res = {"ANDI": a & m, "ORI": a | m, "XORI": a ^ m}[ins.op]
            wreg = ins.rt
        elif ins.op in MEM_OPS:
            addr = (a + imm) % TWO32
            old = mem.get(addr, 0)
            init_mem.setdefault(addr, 0)
            row["maddr"] = addr
            row["mold"] = old
            row["mlast"] = last_access.get(addr, 0)
            last_access[addr] = t + 1
            if ins.op == "LW":
                res = old
                row["mval"] = old
                wreg = ins.rt
            else:
                mem[addr] = b
                row["mval"] = b
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
        "memory": mem, "init_memory": init_mem, "last_access": last_access,
    }
    return rows, state


# ---------------------------------------------------------------------------
# witness columns
# ---------------------------------------------------------------------------


def _bytes4(v: int) -> list[int]:
    return [(v >> (8 * k)) & 0xFF for k in range(4)]


def rom_table(f: FieldParams, program: list[Instr]) -> FixedTable:
    """(pc, descriptor, imm) per program word; the descriptor packs
    (op_id, write_dest, rs, rt) which are each canonically bounded, and
    imm rides as its own vector component so the packing is
    collision-free."""
    pcs, descs, imms = [], [], []
    for w, ins in enumerate(program):
        pcs.append(4 * w)
        descs.append(
            OP_ID[ins.op] + (write_dest(ins) << 6) + (ins.rs << 11) + (ins.rt << 16)
        )
        imms.append(ins.imm % f.p)
    return FixedTable(TBL_ROM, "rom", [pcs, descs, imms])


def pow2_table() -> FixedTable:
    sas = list(range(32))
    return FixedTable(
        TBL_POW2, "pow2", [sas, [1 << s for s in sas], [1 << (32 - s) for s in sas]]
    )


def byte_table() -> FixedTable:
    return FixedTable(TBL_BYTE, "byte", [list(range(256))])


def build_columns(f: FieldParams, rows, state, n: int, L: Layout | None = None) -> list[list[int]]:
    """Witness columns (L.ncols x n). Row len(rows) holds the
    final machine state (register consistency reads NEXT); padding rows
    after it host one initial-memory and one final-memory boundary
    record each."""
    L = L or LAYOUT
    p = f.p
    init_mem = state["init_memory"]
    nboundary = len(init_mem)
    assert len(rows) + 1 + nboundary <= n, "trace + boundary rows exceed domain"
    cols = [[0] * n for _ in range(L.ncols)]
    for i, row in enumerate(rows):
        ins: Instr = row["instr"]
        a = row["regs"][ins.rs]
        b = row["regs"][ins.rt]
        res = row["res"]
        flag = row["flag"]
        cols[L.pc][i] = row["pc"]
        cols[L.npc][i] = row["npc"]
        cols[L.hi][i] = row["hi"]
        cols[L.lo][i] = row["lo"]
        for r in range(32):
            cols[L.regs[r]][i] = row["regs"][r]
        cols[L.sel[ins.op]][i] = 1
        cols[L.rd_oh[write_dest(ins)]][i] = 1
        cols[L.rs_oh[ins.rs]][i] = 1
        cols[L.rt_oh[ins.rt]][i] = 1
        cols[L.imm][i] = ins.imm % p
        cols[L.res][i] = res
        cols[L.flag][i] = flag % p
        cols[L.idx][i] = row["t"]
        for k, bv in enumerate(_bytes4(res)):
            cols[L.res_b[k]][i] = bv

        auxa = auxb = auxc = auxd = 0
        if ins.op in ("BEQ", "BNE"):
            diff = (a - b) % p
            cols[L.inv][i] = pow(diff, -1, p) if diff else 0
        if ins.op in ("MULT", "MULTU"):
            # hi AFTER the op (constraint uses hi_next): next row's hi
            auxa = rows[i + 1]["hi"] if i + 1 < len(rows) else state["hi"]
        if ins.op == "MULT" or ins.op in ("SLT", "SLTI"):
            cols[L.msb_a][i] = a >> 31
            auxb = (2 * (a - (a >> 31) * (1 << 31))) % TWO32
        if ins.op in ("MULT", "SLT", "SRA", "SRAV"):
            cols[L.msb_b][i] = b >> 31
            auxc = 2 * (b - (b >> 31) * (1 << 31))
        if ins.op in COMPARES:
            if ins.op == "SLT":
                d = a - b + (1 << 31) * (2 * (b >> 31) - 2 * (a >> 31)) + res * TWO32
            elif ins.op == "SLTU":
                d = a - b + res * TWO32
            else:
                imm32 = ins.imm % TWO32
                cols[L.imm32][i] = imm32
                cols[L.ineg][i] = 1 if ins.imm < 0 else 0
                auxd = imm32
                if ins.op == "SLTI":
                    d = (
                        a - imm32
                        + (1 << 31) * (2 * (imm32 >> 31) - 2 * (a >> 31))
                        + res * TWO32
                    )
                else:
                    d = a - imm32 + res * TWO32
            assert 0 <= d < TWO32, (ins.op, d)
            auxa = d
        if ins.op in SHIFTS:
            sa = row["sa"]
            cols[L.sa][i] = sa
            cols[L.pw][i] = 1 << sa
            cols[L.pw2b][i] = 1 << (32 - sa)
            auxa = flag
            auxb = flag * (1 << (32 - sa))
            if ins.op in VAR_SHIFTS:
                cols[L.shq][i] = (a - sa) // 32
                auxd = (a - sa) // 32
        if ins.op in MEM_OPS:
            cols[L.maddr][i] = row["maddr"]
            cols[L.mold][i] = row["mold"]
            cols[L.mval][i] = row["mval"]
            cols[L.mlast][i] = row["mlast"]
            total = a + ins.imm
            cols[L.mcarry][i] = (total - row["maddr"]) // TWO32 % p
            auxa = row["maddr"]
            auxb = row["t"] - row["mlast"]
            assert auxb >= 0
        for k, bv in enumerate(_bytes4(auxa)):
            cols[L.auxa_b[k]][i] = bv
        for k, bv in enumerate(_bytes4(auxb)):
            cols[L.auxb_b[k]][i] = bv
        for k, bv in enumerate(_bytes4(auxc)):
            cols[L.auxc_b[k]][i] = bv
        for k, bv in enumerate(_bytes4(auxd)):
            cols[L.auxd_b[k]][i] = bv
        if ins.op in BITWISE:
            bop = b if ins.op in R_BITWISE else (ins.imm & 0xFFFF)
            bw = L.bw_bits
            mask = (1 << bw) - 1
            for k in range(len(L.an)):
                cols[L.an[k]][i] = (a >> (bw * k)) & mask
                cols[L.bn[k]][i] = (bop >> (bw * k)) & mask
                cols[L.zn[k]][i] = (res >> (bw * k)) & mask

    # final-state row
    fin = len(rows)
    for r in range(32):
        cols[L.regs[r]][fin] = state["regs"][r]
    cols[L.pc][fin] = state["pc"]
    cols[L.npc][fin] = state["npc"]
    cols[L.hi][fin] = state["hi"]
    cols[L.lo][fin] = state["lo"]
    cols[L.idx][fin] = len(rows) + 1

    # boundary rows: one initial-memory + one final-memory record each
    for k, addr in enumerate(sorted(init_mem)):
        i = fin + 1 + k
        cols[L.isel][i] = 1
        cols[L.iaddr][i] = addr
        cols[L.ival][i] = init_mem[addr]
        cols[L.fsel][i] = 1
        cols[L.faddr][i] = addr
        cols[L.fval][i] = state["memory"].get(addr, 0)
        cols[L.ftime][i] = state["last_access"].get(addr, 0)
    return cols


# ---------------------------------------------------------------------------
# constraints + lookup specs
# ---------------------------------------------------------------------------


def _c(i, row=E.CURR):
    from .pickles import col

    return E.Cell(col(i), row)


def make_logup(f: FieldParams, program: list[Instr], n: int, L: Layout | None = None) -> MultiLogup:
    L = L or LAYOUT
    one = E.Literal(1)
    sel = {op: _c(L.sel[op]) for op in OPS}

    def sel_sum(ops):
        s: E.Expr = E.Literal(0)
        for op in ops:
            s = s + sel[op]
        return s

    sel_any = sel_sum(OPS)
    specs: list[LookupSpec] = []

    # ROM pinning: (pc, descriptor, imm)
    rd_e: E.Expr = E.Literal(0)
    rs_e: E.Expr = E.Literal(0)
    rt_e: E.Expr = E.Literal(0)
    for r in range(32):
        rd_e = rd_e + E.Literal(r) * _c(L.rd_oh[r])
        rs_e = rs_e + E.Literal(r) * _c(L.rs_oh[r])
        rt_e = rt_e + E.Literal(r) * _c(L.rt_oh[r])
    opid_e: E.Expr = E.Literal(0)
    for op in OPS:
        opid_e = opid_e + E.Literal(OP_ID[op]) * sel[op]
    desc = (
        opid_e
        + E.Literal(1 << 6) * rd_e
        + E.Literal(1 << 11) * rs_e
        + E.Literal(1 << 16) * rt_e
    )
    specs.append(LookupSpec(TBL_ROM, sel_any, [_c(L.pc), desc, _c(L.imm)]))

    # byte range checks (always-on; 0 is in the table so padding is free)
    for group in (L.res_b, L.auxa_b, L.auxb_b, L.auxc_b, L.auxd_b):
        for ci in group:
            specs.append(LookupSpec(TBL_BYTE, one, [_c(ci)]))

    # bitwise nibbles
    sel_bw = sel_sum(BITWISE)
    opid_bw: E.Expr = E.Literal(0)
    for op in BITWISE:
        if _BITWISE_OPID[op]:
            opid_bw = opid_bw + E.Literal(_BITWISE_OPID[op]) * sel[op]
    for k in range(len(L.an)):
        specs.append(
            LookupSpec(
                TBL_BITWISE, sel_bw, [opid_bw, _c(L.an[k]), _c(L.bn[k]), _c(L.zn[k])]
            )
        )

    # shifts: pin (sa, 2^sa, 2^{32-sa})
    specs.append(
        LookupSpec(TBL_POW2, sel_sum(SHIFTS), [_c(L.sa), _c(L.pw), _c(L.pw2b)])
    )

    # memory RAM records (reference sign convention, ramlookup.rs:46-51:
    # write -> +, read -> -; access = write(addr,last,old), read(addr,t+1,new))
    sel_mem = sel_sum(MEM_OPS)
    specs.append(
        LookupSpec(TBL_MEMORY, sel_mem, [_c(L.maddr), _c(L.mlast), _c(L.mold)])
    )
    specs.append(
        LookupSpec(
            TBL_MEMORY,
            E.Literal(0) - sel_mem,
            [_c(L.maddr), _c(L.idx) + one, _c(L.mval)],
        )
    )
    # boundary records: initial memory consumed (read), final produced (write)
    specs.append(
        LookupSpec(
            TBL_MEMORY, E.Literal(0) - _c(L.isel), [_c(L.iaddr), E.Literal(0), _c(L.ival)]
        )
    )
    specs.append(
        LookupSpec(TBL_MEMORY, _c(L.fsel), [_c(L.faddr), _c(L.ftime), _c(L.fval)])
    )

    tables = [byte_table(), bitwise_table(TBL_BITWISE, L.bw_bits), pow2_table(),
              rom_table(f, program)]
    return MultiLogup(f, specs, tables, n, L.ncols)


def constraints(
    f: FieldParams,
    logup: MultiLogup,
    k_steps: int,
    regs0: list[int] | None = None,
    final_state: dict | None = None,
    omega: int | None = None,
    L: Layout | None = None,
) -> list[E.Expr]:
    """Selector-gated MIPS semantics + lookup constraints + boundary
    pinning at rows 0 and k_steps (the public statement). `omega` is
    the d1 generator (needed to exempt the wraparound row from the
    contiguity constraint)."""
    L = L or LAYOUT
    n = logup.n
    p = f.p
    one = E.Literal(1)

    sel = {op: _c(L.sel[op]) for op in OPS}

    def sel_sum(ops):
        s: E.Expr = E.Literal(0)
        for op in ops:
            s = s + sel[op]
        return s

    sel_any = sel_sum(OPS)

    rsv: E.Expr = E.Literal(0)
    rtv: E.Expr = E.Literal(0)
    for r in range(32):
        rsv = rsv + _c(L.rs_oh[r]) * _c(L.regs[r])
        rtv = rtv + _c(L.rt_oh[r]) * _c(L.regs[r])

    imm = _c(L.imm)
    res = _c(L.res)
    flag = _c(L.flag)
    inv = _c(L.inv)
    idx = _c(L.idx)
    pc, npc = _c(L.pc), _c(L.npc)
    pc_n, npc_n = _c(L.pc, E.NEXT), _c(L.npc, E.NEXT)
    hi, lo = _c(L.hi), _c(L.lo)
    hi_n, lo_n = _c(L.hi, E.NEXT), _c(L.lo, E.NEXT)
    two32 = E.Literal(TWO32 % p)
    two31 = E.Literal(1 << 31)

    def bytes_sum(group):
        s: E.Expr = E.Literal(0)
        for k, ci in enumerate(group):
            s = s + E.Literal(1 << (8 * k)) * _c(ci)
        return s

    def nib_sum(group):
        s: E.Expr = E.Literal(0)
        for k, ci in enumerate(group):
            s = s + E.Literal(1 << (L.bw_bits * k)) * _c(ci)
        return s

    out: list[E.Expr] = []
    # selector structure
    for op in OPS:
        out.append(sel[op].boolean())
    out.append(sel_any * (sel_any - one))
    # Executing rows form a contiguous prefix (timestamp uniqueness for
    # the memory argument): once sel_any drops to 0 it stays 0 — except
    # across the cyclic wraparound row n-1, which is exempted by the
    # normalized Lagrange indicator l_{n-1}(x) = L̂_{n-1}(x)·w^{n-1}/n.
    sel_any_next: E.Expr = E.Literal(0)
    for op in OPS:
        sel_any_next = sel_any_next + _c(L.sel[op], E.NEXT)
    assert omega is not None
    ell_last = E.UnnormalizedLagrangeBasis(n - 1) * E.Literal(
        pow(omega, n - 1, p) * pow(n, -1, p) % p
    )
    out.append((one - ell_last) * sel_any_next * (one - sel_any))
    for group in (L.rd_oh, L.rs_oh, L.rt_oh):
        total: E.Expr = E.Literal(0)
        for i in group:
            out.append(_c(i).boolean())
            total = total + _c(i)
        out.append(total - sel_any)
    out.append(_c(L.regs[0]))
    # time counter chain
    out.append(sel_any * (_c(L.idx, E.NEXT) - idx - one))

    # always-on result byte decomposition (bounds every register write)
    out.append(res - bytes_sum(L.res_b))

    bitflag = sel_sum(["ADD", "ADDU", "SUB", "SUBU", "BEQ", "BNE"])
    out.append(bitflag * flag.boolean())
    # ADDI signed carry in {-1, 0, 1}
    addi = sel_sum(["ADDI", "ADDIU"])
    out.append(addi * flag * (flag - one) * (flag + one))

    writes = sel_sum(WRITING_OPS)
    for r in range(32):
        reg = _c(L.regs[r])
        reg_n = _c(L.regs[r], E.NEXT)
        wr = _c(L.rd_oh[r]) * writes if r != 0 else E.Literal(0)
        out.append(sel_any * (wr * (reg_n - res) + (one - wr) * (reg_n - reg)))

    # hi/lo registers
    mults = sel_sum(["MULT", "MULTU"])
    out.append(sel_any * (mults * (lo_n - res) + (one - mults) * (lo_n - lo)))
    out.append(sel_any * (one - mults) * (hi_n - hi))
    hi_new = bytes_sum(L.auxa_b)
    out.append(mults * (hi_n - hi_new))
    # MULTU: rs*rt = hi*2^32 + lo exactly (hi, lo byte-bounded)
    out.append(sel["MULTU"] * (rsv * rtv - res - hi_new * two32))
    # MULT: signed product; msb_h resolves uniquely (see docstring)
    msb_a, msb_b = _c(L.msb_a), _c(L.msb_b)
    a_s = rsv - msb_a * two32
    b_s = rtv - msb_b * two32
    # signed product = (hi - s*2^32)*2^32 + lo for the unique valid s;
    # expose s via flag on MULT rows (boolean)
    out.append(sel["MULT"] * flag.boolean())
    out.append(
        sel["MULT"] * (a_s * b_s - (hi_new - flag * two32) * two32 - res)
    )
    # msb ties: 2*(x - msb*2^31) must fit 32 bits
    msb_a_ops = sel_sum(["MULT", "SLT", "SLTI"])
    msb_b_ops = sel_sum(["MULT", "SLT", "SRA", "SRAV"])
    out.append(msb_a * (msb_a - one))
    out.append(msb_b * (msb_b - one))
    out.append(
        msb_a_ops * (bytes_sum(L.auxb_b) - E.Literal(2) * (rsv - msb_a * two31))
    )
    out.append(
        msb_b_ops * (bytes_sum(L.auxc_b) - E.Literal(2) * (rtv - msb_b * two31))
    )

    # ALU
    out.append(sel_sum(["ADD", "ADDU"]) * (rsv + rtv - flag * two32 - res))
    out.append(sel_sum(["SUB", "SUBU"]) * (rsv - rtv + flag * two32 - res))
    out.append(addi * (rsv + imm - flag * two32 - res))
    out.append(sel["LUI"] * (imm * E.Literal(1 << 16) - res))
    out.append(sel_sum(COMPARES) * res.boolean())
    # comparisons: d = auxa bytes proves the claimed ordering
    d = bytes_sum(L.auxa_b)
    out.append(sel["SLTU"] * (d - (rsv - rtv + res * two32)))
    out.append(
        sel["SLT"]
        * (d - (rsv - rtv + E.Literal(2) * two31 * (msb_b - msb_a) + res * two32))
    )
    imm32 = _c(L.imm32)
    ineg = _c(L.ineg)
    out.append(ineg * (ineg - one))
    slti_ops = sel_sum(["SLTI", "SLTIU"])
    # imm32 = imm + ineg*2^32 (field identity; byte check pins the branch)
    out.append(slti_ops * (imm32 - imm - ineg * two32))
    out.append(slti_ops * (bytes_sum(L.auxd_b) - imm32))
    out.append(sel["SLTIU"] * (d - (rsv - imm32 + res * two32)))
    # SLTI: sign bit of imm32 is ineg by construction
    out.append(
        sel["SLTI"]
        * (d - (rsv - imm32 + E.Literal(2) * two31 * (ineg - msb_a) + res * two32))
    )
    out.append(sel["MFLO"] * (res - lo))
    out.append(sel["MFHI"] * (res - hi))
    out.append(sel["JAL"] * (res - npc - E.Literal(4)))

    # shifts: POW2 lookup pins (sa, pw, pw2b); flag < 2^sa via
    # flag < 2^32 (auxa) and flag*pw2b < 2^32 (auxb)
    pw, pw2b, sa_c, shq = _c(L.pw), _c(L.pw2b), _c(L.sa), _c(L.shq)
    sh_all = sel_sum(SHIFTS)
    out.append(sh_all * (bytes_sum(L.auxa_b) - flag))
    out.append(sh_all * (bytes_sum(L.auxb_b) - flag * pw2b))
    const_sh = sel_sum(CONST_SHIFTS)
    out.append(const_sh * (sa_c - imm))
    # variable shifts: sa = rsv mod 32 via quotient shq < 2^32
    var_sh = sel_sum(VAR_SHIFTS)
    out.append(var_sh * (rsv - E.Literal(32) * shq - sa_c))
    out.append(var_sh * (bytes_sum(L.auxd_b) - shq))
    out.append(sel_sum(["SLL", "SLLV"]) * (rtv * pw - flag * two32 - res))
    out.append(sel_sum(["SRL", "SRLV"]) * (res * pw + flag - rtv))
    out.append(
        sel_sum(["SRA", "SRAV"])
        * ((res - msb_b * two32) * pw + flag - (rtv - msb_b * two32))
    )

    # branch equality flag via inverse witness
    diff = rsv - rtv
    br = sel_sum(["BEQ", "BNE"])
    out.append(br * (diff * flag))
    out.append(br * (diff * inv - (one - flag)))

    # memory semantics
    maddr, mold, mval = _c(L.maddr), _c(L.mold), _c(L.mval)
    mlast, mcarry = _c(L.mlast), _c(L.mcarry)
    sel_mem = sel_sum(MEM_OPS)
    out.append(sel_mem * mcarry * (mcarry - one) * (mcarry + one))
    out.append(sel_mem * (maddr - rsv - imm + mcarry * two32))
    out.append(sel_mem * (bytes_sum(L.auxa_b) - maddr))
    out.append(sel_mem * (bytes_sum(L.auxb_b) - (idx - mlast)))
    out.append(sel["LW"] * (mval - res))
    out.append(sel["LW"] * (mold - mval))
    out.append(sel["SW"] * (mval - rtv))

    # bitwise decomposition ties
    sel_bw = sel_sum(BITWISE)
    sel_rbw = sel_sum(R_BITWISE)
    sel_ibw = sel_sum(I_BITWISE)
    out.append(sel_bw * (nib_sum(L.an) - rsv))
    out.append(sel_rbw * (nib_sum(L.bn) - rtv) + sel_ibw * (nib_sum(L.bn) - imm))
    out.append(sel_bw * (nib_sum(L.zn) - res))

    # program counter chain (Cannon delay-slot model)
    out.append(sel_any * (pc_n - npc))
    seq = sel_sum(
        [op for op in OPS if op not in ("J", "JAL", "JR", "BEQ", "BNE")]
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

    # boundary selectors live only on padding rows
    out.append(_c(L.isel) * (_c(L.isel) - one))
    out.append(_c(L.fsel) * (_c(L.fsel) - one))
    out.append(sel_any * _c(L.isel))
    out.append(sel_any * _c(L.fsel))

    # public statement boundaries
    L0 = E.UnnormalizedLagrangeBasis(0)
    out.append(L0 * pc)
    out.append(L0 * (npc - four))
    out.append(L0 * (idx - one))
    out.append(L0 * hi)
    out.append(L0 * lo)
    regs0 = regs0 or [0] * 32
    for r in range(32):
        out.append(L0 * (_c(L.regs[r]) - E.Literal(regs0[r] % p)))
    if final_state is not None:
        Lk = E.UnnormalizedLagrangeBasis(k_steps)
        out.append(Lk * (pc - E.Literal(final_state["pc"] % p)))
        out.append(Lk * (hi - E.Literal(final_state["hi"] % p)))
        out.append(Lk * (lo - E.Literal(final_state["lo"] % p)))
        for r in range(32):
            out.append(Lk * (_c(L.regs[r]) - E.Literal(final_state["regs"][r] % p)))

    out.extend(logup.constraints())
    return out


# ---------------------------------------------------------------------------
# prove / verify
# ---------------------------------------------------------------------------


def _boundary_pin_columns(f: FieldParams, init_mem: dict, final_mem: dict,
                          last_access: dict, k_steps: int, n: int,
                          L: Layout | None = None):
    """The public boundary-record columns the verifier pins by
    recommitment: {col_index: full column}."""
    L = L or LAYOUT
    cols = {
        L.isel: [0] * n, L.iaddr: [0] * n, L.ival: [0] * n,
        L.fsel: [0] * n, L.faddr: [0] * n, L.fval: [0] * n, L.ftime: [0] * n,
    }
    for k, addr in enumerate(sorted(init_mem)):
        i = k_steps + 1 + k
        cols[L.isel][i] = 1
        cols[L.iaddr][i] = addr
        cols[L.ival][i] = init_mem[addr]
        cols[L.fsel][i] = 1
        cols[L.faddr][i] = addr
        cols[L.fval][i] = final_mem.get(addr, 0)
        cols[L.ftime][i] = last_access.get(addr, 0)
    return cols


def prove_execution(domain, srs, curve, program: list[Instr], n: int, rng,
                    regs0=None, memory=None, max_steps=None,
                    L: Layout | None = None):
    """Execute + prove. Returns (proof, statement); the statement is the
    public data (program, steps, initial and final machine state) that
    verify_execution checks the proof against."""
    from ..ops import limb
    from .pickles import prove_columns

    L = L or LAYOUT
    f = curve.scalar
    rows, state = execute(program, max_steps or (n // 2), regs0, memory)
    cols = build_columns(f, rows, state, n, L)
    logup = make_logup(f, program, n, L)
    full = logup.phase1_columns(cols)
    cons = constraints(
        f, logup, len(rows), regs0, state, domain.d1.group_gen, L
    )
    F = limb.device_field(f)
    flat = [v for colv in full for v in colv]
    dev = F.pack_mont(flat, shape=(len(full), n))
    proof = prove_columns(
        domain, srs, curve, dev, cons, rng,
        make_beta_columns=logup.make_phase2(F), with_joint_combiner=True,
    )
    statement = {
        "program": program,
        "k_steps": len(rows),
        "regs0": list(regs0 or [0] * 32),
        "init_memory": dict(state["init_memory"]),
        "bitwise_bits": L.bw_bits,
        "final": {
            "regs": list(state["regs"]), "pc": state["pc"], "hi": state["hi"],
            "lo": state["lo"], "memory": dict(state["memory"]),
            "last_access": dict(state["last_access"]),
        },
    }
    return proof, statement


def verify_execution(domain, srs, curve, proof, statement, rng) -> bool:
    """Check the proof against the PUBLIC statement: rebuild the
    constraint system (ROM table from the program, boundary rows from
    the public memory images), pin the fixed tables and boundary
    columns by recommitment, then run the column verifier."""
    from ..ops import limb
    from .pickles import verify_columns

    f = curve.scalar
    n = domain.d1.n
    L = Layout(statement.get("bitwise_bits", 4))
    logup = make_logup(f, statement["program"], n, L)
    cons = constraints(
        f, logup, statement["k_steps"], statement["regs0"], statement["final"],
        domain.d1.group_gen, L,
    )
    if not logup.verify_tables(domain, srs, proof):
        return False
    # pin the public boundary-record columns
    pin = _boundary_pin_columns(
        f,
        statement["init_memory"],
        statement["final"]["memory"],
        statement["final"]["last_access"],
        statement["k_steps"],
        n,
        L,
    )
    F = limb.device_field(f)
    for ci, colv in pin.items():
        dev = F.pack_mont(colv, shape=(1, n))
        coeffs = domain.d1.intt(dev)
        expected = srs.mask(srs.commit_coeffs_dev(coeffs, 1)[0], [1])
        if proof.commitments[ci].chunks != expected.chunks:
            return False
    return verify_columns(
        domain, srs, curve, cons, proof, rng,
        num_beta_columns=logup.num_phase2, with_joint_combiner=True,
    )
