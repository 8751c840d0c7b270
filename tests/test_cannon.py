"""Cannon compatibility layer tests (o1vm/src/cannon.rs,
preimage_oracle.rs, witness-mode syscall semantics).

Host-only: no XLA compiles."""

import json
import subprocess
import sys

from proof_systems_tpu.o1vm.cannon import (
    FD_PREIMAGE_READ,
    FD_PREIMAGE_WRITE,
    PAGE_SIZE,
    CannonVM,
    InMemoryPreImageOracle,
    Meta,
    PagedMemory,
    State,
    StepFrequency,
    parse_preimage_key,
)


def _word(v):
    return v & 0xFFFFFFFF


# hand-assembled MIPS words
def lui(rt, imm):
    return (0x0F << 26) | (rt << 16) | (imm & 0xFFFF)


def ori(rt, rs, imm):
    return (0x0D << 26) | (rs << 21) | (rt << 16) | (imm & 0xFFFF)


def addiu(rt, rs, imm):
    return (0x09 << 26) | (rs << 21) | (rt << 16) | (imm & 0xFFFF)


def sw(rt, rs, off):
    return (0x2B << 26) | (rs << 21) | (rt << 16) | (off & 0xFFFF)


def lb(rt, rs, off):
    return (0x20 << 26) | (rs << 21) | (rt << 16) | (off & 0xFFFF)


def syscall():
    return 0x0C


def fresh_state(program, base=0):
    st = State(memory={})
    mem = PagedMemory(st.memory)
    for i, w in enumerate(program):
        mem.write_word(base + 4 * i, w)
    st.pc, st.next_pc = base, base + 4
    return st


def test_state_json_roundtrip(tmp_path):
    st = fresh_state([lui(8, 0x1234), ori(8, 8, 0x5678)])
    st.registers[5] = 0xDEADBEEF
    st.preimage_key = bytes(range(32))
    st.heap = 0x20000000
    path = tmp_path / "state.json"
    st.save(str(path))
    obj = json.loads(path.read_text())
    assert obj["preimageKey"] == "0x" + bytes(range(32)).hex()
    assert obj["nextPC"] == 4
    back = State.load(str(path))
    assert back.registers == st.registers
    assert back.memory.keys() == st.memory.keys()
    assert all(back.memory[k] == st.memory[k] for k in st.memory)
    assert back.preimage_key == st.preimage_key
    assert len(next(iter(back.memory.values()))) == PAGE_SIZE


def test_preimage_key_parse():
    k = parse_preimage_key("0x" + "ab" * 32)
    assert k == b"\xab" * 32
    k2 = parse_preimage_key("cd" * 32)
    assert k2 == b"\xcd" * 32


def test_step_frequency():
    assert not StepFrequency.parse("never").matches(5)
    assert StepFrequency.parse("always").matches(5)
    assert StepFrequency.parse("=7").matches(7)
    assert not StepFrequency.parse("=7").matches(8)
    f = StepFrequency.parse("%3")
    assert f.matches(9) and not f.matches(10)
    r = StepFrequency.parse("4..10")
    assert r.matches(4) and r.matches(9) and not r.matches(10)
    open_r = StepFrequency.parse("4..")
    assert open_r.matches(1000) and not open_r.matches(3)


def test_meta_symbols():
    m = Meta([("bar", 0x2000, 16), ("foo", 0x1000, 32)])
    m.symbols.sort(key=lambda s: s[1])
    assert m.find_address_symbol(0x1010) == "foo"
    assert m.find_address_symbol(0x2000) == "bar"
    assert m.find_address_symbol(0x3000) is None
    assert m.find_address_symbol(0x1020) is None  # past foo's size


def test_vm_arith_mem_and_exit():
    # r8 = 0x12345678; store at 0x100; lb sign test at 0x100..; exit(7)
    prog = [
        lui(8, 0x1234),
        ori(8, 8, 0x5678),
        sw(8, 0, 0x100),
        lb(9, 0, 0x100),  # 0x12
        lb(10, 0, 0x103),  # 0x78
        addiu(2, 0, 4246),  # exit_group
        addiu(4, 0, 7),
        syscall(),
    ]
    st = fresh_state(prog)
    vm = CannonVM(st)
    vm.run(max_steps=100)
    assert st.exited and st.exit == 7
    assert st.registers[8] == 0x12345678
    assert vm.mem.read_word(0x100) == 0x12345678
    assert st.registers[9] == 0x12
    assert st.registers[10] == 0x78
    assert st.step == 8


def test_vm_lwl_lwr_big_endian():
    st = fresh_state([])
    vm = CannonVM(st)
    vm.mem.write_word(0x200, 0xAABBCCDD)
    st.registers[4] = 0x200
    st.registers[8] = 0x11223344
    # LWL r8, 2(r4): BE merge of mem bytes CC DD into the high bytes
    lwl = (0x22 << 26) | (4 << 21) | (8 << 16) | 2
    vm.mem.write_word(0, lwl)
    vm.step()
    assert st.registers[8] == 0xCCDD3344
    # LWR r8, 1(r4): bytes AA BB -> low two bytes
    st.pc, st.next_pc = 8, 12
    st.registers[8] = 0x11223344
    lwr = (0x26 << 26) | (4 << 21) | (8 << 16) | 1
    vm.mem.write_word(8, lwr)
    vm.step()
    assert st.registers[8] == 0x1122AABB


def test_preimage_read_write_protocol():
    data = b"hello preimage world"
    key = bytes([9] * 32)
    oracle = InMemoryPreImageOracle({key: data})
    st = fresh_state([])
    vm = CannonVM(st, oracle=oracle)
    # guest submits the key 4 bytes at a time over fd 6
    for i in range(0, 32, 4):
        vm.mem.write_word(0x300 + i, int.from_bytes(key[i : i + 4], "big"))
    regs = st.registers
    for i in range(0, 32, 4):
        regs[4], regs[5], regs[6] = FD_PREIMAGE_WRITE, 0x300 + i, 4
        v0, v1 = vm._sys_write(regs)
        assert (v0, v1) == (4, 0)
    assert st.preimage_key == key
    assert st.preimage_offset == 0
    # read the whole 8-byte length || data stream over fd 5
    out = bytearray()
    addr = 0x400
    while True:
        regs[4], regs[5], regs[6] = FD_PREIMAGE_READ, addr + len(out), 4
        n, err = vm._sys_read(regs)
        assert err == 0
        if n == 0:
            break
        for i in range(n):
            out.append(vm.mem.read_byte(addr + len(out)))
    assert bytes(out[:8]) == len(data).to_bytes(8, "big")
    assert bytes(out[8:]) == data


def test_hint_accumulation():
    oracle = InMemoryPreImageOracle({})
    st = fresh_state([])
    vm = CannonVM(st, oracle=oracle)
    hint = b"do-the-thing"
    msg = len(hint).to_bytes(4, "big") + hint
    for i, byte in enumerate(msg):
        vm.mem.write_byte(0x500 + i, byte)
    regs = st.registers
    # send in two partial writes; hint only fires once complete
    regs[4], regs[5], regs[6] = 4, 0x500, 5
    vm._sys_write(regs)
    assert oracle.hints == []
    regs[4], regs[5], regs[6] = 4, 0x505, len(msg) - 5
    vm._sys_write(regs)
    assert oracle.hints == [hint]
    assert st.last_hint == b""


def test_cli_run(tmp_path):
    prog = [
        addiu(8, 0, 41),
        addiu(8, 8, 1),
        addiu(2, 0, 4246),
        addiu(4, 0, 3),
        syscall(),
    ]
    st = fresh_state(prog)
    inp, outp = tmp_path / "state.json", tmp_path / "out.json"
    st.save(str(inp))
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "proof_systems_tpu.o1vm.cli",
            "cannon",
            "run",
            "--input",
            str(inp),
            "--output",
            str(outp),
        ],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert r.returncode == 0, r.stderr
    final = State.load(str(outp))
    assert final.exited and final.exit == 3
    assert final.registers[8] == 42


def test_state_from_elf_mips_be():
    from proof_systems_tpu.o1vm.cannon import CannonVM, state_from_elf
    from proof_systems_tpu.o1vm.elf import EM_MIPS, build_elf

    prog = [
        addiu(8, 0, 5),
        addiu(8, 8, 6),
        addiu(2, 0, 4246),
        addiu(4, 0, 0),
        syscall(),
    ]
    text = b"".join(w.to_bytes(4, "big") for w in prog)
    blob = build_elf(EM_MIPS, 0x1000, text, endian="big")
    st = state_from_elf(blob)
    assert st.pc == 0x1000 and st.next_pc == 0x1004
    vm = CannonVM(st)
    vm.run(max_steps=50)
    assert st.exited and st.registers[8] == 11
