"""Per-gate end-to-end prove+verify (kimchi/src/tests/{poseidon,ec,
varbasemul,endomul,endomul_scalar,rot,foreign_field_mul}.rs analogues,
via TestFramework::prove_and_verify, framework.rs:91-245).

Each always-on / optional gate appears in at least one REAL proof here
(round-1 gap: they only had witness-checker coverage). Marked heavy:
CPU proving is compile-bound; run with PST_HEAVY=1."""

import random

import pytest

from proof_systems_tpu.circuits.constraints import ConstraintSystem
from proof_systems_tpu.circuits.gate import CircuitGate, GateType, new_wires
from proof_systems_tpu.circuits.polynomials import witness_gen as wg
from proof_systems_tpu.curves import Pallas, Vesta
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.poly_commitment import srs as srs_mod
from proof_systems_tpu.poseidon import fp_kimchi
from proof_systems_tpu.prover import create_proof
from proof_systems_tpu.prover_index import ProverIndex
from proof_systems_tpu.utils import TestRng
from proof_systems_tpu.verifier import verify

pytestmark = pytest.mark.heavy


def prove_and_verify(cs, witness, seed, public=()):
    n = cs.domain.d1.n
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )
    index = ProverIndex(cs, Vesta, srs)
    trimmed = [col[: n - cs.zk_rows] for col in witness]
    proof = create_proof(index, trimmed, TestRng(seed))
    assert verify(index.verifier_index(), proof, list(public), TestRng(seed + 1))
    return index, proof


def make_cs(gates, public=0, size=32):
    return ConstraintSystem.create(Fp, gates, public=public, max_poly_size=size)


def test_poseidon_prove():
    gates, _ = wg.create_poseidon_gadget(Fp, 0, fp_kimchi)
    cs = make_cs(gates)
    witness = wg.new_witness(cs.domain.d1.n)
    wg.poseidon_witness(Fp, fp_kimchi, witness, 0, [1, 2, 3])
    prove_and_verify(cs, witness, 101)


def test_complete_add_prove():
    rng = random.Random(102)
    curve = Pallas
    gates = [CircuitGate(GateType.CompleteAdd, new_wires(0), [])]
    cs = make_cs(gates)
    witness = wg.new_witness(cs.domain.d1.n)
    p1 = curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
    p2 = curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
    wg.complete_add_witness_row(curve, witness, 0, p1, p2)
    prove_and_verify(cs, witness, 103)


def test_varbasemul_prove():
    rng = random.Random(104)
    curve = Pallas
    num_bits = 10
    gates = wg.create_vbmul_gates(0, num_bits // 5)
    cs = make_cs(gates)
    witness = wg.new_witness(cs.domain.d1.n)
    base = curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
    acc0 = curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
    bits = [rng.randrange(2) for _ in range(num_bits)]
    wg.varbasemul_witness(curve, witness, 0, base, bits, acc0)
    prove_and_verify(cs, witness, 105)


def test_endomul_prove():
    rng = random.Random(106)
    curve = Pallas
    endo = curve.endos[0]
    num_bits = 8
    gates = wg.create_endomul_gates(0, num_bits // 4)
    cs = make_cs(gates)
    witness = wg.new_witness(cs.domain.d1.n)
    base = curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
    acc0 = curve.double(curve.add(base, (endo * base[0] % curve.base.p, base[1])))
    bits = [rng.randrange(2) for _ in range(num_bits)]
    wg.endomul_witness(curve, witness, 0, endo, base, bits, acc0)
    prove_and_verify(cs, witness, 107)


def test_endomul_scalar_prove():
    rng = random.Random(108)
    num_bits = 32
    gates = wg.create_endomul_scalar_gates(0, num_bits // 16)
    cs = make_cs(gates)
    witness = wg.new_witness(cs.domain.d1.n)
    wg.endomul_scalar_witness(Fp, witness, 0, rng.randrange(1 << num_bits), num_bits)
    prove_and_verify(cs, witness, 109)


def test_rot64_prove():
    from proof_systems_tpu.circuits.polynomials import optional_witness as ow

    rng = random.Random(110)
    gates = ow.create_rot64_gadget(0, 17, Fp)
    cs = make_cs(gates, size=1 << 13)
    n = cs.domain.d1.n
    witness = [[0] * n for _ in range(15)]
    ow.rot64_witness(witness, 0, rng.randrange(1 << 64), 17)
    prove_and_verify(cs, witness, 111)


def test_ffmul_prove():
    from proof_systems_tpu.circuits.polynomials import optional_witness as ow

    SECP_P = (1 << 256) - (1 << 32) - 977
    rng = random.Random(112)
    gates = ow.create_ffmul_gadget(0, Fp, SECP_P)
    cs = make_cs(gates, size=1 << 13)
    n = cs.domain.d1.n
    witness = [[0] * n for _ in range(15)]
    ow.ffmul_witness(witness, 0, rng.randrange(SECP_P), rng.randrange(SECP_P), SECP_P, Fp.p)
    prove_and_verify(cs, witness, 113)


def test_nonzero_public_input_prove():
    """Public-input reconstruction path (verifier.rs:833; round-1 gap:
    every e2e used public=0). Also checks a wrong public input fails."""
    from proof_systems_tpu.circuits.builders import (
        GenericGateSpec,
        create_generic_gadget,
    )

    pub_vals = [13, 29]
    gates = [
        create_generic_gadget(Fp, r, GenericGateSpec.pub(Fp)) for r in range(2)
    ] + [
        create_generic_gadget(Fp, 2 + r, GenericGateSpec.const(Fp, 1))
        for r in range(10)
    ]
    cs = make_cs(gates, public=2)
    n = cs.domain.d1.n
    witness = [[0] * n for _ in range(15)]
    witness[0][0], witness[0][1] = pub_vals
    for r in range(2, 12):
        witness[0][r] = 1
    index, proof = prove_and_verify(cs, witness, 114, public=pub_vals)
    assert not verify(
        index.verifier_index(), proof, [pub_vals[0], (pub_vals[1] + 1) % Fp.p], TestRng(99)
    )


def test_and_prove():
    """And gadget prove+verify (kimchi/src/tests/and.rs)."""
    from proof_systems_tpu.circuits.polynomials import optional_witness as ow

    rng = random.Random(114)
    a, b = rng.randrange(1 << 64), rng.randrange(1 << 64)
    gates = ow.create_and_gadget(0, Fp, 64)
    cs = make_cs(gates, size=1 << 10)  # 4-bit xor table: 256 rows suffice
    n = cs.domain.d1.n
    witness = [[0] * n for _ in range(15)]
    got = ow.and_witness(witness, 0, a, b, 64)
    assert got == a & b
    prove_and_verify(cs, witness, 115)


def test_not_prove():
    """Not gadget prove+verify (kimchi/src/tests/not.rs)."""
    from proof_systems_tpu.circuits.polynomials import optional_witness as ow

    rng = random.Random(116)
    vals = [rng.randrange(1 << 64) for _ in range(3)]
    gates = ow.create_not_gadget(0, Fp, 3, 64)
    cs = make_cs(gates, size=1 << 10)
    n = cs.domain.d1.n
    witness = [[0] * n for _ in range(15)]
    nots = ow.not_witness(witness, 0, vals, 64)
    assert nots == [((1 << 64) - 1) ^ v for v in vals]
    prove_and_verify(cs, witness, 117)
