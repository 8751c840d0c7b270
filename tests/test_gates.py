"""Gate-level witness generation + constraint satisfaction + prove/verify.

The per-gate analogue of the reference TestFramework tests
(kimchi/src/tests/*.rs) with the host checker as fast first line."""

import random

import pytest

from proof_systems_tpu.circuits import expr as expr_mod
from proof_systems_tpu.circuits.builders import GenericGateSpec, create_generic_gadget
from proof_systems_tpu.circuits.checker import check_witness
from proof_systems_tpu.circuits.constraints import ConstraintSystem
from proof_systems_tpu.circuits.gate import COLUMNS, CircuitGate, GateType, new_wires
from proof_systems_tpu.circuits.polynomials import witness_gen as wg
from proof_systems_tpu.curves import Pallas, Vesta
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.poseidon import fp_kimchi
from proof_systems_tpu.poseidon.permutation import poseidon_block_cipher


MDS = [list(r) for r in fp_kimchi.mds]


def build_cs(gates, public=0):
    cs = ConstraintSystem.create(Fp, gates, public=public, max_poly_size=64)
    from proof_systems_tpu.curves import Pallas

    cs.endo = Pallas.endos[0]
    return cs


def pad_witness(witness, n):
    for col in witness:
        col.extend([0] * (n - len(col)))
    return witness


def test_poseidon_gadget_witness():
    f = Fp
    gates, _next = wg.create_poseidon_gadget(f, 0, fp_kimchi)
    cs = build_cs(gates)
    n = cs.domain.d1.n
    witness = wg.new_witness(n)
    state = [1, 2, 3]
    out = wg.poseidon_witness(f, fp_kimchi, witness, 0, state)
    # matches the plain permutation
    ref = [1, 2, 3]
    poseidon_block_cipher(fp_kimchi, ref)
    assert out == ref
    check_witness(cs, witness, MDS)


def test_complete_add_witness():
    rng = random.Random(1)
    curve = Pallas  # circuit over Fp verifies Pallas point ops
    gates = [CircuitGate(GateType.CompleteAdd, new_wires(0), [])]
    cs = build_cs(gates)
    n = cs.domain.d1.n
    g = curve.generator
    p1 = curve.scalar_mul(rng.randrange(1, curve.scalar.p), g)
    p2 = curve.scalar_mul(rng.randrange(1, curve.scalar.p), g)
    witness = wg.new_witness(n)
    wg.complete_add_witness_row(curve, witness, 0, p1, p2)
    check_witness(cs, witness, MDS)
    # verify the result is actually p1+p2
    want = curve.add(p1, p2)
    assert (witness[4][0], witness[5][0]) == want

    # doubling case
    witness2 = wg.new_witness(n)
    wg.complete_add_witness_row(curve, witness2, 0, p1, p1)
    check_witness(cs, witness2, MDS)
    assert (witness2[4][0], witness2[5][0]) == curve.double(p1)


def test_varbasemul_witness():
    rng = random.Random(2)
    curve = Pallas
    num_bits = 10
    gates = wg.create_vbmul_gates(0, num_bits // 5)
    cs = build_cs(gates)
    n = cs.domain.d1.n
    g = curve.generator
    base = curve.scalar_mul(rng.randrange(1, curve.scalar.p), g)
    acc0 = curve.scalar_mul(rng.randrange(1, curve.scalar.p), g)
    bits = [rng.randrange(2) for _ in range(num_bits)]
    witness = wg.new_witness(n)
    acc, n_out = wg.varbasemul_witness(curve, witness, 0, base, bits, acc0)
    check_witness(cs, witness, MDS)
    # acc should equal the shifted-scalar result: each bit step does
    # acc <- 2*acc + (2b-1)*base  (Halo-style pre-scaled double-and-add)
    want = acc0
    for b in bits:
        q = base if b else curve.neg(base)
        want = curve.add(curve.add(want, q), want)
    assert acc == want
    k = 0
    for b in bits:
        k = 2 * k + b
    assert n_out == k


def test_endomul_witness():
    rng = random.Random(3)
    curve = Pallas
    endo = curve.endos[0]
    num_bits = 8
    gates = wg.create_endomul_gates(0, num_bits // 4)
    cs = build_cs(gates)
    n = cs.domain.d1.n
    g = curve.generator
    base = curve.scalar_mul(rng.randrange(1, curve.scalar.p), g)
    acc0 = curve.double(curve.add(base, (endo * base[0] % curve.base.p, base[1])))
    bits = [rng.randrange(2) for _ in range(num_bits)]
    witness = wg.new_witness(n)
    acc, n_out = wg.endomul_witness(curve, witness, 0, endo, base, bits, acc0)
    check_witness(cs, witness, MDS)


def test_endomul_scalar_witness():
    rng = random.Random(4)
    f = Fp
    num_bits = 32
    gates = wg.create_endomul_scalar_gates(0, num_bits // 16)
    cs = build_cs(gates)
    n = cs.domain.d1.n
    scalar = rng.randrange(1 << num_bits)
    witness = wg.new_witness(n)
    a, b, n_out = wg.endomul_scalar_witness(f, witness, 0, scalar, num_bits)
    check_witness(cs, witness, MDS)
    assert n_out == scalar
    # cross-check against ScalarChallenge::to_field semantics
    from proof_systems_tpu.poseidon.sponge import ScalarChallenge

    endo = Pallas.endos[0]
    expect = ScalarChallenge(scalar).to_field_with_length(num_bits, endo, f)
    assert (a * endo + b) % f.p == expect


def test_multi_range_check_witness_and_prove():
    from proof_systems_tpu.circuits.polynomials import optional_witness as ow
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.prover import create_proof
    from proof_systems_tpu.prover_index import ProverIndex
    from proof_systems_tpu.utils import TestRng
    from proof_systems_tpu.verifier import verify

    rng = random.Random(31)
    gates = ow.create_multi_range_check(0)
    v0, v1, v2 = (rng.randrange(1 << 88) for _ in range(3))
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    n = cs.domain.d1.n
    witness = [[0] * n for _ in range(15)]
    ow.multi_range_check_witness(witness, 0, v0, v1, v2)
    check_witness(cs, witness, MDS)
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )
    index = ProverIndex(cs, Vesta, srs)
    trimmed = [col[: n - cs.zk_rows] for col in witness]
    proof = create_proof(index, trimmed, TestRng(32))
    assert verify(index.verifier_index(), proof, [], TestRng(33))


def test_xor_witness_and_prove():
    from proof_systems_tpu.circuits.polynomials import optional_witness as ow
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.prover import create_proof
    from proof_systems_tpu.prover_index import ProverIndex
    from proof_systems_tpu.utils import TestRng
    from proof_systems_tpu.verifier import verify

    rng = random.Random(34)
    gates = ow.create_xor_gadget(0, 64)
    in1 = rng.randrange(1 << 64)
    in2 = rng.randrange(1 << 64)
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    n = cs.domain.d1.n
    witness = [[0] * n for _ in range(15)]
    out = ow.xor_witness(witness, 0, in1, in2, 64)
    assert out == in1 ^ in2
    check_witness(cs, witness, MDS)
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )
    index = ProverIndex(cs, Vesta, srs)
    trimmed = [col[: n - cs.zk_rows] for col in witness]
    proof = create_proof(index, trimmed, TestRng(35))
    assert verify(index.verifier_index(), proof, [], TestRng(36))


def test_rot64_witness_checker():
    from proof_systems_tpu.circuits.polynomials import optional_witness as ow

    rng = random.Random(37)
    word = rng.randrange(1 << 64)
    rot = 17
    gates = ow.create_rot64_gadget(0, rot, Fp)
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    n = cs.domain.d1.n
    witness = [[0] * n for _ in range(15)]
    rotated = ow.rot64_witness(witness, 0, word, rot)
    assert rotated == ((word << rot) | (word >> (64 - rot))) & ((1 << 64) - 1)
    check_witness(cs, witness, MDS)


SECP_P = (1 << 256) - (1 << 32) - 977


def test_ffadd_witness_and_prove():
    from proof_systems_tpu.circuits.polynomials import optional_witness as ow
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.prover import create_proof
    from proof_systems_tpu.prover_index import ProverIndex
    from proof_systems_tpu.utils import TestRng
    from proof_systems_tpu.verifier import verify

    rng = random.Random(40)
    signs = [1, -1]
    inputs = [rng.randrange(SECP_P) for _ in range(3)]
    gates = ow.create_ffadd_gadget(0, Fp, SECP_P, signs)
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    n = cs.domain.d1.n
    witness = [[0] * n for _ in range(15)]
    res, bound = ow.ffadd_witness(witness, 0, inputs, signs, SECP_P, Fp.p)
    assert res == (inputs[0] + inputs[1] - inputs[2]) % SECP_P
    assert bound == res + (1 << 264) - SECP_P
    check_witness(cs, witness, MDS)
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )
    index = ProverIndex(cs, Vesta, srs)
    trimmed = [col[: n - cs.zk_rows] for col in witness]
    proof = create_proof(index, trimmed, TestRng(41))
    assert verify(index.verifier_index(), proof, [], TestRng(42))


def test_ffmul_witness_checker():
    from proof_systems_tpu.circuits.polynomials import optional_witness as ow

    rng = random.Random(43)
    a = rng.randrange(SECP_P)
    b = rng.randrange(SECP_P)
    gates = ow.create_ffmul_gadget(0, Fp, SECP_P)
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    n = cs.domain.d1.n
    witness = [[0] * n for _ in range(15)]
    q, r = ow.ffmul_witness(witness, 0, a, b, SECP_P, Fp.p)
    assert (a * b) % SECP_P == r and a * b == q * SECP_P + r
    check_witness(cs, witness, MDS)


def test_and_not_witness_checker():
    from proof_systems_tpu.circuits.polynomials import optional_witness as ow

    rng = random.Random(44)
    a, b = rng.randrange(1 << 64), rng.randrange(1 << 64)
    gates = ow.create_and_gadget(0, Fp, 64)
    nrow = len(gates)
    gates += ow.create_not_gadget(nrow, Fp, 3, 64)
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    n = cs.domain.d1.n
    witness = [[0] * n for _ in range(15)]
    got = ow.and_witness(witness, 0, a, b, 64)
    assert got == a & b
    vals = [rng.randrange(1 << 64) for _ in range(3)]
    nots = ow.not_witness(witness, nrow, vals, 64)
    assert nots == [((1 << 64) - 1) ^ v for v in vals]
    check_witness(cs, witness, MDS)
