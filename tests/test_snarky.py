"""Snarky-style DSL: compile, witness, wiring, prove/verify."""

import random

from proof_systems_tpu.circuits.checker import check_witness
from proof_systems_tpu.circuits.constraints import ConstraintSystem
from proof_systems_tpu.circuits.snarky import Runner
from proof_systems_tpu.curves import Pallas, Vesta
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.poseidon import fp_kimchi

MDS = [list(r) for r in fp_kimchi.mds]
P = Fp.p


def build_cubic(x_val: int):
    """Public y; prove knowledge of x with x^3 + x + 5 = y."""
    rs = Runner(Fp, public=1)
    x = rs.exists(x_val)
    x3 = rs.mul(rs.square(x), x)
    y_val = (pow(x_val, 3, P) + x_val + 5) % P
    y = rs.set_public(0, y_val)
    rs.assert_eq(x3 + x + 5, y)
    return rs


def test_dsl_compile_and_check():
    rs = build_cubic(3)
    gates, witness = rs.finalize()
    cs = ConstraintSystem.create(Fp, gates, public=1, max_poly_size=1 << 13)
    cs.endo = Pallas.endos[0]
    n = cs.domain.d1.n
    for col in witness:
        col.extend([0] * (n - len(col)))
    check_witness(cs, witness, MDS, public=rs.public_values())


def test_dsl_ops():
    rs = Runner(Fp)
    a = rs.exists(10)
    b = rs.exists(4)
    q = rs.div(a, b)
    assert q.value() == 10 * pow(4, -1, P) % P
    inv = rs.inv(b)
    assert inv.value() == pow(4, -1, P)
    bit = rs.exists(1)
    rs.assert_boolean(bit)
    sel = rs.if_(bit, a, b)
    assert sel.value() == 10
    # linear ops stay free of rows: count rows before/after
    rows_before = len(rs.gates)
    _ = a + b.scale(7) - 3
    assert len(rs.gates) == rows_before
    gates, witness = rs.finalize()
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    cs.endo = Pallas.endos[0]
    n = cs.domain.d1.n
    for col in witness:
        col.extend([0] * (n - len(col)))
    check_witness(cs, witness, MDS)


def test_dsl_bad_witness_fails():
    import pytest

    rs = Runner(Fp)
    x = rs.exists(3)
    y = rs.exists(10)  # wrong: not x^2
    rs.assert_square(x, y)
    gates, witness = rs.finalize()
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    cs.endo = Pallas.endos[0]
    n = cs.domain.d1.n
    for col in witness:
        col.extend([0] * (n - len(col)))
    with pytest.raises(ValueError):
        check_witness(cs, witness, MDS)


def test_dsl_prove_verify():
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.prover import create_proof
    from proof_systems_tpu.prover_index import ProverIndex
    from proof_systems_tpu.utils import TestRng
    from proof_systems_tpu.verifier import verify

    rs = build_cubic(7)
    gates, witness = rs.finalize()
    cs = ConstraintSystem.create(Fp, gates, public=1, max_poly_size=1 << 13)
    n = cs.domain.d1.n
    for col in witness:
        col.extend([0] * (n - len(col)))
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )
    index = ProverIndex(cs, Vesta, srs)
    trimmed = [col[: n - cs.zk_rows] for col in witness]
    proof = create_proof(index, trimmed, TestRng(80))
    assert verify(index.verifier_index(), proof, rs.public_values(), TestRng(81))


def test_dsl_poseidon_gadget():
    """KimchiConstraint::Poseidon compilation (constraint_system.rs:244):
    gadget output equals the host permutation; witness checks."""
    from proof_systems_tpu.poseidon.permutation import poseidon_block_cipher_py

    rs = Runner(Fp)
    ins = [rs.exists(v) for v in (11, 22, 33)]
    outs = rs.poseidon(fp_kimchi, ins)
    want = [11, 22, 33]
    poseidon_block_cipher_py(fp_kimchi, want)
    assert [o.value() for o in outs] == want
    # also hash a lincom input (exercises the pinning row)
    outs2 = rs.poseidon(fp_kimchi, [ins[0] + 1, ins[1], ins[2].scale(2)])
    want2 = [12, 22, 66]
    poseidon_block_cipher_py(fp_kimchi, want2)
    assert [o.value() for o in outs2] == want2
    gates, witness = rs.finalize()
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    cs.endo = Pallas.endos[0]
    n = cs.domain.d1.n
    for col in witness:
        col.extend([0] * (n - len(col)))
    check_witness(cs, witness, MDS)


def test_dsl_ec_add_complete():
    """KimchiConstraint::EcAddComplete compilation: result matches the
    host curve law; witness checks (incl. copy wiring of inputs)."""
    rng = random.Random(7)
    g = Pallas.generator  # Pallas points live over Fp, the circuit field
    p1 = Pallas.scalar_mul(rng.randrange(1, Pallas.scalar.p), g)
    p2 = Pallas.scalar_mul(rng.randrange(1, Pallas.scalar.p), g)
    want = Pallas.add(p1, p2)

    rs = Runner(Fp)
    x1, y1 = rs.exists(p1[0]), rs.exists(p1[1])
    x2, y2 = rs.exists(p2[0]), rs.exists(p2[1])
    x3, y3 = rs.ec_add_complete(Pallas, (x1, y1), (x2, y2))
    assert (x3.value(), y3.value()) == want
    # chain: (p1 + p2) + p2 reuses gadget outputs as inputs (copy wiring)
    x4, y4 = rs.ec_add_complete(Pallas, (x3, y3), (x2, y2))
    assert (x4.value(), y4.value()) == Pallas.add(want, p2)
    gates, witness = rs.finalize()
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    cs.endo = Pallas.endos[0]
    n = cs.domain.d1.n
    for col in witness:
        col.extend([0] * (n - len(col)))
    check_witness(cs, witness, MDS)
