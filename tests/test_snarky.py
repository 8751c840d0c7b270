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


def test_dsl_ec_scale():
    """KimchiConstraint::EcScale (constraint_system.rs:1542-1592):
    VarBaseMul chunks match the host EC double-add recurrence
    acc' = 2*acc + (2b-1)*base; witness + wiring check."""
    rng = random.Random(17)
    g = Pallas.generator
    base = Pallas.scalar_mul(rng.randrange(1, Pallas.scalar.p), g)
    acc0 = Pallas.scalar_mul(rng.randrange(1, Pallas.scalar.p), g)
    bits = [rng.randrange(2) for _ in range(10)]

    rs = Runner(Fp)
    bx, by = rs.exists(base[0]), rs.exists(base[1])
    ax, ay = rs.exists(acc0[0]), rs.exists(acc0[1])
    bvars = [rs.exists(b) for b in bits]
    x, y, n = rs.ec_scale(Pallas, (bx, by), bvars, (ax, ay))

    acc = acc0
    nval = 0
    for b in bits:
        q = base if b else (base[0], (-base[1]) % P)
        acc = Pallas.add(Pallas.double(acc), q)
        nval = 2 * nval + b
    assert (x.value(), y.value()) == acc
    assert n.value() == nval

    gates, witness = rs.finalize()
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    cs.endo = Pallas.endos[0]
    n_ = cs.domain.d1.n
    for col in witness:
        col.extend([0] * (n_ - len(col)))
    check_witness(cs, witness, MDS)


def test_dsl_ec_endoscale():
    """KimchiConstraint::EcEndoscale (constraint_system.rs:1593-1632):
    EndoMul rows match the host GLV double-add; the n accumulator binds
    the bits."""
    rng = random.Random(19)
    endo = Pallas.endos[0]
    g = Pallas.generator
    base = Pallas.scalar_mul(rng.randrange(1, Pallas.scalar.p), g)
    acc0 = Pallas.double(Pallas.add(base, (endo * base[0] % P, base[1])))
    bits = [rng.randrange(2) for _ in range(8)]

    rs = Runner(Fp)
    bx, by = rs.exists(base[0]), rs.exists(base[1])
    ax, ay = rs.exists(acc0[0]), rs.exists(acc0[1])
    bvars = [rs.exists(b) for b in bits]
    x, y, n = rs.ec_endoscale(Pallas, (bx, by), bvars, (ax, ay))

    acc = acc0
    nval = 0
    for b1, b2 in zip(bits[0::2], bits[1::2]):
        q = ((1 + b1 * (endo - 1)) * base[0] % P,
             (2 * b2 - 1) * base[1] % P)
        acc = Pallas.add(Pallas.double(acc), q)
        nval = 4 * nval + 2 * b1 + b2
    assert (x.value(), y.value()) == acc
    assert n.value() == nval

    gates, witness = rs.finalize()
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    cs.endo = endo
    n_ = cs.domain.d1.n
    for col in witness:
        col.extend([0] * (n_ - len(col)))
    check_witness(cs, witness, MDS)


def test_dsl_ec_endoscalar():
    """KimchiConstraint::EcEndoscalar (constraint_system.rs:1633-1653):
    the (a, b) outputs reproduce ScalarChallenge::to_field via
    a*endo + b, and n is pinned to the scalar."""
    from proof_systems_tpu.poseidon.sponge import ScalarChallenge

    rng = random.Random(23)
    endo = Pallas.endos[0]
    sval = rng.getrandbits(128)
    rs = Runner(Fp)
    s = rs.exists(sval)
    a, b, n = rs.ec_endoscalar(s, 128)
    want = ScalarChallenge(sval).to_field(endo, Fp)
    assert (a.value() * endo + b.value()) % P == want
    assert n.value() == sval

    gates, witness = rs.finalize()
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    cs.endo = endo
    n_ = cs.domain.d1.n
    for col in witness:
        col.extend([0] * (n_ - len(col)))
    check_witness(cs, witness, MDS)


def test_dsl_range_check():
    """KimchiConstraint::RangeCheck (constraint_system.rs:1654-1699):
    the 4-row multi-range-check block accepts 88-bit values and keeps
    its internal MSB copy wiring through the DSL."""
    import pytest

    rng = random.Random(29)
    vals = [rng.getrandbits(88) for _ in range(3)]
    rs = Runner(Fp)
    vs = [rs.exists(v) for v in vals]
    rs.range_check(*vs)
    gates, witness = rs.finalize()
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=1 << 13)
    cs.endo = Pallas.endos[0]
    n_ = cs.domain.d1.n
    for col in witness:
        col.extend([0] * (n_ - len(col)))
    check_witness(cs, witness, MDS)

    # 89-bit value must fail
    rs2 = Runner(Fp)
    vs2 = [rs2.exists(v) for v in (vals[0], vals[1], (1 << 88) + 1)]
    rs2.range_check(*vs2)
    gates2, witness2 = rs2.finalize()
    cs2 = ConstraintSystem.create(Fp, gates2, public=0, max_poly_size=1 << 13)
    cs2.endo = Pallas.endos[0]
    for col in witness2:
        col.extend([0] * (cs2.domain.d1.n - len(col)))
    with pytest.raises(ValueError):
        check_witness(cs2, witness2, MDS)


def _prove_and_verify_runner(rs, seed):
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.prover import create_proof
    from proof_systems_tpu.prover_index import ProverIndex
    from proof_systems_tpu.utils import TestRng
    from proof_systems_tpu.verifier import verify

    gates, witness = rs.finalize()
    cs = ConstraintSystem.create(Fp, gates, public=rs.public, max_poly_size=1 << 13)
    n = cs.domain.d1.n
    for col in witness:
        col.extend([0] * (n - len(col)))
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )
    index = ProverIndex(cs, Vesta, srs)
    trimmed = [col[: n - cs.zk_rows] for col in witness]
    proof = create_proof(index, trimmed, TestRng(seed))
    assert verify(index.verifier_index(), proof, rs.public_values(), TestRng(seed + 1))


import pytest


@pytest.mark.heavy
def test_dsl_ec_gadgets_prove_verify():
    """One circuit combining EcScale + EcEndoscale + EcEndoscalar +
    RangeCheck, proven and verified end-to-end."""
    rng = random.Random(31)
    endo = Pallas.endos[0]
    g = Pallas.generator
    base = Pallas.scalar_mul(rng.randrange(1, Pallas.scalar.p), g)
    acc0 = Pallas.scalar_mul(rng.randrange(1, Pallas.scalar.p), g)
    eacc0 = Pallas.double(Pallas.add(base, (endo * base[0] % P, base[1])))

    rs = Runner(Fp)
    bx, by = rs.exists(base[0]), rs.exists(base[1])
    bits = [rs.exists(rng.randrange(2)) for _ in range(5)]
    x, y, n = rs.ec_scale(Pallas, (bx, by), bits,
                          (rs.exists(acc0[0]), rs.exists(acc0[1])))
    ex, ey, en = rs.ec_endoscale(
        Pallas, (bx, by), [rs.exists(rng.randrange(2)) for _ in range(4)],
        (rs.exists(eacc0[0]), rs.exists(eacc0[1])))
    a, b, _ = rs.ec_endoscalar(rs.exists(rng.getrandbits(32)), 32)
    rs.range_check(rs.exists(rng.getrandbits(88)),
                   rs.exists(rng.getrandbits(88)),
                   rs.exists(rng.getrandbits(88)))
    _prove_and_verify_runner(rs, 90)
