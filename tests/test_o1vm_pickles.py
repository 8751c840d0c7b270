"""o1vm pickles-style column prover: e2e over a toy cyclic trace."""

import random

from proof_systems_tpu.circuits import expr as E
from proof_systems_tpu.circuits.domains import EvaluationDomains
from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.o1vm.pickles import col, prove_columns, verify_columns
from proof_systems_tpu.ops import limb
from proof_systems_tpu.poly_commitment import srs as srs_mod
from proof_systems_tpu.utils import TestRng


def test_column_proof_roundtrip():
    rng = random.Random(50)
    n = 16
    domain = EvaluationDomains.create(Fp, n)
    omega = domain.d1.group_gen
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )

    c0 = [pow(omega, i, Fp.p) for i in range(n)]
    c1 = [rng.randrange(Fp.p) for _ in range(n)]
    c2 = [a * b % Fp.p for a, b in zip(c0, c1)]

    F = limb.device_field(Fp)
    cols = F.pack_mont(c0 + c1 + c2, shape=(3, n))

    constraints = [
        E.Cell(col(2), E.CURR) - E.Cell(col(0), E.CURR) * E.Cell(col(1), E.CURR),
        E.Cell(col(0), E.NEXT) - E.Literal(omega) * E.Cell(col(0), E.CURR),
    ]

    proof = prove_columns(domain, srs, Vesta, cols, constraints, TestRng(51))
    assert verify_columns(domain, srs, Vesta, constraints, proof, TestRng(52))

    # tampering with an evaluation must fail
    proof.zeta_evaluations[2] = (proof.zeta_evaluations[2] + 1) % Fp.p
    assert not verify_columns(domain, srs, Vesta, constraints, proof, TestRng(53))


def test_column_proof_unsatisfied_constraints():
    import pytest

    rng = random.Random(54)
    n = 16
    domain = EvaluationDomains.create(Fp, n)
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )
    F = limb.device_field(Fp)
    cols = F.pack_mont([rng.randrange(Fp.p) for _ in range(2 * n)], shape=(2, n))
    constraints = [E.Cell(col(0), E.CURR) * E.Cell(col(1), E.CURR) - E.Literal(1)]
    with pytest.raises(ValueError, match="not satisfied"):
        prove_columns(domain, srs, Vesta, cols, constraints, TestRng(55))
