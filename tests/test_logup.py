"""LogUp lookup argument (msm/src/logup.rs capability)."""

import random

import pytest

from proof_systems_tpu.circuits.domains import EvaluationDomains
from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.o1vm import logup
from proof_systems_tpu.poly_commitment import srs as srs_mod
from proof_systems_tpu.utils import TestRng

P = Fp.p


def test_multiplicities_and_phi():
    rng = random.Random(70)
    n = 16
    table = logup.range_table(4, n)
    lookups = [[rng.randrange(16), rng.randrange(16)] for _ in range(n)]
    m = logup.multiplicities(lookups, table, P)
    assert sum(m) == 2 * n
    beta = rng.randrange(1, P)
    phi = logup.phi_column(lookups, table, m, beta, P)
    assert phi[0] == 0 and len(phi) == n
    # identity: sum_j 1/(b+f) == sum_i m_i/(b+t_i)
    lhs = sum(pow((beta + v) % P, -1, P) for row in lookups for v in row) % P
    rhs = sum(mi * pow((beta + t) % P, -1, P) for mi, t in zip(m, table)) % P
    assert lhs == rhs


def test_phi_detects_missing_value():
    n = 16
    table = logup.range_table(4, n)
    lookups = [[i % 16] for i in range(n)]
    m = logup.multiplicities(lookups, table, P)
    m[3] += 1  # corrupt a multiplicity
    with pytest.raises(ValueError, match="does not hold"):
        logup.phi_column(lookups, table, m, 12345, P)
    with pytest.raises(ValueError, match="not in table"):
        logup.multiplicities([[77]], table, P)


def test_logup_prove_verify():
    rng = random.Random(71)
    n = 16
    domain = EvaluationDomains.create(Fp, n)
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )
    table = logup.range_table(4, n)
    lookups = [[rng.randrange(16), rng.randrange(16)] for _ in range(n)]
    inst = logup.LogupInstance(Fp, lookups, table)
    proof = inst.prove(domain, srs, Vesta, TestRng(72))
    assert inst.verify(domain, srs, Vesta, proof, TestRng(73))

    # out-of-table witness must be rejected at witness build time
    with pytest.raises(ValueError):
        logup.LogupInstance(Fp, [[99] * 2] + lookups[1:], table)
