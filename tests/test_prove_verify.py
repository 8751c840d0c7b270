"""End-to-end kimchi prove + verify (generic circuit, minimum slice)."""

import pytest

from proof_systems_tpu.circuits.builders import bench_circuit, bench_witness
from proof_systems_tpu.circuits.constraints import ConstraintSystem
from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.poly_commitment import srs as srs_mod
from proof_systems_tpu.prover import create_proof
from proof_systems_tpu.prover_index import ProverIndex
from proof_systems_tpu.utils import TestRng
from proof_systems_tpu.verifier import verify


def make_index(num_gates: int, srs_size: int, public: int = 0) -> ProverIndex:
    f = Fp
    gates = bench_circuit(f, num_gates)
    cs = ConstraintSystem.create(f, gates, public=public, max_poly_size=srs_size)
    assert cs.domain.d1.n == srs_size
    srs = srs_mod.SRS(
        Vesta,
        [srs_mod.derive_g(Vesta, i) for i in range(srs_size)],
        srs_mod.derive_h(Vesta),
    )
    return ProverIndex(cs, Vesta, srs)


def test_prove_and_verify_generic():
    index = make_index(22, 32)
    witness = bench_witness(22)
    proof = create_proof(index, witness, TestRng(5))
    assert verify(index.verifier_index(), proof, [], TestRng(6))


def test_bad_proof_rejected():
    index = make_index(22, 32)
    witness = bench_witness(22)
    proof = create_proof(index, witness, TestRng(7))
    proof.ft_eval1 = (proof.ft_eval1 + 1) % Fp.p
    assert not verify(index.verifier_index(), proof, [], TestRng(8))
