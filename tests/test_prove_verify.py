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


def test_prove_and_verify_with_recursion_challenges():
    """prev_challenges path (kimchi/src/tests/recursion.rs analogue)."""
    import random

    from proof_systems_tpu.poly_commitment.commitment import b_poly_coefficients
    from proof_systems_tpu.proof import RecursionChallenge

    rng = random.Random(60)
    index = make_index(22, 32)
    witness = bench_witness(22)

    chals = [rng.randrange(Fp.p) for _ in range(5)]  # log2(32) challenges
    coeffs = b_poly_coefficients(Fp, chals)
    comm = index.srs.commit_coeffs_host([coeffs])[0]
    rc = RecursionChallenge(chals=chals, comm=comm)

    proof = create_proof(index, witness, TestRng(61), prev_challenges=[rc])
    assert verify(index.verifier_index(), proof, [], TestRng(62))

    proof.prev_challenges[0].chals[0] = (chals[0] + 1) % Fp.p
    assert not verify(index.verifier_index(), proof, [], TestRng(63))


def test_chunked_proving():
    """Domain 64 with SRS 32 -> 2 chunks, zk_rows grows (tests/chunked.rs)."""
    from proof_systems_tpu.circuits.builders import bench_circuit
    from proof_systems_tpu.circuits.constraints import ConstraintSystem
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.curves import Vesta

    srs_size = 32
    srs = srs_mod.SRS(
        Vesta,
        [srs_mod.derive_g(Vesta, i) for i in range(srs_size)],
        srs_mod.derive_h(Vesta),
    )
    gates = bench_circuit(Fp, 40)  # forces domain 64 = 2 chunks
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=srs_size)
    assert cs.domain.d1.n == 64 and cs.zk_rows > 3
    from proof_systems_tpu.prover_index import ProverIndex

    index = ProverIndex(cs, Vesta, srs)
    assert index.num_chunks == 2
    witness = bench_witness(40)
    proof = create_proof(index, witness, TestRng(70))
    assert len(proof.commitments.w_comm[0].chunks) == 2
    assert verify(index.verifier_index(), proof, [], TestRng(71))


def test_packed_witness_parity():
    """The pre-packed (16, 15, rows) Montgomery witness path (what
    bench.py measures) must produce byte-identical proofs to the host
    list-column path: same zk-row rng draw order, same padding."""
    from proof_systems_tpu.ops import limb
    from proof_systems_tpu.serialization import serialize_proof

    index = make_index(22, 32)
    host_witness = bench_witness(22)

    proof_list = create_proof(index, host_witness, TestRng(90))

    F = limb.device_field(Fp)
    rows = len(host_witness[0])
    packed = F.pack_mont(
        [v for col in host_witness for v in col],
        shape=(len(host_witness), rows),
    )
    proof_packed = create_proof(index, packed, TestRng(90))

    assert serialize_proof(Vesta, proof_list) == serialize_proof(
        Vesta, proof_packed
    )
    assert verify(index.verifier_index(), proof_packed, [], TestRng(91))
