"""IVC over the Pasta cycle (arrabbiata/src/{lib,interpreter,witness}.rs).

Fast profile runs a reduced verifier circuit (fewer absorbed
commitments); the heavy test runs the full 196-row circuit
(VERIFIER_CIRCUIT_SIZE, lib.rs:40) and discharges both accumulators
with column proofs (decider)."""

import pytest

from proof_systems_tpu.curves import Pallas, Vesta
from proof_systems_tpu.fields import Fp, Fq
from proof_systems_tpu.folding.ivc import (
    IVC,
    N_WITNESS,
    VERIFIER_CIRCUIT_SIZE,
    build_step_trace,
    verifier_circuit_size,
)
from proof_systems_tpu.poly_commitment import srs as srs_mod
from proof_systems_tpu.poseidon.params import fp_3_60_0_5_5
from proof_systems_tpu.poseidon.permutation import poseidon_block_cipher_py
from proof_systems_tpu.utils import TestRng


def make_srs(curve, n):
    return srs_mod.SRS(
        curve, [srs_mod.derive_g(curve, i) for i in range(n)], srs_mod.derive_h(curve)
    )


def test_verifier_circuit_size_matches_reference():
    # (PERM_ROUNDS_FULL / 5 + 1) * NUMBER_OF_COLUMNS + 1 (lib.rs:40)
    assert VERIFIER_CIRCUIT_SIZE == (60 // 5 + 1) * 15 + 1 == 196
    assert verifier_circuit_size(15) == VERIFIER_CIRCUIT_SIZE


def test_step_trace_digest_matches_host_sponge():
    """The in-circuit hash equals a host rate-2 3_60_0_5_5 sponge."""
    absorbed = [(7 * i + 1) for i in range(8)]  # 4 blocks
    cols, z_out, digest = build_step_trace(Fp, fp_3_60_0_5_5, 5, absorbed, 64)
    assert z_out == 25
    state = [0, 0, 0]
    p = Fp.p
    for b in range(4):
        state[1] = (state[1] + absorbed[2 * b]) % p
        state[2] = (state[2] + absorbed[2 * b + 1]) % p
        poseidon_block_cipher_py(fp_3_60_0_5_5, state)
    assert digest == state[0]


def test_ivc_three_steps_reduced():
    """3 alternating-curve steps with commitments; accumulators stay
    satisfied, commitments open, fixed columns pin to kappa*template."""
    sv, sp = make_srs(Vesta, 32), make_srs(Pallas, 32)
    rng = TestRng(5)
    ivc = IVC(sv, sp, n=32, rng=rng, n_absorbs=2)
    z = ivc.run(3, steps=3)
    assert z == pow(3, 8, Fq.p)  # z squared per step; last step over Fq
    for side in ivc.sides:
        assert side.acc is not None
        assert side.env.is_satisfied(side.acc)
        assert side.scheme.check_commitments(side.acc)
        assert ivc.check_fixed_pinning(side)
    # soundness negative: corrupt one accumulated witness cell
    side = ivc.sides[0]
    side.acc.columns[0][0] = (side.acc.columns[0][0] + 1) % side.field.p
    assert not side.env.is_satisfied(side.acc)


@pytest.mark.heavy
def test_ivc_full_circuit_decider():
    """Full 196-row verifier circuit, 2 steps, then the decider: column
    proof per side (arrabbiata decider/) must verify."""
    from proof_systems_tpu.circuits.domains import EvaluationDomains

    sv, sp = make_srs(Vesta, 256), make_srs(Pallas, 256)
    rng = TestRng(9)
    ivc = IVC(sv, sp, n=256, rng=rng)
    ivc.run(2, steps=2)
    domains = {
        Fp: EvaluationDomains.create(Fp, 256),
        Fq: EvaluationDomains.create(Fq, 256),
    }
    assert ivc.decide(domains, TestRng(10))
