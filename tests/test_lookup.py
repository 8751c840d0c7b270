"""Lookup argument: sorted multiset, aggregation, and e2e prove/verify
with the vector `Lookup` pattern (kimchi/src/tests/lookup.rs analogue)."""

import random

import pytest

from proof_systems_tpu.circuits.constraints import ConstraintSystem
from proof_systems_tpu.circuits.gate import CircuitGate, GateType, new_wires
from proof_systems_tpu.circuits.lookup import LookupTable
from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.poly_commitment import srs as srs_mod
from proof_systems_tpu.prover import create_proof
from proof_systems_tpu.prover_index import ProverIndex
from proof_systems_tpu.utils import TestRng
from proof_systems_tpu.verifier import verify


def lookup_circuit(num_lookup_rows: int, table_len: int):
    rng = random.Random(9)
    table = LookupTable(0, [list(range(table_len)), [i * i for i in range(table_len)]])
    gates = [CircuitGate(GateType.Lookup, new_wires(r), []) for r in range(num_lookup_rows)]
    witness = [[0] * num_lookup_rows for _ in range(15)]
    for r in range(num_lookup_rows):
        witness[0][r] = 0  # table id
        for slot in range(3):
            idx = rng.randrange(table_len)
            witness[1 + 2 * slot][r] = idx
            witness[2 + 2 * slot][r] = table.data[1][idx]
    return gates, witness, table


def test_lookup_prove_verify():
    gates, witness, table = lookup_circuit(8, 16)
    cs = ConstraintSystem.create(
        Fp, gates, public=0, max_poly_size=64, fixed_lookup_tables=[table]
    )
    assert cs.lookup_cs is not None
    srs_size = cs.domain.d1.n
    srs = srs_mod.SRS(
        Vesta,
        [srs_mod.derive_g(Vesta, i) for i in range(srs_size)],
        srs_mod.derive_h(Vesta),
    )
    index = ProverIndex(cs, Vesta, srs)
    proof = create_proof(index, witness, TestRng(11))
    assert verify(index.verifier_index(), proof, [], TestRng(12))


def test_lookup_value_not_in_table_fails():
    gates, witness, table = lookup_circuit(4, 16)
    witness[2][1] = 9999  # not a table value
    cs = ConstraintSystem.create(
        Fp, gates, public=0, max_poly_size=64, fixed_lookup_tables=[table]
    )
    srs_size = cs.domain.d1.n
    srs = srs_mod.SRS(
        Vesta,
        [srs_mod.derive_g(Vesta, i) for i in range(srs_size)],
        srs_mod.derive_h(Vesta),
    )
    index = ProverIndex(cs, Vesta, srs)
    with pytest.raises(ValueError, match="not in table"):
        create_proof(index, witness, TestRng(13))


def test_runtime_table_prove_verify():
    """Runtime tables: second column supplied at prove time
    (kimchi/src/tests/lookup.rs runtime_table tests analogue)."""
    from proof_systems_tpu.circuits.lookup import RuntimeTableCfg

    rng = random.Random(13)
    rt_len = 16
    cfg = RuntimeTableCfg(id=0, first_column=list(range(rt_len)))
    data = [rng.randrange(Fp.p) for _ in range(rt_len)]

    num_rows = 8
    gates = [CircuitGate(GateType.Lookup, new_wires(r), []) for r in range(num_rows)]
    witness = [[0] * num_rows for _ in range(15)]
    for r in range(num_rows):
        witness[0][r] = 0  # runtime table id
        for slot in range(3):
            idx = rng.randrange(rt_len)
            witness[1 + 2 * slot][r] = idx
            witness[2 + 2 * slot][r] = data[idx]

    cs = ConstraintSystem.create(
        Fp, gates, public=0, max_poly_size=64, runtime_tables=[cfg]
    )
    assert cs.lookup_cs is not None
    assert cs.lookup_cs.runtime_table_offset == 0
    srs_size = cs.domain.d1.n
    srs = srs_mod.SRS(
        Vesta,
        [srs_mod.derive_g(Vesta, i) for i in range(srs_size)],
        srs_mod.derive_h(Vesta),
    )
    index = ProverIndex(cs, Vesta, srs)
    proof = create_proof(index, witness, TestRng(14), runtime_tables=[(0, data)])
    assert proof.commitments.lookup.runtime is not None
    assert proof.evals.runtime_lookup_table is not None
    assert verify(index.verifier_index(), proof, [], TestRng(15))

    # wrong runtime data must fail the sorted-multiset build
    bad = list(data)
    bad[3] = (bad[3] + 1) % Fp.p
    witness2 = [list(c) for c in witness]
    with pytest.raises(ValueError):
        create_proof(index, witness2, TestRng(16), runtime_tables=[(0, bad)])

    # mismatched layout is rejected
    with pytest.raises(ValueError, match="inconsistent"):
        create_proof(index, witness, TestRng(17), runtime_tables=[(1, data)])
