"""Proof wire-format roundtrip (kimchi/src/tests/serde.rs equivalent)."""

from proof_systems_tpu.circuits.builders import bench_witness
from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.prover import create_proof
from proof_systems_tpu.serialization import deserialize_proof, serialize_proof
from proof_systems_tpu.utils import TestRng

from test_prove_verify import make_index


def test_proof_roundtrip():
    index = make_index(22, 32)
    proof = create_proof(index, bench_witness(22), TestRng(5))
    raw = serialize_proof(Vesta, proof)
    back = deserialize_proof(Vesta, raw)
    assert back == proof
    # byte-stability
    assert serialize_proof(Vesta, back) == raw


def test_point_encoding_edge_cases():
    from proof_systems_tpu.serialization import point_bytes, point_from_bytes

    assert point_from_bytes(Vesta, point_bytes(Vesta, None)) is None
    g = Vesta.generator
    for k in (1, 2, 12345):
        pt = Vesta.scalar_mul(k, g)
        assert point_from_bytes(Vesta, point_bytes(Vesta, pt)) == pt


def test_visu_and_exporter():
    """kimchi-visu + test-vector exporter smoke coverage."""
    from proof_systems_tpu.circuits.builders import bench_circuit, bench_witness
    from proof_systems_tpu.circuits.constraints import ConstraintSystem
    from proof_systems_tpu.fields import Fp
    from proof_systems_tpu.utils.visu import visualize, witness_text

    gates = bench_circuit(Fp, 8)
    cs = ConstraintSystem.create(Fp, gates, public=0, max_poly_size=64)
    w = bench_witness(8)
    n = cs.domain.d1.n
    for col in w:
        col.extend([0] * (n - len(col)))
    page = visualize(cs, w)
    assert "<table>" in page and "Generic" in page
    txt = witness_text(cs, w)
    assert "Generic" in txt

    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/export_test_vectors.py", "hex", "fp_kimchi"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0
    import json

    doc = json.loads(r.stdout)
    assert doc["name"] == "fp_kimchi" and len(doc["test_vectors"]) > 5
