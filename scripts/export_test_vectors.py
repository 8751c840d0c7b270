#!/usr/bin/env python
"""Test-vector exporter CLI (poseidon/export_test_vectors capability).

Usage:
    python scripts/export_test_vectors.py [hex|b10] [fp_kimchi|fq_kimchi|fp_legacy|fq_legacy] [out.json]

Generates deterministic Poseidon hash vectors in the reference's JSON
format ({name, test_vectors: [{input, output}]}), so downstream
implementations can cross-check.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from proof_systems_tpu.poseidon import fp_kimchi, fp_legacy, fq_kimchi, fq_legacy
from proof_systems_tpu.poseidon.sponge import ArithmeticSponge

PARAMS = {
    "fp_kimchi": fp_kimchi,
    "fq_kimchi": fq_kimchi,
    "fp_legacy": fp_legacy,
    "fq_legacy": fq_legacy,
}


def deterministic_inputs(p: int, count: int, width: int):
    """Reproducible pseudo-random field elements (blake2b counter)."""
    import hashlib

    out = []
    for i in range(count):
        row = []
        for j in range(width):
            h = hashlib.blake2b(f"pst-vector-{i}-{j}".encode(), digest_size=32).digest()
            row.append(int.from_bytes(h, "little") % p)
        out.append(row)
    return out


def hash_vector(params, inputs):
    sponge = ArithmeticSponge(params)
    for x in inputs:
        sponge.absorb(x)
    return sponge.squeeze()


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "hex"
    name = sys.argv[2] if len(sys.argv) > 2 else "fp_kimchi"
    params = PARAMS[name]
    p = params.field.p

    def enc(x: int) -> str:
        if mode == "hex":
            return x.to_bytes(32, "little").hex()
        return str(x)

    vectors = []
    for nin in range(6):
        for row in deterministic_inputs(p, 2, nin):
            vectors.append(
                {"input": [enc(v) for v in row], "output": enc(hash_vector(params, row))}
            )
    doc = {"name": name, "test_vectors": vectors}
    out = json.dumps(doc, indent=2)
    if len(sys.argv) > 3:
        Path(sys.argv[3]).write_text(out)
        print(f"wrote {len(vectors)} vectors to {sys.argv[3]}")
    else:
        print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
