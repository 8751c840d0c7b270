#!/usr/bin/env python
"""Amortized batch verification (kimchi/benches/amortization.rs:4-20):
verify 1, 2, 4, ... 2^m copies of one proof in a single batch_verify
(ONE combined IPA MSM) and report the per-proof amortized time.

Run: python scripts/bench_amortization.py [k] [max_log_proofs]
Prints one JSON line per batch size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache_tpu")


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    max_log = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from proof_systems_tpu.circuits.builders import bench_circuit, bench_witness
    from proof_systems_tpu.circuits.constraints import ConstraintSystem
    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.fields import Fp
    from proof_systems_tpu.poly_commitment.srs import SRS
    from proof_systems_tpu.prover import create_proof
    from proof_systems_tpu.prover_index import ProverIndex
    from proof_systems_tpu.utils import SystemRng
    from proof_systems_tpu.verifier import batch_verify

    n = 1 << k
    srs = SRS.create(Vesta, n)
    cs = ConstraintSystem.create(Fp, bench_circuit(Fp, n - 10), public=0, max_poly_size=n)
    index = ProverIndex(cs, Vesta, srs)
    vk = index.verifier_index()
    witness = bench_witness(n - 10)
    rng = SystemRng()
    proof = create_proof(index, witness, rng)
    print(f"[amort] setup + proof done (2^{k})", file=sys.stderr, flush=True)

    for lg in range(max_log + 1):
        count = 1 << lg
        batch = [(vk, proof, [])] * count
        assert batch_verify(batch, rng)  # warmup (compile)
        t0 = time.time()
        assert batch_verify(batch, rng)
        dt = time.time() - t0
        print(json.dumps({
            "metric": f"batch_verify_2^{k}",
            "proofs": count,
            "total_s": round(dt, 4),
            "amortized_s_per_proof": round(dt / count, 5),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
