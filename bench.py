#!/usr/bin/env python
"""Headline benchmark: kimchi proof creation, vs the reference baseline.

Reference numbers (BASELINE.md, README.md:37-55): proving time for a
2^k-gate generic circuit over Vesta — 0.6 s at 2^11, 3.3 s at 2^15,
6.3 s at 2^16; verification 0.1 s; proof sizes 4,947 B (2^15) /
5,018 B (2^16). BENCH_K selects k (default 11).

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...,
   "verify_s": ..., "proof_bytes": ...}
vs_baseline > 1 means faster than the reference. verify_s/proof_bytes
are measured when BENCH_VERIFY=1 (verify timed steady-state after its
own warmup; proof size is the rmp wire format, serialization.py).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache_tpu")

BASELINES = {11: 0.6, 15: 3.3, 16: 6.3}


def main() -> int:
    k = int(os.environ.get("BENCH_K", "11"))
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from proof_systems_tpu.utils.cache_hardening import harden

    harden()

    from proof_systems_tpu.circuits.builders import bench_circuit, bench_witness
    from proof_systems_tpu.circuits.constraints import ConstraintSystem
    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.fields import Fp
    from proof_systems_tpu.poly_commitment.srs import SRS
    from proof_systems_tpu.prover import create_proof
    from proof_systems_tpu.prover_index import ProverIndex
    from proof_systems_tpu.utils import SystemRng
    from proof_systems_tpu.verifier import verify

    n = 1 << k
    num_gates = n - 10
    t0 = time.time()
    srs = SRS.create(Vesta, n)
    cs = ConstraintSystem.create(Fp, bench_circuit(Fp, num_gates), public=0, max_poly_size=n)
    index = ProverIndex(cs, Vesta, srs)
    if os.environ.get("BENCH_VERIFY", "0") == "1":
        index.verifier_index()  # setup outside the timed region
    # pre-pack the witness into Montgomery limb form — the in-memory
    # representation the reference's prover receives (Vec<F> is already
    # Montgomery); the timed region still includes every transfer
    from proof_systems_tpu.ops import limb as limb_mod

    F = limb_mod.device_field(Fp)
    host_witness = bench_witness(num_gates)
    rows = len(host_witness[0])
    witness = F.pack_mont(
        [v for col in host_witness for v in col], shape=(len(host_witness), rows)
    )
    rng = SystemRng()
    print(f"[bench] setup: {time.time()-t0:.1f}s; warmup proof (2^{k}) ...", file=sys.stderr, flush=True)

    # warmup: one proof to trigger all compilation (steady-state runs hit
    # the persistent compile cache)
    tw = time.time()
    proof = create_proof(index, witness, rng)
    print(f"[bench] warmup proof: {time.time()-tw:.1f}s", file=sys.stderr, flush=True)
    verify_s = None
    proof_bytes = None
    if os.environ.get("BENCH_VERIFY", "0") == "1":
        # correctness cross-check is covered by tests/; opt-in here so the
        # driver-budgeted bench run measures proving, the headline metric
        tw = time.time()
        assert verify(index.verifier_index(), proof, [], rng), "benchmark proof failed to verify"
        print(f"[bench] verify warmup: {time.time()-tw:.1f}s", file=sys.stderr, flush=True)
        tw = time.time()
        assert verify(index.verifier_index(), proof, [], rng)
        verify_s = round(time.time() - tw, 4)
        print(f"[bench] verify steady: {verify_s}s", file=sys.stderr, flush=True)
        from proof_systems_tpu.serialization import serialize_proof

        proof_bytes = len(serialize_proof(Vesta, proof))
        print(f"[bench] proof size: {proof_bytes} B", file=sys.stderr, flush=True)

    reps = max(1, int(os.environ.get("BENCH_REPS", "2")))
    dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        proof = create_proof(index, witness, rng)
        dt = min(dt, time.time() - t0)

    baseline = BASELINES.get(k)
    out = {
        "metric": f"kimchi_proving_time_2^{k}",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(baseline / dt, 3) if baseline else None,
    }
    if verify_s is not None:
        out["verify_s"] = verify_s
        out["proof_bytes"] = proof_bytes
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
