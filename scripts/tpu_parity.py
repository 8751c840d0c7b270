#!/usr/bin/env python
"""On-TPU parity checks for pallas kernels too compile-heavy for CPU
interpret mode (ec_prefix_scan_fused). Run on real hardware:
    python scripts/tpu_parity.py
Exits nonzero on mismatch."""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache_tpu")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.ops import pallas_field as pf
from proof_systems_tpu.ops.curve_ops import JPoint, device_curve


def main() -> int:
    assert jax.default_backend() in ("tpu", "axon"), "needs real TPU"
    curve = Vesta
    dc = device_curve(curve)
    rng = random.Random(51)
    failures = 0
    for B, n in ((2, 7), (3, 300)):
        rows = []
        for _ in range(B):
            pts = [
                curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
                for _ in range(n)
            ]
            pts[3] = None  # identity mid-stream
            rows.append(pts)
        packed = [dc.to_jacobian(dc.pack_affine(r)) for r in rows]
        x = jnp.stack([p.x for p in packed], axis=1)
        y = jnp.stack([p.y for p in packed], axis=1)
        z = jnp.stack([p.z for p in packed], axis=1)
        ox, oy, oz = pf.ec_prefix_scan_fused(dc.F, x, y, z)
        for j in range(B):
            got = dc.unpack_jacobian(JPoint(ox[:, j], oy[:, j], oz[:, j]))
            acc = None
            want = []
            for ptv in rows[j]:
                acc = curve.add(acc, ptv)
                want.append(acc)
            if got != want:
                print(f"MISMATCH B={B} n={n} row={j}")
                failures += 1
    print("ec_prefix_scan_fused parity:", "FAIL" if failures else "OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
