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

    # -- parts kernel: reconstruct the inclusive prefix on host ------------
    for B, n in ((2, 7), (3, 300)):
        rows = []
        for _ in range(B):
            pts = [
                curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
                for _ in range(n)
            ]
            pts[1] = None
            rows.append(pts)
        packed = [dc.to_jacobian(dc.pack_affine(r)) for r in rows]
        x = jnp.stack([p.x for p in packed], axis=1)
        y = jnp.stack([p.y for p in packed], axis=1)
        z = jnp.stack([p.z for p in packed], axis=1)
        (qx, qy, qz), (ex, ey, ez), C = pf.ec_prefix_scan_parts(dc.F, x, y, z)
        for j in range(B):
            part = dc.unpack_jacobian(JPoint(qx[:, j], qy[:, j], qz[:, j]))
            excl = dc.unpack_jacobian(JPoint(ex[:, j], ey[:, j], ez[:, j]))
            acc = None
            want = []
            for ptv in rows[j]:
                acc = curve.add(acc, ptv)
                want.append(acc)
            got = [
                curve.add(excl[i // C], part[i]) for i in range(n)
            ]
            if got != want:
                print(f"PARTS MISMATCH B={B} n={n} row={j}")
                failures += 1
    print("ec_prefix_scan_parts parity:", "FAIL" if failures else "OK")

    # -- full MSM (boundary-gather bucket path) vs host Pippenger ----------
    from proof_systems_tpu.ops import limb, msm

    for b, n in ((1, 64), (3, 257)):
        scal = [[rng.randrange(curve.scalar.p) for _ in range(n)] for _ in range(b)]
        pts = [
            curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
            for _ in range(n)
        ]
        pts[2] = None
        got = msm.msm_host_scalars(curve, scal, dc.pack_affine(pts))
        want = [curve.msm(row, pts) for row in scal]
        if got != want:
            print(f"MSM MISMATCH b={b} n={n}")
            failures += 1
    print("msm boundary-gather parity:", "FAIL" if failures else "OK")

    # -- per-batch point sets: each MSM row over its own basis --------------
    b, n, c = 2, 33, 6
    scal_rows = [[rng.randrange(curve.scalar.p) for _ in range(n)] for _ in range(b)]
    pt_rows = [
        [
            curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
            for _ in range(n)
        ]
        for _ in range(b)
    ]
    pt_rows[1][4] = None
    scal_dev = jnp.asarray(
        limb.ints_to_limbs([s for row in scal_rows for s in row], shape=(b, n))
    )
    packed_rows = [dc.pack_affine(r) for r in pt_rows]
    pts_dev = type(packed_rows[0])(
        jnp.stack([p.x for p in packed_rows], axis=1),
        jnp.stack([p.y for p in packed_rows], axis=1),
        jnp.stack([p.inf for p in packed_rows], axis=0),
    )
    import functools as _ft

    @_ft.partial(jax.jit, static_argnums=(0, 3))
    def _msm_pb(curve_, s, p, c_):
        wins = msm._window_sums_body(curve_, s, p, c_)
        comb = msm._combine_windows_body(curve_, c_, wins)
        aff = curve_.to_affine(comb)
        return jnp.concatenate(
            [aff.x, aff.y, aff.inf.astype(jnp.uint32)[None]], axis=0
        )

    got = msm._decode_packed_affine(dc, _msm_pb(dc, scal_dev, pts_dev, c))
    want = [curve.msm(s, p) for s, p in zip(scal_rows, pt_rows)]
    if got != want:
        print("PER-BATCH MSM MISMATCH")
        failures += 1
    print("per-batch-points msm parity:", "FAIL" if failures else "OK")

    # -- pre-scaled per-window bases ----------------------------------------
    b2, n2, c2 = 2, 70, 7
    scal2 = [[rng.randrange(curve.scalar.p) for _ in range(n2)] for _ in range(b2)]
    pts2 = [
        curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
        for _ in range(n2)
    ]
    pts2[5] = None
    apts = dc.pack_affine(pts2)
    W2 = -(-255 // c2)
    sp = jax.jit(msm.scale_basis, static_argnums=(0, 2, 3))(dc, apts, c2, W2)
    scal2_dev = jnp.asarray(
        limb.ints_to_limbs([s for row in scal2 for s in row], shape=(b2, n2))
    )
    got = msm._decode_packed_affine(
        dc, msm._msm_affine_scaled(dc, scal2_dev, sp, c2)
    )
    want = [curve.msm(row, pts2) for row in scal2]
    if got != want:
        print("SCALED-BASIS MSM MISMATCH")
        failures += 1
    print("scaled-basis msm parity:", "FAIL" if failures else "OK")

    # -- fused Montgomery prefix-product scan --------------------------------
    from proof_systems_tpu.ops import pallas_field as pf2

    Fb = curve.base
    Fd = limb.device_field(Fb)
    for B, n3 in ((2, 9), (3, 700)):
        rows = [[rng.randrange(Fb.p) for _ in range(n3)] for _ in range(B)]
        a = jnp.stack([Fd.pack_mont(r, shape=(n3,)) for r in rows], axis=1)
        out = pf2.mont_prefix_scan_fused(Fd, a)
        for j in range(B):
            got = Fd.unpack_mont(out[:, j])
            acc, want = 1, []
            for v in rows[j]:
                acc = acc * v % Fb.p
                want.append(acc)
            if got != want:
                print(f"MONT SCAN MISMATCH B={B} n={n3} row={j}")
                failures += 1
    print("mont_prefix_scan_fused parity:", "FAIL" if failures else "OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
