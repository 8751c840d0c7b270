#!/usr/bin/env python
"""Piecewise timing of the MSM window-sum graph at prover shapes.

Breaks _window_sums_body into its stages (digit extraction, argsort,
bincount, basis gathers, EC scan parts, boundary reconstruction, bucket
reduction) and times each as a separately-jitted function on real TPU,
plus the fused whole. Run: python scripts/tpu_msm_profile.py [k] [b]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache_tpu")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random

from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.ops import limb, msm
from proof_systems_tpu.ops import pallas_field as pf
from proof_systems_tpu.ops.curve_ops import JPoint, device_curve


def timeit(name, fn, reps=5):
    t0 = time.time()
    r = jax.block_until_ready(fn())
    print(f"{name:46s} compile+1st {time.time()-t0:8.2f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        r = jax.block_until_ready(fn())
    dt = (time.time() - t0) / reps
    print(f"{name:46s} steady {dt*1e3:9.2f} ms", flush=True)
    return r


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << k
    assert jax.default_backend() in ("tpu", "axon")
    curve = device_curve(Vesta)
    F = curve.F
    rng = random.Random(11)
    c = msm.default_window_bits(n)
    W = -(-255 // c)
    print(f"k={k} n={n} b={b} c={c} W={W}", flush=True)

    scal = jnp.asarray(
        limb.ints_to_limbs(
            [rng.randrange(Vesta.scalar.p) for _ in range(64)] * (b * n // 64),
            shape=(b, n),
        )
    )
    # synthetic scaled basis: replicate a small set of real points
    base_pts = [Vesta.scalar_mul(i + 1, Vesta.generator) for i in range(64)]
    ap = curve.pack_affine(base_pts * (n // 64))
    one = F.one_mont((W, n))
    sx = jnp.broadcast_to(ap.x[:, None], (limb.NLIMBS, W, n))
    sy = jnp.broadcast_to(ap.y[:, None], (limb.NLIMBS, W, n))
    scaled = JPoint(sx, sy, one)
    scal = jax.device_put(scal)
    jax.block_until_ready((scal, scaled.x, scaled.y, scaled.z))

    windows, nbuckets = W, 1 << c
    shape4 = (limb.NLIMBS, windows, b, n)

    @jax.jit
    def stage_digits(s):
        digits = jnp.stack([msm._digits(s, c, w) for w in range(windows)], axis=0)
        return digits

    digits = timeit("digits (W,b,n)", lambda: stage_digits(scal))

    @jax.jit
    def stage_sort(d):
        order = jnp.argsort(d, axis=-1)
        sdig = jnp.take_along_axis(d, order, axis=-1)
        return order, sdig

    order, sdig = timeit("argsort + sdig", lambda: stage_sort(digits))

    @jax.jit
    def stage_counts(sd):
        counts = jax.vmap(lambda dd: jnp.bincount(dd, length=nbuckets))(
            sd.reshape(windows * b, n)
        ).reshape(windows, b, nbuckets)
        ends = jnp.cumsum(counts, axis=-1)
        return ends

    ends = timeit("bincount + cumsum (scatter)", lambda: stage_counts(sdig))

    @jax.jit
    def stage_counts_searchsorted(sd):
        buckets = jnp.arange(nbuckets, dtype=sd.dtype)
        ends = jax.vmap(
            lambda row: jnp.searchsorted(row, buckets, side="right")
        )(sd.reshape(windows * b, n)).reshape(windows, b, nbuckets)
        return ends

    ends2 = timeit("searchsorted ends (alt)", lambda: stage_counts_searchsorted(sdig))
    assert (jax.device_get(ends) == jax.device_get(ends2)).all()

    @jax.jit
    def stage_gather(o, sx, sy, sz):
        # points as ARGUMENTS: closure capture would embed them as
        # jaxpr constants and XLA constant-folds the 2.6 GB broadcast
        def g4(arr):
            if arr.ndim == 3:
                arr = arr[:, :, None]
            return jnp.take_along_axis(
                jnp.broadcast_to(arr, shape4), o[None], axis=-1
            )

        return g4(sx), g4(sy), g4(sz)

    jx, jy, jz = timeit(
        "basis gather x3 (16,W,b,n)",
        lambda: stage_gather(order, scaled.x, scaled.y, scaled.z),
    )

    @jax.jit
    def stage_scan(x, y, z):
        (qx, qy, qz), (ex, ey, ez), C = pf.ec_prefix_scan_parts(F, x, y, z, mixed=True)
        return qx, qy, qz, ex, ey, ez

    qx, qy, qz, ex, ey, ez = timeit("ec_prefix_scan_parts", lambda: stage_scan(jx, jy, jz))

    from proof_systems_tpu.ops import scan as scan_mod  # noqa: F401
    from proof_systems_tpu.ops.curve_ops import JPoint as JP

    nbuckets = 1 << c
    Cchunk = -(-n // 128) * 0 + (qx.shape[-1] // max(ex.shape[-1], 1)) if ex.shape[-1] else 0

    @jax.jit
    def stage_boundaries(qx, qy, qz, ex, ey, ez, sd):
        counts = jax.vmap(lambda dd: jnp.bincount(dd, length=nbuckets))(
            sd.reshape(W * b, n)
        ).reshape(W, b, nbuckets)
        ends = jnp.cumsum(counts, axis=-1)
        idx_lo = jnp.concatenate(
            [jnp.zeros((W, b, 1), ends.dtype), ends[..., :-1]], axis=-1)
        Cc = qx.shape[-1] // ex.shape[-1]

        def gather(arr, idx):
            return jnp.take_along_axis(
                arr, jnp.broadcast_to(idx[None], (limb.NLIMBS, *idx.shape)), axis=-1)

        def cum_at(t):
            j = jnp.maximum(t, 1) - 1
            l = j // Cc
            gj = (gather(qx, j), gather(qy, j), gather(qz, j))
            hl = (gather(ex, l), gather(ey, l), gather(ez, l))
            x, y, z = pf.jacobian_add(F, hl[0], hl[1], hl[2], gj[0], gj[1], gj[2])
            z = limb.select(t == 0, jnp.zeros_like(z), z)
            return JP(x, y, z)

        hi = cum_at(ends)
        lo = cum_at(idx_lo)
        buckets = curve.add(hi, curve.neg(lo))
        return buckets.x, buckets.y, buckets.z

    sdig = jnp.take_along_axis(digits, order, axis=-1)
    bkx, bky, bkz = timeit(
        "boundary reconstruction -> buckets",
        lambda: stage_boundaries(qx, qy, qz, ex, ey, ez, sdig))

    ident = curve.inf_jacobian((W, b, 1))

    @jax.jit
    def stage_bucketsum(x, y, z):
        rev = JP(x[..., 1:][..., ::-1], y[..., 1:][..., ::-1], z[..., 1:][..., ::-1])
        suf = msm._ec_prefix(curve, rev, nbuckets - 1, ident)
        win = msm._scan_sum(curve, suf, nbuckets - 1, ident)
        return win.x[..., 0], win.y[..., 0], win.z[..., 0]

    wx, wy, wz = timeit("bucket suffix scan + weighted sum",
                        lambda: stage_bucketsum(bkx, bky, bkz))

    @jax.jit
    def stage_combine(x, y, z):
        total = msm.sum_windows(curve, JP(x, y, z))
        aff = curve.to_affine(total)
        return aff.x, aff.y

    timeit("window tree sum + to_affine", lambda: stage_combine(wx, wy, wz))

    # full fused graph (the real thing)
    body = msm._msm_affine_scaled
    timeit("FULL _msm_affine_scaled", lambda: body(curve, scal, scaled, c), reps=3)


if __name__ == "__main__":
    main()
