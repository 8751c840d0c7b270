#!/usr/bin/env python
"""Decompose the IPA round cost on real TPU.

The k=15 trace says ipa_rounds_device = 1.76 s for 15 rounds + sg MSM
(~117 ms/round), but the raw mont_mul work per round is only ~28 ms at
the measured 470 M muls/s — this script measures each component of the
fused round loop standalone to find the overhead floor:

    python scripts/tpu_ipa_profile.py [k]

Timings use jax.device_get of a single element (axon block_until_ready
does not reliably wait; full-buffer fetches pay the tunnel).
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

import functools
import random

from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.ops import limb, msm, ntt
from proof_systems_tpu.ops import pallas_field as pf
from proof_systems_tpu.ops.curve_ops import APoint, JPoint, device_curve, scalar_mul_const


def sync(res):
    x = jax.tree_util.tree_leaves(res)[0]
    jax.device_get(x[tuple(0 for _ in x.shape)])


def timeit(name, fn, reps=10):
    sync(fn())
    for _ in range(2):
        sync(fn())
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    sync(r)
    dt = (time.time() - t0) / reps
    print(f"{name:55s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    n = 1 << k
    half = n // 2
    assert jax.default_backend() in ("tpu", "axon")
    dc = device_curve(Vesta)
    F = dc.F
    f = Vesta.scalar
    Fs = limb.device_field(f)
    rng = random.Random(11)

    print(f"== IPA round decomposition at k={k} (n={n}) ==", flush=True)

    # representative compact-round MSM shape: b=2, m = half+2 points
    m = half + 2
    c = msm.default_window_bits(m)
    W = -(-255 // c)
    print(f"round MSM: b=2, m={m}, c={c}, W={W}", flush=True)

    scal = jnp.asarray(
        limb.ints_to_limbs([rng.randrange(f.p) for _ in range(2 * m)], shape=(2, m))
    )
    base_pts = [Vesta.scalar_mul(i + 3, Vesta.generator) for i in range(256)]
    pts = dc.pack_affine(base_pts * (m // 256 + 1))
    ap = APoint(pts.x[:, :m], pts.y[:, :m], pts.inf[:m])

    # packed element-major rows + composed global indices (the fused
    # IPA round interface): table rows shared across windows here
    infbit = ap.inf.astype(ap.x.dtype)
    rows = jnp.transpose(
        jnp.concatenate(
            [msm.pack16(ap.x), msm.pack16(ap.y), infbit[None]], axis=0
        ),
        (1, 0),
    )  # (m, 17)
    ridx = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[None, None, :], (W, 2, m)
    )

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def round_msm(curve, scal, c, rows, ridx):
        wins = msm._window_sums_body(curve, scal, (rows, ridx), c)
        total = msm._combine_windows_body(curve, c, wins)
        aff = curve.to_affine(total)
        return aff.x

    timeit(
        "round MSM (window_sums+horner+affine)",
        lambda: round_msm(dc, scal, c, rows, ridx),
    )

    # --- components of _window_sums_body -------------------------------
    digits = jnp.stack([msm._digits(scal, c, w) for w in range(W)], axis=0)
    idx_bits = max(m - 1, 1).bit_length()

    @jax.jit
    def sort_only(digits):
        packed = (digits.astype(jnp.uint32) << idx_bits) | jnp.arange(
            m, dtype=jnp.uint32
        )
        return jnp.sort(packed, axis=-1)

    timeit(f"digit sort ({W}x2x{m} u32)", lambda: sort_only(digits))

    spacked = sort_only(digits)
    order = (spacked & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)

    @jax.jit
    def gather_only(rows, order):
        return rows[order]

    timeit("row gather packed (W,2,m,17)", lambda: gather_only(rows, order))

    g = gather_only(rows, order)
    gt = jnp.transpose(g, (3, 0, 1, 2))
    one = F.one_mont((W, 2, m))
    pz = limb.select(gt[16] != 0, F.zeros((W, 2, m)), one)
    gx, gy = msm.unpack16(gt[:8]), msm.unpack16(gt[8:16])

    @jax.jit
    def scan_only(x, y, z):
        (qx, qy, qz), (ex, ey, ez), C = pf.ec_prefix_scan_parts(F, x, y, z, mixed=True)
        return qz

    timeit("ec scan parts (W,2,m)", lambda: scan_only(gx, gy, pz))

    # bucket reduction at this c
    D = 1 << c
    bx = F.one_mont((W, 2, D - 1))

    @jax.jit
    def bucket_reduce(bx):
        ident = dc.inf_jacobian((W, 2, 1))
        suf = msm._ec_prefix(dc, JPoint(bx, bx, bx), D - 1, ident)
        win = msm._scan_sum(dc, suf, D - 1, ident)
        return win.x

    timeit(f"bucket suffix+sum (W,2,{D-1})", lambda: bucket_reduce(bx))

    # --- transcript kernels --------------------------------------------
    from proof_systems_tpu.verifier_index import sponge_for

    sponge = sponge_for(Vesta)
    params = sponge.sponge.params
    Fq = limb.device_field(params.field)
    import numpy as np

    state0 = Fq.pack_mont([1, 2, 3], shape=(3,))
    nrc = params.rounds_full
    mds_flat = jnp.asarray(
        np.transpose(
            np.asarray(
                Fq.pack_mont(
                    [v % params.field.p for row in params.mds for v in row], shape=(3, 3)
                )
            ),
            (1, 2, 0),
        ).reshape(-1)
    )
    rc_flat = jnp.asarray(
        np.transpose(
            np.asarray(
                Fq.pack_mont(
                    [v % params.field.p for row in params.round_constants[:nrc] for v in row],
                    shape=(nrc, 3),
                )
            ),
            (1, 2, 0),
        ).reshape(-1)
    )
    xs = Fq.pack_mont([5, 6], shape=(2,))
    ys = Fq.pack_mont([7, 8], shape=(2,))

    @functools.partial(jax.jit, static_argnums=0)
    def sponge_step(nrc, state, xs, ys):
        st, chal = pf.sponge_squeeze2_fused(Fq, nrc, state, xs, ys, rc_flat, mds_flat)
        return st

    timeit("sponge_squeeze2_fused", lambda: sponge_step(nrc, state0, xs, ys))

    chal_limbs = jnp.asarray(limb.ints_to_limbs([12345678901234567890], shape=(1,)))

    @jax.jit
    def endo_step(chal_limbs):
        u, ui = pf.endo_inv_fused(Fs, Vesta.endos[1], pf.bits128(chal_limbs))
        return u

    timeit("endo_inv_fused", lambda: endo_step(chal_limbs))

    # --- fold candidates ------------------------------------------------
    halfpts = JPoint(
        pts.x[:, :half], pts.y[:, :half], F.one_mont((half,))
    )
    u_std = jnp.asarray(limb.ints_to_limbs([rng.randrange(f.p)], shape=(1,)))[:, 0]

    @jax.jit
    def fold_256(u_std, hp_x, hp_y, hp_z):
        r = scalar_mul_const(dc, u_std, JPoint(hp_x, hp_y, hp_z))
        return r.x

    timeit(f"scalar_mul_const 256-bit ({half} pts)", lambda: fold_256(u_std, *halfpts), reps=3)

    @jax.jit
    def affine_norm(hp_x, hp_y, hp_z):
        return dc.to_affine(JPoint(hp_x, hp_y, hp_z)).x

    timeit(f"to_affine batch ({half} pts)", lambda: affine_norm(*halfpts))

    # a/b folds at full width
    a_arr = Fs.pack_mont([rng.randrange(f.p) for _ in range(256)] * (n // 256), shape=(n,))
    u_m = Fs.pack_mont([3], shape=(1,))

    @jax.jit
    def ab_fold(a_arr, u_m):
        return limb.add(Fs, a_arr, limb.mont_mul(Fs, a_arr, u_m))

    timeit(f"a/b fold mont ({n})", lambda: ab_fold(a_arr, u_m))


if __name__ == "__main__":
    main()
