"""Multi-chip sharding for the proving pipeline.

The reference's only parallelism is single-process rayon
(SURVEY.md §2 parallelism inventory); the TPU-native equivalents here
scale across a jax.sharding.Mesh:
  - column parallelism: the prover transforms ~40 independent columns
    (iNTT -> d8 NTT -> pointwise constraint evaluation); the column
    batch axis shards cleanly with zero communication,
  - reductions (inner products, MSM bucket partials) combine across the
    mesh with psum/all_gather over ICI.

Row-sharded single-NTT butterflies (all_to_all per stage) are the next
step for very large single columns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..fields import Fp
from ..ops import limb, ntt


def sharded_ntt_step(mesh: Mesh, n_devices: int, log_n: int = 6, cols_per_dev: int = 2):
    """Jit + run one column-sharded NTT/pointwise/iNTT step over the mesh.

    Columns shard over the 'data' axis; the final modular inner product
    reduces on-device then sums partials (limb-exact modular addition is
    performed after gathering the per-column results)."""
    plan = ntt.ntt_plan(Fp, log_n)
    F = limb.device_field(Fp)
    n = plan.n
    b = n_devices * cols_per_dev

    vals = F.pack_mont([(i % 97) + 1 for i in range(b * n)], shape=(b, n))
    sharding = NamedSharding(mesh, P(None, "data", None))  # (16, b, n)
    vals = jax.device_put(vals, sharding)

    @jax.jit
    def step(x):
        evals = plan.ntt(x)
        sq = limb.mont_mul(F, evals, evals)
        back = plan.intt(sq)
        # cross-column modular sum: forces a cross-device combine of the
        # sharded column axis
        total = back
        k = b
        while k > 1:
            k //= 2
            total = limb.add(F, total[:, :k], total[:, k:])
        return back, total[:, 0]

    out_sharding = (sharding, NamedSharding(mesh, P(None, None)))
    step_c = jax.jit(step, out_shardings=out_sharding)
    back, total = step_c(vals)
    jax.block_until_ready((back, total))

    # cross-check against the single-device path
    got = F.unpack_mont(total)
    want_cols = F.unpack_mont(jax.device_put(back, NamedSharding(mesh, P(None, None, None))))
    p = Fp.p
    want = [0] * n
    for c in range(b):
        for j in range(n):
            want[j] = (want[j] + want_cols[c * n + j]) % p
    assert got == want, "sharded NTT step mismatch"
    return back, total


def sharded_msm(mesh: Mesh, curve_params, scalars: jax.Array, points, c: int = 8):
    """Point-sharded Pippenger MSM over the mesh.

    The n-point axis shards over 'data': each device runs the full
    O(1)-graph window-sum pipeline (ops/msm.py) on its local points —
    zero communication — then the tiny (W, b) per-device window partials
    are all-gathered over ICI and folded with W*b Jacobian adds. Mirrors
    how the reference splits `msm_bigint` across rayon threads
    (poly-commitment/src/ipa.rs:527) but across chips.
    """
    from ..ops import msm as msm_mod
    from ..ops.curve_ops import JPoint, device_curve

    curve = device_curve(curve_params)
    ndev = mesh.devices.size

    def local(scal, px, py, pinf):
        pts = type(points)(px, py, pinf)
        wins = msm_mod._window_sums_body(curve, scal, pts, c)  # (W, b)
        stacked = jnp.stack([wins.x, wins.y, wins.z], axis=1)  # (16, 3, W, b)
        gathered = jax.lax.all_gather(stacked, "data")  # (S, 16, 3, W, b)
        return gathered

    spec_scal = P(None, None, "data")
    spec_px = P(None, "data")
    spec_inf = P("data")
    # all_gather replicates the per-device window partials, so the output
    # is genuinely replicated and out_specs=P() returns the (S, ...) array
    # once — no post-hoc slicing of a concatenated axis. check_vma=False
    # because the EC scan carries start as replicated constants (pcast
    # plumbing through the fused kernels isn't worth it; replication here
    # is guaranteed by the all_gather).
    shmapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_scal, spec_px, spec_px, spec_inf),
        out_specs=P(),
        check_vma=False,
    )
    gathered = shmapped(scalars, points.x, points.y, points.inf)

    def fold(i, acc):
        part = JPoint(
            gathered[i, :, 0], gathered[i, :, 1], gathered[i, :, 2]
        )
        return curve.add(acc, part)

    first = JPoint(gathered[0, :, 0], gathered[0, :, 1], gathered[0, :, 2])
    total = jax.lax.fori_loop(1, ndev, fold, first)
    combined = msm_mod._combine_windows_body(curve, c, total)
    aff = curve.to_affine(combined)
    return jnp.concatenate(
        [aff.x, aff.y, aff.inf.astype(jnp.uint32)[None]], axis=0
    )


def sharded_msm_check(mesh: Mesh, n_devices: int, n: int = 32, b: int = 2):
    """Run the sharded MSM on toy data and compare with the host model."""
    import random

    from ..curves import Vesta
    from ..ops import msm as msm_mod
    from ..ops.curve_ops import device_curve

    rng = random.Random(5)
    curve = device_curve(Vesta)
    pts = []
    g = Vesta.generator
    for _ in range(n):
        pts.append(Vesta.scalar_mul(rng.randrange(1, Vesta.scalar.p), g))
    P_aff = curve.pack_affine(pts)
    scal_rows = [[rng.randrange(Vesta.scalar.p) for _ in range(n)] for _ in range(b)]
    flat = [s for row in scal_rows for s in row]
    scal = jnp.asarray(limb.ints_to_limbs(flat, shape=(b, n)))

    packed = sharded_msm(mesh, Vesta, scal, P_aff, c=8)
    got = msm_mod._decode_packed_affine(curve, packed)
    want = [Vesta.msm(row, pts) for row in scal_rows]
    assert got == want, "sharded MSM mismatch"
    return got
