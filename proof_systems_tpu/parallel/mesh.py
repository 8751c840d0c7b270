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
