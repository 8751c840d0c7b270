"""Row-sharded distributed NTT over a device mesh (four-step algorithm).

TPU-native replacement for arkworks' rayon-parallel radix-2 FFT (the
`parallel` feature of ark-poly used throughout the reference, e.g. the
iFFT/FFT hot spots in `kimchi/src/prover.rs:352-369` and the domain
setup in `kimchi/src/circuits/constraints.rs`). Instead of splitting
butterfly loops over threads, the transform is factored as
n = n1 * n2 (Bailey / four-step):

    x[j1*n2 + j2] = A[j1, j2]
    B[k1, j2] = NTT_n1(A[:, j2])              # local, j2 sharded
    C[k1, j2] = B[k1, j2] * w^(j2*k1)          # local twiddle
    (reshard: all_to_all  j2-sharded -> k1-sharded over ICI)
    D[k1, k2] = NTT_n2(C[k1, :])              # local, k1 sharded
    X[k2*n1 + k1] = D[k1, k2]                  # natural order

One all_to_all per transform is the only communication — the classic
distributed-FFT data motion, mapped onto `jax.lax.all_to_all` inside a
`shard_map` so XLA schedules the exchange over ICI. The local
transforms reuse the O(1)-graph constant-geometry plans of ops/ntt.py,
so compile cost is two small fori_loop bodies + one elementwise
multiply regardless of n.

Parity: tests/test_mesh.py checks dist_ntt == ops.ntt single-device
output on the 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..fields import FieldParams
from ..ops import limb, ntt
from ..ops.limb import NLIMBS


class DistNttPlan:
    """Four-step NTT plan for one (field, log_n, mesh axis size).

    The outer factor n1 equals the mesh axis size so the reshard is a
    single tiled all_to_all; n2 = n / n1 is the local transform size.
    Data layout on device: (16, n1, n2) limb-major, input sharded on the
    j2 (last) axis, output sharded on the k1 (middle) axis.
    """

    def __init__(self, field: FieldParams, log_n: int, mesh: Mesh, axis: str = "data"):
        ndev = mesh.shape[axis]
        assert ndev & (ndev - 1) == 0, "mesh axis must be a power of two"
        self.field = field
        self.log_n = log_n
        self.n = 1 << log_n
        self.mesh = mesh
        self.axis = axis
        self.n1 = ndev
        self.n2 = self.n // self.n1
        assert self.n2 >= 1 and self.n2 * self.n1 == self.n
        self.F = limb.device_field(field)
        log_n1 = self.n1.bit_length() - 1
        log_n2 = log_n - log_n1
        self.plan1 = ntt.ntt_plan(field, log_n1)
        self.plan2 = ntt.ntt_plan(field, log_n2)
        # full twiddle table T[:, k1, j2] = w^(j2*k1), Montgomery form
        w = field.root_of_unity(log_n)
        tw = [
            field.pow(w, (j2 * k1) % self.n)
            for k1 in range(self.n1)
            for j2 in range(self.n2)
        ]
        self.twiddle = self.F.pack_mont(tw, shape=(self.n1, self.n2))
        self._sharded = self._build(inverse=False)
        # inverse: same factorization with w^-1 twiddles + final 1/n scale
        winv = field.inv(w)
        twi = [
            field.pow(winv, (j2 * k1) % self.n)
            for k1 in range(self.n1)
            for j2 in range(self.n2)
        ]
        self.twiddle_inv = self.F.pack_mont(twi, shape=(self.n1, self.n2))
        self._sharded_inv = self._build(inverse=True)

    def _build(self, inverse: bool):
        F = self.F
        plan1, plan2 = self.plan1, self.plan2
        axis = self.axis

        def local(a, tw):
            # a: (16, n1, n2loc) local block, j2 sharded
            x = jnp.moveaxis(a, 1, 2)  # (16, n2loc, n1)
            # the two local intt scales compose to the full 1/n = 1/n1·1/n2
            b = plan1.intt(x) if inverse else plan1.ntt(x)
            twl = jnp.moveaxis(tw, 1, 2)  # (16, n2loc, n1)
            c = limb.mont_mul(F, b, twl)
            # reshard: split the k1 axis, concat the j2 axis
            c = jax.lax.all_to_all(c, axis, split_axis=2, concat_axis=1, tiled=True)
            # c: (16, n2, n1loc) -> transform along j2 per local k1
            d = jnp.moveaxis(c, 1, 2)  # (16, n1loc, n2)
            d = plan2.intt(d) if inverse else plan2.ntt(d)
            return d  # (16, n1loc, n2) = D[k1_local, k2]

        return jax.jit(
            jax.shard_map(
                local,
                mesh=self.mesh,
                in_specs=(P(None, None, axis), P(None, None, axis)),
                out_specs=P(None, axis, None),
            )
        )

    # -- public API -------------------------------------------------------

    def shard_input(self, coeffs: jax.Array) -> jax.Array:
        """(16, n) coeff array -> (16, n1, n2) device-sharded on j2."""
        a = coeffs.reshape(NLIMBS, self.n1, self.n2)
        return jax.device_put(a, NamedSharding(self.mesh, P(None, None, self.axis)))

    def ntt(self, a: jax.Array) -> jax.Array:
        """a: (16, n1, n2) sharded on last axis -> D (16, n1, n2) sharded
        on the middle (k1) axis; X[k2*n1 + k1] = D[k1, k2]."""
        return self._sharded(a, self.twiddle)

    def intt(self, a: jax.Array) -> jax.Array:
        return self._sharded_inv(a, self.twiddle_inv)

    def to_natural(self, d: jax.Array):
        """Gather a (16, n1, n2) D-result to a host (16, n) natural-order
        array: X[k2*n1 + k1] = D[k1, k2]."""
        import numpy as np

        h = np.asarray(jax.device_get(d))  # (16, n1, n2)
        return np.transpose(h, (0, 2, 1)).reshape(NLIMBS, self.n)


@functools.lru_cache(maxsize=None)
def dist_ntt_plan(field: FieldParams, log_n: int, mesh: Mesh, axis: str = "data"):
    return DistNttPlan(field, log_n, mesh, axis)
