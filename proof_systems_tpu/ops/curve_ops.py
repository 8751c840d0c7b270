"""Batched Pasta curve arithmetic on device (Jacobian + affine forms).

Complete (branch-free) group law over limb-vectorized field elements:
every case split of the EC addition law becomes a lane-wise select, so
the same code path is sound for prover- and verifier-side MSMs.

Formulas (a = 0 short Weierstrass, y^2 = x^3 + 5):
  - doubling: dbl-2009-l (5S + 2M)
  - addition: add-2007-bl (11M + 5S) with select fallbacks for
    inf/equal/negated operands.

Host golden model: proof_systems_tpu.curves (exact affine ints).
Reference semantics: arkworks ark-ec projective ops backing
`curves/src/pasta/curves/{pallas,vesta}.rs`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..curves import CurveParams
from . import limb
from .limb import DeviceField, device_field


def on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


class JPoint(NamedTuple):
    """Jacobian points (x : y : z), z == 0 <=> infinity. Montgomery coords."""

    x: jax.Array
    y: jax.Array
    z: jax.Array


class APoint(NamedTuple):
    """Affine points with explicit infinity mask. Montgomery coords."""

    x: jax.Array
    y: jax.Array
    inf: jax.Array  # bool, batch shape


class DeviceCurve:
    """Device context for one Pasta curve (field ctx + packing helpers)."""

    def __init__(self, curve: CurveParams):
        self.params = curve
        self.F: DeviceField = device_field(curve.base)
        self.scalar_F: DeviceField = device_field(curve.scalar)

    # -- host conversion ---------------------------------------------------

    def pack_affine(self, pts) -> APoint:
        """List of host affine points ((x, y) | None) -> APoint batch."""
        xs = [0 if p is None else p[0] for p in pts]
        ys = [0 if p is None else p[1] for p in pts]
        inf = jnp.asarray([p is None for p in pts])
        return APoint(self.F.pack_mont(xs), self.F.pack_mont(ys), inf)

    def unpack_affine(self, a: APoint):
        xs = self.F.unpack_mont(a.x)
        ys = self.F.unpack_mont(a.y)
        import numpy as np

        infs = np.asarray(jax.device_get(a.inf)).reshape(-1)
        return [None if i else (x, y) for x, y, i in zip(xs, ys, infs)]

    def unpack_jacobian(self, p: JPoint):
        return self.unpack_affine(self.to_affine(p))

    # -- conversions -------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def to_jacobian(self, a: APoint) -> JPoint:
        F = self.F
        one = F.one_mont(a.inf.shape)
        z = limb.select(a.inf, F.zeros(a.inf.shape), one)
        return JPoint(a.x, a.y, z)

    @functools.partial(jax.jit, static_argnums=0)
    def to_affine(self, p: JPoint) -> APoint:
        """Batch-normalize via one shared batch inversion of z."""
        F = self.F
        inf = limb.is_zero(F, p.z)
        flat_z = p.z.reshape(limb.NLIMBS, -1)
        if flat_z.shape[1] & (flat_z.shape[1] - 1) == 0:
            zinv = limb.batch_inverse(F, flat_z).reshape(p.z.shape)
        else:
            zinv = limb.inv(F, p.z)
        zinv2 = limb.mont_sqr(F, zinv)
        zinv3 = limb.mont_mul(F, zinv2, zinv)
        x = limb.mont_mul(F, p.x, zinv2)
        y = limb.mont_mul(F, p.y, zinv3)
        return APoint(x, y, inf)

    # -- group law ---------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def double(self, p: JPoint) -> JPoint:
        if on_tpu():
            from . import pallas_field

            return JPoint(*pallas_field.jacobian_double(self.F, p.x, p.y, p.z))
        return self.double_xla(p)

    @functools.partial(jax.jit, static_argnums=0)
    def double_xla(self, p: JPoint) -> JPoint:
        F = self.F
        a = limb.mont_sqr(F, p.x)  # A = X^2
        b = limb.mont_sqr(F, p.y)  # B = Y^2
        c = limb.mont_sqr(F, b)  # C = B^2
        xb = limb.add(F, p.x, b)
        d = limb.sub(F, limb.sub(F, limb.mont_sqr(F, xb), a), c)
        d = limb.add(F, d, d)  # D = 2((X+B)^2 - A - C)
        e = limb.add(F, limb.add(F, a, a), a)  # E = 3A
        f = limb.mont_sqr(F, e)
        x3 = limb.sub(F, f, limb.add(F, d, d))
        c8 = limb.add(F, c, c)
        c8 = limb.add(F, c8, c8)
        c8 = limb.add(F, c8, c8)
        y3 = limb.sub(F, limb.mont_mul(F, e, limb.sub(F, d, x3)), c8)
        yz = limb.mont_mul(F, p.y, p.z)
        z3 = limb.add(F, yz, yz)
        return JPoint(x3, y3, z3)

    @functools.partial(jax.jit, static_argnums=0)
    def add(self, p: JPoint, q: JPoint) -> JPoint:
        """Complete addition: handles inf, equal, and negated lanes."""
        if on_tpu():
            from . import pallas_field

            return JPoint(
                *pallas_field.jacobian_add(self.F, p.x, p.y, p.z, q.x, q.y, q.z)
            )
        return self.add_xla(p, q)

    @functools.partial(jax.jit, static_argnums=0)
    def add_xla(self, p: JPoint, q: JPoint) -> JPoint:
        F = self.F
        p_inf = limb.is_zero(F, p.z)
        q_inf = limb.is_zero(F, q.z)
        z1z1 = limb.mont_sqr(F, p.z)
        z2z2 = limb.mont_sqr(F, q.z)
        u1 = limb.mont_mul(F, p.x, z2z2)
        u2 = limb.mont_mul(F, q.x, z1z1)
        s1 = limb.mont_mul(F, p.y, limb.mont_mul(F, q.z, z2z2))
        s2 = limb.mont_mul(F, q.y, limb.mont_mul(F, p.z, z1z1))
        h = limb.sub(F, u2, u1)
        rr = limb.sub(F, s2, s1)
        r2 = limb.add(F, rr, rr)  # r = 2(S2-S1)
        h_zero = limb.is_zero(F, h)
        r_zero = limb.is_zero(F, r2)

        h2 = limb.add(F, h, h)
        i = limb.mont_sqr(F, h2)  # I = (2H)^2
        j = limb.mont_mul(F, h, i)
        v = limb.mont_mul(F, u1, i)
        x3 = limb.sub(F, limb.sub(F, limb.mont_sqr(F, r2), j), limb.add(F, v, v))
        s1j = limb.mont_mul(F, s1, j)
        y3 = limb.sub(
            F, limb.mont_mul(F, r2, limb.sub(F, v, x3)), limb.add(F, s1j, s1j)
        )
        zz = limb.mont_sqr(F, limb.add(F, p.z, q.z))
        z3 = limb.mont_mul(F, limb.sub(F, limb.sub(F, zz, z1z1), z2z2), h)

        dbl = self.double_xla(p)
        use_dbl = jnp.logical_and(h_zero, r_zero)
        to_inf = jnp.logical_and(h_zero, jnp.logical_not(r_zero))

        x = limb.select(use_dbl, dbl.x, x3)
        y = limb.select(use_dbl, dbl.y, y3)
        z = limb.select(use_dbl, dbl.z, z3)
        z = limb.select(jnp.logical_and(to_inf, jnp.logical_not(p_inf)), jnp.zeros_like(z), z)
        # infinity operands
        x = limb.select(p_inf, q.x, x)
        y = limb.select(p_inf, q.y, y)
        z = limb.select(p_inf, q.z, z)
        x = limb.select(q_inf, p.x, x)
        y = limb.select(q_inf, p.y, y)
        z = limb.select(q_inf, p.z, z)
        return JPoint(x, y, z)

    @functools.partial(jax.jit, static_argnums=0)
    def add_mixed(self, p: JPoint, q: APoint) -> JPoint:
        """p + affine q (madd-2007-bl), complete via selects."""
        F = self.F
        p_inf = limb.is_zero(F, p.z)
        z1z1 = limb.mont_sqr(F, p.z)
        u2 = limb.mont_mul(F, q.x, z1z1)
        s2 = limb.mont_mul(F, q.y, limb.mont_mul(F, p.z, z1z1))
        h = limb.sub(F, u2, p.x)
        rr = limb.sub(F, s2, p.y)
        r2 = limb.add(F, rr, rr)
        h_zero = limb.is_zero(F, h)
        r_zero = limb.is_zero(F, r2)

        h2 = limb.add(F, h, h)
        i = limb.mont_sqr(F, h2)
        j = limb.mont_mul(F, h, i)
        v = limb.mont_mul(F, p.x, i)
        x3 = limb.sub(F, limb.sub(F, limb.mont_sqr(F, r2), j), limb.add(F, v, v))
        s1j = limb.mont_mul(F, p.y, j)
        y3 = limb.sub(
            F, limb.mont_mul(F, r2, limb.sub(F, v, x3)), limb.add(F, s1j, s1j)
        )
        zh = limb.mont_mul(F, p.z, h)
        z3 = limb.add(F, zh, zh)  # Z3 = (Z1+H)^2 - Z1Z1 - H^2 = 2 Z1 H
        dbl = self.double_xla(p)
        use_dbl = jnp.logical_and(h_zero, r_zero)
        to_inf = jnp.logical_and(h_zero, jnp.logical_not(r_zero))
        x = limb.select(use_dbl, dbl.x, x3)
        y = limb.select(use_dbl, dbl.y, y3)
        z = limb.select(use_dbl, dbl.z, z3)
        z = limb.select(jnp.logical_and(to_inf, jnp.logical_not(p_inf)), jnp.zeros_like(z), z)
        # q at infinity -> p ; p at infinity -> q (z=1)
        one = self.F.one_mont(q.inf.shape)
        x = limb.select(p_inf, q.x, x)
        y = limb.select(p_inf, q.y, y)
        z = limb.select(p_inf, one, z)
        x = limb.select(q.inf, p.x, x)
        y = limb.select(q.inf, p.y, y)
        z = limb.select(q.inf, p.z, z)
        return JPoint(x, y, z)

    @functools.partial(jax.jit, static_argnums=0)
    def neg(self, p: JPoint) -> JPoint:
        return JPoint(p.x, limb.neg(self.F, p.y), p.z)

    def select(self, cond, t: JPoint, f: JPoint) -> JPoint:
        return JPoint(
            limb.select(cond, t.x, f.x),
            limb.select(cond, t.y, f.y),
            limb.select(cond, t.z, f.z),
        )

    def inf_jacobian(self, batch_shape=()) -> JPoint:
        F = self.F
        return JPoint(F.one_mont(batch_shape), F.one_mont(batch_shape), F.zeros(batch_shape))

    # -- reductions --------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def sum_points(self, p: JPoint) -> JPoint:
        """Tree-sum along the last batch axis (pads to power of two)."""
        n = p.x.shape[-1]
        m = 1
        while m < n:
            m *= 2
        if m != n:
            pad = self.inf_jacobian((*p.x.shape[1:-1], m - n))
            p = JPoint(
                jnp.concatenate([p.x, pad.x], axis=-1),
                jnp.concatenate([p.y, pad.y], axis=-1),
                jnp.concatenate([p.z, pad.z], axis=-1),
            )
        while m > 1:
            m //= 2
            p = self.add(
                JPoint(p.x[..., :m], p.y[..., :m], p.z[..., :m]),
                JPoint(p.x[..., m:], p.y[..., m:], p.z[..., m:]),
            )
        return p


_DEVICE_CURVES: dict[str, DeviceCurve] = {}


def device_curve(curve: CurveParams) -> DeviceCurve:
    if curve.name not in _DEVICE_CURVES:
        _DEVICE_CURVES[curve.name] = DeviceCurve(curve)
    return _DEVICE_CURVES[curve.name]


@functools.partial(jax.jit, static_argnums=0)
def scalar_mul_const(curve: DeviceCurve, scalar_std: jax.Array, p: JPoint) -> JPoint:
    """[k]P for ONE shared 255-bit scalar across a batch of points.

    scalar_std: (16,) canonical standard-form limbs on device (NOT
    Montgomery). MSB-first double-and-add over a fixed 256 iterations
    (uniform shape; used for IPA basis folding g_lo + [u] g_hi).
    """
    acc = curve.inf_jacobian(p.x.shape[1:])

    def body(i, acc):
        bit_idx = 255 - i
        li = bit_idx // 16
        sh = bit_idx % 16
        limb_val = jax.lax.dynamic_index_in_dim(scalar_std, li, keepdims=False)
        bit = (limb_val >> sh) & 1
        acc = curve.double(acc)
        added = curve.add(acc, p)
        return curve.select(bit == 1, added, acc)

    return jax.lax.fori_loop(0, 256, body, acc)
