"""Device curve ops + MSM parity vs host exact arithmetic."""

import random

import jax.numpy as jnp
import pytest

from proof_systems_tpu.curves import Pallas, Vesta
from proof_systems_tpu.ops import limb, msm
from proof_systems_tpu.ops.curve_ops import device_curve


def rand_points(curve, n, rng, with_inf=True):
    pts = []
    g = curve.generator
    for _ in range(n):
        k = rng.randrange(1, curve.scalar.p)
        pts.append(curve.scalar_mul(k, g))
    if with_inf and n >= 3:
        pts[1] = None
    return pts


@pytest.mark.parametrize("curve", [Pallas, Vesta], ids=lambda c: c.name)
def test_add_double_mixed(curve):
    rng = random.Random(20)
    n = 16
    ps = rand_points(curve, n, rng)
    qs = rand_points(curve, n, rng)
    # exercise special cases: equal, negated, inf+inf
    qs[0] = ps[0]
    qs[2] = curve.neg(ps[2])
    ps[3] = None
    qs[3] = None
    dc = device_curve(curve)
    P = dc.to_jacobian(dc.pack_affine(ps))
    Qa = dc.pack_affine(qs)
    Q = dc.to_jacobian(Qa)

    got = dc.unpack_jacobian(dc.add(P, Q))
    assert got == [curve.add(p, q) for p, q in zip(ps, qs)]

    got = dc.unpack_jacobian(dc.double(P))
    assert got == [curve.double(p) for p in ps]

    got = dc.unpack_jacobian(dc.add_mixed(P, Qa))
    assert got == [curve.add(p, q) for p, q in zip(ps, qs)]


@pytest.mark.parametrize("curve", [Vesta], ids=lambda c: c.name)
def test_sum_points(curve):
    rng = random.Random(21)
    n = 3  # non-power-of-two exercises padding (small: XLA compile cost)
    ps = rand_points(curve, n, rng)
    dc = device_curve(curve)
    P = dc.to_jacobian(dc.pack_affine(ps))
    got = dc.unpack_jacobian(dc.sum_points(P))
    want = None
    for p in ps:
        want = curve.add(want, p)
    assert got == [want]


@pytest.mark.parametrize("curve", [Vesta], ids=lambda c: c.name)
def test_msm_small(curve):
    rng = random.Random(22)
    n, b = 16, 3
    pts = rand_points(curve, n, rng)
    dc = device_curve(curve)
    P = dc.pack_affine(pts)
    scalars = [[rng.randrange(curve.scalar.p) for _ in range(n)] for _ in range(b)]
    scalars[0][5] = 0
    got = msm.msm_host_scalars(curve, scalars, P)
    want = [curve.msm(row, pts) for row in scalars]
    assert got == want
