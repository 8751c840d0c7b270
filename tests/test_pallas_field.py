"""Interpret-mode parity for the fused Pallas field/curve kernels.

On CPU these run under pallas interpret mode (slow, so batches are tiny);
on real TPU the same kernels compile via Mosaic and the MSM/IPA heavy
tests exercise them at scale. Host exact arithmetic is the golden model.

Reference semantics: arkworks Montgomery mul / Jacobian add-2007-bl with
complete-law fallbacks (curves/src/pasta/*, as redesigned in
ops/curve_ops.py).
"""

import random

import pytest

from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.ops import limb
from proof_systems_tpu.ops import pallas_field as pf
from proof_systems_tpu.ops.curve_ops import JPoint, device_curve

N = 8


def test_mont_mul_parity():
    Fb = Vesta.base
    F = limb.device_field(Fb)
    rng = random.Random(11)
    xs = [rng.randrange(Fb.p) for _ in range(N)] + [0, 1, Fb.p - 1]
    ys = [rng.randrange(Fb.p) for _ in range(N)] + [Fb.p - 1, 0, Fb.p - 1]
    a = F.pack_mont(xs, shape=(len(xs),))
    b = F.pack_mont(ys, shape=(len(ys),))
    got = F.unpack_mont(pf.mont_mul(F, a, b))
    assert got == [x * y % Fb.p for x, y in zip(xs, ys)]


@pytest.mark.heavy
def test_jacobian_add_complete_law():
    curve = Vesta
    F = limb.device_field(curve.base)
    dc = device_curve(curve)
    rng = random.Random(12)

    def rand_pts(n):
        return [
            curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
            for _ in range(n)
        ]

    ps, qs = rand_pts(N), rand_pts(N)
    # special cases: doubling, negation-to-infinity, P=inf, Q=inf
    qs[0] = ps[0]
    qs[1] = curve.neg(ps[1])
    ps[2] = None
    qs[3] = None
    P = dc.to_jacobian(dc.pack_affine(ps))
    Q = dc.to_jacobian(dc.pack_affine(qs))

    ox, oy, oz = pf.jacobian_add(F, P.x, P.y, P.z, Q.x, Q.y, Q.z)
    got = dc.unpack_jacobian(JPoint(ox, oy, oz))
    assert got == [curve.add(p, q) for p, q in zip(ps, qs)]


@pytest.mark.heavy
def test_jacobian_double_parity():
    curve = Vesta
    F = limb.device_field(curve.base)
    dc = device_curve(curve)
    rng = random.Random(13)
    ps = [
        curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
        for _ in range(N)
    ]
    ps[1] = None
    P = dc.to_jacobian(dc.pack_affine(ps))
    dx, dy, dz = pf.jacobian_double(F, P.x, P.y, P.z)
    got = dc.unpack_jacobian(JPoint(dx, dy, dz))
    assert got == [curve.double(p) for p in ps]
