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


@pytest.mark.heavy
def test_sponge_endo_fused_parity():
    """Fused transcript kernels vs the host sponge golden model:
    absorb L, R points -> 128-bit challenge -> endo expansion -> inverse
    (the per-round sequence of ipa._ipa_tail_rounds)."""
    import numpy as np

    from proof_systems_tpu.fields import Fp
    from proof_systems_tpu.poseidon.params import fq_kimchi
    from proof_systems_tpu.poseidon.sponge import FqSponge

    curve = Vesta
    params = fq_kimchi
    sponge = FqSponge(params, curve)
    sponge.absorb_fq([5, 7, 11])
    sponge.squeeze_field()  # enter "squeezed" mode, as in the IPA rounds
    state0 = list(sponge.sponge.state)

    rng = random.Random(21)
    L = curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
    R = curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)

    # host golden
    host = sponge.clone()
    host.absorb_g([L])
    host.absorb_g([R])
    _, endo_r = curve.endos
    u_host = host.challenge().to_field(endo_r, curve.scalar)

    # device (interpret mode on CPU)
    Fq = limb.device_field(params.field)
    F = limb.device_field(curve.scalar)
    nrc = params.rounds_full
    mds_flat = np.transpose(
        np.asarray(
            Fq.pack_mont(
                [v % params.field.p for row in params.mds for v in row],
                shape=(3, 3),
            )
        ),
        (1, 2, 0),
    ).reshape(-1)
    rc_flat = np.transpose(
        np.asarray(
            Fq.pack_mont(
                [v % params.field.p for row in params.round_constants[:nrc] for v in row],
                shape=(nrc, 3),
            )
        ),
        (1, 2, 0),
    ).reshape(-1)
    xs = Fq.pack_mont([L[0], R[0]], shape=(2,))
    ys = Fq.pack_mont([L[1], R[1]], shape=(2,))
    st = Fq.pack_mont(state0, shape=(3,))
    st2, chal = pf.sponge_squeeze2_fused(Fq, nrc, st, xs, ys, rc_flat, mds_flat)
    assert Fq.unpack_mont(st2) == list(host.sponge.state)
    u_dev, u_inv_dev = pf.endo_inv_fused(F, endo_r, pf.bits128(chal))
    assert F.unpack_mont(u_dev) == [u_host]
    assert F.unpack_mont(u_inv_dev) == [pow(u_host, -1, curve.scalar.p)]


def test_mont_pow_fused_parity():
    Fb = Vesta.base
    F = limb.device_field(Fb)
    rng = random.Random(31)
    xs = [rng.randrange(Fb.p) for _ in range(4)] + [0, 1]
    e = Fb.p - 2
    a = F.pack_mont(xs, shape=(len(xs),))
    got = F.unpack_mont(pf.mont_pow_fused(F, a, e))
    assert got == [pow(x, e, Fb.p) for x in xs]


@pytest.mark.heavy
def test_combine_windows_fused_parity():
    """Window recombination kernel vs host bigint Horner."""
    curve = Vesta
    dc = device_curve(curve)
    rng = random.Random(32)
    W, b, c = 3, 4, 2
    pts = [
        [
            curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
            for _ in range(b)
        ]
        for _ in range(W)
    ]
    pts[1][2] = None  # an infinity window partial
    packed = [dc.to_jacobian(dc.pack_affine(row)) for row in pts]
    import jax.numpy as jnp

    wx = jnp.stack([p.x for p in packed], axis=1)
    wy = jnp.stack([p.y for p in packed], axis=1)
    wz = jnp.stack([p.z for p in packed], axis=1)
    ox, oy, oz = pf.combine_windows_fused(dc.F, c, wx, wy, wz)
    got = dc.unpack_jacobian(JPoint(ox, oy, oz))
    want = []
    for j in range(b):
        acc = None
        for w in range(W):
            term = curve.scalar_mul(1 << (c * w), pts[w][j]) if pts[w][j] else None
            acc = curve.add(acc, term)
        want.append(acc)
    assert got == want


@pytest.mark.heavy
@pytest.mark.skipif(
    __import__("os").environ.get("PST_TPU_PARITY") != "1",
    reason="XLA CPU compile of the unrolled scan body exceeds 9 min; "
    "parity is checked on real TPU (scripts/tpu_parity.py, run each "
    "round) where mosaic compiles it in seconds",
)
def test_ec_prefix_scan_fused_parity():
    """Fused in-kernel blocked scan vs host cumulative point sums."""
    curve = Vesta
    dc = device_curve(curve)
    rng = random.Random(51)
    B, n = 2, 7
    rows = []
    for _ in range(B):
        pts = [
            curve.scalar_mul(rng.randrange(1, curve.scalar.p), curve.generator)
            for _ in range(n)
        ]
        pts[3] = None  # identity in the middle
        rows.append(pts)
    import jax.numpy as jnp

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
        assert got == want


@pytest.mark.heavy
def test_mont_prefix_scan_fused_parity():
    """Fused in-kernel blocked product scan vs host cumulative products."""
    import jax.numpy as jnp

    Fb = Vesta.base
    F = limb.device_field(Fb)
    rng = random.Random(61)
    B, n = 2, 9
    rows = [[rng.randrange(Fb.p) for _ in range(n)] for _ in range(B)]
    rows[0][2] = 1
    a = jnp.stack(
        [F.pack_mont(r, shape=(n,)) for r in rows], axis=1
    )  # (16, B, n)
    out = pf.mont_prefix_scan_fused(F, a)
    for j in range(B):
        got = F.unpack_mont(out[:, j])
        acc = 1
        want = []
        for v in rows[j]:
            acc = acc * v % Fb.p
            want.append(acc)
        assert got == want


@pytest.mark.heavy
def test_linear_scan_fused_parity():
    """s_j = x_j + c*s_{j-1} fused kernel vs host recurrence."""
    import jax.numpy as jnp

    Fb = Vesta.base
    F = limb.device_field(Fb)
    rng = random.Random(62)
    c = rng.randrange(Fb.p)
    B, n = 2, 7
    rows = [[rng.randrange(Fb.p) for _ in range(n)] for _ in range(B)]
    a = jnp.stack([F.pack_mont(r, shape=(n,)) for r in rows], axis=1)
    out = pf.linear_scan_fused(F, a, c)
    for j in range(B):
        got = F.unpack_mont(out[:, j])
        s = 0
        want = []
        for v in rows[j]:
            s = (v + c * s) % Fb.p
            want.append(s)
        assert got == want
