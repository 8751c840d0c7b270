"""CPU parity of the device MSM graph's gather paths (ops/msm.py).

The row-gather refactor (u32-packed element-major rows + flat-table
fancy indexing + composed indices) is pure data movement: every path
must reproduce the host golden MSM exactly. TPU runs the same graph
with pallas scan kernels (scripts/tpu_parity.py); here the CPU XLA
fallback validates the gather/index logic itself.

The per-window scaled bases 2^{cw}·P_i are built with HOST exact
arithmetic (scale_basis's doubling chain is a TPU-only pallas graph —
on the CPU XLA path it inlines ~250 EC doubles and compiles forever).
"""

import random

import jax.numpy as jnp

from proof_systems_tpu.curves import Vesta
from proof_systems_tpu.ops import limb
from proof_systems_tpu.ops import msm as msm_mod
from proof_systems_tpu.ops.curve_ops import JPoint, device_curve


def _host_rows(rng, b, n):
    scal_rows = [[rng.randrange(Vesta.scalar.p) for _ in range(n)] for _ in range(b)]
    scal = jnp.asarray(
        limb.ints_to_limbs([s for row in scal_rows for s in row], shape=(b, n))
    )
    return scal_rows, scal


def _host_scaled(pts, c, W):
    """(16, W, n) affine-encoded JPoint of 2^{cw}·P_i, host-exact."""
    curve = device_curve(Vesta)
    F = curve.F
    n = len(pts)
    levels = []
    for w in range(W):
        k = 1 << (c * w)
        levels.append(
            [None if p is None else Vesta.scalar_mul(k, p) for p in pts]
        )
    flat = [p for row in levels for p in row]
    xs = F.pack_mont([0 if p is None else p[0] for p in flat], shape=(W, n))
    ys = F.pack_mont([0 if p is None else p[1] for p in flat], shape=(W, n))
    zs = jnp.where(
        jnp.asarray([[p is None for p in row] for row in levels]),
        F.zeros((W, n)),
        F.one_mont((W, n)),
    )
    return JPoint(xs, ys, zs)


def test_scaled_basis_msm_parity():
    """Pre-scaled per-window JPoint bases (witness/commit path)."""
    rng = random.Random(21)
    curve = device_curve(Vesta)
    n, b, c = 24, 2, 6
    W = -(-255 // c)
    pts = [
        Vesta.scalar_mul(rng.randrange(1, Vesta.scalar.p), Vesta.generator)
        for _ in range(n)
    ]
    pts[5] = None
    scaled = _host_scaled(pts, c, W)
    scal_rows, scal = _host_rows(rng, b, n)
    got = msm_mod._decode_packed_affine(
        curve, msm_mod._msm_affine_scaled(curve, scal, scaled, c)
    )
    want = [Vesta.msm(row, pts) for row in scal_rows]
    assert got == want


def test_composed_index_msm_parity():
    """(table, row_idx) tuple interface: the fused IPA rounds' composed
    compact-basis selection. Each batch row addresses a different subset
    of a larger scaled table (here: evens vs odds ++ two extra points),
    mirroring idx_L/idx_R ++ [h, u]."""
    rng = random.Random(22)
    curve = device_curve(Vesta)
    F = curve.F
    ntab, c = 34, 6
    W = -(-255 // c)
    pts = [
        Vesta.scalar_mul(rng.randrange(1, Vesta.scalar.p), Vesta.generator)
        for _ in range(ntab)
    ]
    pts[7] = None
    scaled = _host_scaled(pts, c, W)
    rows = msm_mod.elem_major_basis(F, scaled)  # (W, ntab, L+1)
    table = rows.reshape(W * ntab, limb.NLIMBS + 1)

    m = 16  # points per MSM row: 14 selected + 2 shared extras
    sel = [list(range(0, 28, 2)), list(range(1, 29, 2))]
    extras = [32, 33]
    idx_host = [s + extras for s in sel]
    row_base = (jnp.arange(W, dtype=jnp.int32) * ntab)[:, None, None]
    ridx = jnp.asarray(idx_host, dtype=jnp.int32)[None, :, :] + row_base

    scal_rows, scal = _host_rows(rng, 2, m)
    got = msm_mod._decode_packed_affine(
        curve, msm_mod._msm_affine_scaled(curve, scal, (table, ridx), c)
    )
    want = [
        Vesta.msm(row, [pts[i] for i in idx])
        for row, idx in zip(scal_rows, idx_host)
    ]
    assert got == want


def test_pack_unpack_roundtrip():
    rng = random.Random(23)
    F = device_curve(Vesta).F
    vals = [rng.randrange(F.p) for _ in range(7)]
    arr = F.pack(vals, shape=(7,))
    assert jnp.array_equal(msm_mod.unpack16(msm_mod.pack16(arr)), arr)
