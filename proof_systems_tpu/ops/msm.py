"""Multi-scalar multiplication (Pippenger) on TPU.

Replaces the reference's rayon-parallel `msm_bigint` (used by
`poly-commitment/src/ipa.rs:527-554` for SRS commits and by the batched
verifier equation `ipa.rs:369-385`).

TPU-first formulation — no data-dependent control flow, and O(1)
compiled-graph size in both n and the window count:
  - all W windows and all b MSMs of a batch are folded into leading
    batch axes (W, b): digit extraction, argsort, gathers and the scans
    below are each traced ONCE,
  - bucket accumulation = sort-by-digit + *unsegmented* cumulative
    Jacobian prefix (blocked two-level scan, ops/scan.py), then bucket
    sums as differences of cumulative sums at bucket boundaries
    (empty buckets come out as the identity automatically),
  - weighted bucket reduction Σ d·B_d = Σ_k (Σ_{d≥k} B_d): a blocked
    suffix scan followed by a blocked prefix scan whose last element is
    the total (keeps the graph free of shape-halving reduction trees),
  - the W per-window partial results are combined on the host
    (W·b ≈ 20·b exact bigint point ops — negligible).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..curves import CurveParams
from . import limb
from .curve_ops import APoint, DeviceCurve, JPoint, device_curve
from .scan import blocked_prefix_scan


def _digits(scalars: jax.Array, c: int, w: int) -> jax.Array:
    """Window-w c-bit digits of canonical (16, ...) scalar limb arrays."""
    bitpos = c * w
    li, sh = divmod(bitpos, limb.LIMB_BITS)
    v = scalars[li] >> sh
    if sh + c > limb.LIMB_BITS and li + 1 < limb.NLIMBS:
        v = v | (scalars[li + 1] << (limb.LIMB_BITS - sh))
    return (v & ((1 << c) - 1)).astype(jnp.int32)


def _ec_prefix(curve: DeviceCurve, pts: JPoint, n: int, ident: JPoint) -> JPoint:
    """Inclusive Jacobian prefix scan along the last axis.

    On TPU the whole two-level blocked scan runs inside one pallas
    kernel (the XLA blocked scan is launch-bound: ~145 sequential EC-add
    dispatches x ~0.25 ms per MSM call)."""
    if jax.default_backend() in ("tpu", "axon"):
        from . import pallas_field

        x, y, z = pallas_field.ec_prefix_scan_fused(curve.F, pts.x, pts.y, pts.z)
        return JPoint(x, y, z)
    return blocked_prefix_scan(lambda p, q: curve.add(p, q), ident, pts, n)


def _scan_sum(curve: DeviceCurve, pts: JPoint, n: int, ident: JPoint) -> JPoint:
    """Sum along the last axis via prefix scan; returns batch (..., 1).

    On TPU only scan phases 1-2 run (ec_prefix_scan_parts): the total is
    lane-127's exclusive offset + the last chunk partial — the per-
    position combine phase (~45% of the fused scan) is skipped."""
    if jax.default_backend() in ("tpu", "axon"):
        from . import pallas_field

        (px, py, pz), (ex, ey, ez), _C = pallas_field.ec_prefix_scan_parts(
            curve.F, pts.x, pts.y, pts.z
        )
        x, y, z = pallas_field.jacobian_add(
            curve.F,
            ex[..., -1:], ey[..., -1:], ez[..., -1:],
            px[..., -1:], py[..., -1:], pz[..., -1:],
        )
        return JPoint(x, y, z)
    pref = _ec_prefix(curve, pts, n, ident)
    return JPoint(pref.x[..., -1:], pref.y[..., -1:], pref.z[..., -1:])


def scale_basis(curve: DeviceCurve, points: APoint, c: int, windows: int) -> JPoint:
    """Per-window scaled bases 2^{cw}·P_i, leaves (16, W, n), normalized
    to affine encoding (z ∈ {0, 1·R}) via one batch inversion.

    With the bases pre-scaled, the MSM's window recombination collapses
    from a Horner chain of ~W·(c+1) SEQUENTIAL EC ops (~0.07 ms each of
    single-tile kernel latency) to a log2(W) pairwise tree — the bases
    are fixed per SRS, so the doubling chain runs once per process. The
    affine normalization keeps the scan's mixed-addition fast path and
    drops the z-coordinate gather."""
    J = curve.to_jacobian(points)
    levels = [J]
    for _ in range(1, windows):
        Jp = levels[-1]
        for _ in range(c):
            Jp = curve.double(Jp)
        levels.append(Jp)
    stacked = JPoint(
        jnp.stack([l.x for l in levels], axis=1),
        jnp.stack([l.y for l in levels], axis=1),
        jnp.stack([l.z for l in levels], axis=1),
    )
    return curve.to_jacobian(curve.to_affine(stacked))


def sum_windows(curve: DeviceCurve, wins: JPoint) -> JPoint:
    """Σ_w wins[w] over axis 1 (pre-scaled bases), log2(W) pairwise adds."""
    W = wins.x.shape[1]
    Wp = 1
    while Wp < W:
        Wp *= 2
    if Wp != W:
        pad = curve.inf_jacobian((Wp - W, *wins.x.shape[2:]))
        wins = JPoint(
            jnp.concatenate([wins.x, pad.x], axis=1),
            jnp.concatenate([wins.y, pad.y], axis=1),
            jnp.concatenate([wins.z, pad.z], axis=1),
        )
    while Wp > 1:
        Wp //= 2
        wins = curve.add(
            JPoint(wins.x[:, :Wp], wins.y[:, :Wp], wins.z[:, :Wp]),
            JPoint(wins.x[:, Wp:], wins.y[:, Wp:], wins.z[:, Wp:]),
        )
    return JPoint(wins.x[:, 0], wins.y[:, 0], wins.z[:, 0])


def _combine_windows_body(curve: DeviceCurve, c: int, wins: JPoint) -> JPoint:
    """Σ_w 2^{cw} · win_w on device: Horner over windows, c doublings per
    step (replaces the host bigint recombination — the W·b device→host
    transfer and Python point arithmetic dominated small proofs).

    On TPU the whole Horner chain (~W·(c+1) ≈ 290 sequential EC ops)
    runs inside one pallas kernel; the XLA fori_loop fallback pays
    ~0.2 ms of dispatch per step."""
    W = wins.x.shape[1]
    if (
        jax.default_backend() in ("tpu", "axon")
        and wins.x.ndim == 3
        and wins.x.shape[2] <= 128
    ):
        from . import pallas_field

        x, y, z = pallas_field.combine_windows_fused(
            curve.F, c, wins.x, wins.y, wins.z
        )
        return JPoint(x, y, z)

    def body(i, acc):
        w = W - 1 - i

        def dbl(_, a):
            return curve.double(a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        win = JPoint(
            jax.lax.dynamic_index_in_dim(wins.x, w, axis=1, keepdims=False),
            jax.lax.dynamic_index_in_dim(wins.y, w, axis=1, keepdims=False),
            jax.lax.dynamic_index_in_dim(wins.z, w, axis=1, keepdims=False),
        )
        return curve.add(acc, win)

    init = curve.inf_jacobian((wins.x.shape[2],))
    return jax.lax.fori_loop(0, W, body, init)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _msm_affine(curve: DeviceCurve, scalars: jax.Array, points: APoint, c: int):
    """Full device MSM: window sums + Horner recombination + affine
    normalization fused into one dispatch. Returns ONE packed (33, b)
    uint32 array [x limbs; y limbs; inf flag] — a single device->host
    transfer (4 separate fetches through the axon tunnel cost ~0.25s
    per MSM call and dominated small proofs)."""
    wins = _window_sums_body(curve, scalars, points, c)
    combined = _combine_windows_body(curve, c, wins)
    aff = curve.to_affine(combined)
    return jnp.concatenate(
        [aff.x, aff.y, aff.inf.astype(jnp.uint32)[None]], axis=0
    )


@functools.partial(jax.jit, static_argnums=(0, 3))
def _msm_affine_scaled(curve: DeviceCurve, scalars: jax.Array, spoints: JPoint, c: int):
    """MSM over pre-scaled per-window bases (see scale_basis): window
    sums + log2(W) tree combine + affine normalization, one dispatch."""
    wins = _window_sums_body(curve, scalars, spoints, c)
    total = sum_windows(curve, wins)
    aff = curve.to_affine(total)
    return jnp.concatenate(
        [aff.x, aff.y, aff.inf.astype(jnp.uint32)[None]], axis=0
    )


@functools.lru_cache(maxsize=None)
def _sharded_msm_fn(curve: DeviceCurve, c: int, use_scaled: bool, mesh):
    """Batch-sharded full-MSM callable over a ('data',) mesh: the b axis
    of the scalar batch splits across devices, the (pre-scaled) bases
    replicate, and each device runs the complete Pippenger graph on its
    rows — zero communication (the reference's per-commitment rayon
    split, ipa.rs:527-554, across chips). Cached per (curve, c, mesh)."""
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    body = (_msm_affine_scaled if use_scaled else _msm_affine).__wrapped__

    def local(scal, bases):
        return body(curve, scal, bases, c)

    sm = _jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "data", None), P()),
        out_specs=P(None, "data"),
        check_vma=False,
    )
    return _jax.jit(sm)


@functools.lru_cache(maxsize=None)
def _point_sharded_msm_fn(curve: DeviceCurve, c: int, use_scaled: bool, mesh):
    """POINT-axis-sharded MSM over a ('data',) mesh, for batches too
    small to batch-shard (z commit b=2, sg): the n-point axis splits
    across devices, each device runs the full Pippenger window-sum
    graph on its local points (zero communication), the tiny (W, b)
    per-device window partials all-gather over ICI and fold with
    ndev-1 Jacobian adds per window. Mirrors the reference's rayon
    point split (poly-commitment/src/ipa.rs:527-554) across chips.
    Requires n % ndev == 0 (msm() pads). Cached per (curve, c, mesh)."""
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    ndev = mesh.devices.size

    def local(scal, *leaves):
        bases = JPoint(*leaves) if use_scaled else APoint(*leaves)
        wins = _window_sums_body(curve, scal, bases, c)
        stacked = jnp.stack([wins.x, wins.y, wins.z], axis=1)  # (16,3,W,b)
        return _jax.lax.all_gather(stacked, "data")

    in_specs = (P(None, None, "data"),) + (
        (P(None, None, "data"),) * 3
        if use_scaled
        else (P(None, "data"), P(None, "data"), P("data"))
    )
    sm = _jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )

    def full(scal, bases):
        leaves = (
            (bases.x, bases.y, bases.z)
            if use_scaled
            else (bases.x, bases.y, bases.inf)
        )
        gathered = sm(scal, *leaves)  # (S, 16, 3, W, b)

        def fold(i, acc):
            return curve.add(
                acc,
                JPoint(gathered[i, :, 0], gathered[i, :, 1], gathered[i, :, 2]),
            )

        first = JPoint(gathered[0, :, 0], gathered[0, :, 1], gathered[0, :, 2])
        total = jax.lax.fori_loop(1, ndev, fold, first)
        comb = (
            sum_windows(curve, total)
            if use_scaled
            else _combine_windows_body(curve, c, total)
        )
        aff = curve.to_affine(comb)
        return jnp.concatenate(
            [aff.x, aff.y, aff.inf.astype(jnp.uint32)[None]], axis=0
        )

    return _jax.jit(full)


def _pad_points_for_shard(curve: DeviceCurve, scalars, points, scaled, npad: int):
    """Zero/identity-pad the point axis to npad for even sharding."""
    n = scalars.shape[2]
    extra = npad - n
    scalars = jnp.concatenate(
        [scalars, jnp.zeros((limb.NLIMBS, scalars.shape[1], extra), scalars.dtype)],
        axis=2,
    )
    if scaled is not None:
        W = scaled.x.shape[1]
        zpad = jnp.zeros((limb.NLIMBS, W, extra), dtype=scaled.x.dtype)
        scaled = JPoint(
            jnp.concatenate([scaled.x, zpad], axis=2),
            jnp.concatenate([scaled.y, zpad], axis=2),
            jnp.concatenate([scaled.z, zpad], axis=2),  # z=0 -> identity
        )
        return scalars, None, scaled
    zpad = jnp.zeros((limb.NLIMBS, extra), dtype=points.x.dtype)
    points = APoint(
        jnp.concatenate([points.x, zpad], axis=1),
        jnp.concatenate([points.y, zpad], axis=1),
        jnp.concatenate(
            [points.inf, jnp.ones((extra,), dtype=points.inf.dtype)], axis=0
        ),
    )
    return scalars, points, None


def _decode_packed_affine(curve: DeviceCurve, packed) -> list:
    import numpy as np

    host = np.asarray(jax.device_get(packed), dtype=np.uint64)
    rinv = curve.F.r_inv
    p = curve.F.p
    out = []
    for j in range(host.shape[1]):
        if host[32, j]:
            out.append(None)
            continue
        x = 0
        y = 0
        for i in reversed(range(limb.NLIMBS)):
            x = (x << limb.LIMB_BITS) | int(host[i, j])
            y = (y << limb.LIMB_BITS) | int(host[16 + i, j])
        out.append((x * rinv % p, y * rinv % p))
    return out


def _window_sums_body(curve: DeviceCurve, scalars: jax.Array, points: APoint, c: int) -> JPoint:
    """All per-window Pippenger partial sums, one traced graph.

    scalars: (16, b, n) canonical (NON-Montgomery) limbs.
    points:  APoint with leaves (16, n) / (n,) shared across the b MSMs,
             OR (16, b, n) / (b, n) for per-batch point sets (used by the
             compacted IPA rounds, where L and R address complementary
             halves of the basis).
    Returns JPoint with batch shape (W, b): window w partial sum of MSM b.

    PRECONDITION (JPoint bases): a JPoint `points` argument MUST be
    affine-encoded — z in {0, 1·R} per point (what scale_basis /
    elem_major_basis produce). The row-gather path reconstructs z from a
    one-bit infinity flag instead of gathering it, so a general Jacobian
    basis (arbitrary z) would silently produce wrong points.
    """
    b, n = scalars.shape[1], scalars.shape[2]
    windows = -(-255 // c)
    nbuckets = 1 << c

    digits = jnp.stack([_digits(scalars, c, w) for w in range(windows)], axis=0)  # (W, b, n)
    idx_bits = max(n - 1, 1).bit_length()
    if c + idx_bits <= 32:
        # single packed u32 sort: (digit << idx_bits) | position sorts
        # 6x faster than argsort's key+iota pair on TPU (measured), and
        # reproduces the stable order exactly. Build in uint32 explicitly:
        # int32|uint32 promotes to SIGNED int32 (x64 off), and a digit top
        # bit in the sign position would sort those entries first.
        packed = (digits.astype(jnp.uint32) << idx_bits) | jnp.arange(
            n, dtype=jnp.uint32
        )
        spacked = jnp.sort(packed, axis=-1)
        order = (spacked & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
        sdig = (spacked >> idx_bits).astype(digits.dtype)
    else:
        order = jnp.argsort(digits, axis=-1)
        sdig = jnp.take_along_axis(digits, order, axis=-1)
    NL = limb.NLIMBS
    H = NL // 2
    # Row gathers: sources are flattened to a 2D (R, L+1) table of
    # u32-PACKED element-major rows (pack16(x) ++ pack16(y) ++ inf bit,
    # 68 B) and fetched with ONE fancy-index gather of GLOBAL row
    # indices. Two measured TPU facts drive this shape (k=15 round MSM):
    #   - take_along_axis on a broadcast (W, b, n, rows) source is ~5x
    #     slower than plain table[idx] fancy indexing on a 2D table
    #     (40 ms vs 7-17 ms for the same output volume);
    #   - gather time scales with bytes/row (rows=33: 40 ms, rows=17:
    #     16 ms), so limbs ride packed and unpack after the gather.
    order32 = order.astype(jnp.int32)
    if isinstance(points, tuple) and not isinstance(points, (JPoint, APoint)):
        # pre-composed global indices: (table (R, L+1), row_idx (W, b, n))
        # — the fused IPA rounds compose their compact per-round basis
        # selection with the sort order so only ONE row gather happens.
        table, row_idx = points
        g_idx = jnp.take_along_axis(row_idx.astype(jnp.int32), order32, axis=-1)
    elif isinstance(points, JPoint):
        infbit = limb.is_zero(curve.F, points.z).astype(points.x.dtype)
        rows = jnp.concatenate(
            [pack16(points.x), pack16(points.y), infbit[None]], axis=0
        )
        if rows.ndim == 3:  # (L+1, W, n): per-window rows shared across b
            table = jnp.transpose(rows, (1, 2, 0)).reshape(windows * n, NL + 1)
            g_idx = order32 + (jnp.arange(windows, dtype=jnp.int32) * n)[
                :, None, None
            ]
        else:  # (L+1, W, b, n): per-window per-batch rows
            table = jnp.transpose(rows, (1, 2, 3, 0)).reshape(
                windows * b * n, NL + 1
            )
            offs = (
                jnp.arange(windows, dtype=jnp.int32)[:, None] * b
                + jnp.arange(b, dtype=jnp.int32)[None, :]
            ) * n
            g_idx = order32 + offs[:, :, None]
    else:
        # unscaled affine bases (verifier's batched check, vk builds)
        infbit = points.inf.astype(points.x.dtype)
        rows = jnp.concatenate(
            [pack16(points.x), pack16(points.y), infbit[None]], axis=0
        )
        if rows.ndim == 2:  # (L+1, n) shared across windows and batch
            table = jnp.transpose(rows, (1, 0))
            g_idx = order32
        else:  # (L+1, b, n) per-batch point sets
            table = jnp.transpose(rows, (1, 2, 0)).reshape(b * n, NL + 1)
            g_idx = order32 + (jnp.arange(b, dtype=jnp.int32) * n)[
                None, :, None
            ]
    g = table[g_idx]  # (W, b, n, L+1)
    gt = jnp.transpose(g, (3, 0, 1, 2))  # (L+1, W, b, n)
    one = curve.F.one_mont((windows, b, n))
    pz = limb.select(gt[NL] != 0, curve.F.zeros((windows, b, n)), one)
    jac = JPoint(unpack16(gt[:H]), unpack16(gt[H:NL]), pz)

    ident = curve.inf_jacobian((windows, b, 1))
    # ends[d] = #elements with digit <= d: binary search on the sorted
    # digits (the bincount scatter cost ~2x the sort itself on TPU)
    buckets = jnp.arange(nbuckets, dtype=sdig.dtype)
    ends = jax.vmap(
        lambda row: jnp.searchsorted(row, buckets, side="right")
    )(sdig.reshape(windows * b, n)).reshape(windows, b, nbuckets)
    idx_lo = jnp.concatenate([jnp.zeros((windows, b, 1), ends.dtype), ends[..., :-1]], axis=-1)

    def gather(arr, idx):
        return jnp.take_along_axis(
            arr, jnp.broadcast_to(idx[None], (limb.NLIMBS, *idx.shape)), axis=-1
        )

    if jax.default_backend() in ("tpu", "axon"):
        # Scan phases 1-2 only (ec_prefix_scan_parts); reconstruct the
        # 2*2^c bucket-boundary prefix values cum[t] = sum of first t
        # points as excl[l] + partial[j] (j = t-1, l = j // C) — one
        # elementwise EC add per boundary instead of the full
        # per-position combine phase (~45% of the fused scan's adds).
        # Boundary values are fetched with ONE row-major gather over
        # x||y||z element rows (192 B contiguous per index) — 4-byte
        # limb-major gathers serialize on TPU (~9x, measured).
        from . import pallas_field

        (qx, qy, qz), (ex, ey, ez), C = pallas_field.ec_prefix_scan_parts(
            curve.F, jac.x, jac.y, jac.z, mixed=True
        )
        NL = limb.NLIMBS
        # boundary rows gathered PACKED (96 B: x||y||z u32-paired) from a
        # flat (W*b*len, 24) table — same fancy-index fast path as above
        nq = qx.shape[-1]
        ne = ex.shape[-1]
        qtab = jnp.transpose(
            jnp.concatenate([pack16(qx), pack16(qy), pack16(qz)], axis=0),
            (1, 2, 3, 0),
        ).reshape(windows * b * nq, 3 * H)
        etab = jnp.transpose(
            jnp.concatenate([pack16(ex), pack16(ey), pack16(ez)], axis=0),
            (1, 2, 3, 0),
        ).reshape(windows * b * ne, 3 * H)
        t_all = jnp.concatenate([ends, idx_lo], axis=-1)  # (W, b, 2D)
        j_all = (jnp.maximum(t_all, 1) - 1).astype(jnp.int32)
        wb_offs = (
            jnp.arange(windows, dtype=jnp.int32)[:, None] * b
            + jnp.arange(b, dtype=jnp.int32)[None, :]
        )
        gj = jnp.transpose(
            qtab[j_all + (wb_offs * nq)[:, :, None]], (3, 0, 1, 2)
        )  # (24, W, b, 2D)
        hl = jnp.transpose(
            etab[j_all // C + (wb_offs * ne)[:, :, None]], (3, 0, 1, 2)
        )
        x, y, z = pallas_field.jacobian_add(
            curve.F,
            unpack16(hl[:H]), unpack16(hl[H : 2 * H]), unpack16(hl[2 * H :]),
            unpack16(gj[:H]), unpack16(gj[H : 2 * H]), unpack16(gj[2 * H :]),
        )
        z = limb.select(t_all == 0, jnp.zeros_like(z), z)
        D = nbuckets
        hi = JPoint(x[..., :D], y[..., :D], z[..., :D])
        lo = JPoint(x[..., D:], y[..., D:], z[..., D:])
    else:
        cum = _ec_prefix(curve, jac, n, ident)
        # prepend identity so cum_ext[..., j] = sum of first j points
        cum_ext = JPoint(
            jnp.concatenate([ident.x, cum.x], axis=-1),
            jnp.concatenate([ident.y, cum.y], axis=-1),
            jnp.concatenate([ident.z, cum.z], axis=-1),
        )
        hi = JPoint(gather(cum_ext.x, ends), gather(cum_ext.y, ends), gather(cum_ext.z, ends))
        lo = JPoint(gather(cum_ext.x, idx_lo), gather(cum_ext.y, idx_lo), gather(cum_ext.z, idx_lo))
    buckets = curve.add(hi, curve.neg(lo))  # (.., W, b, D)
    # drop bucket 0; weighted sum over d = 1..D-1 via suffix scan + total
    rev = JPoint(
        buckets.x[..., 1:][..., ::-1], buckets.y[..., 1:][..., ::-1], buckets.z[..., 1:][..., ::-1]
    )
    suf = _ec_prefix(curve, rev, nbuckets - 1, ident)
    win = _scan_sum(curve, suf, nbuckets - 1, ident)  # (.., W, b, 1)
    return JPoint(win.x[..., 0], win.y[..., 0], win.z[..., 0])


def pack16(a: jax.Array) -> jax.Array:
    """(16, ...) canonical 16-bit limbs -> (8, ...) u32-packed pairs.

    Halves every gathered row's byte count: the TPU row gather is the
    dominant MSM cost and scales with bytes fetched per index."""
    return a[0::2] | (a[1::2] << 16)


def unpack16(p: jax.Array) -> jax.Array:
    """(8, ...) u32-packed pairs -> (16, ...) 16-bit limbs."""
    lo = p & jnp.uint32(0xFFFF)
    hi = p >> 16
    return jnp.stack([lo, hi], axis=1).reshape(
        2 * p.shape[0], *p.shape[1:]
    )


def elem_major_basis(F, pts: JPoint) -> jax.Array:
    """(16, W, n) scaled JPoint basis -> (W, n, L+1) element-major PACKED
    rows (u32-packed x ++ u32-packed y ++ infinity bit, 68 B each) for
    fast row gathers. Requires affine encoding (z in {0, 1·R})."""
    infbit = limb.is_zero(F, pts.z).astype(pts.x.dtype)
    return jnp.transpose(
        jnp.concatenate(
            [pack16(pts.x), pack16(pts.y), infbit[None]], axis=0
        ),
        (1, 2, 0),
    )


def default_window_bits(n: int) -> int:
    """Window size minimizing the device tile-add cost model of
    _window_sums_body's TPU path: per window, the main scan runs phases
    1-2 ((C-1)+7 tile-adds), boundary reconstruction is 3 elementwise
    adds over the 2^c buckets, and the bucket reduction pays a full
    suffix scan (2C'+6) plus a phases-1-2 sum (C'+7)."""
    best, best_cost = 6, None
    C = -(-n // 128)
    for c in range(6, 14):
        W = -(-255 // c)
        D = 1 << c
        Cb = -(-D // 128)
        cost = W * ((C - 1 + 7) + 3 * Cb + (2 * Cb + 6) + (Cb + 7))
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


def msm(
    curve_params: CurveParams,
    scalars_std: jax.Array,
    points: APoint,
    c: int | None = None,
    scaled: JPoint | None = None,
):
    """Batched MSM: returns a list of b host affine points.

    scalars_std: (16, b, n) canonical standard-form limbs (NOT Montgomery).
    points: device APoint batch of n points (shared by all b MSMs).
    scaled: optional pre-scaled per-window bases (scale_basis of the same
    points at window size c) — used on the device path; the host-exact
    CPU fallback ignores it.
    """
    curve = device_curve(curve_params)
    b, n = scalars_std.shape[1], scalars_std.shape[2]
    orig_b = b
    if jax.default_backend() not in ("tpu", "axon"):
        # Host-exact reference path: on CPU the fused curve kernels only
        # run in (unusably slow) interpret mode, so protocol-level tests
        # fall back to the golden model (tests cover device/host parity
        # of the kernels separately, on real TPU hardware).
        rows = limb.limbs_to_ints(scalars_std)
        pts = curve.unpack_affine(points)
        out = []
        for i in range(b):
            out.append(curve_params.msm(rows[i * n : (i + 1) * n], pts))
        return out
    if c is None:
        c = default_window_bits(n)
    windows = -(-255 // c)
    # Normalize the batch dimension to power-of-two buckets so a handful
    # of compiled shapes serve every caller. PST_MSM_MIN_B can force the
    # witness/quotient/z commits onto ONE shape (fewer per-process traces)
    # at the cost of padded-row device work — measured at k=11 the padding
    # cost (+0.7 s steady) outweighs the warmup saving for b>=2.
    #
    # The SCALED path's minimum is 2, not 1: the fused Pippenger graph
    # MISCOMPILES at (b=1, c=10, n=2^15+1, scaled bases) on v5e/axon —
    # every stage is bit-correct when jitted in isolation on the same
    # inputs, but the fused graph returns wrong bucket values (b=2 same
    # data, c=9 same n, n=2^12+1 same c, and the unscaled-basis verifier
    # MSM at b=1 are all correct; optimization_barrier at either end of
    # the suspect region does not fix it). Padding one all-zero scalar
    # row dodges the trigger for ~40 ms of extra scan work on the b=1
    # commits (z, sg); every proof is end-to-end verified against this
    # workaround by tests + BENCH_VERIFY.
    b_min = 2 if scaled is not None else 1
    b_pad = max(b_min, int(os.environ.get("PST_MSM_MIN_B", "1")))
    while b_pad < b:
        b_pad *= 2
    if b_pad != b:
        scalars_std = jnp.concatenate(
            [
                scalars_std,
                jnp.zeros((limb.NLIMBS, b_pad - b, n), dtype=scalars_std.dtype),
            ],
            axis=1,
        )
    # HBM guard: the gathered per-window arrays are (16, W, b, n) x ~8
    # live buffers. Split the batch when W*b*n exceeds the budget
    # (~0.5 GB/buffer) so k=15/16 witness commits fit on one chip.
    # budget sized post-row-gather (the z coordinate is no longer
    # gathered and boundary fetches are compact): 2^24 keeps the k=15
    # witness commit in ONE dispatch and k=16 in two
    max_elems = int(os.environ.get("PST_MSM_MAX_ELEMS", str(1 << 24)))
    split = b_pad
    while split > 1 and windows * split * n > max_elems:
        split //= 2
    from ..parallel.auto import data_mesh

    mesh = data_mesh()
    out = []
    for lo in range(0, b_pad, split):
        part = scalars_std[:, lo : lo + split]
        if scaled is not None:
            assert scaled.x.shape[1] == windows, "scaled bases don't match c"
        if mesh is not None and split % mesh.devices.size == 0:
            fn = _sharded_msm_fn(curve, c, scaled is not None, mesh)
            packed = fn(part, scaled if scaled is not None else points)
        elif mesh is not None:
            # batch too small to split across devices: shard the POINT
            # axis instead (z commit b=2, verifier b=1, sg) — each chip
            # computes window partials on its points, all_gather + fold
            ndev = mesh.devices.size
            npad = -(-n // ndev) * ndev
            part_p, pts_p, scaled_p = (
                _pad_points_for_shard(curve, part, points, scaled, npad)
                if npad != n
                else (part, points, scaled)
            )
            fn = _point_sharded_msm_fn(curve, c, scaled is not None, mesh)
            packed = fn(part_p, scaled_p if scaled is not None else pts_p)
        elif scaled is not None:
            packed = _msm_affine_scaled(curve, part, scaled, c)
        else:
            packed = _msm_affine(curve, part, points, c)
        out.extend(_decode_packed_affine(curve, packed))
    return out[:orig_b]


def msm_host_scalars(curve_params: CurveParams, scalars: list[list[int]], points: APoint):
    """Convenience wrapper: scalars given as host ints (list of b lists)."""
    b = len(scalars)
    n = len(scalars[0])
    flat = [s for row in scalars for s in row]
    arr = jnp.asarray(limb.ints_to_limbs(flat, shape=(b, n)))
    return msm(curve_params, arr, points)
