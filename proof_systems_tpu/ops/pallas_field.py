"""Pallas TPU kernels for Pasta field and curve arithmetic.

Why kernels instead of the pure-XLA limb ops (ops/limb.py):
  - a fused Montgomery multiply keeps its 32 column accumulators in
    vector registers — the XLA formulation materialises (16,16,batch)
    outer-product intermediates (observed 22 GB at MSM batch sizes),
  - one curve addition becomes ONE HLO op instead of ~10k, collapsing
    XLA compile times for scan-based MSM/NTT graphs,
  - HBM traffic per EC add drops from ~25 round-trips to 9 reads +
    3 writes.

Layout: a batch of N field elements is (16, M, 128) uint32 — limb-major
with an (M, 128) = (sublane, lane) tile per limb, the native VPU shape
(see /opt/skills/guides/pallas_guide.md, Tiling Constraints). Wrappers
accept the (16, N) public layout and pad/reshape.

TRACE-TIME DISCIPLINE (round 2): jax tracing, not XLA compile, is the
dominant per-process cost of these kernels — a fully-unrolled per-limb
kernel body issued ~70k traced jnp ops (23 s per EC-add trace, and the
MSM/IPA graphs re-trace it at several shapes, >300 s per proof process).
The kernel arithmetic is therefore written (a) limb-VECTORIZED: values
are (16, rows, lanes) stacked arrays so one traced op covers all limbs,
and (b) with jax.lax primitives (lax.mul/add/pad/...), which skip the
jitted-jnp dispatch layer (~3x cheaper per traced op). Same canonical
Montgomery SOS+REDC bounds analysis as ops/limb.py.

Kernels run on real TPU (Mosaic); under CPU tests they fall back to
pallas interpret mode automatically (parity: tests/test_pallas_field.py).

Reference semantics: arkworks Montgomery fields / Jacobian curve ops as
used by curves/src/pasta/* (the limb split and kernel fusion are TPU
layout choices; ring/group semantics identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

try:  # pallas TPU backend: present in jax>=0.4 but import varies
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from .limb import LIMB_BITS, MASK, NLIMBS, DeviceField, int_to_limbs

import os

BLOCK_ROWS = int(os.environ.get("PST_BLOCK_ROWS", "8"))
# sublanes per grid step (one (8,128) vreg per limb row at the default)
LANE = 128

_M = np.uint32(MASK)
_SH = np.uint32(LIMB_BITS)
_SH31 = np.uint32(31)
_Z = np.uint32(0)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# v5e has 128 MiB VMEM/core; Mosaic's default scoped-vmem limit is 16 MiB.
# The EC scan kernels keep a (16, bg, 128)-shaped Jacobian carry plus the
# Hillis-Steele temporaries on the kernel stack, which overflows 16 MiB at
# bg=8 (observed: 17.19M at C=17). Raise the per-kernel cap; actual usage
# is still bounded by the block sizing below.
_EC_VMEM_LIMIT = int(os.environ.get("PST_EC_VMEM_LIMIT", str(96 * 1024 * 1024)))


def _ec_compiler_params(dims: tuple | None = None):
    if pltpu is None or _interpret():
        return None
    kw = {"vmem_limit_bytes": _EC_VMEM_LIMIT}
    if dims is not None:
        # carry lives in scratch across grid steps: force sequential iteration
        kw["dimension_semantics"] = dims
    return pltpu.CompilerParams(**kw)


# ---------------------------------------------------------------------------
# In-kernel limb arithmetic on STACKED (16, rows, lanes) uint32 arrays
# ---------------------------------------------------------------------------


def _shr(x, k=_SH):
    return lax.shift_right_logical(x, lax.broadcast(k, x.shape))


def _and_mask(x):
    return lax.bitwise_and(x, lax.broadcast(_M, x.shape))


def _pad0(x, lo: int, hi: int):
    """Zero-pad axis 0 of x by (lo, hi)."""
    cfg = [(lo, hi, 0)] + [(0, 0, 0)] * (x.ndim - 1)
    return lax.pad(x, _Z, cfg)


def _kv_ripple(cols, out_limbs: int):
    """Carry-normalize (K, *b) columns into out_limbs 16-bit limbs."""
    outs = []
    carry = lax.broadcast(_Z, cols.shape[1:])
    for k in range(cols.shape[0]):
        v = lax.add(cols[k], carry)
        outs.append(_and_mask(v))
        carry = _shr(v)
    while len(outs) < out_limbs:
        outs.append(_and_mask(carry))
        carry = _shr(carry)
    return jnp.stack(outs[:out_limbs], axis=0)


def _kv_sub_raw(a, b):
    """a - b limbwise (16, *b); returns (limbs, borrow mask (*b,))."""
    outs = []
    borrow = lax.broadcast(_Z, a.shape[1:])
    for i in range(NLIMBS):
        v = lax.sub(lax.sub(a[i], b[i]), borrow)
        outs.append(_and_mask(v))
        borrow = _shr(v, _SH31)
    return jnp.stack(outs, axis=0), borrow


def _bsel(cond, t, f):
    """Select limb arrays by a (*batch,) uint32/bool condition."""
    c = jnp.broadcast_to(cond[None] != 0, t.shape)
    return lax.select(c, t, f)


def _kv_add(F: DeviceField, a, b):
    p_arr = _p_stack(F, a.shape[1:])
    s = _kv_ripple(lax.add(a, b), NLIMBS)
    d, borrow = _kv_sub_raw(s, p_arr)
    return _bsel(borrow, s, d)


def _kv_sub(F: DeviceField, a, b):
    p_arr = _p_stack(F, a.shape[1:])
    d, borrow = _kv_sub_raw(a, b)
    dp = _kv_ripple(lax.add(d, p_arr), NLIMBS)
    return _bsel(borrow, dp, d)


def _p_stack(F: DeviceField, batch_shape):
    rows = [lax.broadcast(np.uint32(v), batch_shape) for v in F.p_limbs_np]
    return jnp.stack(rows, axis=0)


def _kv_mul_redc(F: DeviceField, a, b):
    """Montgomery product on (16, *b) stacked limbs (canonical in/out).

    Same SOS + 16-step REDC as ops/limb (same value bounds); the column
    accumulators are a (33, *b) array updated with statically-shifted
    lax.pads so the traced op count stays ~400 per multiply.
    """
    batch = a.shape[1:]
    # full 512-bit product columns: place a_i*b low halves at columns
    # i..i+15, high halves one up
    prod = lax.mul(
        jnp.broadcast_to(a[:, None], (NLIMBS, NLIMBS, *batch)),
        jnp.broadcast_to(b[None, :], (NLIMBS, NLIMBS, *batch)),
    )
    lo = _and_mask(prod)
    hi = _shr(prod)
    # column accumulation as a pairwise tree over support-aligned terms
    # (vs summing 16 full-height zero-padded arrays): 576 row-adds, not
    # 992 — the pads fuse into the adds.
    terms = [
        (i, 17, lax.add(_pad0(lo[i], 0, 1), _pad0(hi[i], 1, 0)))
        for i in range(NLIMBS)
    ]
    while len(terms) > 1:
        nxt = []
        for j in range(0, len(terms) - 1, 2):
            (o1, h1, a1), (o2, h2, a2) = terms[j], terms[j + 1]
            lo_o = min(o1, o2)
            hi_o = max(o1 + h1, o2 + h2)
            a1p = _pad0(a1, o1 - lo_o, hi_o - o1 - h1)
            a2p = _pad0(a2, o2 - lo_o, hi_o - o2 - h2)
            nxt.append((lo_o, hi_o - lo_o, lax.add(a1p, a2p)))
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    off, hh, cols = terms[0]
    cols = _pad0(cols, off, 2 * NLIMBS - off - hh)  # (32, *b), cols < 2^21

    p_arr = _p_stack(F, batch)
    pinv = lax.broadcast(F.pinv, batch)
    t = _pad0(cols, 0, 1)  # (33, *b)
    carry = lax.broadcast(_Z, batch)
    for i in range(NLIMBS):
        v = lax.add(t[i], carry)
        m = _and_mask(lax.mul(v, pinv))
        pr = lax.mul(jnp.broadcast_to(m[None], (NLIMBS, *batch)), p_arr)
        plo = _and_mask(pr)
        phi = _shr(pr)
        v0 = lax.add(v, plo[0])
        carry = _shr(v0)
        # rows i+1..i+16 gain plo[1..15] + phi[0..15]: combine in the
        # 16-row window first, then one padded add into t
        w = lax.add(_pad0(plo[1:], 0, 1), phi)
        t = lax.add(t, _pad0(w, i + 1, 16 - i))
    # single ripple with the final REDC carry injected at column 16
    res = _kv_ripple(
        lax.add(t[NLIMBS:], _pad0(carry[None], 0, NLIMBS)), NLIMBS + 1
    )
    top = res[NLIMBS]
    limbs = res[:NLIMBS]
    d, borrow = _kv_sub_raw(limbs, p_arr)
    use_sub = jnp.logical_or(top != 0, borrow == 0)
    return _bsel(use_sub, d, limbs)


def _kv_is_zero(a):
    return jnp.all(a == 0, axis=0)


def _kv_select(cond, t, f):
    """cond: (*batch,) bool; t/f: (16, *batch)."""
    return _bsel(cond.astype(jnp.uint32), t, f)


def _kv_ec_double(F: DeviceField, p1):
    """dbl-2009-l on stacked limbs (a=0 short Weierstrass)."""
    x1, y1, z1 = p1
    mul = lambda u, v: _kv_mul_redc(F, u, v)
    add_ = lambda u, v: _kv_add(F, u, v)
    sub_ = lambda u, v: _kv_sub(F, u, v)
    a_ = mul(x1, x1)
    b_ = mul(y1, y1)
    c_ = mul(b_, b_)
    xb = add_(x1, b_)
    d_ = sub_(sub_(mul(xb, xb), a_), c_)
    d_ = add_(d_, d_)
    e_ = add_(add_(a_, a_), a_)
    f_ = mul(e_, e_)
    dx = sub_(f_, add_(d_, d_))
    c8 = add_(c_, c_)
    c8 = add_(c8, c8)
    c8 = add_(c8, c8)
    dy = sub_(mul(e_, sub_(d_, dx)), c8)
    yz = mul(y1, z1)
    dz = add_(yz, yz)
    return dx, dy, dz


def _kv_ec_madd(F: DeviceField, p1, q2):
    """Mixed addition: p1 Jacobian + q2 AFFINE-ENCODED (z2 ∈ {0, 1·R}:
    0 marks infinity, otherwise exactly one in Montgomery form).
    madd-2007-bl (7M+4S vs the general add's 11M+5S) with the same
    complete-law select fallbacks as _kv_ec_add; the doubling fallback
    doubles q2's representation (same group element when h=r=0)."""
    (x1, y1, z1), (x2, y2, z2) = p1, q2
    mul = lambda u, v: _kv_mul_redc(F, u, v)
    add_ = lambda u, v: _kv_add(F, u, v)
    sub_ = lambda u, v: _kv_sub(F, u, v)
    p_inf = _kv_is_zero(z1)
    q_inf = _kv_is_zero(z2)
    z1z1 = mul(z1, z1)
    u2 = mul(x2, z1z1)
    s2 = mul(y2, mul(z1, z1z1))
    h = sub_(u2, x1)
    rr = sub_(s2, y1)
    r2 = add_(rr, rr)
    h_zero = _kv_is_zero(h)
    r_zero = _kv_is_zero(r2)
    h2 = add_(h, h)
    i = mul(h2, h2)
    j = mul(h, i)
    v = mul(x1, i)
    r2sq = mul(r2, r2)
    x3 = sub_(sub_(r2sq, j), add_(v, v))
    s1j = mul(y1, j)
    y3 = sub_(mul(r2, sub_(v, x3)), add_(s1j, s1j))
    z3 = mul(add_(z1, z1), h)  # (Z1+H)^2 - Z1Z1 - HH = 2·Z1·H
    dx, dy, dz = _kv_ec_double(F, (x2, y2, z2))
    use_dbl = jnp.logical_and(h_zero, r_zero)
    to_inf = jnp.logical_and(h_zero, jnp.logical_not(r_zero))
    zero = jnp.zeros_like(x3)
    x = _kv_select(use_dbl, dx, x3)
    y = _kv_select(use_dbl, dy, y3)
    z = _kv_select(use_dbl, dz, z3)
    z = _kv_select(jnp.logical_and(to_inf, jnp.logical_not(p_inf)), zero, z)
    x = _kv_select(p_inf, x2, x)
    y = _kv_select(p_inf, y2, y)
    z = _kv_select(p_inf, z2, z)
    x = _kv_select(q_inf, x1, x)
    y = _kv_select(q_inf, y1, y)
    z = _kv_select(q_inf, z1, z)
    return x, y, z


def _kv_ec_add(F: DeviceField, p1, p2):
    """Complete Jacobian add (add-2007-bl + dbl/inf fallbacks)."""
    (x1, y1, z1), (x2, y2, z2) = p1, p2
    mul = lambda u, v: _kv_mul_redc(F, u, v)
    add_ = lambda u, v: _kv_add(F, u, v)
    sub_ = lambda u, v: _kv_sub(F, u, v)
    p_inf = _kv_is_zero(z1)
    q_inf = _kv_is_zero(z2)
    z1z1 = mul(z1, z1)
    z2z2 = mul(z2, z2)
    u1 = mul(x1, z2z2)
    u2 = mul(x2, z1z1)
    s1 = mul(y1, mul(z2, z2z2))
    s2 = mul(y2, mul(z1, z1z1))
    h = sub_(u2, u1)
    rr = sub_(s2, s1)
    r2 = add_(rr, rr)
    h_zero = _kv_is_zero(h)
    r_zero = _kv_is_zero(r2)
    h2 = add_(h, h)
    i = mul(h2, h2)
    j = mul(h, i)
    v = mul(u1, i)
    r2sq = mul(r2, r2)
    x3 = sub_(sub_(r2sq, j), add_(v, v))
    s1j = mul(s1, j)
    y3 = sub_(mul(r2, sub_(v, x3)), add_(s1j, s1j))
    zz = mul(add_(z1, z2), add_(z1, z2))
    z3 = mul(sub_(sub_(zz, z1z1), z2z2), h)
    dx, dy, dz = _kv_ec_double(F, (x1, y1, z1))
    use_dbl = jnp.logical_and(h_zero, r_zero)
    to_inf = jnp.logical_and(h_zero, jnp.logical_not(r_zero))
    zero = jnp.zeros_like(x3)
    x = _kv_select(use_dbl, dx, x3)
    y = _kv_select(use_dbl, dy, y3)
    z = _kv_select(use_dbl, dz, z3)
    z = _kv_select(jnp.logical_and(to_inf, jnp.logical_not(p_inf)), zero, z)
    x = _kv_select(p_inf, x2, x)
    y = _kv_select(p_inf, y2, y)
    z = _kv_select(p_inf, z2, z)
    x = _kv_select(q_inf, x1, x)
    y = _kv_select(q_inf, y1, y)
    z = _kv_select(q_inf, z1, z)
    return x, y, z


# ---------------------------------------------------------------------------
# pallas_call wrappers: public layout (16, N) uint32
# ---------------------------------------------------------------------------


def _pad_to_block(x: jax.Array) -> tuple[jax.Array, int]:
    """(16, *batch) -> (16, M, 128) with batch dims flattened and padded."""
    x = x.reshape(NLIMBS, -1)
    n = x.shape[-1]
    per = BLOCK_ROWS * LANE
    m = -(-n // per) * per
    if m != n:
        x = jnp.concatenate(
            [x, jnp.zeros((*x.shape[:-1], m - n), dtype=x.dtype)], axis=-1
        )
    return x.reshape(*x.shape[:-1], m // LANE, LANE), n


def _unpad(x: jax.Array, n: int) -> jax.Array:
    return x.reshape(*x.shape[:-2], -1)[..., :n]


def _field_block_spec():
    return pl.BlockSpec(
        (NLIMBS, BLOCK_ROWS, LANE),
        lambda i: (0, i, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )


def _call_elementwise(kernel, n_in: int, n_out: int, *arrs):
    """All operands (16, M, 128); grid over M/BLOCK_ROWS."""
    m = arrs[0].shape[1]
    grid = (m // BLOCK_ROWS,)
    out_shape = tuple(
        jax.ShapeDtypeStruct((NLIMBS, m, LANE), jnp.uint32) for _ in range(n_out)
    )
    if n_out == 1:
        out_shape = out_shape[0]
    out_specs = tuple(_field_block_spec() for _ in range(n_out))
    if n_out == 1:
        out_specs = out_specs[0]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_field_block_spec() for _ in range(n_in)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*arrs)


@functools.partial(jax.jit, static_argnums=0)
def mont_mul(F: DeviceField, a: jax.Array, b: jax.Array) -> jax.Array:
    """(16, N) x (16, N) Montgomery product via one fused kernel."""
    a, b = jnp.broadcast_arrays(a, b)
    ap, n = _pad_to_block(a)
    bp, _ = _pad_to_block(b)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = _kv_mul_redc(F, a_ref[...], b_ref[...])

    out = _unpad(_call_elementwise(kernel, 2, 1, ap, bp), n)
    return out.reshape(a.shape)


@functools.partial(jax.jit, static_argnums=0)
def jacobian_add(F: DeviceField, px, py, pz, qx, qy, qz):
    """Complete Jacobian addition fused into one kernel (add-2007-bl with
    doubling/inf fallbacks, as ops/curve_ops.DeviceCurve.add)."""
    args = jnp.broadcast_arrays(px, py, pz, qx, qy, qz)
    shape = args[0].shape
    padded = []
    for x in args:
        xp, n = _pad_to_block(x)
        padded.append(xp)

    def kernel(px_r, py_r, pz_r, qx_r, qy_r, qz_r, ox_r, oy_r, oz_r):
        p1 = (px_r[...], py_r[...], pz_r[...])
        p2 = (qx_r[...], qy_r[...], qz_r[...])
        x, y, z = _kv_ec_add(F, p1, p2)
        ox_r[...] = x
        oy_r[...] = y
        oz_r[...] = z

    ox, oy, oz = _call_elementwise(kernel, 6, 3, *padded)
    return (
        _unpad(ox, n).reshape(shape),
        _unpad(oy, n).reshape(shape),
        _unpad(oz, n).reshape(shape),
    )


@functools.partial(jax.jit, static_argnums=0)
def jacobian_double(F: DeviceField, px, py, pz):
    padded = []
    shape = px.shape
    for x in (px, py, pz):
        xp, n = _pad_to_block(x)
        padded.append(xp)

    def kernel(px_r, py_r, pz_r, ox_r, oy_r, oz_r):
        x, y, z = _kv_ec_double(F, (px_r[...], py_r[...], pz_r[...]))
        ox_r[...] = x
        oy_r[...] = y
        oz_r[...] = z

    ox, oy, oz = _call_elementwise(kernel, 3, 3, *padded)
    return (
        _unpad(ox, n).reshape(shape),
        _unpad(oy, n).reshape(shape),
        _unpad(oz, n).reshape(shape),
    )


# ---------------------------------------------------------------------------
# In-kernel-loop kernels: on the axon tunnel each XLA loop iteration /
# kernel boundary costs ~0.2 ms, so sequential chains (Fermat inversion,
# Pippenger window recombination, sponge permutations, endo expansion)
# are fused into SINGLE pallas_call's with the loop inside the kernel.
# ---------------------------------------------------------------------------


def _tab_select(tab, d):
    """tab[d] for a python list of equal-shaped arrays and a traced scalar
    d. Mosaic TC cannot lower dynamic_slice on VALUES (only refs), so a
    stacked-table dynamic_index_in_dim fails to compile; a chain of
    scalar-predicate selects lowers fine and is VPU-cheap next to the
    mont-mul work per loop step."""
    td = tab[0]
    for j in range(1, len(tab)):
        td = jnp.where(d == j, tab[j], td)
    return td


@functools.partial(jax.jit, static_argnums=(0, 2))
def mont_pow_fused(F: DeviceField, a: jax.Array, e: int) -> jax.Array:
    """a^e (Montgomery, static exponent) with the whole chain inside ONE
    kernel (vs ops/limb.mont_pow's ~e.bit_length() XLA loop iterations).

    Large exponents use 4-bit windows MSB-first: a 15-entry table (14
    multiplies) then 4 squarings + 1 table multiply per nibble —
    ~334 in-kernel multiplies for a 255-bit Fermat inverse instead of
    ~510 for binary square-and-multiply."""
    shape = a.shape
    ap, n = _pad_to_block(a)
    one_np = np.array(
        [(F.r_mod_p >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)],
        dtype=np.uint32,
    )
    m = ap.shape[1]

    if e.bit_length() >= 32:
        nd = (e.bit_length() + 3) // 4
        digs = jnp.asarray(
            np.array(
                [(e >> (4 * (nd - 1 - i))) & 15 for i in range(nd)],
                dtype=np.int32,
            )
        )

        def kernel(dig_ref, a_ref, o_ref):
            base = a_ref[...]
            one = jnp.stack(
                [lax.broadcast(one_np[i], base.shape[1:]) for i in range(NLIMBS)]
            )
            tab = [one, base]
            for _ in range(14):
                tab.append(_kv_mul_redc(F, tab[-1], base))

            def body(i, acc):
                for _ in range(4):
                    acc = _kv_mul_redc(F, acc, acc)
                return _kv_mul_redc(F, acc, _tab_select(tab, dig_ref[i]))

            o_ref[...] = jax.lax.fori_loop(0, nd, body, one)

        sm = digs
    else:
        nbits = max(e.bit_length(), 1)
        sm = jnp.asarray(
            np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.int32)
        )

        def kernel(bits_ref, a_ref, o_ref):
            base0 = a_ref[...]
            one = jnp.stack(
                [lax.broadcast(one_np[i], base0.shape[1:]) for i in range(NLIMBS)]
            )

            def body(i, carry):
                acc, base = carry
                prod = _kv_mul_redc(F, acc, base)
                acc = jnp.where(bits_ref[i] == 1, prod, acc)
                base = _kv_mul_redc(F, base, base)
                return acc, base

            acc, _ = jax.lax.fori_loop(0, nbits, body, (one, base0))
            o_ref[...] = acc

    out = pl.pallas_call(
        kernel,
        grid=(m // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM if pltpu else None),
            _field_block_spec(),
        ],
        out_specs=_field_block_spec(),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, m, LANE), jnp.uint32),
        interpret=_interpret(),
    )(sm, ap)
    return _unpad(out, n).reshape(shape)


@functools.partial(jax.jit, static_argnums=(0, 1))
def combine_windows_fused(F: DeviceField, c: int, wx, wy, wz):
    """Pippenger window recombination sum_w 2^{cw} win_w with the Horner
    loop (W windows x c doublings) inside ONE kernel — one launch instead
    of ~W*(c+1) sequential XLA loop iterations (each costs ~0.2 ms on the
    axon runtime).

    wx/wy/wz: (16, W, b) Jacobian window partials, b <= 128.
    Returns (x, y, z) of shape (16, b).

    Layout: the proven (16, rows, 128) tile paradigm — window w occupies
    the aligned 8-row block [8w, 8w+8) (row 0 carries the data), so the
    dynamic per-iteration load is a full-tile sublane slice.
    """
    W, b = wx.shape[1], wx.shape[2]
    assert b <= LANE
    pads = []
    for arr in (wx, wy, wz):
        ap = jnp.pad(arr, ((0, 0), (0, 0), (0, LANE - b)))  # (16, W, 128)
        ap = ap[:, :, None, :]  # (16, W, 1, 128)
        ap = jnp.pad(ap, ((0, 0), (0, 0), (0, BLOCK_ROWS - 1), (0, 0)))
        pads.append(ap.reshape(NLIMBS, W * BLOCK_ROWS, LANE))

    spec = pl.BlockSpec(
        (NLIMBS, W * BLOCK_ROWS, LANE), lambda: (0, 0, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )
    out_spec = pl.BlockSpec(
        (NLIMBS, 3 * BLOCK_ROWS, LANE), lambda: (0, 0, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )

    def kernel(x_ref, y_ref, z_ref, o_ref):
        def load_win(w):
            sl = pl.dslice(w * BLOCK_ROWS, BLOCK_ROWS)
            return (x_ref[:, sl, :], y_ref[:, sl, :], z_ref[:, sl, :])

        def body(i, acc):
            w = W - 1 - i

            def dbl(_, p):
                return _kv_ec_double(F, p)

            acc = jax.lax.fori_loop(0, c, dbl, acc)
            return _kv_ec_add(F, acc, load_win(w))

        zero = jnp.zeros((NLIMBS, BLOCK_ROWS, LANE), dtype=jnp.uint32)
        acc0 = (zero, zero, zero)
        x, y, z = jax.lax.fori_loop(0, W, body, acc0)
        o_ref[:, 0:BLOCK_ROWS, :] = x
        o_ref[:, BLOCK_ROWS : 2 * BLOCK_ROWS, :] = y
        o_ref[:, 2 * BLOCK_ROWS : 3 * BLOCK_ROWS, :] = z

    out = pl.pallas_call(
        kernel,
        in_specs=[spec, spec, spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (NLIMBS, 3 * BLOCK_ROWS, LANE), jnp.uint32
        ),
        interpret=_interpret(),
    )(*pads)
    return (
        out[:, 0, :b],
        out[:, BLOCK_ROWS, :b],
        out[:, 2 * BLOCK_ROWS, :b],
    )


# ---------------------------------------------------------------------------
# Fused Fiat-Shamir round kernels. The IPA device loop's per-round
# transcript math (2 poseidon permutations, the 128-bit endo expansion
# and the Fermat inverse of the challenge) was ~280 ms/round on the XLA
# path (~1,200 sequential tiny mont_muls x ~0.24 ms of per-op dispatch);
# fused into two kernel launches it is <1 ms. Semantics are identical to
# poseidon/src/permutation.rs + sponge.rs:190-228 (see ipa._ipa_tail_rounds
# for the protocol context).
# ---------------------------------------------------------------------------


def _kv_load_smem_elem(ref, base):
    """16 SMEM scalars at [base, base+16) -> a (16, 1, LANE) limb tile."""
    rows = [lax.broadcast(ref[base + l], (1, LANE)) for l in range(NLIMBS)]
    return jnp.stack(rows, axis=0)


@functools.partial(jax.jit, static_argnums=(0, 1))
def sponge_squeeze2_fused(Fq: DeviceField, nrounds: int, state, xs, ys, rc_flat, mds_flat):
    """Two absorb+permute sponge steps and the challenge read, one kernel.

    state: (16, 3) Montgomery; xs/ys: (16, 2) Montgomery (the L and R
    point coordinates; infinity already encoded as (0, 0)).
    rc_flat: (nrounds*3*16,) uint32, rc[r][j] limbs at ((r*3+j)*16);
    mds_flat: (3*3*16,) uint32, mds[i][j] limbs at ((i*3+j)*16).
    Both in Montgomery form.
    Returns (state' (16, 3) Montgomery, chal (16, 1) canonical limbs).
    """
    one_std = np.zeros((NLIMBS,), dtype=np.uint32)
    one_std[0] = 1

    packed = jnp.zeros((NLIMBS, BLOCK_ROWS, LANE), dtype=jnp.uint32)
    packed = packed.at[:, 0:3, 0].set(state)
    packed = packed.at[:, 3:5, 0].set(xs)
    packed = packed.at[:, 5:7, 0].set(ys)

    spec = pl.BlockSpec(
        (NLIMBS, BLOCK_ROWS, LANE), lambda: (0, 0, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM if pltpu else None)

    def kernel(rc_ref, mds_ref, in_ref, o_ref):
        mulq = lambda u, v: _kv_mul_redc(Fq, u, v)
        addq = lambda u, v: _kv_add(Fq, u, v)
        # state is kept STACKED (16, 3, L): the sbox is ONE 3-row multiply
        # chain and the MDS matrix-vector product ONE 9-row multiply +
        # two 3-row adds — per-op kernel latency is row-count-insensitive
        # at this size, so this is ~4x fewer serial multiplies per round
        # than the per-element form.
        m9 = jnp.concatenate(
            [
                _kv_load_smem_elem(mds_ref, (i * 3 + j) * NLIMBS)
                for i in range(3)
                for j in range(3)
            ],
            axis=1,
        )  # (16, 9, L), row i*3+j = mds[i][j]

        def permute(s):
            def rnd(r, st):
                x2 = mulq(st, st)
                x3 = mulq(x2, st)
                t = mulq(mulq(x3, x3), st)  # x^7, (16, 3, L)
                t9 = jnp.concatenate([t, t, t], axis=1)  # rows [t0,t1,t2]*3
                prod = mulq(m9, t9).reshape(NLIMBS, 3, 3, LANE)
                out = addq(
                    addq(prod[:, :, 0, :], prod[:, :, 1, :]), prod[:, :, 2, :]
                )
                rc = jnp.concatenate(
                    [
                        _kv_load_smem_elem(rc_ref, (r * 3 + i) * NLIMBS)
                        for i in range(3)
                    ],
                    axis=1,
                )
                return addq(out, rc)

            return jax.lax.fori_loop(0, nrounds, rnd, s)

        st = in_ref[:, 0:3, :]
        xl = in_ref[:, 3:4, :]
        xr = in_ref[:, 4:5, :]
        yl = in_ref[:, 5:6, :]
        yr = in_ref[:, 6:7, :]
        zero1 = jnp.zeros_like(xl)
        st = permute(addq(st, jnp.concatenate([xl, yl, zero1], axis=1)))
        st = permute(addq(st, jnp.concatenate([xr, yr, zero1], axis=1)))
        one = jnp.stack(
            [lax.broadcast(one_std[i], (1, LANE)) for i in range(NLIMBS)]
        )
        chal = mulq(st[:, 0:1, :], one)  # REDC(x) = mont_mul(x, 1) = from_mont
        o_ref[:, 0:3, :] = st
        o_ref[:, 3:4, :] = chal

    out = pl.pallas_call(
        kernel,
        in_specs=[smem, smem, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, BLOCK_ROWS, LANE), jnp.uint32),
        interpret=_interpret(),
    )(rc_flat, mds_flat, packed)
    return out[:, 0:3, 0], out[:, 3:4, 0]


def bits128(chal) -> jax.Array:
    """(16, 1) canonical limbs -> (128,) int32 bit array (LSB first)."""
    li = np.arange(128) // LIMB_BITS
    sh = jnp.asarray(np.arange(128) % LIMB_BITS, dtype=jnp.uint32)
    vals = chal[jnp.asarray(li), 0]
    return ((vals >> sh) & 1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0, 1))
def endo_inv_fused(F: DeviceField, endo: int, bits):
    """ScalarChallenge.to_field + Fermat inverse of the result, one kernel.

    bits: (128,) int32 challenge bits (LSB first). endo: host int (the
    curve's endo_r). Returns (u (16,1), u_inv (16,1)) in Montgomery form.
    Algorithm: sponge.rs:190-228 (Halo 6.2 endo expansion), then
    u^(p-2) by LSB-first square-and-multiply — all in-kernel.
    """
    p = F.p
    e = p - 2
    nd = (e.bit_length() + 3) // 4
    edigs = jnp.asarray(
        np.array(
            [(e >> (4 * (nd - 1 - i))) & 15 for i in range(nd)], dtype=np.int32
        )
    )
    endo_np = int_to_limbs(endo * F.r_mod_p % p)
    two_np = int_to_limbs(2 * F.r_mod_p % p)
    one_np = int_to_limbs(F.r_mod_p)

    def const_tile(v):
        return jnp.stack([lax.broadcast(v[i], (1, LANE)) for i in range(NLIMBS)])

    spec = pl.BlockSpec(
        (NLIMBS, BLOCK_ROWS, LANE), lambda: (0, 0, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM if pltpu else None)

    def kernel(bits_ref, ebits_ref, o_ref):
        mulq = lambda u, v: _kv_mul_redc(F, u, v)
        addq = lambda u, v: _kv_add(F, u, v)
        subq = lambda u, v: _kv_sub(F, u, v)
        one = const_tile(one_np)
        two = const_tile(two_np)
        endo_t = const_tile(endo_np)

        def body(i0, ab):
            a, b = ab
            i = 63 - i0
            a = addq(a, a)
            b = addq(b, b)
            r_2i = bits_ref[2 * i]
            r_2i1 = bits_ref[2 * i + 1]
            a_s = jnp.where(r_2i == 1, addq(a, one), subq(a, one))
            b_s = jnp.where(r_2i == 1, addq(b, one), subq(b, one))
            a = jnp.where(r_2i1 == 1, a_s, a)
            b = jnp.where(r_2i1 == 1, b, b_s)
            return (a, b)

        a, b = jax.lax.fori_loop(0, 64, body, (two, two))
        u = addq(mulq(a, endo_t), b)

        # windowed Fermat inverse (4-bit MSB-first digits in SMEM)
        tab = [one, u]
        for _ in range(14):
            tab.append(mulq(tab[-1], u))

        def pbody(i, acc):
            for _ in range(4):
                acc = mulq(acc, acc)
            return mulq(acc, _tab_select(tab, ebits_ref[i]))

        u_inv = jax.lax.fori_loop(0, nd, pbody, one)
        o_ref[:, 0:1, :] = u
        o_ref[:, 1:2, :] = u_inv

    out = pl.pallas_call(
        kernel,
        in_specs=[smem, smem],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, BLOCK_ROWS, LANE), jnp.uint32),
        interpret=_interpret(),
    )(bits, edigs)
    return out[:, 0:1, 0], out[:, 1:2, 0]


# ---------------------------------------------------------------------------
# Fused EC prefix scan. Pippenger bucket accumulation needs cumulative
# Jacobian sums along the sorted-point axis (ops/msm.py); the XLA blocked
# scan pays ~0.2-0.3 ms of launch overhead per sequential EC-add step
# (~145 steps per MSM call = ~45 ms, launch-bound: the adds themselves
# are ~3 ms of compute at the fused kernel's ~90M adds/s). This kernel
# runs the whole two-level blocked scan inside one pallas_call:
#   - positions laid out lane-major (segment l = lanes), statically
#     unrolled inner scan along the C chunk axis,
#   - Hillis-Steele across the 128 lane segment-totals (7 shifted adds;
#     the identity z=0 shifts in as neutral),
#   - one vectorized combine of exclusive lane offsets into all chunks.
# ---------------------------------------------------------------------------


def _ec_scan_kernel(F: DeviceField, C: int):
    """Kernel body. Refs are (C, 16, bg, 128): the chunk axis is the
    OUTERMOST dim so the sequential chunk scan indexes it dynamically
    (plain address offsets); the EC add is traced once per phase (9
    traced adds total) to keep trace/compile time bounded."""

    def kernel(x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
        def rd(c):
            return (x_ref[c], y_ref[c], z_ref[c])  # (16, bg, 128)

        def wr(c, t):
            ox_ref[c] = t[0]
            oy_ref[c] = t[1]
            oz_ref[c] = t[2]

        # 1. inclusive scan along the chunk axis (EC add traced ONCE)
        wr(0, rd(0))

        def chunk_body(c, carry):
            nxt = _kv_ec_add(F, carry, rd(c))
            wr(c, nxt)
            return nxt

        tot = jax.lax.fori_loop(1, C, chunk_body, rd(0)) if C > 1 else rd(0)

        # 2. exclusive Hillis-Steele across the 128 lane segment-totals
        # (one traced EC add on TPU via fori + dynamic roll)
        excl = _hs_scan_ec(F, tot)

        # 3. combine lane offsets into every chunk (EC add traced once)
        def comb_body(c, excl):
            wr(c, _kv_ec_add(F, excl, (ox_ref[c], oy_ref[c], oz_ref[c])))
            return excl

        jax.lax.fori_loop(0, C, comb_body, excl)

    return kernel


def _mont_scan_kernel(F: DeviceField, C: int):
    """Inclusive Montgomery prefix-PRODUCT scan (same blocked structure
    as _ec_scan_kernel; the Hillis-Steele shift-in neutral is one_mont,
    not zero). Refs are (C, 16, bg, 128)."""
    one_np = np.array(
        [(F.r_mod_p >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)],
        dtype=np.uint32,
    )

    def kernel(x_ref, o_ref):
        def rd(c):
            return x_ref[c]

        def wr(c, t):
            o_ref[c] = t

        wr(0, rd(0))

        def chunk_body(c, carry):
            nxt = _kv_mul_redc(F, carry, rd(c))
            wr(c, nxt)
            return nxt

        tot = jax.lax.fori_loop(1, C, chunk_body, rd(0)) if C > 1 else rd(0)

        bshape = tot.shape[1:]
        ones = jnp.stack(
            [lax.broadcast(one_np[i], bshape) for i in range(NLIMBS)]
        )
        excl0 = _hs_scan_mont(F, tot, ones)

        def comb_body(c, excl):
            wr(c, _kv_mul_redc(F, excl, o_ref[c]))
            return excl

        jax.lax.fori_loop(0, C, comb_body, excl0)

    return kernel


def _mont_parts_kernel(F: DeviceField, cb: int, nC: int):
    """Streamed phases 1-2 of the Montgomery product scan (structure of
    _ec_parts_kernel): grid step (i, j) folds chunk block j into a VMEM
    scratch carry; the last step emits the exclusive per-lane offsets.
    Bounds VMEM at any n (batch inversions over W·n scaled-basis arrays
    reach C≈8192 at k=15 — a whole-(C,...) block can never fit)."""
    one_np = np.array(
        [(F.r_mod_p >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)],
        dtype=np.uint32,
    )

    def kernel(x_ref, o_ref, e_ref, c_ref):
        j = pl.program_id(1)

        def chunk_body(c, carry):
            nxt = _kv_mul_redc(F, carry, x_ref[c])
            o_ref[c] = nxt
            return nxt

        @pl.when(j == 0)
        def _seed():
            first = x_ref[0]
            o_ref[0] = first
            c_ref[...] = (
                jax.lax.fori_loop(1, cb, chunk_body, first) if cb > 1 else first
            )

        @pl.when(j != 0)
        def _cont():
            c_ref[...] = jax.lax.fori_loop(0, cb, chunk_body, c_ref[...])

        @pl.when(j == nC - 1)
        def _finish():
            tot = c_ref[...]
            bshape = tot.shape[1:]
            ones = jnp.stack(
                [lax.broadcast(one_np[i], bshape) for i in range(NLIMBS)]
            )
            e_ref[...] = _hs_scan_mont(F, tot, ones)

    return kernel


def mont_prefix_scan_parts(F: DeviceField, x):
    """Streamed product-scan parts: returns (partial, excl, Cp) with the
    same position convention as ec_prefix_scan_parts — the inclusive
    prefix product of position j is excl[..., j // Cp] * partial[..., j]."""
    partial, excl = _mont_prefix_scan_parts_core(F, x)
    return partial, excl, _scan_geometry(x.shape[-1])[2]


@functools.partial(jax.jit, static_argnums=(0,))
def _mont_prefix_scan_parts_core(F: DeviceField, x):
    shape = x.shape
    n = shape[-1]
    B = 1
    for d in shape[1:-1]:
        B *= d
    cb, nC, Cp = _scan_geometry(n)
    npad = Cp * LANE
    B8 = -(-B // 8) * 8
    bg = _legal_bg(B8, cb, budget=272)

    one = jnp.asarray(int_to_limbs(F.r_mod_p)).reshape(NLIMBS, 1, 1)
    a = x.reshape(NLIMBS, B, n)
    a = jnp.concatenate(
        [a, jnp.broadcast_to(one, (NLIMBS, B, npad - n))], axis=-1
    ) if npad != n else a
    if B8 != B:
        a = jnp.pad(a, [(0, 0), (0, B8 - B), (0, 0)])
    a = a.reshape(NLIMBS, B8, LANE, Cp).transpose(3, 0, 1, 2)

    grid = (B8 // bg, nC)
    spec = pl.BlockSpec(
        (cb, NLIMBS, bg, LANE), lambda i, j: (j, 0, i, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )
    espec = pl.BlockSpec(
        (NLIMBS, bg, LANE), lambda i, j: (0, i, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )
    scratch = (
        [pltpu.VMEM((NLIMBS, bg, LANE), jnp.uint32)]
        if pltpu
        else [jax.ShapeDtypeStruct((NLIMBS, bg, LANE), jnp.uint32)]
    )
    out, ex = pl.pallas_call(
        _mont_parts_kernel(F, cb, nC),
        grid=grid,
        in_specs=[spec],
        out_specs=(spec, espec),
        out_shape=(
            jax.ShapeDtypeStruct((Cp, NLIMBS, B8, LANE), jnp.uint32),
            jax.ShapeDtypeStruct((NLIMBS, B8, LANE), jnp.uint32),
        ),
        scratch_shapes=scratch,
        interpret=_interpret(),
        compiler_params=_ec_compiler_params(dims=("arbitrary", "arbitrary")),
    )(a)
    partial = out[:, :, :B].transpose(1, 2, 3, 0).reshape(NLIMBS, B, npad)
    partial = partial.reshape((NLIMBS, *shape[1:-1], npad))
    excl = ex[:, :B].reshape((NLIMBS, *shape[1:-1], LANE))
    return partial, excl


@functools.partial(jax.jit, static_argnums=0)
def mont_prefix_scan_fused(F: DeviceField, x):
    """Inclusive Montgomery prefix products along the LAST axis, the
    whole blocked scan in ONE kernel (limb.prefix_mul's two lax.scans
    cost ~0.2 ms of loop-step latency per iteration on the axon runtime
    — ~2*sqrt(n) iterations per call). Long scans (C > 64) stream via
    mont_prefix_scan_parts + one elementwise combine kernel."""
    shape = x.shape
    n = shape[-1]
    B = 1
    for d in shape[1:-1]:
        B *= d
    C = -(-n // LANE)
    if C > 64:
        partial, excl, Cp = mont_prefix_scan_parts(F, x)
        exb = jnp.repeat(excl, Cp, axis=-1)  # position j -> excl[j // Cp]
        return mont_mul(F, partial, exb)[..., :n].reshape(shape)
    npad = C * LANE

    a = x.reshape(NLIMBS, B, n)
    if npad != n:
        one = jnp.broadcast_to(
            jnp.asarray(int_to_limbs(F.r_mod_p)).reshape(NLIMBS, 1, 1),
            (NLIMBS, B, npad - n),
        )
        a = jnp.concatenate([a, one], axis=-1)
    B8 = -(-B // 8) * 8
    bg = _legal_bg(B8, C, budget=272)
    if B8 != B:
        a = jnp.pad(a, [(0, 0), (0, B8 - B), (0, 0)])
    a = a.reshape(NLIMBS, B8, LANE, C).transpose(3, 0, 1, 2)

    grid = (B8 // bg,)
    spec = pl.BlockSpec(
        (C, NLIMBS, bg, LANE), lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )
    out = pl.pallas_call(
        _mont_scan_kernel(F, C),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((C, NLIMBS, B8, LANE), jnp.uint32),
        interpret=_interpret(),
        compiler_params=_ec_compiler_params(),
    )(a)
    out = out[:, :, :B].transpose(1, 2, 3, 0).reshape(NLIMBS, B, npad)[:, :, :n]
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnums=(0, 2))
def linear_scan_fused(F: DeviceField, x, c_int: int):
    """Inclusive first-order recurrence s_j = x_j + c·s_{j-1} (STATIC c)
    along the last axis, one kernel. Used for division by (X - c): with
    x the REVERSED coefficients, s is poly.divide_by_linear's scan.

    Blocked like the prefix scans; every segment map is x -> V + c^C·x
    (uniform multiplier), so the lane Hillis-Steele multiplier is the
    static constant c^(C·2^k) per level and the per-chunk combine
    multiplier c^(chunk+1) comes from an SMEM power table."""
    p = F.p
    shape = x.shape
    n = shape[-1]
    B = 1
    for d in shape[1:-1]:
        B *= d
    C = -(-n // LANE)
    npad = C * LANE

    B8 = -(-B // 8) * 8
    a = x.reshape(NLIMBS, B, n)
    if npad != n or B8 != B:
        a = jnp.pad(a, [(0, 0), (0, B8 - B), (0, npad - n)])
    a = a.reshape(NLIMBS, B8, LANE, C).transpose(3, 0, 1, 2)

    # static Montgomery-form constants: c, c^(C·2^k) for the HS levels,
    # and the SMEM table c^(chunk+1) for the combine phase
    cm = int_to_limbs(c_int % p * F.r_mod_p % p)
    hs_consts = [
        int_to_limbs(pow(c_int, C * (1 << k), p) * F.r_mod_p % p)
        for k in range(7)  # LANE = 2^7
    ]
    ctab = np.concatenate(
        [
            int_to_limbs(pow(c_int, ci + 1, p) * F.r_mod_p % p)
            for ci in range(C)
        ]
    ).astype(np.uint32)  # (C*16,), limbs of c^(ci+1) at ci*16

    bg = _legal_bg(B8, C, budget=272)
    grid = (B8 // bg,)
    spec = pl.BlockSpec(
        (C, NLIMBS, bg, LANE), lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM if pltpu else None)

    def kernel(tab_ref, x_ref, o_ref):
        def const_tile(v, bshape):
            return jnp.stack(
                [lax.broadcast(np.uint32(v[i]), bshape) for i in range(NLIMBS)]
            )

        def rd(c):
            return x_ref[c]

        bshape = rd(0).shape[1:]
        cmt = const_tile(cm, bshape)

        o_ref[0] = rd(0)

        def chunk_body(c, carry):
            nxt = _kv_add(F, rd(c), _kv_mul_redc(F, cmt, carry))
            o_ref[c] = nxt
            return nxt

        tot = jax.lax.fori_loop(1, C, chunk_body, rd(0)) if C > 1 else rd(0)

        def shift_lanes(t, s):
            return lax.pad(
                t, _Z, [(0, 0, 0)] * (t.ndim - 1) + [(s, 0, 0)]
            )[..., :LANE]

        # lane recurrence S_l = V_l + c^C·S_{l-1}: uniform-multiplier HS
        for k in range(7):
            qk = const_tile(hs_consts[k], bshape)
            tot = _kv_add(F, tot, _kv_mul_redc(F, qk, shift_lanes(tot, 1 << k)))
        excl = shift_lanes(tot, 1)  # E_l = S_{l-1}

        def comb_body(c, _):
            rows = [
                lax.broadcast(tab_ref[c * NLIMBS + l], bshape)
                for l in range(NLIMBS)
            ]
            qc = jnp.stack(rows)
            o_ref[c] = _kv_add(F, o_ref[c], _kv_mul_redc(F, qc, excl))
            return _

        jax.lax.fori_loop(0, C, comb_body, 0)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((C, NLIMBS, B8, LANE), jnp.uint32),
        interpret=_interpret(),
        compiler_params=_ec_compiler_params(),
    )(jnp.asarray(ctab), a)
    out = out[:, :, :B].transpose(1, 2, 3, 0).reshape(NLIMBS, B, npad)[:, :, :n]
    return out.reshape(shape)


_SCAN_BG = int(os.environ.get("PST_SCAN_BG", "0"))  # 0 = auto


def _legal_bg(B8: int, C: int, budget: int = 136) -> int:
    """Pick a batch-group block size: Mosaic requires the second-to-last
    block dim be a multiple of 8 (or the full dim), and C*bg (8,128)-vregs
    per ref must fit VMEM. B8 must be a multiple of 8."""
    if _SCAN_BG:
        bg = min(B8, _SCAN_BG)
    else:
        bg = min(B8, max(8, (budget // max(C, 1)) // 8 * 8))
    bg -= bg % 8
    bg = max(bg, 8)
    while B8 % bg:
        bg -= 8
    return bg


def _ec_parts_kernel(F: DeviceField, cb: int, nC: int, mixed: bool = False):
    """Phases 1-2 of the blocked scan only (no per-position combine),
    streamed over the chunk axis: grid step (i, j) processes chunk block
    j (cb chunks) of batch group i, carrying the running per-lane prefix
    in VMEM scratch. Bounds VMEM at any scan length n (the whole-array
    formulation needed C*bg blocks — u32[17,16,1024,128] overflowed the
    16 MiB scoped-vmem at k=11, and k>=15 (C=256) could never fit).

    mixed=True: the INPUTS are affine-encoded (z ∈ {0, 1·R}) and the
    sequential chunk accumulation uses the cheaper mixed addition
    (madd-2007-bl) — phase 2 stays general Jacobian adds.

    Outputs: partial (Cp, 16, bg, 128) inclusive chunk-scan values and
    excl (16, bg, 128) EXCLUSIVE lane offsets, so the inclusive prefix of
    position j = l*Cp + c is excl[l] + partial[c, l]. Callers that only
    need a few prefix values (Pippenger bucket boundaries: 2*2^c of n)
    gather from these and pay ONE elementwise EC add per gathered value
    instead of the full phase-3 combine (Cp tile-adds over every
    position — ~45%% of the scan's work)."""

    def kernel(
        x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref, ex_ref, ey_ref, ez_ref,
        cx_ref, cy_ref, cz_ref,
    ):
        j = pl.program_id(1)
        step = _kv_ec_madd if mixed else _kv_ec_add

        def rd(c):
            return (x_ref[c], y_ref[c], z_ref[c])

        def wr(c, t):
            ox_ref[c] = t[0]
            oy_ref[c] = t[1]
            oz_ref[c] = t[2]

        def save(t):
            cx_ref[...] = t[0]
            cy_ref[...] = t[1]
            cz_ref[...] = t[2]

        def chunk_body(c, carry):
            nxt = step(F, carry, rd(c))
            wr(c, nxt)
            return nxt

        @pl.when(j == 0)
        def _seed():
            first = rd(0)
            wr(0, first)
            save(jax.lax.fori_loop(1, cb, chunk_body, first) if cb > 1 else first)

        @pl.when(j != 0)
        def _cont():
            carry = (cx_ref[...], cy_ref[...], cz_ref[...])
            save(jax.lax.fori_loop(0, cb, chunk_body, carry))

        @pl.when(j == nC - 1)
        def _finish():
            # exclusive Hillis-Steele over the lane totals; shifted-in
            # zeros are the identity (z=0)
            tot = _hs_scan_ec(F, (cx_ref[...], cy_ref[...], cz_ref[...]))
            ex_ref[...] = tot[0]
            ey_ref[...] = tot[1]
            ez_ref[...] = tot[2]

    return kernel


def _shift_lanes_static(a, s: int):
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(s, 0)])[..., :LANE]


def _hs_scan_ec(F: DeviceField, tot):
    """EXCLUSIVE Hillis-Steele EC prefix over the lane axis.

    On TPU the 7 doubling levels run inside ONE lax.fori_loop whose lane
    shift is a dynamic pltpu.roll — the EC add body is traced once, not
    7 times (tracing _kv_ec_add costs ~6 s per instantiation; the HS
    unroll dominated the per-process MSM trace, measured 190 s/shape).
    Interpret mode (CPU tests) keeps the static unroll: pltpu.roll
    lowers only on real TPU."""
    tot = tuple(_shift_lanes_static(a, 1) for a in tot)
    if _interpret():
        s = 1
        while s < LANE:
            tot = _kv_ec_add(
                F, tot, tuple(_shift_lanes_static(a, s) for a in tot)
            )
            s *= 2
        return tot

    def shifted(t, s):
        idx = lax.broadcasted_iota(jnp.int32, t[0].shape, t[0].ndim - 1)
        keep = idx >= s

        def one(a):
            return jnp.where(keep, pltpu.roll(a, s, a.ndim - 1), jnp.zeros_like(a))

        return (one(t[0]), one(t[1]), one(t[2]))

    def hs_body(k, t):
        s = lax.shift_left(jnp.int32(1), k)
        return _kv_ec_add(F, t, shifted(t, s))

    return jax.lax.fori_loop(0, 7, hs_body, tot)


def _hs_scan_mont(F: DeviceField, tot, ones):
    """EXCLUSIVE Hillis-Steele Montgomery-product prefix over the lane
    axis (shift-in neutral = 1·R). Same fori+roll trick as _hs_scan_ec."""

    def shift_static(a, s):
        return jnp.concatenate([ones[..., :s], a[..., : LANE - s]], axis=-1)

    tot = shift_static(tot, 1)
    if _interpret():
        s = 1
        while s < LANE:
            tot = _kv_mul_redc(F, tot, shift_static(tot, s))
            s *= 2
        return tot

    idx = lax.broadcasted_iota(jnp.int32, tot.shape, tot.ndim - 1)

    def hs_body(k, t):
        s = lax.shift_left(jnp.int32(1), k)
        sh = jnp.where(idx >= s, pltpu.roll(t, s, t.ndim - 1), ones)
        return _kv_mul_redc(F, t, sh)

    return jax.lax.fori_loop(0, 7, hs_body, tot)


def _scan_geometry(n: int) -> tuple[int, int, int]:
    """(cb, nC, Cp) chunk-blocking for the streamed scans: C = ceil(n/128)
    split into near-equal blocks of at most PST_SCAN_CB chunks (minimises
    Cp-C lane-padding waste: C=17 with fixed cb=16 would give Cp=32 —
    half the lanes idle)."""
    C = -(-n // LANE)
    cbmax = min(int(os.environ.get("PST_SCAN_CB", "16")), C)
    nC = -(-C // cbmax)
    cb = -(-C // nC)
    return cb, nC, cb * nC


def ec_prefix_scan_parts(F: DeviceField, x, y, z, mixed: bool = False):
    """Public wrapper: jitted core + the static segment length Cp."""
    partial, excl = _ec_prefix_scan_parts_core(F, x, y, z, mixed=mixed)
    return partial, excl, _scan_geometry(x.shape[-1])[2]


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("mixed",))
def _ec_prefix_scan_parts_core(F: DeviceField, x, y, z, mixed: bool = False):
    """Blocked-scan PARTS along the last axis (see _ec_parts_kernel).

    x/y/z: (16, *batch, n) Montgomery Jacobian limbs (z == 0 = identity).
    Returns (partial, excl, C): partial leaves are (16, *batch, n_pad)
    position-indexed like the input (n padded up to C*128, identity
    padding); excl leaves are (16, *batch, 128) per-lane exclusive
    offsets. The inclusive prefix of position j is
    excl[.., j // C] + partial[.., j].
    """
    shape = x.shape
    n = shape[-1]
    B = 1
    for d in shape[1:-1]:
        B *= d
    cb, nC, Cp = _scan_geometry(n)
    npad = Cp * LANE
    B8 = -(-B // 8) * 8
    bg = _legal_bg(B8, cb)

    def prep(a):
        a = a.reshape(NLIMBS, B, n)
        a = jnp.pad(a, [(0, 0), (0, B8 - B), (0, npad - n)])
        return a.reshape(NLIMBS, B8, LANE, Cp).transpose(3, 0, 1, 2)

    xs, ys, zs = prep(x), prep(y), prep(z)
    grid = (B8 // bg, nC)
    spec = pl.BlockSpec(
        (cb, NLIMBS, bg, LANE), lambda i, j: (j, 0, i, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )
    espec = pl.BlockSpec(
        (NLIMBS, bg, LANE), lambda i, j: (0, i, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((Cp, NLIMBS, B8, LANE), jnp.uint32) for _ in range(3)
    ) + tuple(
        jax.ShapeDtypeStruct((NLIMBS, B8, LANE), jnp.uint32) for _ in range(3)
    )
    scratch = (
        [pltpu.VMEM((NLIMBS, bg, LANE), jnp.uint32) for _ in range(3)]
        if pltpu
        else [jax.ShapeDtypeStruct((NLIMBS, bg, LANE), jnp.uint32)] * 3
    )
    ox, oy, oz, ex, ey, ez = pl.pallas_call(
        _ec_parts_kernel(F, cb, nC, mixed),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec, espec, espec, espec),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
        compiler_params=_ec_compiler_params(dims=("arbitrary", "arbitrary")),
    )(xs, ys, zs)

    def unprep(a):
        # (Cp, 16, B8, L) -> (16, *batch, L*Cp), position-indexed (j = l*Cp + c)
        a = a[:, :, :B].transpose(1, 2, 3, 0).reshape(NLIMBS, B, npad)
        return a.reshape((NLIMBS, *shape[1:-1], npad))

    def unprep_e(a):
        return a[:, :B].reshape((NLIMBS, *shape[1:-1], LANE))

    partial = (unprep(ox), unprep(oy), unprep(oz))
    excl = (unprep_e(ex), unprep_e(ey), unprep_e(ez))
    return partial, excl


@functools.partial(jax.jit, static_argnums=0)
def ec_prefix_scan_fused(F: DeviceField, x, y, z):
    """Inclusive Jacobian prefix scan along the LAST axis.

    x/y/z: (16, *batch, n) Montgomery limbs (z == 0 marks infinity).
    Returns same-shaped inclusive prefixes. Semantically identical to
    ops/scan.blocked_prefix_scan over DeviceCurve.add.
    """
    shape = x.shape
    n = shape[-1]
    B = 1
    for d in shape[1:-1]:
        B *= d
    C = -(-n // LANE)
    npad = C * LANE

    def prep(a):
        a = a.reshape(NLIMBS, B, n)
        a = jnp.pad(a, [(0, 0), (0, B8 - B), (0, npad - n)])
        # lane-major segments: position j = l*C + c -> [c, :, :, l]
        return a.reshape(NLIMBS, B8, LANE, C).transpose(3, 0, 1, 2)

    # grid over the batch so a block stays within VMEM; bg must be a
    # multiple of 8 (Mosaic block-shape rule), so pad B up to B8
    B8 = -(-B // 8) * 8
    bg = _legal_bg(B8, C)
    xs, ys, zs = prep(x), prep(y), prep(z)
    grid = (B8 // bg,)
    spec = pl.BlockSpec(
        (C, NLIMBS, bg, LANE), lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM if pltpu else None,
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((C, NLIMBS, B8, LANE), jnp.uint32) for _ in range(3)
    )
    ox, oy, oz = pl.pallas_call(
        _ec_scan_kernel(F, C),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=_ec_compiler_params(),
    )(xs, ys, zs)

    def unprep(a):
        a = a[:, :, :B].transpose(1, 2, 3, 0).reshape(NLIMBS, B, npad)[:, :, :n]
        return a.reshape(shape)

    return unprep(ox), unprep(oy), unprep(oz)
