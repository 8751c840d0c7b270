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

The arithmetic is the same canonical Montgomery SOS+REDC as ops/limb.py
(same bounds analysis); parity is enforced in tests/test_pallas_field.py
against both the host golden model and the XLA path.

Kernels run on real TPU (Mosaic); under CPU tests they fall back to
pallas interpret mode automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend: present in jax>=0.4 but import varies
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from .limb import LIMB_BITS, MASK, NLIMBS, DeviceField

BLOCK_ROWS = 8  # sublanes per grid step (one (8,128) vreg per limb row)
LANE = 128


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# In-kernel limb arithmetic on lists of (rows, 128) uint32 arrays
# ---------------------------------------------------------------------------


def _k_mul_redc(F: DeviceField, a: list, b: list) -> list:
    """Montgomery product on unstacked limb lists (canonical in/out)."""
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * NLIMBS)
    for i in range(NLIMBS):
        ai = a[i]
        for j in range(NLIMBS):
            prod = ai * b[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    # normalize columns to canonical 16-bit limbs
    t = []
    carry = zero
    for c in cols:
        v = c + carry
        t.append(v & MASK)
        carry = v >> LIMB_BITS
    # REDC
    P = F.p_limbs_np
    pinv = F.pinv
    t = t + [zero]
    carry = zero
    for i in range(NLIMBS):
        v = t[i] + carry
        m = (v * pinv) & MASK
        prod0 = m * P[0]
        v0 = v + (prod0 & MASK)
        carry = v0 >> LIMB_BITS
        hi_prev = prod0 >> LIMB_BITS
        for j in range(1, NLIMBS):
            pr = m * P[j]
            t[i + j] = t[i + j] + (pr & MASK) + hi_prev
            hi_prev = pr >> LIMB_BITS
        t[i + NLIMBS] = t[i + NLIMBS] + hi_prev
    res = []
    c2 = carry
    for k in range(NLIMBS, 2 * NLIMBS):
        v = t[k] + c2
        res.append(v & MASK)
        c2 = v >> LIMB_BITS
    # conditional subtract p (result < 2p)
    top = c2
    d = []
    borrow = zero
    for i in range(NLIMBS):
        v = res[i] - P[i] - borrow
        d.append(v & MASK)
        borrow = v >> 31
    use_sub = jnp.logical_or(top != 0, borrow == 0)
    return [jnp.where(use_sub, x, y) for x, y in zip(d, res)]


def _k_add(F: DeviceField, a: list, b: list) -> list:
    zero = jnp.zeros_like(a[0])
    P = F.p_limbs_np
    s = []
    carry = zero
    for i in range(NLIMBS):
        v = a[i] + b[i] + carry
        s.append(v & MASK)
        carry = v >> LIMB_BITS
    d = []
    borrow = zero
    for i in range(NLIMBS):
        v = s[i] - P[i] - borrow
        d.append(v & MASK)
        borrow = v >> 31
    return [jnp.where(borrow != 0, x, y) for x, y in zip(s, d)]


def _k_sub(F: DeviceField, a: list, b: list) -> list:
    zero = jnp.zeros_like(a[0])
    P = F.p_limbs_np
    d = []
    borrow = zero
    for i in range(NLIMBS):
        v = a[i] - b[i] - borrow
        d.append(v & MASK)
        borrow = v >> 31
    dp = []
    carry = zero
    for i in range(NLIMBS):
        v = d[i] + P[i] + carry
        dp.append(v & MASK)
        carry = v >> LIMB_BITS
    return [jnp.where(borrow != 0, x, y) for x, y in zip(dp, d)]


def _k_dbl(F, a):
    return _k_add(F, a, a)


def _k_is_zero(a: list):
    acc = a[0] == 0
    for x in a[1:]:
        acc = jnp.logical_and(acc, x == 0)
    return acc


def _k_select(cond, t: list, f: list) -> list:
    return [jnp.where(cond, x, y) for x, y in zip(t, f)]




def _k_ec_double(F: DeviceField, p1):
    """dbl-2009-l on in-kernel limb lists."""
    x1, y1, z1 = p1
    mul = lambda u, v: _k_mul_redc(F, u, v)
    add_ = lambda u, v: _k_add(F, u, v)
    sub_ = lambda u, v: _k_sub(F, u, v)
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


def _k_ec_add(F: DeviceField, p1, p2):
    """Complete Jacobian add (add-2007-bl + dbl/inf fallbacks) on
    in-kernel limb lists (same algorithm as the jacobian_add kernel)."""
    (x1, y1, z1), (x2, y2, z2) = p1, p2
    mul = lambda u, v: _k_mul_redc(F, u, v)
    add_ = lambda u, v: _k_add(F, u, v)
    sub_ = lambda u, v: _k_sub(F, u, v)
    p_inf = _k_is_zero(z1)
    q_inf = _k_is_zero(z2)
    z1z1 = mul(z1, z1)
    z2z2 = mul(z2, z2)
    u1 = mul(x1, z2z2)
    u2 = mul(x2, z1z1)
    s1 = mul(y1, mul(z2, z2z2))
    s2 = mul(y2, mul(z1, z1z1))
    h = sub_(u2, u1)
    rr = sub_(s2, s1)
    r2 = add_(rr, rr)
    h_zero = _k_is_zero(h)
    r_zero = _k_is_zero(r2)
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
    dx, dy, dz = _k_ec_double(F, (x1, y1, z1))
    use_dbl = jnp.logical_and(h_zero, r_zero)
    to_inf = jnp.logical_and(h_zero, jnp.logical_not(r_zero))
    zero = [jnp.zeros_like(x3[0])] * NLIMBS
    x = _k_select(use_dbl, dx, x3)
    y = _k_select(use_dbl, dy, y3)
    z = _k_select(use_dbl, dz, z3)
    z = _k_select(jnp.logical_and(to_inf, jnp.logical_not(p_inf)), zero, z)
    x = _k_select(p_inf, x2, x)
    y = _k_select(p_inf, y2, y)
    z = _k_select(p_inf, z2, z)
    x = _k_select(q_inf, x1, x)
    y = _k_select(q_inf, y1, y)
    z = _k_select(q_inf, z1, z)
    return x, y, z


def _rows(ref, base: int) -> list:
    return [ref[base + i] for i in range(NLIMBS)]


def _store(ref, base: int, limbs: list) -> None:
    for i in range(NLIMBS):
        ref[base + i] = limbs[i]


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
        _store(o_ref, 0, _k_mul_redc(F, _rows(a_ref, 0), _rows(b_ref, 0)))

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
        x1, y1, z1 = _rows(px_r, 0), _rows(py_r, 0), _rows(pz_r, 0)
        x2, y2, z2 = _rows(qx_r, 0), _rows(qy_r, 0), _rows(qz_r, 0)
        mul = lambda u, v: _k_mul_redc(F, u, v)
        add_ = lambda u, v: _k_add(F, u, v)
        sub_ = lambda u, v: _k_sub(F, u, v)

        p_inf = _k_is_zero(z1)
        q_inf = _k_is_zero(z2)
        z1z1 = mul(z1, z1)
        z2z2 = mul(z2, z2)
        u1 = mul(x1, z2z2)
        u2 = mul(x2, z1z1)
        s1 = mul(y1, mul(z2, z2z2))
        s2 = mul(y2, mul(z1, z1z1))
        h = sub_(u2, u1)
        rr = sub_(s2, s1)
        r2 = add_(rr, rr)
        h_zero = _k_is_zero(h)
        r_zero = _k_is_zero(r2)

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

        # doubling fallback (dbl-2009-l)
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

        use_dbl = jnp.logical_and(h_zero, r_zero)
        to_inf = jnp.logical_and(h_zero, jnp.logical_not(r_zero))
        zero = [jnp.zeros_like(x3[0])] * NLIMBS

        x = _k_select(use_dbl, dx, x3)
        y = _k_select(use_dbl, dy, y3)
        z = _k_select(use_dbl, dz, z3)
        z = _k_select(jnp.logical_and(to_inf, jnp.logical_not(p_inf)), zero, z)
        x = _k_select(p_inf, x2, x)
        y = _k_select(p_inf, y2, y)
        z = _k_select(p_inf, z2, z)
        x = _k_select(q_inf, x1, x)
        y = _k_select(q_inf, y1, y)
        z = _k_select(q_inf, z1, z)
        _store(ox_r, 0, x)
        _store(oy_r, 0, y)
        _store(oz_r, 0, z)

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
        x1, y1, z1 = _rows(px_r, 0), _rows(py_r, 0), _rows(pz_r, 0)
        mul = lambda u, v: _k_mul_redc(F, u, v)
        add_ = lambda u, v: _k_add(F, u, v)
        sub_ = lambda u, v: _k_sub(F, u, v)
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
        _store(ox_r, 0, dx)
        _store(oy_r, 0, dy)
        _store(oz_r, 0, dz)

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


def _stack16(lst):
    return jnp.stack(lst, axis=0)


def _unstack16(arr):
    return [arr[i] for i in range(NLIMBS)]


@functools.partial(jax.jit, static_argnums=(0, 2))
def mont_pow_fused(F: DeviceField, a: jax.Array, e: int) -> jax.Array:
    """a^e (Montgomery, static exponent) with the whole square-and-multiply
    chain inside ONE kernel (vs ops/limb.mont_pow's ~e.bit_length() XLA
    loop iterations)."""
    import numpy as np

    shape = a.shape
    ap, n = _pad_to_block(a)
    nbits = max(e.bit_length(), 1)
    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.int32)
    )
    one_ints = [
        int((F.r_mod_p >> (LIMB_BITS * i)) & int(MASK)) for i in range(NLIMBS)
    ]

    def kernel(bits_ref, a_ref, o_ref):
        base0 = _stack16(_rows(a_ref, 0))
        one = _stack16(
            [jnp.full_like(a_ref[0], one_ints[i]) for i in range(NLIMBS)]
        )

        def body(i, carry):
            acc, base = carry
            prod = _stack16(_k_mul_redc(F, _unstack16(acc), _unstack16(base)))
            acc = jnp.where(bits_ref[i] == 1, prod, acc)
            base = _stack16(_k_mul_redc(F, _unstack16(base), _unstack16(base)))
            return acc, base

        acc, _ = jax.lax.fori_loop(0, nbits, body, (one, base0))
        _store(o_ref, 0, _unstack16(acc))

    m = ap.shape[1]
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
    )(bits, ap)
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
            def one(ref):
                v = ref[:, pl.dslice(w * BLOCK_ROWS, BLOCK_ROWS), :]
                return [v[i] for i in range(NLIMBS)]

            return one(x_ref), one(y_ref), one(z_ref)

        def body(i, acc):
            w = W - 1 - i

            def dbl(_, p):
                return _k_ec_double(F, p)

            acc = jax.lax.fori_loop(0, c, dbl, acc)
            return _k_ec_add(F, acc, load_win(w))

        zero = [
            jnp.zeros((BLOCK_ROWS, LANE), dtype=jnp.uint32)
            for _ in range(NLIMBS)
        ]
        acc0 = (list(zero), list(zero), list(zero))
        x, y, z = jax.lax.fori_loop(0, W, body, acc0)
        for i in range(NLIMBS):
            o_ref[i, 0:BLOCK_ROWS, :] = x[i]
            o_ref[i, BLOCK_ROWS : 2 * BLOCK_ROWS, :] = y[i]
            o_ref[i, 2 * BLOCK_ROWS : 3 * BLOCK_ROWS, :] = z[i]

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
