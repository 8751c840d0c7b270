"""Vectorized 256-bit modular arithmetic for TPU (uint32 limb vectors).

This is the compute foundation of the whole framework: every NTT
butterfly, MSM point operation, Poseidon round and constraint
evaluation bottoms out in the modular ops defined here.

Design (TPU-first, see /opt/skills/guides/pallas_guide.md):
  - A field element is 16 limbs x 16 bits stored in uint32 lanes,
    **limb-major**: an array of N elements has shape (16, N) so that a
    single limb of many elements is contiguous in the 128-wide lane
    dimension of the VPU. The TPU has no 64-bit scalar unit; 16x16-bit
    limb products fit *exactly* in uint32, so all arithmetic below is
    exact by construction.
  - Montgomery representation (R = 2^256): multiplication is SOS
    (separated operand scanning) — full 512-bit product accumulated in
    per-column uint32 sums, then a 16-step REDC. Inputs/outputs are
    canonical (< p). Overflow analysis (asserted in DeviceField):
      * product column sums: <= 32 half-terms * (2^16-1) < 2^21
      * REDC column values stay < 2^22; carries < 2^7; the m*P
        half-split keeps every add below 2^32.
  - Ops are formulated tensor-level (outer products + static shifted
    pads) rather than per-limb scalar slices, keeping the HLO graph
    small (~400 instructions per multiply): XLA compile time, not
    runtime, is the binding constraint for composite kernels.
  - Sequential structures (prefix products) use lax.scan with chunked
    two-level blocking so the compiled graph stays O(1) in n.

The host golden model is proof_systems_tpu.fields (exact Python ints);
parity is enforced in tests/test_limb.py.

Reference semantics: arkworks Montgomery fields as instantiated in
curves/src/pasta/fields/{fp,fq}.rs (4x64 Montgomery there; the limb
split here is a TPU layout choice, the ring semantics are identical).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldParams

NLIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1
NBITS = NLIMBS * LIMB_BITS  # 256
R = 1 << NBITS

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------


def int_to_limbs(x: int) -> np.ndarray:
    """One integer -> (16,) uint32 limb vector (little-endian 16-bit limbs)."""
    return np.array([(x >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)], dtype=np.uint32)


def ints_to_limbs(xs: Sequence[int] | np.ndarray, shape=None) -> np.ndarray:
    """Sequence of ints -> (16, len(xs)) uint32 (or (16, *shape)).

    Vectorized through a bytes round trip: at k=16 the witness pack is
    ~1M elements, so the per-limb Python loop this replaces was seconds
    of host time on the proving path."""
    xs = list(xs)
    buf = b"".join(int(x).to_bytes(32, "little") for x in xs)
    out = (
        np.frombuffer(buf, dtype="<u2")
        .reshape(len(xs), NLIMBS)
        .T.astype(np.uint32)
    )
    out = np.ascontiguousarray(out)
    if shape is not None:
        out = out.reshape((NLIMBS, *shape))
    return out


def limbs_to_ints(arr) -> list[int]:
    """(16, N...) limb array of canonical (<2^16) limbs -> list of ints."""
    a = np.asarray(jax.device_get(arr)).reshape(NLIMBS, -1)
    if a.size == 0:
        return []
    assert int(a.max()) <= MASK, "limbs_to_ints expects canonical 16-bit limbs"
    buf = a.T.astype("<u2").tobytes()
    return [
        int.from_bytes(buf[32 * j : 32 * (j + 1)], "little")
        for j in range(a.shape[1])
    ]


def limbs_to_int(arr) -> int:
    return limbs_to_ints(arr.reshape(NLIMBS, 1))[0]


# ---------------------------------------------------------------------------
# Field context
# ---------------------------------------------------------------------------


class DeviceField:
    """Per-modulus constants for the device kernels.

    Elements handled by mont_* functions are in Montgomery form (x·R mod p);
    add/sub/neg/select are representation-agnostic. Instances are interned
    via device_field(), so object identity is a valid jit static key.
    """

    def __init__(self, params: FieldParams):
        self.params = params
        p = params.p
        self.p = p
        p_np = int_to_limbs(p)
        assert int(p_np.max()) <= 0xFFFE, "REDC overflow bound violated"
        self.p_np = p_np
        self.p_limbs_np = [np.uint32(v) for v in p_np]
        self.pinv = np.uint32((-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
        self.r_mod_p = R % p
        self.r2_mod_p = (R * R) % p
        self.r_inv = pow(R, -1, p)

    def p_col(self, batch_ndim: int) -> jax.Array:
        """p as a (16, 1, 1, ...) broadcastable limb column."""
        return jnp.asarray(self.p_np).reshape((NLIMBS,) + (1,) * batch_ndim)

    # -- constants as device arrays --------------------------------------

    def const(self, x: int, batch_shape=()) -> jax.Array:
        """Canonical (non-Montgomery) constant, broadcast to batch_shape."""
        a = jnp.asarray(int_to_limbs(x % self.p))
        return jnp.broadcast_to(a.reshape((NLIMBS,) + (1,) * len(batch_shape)), (NLIMBS, *batch_shape))

    def const_mont(self, x: int, batch_shape=()) -> jax.Array:
        return self.const(x * self.r_mod_p % self.p, batch_shape)

    def zeros(self, batch_shape=()) -> jax.Array:
        return jnp.zeros((NLIMBS, *batch_shape), dtype=U32)

    def one_mont(self, batch_shape=()) -> jax.Array:
        return self.const(self.r_mod_p, batch_shape)

    # -- host conversion --------------------------------------------------

    def pack_mont(self, xs: Sequence[int], shape=None) -> jax.Array:
        """Python ints (standard form) -> device array in Montgomery form.

        The R-multiplication happens ON DEVICE (one batched mont_mul by
        R^2): the host Python `x * r % p` loop was ~0.6 us/element —
        ~25 ms per witness pack at k=11."""
        p = self.p
        arr = jnp.asarray(ints_to_limbs([x % p for x in xs], shape))
        return to_mont(self, arr)

    def unpack_mont(self, arr) -> list[int]:
        rinv = self.r_inv
        p = self.p
        return [x * rinv % p for x in limbs_to_ints(arr)]

    def pack(self, xs: Sequence[int], shape=None) -> jax.Array:
        return jnp.asarray(ints_to_limbs([x % self.p for x in xs], shape))

    def unpack(self, arr) -> list[int]:
        return limbs_to_ints(arr)


@functools.lru_cache(maxsize=None)
def device_field(params: FieldParams) -> DeviceField:
    return DeviceField(params)


# ---------------------------------------------------------------------------
# Tensor-level limb helpers. All arrays are (16, *batch) uint32.
# ---------------------------------------------------------------------------


def _compact_graphs() -> bool:
    """Choose lax.scan bodies over unrolled limb steps.

    On CPU (tests, multichip dryrun) XLA compiles at ~100 HLO ops/s and
    every composite graph inlines dozens of these sequential step chains
    — unrolled they dominate compile time (an EC add was 102 s to
    compile; scanned, 1.8 s). On TPU the unrolled form vectorizes
    better and the compile happens once server-side, so keep it.
    PST_NO_COMPACT=1 forces the unrolled form everywhere (debugging)."""
    import os

    if os.environ.get("PST_NO_COMPACT") == "1":
        return False
    return jax.default_backend() not in ("tpu", "axon")


def _ripple(cols: jax.Array, out_limbs: int) -> jax.Array:
    """Carry-normalize a (K, *batch) column array into out_limbs 16-bit limbs.

    Sequential over K (vectorized over batch); caller guarantees the
    final carry vanishes (checked by value-range arguments, not at runtime).
    """
    if _compact_graphs():
        k = cols.shape[0]
        if k < out_limbs:
            cols = jnp.concatenate(
                [cols, jnp.zeros((out_limbs - k, *cols.shape[1:]), dtype=cols.dtype)]
            )

        def body(carry, col):
            v = col + carry
            return v >> LIMB_BITS, v & MASK

        _, outs = jax.lax.scan(body, jnp.zeros_like(cols[0]), cols[:out_limbs])
        return outs
    outs = []
    carry = jnp.zeros_like(cols[0])
    for k in range(cols.shape[0]):
        v = cols[k] + carry
        outs.append(v & MASK)
        carry = v >> LIMB_BITS
    while len(outs) < out_limbs:
        outs.append(carry & MASK)
        carry = carry >> LIMB_BITS
    return jnp.stack(outs[:out_limbs], axis=0)


def _add_raw(a: jax.Array, b: jax.Array) -> jax.Array:
    """Canonical limb add -> canonical limbs + carry folded into a 17th row."""
    s = a + b  # columns < 2^17
    return _ripple(s, NLIMBS + 1)


def _sub_raw(a: jax.Array, b: jax.Array):
    """a - b limbwise; returns (canonical limbs, borrow mask)."""
    if _compact_graphs():

        def body(borrow, ab):
            v = ab[0] - ab[1] - borrow  # uint32 wraparound is exact mod 2^32
            return v >> 31, v & MASK

        borrow, outs = jax.lax.scan(
            body, jnp.zeros_like(a[0]), jnp.stack([a, b], axis=1)
        )
        return outs, borrow
    outs = []
    borrow = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        v = a[i] - b[i] - borrow  # uint32 wraparound is exact mod 2^32
        outs.append(v & MASK)
        borrow = v >> 31
    return jnp.stack(outs, axis=0), borrow


_jit_f = functools.partial(jax.jit, static_argnums=0)


@_jit_f
def add(F: DeviceField, a, b):
    """(a + b) mod p, canonical in/out. Representation-agnostic."""
    a, b = jnp.broadcast_arrays(a, b)
    s = _ripple(a + b, NLIMBS)  # carry-out is 0: a+b < 2p < 2^256
    t, borrow = _sub_raw(s, jnp.broadcast_to(F.p_col(a.ndim - 1), s.shape))
    return jnp.where((borrow != 0)[None], s, t)


@_jit_f
def sub(F: DeviceField, a, b):
    """(a - b) mod p, canonical in/out."""
    a, b = jnp.broadcast_arrays(a, b)
    d, borrow = _sub_raw(a, b)
    dp = _ripple(d + jnp.broadcast_to(F.p_col(a.ndim - 1), d.shape), NLIMBS)
    return jnp.where((borrow != 0)[None], dp, d)


@_jit_f
def neg(F: DeviceField, a):
    return sub(F, jnp.zeros_like(a), a)


@_jit_f
def double_mod(F: DeviceField, a):
    return add(F, a, a)


@_jit_f
def is_zero(F: DeviceField, a):
    """Boolean mask of elements equal to zero."""
    return jnp.all(a == 0, axis=0)


@_jit_f
def eq(F: DeviceField, a, b):
    return jnp.all(a == b, axis=0)


def select(cond, t, f):
    """Elementwise select over limb arrays; cond has batch shape."""
    return jnp.where(cond[None], t, f)


def _mul_columns(a: jax.Array, b: jax.Array) -> jax.Array:
    """(16,*B) x (16,*B) -> (32,*B) column sums of the 512-bit product.

    Outer product + lo/hi split + statically shifted pads. Column sums
    are < 2^21, leaving headroom for the REDC contributions.
    """
    prod = a[:, None] * b[None, :]  # (16, 16, *batch), exact in uint32
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    batch_pad = [(0, 0)] * (lo.ndim - 2)
    rows = []
    for i in range(NLIMBS):
        # place a_i*b low halves at columns i..i+15 (of 32), highs one up
        rows.append(jnp.pad(lo[i], [(i, NLIMBS - i)] + batch_pad))
        rows.append(jnp.pad(hi[i], [(i + 1, NLIMBS - i - 1)] + batch_pad))
    return functools.reduce(jnp.add, rows)


def _redc(F: DeviceField, cols: jax.Array) -> jax.Array:
    """Montgomery reduction of 32 product columns (each < 2^21) -> < p.

    Sequential over the 16 outer steps; per step one (16,*batch)
    broadcast multiply plus shifted-pad adds. Value bounds:
    columns < 2^21 (product) + 32*(2^16-1) (REDC halves) < 2^22;
    carries < 2^7; every uint32 add is exact.
    """
    batch_shape = cols.shape[1:]
    p_rows = jnp.asarray(F.p_np).reshape((NLIMBS,) + (1,) * len(batch_shape))
    if _compact_graphs():
        return _redc_tail(F, *_redc_scan(F, cols, p_rows))
    t = [cols[k] for k in range(32)]
    carry = jnp.zeros_like(t[0])
    out_lo = []  # the low 16 positions become zero; track their carries only
    for i in range(NLIMBS):
        v = t[i] + carry  # total value at position i (carried)
        m = (v * F.pinv) & MASK
        prod = m[None] * p_rows  # (16, *batch)
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        # position i: v + lo[0] ≡ 0 (mod 2^16); push its carry right
        v0 = v + lo[0]
        carry = v0 >> LIMB_BITS
        # add remaining halves into columns i+1..i+16
        for j in range(1, NLIMBS):
            t[i + j] = t[i + j] + lo[j] + hi[j - 1]
        t[i + NLIMBS] = t[i + NLIMBS] + hi[NLIMBS - 1]
    return _redc_tail(F, jnp.stack([t[k] for k in range(NLIMBS, 32)], axis=0), carry)


def _redc_scan(F: DeviceField, cols: jax.Array, p_rows: jax.Array):
    """The 16 REDC steps as a lax.scan over a rolling 32-column buffer
    (compact-graph path; identical value flow to the unrolled loop in
    _redc, parity-checked in tests/test_limb.py)."""

    def body(state, _):
        buf, carry = state  # buf[0] is the current column
        v = buf[0] + carry
        m = (v * F.pinv) & MASK
        prod = m[None] * p_rows
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        carry_out = (v + lo[0]) >> LIMB_BITS
        batch_pad = [(0, 0)] * (buf.ndim - 1)
        # lo[1..15] land on columns 1..15; hi[0..15] on columns 1..16
        buf = buf + jnp.pad(lo[1:], [(1, NLIMBS)] + batch_pad)
        buf = buf + jnp.pad(hi, [(1, NLIMBS - 1)] + batch_pad)
        buf = jnp.roll(buf, -1, axis=0).at[-1].set(0)
        return (buf, carry_out), None

    carry0 = jnp.zeros_like(cols[0])
    (buf, carry), _ = jax.lax.scan(body, (cols, carry0), None, length=NLIMBS)
    return buf[:NLIMBS], carry


def _redc_tail(F: DeviceField, high: jax.Array, carry: jax.Array) -> jax.Array:
    """Final normalization shared by both REDC forms: ripple the high
    columns, fold the low-side carry, conditional subtract of p."""
    res = _ripple(high, NLIMBS + 1)
    low = jnp.zeros_like(res)
    low = low.at[0].set(carry)
    res = res + low  # res rows canonical; adding carry (<2^7) keeps row 0 < 2^17
    res = _ripple(res, NLIMBS + 1)
    top = res[NLIMBS]
    limbs = res[:NLIMBS]
    d, borrow = _sub_raw(limbs, jnp.broadcast_to(F.p_col(limbs.ndim - 1), limbs.shape))
    use_sub = jnp.logical_or(top != 0, borrow == 0)
    return jnp.where(use_sub[None], d, limbs)


@_jit_f
def mont_mul(F: DeviceField, a, b):
    """Montgomery product: (a * b * R^-1) mod p. Canonical in/out.

    On TPU this routes through the fused pallas kernel: the XLA form
    materializes a (16,16,*batch) outer product per multiply (25x the
    HBM traffic of the operands) and inlines ~400 HLO ops per call —
    both compile time and memory bandwidth scale with it. On CPU the
    XLA form stays (pallas interpret mode is far slower to compile)."""
    a, b = jnp.broadcast_arrays(a, b)
    if jax.default_backend() in ("tpu", "axon"):
        from . import pallas_field

        return pallas_field.mont_mul(F, a, b)
    return _redc(F, _mul_columns(a, b))


@_jit_f
def mont_sqr(F: DeviceField, a):
    return mont_mul(F, a, a)


@_jit_f
def to_mont(F: DeviceField, a):
    """Standard form -> Montgomery form (multiply by R^2)."""
    return mont_mul(F, a, F.const(F.r2_mod_p, a.shape[1:]))


@_jit_f
def from_mont(F: DeviceField, a):
    """Montgomery form -> standard form (REDC of the bare value)."""
    cols = jnp.concatenate([a, jnp.zeros_like(a)], axis=0)
    return _redc(F, cols)


@functools.partial(jax.jit, static_argnums=(0, 2))
def mont_pow(F: DeviceField, a, e: int):
    """a^e for a *static* exponent; a in Montgomery form.

    jax.lax.fori_loop over the exponent bits keeps the traced graph
    O(1) in the exponent size.
    """
    nbits = max(e.bit_length(), 1)
    bits = jnp.asarray(np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32))
    one = F.one_mont(a.shape[1:])

    def body(i, acc):
        bit = bits[nbits - 1 - i]  # MSB-first square-and-multiply
        acc = mont_sqr(F, acc)
        return select(bit == 1, mont_mul(F, acc, a), acc)

    return jax.lax.fori_loop(0, nbits, body, one)


@_jit_f
def inv(F: DeviceField, a):
    """Fermat inverse a^(p-2); a in Montgomery form, 0 -> 0.

    On TPU the square-and-multiply chain runs inside ONE pallas kernel
    (ops/pallas_field.mont_pow_fused): the XLA fori_loop path costs
    ~0.24 ms per loop step of runtime dispatch (~120 ms per inverse)."""
    if jax.default_backend() in ("tpu", "axon"):
        from . import pallas_field

        r = pallas_field.mont_pow_fused(F, a, F.p - 2)
    else:
        r = mont_pow(F, a, F.p - 2)
    return select(is_zero(F, a), jnp.zeros_like(a), r)


def _scan_chunk(F: DeviceField, chunk_len: int):
    def step(carry, x):
        nxt = mont_mul(F, carry, x)
        return nxt, nxt

    return step


@_jit_f
def prefix_mul(F: DeviceField, a):
    """Inclusive prefix products along the LAST axis.

    Two-level blocked lax.scan: within-chunk sequential scan (vectorized
    across chunks), then a scan over chunk totals, then a broadcast
    combine. Compiled graph size is O(1) in n; runtime depth ~2*sqrt(n).
    a: (16, n) Montgomery form (flatten other batch axes before calling).
    """
    n = a.shape[-1]
    assert a.ndim == 2, "prefix_mul expects (16, n)"
    if jax.default_backend() in ("tpu", "axon"):
        from . import pallas_field

        return pallas_field.mont_prefix_scan_fused(F, a)
    k = 1
    while k * k < n:
        k *= 2
    if n % k != 0:
        pad = k - n % k
        a = jnp.concatenate([a, jnp.broadcast_to(F.one_mont((pad,)), (NLIMBS, pad))], axis=-1)
    c = a.shape[-1] // k  # chunks
    ar = a.reshape(NLIMBS, c, k)

    def inner(carry, x):  # x: (16, c) — one position across all chunks
        nxt = mont_mul(F, carry, x)
        return nxt, nxt

    init = F.one_mont((c,))
    _, within = jax.lax.scan(inner, init, jnp.moveaxis(ar, 2, 0))  # (k, 16, c)
    within = jnp.moveaxis(within, 0, 2)  # (16, c, k) inclusive within-chunk

    totals = within[:, :, -1]  # (16, c)

    def outer(carry, x):  # prefix over chunk totals (exclusive)
        nxt = mont_mul(F, carry, x)
        return nxt, carry

    _, chunk_prefix = jax.lax.scan(outer, F.one_mont(()).reshape(NLIMBS, 1)[:, 0], jnp.moveaxis(totals, 1, 0))
    chunk_prefix = jnp.moveaxis(chunk_prefix, 0, 1)  # (16, c) exclusive prefix of totals

    out = mont_mul(F, within, chunk_prefix[:, :, None])
    return out.reshape(NLIMBS, c * k)[:, :n]


@_jit_f
def batch_inverse(F: DeviceField, a):
    """Montgomery-trick batch inversion along the last axis; zeros -> zero.

    One prefix-product sweep + ONE Fermat inversion of the total + one
    backward combine: ~3 multiplies per element.
    """
    shape = a.shape
    a2 = a.reshape(NLIMBS, -1)
    n = a2.shape[-1]
    zmask = is_zero(F, a2)
    ones = jnp.broadcast_to(F.one_mont((1,)), a2.shape)
    a1 = jnp.where(zmask[None], ones, a2)

    pref = prefix_mul(F, a1)  # P_i inclusive
    total_inv = inv(F, pref[:, -1:])

    # suffix products via reversed prefix scan
    suf = prefix_mul(F, a1[:, ::-1])[:, ::-1]  # S_i = a_i..a_{n-1}
    p_prev = jnp.concatenate([ones[:, :1], pref[:, :-1]], axis=-1)
    s_next = jnp.concatenate([suf[:, 1:], ones[:, :1]], axis=-1)
    out = mont_mul(F, mont_mul(F, p_prev, s_next), total_inv)
    out = jnp.where(zmask[None], jnp.zeros_like(out), out)
    return out.reshape(shape)
