"""Device polynomial helpers: powers, point evaluation, exact divisions.

These replace arkworks' coefficient-space routines used by the prover:
  - divide_by_vanishing_poly (x^n - 1): block suffix sums — the quotient
    of an 8n-coefficient polynomial is 7 shifted block adds, no NTT
    (SURVEY.md §7 hard part 7),
  - division by a linear factor (x - c) for the permutation bnd terms
    (permutation.rs:210-340): an affine-map composition scan
    (q_k = f_{k+1} + c q_{k+1}) via ops/scan.blocked_prefix_scan,
  - batched evaluation at a point as <coeffs, powers> dot products.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import limb, ntt
from .limb import NLIMBS, DeviceField
from .scan import blocked_prefix_scan


def powers_dev(F: DeviceField, x: int, n: int) -> jax.Array:
    """[1, x, .., x^(n-1)] device Montgomery array via log-depth doubling.

    x^(2^k) steps come from a device squaring chain — ONE host->device
    transfer total (a per-step pack_mont was one tunnel transfer per
    doubling on the axon runtime)."""
    arr = F.one_mont((1,))
    if n <= 1:
        return arr[:, :n]
    step = F.pack_mont([x], shape=(1,))  # x^length, length = 1
    length = 1
    while length < n:
        arr = jnp.concatenate([arr, limb.mont_mul(F, arr, step)], axis=-1)
        length *= 2
        if length < n:
            step = limb.mont_sqr(F, step)
    return arr[:, :n]


def _pad_pow2(a: jax.Array) -> jax.Array:
    n = a.shape[-1]
    m = 1
    while m < n:
        m *= 2
    if m == n:
        return a
    pad = jnp.zeros((*a.shape[:-1], m - n), dtype=a.dtype)
    return jnp.concatenate([a, pad], axis=-1)


def eval_at(F: DeviceField, coeffs: jax.Array, powers: jax.Array) -> list[int]:
    """Evaluate (16, b, L) Montgomery coefficient rows at the point whose
    power vector (16, L) is given. Returns b host ints."""
    prod = limb.mont_mul(F, coeffs, powers[:, None, :] if powers.ndim == 2 else powers)
    res = ntt.sum_mod(F, _pad_pow2(prod))
    return F.unpack_mont(res)


def eval_at2(F: DeviceField, coeffs: jax.Array, pow_a: jax.Array, pow_b: jax.Array):
    """Evaluate (16, b, L) rows at TWO points with one reduction and ONE
    device->host fetch (each fetch is a sync roundtrip through the axon
    tunnel). Returns (evals_a, evals_b) as host int lists."""
    pows = jnp.stack([pow_a, pow_b], axis=1)  # (16, 2, L)
    prod = limb.mont_mul(F, coeffs[:, None], pows[:, :, None, :])  # (16,2,b,L)
    res = ntt.sum_mod(F, _pad_pow2(prod))  # (16, 2, b)
    flat = F.unpack_mont(res)
    b = coeffs.shape[1]
    return flat[:b], flat[b:]


def divide_by_vanishing(F: DeviceField, coeffs: jax.Array, n: int):
    """f / (x^n - 1) for deg f < 8n: returns (quotient (16, 7n), remainder
    (16, n)). q block i = Σ_{j>i} block j; remainder = Σ all blocks."""
    L = coeffs.shape[-1]
    total = ((L + n - 1) // n) * n
    if total != L:
        pad = jnp.zeros((*coeffs.shape[:-1], total - L), dtype=coeffs.dtype)
        coeffs = jnp.concatenate([coeffs, pad], axis=-1)
    nblocks = total // n
    blocks = [coeffs[..., i * n : (i + 1) * n] for i in range(nblocks)]
    # suffix sums
    suffix = [None] * nblocks
    acc = blocks[-1]
    for i in range(nblocks - 2, -1, -1):
        suffix[i] = acc  # Σ_{j>i}
        acc = limb.add(F, acc, blocks[i])
    remainder = acc  # Σ all
    q = jnp.concatenate(suffix[: nblocks - 1], axis=-1) if nblocks > 1 else jnp.zeros_like(coeffs[..., :0])
    return q, remainder


def divide_by_linear(F: DeviceField, coeffs: jax.Array, c: int):
    """f / (x - c): returns (quotient (16, L-1), remainder host int).

    Scan of affine maps s_j = f_j + c*s_{j+1} from the top coefficient;
    the final state is f(c) (the remainder)."""
    L = coeffs.shape[-1]
    rev = coeffs[..., ::-1]
    ones = jnp.broadcast_to(F.one_mont((1,)), rev.shape)
    cs = jnp.broadcast_to(F.const_mont(c, (1,)), rev.shape)

    def op(a, b):
        v1, m1 = a
        v2, m2 = b
        return (limb.add(F, v2, limb.mont_mul(F, m2, v1)), limb.mont_mul(F, m1, m2))

    ident = (F.zeros((1,)), F.one_mont((1,)))
    vs, _ = blocked_prefix_scan(op, ident, (rev, cs), L)
    # vs[i] = s_{L-1-i}; quotient q_k = s_{k+1} = vs[L-2-k]
    q = vs[..., : L - 1][..., ::-1]
    rem = F.unpack_mont(vs[..., L - 1 : L])[0]
    return q, rem
