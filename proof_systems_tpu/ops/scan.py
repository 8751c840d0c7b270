"""Blocked prefix scans for associative operators over pytrees.

jax.lax.associative_scan inlines the combine graph O(n) times, which is
unusable when the combine is a ~10k-HLO field/curve operation (XLA
compile time explodes). This module provides a two-level blocked scan:

  - reshape the n-axis into (C chunks x K positions), K ~ sqrt(n)
  - inclusive scan along K via lax.scan (op compiled ONCE, vectorized
    across chunks)
  - sequential lax.scan over the C chunk totals (op compiled once more)
  - one vectorized combine of chunk prefixes into within-chunk scans

Graph size is O(1) in n; runtime depth is ~2*sqrt(n) operator steps.

Used for: field prefix products (ops/limb.prefix_mul is the specialised
version), MSM bucket accumulation (cumulative Jacobian sums), and the
permutation/lookup grand products of the prover.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _reshape_last(leaf, c, k):
    return leaf.reshape(*leaf.shape[:-1], c, k)


def blocked_prefix_scan(op, identity, xs, n: int):
    """Inclusive prefix scan of `op` along the LAST axis of every leaf.

    op: (carry, x) -> combined, vectorized over arbitrary batch shapes.
    identity: pytree with leaves shaped like xs but last axis = 1
              (broadcastable identity element).
    xs: pytree of arrays (..., n).
    Returns pytree of inclusive prefixes, same shapes as xs.
    """
    k = 1
    while k * k < n:
        k *= 2
    pad = (-n) % k
    if pad:
        pad_tree = jax.tree.map(
            lambda ident, x: jnp.broadcast_to(ident, (*x.shape[:-1], pad)), identity, xs
        )
        xs = jax.tree.map(lambda x, pt: jnp.concatenate([x, pt], axis=-1), xs, pad_tree)
    total = n + pad
    c = total // k

    xs_ck = jax.tree.map(lambda x: _reshape_last(x, c, k), xs)
    # scan along K (leading axis for lax.scan), carrying (.., c)
    xs_scan = jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), xs_ck)  # (k, ..., c)
    init_c = jax.tree.map(
        lambda ident, x: jnp.broadcast_to(ident, (*x.shape[1:],)), identity, xs_scan
    )

    def inner(carry, x):
        nxt = op(carry, x)
        return nxt, nxt

    _, within = jax.lax.scan(inner, init_c, xs_scan)  # (k, ..., c)
    within = jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), within)  # (..., c, k)

    totals = jax.tree.map(lambda x: x[..., -1], within)  # (..., c)
    totals_scan = jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), totals)  # (c, ...)
    init_1 = jax.tree.map(lambda ident: ident[..., 0], identity)

    def outer(carry, x):
        nxt = op(carry, x)
        return nxt, carry  # emit EXCLUSIVE prefix

    _, chunk_prefix = jax.lax.scan(outer, init_1, totals_scan)  # (c, ...)
    chunk_prefix = jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1)[..., None], chunk_prefix)

    out = op(chunk_prefix, within)  # broadcast (..., c, 1) into (..., c, k)
    out = jax.tree.map(lambda x: x.reshape(*x.shape[:-2], c * k)[..., :n], out)
    return out
