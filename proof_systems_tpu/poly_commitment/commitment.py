"""Commitment types and host-side protocol scalar helpers.

Host side of the polynomial commitment layer: tiny exact computations on
Python ints (challenges, evaluation combination, the b(X) challenge
polynomial) that sit between device kernel calls.

Reference semantics: poly-commitment/src/commitment.rs
  - PolyComm            (commitment.rs:45)
  - shift_scalar        (commitment.rs:271)
  - b_poly              (commitment.rs:416)
  - b_poly_coefficients (commitment.rs:454)
  - combined_inner_product (commitment.rs:612)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..curves import AffinePoint, CurveParams
from ..fields import FieldParams


@dataclass
class PolyComm:
    """A (possibly chunked) commitment: one curve point per chunk."""

    chunks: list[AffinePoint]

    def __len__(self) -> int:
        return len(self.chunks)


def poly_comm_add(curve: CurveParams, a: PolyComm, b: PolyComm) -> PolyComm:
    n = max(len(a), len(b))
    out = []
    for i in range(n):
        if i < len(a) and i < len(b):
            out.append(curve.add(a.chunks[i], b.chunks[i]))
        elif i < len(a):
            out.append(a.chunks[i])
        else:
            out.append(b.chunks[i])
    return PolyComm(out)


def poly_comm_scale(curve: CurveParams, a: PolyComm, s: int) -> PolyComm:
    return PolyComm([curve.scalar_mul(s, c) for c in a.chunks])


def shift_scalar(curve: CurveParams, x: int) -> int:
    """commitment.rs:271 — compensates the in-circuit scalar encoding.

    x - 2^255 when |scalar field| > |base field|, else (x - (2^255+1))/2.
    (255 = MODULUS_BIT_SIZE of the scalar field for both Pasta curves.)
    """
    f = curve.scalar
    two_pow = pow(2, 255, f.p)
    if f.p < curve.base.p:
        return (x - (two_pow + 1)) * pow(2, -1, f.p) % f.p
    return (x - two_pow) % f.p


def b_poly(f: FieldParams, chals: list[int], x: int) -> int:
    """b(x) = prod_i (1 + chals[i] * x^(2^(k-1-i))) (commitment.rs:416)."""
    k = len(chals)
    pow_twos = [x]
    for _ in range(1, k):
        pow_twos.append(pow_twos[-1] * pow_twos[-1] % f.p)
    res = 1
    for i in range(k):
        res = res * (1 + chals[i] * pow_twos[k - 1 - i]) % f.p
    return res


def b_poly_coefficients(f: FieldParams, chals: list[int]) -> list[int]:
    """Coefficients of b(X): s_i = prod_{j: bit_j(i)=1} chals[k-1-j]."""
    rounds = len(chals)
    s = [1] * (1 << rounds)
    k = 0
    pw = 1
    for i in range(1, 1 << rounds):
        if i == pw:
            k += 1
            pw <<= 1
        s[i] = s[i - (pw >> 1)] * chals[rounds - k] % f.p
    return s


def combined_inner_product(
    f: FieldParams, polyscale: int, evalscale: int, polys: list[list[list[int]]]
) -> int:
    """commitment.rs:612 — Σ_k Σ_i polyscale^{..} (Σ_j evals[k][j][i] evalscale^j).

    polys[k][j][i]: polynomial k, evaluation point j, chunk i.
    """
    res = 0
    xi_i = 1
    for evals_tr in polys:
        if not evals_tr[0]:
            continue
        nchunks = len(evals_tr[0])
        for i in range(nchunks):
            # eval_polynomial over the evaluation points with evalscale
            term = 0
            for j in reversed(range(len(evals_tr))):
                term = (term * evalscale + evals_tr[j][i]) % f.p
            res = (res + xi_i * term) % f.p
            xi_i = xi_i * polyscale % f.p
    return res


def pows(f: FieldParams, n: int, x: int) -> list[int]:
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * x % f.p
    return out
