"""LogUp: lookups via logarithmic derivatives (msm/src/logup.rs,
o1vm/src/pickles/lookup_{prover,verifier}.rs).

Protocol (eprint 2022/1530, PlonK-quotient variant — logup.rs:14-100):
(a_i) is included in table (b_i) with multiplicities m iff

    sum_j  1/(beta + f_j(w^i))  ==  sum_i  m(w^i)/(beta + t(w^i)).

Per row the "inner sum" h = sum_j 1/(beta+f_j) - m/(beta+t) is folded
into a running accumulator phi with phi(w^{i+1}) = phi(w^i) + h(w^i);
the cyclic telescoping over H forces sum h = 0 without any boundary
constraint. The constraint is degree-cleared (logup.rs eq. (5)):

  (phi_next - phi_curr) * (beta+t) * prod_j (beta+f_j)
    == (beta+t) * sum_j prod_{i!=j} (beta+f_i)  -  m * prod_j (beta+f_j)

beta is squeezed AFTER committing f, t, m (two-phase prove_columns);
phi is the only beta-dependent column.

TPU note: multiplicity counting and the phi prefix sum are host-side
setup per proof; batch inversion + blocked prefix scans (ops/limb.py,
ops/scan.py) give the device path for big traces.
"""

from __future__ import annotations

from collections import Counter

from ..circuits import expr as E
from .pickles import col


def range_table(bits: int, n: int) -> list[int]:
    """[0, 2^bits) range-check table padded with zeros to n rows."""
    assert (1 << bits) <= n
    return list(range(1 << bits)) + [0] * (n - (1 << bits))


def multiplicities(lookups: list[list[int]], table: list[int], p: int) -> list[int]:
    """m[i] = how many times table[i] is looked up. Duplicate table
    entries (zero padding) carry the count on their first occurrence."""
    counts = Counter(v % p for row in lookups for v in row)
    first: dict[int, int] = {}
    for i, t in enumerate(table):
        first.setdefault(t % p, i)
    m = [0] * len(table)
    for v, c in counts.items():
        if v not in first:
            raise ValueError(f"looked-up value {v} not in table")
        m[first[v]] += c
    return m


def phi_column(
    lookups: list[list[int]], table: list[int], m: list[int], beta: int, p: int
) -> list[int]:
    """The running aggregator: phi[0] = 0, phi[i+1] = phi[i] + h[i];
    wraps to zero exactly when the lookup relation holds."""
    n = len(table)
    phi = [0] * n
    acc = 0
    for i in range(n):
        h = 0
        for v in lookups[i]:
            h += pow((beta + v) % p, -1, p)
        h -= m[i] * pow((beta + table[i]) % p, -1, p)
        phi[i] = acc
        acc = (acc + h) % p
    if acc != 0:
        raise ValueError("logup relation does not hold: phi does not wrap to 0")
    return phi


def logup_constraint(k: int, f_idx: list[int], t_idx: int, m_idx: int, phi_idx: int) -> E.Expr:
    """The cleared-denominator constraint over column indices (logup.rs
    eq. (5)); degree k + 2."""
    beta = E.Challenge("beta")
    f = [beta + E.Cell(col(i), E.CURR) for i in f_idx]
    t = beta + E.Cell(col(t_idx), E.CURR)
    m = E.Cell(col(m_idx), E.CURR)
    phi = E.Cell(col(phi_idx), E.CURR)
    phi_next = E.Cell(col(phi_idx), E.NEXT)

    prod_f: E.Expr = E.Literal(1)
    for fj in f:
        prod_f = prod_f * fj
    sum_partials: E.Expr = E.Literal(0)
    for j in range(k):
        part: E.Expr = E.Literal(1)
        for i in range(k):
            if i != j:
                part = part * f[i]
        sum_partials = sum_partials + part
    return (phi_next - phi) * t * prod_f - (t * sum_partials - m * prod_f)


class LogupInstance:
    """Bundle: lookup columns + table + multiplicities, ready for the
    two-phase column prover. Column order: [f_1..f_k, t, m, | phi]."""

    def __init__(self, f_field, lookups: list[list[int]], table: list[int]):
        self.f = f_field
        p = f_field.p
        self.k = len(lookups[0])
        assert all(len(r) == self.k for r in lookups)
        self.lookups = [[v % p for v in row] for row in lookups]
        self.table = [t % p for t in table]
        self.m = multiplicities(self.lookups, self.table, p)

    def phase1_columns(self) -> list[list[int]]:
        fcols = [[row[j] for row in self.lookups] for j in range(self.k)]
        return fcols + [self.table, self.m]

    def make_beta_columns(self, F):
        def build(beta: int):
            phi = phi_column(self.lookups, self.table, self.m, beta, self.f.p)
            return F.pack_mont(phi, shape=(1, len(phi)))

        return build

    def constraint(self) -> E.Expr:
        k = self.k
        return logup_constraint(k, list(range(k)), k, k + 1, k + 2)

    def prove(self, domain, srs, curve, rng):
        from ..ops import limb
        from .pickles import prove_columns

        F = limb.device_field(curve.scalar)
        cols = self.phase1_columns()
        n = len(self.table)
        dev = F.pack_mont([v for c in cols for v in c], shape=(len(cols), n))
        return prove_columns(
            domain, srs, curve, dev, [self.constraint()], rng,
            make_beta_columns=self.make_beta_columns(F),
        )

    def verify(self, domain, srs, curve, proof, rng) -> bool:
        from .pickles import verify_columns

        return verify_columns(
            domain, srs, curve, [self.constraint()], proof, rng, num_beta_columns=1
        )
