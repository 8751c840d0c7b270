"""MVPoly properties (mirror of mvpoly/src/pbt.rs test strategy)."""

import random

from proof_systems_tpu.circuits import expr as E
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.folding.mvpoly import (
    MVPoly,
    compute_combined_cross_terms,
)

P = Fp.p


def rand_point(rng, n):
    return [rng.randrange(1, P) for _ in range(n)]


def test_ring_ops_match_eval():
    rng = random.Random(1)
    n, d = 3, 2
    a = MVPoly.random(rng, P, n, 2 * d)
    b = MVPoly.random(rng, P, n, 2 * d)
    # restrict to degree d so products stay within 2d
    a.terms = {e: c for e, c in a.terms.items() if sum(e) <= d}
    b.terms = {e: c for e, c in b.terms.items() if sum(e) <= d}
    x = rand_point(rng, n)
    assert (a + b).eval(x) == (a.eval(x) + b.eval(x)) % P
    assert (a - b).eval(x) == (a.eval(x) - b.eval(x)) % P
    assert (a * b).eval(x) == a.eval(x) * b.eval(x) % P
    assert (-a).eval(x) == (P - a.eval(x)) % P
    assert a.mul_by_scalar(7).eval(x) == 7 * a.eval(x) % P


def test_degree_and_flags():
    p = MVPoly(P, 2, 4)
    p.add_monomial((1, 1), 3)
    p.add_monomial((0, 0), 5)
    assert p.degree() == 2
    assert p.is_multilinear() and not p.is_homogeneous()
    q = MVPoly(P, 2, 2, {(2, 0): 1, (1, 1): 4})
    assert q.is_homogeneous()
    assert not q.is_multilinear()
    c = MVPoly.constant(P, 2, 2, 9)
    assert c.is_constant() and c.degree() == 0


def test_homogeneous_eval():
    rng = random.Random(2)
    n, d = 3, 4
    poly = MVPoly.random(rng, P, n, d)
    x = rand_point(rng, n)
    u = rng.randrange(1, P)
    # sum over monomials of c * u^(d - |e|) * x^e
    want = 0
    for e, c in poly.terms.items():
        m = c * pow(u, d - sum(e), P)
        for xi, ei in zip(x, e):
            m *= pow(xi, ei, P)
        want += m
    assert poly.homogeneous_eval(x, u) == want % P
    # u = 1 reduces to plain eval
    assert poly.homogeneous_eval(x, 1) == poly.eval(x)


def test_cross_terms_identity():
    """P_hom(e1 + r e2, u1 + r u2) == ct_0 + sum r^k ct_k + r^D ct_D."""
    rng = random.Random(3)
    n, d = 4, 3
    poly = MVPoly.random(rng, P, n, d)
    e1, e2 = rand_point(rng, n), rand_point(rng, n)
    u1, u2 = rng.randrange(1, P), rng.randrange(1, P)
    cts = poly.compute_cross_terms(e1, e2, u1, u2)
    assert set(cts) == set(range(1, d))
    for _ in range(3):
        r = rng.randrange(1, P)
        folded = [(a + r * b) % P for a, b in zip(e1, e2)]
        uf = (u1 + r * u2) % P
        lhs = poly.homogeneous_eval(folded, uf)
        rhs = poly.homogeneous_eval(e1, u1)
        for k, c in cts.items():
            rhs += c * pow(r, k, P)
        rhs += poly.homogeneous_eval(e2, u2) * pow(r, d, P)
        assert lhs == rhs % P


def test_cross_terms_scaled_identity():
    """Scaled variant treats the scalar as one more folded variable."""
    rng = random.Random(4)
    n, d = 3, 3
    poly = MVPoly.random(rng, P, n, d)
    e1, e2 = rand_point(rng, n), rand_point(rng, n)
    u1, u2 = rng.randrange(1, P), rng.randrange(1, P)
    s1, s2 = rng.randrange(1, P), rng.randrange(1, P)
    cts = poly.compute_cross_terms_scaled(e1, e2, u1, u2, s1, s2)
    assert set(cts) == set(range(1, d + 1))
    for _ in range(3):
        r = rng.randrange(1, P)
        folded = [(a + r * b) % P for a, b in zip(e1, e2)]
        uf = (u1 + r * u2) % P
        sf = (s1 + r * s2) % P
        lhs = sf * poly.homogeneous_eval(folded, uf) % P
        rhs = s1 * poly.homogeneous_eval(e1, u1)
        for k, c in cts.items():
            rhs += c * pow(r, k, P)
        rhs += s2 * poly.homogeneous_eval(e2, u2) * pow(r, d + 1, P)
        assert lhs == rhs % P


def test_combined_cross_terms_identity():
    rng = random.Random(5)
    n, d, m = 3, 2, 4
    polys = [MVPoly.random(rng, P, n, d) for _ in range(m)]
    e1, e2 = rand_point(rng, n), rand_point(rng, n)
    u1, u2 = rng.randrange(1, P), rng.randrange(1, P)
    c1, c2 = rng.randrange(1, P), rng.randrange(1, P)
    cts = compute_combined_cross_terms(polys, e1, e2, u1, u2, c1, c2)
    r = rng.randrange(1, P)
    folded = [(a + r * b) % P for a, b in zip(e1, e2)]
    uf = (u1 + r * u2) % P
    # each alpha^i folds as an independent variable: alpha_i = c1^i + r c2^i
    lhs = sum(
        (pow(c1, i, P) + r * pow(c2, i, P)) * poly.homogeneous_eval(folded, uf)
        for i, poly in enumerate(polys)
    )
    rhs = sum(
        pow(c1, i, P) * poly.homogeneous_eval(e1, u1) for i, poly in enumerate(polys)
    )
    for k, c in cts.items():
        rhs += c * pow(r, k, P)
    rhs += pow(r, d + 1, P) * sum(
        pow(c2, i, P) * poly.homogeneous_eval(e2, u2) for i, poly in enumerate(polys)
    )
    assert lhs % P == rhs % P


def test_from_expr():
    # (x0 + 2)*(x1 - x0) + x1^2 with Cell columns mapped by identity
    x0 = E.Cell(0, E.CURR)
    x1 = E.Cell(1, E.CURR)
    ast = (x0 + E.Literal(2)) * (x1 - x0) + x1 * x1
    poly = MVPoly.from_expr(ast, P, 2, 2, lambda c: c)
    rng = random.Random(6)
    for _ in range(4):
        a, b = rng.randrange(P), rng.randrange(P)
        want = ((a + 2) * (b - a) + b * b) % P
        assert poly.eval([a, b]) == want


def test_from_expr_next_row():
    # x_curr * y_next with offset_next_row=2 -> vars (x0, x1, x2, x3)
    ast = E.Cell(0, E.CURR) * E.Cell(1, E.NEXT)
    poly = MVPoly.from_expr(ast, P, 4, 2, lambda c: c, offset_next_row=2)
    assert poly.terms == {(1, 0, 0, 1): 1}


# ---------------------------------------------------------------------------
# Prime (dense) representation + property-based tests (mvpoly/src/prime.rs,
# mvpoly/src/pbt.rs — proptest suites run on both representations there;
# random-iteration loops are the analogue here).
# ---------------------------------------------------------------------------

import random as _random

from proof_systems_tpu.folding.mvpoly import PrimeMVPoly, _normalized_indices


def test_prime_normalized_indices():
    # prime.rs doc example: N=2, D=2 -> {1, 2, 3, 4, 6, 9}
    assert _normalized_indices(2, 2) == [1, 2, 3, 4, 6, 9]
    # dimension equals the monomial count: C(N+D, D)
    from math import comb

    for n, d in [(2, 2), (3, 3), (4, 2)]:
        assert len(_normalized_indices(n, d)) == comb(n + d, d)


def test_prime_pbt_algebra_laws():
    p = P
    rng = _random.Random(11)
    N, D = 3, 3
    for _ in range(8):
        a = PrimeMVPoly.random(rng, p, N, D)
        b = PrimeMVPoly.random(rng, p, N, D)
        c = PrimeMVPoly.random(rng, p, N, D)
        zero = PrimeMVPoly(p, N, D)
        assert (a + b) == (b + a)
        assert ((a + b) + c) == (a + (b + c))
        assert (a + zero) == a
        assert (a - a).is_zero()
        assert (-(-a)) == a
        assert a.mul_by_scalar(1) == a
        assert a.mul_by_scalar(0).is_zero()
        x = [rng.randrange(p) for _ in range(N)]
        assert (a + b).eval(x) == (a.eval(x) + b.eval(x)) % p
        assert (a - b).eval(x) == (a.eval(x) - b.eval(x)) % p
        s = rng.randrange(p)
        assert a.mul_by_scalar(s).eval(x) == a.eval(x) * s % p


def test_prime_pbt_mul_matches_eval():
    p = P
    rng = _random.Random(12)
    N = 3
    for _ in range(8):
        # degree-<=2 factors inside a degree-4 space so products stay valid
        a = PrimeMVPoly(p, N, 4)
        b = PrimeMVPoly(p, N, 4)
        for poly in (a, b):
            for v in poly.indices:
                if sum(poly._exp_of_index(v)) <= 2:
                    poly.coeffs[poly.pos[v]] = rng.randrange(p)
        x = [rng.randrange(p) for _ in range(N)]
        assert (a * b).eval(x) == a.eval(x) * b.eval(x) % p
        assert (a * b).degree() <= 4


def test_prime_monomial_roundtrip_and_predicates():
    p = P
    rng = _random.Random(13)
    for _ in range(6):
        m = MVPoly.random(rng, p, 3, 3)
        pr = PrimeMVPoly.from_monomials(m)
        assert pr.to_monomials() == m
        x = [rng.randrange(p) for _ in range(3)]
        assert pr.eval(x) == m.eval(x)
        u = rng.randrange(1, p)
        assert pr.homogeneous_eval(x, u) == m.homogeneous_eval(x, u)
        assert pr.degree() == m.degree()
        assert pr.is_homogeneous() == m.is_homogeneous()
        assert pr.is_multilinear() == m.is_multilinear()
    assert PrimeMVPoly.constant(p, 3, 3, 7).is_constant()
    assert not PrimeMVPoly.variable(p, 3, 3, 1).is_constant()


def test_prime_cross_terms_match_monomial():
    """Cross-term parity between the two representations, and the
    defining identity P_hom(e1 + r e2) = P1 + sum r^k ct_k + r^D P2."""
    p = P
    rng = _random.Random(14)
    N, D = 3, 3
    m = MVPoly.random(rng, p, N, D)
    pr = PrimeMVPoly.from_monomials(m)
    e1 = [rng.randrange(p) for _ in range(N)]
    e2 = [rng.randrange(p) for _ in range(N)]
    u1, u2 = rng.randrange(1, p), rng.randrange(1, p)
    ct_m = m.compute_cross_terms(e1, e2, u1, u2)
    ct_p = pr.compute_cross_terms(e1, e2, u1, u2)
    assert ct_m == ct_p
    for _ in range(4):
        r = rng.randrange(1, p)
        lhs = m.homogeneous_eval(
            [(a + r * b) % p for a, b in zip(e1, e2)], (u1 + r * u2) % p
        )
        rhs = m.homogeneous_eval(e1, u1)
        for k, ck in ct_m.items():
            rhs = (rhs + ck * pow(r, k, p)) % p
        rhs = (rhs + pow(r, D, p) * m.homogeneous_eval(e2, u2)) % p
        assert lhs == rhs
