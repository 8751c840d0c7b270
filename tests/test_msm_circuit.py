"""Foreign-field MSM circuit (msm/ crate analogue): planner semantics,
full constraint+lookup satisfaction row-by-row, and (heavy) e2e
prove+verify with tampered-statement negatives."""

import random

import pytest

from proof_systems_tpu import msm_circuit as M
from proof_systems_tpu.circuits import expr as E
from proof_systems_tpu.fields import Fp

P = Fp.p

# toy foreign curve over a 63-bit prime (4f >= 2^64 covers the
# non-canonical operand bound at lb=8, nl=8)
TOY_F = (1 << 63) - 25
TOY = M.ForeignCurve(f=TOY_F, a=5, b=7)
TOY_LAYOUT = M.Layout(limb_bits=8, fbits=64)


def toy_points(k, seed=7):
    rng = random.Random(seed)
    pts = []
    while len(pts) < k:
        x = rng.randrange(TOY_F)
        y2 = (x * x * x + TOY.a * x + TOY.b) % TOY_F
        y = pow(y2, (TOY_F + 1) // 4, TOY_F)
        if y * y % TOY_F == y2:
            pts.append((x, y))
    return pts


def host_msm(curve, scalars, points):
    start, ops = M.plan_msm(curve, scalars, points)
    _, result = M.execute(curve, start, ops)
    return result


def naive_msm(curve, scalars, points):
    """Independent reference: repeated addition via the affine law."""
    acc = None
    for s, pt in zip(scalars, points):
        for _ in range(s):
            if acc is None:
                acc = pt
            elif acc[0] == pt[0]:
                acc = curve.dbl(acc)[:2] if acc[1] == pt[1] else None
            else:
                acc = curve.add(acc, pt)[:2]
    return acc


def test_planner_matches_naive():
    pts = toy_points(3)
    scalars = [13, 9, 21]
    assert host_msm(TOY, scalars, pts) == naive_msm(TOY, scalars, pts)
    assert host_msm(TOY, [1], [pts[0]]) == pts[0]


def _full_columns(scalars, points, n, L, beta=4242, joint=777):
    from proof_systems_tpu.circuits.domains import EvaluationDomains

    start, ops = M.plan_msm(TOY, scalars, points)
    rows, result = M.execute(TOY, start, ops)
    cols = M.build_columns(Fp, TOY, start, rows, n, L)
    lg = M.make_logup(Fp, n, L)
    full = lg.phase1_columns(cols)
    phase2 = lg.phase2_host(beta, joint)
    omega = EvaluationDomains.create(Fp, n).d1.group_gen
    cons = M.constraints(Fp, TOY, lg, start, result, len(rows), L, omega)
    return full + phase2, cons, omega, len(rows), result


def test_ffmsm_constraints_and_lookups_satisfied():
    from tests.test_mips import _host_check

    n = 256
    beta, joint = 4242, 777
    pts = toy_points(2)
    allcols, cons, omega, _, _ = _full_columns([11, 6], pts, n, TOY_LAYOUT,
                                               beta, joint)
    _host_check(allcols, cons, n, omega, beta, joint)


def test_ffmsm_corrupt_lambda_not_in_range():
    """An out-of-range q limb is caught by the range-check lookup."""
    n = 256
    L = TOY_LAYOUT
    pts = toy_points(2)
    start, ops = M.plan_msm(TOY, [11, 6], pts)
    rows, result = M.execute(TOY, start, ops)
    cols = M.build_columns(Fp, TOY, start, rows, n, L)
    cols[L.q[0][0]][0] += 1 << L.lb
    lg = M.make_logup(Fp, n, L)
    with pytest.raises(ValueError, match="not in table"):
        lg.phase1_columns(cols)


def test_ffmsm_corrupt_result_breaks_constraints():
    """Tampering with the final y3 must violate the carry-chain or pin
    constraints somewhere."""
    from tests.test_mips import _host_check

    n = 256
    L = TOY_LAYOUT
    beta, joint = 4242, 777
    pts = toy_points(2)
    allcols, cons, omega, nrows, _ = _full_columns([11, 6], pts, n, L,
                                                   beta, joint)
    allcols[L.y3[0]][nrows - 1] = (allcols[L.y3[0]][nrows - 1] + 1) % 256
    with pytest.raises(AssertionError):
        _host_check(allcols, cons, n, omega, beta, joint)


@pytest.mark.heavy
def test_ffmsm_prove_verify():
    from proof_systems_tpu.circuits.domains import EvaluationDomains
    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.utils import TestRng

    n = 256
    domain = EvaluationDomains.create(Fp, n)
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)],
        srs_mod.derive_h(Vesta),
    )
    pts = toy_points(2)
    scalars = [11, 6]
    proof, result = M.prove_msm(domain, srs, Vesta, TOY, scalars, pts,
                                TestRng(41), L=TOY_LAYOUT)
    assert result == naive_msm(TOY, scalars, pts)
    assert M.verify_msm(domain, srs, Vesta, TOY, scalars, pts, result,
                        proof, TestRng(42), L=TOY_LAYOUT)
    # wrong claimed result
    bad = ((result[0] + 1) % TOY_F, result[1])
    assert not M.verify_msm(domain, srs, Vesta, TOY, scalars, pts, bad,
                            proof, TestRng(43), L=TOY_LAYOUT)
    # wrong public scalars (different schedule -> pinned columns differ)
    assert not M.verify_msm(domain, srs, Vesta, TOY, [11, 7], pts, result,
                            proof, TestRng(44), L=TOY_LAYOUT)
