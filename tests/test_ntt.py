"""NTT parity vs naive host DFT (arkworks Radix2EvaluationDomain semantics)."""

import random

import pytest

from proof_systems_tpu.fields import Fp, Fq
from proof_systems_tpu.ops import limb, ntt


def naive_dft(field, coeffs, g):
    n = len(coeffs)
    out = []
    for i in range(n):
        x = field.pow(g, i)
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % field.p
        out.append(acc)
    return out


@pytest.mark.parametrize("field", [Fp, Fq], ids=lambda f: f.name)
@pytest.mark.parametrize("log_n", [0, 1, 4, 8])
def test_ntt_matches_naive(field, log_n):
    rng = random.Random(10 + log_n)
    n = 1 << log_n
    plan = ntt.ntt_plan(field, log_n)
    coeffs = [rng.randrange(field.p) for _ in range(n)]
    dev = plan.F.pack_mont(coeffs, shape=(n,))
    got = plan.F.unpack_mont(plan.ntt(dev))
    assert got == naive_dft(field, coeffs, plan.group_gen)


@pytest.mark.parametrize("field", [Fp], ids=lambda f: f.name)
def test_intt_roundtrip(field):
    rng = random.Random(42)
    log_n = 7
    n = 1 << log_n
    plan = ntt.ntt_plan(field, log_n)
    coeffs = [rng.randrange(field.p) for _ in range(2 * n)]
    dev = plan.F.pack_mont(coeffs, shape=(2, n))
    back = plan.F.unpack_mont(plan.intt(plan.ntt(dev)))
    assert back == coeffs


def test_batched_axes():
    rng = random.Random(43)
    field = Fp
    log_n = 5
    n = 1 << log_n
    plan = ntt.ntt_plan(field, log_n)
    cols = [[rng.randrange(field.p) for _ in range(n)] for _ in range(3)]
    flat = [c for col in cols for c in col]
    dev = plan.F.pack_mont(flat, shape=(3, n))
    got = plan.F.unpack_mont(plan.ntt(dev))
    want = [v for col in cols for v in naive_dft(field, col, plan.group_gen)]
    assert got == want


def test_sum_and_dot():
    rng = random.Random(44)
    field = Fp
    F = limb.device_field(field)
    xs = [rng.randrange(field.p) for _ in range(16)]
    ys = [rng.randrange(field.p) for _ in range(16)]
    a = F.pack_mont(xs, shape=(16,))
    b = F.pack_mont(ys, shape=(16,))
    assert F.unpack_mont(ntt.sum_mod(F, a)) == [sum(xs) % field.p]
    assert F.unpack_mont(ntt.dot_mod(F, a, b)) == [
        sum(x * y for x, y in zip(xs, ys)) % field.p
    ]
