"""BN254 pairing + KZG backend (poly-commitment/src/kzg.rs,
poly-commitment/tests/kzg.rs analogues). Host math only — no device
kernels, runs in the fast profile."""

import random

from proof_systems_tpu.pairing import bn254 as bn
from proof_systems_tpu.poly_commitment import kzg


class Rng:
    def __init__(self, seed):
        self.r = random.Random(seed)

    def field(self, p):
        return self.r.randrange(p)


def _poly_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % bn.FR
    return acc


class TestBN254:
    def test_generators_on_curve_and_order(self):
        assert bn.g1_is_on_curve(bn.G1)
        assert bn.g2_is_on_curve(bn.G2)
        assert bn.g1_mul(bn.FR, bn.G1) is None
        assert bn.g2_mul(bn.FR, bn.G2) is None

    def test_fr_domain_params(self):
        # arkworks ark-bn254 Fr: 2-adicity 28, generator 5
        f = kzg.FrBN
        w = f.two_adic_root_of_unity
        assert pow(w, 1 << 28, f.p) == 1
        assert pow(w, 1 << 27, f.p) != 1

    def test_bilinearity(self):
        rng = random.Random(3)
        a = rng.randrange(1, bn.FR)
        b = rng.randrange(1, bn.FR)
        e = bn.pairing(bn.G1, bn.G2)
        assert e != bn.F12_ONE
        assert bn.f12_pow(e, bn.FR) == bn.F12_ONE
        lhs = bn.pairing(bn.g1_mul(a, bn.G1), bn.g2_mul(b, bn.G2))
        assert lhs == bn.f12_pow(e, a * b % bn.FR)

    def test_multi_pairing_cancellation(self):
        a = 987654321
        aP = bn.g1_mul(a, bn.G1)
        aQ = bn.g2_mul(a, bn.G2)
        assert bn.multi_pairing([(aP, bn.G2), (bn.g1_neg(bn.G1), aQ)])
        assert not bn.multi_pairing([(aP, bn.G2), (bn.g1_neg(bn.G1), bn.G2)])


class TestKZG:
    def setup_method(self):
        self.rng = Rng(42)
        self.srs = kzg.PairingSRS.create_trusted_setup(0x1CEB00DA, 8)
        r = bn.FR
        self.zeta = self.rng.field(r)
        self.zw = self.rng.field(r)
        self.polyscale = self.rng.field(r)

    def _evals(self, poly, comm, nchunks=1):
        n = self.srs.max_poly_size
        return kzg.KZGEvaluation(
            commitment=comm,
            evaluations=[
                [_poly_eval(poly[i * n : (i + 1) * n], pt) for i in range(nchunks)]
                for pt in (self.zeta, self.zw)
            ],
        )

    def test_open_verify_two_polys(self):
        r = bn.FR
        p1 = [self.rng.field(r) for _ in range(8)]
        p2 = [self.rng.field(r) for _ in range(5)]
        c1, b1 = self.srs.commit(p1, 1, self.rng)
        c2 = self.srs.commit_non_hiding(p2, 1)
        proof = kzg.create(
            self.srs, [(p1, b1), (p2, [0])], [self.zeta, self.zw], self.polyscale
        )
        assert proof is not None
        evals = [self._evals(p1, c1), self._evals(p2, c2)]
        assert kzg.verify(self.srs, evals, self.polyscale, [self.zeta, self.zw], proof)

        bad = [self._evals(p1, c1), self._evals(p2, c2)]
        bad[0].evaluations[0][0] = (bad[0].evaluations[0][0] + 1) % r
        assert not kzg.verify(self.srs, bad, self.polyscale, [self.zeta, self.zw], proof)
        assert not kzg.verify(
            self.srs,
            evals,
            self.polyscale,
            [self.zeta, self.zw],
            kzg.KZGProof(proof.quotient, (proof.blinding + 1) % r),
        )

    def test_chunked(self):
        r = bn.FR
        p3 = [self.rng.field(r) for _ in range(20)]  # 3 chunks of 8
        c3, b3 = self.srs.commit(p3, 3, self.rng)
        proof = kzg.create(self.srs, [(p3, b3)], [self.zeta, self.zw], self.polyscale)
        evals = [self._evals(p3, c3, nchunks=3)]
        assert kzg.verify(self.srs, evals, self.polyscale, [self.zeta, self.zw], proof)
