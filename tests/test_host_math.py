"""Golden-model parity: host field/curve/poseidon vs reference constants
and test vectors."""

import json
import pathlib

import pytest

from proof_systems_tpu.curves import Pallas, Vesta
from proof_systems_tpu.fields import Fp, Fq, batch_inverse
from proof_systems_tpu.poseidon import (
    ArithmeticSponge,
    FqSponge,
    ScalarChallenge,
    fp_kimchi,
    fp_legacy,
    fq_kimchi,
)

VECTORS = pathlib.Path(__file__).parent / "vectors"


def _limbs_to_int(limbs):
    out = 0
    for limb in reversed(limbs):
        out = (out << 64) | limb
    return out


class TestFields:
    def test_two_adic_root_fp(self):
        # curves/src/pasta/fields/fp.rs:24-26
        expected = _limbs_to_int(
            [0xA28DB849BAD6DBF0, 0x9083CD03D3B539DF, 0xFBA6B9CA9DC8448E, 0x3EC928747B89C6DA]
        )
        # arkworks stores it in Montgomery form (R = 2^256 mod p)
        r_inv = pow(1 << 256, -1, Fp.p)
        assert Fp.two_adic_root_of_unity == expected * r_inv % Fp.p

    def test_two_adic_root_fq(self):
        # curves/src/pasta/fields/fq.rs:22-24
        expected = _limbs_to_int(
            [0x218077428C9942DE, 0xCC49578921B60494, 0xAC2E5D27B2EFBEE2, 0x0B79FA897F2DB056]
        )
        r_inv = pow(1 << 256, -1, Fq.p)
        assert Fq.two_adic_root_of_unity == expected * r_inv % Fq.p

    def test_roots_of_unity(self):
        for field in (Fp, Fq):
            w = field.root_of_unity(10)
            assert pow(w, 1 << 10, field.p) == 1
            assert pow(w, 1 << 9, field.p) != 1

    def test_endo_coefficients_are_cube_roots(self):
        for field in (Fp, Fq):
            e = field.endo_coefficient
            assert e != 1 and pow(e, 3, field.p) == 1

    def test_sqrt(self):
        for field in (Fp, Fq):
            for v in [2, 3, 12345, field.p - 5]:
                s = field.sqrt(v * v % field.p)
                assert s is not None and s * s % field.p == v * v % field.p
        assert Fp.sqrt(5) is None or pow(Fp.sqrt(5), 2, Fp.p) == 5

    def test_batch_inverse(self):
        xs = [3, 0, 7, 123456789, Fp.p - 2]
        inv = batch_inverse(Fp, xs)
        for x, i in zip(xs, inv):
            assert (x * i % Fp.p) == (1 if x != 0 else 0)


class TestCurves:
    def test_generators_on_curve(self):
        assert Pallas.is_on_curve(Pallas.generator)
        assert Vesta.is_on_curve(Vesta.generator)

    def test_group_law(self):
        g = Vesta.generator
        g2 = Vesta.double(g)
        assert Vesta.add(g, g) == g2
        assert Vesta.add(g2, Vesta.neg(g)) == g
        assert Vesta.add(g, Vesta.neg(g)) is None
        assert Vesta.scalar_mul(5, g) == Vesta.add(g2, Vesta.add(g2, g))

    def test_generator_order(self):
        # [p_scalar] G == infinity (cofactor 1)
        for curve in (Pallas, Vesta):
            assert curve.scalar_mul(curve.scalar.p, curve.generator) is None

    def test_endos(self):
        for curve in (Pallas, Vesta):
            endo_q, endo_r = curve.endos
            g = curve.generator
            phi = (endo_q * g[0] % curve.base.p, g[1])
            assert curve.is_on_curve(phi)
            assert curve.scalar_mul(endo_r, g) == phi

    def test_group_map_lands_on_curve(self):
        for curve in (Pallas, Vesta):
            for t in [1, 2, 0xDEADBEEF, curve.base.p - 3]:
                pt = curve.to_group(t)
                assert curve.is_on_curve(pt)


def _load_vectors(name):
    return json.loads((VECTORS / name).read_text())["test_vectors"]


class TestPoseidonVectors:
    @pytest.mark.parametrize("vec", _load_vectors("kimchi.json"))
    def test_kimchi_vectors(self, vec):
        inputs = [Fp.from_bytes_le(bytes.fromhex(h)) for h in vec["input"]]
        expected = Fp.from_bytes_le(bytes.fromhex(vec["output"]))
        sponge = ArithmeticSponge(fp_kimchi)
        for x in inputs:
            sponge.absorb(x)
        assert sponge.squeeze() == expected

    @pytest.mark.parametrize("vec", _load_vectors("legacy.json"))
    def test_legacy_vectors(self, vec):
        inputs = [Fp.from_bytes_le(bytes.fromhex(h)) for h in vec["input"]]
        expected = Fp.from_bytes_le(bytes.fromhex(vec["output"]))
        sponge = ArithmeticSponge(fp_legacy)
        for x in inputs:
            sponge.absorb(x)
        assert sponge.squeeze() == expected


class TestSponge:
    def test_fq_sponge_deterministic(self):
        s1 = FqSponge(fq_kimchi, Vesta)
        s2 = FqSponge(fq_kimchi, Vesta)
        s1.absorb_g([Vesta.generator])
        s2.absorb_g([Vesta.generator])
        c1, c2 = s1.challenge(), s2.challenge()
        assert c1.value == c2.value
        assert c1.value < 1 << 128

    def test_absorb_fr_split(self):
        # Pallas FqSponge: scalar field Fq > base field Fp -> split absorb
        s = FqSponge(fp_kimchi, Pallas)
        s.absorb_fr([Fq.p - 1])
        # Vesta FqSponge: scalar field Fp < base field Fq -> direct absorb
        s2 = FqSponge(fq_kimchi, Vesta)
        s2.absorb_fr([Fp.p - 1])
        assert s2.sponge.state[0] == Fp.p - 1

    def test_scalar_challenge_expansion(self):
        # to_field(0): every pair is (0,0) -> a doubles 64x (a = 2^65),
        # b = 2b - 1 each round starting at 2 -> b = 2^64 + 1.
        _, endo_r = Vesta.endos
        val = ScalarChallenge(0).to_field(endo_r, Fp)
        assert val == ((1 << 65) * endo_r + (1 << 64) + 1) % Fp.p
        # all-ones: every pair is (1,1) -> a = 2a + 1 (a = 3*2^64 - 1), b = 2^65.
        val2 = ScalarChallenge((1 << 128) - 1).to_field(endo_r, Fp)
        assert val2 == ((3 * (1 << 64) - 1) * endo_r + (1 << 65)) % Fp.p

    def test_digest_reduction(self):
        s = FqSponge(fq_kimchi, Vesta)
        s.absorb_fq([42])
        d = s.digest()
        assert 0 <= d < Fp.p


def test_legacy_curve_variants():
    """Legacy* curves are copies of the normal curves whose type routes
    to the legacy sponge parameter set (curves/src/pasta/curves/
    pallas.rs:52-74; kimchi/src/curve.rs)."""
    from proof_systems_tpu.curves import LegacyPallas, LegacyVesta, Pallas, Vesta
    from proof_systems_tpu.poseidon import fp_legacy, fq_legacy, fq_kimchi
    from proof_systems_tpu.verifier_index import sponge_for

    assert LegacyPallas.generator == Pallas.generator
    assert LegacyVesta.generator == Vesta.generator
    assert LegacyPallas.b == 5 and LegacyVesta.b == 5
    # group law identical
    g2 = Pallas.double(Pallas.generator)
    assert LegacyPallas.double(LegacyPallas.generator) == g2
    # sponge params: legacy variants pick the x^5 63-round sets
    assert sponge_for(LegacyVesta).sponge.params is fq_legacy
    assert sponge_for(LegacyPallas).sponge.params is fp_legacy
    assert sponge_for(Vesta).sponge.params is fq_kimchi
