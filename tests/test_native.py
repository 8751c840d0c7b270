"""Native C++ host runtime: byte parity with the Python golden model."""

import random

import pytest

from proof_systems_tpu.native import native_poseidon
from proof_systems_tpu.poseidon import fp_kimchi, fp_legacy, fq_kimchi, fq_legacy
from proof_systems_tpu.poseidon.permutation import (
    poseidon_block_cipher,
    poseidon_block_cipher_py,
)


@pytest.mark.parametrize(
    "params", [fp_kimchi, fq_kimchi, fp_legacy, fq_legacy], ids=lambda p: p.name
)
def test_native_permutation_parity(params):
    nat = native_poseidon(params)
    if nat is None:
        pytest.skip("no native toolchain")
    rng = random.Random(hash(params.name) & 0xFFFF)
    p = params.field.p
    for _ in range(10):
        state = [rng.randrange(p) for _ in range(3)]
        want = list(state)
        poseidon_block_cipher_py(params, want)
        assert nat.permute(state) == want


def test_dispatch_equals_golden():
    rng = random.Random(7)
    p = fp_kimchi.field.p
    state = [rng.randrange(p) for _ in range(3)]
    a, b = list(state), list(state)
    poseidon_block_cipher(fp_kimchi, a)
    poseidon_block_cipher_py(fp_kimchi, b)
    assert a == b


def test_native_msm_parity():
    """pc_msm Pippenger vs the exact Python double-and-add golden model,
    incl. zero scalars, infinity points, both curves."""
    import random

    from proof_systems_tpu.curves import Pallas, Vesta
    from proof_systems_tpu.native import native_curve

    rng = random.Random(77)
    for curve in (Vesta, Pallas):
        if native_curve(curve) is None:
            import pytest

            pytest.skip("native library unavailable")
        for n in (3, 17, 64):
            g = curve.generator
            pts = [
                curve.scalar_mul(rng.randrange(1, curve.scalar.p), g)
                for _ in range(n)
            ]
            ks = [rng.randrange(curve.scalar.p) for _ in range(n)]
            pts[0] = None
            ks[1] = 0
            assert curve.msm(ks, pts) == curve.msm_py(ks, pts)


def test_native_msm_all_infinity():
    from proof_systems_tpu.curves import Vesta

    assert Vesta.msm([1, 2, 3], [None, None, None]) is None
    assert Vesta.msm([0, 0, 0], [Vesta.generator] * 3) is None
