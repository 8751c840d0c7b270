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
