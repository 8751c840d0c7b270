"""Host (scalar, exact) Poseidon permutation.

Golden model for the batched device kernel in ops/poseidon.py, and the
engine behind the Fiat-Shamir transcript sponges (a handful of
permutations per proof — host Python bigints are exact and fast enough).

Semantics: poseidon/src/permutation.rs:55-163 (full rounds only: sbox,
full 3x3 MDS, add round constants; optional initial ark for legacy).
"""

from __future__ import annotations

from .params import PoseidonParams


def sbox(params: PoseidonParams, x: int) -> int:
    return pow(x, params.sbox, params.field.p)


def full_round(params: PoseidonParams, state: list[int], r: int) -> None:
    p = params.field.p
    s = [sbox(params, x) for x in state]
    mds = params.mds
    new = [
        sum(m * x for m, x in zip(row, s)) % p
        for row in mds
    ]
    rc = params.round_constants[r]
    for i in range(3):
        state[i] = (new[i] + rc[i]) % p


def poseidon_block_cipher(params: PoseidonParams, state: list[int]) -> None:
    """In-place permutation of a width-3 state. Uses the native C++
    kernel (proof_systems_tpu/native) when available; this Python body
    is the exact golden model (parity: tests/test_native.py)."""
    assert len(state) == params.sponge_width
    from ..native import native_poseidon

    nat = native_poseidon(params)
    if nat is not None:
        state[:] = nat.permute(state)
        return
    poseidon_block_cipher_py(params, state)


def poseidon_block_cipher_py(params: PoseidonParams, state: list[int]) -> None:
    """Pure-Python golden model of the permutation."""
    if params.initial_ark:
        rc = params.round_constants[0]
        for i in range(3):
            state[i] = (state[i] + rc[i]) % params.field.p
        for r in range(params.rounds_full):
            full_round(params, state, r + 1)
    else:
        for r in range(params.rounds_full):
            full_round(params, state, r)
