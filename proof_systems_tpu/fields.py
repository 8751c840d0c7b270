"""Pasta prime fields — host-side exact arithmetic (Python bigints).

This is the "golden model" for the TPU kernels in `proof_systems_tpu.ops`:
every device kernel is parity-tested against these functions. It also backs
the host-resident protocol logic (Fiat-Shamir transcript, challenge
expansion, SRS derivation) where exactness matters more than throughput.

Reference semantics: `curves/src/pasta/fields/{fp,fq}.rs` in
o1-labs/proof-systems (arkworks Montgomery fields, 2-adicity 32,
generator 5). We store field elements as plain Python ints in [0, p);
Montgomery form only exists on-device (see ops/field.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

# Pasta primes.
#   Fp = base field of the Pallas curve = scalar field of Vesta.
#   Fq = base field of the Vesta curve  = scalar field of Pallas.
# (curves/src/pasta/fields/fp.rs:9, fq.rs:10)
P_FP = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001
P_FQ = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001


@dataclass(frozen=True)
class FieldParams:
    """Static parameters of a prime field with high 2-adicity."""

    name: str
    p: int
    generator: int  # multiplicative generator (arkworks GENERATOR = 5)
    two_adicity: int

    @functools.cached_property
    def t_odd(self) -> int:
        """Odd t with p - 1 = 2^two_adicity * t."""
        return (self.p - 1) >> self.two_adicity

    @functools.cached_property
    def two_adic_root_of_unity(self) -> int:
        """generator^t — a primitive 2^two_adicity-th root of unity.

        Matches arkworks TWO_ADIC_ROOT_OF_UNITY
        (curves/src/pasta/fields/fp.rs:24, fq.rs:22), asserted in tests.
        """
        return pow(self.generator, self.t_odd, self.p)

    @functools.cached_property
    def endo_coefficient(self) -> int:
        """Primitive cube root of unity g^((p-1)/3).

        Matches `mina_poseidon::sponge::endo_coefficient`
        (poseidon/src/sponge.rs:110-114): exponent computed as the field
        element -1/3 lifted to an integer, i.e. (p-1)*inv(3) mod p.
        """
        exponent = (self.p - 1) * pow(3, -1, self.p) % self.p
        return pow(self.generator, exponent, self.p)

    def root_of_unity(self, log_size: int) -> int:
        """Generator of the multiplicative subgroup of size 2^log_size.

        Same convention as arkworks `Radix2EvaluationDomain::group_gen`:
        two_adic_root_of_unity^(2^(two_adicity - log_size)).
        """
        if log_size > self.two_adicity:
            raise ValueError(f"no subgroup of size 2^{log_size} in {self.name}")
        w = self.two_adic_root_of_unity
        for _ in range(self.two_adicity - log_size):
            w = w * w % self.p
        return w

    # --- scalar ops (ints in [0, p)) ---

    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return a * b % self.p

    def neg(self, a: int) -> int:
        return -a % self.p

    def inv(self, a: int) -> int:
        return pow(a, -1, self.p)

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def legendre(self, a: int) -> int:
        """1 if QR, -1 if non-residue, 0 if zero."""
        if a % self.p == 0:
            return 0
        return 1 if pow(a, (self.p - 1) // 2, self.p) == 1 else -1

    def sqrt(self, a: int) -> int | None:
        """Tonelli-Shanks square root, matching arkworks' algorithm.

        arkworks (`ark_ff::fields::sqrt`, TonelliShanks branch) seeds z with
        TWO_ADIC_ROOT_OF_UNITY (= generator^t); the loop below mirrors that
        exact iteration so the *choice* of root (out of ±r) is identical.
        This matters for byte-parity of SRS points (groupmap get_y).
        """
        p = self.p
        a %= p
        if a == 0:
            return 0
        # w = a^((t-1)/2); x = a*w; b = x*w = a^t
        w = pow(a, (self.t_odd - 1) >> 1, p)
        x = a * w % p
        b = x * w % p
        z = self.two_adic_root_of_unity
        v = self.two_adicity
        while b != 1:
            # find least k with b^(2^k) == 1
            k = 0
            b2k = b
            while b2k != 1:
                b2k = b2k * b2k % p
                k += 1
            if k == v:
                return None  # non-residue
            # w2 = z^(2^(v-k-1))
            w2 = z
            for _ in range(v - k - 1):
                w2 = w2 * w2 % p
            z = w2 * w2 % p
            b = b * z % p
            x = x * w2 % p
            v = k
        return x if x * x % p == a else None

    def to_bytes_le(self, a: int) -> bytes:
        return int(a % self.p).to_bytes(32, "little")

    def from_bytes_le(self, data: bytes) -> int:
        v = int.from_bytes(data, "little")
        if v >= self.p:
            raise ValueError("field element out of range")
        return v


Fp = FieldParams("Fp", P_FP, 5, 32)
Fq = FieldParams("Fq", P_FQ, 5, 32)


def batch_inverse(field: FieldParams, xs: list[int]) -> list[int]:
    """Montgomery-trick batch inversion; zeros map to zero (arkworks
    `batch_inversion` skips zeros)."""
    p = field.p
    n = len(xs)
    prefix = [1] * (n + 1)
    for i, x in enumerate(xs):
        prefix[i + 1] = prefix[i] * (x if x != 0 else 1) % p
    inv_all = pow(prefix[n], -1, p)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        x = xs[i]
        if x == 0:
            out[i] = 0
        else:
            out[i] = prefix[i] * inv_all % p
            inv_all = inv_all * x % p
    return out


def pows(n: int, x: int, p: int) -> list[int]:
    """[1, x, x^2, ..., x^(n-1)] mod p (utils/src/field_helpers.rs:253)."""
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * x % p
    return out
