"""Pasta curves — host-side exact arithmetic and the SvdW group map.

Golden model for the batched curve kernels in `ops/curve.py` and host of
the (tiny) per-proof point logic: hashing transcript challenges to fresh
base points, SRS point derivation, final MSM window recombination.

Reference semantics:
  - curves/src/pasta/curves/{pallas,vesta}.rs  (y^2 = x^3 + 5, cofactor 1)
  - groupmap/src/lib.rs                        (SvdW06 field -> point map)
  - poly-commitment/src/ipa.rs:110-127         (endo coefficients)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

from .fields import FieldParams, Fp, Fq

AffinePoint = tuple[int, int] | None  # None = point at infinity


@dataclass(frozen=True)
class CurveParams:
    """Short-Weierstrass curve y^2 = x^3 + b over `base`, group order = `scalar.p`."""

    name: str
    base: FieldParams
    scalar: FieldParams
    b: int
    generator_y: int  # generator is (1, generator_y)

    @property
    def generator(self) -> AffinePoint:
        return (1, self.generator_y)

    def curve_eqn(self, x: int) -> int:
        """x^3 + b (a = 0 for Pasta)."""
        p = self.base.p
        return (x * x % p * x + self.b) % p

    def is_on_curve(self, pt: AffinePoint) -> bool:
        if pt is None:
            return True
        x, y = pt
        return y * y % self.base.p == self.curve_eqn(x)

    # --- affine group law (host, exact) ---

    def neg(self, pt: AffinePoint) -> AffinePoint:
        if pt is None:
            return None
        return (pt[0], self.base.neg(pt[1]))

    def add(self, a: AffinePoint, b: AffinePoint) -> AffinePoint:
        p = self.base.p
        if a is None:
            return b
        if b is None:
            return a
        x1, y1 = a
        x2, y2 = b
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            return self.double(a)
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    def double(self, a: AffinePoint) -> AffinePoint:
        if a is None:
            return None
        p = self.base.p
        x1, y1 = a
        if y1 == 0:
            return None
        lam = 3 * x1 * x1 % p * pow(2 * y1, -1, p) % p
        x3 = (lam * lam - 2 * x1) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    def scalar_mul(self, k: int, pt: AffinePoint) -> AffinePoint:
        """k·pt; large scalars go through the native Pippenger (a Python
        double-and-add pays a Python modular inverse per step — ~12 ms
        per 255-bit scalar-mul vs ~0.1 ms native)."""
        k %= self.scalar.p
        if pt is None or k == 0:
            return None
        if k > 0xFFFF:
            from .native import native_curve

            nat = native_curve(self)
            if nat is not None:
                return nat.msm([k], [pt])
        return self.scalar_mul_py(k, pt)

    def scalar_mul_py(self, k: int, pt: AffinePoint) -> AffinePoint:
        """Pure-Python golden model (used by msm_py and parity tests)."""
        k %= self.scalar.p
        acc: AffinePoint = None
        add_pt = pt
        while k:
            if k & 1:
                acc = self.add(acc, add_pt)
            add_pt = self.double(add_pt)
            k >>= 1
        return acc

    def msm(self, scalars: list[int], points: list[AffinePoint]) -> AffinePoint:
        """Host MSM: native Pippenger (native/pasta.cpp pc_msm) when the
        C++ library is available, exact Python double-and-add otherwise
        (the golden model — parity in tests/test_native.py)."""
        assert len(scalars) == len(points)
        if len(scalars) > 2:
            from .native import native_curve

            nat = native_curve(self)
            if nat is not None:
                s = self.scalar.p
                return nat.msm([k % s for k in scalars], points)
        return self.msm_py(scalars, points)

    def msm_py(self, scalars: list[int], points: list[AffinePoint]) -> AffinePoint:
        acc: AffinePoint = None
        for k, pt in zip(scalars, points, strict=True):
            acc = self.add(acc, self.scalar_mul_py(k, pt))
        return acc

    # --- endomorphism (poly-commitment/src/ipa.rs:110-127) ---

    @functools.cached_property
    def endos(self) -> tuple[int, int]:
        """(endo_q, endo_r): phi(x, y) = (endo_q * x, y) equals [endo_r]P.

        endo_q is the base-field cube root g^((p-1)/3); endo_r is whichever
        of the two scalar-field cube roots satisfies [endo_r]G == phi(G).
        """
        endo_q = self.base.endo_coefficient
        potential = self.scalar.endo_coefficient
        g = self.generator
        phi_g = (endo_q * g[0] % self.base.p, g[1])
        if self.scalar_mul(potential, g) == phi_g:
            endo_r = potential
        else:
            endo_r = potential * potential % self.scalar.p
        return endo_q, endo_r

    # --- SvdW06 group map (groupmap/src/lib.rs) ---

    @functools.cached_property
    def group_map_params(self) -> "GroupMapParams":
        """BWParameters::setup: first u >= 1 with f(u) != 0, plus derived constants."""
        f = self.base
        u = 1
        while self.curve_eqn(u) == 0:
            u += 1
        fu = self.curve_eqn(u)
        three_u2 = 3 * u * u % f.p
        inv_three_u2 = f.inv(three_u2)
        sqrt_neg_three_u2 = f.sqrt(f.neg(three_u2))
        assert sqrt_neg_three_u2 is not None
        sqrt_neg_three_u2_minus_u_over_2 = (
            (sqrt_neg_three_u2 - u) * f.inv(2) % f.p
        )
        return GroupMapParams(
            u=u,
            fu=fu,
            sqrt_neg_three_u_squared=sqrt_neg_three_u2,
            sqrt_neg_three_u_squared_minus_u_over_2=sqrt_neg_three_u2_minus_u_over_2,
            inv_three_u_squared=inv_three_u2,
        )

    def potential_xs(self, t: int) -> tuple[int, int, int]:
        """The three candidate x-coordinates for field element t
        (groupmap/src/lib.rs:74-111)."""
        f = self.base
        gp = self.group_map_params
        t2 = t * t % f.p
        alpha_inv = (t2 + gp.fu) * t2 % f.p
        alpha = f.inv(alpha_inv) if alpha_inv != 0 else 0
        x1 = (
            gp.sqrt_neg_three_u_squared_minus_u_over_2
            - t2 * t2 % f.p * alpha % f.p * gp.sqrt_neg_three_u_squared
        ) % f.p
        x2 = (-gp.u - x1) % f.p
        t2_plus_fu = (t2 + gp.fu) % f.p
        t2_inv = alpha * t2_plus_fu % f.p
        x3 = (
            gp.u
            - t2_plus_fu * t2_plus_fu % f.p * t2_inv % f.p * gp.inv_three_u_squared
        ) % f.p
        return x1, x2, x3

    def get_y(self, x: int) -> int | None:
        """y with y^2 = f(x), arkworks-sqrt choice (groupmap/src/lib.rs:115)."""
        return self.base.sqrt(self.curve_eqn(x))

    def to_group(self, t: int) -> tuple[int, int]:
        """GroupMap::to_group — first candidate x with a valid y."""
        for x in self.potential_xs(t):
            y = self.get_y(x)
            if y is not None:
                return (x, y)
        raise AssertionError("group map failed (impossible for SvdW)")


@dataclass(frozen=True)
class GroupMapParams:
    u: int
    fu: int
    sqrt_neg_three_u_squared: int
    sqrt_neg_three_u_squared_minus_u_over_2: int
    inv_three_u_squared: int


# Pallas: points over Fp, scalars in Fq. Vesta: points over Fq, scalars in Fp.
# Generator y-coords from curves/src/pasta/curves/{pallas.rs:14,vesta.rs:14}.
Pallas = CurveParams(
    "Pallas",
    base=Fp,
    scalar=Fq,
    b=5,
    generator_y=12418654782883325593414442427049395787963493412651469444558597405572177144507,
)
Vesta = CurveParams(
    "Vesta",
    base=Fq,
    scalar=Fp,
    b=5,
    generator_y=11426906929455361843568202299992114520848200991084027513389447476559454104162,
)

# Legacy curve variants: copies of the normal curves whose NAME selects
# the legacy (x^5, 63-round) sponge parameter set in sponge_for —
# curves/src/pasta/curves/pallas.rs:52-74, vesta.rs (the reference keeps
# distinct types for the same reason: legacy sponge param routing).
import dataclasses as _dc

LegacyPallas = _dc.replace(Pallas, name="LegacyPallas")
LegacyVesta = _dc.replace(Vesta, name="LegacyVesta")
