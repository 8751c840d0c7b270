"""Folding-scheme support: multivariate polynomials (cross-term
computation for Nova-style folding of high-degree gates) and the
arrabbiata accumulation scheme.

Reference capability: mvpoly/ (MVPoly trait + monomial representation)
and arrabbiata/ (folding over the Pasta cycle).
"""

from .mvpoly import MVPoly, compute_combined_cross_terms  # noqa: F401
