"""Evaluation domains d1/d2/d4/d8 (kimchi/src/circuits/domains.rs:23-39).

Each domain wraps an NttPlan (ops/ntt.py) sharing arkworks'
Radix2EvaluationDomain conventions. d8 hosts the quotient evaluation;
d1 hosts witness columns.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields import FieldParams
from ..ops.ntt import NttPlan, ntt_plan


@dataclass
class EvaluationDomains:
    field: FieldParams
    d1: NttPlan
    d2: NttPlan
    d4: NttPlan
    d8: NttPlan

    @classmethod
    def create(cls, field: FieldParams, n: int) -> "EvaluationDomains":
        log_n = max((n - 1).bit_length(), 1)
        if (1 << log_n) < n:
            log_n += 1
        return cls(
            field,
            ntt_plan(field, log_n),
            ntt_plan(field, log_n + 1),
            ntt_plan(field, log_n + 2),
            ntt_plan(field, log_n + 3),
        )


def domain_size(n: int) -> int:
    """Smallest power of two >= n (arkworks compute_size_of_domain)."""
    size = 1
    while size < n:
        size *= 2
    return size
