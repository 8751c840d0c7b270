"""o1vm: zkVM proving (reference: o1vm/).

pickles.py is the generic fixed-column prover/verifier
(o1vm/src/pickles/{prover,verifier}.rs); interpreters build column
traces + constraint expressions on top of it.
"""

from .pickles import ColumnProof, prove_columns, verify_columns

__all__ = ["ColumnProof", "prove_columns", "verify_columns"]
