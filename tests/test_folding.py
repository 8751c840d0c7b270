"""Arrabbiata-style folding: relaxed instances, cross terms, decider.

Mirrors the capability of arrabbiata/src/witness.rs (accumulation over
many program executions) and decider/ (final column proof)."""

import random

from proof_systems_tpu.circuits import expr as E
from proof_systems_tpu.fields import Fp
from proof_systems_tpu.folding.arrabbiata import (
    FoldingEnv,
    FoldingScheme,
    decider_constraints,
    decider_prove,
    decider_verify,
)

P = Fp.p
NCOLS = 3


def app_constraints():
    """Toy degree-5 'minroot-ish' app over 3 columns:
    c1 = c0^2, c2 = c1^2 * c0 (= c0^5), next c0 = c2 + c0."""
    c0, c1, c2 = (E.Cell(i, E.CURR) for i in range(NCOLS))
    c0n = E.Cell(0, E.NEXT)
    return [
        c1 - c0 * c0,
        c2 - c1 * c1 * c0,
        c0n - (c2 + c0),
    ]


def app_trace(x0: int, n: int):
    cols = [[0] * n for _ in range(NCOLS)]
    x = x0
    for j in range(n):
        cols[0][j] = x
        cols[1][j] = x * x % P
        cols[2][j] = pow(x, 5, P)
        x = (pow(x, 5, P) + x) % P
    return cols


def make_env():
    return FoldingEnv(Fp, NCOLS, app_constraints())


def test_fresh_satisfied_and_error_shape():
    env = make_env()
    n = 8
    inst = env.fresh(app_trace(3, n), alpha=12345)
    assert env.is_satisfied(inst)
    # wrap-around row (last) absorbs the chain discontinuity into err
    assert any(e for e in inst.error), "wrap row should be nonzero"
    assert sum(1 for e in inst.error if e) <= 1


def test_fold_preserves_relation():
    env = make_env()
    rng = random.Random(60)
    n = 8
    i1 = env.fresh(app_trace(3, n), alpha=rng.randrange(1, P))
    i2 = env.fresh(app_trace(7, n), alpha=rng.randrange(1, P))
    r = rng.randrange(1, P)
    folded = env.fold(i1, i2, r)
    assert env.is_satisfied(folded)
    # folding is iterable: accumulate two more fresh instances
    for x0 in (11, 13):
        nxt = env.fresh(app_trace(x0, n), alpha=rng.randrange(1, P))
        folded = env.fold(folded, nxt, rng.randrange(1, P))
    assert env.is_satisfied(folded)
    # perturbation breaks it
    folded.columns[0][2] = (folded.columns[0][2] + 1) % P
    assert not env.is_satisfied(folded)


def test_committed_folding_homomorphism():
    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.utils import TestRng
    from proof_systems_tpu.verifier_index import sponge_for

    env = make_env()
    n = 8
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )
    scheme = FoldingScheme(env, srs, Vesta, lambda: sponge_for(Vesta))
    rng = TestRng(61)
    i1 = env.fresh(app_trace(3, n), alpha=rng.field(P))
    i2 = env.fresh(app_trace(7, n), alpha=rng.field(P))
    scheme.commit_instance(i1, rng)
    scheme.commit_instance(i2, rng)
    folded, r, ct_comms = scheme.fold_committed(i1, i2, rng)
    assert env.is_satisfied(folded)
    assert len(ct_comms) == env.max_degree + 1
    # folded commitments open to the folded columns
    assert scheme.check_commitments(folded)


def test_decider_roundtrip():
    from proof_systems_tpu.circuits.domains import EvaluationDomains
    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.utils import TestRng

    env = make_env()
    rng = random.Random(62)
    n = 16
    domain = EvaluationDomains.create(Fp, n)
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)], srs_mod.derive_h(Vesta)
    )
    i1 = env.fresh(app_trace(3, n), alpha=rng.randrange(1, P))
    i2 = env.fresh(app_trace(7, n), alpha=rng.randrange(1, P))
    folded = env.fold(i1, i2, rng.randrange(1, P))
    assert env.is_satisfied(folded)
    proof, cons = decider_prove(env, folded, domain, srs, Vesta, TestRng(63))
    assert decider_verify(env, proof, cons, domain, srs, Vesta, TestRng(64))


def test_decider_constraint_degree():
    env = make_env()
    inst = env.fresh(app_trace(3, 8), alpha=99)
    cons = decider_constraints(env, inst)
    assert len(cons) == 1


def test_arrabbiata_cli_smoke(capsys):
    """CLI parity with arrabbiata/src/cli.rs `execute` (zkapp, -n,
    --srs-size): runs the square zkapp end-to-end and emits the
    fold-throughput JSON line."""
    import json

    from proof_systems_tpu.folding.cli import execute

    out = execute("square", 2, 8, decide=False)
    assert out["iterations"] == 2 and out["rows_per_instance"] == 256
    assert out["folds_per_s"] is None or out["folds_per_s"] > 0
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(printed)["metric"] == "arrabbiata_fold_throughput"
