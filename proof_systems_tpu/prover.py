"""The kimchi prover (kimchi/src/prover.rs:137-1460), TPU-native.

Protocol order follows create_recursive exactly (see SURVEY.md §3.2);
every column-sized computation runs as batched limb kernels on device:
  - witness commit: one batched iNTT + one batched MSM,
  - permutation z: batched products + blocked-scan prefix product
    (perm_aggreg, permutation.rs:436-560),
  - quotient: one AST walk over d8 (circuits/expr.eval_dev) + the
    hand-written permutation contribution (perm_quot, permutation.rs:210),
  - divisions: block suffix sums / affine-composition scans (ops/poly),
  - ζ/ζω evaluations: batched <coeffs, powers> dot products,
  - the IPA opening (poly_commitment/ipa.open_proof).

Chunked circuits (domain larger than the SRS) are supported: commitments
carry num_chunks chunks, evaluations are chunk lists recombined with
powers of ζ^max_poly_size (prover.rs:194-199,956-975; tests/chunked.rs).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .circuits import expr as expr_mod
from .circuits import lookup as lookup_mod
from .circuits.gate import COLUMNS, PERMUTS, GateType
from .ops import limb, ntt, poly
from .ops.limb import NLIMBS
from .poly_commitment.commitment import PolyComm
from .poly_commitment.ipa import open_proof
from .poseidon.sponge import FrSponge
from .poseidon import fp_kimchi, fq_kimchi
from .proof import (
    PointEvaluations,
    ProofEvaluations,
    ProverCommitments,
    ProverProof,
)
from .prover_index import ALWAYS_ON, ProverIndex
from .utils.tracing import checkpoint
from .verifier_index import sponge_for


def fr_sponge_for(f):
    params = fp_kimchi if f.name == "Fp" else fq_kimchi
    return FrSponge(params)



def _quotient_fn(index: ProverIndex):
    """Build (once per index) a single jitted function computing the full
    quotient phase: d8 extension of witness/z, the constraint-AST walk,
    the permutation contribution, vanishing division, and the bnd terms.
    Fusing this into ONE dispatch removes ~200 host->device round trips
    (dominant at small circuit sizes through the axon tunnel)."""
    if getattr(index, "_qfn", None) is not None:
        return index._qfn
    cs = index.cs
    f = cs.f
    p = f.p
    F = limb.device_field(f)
    cd = index.column_data
    d1, d8 = cs.domain.d1, cs.domain.d8
    n = d1.n
    zk = cs.zk_rows
    lcs = cs.lookup_cs
    from .circuits.polynomials import optional_gates as og
    from .poseidon import fp_kimchi as _pk, fq_kimchi as _qk

    opt_present = [g for g in og.OPTIONAL_GATE_ORDER if g in cd.selector8]
    mds_params = _pk if f.name == "Fp" else _qk
    perm_exps = index.alphas.get_exponents("permutation", 3)

    # Every index-owned device array is passed as a TRACED ARGUMENT (the
    # K pytree) rather than closed over: jit embeds captured arrays as
    # HLO constants, and at k=15 the d8 columns + twiddle tables total
    # ~700 MB — the axon compile service rejects the request (HTTP 413).
    K0 = {
        "coefficients8": cd.coefficients8,
        "sel8": {int(g): cd.selector8[g] for g in [*ALWAYS_ON, *opt_present]},
        "x_d8": cd.x_d8,
        "sigma8": cd.sigma8,
        "zkpl8": cd.zkpl8,
        "vzkp8": cd.vanishes_zk_prev8,
        "fwd8": d8.fwd_twiddles,
        "inv8": d8.inv_twiddles,
    }
    if lcs is not None:
        ld0 = index.lookup_data
        K0.update(
            lt_coeff=ld0["table_coeff"],
            lt8=ld0["table8"],
            ids_coeff=ld0["ids_coeff"],
            ids8=ld0["ids8"],
            lsel8={pat.value: ld0["sel8"][pat] for pat in lcs.info.patterns},
            rsel8=ld0["runtime_sel8"],
        )

    # Multi-device: shard every d8 EVALUATION array over the mesh's data
    # axis (the twiddle tables stay replicated so the NTT fori-loops run
    # local). GSPMD then distributes the whole pointwise quotient walk —
    # including the NEXT-row rolls, which XLA turns into
    # collective-permutes — without any change to the graph semantics
    # (replacing the reference's rayon expr evaluation,
    # kimchi/src/circuits/expr.rs:1142-1246, with sharded columns).
    from .parallel.auto import data_mesh

    mesh = data_mesh()
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        ndev = mesh.devices.size
        n8 = 8 * n

        def shard_evals(x):
            if (
                hasattr(x, "ndim")
                and x.ndim >= 2
                and x.shape[-1] == n8
                and n8 % ndev == 0
            ):
                spec = P(*([None] * (x.ndim - 1)), "data")
                return jax.device_put(x, NamedSharding(mesh, spec))
            return x

        skip = {"fwd8", "inv8"}
        K0 = {
            k: (v if k in skip else jax.tree.map(shard_evals, v))
            for k, v in K0.items()
        }

    def to_d8(coeffs, fwd_tw):
        padded = jnp.concatenate(
            [coeffs, jnp.zeros((NLIMBS, *coeffs.shape[1:-1], 7 * n), dtype=coeffs.dtype)],
            axis=-1,
        )
        return d8.ntt_t(padded, fwd_tw)

    def qfn(w_coeffs, z_coeffs, public_low, chal, lookup_in, K):
        w8 = to_d8(w_coeffs, K["fwd8"])
        z8 = to_d8(z_coeffs[:, None, :], K["fwd8"])[:, 0]
        columns = {expr_mod.col_witness(i): w8[:, i] for i in range(COLUMNS)}
        columns.update(
            {expr_mod.col_coeff(i): K["coefficients8"][:, i] for i in range(COLUMNS)}
        )
        columns[expr_mod.COL_Z] = z8
        for g in [*ALWAYS_ON, *opt_present]:
            columns[expr_mod.col_index(g)] = K["sel8"][int(g)]

        jt_coeff = None
        if lcs is not None:
            jt8 = None
            jpow = F.one_mont((1,))
            for i in range(K["lt_coeff"].shape[1]):
                term_c = limb.mont_mul(F, K["lt_coeff"][:, i], jpow)
                term_8 = limb.mont_mul(F, K["lt8"][:, i], jpow)
                jt_coeff = term_c if jt_coeff is None else limb.add(F, jt_coeff, term_c)
                jt8 = term_8 if jt8 is None else limb.add(F, jt8, term_8)
                jpow = limb.mont_mul(F, jpow, chal["joint_combiner"])
            if K["ids_coeff"] is not None:
                jt_coeff = limb.add(
                    F, jt_coeff, limb.mont_mul(F, K["ids_coeff"], chal["tid_comb"])
                )
                jt8 = limb.add(F, jt8, limb.mont_mul(F, K["ids8"], chal["tid_comb"]))
            if lookup_in.get("runtime_coeffs") is not None:
                rt8 = to_d8(lookup_in["runtime_coeffs"][:, None, :], K["fwd8"])[:, 0]
                jt_coeff = limb.add(
                    F,
                    jt_coeff,
                    limb.mont_mul(F, lookup_in["runtime_coeffs"], chal["joint_combiner"]),
                )
                jt8 = limb.add(F, jt8, limb.mont_mul(F, rt8, chal["joint_combiner"]))
                columns[lookup_mod.COL_LOOKUP_RUNTIME_TABLE] = rt8
                columns[lookup_mod.COL_LOOKUP_RUNTIME_SELECTOR] = K["rsel8"]
            sorted8 = to_d8(lookup_in["sorted_coeffs"], K["fwd8"])
            aggreg8 = to_d8(lookup_in["aggreg_coeffs"][:, None, :], K["fwd8"])[:, 0]
            for i in range(sorted8.shape[1]):
                columns[lookup_mod.col_lookup_sorted(i)] = sorted8[:, i]
            columns[lookup_mod.COL_LOOKUP_AGGREG] = aggreg8
            columns[lookup_mod.COL_LOOKUP_TABLE] = jt8
            for pat in lcs.info.patterns:
                columns[lookup_mod.col_lookup_kind(pat)] = K["lsel8"][pat.value]

        ctx = expr_mod.DeviceEvalContext(
            F=F,
            columns=columns,
            challenges=chal,
            endo=cs.endo,
            mds=[list(r) for r in mds_params.mds],
            domain_n=n,
            zk_rows=zk,
            omega=d1.group_gen,
            vanishes_on_zk_and_previous=K["vzkp8"],
        )
        if lcs is not None:

            def unnorm_lagrange(row_idx: int):
                num = limb.sub(F, limb.mont_pow(F, K["x_d8"], n), F.one_mont((1,)))
                den = limb.sub(F, K["x_d8"], F.const_mont(cs.sid[row_idx], (1,)))
                return limb.mont_mul(F, num, limb.batch_inverse(F, den))

            ctx.unnormalized_lagrange = {
                0: unnorm_lagrange(0),
                n - zk - 1: unnorm_lagrange(n - zk - 1),
            }

        gate_evals8 = expr_mod.eval_dev(index.linearization_expr, ctx)

        a0 = limb.mont_pow(F, chal["alpha"], perm_exps[0]) if perm_exps[0] else F.one_mont((1,))
        a1 = limb.mont_pow(F, chal["alpha"], perm_exps[1])
        a2 = limb.mont_pow(F, chal["alpha"], perm_exps[2])

        shifts_side = z8
        for i in range(PERMUTS):
            bshift = limb.mont_mul(F, chal["beta"], F.const_mont(cs.shift[i], (1,)))
            term = limb.add(
                F,
                limb.add(F, w8[:, i], chal["gamma"]),
                limb.mont_mul(F, K["x_d8"], bshift),
            )
            shifts_side = limb.mont_mul(F, shifts_side, term)
        sigmas_side = jnp.roll(z8, -8, axis=-1)
        for i in range(PERMUTS):
            term = limb.add(
                F,
                limb.add(F, w8[:, i], chal["gamma"]),
                limb.mont_mul(F, K["sigma8"][:, i], chal["beta"]),
            )
            sigmas_side = limb.mont_mul(F, sigmas_side, term)
        perm8 = limb.mont_mul(
            F,
            limb.mont_mul(F, limb.sub(F, shifts_side, sigmas_side), a0),
            K["zkpl8"],
        )

        t8 = limb.add(F, gate_evals8, perm8)
        f_coeffs = d8.intt_t(t8, K["inv8"])
        f_coeffs = f_coeffs.at[:, :n].set(limb.add(F, f_coeffs[:, :n], public_low))
        quotient, rem = poly.divide_by_vanishing(F, f_coeffs, n)

        z_minus_1 = z_coeffs.at[:, 0].set(
            limb.sub(F, z_coeffs[:, 0:1], F.one_mont((1,)))[:, 0]
        )
        bnd1, r1 = _divide_by_linear_dev(F, z_minus_1, 1)
        bnd2, r2 = _divide_by_linear_dev(F, z_minus_1, cs.sid[n - zk])
        bnd = limb.add(
            F, limb.mont_mul(F, bnd1, a1), limb.mont_mul(F, bnd2, a2)
        )
        quotient = quotient.at[:, : n - 1].set(
            limb.add(F, quotient[:, : n - 1], bnd)
        )
        return quotient, rem, jt_coeff, r1, r2

    # Fusing into one jit pays on TPU (dispatch latency);  on CPU the
    # ~100k-HLO graph compiles for tens of minutes, so run it op-by-op
    # there (each limb op is individually jitted + persistently cached).
    index._qfn_consts = K0
    if jax.default_backend() in ("tpu", "axon"):
        index._qfn = jax.jit(qfn)
    else:
        index._qfn = qfn
    return index._qfn


def _divide_by_linear_dev(F, coeffs, c: int):
    """poly.divide_by_linear with the remainder left on device."""
    L = coeffs.shape[-1]
    rev = coeffs[..., ::-1]
    if jax.default_backend() in ("tpu", "axon"):
        # s_j = rev_j + c·s_{j-1} with STATIC c: one fused kernel
        from .ops import pallas_field

        vs = pallas_field.linear_scan_fused(F, rev, c)
    else:
        from .ops.scan import blocked_prefix_scan

        ones = jnp.broadcast_to(F.one_mont((1,)), rev.shape)
        cs_arr = jnp.broadcast_to(F.const_mont(c, (1,)), rev.shape)

        def op(x, y):
            v1, m1 = x
            v2, m2 = y
            return (limb.add(F, v2, limb.mont_mul(F, m2, v1)), limb.mont_mul(F, m1, m2))

        ident = (F.zeros((1,)), F.one_mont((1,)))
        vs, _ = blocked_prefix_scan(op, ident, (rev, cs_arr), L)
    q = vs[..., : L - 1][..., ::-1]
    rem = vs[..., L - 1 : L]
    return q, rem


def create_proof(
    index: ProverIndex,
    witness: list[list[int]],
    rng,
    prev_challenges=(),
    debug: dict | None = None,
    runtime_tables=None,
) -> ProverProof:
    cs = index.cs
    f = cs.f
    p = f.p
    F = limb.device_field(f)
    curve = index.curve
    d1, d8 = cs.domain.d1, cs.domain.d8
    n = d1.n
    nc = index.num_chunks
    srs_len = index.max_poly_size
    zk = cs.zk_rows
    _, endo_r = curve.endos

    checkpoint("create_recursive")
    # -- 1. pad witness + randomize zk rows --------------------------------
    # `witness` is 15 host columns, or a PRE-PACKED (16, 15, rows)
    # Montgomery evaluation array (rows <= n - zk): the reference's
    # witness is Vec<F> already in Montgomery limb form in memory, so
    # accepting the packed form keeps the timed region equivalent while
    # skipping ~0.5 s (k=15) of host bigint serialization. The zk-row
    # randomization draws in the same column-major rng order either way.
    if hasattr(witness, "shape"):
        assert cs.public == 0, "packed witness requires no public inputs"
        assert cs.lookup_cs is None, "packed witness requires no lookups"
        rows = witness.shape[2]
        assert rows <= n - zk, "no room for zk rows"
        if rows < n:
            witness = jnp.concatenate(
                [witness, F.zeros((COLUMNS, n - rows))], axis=-1
            )
        zk_draws = [rng.field(p) for _ in range(COLUMNS * zk)]
        w_evals_in = witness.at[:, :, n - zk :].set(
            F.pack_mont(zk_draws, shape=(COLUMNS, zk))
        )
        public = []
    else:
        witness = [list(col) for col in witness]
        length_witness = len(witness[0])
        assert length_witness <= n - zk, "no room for zk rows"
        for col in witness:
            col.extend([0] * (n - len(col)))
            for row in range(n - zk, n):
                col[row] = rng.field(p)
        public = witness[0][: cs.public]
        w_evals_in = None

    checkpoint("pad_witness")
    # -- 2. Fq transcript: vk digest, prev challenges ----------------------
    fq_sponge = sponge_for(curve)
    vk = index.verifier_index()
    fq_sponge.absorb_fq([vk.digest()])
    for rc in prev_challenges:
        fq_sponge.absorb_g(rc.comm.chunks)

    # -- 3. public polynomial (negated) ------------------------------------
    if cs.public == 0:
        # zero polynomial: commit = 0·G + 1·H = H per chunk — no MSM
        public_coeffs = F.zeros((1, n))
        public_comm = PolyComm([index.srs.h] * nc)
    else:
        public_evals_d1 = [(-x) % p for x in public] + [0] * (n - cs.public)
        public_dev = F.pack_mont(public_evals_d1, shape=(1, n))
        public_coeffs = d1.intt_t(public_dev, d1.inv_twiddles)  # (16, 1, n)
        public_comm = index.srs.commit_coeffs_dev(public_coeffs, nc, [[1] * nc])[0]
    fq_sponge.absorb_g(public_comm.chunks)

    checkpoint("set_up_fq_sponge")
    # -- 4. witness commitments (hiding fused into the MSM) -----------------
    if w_evals_in is not None:
        w_evals = w_evals_in
    else:
        flat_w = [v for col in witness for v in col]
        w_evals = F.pack_mont(flat_w, shape=(COLUMNS, n))  # (16, 15, n)
    w_coeffs = d1.intt_t(w_evals, d1.inv_twiddles)
    # vec![rand; num_chunks]: ONE sample repeated per chunk (prover.rs:317)
    w_blinders = [[rng.field(p)] * nc for _ in range(COLUMNS)]
    w_comms = index.srs.commit_coeffs_dev(w_coeffs, nc, w_blinders)
    for c in w_comms:
        fq_sponge.absorb_g(c.chunks)

    checkpoint("commit_to_witness_columns")
    # -- 4b. lookup: joint combiner, sorted polynomials --------------------
    lcs = cs.lookup_cs
    lookup_ctx = {}
    if lcs is not None:
        # runtime tables: the id/length layout must match the setup; the
        # contribution vector is committed + absorbed BEFORE the joint
        # combiner squeeze (prover.rs:383-450)
        runtime_d1 = None
        if lcs.runtime_tables_spec is not None:
            given = [(rt[0], len(rt[1])) for rt in (runtime_tables or [])]
            if given != lcs.runtime_tables_spec:
                raise ValueError("runtime tables inconsistent with configuration")
            runtime_d1 = [0] * n
            off = lcs.runtime_table_offset
            for _tid, data in runtime_tables:
                runtime_d1[off : off + len(data)] = [v % p for v in data]
                off += len(data)
            for i in range(n - zk, n):
                runtime_d1[i] = rng.field(p)
            runtime_dev = F.pack_mont(runtime_d1, shape=(1, n))
            runtime_coeffs = d1.intt_t(runtime_dev, d1.inv_twiddles)[:, 0]
            runtime_blinder = [rng.field(p) for _ in range(nc)]
            runtime_comm = index.srs.commit_coeffs_dev(
                runtime_coeffs[:, None, :], nc, [runtime_blinder]
            )[0]
            fq_sponge.absorb_g(runtime_comm.chunks)
            lookup_ctx.update(
                runtime_d1=runtime_d1, runtime_coeffs=runtime_coeffs,
                runtime_comm=runtime_comm, runtime_blinder=runtime_blinder,
            )
        jc_pre = fq_sponge.challenge().value if lcs.info.joint_lookup_used else 0
        from .poseidon.sponge import ScalarChallenge

        joint = ScalarChallenge(jc_pre).to_field(endo_r, f)
        tid_comb = (
            pow(joint, lcs.info.max_joint_size, p) if lcs.table_ids is not None else 0
        )
        dummy_value = lcs.dummy_entry.evaluate(p, joint, tid_comb, lambda pos: 0)
        table_d1 = lookup_mod.combined_table_d1(lcs, f, joint, tid_comb, runtime_d1)
        sorted_cols = lookup_mod.sorted_multiset(
            lcs, f, cs.gates, witness, joint, tid_comb, table_d1, zk
        )
        sorted_cols = [lookup_mod.zk_patch(f, c, n, zk, rng) for c in sorted_cols]
        nsorted = len(sorted_cols)
        sorted_dev = F.pack_mont(
            [v for col in sorted_cols for v in col], shape=(nsorted, n)
        )
        sorted_coeffs = d1.intt_t(sorted_dev, d1.inv_twiddles)
        sorted_blinders = [
            [rng.field(p) for _ in range(nc)] for _ in range(nsorted)
        ]
        sorted_comms = index.srs.commit_coeffs_dev(sorted_coeffs, nc, sorted_blinders)
        for c in sorted_comms:
            fq_sponge.absorb_g(c.chunks)
        lookup_ctx.update(
            joint=joint, tid_comb=tid_comb, dummy=dummy_value, table_d1=table_d1,
            sorted_cols=sorted_cols, sorted_coeffs=sorted_coeffs,
            sorted_comms=sorted_comms, sorted_blinders=sorted_blinders,
        )

    # -- 5. beta, gamma (raw 128-bit challenges) ---------------------------
    beta = fq_sponge.challenge().value
    gamma = fq_sponge.challenge().value

    # -- 5b. lookup aggregation --------------------------------------------
    if lcs is not None:
        aggreg = lookup_mod.aggregation(
            lcs, f, cs.gates, witness, lookup_ctx["joint"], lookup_ctx["tid_comb"],
            beta, gamma, lookup_ctx["sorted_cols"], lookup_ctx["table_d1"], zk, rng,
        )
        aggreg_dev = F.pack_mont(aggreg, shape=(1, n))
        aggreg_coeffs = d1.intt_t(aggreg_dev, d1.inv_twiddles)
        aggreg_blinder = [rng.field(p) for _ in range(nc)]
        aggreg_comm = index.srs.commit_coeffs_dev(aggreg_coeffs, nc, [aggreg_blinder])[0]
        fq_sponge.absorb_g(aggreg_comm.chunks)
        lookup_ctx.update(
            aggreg_coeffs=aggreg_coeffs[:, 0], aggreg_comm=aggreg_comm,
            aggreg_blinder=aggreg_blinder,
        )

    checkpoint("use_lookup")
    # -- 6. permutation aggregation z --------------------------------------
    # per-circuit constants: packed once per index, not per proof
    zp = getattr(index, "_zperm_dev", None)
    if zp is None:
        zp = (
            F.pack_mont([v for col in cs.sigma_d1 for v in col], shape=(PERMUTS, n)),
            F.pack_mont(cs.sid, shape=(1, n)),
            F.pack_mont(cs.shift, shape=(PERMUTS, 1)),
        )
        index._zperm_dev = zp
    sigma_d1_dev, sid_dev, shift_dev = zp
    beta_m = F.const_mont(beta, (1, 1))
    gamma_m = F.const_mont(gamma, (1, 1))
    w7 = w_evals[:, :PERMUTS]
    num_f = limb.add(
        F, limb.add(F, w7, limb.mont_mul(F, limb.mont_mul(F, sid_dev, beta_m), shift_dev)), gamma_m
    )
    den_f = limb.add(
        F, limb.add(F, w7, limb.mont_mul(F, sigma_d1_dev, beta_m)), gamma_m
    )

    def prod_rows(x):  # product over the 7 columns -> (16, n)
        acc = x[:, 0]
        for i in range(1, PERMUTS):
            acc = limb.mont_mul(F, acc, x[:, i])
        return acc

    ratio = limb.mont_mul(
        F, prod_rows(num_f), limb.batch_inverse(F, prod_rows(den_f))
    )  # (16, n)
    pref = limb.prefix_mul(F, ratio)  # P[j] = Π_{k<=j} ratio_k
    z_check = F.unpack_mont(pref[:, n - zk - 1 : n - zk])[0]
    if z_check != 1:
        raise ValueError("permutation argument: final z value is not 1")
    rand1, rand2 = rng.field(p), rng.field(p)
    parts = [
        F.one_mont((1,)),
        pref[:, : n - zk],  # z[1..n-zk]
        F.pack_mont([rand1, rand2], shape=(2,)),
    ]
    if zk > 3:
        # rows n-zk+3..n-1 continue the cumulative recurrence from rand2
        # (permutation.rs:546-556 general case)
        anchor_inv = pow(F.unpack_mont(pref[:, n - zk + 1 : n - zk + 2])[0], -1, p)
        scale = F.pack_mont([rand2 * anchor_inv % p], shape=(1,))
        tail = limb.mont_mul(F, pref[:, n - zk + 2 : n - 1], scale)
        parts.append(tail)
    z_evals = jnp.concatenate(parts, axis=-1)[:, :n]
    z_coeffs = d1.intt_t(z_evals, d1.inv_twiddles)
    z_blinder = [rng.field(p) for _ in range(nc)]
    z_comm = index.srs.commit_coeffs_dev(z_coeffs[:, None, :], nc, [z_blinder])[0]
    fq_sponge.absorb_g(z_comm.chunks)

    checkpoint("z_permutation_aggregation_polynomial")
    # -- 7. alpha ----------------------------------------------------------
    alpha = fq_sponge.challenge().to_field(endo_r, f)
    index.alphas.instantiate(alpha, p)

    checkpoint("eval_witness_polynomials_over_domains")
    # -- 8. quotient (one fused jitted dispatch) ---------------------------
    cd = index.column_data
    from .circuits.polynomials import optional_gates as og

    opt_present = [g for g in og.OPTIONAL_GATE_ORDER if g in cd.selector8]
    joint_val = lookup_ctx["joint"] if lcs is not None else 0
    chal = {
        "alpha": F.pack_mont([alpha], shape=(1,)),
        "beta": F.pack_mont([beta], shape=(1,)),
        "gamma": F.pack_mont([gamma], shape=(1,)),
        "joint_combiner": F.pack_mont([joint_val], shape=(1,)),
        "tid_comb": F.pack_mont(
            [lookup_ctx.get("tid_comb", 0) if lcs is not None else 0], shape=(1,)
        ),
    }
    lookup_in = None
    if lcs is not None:
        lookup_in = {
            "sorted_coeffs": lookup_ctx["sorted_coeffs"],
            "aggreg_coeffs": lookup_ctx["aggreg_coeffs"],
            "runtime_coeffs": lookup_ctx.get("runtime_coeffs"),
        }
    checkpoint("compute_quotient_poly")
    quotient, _rem, jt_coeff, r1_dev, r2_dev = _quotient_fn(index)(
        w_coeffs, z_coeffs, public_coeffs[:, 0], chal, lookup_in, index._qfn_consts
    )
    if lcs is not None:
        lookup_ctx["jt_coeff"] = jt_coeff
    if debug is not None:
        import numpy as _np

        debug["quotient_rem_zero"] = bool(
            _np.all(_np.asarray(limb.is_zero(F, _rem)))
        )
    a0, a1, a2 = index.alphas.get_alphas("permutation", 3)

    checkpoint("commit_quotient")
    t_nchunks = max(-(-quotient.shape[-1] // srs_len), 7 * nc)
    t_blinders = [rng.field(p) for _ in range(t_nchunks)]
    t_comm = index.srs.commit_coeffs_dev(
        quotient[:, None, :], 7 * nc, [t_blinders]
    )[0]
    fq_sponge.absorb_g(t_comm.chunks)

    checkpoint("lagrange_basis_eval_zeta_poly")
    # -- 10. zeta + evaluations -------------------------------------------
    zeta = fq_sponge.challenge().to_field(endo_r, f)
    omega = d1.group_gen
    zeta_omega = zeta * omega % p

    pow_z = poly.powers_dev(F, zeta, srs_len)
    pow_zw = poly.powers_dev(F, zeta_omega, srs_len)

    # batched coefficient stack: [public, z, w×15, s×6, coeff×15, sel×6]
    sel_stack = jnp.stack([cd.selector_coeff[g] for g in ALWAYS_ON], axis=1)
    stack = jnp.concatenate(
        [
            public_coeffs,  # 1
            z_coeffs[:, None, :],  # 1
            w_coeffs,  # 15
            cd.sigma_coeff[:, : PERMUTS - 1],  # 6
            cd.coefficients_coeff,  # 15
            sel_stack,  # 6
        ],
        axis=1,
    )  # (16, 44, n)
    if opt_present:
        stack = jnp.concatenate(
            [stack, jnp.stack([cd.selector_coeff[g] for g in opt_present], axis=1)],
            axis=1,
        )
    n_opt = len(opt_present)
    if lcs is not None:
        ld = index.lookup_data
        lk_stack = [lookup_ctx["sorted_coeffs"][:, i] for i in range(len(lookup_ctx["sorted_cols"]))]
        # (lookup columns follow the optional selectors in the stack)
        lk_stack.append(lookup_ctx["aggreg_coeffs"])
        lk_stack.append(lookup_ctx["jt_coeff"])
        has_runtime = "runtime_coeffs" in lookup_ctx
        if has_runtime:
            lk_stack.append(lookup_ctx["runtime_coeffs"])
            lk_stack.append(ld["runtime_sel_coeff"])
        lk_pats = list(lcs.info.patterns)
        lk_stack += [ld["sel_coeff"][pat] for pat in lk_pats]
        stack = jnp.concatenate([stack, jnp.stack(lk_stack, axis=1)], axis=1)

    ncols_stack = stack.shape[1]
    chunked = stack.reshape(limb.NLIMBS, ncols_stack * nc, srs_len)
    ev_z, ev_zw = poly.eval_at2(F, chunked, pow_z, pow_zw)

    def pe(i: int) -> PointEvaluations:
        return PointEvaluations(
            ev_z[i * nc : (i + 1) * nc], ev_zw[i * nc : (i + 1) * nc]
        )

    evals = ProofEvaluations(
        public=pe(0),
        z=pe(1),
        w=[pe(2 + i) for i in range(15)],
        s=[pe(17 + i) for i in range(6)],
        coefficients=[pe(23 + i) for i in range(15)],
        generic_selector=pe(38),
        poseidon_selector=pe(39),
        complete_add_selector=pe(40),
        mul_selector=pe(41),
        emul_selector=pe(42),
        endomul_scalar_selector=pe(43),
    )
    for gi, g in enumerate(opt_present):
        attr = {
            GateType.RangeCheck0: "range_check0_selector",
            GateType.RangeCheck1: "range_check1_selector",
            GateType.ForeignFieldAdd: "foreign_field_add_selector",
            GateType.ForeignFieldMul: "foreign_field_mul_selector",
            GateType.Xor16: "xor_selector",
            GateType.Rot64: "rot_selector",
        }[g]
        setattr(evals, attr, pe(44 + gi))
    if lcs is not None:
        ns = len(lookup_ctx["sorted_cols"])
        evals.lookup_sorted = [pe(44 + n_opt + i) for i in range(ns)] + [None] * (5 - ns)
        evals.lookup_aggregation = pe(44 + n_opt + ns)
        evals.lookup_table = pe(45 + n_opt + ns)
        base = 46 + n_opt + ns
        if has_runtime:
            evals.runtime_lookup_table = pe(base)
            evals.runtime_lookup_table_selector = pe(base + 1)
            base += 2
        from .circuits.lookup import LookupPattern

        sel_evals = {pat: pe(base + i) for i, pat in enumerate(lk_pats)}
        evals.xor_lookup_selector = sel_evals.get(LookupPattern.Xor)
        evals.lookup_gate_lookup_selector = sel_evals.get(LookupPattern.Lookup)
        evals.range_check_lookup_selector = sel_evals.get(LookupPattern.RangeCheck)
        evals.foreign_field_mul_lookup_selector = sel_evals.get(LookupPattern.ForeignFieldMul)

    checkpoint("compute_ft_poly")
    # -- 11. ft polynomial (Maller) ---------------------------------------
    zeta_srs = pow(zeta, srs_len, p)
    zeta_n = pow(zeta, n, p)  # zeta_to_domain_size
    combined = evals.combine(zeta_srs, pow(zeta_omega, srs_len, p), p)
    zkpm_zeta = cs.eval_zkpm(zeta)
    perm_scalar = combined.z.zeta_omega[0] * beta % p * a0 % p * zkpm_zeta % p
    for i in range(PERMUTS - 1):
        perm_scalar = (
            perm_scalar
            * ((gamma + beta * combined.s[i].zeta[0] + combined.w[i].zeta[0]) % p)
            % p
        )
    perm_scalar = (-perm_scalar) % p

    f_full = limb.mont_mul(
        F, cd.sigma_coeff[:, PERMUTS - 1], F.const_mont(perm_scalar, (1,))
    )  # (16, n)

    def collapse_chunks(arr, nchunks):
        # Σ ζ^{srs·i} chunk_i, padding the last chunk with zeros
        acc = None
        zp_ = 1
        for i in range(nchunks):
            chunk = arr[:, i * srs_len : (i + 1) * srs_len]
            pad = srs_len - chunk.shape[-1]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((NLIMBS, pad), dtype=chunk.dtype)], axis=-1
                )
            term = limb.mont_mul(F, chunk, F.const_mont(zp_, (1,)))
            acc = term if acc is None else limb.add(F, acc, term)
            zp_ = zp_ * zeta_srs % p
        return acc

    f_lin = collapse_chunks(f_full, nc)
    t_collapsed = collapse_chunks(quotient, len(t_blinders))
    ft_coeffs = limb.sub(
        F, f_lin, limb.mont_mul(F, t_collapsed, F.const_mont((zeta_n - 1) % p, (1,)))
    )
    # blinding of ft: -(ζ^n - 1)·Σ ζ^{srs·i} w_t_i
    t_blind_collapsed = 0
    zp = 1
    for w_t in t_blinders:
        t_blind_collapsed = (t_blind_collapsed + zp * w_t) % p
        zp = zp * zeta_srs % p
    blinding_ft = (-(zeta_n - 1) * t_blind_collapsed) % p

    ft_eval1 = poly.eval_at(F, ft_coeffs[:, None, :], pow_zw)[0]

    checkpoint("ft_eval_zeta_omega")
    # -- 12. Fr transcript -------------------------------------------------
    fq_sponge_before_evaluations = fq_sponge.clone()
    fr_sponge = fr_sponge_for(f)
    fr_sponge.absorb(fq_sponge.digest())
    prev_sponge = fr_sponge_for(f)
    for rc in prev_challenges:
        prev_sponge.absorb_multiple(rc.chals)
    fr_sponge.absorb(prev_sponge.digest())
    fr_sponge.absorb(ft_eval1)
    fr_sponge.absorb_multiple(evals.public.zeta)
    fr_sponge.absorb_multiple(evals.public.zeta_omega)
    for pt in evals.ordered_for_fr_sponge():
        fr_sponge.absorb_multiple(pt.zeta)
        fr_sponge.absorb_multiple(pt.zeta_omega)

    v = fr_sponge.challenge().to_field(endo_r, f)
    u = fr_sponge.challenge().to_field(endo_r, f)
    if debug is not None:
        debug.update(beta=beta, gamma=gamma, alpha=alpha, zeta=zeta, v=v, u=u,
                     joint=lookup_ctx.get("joint"), ft_eval1=ft_eval1)

    checkpoint("build_polynomials")
    # -- 13. assemble opening ----------------------------------------------
    plnms = []
    for rc in prev_challenges:
        from .poly_commitment.commitment import b_poly_coefficients

        coeffs = b_poly_coefficients(f, rc.chals)
        plnms.append((F.pack_mont(coeffs, shape=(len(coeffs),)), [0] * len(rc.comm)))
    plnms.append((public_coeffs[:, 0], [1] * nc))
    plnms.append((ft_coeffs, [blinding_ft]))
    plnms.append((z_coeffs, z_blinder))
    for g in ALWAYS_ON:
        plnms.append((cd.selector_coeff[g], [1] * nc))
    for i in range(COLUMNS):
        plnms.append((w_coeffs[:, i], w_blinders[i]))
    for i in range(COLUMNS):
        plnms.append((cd.coefficients_coeff[:, i], [0] * nc))
    for i in range(PERMUTS - 1):
        plnms.append((cd.sigma_coeff[:, i], [0] * nc))
    for g in opt_present:
        plnms.append((cd.selector_coeff[g], [0] * nc))
    if lcs is not None:
        ld = index.lookup_data
        for i in range(len(lookup_ctx["sorted_cols"])):
            plnms.append((lookup_ctx["sorted_coeffs"][:, i], lookup_ctx["sorted_blinders"][i]))
        plnms.append((lookup_ctx["aggreg_coeffs"], lookup_ctx["aggreg_blinder"]))
        # joint table blinding: Σ_{i<width} j^i + tid_comb (each column is
        # fixed-hiding in the verifier index; prover.rs:1346-1384)
        width = ld["table_coeff"].shape[1]
        fb = 0
        if width:
            fb = 1  # (1..width).fold(1, |acc,_| 1 + j*acc) = Σ_{i<width} j^i
            for _ in range(1, width):
                fb = (1 + lookup_ctx["joint"] * fb) % p
        base_blinding = (fb + lookup_ctx["tid_comb"]) % p
        if "runtime_coeffs" in lookup_ctx:
            # table blinder gains j * runtime blinder (prover.rs:1369-1382)
            jt_blinders = [
                (lookup_ctx["joint"] * rb + base_blinding) % p
                for rb in lookup_ctx["runtime_blinder"]
            ]
            plnms.append((lookup_ctx["jt_coeff"], jt_blinders))
            plnms.append((lookup_ctx["runtime_coeffs"], lookup_ctx["runtime_blinder"]))
            plnms.append((ld["runtime_sel_coeff"], [0]))
        else:
            plnms.append((lookup_ctx["jt_coeff"], [base_blinding] * nc))
        for pat in list(lcs.info.patterns):
            plnms.append((ld["sel_coeff"][pat], [0]))

    checkpoint("create_aggregated_ipa")
    opening = open_proof(
        index.srs,
        plnms,
        [zeta, zeta_omega],
        v,
        u,
        fq_sponge_before_evaluations,
        rng,
        debug=debug,
    )

    checkpoint("create_recursive_done")
    lookup_comms = None
    if lcs is not None:
        from .proof import LookupCommitments

        lookup_comms = LookupCommitments(
            sorted=lookup_ctx["sorted_comms"],
            aggreg=lookup_ctx["aggreg_comm"],
            runtime=lookup_ctx.get("runtime_comm"),
        )
    return ProverProof(
        commitments=ProverCommitments(
            w_comm=w_comms, z_comm=z_comm, t_comm=t_comm, lookup=lookup_comms
        ),
        proof=opening,
        evals=evals,
        ft_eval1=ft_eval1,
        prev_challenges=list(prev_challenges),
    )
