"""The kimchi verifier (kimchi/src/verifier.rs).

oracles() replays the Fiat-Shamir transcript (verifier.rs:126-630),
to_batch() builds the linearization commitment + evaluation list
(verifier.rs:781-1010), batch_verify() delegates the single batched
check to the IPA (poly_commitment/ipa.verify_batch).

The linearization constant term is evaluated at ζ by walking the same
constraint AST the prover used (circuits/expr.eval_host) — the berkeley
linearization has no index terms, so f_comm is just perm_scalars·σ6
(verifier.rs:897-958).
"""

from __future__ import annotations

from dataclasses import dataclass

from .circuits import expr as expr_mod
from .circuits.gate import COLUMNS, PERMUTS, GateType
from .poly_commitment.commitment import (
    PolyComm,
    combined_inner_product,
    poly_comm_add,
    poly_comm_scale,
)
from .poly_commitment.ipa import BatchEvaluationProof, Evaluation, verify_batch
from .poseidon import fp_kimchi, fq_kimchi
from .proof import ProverProof
from .prover import fr_sponge_for
from .prover_index import ALWAYS_ON
from .verifier_index import VerifierIndex, sponge_for


@dataclass
class Oracles:
    fq_sponge: object
    joint_combiner: int
    beta: int
    gamma: int
    alpha: int
    zeta: int
    v: int
    u: int
    ft_eval0: int
    combined_inner_product: int
    public_evals: list[list[int]]
    zeta1: int
    digest: int


def oracles(
    vk: VerifierIndex, proof: ProverProof, public_comm: PolyComm, public_input: list[int]
) -> Oracles:
    curve = vk.curve
    f = curve.scalar
    p = f.p
    n = vk.domain.n
    _, endo_r = curve.endos
    zk = vk.zk_rows

    fq_sponge = sponge_for(curve)
    fq_sponge.absorb_fq([vk.digest()])
    for rc in proof.prev_challenges:
        fq_sponge.absorb_g(rc.comm.chunks)
    fq_sponge.absorb_g(public_comm.chunks)
    for c in proof.commitments.w_comm:
        fq_sponge.absorb_g(c.chunks)

    joint_combiner = 0
    if vk.lookup_index is not None:
        li = vk.lookup_index
        if li.runtime_tables_selector is not None:
            fq_sponge.absorb_g(proof.commitments.lookup.runtime.chunks)
        from .poseidon.sponge import ScalarChallenge

        jc_pre = fq_sponge.challenge().value if li.joint_lookup_used else 0
        joint_combiner = ScalarChallenge(jc_pre).to_field(endo_r, f)
        for c in proof.commitments.lookup.sorted:
            fq_sponge.absorb_g(c.chunks)

    beta = fq_sponge.challenge().value
    gamma = fq_sponge.challenge().value
    if vk.lookup_index is not None:
        fq_sponge.absorb_g(proof.commitments.lookup.aggreg.chunks)
    fq_sponge.absorb_g(proof.commitments.z_comm.chunks)
    alpha = fq_sponge.challenge().to_field(endo_r, f)
    # quotient has 7*num_chunks chunks (verifier.rs:260 bounds it by
    # chunk_size * 7 with chunk_size = domain / max_poly_size)
    num_chunks = max(1, vk.domain.n // vk.max_poly_size)
    assert len(proof.commitments.t_comm.chunks) <= 7 * num_chunks, "t commitment too long"
    fq_sponge.absorb_g(proof.commitments.t_comm.chunks)
    zeta = fq_sponge.challenge().to_field(endo_r, f)

    digest = fq_sponge.clone().digest()
    fr_sponge = fr_sponge_for(f)
    fr_sponge.absorb(digest)

    prev_sponge = fr_sponge_for(f)
    for rc in proof.prev_challenges:
        prev_sponge.absorb_multiple(rc.chals)
    fr_sponge.absorb(prev_sponge.digest())

    zeta1 = pow(zeta, n, p)
    zetaw = zeta * vk.domain.group_gen % p
    zeta_to_srs = pow(zeta, vk.max_poly_size, p)
    zetaw_to_srs = pow(zetaw, vk.max_poly_size, p)

    # public evaluations from the public input (verifier.rs:332-380)
    if proof.evals.public is not None:
        public_evals = [proof.evals.public.zeta, proof.evals.public.zeta_omega]
    elif public_input is not None:
        if not public_input:
            public_evals = [[0], [0]]
        else:
            ws = [pow(vk.domain.group_gen, i, p) for i in range(len(public_input))]
            zeta_minus_x = [pow(zeta - w, -1, p) for w in ws]
            zetaw_minus_x = [pow(zetaw - w, -1, p) for w in ws]
            ev_z = 0
            ev_zw = 0
            for pi, li, lwi, w in zip(public_input, zeta_minus_x, zetaw_minus_x, ws):
                ev_z = (ev_z - li * pi * w) % p
                ev_zw = (ev_zw - lwi * pi * w) % p
            size_inv = pow(n, -1, p)
            public_evals = [
                [ev_z * (zeta1 - 1) * size_inv % p],
                [ev_zw * (pow(zetaw, n, p) - 1) * size_inv % p],
            ]
    else:
        raise ValueError("missing public input evaluation")

    fr_sponge.absorb(proof.ft_eval1)
    fr_sponge.absorb_multiple(public_evals[0])
    fr_sponge.absorb_multiple(public_evals[1])
    for pt in proof.evals.ordered_for_fr_sponge():
        fr_sponge.absorb_multiple(pt.zeta)
        fr_sponge.absorb_multiple(pt.zeta_omega)

    v = fr_sponge.challenge().to_field(endo_r, f)
    u = fr_sponge.challenge().to_field(endo_r, f)

    evals = proof.evals.combine(zeta_to_srs, zetaw_to_srs, p)
    vk.alphas.instantiate(alpha, p)
    a0, a1, a2 = vk.alphas.get_alphas("permutation", 3)
    zkpm_zeta = vk.zkpm_eval(zeta)
    zeta1m1 = (zeta1 - 1) % p

    # ft_eval0 (verifier.rs:412-489)
    init = (evals.w[PERMUTS - 1].zeta[0] + gamma) % p * evals.z.zeta_omega[0] % p
    init = init * a0 % p * zkpm_zeta % p
    ft_eval0 = init
    for i in range(PERMUTS - 1):
        ft_eval0 = (
            ft_eval0 * ((beta * evals.s[i].zeta[0] + evals.w[i].zeta[0] + gamma) % p) % p
        )
    # subtract public chunk polynomial evaluated with zeta_to_srs
    pub_at = 0
    for vpub in reversed(public_evals[0]):
        pub_at = (pub_at * zeta_to_srs + vpub) % p
    ft_eval0 = (ft_eval0 - pub_at) % p
    term = a0 * zkpm_zeta % p * evals.z.zeta[0] % p
    for i in range(PERMUTS):
        term = term * ((gamma + beta * zeta % p * vk.shift[i] + evals.w[i].zeta[0]) % p) % p
    ft_eval0 = (ft_eval0 - term) % p
    numerator = (
        (zeta1m1 * a1 % p * ((zeta - vk.zk_w) % p) + zeta1m1 * a2 % p * ((zeta - 1) % p))
        % p
        * ((1 - evals.z.zeta[0]) % p)
        % p
    )
    denominator = pow((zeta - vk.zk_w) % p * ((zeta - 1) % p) % p, -1, p)
    ft_eval0 = (ft_eval0 + numerator * denominator) % p

    # subtract the linearization constant term, evaluated at ζ on the host
    mds_params = fp_kimchi if f.name == "Fp" else fq_kimchi

    def get_cell(col, row):
        e = {
            "witness": lambda i: evals.w[i],
            "coefficient": lambda i: evals.coefficients[i],
        }
        if col[0] == "witness":
            pt = evals.w[col[1]]
        elif col[0] == "coefficient":
            pt = evals.coefficients[col[1]]
        elif col == expr_mod.COL_Z:
            pt = evals.z
        elif col == ("lookup_aggreg",):
            pt = evals.lookup_aggregation
        elif col == ("lookup_table",):
            pt = evals.lookup_table
        elif col == ("lookup_runtime_table",):
            pt = evals.runtime_lookup_table
        elif col == ("lookup_runtime_selector",):
            pt = evals.runtime_lookup_table_selector
        elif col[0] == "lookup_sorted":
            pt = evals.lookup_sorted[col[1]]
        elif col[0] == "lookup_kind":
            from .circuits.lookup import LookupPattern

            pt = {
                "xor": evals.xor_lookup_selector,
                "lookup": evals.lookup_gate_lookup_selector,
                "range_check": evals.range_check_lookup_selector,
                "ffmul": evals.foreign_field_mul_lookup_selector,
            }[col[1]]
        elif col[0] == "index":
            g = GateType(col[1])
            pt = {
                GateType.Generic: evals.generic_selector,
                GateType.Poseidon: evals.poseidon_selector,
                GateType.CompleteAdd: evals.complete_add_selector,
                GateType.VarBaseMul: evals.mul_selector,
                GateType.RangeCheck0: evals.range_check0_selector,
                GateType.RangeCheck1: evals.range_check1_selector,
                GateType.ForeignFieldAdd: evals.foreign_field_add_selector,
                GateType.ForeignFieldMul: evals.foreign_field_mul_selector,
                GateType.Xor16: evals.xor_selector,
                GateType.Rot64: evals.rot_selector,
                GateType.EndoMul: evals.emul_selector,
                GateType.EndoMulScalar: evals.endomul_scalar_selector,
            }[g]
        else:
            raise KeyError(col)
        return pt.zeta[0] if row == expr_mod.CURR else pt.zeta_omega[0]

    ctx = expr_mod.HostEvalContext(
        f=f,
        get_cell=get_cell,
        challenges={"alpha": alpha, "beta": beta, "gamma": gamma,
                    "joint_combiner": joint_combiner},
        endo=vk.endo,
        mds=[list(r) for r in mds_params.mds],
        point=zeta,
        domain_n=n,
        omega=vk.domain.group_gen,
        zk_rows=zk,
    )
    constant_term = expr_mod.eval_host(vk.linearization_expr, ctx)
    ft_eval0 = (ft_eval0 - constant_term) % p

    # combined inner product over the evaluation list (verifier.rs:492-560)
    es: list[list[list[int]]] = []
    for rc in proof.prev_challenges:
        from .poly_commitment.commitment import b_poly

        # RecursionChallenge::evals with max_poly_size >= domain: single chunk
        es.append([[b_poly(f, rc.chals, zeta)], [b_poly(f, rc.chals, zetaw)]])
    es.append(list(public_evals))
    es.append([[ft_eval0], [proof.ft_eval1]])
    for pt in proof.evals.ordered_for_commitment_list():
        es.append([pt.zeta, pt.zeta_omega])

    cip = combined_inner_product(f, v, u, es)

    return Oracles(
        fq_sponge=fq_sponge,
        joint_combiner=joint_combiner,
        beta=beta,
        gamma=gamma,
        alpha=alpha,
        zeta=zeta,
        v=v,
        u=u,
        ft_eval0=ft_eval0,
        combined_inner_product=cip,
        public_evals=public_evals,
        zeta1=zeta1,
        digest=digest,
    )


def to_batch(vk: VerifierIndex, proof: ProverProof, public_input: list[int]) -> BatchEvaluationProof:
    curve = vk.curve
    f = curve.scalar
    p = f.p

    # Public input commitment from the cached Lagrange-basis commitments
    # (verifier.rs:833; ipa.rs:648-660): -sum_i p_i * commit(L_i), which
    # is m host scalar-muls instead of an iNTT + n-point MSM. The public
    # polynomial has degree < max_poly_size, but a chunked proof commits
    # it with num_chunks chunks (zero beyond the first; verifier.rs:845
    # uses chunk_size blinders) — pad so the transcript matches.
    num_chunks = max(1, vk.domain.n // vk.max_poly_size)
    if public_input:
        lag = vk.srs.lagrange_commitments(vk.domain, len(public_input))
        acc = None
        for pi, li in zip(public_input, lag):
            acc = curve.add(acc, curve.scalar_mul((-pi) % p, li))
        comm = PolyComm([acc] + [None] * (num_chunks - 1))
    else:
        comm = PolyComm([None] * num_chunks)
    public_comm = vk.srs.mask(comm, [1] * len(comm))

    o = oracles(vk, proof, public_comm, public_input)

    evals = proof.evals.combine(
        pow(o.zeta, vk.max_poly_size, p),
        pow(o.zeta * vk.domain.group_gen % p, vk.max_poly_size, p),
        p,
    )

    # f_comm = perm_scalars · σ6  (berkeley: no index terms)
    a0, _a1, _a2 = vk.alphas.get_alphas("permutation", 3)
    zkpm_zeta = vk.zkpm_eval(o.zeta)
    scalar = evals.z.zeta_omega[0] * o.beta % p * a0 % p * zkpm_zeta % p
    for i in range(PERMUTS - 1):
        scalar = (
            scalar
            * ((o.gamma + o.beta * evals.s[i].zeta[0] + evals.w[i].zeta[0]) % p)
            % p
        )
    scalar = (-scalar) % p
    f_comm = poly_comm_scale(curve, vk.sigma_comm[PERMUTS - 1], scalar)

    # ft_comm = chunk(f_comm) - (ζ^n - 1)·chunk(t_comm)
    zeta_to_srs = pow(o.zeta, vk.max_poly_size, p)

    def chunk_commitment(c: PolyComm) -> PolyComm:
        acc = None
        for ch in reversed(c.chunks):
            acc = ch if acc is None else curve.add(curve.scalar_mul(zeta_to_srs, acc), ch)
        return PolyComm([acc])

    chunked_f = chunk_commitment(f_comm)
    chunked_t = chunk_commitment(proof.commitments.t_comm)
    ft_comm = poly_comm_add(
        curve, chunked_f, poly_comm_scale(curve, chunked_t, (-(o.zeta1 - 1)) % p)
    )

    evaluations = []
    for rc in proof.prev_challenges:
        from .poly_commitment.commitment import b_poly

        zetaw = o.zeta * vk.domain.group_gen % p
        evaluations.append(
            Evaluation(rc.comm, [[b_poly(f, rc.chals, o.zeta)], [b_poly(f, rc.chals, zetaw)]])
        )
    evaluations.append(Evaluation(public_comm, list(o.public_evals)))
    evaluations.append(Evaluation(ft_comm, [[o.ft_eval0], [proof.ft_eval1]]))

    cols = [
        (proof.commitments.z_comm, proof.evals.z),
        (vk.generic_comm, proof.evals.generic_selector),
        (vk.psm_comm, proof.evals.poseidon_selector),
        (vk.complete_add_comm, proof.evals.complete_add_selector),
        (vk.mul_comm, proof.evals.mul_selector),
        (vk.emul_comm, proof.evals.emul_selector),
        (vk.endomul_scalar_comm, proof.evals.endomul_scalar_selector),
    ]
    cols += [(proof.commitments.w_comm[i], proof.evals.w[i]) for i in range(COLUMNS)]
    cols += [(vk.coefficients_comm[i], proof.evals.coefficients[i]) for i in range(COLUMNS)]
    cols += [(vk.sigma_comm[i], proof.evals.s[i]) for i in range(PERMUTS - 1)]
    for comm_opt, ev_opt in [
        (vk.range_check0_comm, proof.evals.range_check0_selector),
        (vk.range_check1_comm, proof.evals.range_check1_selector),
        (vk.foreign_field_add_comm, proof.evals.foreign_field_add_selector),
        (vk.foreign_field_mul_comm, proof.evals.foreign_field_mul_selector),
        (vk.xor_comm, proof.evals.xor_selector),
        (vk.rot_comm, proof.evals.rot_selector),
    ]:
        if comm_opt is not None:
            cols.append((comm_opt, ev_opt))
    if vk.lookup_index is not None:
        li = vk.lookup_index
        lk = proof.commitments.lookup
        for i, c in enumerate(lk.sorted):
            cols.append((c, proof.evals.lookup_sorted[i]))
        cols.append((lk.aggreg, proof.evals.lookup_aggregation))
        # combined table commitment: Σ j^i col_i + tid_comb · ids
        joint = o.joint_combiner
        tid_comb = (
            pow(joint, li.lookup_info.max_joint_size, p) if li.table_ids is not None else 0
        )
        comb = None
        jpow = 1
        for ci, c in enumerate(li.lookup_table):
            term = poly_comm_scale(curve, c, jpow)
            if ci == 1 and lk.runtime is not None:
                # runtime contribution lives in the second column
                term = poly_comm_add(
                    curve, term, poly_comm_scale(curve, lk.runtime, joint)
                )
            comb = term if comb is None else poly_comm_add(curve, comb, term)
            jpow = jpow * joint % p
        if li.table_ids is not None:
            comb = poly_comm_add(curve, comb, poly_comm_scale(curve, li.table_ids, tid_comb))
        cols.append((comb, proof.evals.lookup_table))
        if li.runtime_tables_selector is not None:
            cols.append((lk.runtime, proof.evals.runtime_lookup_table))
            cols.append(
                (li.runtime_tables_selector, proof.evals.runtime_lookup_table_selector)
            )
        from .circuits.lookup import LookupPattern

        for pat, ev in [
            (LookupPattern.Xor, proof.evals.xor_lookup_selector),
            (LookupPattern.Lookup, proof.evals.lookup_gate_lookup_selector),
            (LookupPattern.RangeCheck, proof.evals.range_check_lookup_selector),
            (LookupPattern.ForeignFieldMul, proof.evals.foreign_field_mul_lookup_selector),
        ]:
            if pat in li.lookup_selectors:
                cols.append((li.lookup_selectors[pat], ev))
    for commv, pt in cols:
        evaluations.append(Evaluation(commv, [pt.zeta, pt.zeta_omega]))

    zetaw = o.zeta * vk.domain.group_gen % p
    return BatchEvaluationProof(
        sponge=o.fq_sponge,
        evaluations=evaluations,
        evaluation_points=[o.zeta, zetaw],
        polyscale=o.v,
        evalscale=o.u,
        opening=proof.proof,
        combined_inner_product=o.combined_inner_product,
    )


def verify(vk: VerifierIndex, proof: ProverProof, public_input: list[int], rng) -> bool:
    return batch_verify([(vk, proof, public_input)], rng)


def batch_verify(batch, rng) -> bool:
    proofs = [to_batch(vk, proof, pub) for vk, proof, pub in batch]
    srs = batch[0][0].srs
    return verify_batch(srs, proofs, rng)
