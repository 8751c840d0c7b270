"""Prover index: device-resident column data + linearization.

Mirrors kimchi/src/prover_index.rs (ProverIndex::create, :66) and the
column precomputation in constraints.rs:700-770 (ColumnEvaluations),
re-shaped for the TPU: every indexed column lives as one batched limb
array (coefficient form for ζ-evaluation dot products, d8 evaluation
form for the quotient), produced by two batched NTT passes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from .circuits import expr as expr_mod
from .circuits import lookup as lookup_mod
from .circuits.alphas import Alphas, default_alphas
from .circuits.constraints import ConstraintSystem
from .circuits.gate import COLUMNS, PERMUTS, GateType
from .circuits.polynomials import gates as gate_constraints
from .circuits.polynomials import optional_gates
from .curves import CurveParams
from .ops import limb, poly
from .ops.limb import NLIMBS
from .poly_commitment.commitment import PolyComm
from .poseidon import FqSponge, fp_kimchi, fq_kimchi
from .verifier_index import VerifierIndex

ALWAYS_ON = [
    GateType.Generic,
    GateType.Poseidon,
    GateType.CompleteAdd,
    GateType.VarBaseMul,
    GateType.EndoMul,
    GateType.EndoMulScalar,
]


def build_linearization(f, feature_flags, lookup_cs):
    """Full constraint AST + alpha registry (linearization.rs:43-367;
    constant term only — berkeley index_terms are empty).

    lookup_cs only needs `.info`, `.table_ids` and `.runtime_selector_d1`
    (a deserialized VerifierIndex passes a shadow object with just those;
    see verifier_index.from_file). Returns (alphas, linearization_expr).
    """
    lookup_constraints = None
    nlookup = 0
    if lookup_cs is not None:
        lookup_constraints = lookup_mod.constraints(lookup_cs, f)
        nlookup = len(lookup_constraints)
    alphas: Alphas = default_alphas(nlookup)
    total = None
    for g in ALWAYS_ON:
        term = gate_constraints.combined(g, f, alphas)
        total = term if total is None else total + term
    for g in optional_gates.OPTIONAL_GATE_ORDER:
        if g in feature_flags:
            constraints = optional_gates.OPTIONAL_GATE_BUILDERS[g](f)
            exps = alphas.get_exponents("gate", len(constraints))
            term = expr_mod.Cell(expr_mod.col_index(g), 0) * expr_mod.combine_constraints(
                exps, constraints
            )
            total = total + term
    if lookup_constraints is not None:
        exps = alphas.get_exponents("lookup", len(lookup_constraints))
        total = total + expr_mod.combine_constraints(exps, lookup_constraints)
    return alphas, total


@dataclass
class ColumnData:
    """Batched device columns (coefficient + d8 evaluation forms)."""

    sigma_coeff: Any  # (16, 7, n)
    sigma8: Any  # (16, 7, 8n)
    coefficients_coeff: Any  # (16, 15, n)
    coefficients8: Any  # (16, 15, 8n)
    selector_coeff: dict  # GateType -> (16, n)
    selector8: dict  # GateType -> (16, 8n)
    zkpl8: Any  # permutation vanishing poly on d8 (16, 8n)
    vanishes_zk_prev8: Any  # vanishes_on_last_n_rows(zk+1) on d8
    x_d8: Any  # the polynomial x evaluated on d8 (= d8 domain elements)


class ProverIndex:
    def __init__(self, cs: ConstraintSystem, curve: CurveParams, srs, lazy: bool = False):
        """curve: the commitment curve (Vesta for Fp proofs); srs over it."""
        assert curve.scalar is cs.f
        self.cs = cs
        self.curve = curve
        self.srs = srs
        self.max_poly_size = len(srs.g)
        n = cs.domain.d1.n
        self.num_chunks = 1 if n < self.max_poly_size else n // self.max_poly_size
        # endo used in-circuit = endo_q of the *other* curve, which lives in
        # our scalar field (curve.rs other_curve_endo; prover_index.rs:192)
        from .curves import Pallas, Vesta

        other = Pallas if curve.name == "Vesta" else Vesta
        cs.endo = other.endos[0]

        self.alphas, self.linearization_expr = build_linearization(
            cs.f, cs.feature_flags, cs.lookup_cs
        )
        self.column_data = self._build_columns()
        self.lookup_data = self._build_lookup_columns()
        self._verifier_index: VerifierIndex | None = None

    # -- column device data ------------------------------------------------

    def _build_columns(self) -> ColumnData:
        cs = self.cs
        f = cs.f
        F = limb.device_field(f)
        d1, d8 = cs.domain.d1, cs.domain.d8
        n = d1.n

        host_cols: list[list[int]] = []
        host_cols += cs.sigma_d1  # 7
        host_cols += cs.coefficients_d1  # 15
        sel_order = list(ALWAYS_ON) + [
            g for g in optional_gates.OPTIONAL_GATE_ORDER if g in cs.selectors_d1
        ]
        host_cols += [cs.selectors_d1[g] for g in sel_order]

        flat = [v for col in host_cols for v in col]
        arr = F.pack_mont(flat, shape=(len(host_cols), n))
        # twiddles as traced args: the jitted plan methods embed the
        # (log_n, 16, n/2) tables as HLO constants — ~318 MB at k=16 d8,
        # over the axon compile service's request limit (HTTP 413)
        coeffs = d1.intt_t(arr, d1.inv_twiddles)
        padded = jnp.concatenate(
            [coeffs, jnp.zeros((NLIMBS, len(host_cols), 7 * n), dtype=coeffs.dtype)], axis=-1
        )
        evals8 = d8.ntt_t(padded, d8.fwd_twiddles)

        # zk polynomials evaluated on d8 from the d8 element vector
        x_d8 = poly.powers_dev(F, d8.group_gen, d8.n)
        omega = d1.group_gen

        def prod_of_linear(roots: list[int]):
            acc = None
            for r in roots:
                term = limb.sub(F, x_d8, F.const_mont(r, (1,)))
                acc = term if acc is None else limb.mont_mul(F, acc, term)
            return acc

        zk = cs.zk_rows
        zkpl_roots = [
            pow(omega, n - zk, f.p),
            pow(omega, n - zk + 1, f.p),
            pow(omega, n - 1, f.p),
        ]
        vzp_roots = [pow(omega, n - (zk + 1) + i, f.p) for i in range(zk + 1)]

        self.selector_order = sel_order
        return ColumnData(
            sigma_coeff=coeffs[:, :7],
            sigma8=evals8[:, :7],
            coefficients_coeff=coeffs[:, 7:22],
            coefficients8=evals8[:, 7:22],
            selector_coeff={g: coeffs[:, 22 + i] for i, g in enumerate(sel_order)},
            selector8={g: evals8[:, 22 + i] for i, g in enumerate(sel_order)},
            zkpl8=prod_of_linear(zkpl_roots),
            vanishes_zk_prev8=prod_of_linear(vzp_roots),
            x_d8=x_d8,
        )

    def _build_lookup_columns(self):
        lcs = self.cs.lookup_cs
        if lcs is None:
            return None
        F = limb.device_field(self.cs.f)
        d1, d8 = self.cs.domain.d1, self.cs.domain.d8
        n = d1.n
        cols: list[list[int]] = list(lcs.lookup_table)
        if lcs.table_ids is not None:
            cols = cols + [lcs.table_ids]
        sel_pats = list(lcs.info.patterns)
        cols = cols + [lcs.selectors_d1[pat] for pat in sel_pats]
        has_runtime = lcs.runtime_selector_d1 is not None
        if has_runtime:
            cols = cols + [lcs.runtime_selector_d1]
        arr = F.pack_mont([v for col in cols for v in col], shape=(len(cols), n))
        coeffs = d1.intt_t(arr, d1.inv_twiddles)
        padded = jnp.concatenate(
            [coeffs, jnp.zeros((limb.NLIMBS, len(cols), 7 * n), dtype=coeffs.dtype)],
            axis=-1,
        )
        evals8 = d8.ntt_t(padded, d8.fwd_twiddles)
        w = len(lcs.lookup_table)
        has_ids = lcs.table_ids is not None
        off = w + (1 if has_ids else 0)
        return {
            "table_coeff": coeffs[:, :w],
            "table8": evals8[:, :w],
            "ids_coeff": coeffs[:, w] if has_ids else None,
            "ids8": evals8[:, w] if has_ids else None,
            "sel_coeff": {pat: coeffs[:, off + i] for i, pat in enumerate(sel_pats)},
            "sel8": {pat: evals8[:, off + i] for i, pat in enumerate(sel_pats)},
            "runtime_sel_coeff": coeffs[:, off + len(sel_pats)] if has_runtime else None,
            "runtime_sel8": evals8[:, off + len(sel_pats)] if has_runtime else None,
        }

    # -- verifier index ----------------------------------------------------

    def _vk_cache_path(self):
        """Disk-cache key for the verifier-index COMMITMENTS: they are a
        deterministic function of (curve, SRS, circuit, num_chunks), and
        computing them costs a b≈32 MSM trace+dispatch (~3-16 min/process
        on axon). Commitment points cache like the reference's lagrange
        basis cache (srs.rs LAGRANGE_CACHE_DIR)."""
        import hashlib

        from .poly_commitment.srs import CACHE_DIR

        cs = self.cs
        h = hashlib.blake2b(digest_size=16)
        h.update(
            f"vk1|{self.curve.name}|{cs.domain.d1.n}|{cs.public}|"
            f"{cs.zk_rows}|{self.num_chunks}|{len(self.srs.g)}".encode()
        )
        h.update(repr(self.srs.h).encode())
        h.update(repr(self.srs.g[0]).encode())
        h.update(repr(self.srs.g[-1]).encode())
        for g in cs.gates:
            h.update(
                (
                    f"{g.typ.value};"
                    + ",".join(f"{w.row}:{w.col}" for w in g.wires)
                    + ";" + ",".join(map(str, g.coeffs))
                ).encode()
            )
        lcs = cs.lookup_cs
        if lcs is not None:
            h.update(repr(lcs.runtime_tables_spec).encode())
            h.update(repr(lcs.table_ids).encode())
            for col in lcs.lookup_table:
                h.update(repr(col).encode())
        return CACHE_DIR / f"vk_{h.hexdigest()}.npy"

    def _load_vk_comms(self):
        import os

        import numpy as np

        if os.environ.get("PST_NO_VK_CACHE") == "1":
            return None
        path = self._vk_cache_path()
        if not path.exists():
            return None
        try:
            payload = np.load(path, allow_pickle=True)[0]
        except Exception:
            return None
        comms = [PolyComm(list(ch)) for ch in payload["comms"]]
        opt_comms = {
            GateType(gv): PolyComm(list(ch)) for gv, ch in payload["opt"].items()
        }
        lookup_vk = None
        if payload["lookup"] is not None:
            from .circuits.lookup import LookupPattern
            from .verifier_index import LookupVerifierIndex

            lk = payload["lookup"]
            lcs = self.cs.lookup_cs
            lookup_vk = LookupVerifierIndex(
                joint_lookup_used=lcs.info.joint_lookup_used,
                lookup_info=lcs.info,
                lookup_table=[PolyComm(list(ch)) for ch in lk["table"]],
                table_ids=PolyComm(list(lk["ids"])) if lk["ids"] is not None else None,
                lookup_selectors={
                    LookupPattern(pv): PolyComm(list(ch))
                    for pv, ch in lk["sel"].items()
                },
                runtime_tables_selector=(
                    PolyComm(list(lk["runtime"])) if lk["runtime"] is not None else None
                ),
            )
        return comms, opt_comms, lookup_vk

    def _save_vk_comms(self, comms, opt_comms, lookup_vk) -> None:
        import os

        import numpy as np

        if os.environ.get("PST_NO_VK_CACHE") == "1":
            return
        payload = {
            "comms": [c.chunks for c in comms],
            "opt": {g.value: c.chunks for g, c in opt_comms.items()},
            "lookup": None,
        }
        if lookup_vk is not None:
            payload["lookup"] = {
                "table": [c.chunks for c in lookup_vk.lookup_table],
                "ids": lookup_vk.table_ids.chunks if lookup_vk.table_ids else None,
                "sel": {
                    pat.value: c.chunks
                    for pat, c in lookup_vk.lookup_selectors.items()
                },
                "runtime": (
                    lookup_vk.runtime_tables_selector.chunks
                    if lookup_vk.runtime_tables_selector
                    else None
                ),
            }
        path = self._vk_cache_path()
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(f".tmp{os.getpid()}")
        np.save(tmp, np.array([payload], dtype=object), allow_pickle=True)
        os.replace(f"{tmp}.npy" if not str(tmp).endswith(".npy") else tmp, path)

    def _compute_vk_comms(self):
        cd = self.column_data
        all_coeffs = jnp.concatenate(
            [
                cd.sigma_coeff,
                cd.coefficients_coeff,
                jnp.stack([cd.selector_coeff[g] for g in ALWAYS_ON], axis=1),
            ],
            axis=1,
        )  # (16, 28, n)
        opt_present = [
            g for g in optional_gates.OPTIONAL_GATE_ORDER
            if g in self.cs.selectors_d1
        ]
        if opt_present:
            opt_stack = jnp.stack(
                [cd.selector_coeff[g] for g in opt_present], axis=1
            )
            all_coeffs = jnp.concatenate([all_coeffs, opt_stack], axis=1)
        comms = self.srs.commit_coeffs_dev(all_coeffs, self.num_chunks)
        opt_comms = {g: comms[28 + i] for i, g in enumerate(opt_present)}
        comms = comms[:28]
        # selector commitments are fixed-hiding (+1·H), verifier_index.rs:173
        ones = [1] * self.num_chunks
        for i in range(22, 28):
            comms[i] = self.srs.mask(comms[i], ones)
        lookup_vk = None
        if self.cs.lookup_cs is not None:
            ld = self.lookup_data
            lcs = self.cs.lookup_cs
            ncols = ld["table_coeff"].shape[1]
            stack = [ld["table_coeff"][:, i] for i in range(ncols)]
            if ld["ids_coeff"] is not None:
                stack.append(ld["ids_coeff"])
            sel_pats = list(lcs.info.patterns)
            stack += [ld["sel_coeff"][pat] for pat in sel_pats]
            if ld["runtime_sel_coeff"] is not None:
                stack.append(ld["runtime_sel_coeff"])
            lcomms = self.srs.commit_coeffs_dev(
                jnp.stack(stack, axis=1), self.num_chunks
            )
            table_comms = [
                self.srs.mask(lcomms[i], ones) for i in range(ncols)
            ]
            idx = ncols
            ids_comm = None
            if ld["ids_coeff"] is not None:
                ids_comm = self.srs.mask(lcomms[idx], ones)
                idx += 1
            sel_comms = {pat: lcomms[idx + i] for i, pat in enumerate(sel_pats)}
            runtime_sel_comm = None
            if ld["runtime_sel_coeff"] is not None:
                runtime_sel_comm = lcomms[idx + len(sel_pats)]
            from .verifier_index import LookupVerifierIndex

            lookup_vk = LookupVerifierIndex(
                joint_lookup_used=lcs.info.joint_lookup_used,
                lookup_info=lcs.info,
                lookup_table=table_comms,
                table_ids=ids_comm,
                lookup_selectors=sel_comms,
                runtime_tables_selector=runtime_sel_comm,
            )
        return comms, opt_comms, lookup_vk

    def verifier_index(self) -> VerifierIndex:
        if self._verifier_index is None:
            cached = self._load_vk_comms()
            if cached is not None:
                comms, opt_comms, lookup_vk = cached
            else:
                comms, opt_comms, lookup_vk = self._compute_vk_comms()
                self._save_vk_comms(comms, opt_comms, lookup_vk)
            self._verifier_index = VerifierIndex(
                curve=self.curve,
                domain=self.cs.domain.d1,
                max_poly_size=self.max_poly_size,
                zk_rows=self.cs.zk_rows,
                public=self.cs.public,
                sigma_comm=comms[:7],
                coefficients_comm=comms[7:22],
                generic_comm=comms[22],
                psm_comm=comms[23],
                complete_add_comm=comms[24],
                mul_comm=comms[25],
                emul_comm=comms[26],
                endomul_scalar_comm=comms[27],
                shift=self.cs.shift,
                endo=self.cs.endo,
                zkpm_eval=self.cs.eval_zkpm,
                srs=self.srs,
                linearization_expr=self.linearization_expr,
                alphas=self.alphas,
                zk_w=self.cs.zk_w(),
                lookup_index=lookup_vk,
                range_check0_comm=opt_comms.get(GateType.RangeCheck0),
                range_check1_comm=opt_comms.get(GateType.RangeCheck1),
                foreign_field_add_comm=opt_comms.get(GateType.ForeignFieldAdd),
                foreign_field_mul_comm=opt_comms.get(GateType.ForeignFieldMul),
                xor_comm=opt_comms.get(GateType.Xor16),
                rot_comm=opt_comms.get(GateType.Rot64),
            )
        return self._verifier_index
