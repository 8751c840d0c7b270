"""IPA polynomial commitment opening proofs (prove + batch verify).

Protocol semantics follow poly-commitment/src/ipa.rs exactly:
  - open (ipa.rs:687-927): combine polynomials with polyscale powers,
    absorb shift_scalar(<p, b>), derive U from a base-field challenge via
    the group map, run log2(n) folding rounds (L/R Pedersen MSMs,
    128-bit endo-expanded challenges), finish with the Schnorr-style
    (delta, z1, z2) and the folded base sg,
  - verify (ipa.rs:195-385): ONE randomly-weighted MSM over
    [H] ++ g ++ per-proof {sg, U, L/R, evaluation commitments, delta}
    that must equal the identity; includes the <s, g> consistency term
    for sg with s = b_poly_coefficients(challenges),
  - challenges re-derivation (ipa.rs:1099-1140).

TPU split: the coefficient/evaluation vectors (a, b) and the basis g
live on device; folds are batched limb kernels; the basis fold
g_lo + [u] g_hi is a uniform-scalar batched double-and-add
(ops/curve_ops.scalar_mul_const). Challenge plumbing, tiny Schnorr
algebra, and the final window recombinations stay on the host.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import AffinePoint, CurveParams
from ..fields import FieldParams
from ..ops import limb, msm, ntt
from ..ops.curve_ops import APoint, JPoint, device_curve, scalar_mul_const
from ..poseidon.sponge import FqSponge
from .commitment import (
    PolyComm,
    b_poly,
    b_poly_coefficients,
    combined_inner_product,
    shift_scalar,
)


@dataclass
class OpeningProof:
    """ipa.rs:1042 — {lr, delta, z1, z2, sg}."""

    lr: list[tuple[AffinePoint, AffinePoint]]
    delta: AffinePoint
    z1: int
    z2: int
    sg: AffinePoint

    def challenges(self, curve: CurveParams, sponge: FqSponge):
        """Re-derive the round challenges from the transcript (ipa.rs:1124)."""
        f = curve.scalar
        _, endo_r = curve.endos
        chal = []
        for l, r in self.lr:
            sponge.absorb_g([l])
            sponge.absorb_g([r])
            chal.append(sponge.challenge().to_field(endo_r, f))
        chal_inv = [pow(c, -1, f.p) for c in chal]
        return chal, chal_inv


@dataclass
class Evaluation:
    """A commitment plus its evaluations[point][chunk] (commitment.rs)."""

    commitment: PolyComm
    evaluations: list[list[int]]


@dataclass
class BatchEvaluationProof:
    sponge: FqSponge
    evaluations: list[Evaluation]
    evaluation_points: list[int]
    polyscale: int
    evalscale: int
    opening: OpeningProof
    combined_inner_product: int


from ..ops.poly import powers_dev as _powers_dev  # device squaring chain


def combine_polys_dev(
    F: limb.DeviceField,
    plnms: list[tuple[jnp.ndarray, list[int]]],
    polyscale: int,
    srs_len: int,
):
    """Σ_i polyscale^i · segment_i on device (utils.rs:103 combine_polys).

    plnms: list of (coeffs (16, L) Montgomery, blinder per chunk).
    Returns (combined (16, padded) Montgomery, combined blinder int).
    """
    from ..ops import poly

    p = F.params.p
    blind = 0
    scale_i = 1
    segs = []
    scale_idx = []
    idx = 0
    for coeffs, blinders in plnms:
        L = coeffs.shape[-1]
        nchunks = max(-(-L // srs_len), len(blinders))
        for ci in range(nchunks):
            seg = coeffs[:, ci * srs_len : (ci + 1) * srs_len]
            if seg.shape[-1]:
                pad = srs_len - seg.shape[-1]
                if pad:
                    seg = jnp.concatenate(
                        [seg, jnp.zeros((limb.NLIMBS, pad), dtype=seg.dtype)],
                        axis=-1,
                    )
                segs.append(seg)
                scale_idx.append(idx)
            blind = (blind + blinders[ci] * scale_i) % p
            scale_i = scale_i * polyscale % p
            idx += 1
    # weighted sum of all segments in O(log) batched ops: the polyscale
    # power ladder is a device squaring chain (one transfer) and the
    # segment reduction a halving tree — the per-segment host pack +
    # mul/add chain was ~3 dispatches and one tunnel transfer per chunk.
    stackd = jnp.stack(segs, axis=1)  # (16, S, srs_len)
    pows = poly.powers_dev(F, polyscale, idx)
    sc = jnp.take(pows, jnp.asarray(scale_idx, dtype=jnp.int32), axis=-1)
    terms = limb.mont_mul(F, stackd, sc[:, :, None])
    S = len(segs)
    Sp = 1
    while Sp < S:
        Sp *= 2
    if Sp != S:
        terms = jnp.concatenate(
            [terms, jnp.zeros((limb.NLIMBS, Sp - S, srs_len), dtype=terms.dtype)],
            axis=1,
        )
    while Sp > 1:
        Sp //= 2
        terms = limb.add(F, terms[:, :Sp], terms[:, Sp:])
    return terms[:, 0], blind


@functools.partial(jax.jit, static_argnums=0)
def _round_scalars(F, a, b, mask, bit_k, rand_lr):
    """One round's L/R MSM scalar rows [w ++ rand ++ ip], one dispatch.

    rand_lr: (16, 2, 1) canonical standard-form blinders."""
    m = a.shape[-1] // 2
    n = mask.shape[-1]
    a_lo, a_hi = a[:, :m], a[:, m:]
    b_lo, b_hi = b[:, :m], b[:, m:]
    ip_l = ntt.dot_mod(F, a_hi, b_lo)
    ip_r = ntt.dot_mod(F, a_lo, b_hi)
    zeros_n = jnp.zeros_like(mask)
    a_hi_t = jnp.tile(a_hi, (1, n // m))
    a_lo_t = jnp.tile(a_lo, (1, n // m))
    w_l = limb.select(bit_k, zeros_n, limb.mont_mul(F, mask, a_hi_t))
    w_r = limb.select(bit_k, limb.mont_mul(F, mask, a_lo_t), zeros_n)
    body = limb.from_mont(F, jnp.stack([w_l, w_r], axis=1))
    ips = limb.from_mont(F, jnp.stack([ip_l, ip_r], axis=1))
    scal = jnp.concatenate([body, rand_lr, ips], axis=-1)  # (16, 2, n+2)
    return scal


@functools.partial(jax.jit, static_argnums=0)
def _round_fold(F, a, b, mask, bit_k, u_arr, u_inv_arr):
    """Fold a/b and update the b_poly mask, fused (one dispatch)."""
    m = a.shape[-1] // 2
    a2 = limb.add(F, a[:, :m], limb.mont_mul(F, a[:, m:], u_inv_arr))
    b2 = limb.add(F, b[:, :m], limb.mont_mul(F, b[:, m:], u_arr))
    mask2 = limb.select(bit_k, limb.mont_mul(F, mask, u_arr), mask)
    return a2, b2, mask2


def open_proof(
    srs,
    plnms: list[tuple[jnp.ndarray, list[int]]],
    elm: list[int],
    polyscale: int,
    evalscale: int,
    sponge: FqSponge,
    rng,
    debug: dict | None = None,
) -> OpeningProof:
    """IPA opening (ipa.rs:687). plnms as in combine_polys_dev; elm are the
    evaluation points (ζ, ζω); sponge is the running Fq transcript."""
    curve: CurveParams = srs.curve
    f: FieldParams = curve.scalar
    F = limb.device_field(f)
    dc = device_curve(curve)
    _, endo_r = curve.endos

    n = len(srs.g)
    rounds = (n - 1).bit_length() if n > 1 else 1
    padded = 1 << rounds
    assert padded == n, "power-of-two SRS expected"

    a, blinding_factor = combine_polys_dev(F, plnms, polyscale, n)

    # b_init[j] = Σ_i evalscale^i · elm_i^j
    b_arr = None
    scale = 1
    for e in elm:
        powers = _powers_dev(F, e, padded)
        term = limb.mont_mul(F, powers, F.pack_mont([scale], shape=(1,)))
        b_arr = term if b_arr is None else limb.add(F, b_arr, term)
        scale = scale * evalscale % f.p
    cip = F.unpack_mont(ntt.dot_mod(F, a, b_arr))[0]
    if debug is not None:
        debug["cip"] = cip

    sponge.absorb_fr([shift_scalar(curve, cip)])
    t = sponge.challenge_fq()
    u_base = curve.to_group(t)

    # The folded basis g^{(k)} is never materialised. Each round's L/R
    # Pedersen commitments are MSMs over the ORIGINAL g with masked
    # scalars: g^{(k)}[i] = Σ_h (Π u_r^{h_r}) g[i + offset(h)], so
    #   L_k = < mask·tile(a_hi), g >  restricted to bit_k(j) == 0,
    #   R_k = < mask·tile(a_lo), g >  restricted to bit_k(j) == 1,
    # with mask[j] = Π_{r<k} u_r^{bit_{log n-1-r}(j)} (the running
    # b_poly coefficient pattern). One fixed MSM shape serves every
    # round (XLA compile time is the binding constraint), and the final
    # folded base is sg = <mask_final, g> = <b_poly_coefficients, g>
    # (ipa.rs:296 — the verifier recomputes exactly this).
    b = b_arr
    lr: list[tuple[AffinePoint, AffinePoint]] = []
    blinders: list[tuple[int, int]] = []
    chals: list[int] = []
    chal_invs: list[int] = []

    import numpy as np

    from ..utils.tracing import checkpoint

    if jax.default_backend() in ("tpu", "axon"):
        # fused device-resident loop: ONE dispatch + ONE transfer for all
        # log(n) rounds (sponge + challenges on device; host replays the
        # transcript from the fetched L/R points)
        lr, blinders, chals, chal_invs, a0, b0, g0 = _open_rounds_device(
            srs, sponge, F, a, b_arr, u_base, rng, rounds, debug=debug
        )
        checkpoint("ipa_rounds_device")
    else:
        a0, b0, g0 = _open_rounds_host(
            srs, sponge, F, dc, a, b_arr, u_base, rng, rounds,
            lr, blinders, chals, chal_invs, checkpoint,
        )

    r_prime = blinding_factor
    for (rand_l, rand_r), (u, u_inv) in zip(blinders, zip(chals, chal_invs)):
        r_prime = (r_prime + rand_l * u_inv + rand_r * u) % f.p

    d = rng.field(f.p)
    r_delta = rng.field(f.p)
    delta = curve.add(
        curve.scalar_mul(d, curve.add(g0, curve.scalar_mul(b0, u_base))),
        curve.scalar_mul(r_delta, srs.h),
    )
    sponge.absorb_g([delta])
    c = sponge.challenge().to_field(endo_r, f)
    z1 = (a0 * c + d) % f.p
    z2 = (r_prime * c + r_delta) % f.p

    return OpeningProof(lr=lr, delta=delta, z1=z1, z2=z2, sg=g0)


def _open_rounds_host(
    srs, sponge, F, dc, a, b, u_base, rng, rounds,
    lr, blinders, chals, chal_invs, checkpoint,
):
    """Per-round host-driven loop (CPU fallback; exact golden model of
    the fused device loop above)."""
    import numpy as np

    curve: CurveParams = srs.curve
    f: FieldParams = curve.scalar
    _, endo_r = curve.endos
    n = len(srs.g)

    extra = dc.pack_affine([srs.h, u_base])
    g_ext = APoint(
        jnp.concatenate([srs.g_dev.x, extra.x], axis=-1),
        jnp.concatenate([srs.g_dev.y, extra.y], axis=-1),
        jnp.concatenate([srs.g_dev.inf, extra.inf], axis=-1),
    )
    mask = F.one_mont((n,))

    for k in range(rounds):
        checkpoint(f"ipa_round_{k}_start")
        rand_l = rng.field(f.p)
        rand_r = rng.field(f.p)

        bit_k = jnp.asarray(
            ((np.arange(n) >> (rounds - 1 - k)) & 1).astype(np.bool_)
        )
        rand_lr = F.pack([rand_l, rand_r], shape=(2, 1))
        scal = _round_scalars(F, a, b, mask, bit_k, rand_lr)
        checkpoint("ipa_scalars")
        l_pt, r_pt = msm.msm(curve, scal, g_ext)
        checkpoint("ipa_msm")
        lr.append((l_pt, r_pt))
        blinders.append((rand_l, rand_r))
        sponge.absorb_g([l_pt])
        sponge.absorb_g([r_pt])

        u_pre = sponge.challenge()
        u = u_pre.to_field(endo_r, f)
        u_inv = pow(u, -1, f.p)
        chals.append(u)
        chal_invs.append(u_inv)

        a, b, mask = _round_fold(
            F, a, b, mask, bit_k,
            F.pack_mont([u], shape=(1,)),
            F.pack_mont([u_inv], shape=(1,)),
        )
        checkpoint("ipa_fold")

    a0 = F.unpack_mont(a)[0]
    b0 = F.unpack_mont(b)[0]
    g0 = msm.msm(curve, limb.from_mont(F, mask)[:, None, :], srs.g_dev)[0]
    return a0, b0, g0


@functools.partial(jax.jit, static_argnums=(0, 1))
def _accum_sg_scalars(F, rounds, chal_mont, w_mont, acc):
    """acc += w · s on device, where s = b_poly_coefficients(chals):
    s_i = Π_{j: bit_j(i)=1} chal[rounds-1-j]. The mask is built in
    rounds masked mont_muls over the full (16, n) array — the host
    bigint version was O(n) Python per proof and dominated batch
    verification at k>=15 (ipa.rs:296 s-vector).

    chal_mont: (16, rounds) Montgomery challenges; w_mont: (16, 1)
    Montgomery weight sg_rand_base_i; acc: (16, n) Montgomery."""
    n = acc.shape[-1]
    i_arr = jnp.arange(n, dtype=jnp.uint32)
    mask = jnp.broadcast_to(w_mont, (limb.NLIMBS, n))

    def body(j, m):
        cj = jax.lax.dynamic_slice_in_dim(chal_mont, j, 1, axis=1)
        sh = (rounds - 1 - j).astype(jnp.uint32)
        bit = ((i_arr >> sh) & 1).astype(jnp.bool_)
        return limb.select(bit, limb.mont_mul(F, m, cj), m)

    mask = jax.lax.fori_loop(0, rounds, body, mask)
    return limb.add(F, acc, mask)


@functools.partial(jax.jit, static_argnums=0)
def _from_mont_j(F, acc):
    return limb.from_mont(F, acc)


def verify_batch(srs, batch: list[BatchEvaluationProof], rng) -> bool:
    """Batched IPA verification (ipa.rs:195-385): one MSM == identity."""
    curve: CurveParams = srs.curve
    f: FieldParams = curve.scalar
    _, endo_r = curve.endos
    n = len(srs.g)
    rounds = (n - 1).bit_length() if n > 1 else 1
    padded = 1 << rounds
    assert padded == n

    # scalars for the fixed [h] ++ g prefix: h's stays a host int; the
    # g-basis scalars (the per-proof s-vectors) accumulate ON DEVICE
    suffix_points: list[AffinePoint] = []
    suffix_scalars: list[int] = []
    h_scalar = 0
    F = limb.device_field(f)
    acc = F.zeros((padded,))

    rand_base = rng.field(f.p)
    sg_rand_base = rng.field(f.p)
    rand_base_i = 1
    sg_rand_base_i = 1

    for bp in batch:
        sponge = bp.sponge
        sponge.absorb_fr([shift_scalar(curve, bp.combined_inner_product)])
        t = sponge.challenge_fq()
        u_base = curve.to_group(t)

        chal, chal_inv = bp.opening.challenges(curve, sponge)
        sponge.absorb_g([bp.opening.delta])
        c = sponge.challenge().to_field(endo_r, f)

        b0 = 0
        scale = 1
        for e in bp.evaluation_points:
            b0 = (b0 + scale * b_poly(f, chal, e)) % f.p
            scale = scale * bp.evalscale % f.p

        acc = _accum_sg_scalars(
            F,
            rounds,
            F.pack_mont(chal, shape=(rounds,)),
            F.pack_mont([sg_rand_base_i], shape=(1,)),
            acc,
        )

        neg_rand_base_i = (-rand_base_i) % f.p
        suffix_points.append(bp.opening.sg)
        suffix_scalars.append(
            (neg_rand_base_i * bp.opening.z1 - sg_rand_base_i) % f.p
        )
        h_scalar = (h_scalar - rand_base_i * bp.opening.z2) % f.p
        suffix_points.append(u_base)
        suffix_scalars.append(neg_rand_base_i * bp.opening.z1 * b0 % f.p)

        rand_base_i_c_i = c * rand_base_i % f.p
        for (l, r), (u_inv, u) in zip(bp.opening.lr, zip(chal_inv, chal)):
            suffix_points.append(l)
            suffix_scalars.append(rand_base_i_c_i * u_inv % f.p)
            suffix_points.append(r)
            suffix_scalars.append(rand_base_i_c_i * u % f.p)

        # evaluation commitments: Σ polyscale^i chunks with eval recombination
        xi_i = 1
        for ev in bp.evaluations:
            for ch in ev.commitment.chunks:
                suffix_points.append(ch)
                suffix_scalars.append(rand_base_i_c_i * xi_i % f.p)
                xi_i = xi_i * bp.polyscale % f.p

        suffix_points.append(u_base)
        suffix_scalars.append(rand_base_i_c_i * bp.combined_inner_product % f.p)
        suffix_points.append(bp.opening.delta)
        suffix_scalars.append(rand_base_i)

        rand_base_i = rand_base_i * rand_base % f.p
        sg_rand_base_i = sg_rand_base_i * sg_rand_base % f.p

    dc = device_curve(curve)
    # the [h] ++ g prefix is fixed per SRS: pack it once per process and
    # pack only the ~60-per-proof suffix points each call (packing all
    # 2^k host points cost ~0.1 s per verification at k=15)
    base = getattr(srs, "_verify_base_dev", None)
    if base is None:
        base = srs._verify_base_dev = dc.pack_affine([srs.h] + list(srs.g))
    suffix = dc.pack_affine(suffix_points)
    allpts = APoint(
        jnp.concatenate([base.x, suffix.x], axis=-1),
        jnp.concatenate([base.y, suffix.y], axis=-1),
        jnp.concatenate([base.inf, suffix.inf], axis=-1),
    )
    g_scal = _from_mont_j(F, acc)  # (16, n) canonical standard form
    head = jnp.asarray(limb.ints_to_limbs([h_scalar], shape=(1,)))
    suf_s = jnp.asarray(
        limb.ints_to_limbs(suffix_scalars, shape=(len(suffix_scalars),))
    )
    all_scal = jnp.concatenate([head, g_scal, suf_s], axis=-1)[:, None, :]
    res = msm.msm(curve, all_scal, allpts)[0]
    return res is None


# ---------------------------------------------------------------------------
# Device-resident round loop: the ENTIRE log(n) folding phase (L/R MSMs,
# Fq-sponge absorbs, 128-bit endo-expanded challenges, folds) runs inside
# one jitted lax.fori_loop — one dispatch + one transfer for the whole
# IPA instead of ~3 dispatches + 1 fetch per round (the dominant flat
# cost of small proofs through the axon tunnel).
#
# Fixed shapes across rounds: a/b/mask stay length n; the active prefix
# m = n >> (k+1) is addressed with dynamic index arithmetic
# (i & (m-1) | m), which XLA lowers to gathers. The sponge runs in
# Montgomery form over the BASE field; its state machine is uniform per
# round (entry mode is always "squeezed": absorb x_l,y_l / permute /
# absorb x_r,y_r / permute / read 128 bits).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _ipa_fold_step(
    F, Fq, curve, c, endo_r, sponge_rounds,
    a, b, gx, gy, ginf, hu_x, hu_y, hu_inf, state, rand_pair,
    rc_flat, mds_flat, endo_q_m,
):
    """ONE explicit basis-folding IPA round at full size m (ipa.rs:845):

        L = <a_hi, g_lo> + rand_l·H + <a_hi, b_lo>·U
        R = <a_lo, g_hi> + rand_r·H + <a_lo, b_hi>·U
        u = endo(challenge);  a' = a_lo + u⁻¹ a_hi;  b' = b_lo + u b_hi
        g' = g_lo + [u] g_hi

    Folding pays one [u]-scalar-multiplication pass over m/2 points but
    HALVES every subsequent round's MSM/sort/gather size — at k>=13 the
    geometric shrink beats the masked fixed-shape design (measured ~47
    ms/compact-round at k=15 that folding reduces to a ~2x total).

    [u]·P runs as the 64-iteration ENDO LADDER on the 128-bit challenge
    bits (acc = 2·acc + s·(bit ? φP : P), φ = x·endo_q — exactly
    ScalarChallenge.to_field's (a, b) recurrence lifted to points), i.e.
    ~2x cheaper than a 255-bit double-and-add.

    Returns (a', b', g'x, g'y, g'inf, state', lr_pack (33, 2))."""
    from ..ops import pallas_field

    Fb = curve.F  # base field (coordinates)
    m = a.shape[-1]
    half = m // 2
    a_lo, a_hi = a[:, :half], a[:, half:]
    b_lo, b_hi = b[:, :half], b[:, half:]
    ip_l = ntt.dot_mod(F, a_hi, b_lo)
    ip_r = ntt.dot_mod(F, a_lo, b_hi)

    body_s = limb.from_mont(F, jnp.stack([a_hi, a_lo], axis=1))  # (16,2,half)
    ips = limb.from_mont(F, jnp.stack([ip_l, ip_r], axis=1))  # (16,2,1)
    scal = jnp.concatenate([body_s, rand_pair, ips], axis=-1)  # (16,2,half+2)

    pts = APoint(
        jnp.stack(
            [
                jnp.concatenate([gx[:, :half], hu_x], axis=-1),
                jnp.concatenate([gx[:, half:], hu_x], axis=-1),
            ],
            axis=1,
        ),
        jnp.stack(
            [
                jnp.concatenate([gy[:, :half], hu_y], axis=-1),
                jnp.concatenate([gy[:, half:], hu_y], axis=-1),
            ],
            axis=1,
        ),
        jnp.stack(
            [
                jnp.concatenate([ginf[:half], hu_inf], axis=-1),
                jnp.concatenate([ginf[half:], hu_inf], axis=-1),
            ],
            axis=0,
        ),
    )
    wins = msm._window_sums_body(curve, scal, pts, c)
    total = msm._combine_windows_body(curve, c, wins)  # (16, 2)
    aff = curve.to_affine(total)
    xs = limb.select(aff.inf, Fb.zeros((2,)), aff.x)
    ys = limb.select(aff.inf, Fb.zeros((2,)), aff.y)
    lr_pack = jnp.concatenate([xs, ys, aff.inf.astype(jnp.uint32)[None]], axis=0)

    st, chal_limbs = pallas_field.sponge_squeeze2_fused(
        Fq, sponge_rounds, state, xs, ys, rc_flat, mds_flat
    )
    bits = pallas_field.bits128(chal_limbs)
    u_arr, u_inv_arr = pallas_field.endo_inv_fused(F, endo_r, bits)

    a2 = limb.add(F, a_lo, limb.mont_mul(F, a_hi, u_inv_arr))
    b2 = limb.add(F, b_lo, limb.mont_mul(F, b_hi, u_arr))

    # g' = g_lo + [u] g_hi via the endo ladder over the challenge bits
    g_hi_x, g_hi_y, g_hi_inf = gx[:, half:], gy[:, half:], ginf[half:]
    phix = limb.mont_mul(Fb, g_hi_x, endo_q_m)
    zhi = limb.select(g_hi_inf, Fb.zeros((half,)), Fb.one_mont((half,)))
    negy = limb.neg(Fb, g_hi_y)
    acc = curve.double(
        curve.add(JPoint(g_hi_x, g_hi_y, zhi), JPoint(phix, g_hi_y, zhi))
    )

    def ladder(i, acc):
        j = jnp.int32(63) - i
        blo = jax.lax.dynamic_index_in_dim(bits, 2 * j, keepdims=False)
        bhi = jax.lax.dynamic_index_in_dim(bits, 2 * j + 1, keepdims=False)
        qx = limb.select(bhi == 1, phix, g_hi_x)
        qy = limb.select(blo == 1, g_hi_y, negy)
        return curve.add(curve.double(acc), JPoint(qx, qy, zhi))

    uhi = jax.lax.fori_loop(0, 64, ladder, acc)
    zlo = limb.select(ginf[:half], Fb.zeros((half,)), Fb.one_mont((half,)))
    g2 = curve.to_affine(
        curve.add(uhi, JPoint(gx[:, :half], gy[:, :half], zlo))
    )
    return a2, b2, g2.x, g2.y, g2.inf, st, lr_pack


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _ipa_tail_rounds(
    F, Fq, curve, rounds, c, endo_r, sponge_rounds,
    a, b, gx, gy, ginf, hu_x, hu_y, hu_inf, rand_lr_all, state0,
    rc_flat, mds_flat,
):
    """Masked-basis fixed-shape rounds over an (unscaled) basis of size
    M — the tail of the hybrid fold design, and the WHOLE round loop
    when n <= tail_target (k=11 runs all 11 rounds here). The basis is
    a single unscaled copy (folded bases change per proof, so
    per-window pre-scaling would cost more than it saves); window
    recombination is the fused Horner kernel. Round k's L/R only touch
    the basis half with bit_k = 0/1, so each round's MSM gathers a
    compact half via composed int32 row indices.

    Returns (lr_packed (rounds, 33, 2), g0_packed (33, 2... col 0),
    a0 (16,1), b0 (16,1))."""
    from ..ops import pallas_field

    n = a.shape[-1]
    half = n // 2
    W = -(-255 // c)
    i_arr = jnp.arange(n, dtype=jnp.uint32)
    j_arr = jnp.arange(half, dtype=jnp.uint32)
    one_u = jnp.uint32(1)
    zeros_n = F.zeros((n,))
    mask0 = F.one_mont((n,))
    lr0 = jnp.zeros((rounds, 33, 2), dtype=jnp.uint32)

    # packed element-major row table of [g ++ h ++ u] (n+2 rows)
    infbit = jnp.concatenate([ginf, hu_inf], axis=-1).astype(gx.dtype)
    table = jnp.transpose(
        jnp.concatenate(
            [
                msm.pack16(jnp.concatenate([gx, hu_x], axis=-1)),
                msm.pack16(jnp.concatenate([gy, hu_y], axis=-1)),
                infbit[None],
            ],
            axis=0,
        ),
        (1, 0),
    )  # (n+2, L+1)
    hu_tail = jnp.asarray([n, n + 1], dtype=jnp.uint32)

    def round_body(k, carry):
        a, b, mask, state, lr_acc = carry
        ku = jnp.uint32(k)
        shift = jnp.uint32(rounds - 1) - ku
        bit_k = ((i_arr >> shift) & 1).astype(jnp.bool_)
        m = jnp.uint32(n) >> (ku + 1)
        idx_lo = i_arr & (m - 1)
        idx_hi = idx_lo | m
        prefmask = i_arr < m

        a_hi_t = jnp.take(a, idx_hi, axis=-1)
        a_lo_t = jnp.take(a, idx_lo, axis=-1)
        b_hi_t = jnp.take(b, idx_hi, axis=-1)

        prod_l = limb.select(prefmask, limb.mont_mul(F, a_hi_t, b), zeros_n)
        prod_r = limb.select(prefmask, limb.mont_mul(F, a, b_hi_t), zeros_n)
        ip_l = ntt.sum_mod(F, prod_l)
        ip_r = ntt.sum_mod(F, prod_r)

        lowbits = j_arr & ((one_u << shift) - one_u)
        idx_L = ((j_arr >> shift) << (shift + one_u)) | lowbits
        idx_R = idx_L | (one_u << shift)

        w_l = jnp.take(limb.mont_mul(F, mask, a_hi_t), idx_L, axis=-1)
        w_r = jnp.take(limb.mont_mul(F, mask, a_lo_t), idx_R, axis=-1)
        body_s = limb.from_mont(F, jnp.stack([w_l, w_r], axis=1))
        ips = limb.from_mont(F, jnp.stack([ip_l, ip_r], axis=1))
        rand_k = jax.lax.dynamic_index_in_dim(
            rand_lr_all, k, axis=1, keepdims=False
        )
        scal = jnp.concatenate([body_s, rand_k, ips], axis=-1)

        ridx_L = jnp.concatenate([idx_L, hu_tail]).astype(jnp.int32)
        ridx_R = jnp.concatenate([idx_R, hu_tail]).astype(jnp.int32)
        ridx = jnp.broadcast_to(
            jnp.stack([ridx_L, ridx_R], axis=0)[None], (W, 2, half + 2)
        )
        wins = msm._window_sums_body(curve, scal, (table, ridx), c)
        comb = msm._combine_windows_body(curve, c, wins)
        aff = curve.to_affine(comb)
        xs = limb.select(aff.inf, F.zeros((2,)), aff.x)
        ys = limb.select(aff.inf, F.zeros((2,)), aff.y)
        lr_acc = lr_acc.at[k].set(
            jnp.concatenate([xs, ys, aff.inf.astype(jnp.uint32)[None]], axis=0)
        )

        st, chal_limbs = pallas_field.sponge_squeeze2_fused(
            Fq, sponge_rounds, state, xs, ys, rc_flat, mds_flat
        )
        u_arr, u_inv_arr = pallas_field.endo_inv_fused(
            F, endo_r, pallas_field.bits128(chal_limbs)
        )

        a2 = limb.add(F, a, limb.mont_mul(F, jnp.take(a, idx_hi, axis=-1), u_inv_arr))
        b2 = limb.add(F, b, limb.mont_mul(F, jnp.take(b, idx_hi, axis=-1), u_arr))
        mask2 = limb.select(bit_k, limb.mont_mul(F, mask, u_arr), mask)
        return (a2, b2, mask2, st, lr_acc)

    a, b, mask, state, lr_acc = jax.lax.fori_loop(
        0, rounds, round_body, (a, b, mask0, state0, lr0)
    )

    # sg = <mask_final, g> over the folded basis; b padded to 2 (the
    # b=1 scaled-path miscompile workaround — see ops/msm.py msm())
    mask_s = jnp.stack(
        [limb.from_mont(F, mask), F.zeros((n,))], axis=1
    )  # (16, 2, n)
    ridx_g = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, None], (W, 2, n)
    )
    wins = msm._window_sums_body(curve, mask_s, (table, ridx_g), c)
    comb = msm._combine_windows_body(curve, c, wins)
    aff = curve.to_affine(comb)
    g0_packed = jnp.concatenate(
        [aff.x, aff.y, aff.inf.astype(jnp.uint32)[None]], axis=0
    )  # (33, 2): column 0 is sg
    return lr_acc, g0_packed, a[:, 0:1], b[:, 0:1]


def _open_rounds_device(srs, sponge, F, a, b_arr, u_base, rng, rounds, debug=None):
    """Run the fused round loop, then replay the transcript on the host
    (native poseidon) to recover the challenges. Returns the same
    (lr, blinders, chals, chal_invs, a0, b0, g0) as the host loop."""
    curve: CurveParams = srs.curve
    f = curve.scalar
    dc = device_curve(curve)
    params = sponge.sponge.params
    Fq = limb.device_field(params.field)
    n = len(srs.g)

    blinders = [(rng.field(f.p), rng.field(f.p)) for _ in range(rounds)]
    flat = [v for lrpair in blinders for v in lrpair]
    rand_all = F.pack(flat, shape=(rounds, 2))[..., None]  # (16, rounds, 2, 1)

    state0 = Fq.pack_mont(list(sponge.sponge.state), shape=(3,))
    nrc = params.rounds_full
    # flat Montgomery limb layouts for the fused sponge kernel's SMEM
    # operands: rc[r][j] limbs at ((r*3+j)*16), mds[i][j] at ((i*3+j)*16)
    mds_flat = jnp.asarray(
        np.transpose(
            np.asarray(
                Fq.pack_mont(
                    [v % params.field.p for row in params.mds for v in row],
                    shape=(3, 3),
                )
            ),
            (1, 2, 0),
        ).reshape(-1)
    )
    rc_flat = jnp.asarray(
        np.transpose(
            np.asarray(
                Fq.pack_mont(
                    [
                        v % params.field.p
                        for row in params.round_constants[:nrc]
                        for v in row
                    ],
                    shape=(nrc, 3),
                )
            ),
            (1, 2, 0),
        ).reshape(-1)
    )

    # Hybrid fold design: explicitly fold the basis (reference
    # ipa.rs:845-875) while it is large — each fold halves every
    # subsequent round's MSM/sort/gather — then run the fixed-shape
    # masked tail at M = PST_IPA_FOLD_TAIL points. Fold-step shapes are
    # shared across k (k=16 adds one step on top of k=15's), and the
    # tail instantiates once per (tail_rounds, M).
    tail_target = int(os.environ.get("PST_IPA_FOLD_TAIL", "2048"))
    f_rounds = max(0, rounds - (max(tail_target, 2).bit_length() - 1))
    Fb = dc.F
    endo_q_m = Fb.const_mont(curve.endos[0], (1,))
    hu = dc.pack_affine([srs.h, u_base])
    gx, gy, ginf = srs.g_dev.x, srs.g_dev.y, srs.g_dev.inf
    a_cur, b_cur, state = a, b_arr, state0
    lr_folds = []
    for k in range(f_rounds):
        m = n >> k
        c_k = msm.default_window_bits(m // 2 + 2)
        a_cur, b_cur, gx, gy, ginf, state, lrp = _ipa_fold_step(
            F, Fq, dc, c_k, curve.endos[1], nrc,
            a_cur, b_cur, gx, gy, ginf, hu.x, hu.y, hu.inf,
            state, rand_all[:, k], rc_flat, mds_flat, endo_q_m,
        )
        lr_folds.append(lrp)
    # The tail (rounds - f_rounds masked rounds at M points) is the SAME
    # jit entry for every k >= log2(tail_target): k=11 runs it directly
    # (f_rounds == 0, basis = srs.g_dev) with the exact static/dynamic
    # shapes k=15's post-fold tail uses — one IPA code path for all k,
    # and two fewer warmup MSM shapes than the retired pre-scaled
    # _ipa_all_rounds design. Measured per-round cost is IDENTICAL
    # (~38 ms/round at M=2048 either way): rounds are bound by the
    # sequential depth of sort + EC scan + to_affine/sponge/endo-inverse
    # chains, not by MSM width, so pre-scaling bought nothing.
    M = n >> f_rounds
    c_t = msm.default_window_bits(M // 2 + 2)
    lr_tail, g0_pair, a0_arr, b0_arr = _ipa_tail_rounds(
        F, Fq, dc, rounds - f_rounds, c_t, curve.endos[1], nrc,
        a_cur, b_cur, gx, gy, ginf, hu.x, hu.y, hu.inf,
        rand_all[:, f_rounds:], state, rc_flat, mds_flat,
    )
    host = jax.device_get((lr_folds, lr_tail, g0_pair, a0_arr, b0_arr))
    lr_folds_h, lr_tail_h, g0_pair_h, a0_arr, b0_arr = host
    if lr_folds_h:
        lr_packed = np.concatenate(
            [np.stack(lr_folds_h, axis=0), np.asarray(lr_tail_h)], axis=0
        )
    else:
        lr_packed = np.asarray(lr_tail_h)
    g0_packed = np.asarray(g0_pair_h)[:, 0:1]

    _, endo_r = curve.endos
    lr = []
    chals = []
    chal_invs = []
    for k in range(rounds):
        pts = msm._decode_packed_affine(dc, lr_packed[k])
        l_pt, r_pt = pts[0], pts[1]
        lr.append((l_pt, r_pt))
        sponge.absorb_g([l_pt])
        sponge.absorb_g([r_pt])
        u = sponge.challenge().to_field(endo_r, f)
        chals.append(u)
        chal_invs.append(pow(u, -1, f.p))
    g0 = msm._decode_packed_affine(dc, g0_packed)[0]
    a0 = limb.limbs_to_ints(jnp.asarray(a0_arr))[0] * F.r_inv % f.p
    b0 = limb.limbs_to_ints(jnp.asarray(b0_arr))[0] * F.r_inv % f.p
    return lr, blinders, chals, chal_invs, a0, b0, g0
