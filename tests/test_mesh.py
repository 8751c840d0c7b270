"""Multi-chip sharding parity on the virtual 8-device CPU mesh.

The reference's parallelism is rayon thread splitting inside MSM/FFT
(poly-commitment/src/ipa.rs:527-554, commitment.rs:367-378); the
TPU-native equivalents shard over a jax.sharding.Mesh. These tests
assert sharded results equal the single-device kernels (SURVEY.md §4:
"multi-chip tests asserting sharded kernels equal single-chip results").

conftest.py forces an 8-device CPU platform, so the 'data' mesh axis
here is a real multi-device axis with XLA collectives.
"""

import random

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from proof_systems_tpu.fields import Fp
from proof_systems_tpu.ops import limb, ntt
from proof_systems_tpu.parallel.mesh import sharded_msm_check, sharded_ntt_step
from proof_systems_tpu.parallel.ntt import DistNttPlan


def _mesh(n=8):
    devs = jax.devices()
    assert len(devs) >= n, "conftest must provide 8 CPU devices"
    return Mesh(devs[:n], ("data",))


def test_dist_ntt_forward_parity():
    """Four-step all_to_all NTT == single-device constant-geometry NTT."""
    mesh = _mesh()
    log_n = 7
    dp = DistNttPlan(Fp, log_n, mesh)
    F = limb.device_field(Fp)
    rng = random.Random(7)
    vals = [rng.randrange(Fp.p) for _ in range(dp.n)]
    x = F.pack_mont(vals, shape=(dp.n,))
    a = dp.shard_input(x.reshape(limb.NLIMBS, dp.n1, dp.n2))
    got = F.unpack_mont(dp.to_natural(dp.ntt(a)))
    want = F.unpack_mont(ntt.ntt_plan(Fp, log_n).ntt(x))
    assert got == want


def test_dist_ntt_inverse_roundtrip():
    mesh = _mesh()
    log_n = 7
    dp = DistNttPlan(Fp, log_n, mesh)
    F = limb.device_field(Fp)
    rng = random.Random(8)
    vals = [rng.randrange(Fp.p) for _ in range(dp.n)]
    x = F.pack_mont(vals, shape=(dp.n,))
    a = dp.shard_input(x.reshape(limb.NLIMBS, dp.n1, dp.n2))
    evals = F.unpack_mont(dp.to_natural(dp.ntt(a)))
    e = dp.shard_input(F.pack_mont(evals, shape=(dp.n,)).reshape(limb.NLIMBS, dp.n1, dp.n2))
    back = F.unpack_mont(dp.to_natural(dp.intt(e)))
    assert back == vals


def test_column_sharded_prover_step():
    """Column-parallel NTT->pointwise->iNTT step; self-asserts the
    cross-device modular combine against the gathered single-device
    result (parallel/mesh.sharded_ntt_step)."""
    mesh = _mesh()
    sharded_ntt_step(mesh, 8)


@pytest.mark.heavy
def test_sharded_msm_parity():
    """Point-sharded Pippenger over the mesh == host golden MSM.

    Heavy: compiles the full EC window-sum graph on CPU."""
    mesh = _mesh()
    sharded_msm_check(mesh, 8, n=32, b=2)


@pytest.mark.heavy
def test_batch_sharded_msm_parity():
    """Batch-sharded full MSM (the prover's commit path when >1 device,
    ops/msm._sharded_msm_fn) == host golden MSM.

    Heavy: compiles the full Pippenger+affine graph on CPU."""
    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.ops import msm as msm_mod
    from proof_systems_tpu.ops.curve_ops import device_curve

    mesh = _mesh()
    rng = random.Random(11)
    curve = device_curve(Vesta)
    n, b, c = 16, 8, 6
    pts = [
        Vesta.scalar_mul(rng.randrange(1, Vesta.scalar.p), Vesta.generator)
        for _ in range(n)
    ]
    pts[3] = None
    apts = curve.pack_affine(pts)
    scal_rows = [[rng.randrange(Vesta.scalar.p) for _ in range(n)] for _ in range(b)]
    scal = jnp.asarray(
        limb.ints_to_limbs([s for row in scal_rows for s in row], shape=(b, n))
    )
    fn = msm_mod._sharded_msm_fn(curve, c, False, mesh)
    got = msm_mod._decode_packed_affine(curve, fn(scal, apts))
    want = [Vesta.msm(row, pts) for row in scal_rows]
    assert got == want


def test_multidevice_create_proof_equals_single_device():
    """End-to-end kimchi proof on the 8-device mesh (GSPMD-sharded d8
    quotient columns) is byte-identical to the single-device proof
    under the same RNG (VERDICT round-3 item 3: the prover itself
    producing a proof on >1 device).

    jax.clear_caches() first: compiling the sharded prover graphs on
    top of a full suite's accumulated executables segfaults XLA:CPU
    (reproducible at this test in-suite, never in isolation)."""
    import os

    import jax

    jax.clear_caches()

    from proof_systems_tpu.circuits.builders import bench_circuit, bench_witness
    from proof_systems_tpu.circuits.constraints import ConstraintSystem
    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.fields import Fp as _Fp
    from proof_systems_tpu.parallel.auto import data_mesh, reset_mesh
    from proof_systems_tpu.poly_commitment import srs as srs_mod
    from proof_systems_tpu.prover import create_proof
    from proof_systems_tpu.prover_index import ProverIndex
    from proof_systems_tpu.serialization import serialize_proof
    from proof_systems_tpu.utils import TestRng
    from proof_systems_tpu.verifier import verify

    n = 64
    srs = srs_mod.SRS(
        Vesta, [srs_mod.derive_g(Vesta, i) for i in range(n)],
        srs_mod.derive_h(Vesta),
    )
    cs = ConstraintSystem.create(_Fp, bench_circuit(_Fp, n - 10), public=0,
                                 max_poly_size=n)
    witness = bench_witness(n - 10)

    reset_mesh()
    os.environ.pop("PST_MESH", None)
    assert data_mesh() is not None, "8-device mesh expected under conftest"
    index_mesh = ProverIndex(cs, Vesta, srs)
    proof_mesh = create_proof(index_mesh, [list(c) for c in witness], TestRng(55))
    assert verify(index_mesh.verifier_index(), proof_mesh, [], TestRng(56))

    os.environ["PST_MESH"] = "0"
    reset_mesh()
    try:
        assert data_mesh() is None
        index_one = ProverIndex(cs, Vesta, srs)
        proof_one = create_proof(index_one, [list(c) for c in witness], TestRng(55))
    finally:
        os.environ.pop("PST_MESH", None)
        reset_mesh()
    assert serialize_proof(Vesta, proof_mesh) == serialize_proof(Vesta, proof_one)


@pytest.mark.heavy
def test_point_sharded_msm_parity():
    """Point-axis-sharded MSM for small batches (ops/msm._point_sharded_msm_fn):
    n splits across the 8-CPU mesh, per-device window partials all_gather
    + fold. Covers the scaled (z-commit/sg) and unscaled (verifier)
    paths, including point-count padding (n not divisible by ndev).

    Heavy: compiles the full Pippenger graph under shard_map on CPU."""
    import random

    from test_msm_graph import _host_scaled

    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.ops import msm as msm_mod
    from proof_systems_tpu.ops.curve_ops import device_curve

    mesh = _mesh()
    rng = random.Random(31)
    curve = device_curve(Vesta)
    c = 6
    W = -(-255 // c)
    for n, use_scaled in ((64, True), (67, False)):
        pts = [
            Vesta.scalar_mul(rng.randrange(1, Vesta.scalar.p), Vesta.generator)
            for _ in range(n)
        ]
        pts[3] = None
        scal_rows = [
            [rng.randrange(Vesta.scalar.p) for _ in range(n)] for _ in range(2)
        ]
        scal = jnp.asarray(
            limb.ints_to_limbs(
                [s for row in scal_rows for s in row], shape=(2, n)
            )
        )
        ndev = mesh.devices.size
        npad = -(-n // ndev) * ndev
        if use_scaled:
            scaled = _host_scaled(pts, c, W)
            part, _, scaled_p = msm_mod._pad_points_for_shard(
                curve, scal, None, scaled, npad
            ) if npad != n else (scal, None, scaled)
            fn = msm_mod._point_sharded_msm_fn(curve, c, True, mesh)
            packed = fn(part, scaled_p)
        else:
            apts = curve.pack_affine(pts)
            part, pts_p, _ = msm_mod._pad_points_for_shard(
                curve, scal, apts, None, npad
            ) if npad != n else (scal, apts, None)
            fn = msm_mod._point_sharded_msm_fn(curve, c, False, mesh)
            packed = fn(part, pts_p)
        got = msm_mod._decode_packed_affine(curve, packed)
        want = [Vesta.msm(row, pts) for row in scal_rows]
        assert got == want, (n, use_scaled)
