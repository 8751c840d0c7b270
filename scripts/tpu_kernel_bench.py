#!/usr/bin/env python
"""Kernel micro-benchmarks on real TPU.

Usage:
    python scripts/tpu_kernel_bench.py            # one config
    python scripts/tpu_kernel_bench.py sweep      # BLOCK_ROWS sweep via
                                                  # subprocesses

Measures steady-state throughput of the hot pallas kernels at bench
shapes (k=11 class): mont_mul, the mixed-add EC parts scan, a full MSM
window-sum graph, and the fused prefix-product scan.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sweep():
    for br in (8, 16, 32, 64):
        env = dict(os.environ, PST_BLOCK_ROWS=str(br))
        print(f"===== BLOCK_ROWS={br}", flush=True)
        subprocess.run([sys.executable, __file__], env=env, timeout=1200)


def sweep_scan():
    """Sweep the streamed EC-scan block knobs (batch-group rows x chunk
    block) on the witness-commit shape; prints ms per config."""
    for bg, cb in ((8, 16), (16, 16), (32, 16), (8, 8), (8, 32), (16, 8)):
        env = dict(os.environ, PST_SCAN_BG=str(bg), PST_SCAN_CB=str(cb), PST_ONLY="scan")
        print(f"===== SCAN_BG={bg} SCAN_CB={cb}", flush=True)
        subprocess.run([sys.executable, __file__], env=env, timeout=2400)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache_tpu")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import random

    from proof_systems_tpu.curves import Vesta
    from proof_systems_tpu.ops import limb, msm
    from proof_systems_tpu.ops import pallas_field as pf
    from proof_systems_tpu.ops.curve_ops import device_curve

    assert jax.default_backend() in ("tpu", "axon"), "needs real TPU"
    print("BLOCK_ROWS =", pf.BLOCK_ROWS, flush=True)
    dc = device_curve(Vesta)
    F = dc.F
    rng = random.Random(7)

    def timeit(name, fn, reps=20):
        # axon's block_until_ready does NOT reliably wait (CLAUDE.md);
        # only a device_get round trip is trustworthy. Subtract the
        # per-fetch floor measured on a no-op fetch.
        def sync(res):
            # fetch ONE element (a device-side slice): forces the
            # computation without pulling the whole buffer through the
            # tunnel (64 MB at the mont shape = ~70 ms of pure fetch).
            # Host results (e.g. msm.msm already fetched) need no sync.
            x = jax.tree_util.tree_leaves(res)[0]
            if hasattr(x, "shape"):
                jax.device_get(x[tuple(0 for _ in x.shape)])

        sync(fn())  # compile + 1st
        for _ in range(3):  # warm steady state
            sync(fn())
        t0 = time.time()
        for _ in range(reps):
            r = fn()
        sync(r)
        dt = (time.time() - t0) / reps
        print(f"{name:42s} {dt*1e3:9.3f} ms (queued x{reps} + sync)", flush=True)
        return dt

    only = os.environ.get("PST_ONLY")

    # mont_mul at 2^20
    n = 1 << 20
    a = F.pack_mont([rng.randrange(F.p) for _ in range(256)] * (n // 256), shape=(n,))
    if only in (None, "mont"):
        dt = timeit("mont_mul 2^20", lambda: pf.mont_mul(F, a, a))
        print(f"    -> {n/dt/1e6:.0f} M muls/s", flush=True)

    # EC parts scan at the witness-commit shape (W=32, b=16, n=2049)
    W, b, nn = 32, 16, 2049
    pts = dc.pack_affine(
        [Vesta.scalar_mul(i + 1, Vesta.generator) for i in range(64)] * ((W * b * nn) // 64 + 1)
    )
    xs = pts.x[:, : W * b * nn].reshape(limb.NLIMBS, W, b, nn)
    ys = pts.y[:, : W * b * nn].reshape(limb.NLIMBS, W, b, nn)
    one = F.one_mont((W, b, nn))

    def scan_fn():
        (qx, qy, qz), (ex, ey, ez), C = pf.ec_prefix_scan_parts(F, xs, ys, one, mixed=True)
        return qz

    if only in (None, "scan"):
        dt = timeit(f"ec parts scan mixed (W={W},b={b},n={nn})", scan_fn, reps=5)
        print(f"    -> {W*b*nn/dt/1e6:.1f} M EC madds/s", flush=True)
    if only is not None and only != "full":
        return

    # full commit MSM (scaled bases) at k=11 witness shape
    from proof_systems_tpu.poly_commitment.srs import SRS

    srs = SRS.create(Vesta, 2048)
    coeffs = F.pack_mont(
        [rng.randrange(F.p) for _ in range(16 * 2048)], shape=(16, 2048)
    )
    blinders = [[rng.randrange(F.p)] for _ in range(16)]
    timeit("commit_coeffs_dev b=16 n=2048", lambda: srs.commit_coeffs_dev(coeffs, 1, blinders)[0].chunks[0], reps=5)

    # fused prefix product at z-perm shape
    zp = F.pack_mont([rng.randrange(1, F.p) for _ in range(2048)], shape=(1, 2048))
    timeit("mont_prefix_scan 2048", lambda: pf.mont_prefix_scan_fused(F, zp))

    # fused pow (Fermat inverse)
    timeit("mont_pow_fused p-2 (1 elem)", lambda: pf.mont_pow_fused(F, zp[:, :, :1], F.p - 2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep()
    elif len(sys.argv) > 1 and sys.argv[1] == "sweep_scan":
        sweep_scan()
    else:
        main()
