"""SRS: deterministic generator derivation, commitments, disk caches.

Reference semantics:
  - point derivation g[i] = to_group(bits(blake2b512(be32(i)))) and the
    blinder h from b"srs_misc" || be32(0)
    (poly-commitment/src/ipa.rs:129-160, 441-470; exactness notes in
    SURVEY.md Appendix A.1),
  - commit = chunked MSM over g (ipa.rs:516-560); hiding commitments add
    w·H per chunk (mask, ipa.rs:488-514),
  - Lagrange-basis commitments = group iFFT of g (ipa.rs:929-1040),
    cached like the reference's LAGRANGE_CACHE_DIR file cache.

TPU design: points are derived once on the host (exact ints, disk
cached), then live on device as limb-vectorized APoint batches; all
prover/verifier MSMs run through ops/msm.
"""

from __future__ import annotations

import hashlib
import os
import pathlib

import jax.numpy as jnp
import numpy as np

from ..curves import AffinePoint, CurveParams
from ..fields import FieldParams
from ..ops import limb, msm, ntt
from ..ops.curve_ops import APoint, device_curve
from .commitment import PolyComm

CACHE_DIR = pathlib.Path(os.environ.get("PST_CACHE_DIR", "/root/repo/.cache"))


def _random_point(curve: CurveParams, digest: bytes) -> tuple[int, int]:
    """point_of_random_bytes (ipa.rs:129-160): 31 bytes -> 248 bits
    (LSB-first per byte) -> big-endian integer -> SvdW to_group."""
    bits = []
    for k in range(31):
        for j in range(8):
            bits.append((digest[k] >> j) & 1)
    val = 0
    for b in bits:
        val = (val << 1) | b
    return curve.to_group(val)


def derive_g(curve: CurveParams, i: int) -> tuple[int, int]:
    h = hashlib.blake2b(digest_size=64)
    h.update(i.to_bytes(4, "big"))
    return _random_point(curve, h.digest())


def derive_h(curve: CurveParams) -> tuple[int, int]:
    h = hashlib.blake2b(digest_size=64)
    h.update(b"srs_misc")
    h.update((0).to_bytes(4, "big"))
    return _random_point(curve, h.digest())


def _srs_cache_path(curve: CurveParams, depth: int) -> pathlib.Path:
    return CACHE_DIR / f"srs_{curve.name.lower()}_{depth}.npy"


class SRS:
    """The universal IPA structured reference string for one curve."""

    def __init__(self, curve: CurveParams, g: list[tuple[int, int]], h: tuple[int, int]):
        self.curve = curve
        self.g = g
        self.h = h
        self._g_dev: APoint | None = None
        # (domain n) -> list of affine commit(L_i) for the first m rows
        self._lagrange: dict[int, list] = {}

    @classmethod
    def create(cls, curve: CurveParams, depth: int) -> "SRS":
        """Deterministic SRS, byte-identical to ipa.rs create_parallel."""
        path = _srs_cache_path(curve, depth)
        if path.exists():
            arr = np.load(path, allow_pickle=True)
            g = [(int(x), int(y)) for x, y in arr]
        else:
            g = [derive_g(curve, i) for i in range(depth)]
            path.parent.mkdir(parents=True, exist_ok=True)
            np.save(path, np.array(g, dtype=object), allow_pickle=True)
        return cls(curve, g, derive_h(curve))

    def __len__(self) -> int:
        return len(self.g)

    @property
    def g_dev(self) -> APoint:
        if self._g_dev is None:
            self._g_dev = device_curve(self.curve).pack_affine(self.g)
        return self._g_dev

    @property
    def gh_dev(self) -> APoint:
        """g ++ [h]: the basis for commitments with fused hiding."""
        if getattr(self, "_gh_dev", None) is None:
            self._gh_dev = device_curve(self.curve).pack_affine(self.g + [self.h])
        return self._gh_dev

    def scaled_basis(self, c: int):
        """Pre-scaled per-window Jacobian bases 2^{cw}·(g ++ [h]), cached
        per window size (ops/msm.scale_basis; fixed per SRS, so the
        Horner recombination disappears from every commit MSM)."""
        cache = getattr(self, "_scaled", None)
        if cache is None:
            cache = self._scaled = {}
        if c not in cache:
            import jax

            dc = device_curve(self.curve)
            windows = -(-255 // c)
            fn = jax.jit(msm.scale_basis, static_argnums=(0, 2, 3))
            cache[c] = jax.block_until_ready(fn(dc, self.gh_dev, c, windows))
        return cache[c]

    # -- committing --------------------------------------------------------

    def commit_coeffs_host(self, polys: list[list[int]], num_chunks: int = 1) -> list[PolyComm]:
        """Commit host coefficient vectors (non-hiding). Test/setup path."""
        n = len(self.g)
        rows = []
        layout = []  # (poly index, chunk index)
        for pi, coeffs in enumerate(polys):
            chunks = max(-(-len(coeffs) // n), 1)
            chunks = max(chunks, num_chunks)
            for ci in range(chunks):
                seg = coeffs[ci * n : (ci + 1) * n]
                rows.append(seg + [0] * (n - len(seg)))
                layout.append((pi, ci))
        results = msm.msm_host_scalars(self.curve, rows, self.g_dev)
        out = [PolyComm([]) for _ in polys]
        for (pi, _ci), pt in zip(layout, results):
            out[pi].chunks.append(pt)
        return out

    def commit_coeffs_dev(
        self, coeffs_mont: jnp.ndarray, num_chunks: int = 1, blinders=None
    ) -> list[PolyComm]:
        """Commit device coefficient arrays (16, b, L) in Montgomery form.

        Each row b is one polynomial of L coefficients; L may exceed the
        SRS size, yielding ceil(L/n) chunks (at least num_chunks).

        blinders: optional list (len b) of per-chunk int lists — hiding
        w·H is FUSED into the MSM as an extra (h, w) term per chunk row
        (ipa.rs mask_custom semantics without the per-chunk host
        scalar-muls of srs.mask, which dominated small-proof commits).
        """
        n = len(self.g)
        b, L = coeffs_mont.shape[1], coeffs_mont.shape[2]
        nchunks = max(-(-L // n), num_chunks)
        pad = nchunks * n - L
        std = limb.from_mont(limb.device_field(self.curve.scalar), coeffs_mont)
        if pad:
            std = jnp.concatenate(
                [std, jnp.zeros((limb.NLIMBS, b, pad), dtype=std.dtype)], axis=-1
            )
        rows = std.reshape(limb.NLIMBS, b * nchunks, n)
        # blinders always ride as an (h, w) term — w = 0 for non-hiding —
        # so every commit shares ONE basis/shape and, on device, the
        # cached pre-scaled windows of g ++ [h].
        if blinders is None:
            flat = [0] * (b * nchunks)
        else:
            flat = [int(w) % self.curve.scalar.p for row in blinders for w in row]
            assert len(flat) == b * nchunks
        wb = jnp.asarray(limb.ints_to_limbs(flat, shape=(b * nchunks, 1)))
        rows = jnp.concatenate([rows, wb], axis=-1)
        import jax

        scaled = None
        c = None
        if jax.default_backend() in ("tpu", "axon"):
            c = msm.default_window_bits(n + 1)
            scaled = self.scaled_basis(c)
        results = msm.msm(self.curve, rows, self.gh_dev, c=c, scaled=scaled)
        return [PolyComm(results[i * nchunks : (i + 1) * nchunks]) for i in range(b)]

    def lagrange_commitments(self, domain, m: int) -> list:
        """Commitments to the first m Lagrange basis polynomials of
        `domain` (ipa.rs:648-660 get_lagrange_basis; here restricted to
        the public rows, which is all the verifier consumes). Cached in
        memory per domain size and on disk like the SRS points — the
        verifier's public-input commitment becomes m host scalar-muls
        instead of an n-point MSM (verifier.rs:833)."""
        n = domain.n
        have = self._lagrange.get(n)
        if have is not None and len(have) >= m:
            return have[:m]
        path = CACHE_DIR / f"lagrange_{self.curve.name.lower()}_{n}_{m}.npy"
        if path.exists():
            arr = np.load(path, allow_pickle=True)
            pts = [None if x is None else (int(x), int(y)) for x, y in arr]
        else:
            f = self.curve.scalar
            inv_n = f.inv(n)
            w_inv = f.inv(domain.group_gen)
            rows = []
            for i in range(m):
                wi = pow(w_inv, i, f.p)
                c = inv_n
                row = []
                for _ in range(n):
                    row.append(c)
                    c = c * wi % f.p
                rows.append(row)
            pts = msm.msm_host_scalars(self.curve, rows, self.g_dev)
            path.parent.mkdir(parents=True, exist_ok=True)
            np.save(
                path,
                np.array([(None, None) if p is None else p for p in pts], dtype=object),
                allow_pickle=True,
            )
        self._lagrange[n] = pts
        return pts[:m]

    def mask(self, comm: PolyComm, blinders: list[int]) -> PolyComm:
        """Hiding: chunk_i + blinders_i * H (ipa.rs mask_custom)."""
        c = self.curve
        return PolyComm(
            [c.add(ch, c.scalar_mul(w, self.h)) for ch, w in zip(comm.chunks, blinders)]
        )


def load_reference_srs(path: str, curve: CurveParams, limit: int | None = None):
    """Parse a reference `srs/*.srs` file (rmp-serde of [Vec<G>, G] with
    33-byte arkworks compressed points) into host affine points.

    Flag byte (arkworks SWFlags): 0x40 = infinity, 0x80 = y is the
    lexicographically larger root, 0x00 = smaller root.
    """
    data = open(path, "rb").read()
    assert data[0] == 0x92 and data[1] == 0xDD
    n = int.from_bytes(data[2:6], "big")
    off = 6
    f = curve.base

    def read_point(off):
        assert data[off] == 0xC4 and data[off + 1] == 0x21
        raw = data[off + 2 : off + 35]
        off += 35
        flag = raw[32]
        if flag & 0x40:
            return None, off
        x = int.from_bytes(raw[:32], "little")
        y = f.sqrt(curve.curve_eqn(x))
        assert y is not None
        y_neg = f.p - y
        big, small = (y, y_neg) if y > y_neg else (y_neg, y)
        return ((x, big) if flag & 0x80 else (x, small)), off

    count = n if limit is None else min(limit, n)
    g = []
    for _ in range(count):
        pt, off = read_point(off)
        g.append(pt)
    h, _ = read_point(6 + 35 * n)  # fixed 35-byte stride per point
    return g, h
