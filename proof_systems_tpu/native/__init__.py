"""Native (C++) host runtime, loaded via ctypes.

The reference's host-side hot paths (transcript Poseidon permutations,
field scalar work) are native Rust; this package is the C++ equivalent
for the TPU framework. Compiled lazily with g++ into a cached shared
object; every user transparently falls back to the exact pure-Python
golden model if no toolchain is available (tests cover byte parity).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

_SRC = Path(__file__).with_name("pasta.cpp")
_LIB = None
_LIB_FAILED = False


def _build() -> ctypes.CDLL | None:
    global _LIB_FAILED
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("PST_NATIVE_CACHE", os.path.expanduser("~/.cache/pst_native"))
    )
    so = cache_dir / f"pasta_{tag}.so"
    if not so.exists():
        try:
            cache_dir.mkdir(parents=True, exist_ok=True)
            tmp = so.with_suffix(f".{os.getpid()}.tmp.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(tmp), str(_SRC)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so)
        except Exception:
            _LIB_FAILED = True
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        _LIB_FAILED = True
        return None
    lib.ps_new.restype = ctypes.c_void_p
    lib.ps_new.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.ps_permute.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ps_free.argtypes = [ctypes.c_void_p]
    lib.pc_new.restype = ctypes.c_void_p
    lib.pc_new.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64]
    lib.pc_free.argtypes = [ctypes.c_void_p]
    lib.pc_msm.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
    ]
    return lib


def _lib() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is None and not _LIB_FAILED and os.environ.get("PST_NO_NATIVE") != "1":
        _LIB = _build()
    return _LIB


def _le32(x: int) -> bytes:
    return x.to_bytes(32, "little")


class NativePoseidon:
    """ctypes handle for one Poseidon parameter set."""

    def __init__(self, params) -> None:
        lib = _lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        p = params.field.p
        pinv = (-pow(p, -1, 1 << 64)) % (1 << 64)
        r2 = pow(2, 512, p)
        mds = b"".join(_le32(v % p) for row in params.mds for v in row)
        if params.initial_ark:
            rcs = params.round_constants[: params.rounds_full + 1]
        else:
            rcs = params.round_constants[: params.rounds_full]
        rc = b"".join(_le32(v % p) for row in rcs for v in row)
        self._lib = lib
        self._ctx = lib.ps_new(
            _le32(p), _le32(r2), pinv,
            params.rounds_full, params.sbox, 1 if params.initial_ark else 0,
            mds, rc,
        )
        self.p = p

    def permute(self, state: list[int]) -> list[int]:
        buf = ctypes.create_string_buffer(
            b"".join(_le32(x % self.p) for x in state), 96
        )
        self._lib.ps_permute(self._ctx, buf)
        raw = buf.raw
        return [int.from_bytes(raw[32 * i : 32 * i + 32], "little") for i in range(3)]

    def __del__(self):
        try:
            if getattr(self, "_ctx", None):
                self._lib.ps_free(self._ctx)
        except Exception:
            pass


class NativeCurve:
    """ctypes handle for one Pasta curve: Pippenger MSM over the host
    (arkworks `msm_bigint` equivalent; serves the CPU MSM fallback and
    the folding/IVC Pedersen commitments)."""

    def __init__(self, curve) -> None:
        lib = _lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        p = curve.base.p
        pinv = (-pow(p, -1, 1 << 64)) % (1 << 64)
        r2 = pow(2, 512, p)
        self._lib = lib
        self._ctx = lib.pc_new(_le32(p), _le32(r2), pinv)
        self.p = p

    def msm(self, scalars: list[int], points) -> tuple[int, int] | None:
        """points: list of affine (x, y) tuples or None (infinity)."""
        n = len(scalars)
        assert n == len(points)
        if n == 0:
            return None
        sbuf = b"".join(_le32(s) for s in scalars)  # canonical, < 2^255
        pbuf = bytearray(64 * n)
        inf = bytearray(n)
        for i, pt in enumerate(points):
            if pt is None:
                inf[i] = 1
            else:
                pbuf[64 * i : 64 * i + 32] = _le32(pt[0])
                pbuf[64 * i + 32 : 64 * i + 64] = _le32(pt[1])
        out = ctypes.create_string_buffer(65)
        self._lib.pc_msm(self._ctx, n, sbuf, bytes(pbuf), bytes(inf), out)
        raw = out.raw
        if raw[64]:
            return None
        return (
            int.from_bytes(raw[0:32], "little"),
            int.from_bytes(raw[32:64], "little"),
        )

    def __del__(self):
        try:
            if getattr(self, "_ctx", None):
                self._lib.pc_free(self._ctx)
        except Exception:
            pass


_CURVES: dict[str, NativeCurve] = {}


def native_curve(curve) -> NativeCurve | None:
    """Cached per-curve native MSM, or None when unavailable."""
    if _lib() is None:
        return None
    c = _CURVES.get(curve.name)
    if c is None:
        try:
            c = NativeCurve(curve)
        except Exception:
            return None
        _CURVES[curve.name] = c
    return c


_SPONGES: dict[str, NativePoseidon] = {}


def native_poseidon(params) -> NativePoseidon | None:
    """Cached per-parameter-set native permutation, or None."""
    if _lib() is None:
        return None
    s = _SPONGES.get(params.name)
    if s is None:
        try:
            s = NativePoseidon(params)
        except Exception:
            return None
        _SPONGES[params.name] = s
    return s
