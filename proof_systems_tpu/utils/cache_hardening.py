"""Self-healing persistent-compile-cache IO.

jax's file cache writes entries non-atomically (``LRUCache.put`` is a
plain ``Path.write_bytes``) and never overwrites an existing key. A
process killed mid-write therefore leaves a *permanently* torn entry:
every later reader either SIGSEGVs in zstandard, raises, or — worst —
decompresses garbage into tens of GB at 100% CPU (all three observed
on this box; VERDICT round 1 weak #3). Locking readers against writers
made it worse: a wedged reader holding the lock stalls every process.

The durable fix needs no locks at all:

1. **Atomic writes** — ``put`` writes to a same-directory temp file and
   ``os.replace``s it into place, so a concurrent or killed writer can
   never expose a partial entry.
2. **Evict-on-error reads** — a read that raises (legacy torn entry,
   bad pickle, zstd error) deletes the entry and reports a cache miss
   so the executable is recompiled and re-written atomically.

Call :func:`harden` once per process before the first jit compilation.
It is idempotent and a no-op if jax internals have moved.
"""

from __future__ import annotations

import functools
import os
import tempfile

_done = False


def harden() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        from jax._src import compilation_cache as _cc
        from jax._src import lru_cache as _lc
    except Exception:  # pragma: no cover - jax internals moved
        return

    suffix = getattr(_lc, "_CACHE_SUFFIX", "-cache")

    def atomic_put(self, key: str, val: bytes) -> None:
        if not key:
            raise ValueError("key cannot be empty")
        path = self.path / f"{key}{suffix}"
        if path.exists():
            return
        fd, tmp = tempfile.mkstemp(dir=str(self.path), suffix=".wip")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(val)
            os.replace(tmp, path)
        except BaseException:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise

    # eviction_enabled (jax_compilation_cache_max_size >= 0) takes jax's
    # locked path with atime bookkeeping; only harden the common
    # unbounded config this project uses.
    orig_put = _lc.LRUCache.put

    @functools.wraps(orig_put)
    def put(self, key: str, val: bytes) -> None:
        if getattr(self, "eviction_enabled", True):
            return orig_put(self, key, val)
        return atomic_put(self, key, val)

    _lc.LRUCache.put = put

    orig_get = _cc.get_executable_and_time

    @functools.wraps(orig_get)
    def get(cache_key, *a, **k):
        try:
            return orig_get(cache_key, *a, **k)
        except Exception:
            # corrupt legacy entry: evict it and report a miss so the
            # executable is recompiled (and re-written atomically)
            import jax

            d = jax.config.jax_compilation_cache_dir
            if d:
                try:
                    os.remove(os.path.join(d, f"{cache_key}{suffix}"))
                except OSError:
                    pass
            return None, None

    _cc.get_executable_and_time = get
