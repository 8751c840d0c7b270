"""Location-free MLIR lowering for cache-stable pallas payloads.

jax's persistent compile cache canonicalizes StableHLO with
`strip-debuginfo` before hashing (jax/_src/cache_key.py), but a pallas
TPU kernel is embedded in the `tpu_custom_call` payload as serialized
MLIR *bytecode* — opaque bytes the pass never reaches. Those bytes
retain `loc(file:line)` info, so ANY source edit that shifts a line in a
file whose code appears in a kernel changes every cache key that embeds
a kernel: one added comment in ops/pallas_field.py recompiles the whole
proving pipeline (~30-60 min of axon compiles, measured 2026-08-19).

Fix: patch `mlir.source_info_to_location` to keep the op-name scopes but
drop file/line (childLoc=unknown). Op names stay for profilers; payload
bytes become a pure function of the traced program.

Enabled by importing proof_systems_tpu (see __init__); set
PST_KEEP_LOCATIONS=1 to restore full source locations when debugging a
kernel failure (error messages then point at real lines again).
"""

from __future__ import annotations

import os

_patched = False


def stabilize() -> None:
    global _patched
    if _patched or os.environ.get("PST_KEEP_LOCATIONS") == "1":
        return
    try:
        from jax._src.interpreters import mlir as _mlir
        from jax._src.lib.mlir import ir

        if not callable(getattr(_mlir, "source_info_to_location", None)):
            raise AttributeError("mlir.source_info_to_location missing")
    except Exception as e:  # pragma: no cover - jax internals moved
        # Fail LOUD: without this patch every source edit that shifts a
        # line re-keys all pallas compile-cache entries (30-60 min of
        # recompiles). Don't crash the library, but make the drift visible.
        import sys

        print(
            f"proof_systems_tpu: stable_lowering could not patch jax "
            f"({type(e).__name__}: {e}); pallas compile-cache keys will "
            f"depend on source line numbers. Fix utils/stable_lowering.py "
            f"for this jax version.",
            file=sys.stderr,
            flush=True,
        )
        return

    def _loc_no_lines(ctx, primitive, name_stack, traceback):
        loc = ir.Location.unknown()
        if primitive is None:
            if name_stack.stack:
                loc = ir.Location.name(str(name_stack), childLoc=loc)
        else:
            eqn_str = (
                f"{name_stack}/{primitive.name}"
                if name_stack.stack
                else primitive.name
            )
            loc = ir.Location.name(eqn_str, childLoc=loc)
            loc = ir.Location.name(f"{primitive.name}:", childLoc=loc)
        return loc

    _mlir.source_info_to_location = _loc_no_lines
    _patched = True
