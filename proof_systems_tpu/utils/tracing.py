"""Checkpoint tracing (internal-tracing/src/lib.rs equivalent).

The reference records microsecond checkpoints behind a compile-time
feature (decl_traces!/checkpoint!, lib.rs:63-165) with 17 prover
checkpoints (prover.rs:1466-1483). Here: a process-global tracer,
enabled with PST_TRACE=1, that timestamps named checkpoints and can
dump JSON lines like the reference's OCaml exporter. Checkpoint names
match the reference list so traces are cross-implementation comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time


class Tracer:
    def __init__(self):
        self.enabled = bool(os.environ.get("PST_TRACE"))
        self.events: list[tuple[str, float]] = []
        self._last: float | None = None

    def checkpoint(self, name: str, **meta) -> None:
        if not self.enabled:
            return
        now = time.time()
        dt = 0.0 if self._last is None else now - self._last
        self._last = now
        self.events.append((name, now))
        extra = f" {meta}" if meta else ""
        # stderr: stdout is reserved for machine-readable output (the
        # driver parses bench.py's single JSON line from stdout)
        print(f"[trace +{dt:7.2f}s] {name}{extra}", file=sys.stderr, flush=True)

    def dump_json(self) -> str:
        return "\n".join(
            json.dumps({"checkpoint": n, "ts_us": int(t * 1e6)}) for n, t in self.events
        )

    def reset(self) -> None:
        self.events.clear()
        self._last = None


TRACER = Tracer()
checkpoint = TRACER.checkpoint
