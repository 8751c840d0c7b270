#!/usr/bin/env python
"""Run the heavy test tier with per-file process isolation.

XLA:CPU's compiler segfaults nondeterministically when compiling large
fresh graphs on top of a long-lived process's accumulated executables
(observed at tests/test_mesh.py's sharded prove and the IVC decider
when run late in a monolithic session; never in isolation). One pytest
process per test file bounds executable/memory accumulation, keeps the
persistent compile cache shared, and lets a crash fail ONE file with a
clear report instead of killing the tier.

Run: PST_HEAVY=1 python scripts/run_heavy.py [extra pytest args]
"""

import os
import pathlib
import subprocess
import sys
import time


def main() -> int:
    repo = pathlib.Path(__file__).resolve().parent.parent
    env = dict(os.environ, PST_HEAVY="1")
    files = sorted(p for p in (repo / "tests").glob("test_*.py"))
    t0 = time.time()
    failures = []
    for f in files:
        tf = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", str(f), "-q", *sys.argv[1:]],
            cwd=repo,
            env=env,
        )
        print(f"[heavy] {f.name}: rc={r.returncode} {time.time()-tf:.0f}s",
              flush=True)
        if r.returncode not in (0, 5):  # 5 = no tests collected
            failures.append(f.name)
    print(f"[heavy] total {time.time()-t0:.0f}s; failures: {failures or 'none'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
