"""Spec-as-code drift guard (the reference's `cargo spec` regenerates
its kimchi spec from source comments and CI fails on drift —
book/specifications/kimchi/Makefile:6-8)."""

import pathlib
import subprocess
import sys


def test_spec_matches_sources():
    repo = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "scripts" / "generate_spec.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
