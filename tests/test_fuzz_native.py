"""Smoke test for the ASan + edge-coverage native fuzz harness: build
and run it briefly (longer sessions: tests/run_fuzz.sh [seconds])."""

import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no gcc")
def test_fuzz_harness_builds_and_runs():
    r = subprocess.run(
        ["sh", str(REPO / "tests" / "run_fuzz.sh"), "5", "4096"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "fuzz_native:" in r.stdout
