"""COVERAGE.md anchor freshness: the file:line pointers the parity audit
relies on must track the code.  regen_coverage_anchors resolves every
anchor that names (or whose table row names) a def/class; this guard
fails the fast tier as soon as one drifts, so the doc can never go stale
again (round-5 audit found 19 stale anchors)."""
import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_anchors_current():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tests", "regen_coverage_anchors.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, (
        "COVERAGE.md anchors drifted — run "
        "`python tests/regen_coverage_anchors.py` and commit:\n"
        + proc.stdout
        + proc.stderr
    )
