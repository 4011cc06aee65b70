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


def _check(doc_path):
    return subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "tests", "regen_coverage_anchors.py"),
            "--check",
            "--doc",
            doc_path,
        ],
        capture_output=True,
        text=True,
    )


def test_check_catches_drifted_nameless_anchor(tmp_path):
    """A bare `file:NN` anchor (no trailing name) whose table row carries a
    resolvable identifier must trip --check when NN drifts — the O1/O2/O3/P4
    rows went stale silently before the row-identifier pass existed."""
    doc = tmp_path / "doc.md"
    doc.write_text(
        "| P4 | `filter_rows` + summarized DROPPED_ROW | "
        "`phaser_spark/builtin_steps.py:1` | tests | q |\n"
    )
    proc = _check(str(doc))
    assert proc.returncode == 1 and "stale anchor" in proc.stdout


def test_check_passes_on_current_nameless_anchor(tmp_path):
    import re

    src = open(os.path.join(ROOT, "phaser_spark", "builtin_steps.py")).readlines()
    line = next(i for i, l in enumerate(src, 1) if re.match(r"^def filter_rows\b", l))
    doc = tmp_path / "doc.md"
    doc.write_text(
        "| P4 | `filter_rows` + summarized DROPPED_ROW | "
        f"`phaser_spark/builtin_steps.py:{line}` | tests | q |\n"
    )
    proc = _check(str(doc))
    assert proc.returncode == 0, proc.stdout + proc.stderr
