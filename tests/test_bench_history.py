"""bench.py round-keeping: round keys in bench_history.json are owned by
driver BENCH_r{N}.json snapshots; local runs write only the `local`
scratch key plus a `local_pending` block that is promoted when (and only
when) the matching snapshot appears — so a local re-run after the
current round's snapshot exists can never claim a future round's slot
(ADVICE r8, bench.py:292)."""
import json
import os

import bench


def _write_snapshot(root, n, parsed):
    with open(os.path.join(root, f"BENCH_r{n:02d}.json"), "w") as f:
        json.dump({"parsed": parsed}, f)


def _read_history(root):
    with open(os.path.join(root, "bench_history.json")) as f:
        return json.load(f)


def test_local_run_never_stamps_a_round_key(tmp_path):
    root = str(tmp_path)
    _write_snapshot(root, 1, {"value": 10.0, "queries": {"q": 10.0}})
    bench._update_history({"q": 9.0}, 9.0, root=root)
    h = _read_history(root)
    assert set(h["total"]) == {"r1", "local"}
    assert h["total"]["local"] == 9.0
    assert h["local_pending"] == {
        "for_round": "r2",
        "total": 9.0,
        "queries": {"q": 9.0},
    }
    # repeated local runs refresh local/pending, still no round key
    bench._update_history({"q": 8.0}, 8.0, root=root)
    h = _read_history(root)
    assert set(h["total"]) == {"r1", "local"}
    assert h["queries"]["q"] == {"r1": 10.0, "local": 8.0}
    assert h["local_pending"]["queries"] == {"q": 8.0}


def test_pending_backfills_truncated_snapshot(tmp_path):
    root = str(tmp_path)
    _write_snapshot(root, 1, {"value": 10.0, "queries": {"q": 10.0, "z": 1.0}})
    bench._update_history({"q": 9.0, "z": 0.9}, 9.9, root=root)
    # the driver's r2 snapshot arrives TRUNCATED: parses, but lost query z
    _write_snapshot(root, 2, {"value": 9.9, "queries": {"q": 9.1}})
    bench._update_history({"q": 7.0, "z": 0.7}, 7.7, root=root)
    h = _read_history(root)
    # parsed snapshot wins where present; pending fills the hole
    assert h["queries"]["q"]["r2"] == 9.1
    assert h["queries"]["z"]["r2"] == 0.9
    assert h["total"]["r2"] == 9.9
    # consumed pending replaced by the new run's block, tagged r3
    assert h["local_pending"]["for_round"] == "r3"


def test_pending_fills_unparsed_snapshot(tmp_path):
    root = str(tmp_path)
    bench._update_history({"q": 9.0}, 9.0, root=root)
    _write_snapshot(root, 1, None)  # driver stdout window blew: parsed null
    bench._update_history({"q": 8.0}, 8.0, root=root)
    h = _read_history(root)
    assert h["queries"]["q"]["r1"] == 9.0
    assert h["total"]["r1"] == 9.0


def test_probe_tag_flows_into_pending(tmp_path):
    """VERDICT r11 #3: bench.py runs the md5 host probe itself and tags
    the staged pass healthy/degraded, so promotion into SCALE.md's
    cross-round tables is mechanical."""
    root = str(tmp_path)
    bench._update_history(
        {"q": 9.0}, 9.0, root=root, probe_sec=0.47, host_window="healthy"
    )
    h = _read_history(root)
    assert h["local_pending"]["probe_sec"] == 0.47
    assert h["local_pending"]["host_window"] == "healthy"
    # a probe-less call (old signature) omits the fields entirely
    bench._update_history({"q": 9.0}, 9.0, root=root)
    h = _read_history(root)
    assert "probe_sec" not in h["local_pending"]
    # the classification boundary: nominal healthy 0.48 + 15%
    assert bench.HEALTHY_PROBE_MAX == 0.552


def test_spread_ratchets_and_caps(tmp_path):
    root = str(tmp_path)
    bench._update_history({"q": 9.0}, 9.0, spread={"q": 0.3, "w": 0.9}, root=root)
    bench._update_history({"q": 8.0}, 8.0, spread={"q": 0.01, "w": 0.1}, root=root)
    h = _read_history(root)
    # a lucky tight run must not shrink the established band; cap at 0.5
    assert h["spread"]["q"] == 0.3
    assert h["spread"]["w"] == 0.5
