"""Differential end-to-end parity against the REFERENCE implementation.

The reference (/root/reference, pure Python, zero dependencies) and
phaser_spark expose the same public API by design.  This suite builds the
SAME pipelines — columns, builtin steps, row steps, error policies —
against both modules from one declarative spec, runs them on the same
seeded random CSVs, and diffs:

  * every phase checkpoint: row values AND __phaser_row_num__ lineage
  * the run outcome (clean vs DataException)
  * the errors_and_warnings event set (type, step, row), text-normalized

This checks phaser *semantics* end-to-end (quarantine, renumbering,
keep-last dedup, canonical renames, policy precedence) in a way the
per-query DuckDB oracle can only approximate.  Skipped when the
reference tree is absent; oracle tier (runs pipelines, minutes).
"""
from __future__ import annotations

import csv
import io
import os
import random
import re
import sys
from pathlib import Path

import pytest

REFERENCE_ROOT = "/root/reference"

pytestmark = [
    pytest.mark.oracle,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE_ROOT, "phaser")),
        reason="reference tree absent",
    ),
]


def _reference_module():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import phaser  # noqa: PLC0415

    return phaser


def _spark_module():
    import phaser_spark  # noqa: PLC0415

    return phaser_spark


# --- one declarative spec, two engines -------------------------------------

def _make_step(mod, kind: str):
    """Step factories bound to a module's decorators so the identical
    user code runs on both engines."""
    if kind == "derive_full":

        @mod.row_step
        def derive_full(row, **kwargs):
            row["full"] = f"{row['first']} {row['last']}"
            return row

        return derive_full
    if kind == "drop_inactive":

        @mod.row_step
        def drop_inactive(row, **kwargs):
            if row["status"] == "inactive":
                raise mod.DropRowException(f"dropping inactive {row['first']}")
            return row

        return drop_inactive
    if kind == "error_negative_amount":

        @mod.row_step
        def error_negative_amount(row, **kwargs):
            if row["amount"] is not None and float(row["amount"]) < 0:
                raise mod.DataErrorException("negative amount")
            return row

        return error_negative_amount
    if kind == "warn_big_amount":

        @mod.row_step
        def warn_big_amount(row, **kwargs):
            if row["amount"] is not None and float(row["amount"]) > 900:
                raise mod.WarningException("suspiciously large amount")
            return row

        return warn_big_amount
    if kind == "count_status":

        @mod.row_step(extra_outputs=["status_counts"])
        def count_status(row, status_counts):
            status_counts[row["status"]] += 1
            return row

        return count_status
    if kind == "merge_status_counts":

        @mod.row_step(extra_sources=["status_counts"])
        def merge_status_counts(row, status_counts):
            row["status_peers"] = status_counts[row["status"]] - 1
            return row

        return merge_status_counts
    if kind == "flatten_props":
        return mod.flatten_column("props")
    if kind == "filter_active":
        return mod.filter_rows(lambda row: row["status"] != "retired")
    if kind == "sort_by_first":
        return mod.sort_by("first")
    if kind == "dedup_by_id":
        return mod.drop_duplicate_rows(columns=["emp_id"])
    if kind == "check_unique_id":
        return mod.check_unique("emp_id")
    raise ValueError(kind)


def _build_columns(mod, specs):
    cls = {
        "any": mod.Column,
        "int": mod.IntColumn,
        "float": mod.FloatColumn,
        "date": mod.DateColumn,
    }
    cols = []
    for s in specs:
        kwargs = dict(s.get("kwargs", {}))
        # "@WARN" → the module's own ON_ERROR_WARN constant (the literal
        # policy values differ between engines; the CONSTANTS are the API)
        if isinstance(kwargs.get("on_error"), str) and kwargs["on_error"].startswith("@"):
            kwargs["on_error"] = getattr(mod, f"ON_ERROR_{kwargs['on_error'][1:]}")
        cols.append(cls[s["kind"]](s["name"], **kwargs))
    return cols


def _build_pipeline(mod, workdir: Path, csv_path: str, scenario: dict):
    from collections import defaultdict

    phases = [
        mod.Phase(
            name=p["name"],
            columns=_build_columns(mod, p.get("columns", [])),
            steps=[_make_step(mod, k) for k in p.get("steps", [])],
            renumber=p.get("renumber", False),
            extra_outputs=[
                mod.ExtraMapping(n, defaultdict(int))
                for n in p.get("extra_outputs", [])
            ]
            or None,
            extra_sources=list(p.get("extra_sources", [])) or None,
        )
        for p in scenario["phases"]
    ]
    return mod.Pipeline(working_dir=workdir, source=csv_path, phases=phases)


# --- seeded data ------------------------------------------------------------

def _write_csv(path: str, seed: int, n: int = 18) -> None:
    rng = random.Random(seed)
    # header variants exercise canonicalization + rename on both engines
    headers = ["Emp ID", "first", "LAST", "status", "amount", "code", "joined"]
    statuses = ["active", "inactive", "retired", "active", "active"]
    firsts = ["ada", "grace", "alan", "edsger", "barbara", "donald"]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(headers)
        for i in range(1, n + 1):
            emp = rng.choice([str(i), str(i), str(i), str(rng.randint(1, n)), ""])
            first = rng.choice(firsts)
            last = rng.choice(["Lovelace", "HOPPER", "turing"])
            status = rng.choice(statuses)
            amount = rng.choice(
                [f"{rng.uniform(-50, 1000):.2f}", f"{rng.randint(0, 500)}", ""]
            )
            code = rng.choice([str(rng.randint(1, 99)), f"x{i}", ""])
            d = (rng.randint(2020, 2025), rng.randint(1, 12), rng.randint(1, 28))
            joined = rng.choice(
                ["%04d-%02d-%02d", "%04d/%02d/%02d", "%04d%02d%02d"]
            ) % d
            w.writerow([emp, first, last, status, amount, code, joined])


def _write_json(path: str, seed: int, n: int = 14) -> None:
    import json as _json

    rng = random.Random(seed)
    recs = []
    for i in range(1, n + 1):
        recs.append(
            {
                "Emp ID": i,
                "status": rng.choice(["active", "inactive"]),
                "props": {
                    "grade": rng.randint(1, 9),
                    "org": {"team": rng.choice(["ops", "ml", "web"])},
                },
            }
        )
    with open(path, "w") as f:
        _json.dump(recs, f)


SCENARIOS = {
    "date_column_parity": {
        # DateColumn multi-format parsing (ISO, %Y/%m/%d, %Y%m%d) must
        # yield the same calendar dates and the same checkpoint spelling
        "phases": [
            {
                "name": "Dates",
                "columns": [{"kind": "date", "name": "joined"}],
            },
        ]
    },
    "json_flatten": {
        # JSON records source + deep flatten_column: nested dicts become
        # props__grade / props__org__team on both engines
        "source": "json",
        "phases": [
            {
                "name": "Flatten",
                "columns": [
                    {"kind": "int", "name": "emp_id",
                     "kwargs": {"rename": ["Emp ID"]}},
                ],
                "steps": ["flatten_props"],
            },
        ]
    },
    "transform_with_drops": {
        "phases": [
            {
                "name": "Validate",
                "columns": [
                    {
                        "kind": "int",
                        "name": "emp_id",
                        "kwargs": {"rename": ["Emp ID"], "null": True},
                    },
                    {"kind": "any", "name": "first"},
                    {"kind": "any", "name": "last", "kwargs": {"rename": ["LAST"]}},
                    {
                        "kind": "float",
                        "name": "amount",
                        "kwargs": {"null": True, "on_error": "@WARN"},
                    },
                ],
                "steps": ["drop_inactive", "derive_full"],
            },
            {
                "name": "Transform",
                "steps": ["filter_active", "sort_by_first"],
                "renumber": True,
            },
        ]
    },
    "dedup_keep_last": {
        "phases": [
            {
                "name": "Dedup",
                "columns": [
                    {
                        "kind": "int",
                        "name": "emp_id",
                        "kwargs": {"rename": ["Emp ID"], "null": True},
                    },
                ],
                "steps": ["dedup_by_id"],
            },
        ]
    },
    "unique_violation_fails": {
        # seeded data has duplicate + blank emp_ids: check_unique must fail
        # the phase identically (outcome + event parity)
        "phases": [
            {
                "name": "Unique",
                "columns": [
                    {
                        "kind": "int",
                        "name": "emp_id",
                        "kwargs": {"rename": ["Emp ID"], "null": True},
                    },
                ],
                "steps": ["check_unique_id"],
            },
        ]
    },
    "collect_errors_fails": {
        # DataErrorException rows under the default collect policy: phase
        # completes the pass, then fails; dropped/err rows must match
        "phases": [
            {
                "name": "Screen",
                "columns": [
                    {"kind": "float", "name": "amount", "kwargs": {"null": True}},
                ],
                "steps": ["error_negative_amount"],
            },
        ]
    },
    "extra_output_pipe": {
        # the reference 'families' idiom: phase 1 accumulates counts into
        # an ExtraMapping extra-output, phase 2 merges them back per row
        # via an extra-source — checkpoint parity covers the counts
        "phases": [
            {
                "name": "CountStatus",
                "columns": [{"kind": "any", "name": "status"}],
                "steps": ["count_status"],
                "extra_outputs": ["status_counts"],
            },
            {
                "name": "EnrichStatus",
                "steps": ["merge_status_counts"],
                "extra_sources": ["status_counts"],
            },
        ]
    },
    "fix_and_defaults": {
        # fix_value_fn string whitelist + defaults applied to null values
        "phases": [
            {
                "name": "Fix",
                "columns": [
                    {
                        "kind": "any",
                        "name": "status",
                        "kwargs": {"fix_value_fn": "capitalize"},
                    },
                    {
                        "kind": "float",
                        "name": "amount",
                        "kwargs": {"null": True, "default": 7.5,
                                   "on_error": "@WARN"},
                    },
                ],
            },
        ]
    },
    "int_cast_collect_fails": {
        # malformed ints ("x17") under the default collect policy: both
        # engines must record the cast error and fail the phase
        "phases": [
            {
                "name": "Codes",
                "columns": [
                    {"kind": "int", "name": "code", "kwargs": {"null": True}},
                ],
            },
        ]
    },
    "warn_policy_events": {
        "phases": [
            {
                "name": "Screen",
                "columns": [
                    {
                        "kind": "float",
                        "name": "amount",
                        "kwargs": {"null": True, "on_error": "@WARN"},
                    },
                ],
                "steps": ["warn_big_amount", "drop_inactive"],
            },
        ]
    },
}


# --- normalization + diff ---------------------------------------------------

def _norm_cell(v: str):
    if v is None or v == "" or v == "None":
        return None
    try:
        return round(float(v), 6)
    except ValueError:
        return v


def _read_checkpoints(workdir: Path) -> dict[str, list[dict]]:
    out = {}
    for p in sorted(workdir.glob("*_output.csv")):
        with open(p, newline="") as f:
            rows = [
                {k: _norm_cell(v) for k, v in r.items()}
                for r in csv.DictReader(f)
            ]
        out[p.name] = sorted(
            rows, key=lambda r: r.get("__phaser_row_num__") or 0
        )
    return out


_REF_EVENT = re.compile(r"^(\w+) in step (\S+), row (\S+):")
_SPARK_EVENT = re.compile(r"^(\w+)(?: during step (\S+))?(?: in row (\S+))?:")


def _read_events(workdir: Path) -> list[tuple]:
    path = workdir / "errors_and_warnings.txt"
    if not path.exists():
        return []
    events = []
    for line in path.read_text().splitlines():
        m = _REF_EVENT.match(line) or _SPARK_EVENT.match(line)
        if m and m.group(1) in ("ERROR", "WARNING", "DROPPED_ROW"):
            step = (m.group(2) or "").removesuffix("_step")
            if step.startswith("check_unique"):
                # we name the step check_unique_<column> (more informative);
                # the reference calls every instance check_unique
                step = "check_unique"
            if step in ("__cast_and_check__", "cast_each_column_value"):
                # both engines attribute cast/validation errors to an
                # internal pseudo-step; the spelling is engine-private
                step = "cast"
            row = m.group(3)
            if row is not None and row.lower() == "none":
                row = None  # batch-level event: engines spell the absence differently
            if step == "consistency_check":
                # the reference's row attribution here is its own known bug
                # (phaser/phase.py:322 TODO: all land on the current row);
                # compare presence + step, not the bogus row
                row = None
            events.append((m.group(1), step, row))
    return sorted(events)


def _run_one(mod, tmp: Path, tag: str, csv_path: str, scenario: dict):
    workdir = tmp / tag
    workdir.mkdir()
    pipeline = _build_pipeline(mod, workdir, csv_path, scenario)
    outcome = "ok"
    try:
        pipeline.run()
    except Exception as e:  # noqa: BLE001 — outcome parity is the assertion
        outcome = type(e).__name__
    return outcome, _read_checkpoints(workdir), _read_events(workdir)


@pytest.mark.parametrize("scenario_name", sorted(SCENARIOS))
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pipeline_matches_reference(spark, tmp_path, scenario_name, seed):
    scenario = SCENARIOS[scenario_name]
    if scenario.get("source") == "json":
        csv_path = str(tmp_path / "input.json")
        _write_json(csv_path, seed=seed)
    else:
        csv_path = str(tmp_path / "input.csv")
        _write_csv(csv_path, seed=seed)

    ref_outcome, ref_ckpts, ref_events = _run_one(
        _reference_module(), tmp_path, "ref", csv_path, scenario
    )
    got_outcome, got_ckpts, got_events = _run_one(
        _spark_module(), tmp_path, "spark", csv_path, scenario
    )

    assert got_outcome == ref_outcome
    assert set(got_ckpts) == set(ref_ckpts)
    # Rows carrying a recorded ERROR event are compared by PRESENCE and
    # row number only: on a cast failure the schemaless reference keeps
    # the unconvertible raw value ('x1') in its checkpoint, while a typed
    # engine cannot represent a string inside an int column and stores
    # NULL — the quarantined payload is engine-representation-specific;
    # the contract is that the row exists, keeps its number, and carries
    # the same event.
    error_rows = {row for (typ, _, row) in ref_events if typ == "ERROR"}
    for name in ref_ckpts:
        ref_rows, got_rows = ref_ckpts[name], got_ckpts[name]
        assert len(got_rows) == len(ref_rows), name
        for rr, gr in zip(ref_rows, got_rows):
            shared = set(rr) & set(gr)
            assert shared >= {"__phaser_row_num__"}, name
            rn = rr["__phaser_row_num__"]
            assert gr["__phaser_row_num__"] == rn, name
            if rn is not None and str(int(rn)) in error_rows:
                continue
            for k in shared:
                assert gr[k] == rr[k], (name, k, rr, gr)
    assert got_events == ref_events
