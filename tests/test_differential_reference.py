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

Round 10 adds a SEEDED RANDOM GENERATOR over the same declarative space
(50 specs/run: column contracts × step grammars × policies) plus three
divergence-lock tests pinning the reference bugs its first sweeps found
(PARITY.md): cast failures bypassing the column policy, errored rows
vanishing from later-step checkpoints, and range checks crashing on
permitted nulls.  The same sweeps caught two real bugs in THIS engine
(fixed + unit-pinned): a numpy-truthiness stage crash for rows carrying
2+ warnings into a row step, and renumber=True rewriting the event
report's row attribution.
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
    if kind == "touch_row":
        # identity row step: its only effect is the reference's sweep of
        # already-errored rows out of the working set (phase.py:90-91) —
        # the axis the swept-visibility rule must reproduce
        @mod.row_step
        def touch_row(row, **kwargs):
            return row

        return touch_row
    if kind == "stamp_cap":
        # context_step mutating a pipeline variable mid-phase
        @mod.context_step
        def stamp_cap(context):
            context.add_variable("amount_cap", 400)

        return stamp_cap
    if kind == "tag_over_cap":
        # row step reading the variable a context_step set earlier
        @mod.row_step
        def tag_over_cap(row, context=None, **kwargs):
            cap = context.get("amount_cap") if context is not None else None
            amt = row["amount"]
            row["over_cap"] = str(
                cap is not None and amt is not None and float(amt) > cap
            )
            return row

        return tag_over_cap
    if kind == "batch_drop_retired":
        # USER batch step removing rows (+ check_size): the reference's
        # batch surface is a list of dict-like Records, this engine's a
        # Spark DataFrame — the SPEC is identical semantics, the body is
        # each engine's documented API (round-11 axis: realign, max+1
        # preservation, and the check_size count had no differential
        # coverage through user batch steps before)
        if mod.__name__ == "phaser":

            @mod.batch_step(check_size=True)
            def batch_drop_retired(rows, context=None, **kwargs):
                return [r for r in rows if r["status"] != "retired"]

        else:
            from pyspark.sql import functions as _F

            @mod.batch_step(check_size=True)
            def batch_drop_retired(df, context=None, **kwargs):
                return df.filter(_F.col("status") != "retired")

        return batch_drop_retired
    if kind == "batch_upper_status":
        # USER batch step transforming a value in place (row identity and
        # numbering must survive the realign round-trip)
        if mod.__name__ == "phaser":

            @mod.batch_step
            def batch_upper_status(rows, context=None, **kwargs):
                for r in rows:
                    if r["status"] is not None:
                        r["status"] = r["status"].upper()
                return rows

        else:
            from pyspark.sql import functions as _F

            @mod.batch_step
            def batch_upper_status(df, context=None, **kwargs):
                return df.withColumn("status", _F.upper(_F.col("status")))

        return batch_upper_status
    if kind == "batch_merge_status_counts":
        # the families idiom through a BATCH step (S8/U5 batch surface):
        # the reference hands the ExtraMapping object, this engine a
        # (key, value) DataFrame — identical spec, documented APIs
        if mod.__name__ == "phaser":

            @mod.batch_step(extra_sources=["status_counts"])
            def batch_merge_status_counts(rows, status_counts, context=None, **kwargs):
                for r in rows:
                    r["status_peers"] = status_counts[r["status"]] - 1
                return rows

        else:
            from pyspark.sql import functions as _F

            @mod.batch_step(extra_sources=["status_counts"])
            def batch_merge_status_counts(df, status_counts, context=None, **kwargs):
                side = status_counts.select(
                    _F.col("key").alias("status"),
                    (_F.col("value") - 1).alias("status_peers"),
                )
                return df.join(_F.broadcast(side), "status", "left")

        return batch_merge_status_counts
    if kind == "df_status_len":
        # dataframe_step (U3): the reference hands a pandas DataFrame
        # (with PHASER_ROW_NUM when pass_row_nums), this engine a Spark
        # DataFrame — identical spec, each engine's documented API
        if mod.__name__ == "phaser":

            @mod.dataframe_step
            def df_status_len(df, context=None, **kwargs):
                df["status_len"] = df["status"].str.len()
                return df

        else:
            from pyspark.sql import functions as _F

            @mod.dataframe_step
            def df_status_len(df, context=None, **kwargs):
                return df.withColumn("status_len", _F.length(_F.col("status")))

        return df_status_len
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
    return mod.Pipeline(
        working_dir=workdir,
        source=csv_path,
        phases=phases,
        error_policy=scenario.get("error_policy"),
    )


# --- seeded data ------------------------------------------------------------

def _write_csv(path: str, seed: int, n: int = 18) -> None:
    rng = random.Random(seed)
    # header variants exercise canonicalization + rename on both engines
    headers = ["Emp ID", "first", "LAST", "status", "amount", "code", "joined"]
    statuses = ["active", "inactive", "retired", "active", "active"]
    # "" and whitespace-only both count as blank in both engines
    # (reference `not value.strip()`; this engine's blank contract)
    firsts = ["ada", "grace", "alan", "edsger", "barbara", "donald", "", "  "]
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
            # literal "None"/"NULL" are null-literals in BOTH engines
            # (reference is_nan_or_null; our NULL_LITERALS)
            code = rng.choice([str(rng.randint(1, 99)), f"x{i}", "", "None"])
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
                    "org": {
                        "team": rng.choice(["ops", "ml", "web"]),
                        "loc": {"city": rng.choice(["nyc", "sfo", "ber"])},
                    },
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
    "swept_dedup_after_row_step": {
        # round-11 ADVICE: a row that errored at cast and was then swept
        # by a row step has left the reference's working set — it may not
        # WIN a keep-last dedup group (dropping a clean row the reference
        # keeps).  null=False makes blank emp_ids error under @COLLECT;
        # touch_row sweeps them; dedup runs on the survivors only.
        "phases": [
            {
                "name": "SweptDedup",
                "columns": [
                    {
                        "kind": "int",
                        "name": "emp_id",
                        "kwargs": {"rename": ["Emp ID"], "null": False},
                    },
                ],
                "steps": ["touch_row", "dedup_by_id"],
            },
        ]
    },
    "mid_renumber_then_dedup": {
        # round-12 axis (b), pinned deterministically (the randomized
        # space samples it rarely): a MIDDLE phase renumbers, then the
        # final phase's keep-last dedup must key off the REnumbered
        # order identically in both engines, and the merge of a P1
        # extra output must still resolve in P3 across the intermediate
        # checkpoint (axis (a), the full families idiom)
        "phases": [
            {
                "name": "Collect",
                "columns": [
                    {
                        "kind": "int",
                        "name": "emp_id",
                        "kwargs": {"rename": ["Emp ID"], "null": True},
                    },
                    {"kind": "any", "name": "status"},
                ],
                "steps": ["count_status"],
                "extra_outputs": ["status_counts"],
            },
            {
                "name": "Renum",
                "steps": ["filter_active"],
                "renumber": True,
            },
            {
                "name": "Merge",
                "steps": ["merge_status_counts", "dedup_by_id"],
                "extra_sources": ["status_counts"],
            },
        ]
    },
    "swept_unique_after_row_step": {
        # same sweep, check_unique flavor: a duplicate key pair where one
        # row errored and was swept must NOT raise a duplicate error the
        # reference would not raise
        "phases": [
            {
                "name": "SweptUnique",
                "columns": [
                    {
                        "kind": "int",
                        "name": "emp_id",
                        "kwargs": {"rename": ["Emp ID"], "null": False},
                    },
                ],
                "steps": ["touch_row", "check_unique_id"],
            },
        ]
    },
    "context_variable_mutation": {
        # a context_step mutates a pipeline variable mid-phase; a later
        # row step reads it — variable visibility timing parity
        "phases": [
            {
                "name": "CtxVars",
                "columns": [
                    {
                        "kind": "float",
                        "name": "amount",
                        "kwargs": {"null": True},
                    },
                ],
                "steps": ["stamp_cap", "tag_over_cap"],
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


# --- property-randomized specs (round 10) -----------------------------------
#
# The curated scenarios above pin the interactions we THOUGHT to write
# down; this generator samples the same declarative space at random —
# column contracts (type × null/blank/default/allowed/fix × policy ×
# required/ghost × save) and step stacks drawn from a seeded grammar —
# and runs every sampled spec through BOTH engines.  Divergences either
# get fixed or become PARITY.md entries; the generator is the cheapest
# remaining way to find semantic drift the curated cases miss.
# Round-10 second pass added the blank / required-ghost / save axes
# (blank data in the firsts pool; a missing required header is a
# PhaserError run failure in both engines — see phase.py's parity note).
# Seeds 0-79 swept green on that space (80-seed one-off sweep at the
# round-10 close, 0 divergences).  Round-11: the widening ran in three
# passes, each sweep feeding fixes — (1) JSON/context/three-phase axes:
# seeds 1/14/41 caught the renumber-TIMING divergence (fixed in
# phase.py, see _apply_renumber); (2) user batch steps: seed 17 caught
# the removed-row EVENT-RETENTION bug (fixed in _realign); (3)
# dataframe steps: seeds 40/81/136 exposed the reference's post-dedup
# dict-insertion list order feeding a later renumber plus the
# comparator's event-number exemption breaking across renumber — both
# now excluded by the renumber_ok guard below and documented in
# PARITY.md ("Checkpoint row order").  Final grammar: seeds 0-159 all
# green (60 committed here + a 100-seed one-off).  Round-12 close:
# after the round's axis additions (cross-phase families, post-renumber
# dedup consumers, phase-level error-policy draw), a fresh one-off
# sweep of seeds 100-159 on the WIDENED grammar ran 60/60 green, zero
# divergences — on top of the 100 in-tier seeds; a second one-off
# (seeds 160-219) also ran 60/60 green, so 220 distinct scenarios of
# the current grammar have executed through both engines with zero
# unexplained divergences.  Round-11 widened six
# axes in total (VERDICT r10 next-round #4): JSON-records sources with
# nested dicts, context_step variable mutation read back by a later row
# step, three-phase pipelines with the renumber in the MIDDLE, user
# BATCH steps (row removal w/ check_size + value transform), DATAFRAME
# steps, and — enabled by the swept-visibility rule now covering ALL
# batch builtins — dedup/check_unique after a row step in cast-DIRTY
# scenarios (the sweep removes the ''-vs-NULL key representation
# divergence that previously confined those steps to cast-clean
# samples).
#
# Deliberately OUTSIDE the sampled space:
#   * ON_ERROR_STOP_NOW — "abort at the first error" exposes evaluation
#     ORDER, which is engine-private (the reference walks rows serially,
#     a distributed engine doesn't have a first row).
#   * fix fns that change a value's TYPE (len) — the schemaless
#     reference happily stores an int in a string field; a typed engine
#     casts — representation, not semantics.

_FIX_POOL = ["strip", "lower", "upper", "title"]
_POLICIES = ["@COLLECT", "@WARN", "@DROP_ROW"]


def _gen_scenario(seed: int) -> dict:
    rng = random.Random(seed * 7919 + 13)

    def col(kind, name, **kwargs):
        return {"kind": kind, "name": name, "kwargs": kwargs}

    # round-11 axis: JSON-records source with nested dicts — flatten +
    # rename + uniqueness over the nested payload (the curated
    # json_flatten scenario pinned one shape; this samples around it)
    if rng.random() < 0.12:
        steps = ["flatten_props"]
        if rng.random() < 0.5:
            steps.append("drop_inactive")
        if rng.random() < 0.4:
            steps.append("touch_row")
        if rng.random() < 0.4:
            steps.append("check_unique_id")  # JSON ids are unique 1..n
        columns = [col("int", "emp_id", rename=["Emp ID"])]
        if rng.random() < 0.5:
            columns.append(
                col("any", "status",
                    allowed_values=["active", "inactive"])
            )
        return {
            "source": "json",
            "phases": [{"name": "J1", "columns": columns, "steps": steps}],
        }

    columns = []
    # emp_id: the rename + nullability + (maybe) uniqueness axis
    emp_kwargs = {"rename": ["Emp ID"]}
    emp_null = rng.random() < 0.7
    emp_kwargs["null"] = emp_null
    if not emp_null or rng.random() < 0.5:
        emp_kwargs["on_error"] = rng.choice(_POLICIES)
    has_emp = rng.random() < 0.8
    if has_emp:
        columns.append(col("int", "emp_id", **emp_kwargs))
    # first/last: string fixes + blank + save axes.  blank only exists on
    # the base Column (typed reference columns hard-code blank=True), and
    # the data deliberately carries blank firsts so blank=False fires;
    # a blank that errors must not ALSO feed derive_full's row['first']
    # read in the same scenario (the reference reverts the errored row
    # wholesale — the retention divergence), so blank=False pins the
    # policy to @COLLECT, whose failing rows are outcome/event-compared.
    blankable_first = False
    if rng.random() < 0.6:
        kw = {}
        if rng.random() < 0.7:
            kw["fix_value_fn"] = rng.choice(_FIX_POOL)
        if rng.random() < 0.4:
            kw["blank"] = False
            kw["on_error"] = "@COLLECT"
            blankable_first = True
        columns.append(col("any", "first", **kw))
    has_last = rng.random() < 0.4
    if has_last:
        kw = {"rename": ["LAST"]}
        if rng.random() < 0.3:
            kw["save"] = False  # dropped at checkpoint by BOTH engines
        columns.append(col("any", "last", **kw))
    # ghost: a declared column absent from the data — required=True is a
    # PhaserError run failure in both engines (the reference wraps the
    # check_required raise escaping phase.run(), pipeline.py:186-189);
    # required=False materializes an all-null column in both
    if rng.random() < 0.3:
        columns.append(
            col("any", "bonus", required=rng.random() < 0.4)
        )
    # status: allowed-values membership (sometimes missing one => errors)
    failable_status = False
    status_warn_revert = False
    if rng.random() < 0.6:
        kw = {}
        if rng.random() < 0.6:
            allowed = ["active", "inactive", "retired"]
            if rng.random() < 0.5:
                allowed.remove(rng.choice(allowed))
                kw["on_error"] = rng.choice(_POLICIES)
                failable_status = True
                # a @WARN check failure REVERTS the reference row to its
                # raw pre-cast copy without erroring it — the row is
                # never swept, so its '' keys survive into any later
                # dedup (randomized seed 232)
                status_warn_revert = kw["on_error"] == "@WARN"
            kw["allowed_values"] = allowed
        columns.append(col("any", "status", **kw))
    # amount: float with null + default + policy axes (data has "",
    # negatives, and >900 values to feed the step exceptions)
    amount_declared = rng.random() < 0.8
    if amount_declared:
        kw = {"null": True}
        if rng.random() < 0.4:
            kw["default"] = rng.choice([0.0, 7.5])
        if rng.random() < 0.6:
            kw["on_error"] = rng.choice(_POLICIES)
        if rng.random() < 0.3 and "default" in kw:
            # abs only when a default fills nulls first: the reference
            # applies fix fns through eval() even to permitted nulls
            # (`eval("abs(None)")` → TypeError → phase-policy ERROR),
            # the same eval path this engine's whitelist refuses
            kw["fix_value_fn"] = "abs"
        columns.append(col("float", "amount", **kw))
    # code: malformed ints ("x17").  Two reference bugs bound this axis
    # (both PARITY.md-documented with divergence-lock tests):
    #   * on_error is pinned to @COLLECT — for CAST failures the
    #     reference ignores the column policy (raw exception → phase
    #     policy), so the engines only agree at the phase default;
    #   * min_value/max_value are NOT sampled — the data always carries
    #     blanks, blanks cast to None in both engines, and the
    #     reference's range check crashes on None (TypeError → ERROR).
    if rng.random() < 0.5:
        kw = {"null": rng.random() < 0.7, "on_error": "@COLLECT"}
        columns.append(col("int", "code", **kw))
    # joined: multi-format date parsing
    if rng.random() < 0.4:
        columns.append(col("date", "joined"))

    two_phase = rng.random() < 0.4
    step_pool = ["drop_inactive", "filter_active"]
    # round-11 axis: USER batch steps (row removal w/ check_size; value
    # transform) — the realign/max+1/check_size path had no differential
    # coverage through user batch steps before
    if rng.random() < 0.4:
        step_pool.append("batch_drop_retired")
    if rng.random() < 0.3:
        step_pool.append("batch_upper_status")
    if rng.random() < 0.3:
        step_pool.append("df_status_len")
    if not two_phase:
        # a P1 sort's order would have to survive the checkpoint to mean
        # anything in P2, and materializing it there (renumber=True)
        # renumbers the engines differently whenever the reference has
        # REMOVED an errored row first (see the retention divergence) —
        # cross-phase sorts are sampled in the FINAL phase only
        step_pool.append("sort_by_first")
    if has_last:
        # derive_full reads row['last']: only resolvable when the LAST
        # header is declared-renamed (undeclared headers keep their raw
        # spelling in both engines)
        step_pool.append("derive_full")
    if amount_declared and not failable_status:
        # a @WARN-failed check reverts the whole reference row to its raw
        # pre-cast copy (same deepcopy raise path as below), so a later
        # float(row['amount']) sees '' instead of the None the typed
        # engine's guard expects — only sample amount-reading steps when
        # no check can warn-and-revert
        step_pool += ["error_negative_amount", "warn_big_amount"]
    # dedup/check_unique key on emp_id values, and a reference row that
    # collects ANY cast/check error reverts WHOLESALE to its raw pre-cast
    # copy (the deepcopy raise path in phaser/phase.py:93-104) — its key
    # becomes '' where a typed engine holds NULL, so the keeper choice is
    # representation-dependent.  Only sample these steps in cast-clean
    # scenarios: no malformed-int column, no failable allowed_values, no
    # null=False on blank-bearing emp_id.
    cast_clean = (
        emp_null
        and not blankable_first  # a blank-collected row reverts wholesale
        and not any(c["name"] == "code" for c in columns)
        and not any(
            # a column WITHOUT allowed_values has no membership check and
            # cannot fail it — the old `[3]` sentinel (len 1 < 3) wrongly
            # flagged every such column as failable, making cast_clean
            # near-unreachable and starving the in-phase dedup axis
            # (round-12 generator fix; conservative-only before)
            len(c["kwargs"].get("allowed_values", "abc")) < 3 for c in columns
        )
    )
    if has_emp and cast_clean:
        step_pool += ["dedup_by_id", "check_unique_id"]
    if rng.random() < 0.3:
        step_pool.append("touch_row")
    rng.shuffle(step_pool)
    steps = step_pool[: rng.randint(0, 3)]
    # round-11 axis: dedup/check_unique AFTER a row step are parity-safe
    # even in cast-DIRTY scenarios — the reference sweeps cast-errored
    # rows out of its working set at the row step, so the '' vs NULL key
    # representation divergence (the cast_clean guard above) can never
    # reach the dedup.  Rows that error DURING the sweeping row step keep
    # their cast values in both engines.  EXCEPT @WARN check reverts:
    # those rows never error, are never swept, and carry raw '' keys
    # into the dedup (seed 232) — excluded below.
    if (
        has_emp and not cast_clean and rng.random() < 0.35
        # the extra guard sits AFTER the draw so every other seed's rng
        # stream (and thus scenario) is unchanged
        and not status_warn_revert
    ):
        steps = steps + [
            "touch_row", rng.choice(["dedup_by_id", "check_unique_id"])
        ]
    # round-11 axis: a context_step mutates a variable mid-phase and a
    # later row step reads it (same amount guard as the other
    # amount-reading steps: a warn-reverted row would re-expose the
    # raw-string representation divergence)
    if amount_declared and not failable_status and rng.random() < 0.3:
        steps = ["stamp_cap"] + steps + ["tag_over_cap"]

    phases = [{"name": "P1", "columns": columns, "steps": steps}]
    # Renumber phases are sampled only when (a) no column axis can put a
    # row into the comparator's ERROR/cast-WARN exemption set — the
    # exemption is keyed by EVENT row number, which stops matching the
    # checkpoint after a renumber rewrites row identity (seed 81) — and
    # (b) no dedup precedes the renumber: the reference's post-dedup
    # list order is dict-insertion (FIRST occurrence of each key), an
    # accident a later renumber turns into numbering, while this engine
    # renumbers in prior-row-number order (seeds 40/136; documented as
    # part of the "Checkpoint row order" deliberate divergence in
    # PARITY.md).
    events_possible = (
        (has_emp and not emp_null)
        or blankable_first
        or failable_status
        or any(c["name"] == "code" for c in columns)
    )
    renumber_ok = not events_possible and "dedup_by_id" not in steps
    if two_phase:
        p2_steps = [
            s for s in ["filter_active", "sort_by_first"] if rng.random() < 0.6
        ]
        phases.append(
            {"name": "P2", "steps": p2_steps,
             "renumber": rng.random() < 0.5 and renumber_ok}
        )
        if rng.random() < 0.4:
            # the extra-output "families" idiom: P1 accumulates counts
            # into an ExtraMapping, P2 merges them back per row
            phases[0]["steps"] = steps + ["count_status"]
            phases[0]["extra_outputs"] = ["status_counts"]
            phases[1]["steps"] = ["merge_status_counts"] + p2_steps
            phases[1]["extra_sources"] = ["status_counts"]
        # round-11 axis: THREE phases with the renumber in the MIDDLE —
        # P3's events and row identity must agree after P2 rewrote the
        # numbering (sort only in the final phase, same rule as above)
        if rng.random() < 0.35:
            phases[1]["renumber"] = renumber_ok
            phases[1]["steps"] = [
                s for s in phases[1]["steps"] if s != "sort_by_first"
            ]
            p3_steps = [
                s for s in ["filter_active", "sort_by_first", "touch_row",
                            "batch_drop_retired"]
                if rng.random() < 0.5
            ]
            phases.append({"name": "P3", "steps": p3_steps})
        # round-11 axis (drawn LAST to leave earlier seeds' streams
        # untouched): the families merge through a BATCH step instead of
        # a row step — extra sources reach batch steps as a (key, value)
        # side table here vs the reference's ExtraMapping object
        if (
            len(phases) > 1
            and "merge_status_counts" in phases[1]["steps"]
            and rng.random() < 0.5
        ):
            phases[1]["steps"] = [
                "batch_merge_status_counts" if s == "merge_status_counts" else s
                for s in phases[1]["steps"]
            ]
    # ---- round-12 axes (each drawn AFTER every r11 draw, so earlier
    # rounds' seed streams — and thus their scenarios — are unchanged) --
    if len(phases) >= 3:
        # (a) the FULL families idiom: P1 accumulates an extra output,
        # P3 — not the adjacent P2 — merges it back, exercising
        # extra-output persistence ACROSS an intermediate phase's
        # checkpoint (the single-hop P1->P2 pipe was the only sampled
        # shape before)
        if phases[0].get("extra_outputs") and rng.random() < 0.5:
            mergers = ("merge_status_counts", "batch_merge_status_counts")
            carried = [s for s in phases[1]["steps"] if s in mergers]
            if carried:
                phases[1]["steps"] = [
                    s for s in phases[1]["steps"] if s not in mergers
                ]
                phases[1].pop("extra_sources", None)
                phases[2]["steps"] = [carried[0]] + phases[2]["steps"]
                phases[2]["extra_sources"] = ["status_counts"]
        # (b) a dedup/uniqueness CONSUMER after the mid-pipeline
        # renumber: P2 rewrites row identity, P3's keep-last keeper (or
        # uniqueness events) must key off the REnumbered order in both
        # engines.  Guards: cast-clean (the '' vs NULL key
        # representation rule), and no dedup/uniqueness BEFORE the
        # renumber (post-dedup list order is dict-insertion order in
        # the reference — the seeds-40/136 deliberate divergence).
        # Forces renumber=True on P2 (cast_clean implies no COLUMN
        # events; the step guard below excludes the STEP-raised ones —
        # error/warn steps put rows in the comparator's event-number
        # exemption set, which stops matching after a renumber, the
        # seed-81 rule), because the organic joint draw never sampled
        # this shape in 80 seeds.
        if (
            has_emp
            and cast_clean
            and not any(
                s in ("dedup_by_id", "check_unique_id",
                      "error_negative_amount", "warn_big_amount")
                for s in phases[0]["steps"] + phases[1]["steps"]
            )
            and rng.random() < 0.75
        ):
            phases[1]["renumber"] = True
            phases[1]["steps"] = [
                s for s in phases[1]["steps"] if s != "sort_by_first"
            ]
            phases[2]["steps"] = phases[2]["steps"] + [
                rng.choice(["dedup_by_id", "check_unique_id"])
            ]
    out = {"phases": phases}
    # (c) non-default PHASE error policy.  Guards: cast-clean only, and
    # no step that raises a plain error — under phase-level DROP_ROW the
    # reference records a DROPPED_ROW event for those but NEVER removes
    # the row (only a literal DropRowException removes; the keep-on-
    # continue bug pinned by test_phase_drop_row_retention_divergence_
    # lock), while this engine drops it as documented.  What the axis
    # still exercises: the policy plumbing through both engines, its
    # interaction with DropRowException steps (identical in both), and
    # that an inert non-default policy changes NOTHING else.
    if (
        cast_clean
        and not any(
            s in ("error_negative_amount", "check_unique_id")
            for p in phases
            for s in p["steps"]
        )
        # a REQUIRED ghost column under warn/drop_row crashes the
        # reference with UnboundLocalError (the documented PARITY.md
        # missing-required-header divergence; we raise PhaserError)
        and not any(
            c["name"] == "bonus" and c["kwargs"].get("required", True)
            for c in columns
        )
        and rng.random() < 0.3
    ):
        out["error_policy"] = "ON_ERROR_DROP_ROW"
    return out


def test_cast_error_policy_divergence_lock(spark, tmp_path):
    """PINS the one semantic divergence the randomized generator found
    (PARITY.md "on_error for CAST failures"): the reference's `cast()`
    raises raw exceptions (decimal.InvalidOperation) that bypass the
    column's `use_exception`, so a malformed int under
    `on_error=DROP_ROW` is handled by the PHASE policy (collect → ERROR
    → phase fails) — contradicting the reference's own docs
    (phaser/column.py:44-46: on_error governs "checking, type casting
    or fixing").  This engine follows the docs: the cast failure drops
    the row and the run succeeds.  If either engine changes, this lock
    fails and PARITY.md needs an update."""
    csv_path = str(tmp_path / "input.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["code"])
        w.writerows([["7"], ["x8"], ["9"]])
    scenario = {
        "phases": [
            {
                "name": "Codes",
                "columns": [
                    {"kind": "int", "name": "code",
                     "kwargs": {"null": True, "on_error": "@DROP_ROW"}},
                ],
            }
        ]
    }
    ref_outcome, ref_ckpts, ref_events = _run_one(
        _reference_module(), tmp_path, "ref", csv_path, scenario
    )
    got_outcome, got_ckpts, got_events = _run_one(
        _spark_module(), tmp_path, "spark", csv_path, scenario
    )
    # reference: raw InvalidOperation → phase policy (collect) → ERROR,
    # row kept with the raw value, run fails
    assert ref_outcome == "DataException"
    assert ("ERROR", "cast", "2") in ref_events
    # this engine: documented per-column policy → row dropped, run ok
    assert got_outcome == "ok"
    assert got_events == [("DROPPED_ROW", "cast", "2")]
    (got_rows,) = got_ckpts.values()
    assert [r["code"] for r in got_rows] == [7, 9]


def test_phase_drop_row_retention_divergence_lock(spark, tmp_path):
    """PINS the reference bug the round-12 phase-policy axis found: under
    a PHASE-level ON_ERROR_DROP_ROW, a cast-class failure records a
    DROPPED_ROW event but the row is NEVER REMOVED — the reference's
    row-step loop only removes rows for a literal DropRowException
    (phaser/phase.py:103-104 `if not isinstance(exc, DropRowException):
    new_data.append(row)`), so the policy's documented behavior ("a row
    causing an error will be dropped", phaser/phase.py:175) never
    happens for column cast/check failures.  This engine follows the
    documentation: the row is dropped from the checkpoint.  Both engines
    agree on the outcome (no failure) and the DROPPED_ROW event set."""
    csv_path = str(tmp_path / "input.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["code"])
        w.writerows([["7"], ["x8"], ["9"]])
    scenario = {
        "error_policy": "ON_ERROR_DROP_ROW",
        "phases": [
            {
                "name": "Drops",
                "columns": [
                    # no column on_error: BOTH engines route the cast
                    # failure to the phase policy here (the column-policy
                    # cast divergence needs an explicit on_error)
                    {"kind": "int", "name": "code", "kwargs": {"null": True}},
                ],
            }
        ],
    }
    ref_outcome, ref_ckpts, ref_events = _run_one(
        _reference_module(), tmp_path, "ref", csv_path, scenario
    )
    got_outcome, got_ckpts, got_events = _run_one(
        _spark_module(), tmp_path, "spark", csv_path, scenario
    )
    # identical outcome and event attribution in both engines
    assert ref_outcome == got_outcome == "ok"
    assert ("DROPPED_ROW", "cast", "2") in ref_events
    assert ("DROPPED_ROW", "cast", "2") in got_events
    # the reference KEEPS the "dropped" row (the keep-on-continue bug:
    # its raw value survives to the checkpoint); this engine drops it
    (ref_rows,) = ref_ckpts.values()
    (got_rows,) = got_ckpts.values()
    assert len(ref_rows) == 3
    assert [r["code"] for r in got_rows] == [7, 9]


def test_errored_row_retention_divergence_lock(spark, tmp_path):
    """PINS the second divergence the randomized generator found
    (PARITY.md "errored rows vanish from later-step checkpoints"): once
    a reference row has an error, the next row step's skip-`continue`
    (phaser/phase.py:90-91) silently removes it from row_data — the
    failing checkpoint is missing the very rows its error report names,
    and only when another row step happens to follow the error.  This
    engine keeps quarantined rows in the checkpoint; outcome and events
    still match exactly."""
    csv_path = str(tmp_path / "input.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["first", "last", "code"])
        w.writerows([["ada", "l", "7"], ["grace", "h", "x8"], ["alan", "t", "9"]])
    scenario = {
        "phases": [
            {
                "name": "Codes",
                "columns": [
                    {"kind": "int", "name": "code", "kwargs": {"null": True}},
                ],
                # the row step AFTER the cast error triggers the removal
                "steps": ["derive_full"],
            }
        ]
    }
    ref_outcome, ref_ckpts, ref_events = _run_one(
        _reference_module(), tmp_path, "ref", csv_path, scenario
    )
    got_outcome, got_ckpts, got_events = _run_one(
        _spark_module(), tmp_path, "spark", csv_path, scenario
    )
    assert ref_outcome == got_outcome == "DataException"
    assert ("ERROR", "cast", "2") in ref_events and got_events == ref_events
    (ref_rows,) = ref_ckpts.values()
    (got_rows,) = got_ckpts.values()
    # reference: row 2 GONE from the checkpoint its own report names
    assert [r["__phaser_row_num__"] for r in ref_rows] == [1, 3]
    # this engine: row 2 quarantined but present
    assert [r["__phaser_row_num__"] for r in got_rows] == [1, 2, 3]
    # and the relaxed comparator accepts exactly this shape
    _assert_parity(
        ref_outcome, ref_ckpts, ref_events, got_outcome, got_ckpts, got_events
    )


def test_range_check_null_divergence_lock(spark, tmp_path):
    """PINS the third divergence the randomized generator found
    (PARITY.md "min_value/max_value vs permitted nulls"): the reference's
    range check compares unconditionally, so a null that null=True
    explicitly permits crashes with TypeError — a raw exception that
    lands on the PHASE policy as an ERROR and fails the run.  This
    engine lets the permitted null through and range-checks values."""
    csv_path = str(tmp_path / "input.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        # a second populated column keeps the null-code row from being
        # an all-empty line (which both engines drop at read time)
        w.writerow(["tag", "code"])
        w.writerows([["a", "15"], ["b", ""], ["c", "20"]])
    scenario = {
        "phases": [
            {
                "name": "Range",
                "columns": [
                    {"kind": "int", "name": "code",
                     "kwargs": {"null": True, "min_value": 10}},
                ],
            }
        ]
    }
    ref_outcome, _, ref_events = _run_one(
        _reference_module(), tmp_path, "ref", csv_path, scenario
    )
    got_outcome, got_ckpts, got_events = _run_one(
        _spark_module(), tmp_path, "spark", csv_path, scenario
    )
    assert ref_outcome == "DataException"
    assert ("ERROR", "cast", "2") in ref_events
    assert got_outcome == "ok" and got_events == []
    (got_rows,) = got_ckpts.values()
    assert [r["code"] for r in got_rows] == [15, None, 20]


def test_dedup_order_renumber_divergence_lock(spark, tmp_path):
    """PINS the round-11 list-order divergence (PARITY.md "Checkpoint
    row order"): the reference's drop_duplicate_rows returns
    `list(index.values())` of a dict keyed on the dedup key — FIRST
    occurrence order carrying the LAST occurrence's row (an insertion-
    order accident, builtin_steps.py:44-52) — and a later renumber=True
    phase turns that order into numbering.  This engine renumbers in
    prior-row-number order (deterministic on any cluster).  Values and
    events agree; only the renumbered ORDER differs, exactly as
    documented.  Found by randomized seeds 40/136; the generator now
    excludes the combination (renumber_ok guard)."""
    csv_path = str(tmp_path / "input.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Emp ID", "first", "status"])
        # key 9 first occurs at row 1 and LAST at row 3; key 2 at row 2.
        # reference post-dedup list order: [9 (row 3), 2 (row 2)] ->
        # renumber: 9->1, 2->2.  prior-number order: 2->1, 9->2.
        w.writerows([["9", "ada", "active"], ["2", "grace", "active"],
                     ["9", "alan", "active"]])
    scenario = {
        "phases": [
            {
                "name": "Dedup",
                "columns": [
                    {"kind": "int", "name": "emp_id",
                     "kwargs": {"rename": ["Emp ID"], "null": True}},
                ],
                "steps": ["dedup_by_id"],
            },
            # the batch step (filter) triggers the renumber in both engines
            {"name": "Renum", "steps": ["filter_active"], "renumber": True},
        ]
    }
    ref_outcome, ref_ckpts, ref_events = _run_one(
        _reference_module(), tmp_path, "ref", csv_path, scenario
    )
    got_outcome, got_ckpts, got_events = _run_one(
        _spark_module(), tmp_path, "spark", csv_path, scenario
    )
    assert ref_outcome == got_outcome == "ok"
    assert got_events == ref_events
    ref_renum = {r["emp_id"]: r["__phaser_row_num__"]
                 for r in ref_ckpts["Renum_output.csv"]}
    got_renum = {r["emp_id"]: r["__phaser_row_num__"]
                 for r in got_ckpts["Renum_output.csv"]}
    # the divergence, pinned on both sides: first-occurrence order vs
    # prior-row-number order
    assert ref_renum == {9: 1, 2: 2}, ref_renum
    assert got_renum == {2: 1, 9: 2}, got_renum
    # survivor SETS and first-name values agree (the keep-last rule
    # itself is in full parity)
    ref_first = {r["emp_id"]: r["first"] for r in ref_ckpts["Renum_output.csv"]}
    got_first = {r["emp_id"]: r["first"] for r in got_ckpts["Renum_output.csv"]}
    assert ref_first == got_first == {9: "alan", 2: "grace"}


@pytest.mark.parametrize("seed", range(100))
def test_randomized_pipeline_matches_reference(spark, tmp_path, seed):
    scenario = _gen_scenario(seed)
    if scenario.get("source") == "json":
        csv_path = str(tmp_path / "input.json")
        _write_json(csv_path, seed=seed)
    else:
        csv_path = str(tmp_path / "input.csv")
        _write_csv(csv_path, seed=seed, n=24)
    ref_outcome, ref_ckpts, ref_events = _run_one(
        _reference_module(), tmp_path, "ref", csv_path, scenario
    )
    got_outcome, got_ckpts, got_events = _run_one(
        _spark_module(), tmp_path, "spark", csv_path, scenario
    )
    _assert_parity(
        ref_outcome, ref_ckpts, ref_events, got_outcome, got_ckpts, got_events
    )


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
    _assert_parity(
        ref_outcome, ref_ckpts, ref_events, got_outcome, got_ckpts, got_events
    )


def _assert_parity(ref_outcome, ref_ckpts, ref_events, got_outcome, got_ckpts, got_events):
    assert got_outcome == ref_outcome
    if ref_outcome != "ok" and not ref_events and not ref_ckpts:
        # the reference's early-termination path ("No rows left to
        # process") raises BEFORE flushing the event report or writing a
        # checkpoint — its diagnostics are simply lost, so only the
        # outcome is comparable (this engine fails the same run WITH its
        # report intact)
        return
    assert set(got_ckpts) == set(ref_ckpts)
    # Rows carrying a recorded ERROR event are compared by PRESENCE and
    # row number only: on a cast failure the schemaless reference keeps
    # the unconvertible raw value ('x1') in its checkpoint, while a typed
    # engine cannot represent a string inside an int column and stores
    # NULL — the quarantined payload is engine-representation-specific;
    # the contract is that the row exists, keeps its number, and carries
    # the same event.
    # Exempt from value comparison: rows with an ERROR event (quarantined
    # payload is engine-representation-specific — see PARITY.md), and
    # rows whose CAST stage warned: the reference halts the row's
    # remaining column casts at the first raise, leaving raw strings
    # (e.g. 'x3' in an int column) a typed engine cannot represent.
    # WARNING rows from ordinary steps stay strictly compared.
    error_rows = {
        row
        for (typ, step, row) in ref_events
        if typ == "ERROR" or (typ == "WARNING" and step == "cast")
    }
    for name in ref_ckpts:
        ref_rows, got_rows = ref_ckpts[name], got_ckpts[name]
        ref_by_num = {r["__phaser_row_num__"]: r for r in ref_rows}
        got_by_num = {r["__phaser_row_num__"]: r for r in got_rows}
        # The reference REMOVES an already-errored row from row_data the
        # moment any later row step runs (phaser/phase.py:90-91: the
        # skip-`continue` never re-appends the row), so its failing-phase
        # checkpoint may be missing errored rows this engine quarantines
        # and keeps.  Extra rows on our side must each carry a recorded
        # ERROR event; rows the reference kept must all be present.
        # See PARITY.md "errored rows vanish from later-step checkpoints"
        # and test_errored_row_retention_divergence_lock.
        missing = set(ref_by_num) - set(got_by_num)
        assert not missing, (name, missing)
        for rn in set(got_by_num) - set(ref_by_num):
            assert rn is not None and str(int(rn)) in error_rows, (name, rn)
        for rn, rr in ref_by_num.items():
            gr = got_by_num[rn]
            shared = set(rr) & set(gr)
            assert shared >= {"__phaser_row_num__"}, name
            if rn is not None and str(int(rn)) in error_rows:
                continue
            for k in shared:
                assert gr[k] == rr[k], (name, k, rr, gr)
    assert got_events == ref_events
