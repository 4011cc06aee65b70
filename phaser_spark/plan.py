"""Physical-plan introspection for scale gating (engine addition).

The test suite holds this engine's own queries to committed plan
fingerprints (``tests/plan_budget.json``); this module exposes the same
capability to USERS, so a pipeline owner can gate their CI on the plan
shape that matters at 100 TB — "my nightly query must not gain an
Exchange or fall off the JVM-side path" — instead of discovering it as a
10× wall-clock regression in production.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

from .exceptions import PhaserError


def plan_text(df: DataFrame, mode: str = "simple") -> str:
    """The ``explain`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_summary(df: DataFrame) -> dict:
    """Counts of the plan features that decide scale behavior:

    - ``exchanges``       — shuffles (each is a full network pass)
    - ``scans``           — file-source scans (should match distinct inputs;
      more means lost reuse, fewer may mean a cached splice)
    - ``python_evals``    — row/Arrow Python eval nodes (off the codegen path)
    - ``nested_loops``    — BroadcastNestedLoopJoin (quadratic join shape)
    - ``expands``         — Expand nodes: each REPLICATES every input row
      per projection list.  Inherent to cube/rollup/unpivot semantics;
      ACCIDENTAL when Spark rewrites multiple distinct aggregates (a
      K-distinct aggregation shuffles K+1 corpus copies)
    - ``sort_merge_joins`` / ``broadcast_joins`` / ``hash_aggregates``
    - ``pushed_filters``  — True if any scan carries a pushed predicate
    """
    # one explain pass serves every count: simple mode prints each node
    # once (formatted prints tree + detail, double-counting) and its
    # FileScan line already carries the PushedFilters list
    p = plan_text(df)
    return {
        "exchanges": p.count("Exchange"),
        "scans": len(re.findall(r"Scan (?:parquet|orc|csv|json|text)", p)),
        "python_evals": p.count("EvalPython"),
        "nested_loops": p.count("NestedLoop"),
        "expands": p.count("Expand"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "broadcast_joins": p.count("BroadcastHashJoin"),
        "hash_aggregates": p.count("HashAggregate"),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", p)),
    }


def assert_scalable(
    df: DataFrame,
    max_exchanges: int | None = None,
    max_scans: int | None = None,
    forbid_python: bool = True,
    forbid_nested_loop: bool = True,
    max_expands: int | None = None,
) -> dict:
    """Raise ``PhaserError`` when the plan violates the stated budget;
    returns the ``plan_summary`` otherwise.  Designed for CI: call it on
    the DataFrame right before the action that would execute it."""
    s = plan_summary(df)
    problems = []
    if max_exchanges is not None and s["exchanges"] > max_exchanges:
        problems.append(f"{s['exchanges']} exchanges > budget {max_exchanges}")
    if max_scans is not None and s["scans"] > max_scans:
        problems.append(f"{s['scans']} scans > budget {max_scans}")
    if forbid_python and s["python_evals"]:
        problems.append(f"{s['python_evals']} Python eval node(s) in the plan")
    if forbid_nested_loop and s["nested_loops"]:
        problems.append(
            f"{s['nested_loops']} BroadcastNestedLoopJoin node(s) (quadratic)"
        )
    if max_expands is not None and s["expands"] > max_expands:
        problems.append(
            f"{s['expands']} Expand node(s) > budget {max_expands} — each "
            "replicates every input row per projection (cube/rollup/unpivot "
            "are inherent; multiple DISTINCT aggregates are the accidental "
            "source)"
        )
    if problems:
        raise PhaserError(
            "plan violates scale budget: " + "; ".join(problems) + "\n" + plan_text(df)
        )
    return s


def skew_report(
    df: DataFrame,
    cols: list[str],
    top: int = 10,
    shuffle_partitions: int | None = None,
    hot_factor: float = 4.0,
) -> DataFrame:
    """Measure key skew BEFORE a join/agg shuffles on ``cols``: the top
    keys by row count, each key's share of the table, and a ``hot`` flag
    marking keys whose share exceeds ``hot_factor / shuffle_partitions``
    — i.e. keys that would land one shuffle partition with more than
    ``hot_factor``× its fair share of rows (the straggler-task shape AQE
    skew handling and :func:`phaser_spark.ops.relational.salted_join`
    exist for).

    Cost: one map-side-combined count per distinct key plus a global
    count — a metadata-sized diagnostic, not a corpus copy.  The flagged
    keys are exactly the ``hot`` input you hand to ``salted_join`` (or
    the evidence that plain AQE skew-join suffices)."""
    from pyspark.sql import functions as F

    from .ops.frequency import heavy_hitters

    if shuffle_partitions is None:
        shuffle_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    total = df.count()
    if total == 0:
        raise PhaserError("skew_report: empty input")
    threshold = hot_factor / max(1, shuffle_partitions)
    topk = heavy_hitters(df.select(*cols), cols, k=top)
    return topk.select(
        *cols,
        "n",
        (F.col("n") / F.lit(float(total))).alias("share"),
        (F.col("n") / F.lit(float(total)) > threshold).alias("hot"),
    )
