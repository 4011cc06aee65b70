"""Relational builtin steps exposing Catalyst to phase pipelines.

The reference has **no** native join/aggregate/window operators — all
relational work happens inside opaque user steps (SURVEY.md §2.3, §2.5).
These factories surface the missing operators as first-class phase steps
so reference-style pipelines get Catalyst's machinery (broadcast joins,
partial aggregation, AQE) declaratively.

Each returns a decorated ``batch_step``; lineage follows the reference's
row-number rules (joins preserve the left side's numbers; aggregations
and pivots destroy row identity → phases using them should set
``renumber=True``, reference ``phaser/phase.py:120-124``).
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import PHASER_ROW_NUM
from ..exceptions import PhaserError
from ..steps import batch_step


def join_step(
    source_name: str,
    on,
    how: str = "left",
    broadcast: bool = True,
    warn_on_miss: bool = False,
):
    """Join against a named extra source (the reference's lookup-enrichment
    pattern, SURVEY.md J1, done as a real join).  ``broadcast=True`` for
    dimension tables — no shuffle of the fact side."""

    @batch_step(extra_sources=[source_name])
    def _join(df: DataFrame, context=None, **kwargs) -> DataFrame:
        other = kwargs[source_name]
        if other is None:
            raise PhaserError(f"extra source '{source_name}' has no data")
        right = F.broadcast(other) if broadcast else other
        out = df.join(right, on=on, how=how)
        if warn_on_miss and context is not None and how in ("left", "left_outer"):
            right_cols = [c for c in other.columns if c not in df.columns]
            if right_cols:
                misses = out.filter(F.col(right_cols[0]).isNull()).count()
                if misses:
                    context.add_warning(
                        f"join_{source_name}", None,
                        f"{misses} rows had no match in '{source_name}'",
                    )
        return out

    _join.__name__ = f"join_{source_name}"
    return _join


def agg_step(group_by: list[str], aggs: list[SparkCol]):
    """groupBy().agg() as a phase step (destroys row identity — pair with
    ``renumber=True``).  Catalyst plans partial + final aggregation."""

    @batch_step
    def _agg(df: DataFrame, context=None) -> DataFrame:
        return df.groupBy(*group_by).agg(*aggs)

    return _agg


def pivot_step(index: list[str], pivot_col: str, value_expr: SparkCol, values: list | None = None):
    """Long→wide pivot (reference merge_by_location pattern, SURVEY.md A1).
    Pass explicit ``values`` at scale to skip the distinct-values job."""

    @batch_step
    def _pivot(df: DataFrame, context=None) -> DataFrame:
        g = df.groupBy(*index)
        p = g.pivot(pivot_col, values) if values else g.pivot(pivot_col)
        return p.agg(value_expr)

    return _pivot


def window_step(new_col: str, expr_fn, partition_by: list | None = None, order_by: list | None = None):
    """Windowed column: running sums, ranks, lags.  ``expr_fn(window_spec)``
    returns the column expression."""

    @batch_step(internal=True)
    def _window(df: DataFrame, context=None) -> DataFrame:
        w = Window.partitionBy(*(partition_by or []))
        if order_by:
            w = w.orderBy(*order_by)
        return df.withColumn(new_col, expr_fn(w))

    return _window


def running_sum_step(col: str, new_col: str | None = None):
    """Ordered cumulative sum by row number (reference sum_so_far,
    SURVEY.md A3).  NOTE: a single global ordered window is a one-task
    bottleneck at scale — prefer a partitioned variant when a natural key
    exists."""
    out = new_col or f"{col}_running"
    return window_step(
        out,
        lambda w: F.sum(F.col(col)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
        order_by=[PHASER_ROW_NUM],
    )


def explode_step(col: str, into: str, delimiter: str = ","):
    """Split a delimited column and explode to one row per value (the
    reference's languages reshape, SURVEY.md A6); destroys row identity."""

    @batch_step
    def _explode(df: DataFrame, context=None) -> DataFrame:
        return df.withColumn(
            into, F.explode(F.transform(F.split(F.col(col), delimiter), F.trim))
        ).drop(col)

    return _explode


def union_step(source_name: str):
    @batch_step(extra_sources=[source_name])
    def _union(df: DataFrame, context=None, **kwargs) -> DataFrame:
        return df.unionByName(kwargs[source_name], allowMissingColumns=True)

    return _union


def distinct_step():
    @batch_step
    def _distinct(df: DataFrame, context=None) -> DataFrame:
        return df.drop(PHASER_ROW_NUM).distinct()

    return _distinct


def limit_step(n: int):
    @batch_step(internal=True)
    def _limit(df: DataFrame, context=None) -> DataFrame:
        return df.limit(n)

    return _limit


def topk_per_group_step(partition_by: list[str], order_by: list, k: int):
    """Top-k rows per group via row_number window — the standard pattern."""

    @batch_step(internal=True)
    def _topk(df: DataFrame, context=None) -> DataFrame:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
        return (
            df.withColumn("__topk_rn__", F.row_number().over(w))
            .filter(F.col("__topk_rn__") <= k)
            .drop("__topk_rn__")
        )

    return _topk


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for each left row, the single most recent right row with
    ``right_ts <= left_ts`` in the same key group (time-series point
    lookup; Spark has no native ASOF JOIN, DuckDB/pandas do).

    Scale design: NOT a range join (quadratic fan-out) and NOT a per-key
    collect.  Both sides are tagged and unioned, then one window per key
    ordered by ``(ts, side, tiebreak)`` carries the latest right payload
    forward with ``last(..., ignorenulls=True)`` — a single shuffle on the
    key, linear in rows, skew handled by AQE like any other window.  Right
    rows at exactly ``left_ts`` DO match (ties sort right-before-left),
    matching DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` semantics.
    ``right_tiebreak`` (a right column, e.g. a unique id) makes the winner
    among equal-``right_ts`` rows deterministic: the greatest value wins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    payload = F.struct(*[F.col(c) for c in right_cols])
    left_rest = [c for c in left.columns if c not in keys]
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts__"),
        F.lit(0).alias("__asof_side__"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).cast("long").alias(
            "__asof_tb__"
        ),
        payload.alias("__asof_payload__"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_rest
        ],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__asof_ts__"),
        F.lit(1).alias("__asof_side__"),
        F.lit(0).cast("long").alias("__asof_tb__"),
        F.lit(None)
        .cast(r.schema["__asof_payload__"].dataType)
        .alias("__asof_payload__"),
        *[F.col(c) for c in left_rest],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__asof_ts__").asc(),
            F.col("__asof_side__").asc(),
            F.col("__asof_tb__").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r.unionByName(l.select(*r.columns)).withColumn(
        "__asof_match__", F.last("__asof_payload__", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__asof_side__") == 1).select(
        *[F.col(k) for k in keys],
        F.col("__asof_ts__").alias(left_ts),
        *[F.col(c) for c in left_rest if c != left_ts],
        *[
            F.col("__asof_match__")[c].alias(
                c if c not in left.columns else f"{c}{suffix}"
            )
            for c in right_cols
        ],
    )


def asof_join_step(
    source_name: str,
    on,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
):
    """As-of join against a named extra source, as a phase step."""

    @batch_step(extra_sources=[source_name])
    def _asof(df: DataFrame, context=None, **kwargs) -> DataFrame:
        other = kwargs[source_name]
        if other is None:
            raise PhaserError(f"extra source '{source_name}' has no data")
        return asof_join(
            df, other, on, left_ts, right_ts, right_cols, right_tiebreak
        )

    _asof.__name__ = f"asof_join_{source_name}"
    return _asof


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: spread each hot key of ``big`` over ``n_salts``
    shuffle partitions by joining on ``(keys..., salt)`` against a
    ``small`` side replicated ``n_salts`` times.

    AQE's skew-join splitting handles most skew at runtime, but it can
    only split what one sort-merge task already received; for a key so hot
    it dominates a whole executor (the Zipf head of a 100 TB web corpus),
    salting removes the hotspot *before* the shuffle.  Use when ``small``
    is too big to broadcast (broadcast is always the first choice — no
    shuffle at all) but small enough that ``n_salts``× replication is
    cheap.

    The salt on the big side is DETERMINISTIC — ``xxhash64`` over
    ``salt_source`` (default: all non-key columns) mod ``n_salts`` — so
    retried/recomputed tasks salt identically (a ``rand()`` salt breaks
    exactly-once semantics under task retry: the recomputed row may land
    in a partition whose join output was already committed).

    Only the join keys of ``small`` are replicated-joined; result columns
    and ``how`` semantics ('inner'/'left') match ``big.join(small, on,
    how)``.
    """
    if how not in ("inner", "left", "left_outer"):
        raise PhaserError(f"salted_join supports inner/left joins, got {how!r}")
    salt_cols = salt_source or [c for c in big.columns if c not in on]
    if not salt_cols or set(salt_cols) == set(on):
        # Degenerate: with only the join keys to hash, every row of a hot
        # key gets the SAME salt — the join still returns correct results
        # but the skew mitigation is a no-op while still paying the
        # n_salts× replication of `small`.  Warn loudly rather than fail
        # (the result is correct); callers should provide a per-row-diverse
        # salt_source or use a plain join.
        import warnings

        warnings.warn(
            "salted_join: salt_source reduces to the join keys, so each hot "
            "key maps to ONE salt and the skew mitigation does nothing "
            "(while still replicating the small side). Provide salt_source "
            "columns with per-row diversity, or use a plain join.",
            stacklevel=2,
        )
        salt_cols = on  # key-only rows still need a stable salt
    SALT = "__phaser_salt__"
    big_salted = big.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )
    small_rep = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_salted.join(small_rep, on=[*on, SALT], how=how).drop(SALT)
