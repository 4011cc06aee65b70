"""One-pass column profiler (engine addition; generalizes the reference
CLI's ``describe`` — which prints the pipeline *plan* — to data-level
profiling, and Spark's driver-oriented ``df.summary()`` to a deterministic
DataFrame result).

Every requested column contributes its metric expressions to ONE
aggregation over ONE scan (the :mod:`phaser_spark.ops.quality` design —
ten columns profiled is still one job, not ten), and the combined row is
exploded into long form ``(column, metric, value_num, value_str)``.

Determinism: numeric means use decimal-exact accumulation (sum order
independent — the same rule as the engine's batch statistics), distinct
counts are exact by default, and string min/max stay strings — so the
whole profile is reproducible on any engine and hash-checkable by an
external SQL oracle.  ``approx_distinct=True`` swaps exact distinct
counts for HLL sketches (one pass, mergeable, the 100 TB setting where
an exact distinct per column would shuffle the corpus per column).
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exceptions import PhaserError

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)


def _mean_decimal(c: SparkCol) -> SparkCol:
    """Order-independent exact mean: decimal(38,8) sum, final divide in
    double (identical op order on any engine/partitioning)."""
    s = F.sum(c.cast("decimal(38,8)"))
    return (s.cast("double") / F.count(c).cast("double"))


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns one row per (column, metric), ordered deterministically by
    declaration: ``n_rows``, ``n_nulls``, ``null_ratio``, ``n_distinct``
    for every column; ``min``/``max``/``mean`` for numeric columns
    (values in ``value_num``); ``min``/``max`` for string and temporal
    columns (values in ``value_str`` — temporal rendered ISO via cast,
    doubles never round-trip through strings).  Booleans profile as
    ``n_true`` plus the common metrics.
    """
    cols = columns or [c for c in df.columns if not c.startswith("__phaser")]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise PhaserError(f"profile: columns not in frame: {missing}")
    if not cols:
        raise PhaserError("profile: no columns to profile")
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))

    aggs: list[SparkCol] = [F.count(F.lit(1)).alias("__n__")]
    # (column, metric, agg-slot-name, numeric?) in declaration order
    plan: list[tuple[str, str, str, bool]] = []

    def slot(col: str, metric: str, expr: SparkCol, numeric: bool) -> None:
        name = f"__p_{len(aggs)}__"
        aggs.append(expr.alias(name))
        plan.append((col, metric, name, numeric))

    for c in cols:
        dt = dtypes[c]
        v = F.col(c)
        slot(c, "n_nulls", F.count(F.lit(1)) - F.count(v), True)
        slot(
            c,
            "null_ratio",
            F.coalesce(
                (F.count(F.lit(1)) - F.count(v)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                F.lit(0.0),
            ),
            True,
        )
        distinct = (
            F.approx_count_distinct(v)
            if approx_distinct
            else F.count_distinct(v)
        )
        slot(c, "n_distinct", distinct, True)
        if isinstance(dt, _NUMERIC):
            slot(c, "min", F.min(v).cast("double"), True)
            slot(c, "max", F.max(v).cast("double"), True)
            slot(c, "mean", _mean_decimal(v), True)
        elif isinstance(dt, T.BooleanType):
            slot(c, "n_true", F.sum(v.cast("long")), True)
        elif isinstance(dt, T.StringType):
            slot(c, "min", F.min(v), False)
            slot(c, "max", F.max(v), False)
        elif isinstance(dt, _TEMPORAL):
            slot(c, "min", F.min(v).cast("string"), False)
            slot(c, "max", F.max(v).cast("string"), False)
        # complex types (array/map/struct/binary): common metrics only

    agg_row = df.agg(*aggs)
    by_col: dict[str, list[tuple[str, str, bool]]] = {}
    for c, metric, name, numeric in plan:
        by_col.setdefault(c, []).append((metric, name, numeric))
    entries = []
    for i, c in enumerate(cols):
        entries.append(
            F.struct(
                F.lit(i * 100).alias("ord"),
                F.lit(c).alias("column"),
                F.lit("n_rows").alias("metric"),
                F.col("__n__").cast("double").alias("value_num"),
                F.lit(None).cast("string").alias("value_str"),
            )
        )
        for j, (metric, name, numeric) in enumerate(by_col.get(c, [])):
            entries.append(
                F.struct(
                    F.lit(i * 100 + j + 1).alias("ord"),
                    F.lit(c).alias("column"),
                    F.lit(metric).alias("metric"),
                    (
                        F.col(name).cast("double")
                        if numeric
                        else F.lit(None).cast("double")
                    ).alias("value_num"),
                    (
                        F.col(name).cast("string")
                        if not numeric
                        else F.lit(None).cast("string")
                    ).alias("value_str"),
                )
            )
    return agg_row.select(F.explode(F.array(*entries)).alias("r")).select(
        "r.ord", "r.column", "r.metric", "r.value_num", "r.value_str"
    )
