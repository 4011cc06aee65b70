"""One-pass column profiler (engine addition; generalizes the reference
CLI's ``describe`` — which prints the pipeline *plan* — to data-level
profiling, and Spark's driver-oriented ``df.summary()`` to a deterministic
DataFrame result).

Every requested column contributes its metric expressions to ONE
aggregation over ONE scan (the :mod:`phaser_spark.ops.quality` design —
ten columns profiled is still one job, not ten), and the combined row is
exploded into long form ``(column, metric, value_num, value_str)``.

Determinism: numeric means use decimal-exact accumulation (sum order
independent — the same rule as the engine's batch statistics) and string
min/max stay strings.  Distinct counts DEFAULT to HLL sketches
(``approx_distinct=True``): exact multi-column distincts force Spark's
multiple-distinct rewrite, an ``Expand`` node that multiplies EVERY input
row by the number of distinct aggregates — a K-column profile shuffles
K+1 copies of the corpus, the kind of silent blow-up that looks fine at
test scale and dominates at 100 TB.  ``approx_distinct=False`` opts into
exact counts (bounded inputs / oracle parity — the hash-checked entry
queries pin it, same policy as the quantile operators' ``exact=True``).
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


def _finite(c: SparkCol, bound: float = 1e30) -> SparkCol:
    """NULL-out NaN/±Inf AND values the decimal(38,8) accumulator cannot
    represent: the double→decimal cast silently drops them from a sum
    (or THROWS under ANSI mode) while count() still counts the rows — a
    wrong finite mean instead of NaN.  Metrics here are defined over
    FINITE REPRESENTABLE values (|v| < bound, decimal(38,8) holds 30
    integer digits), with the matching count; callers squaring values
    pass ``bound=1e15`` so the squared term stays representable too."""
    return F.when(~F.isnan(c) & (F.abs(c) < F.lit(bound)), c)


def _mean_decimal(c: SparkCol) -> SparkCol:
    """Order-independent exact mean over FINITE values: decimal(38,8)
    sum, final divide in double (identical op order on any engine /
    partitioning); NaN/Inf rows are excluded from numerator AND
    denominator (see _finite)."""
    fv = _finite(c)
    s = F.sum(fv.cast("decimal(38,8)"))
    return (s.cast("double") / F.count(fv).cast("double"))


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct: bool = True,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns one row per (column, metric), ordered deterministically by
    declaration: ``n_rows``, ``n_nulls``, ``null_ratio``, ``n_distinct``
    for every column; ``min``/``max``/``mean`` for numeric columns
    (values in ``value_num``); ``min``/``max`` for string and temporal
    columns (values in ``value_str`` — temporal rendered ISO via cast,
    doubles never round-trip through strings).  Booleans profile as
    ``n_true`` plus the common metrics.

    With ``group_by`` every metric evaluates PER GROUP in the same
    single pass (one row per group × column × metric, the group columns
    leading) — the per-slice profile that catches a corrupt ingest day
    a whole-table profile averages away.
    """
    keys = list(group_by or [])
    # `columns if columns is not None` — an EXPLICIT empty list must hit
    # the no-columns error below, not silently profile every column (a
    # huge accidental job at scale when a programmatic list comes out
    # empty)
    cols = (
        list(columns)
        if columns is not None
        else [
            c
            for c in df.columns
            if not c.startswith("__phaser") and c not in keys
        ]
    )
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
        elif isinstance(dt, T.TimestampType):
            # pin the rendering to UTC: a plain cast renders the instant
            # in spark.sql.session.timeZone, so the same data profiles to
            # different strings on differently-zoned sessions (engine
            # sessions pin UTC — see session.get_spark — making this the
            # identity there, but profile() must not depend on that)
            utc = lambda e: F.to_utc_timestamp(e, F.current_timezone()).cast("string")  # noqa: E731
            slot(c, "min", utc(F.min(v)), False)
            slot(c, "max", utc(F.max(v)), False)
        elif isinstance(dt, _TEMPORAL):
            slot(c, "min", F.min(v).cast("string"), False)
            slot(c, "max", F.max(v).cast("string"), False)
        # complex types (array/map/struct/binary): common metrics only

    # r12 (guide §2.3): exact multi-column distincts trigger Spark's
    # multiple-distinct rewrite — an Expand that multiplies every input
    # row by (K distinct columns + 1) AND drags every NON-distinct
    # aggregation buffer (decimal means, min/max, null counts) through
    # the multiplied rows.  Splitting the distinct slots into their own
    # aggregation keeps the Expand pass down to bare count-distinct
    # buffers and runs the ~5× wider regular aggregation over the
    # un-multiplied corpus once (measured 4.3 s → 2.3 s on the 5-column
    # exact profile at sf0.1).  Same aggregates, same values — they are
    # simply computed in two passes joined on the (tiny) group row.
    # aggs[0] is __n__; aggs[1:] map 1:1 onto plan entries in order
    d_aggs = [
        a for (_, metric, _, _), a in zip(plan, aggs[1:]) if metric == "n_distinct"
    ]
    if not approx_distinct and d_aggs:
        r_aggs = [aggs[0]] + [
            a
            for (_, metric, _, _), a in zip(plan, aggs[1:])
            if metric != "n_distinct"
        ]
        dist_names = [name for (_, m, name, _) in plan if m == "n_distinct"]
        if keys:
            left = df.groupBy(*keys).agg(*r_aggs)
            right = df.groupBy(*keys).agg(*d_aggs)
            right = right.select(
                *[F.col(k).alias(f"__pd_{k}__") for k in keys], *dist_names
            )
            cond = None
            for k in keys:
                c = F.col(k).eqNullSafe(F.col(f"__pd_{k}__"))
                cond = c if cond is None else cond & c
            agg_row = left.join(right, cond).drop(
                *[f"__pd_{k}__" for k in keys]
            )
        else:
            agg_row = df.agg(*r_aggs).crossJoin(F.broadcast(df.agg(*d_aggs)))
    else:
        agg_row = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
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
    return agg_row.select(
        *keys, F.explode(F.array(*entries)).alias("r")
    ).select(*keys, "r.ord", "r.column", "r.metric", "r.value_num", "r.value_str")


def correlations(
    df: DataFrame, cols: list[str], min_periods: int = 2
) -> DataFrame:
    """Pearson correlation for every pair of ``cols`` in ONE aggregation
    pass: per-column decimal-exact sums of ``v`` and ``v²`` plus one
    ``x·y`` sum per pair, all over one scan — n columns is one job, not
    C(n,2) ``df.corr`` calls.

    Rows with a NULL — or NaN/Inf — in either column of a pair are
    excluded from that pair (pairwise deletion over finite pairs, the
    pandas ``DataFrame.corr`` rule), which
    is why each pair carries its own count/sum slots.  The coefficient
    assembles from the exact sums in one fixed double expression, so
    results are identical on any engine/partitioning; pairs with fewer
    than ``min_periods`` complete rows or zero variance yield NULL.

    Returns ``(col_a, col_b, n long, corr double)`` for a < b in
    declaration order.
    """
    if len(cols) < 2:
        raise PhaserError("correlations needs at least two columns")
    aggs = []
    if len(set(cols)) != len(cols):
        raise PhaserError(
            f"correlations: duplicate column names in {cols} — slot tags "
            "would collide and the aggregation aliases become ambiguous"
        )
    for i, a in enumerate(cols):
        for j, b in enumerate(cols[i + 1 :], start=i + 1):
            # bound=1e15: the x*x / x*y product terms must stay inside
            # decimal(38,8)'s 30 integer digits, or the cast NULLs the
            # product while n/sx/sy still count the row (epoch-nanosecond
            # longs are the canonical trigger)
            x = _finite(F.col(a).cast("double"), bound=1e15)
            y = _finite(F.col(b).cast("double"), bound=1e15)
            # pairwise deletion over FINITE pairs: a NaN/Inf on one side
            # would otherwise be counted in n and the clean column's
            # sums while the decimal cast drops it from the other — a
            # plausible-looking wrong coefficient
            both = x.isNotNull() & y.isNotNull()
            xs = F.when(both, x)
            ys = F.when(both, y)
            tag = f"{i}_{j}"
            aggs += [
                F.count(F.when(both, F.lit(1))).alias(f"__c_n_{tag}__"),
                F.sum(xs.cast("decimal(38,8)")).cast("double").alias(f"__c_sx_{tag}__"),
                F.sum(ys.cast("decimal(38,8)")).cast("double").alias(f"__c_sy_{tag}__"),
                F.sum((xs * xs).cast("decimal(38,8)")).cast("double").alias(f"__c_qx_{tag}__"),
                F.sum((ys * ys).cast("decimal(38,8)")).cast("double").alias(f"__c_qy_{tag}__"),
                F.sum((xs * ys).cast("decimal(38,8)")).cast("double").alias(f"__c_xy_{tag}__"),
            ]
    row = df.agg(*aggs)
    entries = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols[i + 1 :], start=i + 1):
            tag = f"{i}_{j}"
            n = F.col(f"__c_n_{tag}__").cast("double")
            sx, sy = F.col(f"__c_sx_{tag}__"), F.col(f"__c_sy_{tag}__")
            qx, qy = F.col(f"__c_qx_{tag}__"), F.col(f"__c_qy_{tag}__")
            xy = F.col(f"__c_xy_{tag}__")
            cov = xy - sx * sy / n
            vx = qx - sx * sx / n
            vy = qy - sy * sy / n
            corr = F.when(
                (n >= min_periods) & (vx > 0) & (vy > 0),
                cov / F.sqrt(vx * vy),
            )
            entries.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col(f"__c_n_{tag}__").alias("n"),
                    corr.alias("corr"),
                )
            )
    return row.select(F.explode(F.array(*entries)).alias("r")).select(
        "r.col_a", "r.col_b", "r.n", "r.corr"
    )


def histogram(
    df: DataFrame,
    col: str,
    bins: int,
    lo: float,
    hi: float,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Fixed-range histogram in one pass: ``bins`` equal-width buckets
    over ``[lo, hi)`` plus underflow (-1) and overflow (``bins``)
    buckets; NULLs and NaNs are dropped (Spark orders NaN above every
    double, so an unguarded NaN would silently inflate the overflow
    bucket).  Returns ``(bin int, bin_lo double,
    bin_hi double, n long)`` for non-empty buckets.

    One map-side-combinable count keyed on the bin — the fixed range
    keeps it a single pass (a quantile-based adaptive histogram needs a
    range/quantile pass first; use ``percentile_approx`` for that
    shape).  The bin rule ``floor((v - lo) / width)`` is fixed double
    arithmetic, identical on any engine."""
    if bins < 1 or not hi > lo:
        raise PhaserError("histogram needs bins >= 1 and hi > lo")
    width = (float(hi) - float(lo)) / bins
    v = F.col(col).cast("double")
    b = F.floor((v - float(lo)) / F.lit(width)).cast("int")
    b = (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(bins))
        .otherwise(F.least(b, F.lit(bins - 1)))
    )
    keys = list(group_by or [])
    return (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(*keys, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            "bin",
            (F.lit(float(lo)) + F.col("bin") * width).alias("bin_lo"),
            (F.lit(float(lo)) + (F.col("bin") + 1) * width).alias("bin_hi"),
            "n",
        )
    )
