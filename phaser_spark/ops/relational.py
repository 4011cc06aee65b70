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


def parse_duration_us(text: str, what: str) -> int:
    """'N second|minute|hour|day[s]' → microseconds.  The one shared
    duration grammar for as-of tolerances, rolling windows, and funnel
    conversion windows (three call sites that previously each carried a
    copy and could drift)."""
    import re

    m = re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", text.strip())
    if not m:
        raise PhaserError(
            f"{what}: unsupported duration {text!r} (expected "
            "'N second|minute|hour|day[s]')"
        )
    return int(m.group(1)) * {
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }[m.group(2)]


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
        want_miss_count = (
            warn_on_miss and context is not None and how in ("left", "left_outer")
        )
        if want_miss_count:
            # a dedicated indicator column: counting NULLs in the first
            # right-side data column would miscount rows that DID match
            # but legitimately hold NULL there
            other = other.withColumn("__join_hit__", F.lit(True))
        right = F.broadcast(other) if broadcast else other
        out = df.join(right, on=on, how=how)
        if want_miss_count:
            misses = out.filter(F.col("__join_hit__").isNull()).count()
            out = out.drop("__join_hit__")
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


def running_sum_step(col: str, new_col: str | None = None, bucket_rows: int = 65536):
    """Ordered cumulative sum by row number (reference sum_so_far,
    SURVEY.md A3) — two-level, never a single global ordered window.

    Row numbers are already globally ordered, so rows bucket by
    ``floor(row_num / bucket_rows)`` (a pure projection, no sampling, no
    driver action): ONE map-side-combined aggregate sums each bucket, a
    window over the bounded coarse table (``data_rows / bucket_rows``
    entries — the documented coarse-table window class) yields each
    bucket's exclusive prefix, and the in-bucket running sum runs in a
    window partitioned BY BUCKET: every sort task holds at most
    ``bucket_rows`` rows, never the whole batch.  NULL semantics match
    the single-window formulation exactly (the running value is NULL
    until the first non-null, and null-only buckets forward the prior
    prefix).  For integer/decimal columns the result is bit-identical to
    the sequential sum; double columns may differ from a strictly
    sequential accumulation in the last ulp (bucketed association).
    """
    out = new_col or f"{col}_running"

    @batch_step(internal=True)
    def _running_sum(df: DataFrame, context=None) -> DataFrame:
        bkt = F.floor(
            F.col(PHASER_ROW_NUM) / F.lit(int(bucket_rows))
        ).cast("long")
        tagged = df.withColumn("__rs_bucket__", bkt)
        bsum = tagged.groupBy("__rs_bucket__").agg(
            F.sum(F.col(col)).alias("__rs_bsum__")
        )
        cw = Window.orderBy("__rs_bucket__").rowsBetween(
            Window.unboundedPreceding, -1
        )
        # exclusive prefix per bucket; NULL means "no non-null value in
        # any prior bucket", which must stay NULL (not 0) to reproduce
        # the ordered-sum semantics on leading all-null runs
        coarse = bsum.select(
            F.col("__rs_bucket__").alias("__rs_cb__"),
            F.sum("__rs_bsum__").over(cw).alias("__rs_prefix__"),
        )
        wb = Window.partitionBy("__rs_bucket__").orderBy(PHASER_ROW_NUM)
        in_bucket = F.sum(F.col(col)).over(
            wb.rowsBetween(Window.unboundedPreceding, 0)
        )
        running = (
            F.when(F.col("__rs_prefix__").isNull(), in_bucket)
            .when(in_bucket.isNull(), F.col("__rs_prefix__"))
            .otherwise(F.col("__rs_prefix__") + in_bucket)
        )
        return (
            tagged.join(coarse, F.col("__rs_bucket__") == F.col("__rs_cb__"))
            .withColumn(out, running)
            .drop("__rs_bucket__", "__rs_cb__", "__rs_prefix__")
        )

    return _running_sum


def explode_step(col: str, into: str, delimiter: str = ","):
    """Split a delimited column and explode to one row per value (the
    reference's languages reshape, SURVEY.md A6); destroys row identity.

    ``delimiter`` is a LITERAL string — it is regex-escaped before the
    split, so '|', '.', '+' etc. split on the character itself (Spark's
    ``split`` is regex-based; an unescaped '|' would split on every
    character)."""
    import re

    pattern = re.escape(delimiter)

    @batch_step
    def _explode(df: DataFrame, context=None) -> DataFrame:
        return df.withColumn(
            into, F.explode(F.transform(F.split(F.col(col), pattern), F.trim))
        ).drop(col)

    return _explode


def unpivot_step(
    ids: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
):
    """Wide→long unpivot/melt (the inverse of ``pivot_step``, Spark's
    native ``DataFrame.unpivot`` — a zero-shuffle projection+explode; one
    output row per (row, value column)).  Destroys row identity — pair
    with ``renumber=True``."""

    @batch_step
    def _unpivot(df: DataFrame, context=None) -> DataFrame:
        return df.unpivot(ids, value_cols, var_name, value_name)

    return _unpivot


def intersect_step(source_name: str, all_rows: bool = False):
    """SQL INTERSECT [ALL] against a named extra source (hash aggregate
    on all columns — the standard distributed set op)."""

    @batch_step(extra_sources=[source_name])
    def _intersect(df: DataFrame, context=None, **kwargs) -> DataFrame:
        other = kwargs[source_name]
        d = df.drop(PHASER_ROW_NUM)
        o = other.select(*d.columns)
        return d.intersectAll(o) if all_rows else d.intersect(o)

    _intersect.__name__ = f"intersect_{source_name}"
    return _intersect


def except_step(source_name: str, all_rows: bool = False):
    """SQL EXCEPT [ALL] against a named extra source."""

    @batch_step(extra_sources=[source_name])
    def _except(df: DataFrame, context=None, **kwargs) -> DataFrame:
        other = kwargs[source_name]
        d = df.drop(PHASER_ROW_NUM)
        o = other.select(*d.columns)
        return d.exceptAll(o) if all_rows else d.subtract(o)

    _except.__name__ = f"except_{source_name}"
    return _except


def union_step(source_name: str):
    """UNION ALL with a named extra source.  Destroys row identity: the
    unioned rows arrive WITHOUT lineage numbers (extra sources are saved
    stripped of ``PHASER_ROW_NUM``), so they carry NULL row numbers — or,
    if the source does have them, numbers that collide with the main
    frame's.  Run it in a ``renumber=True`` phase, like the other
    identity-destroying reshape steps."""

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
    """Top-k rows per group via row_number window — the standard pattern.

    Scale contract: the window sorts each group in one task — right for
    high-cardinality entity keys (per-customer, per-query), wrong for a
    low-cardinality skewed key (per-language on a web corpus).  For the
    latter use :func:`phaser_spark.ops.sampling.topk_by_group` — the
    two-level (score-bin histogram → boundary-bin sort) formulation of
    the same rule whose sort tasks hold one bin of one group; fixed
    per-group fractions stay scan-only via ``sample_by_hash``, and
    mass-targeted cuts have ``top_p_by_group``."""

    @batch_step(internal=True)
    def _topk(df: DataFrame, context=None) -> DataFrame:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
        return (
            df.withColumn("__topk_rn__", F.row_number().over(w))
            .filter(F.col("__topk_rn__") <= k)
            .drop("__topk_rn__")
        )

    return _topk


def multilevel_agg(
    df: DataFrame,
    group_cols: list,
    aggs: list[SparkCol],
    kind: str = "rollup",
    sets: list[list[str]] | None = None,
    grouping_id_col: str | None = "grouping_id",
    pre_aggs: list[SparkCol] | None = None,
) -> DataFrame:
    """Multi-level aggregation in ONE pass: ``ROLLUP`` / ``CUBE`` /
    ``GROUPING SETS`` (the hypertable/OLAP rollup family; absent in the
    reference — its pipelines re-aggregate per level with separate steps,
    SURVEY §2.5).

    Scale design: Catalyst plans a single ``Expand`` node (each input row
    is replicated once per grouping set) followed by partial + final hash
    aggregation — one scan and one shuffle for ALL levels, versus one
    scan+shuffle per level when unioning separate groupBys.  The expansion
    factor is len(sets): rollup = k+1, cube = 2^k — prefer ``rollup`` or
    explicit ``sets`` over ``cube`` for k > 3 at 100 TB, since the Expand
    output (not the input) is what shuffles.  Map-side combine still
    applies per grouping set, so the shuffle volume is bounded by group
    cardinality, not row count.

    ``grouping_id_col`` emits Spark's ``grouping_id()`` (bit i set ⇔
    column i is aggregated away, first column = most significant bit —
    the same encoding DuckDB/Postgres ``GROUPING(...)`` uses), so subtotal
    rows are distinguishable from natural NULL group values.

    ``pre_aggs`` opts into the two-phase form for DECOMPOSABLE
    aggregates: the frame is first reduced with ``groupBy(*group_cols)
    .agg(*pre_aggs)`` (map-side-combinable, Expand never sees raw
    rows), then the rollup/cube/sets expansion runs over one row per
    finest-level group and ``aggs`` re-aggregates the partial slots.
    The caller owns the algebra: every entry of ``aggs`` must compute,
    from the ``pre_aggs`` columns, exactly what it would have computed
    from the raw rows (sum→sum of sums, count→sum of counts, min/max→
    min/max of min/maxes; sums kept exact — e.g. decimal — commute
    with regrouping, and any final rounding belongs in ``aggs``).
    Identical results to the one-phase form for such specs — pinned by
    ``test_multilevel_agg_pre_aggs_matches_single_phase``; the Expand
    input shrinks from every raw row to the finest-group row set,
    which is the difference between replicating a fact table 2^k times
    and replicating an aggregate.
    """
    if pre_aggs is not None:
        bad = [c for c in group_cols if not isinstance(c, str)]
        if bad:
            # the rollup/cube below re-evaluates group_cols against the
            # PRE-AGGREGATED frame, where an expression's source columns
            # no longer exist — strings resolve (the pre-agg output
            # carries them), Columns fail with an opaque
            # AnalysisException; fail loudly instead
            raise PhaserError(
                "multilevel_agg: pre_aggs requires string group_cols "
                f"(got {len(bad)} Column expression(s)) — alias the "
                "expression to a column in a prior select, then group "
                "by its name"
            )
        df = df.groupBy(*group_cols).agg(*pre_aggs)
    if kind == "rollup":
        grouped = df.rollup(*group_cols)
    elif kind == "cube":
        grouped = df.cube(*group_cols)
    elif kind == "sets":
        if sets is None:
            raise PhaserError("multilevel_agg(kind='sets') requires sets=[...]")
        grouped = df.groupingSets(
            [[F.col(c) if isinstance(c, str) else c for c in s] for s in sets],
            *group_cols,
        )
    else:
        raise PhaserError(
            f"multilevel_agg kind must be rollup/cube/sets, got {kind!r}"
        )
    agg_cols = list(aggs)
    if grouping_id_col:
        agg_cols = [F.grouping_id().alias(grouping_id_col), *agg_cols]
    out = grouped.agg(*agg_cols)
    # stable column order: group cols, grouping id, aggregates
    names = [c if isinstance(c, str) else df.select(c).columns[0] for c in group_cols]
    rest = [c for c in out.columns if c not in names]
    return out.select(*names, *rest)


def rollup_step(
    group_by: list,
    aggs: list[SparkCol],
    kind: str = "rollup",
    sets: list[list[str]] | None = None,
    grouping_id_col: str | None = "grouping_id",
):
    """Multi-level aggregation as a phase step (destroys row identity —
    pair with ``renumber=True``)."""

    @batch_step
    def _rollup(df: DataFrame, context=None) -> DataFrame:
        return multilevel_agg(df, group_by, aggs, kind, sets, grouping_id_col)

    return _rollup


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: str | None = None,
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

    ``direction="forward"`` matches the NEAREST LATER right row
    (``right_ts >= left_ts``) instead — the same single window traversed
    in descending time.  ``tolerance`` (e.g. ``"30 minutes"``) bounds
    the match distance: a match farther than that in the joined
    direction comes back NULL while the left row is kept (pandas
    ``merge_asof`` semantics); requires timestamp-typed ts columns.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    if direction not in ("backward", "forward"):
        raise PhaserError(f"asof_join: direction must be backward/forward, got {direction!r}")
    tol_us = (
        parse_duration_us(tolerance, "asof_join") if tolerance is not None else None
    )
    payload = F.struct(
        F.col(right_ts).alias("__asof_rts__"), *[F.col(c) for c in right_cols]
    )
    # the tiebreak keeps its ORIGINAL type (numeric order for numbers,
    # lexical for strings/uuids) — a cast('long') would crash on string
    # ids under ANSI mode or NULL them out otherwise, making equal-ts
    # winners nondeterministic.  It only orders among right rows; the
    # left side carries a NULL of the same type.
    tb_type = (
        right.schema[right_tiebreak].dataType if right_tiebreak else None
    )
    left_rest = [c for c in left.columns if c not in keys]
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts__"),
        F.lit(0).alias("__asof_side__"),
        (
            F.col(right_tiebreak)
            if right_tiebreak
            else F.lit(0).cast("long")
        ).alias("__asof_tb__"),
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
        (
            F.lit(None).cast(tb_type) if tb_type is not None else F.lit(0).cast("long")
        ).alias("__asof_tb__"),
        F.lit(None)
        .cast(r.schema["__asof_payload__"].dataType)
        .alias("__asof_payload__"),
        *[F.col(c) for c in left_rest],
    )
    ts_order = (
        F.col("__asof_ts__").asc()
        if direction == "backward"
        else F.col("__asof_ts__").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            ts_order,
            F.col("__asof_side__").asc(),
            F.col("__asof_tb__").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r.unionByName(l.select(*r.columns)).withColumn(
        "__asof_match__", F.last("__asof_payload__", ignorenulls=True).over(w)
    )
    match = F.col("__asof_match__")
    if tol_us is not None:
        dist = (
            F.unix_micros(F.col("__asof_ts__"))
            - F.unix_micros(match["__asof_rts__"])
            if direction == "backward"
            else F.unix_micros(match["__asof_rts__"])
            - F.unix_micros(F.col("__asof_ts__"))
        )
        match = F.when(dist <= tol_us, match)
    return carried.filter(F.col("__asof_side__") == 1).select(
        *[F.col(k) for k in keys],
        F.col("__asof_ts__").alias(left_ts),
        *[F.col(c) for c in left_rest if c != left_ts],
        *[
            match[c].alias(c if c not in left.columns else f"{c}{suffix}")
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


# Hard cap on how many bins one interval may replicate into when the
# bin width is auto-derived: width >= max_span / _MAX_REPLICATION, so a
# single pathological interval (a year in a minutes-scale table) costs
# at most this many copies instead of span/median.
_MAX_REPLICATION = 1024


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bin_width: float | None = None,
    how: str = "inner",
    allow_cartesian: bool = False,
) -> DataFrame:
    """Point-in-interval join: each ``points`` row matches every
    ``intervals`` row with ``start <= point < end`` (half-open, the SQL
    ``p >= s AND p < e`` convention), optionally ANDed with equi-keys
    ``on``.  Spark has no native range join — a naive non-equi join plans
    a BroadcastNestedLoopJoin (quadratic, and impossible when neither
    side fits in memory).

    Scale design (``bin_width`` set): both sides are mapped onto
    fixed-width bins — a point belongs to exactly ONE bin
    (``floor(p/w)``), an interval is exploded to every bin it overlaps
    (``sequence(floor(s/w), floor(e/w))``) — and the join becomes an
    **equi-join on (keys..., bin)** with the range predicate as a
    residual filter.  Each qualifying (point, interval) pair meets in
    exactly one bin (the point's), so no dedup pass is needed.  Cost:
    intervals are replicated ``span/bin_width + 1`` times — pick
    ``bin_width`` near the typical interval span so replication stays
    O(1) while bins stay selective.  The auto-derived width uses the p95
    span with a ``max_span/1024`` floor, so even a single interval many
    orders of magnitude wider than the rest replicates into at most
    ~1024 bins (the cap plus one boundary partial; pass ``bin_width``
    explicitly to trade selectivity against replication yourself).  Skew (a hot bin) is AQE's case, or compose
    with ``salted_join`` on the bin key.

    Timestamp columns are handled by casting to epoch seconds
    (``bin_width`` is then in seconds).  When ``bin_width`` is omitted
    it is DERIVED from the data — one tiny one-row aggregate takes the
    median interval span (clamped to a positive value) and uses it as
    the bin width, so the default plan is always the equi-join form,
    never a nested loop.  NOTE: that derivation runs the one-row
    aggregate EAGERLY at call time (a small Spark job); pass
    ``bin_width`` explicitly when composing purely-lazy plans or when
    the interval side is not yet executable.  ``allow_cartesian=True``
    opts into the naive non-equi join instead (acceptable only when one
    side is broadcast-small and the exact binning cost matters more
    than the extra aggregate).
    """
    if how != "inner":
        raise PhaserError(f"range_join supports inner joins, got {how!r}")
    if bin_width is not None and bin_width <= 0:
        raise PhaserError(f"range_join: bin_width must be > 0, got {bin_width}")
    keys = list(on or [])
    overlap = set(points.columns) & set(intervals.columns) - set(keys)
    if overlap:
        raise PhaserError(
            f"range_join: ambiguous columns {sorted(overlap)}; rename or "
            "select before joining"
        )

    def _as_number(df: DataFrame, name: str) -> SparkCol:
        # temporal columns (timestamp / timestamp_ntz / date) become epoch
        # seconds; NTZ goes through LTZ first (a direct double cast is
        # invalid) — both sides shift identically under any session tz, so
        # comparisons and bin membership are unaffected
        dt = dict(df.dtypes).get(name, "")
        c = F.col(name)
        if dt.startswith("timestamp") or dt == "date":
            c = c.cast("timestamp")
        return c.cast("double")

    p_val = _as_number(points, point_col)
    s_val = _as_number(intervals, start_col)
    e_val = _as_number(intervals, end_col)
    P, S, E = "__phaser_p__", "__phaser_s__", "__phaser_e__"
    cond = (F.col(P) >= F.col(S)) & (F.col(P) < F.col(E))
    p = points.withColumn(P, p_val)
    i = intervals.withColumn(S, s_val).withColumn(E, e_val)
    if bin_width is None:
        if allow_cartesian:
            joined = (
                p.join(i, on=keys, how="inner") if keys else p.crossJoin(i)
            )
            return joined.filter(cond).drop(P, S, E)
        # derive a bin width from the interval-span distribution.  The
        # p95 span (not the median: one interval 1000× the median would
        # replicate across ~1000 bins) keeps replication O(1) for 95% of
        # intervals, and the max-span term hard-caps EVERY interval's
        # replication at _MAX_REPLICATION bins — a single pathological
        # year-long interval in a minutes-scale table costs at most that
        # many copies, never span/median.  One one-row aggregate over
        # the (usually much smaller) interval side — bounded driver
        # traffic by design.
        span = F.col(E) - F.col(S)
        span_row = i.agg(
            F.percentile_approx(span, F.lit(0.95), F.lit(1000)).alias("p95"),
            F.max(span).alias("mx"),
        ).collect()[0]
        p95, mx = span_row["p95"], span_row["mx"]
        # zero-length / empty / degenerate spans: any positive width is
        # correct (each point still meets each interval in one bin)
        bin_width = float(p95) if p95 is not None and p95 > 0 else 1.0
        if mx is not None and mx > 0:
            bin_width = max(bin_width, float(mx) / _MAX_REPLICATION)
    BIN = "__phaser_bin__"
    w = float(bin_width)
    p = p.withColumn(BIN, F.floor(F.col(P) / F.lit(w)).cast("long"))
    i = i.withColumn(
        BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(S) / F.lit(w)).cast("long"),
                F.floor(F.col(E) / F.lit(w)).cast("long"),
            )
        ),
    )
    return p.join(i, on=[*keys, BIN], how="inner").filter(cond).drop(BIN, P, S, E)


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


def rolling_time_agg(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    value_col: str,
    window: str = "7 days",
    prefix: str | None = None,
) -> DataFrame:
    """Trailing time-window statistics per row: for each event, the
    count and decimal-exact sum/mean of ``value_col`` over the
    partition's events in the closed interval ``[ts - window, ts]`` —
    "revenue in the 7 days up to this order", the rolling feature shape
    every behavioral model consumes.

    A RANGE window over ``unix_micros(ts)`` (one shuffle on the
    partition key, frame bounds in event time, per-row state bounded by
    the window's event count).  The sum accumulates decimal(28,8), so
    the result is independent of how the window implementation
    associates additions — double window sums differ in low bits
    between engines (segment trees vs running sums) and would break
    external verification.

    Output columns: ``{prefix}n``, ``{prefix}sum``, ``{prefix}mean``
    (prefix defaults to ``rolling_``).
    """
    span = parse_duration_us(window, "rolling_time_agg")
    p = prefix if prefix is not None else "rolling_"
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-span, 0)
    )
    v = F.col(value_col)
    s = F.sum(v.cast("decimal(28,8)")).over(w)
    n = F.count(v).over(w)
    return (
        df.withColumn(p + "n", n)
        .withColumn(p + "sum", s.cast("double"))
        .withColumn(p + "mean", (s.cast("double") / n))
    )


def fuzzy_match_values(
    left: DataFrame,
    right: DataFrame,
    left_str: str,
    right_str: str,
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """DISTINCT-value edit-distance matching: every pair of distinct
    string values with ``levenshtein <= max_dist``, plus each value's
    row count — ``(left_str, right_str, edit_distance, n_left,
    n_right)``.  The matched ROW-pair count is ``n_left · n_right``
    without ever materializing the pairs.

    This is the core of :func:`fuzzy_join`, split out because duplicate
    strings are the degenerate hot case of ANY similarity join: n
    copies of one value on each side are n² candidate pairs, all with
    the same answer.  Deduplicating to values first collapses that n²
    to 1 (measured 217 s → sub-second on a 20k-row table with 16
    distinct names); blocking and verification then run on value
    cardinality, not row cardinality.

    Sound two-path blocking + exact verify:

    * **q-gram path** — ``max_dist`` edits destroy at most
      ``max_dist·q`` of a string's ``len−q+1`` character q-grams, so a
      pair whose SHORTER value has length ≥ ``q·(max_dist+1)`` still
      shares a gram: explode distinct grams, equi-join on the gram.
    * **length-band path** — pairs below that bound both have length
      < ``q·(max_dist+1)+max_dist`` and equi-join on a banded length
      key; bounded by the short-value population.

    Candidates union, dedup, and verify with exact ``levenshtein``
    (identical unit-cost semantics in Spark and external SQL engines).
    """
    if max_dist < 0 or q < 1:
        raise PhaserError("fuzzy_match_values: need max_dist >= 0 and q >= 1")
    min_long = q * (max_dist + 1)
    short_bound = min_long + max_dist
    lv = left.groupBy(F.col(left_str).alias("__fz_ls")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rv = right.groupBy(F.col(right_str).alias("__fz_rs")).agg(
        F.count(F.lit(1)).alias("n_right")
    )

    def grams(col):
        n = F.length(col)
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - q + 1),
                lambda i: F.substring(col, i, q).alias("g"),
            )
        )

    lg = (
        lv.filter(F.length("__fz_ls") >= min_long)
        .select("__fz_ls", F.explode(grams(F.col("__fz_ls"))).alias("g"))
    )
    rg = (
        rv.filter(F.length("__fz_rs") >= min_long)
        .select("__fz_rs", F.explode(grams(F.col("__fz_rs"))).alias("g"))
    )
    gram_pairs = (
        lg.join(rg, "g")
        .filter(F.abs(F.length("__fz_ls") - F.length("__fz_rs")) <= max_dist)
        .select("__fz_ls", "__fz_rs")
        .distinct()
    )
    lshort = lv.filter(F.length("__fz_ls") < short_bound).select("__fz_ls")
    rshort = (
        rv.filter(F.length("__fz_rs") < short_bound)
        .select("__fz_rs")
        .withColumn(
            "__fz_band",
            F.explode(
                F.sequence(
                    F.length("__fz_rs") - max_dist,
                    F.length("__fz_rs") + max_dist,
                )
            ),
        )
    )
    band_pairs = (
        lshort.join(rshort, F.length("__fz_ls") == F.col("__fz_band"))
        .select("__fz_ls", "__fz_rs")
        .distinct()
    )
    cand = gram_pairs.unionByName(band_pairs).distinct()
    dist = F.levenshtein(F.col("__fz_ls"), F.col("__fz_rs"))
    verified = cand.withColumn("edit_distance", dist).filter(
        F.col("edit_distance") <= max_dist
    )
    # same-named match columns (the normal entity-resolution case —
    # matching two tables on 'name') would collide into an ambiguous
    # duplicate; suffix the right side
    out_right = (
        f"{right_str}_right" if right_str == left_str else right_str
    )
    return (
        verified.join(lv, "__fz_ls")
        .join(rv, "__fz_rs")
        .select(
            F.col("__fz_ls").alias(left_str),
            F.col("__fz_rs").alias(out_right),
            "edit_distance",
            "n_left",
            "n_right",
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """Edit-distance join: every ROW pair with
    ``levenshtein(left_str, right_str) <= max_dist`` — entity
    resolution / near-key matching — without an all-pairs cross join.

    Matching runs on distinct VALUES (:func:`fuzzy_match_values` — see
    its docstring for the blocking theorem and the duplicate-value
    rationale); the id pairs are then two fan-out equi-joins on the
    matched values, whose cost is the OUTPUT size, not a candidate
    blow-up.  Returns ``(left_id, left_str, right_id, right_str,
    edit_distance)``.  When only per-value match counts are needed,
    call ``fuzzy_match_values`` directly and multiply
    ``n_left · n_right``.
    """
    match_right = f"{right_str}_right" if right_str == left_str else right_str
    vals = fuzzy_match_values(
        left, right, left_str, right_str, max_dist=max_dist, q=q
    ).select(
        F.col(left_str).alias("__fz_ls"),
        F.col(match_right).alias("__fz_rs"),
        "edit_distance",
    )
    lf = left.select(F.col(left_id).alias("__fz_lid"), F.col(left_str).alias("__fz_ls"))
    rf = right.select(
        F.col(right_id).alias("__fz_rid"), F.col(right_str).alias("__fz_rs")
    )
    # suffix colliding right-side output names (same-named id/str columns
    # are the normal entity-resolution case; duplicates would be
    # unselectable by name)
    out_rid = f"{right_id}_right" if right_id == left_id else right_id
    return (
        vals.join(lf, "__fz_ls")
        .join(rf, "__fz_rs")
        .select(
            F.col("__fz_lid").alias(left_id),
            F.col("__fz_ls").alias(left_str),
            F.col("__fz_rid").alias(out_rid),
            F.col("__fz_rs").alias(match_right),
            "edit_distance",
        )
    )


def merge_intervals(
    df: DataFrame,
    key_cols: list[str] | str,
    start_col: str,
    end_col: str,
    min_gap=None,
) -> DataFrame:
    """Coalesce overlapping (or touching) intervals per key — the
    gaps-and-islands operation: maintenance windows, user availability,
    coverage spans.  Returns ``key_cols + (start_col, end_col,
    n_merged)`` with one row per merged island.

    An interval starts a new island when its start exceeds the running
    maximum end of everything before it (strictly — touching intervals
    ``[1,5] [5,9]`` merge); with ``min_gap`` (same type as the bounds'
    difference: a number for numerics, not supported for timestamps —
    pre-convert to epoch) intervals closer than that also merge.

    One shuffle on the key + two per-key windows sharing the same sort
    (Catalyst plans one Exchange + one Sort); per-key state is a single
    running max, never the interval list.  Works on any orderable type
    (numerics, dates, timestamps).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    threshold = (
        prev_max_end if min_gap is None else prev_max_end + F.lit(min_gap)
    )
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > threshold), 1
    ).otherwise(0)
    island = F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("__mi_island", island)
        .groupBy(*keys, "__mi_island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__mi_island")
    )
