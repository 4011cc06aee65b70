"""Declarative data-quality check suites (engine addition; generalizes
the reference's single-purpose validators — ``check_unique``,
``check_size``, column ``required``/``null_blank`` flags,
phaser/builtin_steps.py and phaser/column.py — into a constraint suite
evaluated in ONE pass).

Why one pass matters at 100 TB: each quality rule naively run as its own
job re-scans the table; a suite of ten rules is ten scans.  Here every
check contributes aggregate expressions to a single ``agg`` over one
scan, the combined row is exploded into one row per check, and all
metric arithmetic is JVM-side Catalyst (no Python on the row path).
Checks with distinct-aggregates (uniqueness) plan through Spark's
standard distinct rewrite; everything else is map-side combined.

Results are a small DataFrame (check, metric, threshold, passed) — cheap
to persist per run, diff across runs, or gate a pipeline on
(``fail_on_violation``).
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import PhaserError


class Check:
    """One quality rule: named aggregate metric + pass predicate.

    ``metric`` is an aggregate Column (evaluated in the shared single
    pass); ``passed`` maps the computed metric Column to a boolean."""

    def __init__(self, name: str, metric: SparkCol, passed, description: str = ""):
        self.name = name
        self.metric = metric
        self.passed = passed
        self.description = description


def _ratio(cond: SparkCol) -> SparkCol:
    """Exact fraction of rows satisfying ``cond`` (0.0 on empty input)."""
    return F.coalesce(F.avg(cond.cast("double")), F.lit(0.0))


def completeness(col: str, min_ratio: float = 1.0) -> Check:
    """Fraction of rows with a non-null ``col`` >= min_ratio."""
    return Check(
        f"completeness({col})",
        _ratio(F.col(col).isNotNull()),
        lambda m: m >= min_ratio,
        f"non-null ratio >= {min_ratio}",
    )


def uniqueness(cols: list[str] | str, min_ratio: float = 1.0) -> Check:
    """distinct(cols)/count >= min_ratio (1.0 = fully unique key).
    Null-bearing keys count as rows but never as distinct matches of
    each other in SQL semantics; countDistinct skips full-null keys."""
    cs = [cols] if isinstance(cols, str) else list(cols)
    label = ",".join(cs)
    return Check(
        f"uniqueness({label})",
        (
            F.countDistinct(*[F.col(c) for c in cs]).cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double")
        ),
        lambda m: m >= min_ratio,
        f"distinct/count >= {min_ratio}",
    )


def in_range(
    col: str, lo, hi, min_ratio: float = 1.0, null_ok: bool = False
) -> Check:
    """Fraction of rows with ``lo <= col <= hi`` >= min_ratio.  With
    ``null_ok`` nulls satisfy the rule; otherwise they violate it."""
    ok = F.col(col).between(F.lit(lo), F.lit(hi))
    ok = (ok | F.col(col).isNull()) if null_ok else (ok & F.col(col).isNotNull())
    return Check(
        f"in_range({col})",
        _ratio(ok),
        lambda m: m >= min_ratio,
        f"in [{lo}, {hi}] ratio >= {min_ratio}",
    )


def matches_pattern(col: str, regex: str, min_ratio: float = 1.0) -> Check:
    """Fraction of rows whose ``col`` fully matches ``regex`` (nulls
    fail) >= min_ratio."""
    return Check(
        f"matches_pattern({col})",
        _ratio(F.coalesce(F.col(col).rlike(regex), F.lit(False))),
        lambda m: m >= min_ratio,
        f"rlike {regex!r} ratio >= {min_ratio}",
    )


def row_count(at_least: int = 0, at_most: int | None = None) -> Check:
    """Total row count within [at_least, at_most]."""
    hi = float("inf") if at_most is None else at_most
    return Check(
        "row_count",
        F.count(F.lit(1)).cast("double"),
        lambda m: (m >= at_least) & (m <= F.lit(float(hi))),
        f"count in [{at_least}, {at_most}]",
    )


def min_of(col: str, at_least) -> Check:
    return Check(
        f"min_of({col})",
        F.min(F.col(col)).cast("double"),
        lambda m: m >= at_least,
        f"min >= {at_least}",
    )


def max_of(col: str, at_most) -> Check:
    return Check(
        f"max_of({col})",
        F.max(F.col(col)).cast("double"),
        lambda m: m <= at_most,
        f"max <= {at_most}",
    )


def satisfies(name: str, cond: SparkCol, min_ratio: float = 1.0) -> Check:
    """Custom row predicate: fraction of rows where ``cond`` holds
    (nulls fail) >= min_ratio."""
    return Check(
        name,
        _ratio(F.coalesce(cond, F.lit(False))),
        lambda m: m >= min_ratio,
        f"predicate ratio >= {min_ratio}",
    )


def run_checks(
    df: DataFrame, checks: list[Check], group_by: list[str] | None = None
) -> DataFrame:
    """Evaluate every check in ONE aggregation pass over one scan and
    return a row per check: (check, metric double, passed boolean).
    Output order is the declaration order made explicit via an index so
    results hash deterministically.

    With ``group_by`` the suite evaluates PER GROUP (one row per
    group × check) in the same single pass — "completeness per day",
    "uniqueness per source" — the partitioned-quality form that catches
    a bad slice a whole-table average would hide."""
    if not checks:
        raise PhaserError("run_checks requires at least one check")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise PhaserError(f"run_checks: duplicate check names in {names}")
    metrics = [
        c.metric.cast("double").alias(f"__m{i}__") for i, c in enumerate(checks)
    ]
    keys = list(group_by or [])
    agg_row = df.groupBy(*keys).agg(*metrics) if keys else df.agg(*metrics)
    entries = [
        F.struct(
            F.lit(i).cast("int").alias("check_order"),
            F.lit(c.name).alias("check"),
            F.col(f"__m{i}__").alias("metric"),
            c.passed(F.col(f"__m{i}__")).alias("passed"),
        )
        for i, c in enumerate(checks)
    ]
    return agg_row.select(
        *keys, F.explode(F.array(*entries)).alias("r")
    ).select(*keys, "r.check_order", "r.check", "r.metric", "r.passed")


_MAX_REPORTED_FAILURES = 100


def _collect_failures(results: DataFrame) -> list:
    """Pull only FAILING check rows to the driver (bounded): with
    ``group_by`` on a high-cardinality key the full results frame is
    groups × checks rows — collecting it all is a driver hazard, and the
    error message only needs the failures.  NULL ``passed`` (e.g.
    ``min_of`` over an empty/all-NULL column) counts as a failure."""
    return (
        results.filter(~F.coalesce(F.col("passed"), F.lit(False)))
        .limit(_MAX_REPORTED_FAILURES + 1)
        .collect()
    )


def _failure_detail(failed: list, group_by: list[str] | None = None) -> str:
    shown = failed[:_MAX_REPORTED_FAILURES]
    detail = "; ".join(
        (
            f"{r.check} (metric={r.metric}"
            + (", group=" + ",".join(str(r[g]) for g in group_by) if group_by else "")
            + ")"
        )
        for r in shown
    )
    if len(failed) > _MAX_REPORTED_FAILURES:
        detail += f"; ... (first {_MAX_REPORTED_FAILURES} shown)"
    return detail


def fail_on_violation(
    df: DataFrame, checks: list[Check], group_by: list[str] | None = None
) -> DataFrame:
    """Run the suite and raise ``PhaserError`` listing the failed checks
    (with metrics; first 100 if more); returns the results frame when
    all pass.  The gate form for pipelines: one scan, then proceed or
    stop.  With ``group_by`` every group must pass (same contract as
    :func:`quality_gate_step`).  Only failing rows ever reach the
    driver."""
    results = run_checks(df, checks, group_by=group_by)
    failed = _collect_failures(results)
    if failed:
        raise PhaserError(
            f"quality checks failed: {_failure_detail(failed, group_by)}"
        )
    return results


def winsorize(
    df: DataFrame,
    cols: list[str] | str,
    lower: float = 0.01,
    upper: float = 0.99,
    group_by: list[str] | None = None,
    exact: bool = False,
    accuracy: int = 10000,
    suffix: str = "",
    broadcast_bounds: bool = True,
) -> DataFrame:
    """Clamp outliers to per-group percentile bounds (winsorization):
    each column in ``cols`` is clipped into its ``[p_lower, p_upper]``
    range, computed per ``group_by`` group (or globally).  The standard
    repair for heavy-tailed quality metrics — a 10^9-token "document"
    or a negative length stops dominating downstream means without
    dropping the row.

    The DEFAULT is ``percentile_approx`` sketch bounds (mergeable
    bounded state, tunable via ``accuracy`` — higher = tighter bounds,
    more state) — the 100 TB setting: exact percentile materializes
    each group's full value buffer inside the aggregate, which is an
    executor-memory hazard on a fact-scale column.  ``exact=True``
    opts into Spark's exact interpolated ``percentile`` — use it only
    when every group's value count is known-bounded (dimension-sized
    groups) or when bit-exact interpolated bounds are required (the
    oracle-parity queries pin this mode).  Bounds are truncated to 6
    digits so any engine (and the DuckDB oracle) computes identical
    clamps.

    One bounds-aggregate (one row per group) joined back onto the data;
    the clamp itself is a pure projection.  The bounds table is
    broadcast by default — right for bounded group counts; for
    id-scale ``group_by`` cardinality pass ``broadcast_bounds=False``
    and AQE picks the join strategy from measured sizes.  With
    ``suffix`` the clamped values land in new ``col+suffix`` columns
    instead of replacing the originals.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    if not cols:
        raise PhaserError("winsorize requires at least one column")
    if not 0.0 <= lower < upper <= 1.0:
        raise PhaserError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    keys = list(group_by or [])

    # Both bounds from ONE percentile aggregate per column (array
    # percentage): Spark's exact Percentile builds a value→count map per
    # aggregate expression, so two scalar calls pay the map twice; the
    # array form reads both positions off the same sorted RLE — element
    # values are identical to the scalar calls' by construction.
    def pct_pair(c: str) -> SparkCol:
        v = F.col(c).cast("double")
        agg = (
            F.percentile(v, F.array(F.lit(lower), F.lit(upper)))
            if exact
            else F.percentile_approx(
                v, F.array(F.lit(lower), F.lit(upper)), F.lit(int(accuracy))
            )
        )
        from .dedup import trunc_digits

        return F.transform(agg, lambda b: trunc_digits(b, 6))

    bounds = [pct_pair(c).alias(f"__b_{c}__") for c in cols]
    unpack = [
        F.col(f"__b_{c}__")[i].alias(f"__{tag}_{c}__")
        for c in cols
        for i, tag in ((0, "lo"), (1, "hi"))
    ]
    if keys:
        btab = df.groupBy(*keys).agg(*bounds)
        btab = btab.select(
            *[F.col(k).alias(f"__wz_{k}__") for k in keys],
            *unpack,
        )
        on = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__wz_{k}__"))
            on = c if on is None else on & c
        out = df.join(F.broadcast(btab) if broadcast_bounds else btab, on)
    else:
        out = df.crossJoin(F.broadcast(df.agg(*bounds).select(*unpack)))
    for c in cols:
        clamped = F.least(
            F.greatest(F.col(c).cast("double"), F.col(f"__lo_{c}__")),
            F.col(f"__hi_{c}__"),
        )
        # greatest/least skip NULLs, so an unguarded clamp would rewrite a
        # NULL value to the group's LOWER BOUND — NULLs must stay NULL
        clamped = F.when(F.col(c).isNotNull(), clamped)
        out = out.withColumn(c + suffix if suffix else c, clamped)
    return out.drop(
        *[f"__wz_{k}__" for k in keys],
        *[f"__lo_{c}__" for c in cols],
        *[f"__hi_{c}__" for c in cols],
    )


def quality_gate_step(checks: list[Check], group_by: list[str] | None = None):
    """Phase-step form of :func:`fail_on_violation`: drop it into a
    ``Phase.steps`` list and the pipeline stops at this step (standard
    error-policy path) when the suite fails on the phase's current
    frame — one scan, rows pass through untouched.  With ``group_by``
    every group must pass."""
    from ..steps import batch_step

    @batch_step(internal=True)
    def quality_gate(df: DataFrame, context=None) -> DataFrame:
        from ..constants import DROP_COL

        # judge only rows still alive in the phase: quarantined/dropped
        # rows are already accounted for by the error policy
        live = df.filter(~F.col(DROP_COL)) if DROP_COL in df.columns else df
        results = run_checks(live, checks, group_by=group_by)
        failed = _collect_failures(results)
        if failed:
            raise PhaserError(
                f"quality checks failed: {_failure_detail(failed, group_by)}"
            )
        return df

    return quality_gate


def standardize(
    df: DataFrame,
    cols: list[str] | str,
    group_by: list[str] | None = None,
    suffix: str = "_z",
    ddof: int = 1,
    broadcast_bounds: bool = True,
) -> DataFrame:
    """Z-score standardization per group: each column in ``cols`` gets a
    ``col+suffix`` column ``(v - mean) / stddev`` computed over its
    ``group_by`` group (or globally) — the feature-normalization step
    before clustering/quantization, and the basis of z-score outlier
    flags.

    Moments accumulate EXACTLY: decimal(38,8) sums of ``v`` and ``v²``,
    with the variance assembled from those two exact sums in one fixed
    double expression — so the scores are identical on any engine or
    partitioning (a plain double ``avg``/``stddev`` differs in low bits
    per shuffle order and breaks external verification).  ``ddof=1`` is
    the sample variance (``stddev_samp``); groups with ``n <= ddof`` or
    zero variance yield NULL scores rather than ±inf.

    One tiny moments aggregate broadcast back onto the data; the score
    itself is a pure projection (same shape as :func:`winsorize`).  For
    id-scale ``group_by`` cardinality pass ``broadcast_bounds=False``
    and AQE picks the join strategy from measured sizes.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    if not cols:
        raise PhaserError("standardize requires at least one column")
    if ddof < 0:
        raise PhaserError(f"ddof must be >= 0, got {ddof}")
    keys = list(group_by or [])

    def moments(c: str) -> list[SparkCol]:
        v = F.col(c).cast("double")
        return [
            F.count(v).alias(f"__sz_n_{c}__"),
            F.sum(v.cast("decimal(38,8)")).cast("double").alias(f"__sz_s_{c}__"),
            F.sum((v * v).cast("decimal(38,8)")).cast("double").alias(f"__sz_q_{c}__"),
        ]

    aggs = [m for c in cols for m in moments(c)]
    if keys:
        mtab = df.groupBy(*keys).agg(*aggs)
        mtab = mtab.select(
            *[F.col(k).alias(f"__sz_{k}__") for k in keys],
            *[f"__sz_{kind}_{c}__" for c in cols for kind in ("n", "s", "q")],
        )
        on = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__sz_{k}__"))
            on = c if on is None else on & c
        out = df.join(F.broadcast(mtab) if broadcast_bounds else mtab, on)
    else:
        out = df.crossJoin(F.broadcast(df.agg(*aggs)))
    drop = [f"__sz_{k}__" for k in keys]
    for c in cols:
        n = F.col(f"__sz_n_{c}__").cast("double")
        s = F.col(f"__sz_s_{c}__")
        q = F.col(f"__sz_q_{c}__")
        var = (q - s * s / n) / (n - F.lit(float(ddof)))
        z = (F.col(c).cast("double") - s / n) / F.sqrt(var)
        out = out.withColumn(
            c + suffix,
            F.when((n > ddof) & (var > 0), z),
        )
        drop += [f"__sz_n_{c}__", f"__sz_s_{c}__", f"__sz_q_{c}__"]
    return out.drop(*drop)


def robust_standardize(
    df: DataFrame,
    cols: list[str] | str,
    group_by: list[str] | None = None,
    suffix: str = "_rz",
    k: float = 1.4826,
    exact: bool = False,
    accuracy: int = 10000,
    flag_threshold: float | None = None,
    flag_suffix: str = "_outlier",
    broadcast_bounds: bool = True,
) -> DataFrame:
    """Median/MAD robust z-score per group: each column in ``cols`` gets
    ``col+suffix`` = ``(v − median) / (k · MAD)`` with
    ``MAD = median(|v − median|)`` computed over its ``group_by`` group
    (or globally).  ``k = 1.4826`` makes the MAD a consistent σ
    estimator under normality, so thresholds transfer from the normal
    z-score (|rz| > 3.5 is the classic Iglewicz–Hoaglin outlier rule,
    exposed via ``flag_threshold`` → boolean ``col+flag_suffix``).

    Why not :func:`standardize`: mean/stddev z-scores let extreme
    outliers inflate the scale and hide themselves (a 10⁹-token
    "document" drags σ up until nothing looks anomalous); median and
    MAD have 50 % breakdown, so the flags survive grossly contaminated
    columns — the robust screen to run BEFORE :func:`winsorize` picks
    its clamp bounds.

    Medians default to ``percentile_approx`` sketches (bounded
    mergeable state, the 100 TB setting — ``exact=True`` buffers each
    group's values in the aggregate, opt-in for bounded groups /
    oracle-parity).  Both medians are truncated to 6 digits
    (engine-reproducible).  Zero / NULL MAD or NULL value ⇒ NULL score.

    Scale: two group aggregates (value median, then deviation median)
    each joined back (broadcast by default; ``broadcast_bounds=False``
    for id-scale group cardinality); the score is a pure projection.
    """
    from .dedup import trunc_digits

    cols = [cols] if isinstance(cols, str) else list(cols)
    if not cols:
        raise PhaserError("robust_standardize requires at least one column")
    if k <= 0:
        raise PhaserError(f"k must be > 0, got {k}")
    keys = list(group_by or [])

    def med_of(c: SparkCol) -> SparkCol:
        agg = (
            F.percentile(c, F.lit(0.5))
            if exact
            else F.percentile_approx(c, F.lit(0.5), F.lit(int(accuracy)))
        )
        return trunc_digits(agg, 6)

    def join_back(frame: DataFrame, tab: DataFrame, tag: str) -> DataFrame:
        side = F.broadcast(tab) if broadcast_bounds else tab
        if not keys:
            return frame.crossJoin(side)
        on = None
        for kcol in keys:
            c = F.col(kcol).eqNullSafe(F.col(f"__{tag}_{kcol}__"))
            on = c if on is None else on & c
        return frame.join(side, on).drop(*[f"__{tag}_{kcol}__" for kcol in keys])

    med_aggs = [
        med_of(F.col(c).cast("double")).alias(f"__rs_med_{c}__") for c in cols
    ]
    # The median table feeds THREE consumers (the deviation aggregate,
    # its join-back, and the final score join) and Spark replans the
    # full-corpus percentile pass behind each broadcast build — measured
    # at sf0.1 the 3-group exact-percentile stage ran 5x per query.  A
    # lazy local checkpoint pins each bounds table (<= n_groups rows) so
    # every percentile aggregate runs exactly once; values unchanged.
    if keys:
        mtab = df.groupBy(*keys).agg(*med_aggs)
        mtab = mtab.select(
            *[F.col(kcol).alias(f"__rm_{kcol}__") for kcol in keys],
            *[f"__rs_med_{c}__" for c in cols],
        ).localCheckpoint(eager=False)
        out = join_back(df, mtab, "rm")
    else:
        out = df.crossJoin(
            F.broadcast(df.agg(*med_aggs).localCheckpoint(eager=False))
        )
    mad_aggs = [
        med_of(F.abs(F.col(c).cast("double") - F.col(f"__rs_med_{c}__"))).alias(
            f"__rs_mad_{c}__"
        )
        for c in cols
    ]
    if keys:
        dtab = out.groupBy(*keys).agg(*mad_aggs)
        dtab = dtab.select(
            *[F.col(kcol).alias(f"__rd_{kcol}__") for kcol in keys],
            *[f"__rs_mad_{c}__" for c in cols],
        ).localCheckpoint(eager=False)
        out = join_back(out, dtab, "rd")
    else:
        out = out.crossJoin(
            F.broadcast(out.agg(*mad_aggs).localCheckpoint(eager=False))
        )
    drop = []
    for c in cols:
        v = F.col(c).cast("double")
        med = F.col(f"__rs_med_{c}__")
        mad = F.col(f"__rs_mad_{c}__")
        rz = (v - med) / (F.lit(float(k)) * mad)
        out = out.withColumn(c + suffix, F.when(mad > 0, rz))
        if flag_threshold is not None:
            out = out.withColumn(
                c + flag_suffix,
                F.when(
                    F.col(c + suffix).isNotNull(),
                    F.abs(F.col(c + suffix)) > F.lit(float(flag_threshold)),
                ),
            )
        drop += [f"__rs_med_{c}__", f"__rs_mad_{c}__"]
    return out.drop(*drop)


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    bins: int | None = None,
    smoothing: float = 0.5,
    digits: int = 6,
    max_categories: int = 100_000,
) -> DataFrame:
    """Population-stability drift between a REFERENCE corpus slice and a
    CURRENT one — the standard monitor for "has my training data shifted
    since the model/filters were tuned" (feature drift, source mix
    changes, upstream schema accidents).

    Buckets ``col`` on both sides — by VALUE when ``bins`` is None
    (categorical columns; NULL is its own ``'__null__'`` bucket), or
    into ``bins`` equal-width cells between the REFERENCE side's min and
    max (out-of-range current values clamp into the end cells, so new
    mass beyond the reference range is visible there; NULL and NaN get
    their own ``'__null__'`` / ``'__nan__'`` buckets and NaN never
    feeds the min/max) — and returns one row per bucket::

        (bucket string, n_ref, n_cur, p_ref, p_cur, psi)

    ``psi`` is the bucket's population-stability-index contribution
    ``(q̂−p̂)·log2(q̂/p̂)`` with Laplace smoothing
    ``p̂=(n+s)/(N+s·K)`` (``s=smoothing``, ``K`` = buckets present in
    either side) so buckets empty on one side contribute a finite,
    smoothing-controlled penalty instead of ±inf.  Sum the column for
    the headline PSI; the classic natural-log PSI is ``sum·ln(2)``
    (log2 keeps the whole expression in the engine-verified function
    set — see ``ops/text.char_entropy``).  Rule of thumb (ln scale):
    <0.1 stable, 0.1–0.25 drifting, >0.25 shifted.

    Scale: one map-side-combined count per side (shuffle on the bucket
    key, cardinality ≤ bins+1 / distinct values), a full-outer join of
    two bucket-sized tables, and one window pass over that joined table
    for the totals.  Nothing corpus-sized moves; the only driver action
    is the two-scalar min/max job in binned mode.  The totals window
    runs the BUCKET table through one task — bounded by ``bins`` in
    binned mode and by the column's distinct-value count in categorical
    mode (a separate one-row aggregate would avoid that single task but
    re-executes the count subtree: two extra corpus scans, strictly
    worse).  Categorical mode therefore FAILS LOUDLY when the bucket
    table exceeds ``max_categories`` (default 100k): an id-like column
    would otherwise silently funnel a corpus-distinct through one task,
    and its per-value PSI is smoothing-dominated noise anyway — use
    binned mode or pre-bucket such columns.  The guard rides the totals
    window itself (zero extra jobs); it fires at execution time, after
    the bucket counts aggregate but before any result row is emitted.
    Shares and psi are truncated to ``digits`` so external engines
    reproduce them.
    """
    from pyspark.sql import Window

    from .dedup import trunc_digits

    if bins is not None and bins < 2:
        raise PhaserError(f"distribution_drift needs bins >= 2, got {bins}")
    if smoothing <= 0:
        raise PhaserError(
            f"distribution_drift needs smoothing > 0 (it is what keeps "
            f"one-sided buckets finite), got {smoothing}"
        )

    if bins is None:
        bucket = F.coalesce(F.col(col).cast("string"), F.lit("__null__"))
        bucket_of = lambda df: df.select(bucket.alias("bucket"))  # noqa: E731
    else:
        # NaN sorts ABOVE every double in Spark: an unguarded max() would
        # return NaN off a single bad value, making span NaN and silently
        # collapsing the whole histogram into bucket 0 (found by NaN
        # probe) — so the range ignores NaN and NaN rows get their own
        # visible bucket instead of clamping into cell 0.  ±Infinity does
        # the same through an infinite span (r9 sweep), so the bounds are
        # FINITE-only; ±Inf data rows clamp into the edge cells like any
        # other out-of-range value
        vd = F.col(col).cast("double")
        finite = F.when(
            ~F.isnan(vd) & (vd > float("-inf")) & (vd < float("inf")), vd
        )
        stats = ref.agg(
            F.min(finite).alias("mn"), F.max(finite).alias("mx")
        ).first()
        mn, mx = stats["mn"], stats["mx"]
        if mn is None:
            raise PhaserError(
                f"distribution_drift: reference side has no finite '{col}'"
            )
        span = (mx - mn) or 1.0
        v = F.col(col).cast("double")
        idx = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((v - F.lit(mn)) / F.lit(span) * F.lit(float(bins))).cast(
                    "long"
                ),
            ),
        )
        bucket = (
            F.when(v.isNull(), F.lit("__null__"))
            .when(F.isnan(v), F.lit("__nan__"))
            .otherwise(idx.cast("string"))
        )
        bucket_of = lambda df: df.select(bucket.alias("bucket"))  # noqa: E731

    refc = bucket_of(ref).groupBy("bucket").agg(F.count(F.lit(1)).alias("n_ref"))
    curc = bucket_of(cur).groupBy("bucket").agg(F.count(F.lit(1)).alias("n_cur"))
    j = (
        refc.join(curc, "bucket", "full")
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    k = F.count(F.lit(1)).over(w).cast("double")
    if bins is None:
        if max_categories < 2:
            raise PhaserError(
                f"distribution_drift needs max_categories >= 2, got "
                f"{max_categories}"
            )
        # categorical cardinality guard inside the window expression: the
        # count is computed anyway, so exceeding the cap raises with zero
        # extra jobs instead of silently single-tasking an id-like column
        k = F.when(
            k > float(max_categories),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"distribution_drift: column '{col}' has more than "
                        f"{max_categories} distinct values ("
                    ),
                    k.cast("long").cast("string"),
                    F.lit(
                        " buckets) — per-value PSI on an id-like column is "
                        "smoothing noise and funnels the bucket table "
                        "through one task; use bins= or pre-bucket, or "
                        "raise max_categories deliberately"
                    ),
                )
            ).cast("double"),
        ).otherwise(k)
    nt_ref = F.sum("n_ref").over(w).cast("double")
    nt_cur = F.sum("n_cur").over(w).cast("double")
    s = F.lit(float(smoothing))
    p = (F.col("n_ref").cast("double") + s) / (nt_ref + s * k)
    q = (F.col("n_cur").cast("double") + s) / (nt_cur + s * k)
    return j.select(
        "bucket",
        "n_ref",
        "n_cur",
        trunc_digits(p, digits).alias("p_ref"),
        trunc_digits(q, digits).alias("p_cur"),
        trunc_digits((q - p) * F.log2(q / p), digits).alias("psi"),
    )


def drift_monitor_step(
    ref: DataFrame,
    col: str,
    bins: int | None = None,
    smoothing: float = 0.5,
    warn_above: float = 0.1,
    fail_above: float | None = 0.25,
    max_categories: int = 100_000,
):
    """Phase-step drift ALARM against a reference snapshot — drop it into
    ``Phase.steps`` and every run (and, under ``run_stream``, every
    micro-batch) of the pipeline checks whether ``col``'s distribution
    still looks like it did when the filters/models were tuned.  Rows
    pass through untouched; the PSI (natural-log scale — the classic
    rule: <0.1 stable, 0.1–0.25 drifting, >0.25 shifted) lands in the
    run report as a WARNING above ``warn_above`` and raises — stopping
    the pipeline/stream — above ``fail_above`` (``None`` disables the
    hard stop).

    Same bucketing/smoothing semantics as :func:`distribution_drift`
    (ref-range equal-width bins or by-value categories; NULL/NaN get
    their own buckets; categorical cardinality capped loudly at
    ``max_categories``).

    Scale — why this is not just ``distribution_drift`` per batch: the
    reference is bucket-counted ONCE at construction into a driver-side
    histogram (bounded: ≤ bins+2 rows binned, ≤ ``max_categories``
    categorical), so each batch costs ONE aggregate over the live rows
    plus pure-Python PSI arithmetic over the tiny joined histogram —
    no reference rescan per micro-batch.  An empty batch is skipped
    (no rows carry no drift signal; smoothing would otherwise report a
    spurious shift toward uniform).
    """
    import math

    from ..steps import batch_step

    if bins is not None and bins < 2:
        raise PhaserError(f"drift_monitor_step needs bins >= 2, got {bins}")
    if smoothing <= 0:
        raise PhaserError(
            f"drift_monitor_step needs smoothing > 0, got {smoothing}"
        )
    if fail_above is not None and fail_above < warn_above:
        raise PhaserError(
            f"drift_monitor_step: fail_above ({fail_above}) must be >= "
            f"warn_above ({warn_above})"
        )

    if bins is None:
        bucket = F.coalesce(F.col(col).cast("string"), F.lit("__null__"))
    else:
        vd = F.col(col).cast("double")
        # bounds must come from FINITE reference values: one ±Infinity in
        # the reference would make span infinite and silently collapse
        # every live row into bin 0 (r9 sweep — the NaN exclusion alone
        # left this open); live ±Inf values still clamp into the edge
        # bins via least/greatest below
        finite = F.when(
            ~F.isnan(vd) & (vd > float("-inf")) & (vd < float("inf")), vd
        )
        stats = ref.agg(F.min(finite).alias("mn"), F.max(finite).alias("mx")).first()
        mn, mx = stats["mn"], stats["mx"]
        if mn is None:
            raise PhaserError(
                f"drift_monitor_step: reference has no finite '{col}'"
            )
        span = (mx - mn) or 1.0
        idx = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((vd - F.lit(mn)) / F.lit(span) * F.lit(float(bins))).cast(
                    "long"
                ),
            ),
        )
        bucket = (
            F.when(vd.isNull(), F.lit("__null__"))
            .when(F.isnan(vd), F.lit("__nan__"))
            .otherwise(idx.cast("string"))
        )

    def _counts(df: DataFrame) -> dict:
        # limit BEFORE collect: the cap must bound the driver transfer
        # itself, not fire after an id-like column already shipped a
        # corpus-distinct to the driver
        rows = (
            df.select(bucket.alias("__b__"))
            .groupBy("__b__")
            .agg(F.count(F.lit(1)).alias("__n__"))
            .limit(max_categories + 1)
            .collect()
        )
        if len(rows) > max_categories:
            raise PhaserError(
                f"drift_monitor_step: column '{col}' has more than "
                f"{max_categories} distinct values — use bins= or "
                "pre-bucket (id-like columns are smoothing noise)"
            )
        return {r["__b__"]: r["__n__"] for r in rows}

    ref_counts = _counts(ref)
    n_ref_total = sum(ref_counts.values())
    s = float(smoothing)

    @batch_step(internal=True)
    def drift_monitor(df: DataFrame, context=None) -> DataFrame:
        from ..constants import DROP_COL

        live = df.filter(~F.col(DROP_COL)) if DROP_COL in df.columns else df
        cur_counts = _counts(live)
        n_cur_total = sum(cur_counts.values())
        if n_cur_total == 0:
            return df
        keys = set(ref_counts) | set(cur_counts)
        k = len(keys)
        psi = 0.0
        for b in keys:
            p = (ref_counts.get(b, 0) + s) / (n_ref_total + s * k)
            q = (cur_counts.get(b, 0) + s) / (n_cur_total + s * k)
            psi += (q - p) * math.log2(q / p)
        psi_ln = psi * math.log(2.0)
        if fail_above is not None and psi_ln > fail_above:
            raise PhaserError(
                f"drift_monitor_step: PSI(ln) = {psi_ln:.4f} on '{col}' "
                f"exceeds fail_above={fail_above} — the {n_cur_total}-row "
                "batch no longer matches the reference distribution"
            )
        if psi_ln > warn_above and context is not None:
            context.add_warning(
                "drift_monitor",
                None,
                f"PSI(ln) = {psi_ln:.4f} on '{col}' exceeds "
                f"warn_above={warn_above} ({n_cur_total} rows vs "
                f"{n_ref_total}-row reference)",
            )
        return df

    return drift_monitor
