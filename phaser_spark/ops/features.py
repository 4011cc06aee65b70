"""Feature-engineering operators: target encoding and quantile binning
(engine additions — the tabular-ML preprocessing steps a pipeline runs
right before training).

Determinism contract (same as ops/quality, ops/profile): every
cross-row moment accumulates as exact decimal, final arithmetic is one
fixed double expression — encodings and boundaries are identical on any
engine or partitioning, so both operators are verifiable by an external
SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import PhaserError


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 0.0,
    out_col: str | None = None,
    leave_one_out: bool = False,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Mean-target encoding of a categorical column:
    ``enc = (sum_cat + smoothing · prior) / (n_cat + smoothing)`` with
    ``prior`` the global target mean — the standard smoothed category
    encoder (small categories shrink toward the prior).

    ``leave_one_out=True`` excludes the ROW'S OWN target from its
    category's statistics — ``(sum − y + smoothing·prior) /
    (n − 1 + smoothing)`` — the leakage-safe form for encoding the
    training split; a singleton category with no smoothing falls back
    to the prior instead of 0/0.

    Scale: one category aggregate (decimal-exact sums, map-side
    combined) + the scalar prior joined back onto the rows; the
    encoding itself is a pure projection.  NULL categories are a real
    category; NULL targets are excluded from the statistics.

    The stats table is broadcast by default, which is right for
    bounded-cardinality categoricals (the common case) but NOT for
    user/item-id-scale columns — the broadcast is bounded only by
    category cardinality and a hundred-million-key table would OOM the
    driver.  Pass ``broadcast_stats=False`` there to drop the hint and
    let AQE pick the join strategy (it still broadcasts small tables at
    runtime, from measured sizes rather than a promise).
    """
    if smoothing < 0:
        raise PhaserError(f"smoothing must be >= 0, got {smoothing}")
    out_col = out_col or f"{cat_col}_enc"
    t = F.col(target_col).cast("double")
    stats = df.groupBy(F.col(cat_col).alias("__te_cat")).agg(
        F.sum(t.cast("decimal(38,8)")).cast("double").alias("__te_sum"),
        F.count(t).alias("__te_n"),
    )
    prior_row = df.agg(
        (
            F.sum(t.cast("decimal(38,8)")).cast("double")
            / F.count(t).cast("double")
        ).alias("__te_prior")
    )
    stats_side = F.broadcast(stats) if broadcast_stats else stats
    joined = df.join(
        stats_side, F.col(cat_col).eqNullSafe(F.col("__te_cat"))
    ).crossJoin(F.broadcast(prior_row))
    # an all-NULL-target category has sum NULL (not 0): without the
    # coalesce its encoding would be NULL instead of shrinking to the
    # prior as the smoothing formula specifies
    s = F.coalesce(F.col("__te_sum"), F.lit(0.0))
    n, prior = F.col("__te_n").cast("double"), F.col("__te_prior")
    if leave_one_out:
        # rows with a NULL target contribute nothing, so their "own"
        # value must not be subtracted either
        own = F.when(t.isNotNull(), t).otherwise(F.lit(0.0))
        cnt = F.when(t.isNotNull(), n - 1).otherwise(n)
        enc = F.when(
            cnt + smoothing > 0,
            (s - own + F.lit(float(smoothing)) * prior) / (cnt + F.lit(float(smoothing))),
        ).otherwise(prior)
    else:
        enc = F.when(
            n + smoothing > 0,
            (s + F.lit(float(smoothing)) * prior) / (n + F.lit(float(smoothing))),
        ).otherwise(prior)
    return joined.withColumn(out_col, enc).drop(
        "__te_cat", "__te_sum", "__te_n", "__te_prior"
    )


def quantile_bin(
    df: DataFrame,
    col: str,
    n_bins: int,
    group_by: list[str] | None = None,
    out_col: str | None = None,
    exact: bool = False,
    accuracy: int = 10000,
    broadcast_bounds: bool = True,
) -> DataFrame:
    """Quantile discretization: assign each value its ``n_bins``-quantile
    bucket (0-based) computed per ``group_by`` group (or globally) —
    equal-population bins, the standard ML binning (vs the equal-WIDTH
    bins of :func:`phaser_spark.ops.profile.histogram`).

    ``bin = Σ_k [v > boundary_k]`` over the n−1 interior percentile
    boundaries (truncated to 6 digits for engine-identical
    comparisons); NULL values get a NULL bin.  The DEFAULT boundaries
    come from ``percentile_approx`` sketches (bounded mergeable state,
    tunable via ``accuracy``) — exact percentile buffers each group's
    full value list in the aggregate, an executor-memory hazard on
    fact-scale columns; pass ``exact=True`` only for known-bounded
    groups or when interpolated-exact boundaries are required (the
    oracle-parity query pins that mode).

    One boundaries aggregate joined back (broadcast by default — pass
    ``broadcast_bounds=False`` for id-scale ``group_by`` cardinality);
    the binning is a pure projection.
    """
    if n_bins < 2:
        raise PhaserError(f"quantile_bin needs n_bins >= 2, got {n_bins}")
    out_col = out_col or f"{col}_bin"
    keys = list(group_by or [])
    v = F.col(col).cast("double")
    fracs = [i / n_bins for i in range(1, n_bins)]
    pct = (
        F.percentile(v, F.array(*[F.lit(f) for f in fracs]))
        if exact
        else F.percentile_approx(
            v, F.array(*[F.lit(f) for f in fracs]), F.lit(int(accuracy))
        )
    )
    from .dedup import trunc_digits

    bounds = F.transform(pct, lambda b: trunc_digits(b, 6)).alias("__qb_bounds")
    if keys:
        btab = df.groupBy(*keys).agg(bounds)
        btab = btab.select(
            *[F.col(k).alias(f"__qb_{k}") for k in keys], "__qb_bounds"
        )
        on = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__qb_{k}"))
            on = c if on is None else on & c
        joined = df.join(
            F.broadcast(btab) if broadcast_bounds else btab, on
        ).drop(*[f"__qb_{k}" for k in keys])
    else:
        joined = df.crossJoin(F.broadcast(df.agg(bounds)))
    binned = F.when(
        v.isNotNull(),
        F.aggregate(
            F.col("__qb_bounds"),
            F.lit(0),
            lambda acc, b: acc + F.when(v > b, 1).otherwise(0),
        ),
    )
    return joined.withColumn(out_col, binned).drop("__qb_bounds")


def collapse_rare(
    df: DataFrame,
    col: str,
    min_count: int,
    other: str = "OTHER",
    out_col: str | None = None,
    broadcast_counts: bool = True,
) -> DataFrame:
    """Collapse long-tail category values occurring fewer than
    ``min_count`` times into a single ``other`` token — the standard
    cardinality-control step before encoding/pivoting (a pivot over a
    million-value column is a million output columns; collapse first).

    NULLs stay NULL (missing ≠ rare).  The output column is STRING
    regardless of the input type — the ``other`` token forces it; pass
    ``out_col`` to keep the original column alongside.  One value-count
    aggregate joined back; the rewrite is a pure projection.  The
    kept-values table is
    broadcast by default — bounded by the number of values at or above
    ``min_count``, fine for genuine categoricals but a driver-memory
    hazard on id-scale columns; pass ``broadcast_counts=False`` there
    to let AQE choose the join strategy from measured sizes.
    """
    if min_count < 1:
        raise PhaserError(f"collapse_rare needs min_count >= 1, got {min_count}")
    out_col = out_col or col
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("__cr_val"))
        .agg(F.count(F.lit(1)).alias("__cr_n"))
        .filter(F.col("__cr_n") >= min_count)
        .select("__cr_val")
    )
    counts_side = F.broadcast(counts) if broadcast_counts else counts
    joined = df.join(counts_side, F.col(col) == F.col("__cr_val"), "left")
    collapsed = F.when(F.col(col).isNull(), F.lit(None).cast("string")).otherwise(
        F.when(F.col("__cr_val").isNotNull(), F.col(col).cast("string")).otherwise(
            F.lit(other)
        )
    )
    return joined.withColumn(out_col, collapsed).drop("__cr_val")


# --- distributed linear classifier (quality-filter training) --------------
#
# A corpus-quality filter is usually a tiny linear model over cheap text
# statistics — the expensive part is that the TRAINING DATA is the 100 TB
# corpus itself.  `linear_classifier_fit` trains one with full-batch
# gradient descent where each iteration is exactly ONE map-side-combined
# aggregate (d+1 decimal sums) over a cached feature frame: per-iteration
# cost is a scan-free re-aggregation of the cache, driver state is the
# d-vector of weights, and nothing row-sized ever reaches the driver.
#
# Engine-exact reproducibility: the link is the RATIONAL sigmoid
# s(z) = 0.5 + z / (2·(1+|z|)) — built from +,·,/,abs only, every one of
# which is IEEE-exact, so an external SQL engine replays training to the
# LAST BIT (a transcendental exp() differs in the final ulp across libms
# and compounds over iterations).  It is a proper link for classification
# (monotone, (0,1), s(0)=.5); it is NOT the logistic function, and the
# fitted weights are not maximum-likelihood logistic weights — for a
# corpus FILTER the ranking behavior is what matters, and determinism
# across engines/partitionings is worth more than the exact link shape.
# Gradient sums accumulate as decimal(38,12) of 12-digit-truncated
# per-row terms, so iteration order and partitioning cannot change them.


def _rational_sigmoid(z):  # IEEE-exact link: 0.5 + z/(2(1+|z|))
    return 0.5 + z / (2.0 * (1.0 + abs(z)))


def linear_classifier_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    n_iters: int = 8,
    digits: int = 12,
) -> list[float]:
    """Fit weights (one per feature — include a literal 1.0 column for a
    bias) by full-batch gradient descent on squared-error-free logistic-
    style updates: ``w += lr · mean((y − s(w·x)) · x)`` with the rational
    sigmoid link (see module comment).  Returns the Python weight list
    (d floats — the ONLY driver state; broadcastable into
    :func:`linear_classifier_score`).

    Rows with any NULL/NaN/±Inf feature or label are excluded from every
    iteration (dropped once, up front).  Labels must be 0/1.

    Scale: the feature projection is computed once and cached; each
    iteration is one aggregate producing d+1 decimals (map-side
    combined), so total cost is ``n_iters`` cheap re-aggregations of a
    cached columnar frame + O(d) driver arithmetic per round — the
    pattern that holds at any corpus size and any executor count.
    """
    if not feature_cols:
        raise PhaserError("linear_classifier_fit needs at least one feature")
    if n_iters < 1 or lr <= 0:
        raise PhaserError(
            f"linear_classifier_fit needs n_iters >= 1 and lr > 0, got "
            f"n_iters={n_iters}, lr={lr}"
        )
    d = len(feature_cols)
    cols = [F.col(c).cast("double").alias(f"x{j}") for j, c in enumerate(feature_cols)]
    y = F.col(label_col).cast("double").alias("y")

    def _finite(c):
        return c.isNotNull() & ~F.isnan(c) & (c > float("-inf")) & (c < float("inf"))

    feats = df.select(*cols, y)
    cond = _finite(F.col("y")) & (F.col("y").isin(0.0, 1.0))
    for j in range(d):
        cond = cond & _finite(F.col(f"x{j}"))
    # lazy checkpoint + count: the count() action materializes the
    # checkpointed rows, so the filter scan runs once, not twice
    # (eager=True paid a materialization job AND a count job)
    feats = feats.filter(cond).localCheckpoint(eager=False)
    n = feats.count()
    if n == 0:
        raise PhaserError(
            "linear_classifier_fit: no rows with finite features and 0/1 labels"
        )
    w = [0.0] * d
    scale = float(10**digits)
    for _ in range(n_iters):
        z = F.lit(0.0)
        for j in range(d):
            z = z + F.lit(w[j]) * F.col(f"x{j}")
        resid = F.col("y") - (F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z))))
        # per-row terms floor-truncated to integers of 10^-digits units,
        # summed as exact decimal INTEGERS: no double→decimal re-rounding
        # anywhere, so the sums are identical on any engine/partitioning
        aggs = [
            F.sum(
                F.floor(resid * F.col(f"x{j}") * F.lit(scale)).cast("decimal(38,0)")
            ).alias(f"g{j}")
            for j in range(d)
        ]
        g = feats.agg(*aggs).first()
        w = [w[j] + lr * (float(g[f"g{j}"]) / scale) / n for j in range(d)]
    return w


def linear_classifier_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    out_col: str = "score",
    digits: int = 9,
) -> DataFrame:
    """Apply fitted weights as a pure projection: ``out_col`` is the
    rational-sigmoid score in (0,1), truncated to ``digits`` so external
    engines reproduce it bit-for-bit.  Zero shuffle, zero Python — the
    100 TB apply path is the scan itself."""
    if len(weights) != len(feature_cols):
        raise PhaserError(
            f"weights ({len(weights)}) and feature_cols ({len(feature_cols)}) "
            "must align"
        )
    z = F.lit(0.0)
    for wj, c in zip(weights, feature_cols):
        z = z + F.lit(float(wj)) * F.col(c).cast("double")
    s = F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))
    truncated = F.floor(s * F.lit(float(10**digits))) / F.lit(float(10**digits))
    return df.withColumn(out_col, truncated)
