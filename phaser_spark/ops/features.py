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
