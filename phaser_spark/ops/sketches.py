"""Mergeable approximate sketches: HLL distinct counting and quantile
sketches (engine addition; the reference has no approximate aggregates —
its pipelines pay exact distinct/percentile costs per run, SURVEY §2.5).

Why sketches are a first-class 100 TB feature: an exact
``count(distinct)`` over a high-cardinality key shuffles every distinct
value; an exact percentile sort-aggregates whole groups.  A sketch is a
few KB per group, built with map-side combine (linear scan, tiny
shuffle), and — critically — **mergeable**: pre-aggregate one sketch per
day/partition/source, persist those few-KB blobs, then answer "distinct
users over any date range" by merging the stored sketches instead of
rescanning 100 TB.  That turns a full-corpus rescan into a metadata-sized
aggregation.

Built on Spark's native implementations (JVM codegen, zero Python on the
row path): ``approx_count_distinct`` (HyperLogLog++),
``hll_sketch_agg``/``hll_union_agg``/``hll_sketch_estimate`` (Apache
DataSketches HLL, binary-portable across engines that speak the
DataSketches format), and ``percentile_approx`` (space-bounded quantile
summaries).
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import PhaserError

DEFAULT_LG_K = 12  # 2^12 registers ≈ 1.6% relative error, ~2.5 KB dense


def approx_distinct(
    df: DataFrame,
    group_by: list[str],
    col: str,
    rsd: float = 0.05,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group approximate distinct count (HyperLogLog++).  One
    map-side-combined aggregate; shuffle volume is one HLL buffer per
    (partition, group), never the distinct values themselves."""
    out = out_col or f"{col}_approx_distinct"
    return df.groupBy(*group_by).agg(
        F.approx_count_distinct(col, rsd=rsd).alias(out)
    )


def hll_sketches(
    df: DataFrame,
    group_by: list[str],
    col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Build one persistable DataSketches-HLL blob per group (binary
    column, ~2.5 KB at lg_k=12).  Store these alongside rollup tables;
    later distinct-count queries over ANY union of groups merge the blobs
    (``hll_merge_estimate``) instead of rescanning the corpus."""
    return df.groupBy(*group_by).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(sketch_col)
    )


def hll_merge_estimate(
    sketches: DataFrame,
    group_by: list[str],
    sketch_col: str = "hll_sketch",
    out_col: str = "distinct_estimate",
) -> DataFrame:
    """Merge stored HLL blobs down to ``group_by`` and estimate the
    distinct count of the union.  Register-max union — order-insensitive
    and lossless w.r.t. the input sketches, so incremental daily sketches
    compose exactly like one full-corpus pass."""
    return sketches.groupBy(*group_by).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias(out_col)
    )


def approx_quantiles(
    df: DataFrame,
    group_by: list[str],
    col: str,
    probabilities: list[float],
    accuracy: int = 10000,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna style summaries,
    error ≤ 1/accuracy of rank).  Space per group is O(accuracy·log n) —
    bounded regardless of group size, unlike the exact ``percentile``
    sort-aggregate."""
    if not probabilities:
        raise PhaserError("approx_quantiles requires at least one probability")
    out = out_col or f"{col}_quantiles"
    return df.groupBy(*group_by).agg(
        F.percentile_approx(
            F.col(col), F.array(*[F.lit(float(p)) for p in probabilities]), accuracy
        ).alias(out)
    )


def kll_quantile_sketches(
    df: DataFrame,
    group_by: list[str],
    col: str,
    k: int = 200,
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Per-group mergeable KLL quantile sketch over a double column
    (~constant size per group, rank error ~1.7%/k·200).  Persist daily
    blobs; any-range quantiles later come from ``kll_merge_quantiles``
    instead of re-sorting the corpus — the quantile analogue of the HLL
    distinct story."""
    return df.groupBy(*group_by).agg(
        F.kll_sketch_agg_double(F.col(col).cast("double"), F.lit(k)).alias(
            sketch_col
        )
    )


def kll_merge_quantiles(
    sketches: DataFrame,
    group_by: list[str],
    probabilities: list[float],
    sketch_col: str = "kll_sketch",
    out_col: str = "quantiles",
) -> DataFrame:
    """Merge stored KLL blobs down to ``group_by`` and evaluate quantiles
    of the union — merge is lossless w.r.t. the sketches' guarantees."""
    if not probabilities:
        raise PhaserError("kll_merge_quantiles requires at least one probability")
    merged = sketches.groupBy(*group_by).agg(
        F.kll_merge_agg_double(F.col(sketch_col)).alias("__merged__")
    )
    return merged.select(
        *group_by,
        F.array(
            *[
                F.kll_sketch_get_quantile_double(
                    F.col("__merged__"), F.lit(float(p))
                )
                for p in probabilities
            ]
        ).alias(out_col),
    )


def theta_sketches(
    df: DataFrame,
    group_by: list[str],
    col: str,
    lg_nom_entries: int = 12,
    sketch_col: str = "theta_sketch",
) -> DataFrame:
    """Per-group DataSketches Theta blob — like HLL it estimates distinct
    counts, but Theta sketches support SET ALGEBRA: union, intersection,
    and difference between sketches (``theta_overlap``).  The 100 TB use:
    persist one blob per corpus slice, then answer "how many users/URLs
    do slices A and B share" without joining the corpora."""
    return df.groupBy(*group_by).agg(
        F.theta_sketch_agg(F.col(col), F.lit(lg_nom_entries)).alias(sketch_col)
    )


def theta_overlap(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None = None,
    left_col: str = "theta_sketch",
    right_col: str = "theta_sketch_r",
) -> DataFrame:
    """Estimate |A|, |B|, |A∩B|, |A∪B|, |A∖B| from two (keyed) theta-sketch
    tables — a broadcast-sized join of blobs, never a join of the
    underlying sets.  With ``on=None`` both inputs must be single-row
    (pre-merged) sketch frames, cross-joined."""
    keys = list(on or [])
    if right_col not in right.columns and left_col in right.columns:
        # natural composition: both sides built with theta_sketches'
        # default sketch_col — disambiguate the right side automatically
        right = right.withColumnRenamed(left_col, right_col)
    j = left.join(right, on=keys) if keys else left.crossJoin(right)
    a, b = F.col(left_col), F.col(right_col)
    return j.select(
        *keys,
        F.round(F.theta_sketch_estimate(a)).cast("long").alias("n_left"),
        F.round(F.theta_sketch_estimate(b)).cast("long").alias("n_right"),
        F.round(F.theta_sketch_estimate(F.theta_intersection(a, b)))
        .cast("long")
        .alias("n_intersection"),
        F.round(F.theta_sketch_estimate(F.theta_union(a, b)))
        .cast("long")
        .alias("n_union"),
        F.round(F.theta_sketch_estimate(F.theta_difference(a, b)))
        .cast("long")
        .alias("n_left_only"),
    )


def theta_merge_estimate(
    sketches: DataFrame,
    group_by: list[str],
    mode: str = "union",
    sketch_col: str = "theta_sketch",
    out_col: str = "distinct_estimate",
) -> DataFrame:
    """Merge MANY stored theta blobs down to ``group_by`` and estimate
    the distinct count of their union or intersection — the n-ary
    companion to pairwise ``theta_overlap`` (e.g. "users present in
    EVERY daily slice this week" is one intersection-merge over seven
    KB-sized blobs)."""
    if mode == "union":
        merged = F.theta_union_agg(F.col(sketch_col))
    elif mode == "intersection":
        merged = F.theta_intersection_agg(F.col(sketch_col))
    else:
        raise PhaserError(
            f"theta_merge_estimate mode must be union/intersection, got {mode!r}"
        )
    return sketches.groupBy(*group_by).agg(
        F.round(F.theta_sketch_estimate(merged)).cast("long").alias(out_col)
    )


def sketch_accuracy_report(
    df: DataFrame,
    group_by: list[str],
    col: str,
    tolerance: float = 0.05,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-group exact distinct count plus booleans asserting every sketch
    estimate lands within ``tolerance`` of it — the self-verifying form
    used by the oracle queries (the booleans are deterministic even
    though the estimates are approximate, so results hash stably).

    The exact and sketch aggregates run as SEPARATE aggregations joined on
    the group key: mixing ``count(distinct)`` with sketch aggregates in
    one ``agg`` makes Catalyst's distinct-rewrite drag the sketch buffers
    through the intermediate ``(group, value)``-grained aggregate — one
    sketch state per DISTINCT VALUE instead of per group (corpus-
    cardinality sketch buffers at 100 TB).  Split, the sketch pass is a
    single map-side-combined aggregate with per-group state, and the
    exact pass plans Spark's standard two-level distinct; both outputs
    are group-cardinality-sized, so the join is trivial (measured 1.6×
    faster even at sf0.1)."""
    sketch = df.groupBy(*group_by).agg(
        F.approx_count_distinct(col, rsd=tolerance / 2).alias("__approx__"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(col), F.lit(lg_k))
        ).alias("__hll__"),
    )
    exact_agg = df.groupBy(*group_by).agg(
        F.countDistinct(F.col(col)).alias("exact_distinct")
    )
    agg = exact_agg.join(sketch, on=list(group_by), how="inner")
    tol = F.lit(float(tolerance))
    within = lambda est: (  # noqa: E731
        F.abs(est - F.col("exact_distinct"))
        <= tol * F.col("exact_distinct")
    )
    return agg.select(
        *group_by,
        "exact_distinct",
        within(F.col("__approx__")).alias("approx_within_tol"),
        within(F.col("__hll__")).alias("hll_within_tol"),
    )
