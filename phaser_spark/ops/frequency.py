"""Frequency analysis: exact heavy hitters and mergeable Count-Min
frequency sketches (engine addition; the reference has no frequency
operators — its pipelines would count into a driver-side dict,
phaser/builtin_steps.py "count unique values" idiom, SURVEY §2.5).

Why this is a first-class 100 TB feature: "what are the hottest
keys/terms/domains" is both a curation primitive (cap over-represented
sources, spot boilerplate) and the input to the skew story — the top-k
list from ``heavy_hitters`` is exactly the hot-key set you hand to
``salted_join``.  The exact form is already scale-correct in Spark:
``groupBy().count()`` is map-side combined (shuffle volume is one partial
count per (partition, key), not the rows), and the global top-k plans as
``TakeOrderedAndProject`` — a per-partition heap of k rows merged on the
driver, never a full sort.  The Count-Min form adds what exact counting
cannot: a **mergeable, constant-size** frequency summary.  Persist one
few-KB blob per day/slice, then answer "estimated count of ANY item over
any slice union" by merging blobs — no rescan, no per-key state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..exceptions import PhaserError


def heavy_hitters(
    df: DataFrame,
    cols: list[str],
    k: int,
    min_count: int = 1,
    count_col: str = "n",
) -> DataFrame:
    """Exact global top-``k`` most frequent values of ``cols`` (composite
    keys allowed), deterministically ordered: count descending, then the
    key columns ascending (ties never reshuffle the result between runs).

    Plan shape at scale: partial-aggregated count (one shuffle over
    distinct keys) into ``TakeOrderedAndProject`` — each task keeps a
    k-row heap and the driver merges heaps, so the ordered result never
    materializes a full sort even at corpus cardinality."""
    if not cols:
        raise PhaserError("heavy_hitters requires at least one column")
    if k <= 0:
        raise PhaserError(f"heavy_hitters requires k >= 1, got {k}")
    counted = df.groupBy(*cols).agg(F.count(F.lit(1)).alias(count_col))
    if min_count > 1:
        counted = counted.filter(F.col(count_col) >= min_count)
    order = [F.col(count_col).desc()] + [F.col(c).asc() for c in cols]
    return counted.orderBy(*order).limit(k)


def heavy_hitters_per_group(
    df: DataFrame,
    group_by: list[str],
    cols: list[str],
    k: int,
    count_col: str = "n",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-group exact top-``k`` values (e.g. top terms per language,
    top domains per source).  One count aggregate then a rank window
    PARTITIONED BY the group — per-group state only, no global sort; the
    window's sort is bounded by each group's distinct-value count, and
    both shuffles hash on the same group key so AQE coalesces them."""
    if not group_by or not cols:
        raise PhaserError("heavy_hitters_per_group requires group and value columns")
    if k <= 0:
        raise PhaserError(f"heavy_hitters_per_group requires k >= 1, got {k}")
    counted = df.groupBy(*(list(group_by) + list(cols))).agg(
        F.count(F.lit(1)).alias(count_col)
    )
    w = Window.partitionBy(*group_by).orderBy(
        F.col(count_col).desc(), *[F.col(c).asc() for c in cols]
    )
    return (
        counted.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def count_min_sketches(
    df: DataFrame,
    group_by: list[str],
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 1,
    sketch_col: str = "cms_sketch",
) -> DataFrame:
    """Build one persistable Count-Min blob per group (binary column,
    width=ceil(2/eps) × depth=ceil(ln(1/(1-confidence))) counters).
    Estimated counts overshoot by at most eps·total with the given
    confidence, never undershoot.  Like the HLL/KLL/theta blobs this is
    built with map-side combine and is **mergeable** — but merging
    requires identical (eps, confidence, seed), so pin them across the
    slices you intend to union (``cms_merge`` checks dimensions)."""
    return df.groupBy(*group_by).agg(
        F.count_min_sketch(
            F.col(col), F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias(sketch_col)
    )


def _jvm_cms(spark: SparkSession, sketch: bytes):
    """Deserialize a Count-Min blob via Spark's public sketch library
    (org.apache.spark.util.sketch.CountMinSketch) — same code that built
    it, so hashing is bit-identical; nothing re-implemented Python-side."""
    return spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch)
    )


def cms_estimate(
    spark: SparkSession, sketch: bytes, items: list
) -> dict:
    """Estimate counts for ``items`` from a stored Count-Min blob —
    a driver-side, metadata-sized lookup (the blob is KBs; the corpus it
    summarizes is never touched).  Items may be ints or strings, matching
    the column type the sketch was built over."""
    cms = _jvm_cms(spark, sketch)
    return {item: int(cms.estimateCount(item)) for item in items}


def cms_merge(spark: SparkSession, sketches: list[bytes]) -> bytes:
    """Merge stored Count-Min blobs (e.g. one per day) into one summary
    for the union of their inputs.  Count-Min merge is exact cell-wise
    addition, so the merged estimates carry the same one-sided guarantee
    as a single whole-corpus sketch — provided every blob was built with
    the same (eps, confidence, seed); dimension mismatches raise."""
    if not sketches:
        raise PhaserError("cms_merge requires at least one sketch")
    acc = _jvm_cms(spark, sketches[0])
    for other in sketches[1:]:
        try:
            acc.mergeInPlace(_jvm_cms(spark, other))
        except Exception as exc:  # incompatible dimensions/seed
            raise PhaserError(
                f"cms_merge: incompatible sketches ({exc})"
            ) from None
    out = spark._jvm.java.io.ByteArrayOutputStream()
    acc.writeTo(out)
    return bytes(out.toByteArray())
