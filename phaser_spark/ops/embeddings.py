"""Embedding-column operators: normalization, int8 quantization, and
exact group centroids.

Engine additions (the reference, lisad/phaser, has no vector operators);
part of the LLM-data suite alongside :mod:`phaser_spark.ops.similarity`
(which consumes these columns for ANN / near-dup search).

Scale design notes
------------------
* Everything here is a pure per-row projection over ``array<float>``
  columns — no shuffle, no UDF, whole-stage-codegen higher-order
  functions only — so normalizing or quantizing a 100 TB embedding table
  is a single scan that Catalyst fuses with the surrounding plan.
* ``group_centroids`` is the one aggregation: element-wise sums with
  map-side combine, cardinality = n_groups × dim.  That CROSS-ROW sum
  accumulates as decimal, not double, so the result does not depend on
  partition / shuffle order — a plain double sum over a reshuffled
  100 TB table produces different low bits every run, which breaks both
  reproducible pipelines and the external-oracle check.  (Per-row array
  folds like ``l2_norm`` stay plain double: array order is fixed, so an
  ordered left fold is already deterministic.)
* Determinism contract (matches ops/similarity): float→double casts are
  exact, products/divisions are IEEE-deterministic, ``sqrt`` is
  correctly rounded everywhere, and half-up rounding is spelled
  ``floor(x + 0.5)`` so Spark and any external SQL engine agree
  bit-for-bit.  No ``pow``/``exp``/``log`` (not correctly rounded,
  engine-dependent last ulp) anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import trunc_digits


def _as_double(vec: SparkCol) -> SparkCol:
    return vec.cast("array<double>")


def l2_norm(vec: SparkCol) -> SparkCol:
    """Euclidean norm of an ``array<float|double>`` column.  Plain-double
    ordered left fold: a per-row array fold visits elements in array
    order on every engine, so the sum is deterministic without decimal
    overhead (DuckDB's ``list_reduce`` replays it bit-for-bit) and stays
    on the whole-stage-codegen double path; ``sqrt`` is correctly
    rounded."""
    v = _as_double(vec)
    ssq = F.aggregate(
        F.transform(v, lambda x: x * x),
        F.lit(0.0),
        lambda acc, e: acc + F.coalesce(e, F.lit(0.0)),
    )
    return F.sqrt(ssq)


def l2_normalize(vec: SparkCol) -> SparkCol:
    """Unit-normalize; an all-zero vector stays all-zero (no NaN leak)."""
    v = _as_double(vec)
    n = l2_norm(vec)
    return F.when(n == 0.0, v).otherwise(F.transform(v, lambda x: x / n))


def max_abs(vec: SparkCol) -> SparkCol:
    """max(|xᵢ|) — the int8 quantization scale.  array_max of exact
    negations, no epsilon games."""
    v = _as_double(vec)
    return F.array_max(F.transform(v, lambda x: F.when(x < 0, -x).otherwise(x)))


def quantize_int8(vec: SparkCol) -> SparkCol:
    """Symmetric int8 quantization: ``qᵢ = floor(xᵢ / scale · 127 + 0.5)``
    with ``scale = max|xᵢ|`` — the standard absmax scheme (e.g.
    LLM.int8(), faiss SQ8).  Returns ``struct<scale double,
    q array<int>>``; 4× (fp32) / 8× (fp64) smaller on disk and exactly
    reproducible: half-up rounding via ``floor(+0.5)`` avoids engine
    round() tie-break differences, and a zero vector quantizes to zeros
    with scale 0 rather than dividing by it."""
    v = _as_double(vec)
    scale = max_abs(vec)
    q = F.when(
        scale == 0.0, F.transform(v, lambda x: F.lit(0).cast("int"))
    ).otherwise(
        F.transform(v, lambda x: F.floor(x / scale * 127.0 + 0.5).cast("int"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(quant: SparkCol) -> SparkCol:
    """Inverse of :func:`quantize_int8`: ``xᵢ ≈ qᵢ · scale / 127``."""
    return F.transform(quant["q"], lambda q: q.cast("double") * quant["scale"] / 127.0)


def quantization_error(vec: SparkCol) -> SparkCol:
    """max |x − dequant(quant(x))| — the absmax-int8 reconstruction bound
    (≤ scale/254).  Round-trips through the real quantizer, not a
    closed-form estimate, so regressions in either direction surface."""
    v = _as_double(vec)
    back = dequantize_int8(quantize_int8(vec))
    diff = F.zip_with(v, back, lambda a, b: F.when(a > b, a - b).otherwise(b - a))
    return F.coalesce(F.array_max(diff), F.lit(0.0))


def group_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean vector per group — mean-pooling a corpus into
    per-label / per-cluster centroids (the reduce step of k-means, topic
    summaries, class prototypes).

    Returns ``(group_col, centroid array<double>, n bigint)``.  One
    ``posexplode`` + one ``groupBy(group, dim)`` with map-side combine,
    then a per-group ``array_sort(collect_list(...))`` reassembly whose
    width is the embedding dim — never a corpus-sized collect.  Decimal
    accumulation keeps the mean independent of row order (see module
    notes); the division happens once per (group, dim) after the exact
    sum.
    """
    dims = df.select(
        F.col(group_col).alias("g"),
        F.posexplode(_as_double(F.col(vec_col))).alias("dim", "x"),
    )
    sums = dims.groupBy("g", "dim").agg(
        F.sum(F.col("x").cast("decimal(28,12)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    rebuilt = (
        sums.withColumn("mean", F.col("s").cast("double") / F.col("n"))
        .groupBy("g")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mean"))),
                lambda e: e["mean"],
            ).alias("centroid"),
            F.max("n").alias("n"),
        )
    )
    return rebuilt.select(F.col("g").alias(group_col), "centroid", "n")


def embedding_summary(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """Per-vector quantization scorecard: the norm, the int8 scale, the
    exact integer sum of the quantized vector (a whole-vector checksum
    with no float formatting in it), and the max reconstruction error.

    The checksum column is the load-bearing one for verification: two
    engines that disagree anywhere in the 64-element quantization differ
    in an integer, not in the 15th decimal digit of a float.
    """
    v = F.col(vec_col)
    quant = quantize_int8(v)
    return df.select(
        F.col(id_col),
        trunc_digits(l2_norm(v), digits).alias("norm"),
        trunc_digits(quant["scale"], digits).alias("q_scale"),
        F.aggregate(
            quant["q"], F.lit(0).cast("long"), lambda acc, q: acc + q
        ).alias("q_sum"),
        trunc_digits(quantization_error(v), digits + 3).alias("max_err"),
    )
