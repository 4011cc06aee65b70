"""Similarity search over embedding columns (engine addition;
BASELINE.json north star).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set against the full corpus; one shuffle for the per-query top-k window.
  The correctness baseline.
* ``lsh_topk`` — the scale path: random-hyperplane signatures bucket the
  corpus; each query probes only its own bucket and neighbors within
  Hamming ≤ ``probe_hamming``, turning O(N·Q) into O(Q · bucket_size).
  Recall < 1 by construction — verified against the brute-force baseline
  in tests.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..lineage import spread_for_compute
from .dedup import _dot, _norm, trunc_digits


def _dot_decimal(a, b):
    """Order-insensitive exact dot product: per-element double products
    (deterministic) accumulated as decimal — bit-identical across engines
    regardless of summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("decimal(28,12)")),
        F.lit(0).cast("decimal(38,12)"),
        # Spark widens decimal addition results; cast back so the merge
        # lambda's type matches the accumulator's
        lambda acc, v: (
            acc + F.coalesce(v, F.lit(0).cast("decimal(28,12)"))
        ).cast("decimal(38,12)"),
    ).cast("double")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Broadcast-joins the query set (must be driver-small) against the
    corpus — no shuffle of the corpus itself; the only shuffle is the
    per-query top-k window over Q·N similarity rows.
    ``exact=True`` accumulates dot products in decimal so results are
    bit-reproducible against an external oracle (slower; benchmarking uses
    the double path).
    Returns (query_id, neighbor_id, cosine, rank)."""
    qid = query_id_col or id_col
    c = spread_for_compute(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(F.col("query_id") != F.col("neighbor_id"))
    dot = _dot_decimal if exact else _dot
    norm = (
        (lambda v: F.sqrt(_dot_decimal(v, v))) if exact else _norm
    )
    cos = dot(F.col("cv"), F.col("qv")) / (norm(F.col("cv")) * norm(F.col("qv")))
    scored = scored.select("query_id", "neighbor_id", trunc_digits(cos, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_signature(vec: SparkCol, planes: int) -> SparkCol:
    """Deterministic random-hyperplane signature (long) of a vector."""
    def plane(seed):
        return F.transform(
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda i: (
                F.pmod(F.xxhash64(i, F.lit(seed)), F.lit(1000)).cast("double") - 499.5
            ),
        )

    sig = F.lit(0).cast("long")
    for p in range(planes):
        bit = (_dot(vec, plane(p + 7)) > 0).cast("long")
        sig = sig + F.shiftleft(bit, p)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    probe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: probe only buckets within Hamming ≤ ``probe_hamming``
    of the query signature.  Same output shape as ``cosine_topk``."""
    c = spread_for_compute(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("c_sig", _plane_signature(F.col("cv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("q_sig", _plane_signature(F.col("qv"), planes))
    joined = c.join(
        F.broadcast(q),
        (F.bit_count(F.col("c_sig").bitwiseXOR(F.col("q_sig"))) <= probe_hamming)
        & (F.col("query_id") != F.col("neighbor_id")),
    )
    cos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    scored = joined.select("query_id", "neighbor_id", trunc_digits(cos, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _sq_dist(vec: SparkCol, centroid: SparkCol) -> SparkCol:
    d = F.zip_with(vec, centroid, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)


def train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> list[list[float]]:
    """Lloyd k-means on a driver-side sample — the IVF coarse quantizer.

    At 100 TB the sample (a few thousand vectors) is the ONLY thing that
    leaves the executors; training is O(sample · k · iters) on the driver
    with numpy, deterministic under ``seed``."""
    import numpy as np

    sample = np.array(
        [
            r["v"]
            for r in corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
            .limit(sample_size)
            .collect()
        ]
    )
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(cents)):
            m = sample[assign == j]
            if len(m):
                cents[j] = m.mean(0)
    return [[float(x) for x in c] for c in cents]


def assign_cells(
    df: DataFrame, centroids: list[list[float]], vec_col: str, out_col: str = "cell"
) -> DataFrame:
    """Nearest-centroid cell id as a pure expression (no Python on the row
    path): distances via zip_with/aggregate, argmin via array_position."""
    vec = F.col(vec_col).cast("array<double>")
    cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
    dists = F.transform(cent_arr, lambda c: _sq_dist(vec, c))
    return df.withColumn(out_col, F.array_position(dists, F.array_min(dists)).cast("int"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus partitioned into
    nearest-centroid cells; each query scores only its ``n_probe`` nearest
    cells.

    Scale path: the candidate join is an equi-join on ``cell`` — the
    corpus shuffles once by cell id (or is pre-bucketed by it), each query
    reads n_probe/n_centroids of the data, and nothing but the centroid
    table (k × dim floats) is broadcast.  Same output shape as
    ``cosine_topk``; recall tuned by ``n_probe``."""
    cents = centroids or train_centroids(corpus, vec_col, n_centroids)
    c = assign_cells(
        spread_for_compute(corpus).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        ),
        cents,
        "cv",
    )
    q = assign_cells(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        ),
        cents,
        "qv",
        out_col="__unused__",
    ).drop("__unused__")
    # n_probe nearest cells per query, exploded to (query, cell) probe rows
    qvec = F.col("qv")
    cent_arr = F.array(*[F.array(*[F.lit(x) for x in c_]) for c_ in cents])
    dists = F.transform(cent_arr, lambda ce: _sq_dist(qvec, ce))
    ranked = F.slice(
        F.array_sort(
            F.zip_with(
                dists,
                F.sequence(F.lit(1), F.lit(len(cents))),
                lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
            )
        ),
        1,
        n_probe,
    )
    probes = q.withColumn(
        "cell", F.explode(F.transform(ranked, lambda s: s["cell"]))
    ).select("query_id", "qv", F.col("cell").cast("int"))
    joined = c.join(F.broadcast(probes), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    scored = joined.select(
        "query_id", "neighbor_id", trunc_digits(cos, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
