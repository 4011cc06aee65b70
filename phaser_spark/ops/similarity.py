"""Similarity search over embedding columns (engine addition;
BASELINE.json north star).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set against the full corpus; one shuffle for the per-query top-k window.
  The correctness baseline.
* ``lsh_topk`` — the scale path: random-hyperplane signatures bucket the
  corpus; each query signature expands into its Hamming ball (every mask
  with popcount ≤ ``probe_hamming``, a literal array) and EQUI-joins on
  the probed signature — a hash join on the bucket key, never a nested
  loop over N·Q pairs — turning O(N·Q) into O(Q · ball · bucket_size).
  Recall < 1 by construction — verified against the brute-force baseline
  in tests.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exceptions import PhaserError
from ..lineage import spread_for_compute
from .dedup import _dot, _norm, trunc_digits


def _dot_decimal(a, b):
    """Order-insensitive exact dot product: per-element double products
    (deterministic) accumulated as decimal — bit-identical across engines
    regardless of summation order.  A NULL element (corrupt vector,
    zip_with length-mismatch padding) POISONS the result to NULL, matching
    the default double path — the two modes must return the same pair set,
    not disagree on broken inputs."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("decimal(28,12)")),
        F.lit(0).cast("decimal(38,12)"),
        # Spark widens decimal addition results; cast back so the merge
        # lambda's type matches the accumulator's
        lambda acc, v: (acc + v).cast("decimal(38,12)"),
    ).cast("double")


def _vec_norm(exact: bool, vec: SparkCol) -> SparkCol:
    """One-fold-per-vector norm, hoisted by every top-k variant into its
    corpus/query projections (as ``cn``/``qn``) BEFORE the candidate
    join — folding both arrays per candidate PAIR measured ~2× the whole
    scoring leg.  Same fold order as the inline form, so truncated
    cosines (and SQL oracles) are bit-identical."""
    return F.sqrt(_dot_decimal(vec, vec)) if exact else _norm(vec)


def _cosine(exact: bool) -> SparkCol:
    """6-digit-truncated cosine of the ``cv``/``qv`` columns with their
    hoisted ``cn``/``qn`` norms — the single scoring expression every
    top-k variant shares (a tiebreak or truncation change must hit all
    of them identically, since the tests compare the approximate
    variants against ``cosine_topk``)."""
    dot = _dot_decimal if exact else _dot
    return trunc_digits(
        dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")),
        6,
    )


def _rank_topk(scored: DataFrame, k: int, salt_buckets: int = 0) -> DataFrame:
    """Per-query rank over (cosine desc, neighbor_id asc) and keep k —
    the shared tail of every top-k variant.

    ``salt_buckets > 0`` prepends a partial top-k: rows first rank inside
    (query_id, crc32(neighbor_id) % salt_buckets) — every global top-k
    row is also in its bucket's top-k, so keeping k per bucket is a
    provably lossless prefilter — and the final per-query sort sees at
    most ``salt_buckets × k`` survivors instead of the full candidate
    set.  The brute-force exact baseline needs this (its candidate set
    per query IS the corpus — a single-task corpus-sized sort at 100 TB
    otherwise); the LSH/IVF paths skip it (their candidate sets are
    already bounded by the probed buckets/cells, and a second window
    would be pure overhead)."""
    order = [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    if salt_buckets > 0:
        bucket = F.pmod(
            F.crc32(F.col("neighbor_id").cast("string")),
            F.lit(salt_buckets),
        )
        wb = Window.partitionBy("query_id", "__tb__").orderBy(*order)
        scored = (
            scored.withColumn("__tb__", bucket)
            .withColumn("__brn__", F.row_number().over(wb))
            .filter(F.col("__brn__") <= k)
            .drop("__tb__", "__brn__")
        )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    exact: bool = False,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Broadcast-joins the query set (must be driver-small) against the
    corpus — no shuffle of the corpus itself; the only shuffle is the
    per-query top-k ranking over Q·N similarity rows, which runs through
    a lossless salted prefilter (rank inside (query, crc32-bucket), keep
    k per bucket) so no task ever sorts a corpus-sized candidate list —
    the final per-query sort sees ≤ 64·k rows.
    ``exact=True`` accumulates dot products in decimal so results are
    bit-reproducible against an external oracle (slower; benchmarking uses
    the double path).

    ``exclude_self=True`` (the default) drops pairs whose query id EQUALS
    the neighbor id — correct when queries are drawn from the corpus and
    share its id namespace.  Pass ``False`` when the two id spaces are
    unrelated (an external query set whose qid 5 must not lose corpus
    vec_id 5 as a neighbor).  The comparison is null-safe, so NULL ids
    never silently drop a row's pairs.
    Returns (query_id, neighbor_id, cosine, rank)."""
    qid = query_id_col or id_col
    c = spread_for_compute(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("cn", _vec_norm(exact, F.col("cv")))
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("qn", _vec_norm(exact, F.col("qv")))
    scored = c.crossJoin(F.broadcast(q))
    if exclude_self:
        scored = scored.filter(
            ~F.col("query_id").eqNullSafe(F.col("neighbor_id"))
        )
    scored = scored.select(
        "query_id", "neighbor_id", _cosine(exact).alias("cosine")
    )
    return _rank_topk(scored, k, salt_buckets=64)


def deterministic_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Engine-reproducible pseudo-random hyperplanes.

    Component (p, i) = md5(f"{p}-{i}") first 8 hex digits mod 1000 − 500,
    an integer in [−500, 499] — md5 is available and identical in Spark,
    DuckDB, and Python, so the same planes can be reproduced in an external
    oracle.  Integer components keep float·plane products exact in double
    (24-bit × ≤10-bit mantissas), which makes the signature bits
    bit-reproducible across engines when accumulated in decimal."""
    import hashlib

    return [
        [
            float(int(hashlib.md5(f"{p}-{i}".encode()).hexdigest()[:8], 16) % 1000 - 500)
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


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


def _literal_plane_signature(
    vec: SparkCol, planes_matrix: list[list[float]], exact: bool
) -> SparkCol:
    """Signature from literal plane vectors (no per-row hash evaluation —
    the planes are constants; recomputing them per row, as the seeded-hash
    form does, wastes a hash per (row × plane × dim))."""
    dot = _dot_decimal if exact else _dot
    sig = F.lit(0).cast("long")
    for p, comps in enumerate(planes_matrix):
        plane = F.array(*[F.lit(c) for c in comps])
        bit = (dot(vec, plane) > 0).cast("long")
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
    planes_matrix: list[list[float]] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Approximate top-k: probe only buckets within Hamming ≤ ``probe_hamming``
    of the query signature.  Same output shape as ``cosine_topk``.

    ``planes_matrix`` (e.g. :func:`deterministic_planes`) supplies literal
    hyperplanes, making the bucketing reproducible in an external SQL
    oracle; ``exact`` switches dot products to decimal accumulation for
    bit-reproducible cosines (slower; the default double path is for
    production throughput)."""
    if planes_matrix is not None:
        sig_of = lambda v: _literal_plane_signature(v, planes_matrix, exact)  # noqa: E731
        n_bits = len(planes_matrix)
    else:
        sig_of = lambda v: _plane_signature(v, planes)  # noqa: E731
        n_bits = planes
    if n_bits > 64:
        raise PhaserError(
            f"lsh_topk: {n_bits} planes exceed the 64-bit long signature — "
            "use <= 64 planes (or band multiple signatures)"
        )
    c = spread_for_compute(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("c_sig", sig_of(F.col("cv"))).withColumn(
        "cn", _vec_norm(exact, F.col("cv"))
    )
    # qn before the Hamming-ball explode: one fold per query, not per probe
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("q_sig", sig_of(F.col("qv"))).withColumn(
        "qn", _vec_norm(exact, F.col("qv"))
    )
    # TRUE bucket probe: expand each query signature into its Hamming
    # ball (every XOR mask with popcount <= probe_hamming — a literal
    # array, the masks depend only on (n_bits, radius)) and EQUI-join on
    # the probed signature.  The old non-equi `bit_count(xor) <= h`
    # predicate planned a nested loop over all N x Q pairs — brute force
    # with the cosine skipped.  Each qualifying pair meets exactly once
    # (the mask c_sig XOR q_sig is unique), so no dedup pass is needed.
    import itertools

    masks = [0]
    for d in range(1, probe_hamming + 1):
        for bits in itertools.combinations(range(n_bits), d):
            m = sum(1 << b for b in bits)
            if m >= 1 << 63:
                # signed two's complement: a mask touching bit 63 exceeds
                # LongType max as a Python int and F.lit(m) would fail at
                # plan time; the XOR result is bit-identical either way
                m -= 1 << 64
            masks.append(m)
    if len(masks) > 100_000:
        raise PhaserError(
            f"lsh_topk: Hamming ball of radius {probe_hamming} over "
            f"{n_bits} planes is {len(masks)} probes per query — lower "
            "probe_hamming or the plane count"
        )
    probed = (
        q.withColumn(
            "__mask", F.explode(F.array(*[F.lit(m).cast("long") for m in masks]))
        )
        .withColumn("c_sig", F.col("__mask").bitwiseXOR(F.col("q_sig")))
        .drop("__mask")
    )
    joined = c.join(F.broadcast(probed), "c_sig").filter(
        ~F.col("query_id").eqNullSafe(F.col("neighbor_id"))
    )
    scored = joined.select(
        "query_id", "neighbor_id", _cosine(exact).alias("cosine")
    )
    return _rank_topk(scored, k)


def _sq_dist(vec: SparkCol, centroid: SparkCol) -> SparkCol:
    d = F.zip_with(vec, centroid, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)


def _sq_dist_decimal(vec: SparkCol, centroid: SparkCol) -> SparkCol:
    """Order-insensitive squared distance: per-element (x−y)² is a
    deterministic IEEE double on any engine; decimal accumulation removes
    the summation-order dependence, so argmin cell assignment is
    bit-reproducible against an external oracle."""
    d = F.zip_with(vec, centroid, lambda x, y: ((x - y) * (x - y)).cast("decimal(28,12)"))
    # NULL elements poison the distance (same as the double path) —
    # coalescing to 0 would let exact mode assign corrupt vectors to a
    # different cell than the default mode
    return F.aggregate(
        d,
        F.lit(0).cast("decimal(38,12)"),
        lambda acc, v: (acc + v).cast("decimal(38,12)"),
    )


def medoid_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
) -> list[list[float]]:
    """Deterministic medoid coarse quantizer: the ``n_centroids`` corpus
    vectors with smallest ``md5(id)`` (a reproducible pseudo-random draw —
    same choice on any engine, any partitioning).  Lower quality than
    k-means (:func:`train_centroids`) but exactly reproducible in an
    external SQL oracle; only n_centroids vectors leave the executors."""
    rows = (
        corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(n_centroids)
        .collect()
    )
    return [[float(x) for x in r["v"]] for r in rows]


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

    # deterministic sample: md5-ordered take (limit() alone is
    # partitioning-dependent — same seed, different centroids on a
    # different cluster layout). TakeOrderedAndProject keeps this a
    # per-partition top-k merge, never a full sort.
    sample = np.array(
        [
            r["v"]
            for r in corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy(F.md5(F.to_json(F.struct(F.col("v")))))
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


def _fold_dists_exact(mat, cents):
    """(n × k) squared-L2 distances reproducing the Catalyst literal fold
    BIT-FOR-BIT: per element ``(x−y)·(x−y)`` then a strictly sequential
    left fold starting at 0.0 (``F.aggregate``'s order).  ``np.sum`` is
    pairwise above tiny lengths and rounds differently in the last ulp —
    hence the explicit per-dimension accumulation loop (vectorized over
    rows × cells, so the loop length is only ``dim``)."""
    import numpy as np

    diff = mat[:, None, :] - cents[None, :, :]
    sq = diff * diff
    acc = np.zeros(sq.shape[:2], dtype=np.float64)
    for i in range(sq.shape[2]):
        acc = acc + sq[:, :, i]
    return acc


def _first_min_idx(d):
    """0-based first-minimum index per row under Spark's
    ``array_position(dists, array_min(dists))`` semantics: NaN never wins
    unless EVERY distance is NaN (array_min skips NaN; NaN equals NaN in
    Spark comparisons, so an all-NaN row yields position 1)."""
    import numpy as np

    n, k = d.shape
    nan = np.isnan(d)
    dm = np.where(nan, np.inf, d)
    m = dm.min(axis=1)
    # first index whose value EQUALS the min and is not NaN; a NaN→inf
    # substitute must not beat a genuine +inf minimum
    pos = np.where((d == m[:, None]) & ~nan, np.arange(k)[None, :], k)
    idx = pos.min(axis=1)
    return np.where(idx == k, 0, idx)  # all-NaN rows: position 1


def _fold_matrix_batch(vals, dim):
    """(n × dim) float64 matrix + validity mask for the EXACT-fold Arrow
    paths.  Unlike :func:`_dense_batch`, rows with NaN/Inf ELEMENTS stay
    valid — the literal fold computes straight through them (an all-NaN
    distance row resolves to cell 1 via :func:`_first_min_idx`), and only
    null / ragged vectors are invalid.  Arrow→pandas turns null ELEMENTS
    inside a list into NaN, so element-null detection must happen in
    Catalyst BEFORE the Python boundary (see the ``__fold_dirty__`` flag
    in :func:`assign_cells`)."""
    import numpy as np

    n = len(vals)
    if n == 0:
        return None, None
    mat = np.zeros((n, dim), dtype=np.float64)
    valid = np.zeros(n, dtype=bool)
    for i, v in enumerate(vals):
        if v is None:
            continue
        try:
            a = np.asarray(v, dtype=np.float64)
        except (TypeError, ValueError):
            continue
        if a.shape == (dim,):
            mat[i] = a
            valid[i] = True
    return mat, valid


def assign_cells(
    df: DataFrame, centroids: list[list[float]], vec_col: str, out_col: str = "cell",
    dist_fn=None, use_arrow: bool | None = None,
) -> DataFrame:
    """Nearest-centroid cell id: squared-L2 argmin, FIRST minimum wins
    ties (mirror `ORDER BY dist, cell LIMIT 1` in SQL), 1-based ids.

    Default path (r12 optimization): one Arrow batch pass — the k×dim
    centroid matrix rides a Spark broadcast and distances are an exact
    sequential fold (:func:`_fold_dists_exact`) BIT-IDENTICAL to the
    literal ``zip_with``/``aggregate`` expression this function used to
    inline.  The literal form built O(k·dim) plan literals through py4j
    (~1 s of driver time per call at k·dim=1024) and evaluated as an
    interpreted CodegenFallback expression per row (~0.2 ms/row) — the
    guide §4.2 shape, replaced by a vectorized batch matmul-free fold.
    Dirty-row semantics match the literal fold exactly: null / ragged
    vector or null element → NULL cell; NaN/Inf elements compute through
    (an all-NaN distance row is cell 1).

    ``dist_fn`` (e.g. the decimal-exact fold) pins the literal
    expression path — bit-reproducibility of DECIMAL folds is not
    representable in numpy doubles.  ``use_arrow=False`` forces the
    literal path for the default distance (path-equivalence tests).
    For corpus-scaled cell counts (k beyond the broadcast-table regime
    here) use :func:`assign_cells_arrow`, the ‖c‖²−2x·c matmul form."""
    if use_arrow is None:
        use_arrow = dist_fn is None
    if not use_arrow or dist_fn is not None:
        sq = dist_fn or _sq_dist
        vec = F.col(vec_col).cast("array<double>")
        cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
        dists = F.transform(cent_arr, lambda c: sq(vec, c))
        return df.withColumn(
            out_col, F.array_position(dists, F.array_min(dists)).cast("int")
        )

    import numpy as np
    import pandas as pd

    df, restore_order = _shadow_out_col(df, out_col)
    cent = np.asarray(centroids, dtype=np.float64)  # k × dim
    dim = cent.shape[1]
    vec = F.col(vec_col).cast("array<double>")
    # element-nulls become NaN across the Arrow boundary, but the literal
    # fold distinguishes them (null element → NULL cell, NaN element →
    # computed); detect them JVM-side and ship one boolean per row
    dirty = (
        vec.isNull()
        | (F.size(vec) != F.lit(dim))
        | F.exists(vec, lambda x: x.isNull())
    )
    staged = df.withColumn("__fold_dirty__", F.coalesce(dirty, F.lit(True)))
    bc = df.sparkSession.sparkContext.broadcast(cent)
    schema = T.StructType(
        list(staged.schema.fields) + [T.StructField(out_col, T.IntegerType())]
    )

    def gen(batches):
        cents_ = bc.value
        for pdf in batches:
            mat, valid = _fold_matrix_batch(pdf[vec_col], cents_.shape[1])
            if mat is None:
                yield pdf.assign(**{out_col: pd.array([], dtype="Int32")})
                continue
            d = _fold_dists_exact(mat, cents_)
            out = pd.array(
                (_first_min_idx(d) + 1).astype("int32"), dtype="Int32"
            )
            out[~valid | pdf["__fold_dirty__"].to_numpy(dtype=bool)] = pd.NA
            yield pdf.assign(**{out_col: out})

    out = staged.mapInPandas(gen, schema=schema).drop("__fold_dirty__")
    return out.select(*restore_order) if restore_order else out


def assign_cells_arrow(
    df: DataFrame, centroids: list[list[float]], vec_col: str, out_col: str = "cell",
) -> DataFrame:
    """Nearest-centroid assignment for LARGE k — the 100 TB IVF/SemDeDup
    path.  The literal-expression form (:func:`assign_cells`) inlines
    k·dim constants into the plan, which stops being viable past a few
    hundred centroids; here the k×dim centroid matrix rides the UDF
    closure (one copy per task, like MLlib's broadcast centers) and each
    Arrow batch is ONE ``(batch × dim) @ (dim × k)`` matmul + argmin —
    vectorized, no row explosion, no shuffle.

    Same deterministic rule as the literal path: squared-L2 distance,
    FIRST minimum wins ties (numpy argmin), 1-based cell ids.  Dirty
    rows match the literal path's null behavior: a null vector, a
    wrong-length vector, or one with a null/NaN element gets a NULL cell
    id (the literal fold's zip_with padding poisons every distance to
    null there) instead of crashing the task mid-matmul.  Exactness
    caveat: the matmul expands ‖x−c‖² = ‖x‖²−2x·c+‖c‖² in doubles, whose
    rounding can differ from the literal path's per-element fold in the
    last ulp — tie-adjacent assignments may differ between the two paths
    (both are valid nearest cells; pick one path per corpus)."""
    import numpy as np
    import pandas as pd

    df, restore_order = _shadow_out_col(df, out_col)
    cent = np.asarray(centroids, dtype=np.float64)  # k × dim
    # ship the matrix as a Spark broadcast, not a pickled closure: a
    # closure rides every task launch, while a broadcast lands on each
    # executor once (k=65536 × dim=1024 doubles is a 512 MB matrix — a
    # per-task copy of that would dominate scheduling)
    bc = df.sparkSession.sparkContext.broadcast(
        (cent.T.copy(), (cent * cent).sum(axis=1))
    )

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.IntegerType())]
    )

    def gen(batches):
        cent_t, cent_sq = bc.value
        for pdf in batches:
            mat, valid = _dense_batch(pdf[vec_col], cent_t.shape[0])
            if mat is None:
                yield pdf.assign(**{out_col: pd.array([], dtype="Int32")})
                continue
            # argmin over ‖x‖²−2x·c+‖c‖²; ‖x‖² is constant per row → skip
            d = cent_sq[None, :] - 2.0 * (mat @ cent_t)
            out = pd.array((d.argmin(axis=1) + 1).astype("int32"), dtype="Int32")
            out[~valid] = pd.NA
            yield pdf.assign(**{out_col: out})

    out = df.mapInPandas(gen, schema=schema)
    return out.select(*restore_order) if restore_order else out


def _shadow_out_col(df: DataFrame, out_col: str):
    """Preserve ``withColumn`` replace semantics for mapInPandas appends.

    The Arrow output schema lists every input field plus ``out_col``; a
    pre-existing column of that name would appear TWICE in the schema
    while the pandas ``assign`` inside produces it once — an Arrow
    serializer crash at runtime (the literal-expression paths replace it
    silently, as ``withColumn`` always did).  Drop the stale column up
    front and hand back the original column order so the caller can
    restore ``out_col`` to its old position after the Arrow pass."""
    if out_col not in df.columns:
        return df, None
    order = list(df.columns)
    return df.drop(out_col), order


def _dense_batch(vals, dim):
    """(n × dim) float64 matrix + per-row validity mask from an Arrow
    batch's vector column.  Invalid rows (null vector, wrong length,
    null/NaN element, non-numeric) become zero rows with ``valid=False``
    — the caller masks their output to NULL, mirroring the literal
    expression path where zip_with padding poisons the fold to null.
    Returns ``(None, None)`` for an empty batch."""
    import numpy as np

    n = len(vals)
    if n == 0:
        return None, None
    mat = np.zeros((n, dim), dtype=np.float64)
    valid = np.zeros(n, dtype=bool)
    for i, v in enumerate(vals):
        if v is None:
            continue
        try:
            a = np.asarray(v, dtype=np.float64)
        except (TypeError, ValueError):
            continue
        if a.shape == (dim,) and np.isfinite(a).all():
            mat[i] = a
            valid[i] = True
    return mat, valid


def probe_cells_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    n_probe: int,
    out_col: str = "cells",
) -> DataFrame:
    """Top-``n_probe`` nearest-centroid ids per row as an ``array<int>``
    — the query-side twin of :func:`assign_cells_arrow` for large k.
    The literal ranking in :func:`ivf_topk` inlines every centroid as
    plan constants (O(k·dim) literals), which stops being viable past a
    few hundred cells exactly like the corpus side; here one
    ``(batch × dim) @ (dim × k)`` matmul + stable argsort per Arrow
    batch ranks the same squared-L2 expansion, and the centroid matrix
    rides a Spark broadcast.

    Determinism matches the literal path's ``array_sort(struct(d,
    cell))``: distances ascending, ties broken by lower cell id (numpy
    stable argsort = index order).  Dirty rows (null / ragged / NaN
    vector) get an EMPTY probe list — they join no cell and vanish from
    the top-k output, whereas the literal path's null-poisoned sort
    order is undefined; dirty QUERY vectors have no meaningful
    neighbors either way.  Same last-ulp caveat as
    :func:`assign_cells_arrow` on tie-adjacent cells."""
    import numpy as np
    import pandas as pd

    df, restore_order = _shadow_out_col(df, out_col)
    cent = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, len(cent))
    bc = df.sparkSession.sparkContext.broadcast(
        (cent.T.copy(), (cent * cent).sum(axis=1))
    )
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.IntegerType()))]
    )

    def gen(batches):
        cent_t, cent_sq = bc.value
        for pdf in batches:
            mat, valid = _dense_batch(pdf[vec_col], cent_t.shape[0])
            if mat is None:
                yield pdf.assign(**{out_col: pd.Series([], dtype="object")})
                continue
            d = cent_sq[None, :] - 2.0 * (mat @ cent_t)
            top = np.argsort(d, axis=1, kind="stable")[:, :n_probe] + 1
            cells = [
                top[i].astype("int32").tolist() if valid[i] else []
                for i in range(len(top))
            ]
            yield pdf.assign(**{out_col: pd.Series(cells, dtype="object")})

    out = df.mapInPandas(gen, schema=schema)
    return out.select(*restore_order) if restore_order else out


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
    exact: bool = False,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus partitioned into
    nearest-centroid cells; each query scores only its ``n_probe`` nearest
    cells.

    Scale path: the candidate join is an equi-join on ``cell`` — the
    corpus shuffles once by cell id (or is pre-bucketed by it), each query
    reads n_probe/n_centroids of the data.  The centroid table (k × dim
    floats) is embedded as literals; the *probe* side (n_queries × n_probe
    rows, query vectors included) is broadcast only when
    ``broadcast_queries`` is True or the query count is provably small —
    for large query sets leave it None and let AQE pick the join strategy.
    Same output shape as ``cosine_topk``; recall tuned by ``n_probe``.
    ``exact`` uses decimal accumulation for distances and cosines so the
    result is bit-reproducible against an external oracle.  BOTH centroid
    consumers switch from plan literals to the Arrow matmul form above 64
    centroids (where an O(k·dim)-literal plan stops being viable):
    corpus cell assignment via :func:`assign_cells_arrow`, query-side
    probe ranking via :func:`probe_cells_arrow` — unless ``exact`` pins
    the oracle-replayable literal fold for both."""
    cents = centroids or train_centroids(corpus, vec_col, n_centroids)
    sq = _sq_dist_decimal if exact else _sq_dist
    base = spread_for_compute(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    if exact:
        # decimal-exact literal fold: bit-reproducible in an external
        # SQL oracle, not representable in the numpy fold path
        c = assign_cells(base, cents, "cv", dist_fn=sq)
    elif len(cents) <= 64:
        # default distance → the exact-fold Arrow path inside assign_cells
        c = assign_cells(base, cents, "cv")
    else:
        # same squared-L2 argmin, matmul form (dist_fn is only ever
        # non-default under exact, which pins the literal path above)
        c = assign_cells_arrow(base, cents, "cv")
    c = c.withColumn("cn", _vec_norm(exact, F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", _vec_norm(exact, F.col("qv")))
    # n_probe nearest cells per query, exploded to (query, cell) probe rows
    if exact or len(cents) <= 64:
        qvec = F.col("qv")
        cent_arr = F.array(*[F.array(*[F.lit(x) for x in c_]) for c_ in cents])
        dists = F.transform(cent_arr, lambda ce: sq(qvec, ce))
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
        ).select("query_id", "qv", "qn", F.col("cell").cast("int"))
    else:
        # query-side twin of the corpus switch above: past 64 cells the
        # literal ranking is itself an O(k·dim)-literal plan — rank the
        # probe cells with the same matmul form instead
        probes = (
            probe_cells_arrow(q, cents, "qv", n_probe, out_col="__pc")
            .withColumn("cell", F.explode("__pc"))
            .select("query_id", "qv", "qn", F.col("cell").cast("int"))
        )
    if broadcast_queries:
        probes = F.broadcast(probes)
    joined = c.join(probes, "cell").filter(
        ~F.col("query_id").eqNullSafe(F.col("neighbor_id"))
    )
    scored = joined.select(
        "query_id", "neighbor_id", _cosine(exact).alias("cosine")
    )
    return _rank_topk(scored, k)


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    query_id_col: str = "query_id",
    neighbor_id_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall of an approximate top-k result against the exact
    one — the standard tuning loop for the ANN family: sweep ``n_probe``
    (IVF) or ``probe_hamming``/plane count (LSH) and read recall@k
    directly, instead of eyeballing neighbor lists.

    Both inputs are top-k result frames in the shared output shape of
    ``cosine_topk``/``lsh_topk``/``ivf_topk`` (query_id, neighbor_id,
    cosine, rank) — ``exact`` from the brute-force baseline over a
    bounded evaluation query sample, ``approx`` from the candidate path
    under test.  recall = |approx ∩ exact| / |exact| per query; queries
    the approximate path missed entirely still appear (n_hit 0, recall
    0.0), and ties at the boundary follow each input's own deterministic
    (cosine desc, id asc) rule, so the metric is reproducible run to run.

    Scale: both inputs are already ≤ |queries|·k rows by construction —
    everything here is a broadcast-sized join and a per-query count."""
    e = exact.select(
        F.col(query_id_col).alias("__r_qid__"),
        F.col(neighbor_id_col).alias("__r_nid__"),
    )
    a = approx.select(
        F.col(query_id_col).alias("__r_qid__"),
        F.col(neighbor_id_col).alias("__r_nid__"),
        F.lit(1).alias("__r_hit__"),
    )
    joined = e.join(a, ["__r_qid__", "__r_nid__"], "left")
    return (
        joined.groupBy(F.col("__r_qid__").alias(query_id_col))
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("__r_hit__").alias("n_hit"),
            (
                F.count("__r_hit__").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("recall"),
        )
    )


def kmeans_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 4,
    init_centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Fully distributed Lloyd's k-means over the WHOLE corpus (contrast
    :func:`train_centroids`, which trains on a driver-side sample —
    right when a few thousand vectors approximate the distribution;
    this is right when you need the exact corpus-wide fixpoint of each
    round, e.g. for reproducible IVF cells or SemDeDup clusters shared
    across runs).

    Per round: assignment defaults to the bit-identical exact-fold
    Arrow pass of :func:`assign_cells` (same numeric results as the
    historical k×dim literal projection; ``use_arrow=False`` there pins
    the literal Catalyst form when a Python-free plan is required), and
    the update is
    :func:`phaser_spark.ops.embeddings.group_centroids` — posexplode +
    per-(cell, dim) decimal means with map-side combine.  Only the k
    centroid vectors visit the driver each round; the corpus never
    does.  A cell that loses all members keeps its previous centroid
    (deterministic; no re-seeding).

    Deterministic end to end: medoid init (md5-ordered — same draw on
    any engine/partitioning), first-min argmin assignment, decimal
    means — so the full iteration is replayable by an external SQL
    oracle.  Returns the centroid list after ``iters`` rounds; assign
    with :func:`assign_cells`.
    """
    from .embeddings import group_centroids

    cents = init_centroids or medoid_centroids(corpus, id_col, vec_col, k)
    base = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    # small k: assign_cells' exact-fold Arrow pass (bit-identical to the
    # literal form, which use_arrow=False still pins); corpus-scaled k
    # flips to the expanded-matmul Arrow path (exact folds at that k
    # cost more than the ulp they protect)
    assign = assign_cells if k <= 64 else assign_cells_arrow
    for _ in range(iters):
        assigned = assign(base, cents, "v", out_col="cell")
        updated = {
            int(r["cell"]): [float(x) for x in r["centroid"]]
            for r in group_centroids(assigned, "cell", "v").collect()
        }
        # cells are 1-based (array_position); empty cells carry over
        cents = [updated.get(i + 1, c) for i, c in enumerate(cents)]
    return cents
