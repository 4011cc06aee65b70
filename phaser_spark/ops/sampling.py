"""Deterministic sampling/splitting for training-data pipelines (engine
addition; BASELINE.json north star).

Everything keys off a cryptographic hash of a stable id — never
``rand()`` — so splits are reproducible across runs, partitionings, and
engines, and a row's assignment never changes when the corpus grows.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import PhaserError

_BUCKETS = 10_000

# log-bin resolution cap for topk_by_group / top_p_by_group: the bin
# layouts place zero/±Inf sentinels at ±2^31 / -2^33, and finite bins
# span ±1074·octave_bins — 2^20 keeps every finite bin strictly inside
# its sign range's sentinels (1074·2^20 ≈ 1.1e9 < 2^31)
_OCTAVE_BINS_MAX = 1 << 20


def hash_bucket(key: SparkCol, buckets: int = _BUCKETS) -> SparkCol:
    """Stable bucket in [0, buckets): first 8 hex chars of md5(key) mod n.

    md5 (not xxhash64) so external systems — and the DuckDB oracle — can
    reproduce assignments bit-for-bit."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def split_by_hash(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    split_col: str = "split",
    remainder: str | None = None,
) -> DataFrame:
    """Assign each row to a named split by hash of ``key_col``.

    ``fractions`` maps split name → fraction.  The fractions must sum to
    ~1.0 unless ``remainder`` names an extra split that absorbs the
    leftover mass — silently dumping an unnamed remainder into the last
    declared split (so ``{'train': 0.5}`` labels 100% 'train') is exactly
    the surprise this signature forbids.  Bucket boundaries are *rounded*,
    not truncated, so a fraction like 1/3 lands within half a bucket
    (5e-5) of its stated mass.  Pure projection — no shuffle, no sampling
    state, safe at any scale, and adding rows later never reassigns
    existing ones.
    """
    if not fractions:
        raise ValueError("split_by_hash needs at least one named fraction")
    bad = {k: v for k, v in fractions.items() if not 0.0 < v <= 1.0}
    if bad:
        raise ValueError(
            f"each fraction must be in (0, 1], got {bad} — a negative or "
            ">1 fraction would silently produce empty/all-absorbing splits"
        )
    total = sum(fractions.values())
    if remainder is None and abs(total - 1.0) > 1e-6:
        raise ValueError(
            f"fractions must sum to 1.0 (got {total}); pass remainder="
            "'<name>' to route the leftover mass to an explicit split"
        )
    if remainder is not None and total > 1.0 + 1e-9:
        raise ValueError(f"fractions with a remainder split must sum to <= 1, got {total}")
    b = hash_bucket(F.col(key_col))
    expr = None
    lo = 0.0
    for name, frac in fractions.items():
        hi = lo + frac
        cond = (b >= round(lo * _BUCKETS)) & (b < round(hi * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    # rows past the last rounded boundary: rounding slack for ~1.0 totals,
    # or the explicit remainder split
    expr = expr.otherwise(remainder if remainder is not None else list(fractions)[-1])
    # a NULL key cannot hash: its split is NULL (visible, filterable) —
    # NOT silently dumped into the remainder/last split, which would
    # contaminate an eval slice with an unhashed cohort
    expr = F.when(F.col(key_col).isNotNull(), expr)
    return df.withColumn(split_col, expr)


def sample_by_hash(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic ``fraction`` sample: the same rows every run."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(F.col(key_col)) < round(fraction * _BUCKETS))


def pack_sequences(
    df: DataFrame,
    len_col: str,
    capacity: int,
    order_col: str,
    partition_col: str | None = None,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Assign each row to a training-batch bin by concat-then-chunk
    packing: rows are laid end-to-end in ``order_col`` order and the bin
    is the chunk its START offset falls in —
    ``floor(exclusive_cumsum(len) / capacity)`` — exactly how pretraining
    pipelines pack documents into fixed-length sequences.

    With ``partition_col`` the packing runs independently per partition
    value (the scale path: one shuffle, every window local to its
    group).  Without it the window is global — exact, but a single-node
    sort at the tail; only for corpora small enough to sort on one
    executor, which is why partitioned packing is the default
    recommendation at 100 TB (bins then never cross partitions).
    """
    from pyspark.sql import Window

    if capacity < 1:
        raise ValueError(f"pack_sequences needs capacity >= 1, got {capacity}")
    base = (
        Window.partitionBy(partition_col) if partition_col else Window.partitionBy()
    )
    w = base.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum(len_col).over(w), F.lit(0).cast("long"))
    return df.withColumn(bin_col, F.floor(start / F.lit(capacity)))


def stratified_sample_by_hash(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling (e.g. language rebalancing:
    keep 10% of English, all of the low-resource languages).

    Each stratum value gets its own keep-fraction; strata not listed use
    ``default_fraction``.  Like the other hash samplers this is a pure
    projection + filter — no shuffle, no sampling state, reproducible on
    any engine via the md5 bucket rule — so rebalancing a 100 TB corpus
    is a single scan.
    """
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    threshold = None
    for name, frac in fractions.items():
        cut = F.lit(round(frac * _BUCKETS))
        cond = F.col(strata_col) == name
        threshold = F.when(cond, cut) if threshold is None else threshold.when(cond, cut)
    threshold = (
        threshold.otherwise(round(default_fraction * _BUCKETS))
        if threshold is not None
        else F.lit(round(default_fraction * _BUCKETS))
    )
    return df.filter(hash_bucket(F.col(key_col)) < threshold)


def token_budget_select(
    df: DataFrame,
    key_col: str,
    len_col: str,
    group_col: str,
    budgets: dict | int,
    default_budget: int | None = None,
    buckets: int = 1024,
    score_col: str | None = None,
    score_range: tuple = (0.0, 1.0),
) -> DataFrame:
    """Assemble a training mix by TOKEN BUDGET: per group (language,
    domain, source…), keep documents — in a deterministic pseudo-random
    order — until the group's token budget is reached.

    The selection rule: order each group's docs by
    ``(hash_bucket(key, buckets), md5(key), key)`` and keep a doc iff its
    *exclusive* running total of ``len_col`` is still below the group's
    budget — so the doc that crosses the budget line is the last one
    kept, and the kept total overshoots by less than one document.
    Adding new docs to the corpus can displace old ones only within the
    ordering (the order itself is stable per key).

    ``budgets`` maps group value → token budget (or a single int applied
    to every group).  Groups absent from the mapping use
    ``default_budget``; with ``default_budget=None`` they are dropped —
    an explicit mix lists what it wants.

    With ``score_col`` the budget fills BEST-FIRST instead of
    pseudo-randomly: docs are taken in strictly descending score order
    (ties by ``(md5(key), key)``) until the budget is reached — "keep
    each language's highest-quality documents up to its token budget".
    ``score_range`` bounds the score (values are clamped into it); the
    coarse level then buckets on score bands instead of hash buckets,
    so the same two-level selection applies and no group ever needs a
    single-task sort.

    Scale: the naive form is one window per group — which puts every
    group in ONE sort task (a 10 TB language = one executor).  Instead
    this runs two levels: a tiny per-(group, bucket) length aggregate
    (``G × buckets`` rows, map-side combined) finds each bucket's start
    offset; buckets wholly inside the budget are kept with a pure
    filter, buckets wholly past it are dropped, and only the ONE
    straddling bucket per group (~1/buckets of the group) pays a fine
    window.  Equivalent to the single-window form on the same total
    order, verified property-style in tests.
    """
    from pyspark.sql import Window

    if isinstance(budgets, dict):
        budget_expr = None
        for name, b in budgets.items():
            cond = F.col(group_col).eqNullSafe(F.lit(name))
            budget_expr = (
                F.when(cond, int(b))
                if budget_expr is None
                else budget_expr.when(cond, int(b))
            )
        if budget_expr is None:
            budget_expr = F.lit(default_budget)
        elif default_budget is not None:
            budget_expr = budget_expr.otherwise(int(default_budget))
    else:
        budget_expr = F.lit(int(budgets))
    BKT, START, BSUM, BUD = "__tb_bkt__", "__tb_start__", "__tb_sum__", "__tb_budget__"
    key = F.col(key_col)
    if score_col is not None:
        lo, hi = float(score_range[0]), float(score_range[1])
        if not hi > lo:
            raise ValueError(f"score_range must be (lo, hi) with hi > lo, got {score_range}")
        clamped = F.least(
            F.greatest(F.col(score_col).cast("double"), F.lit(lo)), F.lit(hi)
        )
        # monotone: higher score -> lower bucket -> earlier in the order
        bucket_expr = F.least(
            F.greatest(
                F.floor((F.lit(hi) - clamped) / (hi - lo) * buckets), F.lit(0)
            ),
            F.lit(buckets - 1),
        ).cast("long")
    else:
        bucket_expr = hash_bucket(key, buckets)
    # A NULL bucket (NULL key, or NULL score in best-first mode) has no
    # deterministic position in the selection order; such rows are
    # EXCLUDED — from the output AND from the budget accounting.  Without
    # this filter their lengths would still land in the coarse cumsum
    # (NULLS FIRST), shrinking every real bucket's budget while the rows
    # themselves vanish in the null-unsafe bucket join.
    with_bkt = (
        df.withColumn(BKT, bucket_expr)
        .filter(F.col(BKT).isNotNull())
        .withColumn(BUD, budget_expr.cast("long"))
    )
    coarse = (
        with_bkt.filter(F.col(BUD).isNotNull())
        .groupBy(group_col, BKT)
        .agg(F.sum(F.col(len_col).cast("long")).alias(BSUM))
    )
    cw = (
        Window.partitionBy(group_col)
        .orderBy(BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    coarse = coarse.withColumn(
        START, F.coalesce(F.sum(BSUM).over(cw), F.lit(0).cast("long"))
    ).select(
        F.col(group_col).alias("__tb_group__"),
        F.col(BKT).alias("__tb_cbkt__"),
        START,
        BSUM,
    )
    joined = with_bkt.filter(F.col(BUD).isNotNull()).join(
        F.broadcast(coarse),
        F.col(group_col).eqNullSafe(F.col("__tb_group__"))
        & (F.col(BKT) == F.col("__tb_cbkt__")),
    )
    end = F.col(START) + F.col(BSUM)
    full = joined.filter(end <= F.col(BUD))
    straddle = joined.filter((F.col(START) < F.col(BUD)) & (end > F.col(BUD)))
    fine_order = (
        [F.col(score_col).cast("double").desc()] if score_col is not None else []
    ) + [F.md5(key.cast("string")), key]
    fw = (
        Window.partitionBy(group_col, BKT)
        .orderBy(*fine_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fine_start = F.col(START) + F.coalesce(
        F.sum(F.col(len_col).cast("long")).over(fw), F.lit(0).cast("long")
    )
    picked = (
        straddle.withColumn("__tb_fstart__", fine_start)
        .filter(F.col("__tb_fstart__") < F.col(BUD))
        .drop("__tb_fstart__")
    )
    drop_cols = [BKT, BUD, "__tb_group__", "__tb_cbkt__", START, BSUM]
    return full.unionByName(picked).drop(*drop_cols)


def pack_best_fit(
    df: DataFrame,
    key_col: str,
    len_col: str,
    capacity: int,
    partition_col: str | None = None,
    buckets: int = 256,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Best-fit-decreasing bin packing into fixed-``capacity`` bins — the
    packing for documents that must NOT be split across training
    sequences (contrast :func:`pack_sequences`, which concatenates and
    chunks).  Minimizing per-bin slack is what BFD is for: items are
    taken longest-first and each goes into the fullest bin it still
    fits, opening a new bin only when none fits.

    Items LONGER than ``capacity`` get a bin of their own (flagged
    downstream by their length; dropping them is the caller's policy
    call).  NULL/NaN/non-positive lengths and NULL keys are excluded.
    Returns the input rows plus ``bin_col``; bins are unique within each
    ``partition_col`` value (like ``pack_sequences``), never across.
    Bin ids encode ``(pack_group_bucket << 33) | local_bin`` in one
    int64, which caps ``buckets`` at 2^30 (validated) and gives each
    pack group a 33-bit local-bin space.

    Determinism: items order by ``(length desc, md5(key), key)`` inside
    their pack group and the greedy is a pure function of that order, so
    the assignment is identical on any partitioning (pytest asserts
    repartition-invariance); ``key_col`` must be unique per row.

    Scale: bin packing is inherently sequential, so the corpus is first
    hashed into ``buckets`` pack groups per partition value (the
    token_budget_select two-level idea): each group BFD-packs
    independently in one Arrow batch (``applyInPandas`` — the documented
    non-relational escape hatch), giving ~N/buckets-bounded state and
    full parallelism.  The trade is documented honestly: bucketing costs
    at most one partially-empty bin per bucket versus a corpus-wide BFD
    (itself already a heuristic), bounded by ``buckets × capacity``
    slack total.
    """
    from pyspark.sql import types as T

    if capacity < 1:
        raise ValueError(f"pack_best_fit needs capacity >= 1, got {capacity}")
    if buckets < 1:
        raise ValueError(f"pack_best_fit needs buckets >= 1, got {buckets}")
    if buckets > 2**30:
        # bin ids encode as (bucket << 33) | local_bin in one int64: the
        # bucket needs to stay below 2^30 for the shift not to overflow,
        # and each bucket gets a 33-bit local-bin space (~8.6e9 bins —
        # unreachable, since a bucket's item count bounds its bin count
        # and a bucket holding 2^33 items has bigger problems)
        raise ValueError(
            f"pack_best_fit: buckets must be <= 2^30 for the int64 bin-id "
            f"encoding (bucket << 33 | local_bin), got {buckets}"
        )
    BKT = "__pbf_bkt__"
    parts = [partition_col] if partition_col else []
    base = (
        df.withColumn(BKT, hash_bucket(F.col(key_col), buckets))
        .filter(
            F.col(BKT).isNotNull()
            & F.col(len_col).isNotNull()
            # NaN > 0 is TRUE under Spark's NaN-is-greatest ordering, and
            # a NaN length would die as an opaque int(NaN) ValueError in
            # the Arrow batch — exclude it with the other non-lengths
            & ~F.isnan(F.col(len_col).cast("double"))
            & (F.col(len_col) > 0)
        )
    )
    out_schema = T.StructType(
        [f for f in base.schema.fields if f.name != BKT]
        + [T.StructField(bin_col, T.LongType())]
    )
    cap = int(capacity)
    key_name, len_name = key_col, len_col

    def pack(pdf):
        import hashlib

        import pandas as pd

        bucket = int(pdf[BKT].iloc[0])
        order = sorted(
            range(len(pdf)),
            key=lambda i: (
                -int(pdf[len_name].iloc[i]),
                hashlib.md5(str(pdf[key_name].iloc[i]).encode()).hexdigest(),
                str(pdf[key_name].iloc[i]),
            ),
        )
        remaining: list[int] = []  # slack per open bin, index = local bin id
        assigned = [0] * len(pdf)
        for i in order:
            n = int(pdf[len_name].iloc[i])
            best, best_slack = -1, None
            for b, slack in enumerate(remaining):
                if n <= slack and (best_slack is None or slack < best_slack):
                    best, best_slack = b, slack
            if best < 0:
                remaining.append(max(cap - n, 0))
                best = len(remaining) - 1
            else:
                remaining[best] -= n
            # bins unique per partition value: bucket in the high bits
            assigned[i] = (bucket << 33) | best
        out = pdf.drop(columns=[BKT]).copy()
        out[bin_col] = pd.array(assigned, dtype="int64")
        return out

    return base.groupBy(*parts, BKT).applyInPandas(pack, schema=out_schema)


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    split_col: str = "split",
    group_col: str = "split_group",
    remainder: str | None = None,
) -> DataFrame:
    """Train/val/test assignment that can never split a near-duplicate
    cluster across splits — the leakage guard: with plain per-row hash
    splits, a near-copy of a training document lands in the eval slice
    ~(1-train_frac) of the time and silently inflates eval scores.

    ``pairs`` is any duplicate/similarity edge list over ``id_col``
    values (MinHash-LSH pairs, exact-fingerprint pairs, embedding
    near-dups…).  Rows are first clustered with
    :func:`phaser_spark.ops.graph.connected_components` (every df row is
    a vertex, so pair-free rows are singletons), then the WHOLE cluster
    is assigned by ``split_by_hash`` keyed on the cluster representative
    — same deterministic md5-bucket rule, same ``fractions`` contract
    (must sum to 1 or name a ``remainder``).  Returns ``df`` plus
    ``group_col`` (the cluster representative id) and ``split_col``.

    Note the statistical trade: split shares now hold over CLUSTERS,
    not rows, so a giant duplicate cluster moves its whole row mass into
    one split — exactly the point, but budget-sensitive callers should
    check realized shares with :func:`split_shares` (one aggregate) and
    re-cut if a mega-cluster skewed them.

    Scale — and the one real hazard: the component step is the
    iterative min-label propagation (shuffle-on-key rounds,
    localCheckpoint lineage) and everything after is one join plus a
    projection, so THIS operator is linear in ``df`` + ``pairs``.  The
    hazard lives in how ``pairs`` was generated: all-pairs emitters
    (LSH bucket self-joins, exact-fingerprint group cross-products)
    grow QUADRATICALLY in copies-per-cluster — a 1000-copy boilerplate
    cluster is ~500k pairs from a self-join.  Connectivity does not
    need all pairs: feed :func:`phaser_spark.ops.dedup.
    minhash_lsh_edges` (star edges per bucket, linear, and
    over-merging is the SAFE direction for a leakage guard) or cap the
    verified generators (``max_shingle_df`` for n-gram Jaccard, band
    count for MinHash-LSH) when the corpus is dup-heavy.
    """
    from .graph import connected_components

    comp = connected_components(
        pairs.select(F.col(src), F.col(dst)),
        src=src,
        dst=dst,
        vertices=df.select(F.col(id_col).alias("__ls_id__")),
        id_col="__ls_id__",
        component_col=group_col,
    )
    joined = df.join(
        comp, df[id_col] == comp["__ls_id__"], "left"
    ).drop("__ls_id__")
    # rows whose id was NULL never enter the vertex set: their group —
    # and hence their split — stays NULL (visible, filterable), the same
    # contract split_by_hash applies to NULL keys
    return split_by_hash(joined, group_col, fractions, split_col, remainder)


def leakage_safe_split_incremental(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    pairs: DataFrame,
    prior: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    prior_id_col: str | None = None,
    prior_split_col: str | None = None,
    split_col: str = "split",
    group_col: str = "split_group",
    source_col: str = "split_source",
    remainder: str | None = None,
) -> DataFrame:
    """:func:`leakage_safe_split` for a GROWING corpus: rows whose
    near-dup cluster touches a previously assigned document INHERIT that
    assignment instead of being rehashed — the versioned-corpus
    invariant that a new near-copy of a train document can never land
    in eval just because the cluster's representative (and hence its
    hash) changed between corpus versions.

    ``prior`` is the previous version's assignment table (``id, split``
    — column names default to ``id_col``/``split_col``).  Per cluster:

    * any member with a prior split → the whole cluster adopts the
      prior split of the MINIMUM-id prior-assigned member
      (deterministic; when new edges merge two old clusters that were
      split apart — the one genuinely ambiguous case — the rule is
      stable and the losing side is visible as ``source_col =
      'prior'`` rows whose split changed vs their own prior row);
    * no prior member → the fresh-cluster md5 rule of
      :func:`leakage_safe_split`, bit-identical to what a from-scratch
      split would assign (``source_col = 'hash'``).

    Returns ``df`` + ``group_col`` + ``split_col`` + ``source_col``.
    NULL-id rows keep NULL split/group/source (the standing contract).
    ``prior`` must hold ONE row per id — duplicate ids with conflicting
    splits would make the min-by tie-break nondeterministic.

    Scale: the component step plus TWO extra vertex-sized hops — a join
    of prior assignments onto the label table and one
    ``min_by``-shaped aggregate per cluster — both shuffle-on-key and
    bounded by the vertex table, nothing corpus-sized beyond what the
    non-incremental operator already moves.
    """
    from .graph import connected_components

    prior_id = prior_id_col or id_col
    prior_split = prior_split_col or split_col
    if prior_id not in prior.columns or prior_split not in prior.columns:
        raise PhaserError(
            f"leakage_safe_split_incremental: prior needs columns "
            f"{prior_id!r}/{prior_split!r}, has {prior.columns}"
        )
    comp = connected_components(
        pairs.select(F.col(src), F.col(dst)),
        src=src,
        dst=dst,
        vertices=df.select(F.col(id_col).alias("__ls_id__")).union(
            prior.select(F.col(prior_id).alias("__ls_id__"))
        ),
        id_col="__ls_id__",
        component_col=group_col,
    )
    # prior splits onto the label table, then one min_by per cluster:
    # the minimum-id prior-assigned member's split is the inheritance
    labeled = comp.join(
        prior.select(
            F.col(prior_id).alias("__ls_id__"),
            F.col(prior_split).alias("__prior_split__"),
        ),
        "__ls_id__",
        "left",
    )
    # min over (id, split) structs rather than min_by(split, id): when the
    # prior violates its one-row-per-id contract with CONFLICTING splits,
    # min_by ties on the id and picks nondeterministically per run — the
    # lexicographic struct min stays deterministic (and is identical for
    # contract-honoring priors)
    inherited = (
        labeled.filter(F.col("__prior_split__").isNotNull())
        .groupBy(group_col)
        .agg(
            F.min(
                F.struct(F.col("__ls_id__"), F.col("__prior_split__"))
            )["__prior_split__"].alias("__inherit__")
        )
    )
    joined = (
        df.join(comp, df[id_col] == comp["__ls_id__"], "left")
        .drop("__ls_id__")
        .join(inherited, group_col, "left")
    )
    hashed = split_by_hash(joined, group_col, fractions, "__hash_split__", remainder)
    return (
        hashed.withColumn(
            split_col, F.coalesce(F.col("__inherit__"), F.col("__hash_split__"))
        )
        .withColumn(
            source_col,
            F.when(F.col("__inherit__").isNotNull(), F.lit("prior")).otherwise(
                F.when(F.col("__hash_split__").isNotNull(), F.lit("hash"))
            ),
        )
        .drop("__inherit__", "__hash_split__")
    )


def split_shares(
    df: DataFrame, split_col: str = "split", weight_col: str | None = None
) -> DataFrame:
    """Realized per-split shares after any split assignment — the one
    call the ``leakage_safe_split`` docstring tells budget-sensitive
    callers to make: cluster-level hashing only targets ``fractions``
    in expectation, and a mega-cluster (boilerplate, templated spam)
    can move whole percentage points of row or token mass into one
    split.

    Returns one row per ``split_col`` value (NULL splits — e.g. NULL-id
    rows — stay visible as a NULL row): ``(split, rows, row_share)``
    plus ``(weight, weight_share)`` when ``weight_col`` is given (token
    budgets care about token share, not row share).

    Scale: one map-side-combined aggregate down to ≤ #splits rows, then
    share arithmetic on that tiny table (single-partition window over a
    handful of rows — bounded by the split count, never by data size).
    """
    from pyspark.sql import Window

    aggs = [F.count(F.lit(1)).alias("rows")]
    if weight_col is not None:
        # NaN/Inf-safe: one NaN weight would otherwise turn EVERY split's
        # weight and share into NaN (sum propagates it), and a single
        # ±Infinity poisons every share the same way (inf/inf = NaN);
        # treat both like NULL — absent from the mass — as ewma does for
        # gaps (r9 sweep: the r8 fix covered NaN but not Inf)
        wd = F.col(weight_col).cast("double")
        finite = ~F.isnan(wd) & (wd > float("-inf")) & (wd < float("inf"))
        aggs.append(F.sum(F.when(finite, wd)).alias("weight"))
    per = df.groupBy(F.col(split_col).alias("split")).agg(*aggs)
    whole = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = per.withColumn(
        "row_share", F.col("rows") / F.sum("rows").over(whole)
    )
    if weight_col is not None:
        out = out.withColumn(
            "weight_share", F.col("weight") / F.sum("weight").over(whole)
        )
    return out


def pps_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    buckets: int = 1024,
) -> DataFrame:
    """Deterministic probability-proportional-to-size sampling WITHOUT
    replacement: ``k`` systematic draws along the weight axis, so a
    row's inclusion probability is approximately ``min(1, k·w/W)`` under
    the md5-order pseudo-randomization — "sample documents proportional
    to their token count" without ``rand()`` and without a
    weighted-reservoir pass.  Two caveats on that probability claim:
    the order is a fixed function of the keys (deterministic given the
    key set, "random" only in the sense that md5 scatters any key
    structure), and the k-th threshold lands at exactly ``W``, so the
    final row of the total order is always selected regardless of its
    weight — a single end-of-axis boundary artifact, negligible for
    ``k ≫ 1`` but worth knowing when auditing small samples.

    The rule: lay rows end-to-end in the deterministic
    ``(hash_bucket(key), md5(key), key)`` order (the same total order
    every sampler here uses), give each row the weight interval
    ``(lo, lo+w]`` of its cumulative position, and keep the rows whose
    interval contains one of the ``k`` evenly spaced thresholds
    ``i·W/k`` — classic systematic PPS.  Exactly ``k`` rows come back
    when every weight is below ``W/k``; a heavier row (a "certainty
    item", selected with probability 1) may swallow several thresholds
    and is returned once, so the output can be smaller than ``k`` —
    never larger.  Rows with NULL or non-positive weight (or a NULL
    key) are excluded from the output and the accounting; ``key_col``
    must be unique per row or the order between equal keys — and hence
    the selection — is not deterministic.  Weights accumulate as
    ``decimal(28,12)``, so a single weight must stay below 10^16
    (16 integer digits) — larger (or NaN) weights raise a clear error
    up front rather than an opaque ANSI cast overflow mid-job (or,
    with ANSI off, a silent row drop that would skew both the sample
    and the total).

    Reproducibility: cumulative weights accumulate as exact decimals
    (integer weights stay exact; float weights are pinned at 12
    fractional digits), so the running totals are independent of
    partitioning and bit-identical in an external SQL engine; the
    threshold test is IEEE double arithmetic on those exact totals with
    a fixed expression shape the oracle mirrors.

    Scale: the cumulative order is realized in two levels exactly like
    :func:`token_budget_select` — a ``buckets``-row coarse prefix sum
    (broadcast back), then per-bucket fine windows bounded by ~N/buckets
    rows — so no global single-task sort ever runs; the total weight
    rides in on a one-row broadcast crossJoin.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"pps_sample needs k >= 1, got {k}")
    if buckets < 1:
        raise ValueError(f"pps_sample needs buckets >= 1, got {buckets}")
    BKT, H, WT = "__pps_bkt__", "__pps_h__", "__pps_wt__"
    key = F.col(key_col)
    # try_cast + explicit raise: a >=1e16 (or NaN) weight must fail with
    # an actionable message, not an ANSI cast-overflow stack mid-job —
    # and must NEVER silently vanish from the sample AND the total W
    wt_try = F.col(weight_col).try_cast("decimal(28,12)")
    wt = F.when(
        F.col(weight_col).isNotNull() & wt_try.isNull(),
        F.raise_error(
            F.concat(
                F.lit("pps_sample: weight "),
                F.col(weight_col).cast("string"),
                F.lit(
                    " does not fit decimal(28,12) (weights must be finite"
                    " and < 1e16); rescale the weight column"
                ),
            )
        ).cast("decimal(28,12)"),
    ).otherwise(wt_try)
    base = (
        df.withColumn(WT, wt)
        .withColumn(BKT, hash_bucket(key, buckets))
        .filter(F.col(WT).isNotNull() & (F.col(WT) > 0) & F.col(BKT).isNotNull())
        .withColumn(H, F.md5(key.cast("string")))
    )
    bsums = base.groupBy(BKT).agg(F.sum(WT).alias("__pps_bsum__"))
    # one window pass over the ≤ buckets coarse rows yields BOTH the
    # exclusive bucket-start prefix and the grand total (decimal sums are
    # exact, so totalling per-bucket sums equals totalling the rows) —
    # the total then rides the broadcast coarse join instead of needing
    # its own aggregate + one-row crossJoin
    cw = Window.orderBy(BKT).rowsBetween(Window.unboundedPreceding, -1)
    cw_all = Window.orderBy(BKT).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    coarse = bsums.select(
        F.col(BKT).alias("__pps_cbkt__"),
        F.coalesce(
            F.sum("__pps_bsum__").over(cw), F.lit(0).cast("decimal(38,12)")
        ).alias("__pps_bstart__"),
        F.sum("__pps_bsum__").over(cw_all).alias("__pps_w__"),
    )
    fw = (
        Window.partitionBy(BKT)
        .orderBy(H, key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lo = F.col("__pps_bstart__") + F.coalesce(
        F.sum(WT).over(fw), F.lit(0).cast("decimal(38,12)")
    )
    kd = F.lit(float(k))
    w_d = F.col("__pps_w__").cast("double")
    crosses = F.floor(
        (F.col("__pps_lo__") + F.col(WT)).cast("double") * kd / w_d
    ) > F.floor(F.col("__pps_lo__").cast("double") * kd / w_d)
    return (
        base.join(F.broadcast(coarse), F.col(BKT) == F.col("__pps_cbkt__"))
        .withColumn("__pps_lo__", lo)  # windows can't sit inside a filter
        .filter(crosses)
        .drop(BKT, H, WT, "__pps_cbkt__", "__pps_bstart__", "__pps_w__", "__pps_lo__")
    )


def temperature_resample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-based group rebalancing (the multilingual-corpus
    resampling scheme: sample groups proportional to ``share^alpha``
    instead of their raw share, pulling the distribution toward uniform
    as ``alpha`` drops below 1).

    Per group g with row count ``n_g``, the kept fraction is
    ``f_g = w_g / max_h(w_h)`` with ``w_g = n_g^(alpha-1)`` — the
    smallest group keeps everything (f=1) and larger groups downsample
    toward the temperature-flattened shares, which preserves as much
    data as possible for the given temperature (no group is upsampled;
    duplicate-based upsampling is a training-loop concern, not a corpus
    transform).  Selection is the deterministic md5-bucket predicate
    (``hash_bucket``): reproducible across runs/engines, and a row's
    fate never changes when other groups grow.

    Scale: one tiny group-count aggregate (map-side combined), a
    broadcast join of the per-group thresholds, and a pure filter — no
    shuffle of the data, no sampling state.  Fractions are truncated to
    6 digits so the oracle (and any external reimplementation) computes
    bit-identical thresholds.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n__"))
    w = F.pow(F.col("__n__").cast("double"), F.lit(float(alpha) - 1.0))
    weights = counts.select(group_col, w.alias("__w__"))
    wmax = weights.agg(F.max("__w__").alias("__wmax__"))
    thresholds = weights.crossJoin(F.broadcast(wmax)).select(
        F.col(group_col).alias("__tr_group__"),
        F.floor(
            F.floor(F.col("__w__") / F.col("__wmax__") * 1e6) / 1e6 * _BUCKETS
        ).cast("long").alias("__keep_buckets__"),
    )
    # null-safe equality: a NULL group value is a real group (the groupBy
    # above counts it) — a plain equi-join would silently drop its rows
    return (
        df.join(
            F.broadcast(thresholds),
            F.col(group_col).eqNullSafe(F.col("__tr_group__")),
        )
        .filter(hash_bucket(F.col(key_col)) < F.col("__keep_buckets__"))
        .drop("__tr_group__", "__keep_buckets__")
    )


def top_p_by_group(
    df: DataFrame,
    key_col: str,
    score_col: str,
    group_col: str | list[str],
    p: float,
    digits: int = 6,
    octave_bins: int = 64,
) -> DataFrame:
    """Nucleus (top-p) selection per group: keep the highest-scoring rows
    of each group until they cover fraction ``p`` of the group's total
    score mass — "keep the best documents per domain until 60% of the
    quality mass" — the mass-targeted counterpart to the count-targeted
    :func:`sample_n_per_group` and the share-targeted
    :func:`temperature_resample`.  Unlike a fixed per-group quota, the
    kept COUNT adapts to the score distribution: a domain whose quality
    is concentrated in a few documents keeps few; a flat domain keeps
    many.

    Rows are ranked by ``(score desc, md5(key), key)`` — deterministic
    across runs, partitionings, and engines — and a row is kept while
    the mass BEFORE it is still under ``p × total`` (so the boundary-
    crossing row is included, and at least one row survives per group
    with any positive mass).  Scores must be non-negative (a negative
    score makes "mass" meaningless — raises on sight, job-side);
    NULL/NaN/±Inf scores exclude the row from both the mass and the
    output.  Score sums accumulate as ``decimal(38, digits)`` so the
    cumulative boundaries are exact and reproducible in an external SQL
    engine (same discipline as :func:`pps_sample`).

    Scale — two-level selection, NEVER a full per-group sort.  Group
    keys here are often low-cardinality and heavily skewed (per-language
    curation: the top language of a web corpus is 40%+ of the data, tens
    of TB at 100 TB), so a ``Window.partitionBy(group)`` sort would put
    one group in one task.  Instead:

    1. every row gets a log-scale score bin — ``floor(log2(score) ×
       octave_bins)`` (zero scores get a sentinel bottom bin) — a pure
       projection, monotone in score, so bins partition the per-group
       ranking into contiguous runs;
    2. ONE map-side-combined aggregate sums mass per (group, bin): the
       coarse table, ≤ a few thousand rows per group regardless of data
       size;
    3. a window over that bounded coarse table (the documented
       coarse-table window class) yields each bin's exclusive
       higher-mass prefix and the group total — bins whose prefix
       already reaches ``p × total`` are dropped by a plain filter
       before any sort;
    4. the per-row boundary rule runs inside a window partitioned by
       (group, bin): each sort task holds ONE bin of one group — rows
       within a ``2^(1/octave_bins)`` (~1.1% at the default 64) score
       ratio — not the whole group.

    The kept set is bit-identical to the single-window formulation
    (decimal sums are exact and associative; bin prefix + in-bin prefix
    equals the global exclusive prefix), so the plain window-SQL oracle
    still reproduces it verbatim.  Degenerate case: if a group's entire
    mass sits inside one bin (all scores within ~1.1% of each other, or
    all equal), that bin is the boundary bin and its sort task holds the
    group — the same place a quantile-histogram scheme degenerates when
    the distribution collapses to a point.
    """
    from pyspark.sql import Window

    if not (0.0 < p <= 1.0):
        raise PhaserError(f"top_p_by_group needs 0 < p <= 1, got {p}")
    if not (1 <= octave_bins <= _OCTAVE_BINS_MAX):
        # above ~2e6 bins/octave the subnormal-positive bin range
        # floor(log2(x)·B) (down to -1074·B) crosses below the zero
        # sentinel -2^31 and bin order silently inverts
        raise PhaserError(
            f"top_p_by_group needs 1 <= octave_bins <= {_OCTAVE_BINS_MAX}, "
            f"got {octave_bins}"
        )
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    key = F.col(key_col)
    sd = F.col(score_col).cast("double")
    finite = ~F.isnan(sd) & (sd > float("-inf")) & (sd < float("inf"))
    checked = F.when(
        finite & (sd < 0),
        F.raise_error(
            F.concat(
                F.lit("top_p_by_group: negative score "),
                sd.cast("string"),
                F.lit(f" in column '{score_col}' — score mass needs >= 0"),
            )
        ),
    ).otherwise(
        F.when(finite, F.round(sd, digits).cast(f"decimal(38,{digits})"))
    )
    zero_dec = F.lit(0).cast(f"decimal(38,{digits})")
    staged = df.withColumn("__tp_score__", checked).filter(
        F.col("__tp_score__").isNotNull()
    )
    # log-scale bin: equal scores share a bin, higher bins hold strictly
    # higher scores, and the bin is a pure function of the score (no
    # per-group max pre-pass, no sampling) — deterministic across jobs
    sb = F.col("__tp_score__").cast("double")
    bin_expr = F.when(sb <= 0, F.lit(-(1 << 31)).cast("long")).otherwise(
        F.floor(F.log2(sb) * F.lit(float(octave_bins))).cast("long")
    )
    binned = staged.withColumn("__tp_bin__", bin_expr)
    bmass = binned.groupBy(*groups, "__tp_bin__").agg(
        F.sum("__tp_score__").alias("__tp_bmass__")
    )
    cw = (
        Window.partitionBy(*groups)
        .orderBy(F.desc("__tp_bin__"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cw_all = Window.partitionBy(*groups).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    galias = [f"__tp_g{i}__" for i in range(len(groups))]
    coarse = bmass.select(
        *[F.col(g).alias(a) for g, a in zip(groups, galias)],
        F.col("__tp_bin__").alias("__tp_cbin__"),
        F.coalesce(F.sum("__tp_bmass__").over(cw), zero_dec).alias(
            "__tp_above__"
        ),
        F.sum("__tp_bmass__").over(cw_all).alias("__tp_total__"),
    )
    # null-safe group equality: NULL group values form a real group in
    # the coarse aggregate and must rejoin their own rows
    cond = F.col("__tp_bin__") == F.col("__tp_cbin__")
    for g, a in zip(groups, galias):
        cond = cond & F.col(g).eqNullSafe(F.col(a))
    pd_ = F.lit(float(p))
    total_d = F.col("__tp_total__").cast("double")
    # bins whose higher-score prefix already covers p×total can't keep a
    # row (every row's mass_before ≥ the bin prefix) — plain filter, no
    # sort; what remains is the fully-kept bins plus ONE boundary bin
    survivors = binned.join(coarse, cond).filter(
        F.col("__tp_above__").cast("double") < pd_ * total_d
    )
    w_bin = Window.partitionBy(*groups, "__tp_bin__").orderBy(
        F.desc("__tp_score__"), F.md5(key.cast("string")), key
    )
    in_bin_before = F.coalesce(
        F.sum("__tp_score__").over(
            w_bin.rowsBetween(Window.unboundedPreceding, -1)
        ),
        zero_dec,
    )
    # bin prefix + exclusive in-bin prefix == the global exclusive prefix
    # (decimal addition is exact), so this is the original rule verbatim
    mass_before = F.col("__tp_above__") + in_bin_before
    return (
        survivors.withColumn(
            "__tp_keep__", mass_before.cast("double") < pd_ * total_d
        )
        .filter(F.col("__tp_keep__"))
        .drop(
            "__tp_score__",
            "__tp_bin__",
            "__tp_keep__",
            "__tp_cbin__",
            "__tp_above__",
            "__tp_total__",
            *galias,
        )
    )


def sample_n_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str | list[str],
    n: int,
) -> DataFrame:
    """Exactly ``min(n, |group|)`` rows per group, chosen by the
    deterministic md5 order of ``key_col`` — the fixed-quota counterpart
    to the fraction-based samplers (inspection samples, per-language
    eval slices, debugging subsets).  Same row set every run, on any
    engine.

    Scale — two-level selection, NEVER a full per-group sort (same
    design as :func:`top_p_by_group`; the flagship per-language use
    keys on a low-cardinality skewed column).  The md5 order makes the
    bucketing trivial: the first md5 byte is uniform over 256 buckets,
    so ONE map-side-combined count per (group, bucket) + a window over
    that bounded coarse table gives each bucket's exclusive prefix
    count; buckets whose prefix already reaches ``n`` are dropped by a
    plain filter, and the exact rank rule (``prefix + in-bucket rank <=
    n``) sorts only the surviving buckets — each task holds ~1/256th of
    one group.  The kept set is identical to the single-window
    ``row_number() <= n`` formulation (bucket order is a prefix of the
    md5 order), so oracle SQL replaying that rule is unchanged.
    """
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"sample_n_per_group needs n >= 1, got {n}")
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    key = F.col(key_col)
    md5 = F.md5(key.cast("string"))
    # first md5 byte: 256 uniform buckets, monotone prefix of the order
    bucket = F.conv(F.substring(md5, 1, 2), 16, 10).cast("int")
    staged = df.withColumn("__sn_bkt__", bucket)
    bcnt = staged.groupBy(*groups, "__sn_bkt__").agg(
        F.count(F.lit(1)).alias("__sn_bn__")
    )
    cw = (
        Window.partitionBy(*groups)
        .orderBy("__sn_bkt__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    galias = [f"__sn_g{i}__" for i in range(len(groups))]
    coarse = bcnt.select(
        *[F.col(g).alias(a) for g, a in zip(groups, galias)],
        F.col("__sn_bkt__").alias("__sn_cbkt__"),
        F.coalesce(F.sum("__sn_bn__").over(cw), F.lit(0)).alias("__sn_before__"),
    )
    # null-safe throughout: a NULL key has a NULL md5/bucket but is still
    # a rankable row (it sorts first, like the single-window formulation)
    cond = F.col("__sn_bkt__").eqNullSafe(F.col("__sn_cbkt__"))
    for g, a in zip(groups, galias):
        cond = cond & F.col(g).eqNullSafe(F.col(a))
    # buckets whose lower-md5 prefix already filled the quota can't
    # contribute — plain filter, no sort; each surviving (group, bucket)
    # is its own bounded sort task
    w_bkt = Window.partitionBy(*groups, "__sn_bkt__").orderBy(md5, key)
    return (
        staged.join(coarse, cond)
        .filter(F.col("__sn_before__") < n)
        .withColumn("__sn_rn__", F.row_number().over(w_bkt))
        .filter(F.col("__sn_before__") + F.col("__sn_rn__") <= n)
        .drop("__sn_bkt__", "__sn_rn__", "__sn_cbkt__", "__sn_before__", *galias)
    )


def topk_by_group(
    df: DataFrame,
    key_col: str,
    score_col: str,
    group_col: str | list[str],
    k: int,
    descending: bool = True,
    octave_bins: int = 64,
) -> DataFrame:
    """Top-``k`` rows per group by a numeric score — the count-targeted
    generalization of the two-level bucket trick to an arbitrary ordering
    column ("best k documents per language", "k most expensive orders per
    region").  This closes the designated follow-up on
    ``topk_per_group_step`` (SCALE.md keyed-window audit): that step's
    ``row_number`` window sorts each group in one task, which is right
    for per-customer/per-query keys but wrong for a low-cardinality
    skewed key where the dominant group is tens of TB at 100 TB.

    Rows are ranked ``(score desc|asc, md5(key), key)`` — deterministic
    across runs, partitionings, and engines — and the first ``k`` per
    group are kept, exactly like the single-window ``row_number() <= k``
    rule the SQL oracle replays.  NULL/NaN scores exclude the row (a row
    that cannot be ordered cannot hold a rank); ±Inf participate
    normally (they order to the extremes).  ``key_col`` must be unique
    per row (the :func:`pps_sample` contract): rows sharing a key tie
    completely in the order, so which of them takes a rank at the ``k``
    boundary is partition-order-dependent.

    Scale — two-level selection, NEVER a full per-group sort (same shape
    as :func:`top_p_by_group`, counts instead of mass):

    1. every row gets a sign-aware log-scale score bin — a pure
       projection, monotone over ALL doubles (positives by
       ``floor(log2(x)·octave_bins)``, zero at a sentinel between the
       sign ranges, negatives mirrored below it) — equal scores always
       share a bin, so bins split the per-group ranking into contiguous
       runs;
    2. ONE map-side-combined count per (group, bin) builds the bounded
       coarse table;
    3. a window over the coarse table (the documented coarse-table
       window class) yields each bin's exclusive better-score prefix
       count; bins whose prefix already reaches ``k`` cannot contribute
       a row and are dropped by a plain filter before any sort;
    4. the exact rule (``prefix + in-bin rank <= k``) sorts only the
       surviving bins — each task holds one bin of one group, rows
       within a ~``2^(1/octave_bins)`` score ratio, not the whole group.

    Degenerate case: a group whose entire score range sits inside one
    bin (all equal, or within ~1.1% at the default 64 bins/octave) puts
    that group in one sort task — same place a quantile-histogram scheme
    degenerates when the distribution collapses to a point.
    """
    from pyspark.sql import Window

    if k < 1:
        raise PhaserError(f"topk_by_group needs k >= 1, got {k}")
    if not (1 <= octave_bins <= _OCTAVE_BINS_MAX):
        # the sign-aware bin layout needs 1074·B < 2^31 so subnormal
        # bins stay inside their sign range's sentinels; above ~2e6
        # bins/octave monotonicity silently breaks — reject loudly
        raise PhaserError(
            f"topk_by_group needs 1 <= octave_bins <= {_OCTAVE_BINS_MAX}, "
            f"got {octave_bins}"
        )
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    key = F.col(key_col)
    sd = F.col(score_col).cast("double")
    # ascending top-k == descending top-k of the negated score (exact for
    # doubles); ranking below is always score-descending on __tk_ord__
    ord_score = sd if descending else -sd
    staged = df.withColumn(
        "__tk_ord__",
        F.when(~F.isnan(ord_score), ord_score),
    ).filter(F.col("__tk_ord__").isNotNull())
    # sign-aware log bin, monotone over all doubles:
    #   x > 0:  floor(log2(x)·B)            in  [-1074·B, 1024·B]
    #   x = 0:  -2^31                        (between the sign ranges)
    #   x < 0:  -2^32 - floor(log2(-x)·B)   in  [-2^32 - 1024·B, -2^32 + 1074·B]
    # (+Inf -> 2^31 above every finite bin, -Inf below; log2(inf)=inf and
    # floor(inf) is not castable, so the infinite cases get sentinels)
    ob = F.lit(float(octave_bins))
    x = F.col("__tk_ord__")
    pos_inf, neg_inf = F.lit(float("inf")), F.lit(float("-inf"))
    bin_expr = (
        F.when(x == pos_inf, F.lit(1 << 31).cast("long"))
        .when(x == neg_inf, F.lit(-(1 << 33)).cast("long"))
        .when(x > 0, F.floor(F.log2(x) * ob).cast("long"))
        .when(x == 0, F.lit(-(1 << 31)).cast("long"))
        .otherwise(
            (F.lit(-(1 << 32)) - F.floor(F.log2(-x) * ob)).cast("long")
        )
    )
    binned = staged.withColumn("__tk_bin__", bin_expr)
    bcnt = binned.groupBy(*groups, "__tk_bin__").agg(
        F.count(F.lit(1)).alias("__tk_bn__")
    )
    cw = (
        Window.partitionBy(*groups)
        .orderBy(F.desc("__tk_bin__"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    galias = [f"__tk_g{i}__" for i in range(len(groups))]
    coarse = bcnt.select(
        *[F.col(g).alias(a) for g, a in zip(groups, galias)],
        F.col("__tk_bin__").alias("__tk_cbin__"),
        F.coalesce(F.sum("__tk_bn__").over(cw), F.lit(0)).alias(
            "__tk_before__"
        ),
    )
    # null-safe group equality: NULL group values form a real group in
    # the coarse aggregate and must rejoin their own rows
    cond = F.col("__tk_bin__") == F.col("__tk_cbin__")
    for g, a in zip(groups, galias):
        cond = cond & F.col(g).eqNullSafe(F.col(a))
    # bin prefix + in-bin rank == the global rank (equal scores share a
    # bin), so this is the single-window row_number rule verbatim
    w_bin = Window.partitionBy(*groups, "__tk_bin__").orderBy(
        F.desc("__tk_ord__"), F.md5(key.cast("string")), key
    )
    return (
        binned.join(coarse, cond)
        .filter(F.col("__tk_before__") < k)
        .withColumn("__tk_rn__", F.row_number().over(w_bin))
        .filter(F.col("__tk_before__") + F.col("__tk_rn__") <= k)
        .drop(
            "__tk_ord__",
            "__tk_bin__",
            "__tk_rn__",
            "__tk_cbin__",
            "__tk_before__",
            *galias,
        )
    )


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    len_col: str | None = None,
    shard_col: str = "shard",
    digits: int = 6,
    seed: str | int | None = None,
) -> DataFrame:
    """Deterministic, weight-balanced shard assignment — the write-side
    counterpart of the packing/budget family: split a corpus into
    ``n_shards`` near-equal TOKEN-mass shards (``len_col``; row-balanced
    when None) for training-data output layout.  A document's shard is a
    pure function of the corpus content — ``floor(mass_before × n /
    total)`` over the (md5(key), key) order — so re-running the pipeline
    reproduces the exact same shards on any engine or partitioning, and
    each shard's mass is within one document of ``total / n``.

    Weights must be non-negative and finite, and must fit
    ``decimal(38, digits)`` (negative / NaN / ±Inf / overflow raise on
    sight, job-side — same discipline as :func:`pps_sample`: a silently
    zeroed heavy document would skew every shard boundary); NULL weights
    count as 0 (the row still gets a shard — it sits between its md5
    neighbors).  NULL keys order first, like every md5-ordered sampler
    here.  An all-zero-mass frame puts everything in shard 0.
    ``key_col`` must be unique per row (also like :func:`pps_sample`):
    rows sharing a key tie completely in the order, so the prefix split
    between them — and hence a shard boundary falling between them — is
    partition-order-dependent.
    ``seed`` salts the order (``md5(seed || key)``) — each training
    epoch gets a different but equally-balanced, equally-reproducible
    document order/shard mix.

    Contract nuance vs this module's hash splits: shard membership is
    CORPUS-relative (a balanced layout needs the global mass), so
    appending documents shifts boundaries — rerunning on the same corpus
    is bit-stable, rerunning on a grown corpus is not.  When a row's
    assignment must survive corpus growth, that is
    :func:`split_by_hash` / :func:`hash_bucket` (membership a pure
    function of the row), at the cost of only probabilistic balance.

    Scale — two-level prefix sums, NEVER a global sort: the first md5
    byte gives 256 uniform buckets that form a PREFIX of the row order,
    so ONE map-side-combined decimal sum per bucket + a window over that
    ≤256-row coarse table yields each bucket's exclusive prefix mass and
    the grand total; the in-bucket exclusive prefix runs partitioned by
    bucket (each task ~1/256th of the data).  Decimal accumulation keeps
    the boundaries exact and engine-reproducible; the final ``floor``
    runs in double with the same expression the SQL oracle uses."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise PhaserError(f"assign_shards needs n_shards >= 1, got {n_shards}")
    key = F.col(key_col)
    if seed is None:
        md5 = F.md5(key.cast("string"))
    else:
        md5 = F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string")))
    dec = f"decimal(38,{digits})"
    zero = F.lit(0).cast(dec)
    if len_col is None:
        wt = F.lit(1).cast(dec)
    else:
        ld = F.col(len_col).cast("double")
        # decimal(38,d) holds < 1e(38-d); reject before the cast would
        # return NULL (non-ANSI) and the NULL-means-0 coalesce below
        # silently zeroed the heaviest rows
        bad = (ld < 0) | F.isnan(ld) | (ld >= F.lit(float(10 ** (38 - digits))))
        wt = F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit("assign_shards: negative/NaN/Inf/overflow weight "),
                    ld.cast("string"),
                    F.lit(f" in column '{len_col}'"),
                )
            ),
        ).otherwise(F.coalesce(F.round(ld, digits).cast(dec), zero))
    bucket = F.conv(F.substring(md5, 1, 2), 16, 10).cast("int")
    staged = df.withColumn("__sh_wt__", wt).withColumn("__sh_bkt__", bucket)
    bmass = staged.groupBy("__sh_bkt__").agg(
        F.sum("__sh_wt__").alias("__sh_bm__")
    )
    # NULL bucket (NULL key) orders first — asc_nulls_first matches the
    # single-window (md5, key) order where NULL md5 sorts first
    cw = (
        Window.partitionBy()
        .orderBy(F.col("__sh_bkt__").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cw_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # bounded coarse-table window: <= 257 rows regardless of data size
    coarse = bmass.select(
        F.col("__sh_bkt__").alias("__sh_cbkt__"),
        F.coalesce(F.sum("__sh_bm__").over(cw), zero).alias("__sh_before__"),
        F.sum("__sh_bm__").over(cw_all).alias("__sh_total__"),
    )
    w_bkt = Window.partitionBy("__sh_bkt__").orderBy(md5, key)
    in_bkt = F.coalesce(
        F.sum("__sh_wt__").over(
            w_bkt.rowsBetween(Window.unboundedPreceding, -1)
        ),
        zero,
    )
    lo = (F.col("__sh_before__") + in_bkt).cast("double")
    tot = F.col("__sh_total__").cast("double")
    shard = (
        F.when(tot <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.floor(lo * F.lit(float(n_shards)) / tot),
                F.lit(n_shards - 1),
            )
        )
        .cast("int")
    )
    return (
        staged.join(
            F.broadcast(coarse),
            F.col("__sh_bkt__").eqNullSafe(F.col("__sh_cbkt__")),
        )
        .withColumn(shard_col, shard)
        .drop(
            "__sh_wt__", "__sh_bkt__", "__sh_cbkt__",
            "__sh_before__", "__sh_total__",
        )
    )


def repeat_to_budget(
    df: DataFrame,
    key_col: str,
    len_col: str,
    group_col: str,
    budgets: dict | int,
    default_budget: int | None = None,
    max_epochs: int = 4,
    buckets: int = 1024,
    epoch_col: str = "epoch",
    max_groups: int = 100_000,
) -> DataFrame:
    """Fill token budgets by REPEATING data (epoch-style upsampling):
    where :func:`token_budget_select` can only keep ≤1 copy of each
    document, training mixes routinely run low-resource / high-quality
    groups for multiple epochs.  Per group with total tokens ``T`` and
    budget ``B``: emit ``e = min(B // T, max_epochs)`` full copies
    (``epoch_col`` = 0…e−1), then — unless the epoch cap was hit — fill
    the remainder ``B − e·T`` with the deterministic md5-prefix
    selection of :func:`token_budget_select` as the final partial
    epoch.  So the output token count per group is within one document
    of ``min(B, max_epochs·T)``, and the partial-epoch subset is the
    SAME stable prefix every run.

    ``max_epochs`` bounds replication (the standard repeated-data
    guard — beyond a few epochs repetition hurts more than it helps);
    groups absent from ``budgets`` use ``default_budget`` or are
    dropped when it is None.

    Scale: one tiny per-group length aggregate; the group totals (one
    row per mix group — languages/domains/sources, HARD-capped at
    ``max_groups`` with a limit-before-collect so an id-like
    ``group_col`` raises instead of shipping a corpus-distinct to the
    driver) visit the driver to compute epoch counts, exactly like an
    ``ExtraMapping``; full copies are a broadcast join + a bounded
    ``explode(sequence(0, e−1))`` (never more than ``max_epochs``-way
    replication); the remainder reuses the two-level bucketed prefix
    selection, so no group ever needs a single-task sort.
    """
    if max_epochs < 1:
        raise ValueError(f"repeat_to_budget needs max_epochs >= 1, got {max_epochs}")
    if max_groups < 1:
        raise ValueError(f"repeat_to_budget needs max_groups >= 1, got {max_groups}")
    # limit BEFORE collect (the drift_monitor_step pattern,
    # quality.py::_counts): the cap must bound the driver transfer
    # itself, not fire after an id-like group column already shipped a
    # corpus-distinct to the driver
    totals = (
        df.groupBy(F.col(group_col).alias("__rb_g"))
        .agg(F.sum(F.col(len_col).cast("long")).alias("__rb_t"))
        .limit(max_groups + 1)
        .collect()
    )
    if len(totals) > max_groups:
        raise PhaserError(
            f"repeat_to_budget: column '{group_col}' has more than "
            f"{max_groups} distinct groups — mix groups are "
            "languages/domains/sources, not ids; pass a coarser "
            "group_col or raise max_groups explicitly"
        )
    plan: dict = {}
    for r in totals:
        g, t = r["__rb_g"], r["__rb_t"]
        if g is None:
            # a NULL group has no budget identity (and literal-map keys
            # cannot be NULL) — mirror token_budget_select's "unlisted
            # groups are dropped" rule
            continue
        if isinstance(budgets, dict):
            b = budgets.get(g, default_budget)
        else:
            b = int(budgets)
        if b is None or int(b) <= 0 or not t or t <= 0:
            # no/zero/negative budget => zero rows for the group (a
            # negative b would floor-divide to e = -1 and emit a bogus
            # negative-epoch remainder otherwise)
            continue
        e = min(int(b) // int(t), max_epochs)
        rem = int(b) - e * int(t) if e < max_epochs else 0
        plan[g] = (e, rem)
    full_rows = [(g, e) for g, (e, _) in plan.items() if e > 0]
    parts = []
    if full_rows:
        # epoch counts as a literal map — a pure projection, no join;
        # the map is bounded by the number of mix groups
        emap = F.create_map(
            *[x for g, e in full_rows for x in (F.lit(g), F.lit(e))]
        )
        copies = (
            df.withColumn("__rb_e", emap[F.col(group_col)])
            .filter(F.col("__rb_e").isNotNull())
            .withColumn(
                epoch_col,
                F.explode(F.sequence(F.lit(0), F.col("__rb_e") - 1)),
            )
            .drop("__rb_e")
        )
        parts.append(copies)
    rem_budgets = {g: rem for g, (_, rem) in plan.items() if rem > 0}
    if rem_budgets:
        rem = token_budget_select(
            df.filter(F.col(group_col).isin(*rem_budgets.keys())),
            key_col,
            len_col,
            group_col,
            budgets=rem_budgets,
            buckets=buckets,
        )
        epoch_of = F.create_map(
            *[x for g in rem_budgets for x in (F.lit(g), F.lit(plan[g][0]))]
        )
        parts.append(rem.withColumn(epoch_col, epoch_of[F.col(group_col)]))
    if not parts:
        return df.limit(0).withColumn(epoch_col, F.lit(0))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
