"""10x-scale smoke gate (VERDICT r11 #6, promoted from the r11 one-off).

The round-11 ad-hoc version of this check found the only real scale
cliff of rounds 7-11 (semantic_dedup quadratic at fixed n_cells); this
commits the harness so each round's touched heavy ops re-run at 10x with
the sub-linear adjudication emitted mechanically.

What it does:
  1. Builds (once) a 10x replica of sf0.1 in /tmp/sf1.0x — fact tables
     replicated with replica-distinct primary keys (``id*10 + r``),
     texts/vectors copied verbatim (the corpus genuinely contains 10
     exact copies of every document/vector — the worst case for dedup
     ops), dimension tables copied 1x so joins keep their shape.
  2. Runs each named query end-to-end into a noop sink at sf0.1 and at
     the 10x replica (best of ``--runs`` passes, default 2).
  3. Prints a markdown adjudication table (paste into SCALE.md): with
     10x data on fixed local[32] cores, time ratio <= 11 is sub-linear,
     <= 14 is ~linear (fixed per-query overhead biases the ratio DOWN,
     so anything materially above 14 is a super-linear signal to
     adjudicate, and above 25 is a cliff).
  4. Records the md5 host probe so a degraded window is visible in the
     table itself.

Usage:
    python tests/scale_smoke.py                       # default: this
                                                      # round's touched ops
    python tests/scale_smoke.py q1 q2 ...             # explicit list
    python tests/scale_smoke.py --rebuild             # force new replica
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from phaser_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICA = os.environ.get("SPARK_GRAFT_REPLICA_DIR", "/tmp/sf1.0x")
FACTOR = 10

# replica-distinct primary keys per fact table; dims copy verbatim
FACT_KEYS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],  # keeps the orders join consistent
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

# Round-12 default set: the ops this round's commits touched
# (similarity arrow paths, semantic dedup auto-cells, renumber bands via
# the checkpoint pipeline query).
DEFAULT_QUERIES = [
    "semantic_dedup_embeddings",
    "ann_ivf_topk",
    "ann_recall_ivf",
    "kmeans_embedding_cells",
    # round-12 second-half additions
    "substring_dup_docs",
    "substring_scrub_docs",
    "dsir_importance_docs",
    "bpe_merges_docs",
    "media_phash_docs",
]


def build_replica(
    spark,
    src: str = SRC,
    dst: str = REPLICA,
    force: bool = False,
    distinct_vectors: bool = False,
    distinct_values: bool = False,
):
    """``distinct_vectors=False`` (default) copies vectors VERBATIM — the
    corpus then genuinely contains FACTOR exact copies of every
    embedding, the dedup worst case: true near-dup pair count rises
    ~FACTOR²/2-fold per family, so dedup ratios read super-linear for a
    DATA reason.  ``distinct_vectors=True`` instead applies a
    deterministic per-replica sign-flip pattern to the embedding
    (norms preserved; cosines between different replicas of the same
    vector collapse toward 0), isolating CODE linearity: the pair
    structure then scales exactly with the corpus.

    ``distinct_values=True`` (r13, the exact-percentile memory probe):
    verbatim replication does NOT grow the DISTINCT value set of a
    numeric column, and Spark's exact ``Percentile`` buffers a
    value→count map — so the default replica understates the very
    buffer the percentile family's 100 TB hazard lives in (FACTOR
    copies of one value merge into one slot).  This variant offsets
    ``l_extendedprice`` by ``__r`` cents per replica (replica 0 keeps
    the original values), so the distinct-value count genuinely grows
    ~FACTOR-fold and the buffer growth becomes measurable."""
    from pyspark.sql import functions as F

    marker = os.path.join(dst, "_COMPLETE")
    if os.path.exists(marker) and not force:
        return dst
    os.makedirs(dst, exist_ok=True)
    for table, keys in FACT_KEYS.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        rep = df.crossJoin(
            spark.range(FACTOR).select(F.col("id").alias("__r"))
        )
        for k in keys:
            rep = rep.withColumn(k, F.col(k) * FACTOR + F.col("__r"))
        if distinct_values and table == "lineitem":
            dt = df.schema["l_extendedprice"].dataType.simpleString()
            rep = rep.withColumn(
                "l_extendedprice",
                (F.col("l_extendedprice") + F.col("__r") * 0.01).cast(dt),
            )
        if distinct_vectors and table == "embeddings":
            r = F.col("__r")
            rep = rep.withColumn(
                "embedding",
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.sequence(F.lit(0), F.size("embedding") - 1),
                    # replica 0 keeps the original sign pattern
                    lambda x, i: F.when(
                        ((r * 31 + i * 7 + r * i) % 2 == 0) | (r == 0), x
                    ).otherwise(-x),
                ),
            )
        rep.drop("__r").write.mode("overwrite").parquet(
            os.path.join(dst, f"{table}.parquet")
        )
    for table in DIMS:
        spark.read.parquet(os.path.join(src, f"{table}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{table}.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return dst


def run(names: list[str], runs: int = 2, replica: str | None = None) -> list[dict]:
    replica = replica or REPLICA
    probe = bench.host_probe()
    window = "healthy" if probe <= bench.HEALTHY_PROBE_MAX else "degraded"
    spark = get_spark(app_name="phaser_spark_scale_smoke")
    build_replica(spark, dst=replica)
    queries = entrymod.queries()
    rows = []

    def best_of(fn, sf_dir) -> float:
        best = None
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    print(f"md5 probe: {probe} s ({window} window; healthy ref "
          f"{bench.HEALTHY_PROBE_SEC} s)\n")
    print("| query | 1x (s) | 10x (s) | ratio | adjudication |")
    print("|---|---|---|---|---|")
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"| {name} | — | — | — | UNKNOWN QUERY |")
            continue
        try:
            t1 = best_of(fn, SRC)
            t10 = best_of(fn, replica)
        except Exception as e:
            print(f"| {name} | — | — | — | ERROR {type(e).__name__}: {e} |")
            continue
        ratio = round(t10 / t1, 1) if t1 > 0 else float("inf")
        if ratio <= 11:
            verdict = "sub-linear ✓"
        elif ratio <= 14:
            verdict = "≈linear ✓"
        elif ratio <= 25:
            verdict = "SUPER-LINEAR — adjudicate"
        else:
            verdict = "CLIFF — fix before shipping"
        print(f"| {name} | {t1} | {t10} | {ratio}x | {verdict} |")
        rows.append({"query": name, "t1": t1, "t10": t10, "ratio": ratio,
                     "verdict": verdict, "probe": probe, "window": window})
    return rows


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    force = "--rebuild" in sys.argv
    distinct = "--distinct-vectors" in sys.argv
    distinct_vals = "--distinct-values" in sys.argv
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    # each variant lives in its own dir so all replicas stay cached
    # across invocations
    target = REPLICA
    if distinct:
        target = REPLICA + "-distinct"
    elif distinct_vals:
        target = REPLICA + "-distinctvals"
    if force or (
        (distinct or distinct_vals)
        and not os.path.exists(os.path.join(target, "_COMPLETE"))
    ):
        build_replica(get_spark(app_name="phaser_spark_scale_smoke"),
                      dst=target, force=force, distinct_vectors=distinct,
                      distinct_values=distinct_vals)
    run(args or DEFAULT_QUERIES, runs=runs, replica=target)
