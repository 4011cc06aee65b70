"""Regenerate tests/plan_budget.json — the committed physical-plan
fingerprints (Exchange / scan / Python-eval / nested-loop counts per
driver-contract query at sf0.001).

``tests/test_plan_budget.py`` recomputes these under the test session and
fails on ANY drift: a query that gains an Exchange, loses scan reuse, or
falls off the JVM-side path is a scale regression even when its results
stay correct.  After a DELIBERATE plan change (or a Spark upgrade), rerun:

    python tests/regen_plan_budget.py

and review the diff like source code.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from phaser_spark.plan import plan_summary  # noqa: E402
from phaser_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
BUDGET_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_budget.json")

# Queries with no stable static plan to fingerprint: streaming (separate
# harness), and queries that run a whole pipeline/CLI with tempdir side
# effects (their plan depends on the materialized checkpoint).
SKIP = {
    "streaming_event_window",
    "streaming_session_window",
    "streaming_dedup_keys",
    "streaming_stateful_user_stats",
    "streaming_sliding_window",
    "s7_checkpoint_lifecycle",
    "j3_pipe_segment_peers",
    "s1_csv_roundtrip",
    "d1_table_diff",
    "bucketed_checkpoint_agg",
    "dedup_minhash_clusters",   # iterative: executes during construction
    "dedup_incremental_minhash",  # materializes candidate caches eagerly
    "dedup_best_of_cluster",    # iterative: connected components inside
    "kmeans_embedding_cells",   # iterative: per-round centroid collect
    "graph_pagerank",           # iterative: per-round checkpoint + count
    "graph_pagerank_weighted",  # iterative: per-round checkpoint + count
    "leakage_safe_split_docs",  # iterative: connected components inside
    "leakage_split_shares_docs",  # iterative: same component step inside
    "dedup_cluster_size_stats",   # iterative: connected components inside
    "leakage_split_incremental_docs",  # iterative: components inside
    "quality_classifier_docs",  # iterative: per-round gradient collect
    "bpe_merges_docs",          # iterative: per-round argmax collect
}


def fingerprint(df) -> dict[str, int]:
    # single source of truth for node counting: the user-facing gate
    # (phaser_spark.plan) — a divergent private copy here would let the
    # committed budget drift from what assert_scalable enforces
    s = plan_summary(df)
    return {
        "exchange": s["exchanges"],
        "scan": s["scans"],
        "python": s["python_evals"],
        "nestedloop": s["nested_loops"],
        "expand": s["expands"],
    }


def compute(spark) -> dict[str, dict[str, int]]:
    out: dict[str, dict[str, int]] = {}
    for name, fn in entrymod.queries().items():
        if name in SKIP:
            continue
        # fingerprint the PRISTINE plan: frames cached by earlier queries
        # or tests would otherwise splice InMemoryRelations in (whose
        # printed form embeds the cached child plan, inflating counts)
        spark.catalog.clearCache()
        out[name] = fingerprint(fn(spark, SF))
    spark.catalog.clearCache()
    return out


if __name__ == "__main__":
    spark = get_spark(
        app_name="plan_budget_regen", master="local[4]", shuffle_partitions=4
    )
    budget = compute(spark)
    with open(BUDGET_PATH, "w") as f:
        json.dump(budget, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {BUDGET_PATH} ({len(budget)} queries)")
