"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query executes its full plan into a no-op sink (format("noop")) so
timings measure compute + shuffle, not driver collection.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from phaser_spark.session import get_spark

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "topk_orders_per_customer",
    "events_sessionize",
    "a1_pivot_events",
    "a3_running_sum",
    "a4_consecutive_runs",
    "j1_brand_revenue",
    "o2_dedup_keep_last",
    "p1_column_casts",
    "u6_flatten_props",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_stats",
    "multimodal_binary",
    "streaming_event_window",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="phaser_spark_bench")
    # JVM/codegen warmup so the first timed query isn't charged for session
    # bring-up (standard practice; the reference has no comparable cost)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = queries.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep the bench running; report the failure
            timings[name] = -1.0
            print(f"# bench error {name}: {type(e).__name__}: {e}", file=sys.stderr)
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
