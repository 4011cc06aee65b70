"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query executes its full plan into a no-op sink (format("noop")) so
timings measure compute + shuffle, not driver collection.

Expected log noise — NOT scale hazards: a handful of `WindowExec: No
Partition Defined for Window operation` warnings come from unpartitioned
windows that run over already-aggregated COARSE tables, each bounded by
construction well below a single partition's capacity:
  * pps_sample_docs — cumulative prefix over <= n_buckets rows
    (ops/sampling.py, two-level bucketed prefix; the per-doc pass IS
    partitioned by bucket)
  * leakage_split_shares_docs — share normalization over <= n_splits rows
  * drift/profile summary ranks over <= n_bins / <= max_categories rows
Every such site documents its bound in its docstring; the raw-table
passes all use partitioned windows.
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
    "a5_batch_stats",
    "a6_explode_words",
    "a7_time_rollup",
    "j1_brand_revenue",
    "j4_asof_join",
    "o2_dedup_keep_last",
    "p1_column_casts",
    "u6_flatten_props",
    "u7_flatten_all",
    "u8_fix_functions",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "text_stats",
    "multimodal_binary",
    "a9_cube_revenue",
    "j5_interval_match",
    "sketch_distinct_accuracy",
    "a10_unpivot_metrics",
    "temperature_rebalance",
    "heavy_hitters_users",
    "bloom_decontaminate",
    "token_budget_mix",
    "winsorize_prices",
    "repeated_span_scrub",
    "semantic_dedup_embeddings",
    "profile_orders",
    "kmeans_embedding_cells",
    "funnel_view_click_purchase",
    "cohort_retention_weekly",
    "rolling_user_value",
    "fuzzy_part_names",
    "standardize_prices",
    "scd2_customer_history",
    "resample_event_hours",
    "merge_user_activity",
    "quantile_bin_prices",
    "chunk_docs_rag",
    "streaming_event_window",
    "streaming_session_window",
    "semantic_decontaminate_embeddings",
    "robust_z_prices",
    "text_char_entropy",
    "epoch_mix_langs",
    "text_surprisal",
    "graph_pagerank",
    "graph_pagerank_weighted",
    "pps_sample_docs",
    "drift_prices_by_flag",
    "ewma_customer_orders",
    "media_header_triage",
    "top_p_docs_by_lang",
    "topk_docs_by_lang",
    "shard_assign_docs",
    "quality_classifier_docs",
    "pca_covariance_embeddings",
    "pq_encode_embeddings",
    "ivfpq_topk_embeddings",
    "substring_dup_docs",
    "substring_scrub_docs",
    "dsir_importance_docs",
    "bpe_merges_docs",
    "media_phash_docs",
]


# The single-core md5 probe pinned in SCALE.md's r10 drift trail: a
# healthy window on this host reads ~0.48 s; the degraded windows that
# poisoned the r10/r11 cross-round comparisons read 1.5-1.7 s.  The
# bench tags its own output with the window so promotion into SCALE.md's
# cross-round tables is mechanical (VERDICT r11 #3) instead of relying
# on a hand-run probe next to the pass.
HEALTHY_PROBE_SEC = 0.48
# ≤ nominal + 15%: the r10 trail accepted a 0.481 s window as healthy
# while the degraded regime sat at 3× — the boundary is not delicate
HEALTHY_PROBE_MAX = round(HEALTHY_PROBE_SEC * 1.15, 3)


def host_probe(iters: int = 2_000_000, reps: int = 3) -> float:
    """Min-of-reps single-core md5 chain (the exact loop SCALE.md:1369
    pinned): measures raw interpreter+hash throughput, immune to Spark
    state, so cross-round values are comparable.

    r12 decomposition caveat (SCALE.md "probe decomposition"): this
    chain is dominated by OpenSSL EVP per-call cost (2M tiny
    construct+digest calls), and that specific path measured ~3x the
    r10 pin on a host whose bytecode loops, C-call overhead and BULK
    hash throughput were simultaneously at full speed — so a degraded
    reading here conflates possible EVP/OpenSSL software regression
    with genuine scheduler drift.  ``host_probe_bulk`` isolates the
    bulk-throughput axis; both are recorded so cross-round tables can
    adjudicate which axis moved."""
    import hashlib

    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        h = b"x"
        for _ in range(iters):
            h = hashlib.md5(h).digest()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


# Healthy pin for the bulk probe, measured alongside the r12
# decomposition (md5 over 200 x 1 MiB ≈ 0.36-0.39 s when bytecode and
# C-call microbenchmarks read nominal).  Same +15% acceptance band as
# the chain probe.
HEALTHY_BULK_SEC = 0.39
HEALTHY_BULK_MAX = round(HEALTHY_BULK_SEC * 1.15, 3)


def host_probe_bulk(reps: int = 3) -> float:
    """Min-of-reps single-core BULK md5 (200 x 1 MiB buffer): isolates
    raw hash/memory throughput from the EVP per-call overhead that
    dominates :func:`host_probe`.  When the chain probe is degraded but
    this one is nominal, suite slowdowns cannot be blamed on CPU
    throughput — look at per-call/syscall overhead instead."""
    import hashlib

    buf = b"\x5a" * (1 << 20)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(200):
            hashlib.md5(buf).digest()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    warmup_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    # probe BEFORE Spark startup competes for cores
    probe_sec = host_probe()
    probe_bulk_sec = host_probe_bulk()
    host_window = "healthy" if probe_sec <= HEALTHY_PROBE_MAX else "degraded"
    if host_window == "degraded" and probe_bulk_sec <= HEALTHY_BULK_MAX:
        # chain (EVP-bound) degraded while bulk throughput is nominal:
        # the r12 decomposition regime — flag it distinctly so the
        # cross-round tables don't read a software-path regression as
        # whole-host drift
        host_window = "degraded-evp-only"
    spark = get_spark(app_name="phaser_spark_bench")
    queries = entrymod.queries()
    # Steady-state measurement: run every bench query once at the smallest
    # scale factor first so JIT/codegen compilation, Arrow/pandas-UDF worker
    # startup, and shuffle-service init are paid before the timed pass
    # (JMH-style warmup; timings below measure throughput at sf_dir, not
    # one-time session bring-up).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    if warmup_dir and os.path.isdir(warmup_dir):
        for name in BENCH_QUERIES:
            fn = queries.get(name)
            if fn is None:
                continue
            try:
                fn(spark, warmup_dir).write.mode("overwrite").format("noop").save()
            except Exception:
                pass
        # queries that cache intermediates (dedup indexes) would otherwise
        # accumulate across the run and add GC-pause noise to later timings
        spark.catalog.clearCache()
    # best-of-2: this host runs other tenants, so single-shot timings carry
    # seconds of scheduler/GC noise; min-of-N is the standard estimator for
    # achievable steady-state latency
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    samples: dict[str, list[float]] = {}

    def timed_run(name, fn) -> float | None:
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            elapsed = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
            return elapsed
        except Exception as e:  # keep the bench running; report the failure
            print(f"# bench error {name}: {type(e).__name__}: {e}", file=sys.stderr)
            return None

    for name in BENCH_QUERIES:
        fn = queries.get(name)
        if fn is None:
            continue
        got: list[float] = []
        for _ in range(max(1, runs)):
            t = timed_run(name, fn)
            if t is None:
                break
            got.append(t)
        samples[name] = got
    # the top-10 slowest get TWO extra runs (best-of-4): sub-5 s queries on
    # this shared host swing 1.3–1.5× run-to-run, the slowest queries are
    # exactly where a noise swing burns an adjudication cycle, and a
    # 2-sample spread estimate systematically understates the true band
    # (r8's profile_orders recorded 0.01 from two lucky adjacent runs)
    slowest = sorted(
        (n for n, g in samples.items() if g), key=lambda n: min(samples[n]), reverse=True
    )[:10]
    for _ in range(2):
        for name in slowest:
            t = timed_run(name, queries[name])
            if t is not None:
                samples[name].append(t)
    timings = {n: (min(g) if g else -1.0) for n, g in samples.items()}
    # run-to-run spread (max-min)/min per query: drift flags compare
    # against THIS, not a fixed 1.3× — a delta inside the query's own
    # observed spread is noise by construction
    spread = {
        n: round((max(g) - min(g)) / min(g), 2)
        for n, g in samples.items()
        if len(g) >= 2 and min(g) > 0
    }
    total = round(sum(v for v in timings.values() if v >= 0), 3)

    # Scaling slope: time every query at a 10× smaller factor too and emit
    # scaling_exponent = log(t_big/t_small) / log(sf_big/sf_small).  The 2×
    # perf bar is only checked at one scale factor — a query can be green
    # at sf0.1 and super-linear; the slope is the early warning.  Fixed
    # per-query overhead (session, planning) biases the exponent DOWN, so
    # anything >= 1.3 is a strong super-linear signal, not noise.
    exponents: dict[str, float] = {}
    small_dir = os.environ.get("SPARK_GRAFT_SMALL_SF_DIR", "/root/testdata/sf0.01")
    want_scaling = os.environ.get("SPARK_GRAFT_SCALING", "1") not in ("0", "")
    if want_scaling and os.path.isdir(small_dir) and small_dir != sf_dir:
        import math

        try:
            small_sf = float(
                os.path.basename(small_dir.rstrip("/")).replace("sf", "") or 0.01
            )
        except ValueError:
            small_sf = 0.0
    else:
        small_sf = 0.0
    # a malformed dir name or equal scale factors must skip the slope
    # estimate, not crash the bench after all the timing work is done
    if small_sf > 0 and small_sf != sf:
        # single timed run per query at the small factor: the slope only
        # needs a magnitude estimate (the sf0.1 side is already min-of-N),
        # and the warmup pass above has paid all one-time costs — keeps
        # the whole scaling pass to ~half a minute of driver-bench time
        for name in BENCH_QUERIES:
            fn = queries.get(name)
            if fn is None or timings.get(name, -1) < 0:
                continue
            best = None
            t0 = time.perf_counter()
            try:
                fn(spark, small_dir).write.mode("overwrite").format("noop").save()
                best = time.perf_counter() - t0
                spark.catalog.clearCache()
            except Exception as e:
                print(
                    f"# bench scaling error {name}: {type(e).__name__}: {e}",
                    file=sys.stderr,
                )
            if best and best > 0 and timings[name] > 0:
                exponents[name] = round(
                    math.log(timings[name] / best) / math.log(sf / small_sf), 2
                )
    # The driver captures only the LAST ~2000 chars of stdout and parses the
    # final JSON line; r6/r7 snapshots came back `parsed: null` because the
    # full line (59 queries at 3 decimals + spread + scaling_exponent) blew
    # past that window.  So: spread/exponents go ONLY to bench_history.json,
    # timings print at 2 decimals, and if the line still exceeds the budget
    # it keeps only the slowest queries that fit (the full per-query data is
    # durable in bench_history.json under a round key either way).
    # r13 line-budget fix (VERDICT r12 item 2): with 74 queries the r12
    # line blew the driver's ~2000-char capture window and the slowest-
    # first truncation dropped the 10 FASTEST queries from PERF tracking.
    # Three measurement-neutral compressions restore the full contract
    # (timing methodology untouched; the per-query values are identical
    # numbers, just printed tighter):
    #   * compact JSON separators (no space after ':'/',': ~160 chars),
    #   * runs/probe_sec/probe_bulk_sec/host_window move to
    #     bench_history.json's local_pending block only (~95 chars) —
    #     they were diagnostics, never part of the driver contract,
    #   * the existing 2-decimal -> 1-decimal fallback now actually fits
    #     (1,939 chars at r12 values vs the 1,980 budget).
    # If a future query list still overflows, truncation keeps
    # PREVIOUSLY-REPORTED queries first (names parsed from the newest
    # BENCH_r*.json) so round-over-round tracking never loses a query.
    dumps = lambda obj: json.dumps(obj, separators=(",", ":"))
    compact = {n: round(v, 2) for n, v in timings.items()}
    line = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": compact,
        "sf": sf,
    }
    # 1980: the driver's capture window is ~2000 chars and the JSON line is
    # the final line of stdout — r10's 1900 budget truncated 2 queries a
    # wider budget would have carried (VERDICT r10 nit #4)
    budget = 1980
    if len(dumps(line)) > budget:
        # first fallback: 1-decimal timings (the full 3-decimal data is
        # durable in bench_history.json either way) — only then truncate
        coarse = {n: round(v, 1) for n, v in timings.items()}
        if len(dumps({**line, "queries": coarse})) <= budget:
            line["queries"] = compact = coarse
    if len(dumps(line)) > budget:
        prev_reported = _prev_reported_queries()
        by_keep = sorted(
            compact,
            key=lambda n: (n not in prev_reported, -compact[n]),
        )
        kept: dict[str, float] = {}
        for n in by_keep:
            kept[n] = compact[n]
            if len(dumps({**line, "queries": kept})) > budget:
                del kept[n]
                break
        line["queries"] = kept
        line["queries_truncated"] = len(compact) - len(kept)
    print(dumps(line))
    if sf == 0.1:
        _update_history(
            timings, total, exponents, spread,
            probe_sec=probe_sec, probe_bulk_sec=probe_bulk_sec,
            host_window=host_window,
        )


def _prev_reported_queries(root: str | None = None) -> set[str]:
    """Query names the driver's newest parsed BENCH_r*.json actually
    carried: the truncation fallback keeps these ahead of never-reported
    names so a query that has a cross-round timing history never drops
    off the printed line (VERDICT r12 item 2)."""
    import glob
    import re

    if root is None:
        root = os.path.dirname(os.path.abspath(__file__))
    best_round, names = -1, set()
    for path in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m or int(m.group(1)) <= best_round:
            continue
        try:
            with open(path) as f:
                snap = json.load(f).get("parsed")
        except (OSError, ValueError):
            continue
        if isinstance(snap, dict) and snap.get("queries"):
            best_round = int(m.group(1))
            names = set(snap["queries"])
    return names


def _update_history(
    timings: dict[str, float],
    total: float,
    exponents: dict[str, float] | None = None,
    spread: dict[str, float] | None = None,
    root: str | None = None,
    probe_sec: float | None = None,
    probe_bulk_sec: float | None = None,
    host_window: str | None = None,
) -> None:
    """Maintain bench_history.json: query -> {round/label -> seconds}.

    Cross-round per-query timing comparisons have had to be reconstructed
    by hand twice (r3's noise episode, r4's events-family drift); keep
    them machine-readable instead.  The file is merge-preserving: existing
    round keys are kept (r6/r7 driver snapshots were truncated, so the
    committed history is the only durable copy of some rounds) and driver
    BENCH_r{N}.json snapshots that DID parse refresh their round.

    Round keys are OWNED by driver snapshots; local runs never stamp a
    round key directly (an r8 local re-run after BENCH_r08.json existed
    would have been mis-attributed to r9).  Instead the current run lands
    under ``local`` (scratch, always current) plus a ``local_pending``
    block tagged with the round the driver is about to stamp
    (max snapshot round + 1); when that round's BENCH_r{N}.json later
    appears, the pending data is promoted to back-fill whatever the
    snapshot lost to stdout truncation, with parsed snapshot values
    winning where both exist."""
    import glob
    import re

    if root is None:
        root = os.path.dirname(os.path.abspath(__file__))
    history: dict[str, dict[str, float]] = {}
    totals: dict[str, float] = {}
    prior_exponents: dict[str, float] = {}
    prior_spread: dict[str, float] = {}
    pending: dict = {}
    try:
        with open(os.path.join(root, "bench_history.json")) as f:
            prior = json.load(f)
        totals.update(prior.get("total") or {})
        for q, per_round in (prior.get("queries") or {}).items():
            history[q] = dict(per_round)
        prior_exponents = prior.get("scaling_exponent") or {}
        prior_spread = prior.get("spread") or {}
        pending = prior.get("local_pending") or {}
    except (OSError, ValueError):
        pass
    max_round = 0
    snap_labels: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        max_round = max(max_round, int(m.group(1)))
        label = f"r{int(m.group(1))}"
        snap_labels.add(label)
        # promote pending local data for this round FIRST so parsed
        # snapshot values overwrite it below where both exist
        if pending.get("for_round") == label:
            if pending.get("total") is not None:
                totals.setdefault(label, pending["total"])
            for q, sec in (pending.get("queries") or {}).items():
                history.setdefault(q, {}).setdefault(label, sec)
        try:
            with open(path) as f:
                snap = json.load(f)
        except (OSError, ValueError):
            continue
        # driver snapshots wrap the bench line under "parsed"; a truncated
        # snapshot (parsed: null) must NOT wipe a round we already hold
        snap = snap.get("parsed")
        if not isinstance(snap, dict) or snap.get("value") is None:
            continue
        totals[label] = snap.get("value")
        for q, sec in (snap.get("queries") or {}).items():
            history.setdefault(q, {})[label] = sec
    if pending.get("for_round") in snap_labels:
        pending = {}  # consumed above (or superseded by the parsed snapshot)
    round_label = f"r{max_round + 1}"
    for q, sec in timings.items():
        history.setdefault(q, {})["local"] = sec
    totals["local"] = total
    totals = {k: v for k, v in totals.items() if v is not None}
    pending = {"for_round": round_label, "total": total, "queries": timings}
    if probe_sec is not None:
        # the promotion gate (SCALE.md): only a pass tagged healthy here
        # feeds cross-round comparison tables; degraded passes stay
        # labeled so the drift haze is visible instead of silent
        pending["probe_sec"] = probe_sec
        if probe_bulk_sec is not None:
            pending["probe_bulk_sec"] = probe_bulk_sec
        pending["host_window"] = host_window
    out = {
        "total": totals,
        "queries": dict(sorted(history.items())),
        "local_pending": pending,
    }
    exponents = {**prior_exponents, **(exponents or {})}
    # spread merge RATCHETS per query (capped at 0.5): a 2-sample run that
    # happens to land two adjacent timings must not shrink the noise band a
    # wider earlier estimate established (r8's profile_orders: 0.01 band on
    # the suite's slowest query).  Bands reset only when a query is renamed
    # or explicitly cleared.
    merged_spread: dict[str, float] = dict(prior_spread)
    for q, s in (spread or {}).items():
        merged_spread[q] = min(round(max(s, prior_spread.get(q, 0.0)), 2), 0.5)
    spread = merged_spread
    if exponents:
        # slope of t(sf0.01) -> t(sf0.1); >= 1.3 means super-linear and
        # needs a written adjudication in SCALE.md
        out["scaling_exponent"] = dict(sorted(exponents.items()))
    if spread:
        # run-to-run (max-min)/min of the current local run: the drift
        # rule (SCALE.md) treats a cross-round delta within this band as
        # host noise, no adjudication owed
        out["spread"] = dict(sorted(spread.items()))
    with open(os.path.join(root, "bench_history.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")


if __name__ == "__main__":
    main()
