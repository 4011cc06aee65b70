"""End-to-end LLM training-data pipeline built from phaser_spark operators.

Demonstrates the engine's purpose: a phased, checkpointed, lineage-tracked
corpus-cleaning flow that a user of the reference framework could run with
the same Pipeline/Phase API, but that scales to a 100 TB corpus:

  1. QualityFilter — text stats (token counts, stopword ratio, language id,
     quality score) as pure Catalyst expressions; drop short/low-quality
     and non-English docs with summarized DROPPED_ROW events.
  2. ExactDedup — normalize+hash fingerprint, keep the first copy.
  3. NearDedup — MinHash+LSH banding + connected components; keep each
     cluster's BEST doc by quality score.
  4. CurateAndPack — PII redaction, domain blocklist, benchmark
     decontamination, repeated-span scrubbing (ExactSubstr), stratified
     language rebalancing, per-language token budgets, and sequence
     packing into fixed-capacity training bins.

Post-pipeline: bucketed persistence, incremental delta dedup, rollup +
sketch reporting, skew audit, per-language winsorized quality checks,
and SemDeDup over the embeddings table.

Run:  python examples/training_data_pipeline.py [sf_dir] [working_dir]
"""
from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phaser_spark import Phase, Pipeline, dataframe_step, filter_rows
from phaser_spark.ops import cleaning, dedup, pii, sampling, text, web
from phaser_spark.session import get_spark

# column expressions below are built at class-definition time, which needs
# an active SparkContext
spark = get_spark(app_name="training_data_pipeline")


@dataframe_step(check_size=False)
def add_stats(df, context=None):
    c = F.col("text")
    return df.select(
        "*",
        text.token_count(c).alias("n_tokens"),
        text.stopword_ratio(c).alias("stopword_ratio"),
        text.lang_id(c).alias("lang_pred"),
        text.quality_score(c).alias("quality"),
    )


@dataframe_step(check_size=False)
def drop_exact_dups(df, context=None):
    # keep the lowest doc_id per normalized-text fingerprint
    keepers = (
        df.groupBy(text.fingerprint(F.col("text")).alias("__fp__"))
        .agg(F.min("doc_id").alias("__keeper__"))
    )
    return (
        df.withColumn("__fp__", text.fingerprint(F.col("text")))
        .join(keepers, "__fp__")
        .filter(F.col("doc_id") == F.col("__keeper__"))
        .drop("__fp__", "__keeper__")
    )


@dataframe_step(check_size=False)
def drop_near_dups(df, context=None):
    # keep the BEST doc of each near-dup cluster by the quality score
    # computed in QualityFilter (not an arbitrary id winner): drop the
    # low-quality mirror, keep the clean original
    return dedup.minhash_dedup_keep_best(
        df, "doc_id", "text", score_col="quality", threshold=0.85
    )


class QualityFilter(Phase):
    name = "QualityFilter"
    steps = [
        add_stats,
        filter_rows(
            (F.col("n_tokens") >= 5)
            & (F.col("quality") >= 0.35)
            & (F.col("lang_pred") == "en"),
            name="quality_gate",
        ),
    ]


class ExactDedup(Phase):
    name = "ExactDedup"
    steps = [drop_exact_dups]


class NearDedup(Phase):
    name = "NearDedup"
    steps = [drop_near_dups]


@dataframe_step(check_size=False)
def curate_and_pack(df, context=None):
    # PII scrub and domain blocklist are pure projections
    out = pii.redact_pii(df, "text", out_col="text_clean", with_counts=False)
    out = web.filter_blocked_domains(out, "text", ["ads.bad", "tracker.example"])
    # decontaminate against a (stand-in) benchmark set: here, the 10
    # lowest doc_ids play the role of an eval set loaded from elsewhere
    bench = df.filter(F.col("doc_id") < 10).select("doc_id", "text")
    # release-gate summary FIRST (one doc-side shingle pass for every
    # benchmark, zero-hit sets still report), then the actual drop
    report = cleaning.contamination_report(
        out, {"stand_in_eval": bench, "empty_probe": bench.limit(0)}, n=8
    )
    for r in report.collect():
        print(
            f"contamination[{r.benchmark}]: {r.n_contaminated}/{r.n_docs} "
            f"docs ({r.contamination_rate:.4f})"
        )
    out = cleaning.decontaminate(out, bench, n=8)
    # cut cross-document repeated passages (quoted licenses, templated
    # intros) from the redacted text — passage-level, not whole-doc, dedup
    out = cleaning.remove_repeated_spans(
        out, "doc_id", "text_clean", n=8, min_doc_freq=2
    )
    # rebalance: keep half of English, all of everything else; then fill
    # per-language TOKEN BUDGETS in deterministic order (unlisted
    # languages fall back to the default budget), and pack into
    # 4096-token training bins per language
    out = sampling.stratified_sample_by_hash(
        out, "doc_id", "lang", {"en": 0.5}, default_fraction=1.0
    )
    out = sampling.token_budget_select(
        out, "doc_id", "n_tokens", "lang",
        budgets={"en": 4000}, default_budget=2500, buckets=64,
    )
    return sampling.pack_sequences(
        out, "n_tokens", 4096, order_col="doc_id", partition_col="lang"
    )


class CurateAndPack(Phase):
    name = "CurateAndPack"
    steps = [curate_and_pack]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wd = sys.argv[2] if len(sys.argv) > 2 else "/tmp/phaser_training_pipeline"
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # --- day 0: gate the raw input before paying for the pipeline ------
    # Every rule evaluates in ONE scan; a violation stops the run here
    # with the failing metrics instead of three phases later.
    from phaser_spark.ops import quality as Q

    Q.fail_on_violation(docs, [
        Q.completeness("doc_id"),
        Q.uniqueness("doc_id"),
        Q.completeness("text", min_ratio=0.95),
        Q.row_count(at_least=10),
    ])

    # --- attached-media triage (codec-free): a multimodal corpus carries
    # binary blobs next to the text; header-level sniff + corruption
    # checks quarantine broken/mislabeled media at scan speed, before any
    # decode budget is spent.  (Synthetic blobs stand in for a crawl's
    # real attachments at the same schema.)
    from phaser_spark.ops import multimodal

    media = multimodal.synth_media(docs.select("doc_id"))
    media = multimodal.sniff_format(media)
    media = multimodal.detect_corrupt(
        media, format_col="format", declared_mime_col="mime"
    )
    for r in multimodal.media_size_stats(
        media, format_col="format", corrupt_col="is_corrupt"
    ).collect():
        print(
            f"media[{r.format}]: {r.n_blobs} blobs, {r.total_bytes} B, "
            f"{r.n_corrupt} corrupt"
        )

    # ID-level takedown list (DMCA/opt-out): a bloom bitmap prunes the
    # corpus BEFORE any shuffle; only the matches + fpp sliver pay the
    # exact anti join, and results are exactly the plain anti join.
    from phaser_spark.ops import bloom

    takedown = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id")
    docs = bloom.bloom_anti_join(docs, takedown, on="doc_id", fpp=0.01)

    pipe = Pipeline(
        working_dir=wd,
        phases=[QualityFilter, ExactDedup, NearDedup, CurateAndPack],
        spark=spark,
    )
    pipe.save_format = "parquet"  # columnar checkpoints (the scale path)
    out = pipe.run(docs)
    # persist the curated corpus bucketed on doc_id: every later equi-join
    # against per-doc metadata (or an incremental re-dedup pass) then runs
    # with zero Exchange — the write pays the shuffle once (SCALE.md
    # "Co-located joins")
    from phaser_spark.io import save_parquet_bucketed

    save_parquet_bucketed(
        out.drop("bin_id"), "curated_docs", ["doc_id"], num_buckets=32,
        sort_cols=["doc_id"], path=os.path.join(wd, "curated_bucketed"),
    )
    n_in, n_out = docs.count(), out.count()
    print(
        f"{n_in} docs in -> {n_out} after quality+dedup "
        f"({100 * (n_in - n_out) / max(n_in, 1):.1f}% removed)"
    )
    print(pipe.report_errors_and_warnings())

    # --- day 2: incremental ingest ------------------------------------
    # Persist the curated corpus's MinHash signatures once (128 longs per
    # doc); tomorrow's delta is deduped against the corpus WITHOUT
    # re-reading or re-signing it — cost scales with the delta.
    corpus = out.select("doc_id", "text")
    sig_path = os.path.join(wd, "corpus_minhash_sigs")
    dedup.minhash_signatures(corpus, "doc_id", "text").write.mode(
        "overwrite"
    ).parquet(sig_path)
    delta = docs.orderBy(F.rand(seed=7)).limit(20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )  # stand-in for newly crawled docs (some duplicate the corpus)
    new_pairs = dedup.minhash_lsh_incremental(
        delta, corpus, "doc_id", "text",
        threshold=0.85,
        corpus_sigs=spark.read.parquet(sig_path),
    )
    print(f"incremental ingest: {new_pairs.count()} near-dup pairs "
          f"touching the {delta.count()}-doc delta")

    # --- corpus reporting: one pass for every rollup level + sketches --
    # All (lang × source) aggregation levels from a single Expand +
    # partial agg — not one scan per level — and a persistable ~2.5 KB
    # HLL blob per language: tomorrow "distinct sources over any language
    # subset" is a merge of blobs, not a corpus rescan.
    from phaser_spark.ops import relational, sketches

    report = relational.multilevel_agg(
        out,
        ["lang", "source"],
        [F.count(F.lit(1)).alias("n_docs"),
         F.sum("n_tokens").alias("sum_tokens")],
        kind="rollup",
    )
    grand = report.filter(F.col("grouping_id") == 3).collect()[0]
    print(f"rollup report: {report.count()} rows across 3 levels; "
          f"grand total {grand['n_docs']} docs / {grand['sum_tokens']} tokens")
    lang_sketches = sketches.hll_sketches(out, ["lang"], "source")
    lang_sketches.write.mode("overwrite").parquet(
        os.path.join(wd, "lang_source_sketches")
    )
    est = sketches.hll_merge_estimate(
        spark.read.parquet(os.path.join(wd, "lang_source_sketches")),
        [],  # merge ALL languages' blobs
    ).collect()[0]["distinct_estimate"]
    print(f"distinct sources corpus-wide (merged from stored sketches): {est}")

    # hottest sources (exact top-k, heap-merged — no full sort) and the
    # skew verdict for any later join/agg keyed on source: keys flagged
    # `hot` are the ones to hand to relational.salted_join
    from phaser_spark.ops.frequency import heavy_hitters
    from phaser_spark.plan import skew_report

    top_sources = heavy_hitters(out, ["source"], k=5).collect()
    print("top sources:", [(r.source, r.n) for r in top_sources])
    hot = [r.source for r in skew_report(out, ["source"], top=5).collect() if r.hot]
    print(f"skew check on 'source': {len(hot)} hot key(s) {hot or ''}")

    # per-language quality audit on the CURATED corpus: robust
    # median/MAD outlier screen FIRST (50% breakdown — extreme values
    # can't inflate the scale and hide), then winsorize the token counts
    # (a 10⁹-token "document" stops dominating the means), and verify
    # every language slice passes the suite — a bad slice a
    # whole-corpus average would hide
    rz = Q.robust_standardize(
        out, "n_tokens", group_by=["lang"], flag_threshold=3.5
    )
    n_out = rz.filter(F.col("n_tokens_outlier")).count()
    print(f"robust MAD screen: {n_out} token-count outlier(s) flagged")
    # character-entropy gibberish/junk signal on the curated text
    ce = text.char_entropy(out, text_col="text_clean")
    lo, hi = ce.agg(
        F.min("char_entropy"), F.max("char_entropy")
    ).collect()[0]
    print(f"char-entropy band across curated docs: [{lo:.3f}, {hi:.3f}] bits/char")
    wz = Q.winsorize(out, ["n_tokens"], 0.01, 0.99, group_by=["lang"])
    bad = [
        (r.lang, r.check, r.metric)
        for r in Q.run_checks(
            wz,
            [Q.completeness("text_clean"), Q.row_count(at_least=1)],
            group_by=["lang"],
        ).collect()
        if not r.passed
    ]
    print(f"per-language quality audit: {len(bad)} failing check(s) {bad or ''}")

    # --- train/val split with the near-dup leakage guard ----------------
    # A plain per-row hash split puts a near-copy of a training doc into
    # the eval slice ~10% of the time; splitting on the dup-CLUSTER
    # representative makes that impossible by construction.
    # dup-heavy corpora: feed star EDGES (linear in duplication), not the
    # quadratic bucket self-join — components only need connectivity
    dup_edges = dedup.minhash_lsh_edges(corpus, "doc_id", "text")
    splits = sampling.leakage_safe_split(
        out, "doc_id", {"train": 0.9, "val": 0.1}, dup_edges
    )
    # realized mass per split: cluster-keyed hashing is exact only in
    # expectation, so audit rows AND token share in one aggregate
    shares = {
        r.split: (r.rows, round(r.weight_share, 3))
        for r in sampling.split_shares(splits, "split", "n_tokens").collect()
    }
    print(f"leakage-safe split shares (rows, token share): {shares}")
    # how duplicated was the corpus?  size-1 rows are uniques; a fat tail
    # means boilerplate mega-clusters
    from phaser_spark.ops import graph as G

    comp = G.connected_components(
        dup_edges, src="id_a", dst="id_b",
        vertices=out.select("doc_id"), id_col="doc_id",
    )
    hist = {r.size: r.n_clusters for r in G.component_size_stats(comp, "component").collect()}
    print(f"dup cluster-size histogram: {dict(sorted(hist.items()))}")

    # weighted eval subset: 25 systematic draws with inclusion ∝ token
    # count (long docs proportionally more likely, no rand(), same set
    # every run)
    ev = sampling.pps_sample(out, "doc_id", "n_tokens", k=25)
    print(
        f"PPS eval sample: {ev.count()} docs / "
        f"{ev.agg(F.sum('n_tokens')).first()[0]} tokens"
    )

    # drift monitor: did curation shift the length distribution vs the
    # raw corpus?  (sum of per-bucket PSI contributions; ln-scale PSI =
    # sum * ln 2 — <0.1 stable, >0.25 shifted)
    drift = Q.distribution_drift(docs, out, "n_chars", bins=16)
    psi = drift.agg(F.sum("psi")).first()[0]
    print(f"curation drift on n_chars: PSI(log2) = {psi:.4f}")

    # --- semantic dedup over the embedding table (SemDeDup) ------------
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(emb_path):
        emb = spark.read.parquet(emb_path)
        kept = dedup.semantic_dedup(
            emb, "vec_id", "embedding", n_cells=16, threshold=0.3
        )
        print(
            f"semantic dedup: {emb.count()} embeddings -> {kept.count()} "
            "after dropping within-cell semantic near-dups"
        )
        # embedding-space eval-set decontamination: the paraphrase guard
        # n-gram decontamination misses (bench broadcast, corpus streams)
        bench_emb = emb.filter(F.col("vec_id") % 97 == 0)
        train_emb = emb.filter(F.col("vec_id") % 97 != 0)
        sem_clean = cleaning.semantic_decontaminate(
            train_emb, bench_emb, threshold=0.3
        )
        print(
            f"semantic decontamination: {train_emb.count()} train embeddings "
            f"-> {sem_clean.count()} after dropping eval-similar rows"
        )

    # --- retrieval prep: chunk the curated corpus ----------------------
    from phaser_spark.ops.text import chunk_documents

    chunks = chunk_documents(
        out.select("doc_id", F.col("text_clean").alias("text")),
        chunk_words=64,
        overlap_words=16,
    )
    print(f"retrieval chunks: {out.count()} curated docs -> {chunks.count()} chunks")

    # --- curation cut + training shard layout ---------------------------
    # best k docs per language, skew-safe even when one language dominates
    # the corpus (two-level bin-histogram selection, no full-group sort)
    best = sampling.topk_by_group(out, "doc_id", "n_tokens", "lang", k=50)
    print(f"per-language top-k: {out.count()} docs -> {best.count()} kept")
    # write-side: near-equal token-mass shards whose membership is a pure
    # function of corpus content — rerunning the pipeline reproduces the
    # exact same shards; the manifest records per-shard row/token totals
    from phaser_spark.io import save_training_shards

    manifest = save_training_shards(
        best, os.path.join(wd, "training_shards"), n_shards=8,
        key_col="doc_id", len_col="n_tokens",
    )
    for e in manifest:
        print(f"shard {e['shard']}: {e['n_rows']} docs, {e['weight']:.0f} tokens")


if __name__ == "__main__":
    main()
