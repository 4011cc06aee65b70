"""Golden end-to-end: the 100 TB-shaped composition run as ONE DAG at
sf0.1 — bucketed checkpoints through minhash near-dedup → benchmark
decontamination → per-language token-budget mix — asserting both the
outputs and zero-Exchange on the bucketed phase join.

The pieces are individually oracle-checked (`dedup_minhash_clusters`,
`decontaminate_docs`, `token_budget_mix`); this is the composition test:
the phases share one lineage-tracked Pipeline context, the dedup and
stats checkpoints are bucketed on ``doc_id``, and the final phase joins
them WITHOUT a shuffle (the families-pipeline idiom — pay the shuffle
once at checkpoint write, never again on that key).

Multi-minute at sf0.1, so marked ``oracle`` (runs under
``pytest -m oracle``, see pytest.ini).
"""
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.mark.oracle
def test_dag_bucketed_dedup_decontaminate_mix(spark, tmp_path):
    from phaser_spark import DagPipeline, Phase, dataframe_step
    from phaser_spark.ops import cleaning, dedup, sampling, text

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    # benchmark = a deterministic slice of long corpus docs; their texts
    # definitely share 8-gram shingles with themselves, so those doc_ids
    # must not survive decontamination
    benchmark = docs.filter(
        (F.col("doc_id") % 97 == 0) & (F.col("n_chars") > 300)
    ).select("doc_id", "text")
    bench_ids = {r.doc_id for r in benchmark.select("doc_id").collect()}
    assert len(bench_ids) >= 3  # non-degenerate fixture

    captured = {}

    @dataframe_step(check_size=False)
    def add_stats(df, context=None):
        c = F.col("text")
        return df.select(
            "*",
            text.token_count(c).alias("n_tokens"),
            text.quality_score(c).alias("quality"),
        )

    @dataframe_step(check_size=False)
    def near_dedup(df, context=None):
        return dedup.minhash_dedup_keep_best(
            df, "doc_id", "text", score_col="quality", threshold=0.85
        )

    @dataframe_step(check_size=False)
    def drop_contaminated(df, context=None):
        return cleaning.decontaminate(df, benchmark, "doc_id", "text", n=8)

    @dataframe_step(check_size=False, extra_sources=["stats"])
    def budget_mix(df, context=None, **kw):
        # both sides come from doc_id-bucketed checkpoints: this join must
        # NOT shuffle (SortMergeJoin over bucket-aligned scans)
        stats_side = kw["stats"].select("doc_id", F.col("lang").alias("lang2"))
        joined = df.join(stats_side, "doc_id")
        captured["join_plan"] = _plan(joined)
        joined = joined.drop("lang2")
        return sampling.token_budget_select(
            joined,
            "doc_id",
            "n_tokens",
            "lang",
            {"en": 40_000, "de": 15_000, "fr": 15_000, "es": 15_000, "zh": 15_000},
            buckets=64,
            score_col="quality",
        )

    def _plan(df):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    dag = DagPipeline(
        phases={
            "stats": Phase(
                name="stats",
                steps=[add_stats],
                checkpoint_bucket_by=["doc_id"],
                checkpoint_num_buckets=8,
            ),
            "dedup": (
                Phase(
                    name="dedup",
                    steps=[near_dedup],
                    checkpoint_bucket_by=["doc_id"],
                    checkpoint_num_buckets=8,
                ),
                ["stats"],
            ),
            "decontam": (
                Phase(
                    name="decontam",
                    steps=[drop_contaminated],
                    checkpoint_bucket_by=["doc_id"],
                    checkpoint_num_buckets=8,
                ),
                ["dedup"],
            ),
            "mix": (
                Phase(name="mix", steps=[budget_mix]),
                ["decontam", "stats"],
            ),
        },
        working_dir=str(tmp_path / "wd"),
        spark=spark,
    )
    out = None
    try:
        out = dag.run(docs).cache()
        rows = out.select("doc_id", "lang", "n_tokens").collect()

        # -- output contracts -------------------------------------------
        ids = [r.doc_id for r in rows]
        assert len(ids) == len(set(ids))  # dedup held through the chain
        assert not (set(ids) & bench_ids)  # decontamination held
        assert len(ids) > 100  # the mix is non-trivial

        budgets = {"en": 40_000, "de": 15_000, "fr": 15_000, "es": 15_000, "zh": 15_000}
        per_lang: dict[str, int] = {}
        max_doc: dict[str, int] = {}
        for r in rows:
            per_lang[r.lang] = per_lang.get(r.lang, 0) + r.n_tokens
            max_doc[r.lang] = max(max_doc.get(r.lang, 0), r.n_tokens)
        for lang, total in per_lang.items():
            # budget fill overshoots by strictly less than one document
            assert total < budgets[lang] + max_doc[lang], (lang, total)

        # -- plan contract: the bucketed phase join did not shuffle ------
        plan = captured["join_plan"]
        assert isinstance(plan, str)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "SelectedBucketsCount" in plan  # bucket-aware scans
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if out is not None:
            out.unpersist()
        for ph in ("stats", "dedup", "decontam", "mix"):
            spark.sql(f"DROP TABLE IF EXISTS phaser_ckpt_dag_pipeline_{ph}")
