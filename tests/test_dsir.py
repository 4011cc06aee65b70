"""Tests for DSIR importance resampling (ops/dsir.py)."""
import math

import pytest
from pyspark.sql import functions as F

from phaser_spark.exceptions import PhaserError
from phaser_spark.ops import dsir
from phaser_spark.ops.sampling import hash_bucket


@pytest.fixture(scope="module")
def corpora(spark):
    # corpus: half "sciency" docs, half "casual" docs; target: sciency only
    sci = "the quantum field theory of gauge bosons and lattice spins"
    cas = "lol that cat video was so funny omg watch it again"
    corpus = spark.createDataFrame(
        [
            (1, sci),
            (2, sci + " with renormalization group flow equations"),
            (3, cas),
            (4, cas + " and more cat videos all day"),
            (5, "quantum lattice gauge spins theory field"),
            (6, None),
            (7, ""),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [
            (101, "quantum field theory and the renormalization group"),
            (102, "lattice gauge theory of spins and bosons"),
        ],
        "doc_id long, text string",
    )
    return corpus, target


def test_importance_ranks_target_like_docs_higher(spark, corpora):
    corpus, target = corpora
    out = {
        r["doc_id"]: r
        for r in dsir.dsir_importance(
            corpus, target, "doc_id", "text", n=2, buckets=1024
        ).collect()
    }
    sci_scores = [out[i]["dsir_score"] for i in (1, 2, 5)]
    cas_scores = [out[i]["dsir_score"] for i in (3, 4)]
    assert min(sci_scores) > max(cas_scores)
    # gramless docs: NULL score, zero grams, still present in the output
    assert out[6]["dsir_score"] is None and out[6]["n_grams"] == 0
    assert out[7]["dsir_score"] is None
    assert len(out) == 7


def test_importance_matches_python_replay(spark, corpora):
    """Replay the whole formula in Python on the engine's own bucket
    assignments — pins smoothing, normalization and the log-ratio."""
    corpus, target = corpora
    n, buckets, alpha = 2, 256, 1.0

    def grams_of(txt):
        import re
        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", (txt or "").lower())).strip()
        ws = [w for w in norm.split(" ") if w]
        return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)] if len(ws) >= n else []

    # engine's bucket rule, replayed exactly (md5 prefix mod)
    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets

    corpus_rows = corpus.collect()
    target_rows = target.collect()
    raw, tgt = {}, {}
    for r in corpus_rows:
        for g in grams_of(r["text"]):
            raw[bucket(g)] = raw.get(bucket(g), 0) + 1
    for r in target_rows:
        for g in grams_of(r["text"]):
            tgt[bucket(g)] = tgt.get(bucket(g), 0) + 1
    R, T = sum(raw.values()), sum(tgt.values())
    expect = {}
    for r in corpus_rows:
        gs = grams_of(r["text"])
        if not gs:
            expect[r["doc_id"]] = None
            continue
        s = 0.0
        for g in gs:
            b = bucket(g)
            s += math.log2((tgt.get(b, 0) + alpha) / (T + alpha * buckets)) - math.log2(
                (raw[b] + alpha) / (R + alpha * buckets)
            )
        expect[r["doc_id"]] = math.floor(s / len(gs) * 1e6) / 1e6
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir.dsir_importance(
            corpus, target, "doc_id", "text", n=n, buckets=buckets, alpha=alpha
        ).collect()
    }
    for k, v in expect.items():
        if v is None:
            assert got[k] is None
        else:
            assert got[k] == pytest.approx(v, abs=2e-6), (k, got[k], v)


def test_select_topk_deterministic(spark, corpora):
    corpus, target = corpora
    sel = dsir.dsir_select(corpus, target, "doc_id", "text", k=3, buckets=1024)
    ids = [r["doc_id"] for r in sel.collect()]
    assert len(ids) == 3
    assert set(ids) <= {1, 2, 5}  # the sciency docs
    # plan is a bounded top-k, not a global sort
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bucket_distribution_is_bounded_and_additive(spark, corpora):
    corpus, _ = corpora
    dist = dsir.bucket_distribution(corpus, "doc_id", "text", n=1, buckets=64)
    rows = dist.collect()
    assert len(rows) <= 64
    total = sum(r["cnt"] for r in rows)
    # total unigram occurrences across the corpus (multiplicity kept)
    n_words = corpus.select(
        F.sum(
            F.size(F.filter(F.split(F.lower(F.coalesce("text", F.lit(""))), r"\s+"),
                            lambda w: w != ""))
        )
    ).collect()[0][0]
    assert total == n_words


def test_cache_counts_same_result_and_pins_table(spark, corpora):
    corpus, target = corpora
    base = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir.dsir_importance(
            corpus, target, "doc_id", "text", buckets=1024
        ).collect()
    }
    try:
        cached = {
            r["doc_id"]: r["dsir_score"]
            for r in dsir.dsir_importance(
                corpus, target, "doc_id", "text", buckets=1024, cache_counts=True
            ).collect()
        }
        assert cached == base
        # the pin is real (cache ownership doc: caller clears it)
        assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() > 0
    finally:
        spark.catalog.clearCache()


def test_dsir_rejects_bad_params(spark, corpora):
    corpus, target = corpora
    with pytest.raises(PhaserError):
        dsir.dsir_importance(corpus, target, "doc_id", "text", alpha=0.0)
    with pytest.raises(PhaserError):
        dsir.dsir_importance(corpus, target, "doc_id", "text", n=0)
    with pytest.raises(PhaserError):
        dsir.dsir_select(corpus, target, "doc_id", "text", k=0)