"""Corpus-level cleaning operators: boilerplate line removal and
benchmark decontamination.

Engine additions (the reference, lisad/phaser, has no corpus operators);
part of the LLM-data suite alongside :mod:`phaser_spark.ops.text` and
:mod:`phaser_spark.ops.dedup`.

Scale design notes
------------------
* ``remove_boilerplate_lines`` is the C4-style "drop lines that repeat
  across many documents" rule.  The frequency count is keyed on the
  line text itself — cardinality grows with the corpus, so the shuffle
  spreads; the rebuild is a per-document sort of that document's own
  lines only (array_sort over a collected struct list, never a global
  sort).
* ``decontaminate`` flags documents sharing word n-grams with a
  benchmark set.  The benchmark side is small by definition (eval sets),
  so Catalyst broadcasts it; the document side streams through one
  explode + one join + one per-doc count — no all-pairs stage.
* ``semantic_decontaminate`` is the embedding-space companion (catches
  paraphrased leakage n-grams miss): benchmark embeddings broadcast,
  training side streams, cosine ≥ threshold drops the row.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import PhaserError
from .text import normalize_text


def _lines_with_pos(text_col: SparkCol) -> SparkCol:
    """Non-empty trimmed lines as array<struct<pos,line>> (pos = original
    line index, so documents rebuild in source order)."""
    raw = F.split(text_col, "\n")
    idx = F.sequence(F.lit(0), F.size(raw) - 1)
    entries = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"), F.trim(F.element_at(raw, i + 1)).alias("line")
        ),
    )
    return F.filter(entries, lambda e: e["line"] != "")


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 10,
) -> DataFrame:
    """Drop every line that occurs in ``min_doc_freq`` or more *distinct*
    documents (navigation chrome, cookie banners, license footers), then
    reassemble each document from its surviving lines in original order.

    Returns the input columns with ``text_col`` replaced by the cleaned
    text plus ``n_lines_removed``.  Documents whose lines are all
    boilerplate come back with an empty string; documents with NO
    boilerplate pass through byte-identical (the rebuild — which trims
    lines and drops blanks — only applies to documents that actually
    lost a line); NULL text stays NULL.  ``id_col`` must uniquely
    identify documents — rows sharing an id would have their lines
    cross-merged by the rebuild.
    """
    lines = df.select(
        F.col(id_col).alias("__bp_id"),
        F.explode(_lines_with_pos(F.col(text_col))).alias("e"),
    ).select("__bp_id", "e.pos", "e.line")
    # distinct doc-frequency per line; approx_count_distinct would halve
    # the shuffle but the rule must be exact to be oracle-checkable
    freq = (
        lines.select("line", "__bp_id")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    kept = lines.join(freq, "line", "left").withColumn(
        "__bp_drop", F.col("doc_freq") >= F.lit(min_doc_freq)
    )
    rebuilt = kept.groupBy("__bp_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__bp_drop"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda e: e["line"],
            ),
            "\n",
        ).alias("__bp_text"),
        F.sum(F.col("__bp_drop").cast("long")).alias("n_lines_removed"),
    )
    cleaned = (
        # NULL text stays NULL (not coerced to '')
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        # untouched docs pass through byte-identical — the rebuild's
        # trim/blank-drop must not silently rewrite clean documents
        .when(
            F.coalesce(F.col("n_lines_removed"), F.lit(0)) == 0, F.col(text_col)
        )
        .otherwise(F.coalesce(F.col("__bp_text"), F.lit("")))
    )
    out_cols = [
        (cleaned.alias(text_col) if c == text_col else F.col(c))
        for c in df.columns
    ]
    return (
        # null-SAFE id equality: a NULL doc_id still has lines in
        # `rebuilt` (groupBy keeps the NULL group) — a plain equality
        # join would hand it an empty text and silently lose the data
        df.join(rebuilt, df[id_col].eqNullSafe(rebuilt["__bp_id"]), "left")
        .select(*out_cols, F.coalesce("n_lines_removed", F.lit(0)).alias("n_lines_removed"))
    )


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Cross-document repeated-span removal (the ExactSubstr rule of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", adapted to word granularity): any word ``n``-gram occurring
    in ``min_doc_freq`` or more distinct documents marks its ``n`` words
    as repeated in EVERY document containing it; marked words are cut and
    each document reassembled from its surviving words.  Unlike whole-doc
    dedup this removes the duplicated PASSAGE (quoted licenses, templated
    paragraphs, syndicated intros) while keeping each document's unique
    remainder.

    Matching is on per-word normalized forms (lowercase, alphanumerics
    only) so punctuation/case variants of the same passage co-match, but
    the CUT applies to the original words — per-word normalization keeps
    indexes aligned with the raw token stream.  The rebuilt text is the
    surviving original words joined by single spaces (original
    whitespace is not preserved).

    Returns the input columns with ``text_col`` rebuilt, plus
    ``n_words_removed``.

    Scale: one explode of n× word count (linear, no all-pairs), one
    exact distinct-doc-frequency aggregate shuffled on the gram (partial
    aggs combine map-side; cardinality grows with the corpus so the key
    space spreads), one join back of the hot-gram sliver, and a per-doc
    ``collect_set`` of start positions (bounded by the doc's own
    length).  Never a global sort, never a driver collect.
    """
    from ..lineage import spread_for_compute

    if n < 1:
        raise PhaserError(f"span n-gram size must be >= 1, got {n}")
    if min_doc_freq < 2:
        # every gram occurs in >= 1 document (its own), so min_doc_freq
        # below 2 cuts EVERY word of every document with >= n words —
        # silent total text destruction, never what the caller meant
        raise PhaserError(
            f"min_doc_freq must be >= 2, got {min_doc_freq} (a gram always "
            "occurs in its own document; < 2 would cut all text)"
        )
    words_raw = F.split(F.col(text_col), r"\s+")
    # stage the normalized word array behind an exchange (CollapseProject
    # barrier) so the gram lambda below slices a plain ATTRIBUTE — an
    # inline transform(...) child would be re-evaluated at every gram
    # position, turning the explode O(words² · regex) (same trap as
    # dedup.staged_words; measured 8× there, ~20× here at sf0.1)
    staged = spread_for_compute(
        df.select(
            F.col(id_col).alias("__rs_id"),
            F.transform(
                words_raw,
                lambda w: F.regexp_replace(F.lower(w), "[^a-z0-9]", ""),
            ).alias("__rs_nv"),
        )
    )
    nv = F.col("__rs_nv")
    sz = F.size(nv)
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - n + 1),
            lambda i: F.struct(
                i.alias("pos"),
                F.array_join(F.slice(nv, i, n), " ").alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,g:string>>"))
    exploded = staged.select("__rs_id", F.explode(grams).alias("e")).select(
        "__rs_id", "e.pos", "e.g"
    )
    # exact distinct-doc frequency (approx would break oracle checking)
    hot = (
        exploded.select("g", "__rs_id")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= F.lit(min_doc_freq))
        .select("g")
    )
    covered = (
        exploded.join(hot, "g")
        .groupBy("__rs_id")
        .agg(F.collect_set("pos").alias("__rs_starts"))
        .select(
            "__rs_id",
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.col("__rs_starts"),
                        lambda p: F.sequence(p, p + n - 1),
                    )
                )
            ).alias("__rs_covered"),
        )
    )
    joined = df.join(covered, df[id_col] == covered["__rs_id"], "left")
    cov = F.coalesce(F.col("__rs_covered"), F.array().cast("array<int>"))
    # F.filter's index is 0-based; covered positions are 1-based
    kept = F.filter(
        words_raw, lambda w, i: ~F.array_contains(cov, (i + 1).cast("int"))
    )
    out_cols = [
        (F.array_join(kept, " ").alias(text_col) if c == text_col else F.col(c))
        for c in df.columns
    ]
    return joined.select(
        *out_cols, F.size(cov).cast("long").alias("n_words_removed")
    )


def _shingles(text_col: SparkCol, n: int) -> SparkCol:
    if n < 1:
        # n=0 would make every document emit the empty shingle "" and
        # match every benchmark: 100% contamination, silently
        raise PhaserError(f"n-gram size must be >= 1, got {n}")
    words = F.split(normalize_text(text_col), " ")
    return F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    min_overlap: int = 1,
    flag_only: bool = False,
) -> DataFrame:
    """Benchmark decontamination: drop (or, with ``flag_only``, annotate)
    training documents that share ``min_overlap`` or more distinct word
    ``n``-grams with any row of ``benchmark`` (an eval/test set).

    A benchmark row with the same id as a document does NOT decontaminate
    it only when the two frames share the id column semantics — callers
    deduplicating a corpus against itself should pre-filter.  Overlap is
    counted over distinct (doc, shingle) pairs, the standard exact-match
    decontamination rule (e.g. GPT-3 appendix C / PaLM-style n-gram
    matching).
    """
    bench_text_col = bench_text_col or text_col
    doc_sh = df.select(
        F.col(id_col).alias("__dc_id"),
        F.explode(_shingles(F.col(text_col), n)).alias("sh"),
    )
    bench_sh = (
        benchmark.select(F.explode(_shingles(F.col(bench_text_col), n)).alias("sh"))
        .distinct()
    )
    # benchmark side is small (an eval set): broadcast the build side so
    # the contamination check is a map-side hash join, no doc-side shuffle
    overlap = (
        doc_sh.join(F.broadcast(bench_sh), "sh", "inner")
        .groupBy("__dc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
        .filter(F.col("n_contaminated_shingles") >= min_overlap)
    )
    joined = df.join(overlap, df[id_col] == overlap["__dc_id"], "left")
    if flag_only:
        return joined.select(
            *[F.col(c) for c in df.columns],
            F.col("__dc_id").isNotNull().alias("contaminated"),
            F.coalesce("n_contaminated_shingles", F.lit(0)).alias(
                "n_contaminated_shingles"
            ),
        )
    return joined.filter(F.col("__dc_id").isNull()).select(*[F.col(c) for c in df.columns])


def contamination_report(
    df: DataFrame,
    benchmarks: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Contamination RATE per benchmark — the release-gate summary that
    pairs with :func:`decontaminate`: for each eval set, how many
    training documents share ``min_overlap``+ distinct word ``n``-grams
    with it, and what fraction of the corpus that is.  One row per
    benchmark::

        (benchmark, n_contaminated, n_docs, contamination_rate)

    Scale: ALL benchmarks ride ONE doc-side shingle pass — the
    benchmark shingle sets are tagged with their name, unioned, and
    broadcast (eval sets are small; the union is their combined
    distinct-shingle count), so the corpus is exploded and joined once
    regardless of how many benchmarks are checked.  Per-benchmark
    aggregation happens on the (benchmark, doc) overlap table — never
    K rescans of the corpus.  ``n_docs`` rides in on a one-row
    broadcast crossJoin.
    """
    if not benchmarks:
        raise PhaserError("contamination_report needs at least one benchmark")
    if min_overlap < 1:
        raise PhaserError(
            f"min_overlap must be >= 1, got {min_overlap} (overlap counting "
            "starts at one shared shingle; lower thresholds are meaningless)"
        )
    bench_text_col = bench_text_col or text_col
    doc_sh = df.select(
        F.col(id_col).alias("__cr_id"),
        F.explode(_shingles(F.col(text_col), n)).alias("sh"),
    )
    tagged = None
    for name, bench in benchmarks.items():
        b = (
            bench.select(F.explode(_shingles(F.col(bench_text_col), n)).alias("sh"))
            .distinct()
            .select(F.lit(name).alias("benchmark"), "sh")
        )
        tagged = b if tagged is None else tagged.unionByName(b)
    per_doc = (
        doc_sh.join(F.broadcast(tagged), "sh")
        .groupBy("benchmark", "__cr_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
    # benchmarks with ZERO hits still get a row (a silent absence reads
    # as "not checked"): aggregate onto the literal benchmark list —
    # ONE local relation, not N unioned single-row frames
    names = df.sparkSession.createDataFrame(
        [(name,) for name in benchmarks], "benchmark string"
    )
    counts = per_doc.groupBy("benchmark").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    totals = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        names.join(counts, "benchmark", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "benchmark",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            "n_docs",
            (
                F.coalesce("n_contaminated", F.lit(0))
                / F.greatest(F.col("n_docs"), F.lit(1))
            ).alias("contamination_rate"),
        )
    )


def semantic_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec_col: str | None = None,
    threshold: float = 0.95,
    flag_only: bool = False,
    flag_col: str = "contaminated",
    exact: bool = False,
) -> DataFrame:
    """Embedding-space benchmark decontamination: drop (or, with
    ``flag_only``, annotate) training rows whose embedding has cosine
    similarity ≥ ``threshold`` to ANY row of ``benchmark`` — the
    semantic companion to :func:`decontaminate`, which matches exact
    word n-grams and therefore misses paraphrased eval leakage.

    Cosines are truncated to 6 digits before the threshold compare
    (engine-reproducible, see ``dedup.trunc_digits``); ``exact=True``
    switches to decimal-accumulated dot products (bit-identical under
    any summation order).

    Scale: the benchmark side is small by definition (an eval set), so
    it is BROADCAST and the training side streams through a
    broadcast-nested-loop compare — |df|·|bench| cosine evaluations,
    zero shuffle of the big side; the only shuffle is the distinct over
    contaminated ids (≤ |df| rows, usually tiny).  That |bench|
    multiplier is inherent to exhaustive decontamination; for an
    unusually large benchmark, pre-block both sides with
    :func:`phaser_spark.ops.dedup.embedding_dup_pairs`-style hyperplane
    buckets and verify only bucket collisions.
    """
    from .dedup import _dot, _norm, trunc_digits
    from .similarity import _dot_decimal

    bench_vec_col = bench_vec_col or vec_col
    dot = _dot_decimal if exact else _dot
    norm = (lambda a: F.sqrt(_dot_decimal(a, a))) if exact else _norm
    # norms hoisted to per-ROW projections: inside the |df|·|bench|
    # compare each train norm would otherwise be refolded per bench row
    # (and vice versa) — ~2/3 of the hot loop's array arithmetic
    train = df.select(
        F.col(id_col).alias("__sc_id"),
        F.col(vec_col).cast("array<double>").alias("__sc_v"),
    ).withColumn("__sc_nv", norm(F.col("__sc_v")))
    bench = benchmark.select(
        F.col(bench_vec_col).cast("array<double>").alias("__sc_b")
    ).withColumn("__sc_nb", norm(F.col("__sc_b")))
    cos = trunc_digits(
        dot(F.col("__sc_v"), F.col("__sc_b"))
        / (F.col("__sc_nv") * F.col("__sc_nb")),
        6,
    )
    contaminated = (
        train.crossJoin(F.broadcast(bench))
        .filter(cos >= F.lit(threshold))
        .select("__sc_id")
        .distinct()
    )
    if flag_only:
        marked = contaminated.withColumn(flag_col, F.lit(True))
        return (
            df.join(marked, F.col(id_col) == F.col("__sc_id"), "left")
            .drop("__sc_id")
            .withColumn(flag_col, F.coalesce(F.col(flag_col), F.lit(False)))
        )
    return df.join(
        contaminated, F.col(id_col) == F.col("__sc_id"), "left_anti"
    )
