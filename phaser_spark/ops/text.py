"""Text analysis operators: language-ID, quality scoring, token counts,
fingerprinting (engine additions; BASELINE.json north star).

All pure Catalyst expressions — no Python in the hot path, so every
operator whole-stage-codegens and scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..exceptions import PhaserError

# Top English stopwords used by the n-gram/stopword language heuristic.
# Deliberately small: the point is a deterministic, vectorizable signal.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are",
)

_WS = r"\s+"


def tokens(col: SparkCol) -> SparkCol:
    """Whitespace tokenization (returns array<string>)."""
    return F.split(F.trim(col), _WS)


def token_count(col: SparkCol) -> SparkCol:
    """Whitespace token count."""
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tokens(col)))


def bpe_ish_token_count(col: SparkCol) -> SparkCol:
    """BPE-ish subword count: words + digits + punctuation runs, the way a
    byte-pair tokenizer fragments text (regex approximation).  Whitespace
    pieces of EVERY kind are excluded — filtering only the literal space
    would count tabs/newlines as tokens ("a\\t\\tb" = 4 but "a  b" = 2)."""
    pieces = F.split(F.trim(col), r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])")
    return F.size(F.filter(pieces, lambda p: p.rlike(r"\S")))


def stopword_ratio(col: SparkCol) -> SparkCol:
    """Fraction of tokens that are common-English stopwords."""
    toks = F.transform(tokens(F.lower(col)), lambda t: F.regexp_replace(t, r"[^a-z]", ""))
    hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def lang_id(col: SparkCol, threshold: float = 0.08) -> SparkCol:
    """Heuristic language ID: 'en' when the stopword ratio clears the
    threshold AND the text is mostly ASCII letters, else 'und'."""
    ascii_ratio = (
        F.length(F.regexp_replace(col, r"[^\x00-\x7F]", "")).cast("double")
        / F.greatest(F.length(col).cast("double"), F.lit(1.0))
    )
    return F.when(
        (stopword_ratio(col) >= threshold) & (ascii_ratio >= 0.9), F.lit("en")
    ).otherwise(F.lit("und"))


def punct_ratio(col: SparkCol) -> SparkCol:
    return (
        F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", "")).cast("double")
        / F.greatest(F.length(col).cast("double"), F.lit(1.0))
    )


def mean_word_len(col: SparkCol) -> SparkCol:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(
        F.size(toks) > 0, total.cast("double") / F.size(toks).cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(col: SparkCol) -> SparkCol:
    """Composite document quality in [0,1]: length, punctuation, stopword
    presence, mean word length — a Gopher-rules-flavored heuristic.

    The 6-digit truncation is floor-based (not round): every component is
    a deterministic IEEE double, and floor on the binary value is
    engine-independent, so the score is reproducible in an external SQL
    oracle (round() tie-breaking differs between Spark and DuckDB)."""
    n_chars = F.length(col).cast("double")
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4.0)
    stop_score = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    mwl = mean_word_len(col)
    word_len_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    combined = len_score * 0.3 + punct_penalty * 0.2 + stop_score * 0.3 + word_len_score * 0.2
    return F.floor(combined * 1000000.0) / F.lit(1000000.0)


def normalize_text(col: SparkCol) -> SparkCol:
    """Lowercase, collapse whitespace, strip non-alphanumerics — canonical
    form for fingerprinting."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", ""), _WS, " ")
    )


def fingerprint(col: SparkCol) -> SparkCol:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def rolling_fingerprints(col: SparkCol, n: int = 8, keep: int = 4) -> SparkCol:
    """Winnowing-style rolling fingerprint set: the ``keep`` smallest
    hashes of ``n``-word shingles of the normalized text (array<string>).
    A compact signature for containment-style near-dup checks."""
    words = F.split(normalize_text(col), " ")
    idx = F.sequence(
        F.lit(0), F.greatest(F.size(words) - n, F.lit(0))
    )
    shingles = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")
    )
    hashes = F.array_distinct(F.transform(shingles, F.md5))
    return F.slice(F.array_sort(hashes), 1, keep)


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals, per document:

    * ``dup_line_frac`` — fraction of (non-empty, trimmed) line occurrences
      that are repeats of an earlier identical line;
    * ``dup_line_char_frac`` — the same, weighted by line length;
    * ``top_2gram_char_frac`` — the largest share of 2-gram characters
      covered by any single word 2-gram (count × gram length);
    * ``dup_5gram_char_frac`` — fraction of 5-gram characters sitting in
      5-grams that occur more than once.

    Scale design: one explode over (line | 2-gram | 5-gram) parts, then a
    count keyed on ``(id, kind, item)`` — the wide key spreads even a
    pathologically repetitive document across reducers — followed by a
    per-``(id, kind)`` rollup and a left join back to the id spine so
    empty documents keep 0.0 rows.  Both aggregations are map-side
    combinable; no Python on the row path.
    """
    c = F.col(text_col)
    words = F.split(normalize_text(c), " ")

    def grams(n: int) -> SparkCol:
        return F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # NB: the lambda must be single-arg — F.trim itself takes an optional
    # second parameter, so transform(arr, F.trim) would bind the element
    # INDEX as trim's character set and silently not trim.
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )

    def tagged(kind: str, arr: SparkCol) -> SparkCol:
        return F.transform(
            arr, lambda x: F.struct(F.lit(kind).alias("kind"), x.alias("item"))
        )

    parts = df.select(
        F.col(id_col).alias("__rs_id"),
        F.explode(
            F.concat(tagged("line", lines), tagged("g2", grams(2)), tagged("g5", grams(5)))
        ).alias("p"),
    ).select("__rs_id", "p.kind", "p.item")
    counted = parts.groupBy("__rs_id", "kind", "item").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_kind = counted.groupBy("__rs_id", "kind").agg(
        F.sum("cnt").alias("occ"),
        F.sum(F.col("cnt") - 1).alias("dup_occ"),
        F.sum(F.col("cnt") * F.length("item")).alias("chars"),
        F.sum((F.col("cnt") - 1) * F.length("item")).alias("dup_chars"),
        F.max(F.col("cnt") * F.length("item")).alias("top_chars"),
    )

    def ratio(kind: str, num: str, den: str) -> SparkCol:
        # integer/integer double division: bit-identical across engines
        return F.coalesce(
            F.max(
                F.when(
                    F.col("kind") == kind,
                    F.col(num).cast("double") / F.col(den).cast("double"),
                )
            ),
            F.lit(0.0),
        )

    metrics = per_kind.groupBy("__rs_id").agg(
        ratio("line", "dup_occ", "occ").alias("dup_line_frac"),
        ratio("line", "dup_chars", "chars").alias("dup_line_char_frac"),
        ratio("g2", "top_chars", "chars").alias("top_2gram_char_frac"),
        ratio("g5", "dup_chars", "chars").alias("dup_5gram_char_frac"),
    )
    out = (
        df.join(metrics, df[id_col] == metrics["__rs_id"], "left")
        .drop("__rs_id")
        .fillna(
            0.0,
            subset=[
                "dup_line_frac",
                "dup_line_char_frac",
                "top_2gram_char_frac",
                "dup_5gram_char_frac",
            ],
        )
    )
    return out


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document top-``k`` characteristic terms by TF-IDF
    (engine addition; topic/quality analysis over a training corpus).

    Returns ``(doc_id, term, tf, score_e6, rank)`` — ``score_e6``
    is ``floor(score * 1e6)`` (truncated so cross-engine comparison is
    exact at 6 digits).  The idf is the BM25
    rational form ``(N - df + 0.5) / (df + 0.5)`` rather than a
    logarithm: every arithmetic step is an IEEE-deterministic
    division/multiply, so an external SQL oracle (DuckDB) reproduces the
    scores bit-for-bit — ``ln`` is libm-dependent and may differ in the
    last ulp across engines.  Ranking ties break on the term string, so
    top-``k`` membership is deterministic.

    Scale shape: tf is one (doc, term) aggregate (map-side combine); df
    is one (term) aggregate over the tf table (rows, not text, shuffle on
    the term key — unavoidable: a 100 TB corpus's vocabulary is billions
    of terms, never broadcastable); the final per-document window
    partitions on doc_id — no global window, no driver state.
    """
    from .dedup import staged_words

    words = staged_words(df, id_col, text_col).select(
        "id", F.explode("words").alias("term")
    ).filter(F.col("term") != "")
    tf = words.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (
                (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "term",
            "tf",
            F.floor(F.col("score") * 1e6).cast("double").alias("score_e6"),
            "rank",
        )
    )


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full stat column family in one projection."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_subword_tokens"),
        stopword_ratio(c).alias("stopword_ratio"),
        punct_ratio(c).alias("punct_ratio"),
        lang_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 128,
    overlap_words: int = 0,
    chunk_id_col: str = "chunk_id",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Split documents into fixed-size word chunks with optional overlap
    — the retrieval/RAG preparation step (embed chunks, not documents).

    Chunk k covers words ``[k·stride, k·stride + chunk_words)`` with
    ``stride = chunk_words − overlap_words``; the final chunk is the
    remainder (never empty, never duplicated: a doc whose tail is
    already covered emits no extra chunk).  Returns one row per chunk:
    the input columns minus ``text_col`` plus ``(chunk_id int,
    chunk string, n_chunk_words int)``.  Empty/NULL texts yield no
    rows.

    Pure Catalyst: one staged word split (attribute, not re-evaluated
    per chunk — the lambda re-evaluation trap measured 8× on the span
    scrubber), a ``sequence``+``transform`` chunk build, one explode —
    linear fan-out ``≈ words/stride``, no shuffle, no Python.
    """
    if chunk_words < 1 or not 0 <= overlap_words < chunk_words:
        raise PhaserError(
            "chunk_documents needs chunk_words >= 1 and 0 <= overlap_words < chunk_words"
        )
    from ..lineage import spread_for_compute

    stride = chunk_words - overlap_words
    passthrough = [c for c in df.columns if c != text_col]
    staged = spread_for_compute(
        df.select(*passthrough, F.split(F.col(text_col), r"\s+").alias("__ck_w"))
    )
    words = F.filter(F.col("__ck_w"), lambda w: w != "")
    staged = staged.select(*passthrough, words.alias("__ck_w"))
    n = F.size(F.col("__ck_w"))
    # number of chunks: ceil((n - overlap) / stride), at least 1 for any
    # non-empty doc
    n_chunks = F.when(
        n > 0, F.greatest(F.ceil((n - overlap_words) / F.lit(stride)), F.lit(1))
    ).otherwise(F.lit(0))
    # guard the generator: Spark's sequence(0, -1) DESCENDS instead of
    # being empty, so zero-chunk docs must get an explicit empty array
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks.cast("int") - 1),
            lambda k: F.struct(
                k.cast("int").alias("cid"),
                F.slice(F.col("__ck_w"), k * stride + 1, chunk_words).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<cid:int,w:array<string>>>"))
    exploded = staged.select(
        *passthrough, F.explode(chunks).alias("__ck_c")
    )
    return exploded.select(
        *passthrough,
        F.col("__ck_c.cid").alias(chunk_id_col),
        F.array_join(F.col("__ck_c.w"), " ").alias(chunk_col),
        F.size(F.col("__ck_c.w")).alias("n_chunk_words"),
    )


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "char_entropy",
) -> DataFrame:
    """Shannon entropy (bits per character) of each document's character
    distribution — the compression-style quality signal: natural prose
    sits in a language-typical band, while gibberish/random strings
    score high and boilerplate/repeated-character junk scores low.
    Complements the word-level heuristics in :func:`quality_score`.

    Computed as ``log2(n) − (Σ c·log2 c)/n`` over per-character counts
    ``c`` (algebraically identical to ``−Σ p·log2 p`` but needs no
    per-term division).  The cross-partition sum accumulates per-term
    doubles as decimal — order-insensitive, so the score is
    bit-identical under any shuffle layout — and the result is
    truncated to 6 digits (engine-reproducible; the DuckDB oracle
    replays it exactly).  Empty/NULL text ⇒ NULL entropy.

    Scale: one explode to (doc, char) — linear in corpus characters,
    and a pathologically long document spreads across tasks because the
    first aggregate is keyed on (doc, char) — then a per-doc aggregate
    whose state is bounded by the alphabet size.  Zero Python, zero
    driver traffic.
    """
    # split('') is code-point-wise and LINEAR in the document; a
    # substr(i, 1) loop would re-seek the UTF-8 string per character
    # (quadratic on a pathologically long doc).  Empty texts split to
    # [''] — the filter drops that element, so they get NULL entropy
    # through the left join like NULL texts do.
    chars = df.select(
        F.col(id_col).alias("__ce_id"),
        F.explode(F.split(F.col(text_col), "")).alias("__ce_ch"),
    ).filter(F.col("__ce_ch") != "")
    counts = chars.groupBy("__ce_id", "__ce_ch").agg(
        F.count(F.lit(1)).alias("__ce_c")
    )
    c = F.col("__ce_c").cast("double")
    ent = counts.groupBy("__ce_id").agg(
        F.sum("__ce_c").alias("__ce_n"),
        F.sum((c * F.log2(c)).cast("decimal(28,12)")).alias("__ce_s"),
    )
    score = (
        F.log2(F.col("__ce_n").cast("double"))
        - F.col("__ce_s").cast("double") / F.col("__ce_n").cast("double")
    )
    from .dedup import trunc_digits

    ent = ent.select(
        "__ce_id", trunc_digits(score, 6).alias(out_col)
    )
    return df.join(
        ent, F.col(id_col) == F.col("__ce_id"), "left"
    ).drop("__ce_id")


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "surprisal",
) -> DataFrame:
    """Corpus-relative unigram cross-entropy per document: the mean
    ``−log2 p(w)`` of a document's tokens under the CORPUS unigram
    distribution ``p(w) = count(w) / N`` — the model-free proxy for the
    LM-perplexity quality filter (CCNet-style): documents full of
    corpus-typical words score low, rare-word soup / wrong-language /
    gibberish text scores high.  Complements :func:`char_entropy`
    (doc-local, character-level) with a corpus-relative word-level
    signal.

    Tokenization is :func:`normalize_text` + whitespace split (the same
    canonical form the dedup/TF-IDF family uses, replayable in SQL).
    Per-doc token surprisals accumulate as decimal — order-insensitive,
    so the score is bit-identical under any shuffle layout — and the
    mean is truncated to 6 digits.  Empty/NULL text ⇒ NULL score.

    Scale: one (doc, word) explode; the vocabulary count is a
    word-keyed aggregate (cardinality grows with the corpus, the
    shuffle spreads); scoring is an equi-join of doc-words against the
    vocabulary — all standard shuffles on high-cardinality keys, no
    broadcast of anything corpus-sized, no Python, no driver traffic.
    """
    from .dedup import trunc_digits

    words = df.select(
        F.col(id_col).alias("__us_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("__us_w"),
    ).filter(F.col("__us_w") != "")
    vocab = words.groupBy("__us_w").agg(F.count(F.lit(1)).alias("__us_c"))
    # p(w) = c/N; surprisal(w) = -log2(c/N) = log2(N) - log2(c).  N rides
    # along as a broadcast one-row aggregate so the whole operator stays
    # one lazy plan (no driver-side count action).
    total = vocab.agg(F.sum("__us_c").alias("__us_nt"))
    term = (
        F.log2(F.col("__us_nt").cast("double"))
        - F.log2(F.col("__us_c").cast("double"))
    ).cast("decimal(28,12)")
    scored = (
        words.join(vocab, "__us_w")
        .crossJoin(F.broadcast(total))
        .groupBy("__us_id")
        .agg(
            F.count(F.lit(1)).alias("__us_n"),
            F.sum(term).alias("__us_s"),
        )
        .select(
            "__us_id",
            trunc_digits(
                F.col("__us_s").cast("double") / F.col("__us_n").cast("double"), 6
            ).alias(out_col),
        )
    )
    return df.join(
        scored, F.col(id_col) == F.col("__us_id"), "left"
    ).drop("__us_id")
