"""Distributed BPE tokenizer training + tokenization.

Byte-pair encoding is trained on the corpus' WORD-FREQUENCY table, not
the raw text (the standard trick every tokenizer trainer uses): one
corpus pass builds ``(word, freq)`` — vocabulary-scale, orders of
magnitude smaller than the corpus — and every merge round then runs on
that table alone.  Each round counts adjacent symbol pairs (weighted by
word frequency, overlapping occurrences counted — the classic rule),
picks the most frequent pair with a deterministic tie-break (count
desc, then left/right symbol ascending), and merges it greedily
left-to-right in every word.

Merge application is a plain string ``replace``: words are represented
with every symbol wrapped in a separator char (``\\x1f``, unreachable
after :func:`.text.normalize_text`), so the pattern
``␟a␟␟b␟ → ␟ab␟`` is EXACTLY the greedy non-overlapping left-to-right
merge — wrapped occurrences never share characters, so ``[a,b,a,b]``
merges both pairs while ``[a,a,a]`` merges only the first two, matching
reference BPE.  The same ``replace`` exists verbatim in DuckDB, which
is what makes the training loop replayable as an unrolled-CTE SQL
oracle (the pagerank-oracle pattern).

Scale design:

* The corpus is read ONCE (word-count aggregate, map-side combinable).
  Rounds run on the persisted vocabulary table; lineage is cut with
  ``localCheckpoint`` every ``checkpoint_every`` rounds.
* Each round is one explode + one GROUP BY over vocabulary rows, plus a
  single-row ``collect`` (the argmax pair) — ``num_merges`` bounded
  driver round-trips, like pagerank's fixed iterations.
* :func:`bpe_tokenize` broadcasts the merge ranks and applies the
  standard lowest-rank-first merge loop per distinct word in an Arrow
  batch (per-word iterative logic is the documented Pandas-UDF
  escape hatch), with a per-batch word memo — corpus token streams
  re-tokenize each distinct word once per batch, not once per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exceptions import PhaserError
from .dedup import staged_words

SEP = "\x1f"


def _word_freqs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One corpus pass: ``(word, freq)`` over normalized tokens."""
    words = staged_words(df, id_col, text_col)
    return (
        words.select(F.explode("words").alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _wrap_chars(word: SparkCol) -> SparkCol:
    """``abc`` → ``␟a␟␟b␟␟c␟`` (every initial symbol wrapped)."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.concat(F.lit(SEP), F.substring(word, i, 1), F.lit(SEP)),
        ),
        "",
    )


def _split_wrapped(s: SparkCol) -> SparkCol:
    """Wrapped string back to the symbol array (strip the outer
    separators, split on the doubled inner ones)."""
    return F.split(F.substring(s, 2, F.length(s) - 2), SEP + SEP)


def bpe_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_merges: int = 100,
    min_pair_count: int = 2,
    checkpoint_every: int | None = None,
) -> list[tuple[str, str, int]]:
    """Train ``num_merges`` BPE merges on the corpus; returns the merge
    table ``[(left, right, pair_count), ...]`` in rank order.

    Stops early when the best remaining pair's weighted count falls
    below ``min_pair_count``.  Deterministic: pair counts are exact
    integer sums and ties break on (left, right) ascending, so the same
    corpus always yields the same merges under any partitioning.
    """
    if num_merges < 1:
        raise PhaserError(f"bpe_train: num_merges must be >= 1, got {num_merges}")
    if min_pair_count < 1:
        raise PhaserError(
            f"bpe_train: min_pair_count must be >= 1, got {min_pair_count}"
        )
    if checkpoint_every is None:
        # r12 (guide §1/§7): every UN-checkpointed round stacks one more
        # replace() onto the vocab plan, so each round's whole-stage
        # codegen source is NEW — janino compiles num_merges distinct
        # stages and a cold 8-merge train spent 12.6 s vs 5.5 s at sf0.1.
        # Checkpointing every round pins the per-round plan shape (scan →
        # replace → pair-count), compiled once.  Past ~16 merges the
        # per-round vocabulary materialization dominates that constant
        # (at corpus scale the vocab table is billions of rows), so long
        # trains keep the stack-20-then-checkpoint cadence.
        checkpoint_every = 1 if num_merges <= 16 else 20
    if checkpoint_every < 1:
        raise PhaserError(
            f"bpe_train: checkpoint_every must be >= 1, got {checkpoint_every}"
        )
    vocab = _word_freqs(df, id_col, text_col).select(
        "freq", _wrap_chars(F.col("word")).alias("s")
    )
    vocab = vocab.localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for rank in range(num_merges):
        arr = _split_wrapped(F.col("s"))
        pairs = (
            vocab.select("freq", arr.alias("__syms"))
            .select(
                "freq",
                F.explode(
                    F.when(
                        F.size("__syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("__syms") - 1),
                            lambda i: F.struct(
                                F.element_at("__syms", i).alias("a"),
                                F.element_at("__syms", i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        pattern = F.lit(SEP + a + SEP + SEP + b + SEP)
        repl = F.lit(SEP + a + b + SEP)
        vocab = vocab.select("freq", F.replace(F.col("s"), pattern, repl).alias("s"))
        if (rank + 1) % checkpoint_every == 0:
            # LAZY checkpoint: the replace materializes inside the next
            # round's pair-count job instead of paying a separate eager
            # job per round (2 jobs/round -> 1; the stored rows and the
            # pinned per-round plan shape are identical either way).
            vocab = vocab.localCheckpoint(eager=False)
    return merges


def bpe_merges_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_merges: int = 100,
    min_pair_count: int = 2,
) -> DataFrame:
    """:func:`bpe_train` as a relational result:
    ``(rank, left, right, pair_count)`` — the shape the SQL oracle
    replays round-for-round."""
    spark = df.sparkSession
    merges = bpe_train(
        df, id_col, text_col, num_merges=num_merges, min_pair_count=min_pair_count
    )
    rows = [
        (i + 1, a, b, cnt) for i, (a, b, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, pair_count bigint"
    )


def _merge_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE tokenization: repeatedly merge the LOWEST-RANK
    adjacent pair until none applies (the standard inference rule —
    equivalent to replaying training merges in order)."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    *,
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize each document with a trained merge table: normalized
    words re-merge lowest-rank-first; output is the flat token array
    per document (plus ``n_tokens``).

    The rank dict broadcasts (vocab_merges entries); per-word merging
    is iterative so it runs as an Arrow batch with a per-batch word
    memo — each distinct word tokenizes once per batch."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(words_col: pd.Series) -> pd.Series:
        r = bc.value
        memo: dict[str, list[str]] = {}
        out = []
        for ws in words_col:
            toks: list[str] = []
            for w in ws if ws is not None else []:
                if w not in memo:
                    memo[w] = _merge_word(w, r)
                toks.extend(memo[w])
            out.append(toks)
        return pd.Series(out)

    words = staged_words(df, id_col, text_col).select(
        "id", F.filter("words", lambda w: w != "").alias("__ws")
    )
    toked = words.select("id", _tok(F.col("__ws")).alias(out_col))
    return (
        df.join(toked, F.col(id_col) == F.col("id"), "left")
        .drop("id")
        .withColumn("n_tokens", F.coalesce(F.size(out_col), F.lit(0)))
    )
