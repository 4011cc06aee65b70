"""Cross-document exact-substring dedup via content-defined chunking.

The MinHash / SimHash / semantic families in :mod:`.dedup` answer "are
these two DOCUMENTS near-duplicates?".  This module answers the finer
question large-corpus curation also needs (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"): *which
SPANS of text are repeated verbatim across documents* — boilerplate
headers, license blocks, templated paragraphs — and what the corpus
looks like with the repeats removed.  The published approach builds a
corpus-wide suffix array, which does not distribute; the scale-right
equivalent used here is **content-defined chunking** (CDC), the trick
storage dedup systems use: chunk boundaries are decided by a rolling
hash of the text itself, so a span duplicated at *different offsets* in
two documents still splits into the *same* chunks, and duplicated text
is then found with one hash-shuffle GROUP BY — no pairwise comparison,
no global index.

Scale design (the reason each shape was chosen):

* **Boundary detection is the only Python** — a vectorized Arrow batch
  computing gear-hash boundaries as ``array<struct<start,len>>`` (a
  sliding-window uint64 dot product in numpy, O(64·n) per doc).  Chunk
  hashing stays in Catalyst (``substr`` + ``md5`` over the raw bytes)
  so the explode → aggregate spine whole-stage-codegens.
* **Duplicate detection is one shuffle**: GROUP BY chunk hash with a
  ``count(distinct doc)`` and a ``min(struct(doc,start))`` winner — the
  first occurrence (lowest id, then offset) keeps the span, every other
  occurrence is "duplicated".  Linear in corpus size; no key can go
  quadratic because nothing is ever paired (a hot boilerplate hash
  costs its row count, not its square — AQE absorbs the residual skew).
* **Scrub is a second shuffle**: verdicts join back to chunks on hash,
  surviving spans re-assemble per doc with ``array_sort`` + a Catalyst
  ``aggregate`` fold — bounded per-doc state (≤ len/min_len spans), no
  Python in the reassembly.
* **`mode="aligned"`** cuts fixed blocks instead (pure Catalyst,
  SQL-expressible) — same relational spine, used by the DuckDB oracle;
  CDC mode is pinned against a pure-Python reference in unit tests.

On 100 TB: chunking is embarrassingly parallel after
:func:`~phaser_spark.lineage.spread_for_compute`; the hash GROUP BY
shuffles ~(corpus/avg_chunk) rows of ~50 bytes — about 1/20 of the
corpus bytes at the 1 KiB default target.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exceptions import PhaserError
from ..lineage import spread_for_compute

# Gear table: 256 deterministic uint64 mixing constants (seeded — chunk
# boundaries must be stable across sessions, engines and rounds).  Full
# 64-bit draws: the cut test is ``h & mask == 0`` on the LOW bits, and
# the newest byte's constant lands unshifted — any bit bias in the
# table (e.g. forcing odd constants) would make some residues
# unreachable and kill content cuts entirely.
_GEAR = np.random.RandomState(0x9E3779B9 % (2**32)).randint(
    -(2**63), 2**63, size=256, dtype=np.int64
).astype(np.uint64)

_GEAR_WINDOW = 64  # chars of memory in the rolling hash (uint64 shift width)

_SPAN_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType(), False),
            T.StructField("len", T.IntegerType(), False),
        ]
    )
)


def _gear_boundaries_one(
    data: bytes, mask: int, min_len: int, max_len: int
) -> list[tuple[int, int]]:
    """Greedy FastCDC-style cut points for one document (byte offsets).

    The rolling hash at position ``p`` is the gear fold of the last 64
    bytes: ``h(p) = Σ_{j<64} GEAR[b[p-j]] << j (mod 2^64)`` — a cut is
    allowed *after* ``p`` when ``h(p) & mask == 0``.  Cuts are taken
    greedily subject to ``min_len``/``max_len``; a chunk that reaches
    ``max_len`` without a content cut splits there (degenerate inputs —
    e.g. one repeated byte — must not produce unbounded chunks).

    Vectorized: the fold is a sliding-window dot product with wrapping
    uint64 arithmetic; the greedy walk loops over *chunks* (≤ n/min_len
    iterations), not characters.
    """
    n = len(data)
    if n == 0:
        return []
    w = _GEAR_WINDOW
    g = _GEAR[np.frombuffer(data, dtype=np.uint8)]
    if n >= w:
        windows = np.lib.stride_tricks.sliding_window_view(g, w)
        weights = np.uint64(1) << np.arange(w - 1, -1, -1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = (windows * weights).sum(axis=1, dtype=np.uint64)
        # h[i] covers bytes [i, i+w) → a content cut lands AFTER byte
        # i+w-1, i.e. boundary index i+w
        cuts = np.flatnonzero((h & np.uint64(mask)) == 0) + w
    else:
        cuts = np.empty(0, dtype=np.int64)
    spans: list[tuple[int, int]] = []
    pos = 0
    while pos < n:
        lo = pos + min_len
        hi = min(pos + max_len, n)
        if lo >= hi:
            spans.append((pos, n - pos))
            break
        i = int(np.searchsorted(cuts, lo, side="left"))
        cut = int(cuts[i]) if i < len(cuts) and cuts[i] <= hi else hi
        spans.append((pos, cut - pos))
        pos = cut
    return spans


def _resolve_lens(
    target_len: int, min_len: int | None, max_len: int | None
) -> tuple[int, int, int]:
    if target_len < 8 or (target_len & (target_len - 1)) != 0:
        raise PhaserError(
            f"cdc: target_len must be a power of two >= 8, got {target_len}"
        )
    lo = min_len if min_len is not None else max(1, target_len // 4)
    hi = max_len if max_len is not None else target_len * 4
    if not (0 < lo <= hi):
        raise PhaserError(f"cdc: need 0 < min_len <= max_len, got {lo}, {hi}")
    return target_len - 1, lo, hi


def cdc_boundaries(
    text: SparkCol,
    *,
    target_len: int = 1024,
    min_len: int | None = None,
    max_len: int | None = None,
) -> SparkCol:
    """``array<struct<start,len>>`` of content-defined chunk spans.

    ``target_len`` sets the boundary mask (expected chunk ≈ target;
    must be a power of two); ``min_len``/``max_len`` default to
    target/4 and target·4.  Offsets are **byte** offsets of the UTF-8
    encoding — pair extraction with a *binary* ``substr``, not a
    character one, for non-ASCII text.

    Null text yields an empty span list (null-in → no chunks, matching
    the dedup family's null handling).
    """
    mask, lo, hi = _resolve_lens(target_len, min_len, max_len)

    @F.pandas_udf(_SPAN_T)
    def _bounds(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            if v is None:
                out.append([])
                continue
            data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            out.append(
                [
                    {"start": int(a), "len": int(b)}
                    for a, b in _gear_boundaries_one(data, mask, lo, hi)
                ]
            )
        return pd.Series(out)

    return _bounds(text)


def _aligned_boundaries(text: SparkCol, block_len: int) -> SparkCol:
    """Fixed non-overlapping blocks (pure Catalyst; SQL-expressible).

    The relational spine downstream is identical to CDC mode — this mode
    exists so the driver oracle can replay the whole operator in ANSI
    SQL, and as the cheap choice when offset drift is not a concern
    (e.g. machine-generated records duplicated wholesale).  Offsets are
    CHARACTER offsets (`substring` semantics), the units the oracle's
    ``substr`` uses."""
    nblocks = F.ceil(F.length(text) / F.lit(block_len)).cast("int")
    idx = F.when(nblocks > 0, F.sequence(F.lit(0), nblocks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.struct(
            (i * block_len).cast("int").alias("start"),
            F.least(F.lit(block_len), F.length(text) - i * block_len)
            .cast("int")
            .alias("len"),
        ),
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    mode: str = "cdc",
    target_len: int = 1024,
    min_len: int | None = None,
    max_len: int | None = None,
    min_chunk_report: int = 1,
) -> DataFrame:
    """One row per chunk: ``(doc, chunk_start, chunk_len, chunk_hash)``.

    ``mode="cdc"`` (default): gear-hash content-defined boundaries —
    duplicated spans chunk identically at any offset.  ``mode="aligned"``:
    fixed ``target_len``-character blocks, pure Catalyst (``target_len``
    need not be a power of two in this mode).  Either way the chunk text
    is extracted and md5-hashed engine-side; chunks shorter than
    ``min_chunk_report`` are dropped (a trailing 1-byte sliver is noise
    to the dup report).
    """
    if mode not in ("cdc", "aligned"):
        raise PhaserError(f"cdc_chunks: unknown mode {mode!r}")
    base = spread_for_compute(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_text"))
    )
    if mode == "aligned":
        staged = base.withColumn(
            "_spans", _aligned_boundaries(F.col("_text"), target_len)
        )
        # character slice of the string — md5(cast(str as binary)) hashes
        # the UTF-8 bytes, exactly DuckDB's md5(substr(text, ...))
        chunk_hash = F.md5(
            F.expr("substring(_text, s.start + 1, s.len)").cast("binary")
        )
    else:
        staged = base.withColumn(
            "_spans",
            cdc_boundaries(
                F.col("_text"), target_len=target_len, min_len=min_len, max_len=max_len
            ),
        ).withColumn("_raw", F.encode(F.col("_text"), "UTF-8"))
        # byte slice of the encoding; md5 over raw bytes, no re-decode
        chunk_hash = F.md5(F.expr("substr(_raw, s.start + 1, s.len)"))
    return (
        staged.select("doc", "_text", *(["_raw"] if mode == "cdc" else []),
                      F.explode("_spans").alias("s"))
        .where(F.col("s.len") >= min_chunk_report)
        .select(
            "doc",
            F.col("s.start").alias("chunk_start"),
            F.col("s.len").alias("chunk_len"),
            chunk_hash.alias("chunk_hash"),
        )
    )


def _maybe_pin(chunks: DataFrame, cache_chunks: bool) -> DataFrame:
    """The chunk table feeds BOTH the verdict aggregate and the join-back
    side, and (the DSIR r12 measurement) Spark's exchange reuse does not
    unify such consumers — without a pin the corpus re-chunks per
    consumer.  Small corpora recompute faster than they persist; at
    100 TB pass ``cache_chunks=True`` so chunking happens once.  Cache
    ownership follows the dedup family: the caller clears it."""
    if cache_chunks:
        from pyspark import StorageLevel

        return chunks.persist(StorageLevel.MEMORY_AND_DISK)
    return chunks


def _chunk_verdicts(chunks: DataFrame) -> DataFrame:
    """Per distinct (hash, len): occurrence spread + corpus-order winner."""
    return chunks.groupBy("chunk_hash", "chunk_len").agg(
        F.countDistinct("doc").alias("n_docs"),
        F.min(F.struct("doc", "chunk_start")).alias("winner"),
    )


def substring_dup_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    mode: str = "cdc",
    target_len: int = 1024,
    min_len: int | None = None,
    max_len: int | None = None,
    cache_chunks: bool = False,
) -> DataFrame:
    """Per-document verbatim-duplication report.

    Returns ``(doc, total_chunks, dup_chunks, dup_chars, total_chars,
    dup_frac)`` where a chunk is *duplicated* when its (hash, len)
    appears in >= 2 distinct documents and this occurrence is not the
    winner (winner = lowest ``(doc, start)`` — the first occurrence in
    corpus order keeps the span, mirroring keep-first dedup).  Documents
    with no chunks (null/empty text) have no report row.

    Two shuffles total: the hash GROUP BY and the per-doc roll-up; the
    verdict table is one row per *distinct* chunk, joined back on the
    hash — never paired.
    """
    chunks = _maybe_pin(
        cdc_chunks(
            df, id_col, text_col, mode=mode, target_len=target_len,
            min_len=min_len, max_len=max_len,
        ),
        cache_chunks,
    )
    tagged = chunks.join(_chunk_verdicts(chunks), ["chunk_hash", "chunk_len"]).withColumn(
        "is_dup",
        (F.col("n_docs") >= 2)
        & ~(
            (F.col("doc") == F.col("winner.doc"))
            & (F.col("chunk_start") == F.col("winner.chunk_start"))
        ),
    )
    dup_chars = F.sum(F.when(F.col("is_dup"), F.col("chunk_len")).otherwise(0))
    return tagged.groupBy("doc").agg(
        F.count("*").alias("total_chunks"),
        F.sum(F.col("is_dup").cast("int")).alias("dup_chunks"),
        dup_chars.alias("dup_chars"),
        F.sum("chunk_len").alias("total_chars"),
        (dup_chars / F.greatest(F.sum("chunk_len"), F.lit(1))).alias("dup_frac"),
    )


def substring_scrub(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    mode: str = "cdc",
    target_len: int = 1024,
    min_len: int | None = None,
    max_len: int | None = None,
    cache_chunks: bool = False,
) -> DataFrame:
    """Rebuild each document with duplicated chunks removed.

    Every chunk that is duplicated elsewhere (same (hash, len) in >= 2
    docs) and is not the corpus-order winner is dropped; surviving spans
    re-concatenate in offset order.  Output: the input columns with
    ``text_col`` replaced by the scrubbed text plus ``scrubbed_chars``
    (chars removed; 0 for untouched docs).  Null text stays null.

    The per-doc fold state is the kept-span list (<= len/min_len
    entries) — bounded — and the fold itself is a Catalyst ``aggregate``
    over the sorted span array: no Python in the reassembly.
    """
    chunks = _maybe_pin(
        cdc_chunks(
            df, id_col, text_col, mode=mode, target_len=target_len,
            min_len=min_len, max_len=max_len,
        ),
        cache_chunks,
    )
    kept = (
        chunks.join(_chunk_verdicts(chunks), ["chunk_hash", "chunk_len"])
        .where(
            (F.col("n_docs") < 2)
            | (
                (F.col("doc") == F.col("winner.doc"))
                & (F.col("chunk_start") == F.col("winner.chunk_start"))
            )
        )
        .groupBy("doc")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_start", "chunk_len"))
            ).alias("_kept")
        )
    )
    joined = df.join(kept, F.col(id_col) == F.col("doc"), "left").drop("doc")
    if mode == "cdc":
        # byte-offset spans fold over the UTF-8 encoding, then decode once
        joined = joined.withColumn("_rawsrc", F.encode(F.col(text_col), "UTF-8"))
        joined = joined.withColumn(
            "_scrub",
            F.decode(
                F.expr(
                    "aggregate(coalesce(_kept, array()), cast('' as binary), "
                    "(acc, s) -> concat(acc, substr(_rawsrc, s.chunk_start + 1, s.chunk_len)))"
                ),
                "UTF-8",
            ),
        )
        drop_cols = ["_kept", "_rawsrc", "_scrub"]
    else:
        joined = joined.withColumn(
            "_scrub",
            F.expr(
                f"aggregate(coalesce(_kept, array()), '', "
                f"(acc, s) -> concat(acc, substring(`{text_col}`, s.chunk_start + 1, s.chunk_len)))"
            ),
        )
        drop_cols = ["_kept", "_scrub"]
    out = joined.withColumn(
        "scrubbed_chars",
        F.when(
            F.col(text_col).isNull(), F.lit(0)
        ).otherwise(F.length(text_col) - F.length("_scrub")),
    ).withColumn(
        text_col,
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string")).otherwise(
            F.col("_scrub")
        ),
    )
    return out.drop(*drop_cols)
