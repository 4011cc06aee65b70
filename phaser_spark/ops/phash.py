"""Perceptual-hash (dHash) image fingerprinting + Hamming-radius dedup.

The text dedup family's missing sibling for MEDIA columns: a 63-bit
difference hash over a small grayscale grid (compare each cell with its
right neighbor — robust to rescaling/recompression, the standard cheap
perceptual fingerprint), then near-duplicate pairs by Hamming radius
with the same 4-chunk pigeonhole equi-join the SimHash text path uses —
never all-pairs.

Decode plumbing per the engine's multimodal policy (no codecs in the
build sandbox): the REAL path decodes with PIL when importable
(7×10 grayscale grid, NEAREST — deterministic); the FAKE path derives
the grid from md5 chains of the payload bytes — entirely Catalyst
expressions with INTEGER-only semantics, so the whole
grid→bits→hash pipeline replays exactly in the DuckDB oracle.  Both
paths share everything after the grid.

Why 63 bits (7 rows × 9 comparisons over a 7×10 grid): the packed hash
must live in a signed 64-bit integer in BOTH engines — bit 63 would
wrap in Spark and overflow-error in DuckDB — and 63 bits keeps
``1 << k`` exact signed arithmetic everywhere.

Scale: hashing is per-row projection (fake: pure codegen; real: Arrow
batches).  The pair join explodes 4 chunk keys per doc and equi-joins
on (chunk_idx, chunk_value) — identical-hash floods cost their bucket
count, not the corpus square, and ``max_hamming <= 3`` preserves the
pigeonhole recall guarantee (4 chunks: any ≤3-bit difference leaves
one chunk equal).
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exceptions import PhaserError

GRID_ROWS = 7
GRID_COLS = 10
N_BITS = (GRID_COLS - 1) * GRID_ROWS  # 63


def fake_gray_grid(content: SparkCol) -> SparkCol:
    """Deterministic decode STAND-IN: 7×10 grid of 0..255 cells from md5
    chains of the payload — ``cell(i) = int(md5(md5(content) || '-' ||
    i)[:2], 16)``.  Pure Catalyst, integer-only, byte-replayable in any
    engine with md5 (the SQL oracle recomputes it verbatim).  NULL
    content → NULL grid (undecodable-media semantics)."""
    base = F.md5(content)
    return F.when(
        content.isNotNull(),
        F.transform(
            F.sequence(F.lit(0), F.lit(GRID_ROWS * GRID_COLS - 1)),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.concat(base, F.lit("-"), i.cast("string"))), 1, 2
                ),
                16,
                10,
            ).cast("int"),
        ),
    )


def real_gray_grid(
    df: DataFrame, content_col: str = "content", out_col: str = "gray_grid"
) -> DataFrame:
    """REAL decode path (PIL, executor-side, Arrow batches): convert to
    grayscale, resize to (cols, rows) with NEAREST (deterministic
    integer pixels), emit the row-major 7×10 grid.  Undecodable payloads
    get a NULL grid — corrupt media is a data fact, not a job failure.
    Raises ``NotImplementedError`` without a codec, matching
    ``multimodal.decode_and_featurize``."""
    from .multimodal import _HAS_PIL

    if not _HAS_PIL:
        raise NotImplementedError(
            "real_gray_grid needs an image codec (PIL); not available in "
            "this environment — use fake_gray_grid (deterministic stand-in)"
        )
    import pandas as pd

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _grid(payloads: pd.Series) -> pd.Series:
        import io as _io

        from PIL import Image

        out = []
        for payload in payloads:
            if payload is None:
                out.append(None)
                continue
            try:
                img = Image.open(_io.BytesIO(bytes(payload)))
                g = img.convert("L").resize((GRID_COLS, GRID_ROWS), Image.NEAREST)
                out.append([int(p) for p in g.getdata()])
            except Exception:
                out.append(None)
        return pd.Series(out)

    return df.withColumn(out_col, _grid(F.col(content_col)))


def dhash_bits(grid: SparkCol) -> SparkCol:
    """63-bit difference hash of a row-major 7×10 grid: bit ``r*9+c`` is
    set when ``cell(r,c) < cell(r,c+1)``.  The packing is a 63-term sum
    of LITERAL powers of two (no shift-by-column, which neither engine's
    function API offers) — integer-exact and identical in any engine.
    NULL grid → NULL hash."""
    terms = []
    for k in range(N_BITS):
        r, c = divmod(k, GRID_COLS - 1)
        left = F.element_at(grid, r * GRID_COLS + c + 1)
        right = F.element_at(grid, r * GRID_COLS + c + 2)
        terms.append(
            F.when(left < right, F.lit(1 << k).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return F.when(grid.isNotNull(), total)


def hamming_dup_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    *,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs ``(id_a, id_b, hamming)`` with
    ``hamming(hash_a, hash_b) <= max_hamming`` — the SimHash pigeonhole
    shape on an arbitrary precomputed 63-bit hash column: 4×16-bit
    chunks explode to (chunk_idx, chunk_val) keys, candidates meet on an
    equi-join (only docs sharing ≥1 exact chunk — guaranteed complete
    for radius ≤ 3), then the true Hamming distance filters.  NULL
    hashes never pair."""
    if not (0 <= max_hamming <= 3):
        raise PhaserError(
            "hamming_dup_pairs: the 4-chunk pigeonhole guarantees recall only "
            f"for max_hamming <= 3, got {max_hamming} — re-chunk for larger radii"
        )
    base = df.select(
        F.col(id_col).alias("id"), F.col(hash_col).cast("bigint").alias("h")
    ).where(F.col("h").isNotNull())
    chunks = base.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("ci"),
                        F.shiftright(F.col("h"), 16 * j)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "h", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def media_phash(
    df: DataFrame,
    id_col: str,
    content_col: str,
    *,
    real_decode: bool = False,
    out_col: str = "phash",
) -> DataFrame:
    """``(id, phash)`` for a binary media column — fake (Catalyst md5
    grid) or real (PIL) decode, shared dHash afterwards."""
    # The grid projection is the expensive part (70 md5 chains per row,
    # interpreted — the transform HOF breaks whole-stage codegen) and a
    # single-row-group scan would run it all on ONE core; fan out first
    # (no-op on well-split cluster inputs — see spread_for_compute).
    from ..lineage import spread_for_compute

    df = spread_for_compute(df)
    if real_decode:
        staged = real_gray_grid(df, content_col, out_col="__grid")
    else:
        staged = df.withColumn("__grid", fake_gray_grid(F.col(content_col)))
    return staged.select(
        F.col(id_col), dhash_bits(F.col("__grid")).alias(out_col)
    )


def phash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    content_col: str,
    *,
    max_hamming: int = 3,
    real_decode: bool = False,
) -> DataFrame:
    """End-to-end: hash every payload, then Hamming-radius pairs."""
    hashed = media_phash(df, id_col, content_col, real_decode=real_decode)
    return hamming_dup_pairs(hashed, id_col, "phash", max_hamming=max_hamming)
