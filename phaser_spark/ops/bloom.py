"""Bloom-filter pruned semi/anti joins (engine addition; the reference
joins via driver-side dict lookups, phaser/steps.py extra_sources idiom —
no pre-shuffle pruning exists there, SURVEY §2.4).

The 100 TB problem this solves: a semi/anti join of a huge fact table
against a modest key set (decontamination benchmark IDs, a blocklist, an
allow-listed user set) normally shuffles the ENTIRE big side on the join
key — petabyte-scale network for a join whose matches are a sliver of the
input.  Spark's own runtime bloom-filter optimization covers shuffle
joins it can see through; this module makes the pattern explicit and
composable: build one fixed-size bitmap from the key set (distributed
map-side partials, OR-merged in one tiny reduce), broadcast it
(megabytes), and filter the big side BEFORE any shuffle.  Rows failing
the bloom are definitely not in the key set (no false negatives); rows
passing are verified with an exact join over the pruned remainder — so
results are EXACT while shuffle volume drops to matches + the configured
false-positive sliver.

Hashing is Kirsch-Mitzenmacher double hashing degenerated to k
independent seeds of Spark's ``xxhash64`` — computed JVM-side in codegen;
Python only ever sees the position arrays (Arrow batches) and a shared
read-only numpy bitmap.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..exceptions import PhaserError

# partial bitmaps OR-merged per build: bounds the merge shuffle to
# MAX_PARTIALS x bitmap_bytes regardless of the key side's parallelism
MAX_PARTIALS = 32


class BloomFilter:
    """An immutable bitmap bloom filter built by :func:`build_bloom`.

    ``bits`` is a bytes object of ``m_bits/8`` bytes; ``m_bits`` is a
    multiple of 64; ``k`` is the number of hash probes per key."""

    def __init__(
        self,
        bits: bytes,
        m_bits: int,
        k: int,
        n_items: int,
        key_types: list[str] | None = None,
    ):
        self.bits = bits
        self.m_bits = m_bits
        self.k = k
        self.n_items = n_items
        #: build-side key dtypes — xxhash64 is TYPE-sensitive (INT 5 and
        #: BIGINT 5 hash differently), so probes must cast to these
        self.key_types = key_types

    def __repr__(self):  # pragma: no cover - debug aid
        return (
            f"BloomFilter(m_bits={self.m_bits}, k={self.k}, "
            f"n_items={self.n_items}, {len(self.bits)} bytes)"
        )


def _dimensions(n: int, fpp: float) -> tuple[int, int]:
    """Standard bloom sizing: m = -n ln(p)/ln(2)^2 bits (rounded up to a
    64-bit word), k = m/n ln(2) probes."""
    if not (0.0 < fpp < 1.0):
        raise PhaserError(f"build_bloom: fpp must be in (0, 1), got {fpp}")
    n = max(1, n)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _position_cols(
    cols: list[str], m_bits: int, k: int, key_types: list[str] | None = None
):
    """k bit positions per row, each a JVM-codegen xxhash64 with a
    distinct integer seed column mixed in — no Python on this path.

    ``key_types`` (the BUILD side's dtypes) are applied with try_cast:
    xxhash64 is type-sensitive, so probing a BIGINT column against a
    bloom built over INT keys would test the wrong bits and silently
    produce false NEGATIVES — breaking the exact-join guarantee.  A
    probe value unrepresentable in the build type try_casts to NULL
    (such a value cannot be in the set; any resulting false positive is
    removed by the exact verify join)."""
    if key_types:
        key_exprs = [
            F.col(c).try_cast(t) for c, t in zip(cols, key_types)
        ]
    else:
        key_exprs = [F.col(c) for c in cols]
    return [
        F.pmod(F.xxhash64(*key_exprs, F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ]


def build_bloom(
    keys_df: DataFrame,
    on: list[str] | str,
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> BloomFilter:
    """Build a broadcast-sized bloom bitmap from the (small) key side.

    Distributed build: each of at most ``MAX_PARTIALS`` tasks scatters its
    keys' bit positions into a local numpy bitmap (one Arrow pass), the
    partial bitmaps are OR-merged in a single-task reduce, and exactly ONE
    bitmap-sized blob reaches the driver — driver transfer is O(m/8)
    bytes, never O(keys).  ``expected_items`` skips the sizing count job
    when the caller already knows the key cardinality (at 10M keys and
    fpp=0.01 the bitmap is ~12 MB — comfortably broadcastable)."""
    cols = [on] if isinstance(on, str) else list(on)
    if not cols:
        raise PhaserError("build_bloom requires at least one key column")
    keys = keys_df.select(*cols).dropna(how="any")
    # size on DISTINCT keys: a duplicated key side (an un-deduped event
    # log used as a blocklist) would otherwise oversize the bitmap by
    # the duplication factor and blow the broadcast budget
    n = expected_items if expected_items is not None else keys.distinct().count()
    m_bits, k = _dimensions(n, fpp)
    n_bytes = m_bits // 8

    pos_df = keys.select(
        F.array(*_position_cols(cols, m_bits, k)).alias("__pos__")
    ).coalesce(MAX_PARTIALS)

    import numpy as np
    import pandas as pd

    def partial_bitmaps(batches):
        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            pos = np.asarray(
                [p for row in pdf["__pos__"] for p in row], dtype=np.int64
            )
            np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bm": [bitmap.tobytes()]})

    partials = pos_df.mapInPandas(partial_bitmaps, schema="bm binary")

    def or_merge(batches):
        acc = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            for blob in pdf["bm"]:
                acc |= np.frombuffer(blob, dtype=np.uint8)
        yield pd.DataFrame({"bm": [acc.tobytes()]})

    merged_rows = partials.repartition(1).mapInPandas(
        or_merge, schema="bm binary"
    ).collect()
    bits = bytes(merged_rows[0]["bm"]) if merged_rows else bytes(n_bytes)
    key_types = [dict(keys_df.dtypes)[c] for c in cols]
    return BloomFilter(bits, m_bits, k, n, key_types=key_types)


def might_contain(df: DataFrame, on: list[str] | str, bloom: BloomFilter):
    """Boolean Column: True when the row's key MIGHT be in the bloom's
    key set (false positives at the built fpp; never false negatives).

    ``df`` is accepted for call-site readability only — the returned
    Column holds unresolved references to ``on`` and resolves against
    whatever frame it is applied to.  Probe keys are try_cast to the
    BUILD side's recorded dtypes (see ``_position_cols``).
    Positions are computed JVM-side; the membership test is one
    vectorized numpy gather per Arrow batch against a shared read-only
    bitmap captured in the UDF closure (sent to executors once per
    query, like a broadcast var)."""
    cols = [on] if isinstance(on, str) else list(on)
    import numpy as np

    bitmap = np.frombuffer(bloom.bits, dtype=np.uint8)

    @F.pandas_udf(BooleanType())
    def _check(pos_series):
        import pandas as pd

        if len(pos_series) == 0:
            return pd.Series([], dtype=bool)
        pos = np.asarray(pos_series.tolist(), dtype=np.int64)
        hit = bitmap[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)
        return pd.Series((hit != 0).all(axis=1))

    return _check(
        F.array(
            *_position_cols(cols, bloom.m_bits, bloom.k, bloom.key_types)
        )
    )


def bloom_semi_join(
    big: DataFrame,
    keys_df: DataFrame,
    on: list[str] | str,
    fpp: float = 0.01,
    expected_items: int | None = None,
    bloom: BloomFilter | None = None,
) -> DataFrame:
    """EXACT left-semi join of ``big`` against ``keys_df`` with bloom
    pre-pruning: the big side is filtered by the broadcast bitmap before
    the exact semi join runs, so the join's shuffle sees only true
    matches plus the fpp sliver instead of the whole table.  Pass a
    prebuilt ``bloom`` to amortize one build across several joins."""
    cols = [on] if isinstance(on, str) else list(on)
    bf = bloom or build_bloom(keys_df, cols, fpp, expected_items)
    pruned = big.filter(might_contain(big, cols, bf))
    return pruned.join(keys_df.select(*cols).distinct(), on=cols, how="left_semi")


def bloom_anti_join(
    big: DataFrame,
    keys_df: DataFrame,
    on: list[str] | str,
    fpp: float = 0.01,
    expected_items: int | None = None,
    bloom: BloomFilter | None = None,
) -> DataFrame:
    """EXACT left-anti join with bloom pre-pruning — the decontamination
    shape ("drop every document whose id is in the benchmark set").  Rows
    FAILING the bloom are definitely non-members and pass through with
    zero shuffle; only the passing sliver (matches + false positives)
    pays the exact anti join.  Null keys never match a join condition,
    so they are kept on the no-shuffle branch directly.

    NOTE: the two complementary branches each scan ``big`` (and evaluate
    the k-hash probe) once — the price of keeping the exact join's
    shuffle to the sliver.  When the scan itself is the dominant cost
    (expensive upstream plan rather than a parquet read), persist or
    localCheckpoint ``big`` before calling."""
    cols = [on] if isinstance(on, str) else list(on)
    bf = bloom or build_bloom(keys_df, cols, fpp, expected_items)
    maybe = might_contain(big, cols, bf)
    null_key = None
    for c in cols:
        isnull = F.col(c).isNull()
        null_key = isnull if null_key is None else (null_key | isnull)
    definite_out = big.filter((~maybe) | null_key)
    suspects = big.filter(maybe & ~null_key)
    verified_out = suspects.join(
        keys_df.select(*cols).distinct(), on=cols, how="left_anti"
    )
    return definite_out.unionByName(verified_out)
