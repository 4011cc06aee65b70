"""Deterministic sampling/splitting for training-data pipelines (engine
addition; BASELINE.json north star).

Everything keys off a cryptographic hash of a stable id — never
``rand()`` — so splits are reproducible across runs, partitionings, and
engines, and a row's assignment never changes when the corpus grows.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def hash_bucket(key: SparkCol, buckets: int = _BUCKETS) -> SparkCol:
    """Stable bucket in [0, buckets): first 8 hex chars of md5(key) mod n.

    md5 (not xxhash64) so external systems — and the DuckDB oracle — can
    reproduce assignments bit-for-bit."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def split_by_hash(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash of ``key_col``.

    ``fractions`` maps split name → fraction (must sum to ≤ 1; any
    remainder becomes the LAST declared split's overflow guard).  Pure
    projection — no shuffle, no sampling state, safe at any scale, and
    adding rows later never reassigns existing ones.
    """
    total = sum(fractions.values())
    if not 0 < total <= 1.0 + 1e-9:
        raise ValueError(f"fractions must sum to (0, 1], got {total}")
    b = hash_bucket(F.col(key_col))
    expr = None
    lo = 0.0
    for name, frac in fractions.items():
        hi = lo + frac
        cond = (b >= int(lo * _BUCKETS)) & (b < int(hi * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    expr = expr.otherwise(list(fractions)[-1])
    return df.withColumn(split_col, expr)


def sample_by_hash(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic ``fraction`` sample: the same rows every run."""
    return df.filter(hash_bucket(F.col(key_col)) < int(fraction * _BUCKETS))
