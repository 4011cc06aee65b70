"""Slowly-changing-dimension maintenance (SCD Type 2) — the
data-integration merge the reference's ETL domain implies but never
implements (phaser pipelines overwrite their outputs; versioned
dimensions need validity intervals).

Scale design: the merge never touches CLOSED history rows (they pass
through untouched — at 100 TB that is almost the whole table, and with
the dimension partitioned on ``is_current`` the closed partitions are
not even scanned).  Only the open rows + the update batch shuffle, once,
on the business key; versions chain with per-key windows whose state is
that key's own version count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..exceptions import PhaserError


def scd2_apply(
    dim: DataFrame | None,
    updates: DataFrame,
    key_cols: list[str] | str,
    attr_cols: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply an update batch to an SCD Type-2 dimension and return the
    new dimension: ``key_cols + attr_cols + (valid_from, valid_to,
    is_current)``.

    Semantics (the standard type-2 contract):

    * a key's history is a chain of versions; exactly one is open
      (``valid_to`` NULL, ``is_current`` true);
    * each update row ``(key, attrs, ts)`` that CHANGES the attributes
      closes the open version at ``ts`` and opens a new one from ``ts``;
    * updates equal to the prevailing version are no-ops (no empty
      versions);
    * multiple updates per key in one batch apply in ``ts`` order
      (ties: existing version wins over an update, further ties break
      deterministically on the attribute values) — so a whole day's CDC
      feed lands in one call;
    * ``dim=None`` bootstraps the dimension from the update batch.

    Closed versions pass through UNTOUCHED — the merge cost is the open
    slice + the batch, not the history.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys or not attr_cols:
        raise PhaserError("scd2_apply needs key_cols and attr_cols")
    meta = {valid_from, valid_to, current_col}
    if meta & set(attr_cols) or meta & set(keys):
        raise PhaserError("scd2_apply: validity column names collide with keys/attrs")

    ups = updates.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("__scd_ts"),
        F.lit(1).alias("__scd_origin"),
    )
    if dim is not None:
        # null-safe: a NULL is_current row (malformed bootstrap/legacy
        # data) must land in the closed slice, not vanish from BOTH
        # complementary filters
        closed = dim.filter(~F.coalesce(F.col(current_col), F.lit(False))).select(
            *keys, *attr_cols, valid_from, valid_to, current_col
        )
        open_rows = dim.filter(F.coalesce(F.col(current_col), F.lit(False))).select(
            *keys,
            *attr_cols,
            F.col(valid_from).alias("__scd_ts"),
            F.lit(0).alias("__scd_origin"),
        )
        pool = open_rows.unionByName(ups)
    else:
        closed = None
        pool = ups

    # version chain per key in (ts, origin, attrs) order; drop updates
    # that do not change the prevailing attributes
    w = Window.partitionBy(*keys).orderBy(
        "__scd_ts", "__scd_origin", *[F.col(c) for c in attr_cols]
    )
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    chain = (
        pool.withColumn("__scd_prev", F.lag(attrs).over(w))
        .filter(F.col("__scd_prev").isNull() | (F.col("__scd_prev") != attrs))
        .drop("__scd_prev")
    )
    # same full (ts, origin, attrs) key as w: two surviving same-ts
    # updates would otherwise get an arbitrary lead() order — which row
    # becomes is_current would vary run to run
    w2 = Window.partitionBy(*keys).orderBy(
        "__scd_ts", "__scd_origin", *[F.col(c) for c in attr_cols]
    )
    rebuilt = chain.select(
        *keys,
        *attr_cols,
        F.col("__scd_ts").alias(valid_from),
        F.lead("__scd_ts").over(w2).alias(valid_to),
        F.lead("__scd_ts").over(w2).isNull().alias(current_col),
    )
    return closed.unionByName(rebuilt) if closed is not None else rebuilt


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    on: dict | list[str] | str,
) -> DataFrame:
    """Orphan rows of ``child`` whose key has no match in ``parent`` —
    the cross-table constraint the single-frame quality suite cannot
    express.  ``on`` maps child columns → parent columns (a list/str
    means same names).  NULL child keys are not orphans (SQL FK
    semantics: NULLs satisfy the constraint).

    A left-anti join on the key — broadcast when the parent's key
    projection is small, AQE decides otherwise; gate with
    ``.isEmpty()`` or count per source for a violations report."""
    if isinstance(on, str):
        on = {on: on}
    elif isinstance(on, list):
        on = {c: c for c in on}
    if not on:
        raise PhaserError("referential_integrity needs at least one key column")
    pk = parent.select(
        *[F.col(p).alias(f"__ri_{c}") for c, p in on.items()]
    ).distinct()
    cond = None
    for c in on:
        e = F.col(c) == F.col(f"__ri_{c}")
        cond = e if cond is None else cond & e
    non_null = None
    for c in on:
        e = F.col(c).isNotNull()
        non_null = e if non_null is None else non_null & e
    return child.filter(non_null).join(pk, cond, "left_anti")
