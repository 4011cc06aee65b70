"""Time-series resampling with gap filling (engine addition): aggregate
irregular events onto a fixed-interval grid per key, materializing the
EMPTY intervals — the hypertable/`time_bucket`-with-gapfill shape that
plain ``groupBy(window(...))`` cannot produce (it only emits buckets that
contain data, so downstream charts/models silently skip outages, which
is usually the most important signal).

Scale design
------------
* Buckets come from integer epoch arithmetic (``floor(epoch / step)``) —
  a pure projection, no Python; the aggregate is map-side combinable.
* The grid materializes per key from that key's OWN [min, max] bucket
  span (``sequence`` + ``explode``) — grid size is bounded by the key's
  active time range over the interval, never the corpus, and no
  driver-side range collection happens.
* Forward fill is one ``last(..., ignorenulls)`` window per key over the
  grid (grid rows per key, not event rows).
"""

from __future__ import annotations

import re

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..exceptions import PhaserError

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _interval_seconds(interval: str) -> int:
    m = re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", interval.strip())
    if not m:
        raise PhaserError(f"resample_time: unsupported interval {interval!r}")
    return int(m.group(1)) * _UNIT_SECONDS[m.group(2)]


def resample_time(
    df: DataFrame,
    ts_col: str,
    interval: str,
    group_cols: list[str] | str | None = None,
    aggs: dict | None = None,
    fill: str = "zero",
    bucket_col: str = "bucket_ts",
    align: str = "per_key",
) -> DataFrame:
    """Resample events onto a fixed ``interval`` grid per group, with
    EMPTY buckets materialized between each group's first and last
    event.

    ``aggs`` maps output column → aggregate Column (default:
    ``{"n": count(*)}``).  ``fill`` controls empty buckets: ``"zero"``
    (count-like: 0), ``"null"`` (leave NULL), or ``"ffill"`` (carry the
    last seen value forward — gauge-like series).  Bucket timestamps are
    the interval start (UTC epoch arithmetic, identical in any engine).

    Returns ``group_cols + (bucket_col timestamp) + agg columns`` with
    one row per (group, grid bucket).

    ``align="global"`` spans every group over the GLOBAL [min, max]
    bucket range instead of its own — the aligned-matrix form charts
    and models want (same grid length for every key); grid size becomes
    groups × global span, so keep it for bounded group counts.
    """
    if fill not in ("zero", "null", "ffill"):
        raise PhaserError(f"resample_time: unknown fill {fill!r}")
    if align not in ("per_key", "global"):
        raise PhaserError(f"resample_time: unknown align {align!r}")
    step = _interval_seconds(interval)
    groups = (
        [group_cols] if isinstance(group_cols, str) else list(group_cols or [])
    )
    aggs = dict(aggs or {"n": F.count(F.lit(1))})
    if bucket_col in groups or bucket_col in aggs:
        raise PhaserError(f"resample_time: {bucket_col!r} name collision")

    # floor, not cast: cast('long') truncates toward zero, which assigns
    # pre-1970 (negative-epoch) timestamps to the one-interval-late
    # bucket and diverges from the oracle's floor(epoch/step) semantics
    bkt = F.floor(F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step
    agged = (
        df.withColumn("__rs_bkt", bkt)
        .groupBy(*groups, "__rs_bkt")
        .agg(*[a.alias(name) for name, a in aggs.items()])
    )
    if align == "global" and groups:
        bounds = agged.agg(
            F.min("__rs_bkt").alias("__rs_lo"), F.max("__rs_bkt").alias("__rs_hi")
        )
        span = agged.select(*groups).distinct().crossJoin(F.broadcast(bounds))
    else:
        span = agged.groupBy(*groups).agg(
            F.min("__rs_bkt").alias("__rs_lo"), F.max("__rs_bkt").alias("__rs_hi")
        )
    grid = span.select(
        *groups,
        F.explode(
            F.sequence(F.col("__rs_lo"), F.col("__rs_hi"), F.lit(step))
        ).alias("__rs_bkt"),
    )
    # null-SAFE group equality: groupBy keeps a NULL group, but the
    # name-list join form compares NULL = NULL as NULL and would hand
    # that group an all-empty grid (fill='zero' then reads as 0 events
    # while the real counts are silently discarded)
    agg_r = agged.select(
        *[F.col(g).alias(f"__rs_r_{g}") for g in groups],
        F.col("__rs_bkt").alias("__rs_rbkt"),
        *[c for c in agged.columns if c not in groups and c != "__rs_bkt"],
    )
    cond = F.col("__rs_bkt") == F.col("__rs_rbkt")
    for g in groups:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__rs_r_{g}"))
    joined = grid.join(agg_r, cond, "left").drop(
        "__rs_rbkt", *[f"__rs_r_{g}" for g in groups]
    )
    out_cols: dict[str, SparkCol] = {}
    if fill == "zero":
        for name in aggs:
            out_cols[name] = F.coalesce(F.col(name), F.lit(0))
    elif fill == "ffill":
        w = (
            Window.partitionBy(*groups)
            .orderBy("__rs_bkt")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for name in aggs:
            out_cols[name] = F.last(F.col(name), ignorenulls=True).over(w)
    else:
        for name in aggs:
            out_cols[name] = F.col(name)
    return joined.select(
        *groups,
        F.timestamp_seconds(F.col("__rs_bkt")).alias(bucket_col),
        *[c.alias(n) for n, c in out_cols.items()],
    )
