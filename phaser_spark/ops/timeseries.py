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


def ewma(
    df: DataFrame,
    value_col: str,
    order_col: str | list[str],
    alpha: float = 0.3,
    window: int = 20,
    partition_by: list[str] | str | None = None,
    out_col: str | None = None,
    digits: int = 6,
) -> DataFrame:
    """Trailing exponentially-weighted moving average — the standard
    smoother for monitoring metric trends (corpus volume per day, error
    rates, quality-score drift) where a plain rolling mean lags and a
    last-value signal is too noisy.

    For each row, ``out_col`` is the EWMA of the last ``window`` values
    in ``order_col`` order within the row's ``partition_by`` group::

        ewma = Σ αᵏ·x[n−k] / Σ αᵏ   for k = 0..min(window, n)−1

    with ``alpha`` in (0, 1) the per-step decay (newest point weight 1,
    each older point ``alpha``× the next-newer).  The start of a series
    uses only the points that exist (weights renormalize), so no warm-up
    NULLs.  NULL values are EXCLUDED from the window (Spark's
    ``collect_list`` drops them), and NaN — which Spark does NOT treat
    as NULL — is mapped to a gap too: the smoother skips both rather
    than poisoning the trailing mean.

    Determinism: the decay weights are a LITERAL double array computed
    once on the driver, the weighted sum is an ordered left fold over
    the collected window (``zip_with`` + ``aggregate``), and the output
    truncates to ``digits``.  External replay caveat: the fold is only
    bit-replayable in another SQL engine for NULL-FREE series (or after
    an engine-side list filter) — e.g. DuckDB's ``list()`` window
    aggregate KEEPS NULLs where Spark's ``collect_list`` drops them, so
    a NULL-bearing series needs the gap rows pre-filtered before the
    external engine sees them (which changes window membership: rows
    are then counted among the last ``window`` non-null points, not the
    last ``window`` rows).  ``order_col`` (plus tiebreak columns,
    passed as a list) must give a total order or window membership is
    undefined.

    Scale: one window per group with ``O(window)`` collected state per
    row; without ``partition_by`` the window is GLOBAL — a single sort
    task, only for series small enough to sort on one executor (the
    ``pack_sequences`` caveat).
    """
    if not 0.0 < alpha < 1.0:
        raise PhaserError(f"ewma: alpha must be in (0, 1), got {alpha}")
    if window < 1:
        raise PhaserError(f"ewma: window must be >= 1, got {window}")
    from .dedup import trunc_digits

    out_col = out_col or f"{value_col}_ewma"
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    parts = (
        [partition_by]
        if isinstance(partition_by, str)
        else list(partition_by or [])
    )
    base = Window.partitionBy(*parts) if parts else Window.partitionBy()
    w = base.orderBy(*[F.col(c) for c in order]).rowsBetween(
        -(window - 1), Window.currentRow
    )
    # oldest-first collected window; literal weights, oldest-first too:
    # coeffs[i] pairs with the value (window-1-i) steps back
    coeffs = [float(alpha) ** k for k in range(window - 1, -1, -1)]
    # NaN is NOT NULL in Spark: collect_list would KEEP it and one bad
    # value would poison every window that spans it for `window` rows —
    # map NaN to NULL so it gap-skips exactly like a missing point
    vd = F.col(value_col).cast("double")
    vals = F.collect_list(F.when(~F.isnan(vd), vd)).over(w)
    n = F.size(vals)
    tail = F.slice(F.array(*[F.lit(c) for c in coeffs]), window - n + 1, n)
    weighted = F.zip_with(vals, tail, lambda x, c: x * c)
    fold = lambda arr: F.aggregate(  # noqa: E731 — ordered left fold
        arr, F.lit(0.0), lambda acc, e: acc + e
    )
    score = F.when(n > 0, fold(weighted) / fold(tail))
    return df.withColumn(out_col, trunc_digits(score, digits))
