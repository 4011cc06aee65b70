"""Stream-stream operators (Structured Streaming; engine addition — the
reference has no streaming at all, SURVEY §2.11).

A stream-stream join is the one join shape where unbounded state is the
default failure mode: every row of each side must be buffered until the
engine can prove no future match exists.  ``interval_join_streams``
builds the canonical bounded form — watermarks on both event-time
columns plus a time-range join condition — which lets Spark compute a
state-eviction bound per side (rows older than
``watermark + interval span`` are dropped from the state store), so
state is proportional to the interval window, never the stream history.
At 100 TB/day that bound is the difference between a join that runs
forever and one that OOMs the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import PhaserError


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    on: list[str] | None = None,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: each left row matches right rows in
    the same key group with ``left_ts`` in
    ``[right_ts + lower, right_ts + upper]`` (both bounds inclusive; pass
    a negative ``lower`` for windows preceding the right event).

    The click-attribution shape: purchases (right) joined to the clicks
    (left) that follow within the attribution window.  ``watermark``
    bounds late data AND state: each side's buffered rows are evicted
    once the other side's watermark passes their eviction bound.  Inner
    and left-outer joins are supported (outer results emit only after the
    watermark closes the window — Structured Streaming semantics).

    Equi-keys in ``on`` make the shuffled join partition by key; the
    time-range condition alone (no keys) is legal but replicates state
    across all partitions — give it keys at scale.
    """
    if how not in ("inner", "leftOuter", "left_outer", "left"):
        raise PhaserError(
            f"interval_join_streams supports inner/leftOuter, got {how!r}"
        )
    if left_ts == right_ts:
        raise PhaserError(
            "interval_join_streams: left_ts and right_ts must have distinct "
            "names (rename one side before joining)"
        )
    keys = list(on or [])
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise PhaserError(
            f"interval_join_streams: ambiguous columns {sorted(overlap)}; "
            "rename or select before joining"
        )
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        l[left_ts] >= r[right_ts] + F.expr(f"INTERVAL {lower}")
    ) & (l[left_ts] <= r[right_ts] + F.expr(f"INTERVAL {upper}"))
    for k in keys:
        cond = (l[k] == r[k]) & cond
    out = l.join(r, cond, "inner" if how == "inner" else "leftOuter")
    for k in keys:
        out = out.drop(r[k])
    return out
