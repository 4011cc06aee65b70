"""Behavioral / event-sequence analytics: funnels and cohort retention.

Engine additions (the reference, lisad/phaser, has no event operators);
the product-analytics half of the engine's story alongside
sessionization (`events_sessionize`) and the window patterns in
:mod:`phaser_spark.ops.relational`.

Scale design notes
------------------
* ``funnel`` — the ordered-sequence match runs as a Catalyst FOLD over
  each user's own sorted events (``collect_list`` → ``array_sort`` →
  ``aggregate``): one shuffle on the user key, per-user state bounded by
  that user's event count, no joins-per-step (the naive k-step funnel
  is k self-joins), no Python.  The strict ``ts`` ordering makes the
  result independent of within-timestamp arrival order.
* ``cohort_retention`` — two map-side-combinable aggregates (first-seen
  per user, distinct user-periods) plus one join keyed on the user;
  output cardinality is cohorts × offsets, never user-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import PhaserError


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: str | None = None,
) -> DataFrame:
    """Per-user ordered funnel progression: a user reaches stage ``k``
    when events of type ``steps[0] … steps[k-1]`` occur at strictly
    increasing timestamps.  Returns ``(user_col, stages_completed int,
    completed boolean)`` — one row per user that has at least one
    funnel-step event.

    The match is a left fold over the user's time-sorted events: advance
    the stage when the next event matches the next step AND its
    timestamp strictly exceeds the previous match (ties never advance,
    so the result does not depend on within-timestamp order).

    ``within`` (e.g. ``"1 hour"``) bounds the CONVERSION WINDOW: later
    stages only count within that distance of the user's FIRST
    stage-one event (the greedy anchor — deterministic and exactly
    replayable in SQL; a best-anchor search over all stage-one events
    is a different, frontier-tracking problem).  Requires a
    timestamp-typed ``ts_col``.
    """
    if not steps:
        raise PhaserError("funnel requires at least one step")
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("__fn_user"),
        F.col(ts_col).alias("__fn_ts"),
        F.col(type_col).alias("__fn_type"),
    )
    ts_type = dict(ev.dtypes)["__fn_ts"]
    per_user = ev.groupBy("__fn_user").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__fn_ts").alias("t"), F.col("__fn_type").alias("y")))
        ).alias("__fn_seq")
    )
    steps_arr = F.array(*[F.lit(s) for s in steps])
    from .relational import parse_duration_us

    within_us = (
        parse_duration_us(within, "funnel") if within is not None else None
    )
    acc0 = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast(ts_type).alias("t"),
        F.lit(None).cast(ts_type).alias("t1"),
    )

    # try_element_at: once the user has completed every step the next
    # index is past the array end — NULL (no advance), not an ANSI error
    def advance(acc, e):
        ok = (F.try_element_at(steps_arr, acc["stage"] + 1) == e["y"]) & (
            acc["t"].isNull() | (e["t"] > acc["t"])
        )
        if within_us is not None:
            in_window = acc["t1"].isNull() | (
                F.unix_micros(e["t"]) - F.unix_micros(acc["t1"]) <= within_us
            )
            ok = ok & in_window
        return ok

    folded = F.aggregate(
        F.col("__fn_seq"),
        acc0,
        lambda acc, e: F.struct(
            F.when(advance(acc, e), acc["stage"] + 1)
            .otherwise(acc["stage"])
            .alias("stage"),
            F.when(advance(acc, e), e["t"]).otherwise(acc["t"]).alias("t"),
            F.when(advance(acc, e) & acc["t1"].isNull(), e["t"])
            .otherwise(acc["t1"])
            .alias("t1"),
        ),
    )
    return per_user.select(
        F.col("__fn_user").alias(user_col),
        folded["stage"].alias("stages_completed"),
        (folded["stage"] >= len(steps)).alias("completed"),
    )


def funnel_report(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: str | None = None,
) -> DataFrame:
    """Cumulative funnel counts: for each stage k (1-based), how many
    users completed at least the first k steps in order.  Returns
    ``(step int, step_name, n_users long)`` with ``step`` ascending —
    the classic funnel chart input, computed from :func:`funnel` with
    one tiny extra aggregate."""
    f = funnel(df, user_col, ts_col, type_col, steps, within=within)
    stage_rows = F.array(*[F.lit(i + 1) for i in range(len(steps))])
    exploded = f.select(
        F.col("stages_completed"), F.explode(stage_rows).alias("step")
    ).filter(F.col("stages_completed") >= F.col("step"))
    counts = exploded.groupBy("step").agg(F.count(F.lit(1)).alias("n_users"))
    # join against the FULL step spine: groupBy only emits observed
    # stages, but the funnel-chart contract is one row per declared step
    # — a stage no user reached must report 0, not vanish (consumers
    # computing step-over-step conversion would misalign or divide by a
    # missing row)
    names = F.array(*[F.lit(s) for s in steps])
    spine = df.sparkSession.range(1, len(steps) + 1).select(
        F.col("id").cast("int").alias("step")
    )
    return (
        spine.join(F.broadcast(counts), "step", "left")
        .select(
            "step",
            F.element_at(names, F.col("step")).alias("step_name"),
            F.coalesce(F.col("n_users"), F.lit(0).cast("long")).alias("n_users"),
        )
        .orderBy("step")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their
    FIRST event; for each later period offset, the fraction of the
    cohort active in that period.  Returns ``(cohort timestamp,
    period_offset int, n_active long, n_cohort long,
    retention double)``.

    ``period`` is a ``date_trunc`` unit (``week``/``month``/``day``).
    Offsets are exact period counts for day/week (day-difference
    arithmetic) and month counts for month.
    """
    if period not in ("day", "week", "month"):
        raise PhaserError(f"cohort_retention: unsupported period {period!r}")
    firsts = df.groupBy(F.col(user_col).alias("__cr_user")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort")
    )
    activity = (
        df.select(
            F.col(user_col).alias("__cr_user"),
            F.date_trunc(period, F.col(ts_col)).alias("__cr_period"),
        )
        .distinct()
    )
    joined = activity.join(firsts, "__cr_user")
    if period == "day":
        off = F.datediff(F.col("__cr_period"), F.col("cohort"))
    elif period == "week":
        off = (F.datediff(F.col("__cr_period"), F.col("cohort")) / 7).cast("int")
    else:
        off = (
            (F.year("__cr_period") - F.year("cohort")) * 12
            + (F.month("__cr_period") - F.month("cohort"))
        )
    active = joined.groupBy("cohort", off.cast("int").alias("period_offset")).agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sizes = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
    return active.join(sizes, "cohort").select(
        "cohort",
        "period_offset",
        "n_active",
        "n_cohort",
        (F.col("n_active").cast("double") / F.col("n_cohort").cast("double")).alias(
            "retention"
        ),
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per user: a new session starts when
    the time since the user's previous event exceeds ``gap_seconds``.
    Session ids are 1-based and consecutive within the user (lag +
    running count of session starts — the standard two-window
    sessionization).  ``order_cols`` breaks timestamp ties
    deterministically (defaults to the timestamp alone).

    One shuffle on the user key; both windows share the same
    partitioning, so Catalyst plans a single Exchange + sort.  For
    STREAMING sessionization use ``session_window`` via
    ``Pipeline.run_stream`` instead (see the streaming queries) — this
    batch form assumes the user's history is complete.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    sess = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(session_col, sess)
