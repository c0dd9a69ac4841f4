"""Event-stream operators (batch formulations over the ``events`` table).

Sessionization, tumbling-window aggregation, and latest-event dedup — the
batch twins of the Structured Streaming surface in
``walmart_project_etl_spark.streaming``. Batch and stream share semantics;
the streaming module reuses the same window spec.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30, tiebreak: str = "event_id") -> DataFrame:
    """Gap-based sessionization: a new session starts when the user's
    inter-event gap exceeds ``gap_minutes``. Adds ``session_id`` (per-user
    ordinal) — one shuffle on the user key, then two window passes over the
    same partitioning (Catalyst reuses the exchange).

    ``tiebreak`` (a per-user-unique column) totalizes the window order so
    rows with equal (user, ts) get partition-layout-independent lag/cumsum
    results — the same p07-style determinism rule as
    :func:`latest_event_per_key`.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    # exact microsecond arithmetic — a seconds cast truncates fractions and
    # misclassifies gaps within a second of the threshold
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return (events
            .withColumn("__new_session", is_new)
            .withColumn("session_id",
                        F.sum("__new_session").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .drop("__new_session"))


def session_stats(events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
                  gap_minutes: int = 30, tiebreak: str = "event_id") -> DataFrame:
    """Per-session: event count, duration seconds, value sum."""
    s = sessionize(events, user_col, ts_col, gap_minutes, tiebreak)
    us = F.unix_micros(F.col(ts_col))
    return (s.groupBy(user_col, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.floor((F.max(us) - F.min(us)) / 1_000_000)
                  .cast("long").alias("duration_seconds"),
                 F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
                  .cast("double").alias("sum_value")))


def tumbling_window_agg(events: DataFrame, ts_col: str = "ts",
                        window_duration: str = "1 hour",
                        extra_keys: list[str] | None = None) -> DataFrame:
    """Tumbling event-time window aggregation via ``F.window`` — identical
    spec to the streaming version (windows align to the epoch)."""
    keys = [F.window(ts_col, window_duration).alias("win")] + [
        F.col(k) for k in (extra_keys or [])]
    return (events.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
                  .cast("double").alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    *(extra_keys or []), "n_events", "sum_value"))


def latest_event_per_key(events: DataFrame, keys: list[str],
                         ts_col: str = "ts",
                         tiebreak: str = "event_id") -> DataFrame:
    """Latest event per key (W1 shape on the stream table)."""
    w = Window.partitionBy(*keys).orderBy(F.desc(ts_col), F.desc(tiebreak))
    return (events.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def funnel_stages(events: DataFrame, stages: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  max_gap_s: int | None = None) -> DataFrame:
    """Strict ordered-funnel analysis: for each user, the first time they
    completed each stage IN ORDER — stage k counts only if it happens at or
    after the user's stage-(k-1) completion (the standard conversion-funnel
    definition, not mere per-type minimums).

    One row per user who entered the funnel: ``stage{k}_ts`` per stage
    (NULL once progression stops) and ``stages_completed``.

    Shape at 100 TB: stage 1 is one user-keyed aggregation of the filtered
    stream; each later stage re-aggregates only events of its type joined
    against the (user-cardinality, so AQE-broadcastable) previous frontier.
    len(stages) passes, all keyed on the same uniform user hash — no
    windows over whole histories, no per-user state.

    ``max_gap_s`` bounds each stage-to-stage hop (the windowed-funnel
    variant every product-analytics engine ships): stage k only counts
    within ``max_gap_s`` seconds of the user's stage-(k-1) completion —
    same plan, one extra predicate per stage join.
    """
    first = (events.where(F.col(type_col) == stages[0])
             .groupBy(user_col)
             .agg(F.min(ts_col).alias("stage1_ts")))
    out = first
    for k, stage in enumerate(stages[1:], start=2):
        prev = f"stage{k - 1}_ts"
        gate = F.col(ts_col) >= F.col(prev)
        if max_gap_s is not None:
            gate = gate & (F.col(ts_col) <= F.col(prev)
                           + F.make_interval(secs=F.lit(max_gap_s)))
        nxt = (events.where(F.col(type_col) == stage)
               .join(out.select(user_col, prev), user_col)
               .where(gate)
               .groupBy(user_col)
               .agg(F.min(ts_col).alias(f"stage{k}_ts")))
        out = out.join(nxt, user_col, "left")
    completed = sum(
        F.when(F.col(f"stage{k}_ts").isNotNull(), 1).otherwise(0)
        for k in range(1, len(stages) + 1))
    return out.withColumn("stages_completed",
                          completed.cast("int"))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    as active per (cohort_week, week_offset) cell — the classic retention
    triangle, as two user-keyed aggregations plus a narrow date diff.

    The first-seen frame is user-cardinality, so the join back onto the
    event stream broadcasts under AQE; nothing shuffles on time.
    """
    wk = lambda c: F.date_trunc("week", F.col(c)).cast("date")
    first_seen = (events.groupBy(user_col)
                  .agg(F.min(ts_col).alias("__first")))
    cohort = first_seen.select(user_col, wk("__first").alias("cohort_week"))
    acts = (events.join(cohort, user_col)
            .select(user_col, "cohort_week",
                    (F.datediff(wk(ts_col), F.col("cohort_week")) / 7)
                    .cast("long").alias("week_offset"))
            .distinct())
    return (acts.groupBy("cohort_week", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_active_users")))


def last_touch_attribution(events: DataFrame,
                           conversion_type: str,
                           touch_types: list[str],
                           user_col: str = "user_id", ts_col: str = "ts",
                           type_col: str = "event_type",
                           id_col: str = "event_id") -> DataFrame:
    """Last-touch attribution: each conversion event credited to the
    user's most recent STRICTLY-PRECEDING touch event (click/view/...),
    NULL when the user converted with no prior touch.

    One window shuffle on the user key; the "most recent preceding touch"
    is ``last(touch, ignorenulls)`` over rows up to 1 before current — no
    self-join of conversions against touches (the join formulation
    re-shuffles both sides and explodes on users with many touches; the
    window form is a single pass per user timeline). Order is totalized
    with ``id_col`` so equal-timestamp events attribute deterministically
    at any parallelism.

    Returns one row per conversion: conversion id/ts plus the attributed
    touch id, channel (its event type), and seconds since that touch.
    """
    w = (Window.partitionBy(user_col).orderBy(ts_col, id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    is_touch = F.col(type_col).isin(list(touch_types))
    touch_id = F.last(F.when(is_touch, F.col(id_col)),
                      ignorenulls=True).over(w)
    touch_ts = F.last(F.when(is_touch, F.col(ts_col)),
                      ignorenulls=True).over(w)
    touch_ch = F.last(F.when(is_touch, F.col(type_col)),
                      ignorenulls=True).over(w)
    return (events
            .withColumn("attr_touch_id", touch_id)
            .withColumn("attr_channel", touch_ch)
            .withColumn("secs_since_touch",
                        F.floor((F.unix_micros(F.col(ts_col))
                                 - F.unix_micros(touch_ts)) / 1_000_000)
                        .cast("long"))
            .where(F.col(type_col) == conversion_type)
            .select(F.col(id_col), F.col(user_col), F.col(ts_col),
                    "attr_touch_id", "attr_channel", "secs_since_touch"))
