"""Time-series regularization: calendar spine generation + gap filling.

Beyond-reference surface; the reference's date dimension
(``etl_ods_loader.py`` date expansion) builds a calendar but its facts keep
their gaps — every downstream moving average / day-over-day comparison then
silently skips missing days. These operators densify a per-group daily
series and carry observations forward, the standard prep for
inventory-level / balance-style metrics.

Scale shape: the spine is generated per group with ``sequence()`` from the
group's own [min, max] — no driver-side date loop, no cross join against a
global calendar (which would explode sparse groups across the full global
span). One shuffle on the group key for the bounds, one co-partitioned
left join, one window for the forward fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import join_group_stats


def calendar_spine(df: DataFrame, group_cols: list[str],
                   date_col: str) -> DataFrame:
    """One row per (group, day) for every day in the group's own
    [min(date), max(date)] span — ``sequence(min, max, interval 1 day)``
    exploded, so each group densifies over exactly its active span."""
    bounds = (df.groupBy(*group_cols)
                .agg(F.min(date_col).alias("__lo"),
                     F.max(date_col).alias("__hi")))
    return (bounds.select(
        *group_cols,
        F.explode(F.sequence("__lo", "__hi",
                             F.expr("interval 1 day"))).alias(date_col)))


def gap_fill_forward(df: DataFrame, group_cols: list[str], date_col: str,
                     value_cols: list[str]) -> DataFrame:
    """Densify a per-group daily series and forward-fill (LOCF) the value
    columns across the introduced gaps.

    Output: one row per (group, day) over each group's span, with
    ``<v>_filled`` = last non-null observation at or before the day, and
    ``is_observed`` marking real rows. Observed-but-NULL values are also
    carried over, matching SQL ``last_value(v IGNORE NULLS)`` semantics.

    The forward-fill window is ``rowsBetween(unboundedPreceding, 0)`` per
    group ordered by day — one shuffle; with years of daily data per group
    the per-partition state is the group's span in days, small by
    construction.
    """
    spine = calendar_spine(df, group_cols, date_col)
    # null-safe on the group key: a NULL group has a spine (groupBy emits
    # the NULL-group bounds row) and must get its values back, not a
    # hollow all-NULL series
    joined = join_group_stats(spine, df.withColumn("__obs", F.lit(True)),
                              [*group_cols, date_col], how="left",
                              broadcast=False)
    w = (Window.partitionBy(*group_cols).orderBy(date_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = [F.last(F.col(v), ignorenulls=True).over(w).alias(f"{v}_filled")
              for v in value_cols]
    return joined.select(*group_cols, date_col, *filled,
                         F.coalesce("__obs", F.lit(False)).alias("is_observed"))
