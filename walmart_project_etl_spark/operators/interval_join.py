"""Temporal / interval joins (J9) and as-of joins.

The reference resolves SCD2 surrogate keys with an equi + BETWEEN join
(``etl_target_loader.py:750-758`` etc.):
``fact.key = dim.key AND fact_date BETWEEN dim.effective AND dim.expiry``.

In Spark this stays ONE equi-join on the natural key with the range predicate
as a residual filter — the planner shuffles (or broadcasts) on the equi part
only, so there is no theta-join blowup. For a 100 TB fact the dim side is
small and version counts per key are tiny, so the residual filter is nearly
free; if a dimension ever became version-heavy, bucket both sides on the key.

``asof_join`` (not in the reference; standard analytics surface) matches each
left row to the latest right row at-or-before its timestamp, via union +
window — the scalable formulation that avoids a range theta-join entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_join(fact: DataFrame, dim: DataFrame, key: str,
                  fact_date: str, valid_from: str, valid_to: str,
                  how: str = "inner", broadcast_dim: bool = True) -> DataFrame:
    """J9: equi-join on ``key`` with inclusive-range residual on the date."""
    d = F.broadcast(dim) if broadcast_dim else dim
    cond = ((fact[key] == d[key])
            & (fact[fact_date] >= d[valid_from])
            & (fact[fact_date] <= d[valid_to]))
    return fact.join(d, cond, how).drop(d[key])


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_time: str, right_time: str,
              right_cols: list[str] | None = None,
              tolerance_seconds: int | None = None) -> DataFrame:
    """As-of (backward) join: for each left row, the most recent right row
    with ``right_time <= left_time`` for the same ``on`` key.

    Implementation: tag both sides, union by (key, time), and carry the last
    seen right values forward with a window ``last(..., ignorenulls=True)``
    — one shuffle on the key, no range join, no per-key materialized lists.
    """
    rc = right_cols or [c for c in right.columns if c not in (on, right_time)]
    l = left.withColumn("__side", F.lit(1)).withColumn("__t", F.col(left_time))
    r = (right.select(on, F.col(right_time).alias("__t"),
                      *[F.col(c).alias(f"__r_{c}") for c in rc])
         .withColumn("__side", F.lit(0)))
    l_aligned = l.select(
        *left.columns, "__side", "__t",
        *[F.lit(None).cast(r.schema[f"__r_{c}"].dataType).alias(f"__r_{c}") for c in rc])
    r_aligned = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
        F.col(on), "__side", "__t", *[f"__r_{c}" for c in rc],
    ).select(*[c for c in l_aligned.columns])  # column order align

    u = l_aligned.unionByName(r_aligned)
    # right rows sort before left rows at the same timestamp → inclusive asof
    w = (Window.partitionBy(on).orderBy(F.col("__t").asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.select(
        *[c for c in left.columns], "__side", "__t",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in rc],
        F.last(F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True)
         .over(w).alias("__rt"))
    out = filled.where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        keep = (F.col("__rt").isNotNull()
                & (F.col("__t").cast("long") - F.col("__rt").cast("long")
                   <= tolerance_seconds))
        out = out.select(
            *[c for c in left.columns],
            *[F.when(keep, F.col(c)).otherwise(F.lit(None)).alias(c) for c in rc])
    else:
        out = out.select(*[c for c in left.columns], *rc)
    return out
