"""SCD Type 1 merge (upsert) — pure-DataFrame MERGE INTO emulation.

The reference runs Snowflake ``MERGE … WHEN MATCHED UPDATE / WHEN NOT MATCHED
INSERT`` for four dimensions (D1, ``etl_target_loader.py:86-294``). On a
parquet-backed warehouse we express the same semantics as a full-outer join +
column-wise select + atomic overwrite — deterministic and oracle-testable.
(If Delta Lake is available, ``DeltaTable.merge`` is a drop-in substrate; the
public API here is storage-agnostic.)

Scale: the join shuffles on the natural key — same cost as the MERGE's
matching phase on any MPP engine. Dimension tables are the small side of the
warehouse, and the rewrite is proportional to |target| + |source|, not to
fact volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd1_merge(target: DataFrame | None, source: DataFrame, key: str,
               update_cols: list[str], surrogate_col: str, now_ts: Column) -> DataFrame:
    """Upsert ``source`` into ``target`` on natural ``key``.

    - matched rows: tracked columns take the source value,
      ``modification_date`` = now, ``insertion_date`` preserved;
    - unmatched source rows: inserted with a fresh surrogate key
      (max existing + row_number) and insertion = modification = now;
    - unmatched target rows: kept untouched.

    ``source`` must already be deduplicated to one row per key (W1 —
    use ``operators.dedup.latest_per_key``).
    """
    if target is None:
        w = Window.orderBy(key)
        return source.select(
            F.row_number().over(w).alias(surrogate_col),
            key, *update_cols,
            now_ts.alias("insertion_date"),
            now_ts.alias("modification_date"),
        )

    src = source.select(key, *[F.col(c).alias(f"__src_{c}") for c in update_cols],
                        F.lit(True).alias("__src_present"))
    # max existing surrogate, computed IN-PLAN (1-row agg, broadcast cross
    # join) — no driver-side collect, no extra job per merge
    max_key_df = target.agg(
        F.coalesce(F.max(surrogate_col), F.lit(0)).alias("__max_key"))
    joined = target.join(src, key, "full_outer").crossJoin(F.broadcast(max_key_df))

    matched = F.col(surrogate_col).isNotNull() & F.col("__src_present")
    is_new = F.col(surrogate_col).isNull()

    new_key = F.when(
        is_new,
        F.col("__max_key") + F.row_number().over(Window.partitionBy(is_new).orderBy(key))
    ).otherwise(F.col(surrogate_col))

    cols = [new_key.cast("int").alias(surrogate_col), F.col(key)]
    for c in update_cols:
        cols.append(F.when(is_new | matched, F.col(f"__src_{c}"))
                     .otherwise(F.col(c)).alias(c))
    cols.append(F.when(is_new, now_ts).otherwise(F.col("insertion_date"))
                 .alias("insertion_date"))
    cols.append(F.when(is_new | matched, now_ts)
                 .otherwise(F.col("modification_date")).alias("modification_date"))
    return joined.select(*cols)
