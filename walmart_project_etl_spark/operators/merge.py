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

from walmart_project_etl_spark.functions.keys import hash_surrogate


def scd1_merge(target: DataFrame | None, source: DataFrame, key: str,
               update_cols: list[str], surrogate_col: str, now_ts: Column) -> DataFrame:
    """Upsert ``source`` into ``target`` on natural ``key``.

    - matched rows: tracked columns take the source value,
      ``modification_date`` = now, ``insertion_date`` preserved;
    - unmatched source rows: inserted with a fresh surrogate key —
      ``hash_surrogate(key)``, fully parallel (no max+row_number sequence,
      which would funnel inserts through one task) and stable across runs;
    - unmatched target rows: kept untouched.

    ``source`` must already be deduplicated to one row per key (W1 —
    use ``operators.dedup.latest_per_key``).
    """
    if target is None:
        return source.select(
            hash_surrogate(key).alias(surrogate_col),
            key, *update_cols,
            now_ts.alias("insertion_date"),
            now_ts.alias("modification_date"),
        )

    src = source.select(key, *[F.col(c).alias(f"__src_{c}") for c in update_cols],
                        F.lit(True).alias("__src_present"))
    joined = target.join(src, key, "full_outer")

    matched = F.col(surrogate_col).isNotNull() & F.col("__src_present")
    is_new = F.col(surrogate_col).isNull()

    # existing rows keep their key; new rows derive theirs from the natural
    # key — same function as the initial load, so re-runs are idempotent
    new_key = F.coalesce(F.col(surrogate_col), hash_surrogate(key))

    cols = [new_key.alias(surrogate_col), F.col(key)]
    for c in update_cols:
        cols.append(F.when(is_new | matched, F.col(f"__src_{c}"))
                     .otherwise(F.col(c)).alias(c))
    cols.append(F.when(is_new, now_ts).otherwise(F.col("insertion_date"))
                 .alias("insertion_date"))
    cols.append(F.when(is_new | matched, now_ts)
                 .otherwise(F.col("modification_date")).alias("modification_date"))
    return joined.select(*cols)


def scd1_merge_tx(table, source: DataFrame, key: str,
                  update_cols: list[str], surrogate_col: str,
                  now_ts: Column) -> dict:
    """SCD1 MERGE against a TRANSACTIONAL log table
    (``sources/txlog.TxTable``) — the reference's ``MERGE INTO`` with the
    storage semantics the parquet emulation can't give.

    Computes ONLY the upserted rows — the target rows whose key appears
    in ``source`` (semi-join), re-valued by :func:`scd1_merge`, plus the
    brand-new keys — and commits them through the table's file-pruned
    copy-on-write merge. Unmatched keys' data files are never read for
    rewrite, never rewritten: a narrow update batch against a multi-TB
    dimension costs O(touched files) + one log commit, vs the
    whole-dimension rewrite of ``Warehouse.replace``. Returns the merge's
    pruning stats. Equivalence with the full-table path is pinned by
    ``tests/test_txlog.py::test_scd1_merge_tx_matches_full_rewrite``.
    """
    touched = table.snapshot().join(source.select(key).distinct(),
                                    key, "semi")
    upserts = scd1_merge(touched, source, key, update_cols,
                         surrogate_col, now_ts)
    return table.merge_upsert(upserts)
