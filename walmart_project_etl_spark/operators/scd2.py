"""SCD Type 2 engine — pure-DataFrame rewrite of the reference's 4-step SQL
pipeline (D2, ``etl_target_loader.py:299-479`` product / :483-656 store).

Reference steps → DataFrame algebra:

1. *temp stage of latest rows per key* (W1) — caller dedups the source.
2. *UPDATE expired* — changed current rows get ``is_current=FALSE,
   expiry_date = run_date − 1`` (reference ``EXPIRY_DATE_FOR_OLD_RECORDS``,
   :46-49). Change detection compares an ``xxhash64`` fingerprint of the
   tracked columns (F27) — semantically the reference's CONCAT(COALESCE…)
   ``<>`` compare at :332-341.
3. *INSERT new versions* — changed keys: ``effective = run_date``; brand-new
   keys: ``effective = '2000-01-01'`` (:359-363); both get
   ``expiry = '9999-12-31'``, ``is_current = TRUE``,
   ``version = max(version)+1`` (J6 grouped-max join).
4. The result is the union of (unchanged + expired + new-version) slices,
   written back atomically — replacing in-place UPDATE (D4) with a rewrite,
   the standard pattern on immutable storage.

Known reference edge case preserved: two changes on the same ``run_date``
give the old row ``expiry = effective − 1`` (expiry < effective); see
SURVEY §7.3.

Scale: one shuffle on the natural key for the join + one for the window;
dimension-sized data. The fingerprint compare keeps the shuffled payload to
key + 64-bit hash until the final select.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from walmart_project_etl_spark.functions.keys import hash_surrogate
from walmart_project_etl_spark.functions.rules import (FAR_FUTURE_EXPIRY,
                                                       SCD2_BACKFILL_EFFECTIVE,
                                                       change_fingerprint)


def scd2_apply(dim: DataFrame | None, source: DataFrame, key: str,
               tracked_cols: list[str], surrogate_col: str,
               run_date: str, now_ts: Column) -> DataFrame:
    """Apply one SCD2 load of ``source`` (one row per ``key``) onto ``dim``.

    Returns the full new dimension table (all versions, all keys).
    """
    run_d = F.lit(run_date).cast("date")
    yesterday = F.date_sub(run_d, 1)
    far_future = F.lit(FAR_FUTURE_EXPIRY).cast("date")
    backfill = F.lit(SCD2_BACKFILL_EFFECTIVE).cast("date")

    if dim is None:
        # first load: every key is brand-new, version 1, backfilled effective;
        # surrogate = hash(key, version) — parallel, stable, no global window
        return source.select(
            hash_surrogate(key, F.lit(1)).alias(surrogate_col),
            key, *tracked_cols,
            backfill.alias("effective_date"),
            far_future.alias("expiry_date"),
            F.lit(True).alias("is_current"),
            F.lit(1).alias("version"),
            now_ts.alias("insertion_date"),
            now_ts.alias("modification_date"),
        )

    src_fp = source.select(
        key, *[F.col(c).alias(f"__src_{c}") for c in tracked_cols],
        change_fingerprint(*tracked_cols).alias("__src_fp"))

    dim_fp = dim.withColumn("__fp", change_fingerprint(*tracked_cols))
    current = dim_fp.where(F.col("is_current"))
    history = dim_fp.where(~F.col("is_current"))

    # classify: join current rows ⟗ source on key (J5 change-detection join)
    cmp = current.join(src_fp, key, "full_outer")
    changed_keys = cmp.where(
        F.col(surrogate_col).isNotNull() & F.col("__src_fp").isNotNull()
        & (F.col("__fp") != F.col("__src_fp"))).select(key)
    new_keys = cmp.where(F.col(surrogate_col).isNull()).select(key)

    # step 2: expire changed current rows (D4 UPDATE → rewrite)
    expired = (current.join(changed_keys, key, "left_semi")
               .withColumn("is_current", F.lit(False))
               .withColumn("expiry_date", yesterday)
               .withColumn("modification_date", now_ts))
    unchanged_current = current.join(changed_keys, key, "left_anti")

    # step 3: insert new versions (changed keys) + version-1 rows (new keys)
    max_versions = dim.groupBy(key).agg(F.max("version").alias("__max_v"))  # J6
    to_insert = (src_fp
                 .join(changed_keys.withColumn("__is_changed", F.lit(True)), key, "left")
                 .join(new_keys.withColumn("__is_new", F.lit(True)), key, "left")
                 .where(F.col("__is_changed").isNotNull() | F.col("__is_new").isNotNull())
                 .join(max_versions, key, "left"))
    new_version = F.coalesce(F.col("__max_v"), F.lit(0)) + 1
    # surrogate = hash(key, version): unique per dimension row, minted in
    # parallel — no max-key lookup, no global row_number sequence
    inserts = to_insert.select(
        hash_surrogate(F.col(key), new_version).alias(surrogate_col),
        F.col(key),
        *[F.col(f"__src_{c}").alias(c) for c in tracked_cols],
        F.when(F.col("__is_changed").isNotNull(), run_d)     # J7 expired-set join
         .otherwise(backfill).alias("effective_date"),
        far_future.alias("expiry_date"),
        F.lit(True).alias("is_current"),
        new_version.alias("version"),
        now_ts.alias("insertion_date"),
        now_ts.alias("modification_date"),
    )

    out_cols = [surrogate_col, key, *tracked_cols,
                "effective_date", "expiry_date", "is_current", "version",
                "insertion_date", "modification_date"]
    return (history.select(*out_cols)
            .unionByName(unchanged_current.select(*out_cols))
            .unionByName(expired.select(*out_cols))
            .unionByName(inserts.select(*out_cols)))


def scd2_merge_tx(table, source: DataFrame, key: str,
                  tracked_cols: list[str], surrogate_col: str,
                  run_date: str, now_ts: Column) -> dict:
    """SCD2 load against a TRANSACTIONAL log table
    (``sources/txlog.TxTable`` keyed on the natural ``key``): the expiry
    UPDATE of the changed current rows and the INSERT of their new
    versions land as ONE atomic, file-pruned commit — the reference's
    flagship transaction (``etl_target_loader.py:320-388`` expiry+insert,
    txn wrapper :394-479), which ``scd2_apply`` over a plain parquet
    warehouse can only express as a whole-dimension rewrite.

    How it stays O(touched files) on BOTH sides: all versions of a
    natural key live in files whose [kmin, kmax]+bloom stats cover that
    key (appends/merges range-partition on it), so ``read_matching``
    below scans only the files that can contain a source key and
    semi-joins down to EXACTLY the source keys' version sets — a narrow
    batch against a wide dimension reads O(matching files), never the
    table; :func:`scd2_apply` re-derives those keys' full version sets
    (history + expired + unchanged + new versions); and ``merge_upsert``
    replaces every stored row of those keys with the new set in one
    commit, leaving every other file byte-identical (asserted in
    ``tests/test_txlog.py::test_scd2_merge_tx_*``; the read-side file
    pruning in ``test_scd2_merge_tx_read_side_prunes_files``). A crash
    between "expire" and "insert" is impossible by construction — they
    are not two statements but one commit.

    ``source`` must be one row per ``key`` (W1-deduped), like
    :func:`scd2_apply`, and ``key`` must be the table's own merge key:
    ``read_matching`` projects the table's ``key_col`` from the keys
    frame, so a mismatched name would fail deep in the plan with an
    opaque AnalysisException — checked here instead.
    Returns the merge's pruning stats.
    """
    table_key = table._state()[0]["key_col"]
    if key != table_key:
        raise ValueError(
            f"scd2_merge_tx key {key!r} must equal the table's merge "
            f"key {table_key!r} (the tx read/merge paths prune and "
            f"semi-join on the table's own key column)")
    affected = table.read_matching(source.select(key).distinct())
    new_rows = scd2_apply(affected, source, key, tracked_cols,
                          surrogate_col, run_date, now_ts)
    return table.merge_upsert(new_rows)


def scd2_from_changes(initial: DataFrame, changes: DataFrame, key: str,
                      attrs: list[str],
                      version_col: str = "_commit_version") -> DataFrame:
    """Derive a full SCD2 HISTORY from a change-data feed: every row
    version a key ever had, with [eff_from, eff_to) in SOURCE COMMIT
    VERSIONS (not wall clocks — versions are the feed's own total order
    per key, so the history is deterministic and replayable; Delta's
    CDF-to-SCD2 recipes that stamp processing time are not).

    ``initial`` is the snapshot the feed starts from (version 0 rows);
    ``changes`` is a CDF slice (insert / update_preimage /
    update_postimage / delete + ``version_col``). Open events (initial,
    insert, update_postimage) each START a row version; delete events
    only CLOSE the previous one. ONE window per key ordered by version
    assigns each open row its close: ``eff_to`` = the next event's
    version (NULL = still current). Pre-images are dropped — the
    postimage carries the new state, the window the old row's end.

    One shuffle on the key; the history is output-sized (rows =
    open events), never a self-join of the feed.

    Returns (key, attrs..., eff_from, eff_to, is_current).
    """
    opens = initial.select(
        F.col(key), *[F.col(a) for a in attrs],
        F.lit(0).cast("long").alias("__v"),
        F.lit("open").alias("__kind"))
    ch = changes.where(
        F.col("_change_type").isin("insert", "update_postimage",
                                   "delete"))
    opens2 = ch.where(F.col("_change_type") != "delete").select(
        F.col(key), *[F.col(a) for a in attrs],
        F.col(version_col).cast("long").alias("__v"),
        F.lit("open").alias("__kind"))
    closes = ch.where(F.col("_change_type") == "delete").select(
        F.col(key), *[F.lit(None).cast(t).alias(a) for a, t in
                      [(a, dict(changes.dtypes)[a]) for a in attrs]],
        F.col(version_col).cast("long").alias("__v"),
        F.lit("close").alias("__kind"))
    ev = opens.unionByName(opens2).unionByName(closes)
    w = Window.partitionBy(key).orderBy("__v")
    out = (ev.withColumn("__next", F.lead("__v").over(w))
           .where(F.col("__kind") == "open")
           .select(key, *attrs,
                   F.col("__v").alias("eff_from"),
                   F.col("__next").alias("eff_to"),
                   F.col("__next").isNull().alias("is_current")))
    return out
