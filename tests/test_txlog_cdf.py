"""Change data feed on the tx table (sources/txlog.py
``create(change_feed=True)`` / ``read_changes``): row-level change
capture at MERGE/DELETE, derived inserts for appends, retention, and
the sealed-prefix interplay with cross-table transactions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from walmart_project_etl_spark.sources.txlog import TxCatalog, TxTable

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet") \
                .select("o_orderkey", "o_custkey", "o_totalprice",
                        "o_orderstatus")


ALL = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
       "_change_type", "_commit_version"]


def test_merge_and_delete_change_capture(spark, orders, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.create(orders, "o_orderkey", n_files=8, change_feed=True)
    updates = (orders.where("o_orderkey % 50 = 3")
               .withColumn("o_totalprice", F.col("o_orderkey") * 0.5)
               .unionByName(spark.createDataFrame(
                   [(999999991, 1, 2.5, "N")], orders.schema)))
    t.merge_upsert(updates)                                       # v1
    dels = orders.where("o_orderkey % 50 = 11").select("o_orderkey")
    t.delete_keys(dels)                                           # v2

    expected = (
        orders.where("o_orderkey % 50 = 3")
        .withColumn("_change_type", F.lit("update_preimage"))
        .withColumn("_commit_version", F.lit(1).cast("long"))
        .unionByName(
            updates.where("o_orderkey <> 999999991")
            .withColumn("_change_type", F.lit("update_postimage"))
            .withColumn("_commit_version", F.lit(1).cast("long")))
        .unionByName(
            updates.where("o_orderkey = 999999991")
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(1).cast("long")))
        .unionByName(
            orders.where("o_orderkey % 50 = 11")
            .withColumn("_change_type", F.lit("delete"))
            .withColumn("_commit_version", F.lit(2).cast("long"))))
    assert _rows(t.read_changes(since_version=1), ALL) == \
        _rows(expected, ALL)

    # windowing: only the delete commit
    only_del = t.read_changes(since_version=2)
    assert {r["_change_type"] for r in
            only_del.select("_change_type").distinct().collect()} == \
        {"delete"}
    assert only_del.count() == dels.count()


def test_create_and_append_inserts_are_derived(spark, orders, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    first = orders.where("o_orderkey % 2 = 0")
    second = orders.where("o_orderkey % 2 = 1")
    t.create(first, "o_orderkey", n_files=4, change_feed=True)
    t.append(second)
    ch = t.read_changes(since_version=0)
    assert ch.where("_change_type <> 'insert'").count() == 0
    assert _rows(ch.select(*orders.columns), orders.columns) == \
        _rows(orders, orders.columns)
    # appends must not double-write change files — inserts derive from
    # the add files themselves
    assert not [f for f in os.listdir(t.data_dir)
                if f.startswith("cdf-")]


def test_compact_contributes_no_changes(spark, orders, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.create(orders, "o_orderkey", n_files=8, change_feed=True)
    t.compact(target_rows=10_000_000)                    # rewrites all
    assert t.read_changes(since_version=1).count() == 0


def test_read_changes_requires_flag(spark, orders, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.create(orders, "o_orderkey", n_files=4)
    with pytest.raises(ValueError, match="change_feed"):
        t.read_changes()


def test_sealed_prefix_stops_at_undecided_txn(spark, orders, tmp_path):
    c = TxCatalog(spark, str(tmp_path / "cat"))
    c.create_table("t", orders, "o_orderkey", n_files=4,
                   change_feed=True)
    c.table("t").delete_keys(
        orders.where("o_orderkey % 100 = 7").select("o_orderkey"))  # v1
    n_del = orders.where("o_orderkey % 100 = 7").count()

    txn = c.begin()
    txn.table("t").merge_upsert(
        orders.where("o_orderkey % 100 = 9")
        .withColumn("o_totalprice", F.lit(-5.125)))       # staged v2

    # a consumer sees ONLY the sealed prefix (v1), so advancing its
    # watermark past v1 can never skip the staged commit
    ch = c.table("t").read_changes(since_version=1)
    assert ch.count() == n_del
    assert ch.agg(F.max("_commit_version")).first()[0] == 1

    txn.commit()
    ch2 = c.table("t").read_changes(since_version=1)
    assert ch2.agg(F.max("_commit_version")).first()[0] == 2
    assert ch2.where("_change_type = 'update_postimage'").count() == \
        orders.where("o_orderkey % 100 = 9").count()


def test_vacuum_reclaims_old_change_files(spark, orders, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.create(orders, "o_orderkey", n_files=4, change_feed=True)
    for i in range(4):                                   # v1..v4
        t.merge_upsert(orders.where(f"o_orderkey % 100 = {i}")
                       .withColumn("o_totalprice", F.lit(float(i))))
    n_cdf_before = len([f for f in os.listdir(t.data_dir)
                        if f.startswith("cdf-")])
    assert n_cdf_before >= 4
    res = t.vacuum(retain_versions=2)                    # horizon = v3
    assert res["removed"] > 0
    n_cdf_after = len([f for f in os.listdir(t.data_dir)
                       if f.startswith("cdf-")])
    assert n_cdf_after < n_cdf_before
    # changes after the horizon stay fully readable
    ch = t.read_changes(since_version=4)
    assert ch.where("_change_type = 'update_postimage'").count() == \
        orders.where("o_orderkey % 100 = 3").count()


def _drain(spark, root, sink_dir, ckpt, since=None):
    """availableNow drain of the txlog_changes stream into a parquet
    sink (fault-tolerant → checkpointed offsets survive restarts)."""
    from walmart_project_etl_spark.streaming.txsource import \
        TxLogChangesDataSource
    spark.dataSource.register(TxLogChangesDataSource)
    reader = spark.readStream.format("txlog_changes").option("root", root)
    if since is not None:
        reader = reader.option("sinceVersion", str(since))
    q = (reader.load().writeStream.format("parquet")
         .option("path", sink_dir).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(sink_dir)


def test_stream_source_matches_batch_feed(spark, orders, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.create(orders.where("o_orderkey % 2 = 0"), "o_orderkey",
             n_files=4, change_feed=True)
    t.append(orders.where("o_orderkey % 2 = 1"))
    t.merge_upsert(orders.where("o_orderkey % 50 = 3")
                   .withColumn("o_totalprice", F.col("o_orderkey") * 0.5))
    t.delete_keys(orders.where("o_orderkey % 50 = 11")
                  .select("o_orderkey"))
    got = _drain(spark, t.root, str(tmp_path / "sink"),
                 str(tmp_path / "ckpt"))
    assert _rows(got, ALL) == _rows(t.read_changes(0), ALL)


def test_stream_checkpoint_resume_is_exactly_once(spark, orders,
                                                  tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.create(orders, "o_orderkey", n_files=4, change_feed=True)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    first = _drain(spark, t.root, sink, ckpt)
    assert first.count() == orders.count()          # v0 inserts

    # new commits land; the SAME checkpoint resumes and emits ONLY them
    t.delete_keys(orders.where("o_orderkey % 100 = 7")
                  .select("o_orderkey"))            # v1
    second = _drain(spark, t.root, sink, ckpt)
    new = second.where("_commit_version >= 1")
    assert second.count() == orders.count() + new.count()  # no replays
    assert new.count() == \
        orders.where("o_orderkey % 100 = 7").count()
    assert {r["_change_type"] for r in
            new.select("_change_type").distinct().collect()} == \
        {"delete"}


def test_stream_fences_to_sealed_prefix(spark, orders, tmp_path):
    c = TxCatalog(spark, str(tmp_path / "cat"))
    c.create_table("t", orders, "o_orderkey", n_files=4,
                   change_feed=True)
    root = os.path.join(c.tables_dir, "t")
    txn = c.begin()
    txn.table("t").merge_upsert(
        orders.where("o_orderkey % 100 = 9")
        .withColumn("o_totalprice", F.lit(-3.125)))  # staged, undecided

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    first = _drain(spark, root, sink, ckpt)
    # only the sealed prefix (v0 create) drains; the staged commit is
    # NOT skipped-and-lost — it simply hasn't been reached
    assert first.agg(F.max("_commit_version")).first()[0] == 0

    txn.commit()
    second = _drain(spark, root, sink, ckpt)
    assert second.agg(F.max("_commit_version")).first()[0] == 1
    assert second.where("_change_type = 'update_postimage'").count() == \
        orders.where("o_orderkey % 100 = 9").count()


def test_incremental_agg_fold_matches_recompute(spark, orders, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.create(orders, "o_orderkey", n_files=8, change_feed=True)
    t.merge_upsert(orders.where("o_orderkey % 50 = 3")
                   .withColumn("o_totalprice", F.col("o_orderkey") * 0.5))
    t.delete_keys(orders.where("o_orderkey % 50 = 11")
                  .select("o_orderkey"))

    dec = F.col("o_totalprice").cast("decimal(28,6)")
    base = (t.snapshot(0).groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n0"), F.sum(dec).alias("r0")))
    sign = F.when(F.col("_change_type").isin("insert",
                                             "update_postimage"),
                  F.lit(1)).otherwise(F.lit(-1))
    delta = (t.read_changes(since_version=1).groupBy("o_orderstatus")
             .agg(F.sum(sign).alias("nd"), F.sum(dec * sign).alias("rd")))
    zero = F.lit(0).cast("decimal(28,6)")
    folded = (base.join(delta, "o_orderstatus", "full")
              .select("o_orderstatus",
                      (F.coalesce("n0", F.lit(0))
                       + F.coalesce("nd", F.lit(0))).alias("n"),
                      (F.coalesce("r0", zero)
                       + F.coalesce("rd", zero)).alias("rev")))
    recomputed = (t.snapshot().groupBy("o_orderstatus")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum(dec).alias("rev")))
    cols = ["o_orderstatus", "n", "rev"]
    assert _rows(folded, cols) == _rows(recomputed, cols)


def test_stream_mv_refresh_follows_and_resumes(spark, orders, tmp_path):
    """The streaming MV: drains the CDF backlog into exactly-once
    refreshes, equals a from-scratch aggregate, and a SECOND stream run
    from the same checkpoint folds only the commits that landed in
    between (watermark == source head both times)."""
    from walmart_project_etl_spark.sources.txlog import TxTable
    from walmart_project_etl_spark.streaming import stream_mv_refresh

    root = str(tmp_path / "smv")
    src = TxTable(spark, root)
    src.create(orders.where("o_orderkey % 2 = 0"), "o_orderkey",
               n_files=2, change_feed=True)
    src.append(orders.where("o_orderkey % 2 = 1"))
    src.merge_upsert(orders.where("o_orderkey % 13 = 0")
                     .withColumn("o_totalprice", F.lit(4.0)))

    def check(mv):
        got = {r["o_orderstatus"]: (r["n_rows"], float(r["total"]))
               for r in mv.snapshot().collect()}
        exp = {r["o_orderstatus"]: (r["n"], float(r["s"])) for r in
               src.snapshot().groupBy("o_orderstatus")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum(F.col("o_totalprice")
                             .cast("decimal(28,6)")).alias("s"))
                  .collect()}
        assert got == exp
        assert mv.last_txn("agg_mv_refresh") == src.versions()[-1]

    mv = stream_mv_refresh(spark, root, str(tmp_path / "mv"),
                           ["o_orderstatus"], "o_totalprice")
    check(mv)
    src.delete_keys(orders.where("o_orderkey % 9 = 2")
                    .select("o_orderkey"))
    mv = stream_mv_refresh(spark, root, str(tmp_path / "mv"),
                           ["o_orderstatus"], "o_totalprice")
    check(mv)
