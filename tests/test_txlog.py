"""Transaction-log table (sources/txlog.py): ACID commits, time travel,
and the file-pruned copy-on-write MERGE."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from walmart_project_etl_spark.sources.txlog import TxTable

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet") \
                .select("o_orderkey", "o_custkey", "o_totalprice",
                        "o_orderstatus")


def test_create_append_snapshot(spark, orders, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    first = orders.where("o_orderkey % 2 = 0")
    second = orders.where("o_orderkey % 2 = 1")
    t.create(first, "o_orderkey")
    assert t.snapshot().count() == first.count()
    t.append(second)
    cols = ["o_orderkey", "o_totalprice"]
    assert _rows(t.snapshot(), cols) == _rows(orders, cols)
    # time travel: version 0 still reads exactly the first batch
    assert _rows(t.snapshot(0), cols) == _rows(first, cols)
    assert [h["op"] for h in t.history()] == ["create", "append"]


def test_merge_upserts_and_inserts(spark, orders, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.create(orders, "o_orderkey")
    updates = (orders.where("o_orderkey % 100 = 7")
               .withColumn("o_totalprice", F.lit(1.5))
               .unionByName(orders.limit(0)
                            .unionByName(spark.createDataFrame(
                                [(999999991, 1, 2.5, "N")], orders.schema))))
    stats = t.merge_upsert(updates)
    got = t.snapshot()
    expected = (orders.join(updates.select("o_orderkey"), "o_orderkey",
                            "left_anti").unionByName(updates))
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    assert _rows(got, cols) == _rows(expected, cols)
    assert stats["files_rewritten"] >= 1
    # pre-merge snapshot unaffected (snapshot isolation)
    assert _rows(t.snapshot(0), cols) == _rows(orders, cols)


def test_merge_prunes_files_outside_key_range(spark, orders, tmp_path):
    """A narrow update batch must rewrite ONLY the file(s) whose key range
    intersects it — the surviving files stay live BY PATH (never
    rewritten), which is the whole point vs whole-table MERGE emulation."""
    t = TxTable(spark, str(tmp_path / "t"))
    # force several files with disjoint tight ranges
    t.create(orders, "o_orderkey", n_files=8)
    _, live_before = t._state()
    assert len(live_before) >= 4, "fixture needs multiple files"
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    updates = orders.where(F.col("o_orderkey") <= lo + 5) \
                    .withColumn("o_totalprice", F.lit(9.25))
    stats = t.merge_upsert(updates)
    _, live_after = t._state()
    surviving = set(live_before) & set(live_after)
    assert stats["files_untouched"] >= len(live_before) - 2
    assert len(surviving) == stats["files_untouched"]
    # correctness on top of pruning
    cols = ["o_orderkey", "o_totalprice"]
    expected = (orders.join(updates.select("o_orderkey"), "o_orderkey",
                            "left_anti").unionByName(updates))
    assert _rows(t.snapshot(), cols) == _rows(expected, cols)


def test_crash_leaves_uncommitted_files_invisible(spark, orders, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.create(orders, "o_orderkey")
    n0 = t.snapshot().count()
    # simulate a crashed writer: data files land, no commit follows
    t._write_files(orders.limit(10), "o_orderkey")
    assert t.snapshot().count() == n0          # invisible
    removed = t.vacuum_uncommitted()
    assert removed and t.snapshot().count() == n0


def test_commit_race_detected(spark, orders, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.create(orders.limit(10), "o_orderkey")
    # another writer publishes version 1 first
    assert t._commit([{"op": "append"}], 1)
    # our stale commit for the same version must lose, not overwrite
    assert not t._commit([{"op": "append"}], 1)
    assert [h["version"] for h in t.history()] == [0, 1]
