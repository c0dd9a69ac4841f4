"""Focused tests for the r15 optimization-round internals.

The optimizations must be INVISIBLE except for speed: pinned (persisted)
frames are released when each commit finishes, the single-job
constraint validation raises the same errors, and the thread-parallel
PQ fits produce bit-identical codebooks.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path / "tt")


def test_merge_paths_release_pinned_frames(spark, tmp_root):
    """merge/apply/delete/append pin their source frame per commit and
    MUST unpersist it on every exit path — a leak here grows the block
    manager by one cached plan per commit forever."""
    from walmart_project_etl_spark.sources.txlog import TxTable

    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    tt = TxTable(spark, tmp_root)
    tt.create(df, "k", n_files=2, change_feed=True)
    before = _n_persistent_rdds(spark)

    tt.append(spark.range(200, 260).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
    tt.merge_upsert(spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")))
    tt.merge_when(
        spark.range(20, 60).select(F.col("id").alias("k"),
                                   (F.col("id") * 9).alias("v")),
        update_cond="src.v > tgt.v")
    tt.delete_keys(spark.range(0, 10).select(F.col("id").alias("k")))
    tt.delete_keys_dv(spark.range(10, 15).select(F.col("id").alias("k")))
    tt.apply_changes(
        spark.range(15, 25).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v"),
            F.lit("insert").alias("_change_type")))

    assert _n_persistent_rdds(spark) <= before, \
        "a write path leaked its pinned source frame"


def test_refresh_agg_mv_releases_pins(spark, tmp_root):
    from walmart_project_etl_spark.operators.matview import refresh_agg_mv
    from walmart_project_etl_spark.sources.txlog import TxTable

    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 1.5).alias("v"))
    src = TxTable(spark, tmp_root)
    src.create(df, "k", n_files=2, change_feed=True)
    before = _n_persistent_rdds(spark)
    mv = refresh_agg_mv(spark, src, tmp_root + "_mv", ["g"], "v")
    assert _n_persistent_rdds(spark) <= before
    assert mv.snapshot().count() == 3


def test_validation_single_pass_same_messages(spark, tmp_root):
    """The one-job validation must raise the FIRST violated check in
    declaration order with the same message as the per-check jobs."""
    from walmart_project_etl_spark.sources.txlog import TxTable

    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("v"))
    tt = TxTable(spark, tmp_root)
    tt.create(df, "k", n_files=1)
    tt.add_constraint("v_pos", "v > 0")
    tt.add_constraint("v_cap", "v < 1000")
    # violates BOTH → the first declared one raises
    bad = spark.range(50, 52).select(
        F.col("id").alias("k"), F.lit(-5).cast("long").alias("v"))
    with pytest.raises(ValueError, match="CHECK constraint 'v_pos'"):
        tt.append(bad)
    # clean rows still pass (and leave no pinned frame behind)
    before = _n_persistent_rdds(spark)
    tt.append(spark.range(52, 54).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("v")))
    assert _n_persistent_rdds(spark) <= before


def test_pq_train_parallel_fits_deterministic(spark):
    """Thread-parallel subspace fits must yield bit-identical codebooks
    across invocations (seeds + partitioning unchanged)."""
    from walmart_project_etl_spark.operators import similarity

    emb = spark.read.parquet(
        os.path.join("/root/testdata/sf0.001", "embeddings.parquet"))
    b1 = similarity.pq_train(emb, "embedding", m=4, nbits=3)
    b2 = similarity.pq_train(emb, "embedding", m=4, nbits=3)
    assert b1 == b2


def test_key_bloom_bits_exact_vs_spec(spark, tmp_root):
    """The exploded (file, word) bit_or fold must log bit-identical
    blooms to the spec: bit ``pmod(xxhash64(key, i), _BLOOM_BITS)`` set
    for every key in the file and every probe i < _BLOOM_K."""
    from walmart_project_etl_spark.sources.txlog import (
        _BLOOM_BITS, _BLOOM_K, TxTable)

    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    tt = TxTable(spark, tmp_root)
    tt.create(df, "k", n_files=3)
    _meta, live = tt._state()
    assert len(live) == 3
    for a in live.values():
        rows = (spark.read.parquet(
                    os.path.join(tt.data_dir, a["path"]))
                .select(F.array(*[
                    F.pmod(F.xxhash64(F.col("k"), F.lit(i)),
                           F.lit(_BLOOM_BITS))
                    for i in range(_BLOOM_K)]).alias("p"))).collect()
        want = 0
        for r in rows:
            for p in r["p"]:
                want |= 1 << int(p)
        assert int(a["bloom"], 16) == want, a["path"]
