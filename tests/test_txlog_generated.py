"""GENERATED COLUMNS on the transaction-log table
(``sources/txlog.py``: ``create(..., generated=)``): Delta's
``GENERATED ALWAYS AS`` semantics — omitted on write → computed,
provided on write → validated against the expression, recomputed by
predicate UPDATE after SETs, and the canonical generated-PARTITION
pattern where partition pruning stays exact because writers can never
hand-maintain the value wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from walmart_project_etl_spark.sources.txlog import TxTable


def _events(spark, lo=0, hi=100, day="2026-01-01"):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.lit(f"{day} 00:00:00")).alias("ts"),
        (F.col("id") * 2.0).alias("v"))
    return df.withColumn("ts",
                         F.col("ts") + F.make_interval(days=F.col("k") % 9))


@pytest.fixture()
def table(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "g"))
    # the create df OMITS the generated column — computed here too
    t.create(_events(spark), "k", n_files=3, change_feed=True,
             partition_by="day",
             generated={"day": "date_format(ts, 'yyyy-MM-dd')"})
    return t


def test_generated_partition_computed_and_pruned(spark, table):
    t = table
    assert t.snapshot().where("day = '2026-01-03'").count() == \
        _events(spark).where("k % 9 = 2").count()
    # append without the column: computed, lands in the right partition
    t.append(spark.range(100, 120).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.lit("2026-02-05 12:00:00")).alias("ts"),
        F.lit(1.0).alias("v")))
    assert t.read_partitions(["2026-02-05"]).count() == 20


def test_provided_value_validated(spark, table):
    t = table
    bad = spark.range(200, 201).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.lit("2026-03-01 00:00:00")).alias("ts"),
        F.lit(1.0).alias("v"), F.lit("1999-01-01").alias("day"))
    with pytest.raises(ValueError, match="generated column 'day'"):
        t.append(bad)
    t.append(bad.withColumn("day", F.lit("2026-03-01")))   # correct: ok
    assert t.snapshot().where("k = 200").first()["day"] == "2026-03-01"


def test_update_recomputes_and_set_on_generated_rejected(spark, table):
    t = table
    t.update_where({"ts": "ts + interval 1 day"}, "k = 0")
    assert t.snapshot().where("k = 0").first()["day"] == "2026-01-02"
    with pytest.raises(ValueError, match="generated"):
        t.update_where({"day": "'2030-01-01'"}, "k = 1")


def test_rename_drop_guards_and_target_rename(spark, table):
    t = table
    with pytest.raises(ValueError, match="generated"):
        t.rename_column("ts", "event_ts")      # referenced source
    with pytest.raises(ValueError, match="generated"):
        t.drop_column("ts")
    # renaming the generated TARGET renames the partition column, the
    # mapping, and the generated entry together
    t.rename_column("day", "event_day")
    t.append(spark.range(300, 302).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.lit("2026-05-01 00:00:00")).alias("ts"),
        F.lit(1.0).alias("v")))
    assert t.snapshot().where("k >= 300").first()["event_day"] == \
        "2026-05-01"
    assert t.read_partitions(["2026-05-01"]).count() == 2


def test_merge_and_cdf_carry_generated(spark, table):
    t = table
    t.merge_upsert(spark.range(5).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.lit("2026-04-01 00:00:00")).alias("ts"),
        F.lit(9.0).alias("v")))
    assert t.snapshot().where("k < 5") \
        .select("day").distinct().first()[0] == "2026-04-01"
    ch = t.read_changes(0)
    assert "day" in ch.columns
    assert ch.where("day is null").count() == 0


def test_generated_partition_filter_inference(spark, table):
    """read_generated_range: a range predicate on the SOURCE column
    infers the partition band through the generation expression —
    pruned to the covered days' files, exact rows, and cyclic
    expressions (month()) never match the monotone whitelist."""
    t = table
    import datetime as dt

    lo = dt.datetime(2026, 1, 3)
    hi = dt.datetime(2026, 1, 5, 23, 59, 59)
    got = t.read_generated_range("ts", lo, hi)
    exp = t.snapshot().where(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
    assert sorted(r["k"] for r in got.collect()) == \
        sorted(r["k"] for r in exp.collect())
    assert got.count() > 0
    # pruned: only the 3 covered days' files are read
    n_live = len(t._state()[1])
    assert 0 < len(got.inputFiles()) < n_live

    # a column with no monotone generated partition refuses
    with pytest.raises(ValueError, match="monotonically"):
        t.read_generated_range("v", 0.0, 1.0)

    # cyclic generation (month-of-year) must NOT be inferred from
    c = TxTable(spark, str(t.root) + "_cyc")
    c.create(_events(spark), "k", n_files=2, partition_by="m",
             generated={"m": "month(ts)"})
    with pytest.raises(ValueError, match="monotonically"):
        c.read_generated_range("ts", lo, hi)
