"""TYPE WIDENING on the transaction-log table (``sources/txlog.py``:
``widen_column`` + ``merge_schema=True`` widening + write-side type
enforcement): Delta's type-widening semantics — metadata-only widen
restricted to READER-SAFE upcasts (the parquet reader then serves old
files under the wider declared type with no rewrite), lossless
automatic upcast of narrower writes, and loud rejection of lossy type
drift (which previously could poison every later read)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from walmart_project_etl_spark.sources.txlog import TxTable


def _df(spark, lo=0, hi=50):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.col("id").cast("int").alias("qty"),
        (F.col("id") * 1.5).cast("float").alias("price"),
        F.col("id").cast("decimal(10,2)").alias("amt"))


@pytest.fixture()
def table(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "w"))
    t.create(_df(spark), "k", n_files=3, change_feed=True)
    return t


def test_widen_is_metadata_only_and_reads_old_files(spark, table):
    t = table
    files = sorted(t._state()[1])
    t.widen_column("qty", "bigint")
    assert sorted(t._state()[1]) == files        # no rewrite
    s = t.snapshot()
    assert dict(s.dtypes)["qty"] == "bigint"
    assert s.agg(F.sum("qty")).first()[0] == sum(range(50))
    # pre-widen version time-travels to the NARROW type
    assert dict(t.snapshot(0).dtypes)["qty"] == "int"


def test_narrow_write_upcasts_automatically(spark, table):
    t = table
    t.widen_column("qty", "bigint")
    t.append(_df(spark, 50, 60))                 # qty arrives int
    s = t.snapshot()
    assert s.count() == 60
    assert dict(s.dtypes)["qty"] == "bigint"
    assert s.where("k >= 50").agg(F.sum("qty")).first()[0] == \
        sum(range(50, 60))


def test_merge_schema_widens_float_and_decimal(spark, table):
    t = table
    m = spark.range(5).select(
        F.col("id").alias("k"), F.col("id").cast("int").alias("qty"),
        F.lit(9.25).cast("double").alias("price"),
        F.lit(1).cast("decimal(20,2)").alias("amt"))
    t.merge_upsert(m, merge_schema=True)
    d = dict(t.snapshot().dtypes)
    assert d["price"] == "double" and d["amt"] == "decimal(20,2)"
    # kept rows from narrow files read exactly under the wide type
    assert abs(t.snapshot().where("k = 40").first()["price"]
               - 60.0) < 1e-6
    # CDF files from both sides of the widen union under the wide type
    ch = t.read_changes(0)
    assert dict(ch.dtypes)["price"] == "double"
    assert ch.count() == 50 + 2 * 5              # inserts + pre/post


def test_type_drift_rejected_loudly(spark, table):
    t = table
    bad = spark.range(1).select(
        F.col("id").alias("k"), F.col("id").cast("int").alias("qty"),
        F.lit("oops").alias("price"),
        F.lit(0).cast("decimal(10,2)").alias("amt"))
    with pytest.raises(ValueError, match="type drift"):
        t.append(bad)
    # an all-NARROWER row is not drift: every column upcasts lossless
    narrow = spark.range(100, 101).select(
        F.col("id").alias("k"), F.col("id").cast("smallint").alias("qty"),
        F.lit(1.0).cast("float").alias("price"),
        F.lit(0).cast("decimal(5,2)").alias("amt"))
    t.append(narrow)                             # all-lossless: fine
    assert t.snapshot().count() == 51


def test_key_widening_blocked_both_paths(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "k"))
    t.create(spark.range(5).select(F.col("id").cast("int").alias("k"),
                                   F.lit(1).alias("v")), "k")
    with pytest.raises(ValueError, match="merge key"):
        t.widen_column("k", "bigint")
    with pytest.raises(ValueError, match="merge key"):
        t.merge_upsert(spark.range(3).select(
            F.col("id").cast("bigint").alias("k"),
            F.lit(2).cast("bigint").alias("v")), merge_schema=True)


def test_non_widening_conversions_rejected(spark, table):
    t = table
    for col, ty in [("qty", "int"),       # same — not a widen
                    ("qty", "smallint"),  # narrowing
                    ("price", "string"),  # cross-class
                    ("amt", "decimal(20,4)")]:  # scale change
        with pytest.raises(ValueError):
            t.widen_column(col, ty)
    with pytest.raises(ValueError, match="no column"):
        t.widen_column("nope", "bigint")


def test_widen_after_rename_through_mapping(spark, table):
    t = table
    t.rename_column("qty", "quantity")
    t.widen_column("quantity", "bigint")
    s = t.snapshot()
    assert dict(s.dtypes)["quantity"] == "bigint"
    assert s.agg(F.sum("quantity")).first()[0] == sum(range(50))
    # merge through mapping + widened type, narrow source
    t.merge_upsert(_df(spark, 0, 3).withColumnRenamed("qty", "quantity")
                   .withColumn("quantity",
                               (F.col("quantity") + 100).cast("int")))
    assert t.snapshot().where("k < 3").agg(
        F.sum("quantity")).first()[0] == 303
