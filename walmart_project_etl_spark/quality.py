"""Data-quality gates: referential-integrity anti-joins, volume thresholds,
and distribution ratio checks.

The reference prints these (``verify_data_loading``,
``etl_ods_loader.py:891-1018``; ``verify_staging_data``,
``etl_staging_loader.py:1315-1383``) — here they are hard, assertable
checks returning one row per check so a pipeline can gate on them.

Every check is a single anti-join count or aggregate — shuffle-free where a
broadcast covers the dim side; at 100 TB each FK check is one scan of the
fact with a broadcast hash probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walmart_project_etl_spark.functions.keys import date_id_from_parts


def _check(spark: SparkSession, name: str, value, threshold, passed) -> DataFrame:
    return spark.createDataFrame(
        [(name, int(value), float(threshold), bool(passed))],
        "check string, value long, threshold double, passed boolean")


def _anti_count(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
                broadcast_dim: bool = True) -> int:
    """J3: rows of ``fact`` whose key has no match in ``dim``.

    ``broadcast_dim`` must only be True for genuinely dimension-sized
    tables; fact-to-fact checks (e.g. returns→sales) pass False so AQE
    picks the join strategy — force-broadcasting a fact-sized key set
    would OOM the driver at scale.
    """
    d = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    if broadcast_dim:
        d = F.broadcast(d)
    return fact.join(d, fact_key, "left_anti").count()


def fk_checks(spark: SparkSession, ods: dict[str, DataFrame]) -> DataFrame:
    """The reference's 8 referential-integrity anti-join checks
    (``etl_ods_loader.py:904-982``), as hard zero-violation gates."""
    sales, returns, inv = ods["ods_sales"], ods["ods_returns"], ods["ods_inventory"]
    checks = [
        ("sales_product_fk",
         _anti_count(sales, ods["ods_product"], "product_id", "product_id")),
        ("sales_store_fk",
         _anti_count(sales, ods["ods_store"], "store_id", "store_id")),
        ("sales_customer_fk",
         _anti_count(sales, ods["ods_customer"], "customer_id", "customer_id")),
        # date check via reconstructed YYYYMMDD id (reference :928-936, F29)
        ("sales_date_fk",
         _anti_count(sales.withColumn("date_id", date_id_from_parts("transaction_date")),
                     ods["ods_date"], "date_id", "date_id")),
        ("product_supplier_fk",
         _anti_count(ods["ods_product"], ods["ods_supplier"],
                     "supplier_id", "supplier_id")),
        ("returns_sale_fk",  # fact-to-fact: sale_id set is fact-sized, no broadcast
         _anti_count(returns, sales, "original_sale_id", "sale_id",
                     broadcast_dim=False)),
        ("returns_reason_fk",
         _anti_count(returns, ods["ods_return_reason"], "reason_code", "reason_code")),
        ("inventory_product_store_fk",
         _anti_count(inv, ods["ods_product"], "product_id", "product_id")
         + _anti_count(inv, ods["ods_store"], "store_id", "store_id")),
    ]
    out = None
    for name, violations in checks:
        row = _check(spark, name, violations, 0, violations == 0)
        out = row if out is None else out.unionByName(row)
    return out


def volume_checks(spark: SparkSession, ods: dict[str, DataFrame]) -> DataFrame:
    """Volume acceptance minimums (reference ``etl_ods_loader.py:984-1018``):
    ≥5,000 sales, ≥1,000 products, ≥100 stores, ≥3 months of returns,
    daily inventory snapshots present."""
    n_sales = ods["ods_sales"].count()
    n_products = ods["ods_product"].count()
    n_stores = ods["ods_store"].count()
    months = (ods["ods_returns"]
              .agg(((F.year(F.max("return_date")) * 12 + F.month(F.max("return_date")))
                    - (F.year(F.min("return_date")) * 12 + F.month(F.min("return_date"))))
                   .alias("m")).collect()[0]["m"]) or 0
    snapshot_days = (ods["ods_inventory"]
                     .agg(F.countDistinct("inventory_date").alias("d"))
                     .collect()[0]["d"])
    rows = [
        ("min_sales_volume", n_sales, 5000, n_sales >= 5000),
        ("min_product_count", n_products, 1000, n_products >= 1000),
        ("min_store_count", n_stores, 100, n_stores >= 100),
        ("min_returns_months", months, 3, months >= 3),
        ("inventory_snapshot_days", snapshot_days, 1, snapshot_days >= 1),
    ]
    out = None
    for name, value, thr, ok in rows:
        row = _check(spark, name, value, thr, ok)
        out = row if out is None else out.unionByName(row)
    return out


def ratio_checks(stg: dict[str, DataFrame]) -> DataFrame:
    """Distribution sanity ratios (reference ``etl_staging_loader.py:1349-1381``):
    % high-margin products, % profitable sales, % returns within 30 days,
    % out-of-stock — as one row per ratio (A8 conditional-count shape)."""
    def pct(df: DataFrame, cond, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check"),
            F.round(100.0 * F.sum(F.when(cond, 1).otherwise(0)) / F.count(F.lit(1)), 2)
             .alias("pct"),
            F.count(F.lit(1)).alias("n_rows"))

    parts = [
        pct(stg["stg_product"], F.col("is_high_margin"), "pct_high_margin_products"),
        pct(stg["stg_sales"], F.col("is_profitable"), "pct_profitable_sales"),
        pct(stg["stg_returns"], F.col("is_within_30_days"), "pct_returns_within_30_days"),
        pct(stg["stg_inventory"], F.col("stock_status") == "Out of Stock",
            "pct_out_of_stock"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def assert_quality(spark: SparkSession, ods: dict[str, DataFrame]) -> None:
    """Hard gate: raise if any FK or volume check fails."""
    failed = [r["check"]
              for r in fk_checks(spark, ods).unionByName(
                  volume_checks(spark, ods)).collect()
              if not r["passed"]]
    if failed:
        raise AssertionError(f"quality checks failed: {failed}")
