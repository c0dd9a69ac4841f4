"""Closed-form unit tests for the business rules (SURVEY §2.8, F1-F32)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from walmart_project_etl_spark.functions import keys, rules


def _one(spark, expr, schema_row=None):
    df = spark.range(1) if schema_row is None else spark.createDataFrame([schema_row[0]], schema_row[1])
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_f01_md5_key_matches_hashlib(spark):
    expected = "CUST_" + hashlib.md5(b"Alan Schoenberger").hexdigest()[:14]
    got = _one(spark, keys.customer_id(F.lit("Alan Schoenberger")))
    assert got == expected


def test_f01_composite_key_joined_with_underscore(spark):
    expected = "SALE_" + hashlib.md5(b"37537_5272").hexdigest()[:14]
    got = _one(spark, keys.sale_id(F.lit("37537"), F.lit("5272")))
    assert got == expected


def test_f01_store_key_hashes_city_plus_store(spark):
    expected = "STORE_" + hashlib.md5(b"Napa Store").hexdigest()[:14]
    got = _one(spark, keys.store_id(F.lit("Napa")))
    assert got == expected


def test_f02_f29_date_ids_agree(spark):
    d = F.lit("2012-01-02").cast("date")
    assert _one(spark, keys.date_int_id(d)) == 20120102
    assert _one(spark, keys.date_id_from_parts(d)) == 20120102


def test_f04_multiformat_parse(spark):
    assert str(_one(spark, rules.parse_date_multi(F.lit("1/2/2012")))) == "2012-01-02"
    assert str(_one(spark, rules.parse_date_multi(F.lit("2012-01-02")))) == "2012-01-02"
    assert _one(spark, rules.parse_date_multi(F.lit("not a date"))) is None


def test_f05_weekend(spark):
    assert _one(spark, rules.is_weekend(F.lit("2026-08-15").cast("date"))) is True  # Sat
    assert _one(spark, rules.is_weekend(F.lit("2026-08-13").cast("date"))) is False  # Thu


def test_f07_safe_int_cast(spark):
    assert _one(spark, rules.safe_int_cast(F.lit("42.7"))) == 42
    assert _one(spark, rules.safe_int_cast(F.lit("abc"))) is None
    assert _one(spark, rules.safe_int_cast(F.lit(None).cast("string"))) is None


def test_f08_age_group_boundaries(spark):
    cases = {None: "Unknown", 17: "Under 18", 18: "18-34", 34: "18-34",
             35: "35-49", 49: "35-49", 50: "50-64", 64: "50-64", 65: "65+"}
    for age, expected in cases.items():
        got = _one(spark, rules.age_group(F.lit(age).cast("int")))
        assert got == expected, (age, got)


def test_f09_title_case_blank_and_null_default(spark):
    assert _one(spark, rules.title_case_clean(F.lit("  sOUth  "))) == "South"
    assert _one(spark, rules.title_case_clean(F.lit(""))) == "Unknown"
    assert _one(spark, rules.title_case_clean(F.lit(None).cast("string"))) == "Unknown"


def test_f11_margin_pct_guarded(spark):
    assert _one(spark, rules.margin_percentage(F.lit(0.56), F.lit(2.73))) == 20.51
    assert _one(spark, rules.margin_percentage(F.lit(0.5), F.lit(0.0))) == 0.0


def test_f13_price_tier_boundaries(spark):
    for price, tier in [(9.99, "Low"), (10.0, "Medium"), (49.99, "Medium"),
                        (50.0, "High"), (99.99, "High"), (100.0, "Premium")]:
        assert _one(spark, rules.price_tier(F.lit(price))) == tier


def test_f14_market_branch_shadowing(spark):
    # 'southwest' must hit West Coast (first matching branch), never South
    assert _one(spark, rules.market_from_region(F.lit("southwest"))) == "West Coast"
    assert _one(spark, rules.market_from_region(F.lit("Southeast"))) == "East Coast"
    assert _one(spark, rules.market_from_region(F.lit("south"))) == "South"
    assert _one(spark, rules.market_from_region(F.lit(None).cast("string"))) == "Unknown"
    assert _one(spark, rules.market_from_region(F.lit("mars"))) == "Other"


def test_f15_supplier_type(spark):
    assert _one(spark, rules.supplier_type_from_name(F.lit("Acme Wholesale"))) == "Wholesale"
    assert _one(spark, rules.supplier_type_from_name(F.lit("plain co"))) == "General"


def test_f16_f17_reason_rules(spark):
    assert _one(spark, rules.impact_level(F.lit("Defect"))) == "High"
    assert _one(spark, rules.impact_level(F.lit("Changed Mind"))) == "Low"
    assert _one(spark, rules.impact_level(F.lit("whatever"))) == "Medium"
    assert _one(spark, rules.is_controllable(F.lit("late delivery"))) is True
    assert _one(spark, rules.is_controllable(F.lit("changed mind"))) is False


def test_f18_f21_sales_rules(spark):
    assert _one(spark, rules.discount_amount(F.lit(180.36), F.lit(0.1))) == 18.04
    assert _one(spark, rules.net_revenue(F.lit(180.36), F.lit(18.04))) == 162.32
    assert _one(spark, rules.profit_margin(F.lit(-111.8), F.lit(180.36))) == -61.99
    assert _one(spark, rules.profit_margin(F.lit(5.0), F.lit(0.0))) == 0.0
    assert _one(spark, rules.is_profitable(F.lit(-111.8))) is False


def test_f22_f23_return_rules(spark):
    days = rules.days_since_sale(F.lit("2012-01-20").cast("date"),
                                 F.lit("2012-01-02").cast("date"))
    assert _one(spark, days) == 18
    assert _one(spark, rules.is_within_30_days(F.lit(30))) is True
    assert _one(spark, rules.is_within_30_days(F.lit(31))) is False
    assert _one(spark, rules.avg_return_price(F.lit(100.0), F.lit(3))) == 33.33
    assert _one(spark, rules.avg_return_price(F.lit(100.0), F.lit(0))) == 0.0


def test_f24_f26_inventory_rules(spark):
    assert _one(spark, rules.days_of_supply(F.lit(60), F.lit(20))) == 90
    assert _one(spark, rules.days_of_supply(F.lit(0), F.lit(20))) is None
    st = rules.stock_status(F.lit(0), F.lit(15), F.lit(10), F.lit(40))
    assert _one(spark, st) == "Out of Stock"
    st = rules.stock_status(F.lit(12), F.lit(15), F.lit(10), F.lit(40))
    assert _one(spark, st) == "Low Stock"
    st = rules.stock_status(F.lit(50), F.lit(15), F.lit(10), F.lit(40))
    assert _one(spark, st) == "Overstocked"
    assert _one(spark, rules.is_in_stock(F.lit(1))) is True


def test_f27_fingerprint_null_safe_and_sensitive(spark):
    a = _one(spark, rules.change_fingerprint(F.lit("x"), F.lit(None).cast("string")))
    b = _one(spark, rules.change_fingerprint(F.lit("x"), F.lit("")))
    c = _one(spark, rules.change_fingerprint(F.lit("x"), F.lit("y")))
    assert a == b          # null and '' coalesce identically (reference COALESCE)
    assert a != c


def test_f30_f31_deterministic_across_evaluations(spark):
    from walmart_project_etl_spark.plans.ods import _hash_int, _hash_unit
    df = spark.range(1000).select(
        _hash_unit(F.col("id"), F.lit(42)).alias("u"),
        _hash_int(14, F.col("id"), F.lit(43)).alias("i"))
    first = df.collect()
    second = df.repartition(7).collect()  # different partitioning, same draws
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    us = [r["u"] for r in first]
    assert all(0.0 <= u < 1.0 for u in us)
    rate = sum(u <= 0.1 for u in us) / len(us)
    assert 0.05 < rate < 0.15  # ~uniform
