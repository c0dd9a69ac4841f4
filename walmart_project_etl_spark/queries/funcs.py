"""Scalar-function / business-rule queries (SURVEY §2.8, F1-F32).

Each rule is exercised through the SAME ``functions.keys`` /
``functions.rules`` Column expressions the ETL plans use, applied to the
driver's testdata, with a DuckDB twin. Rules whose outputs depend on
xxhash64 (F30/F31/F32) get rows-only entries — DuckDB has no xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walmart_project_etl_spark.functions import keys, rules

from .util import dsum, sql_dsum, t

QUERIES: dict = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn
    return deco


@q("f01_md5_key_generation",
   """SELECT c_custkey,
             concat('CUST_', substr(md5(c_name), 1, 14)) AS customer_hash_id,
             concat('SALE_', substr(md5(concat_ws('_', c_custkey, c_nationkey)), 1, 14))
               AS composite_hash_id
      FROM customer""")
def f01_md5_key_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: PREFIX_ + md5(content)[:14] deterministic keys, single and
    composite (reference ``etl_ods_loader.py:95-170``)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        keys.md5_key("CUST", "c_name").alias("customer_hash_id"),
        keys.md5_key("SALE", "c_custkey", "c_nationkey").alias("composite_hash_id"))


@q("f02_f29_date_int_id",
   """SELECT DISTINCT
             year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS date_id,
             year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS date_id_from_parts
      FROM orders""")
def f02_f29_date_int_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 + F29: YYYYMMDD int id via date_format and via EXTRACT arithmetic —
    both derivations must agree (reference ``etl_ods_loader.py:91-93`` and
    :929-935)."""
    o = t(spark, sf_dir, "orders")
    return (o.select(keys.date_int_id("o_orderdate").alias("date_id"),
                     keys.date_id_from_parts("o_orderdate").alias("date_id_from_parts"))
            .distinct())


@q("f03_f05_f06_date_parts",
   """SELECT DISTINCT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS full_date,
             dayname(o_orderdate) AS day_of_week,
             day(o_orderdate) AS day_of_month,
             month(o_orderdate) AS month,
             monthname(o_orderdate) AS month_name,
             quarter(o_orderdate) AS quarter,
             year(o_orderdate) AS year,
             isodow(o_orderdate) IN (6, 7) AS is_weekend,
             year(o_orderdate) AS fiscal_year,
             quarter(o_orderdate) AS fiscal_quarter
      FROM orders""")
def f03_f05_f06_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F5/F6: date-part derivations + weekend flag + fiscal passthroughs
    (reference ``etl_ods_loader.py:226-242``, ``etl_staging_loader.py:181-183``)."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("full_date")).distinct()
    parts = rules.date_parts("full_date")
    return o.select(
        F.date_format("full_date", "yyyy-MM-dd").alias("full_date"),
        *[expr.alias(name) for name, expr in parts.items()],
        rules.is_weekend("full_date").alias("is_weekend"),
        rules.fiscal_year("full_date").alias("fiscal_year"),
        rules.fiscal_quarter("full_date").alias("fiscal_quarter"))


@q("f04_multiformat_date_parse",
   """SELECT DISTINCT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS original_date,
             CAST(CAST(strptime(strftime(o_orderdate, '%-m/%-d/%Y'), '%m/%d/%Y')
                  AS DATE) AS VARCHAR) AS reparsed_date
      FROM orders""")
def f04_multiformat_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: multi-format date parsing — format each date as non-padded
    M/d/yyyy (the reference CSV's format) and parse it back; must round-trip
    (reference ``etl_ods_loader.py:208-224``)."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("original_date")).distinct()
    as_str = F.date_format("original_date", "M/d/yyyy")
    return o.select(
        F.date_format("original_date", "yyyy-MM-dd").alias("original_date"),
        F.date_format(rules.parse_date_multi(as_str), "yyyy-MM-dd").alias("reparsed_date"))


@q("f07_f08_safe_cast_age_group",
   """WITH aged AS (
        SELECT try_cast(CASE WHEN c_custkey % 7 = 0 THEN 'N/A'
                             ELSE CAST(c_custkey % 120 AS VARCHAR) END AS DOUBLE)::INT AS age
        FROM customer)
      SELECT CASE WHEN age IS NULL THEN 'Unknown'
                  WHEN age < 18 THEN 'Under 18'
                  WHEN age < 35 THEN '18-34'
                  WHEN age < 50 THEN '35-49'
                  WHEN age < 65 THEN '50-64'
                  ELSE '65+' END AS age_group,
             count(*) AS n
      FROM aged GROUP BY 1""")
def f07_f08_safe_cast_age_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7+F8: null-on-failure string→int cast and age bucketing (reference
    ``etl_staging_loader.py:270-292``). Dirty values synthesized
    deterministically from c_custkey."""
    c = t(spark, sf_dir, "customer")
    dirty = F.when(F.col("c_custkey") % 7 == 0, F.lit("N/A")) \
             .otherwise((F.col("c_custkey") % 120).cast("string"))
    age = rules.safe_int_cast(dirty)
    return (c.select(rules.age_group(age).alias("age_group"))
            .groupBy("age_group").agg(F.count(F.lit(1)).alias("n")))


@q("f09_title_case_clean",
   """SELECT DISTINCT p_name AS raw_name,
             array_to_string(list_transform(string_split(lower(trim(p_name)), ' '),
                 w -> concat(upper(substr(w,1,1)), substr(w,2))), ' ') AS clean_name
      FROM part""")
def f09_title_case_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: strip().title()-style cleanup via initcap (reference
    ``etl_staging_loader.py:295``)."""
    p = t(spark, sf_dir, "part").select(F.col("p_name").alias("raw_name")).distinct()
    return p.select("raw_name", rules.title_case_clean("raw_name").alias("clean_name"))


@q("f10_null_defaults",
   """SELECT coalesce(nullif(l_returnflag, 'N'), 'Unknown') AS flag_or_default,
             count(*) AS n
      FROM lineitem GROUP BY 1""")
def f10_null_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: `or 'Unknown'` null-default pattern (reference
    ``etl_staging_loader.py:268`` + ~20 sites). Nulls synthesized via
    nullif so the default path actually fires."""
    li = t(spark, sf_dir, "lineitem")
    flag = F.when(F.col("l_returnflag") == "N", None).otherwise(F.col("l_returnflag"))
    return (li.select(rules.default_if_null(flag, "Unknown").alias("flag_or_default"))
            .groupBy("flag_or_default").agg(F.count(F.lit(1)).alias("n")))


@q("f11_f13_product_rules",
   f"""WITH x AS (
        SELECT CASE WHEN p_retailprice > 0
                    THEN round(CAST(p_size / p_retailprice * 100.0 AS DECIMAL(28,8)), 2)::DOUBLE
                    ELSE 0.0 END AS margin_percentage,
               CASE WHEN p_retailprice < 10 THEN 'Low'
                    WHEN p_retailprice < 50 THEN 'Medium'
                    WHEN p_retailprice < 100 THEN 'High'
                    ELSE 'Premium' END AS price_tier,
               (CASE WHEN p_retailprice > 0
                     THEN round(CAST(p_size / p_retailprice * 100.0 AS DECIMAL(28,8)), 2)::DOUBLE
                     ELSE 0.0 END) > 30.0 AS is_high_margin
        FROM part)
      SELECT price_tier, is_high_margin, count(*) AS n,
             {sql_dsum('margin_percentage', 'sum_margin_pct')}
      FROM x GROUP BY price_tier, is_high_margin""")
def f11_f13_product_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11/F12/F13: margin %, high-margin flag, price tier (reference
    ``etl_staging_loader.py:383-397``)."""
    p = t(spark, sf_dir, "part")
    mp = rules.margin_percentage(F.col("p_size"), F.col("p_retailprice"))
    x = p.select(mp.alias("margin_percentage"),
                 rules.price_tier("p_retailprice").alias("price_tier"),
                 rules.is_high_margin(mp).alias("is_high_margin"))
    return (x.groupBy("price_tier", "is_high_margin")
            .agg(F.count(F.lit(1)).alias("n"), dsum("margin_percentage", "sum_margin_pct")))


_F14_SYNTH = """CASE c_custkey % 9
    WHEN 0 THEN 'east' WHEN 1 THEN 'West' WHEN 2 THEN 'central'
    WHEN 3 THEN 'south' WHEN 4 THEN 'Northeast' WHEN 5 THEN 'southwest'
    WHEN 6 THEN 'pacific' WHEN 7 THEN 'nowhere' ELSE NULL END"""


@q("f14_market_from_region",
   f"""WITH x AS (SELECT {_F14_SYNTH} AS region FROM customer)
      SELECT CASE WHEN region IS NULL THEN 'Unknown'
                  WHEN lower(region) IN ('east','northeast','southeast') THEN 'East Coast'
                  WHEN lower(region) IN ('west','northwest','southwest','pacific') THEN 'West Coast'
                  WHEN lower(region) IN ('central','midwest','north central','south central') THEN 'Central'
                  WHEN lower(region) IN ('south','southwest','southeast') THEN 'South'
                  ELSE 'Other' END AS market,
             count(*) AS n
      FROM x GROUP BY market""")
def f14_market_from_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: region → market ORDER-SENSITIVE chain incl. the reference's
    branch-shadowing ('southwest' hits West Coast before South; reference
    ``etl_staging_loader.py:485-497``). Regions synthesized from c_custkey
    to cover every branch."""
    c = t(spark, sf_dir, "customer")
    region = (F.when(F.col("c_custkey") % 9 == 0, "east")
               .when(F.col("c_custkey") % 9 == 1, "West")
               .when(F.col("c_custkey") % 9 == 2, "central")
               .when(F.col("c_custkey") % 9 == 3, "south")
               .when(F.col("c_custkey") % 9 == 4, "Northeast")
               .when(F.col("c_custkey") % 9 == 5, "southwest")
               .when(F.col("c_custkey") % 9 == 6, "pacific")
               .when(F.col("c_custkey") % 9 == 7, "nowhere")
               .otherwise(F.lit(None).cast("string")))
    return (c.select(rules.market_from_region(region).alias("market"))
            .groupBy("market").agg(F.count(F.lit(1)).alias("n")))


@q("f15_supplier_type",
   """WITH x AS (SELECT concat(s_name, CASE s_suppkey % 5
                 WHEN 0 THEN ' Wholesale Co' WHEN 1 THEN ' Retail LLC'
                 WHEN 2 THEN ' Manufacturer' WHEN 3 THEN ' Distributor' ELSE '' END)
                 AS supplier_name FROM supplier)
      SELECT CASE WHEN lower(supplier_name) LIKE '%wholesale%' THEN 'Wholesale'
                  WHEN lower(supplier_name) LIKE '%retail%' THEN 'Retail'
                  WHEN lower(supplier_name) LIKE '%manufacturer%' THEN 'Manufacturer'
                  WHEN lower(supplier_name) LIKE '%distributor%' THEN 'Distributor'
                  ELSE 'General' END AS supplier_type,
             count(*) AS n
      FROM x GROUP BY supplier_type""")
def f15_supplier_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: supplier type from substring match (reference
    ``etl_staging_loader.py:575-587``)."""
    s = t(spark, sf_dir, "supplier")
    name = F.concat(F.col("s_name"),
                    F.when(F.col("s_suppkey") % 5 == 0, " Wholesale Co")
                     .when(F.col("s_suppkey") % 5 == 1, " Retail LLC")
                     .when(F.col("s_suppkey") % 5 == 2, " Manufacturer")
                     .when(F.col("s_suppkey") % 5 == 3, " Distributor")
                     .otherwise(""))
    return (s.select(rules.supplier_type_from_name(name).alias("supplier_type"))
            .groupBy("supplier_type").agg(F.count(F.lit(1)).alias("n")))


_F16_SYNTH = """CASE l_returnflag WHEN 'R' THEN 'Defect' WHEN 'A' THEN 'Changed Mind'
                ELSE 'Late Delivery' END"""


@q("f16_f17_return_reason_rules",
   f"""WITH x AS (SELECT {_F16_SYNTH} AS category FROM lineitem)
      SELECT CASE WHEN lower(category) IN ('defect','damage','quality') THEN 'High'
                  WHEN lower(category) IN ('preference','changed mind') THEN 'Low'
                  ELSE 'Medium' END AS impact_level,
             lower(category) IN ('defect','damage','quality','wrong item','late delivery')
               AS is_controllable,
             count(*) AS n
      FROM x GROUP BY impact_level, is_controllable""")
def f16_f17_return_reason_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16/F17: impact level + controllable flag from return category
    (reference ``etl_staging_loader.py:662-674``)."""
    li = t(spark, sf_dir, "lineitem")
    cat = (F.when(F.col("l_returnflag") == "R", "Defect")
            .when(F.col("l_returnflag") == "A", "Changed Mind")
            .otherwise("Late Delivery"))
    return (li.select(rules.impact_level(cat).alias("impact_level"),
                      rules.is_controllable(cat).alias("is_controllable"))
            .groupBy("impact_level", "is_controllable")
            .agg(F.count(F.lit(1)).alias("n")))


@q("f18_f21_sales_rules",
   f"""WITH x AS (
        SELECT l_extendedprice,
               round(CAST(l_extendedprice * l_discount AS DECIMAL(28,8)), 2)::DOUBLE
                 AS discount_amount,
               round(CAST(l_extendedprice * (l_discount - 0.02) AS DECIMAL(28,8)), 2)::DOUBLE
                 AS profit
        FROM lineitem),
      y AS (SELECT discount_amount, profit,
               round(CAST(l_extendedprice - discount_amount AS DECIMAL(28,8)), 2)::DOUBLE
                 AS net_revenue
            FROM x),
      z AS (SELECT discount_amount, net_revenue, profit,
               CASE WHEN net_revenue > 0
                    THEN round(CAST(profit / net_revenue * 100.0 AS DECIMAL(28,8)), 2)::DOUBLE
                    ELSE 0.0 END AS profit_margin,
               profit > 0 AS is_profitable
            FROM y)
      SELECT is_profitable, count(*) AS n,
             {sql_dsum('discount_amount', 'sum_discount_amount')},
             {sql_dsum('net_revenue', 'sum_net_revenue')},
             {sql_dsum('profit_margin', 'sum_profit_margin')}
      FROM z GROUP BY is_profitable""")
def f18_f21_sales_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18-F21: discount amount, net revenue, guarded profit margin,
    profitability flag (reference ``etl_staging_loader.py:841-845``).
    Profit synthesized as extprice*(discount-0.02) so both signs occur."""
    li = t(spark, sf_dir, "lineitem")
    damt = rules.discount_amount("l_extendedprice", "l_discount")
    net = rules.net_revenue("l_extendedprice", damt)
    profit = F.round(F.col("l_extendedprice") * (F.col("l_discount") - 0.02), 2)
    x = li.select(damt.alias("discount_amount"), net.alias("net_revenue"),
                  profit.alias("profit"))
    y = x.select("discount_amount", "net_revenue",
                 rules.profit_margin("profit", "net_revenue").alias("profit_margin"),
                 rules.is_profitable("profit").alias("is_profitable"))
    return (y.groupBy("is_profitable").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("discount_amount", "sum_discount_amount"),
        dsum("net_revenue", "sum_net_revenue"),
        dsum("profit_margin", "sum_profit_margin")))


@q("f22_f23_return_timing",
   f"""WITH x AS (
        SELECT datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
                 AS days_since_sale,
               CASE WHEN l_quantity > 0
                    THEN round(CAST(l_extendedprice / l_quantity AS DECIMAL(28,8)), 2)::DOUBLE
                    ELSE 0.0 END AS avg_item_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      SELECT days_since_sale <= 30 AS is_within_30_days, count(*) AS n,
             {sql_dsum('avg_item_price', 'sum_avg_price')}
      FROM x GROUP BY is_within_30_days""")
def f22_f23_return_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F22/F23: day-difference + 30-day window flag + guarded unit price
    (reference ``etl_staging_loader.py:1043-1051``)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("l_orderkey"),
                                          "o_orderdate")
    x = li.join(o, "l_orderkey").select(
        rules.days_since_sale(F.col("l_shipdate").cast("date"),
                              F.col("o_orderdate").cast("date")).alias("days_since_sale"),
        rules.avg_return_price("l_extendedprice", "l_quantity").alias("avg_item_price"))
    return (x.groupBy(rules.is_within_30_days("days_since_sale").alias("is_within_30_days"))
            .agg(F.count(F.lit(1)).alias("n"), dsum("avg_item_price", "sum_avg_price")))


@q("f24_f26_inventory_rules",
   """WITH x AS (
        SELECT CAST(l_quantity AS INT) AS stock,
               10 + (l_partkey % 10)::INT AS min_stock,
               15 + (l_partkey % 5)::INT AS reorder,
               35 + (l_partkey % 20)::INT AS max_stock
        FROM lineitem)
      SELECT CASE WHEN stock <= 0 THEN 'Out of Stock'
                  WHEN stock < reorder THEN 'Low Stock'
                  WHEN stock < min_stock THEN 'Below Minimum'
                  WHEN stock > max_stock THEN 'Overstocked'
                  ELSE 'In Stock' END AS stock_status,
             stock > 0 AS is_in_stock,
             count(*) AS n,
             CAST(sum(CASE WHEN stock > 0 AND min_stock > 0
                      THEN trunc(stock / min_stock * 30)::INT ELSE 0 END) AS BIGINT) AS sum_days_supply
      FROM x GROUP BY stock_status, is_in_stock""")
def f24_f26_inventory_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24/F25/F26: days-of-supply, stock status chain, in-stock flag
    (reference ``etl_staging_loader.py:1219-1238``). Stock levels derived
    deterministically from lineitem columns."""
    li = t(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_quantity").cast("int").alias("stock"),
        (10 + F.col("l_partkey") % 10).cast("int").alias("min_stock"),
        (15 + F.col("l_partkey") % 5).cast("int").alias("reorder"),
        (35 + F.col("l_partkey") % 20).cast("int").alias("max_stock"))
    dos = rules.days_of_supply("stock", "min_stock")
    return (x.groupBy(
        rules.stock_status("stock", "reorder", "min_stock", "max_stock").alias("stock_status"),
        rules.is_in_stock("stock").alias("is_in_stock"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.coalesce(dos, F.lit(0))).alias("sum_days_supply")))


@q("f27_change_fingerprint",
   """SELECT count(DISTINCT concat_ws('|', coalesce(p_name,''), coalesce(p_brand,''),
                                      coalesce(CAST(p_retailprice AS VARCHAR), '')))
               AS n_distinct_fingerprints,
             count(DISTINCT concat_ws('|', coalesce(p_name,''), coalesce(p_brand,'')))
               AS n_distinct_short
      FROM part""")
def f27_change_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F27: change-detection fingerprint over tracked columns (reference
    CONCAT(COALESCE…) compare, ``etl_target_loader.py:332-341``). The engine
    hashes with xxhash64; distinct-count equivalence with the raw concat is
    the oracle-checkable property (md5/xxhash collisions are negligible).

    Note: the double→string rendering inside the concat differs between
    engines, so the oracle counts distinct tuples semantically — both sides
    count distinct (name, brand, price) combinations."""
    p = t(spark, sf_dir, "part")
    return p.agg(
        F.countDistinct(rules.change_fingerprint("p_name", "p_brand", "p_retailprice"))
         .alias("n_distinct_fingerprints"),
        F.countDistinct(rules.change_fingerprint("p_name", "p_brand"))
         .alias("n_distinct_short"))


@q("f28_audit_stamps",
   """SELECT TIMESTAMP '2026-08-13 00:00:00' AS load_timestamp,
             '2026-08-13' AS run_date,
             '2026-08-12' AS scd2_expiry_for_old,
             '9999-12-31' AS far_future_expiry,
             '2000-01-01' AS backfill_effective""")
def f28_audit_stamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F28: injected run_date replaces datetime.now() — audit timestamps and
    the SCD2 sentinel dates (reference ``etl_target_loader.py:46-49``)."""
    run_date = "2026-08-13"
    iso = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return spark.range(1).select(
        F.lit(run_date).cast("timestamp").alias("load_timestamp"),
        iso(F.lit(run_date).cast("date")).alias("run_date"),
        iso(F.date_sub(F.lit(run_date).cast("date"), 1)).alias("scd2_expiry_for_old"),
        iso(F.lit(rules.FAR_FUTURE_EXPIRY).cast("date")).alias("far_future_expiry"),
        iso(F.lit(rules.SCD2_BACKFILL_EFFECTIVE).cast("date")).alias("backfill_effective"))


@q("f30_contact_synthesis", None)  # xxhash64-derived — rows-only
def f30_contact_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F30: deterministic contact synthesis via stable hash (reference uses
    run-unstable Python hash(), ``etl_ods_loader.py:334-347``). Rows-only:
    DuckDB has no xxhash64. Determinism is asserted in tests/ instead."""
    s = t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.format_string("555-%04d",
                        F.pmod(F.xxhash64("s_name"), F.lit(10000)).cast("int")).alias("phone"),
        F.concat(F.pmod(F.xxhash64("s_name", F.lit(1)), F.lit(1000)).cast("string"),
                 F.lit(" Main St")).alias("address"))


@q("f31_seeded_random_draws", None)  # xxhash64-derived — rows-only
def f31_seeded_random_draws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F31: partition-independent deterministic draws replacing random.random
    (reference ``etl_ods_loader.py:693-742``). Rows-only; determinism and
    the ~10% rate are asserted in tests/."""
    from walmart_project_etl_spark.plans.ods import _hash_int, _hash_unit
    o = t(spark, sf_dir, "orders")
    return (o.where(_hash_unit("o_orderkey", F.lit(42)) <= 0.1)
            .select("o_orderkey",
                    _hash_int(14, "o_orderkey", F.lit(43)).alias("lag_days"),
                    (_hash_unit("o_orderkey", F.lit(44)) <= 0.7).alias("is_full_return")))


@q("f32_synthetic_inventory_levels", None)  # xxhash64-derived — rows-only
def f32_synthetic_inventory_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F32: hash-derived synthetic stock levels (reference
    ``etl_ods_loader.py:814-817``). Rows-only; shape asserted in tests/."""
    from walmart_project_etl_spark.plans.ods import _hash_int
    p = t(spark, sf_dir, "part").limit(100)
    s = t(spark, sf_dir, "supplier").limit(50)
    grid = F.broadcast(p.select("p_partkey")).crossJoin(
        F.broadcast(s.select("s_suppkey")))
    base = _hash_int(100, "p_partkey", "s_suppkey", F.lit(42)) + 10
    return grid.select("p_partkey", "s_suppkey", base.alias("stock_level"))
