"""CSV → ODS layer (9 DataFrames). Spark re-expression of reference
``etl_ods_loader.py`` (§3.2 of SURVEY.md).

Every reference per-row loop becomes a declarative transform:

- customer "most common location" → groupBy + count + row_number (A1 mode);
- the read-back ``{natural_key → id}`` dicts (reference :482-524) disappear —
  keys are recomputed in-plan with the same deterministic MD5 expressions;
- synthetic returns/inventory randomness: the reference uses process-seeded
  ``random``/``hash()`` (non-reproducible across runs, reference :339-343,
  :693-742); we derive every draw from ``xxhash64`` of the row's business key
  + an injected seed, so output is bit-stable regardless of partitioning,
  cluster size, or rerun. Documented deviation: draws differ from the
  reference's (theirs differ run-to-run anyway).

Scale notes: all dimension builds are groupBy/distinct over the source
(shuffle on the natural key — unavoidable and minimal); the sales fact is a
narrow map over the source plus broadcast-joined membership checks; inventory
is a bounded cross join (30 dates × ≤100 products × ≤50 stores, reference
:785-805) built from three tiny broadcast frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from walmart_project_etl_spark.functions import keys, rules

SOURCE_CSV = "CSV Import"
SOURCE_GEN = "Generated"


def _stamp(df: DataFrame, source: str, load_ts) -> DataFrame:
    return (df.withColumn("source_system", F.lit(source))
              .withColumn("load_timestamp", load_ts))


def _hash_unit(*cols) -> "F.Column":
    """Deterministic uniform-ish draw in [0,1) from business-key columns.

    Replaces ``random.random()`` (reference ``etl_ods_loader.py:693``) with a
    partitioning-independent, rerun-stable draw: xxhash64 → pmod → scale.
    """
    return (F.pmod(F.xxhash64(*cols), F.lit(1_000_000)) / 1_000_000.0)


def _hash_int(n, *cols) -> "F.Column":
    """Deterministic draw in [0, n) (replaces ``random.randint``/``% n``)."""
    return F.pmod(F.xxhash64(*cols), F.lit(n)).cast("int")


def build_dates(source: DataFrame, load_ts) -> DataFrame:
    """ods_date: union+distinct of order/ship dates with derived parts
    (reference ``etl_ods_loader.py:197-252``; operators U1, P2, F2, F3)."""
    dates = (source.select(F.col("order_date").alias("full_date"))
             .unionAll(source.select(F.col("ship_date").alias("full_date")))
             .where(F.col("full_date").isNotNull())
             .distinct())
    parts = rules.date_parts("full_date")
    out = dates.select(
        keys.date_int_id("full_date").alias("date_id"),
        "full_date",
        *[expr.alias(name) for name, expr in parts.items()],
        F.lit(False).alias("is_holiday"),
    )
    return _stamp(out, SOURCE_CSV, load_ts)


def build_customers(source: DataFrame, load_ts) -> DataFrame:
    """ods_customer: one row per customer name with their *most frequent*
    location (reference ``etl_ods_loader.py:254-304``; operator A1 mode).

    Mode tie-break is pinned to (count desc, city asc, ...) — pandas
    ``value_counts().index[0]`` tie order is first-seen; deterministic
    alphabetical pin is a documented deviation. ``first(age/segment)`` is
    pinned to lowest row_id (file order in the reference).
    """
    loc_counts = (source
                  .groupBy("customer_name", "city", "state", "zip_code", "region")
                  .agg(F.count(F.lit(1)).alias("cnt")))
    w = (Window.partitionBy("customer_name")
         .orderBy(F.desc("cnt"), F.asc("city"), F.asc("state"),
                  F.asc("zip_code"), F.asc("region")))
    primary_loc = (loc_counts
                   .withColumn("rn", F.row_number().over(w))
                   .where(F.col("rn") == 1)
                   .drop("rn", "cnt"))
    firsts = (source
              .groupBy("customer_name")
              .agg(F.min_by("customer_age", "row_id").alias("customer_age"),
                   F.min_by("customer_segment", "row_id").alias("customer_segment")))
    out = (primary_loc.join(firsts, "customer_name")
           .select(keys.customer_id("customer_name").alias("customer_id"),
                   "customer_name", "customer_age", "customer_segment",
                   "city", "state", "zip_code", "region"))
    return _stamp(out, SOURCE_CSV, load_ts)


def build_suppliers(source: DataFrame, load_ts) -> DataFrame:
    """ods_supplier: synthesized — one "Main Suppliers Inc." per category plus
    one "Specialized Suppliers" per sub-category (reference
    ``etl_ods_loader.py:307-396``).

    Contact fields use a stable hash instead of Python ``hash()`` (F30
    deviation — the reference's values change across interpreter runs).
    """
    cats = (source.select(F.col("product_category").alias("k")).distinct()
            .withColumn("supplier_name", F.concat(F.col("k"), F.lit(" Main Suppliers Inc.")))
            .withColumn("contact_person", F.concat(F.lit("Main Contact for "), F.col("k")))
            .withColumn("address_suffix", F.lit("Main St")))
    subcats = (source.select(F.col("product_sub_category").alias("k")).distinct()
               .withColumn("supplier_name", F.concat(F.col("k"), F.lit(" Specialized Suppliers")))
               .withColumn("contact_person", F.concat(F.lit("Specialized Contact for "), F.col("k")))
               .withColumn("address_suffix", F.lit("Specialty Ave")))
    sup = cats.unionByName(subcats)
    email_local = F.regexp_replace(F.lower(F.col("k")), " ", "")
    out = sup.select(
        keys.supplier_id("supplier_name").alias("supplier_id"),
        "supplier_name",
        "contact_person",
        F.concat(F.lit("contact@"), email_local, F.lit("suppliers.com")).alias("email"),
        F.format_string("555-%04d", _hash_int(10000, F.col("k"))).alias("phone"),
        F.concat(_hash_int(1000, F.col("k")).cast("string"), F.lit(" "),
                 F.col("address_suffix")).alias("address"),
        F.lit("Supplier City").alias("city"),
        F.lit("SC").alias("state"),
        (F.lit(10000) + _hash_int(90000, F.col("k"))).cast("string").alias("zip_code"),
        F.lit("USA").alias("country"),
        rules.supplier_type_from_name("supplier_name").alias("supplier_type"),
    )
    return _stamp(out, SOURCE_GEN, load_ts)


def build_products(source: DataFrame, load_ts) -> DataFrame:
    """ods_product: distinct 6-col projection; each product deterministically
    assigned a supplier from its category's pool (reference
    ``etl_ods_loader.py:398-449``; pick at :424-426 is
    ``int(md5(name),16) % len(pool)`` — we use a stable 64-bit hash mod pool
    size, same shape, documented deviation).

    Pool = [category main supplier] + [specialized suppliers of the
    category's sub-categories], ordered main-first then subcategory name.
    """
    # supplier pool per category, as arrays (tiny — broadcast join)
    cat_sub = (source.select("product_category", "product_sub_category").distinct())
    main = (cat_sub.select("product_category").distinct()
            .withColumn("pool_main", keys.supplier_id(
                F.concat(F.col("product_category"), F.lit(" Main Suppliers Inc.")))))
    spec = (cat_sub
            .groupBy("product_category")
            .agg(F.array_sort(F.collect_list(F.struct("product_sub_category"))).alias("subs")))
    pools = (main.join(spec, "product_category", "left")
             .select("product_category",
                     F.concat(
                         F.array(F.col("pool_main")),
                         F.transform(
                             F.col("subs"),
                             lambda s: keys.supplier_id(F.concat(
                                 s["product_sub_category"],
                                 F.lit(" Specialized Suppliers"))))
                     ).alias("pool")))
    products = (source.select("product_name", "product_category", "product_sub_category",
                              "product_container", "product_base_margin", "unit_price")
                .distinct())
    out = (products.join(F.broadcast(pools), "product_category")
           .select(
               keys.product_id("product_name").alias("product_id"),
               "product_name", "product_category", "product_sub_category",
               "product_container",
               F.col("product_base_margin").cast("double").alias("product_base_margin"),
               F.col("unit_price").cast("decimal(10,2)").alias("unit_price"),
               F.element_at(
                   F.col("pool"),
                   (F.pmod(F.xxhash64("product_name"), F.size("pool")) + 1).cast("int")
               ).alias("supplier_id")))
    return _stamp(out, SOURCE_CSV, load_ts)


def build_stores(source: DataFrame, load_ts) -> DataFrame:
    """ods_store: distinct (city,state,zip,region); id hashes the *city only*
    (reference ``etl_ods_loader.py:451-480``, :152-161) — so one city with two
    zip codes produces duplicate store_ids, preserved here as in ODS."""
    stores = source.select("city", "state", "zip_code", "region").distinct()
    out = stores.select(
        keys.store_id("city").alias("store_id"),
        F.concat(F.col("city"), F.lit(" Store")).alias("store_name"),
        F.concat_ws(", ", "city", "state").alias("location"),
        "city", "state", "zip_code", "region",
    )
    return _stamp(out, SOURCE_CSV, load_ts)


# 10 fixed rows, reference etl_ods_loader.py:623-634
RETURN_REASONS = [
    ("DEFECTIVE", "Product is defective or damaged", "Quality Issue"),
    ("WRONG_ITEM", "Wrong item was received", "Order Error"),
    ("SIZE_FIT", "Size or fit issue", "Customer Preference"),
    ("PERFORMANCE", "Product did not perform as expected", "Quality Issue"),
    ("LATE_DELIVERY", "Delivery was too late", "Shipping Issue"),
    ("CHANGED_MIND", "Customer changed their mind", "Customer Preference"),
    ("BETTER_PRICE", "Found better price elsewhere", "Price Issue"),
    ("MISSING_PARTS", "Product missing parts", "Quality Issue"),
    ("NOT_AS_DESCRIBED", "Product not as described", "Product Description"),
    ("ACCIDENTAL_ORDER", "Order was placed accidentally", "Order Error"),
]


def build_return_reasons(spark: SparkSession, load_ts) -> DataFrame:
    """ods_return_reason: the 10 seed rows; stored code is the RET_ hash of the
    natural code (reference ``etl_ods_loader.py:617-658``)."""
    df = spark.createDataFrame(RETURN_REASONS,
                               "code string, reason_description string, category string")
    out = df.select(keys.reason_id("code").alias("reason_code"),
                    "reason_description", "category")
    return _stamp(out, SOURCE_GEN, load_ts)


def build_sales(source: DataFrame, dates: DataFrame, load_ts) -> DataFrame:
    """ods_sales: one row per CSV line with hash keys resolved in-plan
    (reference ``etl_ods_loader.py:526-615``).

    The reference's dict probes (J2) are the MD5 expressions themselves here —
    by construction every customer/product/store lookup succeeds (dims derive
    from the same source), so no join is needed for them. The date-membership
    filter (P4) is kept as a left-semi join against the date dim on BOTH
    transaction and ship date (broadcast — date dim is tiny).
    """
    valid = (source
             .where(F.col("order_date").isNotNull() & F.col("ship_date").isNotNull()))
    date_keys = dates.select("full_date")
    valid = (valid
             .join(F.broadcast(date_keys.withColumnRenamed("full_date", "order_date")),
                   "order_date", "left_semi")
             .join(F.broadcast(date_keys.withColumnRenamed("full_date", "ship_date")),
                   "ship_date", "left_semi"))
    out = valid.select(
        keys.sale_id("order_id", "row_id").alias("sale_id"),
        F.col("order_id").cast("string").alias("order_id"),
        F.col("row_id").cast("int").alias("row_id"),
        F.col("order_date").alias("transaction_date"),
        keys.product_id("product_name").alias("product_id"),
        keys.store_id("city").alias("store_id"),
        keys.customer_id("customer_name").alias("customer_id"),
        "order_priority",
        F.col("order_quantity").cast("int").alias("order_quantity"),
        F.col("sales").cast("decimal(12,2)").alias("sales_amount"),
        F.col("discount").cast("double").alias("discount"),
        F.col("profit").cast("decimal(12,2)").alias("profit"),
        F.col("shipping_cost").cast("decimal(10,2)").alias("shipping_cost"),
        "ship_date",
        "ship_mode",
        F.col("city").alias("transaction_city"),
        F.col("state").alias("transaction_state"),
        F.col("zip_code").alias("transaction_zip"),
        F.col("product_base_margin").cast("double").alias("product_base_margin"),
    )
    return _stamp(out, SOURCE_CSV, load_ts)


def build_returns(sales: DataFrame, dates: DataFrame, reasons: DataFrame,
                  load_ts, run_date: str, seed: int = 42) -> DataFrame:
    """ods_returns: synthetic ~10% of the latest 5,000 sales, return date =
    sale date + 1..14 days (first such date present in the date dim and not
    after ``run_date``), 70% full / 30% partial (reference
    ``etl_ods_loader.py:660-756``; operator O1 top-k feeds it).

    All draws are xxhash64(sale_id, seed)-derived → deterministic at any
    parallelism (F31 deviation from process-seeded ``random``).
    """
    latest = (sales
              .orderBy(F.desc("transaction_date"), F.asc("sale_id"))
              .limit(5000))
    sampled = latest.where(_hash_unit("sale_id", F.lit(seed)) <= 0.1)

    # candidate return dates: explode 1..14 day offsets, keep dates in the dim
    # and not in the future, take the earliest offset per sale
    cand = (sampled
            .withColumn("days", F.explode(F.sequence(F.lit(1), F.lit(14))))
            .withColumn("cand_date", F.date_add(F.col("transaction_date"), F.col("days")))
            .where(F.col("cand_date") <= F.lit(run_date).cast("date"))
            .join(F.broadcast(dates.select(F.col("full_date").alias("cand_date"))),
                  "cand_date", "left_semi"))
    w = Window.partitionBy("sale_id").orderBy("days")
    picked = (cand.withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") == 1).drop("rn", "days"))

    reason_pool = F.broadcast(
        reasons.select(F.col("reason_code"))
        .withColumn("reason_idx",
                    F.row_number().over(Window.orderBy("reason_code")) - 1))
    n_reasons = 10  # fixed seed list size
    picked = (picked
              .withColumn("reason_idx", _hash_int(n_reasons, "sale_id", F.lit(seed + 1)))
              .join(reason_pool, "reason_idx")
              .drop("reason_idx"))

    is_full = _hash_unit("sale_id", F.lit(seed + 2)) <= 0.7
    qty_ret = F.when(is_full, F.col("order_quantity")).otherwise(
        _hash_int(1_000_000, "sale_id", F.lit(seed + 3)) % F.greatest(F.col("order_quantity"), F.lit(1)) + 1)
    out = picked.select(
        keys.return_id("sale_id", F.date_format("cand_date", "yyyy-MM-dd")).alias("return_id"),
        F.col("cand_date").alias("return_date"),
        "product_id", "store_id", "reason_code",
        F.when(is_full, F.col("sales_amount"))
         .otherwise((F.col("sales_amount") * qty_ret / F.col("order_quantity")))
         .cast("decimal(12,2)").alias("return_amount"),
        qty_ret.cast("int").alias("quantity_returned"),
        F.col("sale_id").alias("original_sale_id"),
        F.col("transaction_date").alias("original_sale_date"),
        F.element_at(F.array(F.lit("New"), F.lit("Used"), F.lit("Damaged")),
                     _hash_int(3, "sale_id", F.lit(seed + 4)) + 1).alias("return_condition"),
    )
    return _stamp(out, SOURCE_GEN, load_ts)


def build_inventory(products: DataFrame, stores: DataFrame, dates: DataFrame,
                    load_ts, seed: int = 42,
                    max_dates: int = 30, max_products: int = 100,
                    max_stores: int = 50) -> DataFrame:
    """ods_inventory: bounded cross join of the 30 newest dim dates × ≤100
    products × ≤50 stores with hash-derived stock levels (reference
    ``etl_ods_loader.py:758-861``).

    Product/store subsetting is by sorted-id prefix instead of
    ``random.sample`` (deterministic; deviation documented). Stock-level
    formula keeps the reference's *shape* (base % 100 + 10, ±10 daily
    variation) with xxhash64 instead of 128-bit md5 arithmetic.
    """
    sel_dates = (dates.select("date_id", "full_date")
                 .orderBy(F.desc("full_date")).limit(max_dates))
    # last_restock_date = previous (earlier) date in the selected window
    sel_dates = sel_dates.withColumn(
        "last_restock_date",
        F.coalesce(F.lead("full_date").over(Window.orderBy(F.desc("full_date"))),
                   F.col("full_date")))
    sel_products = (products.select("product_id").distinct()
                    .orderBy("product_id").limit(max_products))
    sel_stores = (stores.select("store_id").distinct()
                  .orderBy("store_id").limit(max_stores))

    grid = (F.broadcast(sel_dates)
            .crossJoin(F.broadcast(sel_products))
            .crossJoin(F.broadcast(sel_stores)))
    base = _hash_int(100, "product_id", "store_id", F.lit(seed)) + 10
    variation = _hash_int(20, "product_id", "store_id", "full_date", F.lit(seed)) - 10
    level = F.greatest(F.lit(0), base + variation)
    out = grid.select(
        keys.inventory_id("product_id", "store_id",
                          F.date_format("full_date", "yyyy-MM-dd")).alias("inventory_id"),
        F.col("full_date").alias("inventory_date"),
        "product_id", "store_id",
        level.cast("int").alias("stock_level"),
        F.greatest(F.lit(5), level - (_hash_int(16, "product_id", "store_id", F.lit(seed + 1)) + 5))
         .cast("int").alias("min_stock_level"),
        (level + _hash_int(31, "product_id", "store_id", F.lit(seed + 2)) + 20)
         .cast("int").alias("max_stock_level"),
        (_hash_int(21, "product_id", "store_id", F.lit(seed + 3)) + 5)
         .cast("int").alias("reorder_point"),
        "last_restock_date",
    )
    return _stamp(out, SOURCE_GEN, load_ts)


def build_ods(spark: SparkSession, source: DataFrame,
              run_date: str, seed: int = 42) -> dict[str, DataFrame]:
    """Full CSV → ODS plan (reference entry point ``etl_ods_loader.main``,
    :1022-1041). ``run_date`` replaces ``datetime.now()`` for determinism."""
    load_ts = F.lit(run_date).cast("timestamp")
    dates = build_dates(source, load_ts)
    customers = build_customers(source, load_ts)
    suppliers = build_suppliers(source, load_ts)
    products = build_products(source, load_ts)
    stores = build_stores(source, load_ts)
    reasons = build_return_reasons(spark, load_ts)
    sales = build_sales(source, dates, load_ts)
    returns = build_returns(sales, dates, reasons, load_ts, run_date, seed)
    inventory = build_inventory(products, stores, dates, load_ts, seed)
    return {
        "ods_date": dates,
        "ods_customer": customers,
        "ods_supplier": suppliers,
        "ods_product": products,
        "ods_store": stores,
        "ods_return_reason": reasons,
        "ods_sales": sales,
        "ods_returns": returns,
        "ods_inventory": inventory,
    }
