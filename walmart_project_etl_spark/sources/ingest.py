"""Source-CSV ingestion (operators S1/S2 + date parsing F4).

Reference behavior reproduced (``etl_ods_loader.py:173-195``):
- header row, explicit schema (no sampling-based inference pass — one scan,
  deterministic types at any data size),
- empty strings → NULL,
- multi-format date parsing with null-on-failure.

Quoted fields with embedded commas/quotes (product names like
``"...13 1/8""W x 12 1/4""D"``) are handled by the standard CSV quote/escape
options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walmart_project_etl_spark.functions import rules
from walmart_project_etl_spark.schemas import SOURCE_CSV_SCHEMA

# canonical snake_case names for the 25 CSV columns
_RENAME = {
    "City": "city",
    "Customer Age": "customer_age",
    "Customer Name": "customer_name",
    "Customer Segment": "customer_segment",
    "Discount": "discount",
    "Number of Records": "number_of_records",
    "Order Date": "order_date",
    "Order ID": "order_id",
    "Order Priority": "order_priority",
    "Order Quantity": "order_quantity",
    "Product Base Margin": "product_base_margin",
    "Product Category": "product_category",
    "Product Container": "product_container",
    "Product Name": "product_name",
    "Product Sub-Category": "product_sub_category",
    "Profit": "profit",
    "Region": "region",
    "Row ID": "row_id",
    "Sales": "sales",
    "Ship Date": "ship_date_raw",
    "Ship Mode": "ship_mode",
    "Shipping Cost": "shipping_cost",
    "State": "state",
    "Unit Price": "unit_price",
    "Zip Code": "zip_code",
}


def read_source_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1+S2: read the denormalized retail CSV with canonical column names.

    Returns one row per order line with parsed ``order_date`` / ``ship_date``
    DateType columns (F4 multi-format parse, reference
    ``etl_ods_loader.py:208-224``).
    """
    raw = (spark.read
           .option("header", True)
           .option("quote", '"')
           .option("escape", '"')
           .option("nullValue", "")        # S2: '' → NULL (ref :187-195)
           .schema(SOURCE_CSV_SCHEMA)
           .csv(path))
    df = raw.select([F.col(src).alias(dst) for src, dst in _RENAME.items()])
    return (df
            .withColumn("order_date", rules.parse_date_multi(F.col("order_date")))
            .withColumn("ship_date", rules.parse_date_multi(F.col("ship_date_raw")))
            .drop("ship_date_raw"))


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-Lines scan with a DECLARED schema — the dominant LLM-corpus
    interchange format (one JSON object per line).

    The explicit schema matters at scale twice over: it skips Spark's
    sampling inference pass (a full extra scan of a 100 TB corpus), and it
    keeps column pruning + predicate pushdown available to Catalyst (the
    Jackson parser only materializes requested fields). Corrupt lines land
    in the standard ``_corrupt_record`` handling (PERMISSIVE default)
    instead of failing the scan.
    """
    return spark.read.schema(schema).json(path)


def read_jsonl_quarantine(spark: SparkSession, path: str,
                          schema) -> tuple[DataFrame, DataFrame]:
    """JSON-Lines scan that SPLITS malformed lines into a quarantine
    frame instead of silently nulling them: returns ``(good, bad)``.

    ``good`` has exactly ``schema``'s columns; ``bad`` is one
    ``raw string`` column holding each unparseable line verbatim — the
    dead-letter feed an ingest pipeline writes aside for replay/alerting
    rather than dropping (a 100 TB crawl ALWAYS contains breakage, and a
    silent null row poisons every downstream non-null count).

    Mechanics: one TEXT scan + ``from_json`` with an in-struct corrupt
    column. Not the native JSON reader: (a) Spark refuses queries whose
    referenced columns are only the corrupt column, and (b) the native
    PERMISSIVE mode *partially* recovers prefix-parseable broken lines
    (fields before the break parse, corrupt still set), which would make
    a nullness-based split misclassify them — ``from_json`` is all-or-
    nothing per line, exactly the quarantine contract. The good branch
    gives up Jackson column pruning; use :func:`read_jsonl` on corpora
    already known-clean.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    assert isinstance(schema, StructType)
    corrupt = "_corrupt_record"
    # build a NEW StructType — StructType.add mutates the receiver in
    # place, which would silently grow the caller's schema object
    with_corrupt = StructType(list(schema.fields)
                              + [StructField(corrupt, StringType())])
    parsed = (spark.read.text(path)
              .select(F.col("value"),
                      F.from_json("value", with_corrupt,
                                  {"mode": "PERMISSIVE",
                                   "columnNameOfCorruptRecord": corrupt})
                       .alias("__j")))
    good = (parsed.where(F.col(f"__j.{corrupt}").isNull())
            .select([F.col(f"__j.{f.name}").alias(f.name)
                     for f in schema.fields]))
    bad = (parsed.where(F.col(f"__j.{corrupt}").isNotNull())
           .select(F.col("value").alias("raw")))
    return good, bad


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """JSON-Lines sink (one object per line, partition-parallel).

    ``compression='gzip'|'zstd'`` for interchange with external tokenizer /
    curation tooling; None writes plain text. Timestamps serialize ISO-8601,
    so a read_jsonl round-trip with the same schema is lossless for the
    scalar types the corpus tables use.
    """
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
