"""Explicit StructType schemas for all 27 engine tables (ODS / STG / TGT).

Mirrors the reference's SQLAlchemy declarations (``etl_ods_tables.py:51-220``,
``etl_staging_tables.py:48-231``, ``etl_target_tables.py:51-244``) with the
type mapping from SURVEY.md §1.2: Integer→int, String(n)→string, Float→double,
Numeric(p,s)→decimal(p,s), Date→date, DateTime→timestamp, Boolean→boolean.

A deliberate quirk preserved from the reference: ``ods_customer.customer_age``
is *string* (dirty data modeled as text, ``etl_ods_tables.py:76``) and is cast
to int only in staging.
"""

from __future__ import annotations

from pyspark.sql.types import (BooleanType, DataType, DateType, DecimalType,
                               DoubleType, IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

_TYPES: dict[str, DataType] = {
    "int": IntegerType(),
    "long": LongType(),
    "string": StringType(),
    "double": DoubleType(),
    "dec12": DecimalType(12, 2),
    "dec10": DecimalType(10, 2),
    "date": DateType(),
    "ts": TimestampType(),
    "bool": BooleanType(),
}


def _schema(spec: str) -> StructType:
    """Build a StructType from ``name:type`` space-separated spec."""
    fields = []
    for item in spec.split():
        name, typ = item.split(":")
        fields.append(StructField(name, _TYPES[typ], nullable=True))
    return StructType(fields)


_AUDIT_ODS = "source_system:string load_timestamp:ts"
_AUDIT_STG = "etl_batch_id:string etl_timestamp:ts"
_AUDIT_TGT = "insertion_date:ts modification_date:ts"

# ------------------------------------------------------------------ ODS layer
# reference etl_ods_tables.py:51-220 — no PK/FK constraints; duplicates kept.

ODS_SCHEMAS: dict[str, StructType] = {
    "ods_date": _schema(
        "date_id:int full_date:date day_of_week:string day_of_month:int month:int "
        f"month_name:string quarter:int year:int is_holiday:bool {_AUDIT_ODS}"),
    "ods_customer": _schema(
        "customer_id:string customer_name:string customer_age:string customer_segment:string "
        f"city:string state:string zip_code:string region:string {_AUDIT_ODS}"),
    "ods_supplier": _schema(
        "supplier_id:string supplier_name:string contact_person:string email:string "
        "phone:string address:string city:string state:string zip_code:string "
        f"country:string supplier_type:string {_AUDIT_ODS}"),
    "ods_product": _schema(
        "product_id:string product_name:string product_category:string "
        "product_sub_category:string product_container:string product_base_margin:double "
        f"unit_price:dec10 supplier_id:string {_AUDIT_ODS}"),
    "ods_store": _schema(
        "store_id:string store_name:string location:string city:string state:string "
        f"zip_code:string region:string {_AUDIT_ODS}"),
    "ods_return_reason": _schema(
        f"reason_code:string reason_description:string category:string {_AUDIT_ODS}"),
    "ods_sales": _schema(
        "sale_id:string order_id:string row_id:int transaction_date:date product_id:string "
        "store_id:string customer_id:string order_priority:string order_quantity:int "
        "sales_amount:dec12 discount:double profit:dec12 shipping_cost:dec10 ship_date:date "
        "ship_mode:string transaction_city:string transaction_state:string "
        f"transaction_zip:string product_base_margin:double {_AUDIT_ODS}"),
    "ods_inventory": _schema(
        "inventory_id:string inventory_date:date product_id:string store_id:string "
        "stock_level:int min_stock_level:int max_stock_level:int reorder_point:int "
        f"last_restock_date:date {_AUDIT_ODS}"),
    "ods_returns": _schema(
        "return_id:string return_date:date product_id:string store_id:string "
        "reason_code:string return_amount:dec12 quantity_returned:int original_sale_id:string "
        f"original_sale_date:date return_condition:string {_AUDIT_ODS}"),
}

# -------------------------------------------------------------- Staging layer
# reference etl_staging_tables.py:48-231 — surrogate *_key + ETL audit columns.

STG_SCHEMAS: dict[str, StructType] = {
    "stg_date": _schema(
        "date_key:long date_id:int full_date:date day_of_week:string day_of_month:int "
        "month:int month_name:string quarter:int year:int is_weekend:bool is_holiday:bool "
        f"fiscal_year:int fiscal_quarter:int {_AUDIT_STG}"),
    "stg_customer": _schema(
        "customer_key:long customer_id:string customer_name:string customer_age:int "
        "age_group:string customer_segment:string city:string state:string zip_code:string "
        f"region:string {_AUDIT_STG}"),
    "stg_supplier": _schema(
        "supplier_key:long supplier_id:string supplier_name:string contact_person:string "
        "email:string phone:string address:string city:string state:string zip_code:string "
        f"country:string supplier_type:string {_AUDIT_STG}"),
    "stg_product": _schema(
        "product_key:long product_id:string product_name:string product_category:string "
        "product_sub_category:string product_container:string unit_price:dec10 "
        "price_tier:string product_base_margin:double margin_percentage:double "
        f"is_high_margin:bool supplier_id:string supplier_name:string {_AUDIT_STG}"),
    "stg_store": _schema(
        "store_key:long store_id:string store_name:string location:string city:string "
        f"state:string zip_code:string region:string market:string {_AUDIT_STG}"),
    "stg_return_reason": _schema(
        "reason_key:long reason_code:string reason_description:string reason_category:string "
        f"impact_level:string is_controllable:bool {_AUDIT_STG}"),
    "stg_sales": _schema(
        "sales_key:long sale_id:string order_id:string row_id:int transaction_date_key:long "
        "product_key:long store_key:long customer_key:long order_priority:string "
        "order_quantity:int sales_amount:dec12 discount:double discount_amount:dec10 "
        "shipping_cost:dec10 gross_revenue:dec12 net_revenue:dec12 profit:dec12 "
        f"profit_margin:double is_profitable:bool ship_date_key:long ship_mode:string {_AUDIT_STG}"),
    "stg_inventory": _schema(
        "inventory_key:long inventory_id:string date_key:long product_key:long store_key:long "
        "stock_level:int min_stock_level:int max_stock_level:int reorder_point:int "
        "last_restock_date_key:long days_of_supply:int stock_status:string "
        f"is_in_stock:bool {_AUDIT_STG}"),
    "stg_returns": _schema(
        "return_key:long return_id:string return_date_key:long product_key:long store_key:long "
        "reason_key:long reason_code:string return_amount:dec12 quantity_returned:int "
        "avg_return_price:dec10 original_sale_id:string original_sale_date_key:long "
        f"days_since_sale:int is_within_30_days:bool return_condition:string {_AUDIT_STG}"),
}

# --------------------------------------------------------------- Target layer
# reference etl_target_tables.py:51-244 — star schema; product/store are SCD2.

_SCD2_COLS = "effective_date:date expiry_date:date is_current:bool version:int"

TGT_SCHEMAS: dict[str, StructType] = {
    "tgt_dim_date": _schema(
        "date_key:long date_id:int full_date:date day_of_week:string day_of_month:int "
        "month:int month_name:string quarter:int year:int is_weekend:bool is_holiday:bool "
        f"fiscal_year:int fiscal_quarter:int {_AUDIT_TGT}"),
    "tgt_dim_customer": _schema(
        "customer_key:long customer_id:string customer_name:string customer_age:int "
        "age_group:string customer_segment:string city:string state:string zip_code:string "
        f"region:string {_AUDIT_TGT}"),
    "tgt_dim_supplier": _schema(
        "supplier_key:long supplier_id:string supplier_name:string supplier_type:string "
        f"contact_name:string contact_phone:string contact_email:string {_AUDIT_TGT}"),
    "tgt_dim_return_reason": _schema(
        "reason_key:long reason_code:string reason_description:string reason_category:string "
        f"impact_level:string is_controllable:bool {_AUDIT_TGT}"),
    "tgt_dim_product": _schema(
        "product_key:long product_id:string product_name:string product_category:string "
        "product_sub_category:string product_container:string unit_price:dec10 "
        "price_tier:string product_base_margin:double margin_percentage:double "
        f"is_high_margin:bool supplier_id:string supplier_name:string {_SCD2_COLS} {_AUDIT_TGT}"),
    "tgt_dim_store": _schema(
        "store_key:long store_id:string store_name:string location:string city:string "
        f"state:string zip_code:string region:string market:string {_SCD2_COLS} {_AUDIT_TGT}"),
    "tgt_fact_sales": _schema(
        "sales_key:long sale_id:string order_id:string transaction_date_key:long "
        "product_key:long store_key:long customer_key:long order_priority:string "
        "order_quantity:int sales_amount:dec12 discount:double discount_amount:dec10 "
        "shipping_cost:dec10 gross_revenue:dec12 net_revenue:dec12 profit:dec12 "
        f"profit_margin:double is_profitable:bool ship_date_key:long ship_mode:string {_AUDIT_TGT}"),
    "tgt_fact_inventory": _schema(
        "inventory_key:long inventory_id:string date_key:long product_key:long store_key:long "
        "stock_level:int min_stock_level:int max_stock_level:int reorder_point:int "
        "last_restock_date_key:long days_of_supply:int stock_status:string "
        f"is_in_stock:bool {_AUDIT_TGT}"),
    "tgt_fact_returns": _schema(
        "return_key:long return_id:string return_date_key:long product_key:long store_key:long "
        "reason_key:long reason_code:string return_amount:dec12 quantity_returned:int "
        "avg_return_price:dec10 original_sale_id:string original_sale_date_key:long "
        f"days_since_sale:int is_within_30_days:bool return_condition:string {_AUDIT_TGT}"),
}

ALL_SCHEMAS: dict[str, StructType] = {**ODS_SCHEMAS, **STG_SCHEMAS, **TGT_SCHEMAS}

# 25-column source CSV (reference data/walmart_data.csv; FIXTURES.md §1).
# Dates kept as string here — parsed with rules.parse_date_multi (F4);
# Customer Age kept as string (dirty-data-as-text, cast in staging, F7).
SOURCE_CSV_SCHEMA = StructType([
    StructField("City", StringType()),
    StructField("Customer Age", StringType()),
    StructField("Customer Name", StringType()),
    StructField("Customer Segment", StringType()),
    StructField("Discount", DoubleType()),
    StructField("Number of Records", IntegerType()),
    StructField("Order Date", StringType()),
    StructField("Order ID", LongType()),
    StructField("Order Priority", StringType()),
    StructField("Order Quantity", IntegerType()),
    StructField("Product Base Margin", DoubleType()),
    StructField("Product Category", StringType()),
    StructField("Product Container", StringType()),
    StructField("Product Name", StringType()),
    StructField("Product Sub-Category", StringType()),
    StructField("Profit", DoubleType()),
    StructField("Region", StringType()),
    StructField("Row ID", LongType()),
    StructField("Sales", DoubleType()),
    StructField("Ship Date", StringType()),
    StructField("Ship Mode", StringType()),
    StructField("Shipping Cost", DoubleType()),
    StructField("State", StringType()),
    StructField("Unit Price", DoubleType()),
    StructField("Zip Code", StringType()),
])
