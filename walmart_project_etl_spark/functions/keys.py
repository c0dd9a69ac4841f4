"""Deterministic key-generation expressions.

Reproduces the reference's key model (reference ``etl_ods_loader.py:91-170``):
every business key is ``PREFIX_`` + first 14 hex chars of the MD5 of the
natural-key content; composite natural keys are joined with ``_``. The date
dimension key is the ``YYYYMMDD`` integer.

All pure ``Column`` expressions — no UDFs, fully whole-stage-codegen'd, and
(unlike DB auto-increment sequences, reference ``etl_staging_tables.py:54``)
they have no global coordination point, so they scale to any cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_key(prefix: str, *cols: Column | str, sep: str = "_") -> Column:
    """``PREFIX_`` + md5(col1 ``_`` col2 ...)[:14].

    Mirrors reference ``etl_ods_loader.py:95-170`` (single- and composite-key
    variants). Null components become empty strings, matching Python
    ``str(None)``-avoidance in the reference (it never hashes nulls — callers
    filter first; we make the expression total instead).
    """
    parts = [F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"),
                        F.lit("")) for c in cols]
    content = parts[0] if len(parts) == 1 else F.concat_ws(sep, *parts)
    return F.concat(F.lit(prefix + "_"), F.substring(F.md5(content), 1, 14))


def date_int_id(col: Column | str) -> Column:
    """Date → YYYYMMDD int (reference ``etl_ods_loader.py:91-93``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")


def date_id_from_parts(col: Column | str) -> Column:
    """EXTRACT-based reconstruction: year*10000 + month*100 + day
    (reference ``etl_ods_loader.py:929-935``)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")


def customer_id(name: Column | str = "customer_name") -> Column:
    """CUST_ + md5(customer name) (reference ``etl_ods_loader.py:95-105``)."""
    return md5_key("CUST", name)


def product_id(name: Column | str = "product_name") -> Column:
    """PROD_ + md5(product name) (reference ``etl_ods_loader.py:107-114``)."""
    return md5_key("PROD", name)


def supplier_id(name: Column | str = "supplier_name") -> Column:
    """SUPP_ + md5(supplier name) (reference ``etl_ods_loader.py:116-122``)."""
    return md5_key("SUPP", name)


def reason_id(code: Column | str = "reason_code") -> Column:
    """RET_ + md5(reason code) (reference ``etl_ods_loader.py:124-130``)."""
    return md5_key("RET", code)


def store_id(city: Column | str = "city") -> Column:
    """STORE_ + md5(f"{city} Store") — city only!
    (reference ``etl_ods_loader.py:152-161``)."""
    c = F.col(city) if isinstance(city, str) else city
    return F.concat(F.lit("STORE_"),
                    F.substring(F.md5(F.concat(c, F.lit(" Store"))), 1, 14))


def sale_id(order_id: Column | str = "order_id", row_id: Column | str = "row_id") -> Column:
    """SALE_ + md5(order_id_row_id) (reference ``etl_ods_loader.py:163-170``)."""
    return md5_key("SALE", order_id, row_id)


def return_id(sale: Column | str = "sale_id", return_date: Column | str = "return_date") -> Column:
    """RETN_ + md5(sale_id_return_date) (reference ``etl_ods_loader.py:132-140``)."""
    return md5_key("RETN", sale, return_date)


def inventory_id(product: Column | str = "product_id", store: Column | str = "store_id",
                 date: Column | str = "date") -> Column:
    """INV_ + md5(product_store_date) (reference ``etl_ods_loader.py:142-150``)."""
    return md5_key("INV", product, store, date)


def hash_surrogate(*identity: Column | str) -> Column:
    """Deterministic 60-bit surrogate key from the md5 of the identity tuple.

    Replacement for the reference's DB auto-increment surrogate keys
    (``etl_staging_tables.py:54`` etc.) that needs NO global sequence: every
    row derives its key from its own identity columns, so key generation is
    embarrassingly parallel (a ``row_number()`` over a global order — the
    obvious emulation — funnels every row through one task, the exact
    bottleneck that kills a large load). md5 is reproducible in standard SQL
    (DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``), so surrogate
    values stay oracle-checkable; 60 bits keeps the value positive in a
    BIGINT with collision probability ~n²/2⁶¹ — negligible for
    dimension-sized n.

    NULL semantics follow ``concat_ws`` (null components are skipped) in
    both engines; callers whose identity tuples can contain nulls should
    coalesce them to sentinels first.
    """
    parts = [(F.col(c) if isinstance(c, str) else c).cast("string")
             for c in identity]
    return F.conv(F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 15),
                  16, 10).cast("long")
