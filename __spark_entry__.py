"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship multiway star join at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the LLM-pipeline surface, backed by
``walmart_project_etl_spark.queries`` (one module per domain:
core relational ops, scalar rules, reference-CSV pipeline, LLM ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from walmart_project_etl_spark.queries import registry

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the J8 multiway star join —
    revenue by region × order priority across 7 tables."""
    from walmart_project_etl_spark.queries.core import QUERIES
    fn, _ = QUERIES["j08_multiway_fact_join"]
    return fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM surface).

    Each callable takes (spark, sf_dir) and returns a DataFrame; every
    computed column is aliased identically to its oracle twin.
    """
    return {name: fn for name, (fn, _oracle) in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for operators whose output
    depends on engine-internal xxhash64 — driver records rows-only)."""
    return {name: oracle for name, (_fn, oracle) in registry().items()
            if oracle is not None}
