"""walmart_project_etl_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark (DataFrame / Spark SQL) engine with the query and
data-processing capabilities of the reference retail-DW ETL pipeline
(Rojaneverest/walmart-project-etl): three-layer ODS → Staging → Target star
schema, deterministic hash keys, ~25 derived-column business rules, window
dedup, SCD Type 1 merges, SCD Type 2 dimensions, and multi-way fact loads with
temporal (interval) surrogate-key resolution — plus the large-scale
training-data-pipeline surface (dedup, similarity search, text analysis,
multimodal plumbing, streaming) the reference lacks.

Everything is DataFrame → DataFrame: Catalyst plans the physical execution;
no RDDs in the hot path, no row-at-a-time Python UDFs.
"""

__version__ = "0.1.0"

from walmart_project_etl_spark.session import get_spark  # noqa: F401
