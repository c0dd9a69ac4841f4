"""Sources & sinks: CSV ingestion, parquet table catalog, layered storage."""
