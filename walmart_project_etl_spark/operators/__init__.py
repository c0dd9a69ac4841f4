"""Reusable engine operators: dedup, SCD1 merge, SCD2, interval join,
similarity search, and text-pipeline operators."""
