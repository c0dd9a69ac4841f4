"""Incremental aggregate maintenance: materialized-view state merge.

Beyond-reference surface; the reference rebuilds every BI aggregate from
the full fact table each run (``etl_bi_loader.py`` re-aggregates all of
sales daily). At 100 TB the nightly delta is ~0.1% of the fact — the
scalable pattern keeps a per-key AGGREGATE STATE table and folds only the
delta in: read delta (delta-sized), aggregate it (delta-sized shuffle),
union with the state (state-sized scan, fact never touched), re-aggregate.

The state columns are chosen to be *mergeable* (count, decimal sum, min,
max — commutative monoids), so folding batches in any order or grouping
gives the same state as one full aggregation; decimal sums keep that
equality bit-exact (float partial sums would drift with batch order).
Finalized metrics (mean etc.) are derived views over the state, never
stored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n", "sum_dec", "min_v", "max_v")


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Build the mergeable per-key state for ``value_col``: exact decimal
    sum, count, min, max. Run once over the initial fact, then only over
    deltas."""
    v = F.col(value_col)
    return (df.groupBy(*keys)
            .agg(F.count(v).alias("n"),
                 F.sum(v.cast("decimal(28,6)")).alias("sum_dec"),
                 F.min(v).alias("min_v"),
                 F.max(v).alias("max_v")))


def merge_agg_state(state: DataFrame, delta_state: DataFrame,
                    keys: list[str]) -> DataFrame:
    """Fold a delta's state into the current state — one union + one
    keyed aggregation over (|state| + |delta keys|) rows; the base fact
    is never rescanned. Associative + commutative: any batch order or
    nesting produces the identical state table."""
    u = state.select(*keys, *STATE_COLS) \
             .unionByName(delta_state.select(*keys, *STATE_COLS))
    return (u.groupBy(*keys)
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_dec").alias("sum_dec"),
                 F.min("min_v").alias("min_v"),
                 F.max("max_v").alias("max_v")))


def finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Derived metrics view over a state table: sum/avg as rounded
    doubles alongside the exact extrema."""
    return state.select(
        *keys, "n",
        F.round(F.col("sum_dec"), 2).cast("double").alias("sum_v"),
        # double-domain division (exact decimal -> one IEEE divide -> one
        # correctly-rounded round): decimal-domain division instead would
        # round HALF_UP at a fixed scale, which engines disagree on
        F.round(F.col("sum_dec").cast("double") / F.col("n"), 6)
         .alias("avg_v"),
        "min_v", "max_v")


def distinct_state(df: DataFrame, keys: list[str], value_col: str,
                   lg_k: int = 12) -> DataFrame:
    """Mergeable per-key DISTINCT-COUNT state: a Datasketches HLL sketch
    (binary) per key. COUNT(DISTINCT) is the one common metric a plain
    (count, sum, min, max) state cannot maintain incrementally — exact
    distinct state would mean storing every seen value. The sketch is
    ~2^lg_k bytes per key with ~1.6%/sqrt(2^lg_k /1024)-ish relative
    error, and sketches union losslessly (union of sketches == sketch of
    the union), so delta folds commute exactly like :func:`agg_state`."""
    return (df.groupBy(*keys)
            .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll")))


def merge_distinct_state(state: DataFrame, delta_state: DataFrame,
                         keys: list[str]) -> DataFrame:
    """Fold delta sketches into the state — union per key, never rescans
    the base."""
    u = state.select(*keys, "hll").unionByName(delta_state.select(*keys, "hll"))
    return u.groupBy(*keys).agg(F.hll_union_agg("hll").alias("hll"))


def finalize_distinct(state: DataFrame, keys: list[str]) -> DataFrame:
    """Estimate view over a distinct-count state."""
    return state.select(*keys,
                        F.hll_sketch_estimate("hll").alias("approx_distinct"))
