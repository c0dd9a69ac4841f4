"""Numeric cleaning operators for feature / metric columns.

Beyond-reference surface: outlier handling a training-data or analytics
pipeline applies before aggregation. Everything is two-pass DataFrame
composition — no UDFs, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(df: DataFrame, value_col: str,
              group_cols: list[str] | None = None,
              lo: float = 0.01, hi: float = 0.99,
              exact: bool = True,
              out_col: str | None = None) -> DataFrame:
    """Clip ``value_col`` into its per-group [p_lo, p_hi] percentile band
    (winsorization) — the standard heavy-tail guard before means/sums.

    Two passes: (1) percentile bounds per group — one shuffle on the group
    key, output is group-cardinality-sized; (2) broadcast the tiny bounds
    table back onto the fact and clip with ``least/greatest`` — a narrow,
    codegen'd map over the data, no second shuffle.

    ``exact=True`` uses ``percentile`` (exact rank interpolation; buffers a
    group's values in the agg state — right up to groups of ~10⁷ values).
    For larger groups pass ``exact=False`` for ``approx_percentile``
    (constant-memory sketch, rank error ≤ 1/10000) — same plan shape.
    """
    out_col = out_col or f"{value_col}_winsorized"
    v = F.col(value_col)
    if exact:
        bounds = [F.percentile(v, lo).alias("__lo"),
                  F.percentile(v, hi).alias("__hi")]
    else:
        bounds = [F.approx_percentile(v, lo, 10000).alias("__lo"),
                  F.approx_percentile(v, hi, 10000).alias("__hi")]
    if group_cols:
        pct = df.groupBy(*group_cols).agg(*bounds)
        joined = df.join(F.broadcast(pct), group_cols)
    else:
        pct = df.groupBy().agg(*bounds)
        joined = df.crossJoin(F.broadcast(pct))
    return (joined.withColumn(out_col,
                              F.least(F.greatest(v, F.col("__lo")),
                                      F.col("__hi")))
            .drop("__lo", "__hi"))
