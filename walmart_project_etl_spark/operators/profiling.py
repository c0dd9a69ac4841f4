"""Column-profiling operator: per-column null/distinct/range stats.

Beyond-reference surface: the data-quality snapshot a pipeline records
before trusting a new 100 TB drop (the reference's quality gates —
``etl_quality_checks.py`` — hard-code per-table COUNT(*) probes; this is
the generalized one-pass profile).

One job computes every metric for every requested column in a SINGLE
wide aggregate over one scan (Spark evaluates all agg expressions in the
same partial/final pass — profiling k columns costs one table read, not
k), then ``stack`` unpivots the 1×(4k) row into the k-row long form.
No UDFs, no collect; the unpivot is a driver-free narrow map on a single
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile numeric-ish columns: row count, null count, distinct count
    (exact), and min/max cast to double.

    Returns ``(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)``
    with one row per requested column. min/max are doubles (exact for
    integers below 2^53) — strings are deliberately not profiled here
    because cross-engine float→string formatting is not canonical.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.count_distinct(col).alias(f"__nd_{c}"),
            F.min(col).cast("double").alias(f"__mn_{c}"),
            F.max(col).cast("double").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols)
    return one.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as "
        "(col_name, n_nulls, n_distinct, min_val, max_val)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct",
             "min_val", "max_val")
