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
from pyspark.sql.window import Window


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


def key_skew_profile(df: DataFrame, key_cols: list[str],
                     top_n: int = 10) -> DataFrame:
    """Shuffle-skew diagnostic for a prospective join/groupBy key: the
    ``top_n`` heaviest key values with their share of the table and the
    skew ratio versus a perfectly uniform key.

    This is the profile to run BEFORE keying a 100 TB shuffle — a
    ``skew_ratio`` in the hundreds means the hottest key's partition will
    straggle and the key needs salting (operators/skew.py) or AQE skew
    handling.

    One groupBy on the key (map-side partial agg collapses hot keys
    early — counting a skewed key is cheap even when joining on it is
    not), one single-row global aggregate broadcast back, one top-n
    window over the key-count table (already collapsed to distinct-key
    size). Returns ``(key_value string, cnt, share, cum_share, rank,
    n_keys, skew_ratio)`` — ``skew_ratio`` = cnt / (n_rows / n_keys).
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    counts = df.groupBy(key.alias("key_value")) \
               .agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(F.sum("cnt").alias("__rows"),
                        F.count(F.lit(1)).alias("__keys"))
    # orderBy+limit -> TakeOrderedAndProject: a DISTRIBUTED top-n (each
    # partition keeps n, driver merges n*partitions rows) — never a
    # global sort, even with billions of distinct keys. The rank/cum-share
    # window then runs over just these top_n rows.
    top = counts.orderBy(F.desc("cnt"), F.asc("key_value")).limit(top_n)
    w = Window.orderBy(F.desc("cnt"), F.asc("key_value"))
    ranked = top.withColumn("rank", F.row_number().over(w))
    return (ranked.crossJoin(F.broadcast(totals))
            .select("key_value", "cnt",
                    F.round(F.col("cnt") / F.col("__rows"), 6).alias("share"),
                    F.round(F.sum("cnt").over(
                        w.rowsBetween(Window.unboundedPreceding, 0))
                        / F.col("__rows"), 6).alias("cum_share"),
                    "rank",
                    F.col("__keys").alias("n_keys"),
                    F.round(F.col("cnt") * F.col("__keys") / F.col("__rows"), 6)
                     .alias("skew_ratio")))
