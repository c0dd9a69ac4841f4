"""Frequency and cardinality sketches (beyond-reference: the approximate
counting layer a 100 TB pipeline needs where exact GROUP BYs stop fitting).

Count-Min Sketch (Cormode & Muthukrishnan 2005) for heavy-hitter frequency
estimation, and the KMV / bottom-k sketch (Bar-Yossef et al. 2002) for
distinct-count estimation with mergeable per-group state.

Hashing is md5-prefix based on purpose: both Spark (`conv(substr(md5 …)`)
and DuckDB (`('0x' || substr(md5 …))::BIGINT`) reproduce the exact same
60-bit integers, so every sketch here carries an EXACT SQL oracle — the
estimates are deterministic functions of the data, not RNG draws.

Scale shape: CMS state is a bounded depth×width grid regardless of input
size — the groupBy partial-aggregates map-side, so the shuffle carries at
most depth×width rows per task. KMV keeps k hashes per group; merging
partitions' bottom-k is exactly what `collect + array_sort + slice` style
aggregation does, one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 2^60 as double — md5-prefix hashes are 15 hex digits = 60 bits, mapped
#: to (0,1) by dividing by this.
_HASH_SPACE = float(1 << 60)


def _h60(col: Column) -> Column:
    """60-bit integer hash of a string column via md5 prefix — chosen over
    xxhash64 because DuckDB reproduces it bit-for-bit (exact oracles)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# ----------------------------------------------------------- Count-Min Sketch

def cms_sketch(df: DataFrame, item_col: str, depth: int = 4,
               width: int = 1024) -> DataFrame:
    """Build a Count-Min sketch over ``item_col``: ``depth`` independent
    hash rows × ``width`` buckets, cell = count of items hashing there.

    Returns (row, bucket, cnt) — at most depth×width rows TOTAL, whatever
    the input size: the groupBy partial-aggregates map-side, so each task
    ships ≤ depth×width cells into one bounded shuffle. Row-j hashing
    salts the item with ``j:`` so the rows are independent.
    """
    rows = df.select(F.col(item_col).cast("string").alias("__item"),
                     F.explode(F.sequence(
                         F.lit(0), F.lit(depth - 1))).alias("row"))
    bucket = F.pmod(_h60(F.concat_ws(":", F.col("row").cast("string"),
                                     F.col("__item"))), F.lit(width))
    return (rows.select("row", bucket.alias("bucket"))
            .groupBy("row", "bucket").agg(F.count("*").alias("cnt")))


def cms_estimate(sketch: DataFrame, items: DataFrame, item_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-query the sketch for each row of ``items``: the CMS estimate
    is min over rows of the cell count (never under-estimates; over-counts
    by hash collisions, bounded by 2N/width w.p. 1-(1/2)^depth).

    The sketch side is ≤ depth×width rows — broadcast it; the probe is a
    map-side join however many items are queried.
    """
    probes = items.select(
        F.col(item_col),
        F.col(item_col).cast("string").alias("__item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"))
    probes = probes.withColumn(
        "bucket", F.pmod(_h60(F.concat_ws(
            ":", F.col("row").cast("string"), F.col("__item"))),
            F.lit(width)))
    return (probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
            .groupBy(item_col)
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est")))


# --------------------------------------------------------------- KMV sketch

def kmv_distinct(df: DataFrame, item_col: str,
                 group_cols: list[str] | None = None,
                 k: int = 64) -> DataFrame:
    """Distinct-count estimate per group via the k-minimum-values sketch:
    keep the k smallest 60-bit hashes of the distinct items; if fewer than
    k distinct hashes exist the count is exact, else estimate
    (k-1) / r_k where r_k is the k-th smallest hash mapped into (0,1).

    One dedup shuffle on (group, hash) then one bounded top-k window per
    group — the per-group state is k longs, mergeable across partitions
    (union two sketches = re-take the k smallest), which is what makes
    this the scalable twin of exact COUNT(DISTINCT) at 100 TB.

    Returns (group_cols..., kmv_est double, n_kept long).
    """
    gcols = group_cols or []
    hashed = (df.select(*gcols,
                        _h60(F.col(item_col).cast("string")).alias("__h"))
              .dropDuplicates([*gcols, "__h"]))
    if gcols:
        w = Window.partitionBy(*gcols).orderBy("__h")
        kept = hashed.withColumn("__rn", F.row_number().over(w)) \
                     .where(F.col("__rn") <= k)
    else:
        # global sketch: orderBy+limit is TakeOrdered (per-partition
        # bottom-k then a k-row driver merge), never a single-partition
        # exchange of the corpus
        kept = hashed.orderBy("__h").limit(k)
    # max of the kept bottom-k IS the k-th smallest hash when the group
    # has >= k distinct hashes
    agg = kept.groupBy(*gcols).agg(
        F.count("*").alias("n_kept"),
        F.max("__h").alias("__hk"))
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.round((F.lit(float(k - 1)) * F.lit(_HASH_SPACE))
                / F.col("__hk").cast("double"), 4))
    return agg.select(*gcols, est.alias("kmv_est"), "n_kept")


def kmv_hashes(df: DataFrame, item_col: str,
               group_cols: list[str] | None = None,
               k: int = 64) -> DataFrame:
    """The KMV sketch STATE: the k smallest 60-bit item hashes per
    group (the mergeable representation — union two states and re-take
    the bottom k to combine shards/partitions/days). Bottom-k of a
    union is always a subset of the union of bottom-ks, so merging
    loses nothing: estimates from merged state equal a direct sketch
    of the union. Returns (group_cols..., __h)."""
    gcols = group_cols or []
    hashed = (df.select(*gcols,
                        _h60(F.col(item_col).cast("string")).alias("__h"))
              .dropDuplicates([*gcols, "__h"]))
    if gcols:
        w = Window.partitionBy(*gcols).orderBy("__h")
        return (hashed.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= k).drop("__rn"))
    return hashed.orderBy("__h").limit(k)


def kmv_from_hashes(hashes: DataFrame, k: int = 64) -> DataFrame:
    """Finalize a (possibly merged) KMV state into ONE global distinct
    estimate: dedupe, re-take the bottom k, apply (k-1)/r_k. One
    TakeOrdered over the tiny state — never the corpus."""
    kept = hashes.select("__h").dropDuplicates().orderBy("__h").limit(k)
    agg = kept.agg(F.count("*").alias("n_kept"),
                   F.max("__h").alias("__hk"))
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.round((F.lit(float(k - 1)) * F.lit(_HASH_SPACE))
                / F.col("__hk").cast("double"), 4))
    return agg.select(est.alias("kmv_est"), "n_kept")
