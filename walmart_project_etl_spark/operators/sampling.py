"""Deterministic sampling operators for training-data curation.

Corpus assembly needs reproducible subsets: stratified samples per
language/source, stable train/val/test splits, and weighted mixtures of
corpora. Random() is the wrong tool on a cluster — resampling on retry,
different rows per partitioning. Everything here derives its "randomness"
from md5 of the row's own key, so any engine (and any rerun, at any
parallelism) selects the identical rows.

Shapes at 100 TB: hash-split and mixture are pure narrow filters (scan
speed, no shuffle). Stratified sampling shuffles once on the stratum key
to rank within strata; strata counts are computed in the same window pass.
For very hot strata (one language = 40% of the corpus) the rank window is
the bottleneck — the documented fallback is a two-pass scan (count per
stratum, then filter on hash < cutoff) which trades exactness of the
fraction for zero shuffle.

Beyond-reference surface: the reference samples with ``ORDER BY
RANDOM()`` (``etl_ods_loader.py:684-695``) — non-reproducible by design;
these operators are its deterministic replacements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_hash(*cols: Column | str) -> Column:
    """Deterministic pseudo-random ranking key: md5 over the row key.

    md5 (not xxhash64) so external engines can reproduce the selection
    bit-for-bit; the cost is visible only at sample time, not in hot paths.
    """
    cs = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
          for c in cols]
    return F.md5(F.concat_ws("|", *cs))


def hash_bucket(*cols: Column | str, buckets: int = 100) -> Column:
    """Uniform bucket in [0, buckets) from the md5 of the row key.

    First 8 hex chars → int (32 bits is plenty for percentage splits).
    Oracle twin: ``('0x' || substr(md5(k), 1, 8))::BIGINT % buckets``.
    """
    return (F.conv(F.substring(rank_hash(*cols), 1, 8), 16, 10)
             .cast("long") % buckets)


def hash_split(df: DataFrame, key: str, splits: dict[str, int],
               salt: str = "") -> DataFrame:
    """Assign each row a stable split label by hash bucket.

    ``splits`` maps label → percentage (must sum to 100), e.g.
    ``{"train": 90, "val": 5, "test": 5}``. Rows move between splits only
    if their key changes — append-only corpora keep historic assignments.
    """
    assert sum(splits.values()) == 100, "split percentages must sum to 100"
    b = hash_bucket(F.concat_ws("#", F.lit(salt), F.col(key).cast("string")))
    expr: Column | None = None
    lo = 0
    for label, pct in splits.items():
        cond = (b >= lo) & (b < lo + pct)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo += pct
    return df.withColumn("split", expr)


def stratified_sample(df: DataFrame, stratum: str, fraction: float,
                      key: str) -> DataFrame:
    """Keep exactly ``ceil(n_s * fraction)`` rows of every stratum.

    Rows are ranked inside each stratum by ``rank_hash(key, text-ish
    columns)`` so the selection is uniform yet reproducible. One shuffle
    on the stratum key; rank and stratum size come from the same window
    exchange.
    """
    rk = rank_hash(F.col(key))
    w = Window.partitionBy(stratum).orderBy(rk, F.col(key))
    cnt = Window.partitionBy(stratum)
    return (df.withColumn("_rn", F.row_number().over(w))
              .withColumn("_n", F.count(F.lit(1)).over(cnt))
              .where(F.col("_rn") <= F.ceil(F.col("_n") * fraction))
              .drop("_rn", "_n"))


def cap_per_group(df: DataFrame, group: str, k: int, key: str) -> DataFrame:
    """Keep at most ``k`` rows per group, selected uniformly-by-hash.

    The per-domain/per-source cap every web-corpus build applies (one host
    must not dominate the training mix). Ranking is ``rank_hash(key)`` with
    the key as tiebreak — deterministic on any engine at any parallelism.
    One shuffle on the group key; AQE's skew splitting does NOT apply to
    window ranks, but the rank is computed with ``WindowGroupLimit``
    pushdown (Spark ≥3.5 prunes rows past k map-side), so a hot domain
    costs one task scanning its rows, not a sort of the whole corpus.
    """
    rk = rank_hash(F.col(key))
    w = Window.partitionBy(group).orderBy(rk, F.col(key))
    return (df.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= k)
              .drop("_rn"))


def weighted_sample_per_group(df: DataFrame, group: str, k: int, key: str,
                              weight: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — the
    Efraimidis–Spirakis one-pass algorithm: each row draws a uniform
    u ∈ (0, 1] from the md5 of its key and ranks by ``ln(u) / weight``
    (the log of u^(1/w)); the top-k ranks per group are an exact weighted
    sample. Fully deterministic (hash-derived u, id tiebreak), one window
    shuffle on the group key, embarrassingly parallel at any corpus size
    — the distributed answer to "sample documents proportional to token
    count / quality weight" that a sequential reservoir cannot give.
    Rows with NULL or non-positive weight are excluded (zero-weight items
    have sample probability 0).
    """
    # u from the first 13 hex digits (52 bits — full double precision),
    # +1 so u is never exactly 0 (ln(0) = -inf)
    u = ((F.conv(F.substring(rank_hash(F.col(key)), 1, 13), 16, 10)
           .cast("double") + 1) / F.lit(float(16 ** 13)))
    es_rank = F.log(u) / F.col(weight).cast("double")
    w = Window.partitionBy(group).orderBy(F.desc(es_rank), F.asc(key))
    return (df.where(F.col(weight).isNotNull() & (F.col(weight) > 0))
              .withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= k)
              .drop("_rn"))


def token_budget_per_group(df: DataFrame, group: str, tokens: str,
                           budget: int, key: str) -> DataFrame:
    """Keep docs per group until the group's cumulative token count reaches
    ``budget`` — the token-denominated mixture primitive (training mixes
    are specified in tokens, not documents; a source of long documents
    must not overshoot its share just because its doc count is low).

    Selection order is ``rank_hash(key)`` (uniform, engine-reproducible);
    a doc is kept iff the running token total BEFORE it is < budget, so
    the boundary doc is included (greedy fill — the mix overshoots by at
    most one document per source, never undershoots a reachable budget).
    One shuffle on the group key; the running sum rides the same window
    exchange as the ordering.
    """
    rk = rank_hash(F.col(key))
    w = (Window.partitionBy(group).orderBy(rk, F.col(key))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_before = F.sum(F.col(tokens)).over(w) - F.col(tokens)
    return (df.withColumn("_cum_before", cum_before)
              .where(F.col("_cum_before") < budget)
              .drop("_cum_before"))


def weighted_mixture(df: DataFrame, source: str, key: str,
                     weights: dict[str, int]) -> DataFrame:
    """Downsample each source to its mixture percentage via hash buckets.

    ``weights`` maps source value → keep-percentage in [0,100]; sources
    absent from the map are dropped. Pure narrow filter — no shuffle, no
    state — so it composes with any upstream scan for free.
    """
    b = hash_bucket(F.col(key))
    keep: Column = F.lit(False)
    for s, pct in weights.items():
        keep = keep | ((F.col(source) == s) & (b < pct))
    return df.where(keep)


def temperature_mixture(df: DataFrame, source: str, tokens: str, key: str,
                        total_budget: int,
                        alpha: float = 0.5) -> DataFrame:
    """Temperature-weighted corpus mixing (the GPT-3/Pile recipe): each
    source's token budget is ``total_budget × n_s^α / Σ n_s^α`` where
    ``n_s`` is the source's token count — ``α < 1`` upweights small
    high-quality sources relative to their raw size, ``α = 1`` is
    proportional, ``α = 0`` is uniform. Docs fill each source's budget
    in hash order via the same greedy window cumsum as
    :func:`token_budget_per_group` (overshoot ≤ 1 doc per source).

    Shape at scale: the per-source totals reduce to a source-count-sized
    table (broadcast), budgets derive in-plan, and the only shuffle is
    the per-source window — identical cost to the fixed-budget mixer.

    Determinism: ``α = 0.5`` (the default) computes ``sqrt(n_s)``,
    which IEEE 754 requires to be CORRECTLY rounded — so the per-source
    budgets (floor of a product of correctly-rounded doubles) are
    bit-identical on any engine, and the oracle can replay the whole
    mix exactly. Other ``α`` go through ``pow`` (1-ulp libm variance:
    budgets could differ by one token unit across engines — fine for
    training mixes, not for exact oracles).
    """
    wcol = (F.sqrt(F.col("__n").cast("double")) if alpha == 0.5
            else F.pow(F.col("__n").cast("double"), F.lit(float(alpha))))
    counts = df.groupBy(source).agg(F.sum(tokens).alias("__n"))
    z = (counts.select(wcol.alias("__w"))
         .agg(F.sum("__w").alias("__z")))
    budgets = (counts.crossJoin(F.broadcast(z))
               .select(source,
                       F.floor(F.lit(float(total_budget)) * wcol
                               / F.col("__z")).alias("__budget")))
    rk = rank_hash(F.col(key))
    w = (Window.partitionBy(source).orderBy(rk, F.col(key))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_before = F.sum(F.col(tokens)).over(w) - F.col(tokens)
    return (df.join(F.broadcast(budgets), source)
              .withColumn("_cum_before", cum_before)
              .where(F.col("_cum_before") < F.col("__budget"))
              .drop("_cum_before", "__budget"))


def assign_shards(df: DataFrame, key: str, n_shards: int) -> DataFrame:
    """Deterministic training-shard layout: every row gets a stable
    ``(shard, shard_pos)`` — shard from an md5 bucket of the key,
    position from the md5 rank WITHIN the shard — so the full training
    order (shard files + intra-shard row order) is a pure function of
    the keys: byte-identical layout from any cluster size, any rerun,
    any input partitioning. That is what makes a training run
    reproducible and resumable mid-epoch after a rebuild.

    One shuffle (the per-shard window); writers follow with
    ``df.repartition(n_shards, "shard")`` + ``sortWithinPartitions
    ("shard_pos")`` to materialize one file per shard in this exact
    order. Hash-ranked order also decorrelates adjacent documents (a
    crawl's natural order groups same-site pages — bad minibatches).
    """
    shard = hash_bucket(F.col(key).cast("string"), buckets=n_shards)
    w = Window.partitionBy("shard").orderBy(rank_hash(F.col(key)
                                                      .cast("string")),
                                            F.col(key))
    return (df.withColumn("shard", shard)
              .withColumn("shard_pos", F.row_number().over(w) - 1))


def contrastive_triplets(df: DataFrame, id_col: str, text_col: str,
                         pool_size: int = 256) -> DataFrame:
    """Mine (anchor, positive, negative) training triplets from a corpus
    with duplicates — the data-prep step for contrastive embedding
    training (SimCSE/E5-style): positives are documents with IDENTICAL
    text (exact-dup groups), negatives are hash-drawn unrelated docs.

    Deterministic end-to-end (md5-derived choices, no RNG — the
    sampling-module convention), so the full triplet set carries an
    exact SQL oracle:

    - positives: within each md5(text) group, each doc pairs with its
      NEXT peer by id (a lead window over the group) — k-sized groups
      yield k−1 CHAINED pairs, linear, never the all-pairs quadratic;
    - negatives: a bounded ``pool_size`` negative pool (the docs with
      the smallest md5(id) — one TakeOrdered, broadcast everywhere),
      indexed by the anchor's own hash modulo the pool; a draw that
      lands in the anchor's OWN dup group is dropped (rare, flagged by
      digest equality) rather than silently kept.

    Scale shape: one md5-group shuffle for positives; the pool is
    metadata-sized at any corpus size and the negative assignment is a
    broadcast equi-join on the pool index. Returns (anchor_id,
    positive_id, negative_id).
    """
    d = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("__dig"))
    w = Window.partitionBy("__dig").orderBy(id_col)
    pos = (d.select("__dig", F.col(id_col).alias("anchor_id"),
                    F.lead(id_col, 1).over(w).alias("positive_id"))
           .where(F.col("positive_id").isNotNull()))
    # bounded negative pool: smallest md5(id) docs, rank = orderBy+limit
    # (TakeOrdered), then a ≤pool_size-row window for the index
    pool = (d.select(F.col(id_col).alias("negative_id"),
                     F.col("__dig").alias("__ndig"),
                     F.md5(F.col(id_col).cast("string")).alias("__h"))
            .orderBy("__h", "negative_id").limit(pool_size))
    pool = pool.select(
        "negative_id", "__ndig",
        (F.row_number().over(Window.orderBy("__h", "negative_id")) - 1)
        .alias("__idx"))
    # % 0 would yield NULL draws and a silently empty result — raise
    # up front. isEmpty is a limit-1 probe, NOT the r14 shape that
    # forced the whole TakeOrdered pool at plan-build time; a
    # non-empty corpus guarantees a non-empty pool, so the modulo
    # below can take the pool size as a LAZY 1-row scalar broadcast
    # (no other plan-build action left).
    if df.isEmpty():
        raise ValueError("contrastive_triplets: empty corpus, no "
                         "negative pool to draw from")
    npool = pool.agg(F.count(F.lit(1)).alias("__np"))
    draw = (F.conv(F.substring(
        F.md5(F.concat(F.lit("neg|"),
                       F.col("anchor_id").cast("string"))), 1, 8),
        16, 10).cast("long") % F.col("__np")).alias("__idx")
    return (pos.crossJoin(F.broadcast(npool))
            .select("__dig", "anchor_id", "positive_id", draw)
            .join(F.broadcast(pool), "__idx")
            .where(F.col("__ndig") != F.col("__dig"))
            .select("anchor_id", "positive_id", "negative_id"))
