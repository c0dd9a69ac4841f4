"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the driver north star:

- **Brute-force cosine top-k** — the exact baseline. One broadcast of the
  query set against a full scan of the corpus; the dot product is a pure
  Column expression (``zip_with`` + ``aggregate``), no UDF, so the scan is
  whole-stage codegen'd. Cost O(N·Q·d) — right up to a few thousand queries
  over billions of rows, since it is one embarrassingly parallel pass.

- **Random-hyperplane LSH (SimHash for vectors)** — the scale path. Each
  vector gets a ``n_planes``-bit signature from the signs of dot products
  with seeded deterministic hyperplanes; banding the signature buckets the
  corpus so candidate generation is a hash join on band values, never
  all-pairs. Recall tunable via (planes, bands); candidates re-ranked by
  exact cosine.

Everything is deterministic: hyperplanes come from a seeded RNG at
plan-build time (literal arrays), so any cluster size/rerun produces
identical buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _parallel_floor(df: DataFrame, key_col: str) -> DataFrame:
    """Raise a small frame's partition count to defaultParallelism
    before a broadcast-crossJoin scoring scan: a one-file corpus reads
    as ONE partition and the N×Q interpreted array-cosines would run on
    a single core (the r12 bench's 60s kmeans row — see kmeans_labels).
    Explicit numPartitions is never AQE-coalesced; a big corpus already
    has ≥ defaultParallelism input splits and skips the shuffle.
    Value-neutral: every consumer scores per-row and re-ranks by
    explicit (score, id) order."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key_col))
    return df


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two numeric arrays (double)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision; 0.0 when either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k: for each query vector, the k nearest corpus vectors by
    cosine (excluding self-matches on id). Ties pinned by corpus id.

    Plan shape: broadcast(queries) × corpus scan → window top-k per query.
    The only shuffle is the per-query top-k (k·Q rows after the window's
    partial rank pushdown at the map side).
    """
    q = F.broadcast(queries.select(
        F.col(query_id_col),
        _as_double(vec_col).alias("__qvec")))
    c = _parallel_floor(
        corpus.select(F.col(id_col), _as_double(vec_col).alias("__cvec")),
        id_col)
    scored = (c.crossJoin(q)
              .where(F.col(id_col) != F.col(query_id_col))
              .select(query_id_col, id_col,
                      F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6)
                       .alias("cosine_sim")))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .select(query_id_col, id_col, "cosine_sim", F.col("__rn").alias("rank")))


def ivf_build(corpus: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", n_clusters: int = 64,
              seed: int = 42) -> tuple[DataFrame, list[list[float]]]:
    """Build the IVF index ONCE: KMeans coarse quantizer + cell-assigned
    corpus. Returns ``(assigned, centroids)`` — persist ``assigned`` as a
    parquet table partitioned/bucketed by ``cell`` and store ``centroids``
    (a tiny plain list) beside it, then serve every future query batch
    with :func:`ivf_query` without refitting or re-assigning. The
    build-once/query-many split is the real serving shape; the one-shot
    :func:`ivf_ann_topk` wrapper exists for self-contained evaluation.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(_as_double(vec_col)).alias("features"))
    km = KMeans(k=n_clusters, seed=seed, initMode="k-means||").fit(train)
    centroids = [[float(x) for x in c] for c in km.clusterCenters()]
    assigned = corpus.select(F.col(id_col), _as_double(vec_col).alias("__cvec"))
    assigned = assigned.withColumn("cell",
                                   _nearest_cell(F.col("__cvec"), centroids))
    return assigned, centroids


def _nearest_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest centroid by squared L2 — literal-centroid arithmetic."""
    def sqdist(c):
        return F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in c]),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, v: acc + v)
    dists = F.array(*[sqdist(c) for c in centroids])
    return F.array_position(dists, F.array_min(dists)).cast("int") - 1


def ivf_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 query_id_col: str = "query_id", n_clusters: int = 64,
                 n_probe: int = 16, seed: int = 42) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus with KMeans,
    probe the ``n_probe`` nearest cells per query, exact cosine re-rank
    within the probed cells.

    Index build is one KMeans fit (sampled at scale) + one assignment
    pass; query cost is |corpus|·(n_probe/n_clusters) exact comparisons —
    the classic FAISS IVF-Flat recipe expressed as DataFrame ops.

    Defaults (64 cells, 16 probes) come from an sf0.01 recall@10 sweep
    against brute-force truth: at a fixed 25% scan fraction, 16/4 →
    0.668, 32/8 → 0.768, 64/16 → 0.832 recall (finer quantization wins
    at equal cost); 32/12 and 64/20 reach 0.88 at 38% scan. Re-run the
    sweep (VERDICT r7 task 5 methodology) before changing them — the
    sim_recall_report golden pins the resulting hit counts. The
    centroid table is tiny and rides along as literals, so cell scoring is
    pure JVM arithmetic; the only shuffle is the per-query top-k window.
    For repeated query batches build the index once with
    :func:`ivf_build` and serve with :func:`ivf_query`.
    """
    assigned, centroids = ivf_build(corpus, id_col, vec_col,
                                    n_clusters, seed)
    return ivf_query(assigned, centroids, queries, k=k, id_col=id_col,
                     vec_col=vec_col, query_id_col=query_id_col,
                     n_probe=n_probe)


def ivf_query(assigned: DataFrame, centroids: list[list[float]],
              queries: DataFrame, k: int = 10, id_col: str = "vec_id",
              vec_col: str = "embedding", query_id_col: str = "query_id",
              n_probe: int = 16) -> DataFrame:
    """Serve a query batch against a prebuilt IVF index
    (:func:`ivf_build` output, or its persisted parquet + centroid list):
    probe each query's ``n_probe`` nearest cells, exact cosine re-rank
    within the probed cells. No KMeans fit, no corpus re-assignment —
    the per-batch cost is |corpus|·(n_probe/n_clusters) comparisons plus
    the per-query top-k window."""

    def top_cells(vec: Column) -> Column:
        """n_probe nearest cell ids, via sort of (dist, cell) structs."""
        def sqdist(c):
            return F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(x) for x in c]),
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, v: acc + v)
        pairs = F.array(*[F.struct(sqdist(c).alias("d"), F.lit(i).alias("cell"))
                          for i, c in enumerate(centroids)])
        return F.slice(F.array_sort(pairs), 1, n_probe).getField("cell")

    c = assigned.select(F.col(id_col), "__cvec", "cell")
    q = queries.select(F.col(query_id_col), _as_double(vec_col).alias("__qvec"))
    q = q.withColumn("cell", F.explode(top_cells(F.col("__qvec"))))

    cand = (q.join(c, "cell")
            .where(F.col(id_col) != F.col(query_id_col))
            .select(query_id_col, id_col,
                    F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6)
                     .alias("cosine_sim")))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .select(query_id_col, id_col, "cosine_sim", F.col("__rn").alias("rank")))


def rh_band_codes(vec: Column, dim: int, n_planes: int, n_bands: int,
                  seed: int = 42) -> Column:
    """Per-band random-hyperplane codes: ``array<int>`` of ``n_bands``
    bucket codes, band b packing the signs of planes
    [b·bpb, (b+1)·bpb) into one integer (bpb = n_planes // n_bands).

    Packing per band (instead of one global signature) lifts the 31-plane
    cap: wide signatures (64–128 planes) are what keep each band's bucket
    space large (2^bpb buckets) so candidate generation stays near-linear
    in corpus size at 100 TB — narrow bands degenerate toward all-pairs.

    Implementation: ONE Arrow-batched pandas UDF doing a vectorized
    ``sign(V · Pᵀ)`` matmul + bit-pack per batch. Wide signatures make
    this the fast path on BOTH axes — a per-plane Column-expression
    variant is O(planes·dim) plan nodes, which AQE re-folds on every
    stage re-optimization (~8 s compile per 64-plane expression at zero
    row cost), while the UDF keeps the plan O(1) and the per-row cost a
    numpy matmul. Deterministic: planes drawn from seeded Python RNG at
    closure build; bit order is MSB-first, self-consistent for the
    equality joins and XOR probes that consume these codes.

    NULL/empty vectors get a NULL code array (NOT the zero-vector code:
    that would hash every null row to the identical all-ones code in
    every band, collapsing them into one bucket per band — a quadratic
    candidate blowup on corpora with many missing embeddings). Consumers
    explode the code array, and exploding NULL emits no rows, so null
    vectors drop out of banding entirely — the correct behaviour, since
    a missing embedding can never be a true near-neighbour.
    """
    import random
    from pyspark.sql.functions import pandas_udf

    assert n_planes % n_bands == 0
    bpb = n_planes // n_bands
    assert bpb <= 31
    planes = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        rng = random.Random(f"{seed}:{p}")  # str seeds hash deterministically
        planes[p] = [rng.uniform(-0.5, 0.5) for _ in range(dim)]
    weights = (1 << np.arange(bpb - 1, -1, -1)).astype(np.int64)

    @pandas_udf("array<int>")
    def codes(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        valid = np.array([v is not None and len(v) == dim for v in vecs])
        out = np.full(len(vecs), None, dtype=object)
        if valid.any():
            V = np.vstack([np.asarray(v, dtype=np.float64)
                           for v, ok in zip(vecs, valid) if ok])
            bits = (V @ planes.T >= 0).astype(np.int64)
            packed = (bits.reshape(len(V), n_bands, bpb) @ weights).astype(np.int32)
            for i, row in zip(np.nonzero(valid)[0], packed):
                out[i] = row
        return pd.Series(out)

    return codes(vec)


def lsh_params_for(corpus_size: int, n_bands: int = 8,
                   min_bits: int = 8) -> tuple[int, int]:
    """Size (n_planes, n_bands) to the corpus: bits-per-band ≈ log2(N).

    Random-pair band collisions number ~L·N²/2^bpb; with 2^bpb ≳ N that
    term is ≤ L·N — candidate generation stays linear in corpus size no
    matter how big N gets (the fixed 8-bit default is near-linear only up
    to N ~ 2^8·constant). Callers at unknown scale should do
    ``lsh_params_for(df.count())`` once per index build — one cheap
    metadata-backed count against a 100 TB parquet table buys a plan that
    cannot blow up. Capped at 31 bits/band (int code space).
    """
    import math
    bpb = min(max(min_bits, math.ceil(math.log2(max(corpus_size, 2)))), 31)
    return bpb * n_bands, n_bands


def lsh_params_for_threshold(threshold: float, n_bands: int = 8,
                             target_recall: float = 0.95) -> tuple[int, int]:
    """Size (n_planes, n_bands) to a cosine THRESHOLD so banding keeps
    recall ≥ ``target_recall`` at that threshold.

    Random-hyperplane collision: a pair at cosine θ agrees on one plane
    with probability p = 1 − arccos(θ)/π, so a bpb-bit band collides with
    p^bpb and recall over L bands is 1 − (1 − p^bpb)^L. The widest band
    (fewest candidates) still meeting the recall target is
    bpb = ⌊ln(1 − (1 − R)^(1/L)) / ln(p)⌋. Low thresholds therefore get
    NARROW bands — the honest trade: recall costs candidates, and the
    caller who asks for barely-correlated pairs pays for them visibly
    instead of silently losing ~40% of true pairs to a wide-band default
    tuned for the near-dup regime. Scale callers should take the MAX of
    this and :func:`lsh_params_for`'s corpus-sized floor, accepting the
    documented recall loss if the two conflict.
    """
    import math
    p = 1.0 - math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
    p_band_needed = 1.0 - (1.0 - target_recall) ** (1.0 / n_bands)
    if p <= 0 or p >= 1:
        bpb = 31 if p >= 1 else 1
    else:
        bpb = max(1, min(int(math.log(p_band_needed) / math.log(p)), 31))
    return bpb * n_bands, n_bands


def _probe_codes(code: Column, bits_per_band: int, probe_bits: int) -> Column:
    """Multi-probe expansion: the band code plus every code within Hamming
    distance ``probe_bits`` (0 disables; 1 = flip each single bit). Applied
    to the QUERY side only, so the corpus index stays one row per (vector,
    band) — probe cost scales with the (small) query set, never the corpus.
    """
    probes = [code]
    if probe_bits >= 1:
        probes += [code.bitwiseXOR(F.lit(1 << i)) for i in range(bits_per_band)]
    if probe_bits >= 2:
        probes += [code.bitwiseXOR(F.lit((1 << i) | (1 << j)))
                   for i in range(bits_per_band) for j in range(i + 1, bits_per_band)]
    return F.array(*probes)


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 query_id_col: str = "query_id", dim: int = 64,
                 n_planes: int = 64, n_bands: int = 8, probe_bits: int = 2,
                 seed: int = 42) -> DataFrame:
    """Approximate top-k: bucket corpus + queries by per-band LSH codes,
    generate candidates via band-code equality join, re-rank exact cosine.

    Scale shape: the corpus index is ``n_bands`` rows per vector keyed by
    (band, code) — 2^(n_planes/n_bands) buckets per band (256 at the 64/8
    default), uniformly occupied, so the candidate join touches
    ~n_bands·probes/2^bpb of the corpus per query instead of all of it.
    Multi-probe (query-side only) flips up to ``probe_bits`` bits of each
    query band code, buying recall without touching corpus-side cost —
    the standard multi-probe LSH recipe. Recall < 1 by design; raise
    probe_bits / n_bands for more, raise bpb for fewer candidates.
    """
    assert n_planes % n_bands == 0
    bits_per_band = n_planes // n_bands

    def banded(df: DataFrame, ident: str, probes: int) -> DataFrame:
        v = _as_double(vec_col)
        codes = rh_band_codes(v, dim, n_planes, n_bands, seed)
        out = (df.select(F.col(ident), v.alias("__vec"), codes.alias("__codes"))
               .select(ident, "__vec",
                       F.posexplode(F.col("__codes")).alias("band", "code")))
        if probes:
            out = out.select(ident, "__vec", "band",
                             F.explode(_probe_codes(
                                 F.col("code"), bits_per_band, probes))
                              .alias("code"))
        return out

    cb = banded(corpus, id_col, probes=0)
    qb = banded(queries, query_id_col, probes=probe_bits)
    cand = (qb.alias("q").join(cb.alias("c"),
                               (F.col("q.band") == F.col("c.band"))
                               & (F.col("q.code") == F.col("c.code"))
                               & (F.col(f"q.{query_id_col}") != F.col(f"c.{id_col}")))
            .select(F.col(f"q.{query_id_col}").alias(query_id_col),
                    F.col(f"c.{id_col}").alias(id_col),
                    F.col("q.__vec").alias("__qvec"),
                    F.col("c.__vec").alias("__cvec"))
            .dropDuplicates([query_id_col, id_col]))
    scored = cand.select(
        query_id_col, id_col,
        F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine_sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .select(query_id_col, id_col, "cosine_sim", F.col("__rn").alias("rank")))


#: Above this k the per-round assignment switches from centroid
#: LITERALS (zero shuffle, but the plan carries k×d expressions —
#: codegen chokes as k ∝ N) to a broadcast-join + per-id window (one
#: shuffle per round, plan size O(1) in k). Both paths round cosines
#: to 6 and break ties to the smaller cluster id, so they are
#: bit-identical (pinned in tests).
KMEANS_LITERAL_K_MAX = 32


def kmeans_k_for(n_rows: int, target_cluster_size: int,
                 k_min: int = 2) -> int:
    """The SemDeDup paper's scale rule made executable: bound the
    EXPECTED cluster size by deriving ``k = ceil(N / target)`` instead
    of fixing k. Within-cluster pair cost is then O(N * target) in
    expectation — linear in N at constant target — rather than the
    O(N²/k) a fixed k degrades to as the corpus grows."""
    import math
    return max(k_min, math.ceil(n_rows / max(1, target_cluster_size)))


def kmeans_labels(corpus: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding", k: int = 8,
                  iters: int = 3) -> DataFrame:
    """DETERMINISTIC distributed Lloyd's k-means over an embedding
    column — the cluster-label producer SemDeDup/IVF consume, with the
    reproducibility MLlib's KMeans cannot give (k-means|| sampling and
    float mean order vary with partitioning; this one is bit-identical
    at any parallelism, so it carries an exact cross-engine oracle):

    - **init**: the ``k`` vectors with the smallest md5(id) (the repo's
      seeded uniform pick), cluster id = rank order;
    - **assign**: argmax round-6 cosine against the centroid literals
      (ties → smaller cluster id) — pure JVM arithmetic, no shuffle;
    - **update**: per-(cluster, dim) DECIMAL-routed mean rounded to 6
      (``embedding_centroids``'s exact-merge recipe), one uniform
      (cluster, dim)-keyed aggregation per round; a cluster that loses
      all members keeps its previous centroid;
    - ``iters`` (assign, update) rounds, then one final assignment
      against the last centroids.

    Per-round driver sync is k×d rounded floats (metadata-sized — the
    same shape as BPE's per-round argmax); the data-plane cost per
    round is one corpus scan + one posexplode aggregation. Assignment
    is centroid LITERALS up to ``KMEANS_LITERAL_K_MAX`` (zero shuffle)
    and a broadcast-join + per-id window past it (plan size O(1) in k
    — the k ∝ N regime SemDeDup's bounded-cluster rule needs); the two
    paths are bit-identical. Output: (``id_col``, ``cluster`` int,
    ``centroid_sim`` double round-6).
    """
    # parallelism floor (see _parallel_floor): a one-file corpus would
    # score all N×k assignment cosines on a single core — the r12
    # bench's 60s kmeans_scaled row. Partitioning never changes
    # results: assignment is per-row, update sums are decimal-routed.
    # pinned across the Lloyd rounds: every round's assignment and the
    # final labeling scan ``work`` (iters+1 passes plus the init pick);
    # uncached each pass replays the corpus scan + the floor shuffle.
    # r16 scoping (VERDICT r15 items 1+9): the pin now lives ONLY for
    # the rounds — the returned frame is the final assignment
    # materialized ONCE (eager localCheckpoint: N small rows, no
    # vectors), so ``work`` releases in the ``finally`` instead of
    # dangling until the ContextCleaner, and a consumer that reads the
    # labels k times (semdedup's pair-join sides) no longer recomputes
    # the N×k scoring pass per read. An r16 A/B also ruled out a lazy
    # localCheckpoint for ``work`` itself: reading the rounds through
    # checkpoint blocks instead of the columnar cache made the
    # broadcast-path (k ∝ N) consumers 2.3× SLOWER.
    work = _parallel_floor(
        corpus.select(F.col(id_col), _as_double(vec_col).alias("__v")),
        id_col).persist()
    try:
        init = (work.orderBy(F.md5(F.col(id_col).cast("string")),
                             F.col(id_col))
                .limit(k).collect())
        cents = [list(r["__v"]) for r in init]

        def assign(cents) -> DataFrame:    # -> (id, __v, __c, __cs)
            if len(cents) <= KMEANS_LITERAL_K_MAX:
                coss = F.array(*[
                    F.round(cosine(F.col("__v"),
                                   F.array(*[F.lit(float(x))
                                             for x in c])),
                            6) for c in cents])
                # first position of the max → smallest cluster id on ties
                return work.select(
                    F.col(id_col), "__v",
                    (F.array_position(coss, F.array_max(coss))
                     .cast("int") - 1).alias("__c"),
                    F.array_max(coss).alias("__cs"))
            spark = work.sparkSession
            carr = spark.createDataFrame(
                [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
                "__cand int, __cent array<double>")
            scored = work.crossJoin(F.broadcast(carr)).select(
                F.col(id_col), "__v",
                F.struct(F.round(cosine(F.col("__v"), F.col("__cent")),
                                 6).alias("__cs"),
                         (-F.col("__cand")).alias("__negc")).alias("__sc"))
            # argmax via max(struct(cs, -cand)): lexicographic struct
            # max = highest cosine, then SMALLEST cluster id — identical
            # to the literal path's first-position-of-max. Map-side
            # combinable: every id's k candidate rows sit in ONE
            # partition (corpus partition × broadcast), so the partial
            # agg collapses them before the shuffle — N small rows move,
            # never N×k and never the vector ×k (the window formulation
            # shuffled both).
            return (scored.groupBy(id_col)
                    .agg(F.any_value("__v").alias("__v"),  # const per id
                         F.max("__sc").alias("__b"))
                    .select(id_col, "__v",
                            (-F.col("__b.__negc")).cast("int")
                            .alias("__c"),
                            F.col("__b.__cs").alias("__cs")))

        for _ in range(iters):
            flat = assign(cents).select(
                "__c", F.posexplode("__v").alias("__p", "__x"))
            mean = (F.sum(F.col("__x").cast("double")
                          .cast("decimal(28,6)"))
                    .cast("double") / F.count(F.lit(1)))
            rows = (flat.groupBy("__c", "__p")
                    .agg(F.round(mean.cast("decimal(28,8)"), 6)
                          .cast("double").alias("__m"))
                    .collect())
            new = [list(c) for c in cents]  # empty clusters keep theirs
            for r in rows:
                new[r["__c"]][r["__p"]] = r["__m"]
            cents = new
        # final assignment materialized ONCE (small rows: id, cluster,
        # sim — the vectors stay behind), so multi-read consumers scan
        # blocks instead of re-running the N×k scoring, and the pin on
        # ``work`` can release NOW instead of leaking to the cleaner
        return (assign(cents)
                .select(id_col, F.col("__c").alias("cluster"),
                        F.col("__cs").alias("centroid_sim"))
                .localCheckpoint(eager=True))
    finally:
        work.unpersist()


def embedding_centroids(df: DataFrame, label_col: str, vec_col: str) -> DataFrame:
    """Mean-pooled centroid per label, flattened to (label, dim_idx, centroid).

    The class-prototype / cluster-center primitive (diversity sampling,
    nearest-centroid classification, IVF coarse quantizers). Flattened
    form is the scalable shape: ``posexplode`` then ONE aggregation keyed
    on (label, dim) — uniform shuffle, partial-agg'd map-side, no driver
    collect, no per-label vector assembly until a consumer pivots the ≤
    (labels × dims) result. Sums are decimal-routed (exact merge under any
    partitioning); the mean is rounded to 6 places via the decimal route,
    so the result is bit-identical on any engine at any parallelism.
    """
    flat = df.select(F.col(label_col),
                     F.posexplode(F.col(vec_col)).alias("__p", "__v"))
    mean = (F.sum(F.col("__v").cast("double").cast("decimal(28,6)"))
             .cast("double") / F.count(F.lit(1)))
    return (flat.groupBy(label_col, (F.col("__p") + 1).alias("dim_idx"))
            .agg(F.round(mean.cast("decimal(28,8)"), 6).cast("double")
                  .alias("centroid")))


# ------------------------------------------------------- product quantization

def _normalized(col: Column | str) -> Column:
    """L2-normalized double vector (zero vectors pass through as-is), so
    inner product == cosine and PQ's ADC sums approximate cosine."""
    v = _as_double(col)
    n = l2_norm(v)
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


def pq_train(corpus: DataFrame, vec_col: str = "embedding",
             m: int = 8, nbits: int = 5, seed: int = 42,
             sample_fraction: float | None = None,
             normalize: bool = True) -> list:
    """PRODUCT-QUANTIZATION codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011; the FAISS PQ
    building block): L2-normalize, split each vector into ``m``
    subspaces, KMeans each subspace to ``2**nbits`` centroids. Returns
    ``codebooks[sub][code][subdim]`` — m·2^nbits·(d/m) floats, a few KB:
    driver-side literals, like the IVF centroids.

    Train cost is m seeded KMeans fits over the (optionally sampled)
    corpus — at 100 TB fit on a sample (``sample_fraction``), the
    standard PQ practice; encoding (the corpus-scale pass) is
    :func:`pq_encode`. Deterministic: seeded fits, fixed subspace
    order."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    norm = corpus.select(
        (_normalized(vec_col) if normalize
         else _as_double(vec_col)).alias("__nvec"))
    if sample_fraction is not None:
        norm = norm.sample(fraction=sample_fraction, seed=seed)
    d = len(norm.first()["__nvec"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    norm = norm.persist()
    try:
        # materialize the cache fully BEFORE fanning out, so the m
        # concurrent fits read blocks instead of racing to compute them
        norm.count()

        def fit(i: int) -> list:
            train = norm.select(array_to_vector(
                F.slice("__nvec", i * sub + 1, sub)).alias("features"))
            km = KMeans(k=2 ** nbits, seed=seed + i,
                        initMode="k-means||").fit(train)
            return [[float(x) for x in c] for c in km.clusterCenters()]

        # The m subspace fits are INDEPENDENT jobs over the same cached
        # frame — submit them from a thread pool so each fit's straggler
        # tail back-fills with the next fit's tasks (guide §2.6) instead
        # of serializing m × (init rounds + Lloyd iterations) of mostly-
        # idle micro-jobs. Each fit's input partitioning and seed are
        # unchanged, so the centroids are bit-identical to the
        # sequential loop (pinned goldens prove it); map() preserves
        # subspace order.
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        wrap = inheritable_thread_target(norm.sparkSession)
        with ThreadPoolExecutor(max_workers=m) as pool:
            return list(pool.map(wrap(fit), range(m)))
    finally:
        norm.unpersist()


def pq_encode(corpus: DataFrame, codebooks: list,
              id_col: str = "vec_id",
              vec_col: str = "embedding",
              normalize: bool = True,
              keep_cols: list[str] | None = None) -> DataFrame:
    """Encode each vector to ``pq_code array<int>`` (length m): per
    subspace, the nearest codebook centroid — the d·4-bytes-per-vector
    corpus compresses to m small ints, persistable as an ordinary
    parquet column next to the id.

    The argmin is an Arrow-batched pandas UDF (one numpy einsum per
    batch over (batch, m, 2^nbits) distances) rather than
    literal-centroid Column arithmetic: at real dimensions the literal
    form puts m·2^nbits·(d/m) constants in the plan (thousands at
    d=64, absurd at d=768) and Catalyst analysis dominates the run —
    measured before switching. The UDF closes over the codebook array
    (a few KB, broadcast with the task), and the downstream ADC scan
    stays pure-Column JVM (see :func:`pq_ann_topk`)."""
    import pyarrow  # noqa: F401 — Arrow batching is the point
    from pyspark.sql.pandas.functions import pandas_udf

    books = np.asarray(codebooks, dtype=np.float64)   # (m, k, sub)
    m, _, sub = books.shape

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        a = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if normalize:
            norms = np.linalg.norm(a, axis=1, keepdims=True)
            a = np.divide(a, norms, out=a, where=norms > 0)
        subs = a.reshape(len(a), m, sub)              # (n, m, sub)
        # ||x - c||² = ||x||² - 2x·c + ||c||²; argmin over k
        d2 = (-2.0 * np.einsum("nms,mks->nmk", subs, books)
              + (books ** 2).sum(axis=2)[None, :, :])
        codes = d2.argmin(axis=2).astype(np.int32)    # (n, m)
        return pd.Series(list(codes))

    return corpus.select(F.col(id_col), *(keep_cols or []),
                         encode(_as_double(vec_col)).alias("pq_code"))


def pq_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id", m: int = 8,
                nbits: int = 6, rerank: int = 8,
                seed: int = 42) -> DataFrame:
    """PQ ANN with ADC (asymmetric distance computation) + exact
    re-rank: the compressed-codes twin of :func:`cosine_topk`.

    Per query one LOOK-UP TABLE of subspace inner products against
    every codebook centroid (one Arrow-batched einsum over the query
    BATCH — tiny — broadcast with it); the
    corpus-scale scan then scores each vector as ``Σ_sub
    lut[sub][code[sub]]`` — ONE ``zip_with`` over the m-int code array,
    JVM-side, touching m bytes per vector instead of d floats. The top
    ``rerank·k`` ADC candidates per query re-rank by exact cosine
    against the full vectors (one id-equi-join back to the corpus), so
    quantization error costs recall only past rank rerank·k.

    Defaults (m=8, nbits=6, rerank=8) come from an sf0.01 recall@10
    sweep against brute-force truth on the UNSTRUCTURED synthetic
    embeddings (no pair above cosine 0.6 — the hard case): 8/5/8 →
    0.86, 8/6/4 → 0.80, 8/6/8 → 0.94, 8/5/12 → 0.96, 4/6/8 → 0.80.
    Re-run the sweep before changing them; the sim_pq_ann_topk golden
    pins the resulting top-k set.

    At 100 TB this is the memory-bound answer the IVF/LSH variants
    don't give: the scan state is the CODES table (m bytes/vector — 32×
    smaller than 64-dim float32), so a corpus whose vectors don't fit
    hot storage still scans compressed; compose with IVF cells to also
    cut the scanned fraction. Deterministic end-to-end (seeded fits,
    tie-broken windows)."""
    books = pq_train(corpus, vec_col, m=m, nbits=nbits, seed=seed)
    encoded = pq_encode(corpus, books, id_col, vec_col)

    from pyspark.sql.pandas.functions import pandas_udf
    ba = np.asarray(books, dtype=np.float64)          # (m, k, sub)
    mm, _, sub = ba.shape

    @pandas_udf("array<array<double>>")
    def lut(vecs: pd.Series) -> pd.Series:
        a = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(a, axis=1, keepdims=True)
        a = np.divide(a, norms, out=a, where=norms > 0)
        subs = a.reshape(len(a), mm, sub)
        t = np.einsum("nms,mks->nmk", subs, ba)       # (n, m, k) dots
        return pd.Series([list(map(list, row)) for row in t])

    q = F.broadcast(queries.select(
        F.col(query_id_col), _normalized(vec_col).alias("__qvec"),
        lut(_as_double(vec_col)).alias("__lut")))

    adc = F.aggregate(
        F.zip_with(F.col("pq_code"), F.col("__lut"),
                   lambda c, l: F.element_at(l, c + F.lit(1))),
        F.lit(0.0), lambda acc, v: acc + v)
    cand = (_parallel_floor(encoded, id_col).crossJoin(q)
            .where(F.col(id_col) != F.col(query_id_col))
            .select(query_id_col, id_col, "__qvec",
                    adc.alias("__adc")))
    w = Window.partitionBy(query_id_col) \
              .orderBy(F.desc("__adc"), F.asc(id_col))
    cand = (cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= rerank * k)
            .drop("__rn"))
    exact = (cand.join(corpus.select(F.col(id_col),
                                     _as_double(vec_col).alias("__cvec")),
                       id_col)
             .select(query_id_col, id_col,
                     F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6)
                      .alias("cosine_sim")))
    w2 = Window.partitionBy(query_id_col) \
               .orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (exact.withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= k)
            .select(query_id_col, id_col, "cosine_sim",
                    F.col("__rn").alias("rank")))


# ------------------------------------------------------------------- PCA

def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8,
            id_col: str = "vec_id", n_parts: int = 8) -> dict:
    """Distributed PCA fit over an embedding column — the
    dimensionality-reduction preprocessor for embedding storage and
    ANN (project 64-dim to k dims before indexing). The scale shape is
    the tree-aggregated GRAM MATRIX: each partition folds its rows
    into one d×d partial Gram + d-dim sum + count with a single numpy
    matmul (Arrow-batched ``mapInPandas``, O(d²) output per partition
    regardless of row count), the partials merge in one uniform
    (i, j)-keyed aggregation (d² rows total — 4096 at d=64, metadata-
    sized at any corpus size), and ONLY the d×d covariance
    eigendecomposition runs on the driver. No row ever leaves the
    executors; a 100 TB corpus costs one scan.

    Determinism (what lets consumers pin goldens): the input is
    repartitioned by ``id_col`` and sorted within partitions, so every
    partition's numpy fold sees identical rows in identical order on
    any run; the cross-partition merge routes through DECIMAL sums
    (exact, order-free); eigenvector signs are fixed (largest-|x|
    component positive) and components round to 6.

    Returns ``{"mean": [d], "components": [k][d], "explained": [k]}``.
    """
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StructField, StructType)

    work = (df.select(F.col(id_col), _as_double(vec_col).alias("__v"))
            .repartition(n_parts, id_col)
            .sortWithinPartitions(id_col))
    d = len(work.select("__v").first()["__v"])

    out_schema = StructType([
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),      # column sums
        StructField("g", ArrayType(DoubleType())),      # flat d×d Gram
    ])

    def partial_gram(batches):
        tot_n, tot_s, tot_g = 0, None, None
        for pdf in batches:
            x = np.asarray(list(pdf["__v"]), dtype=np.float64)
            if x.size == 0:
                continue
            tot_n += x.shape[0]
            s = x.sum(axis=0)
            g = x.T @ x
            tot_s = s if tot_s is None else tot_s + s
            tot_g = g if tot_g is None else tot_g + g
        if tot_n:
            yield pd.DataFrame({"n": [tot_n], "s": [tot_s.tolist()],
                                "g": [tot_g.ravel().tolist()]})

    parts = work.select("__v").mapInPandas(partial_gram, out_schema)
    # exact order-free merge in ONE pass: prepend the count as element
    # 0, explode to (idx, val), DECIMAL-sum per idx (1 + d + d² rows)
    flat = parts.select(
        F.posexplode(F.concat(F.array(F.col("n").cast("double")),
                              F.col("s"), F.col("g")))
         .alias("__i", "__x"))
    merged = (flat.groupBy("__i")
              .agg(F.sum(F.col("__x").cast("decimal(38,12)"))
                    .cast("double").alias("__x"))
              .collect())
    vals = [0.0] * (1 + d + d * d)
    for r in merged:
        vals[r["__i"]] = r["__x"]
    n = int(vals[0])
    s = np.asarray(vals[1:1 + d])
    g = np.asarray(vals[1 + d:]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for j in order:
        v = evecs[:, j]
        if v[int(np.argmax(np.abs(v)))] < 0:    # sign convention
            v = -v
        comps.append([round(float(x), 6) for x in v])
    return {"mean": [round(float(x), 6) for x in mean],
            "components": comps,
            "explained": [round(float(evals[j]), 6) for j in order]}


def pca_project(df: DataFrame, model: dict, vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Project vectors onto a fitted PCA basis: center by the model
    mean, dot with each component — a broadcast join against the k
    component rows (k×d floats, broadcastable at any k×d that fits a
    model), one map-side pass over the corpus, no shuffle beyond the
    k-row pivot. Output: (id, pc array<double> round-6)."""
    spark = df.sparkSession
    comps = spark.createDataFrame(
        [(i, model["components"][i]) for i in
         range(len(model["components"]))],
        "pc_idx int, comp array<double>")
    mean = F.array(*[F.lit(float(x)) for x in model["mean"]])
    centered = df.select(
        F.col(id_col),
        F.zip_with(_as_double(vec_col), mean,
                   lambda a, b: a - b).alias("__c"))
    scored = centered.crossJoin(F.broadcast(comps)).select(
        id_col, "pc_idx",
        F.round(F.aggregate(
            F.zip_with(F.col("__c"), F.col("comp"),
                       lambda a, b: a * b),
            F.lit(0.0), lambda acc, v: acc + v), 6).alias("__p"))
    return (scored.groupBy(id_col)
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("pc_idx", "__p"))),
                lambda s: s["__p"]).alias("pc")))


def ivfpq_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "query_id", n_clusters: int = 32,
                   n_probe: int = 8, m: int = 8, nbits: int = 5,
                   rerank: int = 8, seed: int = 42) -> DataFrame:
    """IVF-PQ with residual encoding — the full FAISS ``IVFPQ`` recipe
    (Jégou et al. 2011 §V) composed from the IVF and PQ tiers: coarse
    KMeans cells cut the scanned FRACTION (n_probe/n_clusters), PQ codes
    over the RESIDUAL x - centroid(cell) cut the scanned BYTES
    (m bytes/vector), and the ADC estimate q·x ≈ q·c + Σ lut[code]
    recovers the cross term exactly because q·x = q·c + q·(x-c).

    Residuals quantize better than raw vectors (they live in a ball
    around 0, so the same codebook budget spends on finer detail) —
    that's why FAISS encodes residuals, and why this beats flat PQ at
    equal scan fraction. Plan shape: one seeded coarse fit + one Arrow
    hop assigning cell+residual, m seeded subspace fits on residuals,
    one Arrow encode; per query batch, the probe UDF emits (cell, q·c,
    LUT) rows that broadcast into the cell-pruned JVM zip_with scan;
    exact cosine re-rank of the top rerank·k. At 100 TB the serving
    state is the (cell, code) table — compressed AND cell-pruned.

    Defaults (32 cells / 8 probes = 25% scan, m=8, nbits=5, rerank=8)
    come from an sf0.01 recall@10 sweep vs brute truth on the
    unstructured synthetic embeddings: 16/4 -> 0.68, 32/8 -> 0.78
    (rerank 12 adds nothing) — vs flat IVF's 0.832 at the same scan
    fraction, i.e. residual-PQ compression costs ~0.05 recall here
    while shrinking scanned bytes 32x. Deterministic end-to-end
    (seeded fits, id tie-breaks), so the sf0.01 output pins as a
    golden."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.pandas.functions import pandas_udf

    normed = corpus.select(F.col(id_col),
                           _normalized(vec_col).alias("__nvec"))
    train = normed.select(array_to_vector("__nvec").alias("features"))
    km = KMeans(k=n_clusters, seed=seed, initMode="k-means||").fit(train)
    cents = np.asarray([[float(x) for x in c] for c in km.clusterCenters()],
                       dtype=np.float64)

    @pandas_udf("struct<cell:int,res:array<double>>")
    def assign_res(vecs: pd.Series) -> pd.DataFrame:
        a = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = ((a[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cell = d2.argmin(axis=1)
        res = a - cents[cell]
        return pd.DataFrame({"cell": cell.astype(np.int32),
                             "res": list(res)})

    src = (normed.withColumn("__ar", assign_res("__nvec"))
           .select(id_col, F.col("__ar.cell").alias("cell"),
                   F.col("__ar.res").alias("__res")))
    books = pq_train(src, "__res", m=m, nbits=nbits, seed=seed,
                     normalize=False)
    codes = pq_encode(src, books, id_col, "__res", normalize=False,
                      keep_cols=["cell"])

    ba = np.asarray(books, dtype=np.float64)          # (m, kcodes, sub)
    mm, _, sub = ba.shape
    npb = n_probe

    @pandas_udf("array<struct<cell:int,qdotc:double,"
                "lut:array<array<double>>>>")
    def probe(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            qv = np.asarray(v, dtype=np.float64)
            d2 = ((cents - qv) ** 2).sum(axis=1)
            cells = np.argsort(d2, kind="stable")[:npb]
            rows = []
            for c in cells:
                qr = (qv - cents[c]).reshape(mm, sub)
                lut = np.einsum("ms,mks->mk", qr, ba)
                rows.append({"cell": int(c),
                             "qdotc": float(qv @ cents[c]),
                             "lut": [list(r) for r in lut]})
            out.append(rows)
        return pd.Series(out)

    qn = queries.select(F.col(query_id_col),
                        _normalized(vec_col).alias("__qvec"))
    qp = (qn.withColumn("__p", F.explode(probe("__qvec")))
          .select(query_id_col, "__qvec",
                  F.col("__p.cell").alias("cell"),
                  F.col("__p.qdotc").alias("__qdotc"),
                  F.col("__p.lut").alias("__lut")))
    adc = F.col("__qdotc") + F.aggregate(
        F.zip_with(F.col("pq_code"), F.col("__lut"),
                   lambda c, l: F.element_at(l, c + F.lit(1))),
        F.lit(0.0), lambda acc, v: acc + v)
    cand = (codes.join(F.broadcast(qp), "cell")
            .where(F.col(id_col) != F.col(query_id_col))
            .select(query_id_col, id_col, "__qvec", adc.alias("__adc")))
    w = Window.partitionBy(query_id_col) \
              .orderBy(F.desc("__adc"), F.asc(id_col))
    cand = (cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= rerank * k).drop("__rn", "__adc"))
    exact = (cand.join(corpus.select(F.col(id_col),
                                     _as_double(vec_col).alias("__cvec")),
                       id_col)
             .select(query_id_col, id_col,
                     F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6)
                      .alias("cosine_sim")))
    w2 = Window.partitionBy(query_id_col) \
               .orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (exact.withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= k)
            .select(query_id_col, id_col, "cosine_sim",
                    F.col("__rn").alias("rank")))


def matryoshka_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id", prefix_dim: int = 16,
                    rerank: int = 8) -> DataFrame:
    """Prefix-dimension two-stage ANN (the Matryoshka-representation
    serving recipe, Kusupati et al. 2022: coarse-rank on the first
    ``prefix_dim`` dims, exact-rerank on the full vector).

    Unlike PQ/IVF this tier has NO trained state and NO seeds — the
    coarse score is plain cosine over a column slice, so the whole
    operator is exact SQL and the oracle recomputes it end-to-end
    (the only ANN tier here with a recomputed, non-pinned oracle).
    Scan cost: prefix_dim/d of the float reads of the brute baseline
    for the coarse pass (same row count, 4× fewer bytes at 16/64),
    then an exact re-rank of rerank·k candidates per query. With
    MRL-trained embeddings the prefix carries most of the signal;
    on these UNSTRUCTURED synthetic vectors the measured recall@10 vs
    brute truth is the floor case (~0.5 at 16/64 — documented, gated
    loosely in tests; real MRL embeddings sit far higher).
    """
    pc = F.slice(_as_double(vec_col), 1, prefix_dim)
    c = _parallel_floor(
        corpus.select(F.col(id_col), _as_double(vec_col).alias("__cvec"),
                      pc.alias("__cpre")), id_col)
    q = F.broadcast(queries.select(
        F.col(query_id_col), _as_double(vec_col).alias("__qvec"),
        pc.alias("__qpre")))
    cand = (c.crossJoin(q)
            .where(F.col(id_col) != F.col(query_id_col))
            .select(query_id_col, id_col, "__qvec", "__cvec",
                    F.round(cosine(F.col("__qpre"), F.col("__cpre")), 6)
                     .alias("__pre")))
    w = Window.partitionBy(query_id_col) \
              .orderBy(F.desc("__pre"), F.asc(id_col))
    cand = (cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= rerank * k))
    w2 = Window.partitionBy(query_id_col) \
               .orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (cand.select(query_id_col, id_col,
                        F.round(cosine(F.col("__qvec"), F.col("__cvec")),
                                6).alias("cosine_sim"))
            .withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= k)
            .select(query_id_col, id_col, "cosine_sim",
                    F.col("__rn").alias("rank")))


def rrf_fusion(rankings: list[DataFrame], k: int = 10, c: int = 60,
               id_col: str = "vec_id",
               query_id_col: str = "query_id",
               weights: list[float] | None = None) -> DataFrame:
    """Reciprocal-Rank Fusion (Cormack et al. 2009) — the standard way
    to combine retrieval tiers (dense + lexical, full-dim + prefix-dim,
    ANN + exact) WITHOUT calibrating their score scales: each list
    contributes 1/(c + rank) per candidate, candidates missing from a
    list contribute 0, and the fused top-k re-ranks by the sum. The
    rank-only formulation is what makes it robust — incomparable
    cosine/BM25/ADC scores never meet.

    Inputs are per-query rankings (query_id, id, rank), e.g. from
    :func:`cosine_topk`. Shape: one FULL outer join per extra tier on
    (query, id) — candidate-list-sized frames, tiny next to the scans
    that produced them — then one per-query top-k window. Determinism:
    integer ranks (each tier breaks ties by id), the fused score is the
    same few-term double sum on any engine, ties broken by id; round-6
    decimal routing, so the whole fusion carries an exact SQL oracle.

    ``weights`` (default all-1.0, the classic formula) scale each
    tier's term to w_i/(c + rank) — the standard remedy when tier
    qualities are far apart (unweighted RRF leans toward tier
    CONSENSUS: with depth-d lists, double membership outscores a
    single-list rank-1 whenever d < c + 2). Measured honestly on the
    recall gate's tiers (sf0.01): up-weighting IVF-PQ 2-4× over MRL-16
    recovers 185-189 of the 191 hits IVF-PQ gets alone, but can NEVER
    exceed it — the weak tier's marginal truth (14/250 candidates only
    it retrieves) is outweighed by the false candidates it votes up.
    Weights tune the consensus/quality balance; they don't conjure
    recall the tiers don't jointly have.

    Returns (query_id, id_col, rrf_score round-6, rank 1..k).
    """
    assert len(rankings) >= 2, "fuse at least two rankings"
    if weights is None:
        weights = [1.0] * len(rankings)
    assert len(weights) == len(rankings), "one weight per ranking"
    parts = []
    for i, r in enumerate(rankings):
        parts.append(r.select(
            F.col(query_id_col), F.col(id_col),
            (F.lit(float(weights[i]))
             / (F.lit(float(c)) + F.col("rank").cast("double")))
            .alias(f"__s{i}")))
    fused = parts[0]
    for i in range(1, len(parts)):
        fused = fused.join(parts[i], [query_id_col, id_col], "full")
    score = None
    for i in range(len(parts)):
        term = F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
        score = term if score is None else score + term
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("__rrf"), F.asc(id_col))
    return (fused.withColumn("__rrf", score)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col,
                    F.round(F.col("__rrf").cast("decimal(28,8)"), 6)
                     .cast("double").alias("rrf_score"),
                    "rank"))
