"""Training-data curation queries: dup clustering, deterministic sampling,
corpus text prep, and embedding aggregation.

Beyond-reference surface (driver north star). Every oracle replicates the
operator's exact semantics in DuckDB SQL — including the iterative
connected-components labeling, whose oracle is a recursive CTE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walmart_project_etl_spark.operators import (cleaning, dedup, graph,
                                                 packing, sampling, text)

from .util import pinned, t

QUERIES: dict = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn
    return deco


# ---------------------------------------------------------- dup clustering

def _chained_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus two generations of near-copies (suffix-mutated), so
    the dup-pair graph has genuine multi-member components to close over."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    gen1 = d.select((F.col("doc_id") + 100000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" extra tail words here"))
                     .alias("text"))
    gen2 = d.select((F.col("doc_id") + 200000).alias("doc_id"),
                    F.concat(F.col("text"),
                             F.lit(" extra tail words here and then some more"))
                     .alias("text"))
    return d.unionByName(gen1).unionByName(gen2)


_CHAINED_SQL = """(SELECT doc_id, text FROM documents
   UNION ALL
   SELECT doc_id + 100000, text || ' extra tail words here' FROM documents
   UNION ALL
   SELECT doc_id + 200000, text || ' extra tail words here and then some more'
   FROM documents)"""

_LABELED_CACHE: dict[str, str] = {}


def _labeled_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled chained corpus — ``(doc_id, cluster_id, n_tokens)`` — built
    ONCE per (process, code version, sf_dir) and persisted as parquet.

    Both cluster queries (``dedup_cluster_components`` and
    ``dedup_canonical_longest``) need the identical pair graph + transitive
    closure — by far the most expensive subplan in the family; recomputing
    it per query doubled its cost at bench level (VERDICT r5). Factoring it
    through the same ``build_once`` seam the star pipeline uses turns the
    second consumer into a parquet scan, exactly how a production corpus
    pipeline shares its closure: label once, serve many.
    """
    import hashlib

    from .util import build_once

    if sf_dir not in _LABELED_CACHE:
        def build(out: str) -> None:
            corpus = _chained_corpus(spark, sf_dir)
            pairs = dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", k=3,
                                              threshold=0.6, unit="word") \
                         .select("id_a", "id_b")
            labeled = graph.cluster_dedup(pairs, corpus, "doc_id") \
                           .drop("is_canonical")
            n_tokens = F.size(F.split(
                F.regexp_replace(F.col("text"), r"^\s+|\s+$", ""), r"\s+"))
            sized = corpus.select("doc_id",
                                  n_tokens.cast("long").alias("n_tokens"))
            labeled.join(sized, "doc_id").write.mode("overwrite") \
                   .parquet(os.path.join(out, "labeled"))

        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        _LABELED_CACHE[sf_dir] = build_once(f"labeled_corpus_{tag}", build)
    return spark.read.parquet(os.path.join(_LABELED_CACHE[sf_dir], "labeled"))


def invalidate_labeled_cache() -> None:
    """Drop the materialized labeled corpus (process cache + on-disk dirs)
    so the next cluster query pays the FULL pair-graph + closure build —
    used by ``bench.py`` to time the closure cold."""
    import shutil
    import tempfile

    from .util import code_version

    _LABELED_CACHE.clear()
    root = tempfile.gettempdir()
    for name in os.listdir(root):
        if name.startswith("wpe_labeled_corpus_") and \
                name.endswith(code_version()):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)

# word-3-gram Jaccard pairs over the chained corpus (same operator
# semantics as dedup_ngram_jaccard, threshold 0.6). Word shingles, not
# char: the synthetic corpus has a ~40-word vocabulary, so char 5-grams
# are shared by nearly every document and the pair join degenerates
# toward all-pairs (see ngram_jaccard_pairs docstring).
_PAIRS_SQL = f"""
  WITH RECURSIVE corpus AS (SELECT * FROM {_CHAINED_SQL} c),
  tok AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM corpus),
  pos AS (
    SELECT doc_id, w,
           unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS i
    FROM tok),
  sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
         FROM pos),
  sized AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id),
  pairs AS (
    SELECT id_a, id_b
    FROM inter
    JOIN sized sa ON sa.doc_id = id_a
    JOIN sized sb ON sb.doc_id = id_b
    WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.6)"""


@q("dedup_cluster_components",
   _PAIRS_SQL + """,
  edges AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
  reach AS (
    SELECT a AS id, a AS r FROM edges
    UNION
    SELECT e.b AS id, reach.r FROM reach JOIN edges e ON e.a = reach.id),
  cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
  SELECT c.doc_id, coalesce(cc.component, c.doc_id) AS cluster_id,
         coalesce(cc.component, c.doc_id) = c.doc_id AS is_canonical
  FROM (SELECT doc_id FROM """ + _CHAINED_SQL + """ u) c
  LEFT JOIN cc ON cc.id = c.doc_id""")
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-cluster resolution: word-3-gram Jaccard pairs → connected components
    (iterative min-label propagation) → canonical-per-cluster keep flags.

    The oracle computes the identical transitive closure with a recursive
    CTE — an exact check of the iterative algorithm's fixpoint. Spark side
    is the alternating-star contraction (O(log n) rounds of edge-linear
    shuffles, operators/graph.py); the pair graph + closure are built once
    per corpus (``_labeled_chained``) and shared with the keep-longest
    query — label once, serve many.
    """
    labeled = _labeled_chained(spark, sf_dir)
    return labeled.select(
        "doc_id", "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"))


# ---------------------------------------------------- deterministic sampling

@q("sample_stratified",
   """SELECT doc_id, lang FROM documents
      QUALIFY row_number() OVER (
          PARTITION BY lang
          ORDER BY md5(doc_id::VARCHAR) NULLS FIRST, doc_id NULLS FIRST)
        <= ceil(count(*) OVER (PARTITION BY lang) * 0.2)""")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 20% per-language sample, ranked by md5 of the doc id — uniform
    yet bit-reproducible on any engine, any parallelism, any rerun."""
    d = t(spark, sf_dir, "documents")
    return sampling.stratified_sample(d, "lang", 0.2, "doc_id") \
        .select("doc_id", "lang")


@q("sample_hash_split",
   """SELECT doc_id,
             CASE WHEN b < 90 THEN 'train'
                  WHEN b < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 8))::BIGINT
                     % 100 AS b
            FROM documents)""")
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 90/5/5 train/val/test assignment from md5 hash buckets —
    append-only corpora never reshuffle historic rows between splits."""
    d = t(spark, sf_dir, "documents")
    return sampling.hash_split(d, "doc_id",
                               {"train": 90, "val": 5, "test": 5}) \
        .select("doc_id", "split")


@q("sample_leakage_safe_split",
   _PAIRS_SQL + """,
  edges AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
  reach AS (
    SELECT a AS id, a AS r FROM edges
    UNION
    SELECT e.b AS id, reach.r FROM reach JOIN edges e ON e.a = reach.id),
  cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
  labeled AS (
    SELECT c.doc_id, coalesce(cc.component, c.doc_id) AS cluster_id
    FROM (SELECT doc_id FROM """ + _CHAINED_SQL + """ u) c
    LEFT JOIN cc ON cc.id = c.doc_id)
  SELECT doc_id, cluster_id,
         CASE WHEN b < 90 THEN 'train'
              WHEN b < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id, cluster_id,
               ('0x' || substr(md5('#' || cluster_id::VARCHAR), 1, 8))
                 ::BIGINT % 100 AS b
        FROM labeled)""")
def sample_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: hash-bucket on the DUP-CLUSTER
    id, not the doc id — every member of a near-dup cluster inherits one
    split, so a training document's near-copy can never sit in the eval
    set (the train-test contamination a doc-grain split silently
    permits whenever the corpus has dups — which is why this composes
    the closure with the split instead of leaving it to the caller).
    Reuses the shared labeled-corpus artifact (pair graph + transitive
    closure built once, served many — `_labeled_chained`); the oracle
    recomputes the closure with a recursive CTE and the identical md5
    bucket rule. Returns (doc_id, cluster_id, split)."""
    labeled = _labeled_chained(spark, sf_dir).select("doc_id", "cluster_id")
    return sampling.hash_split(labeled, "cluster_id",
                               {"train": 90, "val": 5, "test": 5}) \
        .select("doc_id", "cluster_id", "split")


@q("sample_cap_per_source",
   """SELECT doc_id, source FROM documents
      QUALIFY row_number() OVER (
          PARTITION BY source
          ORDER BY md5(doc_id::VARCHAR) NULLS FIRST, doc_id NULLS FIRST)
        <= 10""")
def sample_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (≤10 per source, hash-uniform pick) — the
    per-domain cap every web-corpus build applies so no host dominates."""
    d = t(spark, sf_dir, "documents")
    return sampling.cap_per_group(d, "source", 10, "doc_id") \
        .select("doc_id", "source")


@q("sample_shard_assignment",
   """SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard,
             row_number() OVER (
                 PARTITION BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
                              ::BIGINT % 8
                 ORDER BY md5(doc_id::VARCHAR) NULLS FIRST,
                          doc_id NULLS FIRST) - 1 AS shard_pos
      FROM documents""")
def sample_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard layout: stable (shard, shard_pos) as
    a pure function of doc_id — reproducible training order at any
    parallelism (operators/sampling.py:assign_shards)."""
    d = t(spark, sf_dir, "documents")
    return sampling.assign_shards(d, "doc_id", 8) \
        .select("doc_id", "shard", F.col("shard_pos").cast("long")
                .alias("shard_pos"))


# ------------------------------------------------------- repetition / chunking

@q("text_repetition_signals",
   r"""WITH toks AS (
        SELECT doc_id,
               string_split_regex(regexp_replace(text, '^\s+|\s+$', ''), '\s+') AS w
        FROM documents),
      grams AS (
        SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
        FROM (SELECT doc_id, w,
                     unnest(range(1, greatest(len(w) - 1, 1) + 1)) AS i
              FROM toks)),
      per AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g)
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
             round(max(c)::DOUBLE / sum(c), 6) AS top_ngram_frac,
             round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c), 6)
               AS dup_ngram_frac
      FROM per GROUP BY doc_id""")
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition: word-bigram totals, top-bigram
    coverage, and duplicate-bigram fraction per document."""
    d = t(spark, sf_dir, "documents")
    return text.repetition_signals(d, "doc_id", "text", n=2)


@q("text_chunk_windows",
   r"""WITH toks AS (
        SELECT doc_id,
               string_split_regex(regexp_replace(text, '^\s+|\s+$', ''), '\s+') AS w
        FROM documents),
      n AS (SELECT doc_id, w,
                   greatest(ceil((len(w) - 32) / 24.0)::INT, 0) + 1 AS nc
            FROM toks),
      c AS (SELECT doc_id, w, unnest(range(0, nc)) AS chunk_id FROM n)
      SELECT doc_id, chunk_id,
             len(w[(chunk_id * 24 + 1)::INT:(chunk_id * 24 + 32)::INT]) AS n_tokens,
             array_to_string(w[(chunk_id * 24 + 1)::INT:(chunk_id * 24 + 32)::INT], ' ')
               AS chunk_text
      FROM c""")
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking for training: 32-token windows with stride 24
    (overlapping), one row per (doc, chunk) — a pure narrow transform."""
    d = t(spark, sf_dir, "documents")
    out = text.chunk_text(d, "doc_id", "text", chunk_size=32, stride=24)
    return out.select("doc_id", F.col("chunk_id").cast("long").alias("chunk_id"),
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      "chunk_text")


@q("dedup_decontaminate",
   r"""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents),
      bg AS (
        SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS g
        FROM (SELECT w, unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
              FROM tok WHERE doc_id % 20 = 0)),
      cg AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS g
        FROM (SELECT doc_id, w,
                     unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
              FROM tok)),
      bad AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (g))
      SELECT doc_id, lang, source FROM documents
      ANTI JOIN bad USING (doc_id)""")
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop corpus docs sharing any word 8-gram
    with the 'benchmark' subset (doc_id % 20 = 0) — broadcast anti-probe,
    the standard eval-set overlap scrub before training."""
    d = t(spark, sf_dir, "documents")
    benchmark = d.where(F.col("doc_id") % 20 == 0)
    return dedup.decontaminate(d, benchmark, "doc_id", "text", n=8) \
        .select("doc_id", "lang", "source")


@q("sim_embedding_centroids",
   """WITH flat AS (
        SELECT label, i::INT AS dim_idx, embedding[i::INT]::DOUBLE AS v
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i))
      SELECT label, dim_idx,
             round(CAST(sum(CAST(v AS DECIMAL(28,6)))::DOUBLE / count(*)
                        AS DECIMAL(28,8)), 6)::DOUBLE AS centroid
      FROM flat GROUP BY label, dim_idx""")
def sim_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled centroid per label over the embeddings table — the
    class-prototype primitive, flattened to (label, dim, value) rows."""
    from walmart_project_etl_spark.operators.similarity import \
        embedding_centroids
    e = t(spark, sf_dir, "embeddings")
    return embedding_centroids(e, "label", "embedding")


@q("sample_pack_sequences",
   r"""WITH toks AS (
        SELECT doc_id,
               len(string_split_regex(regexp_replace(text, '^\s+|\s+$', ''),
                                      '\s+'))::BIGINT AS n_tokens
        FROM documents),
      g AS (
        SELECT doc_id, n_tokens,
               ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 8))::BIGINT % 8
                 AS pack_group
        FROM toks),
      s AS (
        SELECT doc_id, pack_group, n_tokens,
               sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id)
                 - n_tokens AS strt
        FROM g)
      SELECT doc_id, pack_group, n_tokens,
             CAST(strt // 64 AS BIGINT) AS seq_id,
             CAST(strt % 64 AS BIGINT) AS seq_offset
      FROM s""")
def sample_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-split sequence packing (capacity 64 tokens, 8 hash
    groups): each doc gets the sequence id + token offset where it starts
    in its group's head-to-tail token stream. The oracle replays the
    identical hash-group + running-sum window in SQL — exact."""
    d = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(
        F.regexp_replace(F.col("text"), r"^\s+|\s+$", ""), r"\s+"))
    sized = d.select("doc_id", n_tokens.cast("long").alias("n_tokens"))
    out = packing.pack_sequences(sized, "doc_id", "n_tokens",
                                 capacity=64, n_groups=8)
    return out.select("doc_id", "pack_group", "n_tokens",
                      F.col("seq_id").cast("long").alias("seq_id"),
                      F.col("seq_offset").cast("long").alias("seq_offset"))


@q("text_unigram_logprob",
   r"""WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(
                   lower(regexp_replace(text, '^\s+|\s+$', '')), '\s+')) AS t
        FROM documents),
      dt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
      v AS (SELECT t, sum(c) AS vc FROM dt GROUP BY t),
      tot AS (SELECT sum(vc) AS total FROM v),
      lp AS (SELECT t, CAST(round(ln(vc / total), 6) AS DECIMAL(20,6)) AS lp
             FROM v, tot)
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(lp * c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
               AS mean_logprob
      FROM dt JOIN lp USING (t)
      GROUP BY doc_id""")
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: corpus vocabulary build + per-doc mean
    token log-probability (cheap perplexity proxy). Logprobs are rounded
    then DECIMAL-summed so the mean is identical on any engine at any
    summation order — the oracle is exact, not approximate."""
    d = t(spark, sf_dir, "documents")
    return text.unigram_logprob(d, "doc_id", "text")


@q("text_bigram_logprob",
   r"""WITH tok AS (
        SELECT doc_id,
               string_split_regex(
                   lower(regexp_replace(text, '^\s+|\s+$', '')), '\s+') AS w
        FROM documents),
      pr AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM tok, unnest(range(1, len(w))) AS u(i)),
      dbi AS (SELECT doc_id, w1, w2, count(*) AS c
              FROM pr GROUP BY doc_id, w1, w2),
      bi AS (SELECT w1, w2, sum(c) AS c12 FROM dbi GROUP BY w1, w2),
      ctx AS (SELECT w1, sum(c12) AS c1 FROM bi GROUP BY w1),
      uni AS (SELECT t AS w2, count(*) AS c2
              FROM (SELECT unnest(w) AS t FROM tok) GROUP BY t),
      tot AS (SELECT sum(c2) AS n FROM uni),
      lp AS (SELECT w1, w2,
                    CAST(round(ln(0.7 * c12 / c1
                                  + 0.30000000000000004 * c2 / n), 6)
                      AS DECIMAL(20,6)) AS lp
             FROM bi JOIN ctx USING (w1) JOIN uni USING (w2), tot)
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             CAST(sum(lp * c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
               AS mean_logprob
      FROM dbi JOIN lp USING (w1, w2) GROUP BY doc_id""")
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM quality score (CCNet-style perplexity
    filter): mean ln(0.7·P_bigram + 0.3·P_unigram) per document — word
    ORDER now matters, which the unigram scorer cannot see. Bigrams
    come from one in-row transform over the token array (no self-join);
    the oracle's 0.30000000000000004 literal is the exact double Python
    computes for 1.0 − 0.7, so both engines interpolate identically."""
    d = t(spark, sf_dir, "documents")
    return text.bigram_logprob(d, "doc_id", "text")


@q("text_pmi_collocations",
   r"""WITH tok AS (
        SELECT string_split_regex(
            lower(regexp_replace(text, '^\s+|\s+$', '')), '\s+') AS w
        FROM documents),
      pr AS (SELECT w[i] AS w1, w[i + 1] AS w2
             FROM tok, unnest(range(1, len(w))) AS u(i)),
      bi AS (SELECT w1, w2, count(*) AS pair_count
             FROM pr GROUP BY w1, w2),
      uni AS (SELECT t AS w, count(*) AS c
              FROM (SELECT unnest(w) AS t FROM tok) GROUP BY t),
      nb AS (SELECT sum(pair_count) AS nb FROM bi),
      nt AS (SELECT sum(c) AS nt FROM uni)
      SELECT w1, w2, pair_count,
             round(CAST(ln((pair_count / nb)
                           / ((u1.c / nt) * (u2.c / nt)))
                   AS DECIMAL(28,8)), 6)::DOUBLE AS pmi
      FROM bi JOIN uni u1 ON u1.w = w1 JOIN uni u2 ON u2.w = w2, nb, nt
      WHERE pair_count >= 5
      ORDER BY pmi DESC, w1, w2 LIMIT 50""")
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining (operators/text.py:pmi_collocations —
    Church & Hanks 1990): top adjacent word pairs by pointwise mutual
    information with a min-support floor, the classic phrase-mining
    signal. Bigrams from one in-row transform, two map-side-combined
    counts, broadcast unigram joins, TakeOrdered top-k — one corpus
    scan's cost at any size."""
    d = t(spark, sf_dir, "documents")
    return text.pmi_collocations(d, "text", min_count=5, top_k=50)


@q("dedup_incremental",
   """WITH corpus AS (
        SELECT DISTINCT md5(text) AS d FROM documents WHERE doc_id % 2 = 0),
      b AS (
        SELECT doc_id, lang, source, md5(text) AS d
        FROM documents WHERE doc_id % 2 = 1),
      fresh AS (SELECT * FROM b ANTI JOIN corpus USING (d))
      SELECT doc_id, lang, source FROM fresh
      QUALIFY row_number() OVER (PARTITION BY d ORDER BY doc_id) = 1""")
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion dedup: the odd-id half of documents is
    the 'new batch', deduped against the even-id 'existing corpus' by
    content digest (anti-join on the persisted index shape), then within
    itself. The delta-vs-index pattern every continuously-built corpus
    runs instead of full-corpus self-dedup."""
    d = t(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") % 2 == 0)
    batch = d.where(F.col("doc_id") % 2 == 1)
    out = dedup.incremental_exact_dedup(batch, corpus, "doc_id", "text")
    return out.select("doc_id", "lang", "source")


@q("dedup_fuzzy_blocked",
   """WITH base AS (
        SELECT s_suppkey AS id, lower(trim(s_name)) AS n FROM supplier
        UNION ALL
        SELECT s_suppkey + 100000, lower(trim(s_name || 'x')) FROM supplier),
      b AS (SELECT id, n, substr(n, 1, 16) AS blk FROM base)
      SELECT l.id AS id_a, r.id AS id_b,
             levenshtein(l.n, r.n) AS edit_distance
      FROM b l JOIN b r ON l.blk = r.blk AND l.id < r.id
      WHERE levenshtein(l.n, r.n) <= 2""")
def dedup_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage fuzzy dedup: suppliers plus one suffix-mutated copy
    each, blocked on a 16-char name prefix, Levenshtein ≤ 2 inside blocks.
    Every mutated copy is found (distance 1) without any all-pairs
    comparison — the blocking+edit-distance linkage shape."""
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    mutated = s.select((F.col("s_suppkey") + 100000).alias("s_suppkey"),
                       F.concat(F.col("s_name"), F.lit("x")).alias("s_name"))
    entities = s.unionByName(mutated)
    return dedup.fuzzy_blocked_pairs(entities, "s_suppkey", "s_name",
                                     block_len=16, max_edit=2)


@q("clean_winsorize",
   """WITH pct AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.01) AS p_lo,
               quantile_cont(l_extendedprice, 0.99) AS p_hi
        FROM lineitem GROUP BY l_returnflag)
      SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
             round(CAST(least(greatest(l.l_extendedprice, p_lo), p_hi)
                        AS DECIMAL(28,8)), 2)::DOUBLE AS clipped_price
      FROM lineitem l JOIN pct USING (l_returnflag)""")
def clean_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clip l_extendedprice into its return-flag
    group's [p01, p99] band. Exact percentile bounds (one group shuffle),
    broadcast back, narrow clip — DuckDB's quantile_cont uses the same
    rank-interpolation definition, so the oracle is exact."""
    li = t(spark, sf_dir, "lineitem")
    out = cleaning.winsorize(li, "l_extendedprice",
                             group_cols=["l_returnflag"],
                             lo=0.01, hi=0.99, out_col="__clip")
    from .util import round2
    return out.select("l_orderkey", "l_linenumber", "l_returnflag",
                      round2(F.col("__clip")).alias("clipped_price"))


_MIX_WEIGHTS = {"src0": 100, "src1": 75, "src2": 50, "src3": 25}


@q("sample_weighted_mixture",
   """SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
        FROM documents)
      WHERE (source = 'src0' AND b < 100) OR (source = 'src1' AND b < 75)
         OR (source = 'src2' AND b < 50) OR (source = 'src3' AND b < 25)""")
def sample_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixture (100/75/50/25% of four sources, rest
    dropped) as a pure narrow filter — zero shuffle at any scale."""
    d = t(spark, sf_dir, "documents")
    return sampling.weighted_mixture(d, "source", "doc_id", _MIX_WEIGHTS) \
        .select("doc_id", "source")


@q("text_tfidf_top_terms",
   r"""WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(
                   lower(regexp_replace(text, '^\s+|\s+$', '')), '\s+')) AS t
        FROM documents),
      dt AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
      dfreq AS (SELECT t, count(*) AS doc_freq FROM dt GROUP BY t),
      n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM dt),
      scored AS (
        SELECT doc_id, t AS term, CAST(tf AS BIGINT) AS tf,
               CAST(doc_freq AS BIGINT) AS doc_freq,
               CAST(CAST(round(ln((n_docs + 1.0) / (doc_freq + 1.0)) + 1.0, 6)
                         AS DECIMAL(20,6)) * tf AS DOUBLE) AS tfidf
        FROM dt JOIN dfreq USING (t), n)
      SELECT doc_id, term, tf, doc_freq, tfidf, CAST(rank AS INT) AS rank
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY tfidf DESC, term) AS rank
            FROM scored)
      WHERE rank <= 5""")
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF terms (smoothed sklearn-style idf,
    decimal-routed scoring so the oracle is exact — see
    operators.text.tfidf_top_terms for the scale rationale: one uniform
    doc-term shuffle, broadcast vocabulary, no Zipf-skewed shuffle key)."""
    d = t(spark, sf_dir, "documents")
    return text.tfidf_top_terms(d, "doc_id", "text", k=5)


@q("sample_token_budget",
   r"""WITH sized AS (
        SELECT doc_id, source,
               len(string_split_regex(regexp_replace(text, '^\s+|\s+$', ''),
                                      '\s+'))::BIGINT AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source
                   ORDER BY md5(doc_id::VARCHAR) NULLS FIRST, doc_id NULLS FIRST
                   ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
        FROM sized)
      SELECT doc_id, source, n_tokens FROM c WHERE cum_before < 800""")
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture: greedily fill each source up to 800 tokens in
    hash order (training mixes are token-denominated — a long-doc source
    must not overshoot its share). Window running sum on the source key;
    oracle replays the identical hash order + cumsum, exact."""
    d = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(
        F.regexp_replace(F.col("text"), r"^\s+|\s+$", ""), r"\s+"))
    sized = d.select("doc_id", "source",
                     n_tokens.cast("long").alias("n_tokens"))
    return sampling.token_budget_per_group(
        sized, "source", "n_tokens", budget=800, key="doc_id")


@q("sample_temperature_mixture",
   r"""WITH sized AS (
        SELECT doc_id, source,
               len(string_split_regex(regexp_replace(text, '^\s+|\s+$', ''),
                                      '\s+'))::BIGINT AS n_tokens
        FROM documents),
      n AS (SELECT source, sum(n_tokens) AS ns FROM sized GROUP BY source),
      z AS (SELECT sum(sqrt(ns::DOUBLE)) AS z FROM n),
      b AS (SELECT source,
                   floor(8000.0 * sqrt(ns::DOUBLE) / z) AS budget
            FROM n, z),
      c AS (
        SELECT s.doc_id, s.source, s.n_tokens, b.budget,
               sum(s.n_tokens) OVER (PARTITION BY s.source
                   ORDER BY md5(s.doc_id::VARCHAR) NULLS FIRST,
                            s.doc_id NULLS FIRST
                   ROWS UNBOUNDED PRECEDING) - s.n_tokens AS cum_before
        FROM sized s JOIN b USING (source))
      SELECT doc_id, source, n_tokens FROM c WHERE cum_before < budget""")
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixing (GPT-3/Pile α=0.5): per-source token
    budgets ∝ sqrt(source token count) — small sources upweighted
    relative to raw size — filled greedily in hash order. sqrt is
    IEEE-correctly-rounded, so the budgets (and therefore the exact doc
    selection) reproduce bit-for-bit on any engine; the totals reduce
    to a broadcast-sized source table, so the only shuffle is the same
    per-source window the fixed-budget mixer pays."""
    d = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(
        F.regexp_replace(F.col("text"), r"^\s+|\s+$", ""), r"\s+"))
    sized = d.select("doc_id", "source",
                     n_tokens.cast("long").alias("n_tokens"))
    return sampling.temperature_mixture(
        sized, "source", "n_tokens", "doc_id", total_budget=8000) \
        .select("doc_id", "source", "n_tokens")


@q("dedup_canonical_longest",
   _PAIRS_SQL + r""",
  edges AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
  reach AS (
    SELECT a AS id, a AS r FROM edges
    UNION
    SELECT e.b AS id, reach.r FROM reach JOIN edges e ON e.a = reach.id),
  cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
  labeled AS (
    SELECT c.doc_id, coalesce(cc.component, c.doc_id) AS cluster_id,
           len(string_split_regex(regexp_replace(c.text, '^\s+|\s+$', ''),
                                  '\s+'))::BIGINT AS n_tokens
    FROM """ + _CHAINED_SQL + r""" c
    LEFT JOIN cc ON cc.id = c.doc_id)
  SELECT doc_id, cluster_id, n_tokens,
         row_number() OVER (PARTITION BY cluster_id
             ORDER BY n_tokens DESC, doc_id) = 1 AS is_canonical
  FROM labeled""")
def dedup_canonical_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-the-best dedup decision: cluster resolution (word-3-gram Jaccard
    pairs → connected components) re-flagged so each cluster keeps its
    LONGEST member (ties → lowest id) — the standard keep-longest corpus
    rule; min-id canonicals would keep the base doc and throw away the
    suffix-extended copies this fixture plants. Oracle replays the full
    recursive-CTE closure + the same window, exact. The closure itself is
    the shared ``_labeled_chained`` artifact — this query adds only one
    window on the cluster id."""
    members = _labeled_chained(spark, sf_dir)
    return graph.canonical_by_score(members, "doc_id", "cluster_id",
                                    "n_tokens")


@q("sample_weighted_without_replacement",
   r"""WITH sized AS (
        SELECT doc_id, source,
               len(string_split_regex(regexp_replace(text, '^\s+|\s+$', ''),
                                      '\s+'))::BIGINT AS n_tokens
        FROM documents),
      ranked AS (
        SELECT doc_id, source, n_tokens,
               ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT + 1)
                  / 4503599627370496.0) / n_tokens AS es
        FROM sized WHERE n_tokens > 0)
      SELECT doc_id, source, n_tokens FROM ranked
      QUALIFY row_number() OVER (PARTITION BY source
                                 ORDER BY es DESC, doc_id) <= 5""")
def sample_weighted_without_replacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement: 5 docs
    per source, weight = token count (longer docs proportionally more
    likely). Rank = ln(u)/w with u hash-derived — deterministic, one
    window shuffle, exact oracle (both engines evaluate the identical ln
    on the identical hash-u; ranks tie only at ~2^-52)."""
    d = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(
        F.regexp_replace(F.col("text"), r"^\s+|\s+$", ""), r"\s+"))
    sized = d.select("doc_id", "source",
                     n_tokens.cast("long").alias("n_tokens"))
    return sampling.weighted_sample_per_group(
        sized, "source", 5, "doc_id", "n_tokens")


@q("clean_zscore",
   """WITH mom AS (
        SELECT l_returnflag,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS s,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(19,6))
                        * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS ss,
               count(l_extendedprice) AS n
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_orderkey, l_linenumber, l.l_returnflag,
             round(CASE WHEN n > 1 THEN
               (l_extendedprice - s / CAST(n AS DOUBLE))
               / sqrt((ss - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
             END, 6) AS price_z
      FROM lineitem l JOIN mom USING (l_returnflag)""")
def clean_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group standardization of l_extendedprice over the return flag.
    The moments accumulate in exact decimal (order-independent), so the
    z-scores are parallelism-invariant; a 6-decimal round absorbs the
    engines' last-ulp decimal→double conversion difference. Two passes,
    broadcast moments, no second shuffle (operators/cleaning.py:zscore)."""
    li = t(spark, sf_dir, "lineitem")
    out = cleaning.zscore(li, "l_extendedprice",
                          group_cols=["l_returnflag"], out_col="price_z")
    # round(6): the decimal moments are exact, but each engine's
    # decimal→double conversion may differ in the last ulp (~1e-16)
    return out.select("l_orderkey", "l_linenumber", "l_returnflag",
                      F.round(F.col("price_z"), 6).alias("price_z"))


# ------------------------------------------------- end-to-end curation run

def _curate_oracle() -> str:
    """Composed oracle for the full curation pipeline — each stage's SQL is
    the same fragment its standalone query proved (gopher filter, exact
    dedup, jaccard pairs + recursive-CTE closure + keep-longest,
    8-gram decontamination, token budget, packing, shard layout)."""
    from .llm import _GOPHER_ORACLE

    return r"""WITH RECURSIVE
  g AS (""" + _GOPHER_ORACLE + r"""),
  kept AS (
    SELECT d.doc_id, d.text, d.source
    FROM documents d JOIN g USING (doc_id) WHERE g.keep = 1),
  ex AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
  exd AS (SELECT k.doc_id, k.text, k.source FROM kept k JOIN ex USING (doc_id)),
  tok AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM exd),
  pos AS (
    SELECT doc_id, w, unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS i
    FROM tok),
  sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
         FROM pos),
  szd AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id),
  pairs AS (
    SELECT id_a, id_b FROM inter
    JOIN szd sa ON sa.doc_id = id_a
    JOIN szd sb ON sb.doc_id = id_b
    WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.6),
  edges AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
  reach AS (
    SELECT a AS id, a AS r FROM edges
    UNION
    SELECT e.b AS id, reach.r FROM reach JOIN edges e ON e.a = reach.id),
  cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
  sized AS (
    SELECT doc_id, source, text,
           len(string_split_regex(regexp_replace(text, '^\s+|\s+$', ''),
                                  '\s+'))::BIGINT AS n_tokens
    FROM exd),
  labeled AS (
    SELECT s.doc_id, s.source, s.text, s.n_tokens,
           coalesce(cc.component, s.doc_id) AS cluster_id
    FROM sized s LEFT JOIN cc ON cc.id = s.doc_id),
  canon AS (
    SELECT doc_id, source, text, n_tokens FROM labeled
    QUALIFY row_number() OVER (PARTITION BY cluster_id
                               ORDER BY n_tokens DESC, doc_id) = 1),
  btok AS (
    SELECT string_split_regex(trim(text), '\s+') AS w
    FROM documents WHERE doc_id % 20 = 0),
  bg AS (
    SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS ng
    FROM (SELECT w, unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
          FROM btok)),
  ctok AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM canon),
  cg AS (
    SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS ng
    FROM (SELECT doc_id, w,
                 unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
          FROM ctok)),
  bad AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (ng)),
  decon AS (SELECT doc_id, source, n_tokens FROM canon
            ANTI JOIN bad USING (doc_id)),
  cum AS (
    SELECT doc_id, source, n_tokens,
           sum(n_tokens) OVER (PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR) NULLS FIRST, doc_id NULLS FIRST
               ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
    FROM decon),
  sampled AS (SELECT doc_id, source, n_tokens FROM cum WHERE cum_before < 800),
  pg AS (
    SELECT doc_id, source, n_tokens,
           ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 8))::BIGINT % 8
             AS pack_group
    FROM sampled),
  ps AS (
    SELECT doc_id, source, n_tokens, pack_group,
           sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id)
             - n_tokens AS strt
    FROM pg)
  SELECT doc_id, source, n_tokens, pack_group,
         CAST(strt // 64 AS BIGINT) AS seq_id,
         CAST(strt % 64 AS BIGINT) AS seq_offset,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard,
         row_number() OVER (
             PARTITION BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
                          ::BIGINT % 8
             ORDER BY md5(doc_id::VARCHAR) NULLS FIRST,
                      doc_id NULLS FIRST) - 1 AS shard_pos
  FROM ps"""


@q("curate_pipeline", _curate_oracle())
def curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REALISTIC end-to-end corpus-curation run, every stage an
    operator this registry proves individually, composed into one plan:

    1. Gopher/C4 quality filter (keep conjunction) — narrow scan;
    2. exact content dedup (md5 group, keep lowest id) — one uniform
       128-bit shuffle;
    3. word-3-gram Jaccard ≥ 0.6 near-dup pairs (PPJoin prefix filter) →
       alternating-star connected components → keep-LONGEST canonical per
       cluster;
    4. 8-gram decontamination against the benchmark subset
       (doc_id % 20 = 0) — broadcast gram anti-probe;
    5. per-source token-budget fill (800 tokens, md5 hash order);
    6. sequence packing (capacity 64, 8 hash groups);
    7. deterministic shard layout (8 shards, md5 rank) — the final
       training-ready index.

    At 100 TB every stage keeps its standalone scale shape (no stage
    collects or re-keys another's shuffle unnecessarily): the fused plan
    is scan → digest shuffle → pair join on rare prefixes → log-round
    closure → broadcast probe → three keyed windows. The oracle composes
    the SAME per-stage SQL fragments the standalone queries verify,
    closure included (recursive CTE) — end-to-end exact."""
    d = t(spark, sf_dir, "documents")
    fl = text.gopher_flags("text")
    kept = d.where(fl["keep"]).select("doc_id", "text", "source")
    # the filtered+exact-deduped corpus feeds FOUR independent subtrees
    # (token sizing, the pair join's shingle pipeline, the closure's
    # vertex universe, decontamination) — materialize it once (see
    # ngram_jaccard_pairs for the localCheckpoint-vs-persist rationale
    # and the executor-loss trade-off)
    exd = dedup.exact_dedup(kept, "text", "doc_id") \
               .localCheckpoint(eager=False)
    n_tokens = F.size(F.split(
        F.regexp_replace(F.col("text"), r"^\s+|\s+$", ""), r"\s+"))
    sized = exd.select("doc_id", "source", "text",
                       n_tokens.cast("long").alias("n_tokens"))
    pairs = dedup.ngram_jaccard_pairs(exd, "doc_id", "text", k=3,
                                      threshold=0.6, unit="word") \
                 .select("id_a", "id_b")
    labeled = graph.cluster_dedup(pairs, exd, "doc_id").drop("is_canonical")
    members = labeled.join(sized, "doc_id")
    # decontaminate scans its corpus twice (exploded grams + the doc-level
    # collapse join) — materialize the canonical survivors once
    canon = graph.canonical_by_score(members, "doc_id", "cluster_id",
                                     "n_tokens") \
                 .where(F.col("is_canonical")).localCheckpoint(eager=False)
    benchmark = d.where(F.col("doc_id") % 20 == 0)
    decon = dedup.decontaminate(canon, benchmark, "doc_id", "text", n=8)
    sampled = sampling.token_budget_per_group(
        decon.select("doc_id", "source", "n_tokens"),
        "source", "n_tokens", budget=800, key="doc_id")
    packed = packing.pack_sequences(sampled, "doc_id", "n_tokens",
                                    capacity=64, n_groups=8)
    sharded = sampling.assign_shards(packed, "doc_id", 8)
    return sharded.select(
        "doc_id", "source", "n_tokens", "pack_group",
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("seq_offset").cast("long").alias("seq_offset"),
        "shard", F.col("shard_pos").cast("long").alias("shard_pos"))


@q("clean_quantile_bins",
   """SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(ntile(10) OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, l_orderkey,
                                           l_linenumber) AS INT) AS price_bin
      FROM lineitem""")
def clean_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count decile binning of l_extendedprice per return flag
    (difficulty-curriculum / monotone-binning primitive). Order pinned
    with the fact's unique key so boundary ties are parallelism-proof
    (operators/cleaning.py:quantile_bins)."""
    li = t(spark, sf_dir, "lineitem")
    out = cleaning.quantile_bins(li, "l_extendedprice", 10,
                                 group_cols=["l_returnflag"],
                                 tiebreak_cols=["l_orderkey", "l_linenumber"],
                                 out_col="price_bin")
    return out.select("l_orderkey", "l_linenumber", "l_returnflag",
                      "price_bin")


@q("dedup_contamination_scores",
   r"""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents),
      bg AS (
        SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS g
        FROM (SELECT w, unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
              FROM tok WHERE doc_id % 20 = 0)),
      cg AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS g
        FROM (SELECT doc_id, w,
                     unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
              FROM tok))
      SELECT cg.doc_id, count(*) AS n_grams,
             CAST(sum(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_contaminated,
             CAST(sum(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) / count(*) AS contamination_frac
      FROM cg LEFT JOIN bg ON cg.g = bg.g
      GROUP BY cg.doc_id""")
def dedup_contamination_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded benchmark contamination: per doc, the fraction of its
    distinct word 8-grams appearing in the benchmark subset
    (doc_id % 20 = 0) — the policy-thresholdable twin of the binary
    decontaminate scrub (operators/dedup.py:contamination_scores)."""
    d = t(spark, sf_dir, "documents")
    benchmark = d.where(F.col("doc_id") % 20 == 0)
    return dedup.contamination_scores(d, benchmark, "doc_id", "text", n=8)


@q("profile_lineitem",
   """SELECT 'l_quantity' AS col_name, count(*) AS n_rows,
             CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_nulls,
             count(DISTINCT l_quantity) AS n_distinct,
             CAST(min(l_quantity) AS DOUBLE) AS min_val,
             CAST(max(l_quantity) AS DOUBLE) AS max_val
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', count(*),
             CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             count(DISTINCT l_extendedprice),
             CAST(min(l_extendedprice) AS DOUBLE),
             CAST(max(l_extendedprice) AS DOUBLE)
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', count(*),
             CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             count(DISTINCT l_discount),
             CAST(min(l_discount) AS DOUBLE),
             CAST(max(l_discount) AS DOUBLE)
      FROM lineitem
      UNION ALL
      SELECT 'l_partkey', count(*),
             CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             count(DISTINCT l_partkey),
             CAST(min(l_partkey) AS DOUBLE),
             CAST(max(l_partkey) AS DOUBLE)
      FROM lineitem""")
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of the fact table (nulls / exact distinct /
    range per column) — the generalized form of the reference's per-table
    quality probes (etl_quality_checks.py): k columns profiled in ONE wide
    aggregate pass, not k scans (operators/profiling.py)."""
    from walmart_project_etl_spark.operators import profiling
    li = t(spark, sf_dir, "lineitem")
    return profiling.profile_columns(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_partkey"])


# ------------------------------------------------- line-level dedup / CDC / ts

@q("dedup_boilerplate_lines",
   r"""WITH corpus AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0
                    THEN 'SUBSCRIBE NOW' || chr(10) || text || chr(10)
                         || 'copyright footer 2020'
                    ELSE text END AS text
        FROM documents),
      lx AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus),
      pos AS (SELECT doc_id, ls,
                     unnest(range(1, len(ls) + 1)) AS i
              FROM lx),
      lines AS (SELECT doc_id, i AS idx, ls[i::INT] AS line FROM pos),
      freq AS (SELECT line, count(DISTINCT doc_id) AS docs
               FROM lines GROUP BY line),
      joined AS (SELECT l.doc_id, l.idx, l.line, f.docs
                 FROM lines l JOIN freq f USING (line))
      SELECT doc_id,
             coalesce(string_agg(line, chr(10) ORDER BY idx)
                        FILTER (WHERE docs < 2), '') AS text_clean,
             count(*) AS n_lines,
             CAST(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped
      FROM joined GROUP BY doc_id""")
def dedup_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line-level dedup (CCNet/RefinedWeb boilerplate
    removal): every line appearing in ≥2 documents is dropped and the
    documents reassembled from the survivors. Fixture plants a shared
    header + footer on every even doc — the operator must strip exactly
    those while preserving each unique body (operators/dedup.py:
    dedup_lines; one md5-keyed line shuffle, no all-pairs)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat_ws("\n", F.lit("SUBSCRIBE NOW"), F.col("text"),
                           F.lit("copyright footer 2020")))
         .otherwise(F.col("text")).alias("text"))
    out = dedup.dedup_lines(corpus, "doc_id", "text", min_count=2)
    return out.select("doc_id", "text_clean",
                      F.col("n_lines").cast("long").alias("n_lines"),
                      F.col("n_dropped").cast("long").alias("n_dropped"))


@q("cdc_snapshot_diff",
   """WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 11 <> 0),
      new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 17 = 0 THEN 'R'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice,
               o_orderpriority
        FROM orders WHERE o_orderkey % 13 <> 0),
      j AS (
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               o.o_orderkey IS NOT NULL AS in_old,
               n.o_orderkey IS NOT NULL AS in_new,
               list_sort(
                 (CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                       THEN ['o_orderstatus'] ELSE []::VARCHAR[] END)
                 || (CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                          THEN ['o_totalprice'] ELSE []::VARCHAR[] END)
                 || (CASE WHEN o.o_orderpriority
                               IS DISTINCT FROM n.o_orderpriority
                          THEN ['o_orderpriority'] ELSE []::VARCHAR[] END))
                 AS ch
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
      SELECT o_orderkey,
             CASE WHEN NOT in_old THEN 'insert'
                  WHEN NOT in_new THEN 'delete'
                  ELSE 'update' END AS op,
             CASE WHEN in_old AND in_new THEN array_to_string(ch, ',')
                  ELSE '' END AS changed_cols
      FROM j
      WHERE (NOT in_old) OR (NOT in_new) OR len(ch) > 0""")
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot CDC: diff yesterday's vs today's orders extract into the
    insert/delete/update feed with per-row changed-column lists — the
    delta-sized feed that replaces full-snapshot MERGE at 100 TB
    (operators/cdc.py; one co-partitioned full outer join)."""
    from walmart_project_etl_spark.operators import cdc
    orders = t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    old = orders.where(F.col("o_orderkey") % 11 != 0).select(*cols)
    new = orders.where(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 17 == 0, F.lit("R"))
         .otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 2)
         .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderpriority")
    diff = cdc.snapshot_diff(old, new, ["o_orderkey"])
    return diff.select("o_orderkey", "op",
                       F.array_join("changed_cols", ",").alias("changed_cols"))


@q("ts_gap_fill_locf",
   """WITH sparse AS (SELECT * FROM orders WHERE o_orderkey % 50 = 0),
      daily AS (SELECT o_orderpriority, o_orderdate,
                       count(*) AS n_orders, max(o_totalprice) AS max_price
                FROM sparse GROUP BY 1, 2),
      bounds AS (SELECT o_orderpriority, min(o_orderdate) AS lo,
                        max(o_orderdate) AS hi
                 FROM daily GROUP BY 1),
      spine AS (SELECT o_orderpriority,
                       unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
                                              INTERVAL 1 DAY))::DATE
                         AS o_orderdate
                FROM bounds),
      j AS (SELECT s.o_orderpriority, s.o_orderdate, d.n_orders, d.max_price,
                   d.o_orderdate IS NOT NULL AS is_observed
            FROM spine s LEFT JOIN daily d
              USING (o_orderpriority, o_orderdate))
      SELECT o_orderpriority, o_orderdate,
             last_value(n_orders IGNORE NULLS) OVER w AS n_orders_filled,
             last_value(max_price IGNORE NULLS) OVER w AS max_price_filled,
             is_observed
      FROM j
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")
def ts_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + forward fill: a sparse per-priority daily
    order series is expanded to every day of each priority's own span and
    the metrics carried forward (LOCF) across the introduced gaps
    (operators/timeseries.py — per-group sequence() spine, no global
    calendar cross join, one window for the fill)."""
    from walmart_project_etl_spark.operators import timeseries
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 50 == 0)
    daily = (orders.groupBy("o_orderpriority", "o_orderdate")
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.max("o_totalprice").alias("max_price")))
    out = timeseries.gap_fill_forward(daily, ["o_orderpriority"],
                                      "o_orderdate",
                                      ["n_orders", "max_price"])
    return out.select("o_orderpriority", "o_orderdate", "n_orders_filled",
                      "max_price_filled", "is_observed")


@q("incr_agg_maintenance",
   """SELECT l_returnflag, l_linestatus, count(l_extendedprice) AS n,
             round(sum(CAST(l_extendedprice AS DECIMAL(28,6))), 2)::DOUBLE
               AS sum_v,
             round(sum(CAST(l_extendedprice AS DECIMAL(28,6)))::DOUBLE
                   / count(l_extendedprice), 6) AS avg_v,
             min(l_extendedprice) AS min_v, max(l_extendedprice) AS max_v
      FROM lineitem GROUP BY 1, 2""")
def incr_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the fact is split
    into a base load + two delta batches; each delta is aggregated
    delta-sized and FOLDED into the mergeable per-key state (count /
    exact decimal sum / min / max) without ever rescanning the base
    (operators/incremental.py). The oracle is the full one-shot
    aggregation — the folded state must equal it bit-exactly, proving
    the merge is order-insensitive and lossless."""
    from walmart_project_etl_spark.operators import incremental
    li = t(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    base = li.where(F.col("l_orderkey") % 4 != 0)
    d1 = li.where(F.col("l_orderkey") % 4 == 0) \
           .where(F.col("l_linenumber") % 2 == 0)
    d2 = li.where(F.col("l_orderkey") % 4 == 0) \
           .where(F.col("l_linenumber") % 2 != 0)
    state = incremental.agg_state(base, keys, "l_extendedprice")
    state = incremental.merge_agg_state(
        state, incremental.agg_state(d1, keys, "l_extendedprice"), keys)
    state = incremental.merge_agg_state(
        state, incremental.agg_state(d2, keys, "l_extendedprice"), keys)
    return incremental.finalize(state, keys)


@q("dedup_decontaminate_semantic", pinned("dedup_decontaminate_semantic"))
def dedup_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic decontamination: corpus embeddings within
    cosine 0.85 of ANY benchmark embedding (vec_id % 20 == 0) are dropped
    via cross-table hyperplane-LSH banding + exact-cosine verify — the
    paraphrase-robust twin of the n-gram dedup_decontaminate
    (operators/dedup.py:decontaminate_semantic). Oracle = pinned sf0.01
    golden of the 475 surviving ids: hyperplane
    draws are engine-internal; the benchmark rows themselves (cosine 1.0
    to themselves, always probed into their own bucket) are guaranteed
    dropped, pinned with recall tests in tests/."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    benchmark = emb.where(F.col("vec_id") % 20 == 0)
    out = dedup.decontaminate_semantic(emb, benchmark, "vec_id", "embedding",
                                       threshold=0.85)
    return out.select("vec_id").orderBy("vec_id")


@q("incr_distinct_maintenance", pinned("incr_distinct_maintenance"))
def incr_distinct_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental COUNT(DISTINCT) maintenance: per-returnflag HLL
    sketches of l_partkey built on a base load, folded with two delta
    batches by lossless sketch union — the one common metric a
    (count,sum,min,max) state cannot maintain without storing every seen
    value (operators/incremental.py:distinct_state). Oracle = pinned
    sf0.01 golden: the
    estimate is a Datasketches HLL internal; merge-losslessness (folded
    == one-shot sketch) and <5% error vs exact are pinned by
    tests/test_properties.py."""
    from walmart_project_etl_spark.operators import incremental
    li = t(spark, sf_dir, "lineitem")
    keys = ["l_returnflag"]
    base = li.where(F.col("l_orderkey") % 4 != 0)
    d1 = li.where(F.col("l_orderkey") % 4 == 0) \
           .where(F.col("l_linenumber") % 2 == 0)
    d2 = li.where(F.col("l_orderkey") % 4 == 0) \
           .where(F.col("l_linenumber") % 2 != 0)
    state = incremental.distinct_state(base, keys, "l_partkey")
    state = incremental.merge_distinct_state(
        state, incremental.distinct_state(d1, keys, "l_partkey"), keys)
    state = incremental.merge_distinct_state(
        state, incremental.distinct_state(d2, keys, "l_partkey"), keys)
    return incremental.finalize_distinct(state, keys).orderBy("l_returnflag")


@q("clean_mad_outliers",
   """WITH med AS (SELECT l_returnflag, median(l_extendedprice) AS m
                   FROM lineitem GROUP BY 1),
      dev AS (SELECT l.l_returnflag,
                     median(abs(l.l_extendedprice - med.m)) AS mad
              FROM lineitem l JOIN med USING (l_returnflag)
              GROUP BY 1)
      SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_extendedprice,
             CASE WHEN dev.mad > 0
                  THEN round(0.6745 * (l.l_extendedprice - med.m) / dev.mad, 6)
             END AS l_extendedprice_rz,
             coalesce(abs(round(0.6745 * (l.l_extendedprice - med.m)
                                / dev.mad, 6)) > 3.5, FALSE) AS is_outlier
      FROM lineitem l
      JOIN med USING (l_returnflag) JOIN dev USING (l_returnflag)""")
def clean_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flags on l_extendedprice per return flag: modified
    z-score 0.6745*(x - median)/MAD (Iglewicz-Hoaglin) - the center and
    scale a single wild value cannot drag, unlike clean_zscore
    (operators/cleaning.py:mad_outliers; two group-keyed median passes +
    broadcast joins, oracle-exact interpolated medians)."""
    li = t(spark, sf_dir, "lineitem")
    out = cleaning.mad_outliers(li, "l_extendedprice",
                                group_cols=["l_returnflag"], threshold=3.5)
    return out.select("l_orderkey", "l_linenumber", "l_returnflag",
                      "l_extendedprice", "l_extendedprice_rz", "is_outlier")


@q("profile_key_skew",
   """WITH counts AS (SELECT l_returnflag::VARCHAR AS key_value,
                             count(*) AS cnt
                      FROM lineitem GROUP BY 1),
      tot AS (SELECT sum(cnt) AS n_rows, count(*) AS n_keys FROM counts),
      ranked AS (SELECT key_value, cnt,
                        row_number() OVER (ORDER BY cnt DESC, key_value)
                          AS rank,
                        sum(cnt) OVER (ORDER BY cnt DESC, key_value
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum
                 FROM counts QUALIFY rank <= 5)
      SELECT key_value, cnt, round(cnt / n_rows, 6) AS share,
             round(cum / n_rows, 6) AS cum_share,
             CAST(rank AS BIGINT) AS rank, n_keys,
             round(cnt * n_keys / n_rows, 6) AS skew_ratio
      FROM ranked, tot""")
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profile of a prospective shuffle key (l_returnflag): top-5
    heaviest values with share / cumulative share / skew ratio vs a
    uniform key — the pre-join diagnostic that decides whether a key
    needs salting (operators/profiling.py:key_skew_profile; distributed
    TakeOrderedAndProject top-n, never a global sort)."""
    from walmart_project_etl_spark.operators import profiling
    li = t(spark, sf_dir, "lineitem")
    out = profiling.key_skew_profile(li, ["l_returnflag"], top_n=5)
    return out.select("key_value", "cnt", "share", "cum_share",
                      F.col("rank").cast("long").alias("rank"),
                      "n_keys", "skew_ratio")


@q("pipe_bpe_tokenize_pack", pinned("pipe_bpe_tokenize_pack"))
def pipe_bpe_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END tokenizer-to-shards prep — the last mile of a training
    data pipeline, composed from the real operators: train a BPE merge
    table on the corpus (`operators/bpe.py`), encode every document with
    it (distinct-word tokenize + broadcast join back), pack the REAL
    BPE token counts into GPT-style fixed-capacity sequences
    (`packing.pack_sequences`, capacity 128), and lay the docs out into
    reproducible training shards (`sampling.assign_shards`). One corpus
    scan for the word counts, one for the encode; everything downstream
    is doc-metadata-sized. Pinned golden (the BPE table is
    engine-internal); the stage operators each carry their own exact or
    pinned oracle elsewhere in the registry."""
    from walmart_project_etl_spark.operators import bpe

    d = t(spark, sf_dir, "documents")
    merges = bpe.bpe_train(d, "text", n_merges=24)
    enc = bpe.bpe_encode(d, "doc_id", "text", merges) \
        .select("doc_id", "n_tokens")
    packed = packing.pack_sequences(enc, "doc_id", "n_tokens",
                                    capacity=128, n_groups=8)
    sharded = sampling.assign_shards(packed, "doc_id", n_shards=4)
    return sharded.select(
        "doc_id", "n_tokens", "pack_group",
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("seq_offset").cast("long").alias("seq_offset"),
        F.col("shard").cast("long").alias("shard"),
        F.col("shard_pos").cast("long").alias("shard_pos"))


# ------------------------------------------------- DSIR importance resampling

#: shared oracle CTE: hashed unigram buckets of every document's tokens
#: (md5 bucket — the engine-reproducible hash the sampling family uses),
#: plus the Laplace-smoothed target (lang='en') vs raw log-ratio per
#: bucket, 6-dp-rounded DECIMAL exactly like the Spark side
_DSIR_LR_SQL = r"""
    tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(
                 lower(regexp_replace(text, '^\s+|\s+$', '')), '\s+')) AS t
      FROM documents),
    bk AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(t), 1, 8))::BIGINT % 10000 AS b
      FROM tok),
    tcnt AS (SELECT b, count(*) AS c FROM bk WHERE lang = 'en' GROUP BY b),
    ttot AS (SELECT count(*) AS n FROM bk WHERE lang = 'en'),
    rcnt AS (SELECT b, count(*) AS c FROM bk GROUP BY b),
    rtot AS (SELECT count(*) AS n FROM bk),
    lr AS (
      SELECT r.b,
             CAST(round(
                 ln(COALESCE((t.c + 1.0) / (ttot.n + 10000.0),
                             1.0 / (ttot.n + 10000.0)))
                 - ln((r.c + 1.0) / (rtot.n + 10000.0)), 6)
               AS DECIMAL(20,6)) AS lr
      FROM rcnt r LEFT JOIN tcnt t ON r.b = t.b, ttot, rtot),
    dc AS (SELECT doc_id, b, count(*) AS c FROM bk GROUP BY doc_id, b),
    w AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(lr * c) AS DOUBLE) AS logw
      FROM dc JOIN lr USING (b) GROUP BY doc_id)"""


@q("sel_dsir_weights",
   f"""WITH {_DSIR_LR_SQL}
      SELECT doc_id, n_tokens, logw FROM w""")
def sel_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed-unigram bucket
    distributions fit on the target (lang='en') and the raw pool, then
    every raw doc scores ``Σ ln(p_target(bucket)/p_raw(bucket))``. The
    bucket tables reduce to 10k rows (broadcast-sized at any corpus
    size), so scoring is one token explode + broadcast join + per-doc
    sum — the unigram-LM cost envelope at 100 TB. Exact oracle: md5
    buckets, 6-dp DECIMAL log-ratios."""
    from walmart_project_etl_spark.operators import selection

    d = t(spark, sf_dir, "documents")
    return selection.dsir_importance_weights(
        d.where(F.col("lang") == "en"), d, "doc_id", "text")


@q("sel_dsir_resample",
   f"""WITH {_DSIR_LR_SQL},
      keyed AS (
        SELECT doc_id, n_tokens, logw,
               round(logw - ln(-ln(
                   (('0x' || substr(md5('dsir|' || doc_id::VARCHAR),
                                    1, 15))::BIGINT + 0.5)
                   / 1152921504606846976.0)), 6) AS sel_key
        FROM w)
      SELECT doc_id, n_tokens, logw, sel_key FROM keyed
      QUALIFY row_number() OVER (ORDER BY sel_key DESC, doc_id) <= 64""")
def sel_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR Gumbel top-k resampling: add seeded Gumbel noise (from the
    md5 of the doc id — engine-reproducible, no RNG) to each log-weight
    and keep the 64 largest keys — exactly a weighted
    without-replacement draw of 64 docs with probability ∝ exp(logw).
    Plans as TakeOrdered (per-partition top-k + one driver merge of
    64-row heads), never a full sort shuffle — the selection step stays
    O(k) past the scoring aggregates at any pool size."""
    from walmart_project_etl_spark.operators import selection

    d = t(spark, sf_dir, "documents")
    w = selection.dsir_importance_weights(
        d.where(F.col("lang") == "en"), d, "doc_id", "text")
    return selection.dsir_resample(w, "doc_id", k=64)


@q("sel_mix_kl_report",
   r"""WITH tok AS (
        SELECT source,
               unnest(string_split_regex(
                   lower(regexp_replace(text, '^\s+|\s+$', '')),
                   '\s+')) AS t
        FROM documents),
      st AS (SELECT source, t, count(*) AS c FROM tok
             WHERE t <> '' GROUP BY source, t),
      ns AS (SELECT source, sum(c) AS ns FROM st GROUP BY source),
      v AS (SELECT t, sum(c) AS vc FROM st GROUP BY t),
      tot AS (SELECT sum(vc) AS n FROM v),
      terms AS (
        SELECT st.source, st.c, ns.ns,
               CAST(round(ln(st.c / ns.ns), 6) AS DECIMAL(20,6)) AS hp,
               CAST(round(ln((st.c / ns.ns) / (v.vc / tot.n)), 6)
                 AS DECIMAL(20,6)) AS klp
        FROM st JOIN ns USING (source) JOIN v USING (t), tot)
      SELECT source, CAST(any_value(ns) AS BIGINT) AS n_tokens,
             -CAST(sum(hp * c) AS DOUBLE) / any_value(ns) AS entropy,
             CAST(sum(klp * c) AS DOUBLE) / any_value(ns) AS kl_vs_corpus
      FROM terms GROUP BY source""")
def sel_mix_kl_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing diagnostics (operators/selection.py:
    mixture_divergence_report): per-source unigram entropy + KL from
    the whole-corpus distribution — what DoReMi-style mixture tuning
    monitors when composing a training mix. One token explode, one
    (source, token) aggregation, the corpus distribution derived from
    the same table; log terms round-6 then DECIMAL-sum, so the report
    is exact on any engine at any summation order."""
    from walmart_project_etl_spark.operators import selection

    d = t(spark, sf_dir, "documents")
    return selection.mixture_divergence_report(d, "source", "text")


@q("pipe_dsir_select_pack",
   f"""WITH {_DSIR_LR_SQL},
      keyed AS (
        SELECT doc_id, n_tokens, logw,
               round(logw - ln(-ln(
                   (('0x' || substr(md5('dsir|' || doc_id::VARCHAR),
                                    1, 15))::BIGINT + 0.5)
                   / 1152921504606846976.0)), 6) AS sel_key
        FROM w),
      sel AS (
        SELECT doc_id, n_tokens FROM keyed
        QUALIFY row_number() OVER (ORDER BY sel_key DESC, doc_id) <= 128),
      g AS (
        SELECT doc_id, n_tokens,
               ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 8))::BIGINT
                 % 4 AS pack_group
        FROM sel),
      s AS (
        SELECT doc_id, n_tokens, pack_group,
               sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id)
                 - n_tokens AS strt
        FROM g)
      SELECT doc_id, n_tokens, pack_group,
             CAST(strt // 128 AS BIGINT) AS seq_id,
             CAST(strt % 128 AS BIGINT) AS seq_offset
      FROM s""")
def pipe_dsir_select_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed selection pipeline: DSIR importance weights over the
    raw pool (target = lang='en') → Gumbel top-128 without-replacement
    draw → GPT-style concatenate-and-split packing of the selected
    docs (capacity 128, 4 hash groups). The whole chain — corpus
    scoring, weighted selection, and training layout — stays one lazy
    plan with exactly the scoring shuffle, a TakeOrdered, and one
    packing window; the oracle replays every stage in SQL, exact."""
    from walmart_project_etl_spark.operators import selection

    d = t(spark, sf_dir, "documents")
    w = selection.dsir_importance_weights(
        d.where(F.col("lang") == "en"), d, "doc_id", "text")
    sel = selection.dsir_resample(w, "doc_id", k=128) \
        .select("doc_id", "n_tokens")
    packed = packing.pack_sequences(sel, "doc_id", "n_tokens",
                                    capacity=128, n_groups=4)
    return packed.select("doc_id", "n_tokens", "pack_group",
                         F.col("seq_id").cast("long").alias("seq_id"),
                         F.col("seq_offset").cast("long")
                          .alias("seq_offset"))


@q("pipe_exactsubstr_unigram_pack", pinned("pipe_exactsubstr_unigram_pack"))
def pipe_exactsubstr_unigram_pack(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The r12 text-pipeline composition: ExactSubstr span removal
    (drop every copy of corpus-duplicated 8-token spans — Lee et al.
    2022) → unigram-LM tokenization of the CLEANED text (Viterbi over
    distinct words, broadcast token-count map) → GPT-style packed
    layout (capacity-128 concatenate-and-split index over 16 hash
    groups). Three corpus scans total; the only non-SQL stage is the
    tokenizer's Viterbi DP, so the composed output pins as a golden.
    Returns one row per surviving document: its packed position and
    token accounting."""
    from walmart_project_etl_spark.operators import (dedup, packing,
                                                     unigram)
    docs = t(spark, sf_dir, "documents")
    clean = dedup.remove_duplicate_spans(docs, "text", "doc_id",
                                         width=8, hash_fn="md5")
    clean = clean.where(F.col("n_tokens") > F.col("n_removed")) \
                 .select("doc_id", F.col("clean_text").alias("text"))
    vocab = unigram.unigram_train(docs, "text", vocab_size=300, rounds=2)
    enc = unigram.unigram_encode(clean, vocab, "text", "doc_id")
    packed = packing.pack_sequences(enc, "doc_id", "n_tokens",
                                    capacity=128, n_groups=16)
    return packed.select("doc_id", "n_words", "n_tokens",
                         "pack_group", "seq_id", "seq_offset")


@q("pack_bins_bfd", pinned("pack_bins_bfd"))
def pack_bins_bfd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEST-FIT-DECREASING bin packing (operators/packing.py — the
    no-straddle twin of pack_sequences, for training recipes where
    attention must not cross document boundaries): whitespace token
    counts per document, BFD inside 16 hash groups via one
    applyInPandas hop (per-task state = one group, capacity 128, docs
    over capacity rejected upstream by the length filter). Oracle =
    pinned sf0.01 golden (the greedy DP is engine-internal but fully
    deterministic: decreasing sort with id tie-breaks, lowest-bin-id
    fullest-fit)."""
    from walmart_project_etl_spark.operators.packing import pack_bins_bfd
    docs = t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), r"\s+"),
                        lambda x: x != "")).cast("long")
         .alias("n_tokens")).where(F.col("n_tokens") <= 128)
    return pack_bins_bfd(sized, "doc_id", "n_tokens", capacity=128,
                         n_groups=16)
