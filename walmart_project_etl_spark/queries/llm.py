"""LLM training-data pipeline queries over documents/embeddings/events.

Driver north-star surface: dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard), similarity search (brute-force + LSH ANN), text analysis
(lang-id, quality, token counts, fingerprints), multimodal plumbing, and
the streaming twins. Oracles replicate the exact operator semantics in
DuckDB SQL; engine-internal outputs (xxhash64 signatures, seeded LSH
planes, seeded KMeans, sketches) carry pinned sf0.01 goldens instead
(queries/goldens/, tools/pin_golden.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from walmart_project_etl_spark.operators import (dedup, events, multimodal,
                                                 similarity, sketch, text)

from .util import dsum, embeddings_dir, events_dir, events_t, pinned, t

QUERIES: dict = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn
    return deco


def _docs_with_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies at doc_id+100000 — gives dedup something to
    deduplicate (the driver corpus is all-distinct)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text")
    return d.unionByName(copies)


_DUPES_SQL = """(SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id + 100000, text FROM documents WHERE doc_id % 3 = 0)"""


@q("dedup_exact",
   f"""SELECT min(doc_id) AS doc_id FROM {_DUPES_SQL} corpus
      GROUP BY md5(text)""")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 digest group, keep lowest id (hash-groupBy — one
    uniform shuffle, no skew at any corpus size)."""
    corpus = _docs_with_dupes(spark, sf_dir)
    return dedup.exact_dedup(corpus, "text", "doc_id").select("doc_id")


@q("dedup_ngram_jaccard",
   f"""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM {_DUPES_SQL} corpus),
      pos AS (SELECT doc_id, w,
                     unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS i
              FROM tok),
      sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
             FROM pos),
      sized AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT id_a, id_b,
             round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
      FROM inter
      JOIN sized sa ON sa.doc_id = id_a
      JOIN sized sb ON sb.doc_id = id_b
      WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.6""")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs over the planted-dup corpus
    (word 3-grams, threshold 0.6 — the C4/RefinedWeb-style shingle unit),
    via the PPJoin prefix-filtered plan in operators/dedup.py. Word
    shingles keep the prefix filter selective on low-entropy text where
    char 5-grams are shared by nearly every document (all-pairs candidate
    blowup — 97 s vs ~5 s at sf0.1 on this corpus)."""
    corpus = _docs_with_dupes(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(corpus, "doc_id", "text",
                                     k=3, threshold=0.6, unit="word")


@q("dedup_ngram_containment",
   r"""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 300000,
               text || ' now follows a much longer unrelated tail '
                    || repeat('pad word block ', 15)
        FROM documents WHERE doc_id % 5 = 0),
      tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM corpus),
      pos AS (SELECT doc_id, w,
                     unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS i
              FROM tok),
      sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
             FROM pos),
      sized AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT id_a, id_b,
             round(n_inter / least(sa.n_sh, sb.n_sh), 6) AS containment
      FROM inter
      JOIN sized sa ON sa.doc_id = id_a
      JOIN sized sb ON sb.doc_id = id_b
      WHERE n_inter / least(sa.n_sh, sb.n_sh) >= 0.9""")
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs (word trigrams, >= 0.9): catches
    the planted doc-in-doc expansions (each doc_id%5 doc re-posted inside
    ~45 words of new padding — containment ~1.0, Jaccard ~0.5, invisible
    to any precise Jaccard threshold). Min-side prefix filter × full
    index per operators/dedup.py:ngram_containment_pairs."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    expanded = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(F.col("text"),
                 F.lit(" now follows a much longer unrelated tail "),
                 F.expr("repeat('pad word block ', 15)")).alias("text"))
    corpus = d.unionByName(expanded)
    return dedup.ngram_containment_pairs(corpus, "doc_id", "text",
                                         k=3, threshold=0.9, unit="word")


@q("dedup_minhash_lsh", pinned("dedup_minhash_lsh"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH banding (16×4) near-dup pairs at est-Jaccard ≥ 0.5.
    Signatures are xxhash64-based (no DuckDB twin), so the oracle pins the
    full 211-pair sf0.01 output. The banded self-join keys on
    uniformly-distributed band hashes — near-linear at 100 TB."""
    corpus = _docs_with_dupes(spark, sf_dir)
    return dedup.minhash_dedup(corpus, "doc_id", "text", threshold=0.5) \
                .orderBy("id_a", "id_b")


@q("dedup_simhash", pinned("dedup_simhash"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash64 near-dup pairs (Hamming ≤ 3) with 16-bit-chunk pigeonhole
    blocking. xxhash64-based — oracle pins the full sf0.01 pair set."""
    corpus = _docs_with_dupes(spark, sf_dir)
    return dedup.simhash_dedup(corpus, "doc_id", "text", max_hamming=3)


# ------------------------------------------------------------- similarity

_COSINE_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 100 = 7),
c AS (SELECT vec_id, embedding FROM embeddings),
scored AS (
  SELECT q.query_id, c.vec_id,
         round(
           list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
              * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
           6) AS cosine_sim
  FROM q, c WHERE c.vec_id <> q.query_id)
SELECT query_id, vec_id, cosine_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 10
"""


@q("sim_cosine_topk", _COSINE_ORACLE)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors (vec_id % 100 = 7):
    broadcast queries × corpus scan, JVM-side zip_with/aggregate dot
    product, per-query window top-k."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 7) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
    return similarity.cosine_topk(emb, queries, k=10)


@q("sim_rrf_fusion", """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS e
           FROM embeddings WHERE vec_id % 100 = 7),
c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
full_s AS (
  SELECT q.query_id, c.vec_id,
         round(list_dot_product(q.e, c.e)
               / (sqrt(list_dot_product(q.e, q.e))
                  * sqrt(list_dot_product(c.e, c.e))), 6) AS s
  FROM q, c WHERE c.vec_id <> q.query_id),
r1 AS (SELECT query_id, vec_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, vec_id) AS rank
       FROM full_s QUALIFY rank <= 20),
pre_s AS (
  SELECT q.query_id, c.vec_id,
         round(list_dot_product(q.e[1:16], c.e[1:16])
               / (sqrt(list_dot_product(q.e[1:16], q.e[1:16]))
                  * sqrt(list_dot_product(c.e[1:16], c.e[1:16]))), 6) AS s
  FROM q, c WHERE c.vec_id <> q.query_id),
r2 AS (SELECT query_id, vec_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, vec_id) AS rank
       FROM pre_s QUALIFY rank <= 20),
j AS (
  SELECT coalesce(r1.query_id, r2.query_id) AS query_id,
         coalesce(r1.vec_id, r2.vec_id) AS vec_id,
         coalesce(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + r1.rank),
                  CAST(0.0 AS DOUBLE))
         + coalesce(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + r2.rank),
                    CAST(0.0 AS DOUBLE)) AS rrf
  FROM r1 FULL JOIN r2
    ON r1.query_id = r2.query_id AND r1.vec_id = r2.vec_id)
SELECT query_id, vec_id,
       round(CAST(rrf AS DECIMAL(28,8)), 6)::DOUBLE AS rrf_score, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, vec_id) AS rank
      FROM j)
WHERE rank <= 10""")
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECIPROCAL-RANK FUSION (operators/similarity.py:rrf_fusion —
    Cormack et al. 2009, the hybrid-retrieval staple): fuse the exact
    full-dim cosine top-20 with the prefix-16 (Matryoshka-style) cosine
    top-20 by 1/(60+rank) sums — rank-only, so incomparable score
    scales never meet. Both tiers are exact and SQL-replayable, so
    unlike the pinned ANN tiers the WHOLE fusion carries a recomputed
    oracle. The fusion join runs over candidate-list-sized frames
    (Q×20 rows) — negligible next to the scans that produced them."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 7) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
    full_r = similarity.cosine_topk(emb, queries, k=20)
    pre = F.slice(F.transform("embedding",
                              lambda x: x.cast("double")), 1, 16)
    emb16 = emb.select("vec_id", pre.alias("embedding"))
    q16 = queries.select("query_id", pre.alias("embedding"))
    pre_r = similarity.cosine_topk(emb16, q16, k=20)
    return similarity.rrf_fusion([full_r, pre_r], k=10, c=60)


@q("sim_rrf_ann_fusion", pinned("sim_rrf_ann_fusion"))
def sim_rrf_ann_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF over an ANN tier — the production use of reciprocal-rank
    fusion (ANN recall repair): fuse the exact full-dim cosine top-20
    with the IVF-PQ ADC top-20 (operators/similarity.py:ivfpq_ann_topk,
    8/32 cells probed, residual PQ codes) by 1/(60+rank) sums. The
    rank-only formulation is what lets the uncalibrated ADC estimates
    meet exact cosines without a score-scale fight. The fused recall
    floor is gated in sim_recall_report's rrf_ivfpq row (191/250 —
    and that row's docstring documents the measured c-vs-depth
    trade: at c=60 double-membership outvotes single-list rank, so
    unweighted RRF leans toward tier consensus, not tier quality).
    Oracle = pinned sf0.01 golden (the IVF-PQ tier's seeded KMeans
    fit is engine-internal but deterministic)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 7) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.cosine_topk(emb, queries, k=20)
    ann = similarity.ivfpq_ann_topk(emb, queries, k=20)
    return similarity.rrf_fusion([exact, ann], k=10, c=60)


_EMB_COSINE_ORACLE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
               6) AS cosine_sim
  FROM v a JOIN v b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= 0.3
"""


@q("dedup_embedding_cosine", _EMB_COSINE_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs baseline at
    threshold 0.3; LSH-bucketed candidates are the scale path)."""
    emb = t(spark, sf_dir, "embeddings")
    return dedup.embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.3)


_SEMDEDUP_ORACLE = """
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
flat AS (
  SELECT label, i::INT AS dim_idx, e[i::INT] AS x
  FROM v, unnest(range(1, len(e) + 1)) AS r(i)),
cent AS (
  SELECT label, dim_idx,
         round(CAST(sum(CAST(x AS DECIMAL(28,6)))::DOUBLE / count(*)
                    AS DECIMAL(28,8)), 6)::DOUBLE AS c
  FROM flat GROUP BY label, dim_idx),
carr AS (SELECT label AS cl, list(c ORDER BY dim_idx) AS ce
         FROM cent GROUP BY label),
scored AS (
  SELECT v.vec_id, carr.cl,
         round(list_dot_product(v.e, carr.ce)
               / (sqrt(list_dot_product(v.e, v.e))
                  * sqrt(list_dot_product(carr.ce, carr.ce))), 6) AS cs
  FROM v CROSS JOIN carr),
assign AS (
  SELECT vec_id, cl, cs FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY cs DESC, cl ASC) = 1),
pairs AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb, a.cs AS csa, b.cs AS csb
  FROM assign a
  JOIN assign b ON a.cl = b.cl AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id
  WHERE round(list_dot_product(va.e, vb.e)
              / (sqrt(list_dot_product(va.e, va.e))
                 * sqrt(list_dot_product(vb.e, vb.e))), 6) >= 0.3),
dropped AS (
  SELECT DISTINCT CASE WHEN (csa < csb) OR (csa = csb AND ida < idb)
                       THEN idb ELSE ida END AS vec_id
  FROM pairs)
SELECT a.vec_id, a.cl AS cluster, a.cs AS centroid_sim,
       (d.vec_id IS NULL) AS kept
FROM assign a LEFT JOIN dropped d USING (vec_id)
"""


@q("dedup_semdedup", _SEMDEDUP_ORACLE)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over the embeddings table:
    label-seeded one-round Lloyd clustering, cluster-blocked pairwise
    cosine at threshold 0.3, keep the LOWEST-centroid-sim member of
    every near-dup neighborhood. Cluster blocking (never all-pairs) is
    what the paper uses to make semantic self-dedup tractable at
    corpus scale; the deterministic rounded-double pipeline lets the
    oracle recompute every step in SQL — exact, not pinned."""
    emb = t(spark, sf_dir, "embeddings")
    return dedup.semdedup(emb, "vec_id", "embedding", "label",
                          threshold=0.3)


@q("dedup_semdedup_lsh", pinned("dedup_semdedup_lsh"))
def dedup_semdedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE twin of ``dedup_semdedup``: same clustering and
    keep-rule, candidates from a (cluster, band, code) hyperplane-LSH
    join instead of all-pairs-within-cluster — near-linear where the
    exact twin is quadratic in cluster size (ratios in docs/SCALE.md).
    Drops are provably a SUBSET of the exact twin's (missed candidates
    keep both copies, never drop a non-dup). Run at the scale defaults
    (64 planes / 8-bit bands, like ``dedup_embedding_lsh``): recall is
    partial BY DESIGN at this corpus's artificially low 0.3 threshold —
    the paper's operating regime is ≥0.9, where the same bands give
    ≥0.9 drop recall on planted near-dups (pinned in tests). Seeded
    hyperplanes are engine-internal, so the oracle pins the sf0.01
    output."""
    emb = t(spark, sf_dir, "embeddings")
    return dedup.semdedup_lsh(emb, "vec_id", "embedding", "label",
                              threshold=0.3, n_planes=64, n_bands=8)


@q("dedup_embedding_lsh", pinned("dedup_embedding_lsh"))
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via hyperplane-LSH banding + exact cosine
    re-rank — the scale twin of ``dedup_embedding_cosine`` (same threshold
    0.3, band-code equi-join at the scale defaults: 64 planes / 8 bands
    of 8 bits / 1 probe bit — never all-pairs). The seeded hyperplane
    draws are engine-internal, so the oracle pins the full sf0.01 pair
    set; precision 1.0 by construction, recall additionally pinned in
    tests (≥0.9 on planted near-dups at the defaults; partial by design
    at this artificially low 0.3 threshold)."""
    emb = t(spark, sf_dir, "embeddings")
    return dedup.embedding_lsh_pairs(emb, "vec_id", "embedding", threshold=0.3)


@q("sim_lsh_ann_topk", pinned("sim_lsh_ann_topk"))
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN (random-hyperplane band codes, 64 planes / 8 bands of
    8 bits, query-side multi-probe): candidates via band-code join, exact
    cosine re-rank. The seeded hyperplane draws are engine-internal, so
    the oracle pins the full sf0.01 top-k set."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 7) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
    return similarity.lsh_ann_topk(emb, queries, k=10)


@q("dedup_cross_doc_ngram_score",
   r"""WITH toks AS (
        SELECT doc_id, regexp_split_to_array(
                 regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS tk
        FROM documents),
      w AS (
        SELECT doc_id, md5(array_to_string(tk[i:i+2], ' ')) AS h
        FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
              FROM toks WHERE len(tk) >= 3)),
      c AS (SELECT h, count(*) AS cnt FROM w GROUP BY h),
      p AS (
        SELECT doc_id, count(*) AS n_windows,
               CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_windows
        FROM w JOIN c USING (h) GROUP BY doc_id)
      SELECT d.doc_id,
             COALESCE(p.n_windows, CAST(0 AS BIGINT)) AS n_windows,
             COALESCE(p.n_dup_windows, CAST(0 AS BIGINT)) AS n_dup_windows,
             CASE WHEN COALESCE(p.n_windows, 0) > 0
                  THEN round(CAST((p.n_dup_windows / p.n_windows)
                             AS DECIMAL(28,8)), 6)::DOUBLE
                  ELSE 0.0 END AS dup_score
      FROM documents d LEFT JOIN p USING (doc_id)""")
def dedup_cross_doc_ngram_score(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Cross-document duplicated-window scoring (the substring-granular
    dedup signal of Lee et al., ACL 2022): per doc, the fraction of its
    token 3-gram windows whose content occurs more than once anywhere in
    the corpus — two uniform md5-keyed shuffles, never all-pairs
    (operators/dedup.py:cross_doc_dup_window_score)."""
    d = t(spark, sf_dir, "documents")
    return dedup.cross_doc_dup_window_score(d, "doc_id", "text", n=3)


@q("sim_recall_report",
   """SELECT 'ivf' AS algo, 10 AS k,
             CAST(25 AS BIGINT) AS n_queries, CAST(250 AS BIGINT) AS n_truth,
             CAST(208 AS BIGINT) AS n_hits
      UNION ALL
      SELECT 'lsh', 10, CAST(25 AS BIGINT), CAST(250 AS BIGINT),
             CAST(226 AS BIGINT)
      UNION ALL
      SELECT 'ivfpq', 10, CAST(25 AS BIGINT), CAST(250 AS BIGINT),
             CAST(189 AS BIGINT)
      UNION ALL
      SELECT 'mrl16', 10, CAST(25 AS BIGINT), CAST(250 AS BIGINT),
             CAST(139 AS BIGINT)
      UNION ALL
      SELECT 'rrf_ivfpq', 10, CAST(25 AS BIGINT), CAST(250 AS BIGINT),
             CAST(191 AS BIGINT)
      UNION ALL
      SELECT 'rrf_approx', 10, CAST(25 AS BIGINT), CAST(250 AS BIGINT),
             CAST(141 AS BIGINT)""")
def sim_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DRIVER-VISIBLE ANN quality gate: recall@10 of the IVF and LSH
    paths against the IN-PLAN brute-force truth, over a seeded
    deterministic query batch (vec_id % 20 = 7). The sim_* top-k queries
    themselves carry pinned-golden oracles (engine-internal KMeans/hyperplane
    draws), so this report is how recall regressions become a FAILED
    exact-oracle row instead of an invisible quality drop: the oracle
    pins the golden hit counts at sf0.01 (IVF 208/250 = 0.83 at
    n_probe=16/64 cells — the fixed-scan-fraction sweep knee documented
    in operators/similarity.py; LSH 226/250 = 0.90 at 64 planes / 8 bands /
    2 probe bits — both re-verified deterministic across runs). Any
    change to the quantizer, banding, or probe logic that moves recall
    shows up as a value mismatch here. r12 adds the ivfpq tier
    (189/250 = 0.76 — residual-PQ compression costs ~0.07 vs flat IVF
    at the same 25% scan) and the mrl16 prefix tier (139/250 = 0.56 —
    the documented floor case on unstructured synthetic vectors; MRL-
    trained embeddings sit far higher). r14 adds the fused-tier
    floors: rrf_ivfpq (exact top-20 + IVF-PQ top-20, the
    sim_rrf_ann_fusion recipe) pins 191/250, and rrf_approx
    (IVF-PQ + MRL-16, both lossy) pins 141/250 — an HONEST measured
    negative result: at c=60 with depth-20 lists, a candidate on BOTH
    lists outscores a single-list rank-1 (2/(60+20) > 1/61), so
    unweighted RRF regresses toward the weaker tier when tier
    qualities are far apart (0.76 vs 0.56 here); the repair story
    needs comparable tiers or a smaller c (measured: c=5 lifts
    rrf_ivfpq to 205 but rrf_approx only to 143). The rows pin the
    fusion plumbing either way. PINNED-ENVIRONMENT: the hit
    counts ride on this build's float behavior (KMeans/cosine sums); a
    platform upgrade that shifts low bits means re-pin via
    tools/pin_golden.py, not a correctness bug (docs/COVERAGE.md
    "Pinned goldens")."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 20 == 7) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
    truth = similarity.cosine_topk(emb, queries, k=10) \
                      .select("query_id", "vec_id")
    base = truth.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_truth"))

    def row(algo: str, approx: DataFrame) -> DataFrame:
        hits = truth.join(approx.select("query_id", "vec_id"),
                          ["query_id", "vec_id"], "semi")
        return (base.crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
                .select(F.lit(algo).alias("algo"), F.lit(10).alias("k"),
                        "n_queries", "n_truth", "n_hits"))

    ivf = similarity.ivf_ann_topk(emb, queries, k=10)
    lsh = similarity.lsh_ann_topk(emb, queries, k=10)
    ivfpq = similarity.ivfpq_ann_topk(emb, queries, k=10)
    mrl = similarity.matryoshka_topk(emb, queries, k=10)
    # fused-tier floors (r14): rrf_ivfpq gates sim_rrf_ann_fusion's
    # exact+IVF-PQ recipe; rrf_approx gates the pure recall-repair
    # story — two lossy tiers (IVF-PQ 0.76, MRL-16 0.56) fused
    # rank-only must beat BOTH alone
    exact20 = similarity.cosine_topk(emb, queries, k=20)
    ivfpq20 = similarity.ivfpq_ann_topk(emb, queries, k=20)
    pre16 = F.slice(F.transform("embedding",
                                lambda x: x.cast("double")), 1, 16)
    mrl20 = similarity.cosine_topk(
        emb.select("vec_id", pre16.alias("embedding")),
        queries.select("query_id", pre16.alias("embedding")), k=20)
    rrf_ivfpq = similarity.rrf_fusion([exact20, ivfpq20], k=10, c=60)
    rrf_approx = similarity.rrf_fusion([ivfpq20, mrl20], k=10, c=60)
    return (row("ivf", ivf).unionByName(row("lsh", lsh))
            .unionByName(row("ivfpq", ivfpq))
            .unionByName(row("mrl16", mrl))
            .unionByName(row("rrf_ivfpq", rrf_ivfpq))
            .unionByName(row("rrf_approx", rrf_approx)))


@q("sim_compressed_recall_report",
   """SELECT 'int8' AS algo, 10 AS k,
             CAST(25 AS BIGINT) AS n_queries, CAST(250 AS BIGINT) AS n_truth,
             CAST(249 AS BIGINT) AS n_hits
      UNION ALL
      SELECT 'pca32_int8', 10, CAST(25 AS BIGINT), CAST(250 AS BIGINT),
             CAST(125 AS BIGINT)""")
def sim_compressed_recall_report(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The COMPRESSED-SERVING quality gate: recall@10 of brute cosine
    over DEQUANTIZED compressed embeddings against the full-precision
    truth, on the same seeded query batch as sim_recall_report — two
    compression tiers, both via operators/similarity.py:

    - ``int8``: absmax INT8 at full 64 dims (sim_quantize_int8's
      recipe, 4× storage) — recall 249/250 = 0.996: quantization noise
      is far below the neighbor margins;
    - ``pca32_int8``: PCA to 32 dims then INT8 (8× storage) —
      125/250 = 0.50, HONESTLY pessimal: the synthetic embeddings are
      near-isotropic (the pca_fit eigen-spectrum is flat, ~0.026-0.029
      each), so half the variance lives in the dropped 32 dims. Real
      text-embedding spectra decay fast and keep far more; the row
      exists so any regression in the fit's exact merge, the sign
      convention, or the quantizer moves a pinned count, and so the
      isotropic-data cliff is measured rather than assumed.

    Same pinned-environment caveat as the other recall golden."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 20 == 7) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
    truth = similarity.cosine_topk(emb, queries, k=10) \
                      .select("query_id", "vec_id")
    base = truth.agg(F.countDistinct("query_id").alias("n_queries"),
                     F.count(F.lit(1)).alias("n_truth"))

    def dequant(src: DataFrame, vcol: str) -> DataFrame:
        amax = F.array_max(F.transform(F.col(vcol), F.abs))
        deq = F.transform(
            F.col(vcol),
            lambda x: F.when(
                amax > 0,
                F.round((x * 127 / amax).cast("decimal(28,8)"), 0)
                 .cast("int") * amax / 127).otherwise(F.lit(0.0)))
        return src.select("vec_id", deq.alias("embedding"))

    def row(algo: str, comp: DataFrame) -> DataFrame:
        cq = comp.where(F.col("vec_id") % 20 == 7) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
        approx = similarity.cosine_topk(comp, cq, k=10) \
                           .select("query_id", "vec_id")
        hits = truth.join(approx, ["query_id", "vec_id"], "semi")
        return (base.crossJoin(hits.agg(F.count(F.lit(1))
                                        .alias("n_hits")))
                .select(F.lit(algo).alias("algo"), F.lit(10).alias("k"),
                        "n_queries", "n_truth", "n_hits"))

    full = emb.select("vec_id",
                      similarity._as_double("embedding")
                      .alias("embedding"))
    proj = similarity.pca_project(
        emb, similarity.pca_fit(emb, k=32)) \
        .select("vec_id", F.col("pc").alias("embedding"))
    return row("int8", dequant(full, "embedding")) \
        .unionByName(row("pca32_int8", dequant(proj, "embedding")))


@q("text_quality_classifier_report",
   """SELECT 0 AS label, 0 AS prediction, CAST(65 AS BIGINT) AS n
      UNION ALL SELECT 0, 1, CAST(3 AS BIGINT)
      UNION ALL SELECT 1, 0, CAST(4 AS BIGINT)
      UNION ALL SELECT 1, 1, CAST(69 AS BIGINT)""")
def text_quality_classifier_report(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """TRAINABLE quality classifier, end to end (operators/classifier.py)
    — the fastText-style model-based filter curation pipelines pair with
    heuristic rules, here DISTILLING a rule (the corpus-median length
    window; on this clean synthetic corpus the other quality components
    are constant, so the length rule is the one with signal) from a 70%
    hash-split into a hashed bag-of-words logistic regression, then
    scoring the held-out 30% with PURE-COLUMN inference (explode →
    bucket → broadcast weight join → sigmoid; no UDF, no model object at
    scale). The oracle pins the held-out confusion matrix (65+69 right,
    7 wrong = 0.95 accuracy at sf0.01; LBFGS from a zero start is
    deterministic, re-verified across runs) — a feature-extraction or
    training regression becomes a failed exact row. PINNED-ENVIRONMENT:
    the matrix rides on this build's LBFGS float trajectory; an
    environment upgrade that moves it means re-pin and review
    (docs/COVERAGE.md "Pinned goldens")."""
    from walmart_project_etl_spark.operators.classifier import (
        score_linear, train_linear_classifier)

    docs = t(spark, sf_dir, "documents")
    med = docs.agg(F.expr("percentile(n_chars, 0.5)")).first()[0]
    docs = docs.withColumn("label",
                           (F.col("n_chars") >= F.lit(med)).cast("double"))
    train = docs.where(F.pmod(F.xxhash64("doc_id"), 10) < 7)
    test = docs.where(F.pmod(F.xxhash64("doc_id"), 10) >= 7)
    w, b = train_linear_classifier(train, "doc_id", "text", "label")
    scored = score_linear(test, "doc_id", "text", w, b)
    return (scored.join(docs.select("doc_id", "label"), "doc_id")
            .groupBy(F.col("label").cast("int").alias("label"),
                     "prediction")
            .agg(F.count(F.lit(1)).alias("n")))


# ------------------------------------------------------------- text analysis

@q("text_stats_quality",
   r"""WITH s AS (
        SELECT doc_id,
               length(text) AS n_chars,
               CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                    ELSE len(regexp_split_to_array(
                         regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END AS n_tokens,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
               length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS n_punct,
               length(regexp_replace(text, '[^ \t\n]', '', 'g')) AS n_space
        FROM documents),
      r AS (
        SELECT doc_id, n_chars, n_tokens,
               round(n_alpha / greatest(n_chars, 1), 6) AS alpha_ratio,
               round(n_punct / greatest(n_chars, 1), 6) AS punct_ratio,
               round((n_chars - n_space) / greatest(n_tokens, 1), 6) AS mean_token_len
        FROM s)
      SELECT doc_id, n_chars, n_tokens, alpha_ratio, punct_ratio, mean_token_len,
             round(CASE WHEN n_chars BETWEEN 50 AND 100000 THEN 0.25 ELSE 0 END
                 + CASE WHEN alpha_ratio >= 0.6 THEN 0.25 ELSE 0 END
                 + CASE WHEN mean_token_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0 END
                 + CASE WHEN punct_ratio <= 0.15 THEN 0.25 ELSE 0 END, 2) AS quality
      FROM r""")
def text_stats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals + composite score — pure Column
    expressions, full-scan speed."""
    d = t(spark, sf_dir, "documents")
    s = text.text_stats("text")
    return d.select(
        "doc_id", s["n_chars"].alias("n_chars"), s["n_tokens"].alias("n_tokens"),
        s["alpha_ratio"].alias("alpha_ratio"), s["punct_ratio"].alias("punct_ratio"),
        s["mean_token_len"].alias("mean_token_len"),
        text.quality_score("text").alias("quality"))


_LANGID_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk,
         length(regexp_replace(text, '[^一-鿿]', '', 'g'))
           / greatest(length(text), 1) AS cjk_ratio
  FROM documents),
hits AS (
  SELECT doc_id, cjk_ratio,
    len(list_filter(tk, t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t))) AS h_en,
    len(list_filter(tk, t -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], t))) AS h_de,
    len(list_filter(tk, t -> list_contains(['el','la','de','que','y','en','un','es','los','por'], t))) AS h_es,
    len(list_filter(tk, t -> list_contains(['le','la','les','de','et','un','une','est','que','pour'], t))) AS h_fr
  FROM toks),
best AS (SELECT *, greatest(h_en, h_de, h_es, h_fr) AS b FROM hits)
SELECT lang_guess, count(*) AS n FROM (
  SELECT CASE WHEN cjk_ratio > 0.3 THEN 'zh'
              WHEN b < 1 THEN 'unknown'
              WHEN h_en = b THEN 'en'
              WHEN h_de = b THEN 'de'
              WHEN h_es = b THEN 'es'
              WHEN h_fr = b THEN 'fr'
         END AS lang_guess
  FROM best) GROUP BY lang_guess
"""


@q("text_langid", _LANGID_ORACLE)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (CJK charset ratio + stopword lexicon argmax),
    aggregated to guess counts."""
    d = t(spark, sf_dir, "documents")
    return (d.select(text.lang_id("text").alias("lang_guess"))
            .groupBy("lang_guess").agg(F.count(F.lit(1)).alias("n")))


@q("text_token_counts",
   r"""SELECT doc_id,
             CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                  ELSE len(regexp_split_to_array(
                       regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END AS n_ws_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_re_tokens
      FROM documents""")
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id",
                    text.whitespace_token_count("text").alias("n_ws_tokens"),
                    text.regex_token_count("text").alias("n_re_tokens"))


@q("text_fingerprint",
   """SELECT doc_id, min(md5(substr(text, i::INT, 8))) AS fingerprint
      FROM (SELECT doc_id, text,
                   unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i
            FROM documents)
      GROUP BY doc_id""")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-md5 over char 8-grams (1-permutation
    MinHash, engine-portable)."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", text.doc_fingerprint("text", k=8).alias("fingerprint"))


@q("text_normalize",
   r"""SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(lower(text),
                 '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g'),
                 '^\s+|\s+$', '', 'g') AS norm_text
      FROM documents""")
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase, control chars → space,
    whitespace collapse, trim) — the stage-0 pass before shingling so that
    formatting-only variants dedup together. Pure regexp Columns."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", text.normalize_text("text").alias("norm_text"))


_PII_ORACLE = r"""
WITH enriched AS (
  SELECT doc_id,
         'reach user' || CAST(doc_id AS VARCHAR) ||
         '@mail.example.org at 10.' || CAST(doc_id % 200 AS VARCHAR) ||
         '.0.1 or 555-01' || CAST(doc_id % 90 + 10 AS VARCHAR) || ' re: ' || text
           AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g'),
           '\+?[0-9][0-9()\-\s]{6,}[0-9]', '[PHONE]', 'g') AS redacted
FROM enriched
"""


@q("text_redact_pii", _PII_ORACLE)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: emails, IPv4 literals, phone-shaped digit runs →
    typed placeholders. The corpus is PII-free by construction, so each doc
    is prefixed with deterministic doc_id-derived PII that the pass must
    catch; patterns are RE2-compatible so Spark (Java regex) and DuckDB
    (RE2) agree byte-for-byte."""
    d = t(spark, sf_dir, "documents")
    enriched = d.select(
        "doc_id",
        F.concat(F.lit("reach user"), F.col("doc_id").cast("string"),
                 F.lit("@mail.example.org at 10."),
                 (F.col("doc_id") % 200).cast("string"),
                 F.lit(".0.1 or 555-01"),
                 (F.col("doc_id") % 90 + 10).cast("string"),
                 F.lit(" re: "), F.col("text")).alias("text"))
    return enriched.select(
        "doc_id", text.redact_pii("text").alias("redacted"))


_GOPHER_ORACLE = r"""
WITH s AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
              ELSE len(regexp_split_to_array(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END AS n_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^ \t\n]', '', 'g')) AS n_space,
         length(regexp_replace(text, '[^一-鿿]', '', 'g'))
           / greatest(length(text), 1) AS cjk_ratio,
         regexp_split_to_array(lower(trim(text)), '\s+') AS tk
  FROM documents),
r AS (
  SELECT doc_id, n_tokens, cjk_ratio,
         round(n_alpha / greatest(n_chars, 1), 6) AS alpha_ratio,
         round(n_punct / greatest(n_chars, 1), 6) AS punct_ratio,
         round((n_chars - n_space) / greatest(n_tokens, 1), 6) AS mean_token_len,
         greatest(
           len(list_filter(tk, t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t))),
           len(list_filter(tk, t -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','zu'], t))),
           len(list_filter(tk, t -> list_contains(['el','la','de','que','y','en','un','es','los','por'], t))),
           len(list_filter(tk, t -> list_contains(['le','la','les','de','et','un','une','est','que','pour'], t)))) AS any_stop
  FROM s),
f AS (
  SELECT doc_id,
         (n_tokens BETWEEN 5 AND 10000) AS len_ok,
         (alpha_ratio >= 0.6) AS alpha_ok,
         (mean_token_len BETWEEN 2.0 AND 12.0) AS mean_tok_ok,
         (punct_ratio <= 0.15) AS punct_ok,
         (any_stop >= 1 OR cjk_ratio > 0.3) AS stopword_ok
  FROM r)
SELECT doc_id, len_ok::INT AS len_ok, alpha_ok::INT AS alpha_ok,
       mean_tok_ok::INT AS mean_tok_ok, punct_ok::INT AS punct_ok,
       stopword_ok::INT AS stopword_ok,
       (len_ok AND alpha_ok AND mean_tok_ok AND punct_ok AND stopword_ok)::INT AS keep
FROM f
"""

_GOPHER_COLS = ("len_ok", "alpha_ok", "mean_tok_ok", "punct_ok",
                "stopword_ok", "keep")


@q("text_filter_chain", _GOPHER_ORACLE)
def text_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style curation filter chain: per-rule keep flags plus the
    conjunction, one row per document — auditable curation (WHY a doc
    drops, not just how many). All pure Columns, one scan, no shuffle."""
    d = t(spark, sf_dir, "documents")
    fl = text.gopher_flags("text")
    return d.select(
        "doc_id", *[fl[k].cast("int").alias(k) for k in _GOPHER_COLS])


@q("text_curation_funnel",
   f"""WITH g AS ({_GOPHER_ORACLE})
      SELECT d.source, count(*) AS n_docs,
             sum(g.len_ok)::BIGINT AS n_len_ok,
             sum(g.alpha_ok)::BIGINT AS n_alpha_ok,
             sum(g.mean_tok_ok)::BIGINT AS n_mean_tok_ok,
             sum(g.punct_ok)::BIGINT AS n_punct_ok,
             sum(g.stopword_ok)::BIGINT AS n_stopword_ok,
             sum(g.keep)::BIGINT AS n_keep
      FROM g JOIN documents d USING (doc_id)
      GROUP BY d.source""")
def text_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation audit funnel: per source, how many docs pass each filter
    rule and the conjunction — the per-domain yield report a corpus build
    reviews before committing a filter config. One scan + one uniform
    groupBy on source."""
    d = t(spark, sf_dir, "documents")
    fl = text.gopher_flags("text")
    flagged = d.select("source",
                       *[fl[k].cast("int").alias(k) for k in _GOPHER_COLS])
    return (flagged.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 *[F.sum(k).alias(f"n_{k}") for k in _GOPHER_COLS]))


# ------------------------------------------------------------- events

@q("events_asof_join",
   """SELECT p.event_id, p.user_id, p.ts,
             v.value AS last_view_value, v.ts AS last_view_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND p.ts >= v.ts""")
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each purchase matched to the user's most
    recent prior view — union+window formulation, no range theta-join."""
    from walmart_project_etl_spark.operators.interval_join import asof_join
    ev = events_t(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase") \
                  .select("event_id", "user_id", "ts")
    views = ev.where(F.col("event_type") == "view") \
              .select("user_id", F.col("ts").alias("view_ts"),
                      F.col("value").alias("view_value"))
    out = asof_join(purchases, views, on="user_id",
                    left_time="ts", right_time="view_ts",
                    right_cols=["view_value", "view_ts"])
    return out.select("event_id", "user_id", "ts",
                      F.col("view_value").alias("last_view_value"),
                      F.col("view_ts").alias("last_view_ts"))


@q("events_sessionization",
   """WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts, value,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, count(*) AS n_events,
             (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS duration_seconds,
             round(sum(CAST(value AS DECIMAL(28,6))), 2)::DOUBLE AS sum_value
      FROM sess GROUP BY user_id, session_id""")
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap): per-session stats."""
    ev = events_t(spark, sf_dir)
    return events.session_stats(ev, gap_minutes=30)


_TUMBLING_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type, count(*) AS n_events,
       round(sum(CAST(value AS DECIMAL(28,6))), 2)::DOUBLE AS sum_value
FROM events GROUP BY 1, 2, 3
"""


@q("events_tumbling_window", _TUMBLING_ORACLE)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch twin of the streaming
    job; F.window aligns to the epoch = date_trunc('hour'))."""
    ev = events_t(spark, sf_dir)
    return events.tumbling_window_agg(ev, window_duration="1 hour",
                                      extra_keys=["event_type"])


@q("stream_tumbling_window", _TUMBLING_ORACLE)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming execution: file-source stream over the
    events parquet, watermark, tumbling window, availableNow trigger,
    memory sink. On drained bounded input it must equal the batch twin —
    which is exactly what the oracle asserts."""
    import os
    from walmart_project_etl_spark.streaming import stream_tumbling_counts
    return stream_tumbling_counts(
        spark, events_dir(spark, sf_dir), "1 hour", "2 hours")


@q("stream_foreachbatch_upsert",
   """SELECT user_id, event_id, ts, event_type, value FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) = 1""")
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming warehouse upsert: ``foreachBatch`` maintains a
    latest-event-per-user dim table across micro-batches (forced to
    several via maxFilesPerTrigger). The oracle is the batch window query
    — the incremental merge must converge to it for any batch split."""
    import tempfile

    from walmart_project_etl_spark.streaming import stream_upsert_latest
    out = stream_upsert_latest(
        spark, events_dir(spark, sf_dir),
        tempfile.mkdtemp(prefix="wpe_stream_wh_"))
    return out.select("user_id", "event_id", "ts", "event_type", "value")


@q("stream_tx_upsert",
   """SELECT user_id, event_id, ts, event_type, value FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) = 1""")
def stream_tx_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE streaming upsert: the latest-event-per-user dim
    maintained in the TRANSACTIONAL log table via per-micro-batch MERGE
    commits with txn markers (a re-delivered batch is a logged no-op —
    streaming/jobs.py:stream_upsert_tx). The oracle is the batch window
    query; the incremental transactional merge must converge to it for
    any micro-batch split."""
    import tempfile

    from walmart_project_etl_spark.streaming import stream_upsert_tx
    # 4 files/trigger → two micro-batches: still a real multi-batch
    # incremental merge (and the replay test drives more), at half the
    # per-batch commit overhead in the oracle sweep
    out = stream_upsert_tx(
        spark, events_dir(spark, sf_dir),
        tempfile.mkdtemp(prefix="wpe_stream_txtbl_"),
        max_files_per_trigger=4)
    return out.select("user_id", "event_id", "ts", "event_type", "value")


@q("stream_cdf_follow",
   """SELECT CAST(0 AS BIGINT) AS _commit_version,
             'insert' AS _change_type, count(*) AS n_changes,
             round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2)::DOUBLE
               AS sum_price
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT CAST(1 AS BIGINT), 'insert', count(*),
             round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2)::DOUBLE
      FROM orders WHERE o_orderkey % 2 = 1
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'update_preimage', count(*),
             round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2)::DOUBLE
      FROM orders WHERE o_orderkey % 50 = 3
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'update_postimage', count(*),
             round(sum(CAST(o_orderkey * 0.5 AS DECIMAL(28,6))), 2)::DOUBLE
      FROM orders WHERE o_orderkey % 50 = 3
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'delete', count(*),
             round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2)::DOUBLE
      FROM orders WHERE o_orderkey % 50 = 11""")
def stream_cdf_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING the tx table's change feed through the Spark-4 Python
    DataSource API (``streaming/txsource.py``): offsets are log
    versions, ``latestOffset`` fences to the sealed (decided) prefix,
    and each commit's data/cdf files stream executor-side as Arrow
    batches — ``readStream.format("txlog_changes")`` tails a table the
    way Delta's streaming source does, on the public extension seam.
    Four commits (create, append, merge, delete) drain under
    ``availableNow`` and the per-commit change profile must equal the
    oracle's reconstruction (tests/test_txlog_cdf.py additionally pins
    checkpointed exactly-once RESUME: a second run with the same
    checkpoint emits only the commits that landed in between)."""
    import shutil
    import uuid as _uuid

    from walmart_project_etl_spark.sources.txlog import TxTable
    from walmart_project_etl_spark.streaming.txsource import \
        TxLogChangesDataSource

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                          "o_totalprice", "o_orderstatus")
    root = os.path.join(tempfile.gettempdir(), "wpe_txn_stream")
    shutil.rmtree(root, ignore_errors=True)
    tt = TxTable(spark, root)
    tt.create(o.where("o_orderkey % 2 = 0"), "o_orderkey", n_files=4,
              change_feed=True)                                    # v0
    tt.append(o.where("o_orderkey % 2 = 1"))                       # v1
    tt.merge_upsert(o.where("o_orderkey % 50 = 3")                 # v2
                    .withColumn("o_totalprice",
                                F.col("o_orderkey") * 0.5))
    tt.delete_keys(o.where("o_orderkey % 50 = 11")                 # v3
                   .select("o_orderkey"))

    spark.dataSource.register(TxLogChangesDataSource)
    feed = spark.readStream.format("txlog_changes") \
        .option("root", root).load()
    name = f"cdf_follow_{_uuid.uuid4().hex[:8]}"
    q = (feed.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .groupBy("_commit_version", "_change_type")
            .agg(F.count(F.lit(1)).alias("n_changes"),
                 dsum("o_totalprice", "sum_price")))


@q("stream_static_enrich",
   """SELECT date_trunc('hour', ts) AS window_start,
             date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
             n_name, count(*) AS n_events,
             round(sum(CAST(value AS DECIMAL(28,6))), 2)::DOUBLE AS sum_value
      FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
      GROUP BY 1, 2, 3""")
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-static join: the event stream enriched with a BROADCAST
    nation dimension (stateless join — no state store), then watermarked
    tumbling counts per nation (streaming/jobs.py:stream_enrich_tumbling).
    The oracle is the equivalent batch star-join aggregation."""
    from walmart_project_etl_spark.streaming import stream_enrich_tumbling
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return stream_enrich_tumbling(spark, events_dir(spark, sf_dir),
                                  nation, "n_nationkey", "n_name",
                                  stream_key=F.col("user_id") % 25)


@q("stream_stream_join",
   """SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
             v.ts AS view_ts, c.ts AS click_ts
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON v.user_id = c.user_id
       AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR""")
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream interval join (view→click attribution within
    1 hour): both sides are watermarked streams whose join state evicts by
    event time. The oracle is the equivalent batch interval join — on a
    drained availableNow run the two must match exactly."""
    from walmart_project_etl_spark.streaming import \
        stream_stream_attribution_join
    return stream_stream_attribution_join(spark, events_dir(spark, sf_dir))


@q("events_dedup_latest",
   """SELECT user_id, event_type, event_id AS latest_event_id, value AS latest_value
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id, event_type
              ORDER BY ts DESC, event_id DESC) = 1""")
def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per (user, type) — W1 on the stream table."""
    ev = events_t(spark, sf_dir)
    latest = events.latest_event_per_key(ev, ["user_id", "event_type"])
    return latest.select("user_id", "event_type",
                         F.col("event_id").alias("latest_event_id"),
                         F.col("value").alias("latest_value"))


# ------------------------------------------------------------- multimodal

@q("mm_image_meta",
   """SELECT doc_id AS media_id,
             octet_length(encode(text)) AS n_bytes,
             substr(sha256(text), 1, 16) AS sha256_prefix,
             16 + (ascii(substr(text, 1, 1)) % 240) AS width,
             16 + (ascii(substr(text, 2, 1)) % 240) AS height,
             3 AS n_channels
      FROM documents""")
def mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata extraction: binary payload → mapInPandas (Arrow
    batches) → typed metadata. Decode is a deterministic byte-derived stub
    (real codec integration point raises NotImplementedError; see
    operators.multimodal)."""
    media = multimodal.documents_as_media(t(spark, sf_dir, "documents"))
    meta = multimodal.decode_image_meta(media)
    return meta.select("media_id", "n_bytes", "sha256_prefix",
                       "width", "height", "n_channels")


@q("mm_frame_sampling",
   """SELECT doc_id AS media_id, i::INT AS frame_index, (i::INT) * 64 AS byte_offset
      FROM (SELECT doc_id,
                   unnest(range(0, least(greatest((octet_length(encode(text)) // 64) - 1, 0), 15) + 1)) AS i
            FROM documents)""")
def mm_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled byte-offset 'frame'
    (capped at 16), the explode shape a real video decoder would emit."""
    media = multimodal.documents_as_media(t(spark, sf_dir, "documents"), "video")
    return multimodal.sample_frames(media, every_n_bytes=64, max_frames=16)


@q("mm_real_decode_ppm",
   """SELECT doc_id AS media_id,
             length(payload)::BIGINT AS n_bytes,
             substr(sha256(payload), 1, 16) AS sha256_prefix,
             w::INT AS width, h::INT AS height, 3 AS n_channels
      FROM (SELECT doc_id, w, h,
                   'P6' || chr(10) || w || ' ' || h || chr(10) || '255'
                   || chr(10)
                   || repeat(lpad((doc_id % 1000)::VARCHAR, 3, '0'), w * h)
                     AS payload
            FROM (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
                  FROM documents))""")
def mm_real_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: synthesize binary-PPM payloads from
    documents (pure Column expressions), then run the pure-numpy P6 header
    parse inside the Arrow mapInPandas hop (``real_decode=True`` — no
    byte-heuristic stub). The oracle rebuilds the identical ASCII payload
    in SQL and checks length, sha256, and the header-parsed dimensions —
    an exact value-match on the real codec path."""
    media = multimodal.documents_as_ppm(t(spark, sf_dir, "documents"))
    meta = multimodal.decode_image_meta(media, real_decode=True)
    return meta.select("media_id", "n_bytes", "sha256_prefix",
                       "width", "height", "n_channels")


@q("mm_real_decode_png",
   """WITH dims AS (
        SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
        FROM documents),
      flat AS (
        SELECT doc_id, w, h, xx.x AS xx, yy.y AS yy, cc.c AS cc
        FROM dims,
             unnest(range(0, w)) xx(x),
             unnest(range(0, h)) yy(y),
             unnest(range(0, 3)) cc(c))
      SELECT doc_id AS media_id, w::INT AS width, h::INT AS height,
             3 AS n_channels,
             sum((doc_id + xx + yy + cc) % 256)::BIGINT AS px_sum
      FROM flat GROUP BY doc_id, w, h""")
def mm_real_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-codec decode end-to-end: synthesize PNG payloads
    (zlib-DEFLATE, filter type doc_id % 5 — every scanline filter
    exercised across the corpus), then fully decode them in the Arrow hop
    (chunk walk → inflate → filter reconstruction, operators/multimodal.py
    ``_decode_png``) and emit the decoded raster's pixel sum. The oracle
    computes the expected sum from the analytic pixel law WITHOUT any
    codec — an exact cross-engine proof that the inflate+unfilter pipeline
    reconstructs every pixel. (Decoder additionally validated against
    real-world libpng output in tests/test_multimodal_decode.py.)"""
    media = multimodal.documents_as_png(t(spark, sf_dir, "documents"))
    stats = multimodal.decode_pixel_stats(media)
    return stats.select("media_id", "width", "height", "n_channels", "px_sum")


@q("dedup_boilerplate_sentences",
   r"""WITH lines AS (
        SELECT doc_id, parts[ii.i] AS line, ii.i - 1 AS idx
        FROM (SELECT doc_id,
                     string_split(text || '. Subscribe to our newsletter',
                                  '. ') AS parts
              FROM documents) t,
             unnest(range(1, len(parts) + 1)) ii(i)),
      freq AS (SELECT line, count(DISTINCT doc_id) AS docs
               FROM lines GROUP BY line),
      kept AS (SELECT l.doc_id, l.idx, l.line FROM lines l
               JOIN freq f USING (line) WHERE f.docs < 2)
      SELECT doc_id,
             string_agg(line, '. ' ORDER BY idx) AS text_clean,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id""")
def dedup_boilerplate_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SENTENCE-level boilerplate removal with a REGEX-SPECIAL delimiter
    ('. ' — the dot would match any char if passed unquoted to F.split):
    every document gets a planted boilerplate sentence appended, and the
    corpus-frequency dedup must strip exactly it. Pins the r6 delimiter-
    quoting fix (operators/dedup.py dedup_lines) end-to-end under the
    driver: an unquoted delimiter splits on the wrong boundaries and
    corrupts text_clean for every row."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(". Subscribe to our newsletter")).alias("text"))
    out = dedup.dedup_lines(d, "doc_id", "text", delim=". ", min_count=2)
    return out.select("doc_id", "text_clean",
                      (F.col("n_lines") - F.col("n_dropped")).alias("n_kept"))


@q("mm_real_decode_wav",
   """WITH dims AS (SELECT doc_id, 256 + doc_id % 512 AS n FROM documents),
      flat AS (
        SELECT doc_id, n, ((doc_id * 7 + ii.i * 13) % 65536 - 32768) AS s
        FROM dims, unnest(range(0, n)) ii(i))
      SELECT doc_id AS media_id, 16000 AS sample_rate, 1 AS n_channels,
             n::BIGINT AS n_samples,
             sum(abs(s))::BIGINT AS sum_abs,
             max(abs(s))::BIGINT AS peak
      FROM flat GROUP BY doc_id, n""")
def mm_real_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: PCM16 RIFF/WAVE payloads synthesized
    from an analytic sample law, fully parsed back in the Arrow hop
    (chunk walk + PCM reconstruction, operators/multimodal.py:decode_wav)
    and reduced to integer stream stats the oracle recomputes from the
    law with no codec — exact cross-engine proof of the audio path."""
    media = multimodal.documents_as_wav(t(spark, sf_dir, "documents"))
    stats = multimodal.audio_stats(media)
    return stats.select("media_id", "sample_rate", "n_channels",
                        "n_samples", "sum_abs", "peak")


@q("mm_byte_histogram_features", pinned("mm_byte_histogram_features"))
def mm_byte_histogram_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram features via mapInPandas (stand-in embedding model;
    identical Arrow plumbing). The raw array<double> column lives on the
    operator API (tests assert exact values); the driver-facing result
    serializes it to scalars (JSON string + length) because the harness
    canonicalizer cannot sort list-valued columns. Oracle = pinned sf0.01
    golden of all 500 serialized feature rows."""
    media = multimodal.documents_as_media(t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media, dim=8)
    return feats.select(
        "media_id",
        F.to_json(F.struct(F.col("feature"))).alias("feature_json"),
        F.size("feature").alias("feature_dim"))


_SLIDING_ORACLE = """
WITH w AS (
  SELECT event_type, value,
         time_bucket(INTERVAL 30 MINUTE, ts)
           - unnest([INTERVAL 0 MINUTE, INTERVAL 30 MINUTE]) AS window_start
  FROM events)
SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
       event_type, count(*) AS n_events,
       round(sum(CAST(value AS DECIMAL(28,6))), 2)::DOUBLE AS sum_value
FROM w GROUP BY 1, 2, 3
"""


@q("events_sliding_window", _SLIDING_ORACLE)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h window, 30 min slide) — every event
    lands in two overlapping windows; F.window's epoch alignment equals
    time_bucket(30 min) minus the slide offsets."""
    ev = events_t(spark, sf_dir)
    return (ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"),
                       "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
                  .cast("double").alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "event_type", "n_events", "sum_value"))


@q("stream_stateful_user_stats",
   """SELECT user_id, count(*) AS n_events,
             round(sum(CAST(round(CAST(value AS DECIMAL(28,6)), 6) AS DECIMAL(28,6))), 2)::DOUBLE
               AS sum_value,
             max(ts) AS last_ts
      FROM events GROUP BY user_id""")
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL custom stateful streaming operator: per-user running stats via
    applyInPandasWithState (Arrow batches + state store), drained with
    availableNow — final state must equal the batch groupBy."""
    from walmart_project_etl_spark.streaming.stateful import stream_user_stats
    return stream_user_stats(spark, events_dir(spark, sf_dir))


@q("stream_dedup_watermark",
   "SELECT event_id, user_id, event_type, value FROM events")
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming dedup: the event stream doubled by self-union (an
    at-least-once source) and collapsed via dropDuplicatesWithinWatermark
    on event_id — state bounded by the watermark horizon. Drained with
    availableNow, the output must be exactly the distinct source rows
    (event_id is unique in the corpus), which is what the oracle asserts."""
    from walmart_project_etl_spark.streaming import \
        stream_dedup_within_watermark
    return stream_dedup_within_watermark(spark, events_dir(spark, sf_dir))


# ------------------------------------------------------------- OLAP extensions

@q("olap_pivot_event_values",
   """SELECT user_id,
             round(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(28,6)) ELSE 0 END), 2)::DOUBLE AS click_value,
             round(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(28,6)) ELSE 0 END), 2)::DOUBLE AS view_value,
             round(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(28,6)) ELSE 0 END), 2)::DOUBLE AS purchase_value
      FROM events GROUP BY user_id""")
def olap_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user value sums by event type as columns (explicit value
    list → deterministic schema; Catalyst rewrites to conditional aggs —
    exactly the CASE form the oracle states)."""
    ev = events_t(spark, sf_dir)
    piv = (ev.groupBy("user_id")
           .pivot("event_type", ["click", "view", "purchase"])
           .agg(F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
                 .cast("double")))
    return piv.select(
        "user_id",
        F.coalesce("click", F.lit(0.0)).alias("click_value"),
        F.coalesce("view", F.lit(0.0)).alias("view_value"),
        F.coalesce("purchase", F.lit(0.0)).alias("purchase_value"))


@q("olap_unpivot_metrics",
   """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
             l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      FROM lineitem""")
def olap_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): three wide metric columns to (metric, val) long
    form via ``DataFrame.unpivot`` — Spark's Expand node emits all three
    rows in one scan pass, vs the oracle's three-scan UNION ALL."""
    li = t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric", "val")


@q("events_funnel",
   """WITH s1 AS (
        SELECT user_id, min(ts) AS stage1_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS stage2_ts
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts >= s1.stage1_ts
        GROUP BY e.user_id),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS stage3_ts
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= s2.stage2_ts
        GROUP BY e.user_id)
      SELECT s1.user_id, s1.stage1_ts, s2.stage2_ts, s3.stage3_ts,
             1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
               AS stages_completed
      FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""")
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered conversion funnel view→click→purchase: stage k
    counts only at-or-after the user's stage-(k-1) completion. One
    user-keyed aggregation per stage; the frontier frames are
    user-cardinality so the stage joins AQE-broadcast."""
    ev = events_t(spark, sf_dir)
    return events.funnel_stages(ev, ["view", "click", "purchase"])


@q("events_cohort_retention",
   """WITH first_seen AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE)
                 AS cohort_week
        FROM events GROUP BY user_id),
      acts AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(datediff('day', f.cohort_week,
                             CAST(date_trunc('week', e.ts) AS DATE)) / 7
                    AS BIGINT) AS week_offset
        FROM events e JOIN first_seen f USING (user_id))
      SELECT cohort_week, week_offset, count(*) AS n_active_users
      FROM acts GROUP BY cohort_week, week_offset""")
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-seen week
    and counted as active per (cohort_week, week_offset) — two user-keyed
    aggregations plus a narrow Monday-aligned date diff (exact multiples
    of 7, so the /7 is engine-independent). cohort_week is emitted as the
    week-start timestamp (DATE round-trips as midnight through the
    driver's pandas canonicalization)."""
    ev = events_t(spark, sf_dir)
    out = events.cohort_retention(ev)
    return out.select(F.col("cohort_week").cast("timestamp").alias("cohort_week"),
                      "week_offset", "n_active_users")


@q("olap_rollup_lineitem",
   """SELECT l_returnflag, l_linestatus,
             grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
             count(*) AS n,
             round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2)::DOUBLE AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")
def olap_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping id: per-(flag,status), per-flag subtotals, and
    the grand total in one pass (partial aggregation handles all levels —
    no extra scans at any scale)."""
    li = t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg((F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
                 .cast("long").alias("gid"),
                 F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("l_quantity").cast("decimal(28,6)")), 2)
                  .cast("double").alias("sum_qty")))


@q("olap_cube_lineitem",
   """SELECT l_returnflag, l_linestatus,
             grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
             count(*) AS n,
             round(sum(CAST(l_extendedprice AS DECIMAL(28,6))), 2)::DOUBLE
               AS sum_price
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""")
def olap_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all four grouping levels (cells, per-flag, per-status, grand
    total) in ONE scan via the Expand operator — same single-pass property
    as ROLLUP, 2^k level fanout bounded by k=2 dims."""
    li = t(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg((F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
                 .cast("long").alias("gid"),
                 F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,6)")), 2)
                  .cast("double").alias("sum_price")))


@q("events_transition_matrix",
   """WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events)
      SELECT event_type, next_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2""")
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: per-user event sequences (ordered by
    ts with the unique event_id tiebreak) folded into (from, to) type
    counts via lead() — one shuffle on user_id, the same exchange the
    sessionizer uses, then a tiny keyed count."""
    ev = events_t(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("event_type",
                    F.lead("event_type").over(w).alias("next_type"))
    return (seq.where(F.col("next_type").isNotNull())
            .groupBy("event_type", "next_type")
            .agg(F.count(F.lit(1)).alias("n")))


@q("olap_share_of_total",
   """WITH m AS (SELECT o_orderpriority,
                        count(*) AS n_orders,
                        round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2)
                          ::DOUBLE AS revenue
                 FROM orders GROUP BY 1)
      SELECT o_orderpriority, n_orders, revenue,
             round(revenue / sum(revenue) OVER (), 6) AS revenue_share,
             round(n_orders / sum(n_orders) OVER (), 6) AS order_share
      FROM m""")
def olap_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total BI view: per-priority revenue/order share via an
    unpartitioned window over the ALREADY-AGGREGATED 5-row table — the
    single-partition exchange carries 5 rows, never the fact (the fact
    collapses in the keyed aggregation first)."""
    o = t(spark, sf_dir, "orders")
    m = (o.groupBy("o_orderpriority")
         .agg(F.count(F.lit(1)).alias("n_orders"),
              F.round(F.sum(F.col("o_totalprice").cast("decimal(28,6)")), 2)
               .cast("double").alias("revenue")))
    w = Window.partitionBy()
    return m.select(
        "o_orderpriority", "n_orders", "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6)
         .alias("revenue_share"),
        F.round(F.col("n_orders") / F.sum("n_orders").over(w), 6)
         .alias("order_share"))


@q("olap_grouping_sets_orders",
   """SELECT o_orderpriority, o_orderstatus,
             grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS gid,
             count(*) AS n,
             round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2)::DOUBLE
               AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""")
def olap_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: per-priority totals, per-status totals, and
    the grand total in ONE scan — the hand-picked-levels variant of
    rollup/cube (same Expand + partial-agg plan, fanout = number of sets,
    so the cost is levels x one pass, never levels x scans)."""
    o = t(spark, sf_dir, "orders")
    return (o.groupingSets([["o_orderpriority"], ["o_orderstatus"], []],
                           "o_orderpriority", "o_orderstatus")
            .agg((F.grouping("o_orderpriority") * 2
                  + F.grouping("o_orderstatus")).cast("long").alias("gid"),
                 F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("o_totalprice").cast("decimal(28,6)")), 2)
                  .cast("double").alias("sum_price")))


@q("ts_yoy_growth",
   """WITH monthly AS (
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
               count(*) AS n_orders,
               round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2)::DOUBLE
                 AS revenue
        FROM orders GROUP BY 1, 2)
      SELECT y, m, n_orders, revenue,
             lag(revenue) OVER (PARTITION BY m ORDER BY y) AS revenue_prev_yr,
             round(revenue - lag(revenue) OVER (PARTITION BY m ORDER BY y), 2)
               AS yoy_diff
      FROM monthly""")
def ts_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year comparison: monthly revenue joined to the same month
    one year earlier via lag() partitioned by month-of-year — no self-join,
    one window over the (tiny) month-grain aggregate. Decimal-domain sums
    keep the revenue exact across engines."""
    o = t(spark, sf_dir, "orders")
    monthly = (o.groupBy(F.year("o_orderdate").cast("long").alias("y"),
                         F.month("o_orderdate").cast("long").alias("m"))
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum(F.col("o_totalprice").cast("decimal(28,6)")),
                            2).cast("double").alias("revenue")))
    w = Window.partitionBy("m").orderBy("y")
    return monthly.select(
        "y", "m", "n_orders", "revenue",
        F.lag("revenue").over(w).alias("revenue_prev_yr"),
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2)
         .alias("yoy_diff"))


@q("ts_rolling_window",
   """SELECT o_orderkey, o_custkey,
             count(*) OVER w AS n_last3,
             round(sum(CAST(o_totalprice AS DECIMAL(28,6))) OVER w, 2)
               ::DOUBLE AS sum_last3,
             round((sum(CAST(o_totalprice AS DECIMAL(28,6))) OVER w)
                   ::DOUBLE / (count(*) OVER w), 6) AS avg_last3,
             min(o_totalprice) OVER w AS min_last3,
             max(o_totalprice) OVER w AS max_last3
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""")
def ts_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window time-series features: per-customer trailing-3-order
    count/sum/avg/min/max — the moving-aggregate feature-engineering
    primitive (trailing spend, rolling extremes). ONE window pass,
    partitioned by the entity key (parallelism = customers, never a
    global sort); the frame's total order is (date, orderkey) so ties
    resolve identically on any engine, and the rolling sum is
    decimal-routed with the double-domain avg division — bit-exact vs
    the SQL oracle. At 100 TB this is one shuffle by customer; a
    skewed entity would salt exactly like skew_salted_latest."""
    o = t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(-2, 0))
    sdec = F.sum(F.col("o_totalprice").cast("decimal(28,6)")).over(w)
    n = F.count(F.lit(1)).over(w)
    return o.select(
        "o_orderkey", "o_custkey",
        n.alias("n_last3"),
        F.round(sdec, 2).cast("double").alias("sum_last3"),
        F.round(sdec.cast("double") / n, 6).alias("avg_last3"),
        F.min("o_totalprice").over(w).alias("min_last3"),
        F.max("o_totalprice").over(w).alias("max_last3"))


@q("olap_time_rollup_events",
   """WITH e AS (SELECT year(ts) AS y, month(ts) AS m, day(ts) AS d, value
                 FROM events)
      SELECT y, m, d,
             grouping(y) * 4 + grouping(m) * 2 + grouping(d) AS gid,
             count(*) AS n_events,
             round(sum(CAST(value AS DECIMAL(28,6))), 2)::DOUBLE AS sum_value
      FROM e GROUP BY ROLLUP (y, m, d)""")
def olap_time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: day, month, year and
    grand-total aggregates of the event stream in ONE pass (ROLLUP compiles
    to Expand + partial agg — no re-scan per granularity; at 100 TB this is
    the continuous-aggregate build, shuffling only the post-combine partial
    rows)."""
    ev = events_t(spark, sf_dir).select(
        F.year("ts").alias("y"), F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"), "value")
    return (ev.rollup("y", "m", "d")
            .agg((F.grouping("y") * 4 + F.grouping("m") * 2 + F.grouping("d"))
                 .cast("long").alias("gid"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
                  .cast("double").alias("sum_value")))


@q("j11_range_band_join",
   """WITH bands(band, lo, hi) AS (VALUES
        ('b900', 900.0, 925.0), ('b925', 925.0, 950.0),
        ('b950', 950.0, 975.0), ('b975', 975.0, 1000.0))
      SELECT band, count(*) AS n_parts,
             round(sum(CAST(p_retailprice AS DECIMAL(28,6))), 2)::DOUBLE
               AS sum_price
      FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
      GROUP BY band""")
def j11_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: fact rows land in value bands via a broadcast
    theta-join. The band dim is tiny by construction, so the right 100 TB
    plan is BroadcastNestedLoopJoin (zero fact shuffle) — never a
    sort-merge over a range predicate."""
    p = t(spark, sf_dir, "part")
    bands = F.broadcast(spark.createDataFrame(
        [("b900", 900.0, 925.0), ("b925", 925.0, 950.0),
         ("b950", 950.0, 975.0), ("b975", 975.0, 1000.0)],
        "band string, lo double, hi double"))
    cond = (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi)
    return (p.join(bands, cond)
            .groupBy("band")
            .agg(F.count(F.lit(1)).alias("n_parts"),
                 F.round(F.sum(F.col("p_retailprice").cast("decimal(28,6)")), 2)
                  .cast("double").alias("sum_price")))


@q("sketch_approx_aggs", pinned("sketch_approx_aggs"))
def sketch_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB sketch path: HyperLogLog++ distinct counts and
    quantile-sketch medians per group — single pass, fixed-size state per
    group regardless of data volume (the exact twins are a05 /
    olap_percentiles). Estimates are engine-specific, so the driver check
    pins the estimates as an sf0.01 golden (sketches are deterministic
    algorithms); tests/ additionally bounds the relative error against
    the exact values."""
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_orderkey", rsd=0.01)
                  .alias("approx_orders"),
                 F.percentile_approx("l_extendedprice", F.lit(0.5),
                                     F.lit(10000)).alias("approx_p50")))


@q("olap_percentiles",
   """SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
      FROM lineitem GROUP BY l_returnflag""")
def olap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (the at-scale variant is
    percentile_approx — same call shape, sketch-based)."""
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
                 F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95")))


@q("stream_session_window",
   """WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged)
      SELECT user_id, min(ts) AS session_start, count(*) AS n_events
      FROM sess GROUP BY user_id, session_id""")
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming sessionization via the native session_window
    (30-min gap) with a watermark, drained with availableNow — must equal
    the batch lag+cumsum gap sessionization."""
    from walmart_project_etl_spark.streaming.jobs import (EVENTS_SCHEMA,
                                                          _run_available_now)
    ev = (spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
          .load(events_dir(spark, sf_dir))
          .withWatermark("ts", "2 hours"))
    agg = (ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
           .agg(F.count(F.lit(1)).alias("n_events")))
    out = _run_available_now(agg, "stream_session")
    return out.select("user_id", F.col("win.start").alias("session_start"),
                      "n_events")


@q("events_json_extract",
   """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
             count(*) AS n,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
      FROM events GROUP BY k_bucket""")
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props: JSON field extraction with a declared schema
    (from_json — stays in the JVM, pushable into codegen; the scale-path
    alternative to string get_json_object per access)."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    ev = events_t(spark, sf_dir)
    parsed = ev.withColumn(
        "__p", F.from_json("props", StructType([StructField("k", IntegerType())])))
    return (parsed.groupBy((F.col("__p.k") % 10).alias("k_bucket"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("__p.k").alias("sum_k")))


@q("sim_ivf_ann_topk", pinned("sim_ivf_ann_topk"))
def sim_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN: KMeans coarse quantizer (64 cells), probe the 16
    nearest of 64 cells per query, exact cosine re-rank — the FAISS
    recipe as DataFrame ops (defaults from the recall sweep documented
    in operators/similarity.py:ivf_ann_topk). Oracle = pinned sf0.01 golden of the top-k set; recall
    vs brute force asserted in tests/ and gated by sim_recall_report."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 7) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
    return similarity.ivf_ann_topk(emb, queries, k=10)


_IVF_CACHE: dict[str, str] = {}


def ivf_index_from_store(spark: SparkSession, sf_dir: str):
    """Build the IVF index ONCE and round-trip it through STORAGE: the
    cell-assigned corpus goes through the ``Warehouse`` seam as parquet
    PARTITIONED BY cell (so a probe of n_probe cells is partition pruning,
    not a scan), the centroid list as a JSON sidecar. Every later query
    batch reads the index back — no KMeans refit, no re-assignment.
    Returns ``(assigned, centroids)`` exactly like ``ivf_build``."""
    import hashlib
    import json
    import os

    from walmart_project_etl_spark.sources.catalog import Warehouse

    from .util import build_once

    if sf_dir not in _IVF_CACHE:
        def build(out: str) -> None:
            emb = t(spark, sf_dir, "embeddings")
            assigned, centroids = similarity.ivf_build(
                emb, "vec_id", "embedding", n_clusters=64, seed=42)
            Warehouse(spark, out).write("tgt", "ivf_index", assigned,
                                        partition_by=["cell"])
            with open(os.path.join(out, "centroids.json"), "w") as fh:
                json.dump(centroids, fh)

        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        _IVF_CACHE[sf_dir] = build_once(f"ivf_index_{tag}", build)
    root = _IVF_CACHE[sf_dir]
    assigned = Warehouse(spark, root).read("tgt", "ivf_index")
    with open(os.path.join(root, "centroids.json")) as fh:
        centroids = json.load(fh)
    return assigned, centroids


@q("sim_ivf_persisted_topk", pinned("sim_ivf_persisted_topk"))
def sim_ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The build-once/query-MANY serving shape end-to-end: a FRESH query
    batch (vec_id % 100 = 23 — disjoint from the one-shot query's batch)
    served from the PERSISTED IVF index (parquet partitioned by cell +
    centroid sidecar, ``ivf_index_from_store``), proving the index
    round-trips storage — the entire point of the ivf_build/ivf_query
    split. Per-batch cost is cell-pruned scans + one top-k window; the
    quantizer never refits. Recall vs brute force on the persisted index
    is pinned by tests/test_operators.py."""
    assigned, centroids = ivf_index_from_store(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 23) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
    return similarity.ivf_query(assigned, centroids, queries, k=10)


@q("mm_resize_images", pinned("mm_resize_images"))
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: payload → fixed 8×8 pixel grid via mapInPandas
    (stride-sampled stub; real interpolation is the codec integration
    point). The array<int> pixel grid stays on the operator API (tests
    assert grid exactness); the driver-facing result serializes it to
    scalars (xxhash64 digest + length) so the harness canonicalizer can
    sort the rows. Oracle = pinned sf0.01 golden of all 500 rows."""
    media = multimodal.documents_as_media(t(spark, sf_dir, "documents"))
    grids = multimodal.resize_images(media, target_w=8, target_h=8)
    return grids.select(
        "media_id", "width", "height",
        F.xxhash64(F.concat_ws(",", F.col("pixels").cast("array<string>")))
         .alias("pixels_hash"),
        F.size("pixels").alias("n_pixels"))


@q("events_attribution",
   """WITH w AS (
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_id END IGNORE NULLS)
                 OVER lastw AS attr_touch_id,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS)
                 OVER lastw AS attr_channel,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN ts END IGNORE NULLS)
                 OVER lastw AS __touch_ts
        FROM events
        WINDOW lastw AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      SELECT event_id, user_id, ts, attr_touch_id, attr_channel,
             CAST(floor((epoch_us(ts) - epoch_us(__touch_ts)) / 1000000)
                  AS BIGINT) AS secs_since_touch
      FROM w WHERE event_type = 'purchase'""")
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credited to the user's most
    recent strictly-preceding click/view (NULL if none). Window form —
    one shuffle on user_id, no conversions×touches self-join
    (operators/events.py:last_touch_attribution)."""
    ev = events_t(spark, sf_dir)
    return events.last_touch_attribution(ev, "purchase", ["click", "view"])


@q("olap_histogram",
   """WITH mm AS (
        SELECT l_returnflag, min(l_extendedprice) AS mn,
               max(l_extendedprice) AS mx
        FROM lineitem GROUP BY l_returnflag),
      binned AS (
        SELECT l.l_returnflag,
               CAST(least(greatest(floor((l_extendedprice - mn)
                                         / ((mx - mn) / 20.0)), 0), 19)
                    AS INT) AS bin,
               mn, mx
        FROM lineitem l JOIN mm USING (l_returnflag)
        WHERE l_extendedprice IS NOT NULL)
      SELECT l_returnflag, bin, count(*) AS n_rows,
             min(mn) + bin * ((min(mx) - min(mn)) / 20.0) AS bin_lo,
             min(mn) + (bin + 1) * ((min(mx) - min(mn)) / 20.0) AS bin_hi
      FROM binned GROUP BY l_returnflag, bin""")
def olap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 20-bin price histogram per return flag — the profiling
    primitive for distribution dashboards / skew diagnosis. Edges derive
    from min/max only (no float summation), so bin membership and edges
    are bit-stable across engines (operators/cleaning.py:
    equi_width_histogram)."""
    from walmart_project_etl_spark.operators import cleaning
    li = t(spark, sf_dir, "lineitem")
    return cleaning.equi_width_histogram(li, "l_extendedprice", 20,
                                         group_cols=["l_returnflag"])


@q("text_bpe_train", pinned("text_bpe_train"))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) on the
    documents corpus: one corpus-scale word-frequency job, then 24
    merge rounds over the distinct-word table only (top adjacent pair
    by summed word freq, ties lexicographic; greedy L-to-R
    non-overlapping merge fold). Returns the rank-ordered merge table —
    the artifact a tokenizer serving layer persists. Iterative +
    engine-internal, so the oracle pins the sf0.01 merge table; the
    classic-example semantics and the lossless round-trip are pinned in
    tests/test_operators.py."""
    from walmart_project_etl_spark.operators import bpe
    d = t(spark, sf_dir, "documents")
    return bpe.merges_df(spark, bpe.bpe_train(d, "text", n_merges=24))


@q("text_bpe_encode", pinned("text_bpe_encode"))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with corpus-trained merges: distinct words tokenize
    once (a word's tokenization depends only on the word), the
    word→tokens map broadcast-joins back to the corpus, and per-doc
    token streams reassemble in word order — one corpus scan however
    long the merge table is. Returns (doc_id, n_tokens, tokens_md5);
    the md5 pins the full token sequence at golden-friendly width."""
    from walmart_project_etl_spark.operators import bpe
    d = t(spark, sf_dir, "documents")
    merges = bpe.bpe_train(d, "text", n_merges=24)
    enc = bpe.bpe_encode(d, "doc_id", "text", merges)
    return enc.select("doc_id", "n_tokens",
                      F.md5(F.concat_ws(" ", "tokens")).alias("tokens_md5"))


@q("stream_partition_ingest",
   """SELECT event_id, ts, user_id, event_type, value FROM events
      WHERE event_type IN ('click', 'purchase')""")
def stream_partition_ingest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE streaming ingest into a PARTITIONED tx table: each
    micro-batch is one idempotent insert-only MERGE commit (txn marker
    → re-delivery is a logged no-op) followed by hot-partition-scoped
    OPTIMIZE (compact_partitions — only the batch's partitions ever
    rewrite). The read side is a partition-pruned ``read_partitions``;
    the oracle is the batch filter it must converge to for any
    micro-batch split (replay idempotence additionally pinned in
    tests/test_streaming.py)."""
    import tempfile

    from walmart_project_etl_spark.streaming import stream_partition_ingest
    t_ = stream_partition_ingest(
        spark, events_dir(spark, sf_dir),
        tempfile.mkdtemp(prefix="wpe_stream_part_"),
        max_files_per_trigger=4)
    return t_.read_partitions(["click", "purchase"]) \
        .select("event_id", "ts", "user_id", "event_type", "value")


@q("stream_agg_mv_follow",
   """WITH final AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderkey % 25 = 0 THEN 9.0
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 40 <> 7)
      SELECT md5(o_orderstatus) AS mv_key, o_orderstatus,
             count(*) AS n_rows,
             round(sum(CAST(price AS DECIMAL(28,6))), 2)::DOUBLE AS total
      FROM final GROUP BY o_orderstatus""")
def stream_agg_mv_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING materialized-view maintenance: the tx-table CDF
    Structured-Streaming source paces per-micro-batch exactly-once
    refreshes of the aggregate MV (streaming/jobs.py:stream_mv_refresh
    — CDF source → delta fold → conditional merge, all transactional;
    checkpointed resume folds only new commits, pinned in
    tests/test_txlog_cdf.py). The oracle recomputes the final
    aggregate from scratch — exact for ANY micro-batch split."""
    import shutil

    from walmart_project_etl_spark.sources.txlog import TxTable
    from walmart_project_etl_spark.streaming import stream_mv_refresh

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                          "o_totalprice", "o_orderstatus")
    root = os.path.join(tempfile.gettempdir(), "wpe_stream_mv")
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root + "_mv", ignore_errors=True)
    src = TxTable(spark, root)
    src.create(o.where(F.col("o_orderkey") % 2 == 0), "o_orderkey",
               n_files=4, change_feed=True)
    src.append(o.where(F.col("o_orderkey") % 2 == 1))
    src.merge_upsert(o.where(F.col("o_orderkey") % 25 == 0)
                     .withColumn("o_totalprice", F.lit(9.0)))
    src.delete_keys(o.where(F.col("o_orderkey") % 40 == 7)
                    .select("o_orderkey"))
    mv = stream_mv_refresh(spark, root, root + "_mv",
                           ["o_orderstatus"], "o_totalprice")
    return mv.snapshot().select(
        "mv_key", "o_orderstatus", "n_rows",
        F.round(F.col("total"), 2).cast("double").alias("total"))


@q("sim_pq_ann_topk", pinned("sim_pq_ann_topk"))
def sim_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT-QUANTIZATION ANN with ADC + exact re-rank
    (operators/similarity.py:pq_ann_topk): seeded per-subspace KMeans
    codebooks, Arrow-batched encode to m=8 small-int codes, then a
    corpus-scale COMPRESSED-DOMAIN scan — approximate cosine is one
    JVM zip_with over the code array (m bytes per vector instead of d
    floats), top rerank·k candidates re-ranked by exact cosine. The
    memory-bound similarity tier FAISS-PQ provides, as DataFrame ops;
    recall@10 = 0.94 vs brute force at the defaults (sweep in the
    operator docstring), gated in tests/test_similarity.py. Oracle =
    pinned sf0.01 golden (seeded KMeans is engine-internal but
    deterministic)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 7) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
    return similarity.pq_ann_topk(emb, queries, k=10)


def _kmeans_cte(k: int, iters: int) -> str:
    """Generated CTE chain for the deterministic Lloyd's k-means: the
    init + each (assign, update) round unrolled, with the SAME rounding
    discipline as the engine (round-6 cosines, decimal means). Opens
    the WITH clause and ends at ``af`` — the final assignment
    (vec_id, cl, cs) — so callers append their own consumers."""
    cos = ("round(list_dot_product(v.e, {c}.ce)"
           " / (sqrt(list_dot_product(v.e, v.e))"
           " * sqrt(list_dot_product({c}.ce, {c}.ce))), 6)")
    parts = [f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
init AS (
  SELECT vec_id, e,
         row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1
           AS cl
  FROM v
  QUALIFY row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id)
    <= {k}),
c0 AS (SELECT cl, e AS ce FROM init)"""]
    for i in range(1, iters + 1):
        prev, cur = f"c{i - 1}", f"c{i}"
        parts.append(f""",
a{i} AS (
  SELECT v.vec_id, {prev}.cl, {cos.format(c=prev)} AS cs
  FROM v CROSS JOIN {prev}
  QUALIFY row_number() OVER (PARTITION BY v.vec_id
                             ORDER BY cs DESC, cl ASC) = 1),
m{i} AS (
  SELECT a{i}.cl, i::INT AS p,
         round(CAST(sum(CAST(v.e[i::INT] AS DECIMAL(28,6)))::DOUBLE
                    / count(*) AS DECIMAL(28,8)), 6)::DOUBLE AS x
  FROM a{i} JOIN v USING (vec_id),
       unnest(range(1, len(v.e) + 1)) AS r(i)
  GROUP BY a{i}.cl, p),
{cur} AS (
  SELECT {prev}.cl, COALESCE(mm.ce, {prev}.ce) AS ce
  FROM {prev} LEFT JOIN (SELECT cl, list(x ORDER BY p) AS ce
                         FROM m{i} GROUP BY cl) mm USING (cl))""")
    last = f"c{iters}"
    parts.append(f""",
af AS (
  SELECT v.vec_id, {last}.cl, {cos.format(c=last)} AS cs
  FROM v CROSS JOIN {last}
  QUALIFY row_number() OVER (PARTITION BY v.vec_id
                             ORDER BY cs DESC, cl ASC) = 1)""")
    return "".join(parts)


@q("sim_quantize_int8",
   """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      s AS (SELECT vec_id, e,
                   list_max(list_transform(e, x -> abs(x))) AS amax
            FROM v),
      q AS (SELECT vec_id, amax,
                   CASE WHEN amax > 0 THEN
                     CAST(round(CAST(x * 127 / amax AS DECIMAL(28,8)), 0)
                          AS INT)
                   ELSE 0 END AS qi
            FROM s, unnest(e) AS u(x))
      SELECT vec_id,
             round(CAST(amax AS DECIMAL(28,8)), 6)::DOUBLE AS scale,
             CAST(sum(qi) AS BIGINT) AS sum_q,
             min(qi) AS min_q, max(qi) AS max_q,
             CAST(sum(CASE WHEN abs(qi) = 127 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_sat
      FROM q GROUP BY vec_id, amax""")
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT8 scalar quantization of the embedding column — the standard
    4× storage compression for a 100 TB embedding store (absmax
    scaling: q_i = round(x_i·127/max|x|), scale stored per vector for
    dequantization). Pure Column expressions (transform + aggregate —
    whole-stage codegen, zero shuffle, zero UDF); the round routes
    through DECIMAL so Spark and the oracle tie-break identically.
    Output is the per-vector quantization summary (scale, q-sum/
    extremes, saturation count) — exact SQL oracle; zero vectors
    quantize to all-zero with scale 0."""
    emb = t(spark, sf_dir, "embeddings")
    v = similarity._as_double("embedding")
    amax = F.array_max(F.transform(v, F.abs))
    qi = F.transform(
        v, lambda x: F.when(
            amax > 0,
            F.round((x * 127 / amax).cast("decimal(28,8)"), 0)
             .cast("int")).otherwise(F.lit(0)))
    q = emb.select(
        "vec_id",
        F.round(amax.cast("decimal(28,8)"), 6).cast("double")
         .alias("scale"),
        qi.alias("__q"))
    return q.select(
        "vec_id", "scale",
        F.aggregate(F.col("__q"), F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("sum_q"),
        F.array_min("__q").alias("min_q"),
        F.array_max("__q").alias("max_q"),
        F.aggregate(F.col("__q"), F.lit(0).cast("long"),
                    lambda a, x: a + (F.abs(x) == 127).cast("long"))
         .alias("n_sat"))


@q("sim_pca_project", pinned("sim_pca_project"))
def sim_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA (operators/similarity.py pca_fit/pca_project):
    the embedding dimensionality-reduction preprocessor (64→4 dims
    before storage/ANN). Fit is ONE corpus scan — each partition folds
    to a d×d partial Gram via an Arrow-batched numpy matmul, partials
    merge through an exact decimal-summed (i,j) aggregation (d²+d+1
    rows at any corpus size), and only the 64×64 eigendecomposition
    runs on the driver; projection is a broadcast of the k components.
    Deterministic at any parallelism (sorted partition folds + exact
    merge + fixed eigenvector signs, proven in tests), so the golden
    pins the full projected row set; the eigensolve itself is the
    engine-internal step DuckDB cannot recompute."""
    from walmart_project_etl_spark.operators.similarity import (pca_fit,
                                                                pca_project)

    emb = t(spark, sf_dir, "embeddings")
    model = pca_fit(emb, k=4)
    proj = pca_project(emb, model)
    return proj.select(
        "vec_id", *[F.element_at("pc", i + 1).alias(f"pc{i + 1}")
                    for i in range(4)])


@q("sim_kmeans_labels",
   _kmeans_cte(k=8, iters=3)
   + "\nSELECT vec_id, cl AS cluster, cs AS centroid_sim FROM af")
def sim_kmeans_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed Lloyd's k-means (k=8, 3 rounds) over
    the embeddings: md5-seeded init, argmax round-6 cosine assignment,
    decimal-routed per-(cluster, dim) mean updates — bit-identical at
    any parallelism, which is what lets the ORACLE recompute all three
    rounds in SQL exactly (MLlib's k-means|| cannot be oracled this
    way). The missing producer for SemDeDup/IVF cluster labels at
    100 TB: per round one corpus scan + one uniform (cluster, dim)
    aggregation; the driver syncs k×d rounded floats per round."""
    emb = t(spark, sf_dir, "embeddings")
    out = similarity.kmeans_labels(emb, "vec_id", "embedding",
                                   k=8, iters=3)
    return out.select("vec_id", F.col("cluster").cast("long")
                      .alias("cluster"), "centroid_sim")


#: SemDeDup seeded by the deterministic k-means — the paper's ACTUAL
#: pipeline (k-means the corpus, then dedup within clusters), fully
#: recomputed in SQL: the k-means CTEs feed a labeled source, then the
#: same one-round-refine + cluster-blocked-pair + keep-least-prototypical
#: chain as _SEMDEDUP_ORACLE runs over it. Parametric in k via
#: _kmeans_cte, so the k ∝ N scaled twin reuses it with its derived k.
_SEMDEDUP_CONSUMER_SQL = """,
v2 AS (SELECT v.vec_id, af.cl AS label, v.e AS e
       FROM v JOIN af USING (vec_id)),
flat2 AS (
  SELECT label, i::INT AS dim_idx, e[i::INT] AS x
  FROM v2, unnest(range(1, len(e) + 1)) AS r(i)),
cent2 AS (
  SELECT label, dim_idx,
         round(CAST(sum(CAST(x AS DECIMAL(28,6)))::DOUBLE / count(*)
                    AS DECIMAL(28,8)), 6)::DOUBLE AS c
  FROM flat2 GROUP BY label, dim_idx),
carr2 AS (SELECT label AS scl, list(c ORDER BY dim_idx) AS ce
          FROM cent2 GROUP BY label),
scored2 AS (
  SELECT v2.vec_id, carr2.scl,
         round(list_dot_product(v2.e, carr2.ce)
               / (sqrt(list_dot_product(v2.e, v2.e))
                  * sqrt(list_dot_product(carr2.ce, carr2.ce))), 6) AS cs
  FROM v2 CROSS JOIN carr2),
assign2 AS (
  SELECT vec_id, scl, cs FROM scored2
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY cs DESC, scl ASC) = 1),
pairs2 AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb, a.cs AS csa, b.cs AS csb
  FROM assign2 a
  JOIN assign2 b ON a.scl = b.scl AND a.vec_id < b.vec_id
  JOIN v2 va ON va.vec_id = a.vec_id
  JOIN v2 vb ON vb.vec_id = b.vec_id
  WHERE round(list_dot_product(va.e, vb.e)
              / (sqrt(list_dot_product(va.e, va.e))
                 * sqrt(list_dot_product(vb.e, vb.e))), 6) >= 0.3),
dropped2 AS (
  SELECT DISTINCT CASE WHEN (csa < csb) OR (csa = csb AND ida < idb)
                       THEN idb ELSE ida END AS vec_id
  FROM pairs2)
SELECT a.vec_id, CAST(a.scl AS BIGINT) AS cluster,
       a.cs AS centroid_sim, (d.vec_id IS NULL) AS kept
FROM assign2 a LEFT JOIN dropped2 d USING (vec_id)"""

_SEMDEDUP_KMEANS_ORACLE = _kmeans_cte(k=8, iters=2) \
    + _SEMDEDUP_CONSUMER_SQL


@q("dedup_semdedup_kmeans", _SEMDEDUP_KMEANS_ORACLE)
def dedup_semdedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over REAL k-means clusters — the paper's actual
    pipeline end-to-end: the deterministic Lloyd's k-means (k=8, 2
    rounds) produces the cluster seeds, SemDeDup refines one more
    round and dedups within clusters (operators/dedup.py
    semdedup_kmeans with k pinned). The synthetic-label variant
    (``dedup_semdedup``) pins the dedup semantics in isolation; the
    SCALED twin (``dedup_semdedup_kmeans_scaled``) derives k ∝ N. The
    whole chain — every k-means round included — is recomputed
    exactly by the SQL oracle."""
    emb = t(spark, sf_dir, "embeddings")
    out = dedup.semdedup_kmeans(emb, "vec_id", "embedding",
                                threshold=0.3, k=8, iters=2)
    return out.select("vec_id", F.col("cluster").cast("long")
                      .alias("cluster"), "centroid_sim", "kept")


#: sf0.01 embeddings N = 500; the oracle bakes the SAME k the query
#: derives at that N: kmeans_k_for(500, target=8) = ceil(500/8) = 63.
_SEMDEDUP_KMEANS_SCALED_ORACLE = _kmeans_cte(k=63, iters=2) \
    + _SEMDEDUP_CONSUMER_SQL


@q("dedup_semdedup_kmeans_scaled", _SEMDEDUP_KMEANS_SCALED_ORACLE)
def dedup_semdedup_kmeans_scaled(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """SemDeDup with the paper's SCALE RULE as a tested knob
    (operators/dedup.py semdedup_kmeans, target_cluster_size=8): k is
    DERIVED as ceil(N / target) from one corpus count, bounding
    expected cluster size — within-cluster pair cost stays O(N ×
    target) as the corpus grows, where the fixed-k twin degrades
    O(N²/k) (measured in docs/SCALE.md). Past KMEANS_LITERAL_K_MAX
    the k-means assignment runs its broadcast-join path (plan size
    O(1) in k), exercised here: the derived k at sf0.01 is 63. The
    oracle recomputes the whole chain with that same k baked in —
    exact, because the derivation is deterministic at a known N."""
    emb = t(spark, sf_dir, "embeddings")
    out = dedup.semdedup_kmeans(emb, "vec_id", "embedding",
                                threshold=0.3, target_cluster_size=8,
                                iters=2)
    return out.select("vec_id", F.col("cluster").cast("long")
                      .alias("cluster"), "centroid_sim", "kept")


# ------------------------------------------- exact-substring span dedup (r12)

#: shared tokenize + shingle CTE for the span-dedup oracles — mirrors the
#: operator exactly: whitespace split, empty tokens dropped, stride-1
#: windows of 8 tokens, md5 grouping (the sql_compatible hash path).
_SPAN_CTE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
  FROM documents),
pos AS (
  SELECT doc_id, unnest(w) AS tok,
         unnest(range(len(w))) AS pos
  FROM toks),
sh AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(w[i+1:i+8], ' ')) AS h
  FROM (SELECT doc_id, w, unnest(range(len(w) - 7)) AS i
        FROM toks WHERE len(w) >= 8)),
dup AS (SELECT h FROM sh GROUP BY h HAVING count(*) > 1),
marked AS (
  SELECT doc_id, pos AS s, pos + 7 AS e
  FROM sh WHERE h IN (SELECT h FROM dup)),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                  PARTITION BY doc_id ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS brk
  FROM marked),
spans AS (
  SELECT doc_id, min(s) AS span_start, max(e) AS span_end
  FROM (SELECT doc_id, s, e,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS gid
        FROM isl)
  GROUP BY doc_id, gid)
"""


@q("dedup_span_marks", _SPAN_CTE + """
SELECT doc_id, span_start, span_end FROM spans""")
def dedup_span_marks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span marking (Lee et al. 2022): maximal token spans
    covered by any 8-token window occurring more than once anywhere in
    the corpus. Shingling is a narrow in-row transform (O(corpus
    tokens), no self-join); the duplicate set comes from one hash-keyed
    groupBy and joins back broadcast-style under AQE. md5 hash path so
    the DuckDB oracle reproduces bucketing exactly."""
    docs = t(spark, sf_dir, "documents")
    return dedup.duplicate_spans(docs, "text", "doc_id", width=8,
                                 hash_fn="md5")


@q("dedup_span_removal", _SPAN_CTE + """
SELECT p.doc_id,
       coalesce(string_agg(CASE WHEN sp.span_start IS NULL THEN p.tok END,
                           ' ' ORDER BY p.pos), '') AS clean_text,
       count(*) AS n_tokens,
       sum(CASE WHEN sp.span_start IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_removed
FROM pos p
LEFT JOIN spans sp
  ON p.doc_id = sp.doc_id AND p.pos BETWEEN sp.span_start AND sp.span_end
GROUP BY p.doc_id""")
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal policy: cut EVERY copy of each duplicated
    8-token span out of each document and reassemble the survivors in
    position order (Lee et al. 2022 §4 — dropping all copies, not
    keeping one canonical, is what the paper ships for training data).
    The span→token application is an equi-join on doc_id with a range
    predicate — sort-merge keyed on the document, never cartesian."""
    docs = t(spark, sf_dir, "documents")
    return dedup.remove_duplicate_spans(docs, "text", "doc_id", width=8,
                                        hash_fn="md5")


@q("sample_contrastive_triplets", f"""
WITH d AS (SELECT doc_id, md5(text) AS dig FROM {_DUPES_SQL} c),
pos AS (
  SELECT dig, doc_id AS anchor_id,
         lead(doc_id) OVER (PARTITION BY dig ORDER BY doc_id)
           AS positive_id
  FROM d),
p2 AS (SELECT * FROM pos WHERE positive_id IS NOT NULL),
pool AS (
  SELECT doc_id AS negative_id, dig AS ndig,
         row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) - 1
           AS idx
  FROM d
  QUALIFY row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id)
            <= 256)
SELECT anchor_id, positive_id, negative_id
FROM p2 JOIN pool
  ON pool.idx = ('0x' || substr(md5('neg|' || p2.anchor_id::VARCHAR),
                                1, 8))::BIGINT
                % (SELECT count(*) FROM pool)
WHERE pool.ndig <> p2.dig""")
def sample_contrastive_triplets(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """CONTRASTIVE TRIPLET mining (operators/sampling.py:
    contrastive_triplets) — (anchor, positive, negative) training rows
    for embedding models: positives chain within exact-dup groups (k−1
    pairs per k-group, one md5-keyed shuffle, never all-pairs);
    negatives come from a bounded 256-doc hash pool broadcast to an
    equi-join on the anchor's own md5 draw. Deterministic end-to-end
    (the sampling module's no-RNG convention), hence the exact SQL
    oracle."""
    from walmart_project_etl_spark.operators.sampling import \
        contrastive_triplets
    corpus = _docs_with_dupes(spark, sf_dir)
    return contrastive_triplets(corpus, "doc_id", "text", pool_size=256)


@q("dedup_sorted_neighborhood", f"""
WITH corpus AS (SELECT doc_id, text FROM {_DUPES_SQL} c),
keyed AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                1, 24) AS key
  FROM corpus),
rn AS (
  SELECT doc_id, substr(key, 1, 4) AS blk,
         row_number() OVER (PARTITION BY substr(key, 1, 4)
                            ORDER BY key, doc_id) AS rn
  FROM keyed),
cand AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb
  FROM rn b
  JOIN rn a ON a.blk = b.blk AND a.rn BETWEEN b.rn - 3 AND b.rn - 1),
tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM corpus),
pos AS (SELECT doc_id, w,
               unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS i
        FROM tok),
shi AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        FROM pos),
sized AS (SELECT doc_id, count(*) AS n FROM shi GROUP BY doc_id),
inter AS (
  SELECT c.ida, c.idb, count(*) AS ni
  FROM cand c
  JOIN shi a ON a.doc_id = c.ida
  JOIN shi b ON b.doc_id = c.idb AND b.shingle = a.shingle
  GROUP BY c.ida, c.idb),
verified AS (
  SELECT ida, idb
  FROM inter
  JOIN sized sa ON sa.doc_id = ida
  JOIN sized sb ON sb.doc_id = idb
  WHERE round(CAST(ni::DOUBLE / (sa.n + sb.n - ni)
              AS DECIMAL(28,8)), 6)::DOUBLE >= 0.5)
SELECT c.doc_id, (d.idb IS NULL) AS kept
FROM corpus c
LEFT JOIN (SELECT DISTINCT idb FROM verified) d ON d.idb = c.doc_id""")
def dedup_sorted_neighborhood(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Sorted-Neighborhood dedup (Hernández & Stolfo 1995,
    operators/dedup.py:sorted_neighborhood): the third blocking
    strategy next to LSH banding and k-means — ONE sort-shuffle on a
    normalized key, candidates = each doc × its ≤3 sort predecessors
    (linear by construction, no shingle explosion), exact word-3-gram
    Jaccard verify, keep-first-in-sort-order. Pair generation is an
    equi-join on (block, row_number) after an offset explode; the
    window never crosses key-prefix blocks (the parallel-SNM recall
    compromise, documented in the operator)."""
    corpus = _docs_with_dupes(spark, sf_dir)
    return dedup.sorted_neighborhood(corpus, "doc_id", "text",
                                     window=4, block_len=4,
                                     key_len=24, threshold=0.5)


@q("dedup_snm_boundary", f"""
WITH corpus AS (SELECT doc_id, text FROM {_DUPES_SQL} c),
keyed AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                1, 24) AS key
  FROM corpus),
rn AS (
  SELECT doc_id, substr(key, 1, 12) AS blk,
         row_number() OVER (PARTITION BY substr(key, 1, 12)
                            ORDER BY key, doc_id) AS rn
  FROM keyed),
n AS (SELECT blk, count(*) AS n FROM rn GROUP BY blk),
bidx AS (SELECT blk, row_number() OVER (ORDER BY blk) AS bi FROM n),
heads AS (
  SELECT r.doc_id, x.bi, r.rn AS h
  FROM rn r JOIN bidx x ON x.blk = r.blk WHERE r.rn <= 3),
tails AS (
  SELECT r.doc_id, x.bi, n.n - r.rn + 1 AS t
  FROM rn r JOIN bidx x ON x.blk = r.blk JOIN n ON n.blk = r.blk
  WHERE n.n - r.rn + 1 <= 3),
cand AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb
  FROM rn b
  JOIN rn a ON a.blk = b.blk AND a.rn BETWEEN b.rn - 3 AND b.rn - 1
  UNION ALL
  SELECT t.doc_id, h.doc_id
  FROM tails t JOIN heads h ON h.bi = t.bi + 1 AND t.t + h.h <= 4),
tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM corpus),
pos AS (SELECT doc_id, w,
               unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS i
        FROM tok),
shi AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        FROM pos),
sized AS (SELECT doc_id, count(*) AS n FROM shi GROUP BY doc_id),
inter AS (
  SELECT c.ida, c.idb, count(*) AS ni
  FROM cand c
  JOIN shi a ON a.doc_id = c.ida
  JOIN shi b ON b.doc_id = c.idb AND b.shingle = a.shingle
  GROUP BY c.ida, c.idb)
SELECT ida AS id_a, idb AS id_b,
       round(CAST(ni::DOUBLE / (sa.n + sb.n - ni)
             AS DECIMAL(28,8)), 6)::DOUBLE AS jaccard
FROM inter
JOIN sized sa ON sa.doc_id = ida
JOIN sized sb ON sb.doc_id = idb
WHERE round(CAST(ni::DOUBLE / (sa.n + sb.n - ni)
            AS DECIMAL(28,8)), 6)::DOUBLE >= 0.5""")
def dedup_snm_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNM with the CROSS-BOUNDARY edge pass (operators/dedup.py:
    sorted_neighborhood_pairs cross_boundary=True): at fine block grain
    (12-char key prefix) the in-block window goes blind at block edges;
    the edge pass equi-joins each block's first window−1 rows against
    the previous block's last window−1 rows (t + h ≤ window — exactly
    the global-sort-window pairs that straddle one boundary), so recall
    at block edges is no longer silently lost. Returns the verified
    pairs; exact SQL oracle reproduces the t/h rule."""
    corpus = _docs_with_dupes(spark, sf_dir)
    return dedup.sorted_neighborhood_pairs(
        corpus, "doc_id", "text", window=4, block_len=12,
        key_len=24, threshold=0.5, cross_boundary=True)


@q("dedup_snm_chained", f"""
WITH corpus AS (SELECT doc_id, text FROM {_DUPES_SQL} c),
keyed AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                1, 24) AS key
  FROM corpus),
rn AS (
  SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) AS g
  FROM keyed),
cand AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb
  FROM rn b
  JOIN rn a ON a.g BETWEEN b.g - 3 AND b.g - 1),
tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM corpus),
pos AS (SELECT doc_id, w,
               unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS i
        FROM tok),
shi AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        FROM pos),
sized AS (SELECT doc_id, count(*) AS n FROM shi GROUP BY doc_id),
inter AS (
  SELECT c.ida, c.idb, count(*) AS ni
  FROM cand c
  JOIN shi a ON a.doc_id = c.ida
  JOIN shi b ON b.doc_id = c.idb AND b.shingle = a.shingle
  GROUP BY c.ida, c.idb)
SELECT ida AS id_a, idb AS id_b,
       round(CAST(ni::DOUBLE / (sa.n + sb.n - ni)
             AS DECIMAL(28,8)), 6)::DOUBLE AS jaccard
FROM inter
JOIN sized sa ON sa.doc_id = ida
JOIN sized sb ON sb.doc_id = idb
WHERE round(CAST(ni::DOUBLE / (sa.n + sb.n - ni)
            AS DECIMAL(28,8)), 6)::DOUBLE >= 0.5""")
def dedup_snm_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNM with the CHAINED global window (operators/dedup.py:
    sorted_neighborhood_pairs cross_boundary='chained') — closes the
    r14 residual miss: the adjacent-block edge pass still loses a dup
    pair separated by an ENTIRE block shorter than window−1 rows.
    Cumulative per-block row offsets give every row its global sort
    rank (the offsets fold runs over the one-row-per-block counts
    frame), and one chunk-keyed equi-join (chunk = rank div
    (window−1), successor probes own + previous chunk) reproduces the
    single-machine SNM sliding window EXACTLY — the oracle is the
    plain global row_number window, no block terms left. Same linear
    candidate bound (≤ 2·(window−1) partners per row); closed-form
    short-block fixture asserted in tests/test_operators.py."""
    corpus = _docs_with_dupes(spark, sf_dir)
    return dedup.sorted_neighborhood_pairs(
        corpus, "doc_id", "text", window=4, block_len=12,
        key_len=24, threshold=0.5, cross_boundary="chained")


@q("dedup_snm_multipass", """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 300000, 'xx ' || text FROM documents WHERE doc_id % 5 = 0),
keyed AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                1, 24) AS kf,
         substr(regexp_replace(lower(array_to_string(list_reverse(
                    list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')), '')),
                '[^a-z0-9]', '', 'g'), 1, 24) AS kr
  FROM corpus),
rf AS (
  SELECT doc_id, substr(kf, 1, 4) AS blk,
         row_number() OVER (PARTITION BY substr(kf, 1, 4)
                            ORDER BY kf, doc_id) AS rn
  FROM keyed),
rr AS (
  SELECT doc_id, substr(kr, 1, 4) AS blk,
         row_number() OVER (PARTITION BY substr(kr, 1, 4)
                            ORDER BY kr, doc_id) AS rn
  FROM keyed),
cand AS (
  -- reorient + DISTINCT before verification: a pair surfaced by BOTH
  -- passes must intersect its shingles once, not twice
  SELECT DISTINCT least(ida, idb) AS ida, greatest(ida, idb) AS idb
  FROM (
    SELECT a.doc_id AS ida, b.doc_id AS idb
    FROM rf b JOIN rf a ON a.blk = b.blk AND a.rn BETWEEN b.rn - 3 AND b.rn - 1
    UNION ALL
    SELECT a.doc_id, b.doc_id
    FROM rr b JOIN rr a ON a.blk = b.blk AND a.rn BETWEEN b.rn - 3 AND b.rn - 1)),
tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM corpus),
pos AS (SELECT doc_id, w,
               unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS i
        FROM tok),
shi AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        FROM pos),
sized AS (SELECT doc_id, count(*) AS n FROM shi GROUP BY doc_id),
inter AS (
  SELECT c.ida, c.idb, count(*) AS ni
  FROM cand c
  JOIN shi a ON a.doc_id = c.ida
  JOIN shi b ON b.doc_id = c.idb AND b.shingle = a.shingle
  GROUP BY c.ida, c.idb),
verified AS (
  SELECT idb AS hi
  FROM inter
  JOIN sized sa ON sa.doc_id = ida
  JOIN sized sb ON sb.doc_id = idb
  WHERE round(CAST(ni::DOUBLE / (sa.n + sb.n - ni)
              AS DECIMAL(28,8)), 6)::DOUBLE >= 0.5)
SELECT c.doc_id, (d.hi IS NULL) AS kept
FROM corpus c
LEFT JOIN (SELECT DISTINCT hi FROM verified) d ON d.hi = c.doc_id""")
def dedup_snm_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PASS SNM (operators/dedup.py:snm_multipass): forward +
    reversed-token-order key passes union their verified pairs, so a
    head corruption (the injected 'xx '-prefixed copies — invisible to
    the forward pass, whose keys diverge at char 1) is caught by the
    reversed pass while exact copies fall to the forward one. Pairs
    reorient to (min, max) before the union; drop the larger id. Two
    sort-shuffles, linear candidates per pass."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = (d.unionByName(
        d.where(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"))
        .unionByName(
        d.where(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat(F.lit("xx "), F.col("text")).alias("text"))))
    return dedup.snm_multipass(corpus, "doc_id", "text",
                               window=4, block_len=4, key_len=24,
                               threshold=0.5)


# ------------------------------------------------- sketch family (r12)

@q("sketch_cms_heavy_hitters", """
WITH it AS (SELECT user_id::VARCHAR AS item FROM events
            WHERE user_id IS NOT NULL),
cells AS (
  SELECT row, ('0x' || substr(md5(row::VARCHAR || ':' || item), 1, 15))
             ::BIGINT % 256 AS bucket, count(*) AS cnt
  FROM (SELECT item, unnest(range(4)) AS row FROM it)
  GROUP BY row, bucket),
probes AS (
  SELECT user_id, user_id::VARCHAR AS item, unnest(range(4)) AS row
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)),
pb AS (
  SELECT user_id, row,
         ('0x' || substr(md5(row::VARCHAR || ':' || item), 1, 15))
             ::BIGINT % 256 AS bucket
  FROM probes),
est AS (
  SELECT user_id, min(coalesce(cnt, 0))::BIGINT AS cms_est
  FROM pb LEFT JOIN cells USING (row, bucket) GROUP BY user_id)
SELECT e.user_id, e.cms_est, t.true_cnt
FROM est e
JOIN (SELECT user_id, count(*) AS true_cnt FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id) t USING (user_id)
WHERE e.cms_est >= 100""")
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: users whose CMS-estimated event count
    clears a phi=1% support threshold, alongside the true count (the
    estimate never under-counts — collisions only inflate). The sketch is
    a bounded 4x256 grid built map-side-combined in one shuffle, then
    broadcast to the probe join: at 100 TB the exact per-user GROUP BY
    this replaces is the shuffle bottleneck, the sketch is O(1) state."""
    ev = events_t(spark, sf_dir).where(F.col("user_id").isNotNull())
    sk = sketch.cms_sketch(ev, "user_id", depth=4, width=256)
    users = ev.select("user_id").distinct()
    est = sketch.cms_estimate(sk, users, "user_id", depth=4, width=256)
    true_cnt = ev.groupBy("user_id").agg(F.count("*").alias("true_cnt"))
    return (est.join(true_cnt, "user_id")
            .where(F.col("cms_est") >= 100)
            .select("user_id", "cms_est", "true_cnt"))


@q("sketch_kmv_distinct_users", """
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hh
  FROM events WHERE user_id IS NOT NULL),
r AS (SELECT event_type, hh,
             row_number() OVER (PARTITION BY event_type ORDER BY hh) AS rn
      FROM h),
a AS (SELECT event_type, count(*) AS n_kept, max(hh) AS hk
      FROM r WHERE rn <= 32 GROUP BY event_type)
SELECT event_type,
       CASE WHEN n_kept < 32 THEN n_kept::DOUBLE
            ELSE round(31.0 * 1152921504606846976.0 / hk::DOUBLE, 4)
       END AS kmv_est,
       n_kept
FROM a""")
def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct-user estimate per event type: k=32 smallest
    60-bit hashes per group; exact below k, (k-1)/r_k above. The per-group
    state is 32 longs and MERGEABLE (union = re-take bottom-k), which is
    the scalable stand-in for COUNT(DISTINCT) across 100 TB shards; the
    md5-prefix hash makes DuckDB reproduce the estimate bit-for-bit."""
    ev = events_t(spark, sf_dir).where(F.col("user_id").isNotNull())
    return sketch.kmv_distinct(ev, "user_id", ["event_type"], k=32)


# -------------------------------------------- time-series analytics (r12)

@q("ts_ewma_value", """
WITH s AS (
  SELECT user_id, array_agg(value ORDER BY ts, event_id) AS xs,
         count(*) AS n_points
  FROM events GROUP BY user_id)
SELECT user_id, n_points,
       round(CAST(list_reduce(xs, (acc, x) -> acc * 0.8 + x * 0.2)
                  AS DECIMAL(28,8)), 6)::DOUBLE AS ewma
FROM s""")
def ts_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event value
    (alpha=0.2, pandas adjust=False recursion). The inherently sequential
    recursion runs as one in-row array fold after a single shuffle on the
    entity — no per-step window rescan, no Python; DuckDB's list_reduce
    folds in the identical order so the double is bit-exact."""
    from walmart_project_etl_spark.operators import timeseries
    ev = events_t(spark, sf_dir)
    return timeseries.ewma(ev, "user_id", ["ts", "event_id"], "value",
                           alpha=0.2)


@q("ts_anomaly_zscore", """
WITH sc AS (
  SELECT user_id, ts, event_id, value,
         count(*) OVER w AS n,
         (sum(CAST(value AS DECIMAL(18,6))) OVER w)::DOUBLE AS sx,
         (sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
            OVER w)::DOUBLE AS sxx
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
SELECT user_id, ts, event_id, value,
       round(CAST((value - sx/n) / sqrt((sxx - sx*sx/n)/(n-1))
                  AS DECIMAL(28,8)), 4)::DOUBLE AS zscore
FROM sc
WHERE n >= 5 AND (sxx - sx*sx/n)/(n-1) > 0
  AND abs((value - sx/n) / sqrt((sxx - sx*sx/n)/(n-1))) > 3""")
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each event scored against the
    mean/stddev of its user's previous ≤10 events (current row excluded
    so the outlier can't raise its own baseline); |z| > 3 flags. Moments
    are decimal-exact window sums; one shuffle on the user key."""
    from walmart_project_etl_spark.operators import timeseries
    ev = events_t(spark, sf_dir)
    return timeseries.rolling_zscore_anomalies(
        ev, "user_id", ["ts", "event_id"], "value",
        lookback=10, min_n=5, z_cut=3.0)


@q("sim_ivfpq_ann_topk", pinned("sim_ivfpq_ann_topk"))
def sim_ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ residual ANN (operators/similarity.py:ivfpq_ann_topk) —
    the full FAISS IVFPQ recipe: coarse cells cut the scan FRACTION
    (8/32 probed), residual PQ codes cut the scanned BYTES (8 bytes vs
    256), ADC recovers q·x = q·c + q·(x-c) per candidate, exact cosine
    re-rank on the survivors. recall@10 = 0.78 vs brute truth at these
    defaults (vs 0.832 for flat IVF at the same 25% scan — the ~0.05
    delta buys 32x smaller serving state). Oracle = pinned sf0.01
    golden (seeded KMeans fits are engine-internal but deterministic,
    proven by the pin tool's double run)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 7) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
    return similarity.ivfpq_ann_topk(emb, queries, k=10)


# ------------------------------------------------------ graph analytics (r12)

def _pagerank_cte(iters: int, damping: float = 0.85) -> str:
    """Unrolled PageRank rounds mirroring operators/graph.py:pagerank
    exactly (same IEEE expression shapes: 1.0/n init, (1.0-d)/n floor,
    decimal(28,14)-routed contribution sums, round-10 per round)."""
    parts = ["""
WITH e AS (
  SELECT DISTINCT 'p' || l_partkey::VARCHAR AS s,
                  's' || l_suppkey::VARCHAR AS d FROM lineitem
  UNION
  SELECT DISTINCT 's' || l_suppkey::VARCHAR, 'p' || l_partkey::VARCHAR
  FROM lineitem),
nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
outd AS (SELECT s, count(*) AS o FROM e GROUP BY s),
pr0 AS (SELECT node, (SELECT 1.0 / n FROM nn) AS pr FROM nodes)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
c{i} AS (
  SELECT d, (sum(CAST(pr / o AS DECIMAL(28,14))))::DOUBLE AS sm
  FROM e JOIN outd USING (s) JOIN pr{i - 1} ON pr{i - 1}.node = e.s
  GROUP BY d),
pr{i} AS (
  SELECT node, round(CAST((SELECT (1.0 - {damping}) / n FROM nn)
                          + {damping} * coalesce(sm, 0.0)
                          AS DECIMAL(28,14)), 10)::DOUBLE AS pr
  FROM nodes LEFT JOIN c{i} ON c{i}.d = node)""")
    parts.append(f"""
SELECT node, pr AS pagerank FROM pr{iters}""")
    return "".join(parts)


@q("graph_pagerank_partsupp", _pagerank_cte(3))
def graph_pagerank_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized part↔supplier co-purchase graph
    from lineitem (operators/graph.py:pagerank): 3 fixed rounds, each
    ONE rank-to-edges join keyed on src + ONE dst-keyed decimal sum —
    the iterative-algorithm shape at 100 TB is per-round edge-linear
    shuffles with localCheckpoint lineage truncation, never a
    driver-side adjacency structure. Decimal-routed sums + round-10
    ranks per round make the fixed-round result engine-exact, so the
    unrolled SQL oracle replays it bit-for-bit."""
    from walmart_project_etl_spark.operators import graph
    li = t(spark, sf_dir, "lineitem")
    p = F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    e = (li.select(p.alias("src"), s.alias("dst"))
         .unionByName(li.select(s.alias("src"), p.alias("dst"))))
    return graph.pagerank(e, iters=3)


# ------------------------------------------- unigram-LM tokenizer (r12)

@q("text_unigram_train", pinned("text_unigram_train"))
def text_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (operators/unigram.py — Kudo 2018
    hard-EM simplification, documented in the module): substring seed
    over the DISTINCT-word table, two Viterbi-E / count-M rounds with
    rank pruning, single-char coverage guarantee. The corpus-scale cost
    is ONE word-count groupBy; every EM round is distinct-words-sized
    with the ≤vocab piece table in the UDF closure. Oracle = pinned
    sf0.01 golden (Viterbi DP is engine-internal but deterministic:
    integer counts, fixed tie-breaks)."""
    from walmart_project_etl_spark.operators import unigram
    docs = t(spark, sf_dir, "documents")
    return unigram.unigram_train(docs, "text", vocab_size=300, rounds=2)


@q("text_unigram_encode", pinned("text_unigram_encode"))
def text_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization with the trained unigram vocabulary: Viterbi
    over distinct words ONCE, broadcast word→token-count map, one corpus
    scan — the tokenization-cache shape; per-doc word/token totals and
    compression ratio."""
    from walmart_project_etl_spark.operators import unigram
    docs = t(spark, sf_dir, "documents")
    vocab = unigram.unigram_train(docs, "text", vocab_size=300, rounds=2)
    return unigram.unigram_encode(docs, vocab, "text", "doc_id")


@q("events_funnel_gap",
   """WITH s1 AS (
        SELECT user_id, min(ts) AS stage1_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS stage2_ts
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts >= s1.stage1_ts
          AND e.ts <= s1.stage1_ts + INTERVAL 86400 SECOND
        GROUP BY e.user_id),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS stage3_ts
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= s2.stage2_ts
          AND e.ts <= s2.stage2_ts + INTERVAL 86400 SECOND
        GROUP BY e.user_id)
      SELECT s1.user_id, s1.stage1_ts, s2.stage2_ts, s3.stage3_ts,
             1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
               AS stages_completed
      FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""")
def events_funnel_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED funnel (the product-analytics default): each hop must
    land within 24h of the previous stage's completion — same
    stage-join plan as events_funnel plus one interval predicate per
    hop, so the gap constraint is free at any scale."""
    ev = events_t(spark, sf_dir)
    return events.funnel_stages(ev, ["view", "click", "purchase"],
                                max_gap_s=86400)


@q("sim_matryoshka_topk", """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 100 = 7),
cand AS (
  SELECT q.query_id, v.vec_id, v.e, q.qe,
         round(list_dot_product(v.e[1:16], q.qe[1:16])
               / (sqrt(list_dot_product(v.e[1:16], v.e[1:16]))
                  * sqrt(list_dot_product(q.qe[1:16], q.qe[1:16]))), 6)
           AS pre
  FROM v CROSS JOIN q
  WHERE v.vec_id <> q.query_id
  QUALIFY row_number() OVER (PARTITION BY q.query_id
                             ORDER BY pre DESC, v.vec_id ASC) <= 80),
exact AS (
  SELECT query_id, vec_id,
         round(list_dot_product(e, qe)
               / (sqrt(list_dot_product(e, e))
                  * sqrt(list_dot_product(qe, qe))), 6) AS cosine_sim
  FROM cand)
SELECT query_id, vec_id, cosine_sim,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine_sim DESC, vec_id ASC)::INT
         AS rank
FROM exact
QUALIFY rank <= 10""")
def sim_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka prefix-dimension ANN (coarse cosine on the first 16
    of 64 dims, exact re-rank of the top-80): the ONLY ANN tier with a
    fully RECOMPUTED SQL oracle — no trained state, no seeds, so
    DuckDB replays the whole two-stage rank end-to-end. Coarse scan
    reads 4× fewer floats than brute force; with MRL-trained
    embeddings the prefix carries most of the signal (these synthetic
    vectors are the documented floor case)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 7) \
                 .select(F.col("vec_id").alias("query_id"), "embedding")
    return similarity.matryoshka_topk(emb, queries, k=10)


@q("w04_running_distinct_users", """
WITH firstday AS (
  SELECT event_type, user_id, min(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY event_type, user_id),
newu AS (
  SELECT event_type, first_day AS day, count(*) AS new_users
  FROM firstday GROUP BY event_type, first_day),
days AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY event_type, CAST(ts AS DATE))
SELECT d.event_type, d.day::TIMESTAMP AS day, d.n_events,
       coalesce(n.new_users, 0) AS new_users,
       (sum(coalesce(n.new_users, 0)) OVER (
         PARTITION BY d.event_type ORDER BY d.day))::BIGINT
         AS cum_distinct_users
FROM days d LEFT JOIN newu n USING (event_type, day)""")
def w04_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING DISTINCT count done the scalable way: a naive
    count(distinct) over an expanding window re-materializes the set
    per row (quadratic state); instead each (type, user) contributes a
    FIRST-OCCURRENCE day (one uniform groupBy), days aggregate those
    flags, and a cumulative sum over the tiny day grain yields the
    exact running distinct — two map-side-combinable aggregations plus
    a window over O(days) rows, at any corpus size."""
    ev = events_t(spark, sf_dir)
    firstday = (ev.groupBy("event_type", "user_id")
                .agg(F.min(F.to_date("ts")).alias("first_day")))
    newu = (firstday.groupBy("event_type",
                             F.col("first_day").alias("day"))
            .agg(F.count(F.lit(1)).alias("new_users")))
    days = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).alias("n_events")))
    w = Window.partitionBy("event_type").orderBy("day")
    return (days.join(newu, ["event_type", "day"], "left")
            .select("event_type",
                    F.col("day").cast("timestamp").alias("day"),
                    "n_events",
                    F.coalesce("new_users", F.lit(0)).alias("new_users"),
                    F.sum(F.coalesce("new_users", F.lit(0))).over(w)
                     .alias("cum_distinct_users")))


@q("olap_exact_percentiles", """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
FROM lineitem GROUP BY l_returnflag""")
def olap_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped percentiles (linear interpolation — Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, proven equal to 4dp by
    the oracle): the exact twin of the HLL/approx sketch entry. Exact
    percentiles need a per-group sort — fine when groups are few and
    fat (one shuffle, sort within group); at billions of rows per
    group the approx_percentile sketch entry is the scale path."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4)
         .alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4)
         .alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4)
         .alias("p75"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4)
         .alias("p95"))


@q("olap_corr_regr", """
WITH m AS (
  -- DECIMAL(19,6) forces DuckDB's int128 arithmetic (the (18,6) int64
  -- fast path overflows on the price products); Spark stays at (18,6)
  -- so ITS product type (37,12) fits the 38-digit cap — both sides are
  -- exact integers mathematically, so the values agree bit-for-bit
  SELECT l_returnflag, count(*) AS n,
         sum(CAST(l_quantity AS DECIMAL(19,6))) AS sx,
         sum(CAST(l_extendedprice AS DECIMAL(19,6))) AS sy,
         sum(CAST(l_quantity AS DECIMAL(19,6))
             * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy,
         sum(CAST(l_quantity AS DECIMAL(19,6))
             * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
         sum(CAST(l_extendedprice AS DECIMAL(19,6))
             * CAST(l_extendedprice AS DECIMAL(19,6))) AS syy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n AS n_rows,
       round(CAST((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
             AS DECIMAL(28,8)), 6)::DOUBLE AS corr,
       round(CAST((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
             AS DECIMAL(28,8)), 6)::DOUBLE AS slope,
       round(CAST((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE
                                  - sx::DOUBLE * sy::DOUBLE)
                   / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
                   * sx::DOUBLE) / n::DOUBLE
             AS DECIMAL(28,8)), 6)::DOUBLE AS intercept
FROM m""")
def olap_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Pearson correlation + OLS slope/intercept of
    quantity→extendedprice, from DECIMAL-EXACT moment sums (n, Σx, Σy,
    Σxy, Σx², Σy² — the zscore operator's precision recipe: (18,6)
    operands keep products inside the 38-digit cap, so every partial
    sum is exact and order-independent). Built-in ``corr``/
    ``regr_slope`` accumulate in doubles and drift with partition
    order; the moment route gives the same answer bit-for-bit at any
    parallelism, which is what lets a SQL oracle replay it. One
    map-side-combinable aggregation — the 100 TB cost is one scan."""
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"))
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    slope = cov_n / varx_n

    def r6(c):
        return F.round(c.cast("decimal(28,8)"), 6).cast("double")

    return m.select(
        "l_returnflag", F.col("n").alias("n_rows"),
        r6(cov_n / F.sqrt(varx_n * vary_n)).alias("corr"),
        r6(slope).alias("slope"),
        r6((sy - slope * sx) / n).alias("intercept"))


@q("events_rfm_segments", """
WITH mx AS (SELECT max(ts) AS now FROM events),
per_user AS (
  SELECT user_id,
         date_diff('day', max(ts), (SELECT now FROM mx)) AS recency_days,
         count(*) AS frequency,
         round(sum(CAST(value AS DECIMAL(28,6))), 2)::DOUBLE AS monetary
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
scored AS (
  SELECT user_id, recency_days, frequency, monetary,
         ntile(4) OVER (ORDER BY recency_days ASC, user_id) AS r_q,
         ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
         ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_q
  FROM per_user)
SELECT user_id, recency_days, frequency, monetary, r_q, f_q, m_q,
       CASE WHEN r_q = 1 AND f_q = 1 THEN 'champion'
            WHEN r_q <= 2 AND f_q <= 2 THEN 'loyal'
            WHEN r_q >= 3 AND f_q <= 2 THEN 'at_risk'
            ELSE 'casual' END AS segment
FROM scored""")
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION (the retail-analytics classic the reference's
    BI layer stops short of): per-user recency/frequency/monetary over
    purchase events, quartiled with deterministic ntile tie-breaks,
    mapped to named segments. One user-keyed aggregation; the ntile
    windows run over the user-grain aggregate — a single-partition
    rank of the SMALL frame, fine to ~10^8 users; past that, swap the
    global ntile for approx-quantile boundaries broadcast against the
    same aggregate. Recency anchors on max(ts) IN THE DATA, not wall
    clock — deterministic at any run time. The anchor is max(ts) over
    ALL events (matching the oracle's mx CTE), not just purchases — a
    purchase-only anchor would shift every recency whenever the
    corpus's latest day has no purchase."""
    allev = events_t(spark, sf_dir)
    now = allev.agg(F.max("ts")).collect()[0][0]
    ev = allev.where(F.col("event_type") == "purchase")
    per_user = ev.groupBy("user_id").agg(
        F.datediff(F.lit(now), F.max("ts")).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
         .cast("double").alias("monetary"))
    r_q = F.ntile(4).over(Window.orderBy(F.asc("recency_days"),
                                         F.asc("user_id")))
    f_q = F.ntile(4).over(Window.orderBy(F.desc("frequency"),
                                         F.asc("user_id")))
    m_q = F.ntile(4).over(Window.orderBy(F.desc("monetary"),
                                         F.asc("user_id")))
    scored = per_user.select("*", r_q.alias("r_q"), f_q.alias("f_q"),
                             m_q.alias("m_q"))
    seg = (F.when((F.col("r_q") == 1) & (F.col("f_q") == 1), "champion")
           .when((F.col("r_q") <= 2) & (F.col("f_q") <= 2), "loyal")
           .when((F.col("r_q") >= 3) & (F.col("f_q") <= 2), "at_risk")
           .otherwise("casual"))
    return scored.withColumn("segment", seg)


@q("ts_holt_forecast", pinned("ts_holt_forecast"))
def ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt level+trend smoothing per user with a 3-step forecast
    (operators/timeseries.py:holt_linear): the sequential recursion as
    ONE in-row struct-accumulator fold after a single entity shuffle.
    Oracle = pinned sf0.01 golden: DuckDB's list_reduce updates struct
    accumulator fields IN PLACE during a step (later field expressions
    see the new 'l'), so it cannot replay a two-field recursion —
    verified while building this entry; the EWMA twin's scalar fold
    (ts_ewma_value) stays a recomputed oracle."""
    from walmart_project_etl_spark.operators import timeseries
    ev = events_t(spark, sf_dir)
    return timeseries.holt_linear(ev, "user_id", ["ts", "event_id"],
                                  "value")


@q("stream_psi_drift", """
WITH ref AS (SELECT value AS x FROM events WHERE user_id % 2 = 0),
cur AS (SELECT value AS x FROM events WHERE user_id % 2 = 1),
e AS (SELECT quantile_cont(x, 0.1) AS e0, quantile_cont(x, 0.2) AS e1,
             quantile_cont(x, 0.3) AS e2, quantile_cont(x, 0.4) AS e3,
             quantile_cont(x, 0.5) AS e4, quantile_cont(x, 0.6) AS e5,
             quantile_cont(x, 0.7) AS e6, quantile_cont(x, 0.8) AS e7,
             quantile_cont(x, 0.9) AS e8
      FROM ref),
sides AS (SELECT 'r' AS side, x FROM ref UNION ALL SELECT 'c', x FROM cur),
nb AS (
  SELECT side,
         (CASE WHEN x >= e0 THEN 1 ELSE 0 END)
       + (CASE WHEN x >= e1 THEN 1 ELSE 0 END)
       + (CASE WHEN x >= e2 THEN 1 ELSE 0 END)
       + (CASE WHEN x >= e3 THEN 1 ELSE 0 END)
       + (CASE WHEN x >= e4 THEN 1 ELSE 0 END)
       + (CASE WHEN x >= e5 THEN 1 ELSE 0 END)
       + (CASE WHEN x >= e6 THEN 1 ELSE 0 END)
       + (CASE WHEN x >= e7 THEN 1 ELSE 0 END)
       + (CASE WHEN x >= e8 THEN 1 ELSE 0 END) AS b
  FROM sides, e WHERE x IS NOT NULL),
numc AS (SELECT side, b, count(*) AS c FROM nb GROUP BY side, b),
r1 AS (SELECT b, c AS cr FROM numc WHERE side = 'r'),
c1 AS (SELECT b, c AS cc FROM numc WHERE side = 'c'),
nr1 AS (SELECT sum(cr) AS nr FROM r1),
nc1 AS (SELECT sum(cc) AS nc FROM c1),
j1 AS (SELECT coalesce(cr, 0) AS cr, coalesce(cc, 0) AS cc
       FROM r1 FULL JOIN c1 USING (b)),
tm1 AS (
  SELECT round(CAST(
      ((cc + 1.0) / (nc + 10.0) - (cr + 1.0) / (nr + 10.0))
      * CAST(round(ln(((cc + 1.0) / (nc + 10.0))
                      / ((cr + 1.0) / (nr + 10.0))), 6)
             AS DECIMAL(20,6))::DOUBLE
      AS DECIMAL(28,12)), 9)::DECIMAL(20,9) AS term, nr, nc
  FROM j1, nr1, nc1)
SELECT 'value' AS feature,
       round(CAST(CAST(sum(term) AS DOUBLE) AS DECIMAL(28,8)), 6)::DOUBLE
         AS psi,
       CAST(any_value(nr) AS BIGINT) AS n_ref,
       CAST(any_value(nc) AS BIGINT) AS n_cur
FROM tm1""")
def stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING drift monitor (streaming/jobs.py:
    stream_psi_bucket_counts): the live side's PSI bucket counts
    accumulate over REAL micro-batches (foreachBatch merge-add into a
    ≤10-row counts table — associative, so any batch split converges),
    against decile edges frozen from the reference population (even
    user ids, the serving-time setup where training-time edges are
    fixed). The final report reuses the batch PSI arithmetic
    (operators/cleaning.py:_psi_from_counts); the oracle is the plain
    batch PSI of the same parity split — streaming-vs-batch equality
    is the check, like every streaming twin here."""
    import tempfile

    from walmart_project_etl_spark.operators.cleaning import \
        _psi_from_counts
    from walmart_project_etl_spark.streaming import \
        stream_psi_bucket_counts

    ev = events_t(spark, sf_dir)
    ref = ev.where(F.col("user_id") % 2 == 0).select("value")
    qs = [i / 10 for i in range(1, 10)]
    edges = [r for r in ref.agg(*[
        F.expr(f"percentile(value, {q})").alias(f"e{i}")
        for i, q in enumerate(qs)]).collect()[0]]
    cur_cnt = stream_psi_bucket_counts(
        spark, events_dir(spark, sf_dir), edges,
        tempfile.mkdtemp(prefix="wpe_stream_psi_wh_"), user_parity=1)
    from functools import reduce
    bucket = reduce(
        lambda acc, e: acc + F.when(F.col("value") >= F.lit(float(e)), 1)
        .otherwise(0), edges, F.lit(0))
    ref_cnt = (ref.where(F.col("value").isNotNull())
               .select(bucket.alias("b"))
               .groupBy("b").agg(F.count(F.lit(1)).alias("c")))
    cnt = (ref_cnt.select(F.lit("r").alias("__side"),
                          F.col("b").alias("__b"), F.col("c").alias("__c"))
           .unionByName(cur_cnt.select(
               F.lit("c").alias("__side"), F.col("b").alias("__b"),
               F.col("c").alias("__c"))))
    return _psi_from_counts(cnt, "value", 10)


@q("stream_ks_drift", """
WITH ref AS (SELECT value AS x FROM events
             WHERE user_id % 2 = 0 AND value IS NOT NULL),
cur AS (SELECT value AS x FROM events
        WHERE user_id % 2 = 1 AND value IS NOT NULL),
s AS (SELECT x, 1 AS r, 0 AS c FROM ref
      UNION ALL SELECT x, 0, 1 FROM cur),
pv AS (SELECT x, sum(r) AS cr, sum(c) AS cc FROM s GROUP BY x),
n AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM pv),
cum AS (SELECT sum(cr) OVER (ORDER BY x) AS kr,
               sum(cc) OVER (ORDER BY x) AS kc FROM pv),
d AS (SELECT max(abs(kr::DECIMAL(38,0) * nc
                     - kc::DECIMAL(38,0) * nr)) AS dn,
             any_value(nr) AS nr, any_value(nc) AS nc
      FROM cum, n)
SELECT 'value' AS feature,
       round(CAST(CAST(dn AS DOUBLE) / (nr::DOUBLE * nc::DOUBLE)
             AS DECIMAL(28,8)), 6)::DOUBLE AS ks,
       nr::BIGINT AS n_ref, nc::BIGINT AS n_cur
FROM d""")
def stream_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING exact-KS drift monitor (streaming/jobs.py:
    stream_value_counts): the live side's per-distinct-VALUE counts —
    the ECDF's sufficient statistic — accumulate over REAL
    micro-batches through the replay-idempotent batch-keyed delta sink
    (a replayed batch overwrites its own partition; addition is
    associative, so any batch split converges). The final statistic
    reuses the batch prefix-sum arithmetic
    (operators/cleaning.py:_ks_from_value_counts) over the streamed
    counts full-joined with the frozen reference counts; the oracle is
    the plain batch KS of the same parity split — streaming-vs-batch
    equality, like every streaming twin here. State is bounded by the
    metric's distinct-value cardinality, not the row count."""
    import tempfile

    from walmart_project_etl_spark.operators.cleaning import \
        _ks_from_value_counts
    from walmart_project_etl_spark.streaming import stream_value_counts

    ev = events_t(spark, sf_dir)
    ref = ev.where(F.col("user_id") % 2 == 0).select("value")
    cur_cnt = stream_value_counts(
        spark, events_dir(spark, sf_dir),
        tempfile.mkdtemp(prefix="wpe_stream_ks_wh_"), user_parity=1)
    ref_cnt = (ref.where(F.col("value").isNotNull())
               .groupBy(F.col("value").alias("__x"))
               .agg(F.count(F.lit(1)).alias("__cr")))
    per_val = (ref_cnt.join(cur_cnt.select(F.col("x").alias("__x"),
                                           F.col("c").alias("__cc")),
                            "__x", "full")
               .select("__x",
                       F.coalesce("__cr", F.lit(0)).alias("__cr"),
                       F.coalesce("__cc", F.lit(0)).alias("__cc")))
    n_buckets = 32
    edges = ref.where(F.col("value").isNotNull()).agg(*[
        F.expr(f"percentile(value, {i / n_buckets})").alias(f"__e{i}")
        for i in range(1, n_buckets)])
    return _ks_from_value_counts(per_val, edges, n_buckets - 1, "value")


@q("stream_chisq_drift", """
WITH ref AS (SELECT event_type AS b FROM events
             WHERE user_id % 2 = 0 AND event_type IS NOT NULL),
cur AS (SELECT event_type AS b FROM events
        WHERE user_id % 2 = 1 AND event_type IS NOT NULL),
s AS (SELECT b, 1 AS r, 0 AS c FROM ref
      UNION ALL SELECT b, 0, 1 FROM cur),
cnt AS (SELECT b, sum(r) AS cr, sum(c) AS cc FROM s GROUP BY b),
tot AS (SELECT sum(cr) AS nr, sum(cc) AS nc, count(*) AS k FROM cnt),
t0 AS (SELECT cr, cc, nr, nc, k,
         nr::DOUBLE * (cr+cc)::DOUBLE / (nr+nc)::DOUBLE AS er,
         nc::DOUBLE * (cr+cc)::DOUBLE / (nr+nc)::DOUBLE AS ec
       FROM cnt, tot),
t AS (SELECT
        round(CAST((cr::DOUBLE - er)*(cr::DOUBLE - er)/er
              AS DECIMAL(28,12)), 9)::DECIMAL(20,9) AS tr,
        round(CAST((cc::DOUBLE - ec)*(cc::DOUBLE - ec)/ec
              AS DECIMAL(28,12)), 9)::DECIMAL(20,9) AS tc,
        nr, nc, k
      FROM t0)
SELECT 'event_type' AS feature,
       round(CAST(CAST(sum(tr)+sum(tc) AS DOUBLE)
             AS DECIMAL(28,8)), 6)::DOUBLE AS chisq,
       (any_value(k)-1)::INT AS dof,
       any_value(nr)::BIGINT AS n_ref,
       any_value(nc)::BIGINT AS n_cur
FROM t""")
def stream_chisq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING chi-square homogeneity drift monitor (streaming/
    jobs.py:stream_category_counts) — the drift trio's streaming side
    completed (r14 gap): the live population's per-CATEGORY counts
    accumulate over REAL micro-batches through the replay-idempotent
    batch-keyed delta sink (a replayed batch overwrites its own
    partition; addition is associative, so any batch split converges),
    against the frozen reference's category counts. The final
    statistic reuses the batch contingency-table arithmetic
    (operators/cleaning.py:_chisq_from_counts) over the streamed
    counts full-joined with the reference counts; the oracle is the
    plain batch chi-square of the same parity split —
    streaming-vs-batch equality, like every streaming twin here.
    State is category-cardinality-sized (k rows), the smallest of the
    three drift-state shapes."""
    import tempfile

    from walmart_project_etl_spark.operators.cleaning import \
        _chisq_from_counts
    from walmart_project_etl_spark.streaming import \
        stream_category_counts

    ev = events_t(spark, sf_dir)
    cur_cnt = stream_category_counts(
        spark, events_dir(spark, sf_dir),
        tempfile.mkdtemp(prefix="wpe_stream_chisq_wh_"), user_parity=1)
    ref_cnt = (ev.where(F.col("user_id") % 2 == 0)
               .where(F.col("event_type").isNotNull())
               .groupBy(F.col("event_type").alias("__b"))
               .agg(F.count(F.lit(1)).alias("__cr")))
    cnt = (ref_cnt.join(cur_cnt.select(F.col("b").alias("__b"),
                                       F.col("c").alias("__cc")),
                        "__b", "full")
           .select(F.lit("event_type").alias("__f"), "__b",
                   F.coalesce("__cr", F.lit(0)).alias("__cr"),
                   F.coalesce("__cc", F.lit(0)).alias("__cc")))
    return _chisq_from_counts(cnt)


@q("stream_mwu_drift", """
WITH ref AS (SELECT value AS x FROM events
             WHERE user_id % 2 = 0 AND value IS NOT NULL),
cur AS (SELECT value AS x FROM events
        WHERE user_id % 2 = 1 AND value IS NOT NULL),
s AS (SELECT x, 1 AS r, 0 AS c FROM ref
      UNION ALL SELECT x, 0, 1 FROM cur),
pv AS (SELECT x, sum(r) AS cr, sum(c) AS cc FROM s GROUP BY x),
n AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM pv),
cum AS (SELECT cr, cc,
               sum(cr) OVER (ORDER BY x) AS kr,
               sum(cc) OVER (ORDER BY x) AS kc FROM pv),
m AS (SELECT cc, 2*(kr+kc) - (cr+cc) + 1 AS m2 FROM cum),
r2 AS (SELECT sum(cc::DECIMAL(19,0) * m2::DECIMAL(19,0)) AS s2 FROM m),
uu AS (SELECT s2 - nc::DECIMAL(19,0)*(nc::DECIMAL(19,0)+1) AS u2,
              nr, nc FROM r2, n)
SELECT 'value' AS feature,
       CAST(u2 AS DOUBLE)/2 AS u,
       round(CAST(CAST(u2 AS DOUBLE) / (2*nr::DOUBLE*nc::DOUBLE)
             AS DECIMAL(28,8)), 6)::DOUBLE AS auc,
       nr::BIGINT AS n_ref, nc::BIGINT AS n_cur
FROM uu""")
def stream_mwu_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Mann-Whitney U drift monitor — the drift trio's
    streaming side completed (r14 gap), riding the SAME accumulated
    per-distinct-value count table the KS twin streams
    (streaming/jobs.py:stream_value_counts — one sink, two rank
    statistics served): U needs exactly the value-grain side counts
    the exact-KS ECDF needs. The final statistic reuses the batch
    doubled-midrank arithmetic (operators/cleaning.py:
    _mwu_from_value_counts) over the streamed counts full-joined with
    the frozen reference counts; the oracle is the plain batch MWU of
    the same parity split — streaming-vs-batch equality. Integer-exact
    ties: every rank computation stays in decimal(38,0)."""
    import tempfile

    from walmart_project_etl_spark.operators.cleaning import \
        _mwu_from_value_counts
    from walmart_project_etl_spark.streaming import stream_value_counts

    ev = events_t(spark, sf_dir)
    ref = ev.where(F.col("user_id") % 2 == 0).select("value")
    cur_cnt = stream_value_counts(
        spark, events_dir(spark, sf_dir),
        tempfile.mkdtemp(prefix="wpe_stream_mwu_wh_"), user_parity=1)
    ref_cnt = (ref.where(F.col("value").isNotNull())
               .groupBy(F.col("value").alias("__x"))
               .agg(F.count(F.lit(1)).alias("__cr")))
    per_val = (ref_cnt.join(cur_cnt.select(F.col("x").alias("__x"),
                                           F.col("c").alias("__cc")),
                            "__x", "full")
               .select("__x",
                       F.coalesce("__cr", F.lit(0)).alias("__cr"),
                       F.coalesce("__cc", F.lit(0)).alias("__cc")))
    n_buckets = 32
    edges = ref.where(F.col("value").isNotNull()).agg(*[
        F.expr(f"percentile(value, {i / n_buckets})").alias(f"__e{i}")
        for i in range(1, n_buckets)])
    return _mwu_from_value_counts(per_val, edges, n_buckets - 1,
                                  "value")


@q("stream_drift_multicol", """
WITH ref AS (SELECT value::DOUBLE AS value, hour(ts)::DOUBLE AS hr
             FROM events WHERE user_id % 2 = 0),
cur AS (SELECT CASE WHEN user_id % 3 = 0 THEN value * 1.1
               ELSE value END::DOUBLE AS value,
               hour(ts)::DOUBLE AS hr
        FROM events WHERE user_id % 2 = 1),
r0 AS (SELECT value AS x FROM ref WHERE value IS NOT NULL),
c0 AS (SELECT value AS x FROM cur WHERE value IS NOT NULL),
s0 AS (SELECT x, 1 AS r, 0 AS c FROM r0
       UNION ALL SELECT x, 0, 1 FROM c0),
pv0 AS (SELECT x, sum(r) AS cr, sum(c) AS cc FROM s0 GROUP BY x),
n0 AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM pv0),
cum0 AS (SELECT sum(cr) OVER (ORDER BY x) AS kr,
                sum(cc) OVER (ORDER BY x) AS kc FROM pv0),
d0 AS (SELECT max(abs(kr::DECIMAL(38,0) * nc
                      - kc::DECIMAL(38,0) * nr)) AS dn,
              any_value(nr) AS nr, any_value(nc) AS nc
       FROM cum0, n0),
r1 AS (SELECT hr AS x FROM ref WHERE hr IS NOT NULL),
c1 AS (SELECT hr AS x FROM cur WHERE hr IS NOT NULL),
s1 AS (SELECT x, 1 AS r, 0 AS c FROM r1
       UNION ALL SELECT x, 0, 1 FROM c1),
pv1 AS (SELECT x, sum(r) AS cr, sum(c) AS cc FROM s1 GROUP BY x),
n1 AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM pv1),
cum1 AS (SELECT sum(cr) OVER (ORDER BY x) AS kr,
                sum(cc) OVER (ORDER BY x) AS kc FROM pv1),
d1 AS (SELECT max(abs(kr::DECIMAL(38,0) * nc
                      - kc::DECIMAL(38,0) * nr)) AS dn,
              any_value(nr) AS nr, any_value(nc) AS nc
       FROM cum1, n1)
SELECT 'value' AS feature,
       round(CAST(CAST(dn AS DOUBLE) / (nr::DOUBLE * nc::DOUBLE)
             AS DECIMAL(28,8)), 6)::DOUBLE AS ks,
       nr::BIGINT AS n_ref, nc::BIGINT AS n_cur
FROM d0
UNION ALL
SELECT 'hr',
       round(CAST(CAST(dn AS DOUBLE) / (nr::DOUBLE * nc::DOUBLE)
             AS DECIMAL(28,8)), 6)::DOUBLE,
       nr::BIGINT, nc::BIGINT
FROM d1""")
def stream_drift_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING melted multi-feature drift (streaming/jobs.py:
    stream_feature_value_counts) — the multicol × streaming cell of
    the drift matrix: the live side's (feature, value) counts for a
    whole feature LIST (the raw metric plus an hour-of-day derivation,
    the second drifting ×1.1 for every third user) accumulate through
    ONE stream and one replay-idempotent composite-key delta sink —
    one monitor, N features, the streaming twin of dq_drift_multicol's
    job-count collapse. The final per-feature exact-KS statistics ride
    the shared feature-grain prefix-sum core against the frozen batch
    reference; the oracle is the plain batch KS per feature —
    streaming-vs-batch equality, like every streaming twin here."""
    import tempfile

    from walmart_project_etl_spark.operators.cleaning import (
        _cum_value_counts_by, _edges_long, _ks_from_scored)
    from walmart_project_etl_spark.streaming import \
        stream_feature_value_counts

    ev = events_t(spark, sf_dir)
    features = {
        "value": F.col("value"),
        "hr": F.hour("ts"),
    }
    drifted = {
        "value": F.when(F.col("user_id") % 3 == 0,
                        F.col("value") * 1.1).otherwise(F.col("value")),
        "hr": F.hour("ts"),
    }
    cur_cnt = stream_feature_value_counts(
        spark, events_dir(spark, sf_dir),
        tempfile.mkdtemp(prefix="wpe_stream_multikv_wh_"),
        features=drifted, user_parity=1)
    ref2 = (ev.where(F.col("user_id") % 2 == 0)
            .select(F.col("value").cast("double").alias("value"),
                    F.hour("ts").cast("double").alias("hr")))
    pairs = F.array(*[
        F.struct(F.lit(n).alias("__f"),
                 F.col(n).cast("double").alias("__x"))
        for n in features])
    ref_cnt = (ref2.select(F.explode(pairs).alias("s"))
               .select("s.__f", "s.__x")
               .where(F.col("__x").isNotNull())
               .groupBy("__f", "__x")
               .agg(F.count(F.lit(1)).alias("__cr")))
    per_val = (ref_cnt.join(
        cur_cnt.select(F.col("f").alias("__f"),
                       F.col("x").alias("__x"),
                       F.col("c").alias("__cc")),
        ["__f", "__x"], "full")
        .select("__f", "__x",
                F.coalesce("__cr", F.lit(0)).alias("__cr"),
                F.coalesce("__cc", F.lit(0)).alias("__cc")))
    edges = _edges_long(ref2, list(features), 32)
    scored = _cum_value_counts_by(per_val, edges, 31)
    return _ks_from_scored(scored)


@q("dq_embedding_drift", """
WITH refv0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS e
  FROM embeddings WHERE vec_id % 2 = 0),
curv0 AS (
  SELECT vec_id,
         CASE WHEN label % 2 = 0
              THEN list_transform(embedding::DOUBLE[],
                                  x -> x * 1.25 + 0.05)
              ELSE embedding::DOUBLE[] END AS e
  FROM embeddings WHERE vec_id % 2 = 1),
nr AS (SELECT count(*) AS n FROM refv0),
nc AS (SELECT count(*) AS n FROM curv0),
refv AS (SELECT e, list_dot_product(e, e) AS sq,
                row_number() OVER (ORDER BY vec_id) - 1 AS r
         FROM refv0),
curv AS (SELECT e, list_dot_product(e, e) AS sq,
                row_number() OVER (ORDER BY vec_id) - 1 AS r
         FROM curv0),
st AS (SELECT unnest([1, 3, 7, 17]) AS s),
pxk AS (SELECT a.sq AS sqa, a.e AS ea, (a.r + st.s) % nc.n AS t
        FROM refv a CROSS JOIN st CROSS JOIN nc),
px AS (SELECT round(sqrt(greatest(0.0,
               k.sqa - 2.0 * list_dot_product(k.ea, b.e) + b.sq)),
               6)::DECIMAL(20,6) AS d
       FROM pxk k JOIN curv b ON b.r = k.t),
ex AS (SELECT round(CAST(CAST(sum(d) AS DOUBLE) / count(*)
              AS DECIMAL(28,8)), 6)::DOUBLE AS m FROM px),
prk AS (SELECT a.r AS ra, a.sq AS sqa, a.e AS ea,
               (a.r + st.s) % nr.n AS t
        FROM refv a CROSS JOIN st CROSS JOIN nr),
pr AS (SELECT round(sqrt(greatest(0.0,
               k.sqa - 2.0 * list_dot_product(k.ea, b.e) + b.sq)),
               6)::DECIMAL(20,6) AS d
       FROM prk k JOIN refv b ON b.r = k.t WHERE k.t <> k.ra),
er AS (SELECT round(CAST(CAST(sum(d) AS DOUBLE) / count(*)
              AS DECIMAL(28,8)), 6)::DOUBLE AS m FROM pr),
puk AS (SELECT a.r AS ra, a.sq AS sqa, a.e AS ea,
               (a.r + st.s) % nc.n AS t
        FROM curv a CROSS JOIN st CROSS JOIN nc),
pu AS (SELECT round(sqrt(greatest(0.0,
               k.sqa - 2.0 * list_dot_product(k.ea, b.e) + b.sq)),
               6)::DECIMAL(20,6) AS d
       FROM puk k JOIN curv b ON b.r = k.t WHERE k.t <> k.ra),
ec AS (SELECT round(CAST(CAST(sum(d) AS DOUBLE) / count(*)
              AS DECIMAL(28,8)), 6)::DOUBLE AS m FROM pu)
SELECT 'embedding' AS feature,
       round(CAST(2.0 * ex.m - er.m - ec.m AS DECIMAL(28,8)),
             6)::DOUBLE AS energy,
       ex.m AS e_cross, er.m AS e_ref, ec.m AS e_cur,
       nr.n::BIGINT AS n_ref, nc.n::BIGINT AS n_cur
FROM ex, er, ec, nr, nc""")
def dq_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-SPACE drift monitor (operators/cleaning.py:
    embedding_energy_drift) — the monitoring story's missing modality
    (r14 gap): the scalar trio watches tabular features, but a
    training corpus drifts in embedding space first. Strided
    energy-distance estimator between the even-id reference sample
    and an odd-id current sample whose even-label vectors are
    deliberately shifted (×1.25 + 0.05): each side's rows rank
    globally by id through the bucketed prefix-sum core (no global
    single-partition pass), row r pairs with rank (r+s) mod n for
    four fixed strides — |strides|·n pairs per term instead of n²,
    all equi-joins on rank, RNG-free so the oracle recomputes the
    same pairs via row_number. Distances come from the proven
    sequential-fold dot ≡ list_dot_product equivalence, round-6 +
    DECIMAL-summed; identical sides yield energy exactly 0 (asserted
    in tests)."""
    from walmart_project_etl_spark.operators.cleaning import \
        embedding_energy_drift
    emb = t(spark, sf_dir, "embeddings")
    ref = emb.where(F.col("vec_id") % 2 == 0)
    cur = emb.where(F.col("vec_id") % 2 == 1).select(
        "vec_id",
        F.when(F.col("label") % 2 == 0,
               F.transform("embedding",
                           lambda x: x.cast("double") * 1.25 + 0.05))
         .otherwise(F.transform("embedding",
                                lambda x: x.cast("double")))
         .alias("embedding"))
    return embedding_energy_drift(ref, cur, "vec_id", "embedding")


@q("dq_embedding_norm_drift", """
WITH refn AS (
  SELECT sqrt(list_dot_product(embedding::DOUBLE[],
              embedding::DOUBLE[])) AS x
  FROM embeddings WHERE vec_id % 2 = 0),
curn AS (
  SELECT CASE WHEN label % 2 = 0
              THEN sqrt(list_dot_product(
                     list_transform(embedding::DOUBLE[],
                                    x -> x * 1.25 + 0.05),
                     list_transform(embedding::DOUBLE[],
                                    x -> x * 1.25 + 0.05)))
              ELSE sqrt(list_dot_product(embedding::DOUBLE[],
                        embedding::DOUBLE[])) END AS x
  FROM embeddings WHERE vec_id % 2 = 1),
s AS (SELECT x, 1 AS r, 0 AS c FROM refn
      UNION ALL SELECT x, 0, 1 FROM curn),
pv AS (SELECT x, sum(r) AS cr, sum(c) AS cc FROM s GROUP BY x),
n AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM pv),
cum AS (SELECT sum(cr) OVER (ORDER BY x) AS kr,
               sum(cc) OVER (ORDER BY x) AS kc FROM pv),
d AS (SELECT max(abs(kr::DECIMAL(38,0) * nc
                     - kc::DECIMAL(38,0) * nr)) AS dn,
             any_value(nr) AS nr, any_value(nc) AS nc
      FROM cum, n)
SELECT 'embedding_norm' AS feature,
       round(CAST(CAST(dn AS DOUBLE) / (nr::DOUBLE * nc::DOUBLE)
             AS DECIMAL(28,8)), 6)::DOUBLE AS ks,
       nr::BIGINT AS n_ref, nc::BIGINT AS n_cur
FROM d""")
def dq_embedding_norm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NORM-DISTRIBUTION drift over embeddings — the cheap first-alarm
    companion to dq_embedding_drift: an embedding-model version bump or
    a normalization bug shifts the ‖v‖ distribution long before anyone
    inspects pair geometry, and watching it costs ONE narrow map
    (sequential-fold ‖v‖², sqrt) + the exact-KS prefix-sum — no pair
    construction at all. Pure composition: similarity.dot for the norm,
    operators/cleaning.py:ks_drift for the statistic (the norm column
    melts like any numeric feature). Same drifted fixture as the energy
    monitor, so the two rows read side-by-side."""
    from walmart_project_etl_spark.operators.cleaning import ks_drift
    from walmart_project_etl_spark.operators.similarity import (_as_double,
                                                                dot)
    emb = t(spark, sf_dir, "embeddings")

    def norms(df, vec):
        return df.select(F.sqrt(dot(vec, vec)).alias("embedding_norm"))

    ref = norms(emb.where(F.col("vec_id") % 2 == 0),
                _as_double(F.col("embedding")))
    curv = F.when(F.col("label") % 2 == 0,
                  F.transform("embedding",
                              lambda x: x.cast("double") * 1.25 + 0.05)) \
            .otherwise(F.transform("embedding",
                                   lambda x: x.cast("double")))
    cur = norms(emb.where(F.col("vec_id") % 2 == 1), curv)
    return ks_drift(ref, cur, ["embedding_norm"])


@q("stream_embedding_norm_drift", """
WITH refn AS (
  SELECT sqrt(list_dot_product(embedding::DOUBLE[],
              embedding::DOUBLE[])) AS x
  FROM embeddings WHERE vec_id % 2 = 0),
curn AS (
  SELECT CASE WHEN label % 2 = 0
              THEN sqrt(list_dot_product(
                     list_transform(embedding::DOUBLE[],
                                    x -> x * 1.25 + 0.05),
                     list_transform(embedding::DOUBLE[],
                                    x -> x * 1.25 + 0.05)))
              ELSE sqrt(list_dot_product(embedding::DOUBLE[],
                        embedding::DOUBLE[])) END AS x
  FROM embeddings WHERE vec_id % 2 = 1),
s AS (SELECT x, 1 AS r, 0 AS c FROM refn
      UNION ALL SELECT x, 0, 1 FROM curn),
pv AS (SELECT x, sum(r) AS cr, sum(c) AS cc FROM s GROUP BY x),
n AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM pv),
cum AS (SELECT sum(cr) OVER (ORDER BY x) AS kr,
               sum(cc) OVER (ORDER BY x) AS kc FROM pv),
d AS (SELECT max(abs(kr::DECIMAL(38,0) * nc
                     - kc::DECIMAL(38,0) * nr)) AS dn,
             any_value(nr) AS nr, any_value(nc) AS nc
      FROM cum, n)
SELECT 'embedding_norm' AS feature,
       round(CAST(CAST(dn AS DOUBLE) / (nr::DOUBLE * nc::DOUBLE)
             AS DECIMAL(28,8)), 6)::DOUBLE AS ks,
       nr::BIGINT AS n_ref, nc::BIGINT AS n_cur
FROM d""")
def stream_embedding_norm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING embedding-norm drift monitor (streaming/jobs.py:
    stream_embedding_norm_counts) — the drift monitors' streaming side
    now covers the EMBEDDING modality too: per-distinct-‖v‖ counts of
    the live (odd-id) population accumulate over real micro-batches of
    an embeddings file stream (norms computed inside each batch, no
    vector state stored) through the same replay-idempotent
    batch-keyed delta sink as every count monitor; the frozen
    reference side is the batch norms of the even ids. The final
    statistic reuses the exact-KS prefix-sum core over the streamed
    counts full-joined with the reference counts; the oracle is the
    plain batch KS of the same fixture (identical to
    dq_embedding_norm_drift's), so streaming-vs-batch equality is the
    check. Drift injection (×1.25 + 0.05 on even labels) rides the
    job's vec_expr hook — the production path passes none."""
    import tempfile

    from walmart_project_etl_spark.operators.cleaning import \
        _ks_from_value_counts
    from walmart_project_etl_spark.operators.similarity import (_as_double,
                                                                dot)
    from walmart_project_etl_spark.streaming import \
        stream_embedding_norm_counts

    emb = t(spark, sf_dir, "embeddings")
    rv = _as_double(F.col("embedding"))
    ref = (emb.where(F.col("vec_id") % 2 == 0)
           .select(F.sqrt(dot(rv, rv)).alias("embedding_norm")))
    curv = F.when(F.col("label") % 2 == 0,
                  F.transform("embedding",
                              lambda x: x.cast("double") * 1.25 + 0.05)) \
            .otherwise(F.transform("embedding",
                                   lambda x: x.cast("double")))
    cur_cnt = stream_embedding_norm_counts(
        spark, embeddings_dir(spark, sf_dir),
        tempfile.mkdtemp(prefix="wpe_stream_embnorm_wh_"),
        vec_expr=curv, vec_parity=1)
    ref_cnt = (ref.where(F.col("embedding_norm").isNotNull())
               .groupBy(F.col("embedding_norm").alias("__x"))
               .agg(F.count(F.lit(1)).alias("__cr")))
    per_val = (ref_cnt.join(cur_cnt.select(F.col("x").alias("__x"),
                                           F.col("c").alias("__cc")),
                            "__x", "full")
               .select("__x",
                       F.coalesce("__cr", F.lit(0)).alias("__cr"),
                       F.coalesce("__cc", F.lit(0)).alias("__cc")))
    n_buckets = 32
    edges = ref.agg(*[
        F.expr(f"percentile(embedding_norm, {i / n_buckets})")
        .alias(f"__e{i}") for i in range(1, n_buckets)])
    return _ks_from_value_counts(per_val, edges, n_buckets - 1,
                                 "embedding_norm")


@q("stream_session_stats", """
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000
         AS duration_seconds,
       round(sum(CAST(value AS DECIMAL(28,6))), 2)::DOUBLE AS sum_value
FROM sess GROUP BY user_id, sid""")
def stream_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL STREAMING SESSION WINDOWS (streaming/jobs.py:
    stream_session_stats): Spark's native session_window dynamic-gap
    state — adjacent windows merge as events arrive, the watermark
    bounds open-session state — drained with availableNow. The oracle
    is the batch gaps-and-islands sessionization of the same events
    with the >= gap boundary (session windows are half-open
    [first, last+gap), so an event exactly gap after its predecessor
    opens a new session; the batch events_sessionization twin keeps
    the lag-> convention — both standard, boundary documented in the
    job). Streaming-vs-batch equality, the 14th streaming shape."""
    from walmart_project_etl_spark.streaming import stream_session_stats
    return stream_session_stats(spark, events_dir(spark, sf_dir),
                                gap="30 minutes")


@q("ts_holt_winters", pinned("ts_holt_winters"))
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters per user over the DAILY value series,
    season=7 (operators/timeseries.py:holt_winters): the triple-
    exponential forecaster — one day-grain aggregation, one entity
    shuffle, the three-field recursion as an in-row struct fold whose
    seasonal array updates via index-aware transform (O(days·season)
    per entity, no Python). Oracle = pinned sf0.01 golden: DuckDB's
    list_reduce mutates struct accumulators in place mid-step (the
    ts_holt_forecast finding), so it cannot replay the recursion."""
    from walmart_project_etl_spark.operators import timeseries
    ev = events_t(spark, sf_dir)
    return timeseries.holt_winters(ev, "user_id", "ts", "value",
                                   season=7)


@q("sketch_kmv_union", """
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hh
  FROM events WHERE user_id IS NOT NULL),
state AS (
  SELECT event_type, hh,
         row_number() OVER (PARTITION BY event_type ORDER BY hh) AS rn
  FROM h),
merged AS (
  SELECT DISTINCT hh FROM state WHERE rn <= 32),
bot AS (
  SELECT hh, row_number() OVER (ORDER BY hh) AS rn FROM merged),
a AS (SELECT count(*) AS n_kept, max(hh) AS hk
      FROM bot WHERE rn <= 32),
x AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events
      WHERE user_id IS NOT NULL)
SELECT CASE WHEN n_kept < 32 THEN n_kept::DOUBLE
            ELSE round(31.0 * 1152921504606846976.0 / hk::DOUBLE, 4)
       END AS kmv_est,
       n_kept, exact_distinct
FROM a, x""")
def sketch_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV MERGEABILITY — the property that makes bottom-k the
    100 TB COUNT(DISTINCT) shape: per-event-type sketch STATES (32
    longs each) union and re-bottom-k into a global estimate, and the
    query RAISES unless that merged estimate equals a direct global
    sketch of the same corpus (bottom-k(∪ bottom-k's) = bottom-k(∪) —
    checked at runtime, so the driver's green row proves the merge
    law, not just the arithmetic). Output: merged estimate next to the
    exact distinct count."""
    ev = events_t(spark, sf_dir).where(F.col("user_id").isNotNull())
    per_type = sketch.kmv_hashes(ev, "user_id", ["event_type"], k=32)
    merged = sketch.kmv_from_hashes(per_type, k=32)
    direct = sketch.kmv_from_hashes(
        sketch.kmv_hashes(ev, "user_id", None, k=32), k=32)
    m, d = merged.collect()[0], direct.collect()[0]
    if (m["kmv_est"], m["n_kept"]) != (d["kmv_est"], d["n_kept"]):
        raise ValueError(f"KMV merge law violated: {m} vs {d}")
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return merged.crossJoin(exact)
