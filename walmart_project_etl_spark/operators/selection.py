"""Data selection for LM training corpora — DSIR-style importance
resampling (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling": hashed n-gram bucket features, a target-vs-raw
importance weight per document, then Gumbel top-k resampling).

Spark-first shape, built for a 100 TB raw pool:

- **Featurization** is the same lowercase-whitespace tokenization the
  corpus quality scorers use, bucketed by an md5 hash so every step has
  an exact cross-engine oracle (md5, not xxhash64 — the same trade the
  sampling operators make: determinism any engine can reproduce, paid
  only at selection time).
- **Bucket distributions** are two corpus-wide aggregates that reduce
  to ``n_buckets`` rows (default 10k) — broadcast-sized regardless of
  corpus size, so the scoring join never shuffles on the (Zipf-skewed)
  token key.
- **Scoring** is one explode + broadcast-join + per-doc sum: shuffle
  volume is the token count with map-side partial aggregation — the
  same cost envelope as the unigram-LM quality score.
- **Resampling** uses the Gumbel top-k trick (add seeded Gumbel noise
  to the log-weight, take the k largest), which turns weighted
  sampling WITHOUT replacement into an ``orderBy().limit(k)`` —
  Spark's TakeOrdered, a per-partition top-k plus one driver merge,
  never a full sort shuffle.

Determinism for the oracle: per-bucket log-ratios round to 6 places
and accumulate as exact DECIMALs (the repo-wide pattern from
``operators/text.py::unigram_logprob``); the Gumbel noise derives from
the md5 of (seed, doc id), so engine RNGs never enter the picture.

The reference has no analogue (its selection is a WHERE clause on
business columns); this operator family is part of the engine's
LLM-training-data surface alongside dedup/quality/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default hashed-feature bucket count (the DSIR paper uses 10k hashed
#: unigram+bigram buckets; collisions are part of the method)
N_BUCKETS = 10_000


def _tokens(text_col: str):
    """Lowercase whitespace tokens — identical to the quality scorers'
    tokenization (operators/text.py) so scores compose."""
    return F.split(
        F.lower(F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")),
        r"\s+")


def _bucket(col, n_buckets: int):
    """md5 hash bucket of a token — ``('0x' || substr(md5(t), 1, 8))
    :: BIGINT % n`` in the DuckDB oracle spelling."""
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10)
             .cast("long") % n_buckets)


def _smoothed(counts: DataFrame, n_buckets: int, out: str, floor: str):
    """(distribution, floor) from a bucket-count table: per-bucket
    ``ln((count_b + 1) / (total + n_buckets))`` (Laplace — every bucket
    gets mass) plus the 1-row missing-bucket floor
    ``ln(1 / (total + n_buckets))``, both derived from ONE total so the
    corpus is never re-scanned. Reduces to ``n_buckets`` rows:
    broadcast-sized at any corpus size."""
    total = counts.agg(F.sum("__c").alias("__n"))
    dist = (counts.crossJoin(F.broadcast(total))
            .select("__b",
                    F.log((F.col("__c") + F.lit(1.0))
                          / (F.col("__n") + F.lit(float(n_buckets))))
                     .alias(out)))
    fl = total.select(
        F.log(F.lit(1.0) / (F.col("__n") + F.lit(float(n_buckets))))
         .alias(floor))
    return dist, fl


def dsir_importance_weights(target: DataFrame, raw: DataFrame,
                            id_col: str, text_col: str,
                            n_buckets: int = N_BUCKETS) -> DataFrame:
    """Per-document DSIR importance log-weight of every ``raw`` doc:
    ``logw(x) = Σ_tokens ln(p_target(bucket) / p_raw(bucket))`` over
    hashed unigram buckets, with Laplace-smoothed bucket distributions
    fit on the two corpora. High ``logw`` = looks like the target
    distribution; resample with :func:`dsir_resample`.

    Plan shape: exactly TWO corpus token explodes — the target's bucket
    counts, and the raw side's per-(doc, bucket) counts, from which the
    raw bucket distribution re-aggregates (doc-count-sized shuffle, not
    a corpus re-scan) and the smoothing floors derive from the same
    totals. Everything bucket-sized broadcasts into the scoring join.

    Output: ``id_col``, ``n_tokens`` (long), ``logw`` (double — the
    exact DECIMAL sum of 6-dp-rounded per-bucket log-ratios times
    counts, so any engine reproduces it bit-for-bit).
    """
    t_counts = (target.select(F.explode(_tokens(text_col)).alias("__t"))
                .select(_bucket(F.col("__t"), n_buckets).alias("__b"))
                .groupBy("__b")
                .agg(F.count(F.lit(1)).alias("__c")))
    doc_b = (raw.select(F.col(id_col),
                        F.explode(_tokens(text_col)).alias("__t"))
             .select(id_col, _bucket(F.col("__t"), n_buckets).alias("__b"))
             .groupBy(id_col, "__b")
             .agg(F.count(F.lit(1)).alias("__c")))
    r_counts = doc_b.groupBy("__b").agg(F.sum("__c").alias("__c"))
    p_t, t_floor = _smoothed(t_counts, n_buckets, "__lpt", "__tf")
    p_r, r_floor = _smoothed(r_counts, n_buckets, "__lpr", "__rf")
    # missing buckets on either side take that side's smoothing floor;
    # the outer join + coalesce keeps the ratio finite everywhere
    ratio = (p_t.join(p_r, "__b", "full")
             .crossJoin(F.broadcast(t_floor))
             .crossJoin(F.broadcast(r_floor))
             .select("__b",
                     F.round(F.coalesce(F.col("__lpt"), F.col("__tf"))
                             - F.coalesce(F.col("__lpr"), F.col("__rf")),
                             6).cast("decimal(20,6)").alias("__lr")))
    return (doc_b.join(F.broadcast(ratio), "__b")
            .groupBy(id_col)
            .agg(F.sum("__c").cast("long").alias("n_tokens"),
                 F.sum(F.col("__lr") * F.col("__c")).cast("double")
                  .alias("logw")))


def dsir_resample(weighted: DataFrame, id_col: str, k: int,
                  seed: str = "dsir") -> DataFrame:
    """Gumbel top-k importance resampling: draw ``k`` docs WITHOUT
    replacement with probability ∝ exp(logw), deterministically.

    ``key = logw + Gumbel(md5(seed, id))`` and the k largest keys are
    exactly a weighted without-replacement sample (the Gumbel-max
    trick); ``orderBy(key).limit(k)`` plans as TakeOrdered — a
    per-partition top-k plus one driver-side merge of k-row heads,
    never a full sort shuffle. The uniform comes from the md5 of
    (seed, doc id): 15 hex chars → (0, 1), the repo's standard
    engine-reproducible randomness. The sort key rounds to 6 dp with
    the id as tie-break, so the oracle's ORDER BY agrees bit-for-bit.
    """
    u = ((F.conv(F.substring(
            F.md5(F.concat_ws("|", F.lit(seed),
                              F.col(id_col).cast("string"))), 1, 15),
            16, 10).cast("double") + F.lit(0.5))
         / F.lit(float(16 ** 15)))
    gumbel = -F.log(-F.log(u))
    out = weighted.withColumn(
        "sel_key", F.round(F.col("logw") + gumbel, 6))
    return (out.orderBy(F.col("sel_key").desc(), F.col(id_col))
               .limit(k))


def mixture_divergence_report(df: DataFrame, group_col: str,
                              text_col: str) -> DataFrame:
    """Per-group token-distribution diagnostics for corpus MIXING: each
    group's (source/domain) unigram entropy and its KL divergence from
    the whole-corpus distribution — the quantities domain-reweighting
    recipes (DoReMi-style mixture tuning, DSIR's target/raw framing)
    monitor when composing a training mix. A source with near-zero KL
    adds no distributional diversity; an extreme-KL source is the one to
    up/down-weight deliberately.

    KL(p_group ‖ p_corpus) is always finite here: every group token is
    by construction in the corpus distribution (support ⊆ support).

    Scale shape: one token explode feeding ONE (group, token) aggregation
    (map-side combined); the corpus distribution derives from that same
    table (never a second scan); joins are token-keyed and uniform. Per
    the repo's cross-engine convention, each log term rounds to 6 places
    and accumulates as an exact DECIMAL — sums are order-independent, so
    the report carries an exact SQL oracle (the residual ln() last-ulp
    boundary risk is the same one every logprob scorer here accepts).

    Returns (group_col, n_tokens, entropy, kl_vs_corpus) — entropy in
    nats; both final values are exact-decimal sums divided by the group
    token count, no further rounding needed.
    """
    tok = df.select(F.col(group_col),
                    F.explode(_tokens(text_col)).alias("__t")) \
            .where(F.col("__t") != "")
    st = tok.groupBy(group_col, "__t").agg(F.count(F.lit(1)).alias("__c"))
    ns = st.groupBy(group_col).agg(F.sum("__c").alias("__ns"))
    v = st.groupBy("__t").agg(F.sum("__c").alias("__vc"))
    tot = v.agg(F.sum("__vc").alias("__n"))
    p = F.col("__c") / F.col("__ns")
    q = F.col("__vc") / F.col("__n")
    terms = (st.join(ns, group_col).join(v, "__t")
             .crossJoin(F.broadcast(tot))
             .select(group_col, "__c", "__ns",
                     F.round(F.log(p), 6).cast("decimal(20,6)")
                      .alias("__hp"),
                     F.round(F.log(p / q), 6).cast("decimal(20,6)")
                      .alias("__klp")))
    return (terms.groupBy(group_col)
            .agg(F.any_value("__ns").cast("long").alias("n_tokens"),
                 (-F.sum(F.col("__hp") * F.col("__c")).cast("double")
                  / F.any_value("__ns")).alias("entropy"),
                 (F.sum(F.col("__klp") * F.col("__c")).cast("double")
                  / F.any_value("__ns")).alias("kl_vs_corpus")))
