"""Partitioning-invariance: the distributed-correctness property.

A result that changes with input partitioning or
``spark.sql.shuffle.partitions`` would differ between local[32] and a
1000-executor cluster — every operator whose determinism the oracles
rely on (hash ranks, decimal-routed sums, window tiebreaks, iterative
components, corpus-scalar scoring) must produce IDENTICAL rows at any
parallelism. Each representative operator runs with the input coalesced
to 1 partition under 2 shuffle partitions, then exploded to 17
partitions under 32 — and must match row-for-row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _events(spark):
    from walmart_project_etl_spark.queries.util import events_t
    return events_t(spark, SF_DIR)


def _sized_docs(spark):
    d = _docs(spark)
    n = F.size(F.split(F.regexp_replace(F.col("text"), r"^\s+|\s+$", ""),
                       r"\s+"))
    return d.select("doc_id", "source", n.cast("long").alias("n_tokens"))


def _op_sessionize(spark, df):
    from walmart_project_etl_spark.operators import events as ev
    return ev.session_stats(df, gap_minutes=30)


def _op_stratified(spark, df):
    from walmart_project_etl_spark.operators import sampling
    return sampling.stratified_sample(df, "lang", 0.2, "doc_id") \
        .select("doc_id", "lang")


def _op_token_budget(spark, df):
    from walmart_project_etl_spark.operators import sampling
    return sampling.token_budget_per_group(df, "source", "n_tokens",
                                           budget=800, key="doc_id")


def _op_weighted_wr(spark, df):
    from walmart_project_etl_spark.operators import sampling
    return sampling.weighted_sample_per_group(df, "source", k=7,
                                              key="doc_id",
                                              weight="n_tokens") \
        .select("doc_id", "source")


def _op_pack(spark, df):
    from walmart_project_etl_spark.operators import packing
    return packing.pack_sequences(df.select("doc_id", "n_tokens"),
                                  "doc_id", "n_tokens",
                                  capacity=64, n_groups=8)


def _op_components(spark, df):
    from walmart_project_etl_spark.operators import dedup, graph
    pairs = dedup.ngram_jaccard_pairs(df, "doc_id", "text",
                                      k=5, threshold=0.6) \
        .select("id_a", "id_b")
    return graph.cluster_dedup(pairs, df, "doc_id")


def _op_winsorize(spark, df):
    from walmart_project_etl_spark.operators import cleaning
    from walmart_project_etl_spark.queries.util import round2
    out = cleaning.winsorize(df, "l_extendedprice",
                             group_cols=["l_returnflag"],
                             lo=0.01, hi=0.99, out_col="__clip")
    return out.select("l_orderkey", "l_linenumber",
                      round2(F.col("__clip")).alias("clipped"))


def _op_tfidf(spark, df):
    from walmart_project_etl_spark.operators import text
    return text.tfidf_top_terms(df, "doc_id", "text", k=5)


def _op_dedup_lines(spark, df):
    from walmart_project_etl_spark.operators import dedup
    corpus = df.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat_ws("\n", F.lit("HDR"), F.col("text"), F.lit("FTR")))
         .otherwise(F.col("text")).alias("text"))
    return dedup.dedup_lines(corpus, "doc_id", "text", keep_first=True)


def _op_gap_fill(spark, df):
    from walmart_project_etl_spark.operators import timeseries
    daily = (df.groupBy("o_orderpriority", "o_orderdate")
             .agg(F.count(F.lit(1)).alias("n")))
    return timeseries.gap_fill_forward(daily, ["o_orderpriority"],
                                       "o_orderdate", ["n"])


def _op_shards(spark, df):
    from walmart_project_etl_spark.operators import sampling
    return sampling.assign_shards(df.select("doc_id"), "doc_id", 8)


def _op_incr_agg(spark, df):
    from walmart_project_etl_spark.operators import incremental
    keys = ["l_returnflag", "l_linestatus"]
    base = df.where(F.col("l_orderkey") % 3 != 0)
    delta = df.where(F.col("l_orderkey") % 3 == 0)
    state = incremental.merge_agg_state(
        incremental.agg_state(base, keys, "l_extendedprice"),
        incremental.agg_state(delta, keys, "l_extendedprice"), keys)
    return incremental.finalize(state, keys)


def _op_salted_latest(spark, df):
    from walmart_project_etl_spark.operators import skew
    hot = df.withColumn("o_custkey",
                        F.when(F.col("o_orderkey") % 5 == 0, F.lit(0))
                         .otherwise(F.col("o_custkey")))
    return skew.salted_latest(hot, ["o_custkey"], "o_orderdate",
                              "o_orderkey", n_salts=8)




def _op_semdedup(spark, df):
    from walmart_project_etl_spark.operators import dedup
    return dedup.semdedup(df, "vec_id", "embedding", "label",
                          threshold=0.3)


def _op_dsir(spark, df):
    from walmart_project_etl_spark.operators import selection
    w = selection.dsir_importance_weights(
        df.where("lang = 'en'"), df, "doc_id", "text")
    return selection.dsir_resample(w, "doc_id", k=50)


def _op_temperature(spark, df):
    from walmart_project_etl_spark.operators import sampling
    return sampling.temperature_mixture(df, "source", "n_tokens",
                                        "doc_id", total_budget=5000)


def _op_bigram(spark, df):
    from walmart_project_etl_spark.operators import text
    return text.bigram_logprob(df, "doc_id", "text")


def _op_bpe(spark, df):
    from walmart_project_etl_spark.operators import bpe
    merges = bpe.bpe_train(df, "text", n_merges=10)
    enc = bpe.bpe_encode(df, "doc_id", "text", merges)
    return enc.select("doc_id", "n_tokens",
                      F.md5(F.concat_ws(" ", "tokens")).alias("h"))


CASES = {
    "sessionize": (_events, _op_sessionize),
    "salted_latest": (
        lambda spark: spark.read.parquet(f"{SF_DIR}/orders.parquet"),
        _op_salted_latest),
    "stratified_sample": (_docs, _op_stratified),
    "token_budget": (_sized_docs, _op_token_budget),
    "weighted_without_replacement": (_sized_docs, _op_weighted_wr),
    "pack_sequences": (_sized_docs, _op_pack),
    "cluster_components": (_docs, _op_components),
    "winsorize": (
        lambda spark: spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
        _op_winsorize),
    "tfidf_top_terms": (_docs, _op_tfidf),
    "dedup_lines_keep_first": (_docs, _op_dedup_lines),
    "gap_fill_locf": (
        lambda spark: spark.read.parquet(f"{SF_DIR}/orders.parquet"),
        _op_gap_fill),
    "incremental_agg": (
        lambda spark: spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
        _op_incr_agg),
    "shard_assignment": (_docs, _op_shards),
    "bpe_train_encode": (_docs, _op_bpe),
    "dsir_resample": (_docs, _op_dsir),
    "temperature_mixture": (_sized_docs, _op_temperature),
    "bigram_logprob": (_docs, _op_bigram),
    "semdedup": (
        lambda spark: spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        _op_semdedup),
}


def _canon_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", sorted(CASES))
def test_result_invariant_under_parallelism(spark, name):
    load, op = CASES[name]
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        low = _canon_rows(op(spark, load(spark).coalesce(1)))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        high = _canon_rows(op(spark, load(spark).repartition(17)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert low and low == high, \
        f"{name}: result depends on partitioning/parallelism"
