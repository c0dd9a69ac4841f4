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
#: for (at most) the first 50 registry entries. Freshness entering r13
#: (computed from the union of CORRECTNESS_r*.json): r12×50, r11×50,
#: r9×50, r8×50, r7×41, r6×36, never×2 (dq_quarantine_split and
#: sketch_kmv_union — r12-late, slot-capped). This round's window (r13)
#: leads with those 2 never-checked entries (VERDICT r12 task 2), then
#: any r13-new entries, then ALL 36 r6-era stale rows, then the first
#: r7-era rows (alphabetical) up to the 50-slot cap — r13-new entries
#: displace from the r7-era tail.
_PRIORITY = (
    # never driver-checked (r12-late, slot-capped; judge-verified r12)
    "dq_quarantine_split",
    "sketch_kmv_union",
    # r13-new entries (sorted-neighborhood dedup, mixing KL report,
    # FD profiling, decimal-exact corr/regression, PSI drift)
    "dedup_sorted_neighborhood",
    "sel_mix_kl_report",
    "dq_fd_violations",
    "olap_corr_regr",
    "dq_psi_drift",
    "ts_holt_winters",
    "sample_contrastive_triplets",
    "stream_psi_drift",
    "text_pmi_collocations",
    "dedup_snm_multipass",
    "sim_rrf_fusion",
    # r6-era rotation: all 36 rows whose newest driver row is 7 rounds old
    "dedup_cluster_components",
    "dedup_contamination_scores",
    "dedup_decontaminate",
    "dedup_fuzzy_blocked",
    "dedup_ngram_containment",
    "dedup_ngram_jaccard",
    "events_attribution",
    "events_transition_matrix",
    "j01_left_equi_join",
    "j10_optional_dim_left_join",
    "mm_real_decode_png",
    "mm_real_decode_wav",
    "olap_cube_lineitem",
    "olap_grouping_sets_orders",
    "olap_histogram",
    "olap_rollup_lineitem",
    "olap_share_of_total",
    "olap_time_rollup_events",
    "p01_projection_rename",
    "p02_distinct_nonnull_dates",
    "p03_null_filter",
    "profile_lineitem",
    "s02_empty_string_to_null",
    "s03_table_scan",
    "s04_parquet_sink_roundtrip",
    "s06_ddl_create_insert",
    "s07_truncate",
    "s08_drop",
    "s09_temp_view",
    "skew_salted_latest",
    "stream_static_enrich",
    "stream_tx_upsert",
    "text_unigram_logprob",
    "ts_gap_fill_locf",
    "txn_merge_fileprune",
    "txn_time_travel",
    # r7-era rotation, first 1 of 41 (alphabetical; 11 slots went to the
    # r13-new entries above)
    "a01_groupby_mode",
)
#: r14 plan: after this window the stalest rows are the remaining 40
#: r7-era entries (a04_count_star_tables, a08_conditional_ratio,
#: a09_distinct_rows, f01_md5_key_generation,
#: f02_f29_date_int_id,
#: f03_f05_f06_date_parts, f04_multiformat_date_parse,
#: f07_f08_safe_cast_age_group, f09_title_case_clean, f10_null_defaults,
#: f11_f13_product_rules,
#: and the 29 below: j02_broadcast_key_map_join, j04_d01_scd1_merge,
#: j05_j06_j07_d02_scd2_two_run, j06_grouped_max_lookup_join,
#: j08_multiway_fact_join, j09_interval_join_scd2,
#: j12_bucketed_colocated_join, o01_orderby_limit_topk, o02_full_sort,
#: o03_recent_slice, p04_date_membership_semi_join,
#: p05_skip_missing_dim_key, p06_boolean_flag_filters, p07_rn1_filter,
#: pipe_d02_scd_fixture, pipe_s01_s02_f04_csv_ingest, sim_recall_report,
#: skew_salted_aggregate, skew_salted_join, text_langid,
#: text_quality_classifier_report, text_stats_quality, text_token_counts,
#: txn_catalog_star, txn_date_skipping, txn_delete_compact,
#: txn_schema_evolution, u01_union_distinct, w01_window_dedup_latest),
#: then the r8-era block (50 rows) — lead r14 with any r13-new entries
#: that missed this window, then those 29, then the first r8-era rows.


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
