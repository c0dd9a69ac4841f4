"""Structured Streaming surface.

The reference is batch-only (SURVEY §2.10); this module is the driver
north-star extension: the same event-table semantics as
``operators.events``, expressed as an incremental Structured Streaming
pipeline — file source → watermark → windowed aggregation → sink.

Design for scale: the file source lists incrementally; watermark bounds
state (late events beyond the watermark are dropped, state for closed
windows is evicted); ``availableNow`` gives batch-bounded runs for
backfill with identical code. The same queries run against Kafka by
swapping the reader — nothing else changes.
"""

from .jobs import (stream_category_counts, stream_dedup_within_watermark,
                   stream_embedding_norm_counts,
                   stream_feature_value_counts,
                   stream_enrich_tumbling, stream_latest_per_user,
                   stream_mv_refresh, stream_partition_ingest,
                   stream_psi_bucket_counts, stream_stream_attribution_join,
                   stream_tumbling_counts, stream_session_stats,
                   stream_upsert_latest, stream_upsert_tx,
                   stream_value_counts)

__all__ = ["stream_tumbling_counts", "stream_latest_per_user",
           "stream_dedup_within_watermark", "stream_stream_attribution_join",
           "stream_upsert_latest", "stream_enrich_tumbling",
           "stream_upsert_tx", "stream_partition_ingest",
           "stream_mv_refresh", "stream_psi_bucket_counts",
           "stream_value_counts", "stream_session_stats",
           "stream_category_counts", "stream_embedding_norm_counts",
           "stream_feature_value_counts"]
