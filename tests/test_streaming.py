"""Structured Streaming jobs must agree with their batch twins on a
drained bounded input."""

from __future__ import annotations

import pytest

from walmart_project_etl_spark.operators import events as ev_ops
from walmart_project_etl_spark.queries.util import events_dir, events_t
from walmart_project_etl_spark.streaming import (stream_latest_per_user,
                                                 stream_tumbling_counts)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return events_t(spark, SF_DIR)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_equals_batch(spark, events):
    batch = ev_ops.tumbling_window_agg(events, "ts", "1 hour", ["event_type"])
    stream = stream_tumbling_counts(spark, events_dir(spark, SF_DIR),
                                    "1 hour", "2 hours")
    cols = ["window_start", "window_end", "event_type", "n_events", "sum_value"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_stateful_user_stats_equals_batch(spark, events):
    """applyInPandasWithState running stats drained with availableNow must
    equal the batch groupBy."""
    import pyspark.sql.functions as F
    from walmart_project_etl_spark.streaming.stateful import stream_user_stats
    stream = stream_user_stats(spark, events_dir(spark, SF_DIR))
    batch = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.round(F.col("value").cast("decimal(28,6)"), 6)), 2)
         .cast("double").alias("sum_value"),
        F.max("ts").alias("last_ts"))
    cols = ["user_id", "n_events", "sum_value", "last_ts"]
    assert _rows(stream.select(*cols), cols) == _rows(batch.select(*cols), cols)


def test_stream_latest_equals_batch(spark, events):
    batch = ev_ops.latest_event_per_key(events, ["user_id"]) \
        .select("user_id", "event_id")
    stream = stream_latest_per_user(spark, events_dir(spark, SF_DIR)) \
        .select("user_id", "event_id")
    assert _rows(batch, ["user_id", "event_id"]) == _rows(stream, ["user_id", "event_id"])


def test_stream_dedup_within_watermark_collapses_doubles(spark, events):
    from walmart_project_etl_spark.streaming import \
        stream_dedup_within_watermark
    out = stream_dedup_within_watermark(spark, events_dir(spark, SF_DIR))
    n_src = events.count()
    assert out.count() == n_src                      # doubles collapsed
    assert out.select("event_id").distinct().count() == n_src
    # surviving rows carry the source values intact
    src = events.select("event_id", "user_id", "event_type", "value")
    assert out.exceptAll(src).count() == 0


def test_stream_upsert_latest_equals_batch_across_batches(spark, events, tmp_path):
    """foreachBatch warehouse upsert must converge to the batch
    latest-per-user result — and must actually run as MULTIPLE
    micro-batches (maxFilesPerTrigger over a multi-file source), or the
    incremental merge is untested."""
    import glob

    from walmart_project_etl_spark.streaming import stream_upsert_latest
    src = events_dir(spark, SF_DIR)
    assert len(glob.glob(f"{src}/*.parquet")) >= 4  # enough files to split
    out = stream_upsert_latest(spark, src, str(tmp_path / "wh"),
                               max_files_per_trigger=2)
    batch = ev_ops.latest_event_per_key(events, ["user_id"])
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_stream_join_equals_batch(spark, events):
    """Watermarked stream-stream interval join drained with availableNow
    must equal the batch interval join."""
    import pyspark.sql.functions as F
    from walmart_project_etl_spark.streaming import \
        stream_stream_attribution_join
    stream = stream_stream_attribution_join(spark, events_dir(spark, SF_DIR))
    v = events.where(F.col("event_type") == "view") \
        .select(F.col("event_id").alias("view_id"), "user_id",
                F.col("ts").alias("view_ts"))
    c = events.where(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("cu"), F.col("ts").alias("click_ts"))
    batch = v.join(c, (F.col("user_id") == F.col("cu"))
                   & (F.col("click_ts") >= F.col("view_ts"))
                   & (F.col("click_ts") <= F.col("view_ts")
                      + F.expr("INTERVAL 1 HOUR")))
    cols = ["view_id", "click_id", "user_id", "view_ts", "click_ts"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_stream_upsert_resumes_from_checkpoint(spark, events, tmp_path):
    """Restart semantics: with a fixed checkpoint, a second invocation
    must process ONLY the input files that appeared after the first run
    (the file source's commit log), and the merged table must equal the
    batch latest-per-user over the full input — the incremental
    daily-ingest shape."""
    import glob
    import shutil

    from walmart_project_etl_spark.streaming import stream_upsert_latest
    src = events_dir(spark, SF_DIR)
    parts = sorted(glob.glob(f"{src}/*.parquet"))
    assert len(parts) >= 4
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    for p in parts[:2]:  # phase 1: first two files arrive
        shutil.copy(p, inbox)
    wh_root = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    stats1: list = []
    stream_upsert_latest(spark, str(inbox), wh_root,
                         max_files_per_trigger=1, checkpoint_dir=ckpt,
                         batch_stats=stats1)
    n_phase1 = sum(n for _, n in stats1)

    for p in parts[2:]:  # phase 2: the rest arrive
        shutil.copy(p, inbox)
    stats2: list = []
    out = stream_upsert_latest(spark, str(inbox), wh_root,
                               max_files_per_trigger=1, checkpoint_dir=ckpt,
                               reset=False, batch_stats=stats2)
    n_phase2 = sum(n for _, n in stats2)

    n_total = events.count()
    assert n_phase1 + n_phase2 == n_total   # nothing reprocessed, nothing lost
    assert 0 < n_phase1 < n_total           # both phases did real work
    batch = ev_ops.latest_event_per_key(events, ["user_id"])
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_upsert_reset_guard_over_live_checkpoint(spark, events, tmp_path):
    """Restart safety (r4 advisory): with an existing checkpoint the
    default must KEEP the target table (reset resolves to False), and an
    explicit reset=True over a live checkpoint must raise instead of
    silently dropping rows the commit log already marked processed."""
    import glob
    import shutil

    import pytest

    from walmart_project_etl_spark.streaming import stream_upsert_latest
    src = events_dir(spark, SF_DIR)
    parts = sorted(glob.glob(f"{src}/*.parquet"))
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    shutil.copy(parts[0], inbox)
    wh_root = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    stream_upsert_latest(spark, str(inbox), wh_root,
                         checkpoint_dir=ckpt)          # fresh: reset→True
    for p in parts[1:]:
        shutil.copy(p, inbox)
    with pytest.raises(ValueError, match="checkpoint"):
        stream_upsert_latest(spark, str(inbox), wh_root,
                             checkpoint_dir=ckpt, reset=True)
    # default restart path: no reset arg, table survives, result complete
    out = stream_upsert_latest(spark, str(inbox), wh_root,
                               checkpoint_dir=ckpt)
    batch = ev_ops.latest_event_per_key(events, ["user_id"])
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_static_enrich_equals_batch(spark, events):
    from pyspark.sql import functions as F

    from walmart_project_etl_spark.streaming import stream_enrich_tumbling
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet") \
                  .select("n_nationkey", "n_name")
    stream = stream_enrich_tumbling(spark, events_dir(spark, SF_DIR),
                                    nation, "n_nationkey", "n_name",
                                    stream_key=F.col("user_id") % 25)
    batch = (events.join(F.broadcast(nation),
                         events["user_id"] % 25 == nation["n_nationkey"])
             .groupBy(F.window("ts", "1 hour").alias("win"), "n_name")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2)
                   .cast("double").alias("sum_value"))
             .select(F.col("win.start").alias("window_start"),
                     F.col("win.end").alias("window_end"),
                     "n_name", "n_events", "sum_value"))
    cols = ["window_start", "window_end", "n_name", "n_events", "sum_value"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_stream_tx_upsert_exactly_once_replay(spark, events, tmp_path):
    """The transactional streaming sink: (1) converges to the batch
    window query; (2) a RE-DELIVERED micro-batch (same batch id, even
    with mutated contents) is a logged no-op — the table's own commit
    log is the applied-batch bookkeeping, so at-least-once foreachBatch
    delivery yields exactly-once table state."""
    from pyspark.sql import functions as F

    from walmart_project_etl_spark.operators import events as ev_ops
    from walmart_project_etl_spark.sources.txlog import TxTable
    from walmart_project_etl_spark.streaming import stream_upsert_tx

    root = str(tmp_path / "txdim")
    stats = []
    out = stream_upsert_tx(spark, events_dir(spark, SF_DIR), root,
                           batch_stats=stats)
    assert len(stats) >= 2, "fixture must split into several micro-batches"
    batch = ev_ops.latest_event_per_key(events, ["user_id"])
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    assert _rows(out, cols) == _rows(batch, cols)

    # replay batch 0 with POISONED data: value would visibly change if
    # the merge applied — it must be skipped via the txn marker
    t = TxTable(spark, root)
    poisoned = t.snapshot().limit(5).withColumn("value", F.lit(-1.0e9))
    res = t.merge_upsert(poisoned, txn=("stream_upsert_tx", 0))
    assert res.get("skipped_replay"), res
    assert _rows(t.snapshot(), cols) == _rows(batch, cols)
    # a genuinely NEW batch id still applies
    res2 = t.merge_upsert(poisoned, txn=("stream_upsert_tx",
                                         max(b for b, _ in stats) + 1))
    assert not res2.get("skipped_replay")
    assert t.snapshot().where("value = -1.0e9").count() == 5


def test_stream_tx_upsert_resume_processes_new_files(spark, events, tmp_path):
    """RESUME the transactional sink against the same table root: the
    default checkpoint is derived from table_root, so a second invocation
    continues the SAME stream — new event files get fresh batch ids above
    last_txn and are applied. (A per-call random checkpoint would restart
    batch ids at 0 and the replay guard would silently drop them.)"""
    from walmart_project_etl_spark.streaming import stream_upsert_tx

    src = str(tmp_path / "ev")
    root = str(tmp_path / "txdim")
    first = events.where("event_id % 2 = 0")
    second = events.where("event_id % 2 = 1")
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    first.repartition(2).write.parquet(src)
    out1 = stream_upsert_tx(spark, src, root)
    assert _rows(out1, cols) == \
        _rows(ev_ops.latest_event_per_key(first, ["user_id"]), cols)
    # new files land in the source dir; re-invoke on the same table root
    second.repartition(2).write.mode("append").parquet(src)
    out2 = stream_upsert_tx(spark, src, root)
    assert _rows(out2, cols) == \
        _rows(ev_ops.latest_event_per_key(events, ["user_id"]), cols)


def test_stream_partition_ingest_exactly_once_and_compacted(
        spark, events, tmp_path):
    """Partitioned streaming ingest: converges to the batch table,
    every file partition-pure, hot-partition compaction bounds the
    file count, and a REPLAYED batch is a logged no-op (txn marker)."""
    from walmart_project_etl_spark.sources.txlog import TxTable
    from walmart_project_etl_spark.streaming import stream_partition_ingest

    root = str(tmp_path / "spi")
    path = events_dir(spark, SF_DIR)
    t = stream_partition_ingest(spark, path, root,
                                max_files_per_trigger=2)
    ev = spark.read.parquet(path)
    assert t.snapshot().count() == ev.count()
    _, live = t._state()
    assert all("pval" in a for a in live.values())
    # per-batch scoped compaction keeps the layout tight: no partition
    # holds more than 2 files after the run
    from collections import Counter
    per = Counter(a["pval"] for a in live.values())
    assert max(per.values()) <= 2
    # replay idempotence: re-applying the highest committed batch id is
    # a logged no-op
    stats = t.merge_upsert(ev.limit(5),
                           txn=("stream_partition_ingest",
                                t.last_txn("stream_partition_ingest")))
    assert stats.get("skipped_replay")
    assert t.snapshot().count() == ev.count()


def test_stream_scd2_history_incremental_restart(spark, tmp_path):
    """The SCD2 follower resumes from its checkpoint: a second drain
    after more source commits extends the history exactly — no
    double-applied versions, closes land on the right rows."""
    from pyspark.sql import functions as F

    from walmart_project_etl_spark.sources.txlog import TxTable
    from walmart_project_etl_spark.streaming.jobs import stream_scd2_history

    src = TxTable(spark, str(tmp_path / "src"))
    src.create(spark.createDataFrame([(1, "a"), (2, "b")],
                                     "k long, val string"),
               "k", change_feed=True)
    hist_root = str(tmp_path / "hist")
    h1 = stream_scd2_history(spark, str(tmp_path / "src"), hist_root)
    assert h1.snapshot().where("is_current").count() == 2
    # more source commits, then RESUME the same checkpoint
    src.merge_upsert(spark.createDataFrame([(1, "a2")],
                                           "k long, val string"))  # v1
    src.delete_keys(spark.createDataFrame([(2,)], "k long"))        # v2
    h2 = stream_scd2_history(spark, str(tmp_path / "src"), hist_root)
    rows = {(r["k"], r["val"]): (r["eff_from"], r["eff_to"],
                                 r["is_current"])
            for r in h2.snapshot().collect()}
    assert rows == {(1, "a"): (0, 1, False), (1, "a2"): (1, None, True),
                    (2, "b"): (0, 2, False)}


def test_stream_psi_counts_equal_batch_for_any_split(spark, events, tmp_path):
    """The accumulated PSI bucket counts must equal the plain batch
    bucket counts regardless of micro-batch split (merge-add is
    associative): run at 1 file/trigger (max batches) and compare."""
    import pyspark.sql.functions as F
    from functools import reduce

    from walmart_project_etl_spark.streaming import stream_psi_bucket_counts

    ref = events.where(F.col("user_id") % 2 == 0).select("value")
    edges = [r for r in ref.agg(*[
        F.expr(f"percentile(value, {i / 10})").alias(f"e{i}")
        for i in range(1, 10)]).collect()[0]]
    got = stream_psi_bucket_counts(
        spark, events_dir(spark, SF_DIR), edges,
        str(tmp_path / "wh"), user_parity=1, max_files_per_trigger=1)
    bucket = reduce(
        lambda acc, e: acc + F.when(F.col("value") >= F.lit(float(e)), 1)
        .otherwise(0), edges, F.lit(0))
    want = (events.where(F.col("user_id") % 2 == 1)
            .select(bucket.alias("b"))
            .groupBy("b").agg(F.count(F.lit(1)).alias("c")))
    assert _rows(got, ["b", "c"]) == _rows(want, ["b", "c"])


def test_stream_value_counts_equal_batch_for_any_split(spark, events,
                                                       tmp_path):
    """The accumulated per-distinct-value counts (the exact-KS ECDF
    statistic) must equal the plain batch counts regardless of
    micro-batch split — run at 1 file/trigger and compare."""
    import pyspark.sql.functions as F

    from walmart_project_etl_spark.streaming import stream_value_counts

    got = stream_value_counts(
        spark, events_dir(spark, SF_DIR), str(tmp_path / "wh"),
        user_parity=1, max_files_per_trigger=1)
    want = (events.where(F.col("user_id") % 2 == 1)
            .where(F.col("value").isNotNull())
            .groupBy(F.col("value").alias("x"))
            .agg(F.count(F.lit(1)).alias("c")))
    assert _rows(got, ["x", "c"]) == _rows(want, ["x", "c"])


def test_stream_psi_counts_replay_idempotent(spark, events, tmp_path):
    """Kill-and-restart replay: delete the checkpoint's LAST commit
    marker (simulating a crash after the sink write but before the
    checkpoint commit) and restart — foreachBatch re-runs that batch
    under the same batch_id, and the counts must still equal the batch
    oracle (a read-add-replace sink would double-add it)."""
    import os
    import time
    import pyspark.sql.functions as F
    from functools import reduce

    from walmart_project_etl_spark.streaming import stream_psi_bucket_counts

    ref = events.where(F.col("user_id") % 2 == 0).select("value")
    edges = [r for r in ref.agg(*[
        F.expr(f"percentile(value, {i / 10})").alias(f"e{i}")
        for i in range(1, 10)]).collect()[0]]
    ckpt = str(tmp_path / "ckpt")
    src = events_dir(spark, SF_DIR)
    first = stream_psi_bucket_counts(
        spark, src, edges, str(tmp_path / "wh"), user_parity=1,
        max_files_per_trigger=1, checkpoint_dir=ckpt)
    first_rows = _rows(first, ["b", "c"])
    commits = sorted(int(f) for f in os.listdir(os.path.join(
        ckpt, "commits")) if not f.startswith("."))
    assert len(commits) >= 2, "need multiple micro-batches to replay one"
    deadline = time.time() + 30
    while spark.streams.active and time.time() < deadline:
        time.sleep(0.2)  # first run must fully deregister its checkpoint
    os.remove(os.path.join(ckpt, "commits", str(commits[-1])))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar blocks rewrite
        os.remove(crc)
    replayed = stream_psi_bucket_counts(
        spark, src, edges, str(tmp_path / "wh"), user_parity=1,
        max_files_per_trigger=1, checkpoint_dir=ckpt)
    assert _rows(replayed, ["b", "c"]) == first_rows


def test_stream_category_counts_equal_batch_for_any_split(spark, events,
                                                          tmp_path):
    """The accumulated per-category counts (the chi-square 2×k
    contingency statistic's streaming side) must equal the plain batch
    counts regardless of micro-batch split — run at 1 file/trigger and
    compare. NULL categories excluded (missingness convention)."""
    import pyspark.sql.functions as F

    from walmart_project_etl_spark.streaming import stream_category_counts

    got = stream_category_counts(
        spark, events_dir(spark, SF_DIR), str(tmp_path / "wh"),
        user_parity=1, max_files_per_trigger=1)
    want = (events.where(F.col("user_id") % 2 == 1)
            .where(F.col("event_type").isNotNull())
            .groupBy(F.col("event_type").alias("b"))
            .agg(F.count(F.lit(1)).alias("c")))
    assert _rows(got, ["b", "c"]) == _rows(want, ["b", "c"])


def test_stream_category_counts_replay_idempotent(spark, events, tmp_path):
    """Kill-and-restart replay for the chi-square twin's sink: delete
    the checkpoint's LAST commit marker (crash after the sink write,
    before the checkpoint commit) and restart — the replayed batch
    must overwrite its own delta partition, not double-add."""
    import os
    import time
    import pyspark.sql.functions as F

    from walmart_project_etl_spark.streaming import stream_category_counts

    ckpt = str(tmp_path / "ckpt")
    src = events_dir(spark, SF_DIR)
    first = stream_category_counts(
        spark, src, str(tmp_path / "wh"), user_parity=1,
        max_files_per_trigger=1, checkpoint_dir=ckpt)
    first_rows = _rows(first, ["b", "c"])
    commits = sorted(int(f) for f in os.listdir(os.path.join(
        ckpt, "commits")) if not f.startswith("."))
    assert len(commits) >= 2, "need multiple micro-batches to replay one"
    deadline = time.time() + 30
    while spark.streams.active and time.time() < deadline:
        time.sleep(0.2)
    os.remove(os.path.join(ckpt, "commits", str(commits[-1])))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    replayed = stream_category_counts(
        spark, src, str(tmp_path / "wh"), user_parity=1,
        max_files_per_trigger=1, checkpoint_dir=ckpt)
    assert _rows(replayed, ["b", "c"]) == first_rows
    want = (events.where(F.col("user_id") % 2 == 1)
            .where(F.col("event_type").isNotNull())
            .groupBy(F.col("event_type").alias("b"))
            .agg(F.count(F.lit(1)).alias("c")))
    assert first_rows == _rows(want, ["b", "c"])


def test_stream_drift_statistics_equal_batch_operators(spark, events,
                                                       tmp_path):
    """The three streamed drift statistics (chi-square over category
    counts, MWU and KS over the shared value-count sink) must equal
    the BATCH operators on the drained backlog — the
    streaming-vs-batch contract for the completed drift-monitor trio."""
    import pyspark.sql.functions as F

    from walmart_project_etl_spark.operators.cleaning import (
        _chisq_from_counts, _mwu_from_value_counts, chisq_drift,
        mwu_drift)
    from walmart_project_etl_spark.streaming import (
        stream_category_counts, stream_value_counts)

    ref = events.where(F.col("user_id") % 2 == 0)
    cur = events.where(F.col("user_id") % 2 == 1)

    # chi-square over the streamed category counts
    cur_cat = stream_category_counts(
        spark, events_dir(spark, SF_DIR), str(tmp_path / "wh1"),
        user_parity=1, max_files_per_trigger=2)
    ref_cat = (ref.where(F.col("event_type").isNotNull())
               .groupBy(F.col("event_type").alias("__b"))
               .agg(F.count(F.lit(1)).alias("__cr")))
    cnt = (ref_cat.join(cur_cat.select(F.col("b").alias("__b"),
                                       F.col("c").alias("__cc")),
                        "__b", "full")
           .select(F.lit("event_type").alias("__f"), "__b",
                   F.coalesce("__cr", F.lit(0)).alias("__cr"),
                   F.coalesce("__cc", F.lit(0)).alias("__cc")))
    got = _chisq_from_counts(cnt).collect()[0]
    want = chisq_drift(ref.select("event_type"), cur.select("event_type"),
                       ["event_type"]).collect()[0]
    assert (got["chisq"], got["dof"], got["n_ref"], got["n_cur"]) == \
        (want["chisq"], want["dof"], want["n_ref"], want["n_cur"])

    # MWU over the streamed value counts (the KS twin's sink, reused)
    cur_val = stream_value_counts(
        spark, events_dir(spark, SF_DIR), str(tmp_path / "wh2"),
        user_parity=1, max_files_per_trigger=2)
    ref_val = (ref.where(F.col("value").isNotNull())
               .groupBy(F.col("value").alias("__x"))
               .agg(F.count(F.lit(1)).alias("__cr")))
    per_val = (ref_val.join(cur_val.select(F.col("x").alias("__x"),
                                           F.col("c").alias("__cc")),
                            "__x", "full")
               .select("__x",
                       F.coalesce("__cr", F.lit(0)).alias("__cr"),
                       F.coalesce("__cc", F.lit(0)).alias("__cc")))
    edges = ref.where(F.col("value").isNotNull()).agg(*[
        F.expr(f"percentile(value, {i / 32})").alias(f"__e{i}")
        for i in range(1, 32)])
    got = _mwu_from_value_counts(per_val, edges, 31, "value").collect()[0]
    want = mwu_drift(ref.select("value"), cur.select("value"),
                     ["value"]).collect()[0]
    assert (got["u"], got["auc"], got["n_ref"], got["n_cur"]) == \
        (want["u"], want["auc"], want["n_ref"], want["n_cur"])


def test_stream_embedding_norm_counts_equal_batch(spark, tmp_path):
    """The accumulated per-distinct-norm counts (the embedding-norm
    KS monitor's streaming side) must equal the plain batch norm
    counts regardless of micro-batch split, and the composed statistic
    must equal the batch ks_drift over the same norms."""
    import pyspark.sql.functions as F

    from walmart_project_etl_spark.operators.cleaning import (
        _ks_from_value_counts, ks_drift)
    from walmart_project_etl_spark.operators.similarity import (_as_double,
                                                                dot)
    from walmart_project_etl_spark.queries.util import embeddings_dir
    from walmart_project_etl_spark.streaming import \
        stream_embedding_norm_counts

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    v = _as_double(F.col("embedding"))
    norm = F.sqrt(dot(v, v))

    got = stream_embedding_norm_counts(
        spark, embeddings_dir(spark, SF_DIR), str(tmp_path / "wh"),
        vec_parity=1, max_files_per_trigger=1)
    want = (emb.where(F.col("vec_id") % 2 == 1)
            .select(norm.alias("x")).where(F.col("x").isNotNull())
            .groupBy("x").agg(F.count(F.lit(1)).alias("c")))
    assert _rows(got, ["x", "c"]) == _rows(want, ["x", "c"])

    # composed statistic == batch ks_drift on the same norm columns
    ref = emb.where(F.col("vec_id") % 2 == 0) \
             .select(norm.alias("embedding_norm"))
    cur = emb.where(F.col("vec_id") % 2 == 1) \
             .select(norm.alias("embedding_norm"))
    ref_cnt = (ref.groupBy(F.col("embedding_norm").alias("__x"))
               .agg(F.count(F.lit(1)).alias("__cr")))
    per_val = (ref_cnt.join(got.select(F.col("x").alias("__x"),
                                       F.col("c").alias("__cc")),
                            "__x", "full")
               .select("__x",
                       F.coalesce("__cr", F.lit(0)).alias("__cr"),
                       F.coalesce("__cc", F.lit(0)).alias("__cc")))
    edges = ref.agg(*[
        F.expr(f"percentile(embedding_norm, {i / 32})").alias(f"__e{i}")
        for i in range(1, 32)])
    got_stat = _ks_from_value_counts(per_val, edges, 31,
                                     "embedding_norm").collect()[0]
    want_stat = ks_drift(ref, cur, ["embedding_norm"]).collect()[0]
    assert (got_stat["ks"], got_stat["n_ref"], got_stat["n_cur"]) == \
        (want_stat["ks"], want_stat["n_ref"], want_stat["n_cur"])


def test_stream_feature_value_counts_equal_batch_and_replay(spark, events,
                                                            tmp_path):
    """The composite-key (feature, value) count sink: accumulated
    counts equal the batch melt for any micro-batch split, and a
    kill-and-restart replay (last commit marker deleted) must not
    double-add — the melted monitor's streaming contract."""
    import os
    import time
    import pyspark.sql.functions as F

    from walmart_project_etl_spark.streaming import \
        stream_feature_value_counts

    features = {"value": F.col("value"), "hr": F.hour("ts")}
    ckpt = str(tmp_path / "ckpt")
    src = events_dir(spark, SF_DIR)
    got = stream_feature_value_counts(
        spark, src, str(tmp_path / "wh"), features=features,
        user_parity=1, max_files_per_trigger=1, checkpoint_dir=ckpt)
    pairs = F.array(
        F.struct(F.lit("value").alias("f"),
                 F.col("value").cast("double").alias("x")),
        F.struct(F.lit("hr").alias("f"),
                 F.hour("ts").cast("double").alias("x")))
    want = (events.where(F.col("user_id") % 2 == 1)
            .select(F.explode(pairs).alias("s"))
            .select("s.f", "s.x").where(F.col("x").isNotNull())
            .groupBy("f", "x").agg(F.count(F.lit(1)).alias("c")))
    first_rows = _rows(got, ["f", "x", "c"])
    assert first_rows == _rows(want, ["f", "x", "c"])

    commits = sorted(int(f) for f in os.listdir(os.path.join(
        ckpt, "commits")) if not f.startswith("."))
    assert len(commits) >= 2
    deadline = time.time() + 30
    while spark.streams.active and time.time() < deadline:
        time.sleep(0.2)
    os.remove(os.path.join(ckpt, "commits", str(commits[-1])))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    replayed = stream_feature_value_counts(
        spark, src, str(tmp_path / "wh"), features=features,
        user_parity=1, max_files_per_trigger=1, checkpoint_dir=ckpt)
    assert _rows(replayed, ["f", "x", "c"]) == first_rows
