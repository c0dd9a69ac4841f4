"""Watermark late-data semantics: an event older than the watermark must be
DROPPED from its (already finalized) window, while the batch twin counts it.

Micro-batch boundaries are forced with maxFilesPerTrigger=1. Spark's
watermark becomes operative one micro-batch after the data that advanced
it (it is computed at batch end), so the scenario needs three files:

1. base events in the 10:00 window + a 14:00 event that advances the
   watermark (2 h delay) to 12:00 — past the window's 11:00 end;
2. a filler event (the 12:00 watermark becomes operative, the 10:00
   window is finalized and emitted with the base count);
3. a LATE 10:15 event — now behind the operative watermark → dropped.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from walmart_project_etl_spark.streaming.jobs import EVENTS_SCHEMA


def _write_events_file(path: str, rows: list[tuple[int, str, int, str, float]]):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
    # microsecond precision — pandas' default ns timestamps are unreadable
    # by Spark's parquet reader
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf["props"] = "{}"
    pdf.to_parquet(path, index=False)


@pytest.fixture(scope="module")
def late_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wpe_late_events"))
    _write_events_file(os.path.join(d, "part-000.parquet"), [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0),
        (2, "2024-01-01 10:30:00", 1, "view", 1.0),
        (3, "2024-01-01 14:00:00", 1, "view", 1.0),   # watermark → 12:00
    ])
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write_events_file(os.path.join(d, "part-001.parquet"), [
        (5, "2024-01-01 14:30:00", 1, "view", 1.0),   # filler batch
    ])
    time.sleep(1.1)
    _write_events_file(os.path.join(d, "part-002.parquet"), [
        (4, "2024-01-01 10:15:00", 1, "view", 1.0),   # LATE
    ])
    return d


def test_late_event_dropped_by_watermark(spark, late_dir):
    ev = (spark.readStream.schema(EVENTS_SCHEMA)
          .option("maxFilesPerTrigger", 1)
          .format("parquet").load(late_dir)
          .withWatermark("ts", "2 hours"))
    agg = (ev.groupBy(F.window("ts", "1 hour").alias("win"))
           .agg(F.count(F.lit(1)).alias("n")))
    name = "wpe_watermark_test"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append")            # append emits only finalized windows
         .trigger(availableNow=True).start())
    q.awaitTermination()
    finalized = {str(r["win"]["start"]): r["n"]
                 for r in spark.table(name).collect()}
    # the 10:00 window finalized with TWO events; the late 10:15 event
    # arrived behind the operative watermark → dropped
    assert finalized["2024-01-01 10:00:00"] == 2

    # batch twin counts the late event — 3 in the 10:00 window
    batch = (spark.read.parquet(late_dir)
             .groupBy(F.window("ts", "1 hour").alias("win"))
             .agg(F.count(F.lit(1)).alias("n")))
    batch_counts = {str(r["win"]["start"]): r["n"] for r in batch.collect()}
    assert batch_counts["2024-01-01 10:00:00"] == 3
