"""Custom stateful streaming operator via ``applyInPandasWithState``.

The north-star surface for operators Structured Streaming lacks natively:
arbitrary per-key state updated micro-batch by micro-batch, with Arrow
batches in and out. The example operator keeps per-user running stats
(event count, value sum, last timestamp) — the state-shape any
session/feature accumulator uses.

Scale: state lives in the state store partitioned by the grouping key;
per-batch work is one shuffle on the key plus an Arrow round-trip over
only the keys present in the batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType,
                               TimestampType)

from .jobs import EVENTS_SCHEMA, _read_events_stream

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("sum_value_micros", LongType()),   # exact integer micros
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
    StructField("last_ts", TimestampType()),
])


def _update_user_stats(key, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, sv = state.get if state.exists else (0, 0)
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        # exact integer accumulation (micros) — float sums would drift
        sv += int((pdf["value"] * 1_000_000).round().sum())
        mx = pdf["ts"].max()
        last_ts = mx if last_ts is None else max(last_ts, mx)
    state.update((n, sv))
    yield pd.DataFrame([{"user_id": user_id, "n_events": n,
                         "sum_value": round(sv / 1_000_000, 2),
                         "last_ts": last_ts}])


def stream_user_stats(spark: SparkSession, events_path: str) -> DataFrame:
    """Per-user running stats as a stateful stream; availableNow drains the
    backlog, the memory sink keeps every update — the LAST update per user
    is the final answer (asserted equal to the batch groupBy in tests)."""
    import uuid

    ev = _read_events_stream(spark, events_path)
    updated = (ev.groupBy("user_id")
               .applyInPandasWithState(
                   _update_user_stats,
                   outputStructType=OUTPUT_SCHEMA,
                   stateStructType=STATE_SCHEMA,
                   outputMode="update",
                   timeoutConf=GroupStateTimeout.NoTimeout))
    name = f"stream_user_stats_{uuid.uuid4().hex[:8]}"
    q = (updated.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table(name)
    # last update per user (monotone n_events makes max the latest)
    from pyspark.sql.window import Window
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))
