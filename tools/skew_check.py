#!/usr/bin/env python
"""Skewed-key scale evidence (VERDICT r5 task 3).

docs/SCALE.md's shuffle inventory claims AQE-skew safety, but the driver
fixtures' keys are uniform by construction — no AQE skew intervention has
ever fired in the sf0.1/sf1 harnesses. This tool builds 10×-replicated
fixtures in UNIFORM and ZIPF-HEAD variants (one hot key owns ~20% of the
rows — the constant/default-value skew shape real telemetry has), then
measures the skew-exposed operators uniform-vs-skewed and records which
plans AQE rescues at runtime vs where the explicit ``operators/skew.py``
salting is required:

- ``events_sessionization`` — window keyed on user_id. A skewed WINDOW
  partition cannot be split by AQE (a window needs its whole key in one
  task); the hot key serializes ~20% of the fact through one core.
- W1 dedup-latest (``latest_per_key`` on orders.o_custkey, reference
  ``etl_target_loader.py:118-124``) — same window exposure; the skew-safe
  replacement is ``skew.salted_latest`` (two-phase max-struct),
  result-identical (asserted here and pinned in tests/test_operators.py).
- lineitem ⋈ orders with a hot l_orderkey — sort-merge-join skew, the one
  case AQE DOES rescue (skewed-partition splitting); compared with and
  without the intervention and against ``skew.salted_join`` on the same
  input (result equality asserted). Broadcast is disabled here: at 100 TB
  the probe side of this join does not fit in an executor, which is
  exactly when join skew bites.

AQE's skew thresholds are sized for production partitions
(skewedPartitionThresholdInBytes defaults to 256 MB); the replicated
local fixture's hot partition is ~10² smaller, so the experiment lowers
the thresholds proportionally to exercise the same code path the
production defaults trigger at real scale.

Prints one JSON line per experiment plus a markdown table for SCALE.md.

Usage: python tools/skew_check.py [--hot-frac 0.2] [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_fixtures(spark, out_dir: str, hot_frac: float, factor: int) -> None:
    """``factor``×-replicated events/orders/lineitem, each written twice:
    uniform (keys offset per replica — cardinality scales, no hot key) and
    skewed (same, then a deterministic ~hot_frac of rows remapped onto ONE
    key). Uniform and skewed variants have identical row counts and byte
    sizes, so their runtime difference isolates the key distribution."""
    from pyspark.sql import functions as F

    from walmart_project_etl_spark.queries.util import events_t

    mod = round(1.0 / hot_frac)
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_rep")

    def write(df, name):
        # 32 files ⇒ the downstream scan (= the shuffle-WRITE stage) has 32
        # map tasks. This matters for the experiment's validity: AQE's skew
        # split subdivides a reduce partition at MAP-OUTPUT granularity, so
        # a single-file fixture (one mapper) makes the hot partition
        # unsplittable and silently disables the intervention being tested
        # (found the hard way; recorded in docs/SCALE.md).
        df.repartition(32).write.mode("overwrite") \
          .parquet(os.path.join(out_dir, name))

    ev = events_t(spark, SRC)  # ts normalized to session-TZ TIMESTAMP
    stride_u = ev.agg(F.max("user_id")).first()[0] + 1
    stride_e = ev.agg(F.max("event_id")).first()[0] + 1
    ev10 = (ev.select("*", rep)
            .withColumn("user_id", F.col("user_id") + F.col("_rep") * stride_u)
            .withColumn("event_id", F.col("event_id") + F.col("_rep") * stride_e)
            .drop("_rep"))
    write(ev10, "events_uniform")
    write(ev10.withColumn("user_id",
                          F.when(F.col("event_id") % mod == 0, F.lit(0))
                           .otherwise(F.col("user_id"))), "events_skewed")

    o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    stride_o = o.agg(F.max("o_orderkey")).first()[0] + 1
    o10 = (o.select("*", rep)
           .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_rep") * stride_o)
           .drop("_rep"))
    write(o10, "orders_uniform")
    write(o10.withColumn("o_custkey",
                         F.when(F.col("o_orderkey") % mod == 0, F.lit(0))
                          .otherwise(F.col("o_custkey"))), "orders_hotcust")

    hot_ok = o.agg(F.min("o_orderkey")).first()[0]
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    li10 = (li.select("*", rep)
            .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_rep") * stride_o)
            .drop("_rep"))
    write(li10, "lineitem_uniform")
    write(li10.withColumn(
        "l_orderkey",
        F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                      F.lit(mod)) == 0,
               F.lit(hot_ok)).otherwise(F.col("l_orderkey"))),
        "lineitem_hot")


def timed(label, fn, results, **extra):
    t0 = time.time()
    out = fn()
    dt = round(time.time() - t0, 3)
    row = {"experiment": label, "sec": dt, **extra}
    results.append(row)
    print(json.dumps(row))
    return out


def run_own_qe(df):
    """Materialize THROUGH THE DATAFRAME'S OWN QueryExecution (a
    ``df.write`` action builds a separate one, whose final adaptive plan
    is invisible from ``df``) so the AQE-final plan is inspectable."""
    df._jdf.queryExecution().toRdd().count()
    return df


def skew_split_fired(df) -> bool:
    """True if the executed (AQE-final) plan applied skew-join splitting.
    Only meaningful after :func:`run_own_qe`."""
    return "skew=true" in df._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot-frac", type=float, default=0.2)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from walmart_project_etl_spark.operators import events as ev_ops
    from walmart_project_etl_spark.operators import skew
    from walmart_project_etl_spark.operators.events import latest_event_per_key
    from walmart_project_etl_spark.session import get_spark

    spark = get_spark("wpe-skew-check")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(tempfile.gettempdir(), "wpe_skewfix")
    build_fixtures(spark, out_dir, args.hot_frac, args.factor)

    results: list[dict] = []
    rd = lambda name: spark.read.parquet(os.path.join(out_dir, name))

    def run(df):
        df.write.format("noop").mode("overwrite").save()
        return df

    # --- window sessionization: uniform vs skewed (AQE cannot help) ----
    for label, name in (("sessionize_uniform", "events_uniform"),
                        ("sessionize_skewed", "events_skewed")):
        timed(label,
              lambda n=name: run(ev_ops.sessionize(rd(n), "user_id", "ts", 30)),
              results)

    # --- W1 dedup-latest: window vs salted two-phase -------------------
    timed("w1_window_uniform",
          lambda: run(latest_event_per_key(rd("orders_uniform"), ["o_custkey"],
                                           "o_orderdate", "o_orderkey")),
          results)
    timed("w1_window_skewed",
          lambda: run(latest_event_per_key(rd("orders_hotcust"), ["o_custkey"],
                                           "o_orderdate", "o_orderkey")),
          results)
    timed("w1_salted_skewed",
          lambda: run(skew.salted_latest(rd("orders_hotcust"), ["o_custkey"],
                                         "o_orderdate", "o_orderkey")),
          results)
    a = latest_event_per_key(rd("orders_hotcust"), ["o_custkey"],
                             "o_orderdate", "o_orderkey")
    b = skew.salted_latest(rd("orders_hotcust"), ["o_custkey"],
                           "o_orderdate", "o_orderkey")
    mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(json.dumps({"experiment": "w1_salted_equals_window",
                      "mismatch_rows": mismatch}))
    assert mismatch == 0, "salted_latest diverged from the window W1"

    # --- SMJ skew join: AQE split on/off vs explicit salting -----------
    o_dim = rd("orders_uniform").select(F.col("o_orderkey").alias("l_orderkey"),
                                        "o_orderpriority")

    def agg_of(j):
        return j.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,6)")), 2)
             .cast("double").alias("revenue"))

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # production defaults (256 MB / skew factor 5) are sized for real
        # partitions; scale them down ~100× so the local fixture's hot
        # partition (tens of MB) exercises the same intervention
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }
    prior = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)

        for label, src in (("join_uniform_smj", "lineitem_uniform"),
                           ("join_skewed_smj_aqe_on", "lineitem_hot")):
            df = timed(label,
                       lambda s=src: run_own_qe(
                           agg_of(rd(s).join(o_dim, "l_orderkey"))),
                       results)
            results[-1]["aqe_skew_split"] = skew_split_fired(df)
            print(json.dumps({"experiment": label,
                              "aqe_skew_split": results[-1]["aqe_skew_split"]}))
        plain_df = df  # skewed, AQE on

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        df = timed("join_skewed_smj_aqe_off",
                   lambda: run_own_qe(
                       agg_of(rd("lineitem_hot").join(o_dim, "l_orderkey"))),
                   results)
        salted_df = timed(
            "join_skewed_salted_aqe_off",
            lambda: run_own_qe(agg_of(skew.salted_join(rd("lineitem_hot"),
                                                       o_dim, "l_orderkey",
                                                       n_salts=8))),
            results)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

        mismatch = plain_df.exceptAll(salted_df).count() + \
            salted_df.exceptAll(plain_df).count()
        print(json.dumps({"experiment": "join_salted_equals_plain",
                          "mismatch_rows": mismatch}))
        assert mismatch == 0, "salted_join diverged from plain join"
    finally:
        for k, v in prior.items():
            spark.conf.set(k, v)

    print("\n| experiment | sec |\n|---|---|")
    for r in results:
        extra = " (AQE skew split fired)" if r.get("aqe_skew_split") else ""
        print(f"| {r['experiment']} | {r['sec']}{extra} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
