#!/usr/bin/env python
"""sf1 scale spot-check (VERDICT r4 task 6).

The driver ships sf0.001/0.01/0.1 only, so this tool synthesizes an
sf1-equivalent dataset by replicating the sf0.1 FACT tables ``factor``×
(default 10) with remapped keys, leaving the dimensions fixed — the shape
a 10× scale-up actually has (facts grow, dims don't):

- ``orders``/``lineitem``: orderkeys offset by ``rep * (max_orderkey+1)``
  so the orders↔lineitem FK survives and fact joins see 10× distinct keys.
- ``events``: user_id/event_id offset per replica → 10× users with the
  SAME per-user session structure (per-key state constant, key count
  scales — the scaling a sessionization op must survive).
- ``documents``: doc_id offset; a per-replica token is appended to the
  text so MinHash/SimHash/shingle workloads see 10× distinct documents
  rather than 10-deep exact-duplicate clusters (which would quadratically
  inflate candidate pairs and measure a different workload).
- ``embeddings``: vec_id offset; the vector is rotated by ``rep``
  positions — norm-preserving, distribution-preserving, identity-breaking.

Then it times a query list (default: the 5 most expensive bench entries)
at sf0.1 and at the scaled dir, and prints per-query ratios. A healthy
linear-scaling operator lands near ``factor``×; anything superlinear is a
scale cliff the sf0.1 bench cannot see.

Usage: python tools/scale_check.py [--factor 10] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_lsh_ann_topk",
    "j08_multiway_fact_join",
    "text_fingerprint",
]

COPY_TABLES = ("region", "nation", "customer", "supplier", "part")


def build_scaled(spark, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_rep")

    def read(name):
        return spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))

    def write(df, name):
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet"))

    for name in COPY_TABLES:
        write(read(name), name)

    orders = read("orders")
    stride_o = orders.agg(F.max("o_orderkey")).first()[0] + 1
    write(orders.select("*", rep).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("_rep") * stride_o)
        .drop("_rep"), "orders")
    write(read("lineitem").select("*", rep).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("_rep") * stride_o)
        .drop("_rep"), "lineitem")

    ev = read("events")
    stride_u = ev.agg(F.max("user_id")).first()[0] + 1
    stride_e = ev.agg(F.max("event_id")).first()[0] + 1
    write(ev.select("*", rep)
          .withColumn("user_id", F.col("user_id") + F.col("_rep") * stride_u)
          .withColumn("event_id", F.col("event_id") + F.col("_rep") * stride_e)
          .drop("_rep"), "events")

    docs = read("documents")
    stride_d = docs.agg(F.max("doc_id")).first()[0] + 1
    write(docs.select("*", rep)
          .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * stride_d)
          .withColumn("text", F.concat(F.col("text"), F.lit(" qz"),
                                       F.col("_rep").cast("string")))
          .withColumn("n_chars", F.length("text"))
          .drop("_rep"), "documents")

    emb = read("embeddings")
    stride_v = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = F.size("embedding")
    rotated = F.concat(
        F.slice(F.col("embedding"), F.col("_rep") + 1, dim - F.col("_rep")),
        F.slice(F.col("embedding"), 1, F.col("_rep")))
    write(emb.select("*", rep)
          .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * stride_v)
          .withColumn("embedding", rotated.cast("array<float>"))
          .drop("_rep"), "embeddings")


def time_queries(spark, reg, names, sf_dir):
    out = {}
    for name in names:
        fn, _ = reg[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
        print(f"# {os.path.basename(sf_dir)} {name}: {out[name]:.2f}s",
              file=sys.stderr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--out", default="/root/repo/.scratch/sf1")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    from walmart_project_etl_spark.queries import registry
    from walmart_project_etl_spark.session import get_spark
    spark = get_spark("wpe-scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    if not os.path.exists(os.path.join(args.out, "lineitem.parquet")):
        print(f"# building {args.out} at {args.factor}x ...", file=sys.stderr)
        build_scaled(spark, args.out, args.factor)

    # warmup (JVM/codegen) + per-process events fixture outside timing
    reg["j02_broadcast_key_map_join"][0](spark, SRC) \
        .write.format("noop").mode("overwrite").save()
    from walmart_project_etl_spark.queries.util import events_t
    events_t(spark, SRC)
    base = time_queries(spark, reg, names, SRC)
    events_t(spark, args.out)
    big = time_queries(spark, reg, names, args.out)

    rows = {n: {"sf0.1_sec": base[n], "scaled_sec": big[n],
                "ratio": round(big[n] / max(base[n], 1e-9), 2)}
            for n in names}
    print(json.dumps({"factor": args.factor, "queries": rows}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
