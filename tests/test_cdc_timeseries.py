"""Unit tests for the r5 CDC / time-series / line-dedup operators on
hand-built fixtures with independently computed expectations."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from walmart_project_etl_spark.operators import cdc, dedup, timeseries


# ------------------------------------------------------------ snapshot_diff

def _snapshots(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k int, s string, v double")
    new = spark.createDataFrame(
        [(2, "b", 20.0),          # unchanged
         (3, "c2", 30.0),         # s changed
         (4, None, 41.0),         # v changed, s null on both sides
         (5, "e", 50.0)],         # insert
        "k int, s string, v double")
    return old, new


def test_snapshot_diff_ops(spark):
    old, new = _snapshots(spark)
    got = {r["k"]: (r["op"], r["changed_cols"])
           for r in cdc.snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: ("delete", []),
        3: ("update", ["s"]),
        4: ("update", ["v"]),
        5: ("insert", []),
    }  # k=2 unchanged -> absent


def test_snapshot_diff_null_to_value_is_update(spark):
    old = spark.createDataFrame([(1, None)], "k int, s string")
    new = spark.createDataFrame([(1, "x")], "k int, s string")
    [r] = cdc.snapshot_diff(old, new, ["k"]).collect()
    assert (r["op"], r["changed_cols"]) == ("update", ["s"])


def test_apply_diff_reaches_new_state(spark):
    old, new = _snapshots(spark)
    diff = cdc.snapshot_diff(old, new, ["k"])
    applied = cdc.apply_diff(old, diff, new, ["k"])
    assert sorted(map(tuple, applied.collect())) == \
        sorted(map(tuple, new.collect()))


# --------------------------------------------------------- gap_fill_forward

def _d(s):
    return datetime.date.fromisoformat(s)


def test_gap_fill_densifies_and_carries_forward(spark):
    df = spark.createDataFrame(
        [("g", _d("2024-01-01"), 1), ("g", _d("2024-01-04"), 7),
         ("h", _d("2024-03-10"), 5)],
        "g string, d date, v int")
    out = timeseries.gap_fill_forward(df, ["g"], "d", ["v"])
    rows = {(r["g"], str(r["d"])): (r["v_filled"], r["is_observed"])
            for r in out.collect()}
    assert rows == {
        ("g", "2024-01-01"): (1, True),
        ("g", "2024-01-02"): (1, False),
        ("g", "2024-01-03"): (1, False),
        ("g", "2024-01-04"): (7, True),
        ("h", "2024-03-10"): (5, True),   # singleton group: span of one day
    }


def test_gap_fill_is_observed_counts(spark):
    df = spark.createDataFrame(
        [("g", _d("2024-01-01"), 1), ("g", _d("2024-01-10"), 2)],
        "g string, d date, v int")
    out = timeseries.gap_fill_forward(df, ["g"], "d", ["v"]).collect()
    assert len(out) == 10
    assert sum(r["is_observed"] for r in out) == 2


# -------------------------------------------------------------- dedup_lines

def _line_corpus(spark):
    return spark.createDataFrame(
        [(1, "HEAD\nalpha beta\nFOOT"),
         (2, "HEAD\ngamma delta\nFOOT"),
         (3, "unique only")],
        "doc_id int, text string")


def test_dedup_lines_drops_shared_lines(spark):
    out = {r["doc_id"]: r for r in
           dedup.dedup_lines(_line_corpus(spark), "doc_id", "text").collect()}
    assert out[1]["text_clean"] == "alpha beta"
    assert out[2]["text_clean"] == "gamma delta"
    assert out[3]["text_clean"] == "unique only"
    assert out[1]["n_lines"] == 3 and out[1]["n_dropped"] == 2
    assert out[3]["n_lines"] == 1 and out[3]["n_dropped"] == 0


def test_dedup_lines_keep_first_retains_one_copy(spark):
    out = {r["doc_id"]: r["text_clean"] for r in
           dedup.dedup_lines(_line_corpus(spark), "doc_id", "text",
                             keep_first=True).collect()}
    # doc 1 is the first occurrence of both boilerplate lines
    assert out[1] == "HEAD\nalpha beta\nFOOT"
    assert out[2] == "gamma delta"


def test_dedup_lines_within_doc_repeat_not_dropped(spark):
    # a line repeated WITHIN one doc only: doc-frequency 1, must survive
    df = spark.createDataFrame([(1, "x\nx\ny")], "doc_id int, text string")
    [r] = dedup.dedup_lines(df, "doc_id", "text").collect()
    assert r["text_clean"] == "x\nx\ny"
    assert r["n_dropped"] == 0


# ---------------------------------------------------------------- compaction

def test_compact_merges_small_files(spark, tmp_path):
    from walmart_project_etl_spark.sources.catalog import Warehouse
    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(0, 10000).selectExpr("id", "id % 7 AS k")
    wh.write("ods", "t", df.repartition(64))  # 64 tiny files
    import glob
    assert len(glob.glob(f"{tmp_path}/ods/t/*.parquet")) == 64
    n = wh.compact("ods", "t", target_file_bytes=10 * 1024 * 1024)
    files = glob.glob(f"{tmp_path}/ods/t/*.parquet")
    assert len(files) == n == 1
    assert wh.read("ods", "t").count() == 10000


def test_compact_range_clusters(spark, tmp_path):
    from walmart_project_etl_spark.sources.catalog import Warehouse
    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(0, 50000).selectExpr("id", "cast(id % 1000 as int) AS k")
    wh.write("ods", "t", df.repartition(32))
    wh.compact("ods", "t", target_file_bytes=100 * 1024, sort_cols=["k"])
    # range clustering = per-file [min(k), max(k)] spans must not overlap
    # (that's exactly what lets parquet footer stats skip whole files)
    got = (wh.read("ods", "t")
           .withColumn("f", F.input_file_name())
           .groupBy("f")
           .agg(F.min("k").alias("lo"), F.max("k").alias("hi")))
    spans = sorted((r["lo"], r["hi"]) for r in got.collect())
    assert len(spans) > 1  # target size forces a multi-file layout
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
    assert wh.read("ods", "t").count() == 50000


# ---------------------------------------------------- connected components

def test_connected_components_chain_and_clique(spark):
    from walmart_project_etl_spark.operators import graph
    # one 40-vertex chain (worst-case diameter) + one 3-clique + isolated
    # pair; labels must be the min reachable id in every case
    chain = [(i, i + 1) for i in range(100, 139)]
    clique = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(chain + clique + [(7, 8)],
                                  "src long, dst long")
    out = {r["id"]: r["component"]
           for r in graph.connected_components(edges).collect()}
    assert all(out[i] == 100 for i in range(100, 140))
    assert out[1] == out[2] == out[3] == 1
    assert out[7] == out[8] == 7


def test_connected_components_converges_fast_on_chain(spark):
    """Pointer jumping must close a 60-vertex chain well inside the
    25-round cap (plain propagation would need ~60 rounds and raise)."""
    from walmart_project_etl_spark.operators import graph
    edges = spark.createDataFrame([(i, i + 1) for i in range(60)],
                                  "src long, dst long")
    out = {r["id"]: r["component"]
           for r in graph.connected_components(edges, max_iter=12).collect()}
    assert set(out.values()) == {0} and len(out) == 61


# ------------------------------------------------------- ingest quarantine

def test_jsonl_quarantine_splits_bad_lines(spark, tmp_path):
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from walmart_project_etl_spark.sources.ingest import read_jsonl_quarantine
    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1, "s": "a"}\n'
                 'not json at all\n'
                 '{"id": 2, "s": "b"}\n'
                 '{"id": 3, "s": "c"\n')   # truncated object
    schema = StructType([StructField("id", LongType()),
                         StructField("s", StringType())])
    good, bad = read_jsonl_quarantine(spark, str(p), schema)
    assert sorted((r["id"], r["s"]) for r in good.collect()) == \
        [(1, "a"), (2, "b")]
    raws = sorted(r["raw"] for r in bad.collect())
    assert len(raws) == 2
    assert any("not json" in r for r in raws)
    assert any('"id": 3' in r for r in raws)
    assert good.columns == ["id", "s"]
    # caller's schema object must not have been mutated
    assert [f.name for f in schema.fields] == ["id", "s"]


# ------------------------------------------------------------------ vacuum

def test_vacuum_staged_removes_only_orphans(spark, tmp_path):
    from walmart_project_etl_spark.sources.catalog import Warehouse
    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(0, 100).selectExpr("id")
    wh.write("tgt", "dim", df)                     # committed table
    wh.stage_new("tgt", "dim2", df)                # orphaned phase-1 dir
    removed = wh.vacuum_staged("tgt")
    assert removed == ["dim2__new"]
    assert wh.read("tgt", "dim").count() == 100    # live table untouched
    # idempotent + tolerates a layer with nothing staged
    assert wh.vacuum_staged("tgt") == []
    assert wh.vacuum_staged("ods") == []


def test_read_evolved_merges_schema_versions(spark, tmp_path):
    from walmart_project_etl_spark.sources.catalog import Warehouse
    wh = Warehouse(spark, str(tmp_path))
    v1 = spark.range(0, 5).selectExpr("id", "id * 2 AS a")
    wh.write("ods", "t", v1)
    v2 = spark.range(5, 8).selectExpr("id", "id * 2 AS a", "'x' AS b")
    wh.append("ods", "t", v2)
    out = wh.read_evolved("ods", "t")
    assert sorted(out.columns) == ["a", "b", "id"]
    rows = {r["id"]: (r["a"], r["b"]) for r in out.collect()}
    assert len(rows) == 8
    assert rows[0] == (0, None)      # old files: new column is NULL
    assert rows[7] == (14, "x")


# ------------------------------------------------------------ empty inputs

def test_operators_tolerate_empty_input(spark):
    """Every structural operator must return an empty (not throw) on an
    empty frame — the first morning a new pipeline runs, its delta IS
    empty."""
    from walmart_project_etl_spark.operators import (cdc, cleaning, dedup,
                                                     incremental, sampling,
                                                     timeseries)
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_kv = spark.createDataFrame([], "k int, s string, v double")
    empty_ts = spark.createDataFrame([], "g string, d date, v int")
    empty_li = spark.createDataFrame([], "l_returnflag string, x double")

    assert dedup.dedup_lines(empty_docs, "doc_id", "text").count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs, "doc_id", "text",
                                     k=3, unit="word").count() == 0
    assert cdc.snapshot_diff(empty_kv, empty_kv, ["k"]).count() == 0
    assert timeseries.gap_fill_forward(empty_ts, ["g"], "d", ["v"]).count() == 0
    assert sampling.assign_shards(empty_docs, "doc_id", 8).count() == 0
    assert cleaning.mad_outliers(empty_li, "x",
                                 group_cols=["l_returnflag"]).count() == 0
    state = incremental.agg_state(empty_li, ["l_returnflag"], "x")
    merged = incremental.merge_agg_state(state, state, ["l_returnflag"])
    assert incremental.finalize(merged, ["l_returnflag"]).count() == 0


def test_ewma_matches_pandas_recursion(spark):
    import pandas as pd
    from walmart_project_etl_spark.operators.timeseries import ewma
    xs = [10.0, 12.0, 8.0, 20.0, 15.0]
    df = spark.createDataFrame(
        [("u", i, x) for i, x in enumerate(xs)], "k string, t int, x double")
    out = ewma(df, "k", ["t"], "x", alpha=0.3).collect()[0]
    expect = pd.Series(xs).ewm(alpha=0.3, adjust=False).mean().iloc[-1]
    assert out["n_points"] == 5
    assert abs(out["ewma"] - expect) < 1e-6


def test_ewma_segmented_equals_flat_fold(spark):
    """segment_days block-chaining (VERDICT r12 task 5): the per-block
    transfer fold must reproduce the flat per-entity fold — same
    round-6 value, same n_points — on series spanning many blocks,
    including entities whose whole series fits one block and an
    entity with a single point."""
    import datetime

    from walmart_project_etl_spark.operators.timeseries import ewma
    base = datetime.datetime(2024, 1, 1)
    rows = []
    # entity A: 40 daily points -> 6 blocks at segment_days=7
    for i in range(40):
        rows.append(("A", base + datetime.timedelta(days=i),
                     10.0 + (i * 7919 % 23) * 0.37))
    # entity B: 3 points inside one block
    for i in range(3):
        rows.append(("B", base + datetime.timedelta(days=i), 5.0 + i))
    # entity C: single point (init-only recursion)
    rows.append(("C", base, 42.5))
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    flat = {r["k"]: (r["n_points"], r["ewma"])
            for r in ewma(df, "k", ["ts"], "x", alpha=0.2).collect()}
    seg = {r["k"]: (r["n_points"], r["ewma"])
           for r in ewma(df, "k", ["ts"], "x", alpha=0.2,
                         segment_days=7).collect()}
    assert seg == flat


def test_holt_segmented_equals_flat_fold(spark):
    """Block-chained Holt (affine 2x2 transfer per block) must match the
    flat per-entity fold at round-6 — multi-block entity, one-block
    entity, single-point entity."""
    import datetime

    from walmart_project_etl_spark.operators.timeseries import (
        holt_linear, holt_linear_segmented)
    base = datetime.datetime(2024, 1, 1)
    rows = [("A", base + datetime.timedelta(days=i),
             10.0 + (i * 7919 % 23) * 0.37 + i * 0.05) for i in range(90)]
    rows += [("B", base + datetime.timedelta(days=i), 5.0 + i)
             for i in range(3)]
    rows.append(("C", base, 42.5))
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    flat = {r["k"]: tuple(r)[1:]
            for r in holt_linear(df, "k", ["ts"], "x").collect()}
    seg = {r["k"]: tuple(r)[1:]
           for r in holt_linear_segmented(df, "k", ["ts"], "x",
                                          segment_days=30).collect()}
    assert seg == flat


def test_holt_winters_matches_reference_recursion(spark):
    import datetime
    import math

    from walmart_project_etl_spark.operators.timeseries import holt_winters
    base = datetime.datetime(2024, 1, 1)
    xs = [10.0, 12.0, 9.0, 14.0, 11.0, 13.0, 8.0, 10.5, 12.5, 9.5, 14.5]
    df = spark.createDataFrame(
        [("u", base + datetime.timedelta(days=i), x)
         for i, x in enumerate(xs)], "k string, ts timestamp, x double")
    out = holt_winters(df, "k", "ts", "x", season=7,
                       alpha=0.25, beta=0.5, gamma=0.25).collect()[0]
    a, b, g, m = 0.25, 0.5, 0.25, 7
    l, tr, s = xs[0], 0.0, [0.0] * m
    for i, x in enumerate(xs[1:], start=1):
        j = i % m
        sh = s[j]
        ln = a * (x - sh) + (1 - a) * (l + tr)
        tn = b * (ln - l) + (1 - b) * tr
        s[j] = g * (x - ln) + (1 - g) * sh
        l, tr = ln, tn
    nxt = s[len(xs) % m]
    assert out["n_days"] == 11
    for got, exp in [(out["level"], l), (out["trend"], tr),
                     (out["seasonal_next"], nxt),
                     (out["forecast"], l + tr + nxt)]:
        assert math.isclose(got, exp, abs_tol=1e-6)


def test_holt_winters_segmented_equals_flat_fold(spark):
    """Block-chained Holt-Winters (the (m+2)^2 affine transfer per
    block, phase-corrected by a cumulative-count window) must match the
    flat per-entity fold at round-6 — an entity spanning many blocks
    (with a mid-series gap so blocks start at non-zero season phase),
    a one-block entity, and a single-point entity."""
    import datetime

    from walmart_project_etl_spark.operators.timeseries import holt_winters
    base = datetime.datetime(2024, 1, 1)
    rows = []
    # entity A: 90 daily points with a 5-day gap -> phases desync from
    # calendar blocks, exercising the phi window
    d = 0
    for i in range(90):
        if i == 40:
            d += 5
        rows.append(("A", base + datetime.timedelta(days=d),
                     10.0 + (i * 7919 % 23) * 0.37 + i * 0.05))
        d += 1
    rows += [("B", base + datetime.timedelta(days=i), 5.0 + i)
             for i in range(4)]
    rows.append(("C", base, 42.5))
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double")
    flat = {r["k"]: tuple(r)[1:]
            for r in holt_winters(df, "k", "ts", "x", season=7).collect()}
    seg = {r["k"]: tuple(r)[1:]
           for r in holt_winters(df, "k", "ts", "x", season=7,
                                 segment_days=13).collect()}
    assert seg == flat


def test_rolling_zscore_flags_only_the_spike(spark):
    from walmart_project_etl_spark.operators.timeseries import \
        rolling_zscore_anomalies
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 100.0, 10.1, 9.9]
    df = spark.createDataFrame(
        [("u", i, v) for i, v in enumerate(vals)], "k string, t int, x double")
    out = rolling_zscore_anomalies(df, "k", ["t"], "x",
                                   lookback=10, min_n=5, z_cut=3.0)
    rows = out.collect()
    # only the spike flags: it inflates the trailing sigma of its
    # successors, which therefore stay within 3 sigma of their baseline
    assert [r["t"] for r in rows] == [7]
    assert rows[0]["zscore"] > 3


def test_holt_linear_matches_reference_recursion(spark):
    from walmart_project_etl_spark.operators.timeseries import holt_linear
    xs = [28.17, 71.69, 19.57, 40.0]
    df = spark.createDataFrame([("u", i, x) for i, x in enumerate(xs)],
                               "k string, t int, x double")
    out = holt_linear(df, "k", ["t"], "x", alpha=0.25, beta=0.5,
                      horizon=3).collect()[0]
    l, tr = xs[0], 0.0
    for x in xs[1:]:
        lnew = 0.25 * x + 0.75 * (l + tr)
        tr = 0.5 * (lnew - l) + 0.5 * tr
        l = lnew
    assert abs(out["level"] - l) < 1e-6
    assert abs(out["trend"] - tr) < 1e-6
    assert abs(out["forecast"] - (l + 3 * tr)) < 1e-6
