"""Unit tests for the r5 cleaning/profiling/attribution operators, each
pinned against an independent Python/numpy reference on hand-built data."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from walmart_project_etl_spark.operators import (cleaning, dedup, events,
                                                 profiling)


def _num_df(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", float(v))
            for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8])]
    return spark.createDataFrame(rows, "id int, g string, x double")


def test_zscore_matches_numpy(spark):
    import numpy as np
    df = _num_df(spark)
    out = {(r["g"], r["id"]): r["x_z"]
           for r in cleaning.zscore(df, "x", group_cols=["g"]).collect()}
    data = {(r["g"], r["id"]): r["x"] for r in df.collect()}
    for g in ("a", "b"):
        xs = np.array([v for (gg, _), v in data.items() if gg == g])
        mu, sd = xs.mean(), xs.std(ddof=1)
        for (gg, i), v in data.items():
            if gg == g:
                assert out[(gg, i)] == pytest.approx((v - mu) / sd, rel=1e-12)


def test_zscore_small_group_is_null(spark):
    df = spark.createDataFrame([(1, "solo", 5.0)], "id int, g string, x double")
    [r] = cleaning.zscore(df, "x", group_cols=["g"]).collect()
    assert r["x_z"] is None


def test_quantile_bins_equal_counts(spark):
    df = spark.range(100).select(
        F.col("id"), F.lit("g").alias("g"), (F.col("id") % 37).alias("x"))
    out = cleaning.quantile_bins(df, "x", 4, group_cols=["g"],
                                 tiebreak_cols=["id"], out_col="b")
    counts = {r["b"]: r["n"] for r in
              out.groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {1: 25, 2: 25, 3: 25, 4: 25}
    # bins are monotone in x: max of bin k <= min of bin k+1 up to ties
    rows = sorted((r["b"], r["x"], r["id"]) for r in out.collect())
    xs_by_bin = {}
    for b, x, _ in rows:
        xs_by_bin.setdefault(b, []).append(x)
    for b in (1, 2, 3):
        assert max(xs_by_bin[b]) <= min(xs_by_bin[b + 1])


def test_equi_width_histogram_counts_and_edges(spark):
    df = spark.createDataFrame([(float(v),) for v in range(0, 100)], "x double")
    out = {r["bin"]: r for r in
           cleaning.equi_width_histogram(df, "x", 10).collect()}
    assert set(out) == set(range(10))
    for b, r in out.items():
        assert r["n_rows"] == 10
        assert r["bin_lo"] == pytest.approx(b * 9.9)
        assert r["bin_hi"] == pytest.approx((b + 1) * 9.9)
    # max value folds into last bin; count total preserved
    assert sum(r["n_rows"] for r in out.values()) == 100


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 10.0), (4, 30.0)], "k int, v double")
    out = {r["col_name"]: r for r in
           profiling.profile_columns(df, ["k", "v"]).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 4
    assert out["k"]["min_val"] == 1.0 and out["k"]["max_val"] == 4.0
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 2
    assert out["v"]["min_val"] == 10.0 and out["v"]["max_val"] == 30.0


def test_contamination_scores_fractions(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d"),        # grams: "a b", "b c", "c d" -> 2/3 hit
         (2, "x y z"),          # no overlap
         (3, "a b")],           # single gram, full hit
        "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c q")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup.contamination_scores(corpus, bench, "doc_id", "text",
                                      n=2).collect()}
    assert out[1]["n_grams"] == 3 and out[1]["n_contaminated"] == 2
    assert out[1]["contamination_frac"] == pytest.approx(2 / 3)
    assert out[2]["n_contaminated"] == 0
    assert out[3]["contamination_frac"] == 1.0


def test_last_touch_attribution(spark):
    rows = [
        # user u: click(1) .. view(2) .. purchase(3) -> attributed to 2
        (1, "u", 100, "click"), (2, "u", 200, "view"), (3, "u", 300, "purchase"),
        # second purchase with no intervening touch -> still view 2
        (4, "u", 400, "purchase"),
        # user v converts with no prior touch -> NULLs
        (5, "v", 100, "purchase"), (6, "v", 200, "click"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, t long,"
                               " event_type string") \
        .select("event_id", "user_id",
                F.timestamp_seconds("t").alias("ts"), "event_type")
    out = {r["event_id"]: r for r in
           events.last_touch_attribution(df, "purchase",
                                         ["click", "view"]).collect()}
    assert set(out) == {3, 4, 5}
    assert out[3]["attr_touch_id"] == 2 and out[3]["attr_channel"] == "view"
    assert out[3]["secs_since_touch"] == 100
    assert out[4]["attr_touch_id"] == 2 and out[4]["secs_since_touch"] == 200
    assert out[5]["attr_touch_id"] is None and out[5]["attr_channel"] is None
    assert out[5]["secs_since_touch"] is None


def test_key_skew_profile(spark):
    rows = [(i, "hot" if i < 80 else ("warm" if i < 95 else f"cold{i}"))
            for i in range(100)]
    df = spark.createDataFrame(rows, "id int, k string")
    out = {r["key_value"]: r for r in
           profiling.key_skew_profile(df, ["k"], top_n=2).collect()}
    assert set(out) == {"hot", "warm"}
    hot = out["hot"]
    assert hot["cnt"] == 80 and hot["rank"] == 1
    assert hot["n_keys"] == 7  # hot, warm, cold95..cold99
    assert hot["share"] == 0.8
    assert hot["skew_ratio"] == round(80 * 7 / 100, 6)
    assert out["warm"]["cum_share"] == 0.95


def test_mad_outliers_matches_numpy(spark):
    import numpy as np
    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 500.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id int, x double")
    out = {r["id"]: (r["x_rz"], r["is_outlier"])
           for r in cleaning.mad_outliers(df, "x").collect()}
    med = np.median(vals)
    mad = np.median(np.abs(np.array(vals) - med))
    for i, v in enumerate(vals):
        rz = round(0.6745 * (v - med) / mad, 6)
        assert abs(out[i][0] - rz) < 1e-9
        assert out[i][1] == (abs(rz) > 3.5)
    assert out[5][1] is True and out[0][1] is False


def test_mad_outliers_zero_mad_is_null(spark):
    df = spark.createDataFrame([(i, 5.0) for i in range(4)] + [(9, 99.0)],
                               "id int, x double")
    out = {r["id"]: (r["x_rz"], r["is_outlier"])
           for r in cleaning.mad_outliers(df, "x").collect()}
    # median=5, deviations [0,0,0,0,94] -> MAD=0: scores NULL, flags False
    assert all(rz is None and flag is False for rz, flag in out.values())


def test_split_expectations_routes_and_reconciles(spark):
    from pyspark.sql import functions as F

    from walmart_project_etl_spark.operators.cleaning import \
        split_expectations
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None), (4, 9.0)],
        "k int, v double")
    clean, quar = split_expectations(df, [
        ("v_not_null", F.col("v").isNotNull()),
        ("v_positive", F.col("v") > 0)])
    assert {r["k"] for r in clean.collect()} == {1, 4}
    reasons = {r["k"]: r["dq_reason"] for r in quar.collect()}
    # first failing check tags the row: NULL fails not_null first
    assert reasons == {2: "v_positive", 3: "v_not_null"}
    assert clean.count() + quar.count() == df.count()


def test_psi_drift_zero_on_identical_and_positive_on_shift(spark):
    """PSI ≈ 0 when current == reference; strictly positive under a
    location shift; an unseen category stays finite (Laplace smoothing,
    never ln(0))."""
    from walmart_project_etl_spark.operators.cleaning import psi_drift
    ref = spark.createDataFrame(
        [(float(i), "a" if i % 2 else "b") for i in range(100)],
        "x double, c string")
    same = {r["feature"]: r["psi"]
            for r in psi_drift(ref, ref, ["x"], ["c"]).collect()}
    assert abs(same["x"]) < 1e-9 and abs(same["c"]) < 1e-9
    cur = spark.createDataFrame(
        [(float(i) + 60.0, "a" if i % 2 else "z") for i in range(100)],
        "x double, c string")
    drift = {r["feature"]: r for r in
             psi_drift(ref, cur, ["x"], ["c"]).collect()}
    assert drift["x"]["psi"] > 0.25          # gross location shift
    assert drift["c"]["psi"] > 0.25          # category replaced
    assert drift["x"]["n_ref"] == 100 and drift["x"]["n_cur"] == 100
    import math
    assert all(math.isfinite(r["psi"]) for r in drift.values())


def test_ks_drift_closed_form_and_bucket_invariance(spark):
    """Hand-computed two-sample KS: ref=[1,2,3,4], cur=[3,4,5,6] →
    ECDF diffs .25/.5/.5/.5/.25/0 → D=0.5; identical samples → 0;
    the bucket count must not change the statistic (it's a
    parallelization knob, not a binning choice); NULLs excluded."""
    from walmart_project_etl_spark.operators.cleaning import ks_drift
    ref = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,), (None,)], "x double")
    cur = spark.createDataFrame(
        [(3.0,), (4.0,), (5.0,), (6.0,), (None,)], "x double")
    for nb in (2, 8, 32):
        r = ks_drift(ref, cur, ["x"], n_buckets=nb).collect()[0]
        assert (r["feature"], r["ks"], r["n_ref"], r["n_cur"]) \
            == ("x", 0.5, 4, 4)
    same = ks_drift(ref, ref, ["x"]).collect()[0]
    assert same["ks"] == 0.0 and same["n_ref"] == 4


def test_ks_drift_matches_duckdb_prefix_sum(spark):
    """Engine KS must equal a DuckDB recomputation of the same
    integer-cross-product definition on an adversarial sample with
    heavy ties across sides."""
    import duckdb
    from walmart_project_etl_spark.operators.cleaning import ks_drift

    ref_v = [float((i * 7919) % 13) for i in range(200)]
    cur_v = [float((i * 104729) % 17) * 0.9 for i in range(150)]
    ref = spark.createDataFrame([(v,) for v in ref_v], "x double")
    cur = spark.createDataFrame([(v,) for v in cur_v], "x double")
    got = ks_drift(ref, cur, ["x"]).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE r(x DOUBLE); CREATE TABLE u(x DOUBLE)")
    con.executemany("INSERT INTO r VALUES (?)", [(v,) for v in ref_v])
    con.executemany("INSERT INTO u VALUES (?)", [(v,) for v in cur_v])
    want = con.execute("""
        WITH s AS (SELECT x, 1 AS r, 0 AS c FROM r
                   UNION ALL SELECT x, 0, 1 FROM u),
        pv AS (SELECT x, sum(r) AS cr, sum(c) AS cc FROM s GROUP BY x),
        n AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM pv),
        cum AS (SELECT sum(cr) OVER (ORDER BY x) AS kr,
                       sum(cc) OVER (ORDER BY x) AS kc FROM pv),
        d AS (SELECT max(abs(kr::DECIMAL(38,0) * nc
                             - kc::DECIMAL(38,0) * nr)) AS dn,
                     any_value(nr) AS nr, any_value(nc) AS nc
              FROM cum, n)
        SELECT round(CAST(CAST(dn AS DOUBLE) / (nr::DOUBLE * nc::DOUBLE)
                     AS DECIMAL(28,8)), 6)::DOUBLE,
               nr::BIGINT, nc::BIGINT FROM d""").fetchone()
    assert (got["ks"], got["n_ref"], got["n_cur"]) == want


def test_mwu_drift_closed_form_and_duckdb(spark):
    """Hand-computed rank-sum with a cross-side tie: ref=[1,2],
    cur=[2,3] → midranks 1, 2.5, 4; R_cur=6.5, U=3.5,
    auc = 3.5/4 = 0.875 (P(cur>ref) + P(tie)/2 over the 4 pairs);
    identical sides → auc 0.5; bucket-count invariant; engine equals
    DuckDB on a heavy-ties sample."""
    import duckdb
    from walmart_project_etl_spark.operators.cleaning import mwu_drift

    ref = spark.createDataFrame([(1.0,), (2.0,), (None,)], "x double")
    cur = spark.createDataFrame([(2.0,), (3.0,), (None,)], "x double")
    for nb in (2, 32):
        r = mwu_drift(ref, cur, ["x"], n_buckets=nb).collect()[0]
        assert (r["feature"], r["u"], r["auc"], r["n_ref"],
                r["n_cur"]) == ("x", 3.5, 0.875, 2, 2)
    same = mwu_drift(ref, ref, ["x"]).collect()[0]
    assert same["auc"] == 0.5

    ref_v = [float((i * 7919) % 13) for i in range(200)]
    cur_v = [float((i * 104729) % 17) for i in range(150)]
    sref = spark.createDataFrame([(v,) for v in ref_v], "x double")
    scur = spark.createDataFrame([(v,) for v in cur_v], "x double")
    got = mwu_drift(sref, scur, ["x"]).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE r(x DOUBLE); CREATE TABLE u(x DOUBLE)")
    con.executemany("INSERT INTO r VALUES (?)", [(v,) for v in ref_v])
    con.executemany("INSERT INTO u VALUES (?)", [(v,) for v in cur_v])
    want = con.execute("""
        WITH s AS (SELECT x, 1 AS r, 0 AS c FROM r
                   UNION ALL SELECT x, 0, 1 FROM u),
        pv AS (SELECT x, sum(r) AS cr, sum(c) AS cc FROM s GROUP BY x),
        n AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM pv),
        cum AS (SELECT cr, cc,
                       sum(cr) OVER (ORDER BY x) AS kr,
                       sum(cc) OVER (ORDER BY x) AS kc FROM pv),
        m AS (SELECT cc, 2*(kr+kc) - (cr+cc) + 1 AS m2 FROM cum),
        r2 AS (SELECT sum(cc::DECIMAL(19,0) * m2::DECIMAL(19,0)) AS s2
               FROM m),
        uu AS (SELECT s2 - nc::DECIMAL(19,0)*(nc::DECIMAL(19,0)+1)
                      AS u2, nr, nc FROM r2, n)
        SELECT CAST(u2 AS DOUBLE)/2,
               round(CAST(CAST(u2 AS DOUBLE)
                     / (2*nr::DOUBLE*nc::DOUBLE)
                     AS DECIMAL(28,8)), 6)::DOUBLE,
               nr::BIGINT, nc::BIGINT FROM uu""").fetchone()
    assert (got["u"], got["auc"], got["n_ref"], got["n_cur"]) == want


def test_chisq_drift_closed_form_and_duckdb(spark):
    """Hand-computed 2x2 homogeneity: ref a,a,a,b vs cur a,b,b,b →
    all four expected cells are 2, each (O-E)^2/E term is 0.5,
    chi-square = 2.0, dof = 1; identical sides → 0; NULLs excluded;
    engine equals a DuckDB recomputation on a skewed-table sample."""
    import duckdb
    from walmart_project_etl_spark.operators.cleaning import chisq_drift

    ref = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), (None,)], "c string")
    cur = spark.createDataFrame(
        [("a",), ("b",), ("b",), ("b",), (None,)], "c string")
    r = chisq_drift(ref, cur, ["c"]).collect()[0]
    assert (r["feature"], r["chisq"], r["dof"], r["n_ref"],
            r["n_cur"]) == ("c", 2.0, 1, 4, 4)
    same = chisq_drift(ref, ref, ["c"]).collect()[0]
    assert same["chisq"] == 0.0

    ref_v = [f"cat{(i * 7919) % 7}" for i in range(300)]
    cur_v = [f"cat{(i * 104729) % 9}" for i in range(250)]
    sref = spark.createDataFrame([(v,) for v in ref_v], "c string")
    scur = spark.createDataFrame([(v,) for v in cur_v], "c string")
    got = chisq_drift(sref, scur, ["c"]).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE r(c VARCHAR); CREATE TABLE u(c VARCHAR)")
    con.executemany("INSERT INTO r VALUES (?)", [(v,) for v in ref_v])
    con.executemany("INSERT INTO u VALUES (?)", [(v,) for v in cur_v])
    want = con.execute("""
        WITH s AS (SELECT c AS b, 1 AS r, 0 AS c2 FROM r
                   UNION ALL SELECT c, 0, 1 FROM u),
        cnt AS (SELECT b, sum(r) AS cr, sum(c2) AS cc FROM s
                WHERE b IS NOT NULL GROUP BY b),
        tot AS (SELECT sum(cr) AS nr, sum(cc) AS nc, count(*) AS k
                FROM cnt),
        t0 AS (SELECT cr, cc, nr, nc, k,
                 nr::DOUBLE * (cr+cc)::DOUBLE / (nr+nc)::DOUBLE AS er,
                 nc::DOUBLE * (cr+cc)::DOUBLE / (nr+nc)::DOUBLE AS ec
               FROM cnt, tot),
        t AS (SELECT
                round(CAST((cr::DOUBLE - er)*(cr::DOUBLE - er)/er
                      AS DECIMAL(28,12)), 9)::DECIMAL(20,9) AS tr,
                round(CAST((cc::DOUBLE - ec)*(cc::DOUBLE - ec)/ec
                      AS DECIMAL(28,12)), 9)::DECIMAL(20,9) AS tc,
                nr, nc, k
              FROM t0)
        SELECT round(CAST(CAST(sum(tr)+sum(tc) AS DOUBLE)
                     AS DECIMAL(28,8)), 6)::DOUBLE,
               (any_value(k)-1)::INT, any_value(nr)::BIGINT,
               any_value(nc)::BIGINT FROM t""").fetchone()
    assert (got["chisq"], got["dof"], got["n_ref"], got["n_cur"]) == want


def test_psi_drift_null_category_matches_sql_semantics(spark):
    """A nullable categorical column: NULLs are excluded from both the
    bucket counts AND the smoothing constant k (count(DISTINCT cat)
    semantics — Spark's distinct() would count NULL as a value and
    NULL bucket keys would never match in the full join). Engine PSI
    must equal a DuckDB recomputation of the same definition."""
    import duckdb
    from walmart_project_etl_spark.operators.cleaning import psi_drift

    ref_rows = [("a" if i % 2 else "b") if i % 7 else None
                for i in range(70)]
    cur_rows = [("a" if i % 3 else "b") if i % 5 else None
                for i in range(70)]
    ref = spark.createDataFrame([(c,) for c in ref_rows], "c string")
    cur = spark.createDataFrame([(c,) for c in cur_rows], "c string")
    got = psi_drift(ref, cur, [], ["c"]).collect()[0]

    con = duckdb.connect()
    con.execute("CREATE TABLE r(c VARCHAR); CREATE TABLE u(c VARCHAR)")
    con.executemany("INSERT INTO r VALUES (?)", [(c,) for c in ref_rows])
    con.executemany("INSERT INTO u VALUES (?)", [(c,) for c in cur_rows])
    want = con.execute("""
        WITH rc AS (SELECT c, count(*) AS cr FROM r
                    WHERE c IS NOT NULL GROUP BY c),
        cc AS (SELECT c, count(*) AS cc FROM u
               WHERE c IS NOT NULL GROUP BY c),
        k AS (SELECT count(DISTINCT c)::DOUBLE AS k
              FROM (SELECT c FROM r UNION ALL SELECT c FROM u)
              WHERE c IS NOT NULL),
        nr AS (SELECT sum(cr) AS nr FROM rc),
        nc AS (SELECT sum(cc) AS nc FROM cc),
        j AS (SELECT coalesce(cr,0) AS cr, coalesce(cc,0) AS cc
              FROM rc FULL JOIN cc USING (c)),
        t AS (SELECT round(CAST(
                ((cc+1.0)/(nc+k) - (cr+1.0)/(nr+k))
                * CAST(round(ln(((cc+1.0)/(nc+k))/((cr+1.0)/(nr+k))), 6)
                       AS DECIMAL(20,6))::DOUBLE AS DECIMAL(28,12)), 9)
                ::DECIMAL(20,9) AS term, nr, nc
              FROM j, nr, nc, k)
        SELECT round(CAST(CAST(sum(term) AS DOUBLE) AS DECIMAL(28,8)),
                     6)::DOUBLE,
               any_value(nr)::BIGINT, any_value(nc)::BIGINT FROM t
    """).fetchone()
    assert (got["psi"], got["n_ref"], got["n_cur"]) == want


def test_fd_violations_counts_and_null_rhs(spark):
    """FD holds iff every determinant group has <=1 distinct dependent;
    all-NULL dependents count 0 distinct (SQL count-distinct semantics)
    and never violate."""
    from walmart_project_etl_spark.operators.cleaning import fd_violations
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 10),       # k=1 determines v
         (2, "b", 20), (2, "c", 20),       # k=2 violates k->v2
         (3, None, 30), (3, None, 30)],    # all-NULL v2: no violation
        "k int, v2 string, v int")
    out = {r["fd"]: r for r in fd_violations(df, [
        ("k->v", ["k"], ["v"]),
        ("k->v2", ["k"], ["v2"]),
        ("v->k", ["v"], ["k"])]).collect()}
    assert out["k->v"]["n_violations"] == 0
    assert out["k->v2"]["n_violations"] == 1      # only k=2
    assert out["k->v2"]["n_groups"] == 3
    assert abs(out["k->v2"]["violation_pct"] - 1 / 3) < 1e-12
    assert out["v->k"]["n_violations"] == 0       # v unique per k here


def test_split_expectations_null_predicate_quarantines(spark):
    """A predicate that evaluates to NULL (v > 0 with v NULL) is a
    VIOLATION (DLT expect_or_quarantine semantics) — the row must land
    in quarantine, not silently pass through to the clean side."""
    from pyspark.sql import functions as F

    from walmart_project_etl_spark.operators.cleaning import \
        split_expectations
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "k int, v double")
    clean, quar = split_expectations(df, [("v_positive", F.col("v") > 0)])
    assert {r["k"] for r in clean.collect()} == {1}
    reasons = {r["k"]: r["dq_reason"] for r in quar.collect()}
    assert reasons == {2: "v_positive", 3: "v_positive"}


def test_drift_multicol_single_pass_equals_per_column(spark):
    """The melted single-pass path must return EXACTLY the per-column
    results for a ≥3-feature list (the r15 job-count collapse:
    one (feature, value) shuffle instead of one per feature) — for
    KS, MWU, chi-square, and PSI alike, including mixed int/double
    feature types riding the order-preserving double melt."""
    from walmart_project_etl_spark.operators.cleaning import (
        chisq_drift, ks_drift, mwu_drift, psi_drift)

    ref = spark.createDataFrame(
        [(float(i % 17), i % 7, float((i * 3) % 11),
          "abc"[i % 3], "xy"[i % 2]) for i in range(120)],
        "x double, y int, z double, c string, d string")
    cur = spark.createDataFrame(
        [(float(i % 19) * 1.1, (i % 9) + 1, float((i * 5) % 11),
          "abd"[i % 3], "xy"[(i + 1) % 2]) for i in range(90)],
        "x double, y int, z double, c string, d string")

    for op, cols in ((ks_drift, ["x", "y", "z"]),
                     (mwu_drift, ["x", "y", "z"])):
        multi = {r["feature"]: r for r in op(ref, cur, cols).collect()}
        assert set(multi) == set(cols)
        for c in cols:
            single = op(ref, cur, [c]).collect()[0]
            assert multi[c].asDict() == single.asDict(), c

    multi = {r["feature"]: r
             for r in chisq_drift(ref, cur, ["c", "d"]).collect()}
    for c in ("c", "d"):
        single = chisq_drift(ref, cur, [c]).collect()[0]
        assert multi[c].asDict() == single.asDict(), c

    multi = {r["feature"]: r
             for r in psi_drift(ref, cur, ["x", "y"], ["c", "d"])
             .collect()}
    assert set(multi) == {"x", "y", "c", "d"}
    for nc, cc in ((["x"], []), (["y"], []), ([], ["c"]), ([], ["d"])):
        single = psi_drift(ref, cur, nc, cc).collect()[0]
        assert multi[(nc + cc)[0]].asDict() == single.asDict()


def test_drift_empty_side_raises(spark):
    """ADVICE r14: an empty reference or current side (including a
    feature whose rows are ALL NULL after the missingness filter) must
    raise at evaluation time, not silently report a NULL statistic —
    for all four monitors. The guard is lazy (rides the result's own
    evaluation, no extra jobs) and per-feature: a healthy sibling
    feature doesn't mask the violation."""
    import pytest
    from walmart_project_etl_spark.operators.cleaning import (
        chisq_drift, ks_drift, mwu_drift, psi_drift)

    ok = spark.createDataFrame([(1.0, "a"), (2.0, "b")],
                               "x double, c string")
    empty = spark.createDataFrame([], "x double, c string")
    all_null = spark.createDataFrame([(None, None), (None, None)],
                                     "x double, c string")

    for bad in (empty, all_null):
        for op, args in ((ks_drift, (["x"],)),
                         (mwu_drift, (["x"],)),
                         (chisq_drift, (["c"],)),
                         (psi_drift, (["x"], ["c"]))):
            with pytest.raises(Exception, match="empty"):
                op(ok, bad, *args).collect()
            with pytest.raises(Exception, match="empty"):
                op(bad, ok, *args).collect()

    # mixed: one all-NULL feature among healthy ones still raises
    ref = spark.createDataFrame([(1.0, None), (2.0, None)],
                                "x double, y double")
    cur = spark.createDataFrame([(1.5, None), (2.5, None)],
                                "x double, y double")
    with pytest.raises(Exception, match="feature 'y'"):
        ks_drift(ref, cur, ["x", "y"]).collect()
    # and the healthy single-feature call still works
    assert ks_drift(ref, cur, ["x"]).collect()[0]["n_ref"] == 2


def test_embedding_energy_drift_closed_form(spark):
    """Hand-computed strided energy distance: two 1-D points per side,
    ref at 0, cur at 1 → every within-side pair distance 0, every
    cross pair distance 1 → E = 2·1 − 0 − 0 = 2. Identical sides →
    exactly 0 (within and cross means coincide when n exceeds the max
    stride's self-collision). A 1-row side must raise the documented
    ≥2-rows error; a larger shift must yield larger energy."""
    import pytest
    from walmart_project_etl_spark.operators.cleaning import \
        embedding_energy_drift

    ref = spark.createDataFrame([(1, [0.0]), (2, [0.0])],
                                "id long, v array<double>")
    cur = spark.createDataFrame([(7, [1.0]), (9, [1.0])],
                                "id long, v array<double>")
    r = embedding_energy_drift(ref, cur, "id", "v").collect()[0]
    assert (r["feature"], r["energy"], r["e_cross"], r["e_ref"],
            r["e_cur"], r["n_ref"], r["n_cur"]) \
        == ("v", 2.0, 1.0, 0.0, 0.0, 2, 2)

    big = spark.createDataFrame(
        [(i, [float(i % 23), float((i * 3) % 17)]) for i in range(60)],
        "id long, v array<double>")
    same = embedding_energy_drift(big, big, "id", "v").collect()[0]
    assert same["energy"] == 0.0 and same["e_cross"] == same["e_ref"]

    one = spark.createDataFrame([(1, [0.0])], "id long, v array<double>")
    with pytest.raises(Exception, match="at least 2 rows"):
        embedding_energy_drift(ref, one, "id", "v").collect()

    def shifted(delta):
        return big.select(
            "id",
            __import__("pyspark.sql.functions", fromlist=["F"])
            .transform("v", lambda x: x + delta).alias("v"))

    small_d = embedding_energy_drift(
        big, shifted(0.5), "id", "v").collect()[0]["energy"]
    large_d = embedding_energy_drift(
        big, shifted(5.0), "id", "v").collect()[0]["energy"]
    assert 0.0 < small_d < large_d


def test_drift_report_equals_individual_operators(spark):
    """drift_report's long-format rows must be BIT-EQUAL to the five
    single-statistic operators on the same sides — the shared-shuffle
    plan is a pure optimization. Empty-side raise carries over."""
    import pytest
    from walmart_project_etl_spark.operators.cleaning import (
        chisq_drift, drift_report, ks_drift, mwu_drift, psi_drift)

    ref = spark.createDataFrame(
        [(float(i % 13), float((i * 3) % 7), "abc"[i % 3])
         for i in range(150)], "x double, y double, c string")
    cur = spark.createDataFrame(
        [(float(i % 17) * 1.2, float((i * 5) % 7), "abd"[i % 3])
         for i in range(110)], "x double, y double, c string")

    rep = {(r["feature"], r["statistic"]): r
           for r in drift_report(ref, cur, ["x", "y"], ["c"]).collect()}
    assert len(rep) == 2 * 4 + 3

    psi = {r["feature"]: r
           for r in psi_drift(ref, cur, ["x", "y"], ["c"]).collect()}
    ks = {r["feature"]: r for r in ks_drift(ref, cur, ["x", "y"]).collect()}
    mwu = {r["feature"]: r
           for r in mwu_drift(ref, cur, ["x", "y"]).collect()}
    chi = chisq_drift(ref, cur, ["c"]).collect()[0]

    for f in ("x", "y"):
        assert rep[(f, "psi")]["value"] == psi[f]["psi"]
        assert rep[(f, "ks")]["value"] == ks[f]["ks"]
        assert rep[(f, "mwu_u")]["value"] == mwu[f]["u"]
        assert rep[(f, "mwu_auc")]["value"] == mwu[f]["auc"]
        assert rep[(f, "ks")]["n_ref"] == ks[f]["n_ref"]
    assert rep[("c", "psi")]["value"] == psi["c"]["psi"]
    assert rep[("c", "chisq")]["value"] == chi["chisq"]
    assert rep[("c", "chisq_dof")]["value"] == float(chi["dof"])

    all_null = spark.createDataFrame([(None, 1.0, "a"), (None, 2.0, "b")],
                                     "x double, y double, c string")
    with pytest.raises(Exception, match="feature 'x'"):
        drift_report(ref, all_null, ["x", "y"], ["c"]).collect()


def test_drift_baseline_persist_serve_bit_equal(spark, tmp_path):
    """Serving a monitoring pass from a persisted baseline must be
    BIT-EQUAL to the two-sided drift_report — the artifact stores the
    reference's sufficient statistics exactly (value counts, category
    counts, edge frames), so freezing loses nothing. A second serve
    against a different live side reuses the same artifact (the
    build-once/serve-many contract)."""
    from walmart_project_etl_spark.operators.cleaning import (
        drift_report, drift_vs_baseline, persist_drift_baseline)

    ref = spark.createDataFrame(
        [(float(i % 13), float((i * 3) % 7), "abc"[i % 3])
         for i in range(150)], "x double, y double, c string")
    cur = spark.createDataFrame(
        [(float(i % 17) * 1.2, float((i * 5) % 7), "abd"[i % 3])
         for i in range(110)], "x double, y double, c string")
    cur2 = spark.createDataFrame(
        [(float(i % 11) * 0.5, float(i % 7), "abc"[i % 3])
         for i in range(90)], "x double, y double, c string")

    root = str(tmp_path / "baseline")
    persist_drift_baseline(ref, ["x", "y"], ["c"], root)

    def rows(df):
        return sorted((r["feature"], r["statistic"], r["value"],
                       r["n_ref"], r["n_cur"]) for r in df.collect())

    assert rows(drift_vs_baseline(spark, root, cur)) \
        == rows(drift_report(ref, cur, ["x", "y"], ["c"]))
    assert rows(drift_vs_baseline(spark, root, cur2)) \
        == rows(drift_report(ref, cur2, ["x", "y"], ["c"]))


def test_drift_timeline_periods_equal_per_slice_serve(spark, tmp_path):
    """Each period's timeline rows must be BIT-EQUAL to
    drift_vs_baseline on that period's slice alone (which is itself
    bit-equal to the two-sided drift_report) — the composite-key fuse
    is a pure batching of independent per-period passes. Baseline
    counts (n_ref) are identical across periods."""
    from pyspark.sql import functions as F

    from walmart_project_etl_spark.operators.cleaning import (
        drift_timeline, drift_vs_baseline, persist_drift_baseline)

    ref = spark.createDataFrame(
        [(float(i % 13), "abc"[i % 3]) for i in range(120)],
        "x double, c string")
    cur = spark.createDataFrame(
        [(float((i * 7) % 17) * (1.0 + 0.2 * (i % 3)),
          "abd"[(i + i // 40) % 3], i // 40) for i in range(120)],
        "x double, c string, day int")

    root = str(tmp_path / "baseline")
    persist_drift_baseline(ref, ["x"], ["c"], root)
    tl = drift_timeline(spark, root, cur, F.col("day"))
    rows = tl.collect()
    assert {r["period"] for r in rows} == {"0", "1", "2"}
    assert len(rows) == 3 * (4 + 3)

    def key(rs):
        return sorted((r["feature"], r["statistic"], r["value"],
                       r["n_ref"], r["n_cur"]) for r in rs)

    for d in (0, 1, 2):
        want = drift_vs_baseline(
            spark, root, cur.where(F.col("day") == d).drop("day"))
        got = [r for r in rows if r["period"] == str(d)]
        assert key(got) == key(want.collect()), d
    assert len({r["n_ref"] for r in rows if r["feature"] == "x"}) == 1
