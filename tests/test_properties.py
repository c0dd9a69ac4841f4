"""Property-based invariants (hypothesis) for the deterministic-sampling
and packing primitives — properties that must hold for ANY input, not
just the fixtures: complete split coverage, budget bounds, packing
conservation. Example counts are kept small (each example runs Spark
jobs); derandomized so CI is stable.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from walmart_project_etl_spark.operators import packing, sampling

_settings = settings(max_examples=8, deadline=None, derandomize=True,
                     suppress_health_check=[HealthCheck.function_scoped_fixture])

_ids = st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=40, unique=True)


@given(ids=_ids)
@_settings
def test_hash_split_total_and_stable(spark, ids):
    """Every row gets exactly one split label, and the assignment of a
    given key never depends on which other keys are present."""
    df = spark.createDataFrame([(i,) for i in ids], "k long")
    out = sampling.hash_split(df, "k", {"train": 90, "val": 5, "test": 5})
    rows = {r["k"]: r["split"] for r in out.collect()}
    assert set(rows) == set(ids)
    assert set(rows.values()) <= {"train", "val", "test"}
    half = spark.createDataFrame([(i,) for i in ids[::2]], "k long")
    again = {r["k"]: r["split"]
             for r in sampling.hash_split(
                 half, "k", {"train": 90, "val": 5, "test": 5}).collect()}
    assert all(rows[k] == v for k, v in again.items())


@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**6),
              st.integers(min_value=1, max_value=50)),
    min_size=1, max_size=30, unique_by=lambda t: t[0]),
    budget=st.integers(min_value=1, max_value=200))
@_settings
def test_token_budget_bounds_and_prefix(spark, rows, budget):
    """Kept tokens before the boundary doc stay under budget, at least one
    doc is kept when any exists, and the kept set is a PREFIX of the hash
    order (no doc kept after a dropped one)."""
    import hashlib
    df = spark.createDataFrame([(k, "s", n) for k, n in rows],
                               "doc_id long, source string, n_tokens long")
    kept = {r["doc_id"] for r in sampling.token_budget_per_group(
        df, "source", "n_tokens", budget=budget, key="doc_id").collect()}
    order = sorted((k for k, _ in rows),
                   key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    sizes = dict(rows)
    assert kept, "greedy fill must keep at least one doc"
    assert kept == set(order[:len(kept)]), "kept set must be a hash-order prefix"
    cum_before_last = sum(sizes[i] for i in order[:len(kept) - 1])
    assert cum_before_last < budget


@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**6),
              st.integers(min_value=0, max_value=80)),
    min_size=1, max_size=30, unique_by=lambda t: t[0]))
@_settings
def test_pack_sequences_conserves_tokens_and_fits(spark, rows):
    """Packing conserves every doc, offsets stay inside the capacity, and
    each doc's (seq_id, seq_offset) equals its group running total."""
    df = spark.createDataFrame([(k, n) for k, n in rows],
                               "doc_id long, n_tokens long")
    out = packing.pack_sequences(df, "doc_id", "n_tokens",
                                 capacity=64, n_groups=4).collect()
    assert {r["doc_id"] for r in out} == {k for k, _ in rows}
    for r in out:
        assert 0 <= r["seq_offset"] < 64
        assert r["seq_id"] >= 0


def test_incremental_agg_merge_order_insensitive(spark):
    """Folding the same batches in any order/nesting must give the exact
    state of one full aggregation (mergeable-monoid property)."""
    from pyspark.sql import functions as F

    from walmart_project_etl_spark.operators import incremental
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    keys = ["l_returnflag"]
    parts = [li.where(F.col("l_orderkey") % 3 == i) for i in range(3)]
    full = incremental.agg_state(li, keys, "l_extendedprice")
    s012 = incremental.merge_agg_state(
        incremental.merge_agg_state(
            incremental.agg_state(parts[0], keys, "l_extendedprice"),
            incremental.agg_state(parts[1], keys, "l_extendedprice"), keys),
        incremental.agg_state(parts[2], keys, "l_extendedprice"), keys)
    s210 = incremental.merge_agg_state(
        incremental.agg_state(parts[2], keys, "l_extendedprice"),
        incremental.merge_agg_state(
            incremental.agg_state(parts[1], keys, "l_extendedprice"),
            incremental.agg_state(parts[0], keys, "l_extendedprice"), keys),
        keys)

    def rows(df):
        return sorted(tuple(map(str, r)) for r in
                      incremental.finalize(df, keys).collect())

    assert rows(full) == rows(s012) == rows(s210)


def test_hll_distinct_state_merge_equals_full_sketch(spark):
    """Union of per-batch sketches must equal the one-shot sketch exactly
    (HLL union is lossless over identical lg_k), and the estimate must be
    within 5% of the exact distinct count."""
    from pyspark.sql import functions as F

    from walmart_project_etl_spark.operators import incremental
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    keys = ["l_returnflag"]
    parts = [li.where(F.col("l_orderkey") % 3 == i) for i in range(3)]
    full = incremental.distinct_state(li, keys, "l_partkey")
    folded = incremental.merge_distinct_state(
        incremental.merge_distinct_state(
            incremental.distinct_state(parts[0], keys, "l_partkey"),
            incremental.distinct_state(parts[1], keys, "l_partkey"), keys),
        incremental.distinct_state(parts[2], keys, "l_partkey"), keys)

    est = {r["l_returnflag"]: r["approx_distinct"] for r in
           incremental.finalize_distinct(folded, keys).collect()}
    est_full = {r["l_returnflag"]: r["approx_distinct"] for r in
                incremental.finalize_distinct(full, keys).collect()}
    assert est == est_full  # merge-lossless: same estimate as one-shot
    exact = {r["l_returnflag"]: r["n"] for r in
             li.groupBy(*keys).agg(
                 F.count_distinct("l_partkey").alias("n")).collect()}
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.05


@_settings
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                min_size=1, max_size=60))
def test_connected_components_matches_union_find(spark, edges):
    """The alternating-star contraction must agree with a reference
    union-find on arbitrary random graphs (self-loops, duplicates,
    multi-component, chains — whatever hypothesis generates)."""
    from walmart_project_etl_spark.operators import graph

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected = {}
    for v in {x for e in edges for x in e}:
        expected.setdefault(find(v), []).append(v)
    truth = {v: min(members) for members in expected.values()
             for v in members}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"]
           for r in graph.connected_components(df).collect()}
    assert got == truth


@_settings
@given(st.lists(st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=12)
                .map(lambda toks: " ".join(toks)),
                min_size=2, max_size=8),
       st.sampled_from([0.3, 0.5, 0.8]))
def test_ngram_jaccard_ppjoin_matches_bruteforce(spark, texts, threshold):
    """The PPJoin prefix + positional + length filters claim EXACTNESS:
    on arbitrary low-entropy corpora (tiny vocab — the worst case for
    prefix selectivity) the pair set and jaccard values must equal a
    pure-Python brute force over the same word-3-gram sets."""
    from walmart_project_etl_spark.operators import dedup

    def grams(text):
        toks = text.split()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    sets = {i: grams(t) for i, t in enumerate(texts)}
    expected = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                j = round(inter / union, 6)
                if j >= threshold:
                    expected[(a, b)] = j

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(
               df, "doc_id", "text", k=3, threshold=threshold,
               unit="word").collect()}
    assert got == expected


_samples = st.lists(st.integers(min_value=-50, max_value=50),
                    min_size=2, max_size=30)


@given(ref_v=_samples, cur_v=_samples)
@_settings
def test_rank_drift_monotone_invariance_and_symmetry(spark, ref_v, cur_v):
    """KS and MWU are RANK statistics: any strictly monotone transform
    of both samples (here 3x+7) must leave ks/auc/n unchanged — the
    exact property the melt's double cast relies on. KS is symmetric
    under side swap; MWU's auc reflects to 1 − auc (up to the shared
    round-6 grid)."""
    from walmart_project_etl_spark.operators.cleaning import (ks_drift,
                                                              mwu_drift)
    ref = spark.createDataFrame([(float(v),) for v in ref_v], "x double")
    cur = spark.createDataFrame([(float(v),) for v in cur_v], "x double")
    tref = spark.createDataFrame([(3.0 * v + 7.0,) for v in ref_v],
                                 "x double")
    tcur = spark.createDataFrame([(3.0 * v + 7.0,) for v in cur_v],
                                 "x double")

    k1 = ks_drift(ref, cur, ["x"]).collect()[0]
    k2 = ks_drift(tref, tcur, ["x"]).collect()[0]
    assert (k1["ks"], k1["n_ref"], k1["n_cur"]) \
        == (k2["ks"], k2["n_ref"], k2["n_cur"])
    k3 = ks_drift(cur, ref, ["x"]).collect()[0]
    assert k3["ks"] == k1["ks"]

    m1 = mwu_drift(ref, cur, ["x"]).collect()[0]
    m2 = mwu_drift(tref, tcur, ["x"]).collect()[0]
    assert (m1["u"], m1["auc"]) == (m2["u"], m2["auc"])
    m3 = mwu_drift(cur, ref, ["x"]).collect()[0]
    assert abs((m1["auc"] + m3["auc"]) - 1.0) < 2e-6  # round-6 grid
