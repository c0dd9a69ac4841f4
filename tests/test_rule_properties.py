"""Property-based tests (hypothesis): the Column-expression rules must
agree with straightforward Python reference implementations on arbitrary
inputs — including unicode, empties, and nulls the CSV never exercises.

Restored per the r4 advisory (the sampling/packing invariant rewrite had
replaced this module instead of adding alongside it); the newer
invariants live in test_properties.py and both now run.

Examples are batched into one Spark job per hypothesis case.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from walmart_project_etl_spark.functions import keys, rules
from walmart_project_etl_spark.operators import text as text_ops

FAST = settings(max_examples=10, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture,
                                       HealthCheck.too_slow])


def _run(spark, values, schema, expr):
    df = spark.createDataFrame([(v,) for v in values], schema)
    return [r["out"] for r in df.select(expr.alias("out")).collect()]


# ---------------------------------------------------------------- F8 age_group

def _age_group_py(age):
    if age is None:
        return "Unknown"
    if age < 18:
        return "Under 18"
    if age < 35:
        return "18-34"
    if age < 50:
        return "35-49"
    if age < 65:
        return "50-64"
    return "65+"


@FAST
@given(st.lists(st.one_of(st.none(), st.integers(-1000, 1000)),
                min_size=1, max_size=50))
def test_age_group_matches_python(spark, ages):
    got = _run(spark, ages, "v int", rules.age_group(F.col("v")))
    assert got == [_age_group_py(a) for a in ages]


# ------------------------------------------------------------- F14 market chain

_EAST = {"east", "northeast", "southeast"}
_WEST = {"west", "northwest", "southwest", "pacific"}
_CENTRAL = {"central", "midwest", "north central", "south central"}
_SOUTH = {"south", "southwest", "southeast"}


def _market_py(region):
    if region is None:
        return "Unknown"
    r = region.lower()
    if r in _EAST:
        return "East Coast"
    if r in _WEST:
        return "West Coast"
    if r in _CENTRAL:
        return "Central"
    if r in _SOUTH:
        return "South"
    return "Other"


@FAST
@given(st.lists(st.one_of(
    st.none(),
    st.sampled_from(sorted(_EAST | _WEST | _CENTRAL | _SOUTH) + ["Mars", ""]),
    st.text(max_size=12)), min_size=1, max_size=50))
def test_market_chain_matches_python(spark, regions):
    got = _run(spark, regions, "v string", rules.market_from_region(F.col("v")))
    assert got == [_market_py(r) for r in regions]


# ------------------------------------------------------------- F13 price tiers

def _tier_py(p):
    if p < 10:
        return "Low"
    if p < 50:
        return "Medium"
    if p < 100:
        return "High"
    return "Premium"


@FAST
@given(st.lists(st.floats(min_value=0, max_value=1000,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=50))
def test_price_tier_matches_python(spark, prices):
    got = _run(spark, prices, "v double", rules.price_tier(F.col("v")))
    assert got == [_tier_py(p) for p in prices]


# ---------------------------------------------------------------- F7 safe cast

def _safe_int_py(s):
    if s is None:
        return None
    try:
        f = float(s)
        if math.isnan(f) or math.isinf(f):
            return None
        return int(f)
    except ValueError:
        return None


@FAST
@given(st.lists(st.one_of(
    st.none(),
    st.integers(-10**6, 10**6).map(str),
    st.floats(-10**6, 10**6, allow_nan=False, allow_infinity=False).map(str),
    st.text(max_size=8)), min_size=1, max_size=50))
def test_safe_int_cast_matches_python(spark, values):
    got = _run(spark, values, "v string", rules.safe_int_cast(F.col("v")))
    for g, v in zip(got, values):
        expected = _safe_int_py(v)
        # Spark's double parse accepts the same grammar as Python float()
        # for these inputs; both truncate toward zero on the int cast
        assert g == expected, (v, g, expected)


# ------------------------------------------------------------------ F1 md5 keys

@FAST
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=30))
def test_md5_key_matches_hashlib(spark, names):
    got = _run(spark, names, "v string", keys.md5_key("K", F.col("v")))
    expected = ["K_" + hashlib.md5(n.encode("utf-8")).hexdigest()[:14]
                for n in names]
    assert got == expected


# ------------------------------------------------------------- char shingles

def _shingles_py(s, k=3):
    n = max(len(s) - (k - 1), 1)
    out, seen = [], set()
    for i in range(n):
        g = s[i:i + k]
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


@FAST
@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=30))
def test_char_shingles_match_python(spark, texts):
    from walmart_project_etl_spark.operators.dedup import char_shingles
    got = _run(spark, texts, "v string", char_shingles(F.col("v"), 3))
    assert [list(g) for g in got] == [_shingles_py(t, 3) for t in texts]


# ------------------------------------------------------------- token counting

def _ws_tokens_py(t):
    """ASCII-whitespace tokenization (the operator's documented contract —
    hypothesis found that Python str.split also splits on U+00A0 etc.,
    which Java/RE2 \\s does not)."""
    import re
    stripped = re.sub(r"^\s+|\s+$", "", t, flags=re.ASCII)
    if not stripped:
        return 0
    return len(re.split(r"\s+", stripped, flags=re.ASCII))


@FAST
@given(st.lists(st.text(alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs")),
                        max_size=60), min_size=1, max_size=30))
def test_whitespace_token_count_matches_python(spark, texts):
    got = _run(spark, texts, "v string",
               text_ops.whitespace_token_count(F.col("v")))
    assert got == [_ws_tokens_py(t) for t in texts]
