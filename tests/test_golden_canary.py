"""Golden-drift canary (VERDICT r8 task 7): re-run the cheapest
pinned-golden queries at sf0.01 and compare against their
``queries/goldens/*.json`` row sets IN-PROCESS, so an environment change
(Spark/numpy float behavior shift — the pinned-environment assumption in
``queries/util.pinned``) surfaces as a named pytest failure with a
re-pin instruction, not as a surprise driver value-mismatch."""

from __future__ import annotations

import datetime
import decimal
import json
import os

import pytest

from walmart_project_etl_spark.queries import registry
from walmart_project_etl_spark.queries.util import GOLDENS_DIR

#: The cheap pinned queries (pure funcs.py column pipelines over one
#: small table — no /tmp warehouse fixtures, sub-second each). The other
#: pinned goldens are covered per-round by tools/check_oracle.py and the
#: driver; this canary exists to catch platform drift FAST, in pytest.
CANARY = ("f30_contact_synthesis", "f31_seeded_random_draws",
          "f32_synthetic_inventory_levels")


def _jsonable(v):
    """Collected Spark value → the golden's JSON value space (mirrors
    tools/pin_golden.py)."""
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


@pytest.mark.parametrize("name", CANARY)
def test_pinned_golden_still_reproduces(spark, name):
    golden = json.load(open(os.path.join(GOLDENS_DIR, f"{name}.json")))
    fn, _oracle = registry()[name]
    df = fn(spark, golden["sf_dir"])
    assert df.columns == [c["name"] for c in golden["columns"]], \
        f"{name}: schema drifted from its pinned golden"

    def key(r):
        return [(v is None, type(v).__name__, 0 if v is None else v)
                for v in r]

    got = sorted(([_jsonable(v) for v in r] for r in df.collect()), key=key)
    want = sorted(golden["rows"], key=key)
    assert got == want, (
        f"{name}: output drifted from queries/goldens/{name}.json — if "
        f"this is an intended engine change or a platform upgrade "
        f"(Spark/numpy float behavior), re-pin with "
        f"`python tools/pin_golden.py {name}` and re-verify with "
        f"`python tools/check_oracle.py {name}`; otherwise this is a "
        f"regression")


def test_golden_literal_non_finite_doubles_parse_in_duckdb():
    """ADVICE r8: non-finite doubles must render as quoted casts (bare
    `nan`/`inf` identifiers are DuckDB syntax errors) — so a future
    golden containing them fails at PIN time with a clear message, and
    the renderer stays safe for any golden that predates that guard."""
    import duckdb

    from walmart_project_etl_spark.queries.util import _golden_literal

    for v, probe in ((float("nan"), "isnan(x)"),
                     (float("inf"), "x = 'Infinity'::DOUBLE"),
                     (float("-inf"), "x = '-Infinity'::DOUBLE"),
                     (1.5, "x = 1.5")):
        lit = _golden_literal(v, "double")
        assert duckdb.sql(
            f"SELECT {probe} FROM (SELECT {lit} AS x)").fetchone()[0]


def test_pin_golden_rejects_non_finite_and_sorts_none_ties():
    """ADVICE r8: the pin tool refuses non-finite floats with a clear
    error, and its row sort is None-aware (no TypeError when rows tie up
    to a None-vs-value column)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "pin_golden", os.path.join(os.path.dirname(__file__), "..",
                                   "tools", "pin_golden.py"))
    pg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pg)

    with pytest.raises(ValueError, match="non-finite"):
        pg._jsonable(float("nan"))
    with pytest.raises(ValueError, match="non-finite"):
        pg._jsonable(float("inf"))
    assert pg._jsonable(2.5) == 2.5

    def row_key(r):
        return [(v is None, type(v).__name__, 0 if v is None else v)
                for v in r]

    rows = [[1, None], [1, 3], [1, None], [2, "a"]]
    assert sorted(rows, key=row_key) == [[1, 3], [1, None], [1, None],
                                         [2, "a"]]
