#!/usr/bin/env python
"""Regenerate pinned-golden oracle row sets (queries/goldens/*.json).

For each named registry query: run it at sf0.01, run it AGAIN, refuse to
pin if the two row sets differ (nondeterminism guard), then write the
rows + Spark schema as JSON. ``queries.util.pinned(name)`` renders the
JSON back into a constant DuckDB ``VALUES`` SELECT at import time, so
the driver's value hash checks the full row set of outputs DuckDB cannot
recompute (seeded xxhash64, LSH hyperplanes, seeded KMeans, sketches).

Cross-session stability is proven separately: after pinning, run
``python tools/check_oracle.py <names>`` in a FRESH process — a green
row there is a second, independent evaluation of the same query.

Usage:
    python tools/pin_golden.py name [name ...]
    SF_DIR=/root/testdata/sf0.01 python tools/pin_golden.py ...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

#: Hard cap — a golden bigger than this belongs to a *_report reduction,
#: not a row pin (SQL text and review burden grow linearly with rows).
MAX_ROWS = 6000


def _jsonable(v):
    import datetime
    import decimal

    import math

    if v is None or isinstance(v, (int, str, bool)):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if not math.isfinite(v):
            # a NaN/inf would serialize as non-standard JSON and render
            # as a bare identifier DuckDB rejects — fail the PIN loudly
            # instead of breaking oracle rendering at import time
            raise ValueError(
                f"non-finite float {v!r} cannot be pinned — make the "
                f"query's output finite (coalesce/clamp) before pinning")
        return v
    if isinstance(v, datetime.date):
        return v.isoformat()
    raise TypeError(f"cannot pin value of type {type(v)}: {v!r}")


def main(names: list[str]) -> int:
    from walmart_project_etl_spark.queries.util import (GOLDENS_DIR,
                                                        _GOLDEN_TYPES)
    from walmart_project_etl_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    os.makedirs(GOLDENS_DIR, exist_ok=True)
    bad = 0
    for name in names:
        if name not in qs:
            print(f"✗ {name}: not in registry")
            bad += 1
            continue
        df = qs[name](spark, SF_DIR)
        types = dict(df.dtypes)
        odd = {c: t for c, t in types.items() if t not in _GOLDEN_TYPES}
        if odd:
            print(f"✗ {name}: unpinnable column types {odd}")
            bad += 1
            continue
        # None-aware sort key: plain sorted() raises TypeError when two
        # rows tie up to a column where one value is None
        def row_key(r):
            return [(v is None, type(v).__name__, 0 if v is None else v)
                    for v in r]

        rows1 = sorted(([_jsonable(v) for v in r] for r in df.collect()),
                       key=row_key)
        rows2 = sorted(([_jsonable(v) for v in r]
                        for r in qs[name](spark, SF_DIR).collect()),
                       key=row_key)
        if rows1 != rows2:
            print(f"✗ {name}: NONDETERMINISTIC across two runs — not pinned")
            bad += 1
            continue
        if len(rows1) > MAX_ROWS:
            print(f"✗ {name}: {len(rows1)} rows > cap {MAX_ROWS} — reduce "
                  f"to a report instead of pinning")
            bad += 1
            continue
        golden = {
            "sf_dir": SF_DIR,
            "columns": [{"name": c, "type": types[c]} for c in df.columns],
            "rows": rows1,
        }
        path = os.path.join(GOLDENS_DIR, f"{name}.json")
        with open(path, "w") as fh:
            json.dump(golden, fh, indent=None, separators=(",", ":"))
            fh.write("\n")
        print(f"✓ {name}: pinned {len(rows1)} rows → {path}")
    return 1 if bad else 0


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1:]))
