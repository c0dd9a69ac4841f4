#!/usr/bin/env python
"""Capture .explain("formatted") for registry entries into plans/$PLANS_ROUND (default r16)/.

Usage:
    python tools/capture_plans.py before txn_agg_mv graph_pagerank_partsupp
    python tools/capture_plans.py after  txn_agg_mv

Writes plans/r15/<name>_<tag>.txt. For commit-heavy entries the eager
build runs as a side effect (the returned frame's plan is the final
read); the plan file still pins the declared query's physical shape —
scan pruning, join strategy, exchange count — which is what the
optimization evidence cites.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r16"))


def main() -> int:
    from walmart_project_etl_spark.queries import registry
    from walmart_project_etl_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), f"tag must be before/after: {tag}"

    spark = get_spark("wpe-plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    unknown = [n for n in names if n not in reg]
    assert not unknown, f"not in registry: {unknown}"
    os.makedirs(OUT_DIR, exist_ok=True)

    for name in names:
        fn, _ = reg[name]
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
