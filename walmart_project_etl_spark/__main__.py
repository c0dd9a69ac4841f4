"""CLI entry: run the full daily pipeline like the reference DAG.

``python -m walmart_project_etl_spark --csv <source.csv> --warehouse <dir>
--date 2026-08-14 --batch B1`` executes ingest → ODS → quality gates →
staging → target (SCD1/SCD2 + facts, two-phase commit) → BI aggregates
through :mod:`orchestrate` — per-stage retry, marker-based resume
(``--state-dir``), the reference DAG's ``retries=1`` semantics
(``dags/walmart_etl_pipeline_dag.py:254-264``) included.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="walmart_project_etl_spark")
    ap.add_argument("--csv", required=True, help="source CSV path")
    ap.add_argument("--warehouse", required=True, help="warehouse root dir")
    ap.add_argument("--date", required=True, help="run date YYYY-MM-DD")
    ap.add_argument("--batch", required=True, help="batch id, e.g. B1")
    ap.add_argument("--retries", type=int, default=1)
    ap.add_argument("--state-dir", default=None,
                    help="marker dir for resume-from-failed-stage")
    ap.add_argument("--force", action="store_true",
                    help="ignore resume markers and rerun every stage")
    ap.add_argument("--no-quality", action="store_true",
                    help="skip the row-count quality gates")
    args = ap.parse_args(argv)

    from walmart_project_etl_spark.orchestrate import (pipeline_stages,
                                                       run_stages)
    from walmart_project_etl_spark.session import get_spark

    spark = get_spark("wpe-cli")
    spark.sparkContext.setLogLevel("ERROR")
    stages = pipeline_stages(spark, args.csv, args.warehouse,
                             run_date=args.date, batch_id=args.batch,
                             enforce_quality=not args.no_quality)

    def log(kind: str, stage: str, attempt: int) -> None:
        print(f"[{kind}] {stage} (attempt {attempt})", file=sys.stderr)

    ran = run_stages(stages, retries=args.retries,
                     state_dir=args.state_dir, force=args.force,
                     on_event=log)
    print(f"pipeline complete: {len(ran)} stage(s) executed "
          f"({', '.join(ran) if ran else 'all previously done'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
