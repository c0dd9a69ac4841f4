#!/usr/bin/env python
"""Per-query job/stage/task profile: how many Spark jobs a registry
entry launches and where the wall time goes.

The bench (bench.py) times the noop materialization; for commit-heavy
entries (txn_*, stream_*) most of the wall time is EAGER work inside
the query function (table builds, commits, micro-batches), each a
separate Spark job whose fixed overhead dominates at bench scale.
This tool counts them so "fewer jobs / fewer passes" optimizations
(spark_optimization_guide.md section 1/2) can be verified empirically.

Usage:
    python tools/profile_query.py name [name ...]
    SF_DIR=/root/testdata/sf0.1 python tools/profile_query.py txn_agg_mv
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from walmart_project_etl_spark.queries import registry
    from walmart_project_etl_spark.session import get_spark

    spark = get_spark("wpe-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    reg = registry()

    names = sys.argv[1:]
    unknown = [n for n in names if n not in reg]
    assert not unknown, f"not in registry: {unknown}"

    # warmup so JVM/codegen cost doesn't land on the first profiled query
    reg["j02_broadcast_key_map_join"][0](spark, SF_DIR) \
        .write.format("noop").mode("overwrite").save()

    for name in names:
        fn, _ = reg[name]
        group = f"profile-{name}-{time.time_ns()}"
        sc.setJobGroup(group, name)
        try:
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.time() - t0
        finally:
            sc.setJobGroup(None, None)
        jobs = stages = tasks = 0
        try:
            tracker = sc.statusTracker()
            for jid in tracker.getJobIdsForGroup(group):
                jinfo = tracker.getJobInfo(jid)
                if jinfo is None:
                    continue
                jobs += 1
                for sid in jinfo.stageIds:
                    sinfo = tracker.getStageInfo(sid)
                    if sinfo is not None:
                        stages += 1
                        tasks += sinfo.numTasks
        except Exception as e:
            print(f"# tracker unavailable: {e}", file=sys.stderr)
        print(f"{name}: total={t_total:.2f}s build_phase={t_build:.2f}s "
              f"jobs={jobs} stages={stages} tasks={tasks}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
