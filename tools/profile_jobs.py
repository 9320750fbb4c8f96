"""Per-query job/stage/task-count profiler (VERDICT r14 #1/#8).

For each registered query: time the BUILD (the ``queries()`` callable)
and the EXECUTE (noop sink) separately, and count the Spark jobs,
stages and tasks each phase launched via ``sc.statusTracker`` job
groups. The per-query fixed job count is the scheduler cost a 100 TB
cluster pays per query — the r15 optimization target — and this output
is the checkable artifact for "fewer jobs" claims (committed under
plans/r15/).

Usage: python tools/profile_jobs.py [name ...]   (default: all)
Output: one JSON line per query to stdout:
  {"name":..., "build_sec":..., "exec_sec":..., "jobs":..., "stages":..., "tasks":...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from etl_dag_spark.session import get_spark, quiet_benign_logs

    spark = get_spark(app_name="profile-jobs", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    quiet_benign_logs(spark)

    from etl_dag_spark.operators.hierarchy import release_persisted
    from etl_dag_spark.queries import SPARK_QUERIES

    names = sys.argv[1:] or sorted(SPARK_QUERIES)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm codegen/JVM once
    SPARK_QUERIES["bi_revenue_by_category"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def counts(group: str) -> tuple[int, int, int]:
        jobs = tracker.getJobIdsForGroup(group)
        stages = 0
        tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    stages += 1
                    tasks += si.numTasks
        return len(jobs), stages, tasks

    for name in names:
        fn = SPARK_QUERIES[name]
        gb = f"build:{name}"
        sc.setJobGroup(gb, gb)
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        bj, bs, bt = counts(gb)
        ge = f"exec:{name}"
        sc.setJobGroup(ge, ge)
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        ej, es, et = counts(ge)
        sc.setJobGroup(None, None)
        release_persisted()
        print(
            json.dumps(
                {
                    "name": name,
                    "build_sec": round(t1 - t0, 3),
                    "exec_sec": round(t3 - t2, 3),
                    "total_sec": round((t1 - t0) + (t3 - t2), 3),
                    "build_jobs": bj,
                    "exec_jobs": ej,
                    "jobs": bj + ej,
                    "stages": bs + es,
                    "tasks": bt + et,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
