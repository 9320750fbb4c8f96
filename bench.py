"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries execute through the noop sink (full materialization, no
driver-side collect) — the fair measure of plan execution cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from etl_dag_spark.session import get_spark

    spark = get_spark(app_name="etl-dag-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from etl_dag_spark.queries import SPARK_QUERIES

    # warm the JVM/codegen once on the cheapest query
    SPARK_QUERIES["bi_revenue_by_category"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # min-of-2 per query: the second pass runs against a warmed JVM and
    # irons out host-level CPU noise (observed 1.5x run-to-run swings on
    # shared hardware); min is the standard microbenchmark estimator of
    # the true cost
    from etl_dag_spark.operators.hierarchy import release_persisted

    timings: dict[str, float] = {}
    for _ in range(2):
        for name, fn in sorted(SPARK_QUERIES.items()):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            # reclaim iterative-operator frontier caches between queries
            release_persisted()
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "all_queries_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
