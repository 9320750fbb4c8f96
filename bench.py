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


def skew_scenario(spark, sf_dir: str, timings: dict[str, float]) -> None:
    """Pathological-key join bench: 80% of an exploded lineitem fact
    lands on ONE key, joined one-to-many (20 variants/key) against a
    1000-key dim with broadcast disabled — the hot reducer must emit
    0.8·N·20 rows in a single task. Three timings prove the mitigation
    moves wall-clock, not just the plan shape (tests/test_skew.py):

    - ``skew_join_unmitigated`` — plain shuffle join, AQE off
    - ``skew_join_salted``      — operators.skew.salted_join, AQE off
    - ``skew_join_aqe``         — plain join, AQE skew-split tuned to
      its most favorable settings at this size (8MB split threshold,
      2× factor — the defaults never trigger below 256MB). Measured:
      AQE splits the hot partition's sort/join but still loses ~2× to
      salting, because the split happens after one reducer's worth of
      data is already fetched hot; salting balances the map-side
      write too. Recorded to show why the structural fix exists.

    The fact is pre-materialized to parquet so the timed region is the
    join, not the generator.
    """
    import tempfile

    from pyspark.sql import functions as F

    from etl_dag_spark.operators.skew import salted_join

    fact_path = os.path.join(tempfile.mkdtemp(prefix="bench_skew_"), "fact")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    (
        li.select("l_orderkey", "l_quantity")
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(8))))
        .withColumn(
            "k",
            F.when(F.col("l_orderkey") % 10 < 8, F.lit(0).cast("long")).otherwise(
                F.pmod(F.col("l_orderkey"), F.lit(1000))
            ),
        )
        .drop("rep")
        .write.mode("overwrite")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = (
        spark.range(1000)
        .select(F.col("id").alias("k"))
        .withColumn("variant", F.explode(F.sequence(F.lit(1), F.lit(20))))
        .withColumn("weight", F.col("k") * 100 + F.col("variant"))
    )

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")

    _TUNED = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    }

    def run(label: str, plan, aqe: bool, tuned: bool = False) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        olds = {k: spark.conf.get(k) for k in _TUNED}
        if tuned:
            for k, v in _TUNED.items():
                spark.conf.set(k, v)
        try:
            for _ in range(2):
                t0 = time.time()
                plan().write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                timings[label] = min(timings.get(label, dt), dt)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
            for k, v in olds.items():
                spark.conf.set(k, v)

    run("skew_join_unmitigated", lambda: fact.join(dim, "k"), aqe=False)
    run("skew_join_salted", lambda: salted_join(fact, dim, "k"), aqe=False)
    run("skew_join_aqe", lambda: fact.join(dim, "k"), aqe=True, tuned=True)


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

    skew_scenario(spark, sf_dir, timings)
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
