"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the single query registry in
``etl_dag_spark.queries`` — every operator from SURVEY.md §2 appears
there once, paired (where SQL-expressible) with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_dag_spark.queries import ORACLES, SPARK_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SPARK_QUERIES["bi_revenue_by_category"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; keys
    missing here (approximate LSH ops, mapInPandas plumbing) get the
    driver's weaker rows-only check, with recall/behavior asserted in
    tests/ instead."""
    return dict(ORACLES)
