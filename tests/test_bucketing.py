"""Bucketed tables: the write-once / join-forever co-location path
(SURVEY §6 — at 100 TB the lineitem⋈orders join never re-shuffles if
both sides are bucketed on orderkey). Asserts the actual plan property:
a join of two tables bucketed on the join key contains NO shuffle
exchange."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_dag_spark.sources.sinks import overwrite_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.range(1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 7).alias("o_flag")
    )
    lineitem = spark.range(4000).select(
        (F.col("id") % 1000).alias("l_orderkey"), F.col("id").alias("l_id")
    )
    overwrite_bucketed_table(orders, "b_orders", 8, "o_orderkey", sort_col="o_orderkey")
    overwrite_bucketed_table(lineitem, "b_lineitem", 8, "l_orderkey", sort_col="l_orderkey")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # force SMJ path (no broadcast) so the bucketing is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # bucketing co-located both sides
    assert joined.count() == 4000


def test_bucketed_groupby_has_no_shuffle(spark, bucketed):
    agg = spark.table("b_lineitem").groupBy("l_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert agg.count() == 1000
