"""Incremental materialized-view maintenance over a streaming fact feed.

The warehouse pattern the reference's truncate-and-load DAG grows into
at scale (ETL_DAG.py:206-229 re-loads whole tables per run): instead of
recomputing an aggregate over 100 TB of facts on every refresh, fold
each arriving batch's PARTIAL aggregate into the stored view — correct
for any commutative-associative aggregate (SUM/COUNT here; the same
algebra the count-min delta store and the line-frequency store rely
on), and the refresh cost is the batch size, never the corpus.

Partition discipline: the view is partitioned by its group key (month);
a batch touches only the months it contains, and the rewrite uses
DYNAMIC partition overwrite so untouched months are never opened or
rewritten — at 100 TB of history, a daily batch rewrites one or two
partitions. The folded frame is eagerly localCheckpoint'd before the
write: the write plan then scans cached blocks instead of the view
files it is about to replace (no read-overwrite cycle, no staging-dir
swap needed for the group-key-bounded frame).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string,"
    " o_clerk string, o_shippriority int, o_comment string"
)


def read_orders_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(ORDERS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def monthly_revenue(orders: DataFrame) -> DataFrame:
    """The view definition, shared by the incremental maintainer and
    the full-recompute twin the equality test runs: exact integer-cents
    revenue and order count per order month."""
    return orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "revenue_cents"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )


def _fold(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("month")
        .agg(
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
        )
    )


def stream_maintain_monthly_revenue(
    orders_stream: DataFrame,
    mv_path: str,
    checkpoint_dir: str,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Maintain the monthly-revenue view incrementally: per micro-batch,
    fold the batch's partial aggregate into the stored months it
    touches and dynamically overwrite ONLY those partitions."""

    # the view's schema is a constant of the view definition — re-reads
    # pass it explicitly so no per-batch schema-inference job runs (r15)
    _MV_SCHEMA = "month string, revenue_cents bigint, n_orders bigint"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        delta = monthly_revenue(batch_df)
        exists = os.path.isdir(mv_path) and any(
            not f.startswith(("_", ".")) for f in os.listdir(mv_path)
        )
        if exists:
            months = [r.month for r in delta.select("month").distinct().collect()]
            current = spark.read.schema(_MV_SCHEMA).parquet(mv_path).where(
                F.col("month").isin(months)
            )
            folded = _fold(current, delta)
        else:
            folded = delta
        # eager checkpoint: the write must not re-read the files it is
        # replacing; the frame is group-key-bounded (months), so the
        # materialization is small by construction — and for the same
        # reason it coalesces to ONE task before the partitioned write
        # (guide §6: a multi-task write of a months-bounded frame emits
        # tasks×months near-empty files and pays a commit per file)
        folded = folded.coalesce(1).localCheckpoint()
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            folded.write.mode("overwrite").partitionBy("month").parquet(mv_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        orders_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
