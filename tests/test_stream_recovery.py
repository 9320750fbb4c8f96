"""Checkpoint recovery: a restarted stream resumes from committed
offsets — previously processed files are not reprocessed, new files
are, and the file sink stays exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_dag_spark.streaming.events import read_event_stream


def _write_batch(spark, src, lo, hi):
    spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.lit(1_700_000_000_000_000_000) + F.col("id") * 1_000_000_000).alias("ts"),
        (F.col("id") % 5).alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("id") * 1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).coalesce(1).write.mode("append").parquet(src)


def _run_once(spark, src, target, ckpt):
    q = (
        read_event_stream(spark, src)
        .select("event_id", "user_id", "value")
        .writeStream.format("parquet")
        .option("path", target)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_checkpoint_recovery_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, 0, 100)
    _run_once(spark, src, target, ckpt)
    assert spark.read.parquet(target).count() == 100
    # new data arrives; the restarted query must process ONLY the new file
    _write_batch(spark, src, 100, 150)
    _run_once(spark, src, target, ckpt)
    out = spark.read.parquet(target)
    assert out.count() == 150  # no reprocessing of the first 100
    assert out.select("event_id").distinct().count() == 150
