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


def test_closed_sessions_survive_restart_exactly_once(spark, tmp_path):
    """VERDICT r9 #8: the closed-session emitter's state lives in the
    checkpoint's state store — a restarted query must neither re-emit a
    session already closed before the restart nor lose one that was
    still open across it (it closes exactly once, after the restart)."""
    import time as _time

    from etl_dag_spark.streaming.stateful import closed_user_sessions

    t0 = 1_700_000_000_000_000  # µs
    src = str(tmp_path / "ss_src")
    target = str(tmp_path / "ss_out")
    ckpt = str(tmp_path / "ss_ckpt")

    def write(rows):
        spark.createDataFrame(rows, "user_id bigint, us bigint").select(
            "user_id", F.timestamp_micros("us").alias("ts_utc")
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        q = (
            closed_user_sessions(
                spark.readStream.schema("user_id bigint, ts_utc timestamp")
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                gap_seconds=60,
                watermark="10 seconds",
            )
            .writeStream.format("parquet")
            .option("path", target)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: u1's session [t0, t0+10s] closed INLINE by its t0+1h
    # event; u2's [t0+1h] session still open in the state store
    write([(1, t0), (1, t0 + 10_000_000)])
    _time.sleep(1.05)
    write([(1, t0 + 3_600_000_000), (2, t0 + 3_600_000_000)])
    run_once()
    first = [
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.read.parquet(target).collect()
    ]
    assert first == [(1, t0, t0 + 10_000_000, 2)]

    # restart with NEW data: u2's session gains an in-gap event and is
    # then closed inline by its t0+2h successor — emitted once, with
    # state (start, n) carried across the restart; u1's closed session
    # must NOT re-emit even though its closing file re-window spans runs
    write([(2, t0 + 3_630_000_000), (2, t0 + 7_200_000_000)])
    run_once()
    got = sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.read.parquet(target).collect()
    )
    assert got == [
        (1, t0, t0 + 10_000_000, 2),
        # u1's t0+1h session closed by TIMEOUT in run 2 (watermark
        # reached t0+7190s) — once, not lost, not duplicated
        (1, t0 + 3_600_000_000, t0 + 3_600_000_000, 1),
        (2, t0 + 3_600_000_000, t0 + 3_630_000_000, 2),
    ]
