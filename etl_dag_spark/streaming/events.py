"""Structured Streaming jobs mirroring the batch event operators.

The batch DAG of the reference runs daily (ETL_DAG.py:254); the
streaming versions give the same results continuously. Each job here
has a batch twin in ``queries.py`` and a test asserting
stream-result == batch-result on the same input — the property that
matters when a pipeline is migrated from scheduled batch to streaming.

Scale notes: watermarks bound state; ``dropDuplicatesWithinWatermark``
bounds the dedup map; file sources at 100 TB become Kafka sources with
the identical plan after ``readStream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _event_schema(ts_type: str) -> str:
    return (
        f"event_id bigint, ts {ts_type}, user_id bigint, event_type string, "
        "value double, props string"
    )


def read_event_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream over event parquet files, schema-adaptive via
    the same footer sniff as the batch loader
    (``sources.tables.event_ts_encoding``) so the batch/stream twins
    can't drift: int64-nanos files declare ``ts bigint``; standard
    timestamp files declare ``ts timestamp_ntz``.

    Watermarks require TIMESTAMP (not TIMESTAMP_NTZ): epoch-micros is
    timezone-agnostic storage; the session tz only affects rendering,
    and the streaming jobs run under our UTC-pinned session factory.
    """
    from etl_dag_spark.sources.tables import _enable_legacy_nanos, event_ts_encoding

    enc = event_ts_encoding(src_dir)
    if enc in ("ns", "i64"):
        if enc == "ns":
            _enable_legacy_nanos(spark)
        raw = (
            spark.readStream.schema(_event_schema("bigint"))
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        return raw.withColumn("ts_utc", F.timestamp_micros(F.expr("ts DIV 1000")))
    raw = (
        spark.readStream.schema(_event_schema("timestamp_ntz"))
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return raw.withColumn(
        "ts_utc",
        F.timestamp_micros(
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        ),
    )


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + value sum per event_type with a
    watermark bounding state for late data."""
    return (
        events.withWatermark("ts_utc", watermark)
        .groupBy(F.window("ts_utc", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.sum(F.floor(F.col("value") * 100).cast("bigint")) / 100.0).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-merged) over the stream — the
    streaming twin of the batch ``olap_session_windows`` query. The
    watermark bounds session state: a session closes once event time
    passes its end by the watermark delay."""
    return (
        events.withWatermark("ts_utc", watermark)
        .groupBy(F.session_window("ts_utc", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark window —
    bounded state, the streaming twin of batch drop-duplicates."""
    return events.withWatermark("ts_utc", watermark).dropDuplicatesWithinWatermark(["event_id"])


def click_purchase_join(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same
    user's clicks in the preceding ``max_gap`` — funnel attribution as
    a continuous query. Both sides carry watermarks and the join
    condition bounds event-time distance, so Spark can expire join
    state (unbounded state is the failure mode of unconstrained
    stream-stream joins)."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts_utc").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts_utc").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_time"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
    )


def upsert_stream(
    stream_df: DataFrame,
    target_path: str,
    key_cols: list[str],
    order_col: str,
    checkpoint_dir: str,
    partition_col: str | None = None,
    timeout_s: int = 180,
    latest_wins: bool = True,
) -> None:
    """foreachBatch upsert sink: every micro-batch MERGEs into the
    parquet target (latest-per-key), giving an incrementally-maintained
    table instead of an append log — the streaming continuation of the
    reference's truncate-and-load. Exactly-once per key comes from the
    idempotence of the merge + the checkpointed source offsets."""
    from etl_dag_spark.sources.merge import merge_into_parquet

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_into_parquet(
            batch_df.sparkSession,
            target_path,
            batch_df,
            key_cols,
            order_col,
            partition_col=partition_col,
            latest_wins=latest_wins,
        )

    q = (
        stream_df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def run_to_memory(stream_df: DataFrame, name: str, timeout_s: int = 120,
                  mode: str = "complete") -> None:
    """Drain an availableNow stream into an in-memory table (tests).

    ``mode``: "complete" for aggregations (emits every window including
    ones still above the watermark — what the batch-equality tests
    need); "append" for non-aggregating streams like dedup, where
    complete mode is not allowed."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
