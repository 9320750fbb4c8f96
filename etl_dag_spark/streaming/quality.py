"""Streaming data-quality monitoring: the reference's validation gate
(ETL_DAG.py:90-142) as a continuously-maintained report.

Batch `operators/validation.py::dq_report` answers "how dirty is this
load"; an ingest feed needs "how dirty is everything so far, updated per
micro-batch, without rescanning history". Same mechanism as the other
delta stores (streaming/corpus.py): each batch appends its COUNTS (one
row per rule — a bounded frame, a constant of the rule list).

foreachBatch is AT-LEAST-ONCE (a crash between the append and the
checkpoint commit re-runs the batch), and count deltas are additive, so
the store must be replay-IDEMPOTENT by construction: every delta row
carries its ``batch_id``, and the read-time fold first collapses
duplicate (batch_id, rule) deliveries (MAX — replays carry identical
counts) before summing across batches. A replayed or double-delivered
batch therefore cannot inflate the report — the same discipline as the
HLL store's idempotent MAX, recovered here for an additive metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_dq_monitor(
    rows_stream: DataFrame,
    rules: list[tuple[str, str]],
    store_path: str,
    checkpoint_dir: str,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Maintain cumulative DQ counts for ``rules`` — (rule_name,
    SQL predicate) pairs evaluated against every streamed row; a row
    violates a rule when the predicate is not TRUE (NULL counts as a
    violation, matching the batch engine). Per micro-batch: ONE wide
    aggregate over the batch (operators/validation.py::rule_counts —
    one scan regardless of rule count, identifier-safe unpivot),
    stamped with the batch_id, appended to ``store_path``."""
    from etl_dag_spark.operators.validation import rule_counts

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            rule_counts(batch_df, rules)
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .write.mode("append")
            .parquet(store_path)
        )

    return (
        rows_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_dq_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold a delta store to the cumulative report: (rule_name,
    violations, total_rows). Replay-safe: duplicate (batch_id, rule)
    deliveries collapse first (MAX — a replayed batch appends
    identical counts), then the per-rule SUM across batches equals the
    one-shot report over everything ingested."""
    per_batch = (
        spark.read.parquet(store_path)
        .groupBy("batch_id", "rule_name")
        .agg(
            F.max("violations").alias("violations"),
            F.max("total_rows").alias("total_rows"),
        )
    )
    return per_batch.groupBy("rule_name").agg(
        F.sum("violations").cast("bigint").alias("violations"),
        F.sum("total_rows").cast("bigint").alias("total_rows"),
    )
