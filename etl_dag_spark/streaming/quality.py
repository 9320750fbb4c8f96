"""Streaming data-quality monitoring: the reference's validation gate
(ETL_DAG.py:90-142) as a continuously-maintained report.

Batch `operators/validation.py::dq_report` answers "how dirty is this
load"; an ingest feed needs "how dirty is everything so far, updated per
micro-batch, without rescanning history". Same mechanism as the other
delta stores (streaming/corpus.py): each batch appends its COUNTS (one
row per rule — a bounded frame, a constant of the rule list), and the
read-time fold is a per-rule SUM. The fold is additive like the CMS
store (not idempotent), which is fine here: foreachBatch under a
checkpoint gives exactly-once batch delivery.
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
    aggregate over the batch (one scan regardless of rule count),
    unpivoted to (rule_name, violations, total_rows) delta rows,
    appended to ``store_path``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        aggs = [
            F.sum(F.when(F.expr(f"({pred}) IS NOT TRUE"), 1).otherwise(0))
            .cast("bigint")
            .alias(name)
            for name, pred in rules
        ]
        aggs.append(F.count(F.lit(1)).cast("bigint").alias("__total"))
        wide = batch_df.agg(*aggs)
        stack_args = ", ".join(f"'{name}', {name}" for name, _ in rules)
        (
            wide.selectExpr(
                f"stack({len(rules)}, {stack_args}) AS (rule_name, violations)",
                "__total AS total_rows",
            )
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
    violations, total_rows) — per-rule SUM over every batch's deltas,
    equal to the one-shot report over everything ingested."""
    return (
        spark.read.parquet(store_path)
        .groupBy("rule_name")
        .agg(
            F.sum("violations").cast("bigint").alias("violations"),
            F.sum("total_rows").cast("bigint").alias("total_rows"),
        )
    )
