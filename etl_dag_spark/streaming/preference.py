"""Streaming Pareto-front maintenance — the incremental twin of
``operators/preference.py::skyline``.

The skyline is a LOSSLESS summary of its input for dominance queries:
``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` (dominance is
transitive, so any row dominated in the union is dominated by a member
of some part's front). That makes the CMS/moment delta-store recipe
apply verbatim: each micro-batch writes its OWN local front to a
deterministic ``batch=<id>`` directory (overwrite — an at-least-once
replay rewrites identical rows instead of duplicating them), and the
read folds the union of stored fronts through one more skyline pass.
No read-modify-write state, no txn log; the store holds Σ per-batch
front sizes, a vanishing fraction of the stream for correlated
dimensions.

A live leaderboard ("best items seen so far, no agreed weighting")
stays current during ingest without re-scanning history — the
preference-query analogue of the streaming HLL/KMV/CMS maintenance
loops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from etl_dag_spark.operators.preference import skyline


def stream_skyline(
    rows_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    dims: list[str],
) -> "pyspark.sql.streaming.StreamingQuery":
    """Maintain a Pareto-front store over a row stream: every
    micro-batch's LOCAL skyline (maximizing ``dims``) lands by
    overwrite under ``batch=<id>`` — idempotent under foreachBatch's
    at-least-once replay, exactly like the moment/CMS delta stores.
    ``read_skyline_store`` folds the store to the exact front of
    everything ingested."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        skyline(batch_df, dims).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_path, f"batch={batch_id}")
        )

    return (
        rows_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_skyline_store(
    spark: SparkSession, store_path: str, dims: list[str]
) -> DataFrame:
    """Fold a :func:`stream_skyline` store to the EXACT global front:
    one more skyline pass over the union of per-batch fronts equals the
    one-shot skyline of every ingested row (the two-phase property).
    The ``batch=<id>`` layout is a store implementation detail — Spark
    partition-infers it as a column, which must not leak into the
    returned frame (the fold's schema is the ingested rows' schema)."""
    return skyline(spark.read.parquet(store_path).drop("batch"), dims)
