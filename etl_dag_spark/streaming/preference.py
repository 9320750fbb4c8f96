"""Streaming Pareto-front maintenance — the incremental twin of
``operators/preference.py::skyline``.

The skyline is a LOSSLESS summary of its input for dominance queries:
``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` (dominance is
transitive, so any row dominated in the union is dominated by a member
of some part's front). That makes the CMS/moment delta-store recipe
apply verbatim: each micro-batch writes its OWN local front to a
deterministic ``__batch=<id>`` directory (overwrite — an at-least-once
replay rewrites identical rows instead of duplicating them), and the
read folds the union of stored fronts through one more skyline pass.
No read-modify-write state, no txn log; the store holds Σ per-batch
front sizes, a vanishing fraction of the stream for correlated
dimensions.

The partition directory is named ``__batch`` (not ``batch``) so the
store layout cannot collide with a user column — ``__``-prefixed names
are rejected at wiring time, where a plain ``batch`` column is common
payload vocabulary. The ingested schema is pinned to a ``_schema.json``
sidecar when the stream is wired (underscore-prefixed files are
invisible to Spark's parquet discovery), so a store whose stream saw
zero non-empty batches still folds to an EMPTY frame of the right
schema instead of throwing.

A live leaderboard ("best items seen so far, no agreed weighting")
stays current during ingest without re-scanning history — the
preference-query analogue of the streaming HLL/KMV/CMS maintenance
loops.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from etl_dag_spark.operators.preference import skyline

_SCHEMA_FILE = "_schema.json"


def stream_skyline(
    rows_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    dims: list[str],
) -> "pyspark.sql.streaming.StreamingQuery":
    """Maintain a Pareto-front store over a row stream: every
    micro-batch's LOCAL skyline (maximizing ``dims``) lands by
    overwrite under ``__batch=<id>`` — idempotent under foreachBatch's
    at-least-once replay, exactly like the moment/CMS delta stores.
    ``read_skyline_store`` folds the store to the exact front of
    everything ingested."""
    clash = [c for c in rows_stream.columns if c.startswith("__")]
    if clash:
        raise ValueError(
            f"stream_skyline: columns {clash} collide with the store's "
            "__-prefixed partition layout — rename them upstream"
        )
    for c in dims:
        if c not in rows_stream.columns:
            raise ValueError(
                f"stream_skyline dim {c!r} not in stream: {rows_stream.columns}"
            )
    # pin the ingested schema driver-side at wiring time so an empty
    # store is readable; underscore prefix keeps it out of parquet
    # discovery
    os.makedirs(store_path, exist_ok=True)
    with open(os.path.join(store_path, _SCHEMA_FILE), "w") as fh:
        fh.write(rows_stream.schema.json())

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        skyline(batch_df, dims).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_path, f"__batch={batch_id}")
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
    The ``__batch=<id>`` layout is a store implementation detail —
    Spark partition-infers it as a column, which must not leak into the
    returned frame (the fold's schema is the ingested rows' schema). A
    store with zero non-empty batches folds to an empty frame of the
    schema pinned at wiring time."""
    schema_path = os.path.join(store_path, _SCHEMA_FILE)
    has_batches = os.path.isdir(store_path) and any(
        d.startswith("__batch=") for d in os.listdir(store_path)
    )
    if not has_batches:
        with open(schema_path) as fh:
            schema = StructType.fromJson(json.load(fh))
        return spark.createDataFrame([], schema)
    return skyline(spark.read.parquet(store_path).drop("__batch"), dims)
