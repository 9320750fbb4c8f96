"""Streaming vector-store ingest: embeddings arrive continuously (the
output of an embedding service over a crawl feed) and fold into the
PERSISTED IVF index — the production ANN maintenance loop composed from
``operators/similarity.py``'s index primitives.

Per micro-batch: vectors are assigned under the index's STORED codebook
(k-means centroids trained once, offline — never retrained by the
stream) and appended to exactly the cell partitions the batch lands in.
Queries against the index see every ingested vector immediately,
because scoring keys on cell membership, not file boundaries; with a
quantized (IVF-SQ8) index the batch also encodes under the stored
scalar codebook, keeping old and new codes comparable.

Scale shape: state IS the index on disk (∝ corpus, never executor
memory); each micro-batch shuffles nothing — one Arrow assignment pass
and a partitioned append. Codebook drift (a corpus whose distribution
migrates away from the trained centroids) is handled the way production
systems do: rebuild offline, swap the index path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

EMBEDDING_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def read_embedding_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EMBEDDING_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def stream_index_vectors(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
) -> "pyspark.sql.streaming.StreamingQuery":
    """foreachBatch ingest into a persisted IVF index built by
    ``similarity.build_ivf_index`` — append-only partitioned parquet,
    existing files never rewritten. Equality with a one-shot union
    build under the same codebook is pinned in
    tests/test_streaming_corpus.py."""
    from etl_dag_spark.operators.similarity import append_to_ivf_index

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_ivf_index(batch_df, index_path)

    return (
        vec_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_moments(
    vec_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    quant: int = 1_000_000,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Cumulative embedding moment store — the INCREMENTAL-PCA
    maintenance loop: as embeddings stream in, each micro-batch's
    integer moment partials (n, Σx, upper-triangle Σxxᵀ from
    ``similarity.moment_partials`` over the quantized batch) APPEND to
    a parquet store as (i, j, v) cell deltas. Log-structured, no
    read-modify-write; the fold (:func:`read_moment_store`, cell-wise
    SUM) is commutative + associative — exactly the CMS delta-store
    shape (``corpus.stream_countmin``) — so feeding the folded cells
    into ``similarity.components_from_moments`` reproduces the
    one-shot ``embedding_pca`` covariance and components BIT-EXACTLY
    at any micro-batch boundary (pinned in
    tests/test_streaming_corpus.py). A training pipeline keeps its
    whitening transform current during ingest without ever re-scanning
    the corpus.

    Scale shape: state on disk is ≤ 1 + d + d·(d+1)/2 rows PER BATCH
    (a constant of the operator). Addition is NOT idempotent and
    foreachBatch is at-least-once (a crash between the store write and
    the checkpoint commit re-delivers the batch), so each batch's cells
    land by OVERWRITE into a deterministic ``batch=<id>`` directory — a
    replay rewrites the identical deltas in place instead of appending
    them twice, making the store idempotent without any txn log."""
    import os

    from etl_dag_spark.operators.similarity import (
        moment_partials,
        quantized_vectors,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        q = quantized_vectors(batch_df, "vec_id", "embedding", quant)
        moment_partials(q).write.mode("overwrite").parquet(
            os.path.join(store_path, f"batch={batch_id}")
        )

    return (
        vec_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_moment_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold a :func:`stream_moments` delta store to the current cell
    table: cell-wise SUM == moment merge over every ingested batch."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(store_path)
        .groupBy("i", "j")
        .agg(F.sum("v").cast("long").alias("v"))
    )
