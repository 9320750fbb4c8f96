"""Streaming entity resolution over a persisted entity store.

The streaming twin of ``operators/entity.py::incremental_resolve`` —
records (customers, suppliers, crawl authors) arrive forever, each
micro-batch resolves against the kk-bucketed store of every previously
seen record's deletion-neighborhood keys, new entities register, and
cross-entity bridges append to the merge ledger instead of rewriting
history. State lives on disk ∝ records × name length, never in executor
memory — the same unbounded-history argument as the dedup signature
store (streaming/corpus.py::stream_incremental_dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_resolve_entities(
    records_stream: DataFrame,
    store_table: str,
    out_dir: str,
    checkpoint_dir: str,
    store_path: str | None = None,
    **resolve_kwargs,
) -> "pyspark.sql.streaming.StreamingQuery":
    """foreachBatch ER ingest: per micro-batch, resolve the batch's
    (record_id, name, cents) records with
    :func:`etl_dag_spark.operators.entity.incremental_resolve` and
    append the (record_id, entity_id, matched_store) assignments to
    ``out_dir``. Assignments are ARRIVAL-ORDER (a later bridge merges
    entities via the ledger, earlier emitted rows stand);
    ``read_resolved_entities`` over the store gives the canonical
    folded view at any point — for id-ordered micro-batches it equals
    one-shot ``resolve_entities`` (tests/test_streaming_entities.py).
    """
    from etl_dag_spark.operators.entity import incremental_resolve

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        assignment = incremental_resolve(
            batch_df, store_table, path=store_path, **resolve_kwargs
        )
        assignment.write.mode("append").parquet(out_dir)

    return (
        records_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
