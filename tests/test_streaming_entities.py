"""Streaming entity resolution (streaming/entities.py): micro-batch
boundaries must not change the folded entity partition — a bridge
record arriving in a LATER batch merges two already-registered entities
through the ledger, and the read-time fold equals one-shot
resolve_entities over everything ingested."""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F  # noqa: F401 (parity with suite style)

from etl_dag_spark.operators.entity import (
    read_resolved_entities,
    resolve_entities,
)
from etl_dag_spark.streaming.entities import stream_resolve_entities

BATCH_A = [(1, "abcdef", 7), (3, "zzzz", 1), (5, "ab00ef", 7)]
BATCH_B = [(9, "abc0ef", 7), (11, "qqqq", 2), (13, "abcdef", 7)]


def test_stream_er_folded_view_equals_one_shot(spark, tmp_path):
    store = f"er_stream_{uuid.uuid4().hex[:10]}"
    src = str(tmp_path / "src")
    for rows in (BATCH_A, BATCH_B):
        spark.createDataFrame(
            rows, "record_id long, name string, cents long"
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)  # distinct mod-times: file source goes oldest-first

    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("record_id bigint, name string, cents bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_resolve_entities(
        stream,
        store,
        out,
        str(tmp_path / "ckpt"),
        store_path=str(tmp_path / "er_store"),
    )
    q.awaitTermination(120)

    # arrival-order emitted assignments: every record exactly once
    emitted = {r.record_id: r for r in spark.read.parquet(out).collect()}
    assert sorted(emitted) == [1, 3, 5, 9, 11, 13]
    assert emitted[9].matched_store and emitted[9].entity_id == 1

    folded = {
        r.record_id: r.entity_id
        for r in read_resolved_entities(spark, store).collect()
    }
    recs = spark.createDataFrame(
        BATCH_A + BATCH_B, "record_id long, name string, cents long"
    )
    one_shot = {
        r.record_id: r.entity_id
        for r in resolve_entities(recs, exact_cols=("cents",)).collect()
    }
    assert folded == one_shot
    assert folded[5] == 1  # batch-A entity 5 merged into 1 by the batch-B bridge
