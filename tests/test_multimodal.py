"""Multimodal binary-column plumbing: Arrow-batched mapInPandas
metadata/decode-stub extraction over opaque binary payloads
(SURVEY §2d #32). The decode itself is a deterministic stub; the
schema, batching, and checksum plumbing are real.
"""

from __future__ import annotations

import hashlib

from etl_dag_spark.operators.multimodal import (
    attach_binary_payload,
    extract_media_meta,
)


def test_extract_media_meta_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "§ünïcode…")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in extract_media_meta(attach_binary_payload(docs)).collect()}
    assert set(out) == {1, 2, 3}
    for doc_id, text in [(1, "hello world"), (2, ""), (3, "§ünïcode…")]:
        raw = text.encode("utf-8")
        r = out[doc_id]
        assert r.n_bytes == len(raw)
        assert r.checksum == hashlib.md5(raw).hexdigest()
        assert r.magic == raw[:4].hex()
        assert r.media_type == "application/octet-stream"
        # stub decode: deterministic dimensions from payload length
        assert (r.width, r.height) == ((len(raw) % 640) + 1, (len(raw) % 480) + 1)


def test_extract_schema_stable(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    df = extract_media_meta(attach_binary_payload(docs))
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,n_bytes:bigint,"
        "magic:string,width:int,height:int,checksum:string>"
    )


def test_extract_is_distributed(spark):
    """Plumbing must hold across many partitions/batches, not just one."""
    docs = (
        spark.range(0, 500)
        .selectExpr("id AS doc_id", "repeat('ab', CAST(id % 97 AS INT)) AS text")
        .repartition(8)
    )
    out = extract_media_meta(attach_binary_payload(docs))
    assert out.count() == 500
    assert out.where("n_bytes != 2 * (doc_id % 97)").count() == 0
