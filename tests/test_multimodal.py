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


def test_phash_identical_payloads_hash_identically(spark):
    from etl_dag_spark.operators.multimodal import phash_signatures

    docs = spark.createDataFrame(
        [(1, "the quick brown fox " * 30), (2, "the quick brown fox " * 30)],
        "doc_id long, text string",
    )
    sig = {r.doc_id: (r.b0, r.b1, r.b2, r.b3) for r in phash_signatures(
        attach_binary_payload(docs)
    ).collect()}
    assert sig[1] == sig[2]


def test_phash_dedup_finds_planted_image_dups(spark):
    """End-to-end image dedup: near-identical payloads (a few appended
    bytes — the stub raster keeps the shared prefix) land in one
    cluster; unrelated payloads stay apart."""
    from etl_dag_spark.operators.dedup import banded_hamming_pairs, cluster_pairs
    from etl_dag_spark.operators.multimodal import PHASH_BANDS, phash_signatures

    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        body = " ".join(
            "".join(rng.choice("abcdefghijklmnop") for _ in range(5)) for _ in range(120)
        )
        rows.append((i, body))
        rows.append((1000 + i, body + " zz"))  # planted near-dup of i
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = phash_signatures(attach_binary_payload(docs))
    pairs = banded_hamming_pairs(sig, bands=PHASH_BANDS, max_hamming=8)
    got = {(r.doc_id_a, r.doc_id_b) for r in pairs.collect()}
    planted = {(i, 1000 + i) for i in range(40)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, f"planted-pair recall {recall}"
    # precision: at most a few accidental cross-document collisions
    assert len(got - planted) <= 4, sorted(got - planted)[:10]

    clusters = cluster_pairs(pairs, docs)
    canon = clusters.where("is_canonical").count()
    # ~40 clusters of 2 (+ any unpaired docs standing alone)
    assert canon <= 80 - int(0.9 * 40)
