"""Resize and frame-sample plumbing: schema, fan-out shape,
determinism, and byte accounting (decode itself is a marked stub)."""

from __future__ import annotations

import hashlib

from etl_dag_spark.operators.multimodal import (
    attach_binary_payload,
    resize_media,
    sample_frames,
)


def _docs(spark):
    return attach_binary_payload(
        spark.createDataFrame(
            [(1, "x" * 1000), (2, "short"), (3, "")],
            "doc_id long, text string",
        )
    )


def test_resize_fixed_output_size(spark):
    out = {r.doc_id: r for r in resize_media(_docs(spark), 16, 8).collect()}
    for doc_id in (1, 2, 3):
        r = out[doc_id]
        assert (r.width, r.height) == (16, 8)
        assert r.n_bytes_out == 16 * 8  # every thumbnail is exactly w*h bytes
        assert len(bytes(r.resized)) == 16 * 8


def test_resize_is_deterministic(spark):
    a = {r.doc_id: bytes(r.resized) for r in resize_media(_docs(spark), 8, 8).collect()}
    b = {r.doc_id: bytes(r.resized) for r in resize_media(_docs(spark), 8, 8).collect()}
    assert a == b


def test_sample_frames_fanout_and_checksums(spark):
    rows = sample_frames(_docs(spark), n_frames=4).collect()
    assert len(rows) == 3 * 4  # one row per (doc, frame)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frames in by_doc.items():
        assert sorted(f.frame_idx for f in frames) == [0, 1, 2, 3]
        for f in frames:
            assert f.frame_checksum == hashlib.md5(bytes(f.frame)).hexdigest()
    # frames of the 1000-byte doc reassemble its prefix in order
    doc1 = sorted(by_doc[1], key=lambda f: f.frame_idx)
    assert b"".join(bytes(f.frame) for f in doc1) == b"x" * 1000


def test_extract_features_unit_norm_and_joinable(spark):
    import numpy as np

    from etl_dag_spark.operators.multimodal import extract_features
    from etl_dag_spark.operators.similarity import brute_force_topk
    from pyspark.sql import functions as F

    docs = attach_binary_payload(
        spark.createDataFrame(
            [(i, f"document number {i} body") for i in range(20)]
            + [(99, "document number 7 body")],  # identical text to doc 7
            "doc_id long, text string",
        )
    )
    emb = extract_features(docs, dim=32)
    rows = {r.doc_id: np.array(r.embedding) for r in emb.collect()}
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-5 for v in rows.values())
    assert np.allclose(rows[7], rows[99])  # identical payload → identical embedding
    # the output column feeds the ANN operators directly
    top = brute_force_topk(emb, F.col("doc_id") == 7, k=1, id_col="doc_id", vec_col="embedding")
    assert [r.neighbor_id for r in top.collect()] == [99]


def test_scene_cuts_flag_abrupt_content_change(spark):
    """A payload whose byte content flips halfway has exactly one cut
    at the boundary frame; a uniform payload has none (histogram-diff
    shot detection, Zhang et al. 1993)."""
    from etl_dag_spark.operators.multimodal import detect_scene_cuts

    two_scene = b"\x00" * 4096 + b"\xff" * 4096
    uniform = b"\x7f" * 8192
    df = spark.createDataFrame(
        [(1, two_scene), (2, uniform)], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in detect_scene_cuts(df, n_frames=8).collect()}
    assert got[1].n_cuts == 1 and got[1].cut_indices == [4]
    assert got[2].n_cuts == 0 and got[2].cut_indices == []
    assert got[1].n_frames == 8
