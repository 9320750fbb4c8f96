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


# ------------------------------------------------- real-pixel video (r10)


def _gray(level: float, seed: int = 0, hw: int = 16):
    import numpy as np

    y, x = np.mgrid[0:hw, 0:hw]
    img = level + 30.0 * np.sin(2 * np.pi * ((1 + seed) * y + 2 * x) / hw)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def _pgm(gray) -> bytes:
    h, w = gray.shape
    return f"P5\n{w} {h}\n255\n".encode() + gray.tobytes()


def test_split_raster_stream_demuxes_mixed_frames():
    from etl_dag_spark.operators.multimodal import (
        encode_bmp_gray,
        split_raster_stream,
    )

    a, b = encode_bmp_gray(_gray(60)), _pgm(_gray(200))
    frames = split_raster_stream(a + b + a)
    assert frames == [a, b, a]
    # opaque bytes and truncated rasters are rejected whole, not half-split
    assert split_raster_stream(b"not a raster") is None
    assert split_raster_stream(a + b"junk") is None
    assert split_raster_stream(a[:40]) is None
    assert split_raster_stream(b"") is None


def test_scene_cuts_on_real_bmp_stream(spark):
    """VERDICT r9 #4: two scenes of REAL decoded rasters -> exactly one
    cut at the scene boundary, frame count from the demux (not the
    fixed chunk count)."""
    from etl_dag_spark.operators.multimodal import (
        detect_scene_cuts,
        encode_bmp_gray,
    )

    bright, dark = encode_bmp_gray(_gray(200)), encode_bmp_gray(_gray(60))
    stream = bright * 3 + dark * 3
    df = spark.createDataFrame(
        [(1, stream)], "doc_id long, payload binary"
    )
    r = detect_scene_cuts(df, n_frames=8).collect()[0]
    assert (r.n_frames, r.n_cuts, list(r.cut_indices)) == (6, 1, [3])


def test_scene_cuts_run_on_decoded_luma_not_container_bytes(spark):
    """The SAME picture re-encoded (BMP <-> PGM: wildly different bytes)
    must NOT register a cut — proof the histogram is computed on
    decoded pixels; a genuinely different picture across the same
    encoding boundary still cuts."""
    from etl_dag_spark.operators.multimodal import (
        decode_image,
        detect_scene_cuts,
        encode_bmp_gray,
    )
    import numpy as np

    img_a, img_b = _gray(200, seed=1), _gray(60, seed=2)
    # sanity: the two renderings decode to the identical luma raster
    assert np.array_equal(
        np.round(decode_image(encode_bmp_gray(img_a))),
        np.round(decode_image(_pgm(img_a))),
    )
    df = spark.createDataFrame(
        [
            (1, encode_bmp_gray(img_a) + _pgm(img_a)),  # re-encoding only
            (2, encode_bmp_gray(img_a) + _pgm(img_b)),  # real content cut
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in detect_scene_cuts(df).collect()}
    assert got[1].n_cuts == 0
    assert got[2].n_cuts == 1 and list(got[2].cut_indices) == [1]


def test_attach_video_payload_scene_structure(spark):
    """The synthesized streams carry 1 + doc_id % 3 scenes -> the
    detector reports doc_id % 3 cuts on real pixels; doc_id % 7 == 0
    docs are opaque and take the 8-chunk stub path."""
    from etl_dag_spark.operators.multimodal import (
        attach_video_payload,
        detect_scene_cuts,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "pad " * 40) for i in range(1, 12)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in detect_scene_cuts(attach_video_payload(docs)).collect()
    }
    for i in range(1, 12):
        if i % 7 == 0:
            assert got[i].n_frames == 8  # stub chunking, opaque bytes
        else:
            assert got[i].n_frames == 8 and got[i].n_cuts == i % 3, (
                i,
                got[i],
            )
