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


# ---------------------------------------------------------------------
# Real-codec seam: pure-numpy BMP / PPM / PGM decode (no PIL in this
# container). Encoders live here in the tests; the decoder is product
# code (multimodal.decode_image).
# ---------------------------------------------------------------------

import numpy as np


def _encode_bmp(rgb: "np.ndarray") -> bytes:
    """Minimal 24-bpp BI_RGB bottom-up BMP writer. ``rgb`` is
    (h, w, 3) uint8 in R,G,B order; rows padded to 4 bytes."""
    h, w, _ = rgb.shape
    stride = ((24 * w + 31) // 32) * 4
    pad = b"\x00" * (stride - w * 3)
    bgr = rgb[:, :, ::-1]  # file stores B,G,R
    px = b"".join(bgr[r].tobytes() + pad for r in range(h - 1, -1, -1))
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(px)).to_bytes(4, "little")
        + b"\x00" * 4
        + off.to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(px).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + dib + px


def _encode_pgm(gray: "np.ndarray") -> bytes:
    h, w = gray.shape
    return f"P5\n# test\n{w} {h}\n255\n".encode() + gray.tobytes()


def _natural_image(seed: int, h: int = 64, w: int = 64) -> "np.ndarray":
    """Low-frequency sinusoid mix — the natural-image spectral shape
    pHash assumes (smooth, energy concentrated at low frequencies)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w))
    for _ in range(6):
        fy, fx = rng.uniform(0.5, 3.0, 2)
        p0, p1 = rng.uniform(0, 2 * np.pi, 2)
        img += rng.uniform(0.5, 1.0) * np.sin(
            2 * np.pi * fy * y / h + p0
        ) * np.sin(2 * np.pi * fx * x / w + p1)
    img = (img - img.min()) / (np.ptp(img) + 1e-9) * 255.0
    return img.astype(np.uint8)


def test_decode_bmp_exact_luma():
    from etl_dag_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    img = decode_image(_encode_bmp(rgb))
    assert img is not None and img.shape == (5, 7)
    want = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    ).astype(np.float64)
    assert np.allclose(img, want)


def test_decode_pgm_exact():
    from etl_dag_spark.operators.multimodal import decode_image

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    img = decode_image(_encode_pgm(gray))
    assert img is not None and img.shape == (3, 4)
    assert np.allclose(img, gray.astype(np.float64))


def test_decode_ppm_p6():
    from etl_dag_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    payload = b"P6\n6 4\n255\n" + rgb.tobytes()
    img = decode_image(payload)
    assert img is not None and img.shape == (4, 6)
    want = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    assert np.allclose(img, want)


def test_decode_rejects_opaque_bytes():
    from etl_dag_spark.operators.multimodal import decode_image

    assert decode_image(b"just some text, not an image") is None
    assert decode_image(b"") is None
    assert decode_image(b"BMxx") is None  # truncated header


def test_media_meta_reports_real_dims_for_bmp(spark):
    raw = _encode_bmp(np.dstack([_natural_image(1, 17, 23)] * 3))
    docs = spark.createDataFrame(
        [(1, bytearray(raw), "image/bmp")],
        "doc_id long, payload binary, media_type string",
    )
    r = extract_media_meta(docs).collect()[0]
    assert (r.width, r.height) == (23, 17)
    assert r.magic == raw[:4].hex()


def test_phash_dedup_on_real_bmp_images(spark):
    """VERDICT r7 #8: planted-dup recall on REAL image bytes — encode
    natural-spectrum rasters as actual BMPs, decode through the real
    codec path, and require the pHash pipeline to pair each image with
    its locally-edited near-dup while keeping unrelated images apart."""
    from etl_dag_spark.operators.dedup import banded_hamming_pairs
    from etl_dag_spark.operators.multimodal import PHASH_BANDS, phash_signatures

    rows = []
    for i in range(30):
        base = _natural_image(seed=100 + i)
        rows.append((i, bytearray(_encode_bmp(np.dstack([base] * 3)))))
        edited = base.copy()  # local edit: one 8x8 patch brightened
        # +25 keeps planted hamming ≤ 6 (unrelated pairs sit at ≥ 25);
        # the 4×16-bit banding GUARANTEES candidacy only at d ≤ 3, so a
        # harsher edit trades recall for nothing the margin needs
        edited[20:28, 30:38] = np.clip(
            edited[20:28, 30:38].astype(np.int64) + 25, 0, 255
        ).astype(np.uint8)
        rows.append((1000 + i, bytearray(_encode_bmp(np.dstack([edited] * 3)))))
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    sig = phash_signatures(docs)
    pairs = banded_hamming_pairs(sig, bands=PHASH_BANDS, max_hamming=8)
    got = {(r.doc_id_a, r.doc_id_b) for r in pairs.collect()}
    planted = {(i, 1000 + i) for i in range(30)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, f"planted-pair recall {recall}"
    assert len(got - planted) <= 3, sorted(got - planted)[:10]


def test_resize_real_image_is_mean_pooled_thumbnail(spark):
    from etl_dag_spark.operators.multimodal import pool_raster, resize_media

    base = _natural_image(seed=9, h=48, w=48)
    docs = spark.createDataFrame(
        [(1, bytearray(_encode_bmp(np.dstack([base] * 3))))],
        "doc_id long, payload binary",
    )
    r = resize_media(docs, width=8, height=8).collect()[0]
    assert r.n_bytes_out == 64
    got = np.frombuffer(bytes(r.resized), dtype=np.uint8).reshape(8, 8)
    want = np.clip(pool_raster(base.astype(np.float64), 8, 8), 0, 255).astype(
        np.uint8
    )
    assert np.array_equal(got, want)


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


def test_pool_raster_upscale_fills_every_cell():
    """Inputs smaller than the target grid must not leave zero-filled
    buckets (the 16x16-image-pHashes-a-zero-lattice bug): unmapped
    cells take the inverse nearest source pixel."""
    from etl_dag_spark.operators.multimodal import pool_raster

    img = np.arange(16, dtype=np.float64).reshape(4, 4) + 1.0  # min 1.0
    up = pool_raster(img, 8, 8)
    assert up.shape == (8, 8)
    assert up.min() >= 1.0  # no zero cells
    # every output cell equals its nearest-mapped source pixel
    src_r = (np.arange(8) * 4) // 8
    src_c = (np.arange(8) * 4) // 8
    assert np.array_equal(up, img[src_r[:, None], src_c[None, :]])
    # downscale path unchanged: exact area mean
    down = pool_raster(img, 2, 2)
    assert np.array_equal(down, img.reshape(2, 2, 2, 2).mean(axis=(1, 3)))


def test_phash_collides_across_renderings_of_the_same_picture(spark):
    """A 16x16 and a 64x64 rendering of the same natural image must
    land within banded-dedup range of each other now that upscaling
    fills unmapped grid cells from the image instead of zeros."""
    from etl_dag_spark.operators.dedup import banded_hamming_pairs
    from etl_dag_spark.operators.multimodal import (
        PHASH_BANDS,
        phash_signatures,
        pool_raster,
    )

    rows = []
    for i in range(8):
        big = _natural_image(seed=500 + i, h=64, w=64)
        small = pool_raster(big.astype(np.float64), 16, 16).astype(np.uint8)
        rows.append((i, bytearray(_encode_bmp(np.dstack([big] * 3)))))
        rows.append(
            (1000 + i, bytearray(_encode_bmp(np.dstack([small] * 3))))
        )
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = banded_hamming_pairs(
        phash_signatures(docs), bands=PHASH_BANDS, max_hamming=10
    )
    got = {(r.doc_id_a, r.doc_id_b) for r in pairs.collect()}
    planted = {(i, 1000 + i) for i in range(8)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.75, f"cross-resolution recall {recall}: {sorted(got)}"
