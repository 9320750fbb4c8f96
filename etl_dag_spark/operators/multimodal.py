"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns next to a typed metadata
struct. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the one place Python is allowed, because codecs are
Python-side. Uncompressed raster formats (BMP, binary PPM/PGM) decode
FOR REAL via the pure-numpy :func:`decode_image` (no codec library
needed); anything else falls back to a deterministic stub behind the
same seam (`_stub_decode`), where an import-guarded PIL/libav call
would slot in for compressed formats. The Spark-side plumbing (schema,
batching, partitioning, UDF signature) is identical on both paths.

Scale notes: binary payloads dominate size, so the pipeline (a) keeps
them out of every shuffle (metadata-only projections until the final
map), (b) processes them in Arrow record batches with bounded
``maxRecordsPerBatch``, and (c) never collects them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, magic string, "
    "width int, height int, checksum string"
)


def attach_binary_payload(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-harness adapter: treat the utf-8 bytes of ``text`` as an
    opaque media payload so the binary plumbing is exercised end-to-end
    on real distributed data."""
    return documents.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def _stub_decode(payload: bytes) -> tuple[int, int]:
    """STUB: stands in for an opaque-format decode (PIL/libav not in
    this container). Deterministic fake dimensions derived from content
    length so tests are stable. Real raster formats (BMP, PPM/PGM) skip
    this — they go through :func:`decode_image`."""
    return (len(payload) % 640) + 1, (len(payload) % 480) + 1


def decode_image(payload: bytes):
    """Pure-numpy decode of the uncompressed raster formats: BMP
    (BITMAPINFOHEADER, BI_RGB, 8/24/32 bpp, bottom-up or top-down) and
    binary PPM (P6) / PGM (P5), maxval ≤ 255. Returns a 2-D float64
    grayscale array (ITU-R BT.601 luma for color), or ``None`` when the
    payload is not one of these formats — callers fall back to the
    deterministic stub, so the pipeline keeps working on opaque bytes.

    No codec library involved: header parse + ``np.frombuffer`` reshape
    only, so it runs in any executor Python. Compressed formats
    (JPEG/PNG) would slot in here behind the same ``None``-fallback
    seam via an import-guarded PIL call.
    """
    import numpy as np

    try:
        if payload[:2] == b"BM" and len(payload) >= 54:
            off = int.from_bytes(payload[10:14], "little")
            w = int.from_bytes(payload[18:22], "little", signed=True)
            h = int.from_bytes(payload[22:26], "little", signed=True)
            bpp = int.from_bytes(payload[28:30], "little")
            compression = int.from_bytes(payload[30:34], "little")
            if compression != 0 or bpp not in (8, 24, 32) or w <= 0 or h == 0:
                return None
            top_down, ah = h < 0, abs(h)
            stride = ((bpp * w + 31) // 32) * 4
            if off + stride * ah > len(payload):
                return None
            rows = np.frombuffer(
                payload, dtype=np.uint8, count=stride * ah, offset=off
            ).reshape(ah, stride)
            ch = bpp // 8
            px = rows[:, : w * ch].reshape(ah, w, ch).astype(np.float64)
            if not top_down:
                px = px[::-1]
            if ch == 1:  # 8-bit palette index treated as grayscale
                return px[:, :, 0]
            # BMP channel order is B,G,R(,A)
            return 0.114 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.299 * px[:, :, 2]
        if payload[:2] in (b"P5", b"P6"):
            # header: magic, width, height, maxval — whitespace-separated
            # with '#' comments; pixel data follows the single whitespace
            # byte after maxval
            pos, fields = 2, []
            while len(fields) < 3 and pos < len(payload):
                c = payload[pos : pos + 1]
                if c == b"#":
                    pos = payload.index(b"\n", pos) + 1
                elif c.isspace():
                    pos += 1
                else:
                    end = pos
                    while end < len(payload) and not payload[end : end + 1].isspace():
                        end += 1
                    fields.append(int(payload[pos:end]))
                    pos = end
            pos += 1  # the single whitespace after maxval
            w, h, maxval = fields
            if not (0 < maxval <= 255 and w > 0 and h > 0):
                return None
            ch = 3 if payload[:2] == b"P6" else 1
            if pos + w * h * ch > len(payload):
                return None
            px = (
                np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
                .reshape(h, w, ch)
                .astype(np.float64)
                * (255.0 / maxval)
            )
            if ch == 1:
                return px[:, :, 0]
            return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    except (ValueError, IndexError):
        return None
    return None


def pool_raster(img, out_h: int, out_w: int):
    """Exact area-mean pooling of a 2-D array to (out_h, out_w): each
    source pixel contributes to the bucket its index maps to, so any
    input size resamples deterministically in one O(h·w) pass — the
    resize primitive under pHash and thumbnailing (no scipy/PIL).

    UPSCALING (input smaller than the grid): the scatter pass leaves
    buckets no source pixel maps to; those are filled by the inverse
    nearest map (bucket → source pixel) instead of defaulting to 0 —
    otherwise a 16×16 and a 64×64 rendering of the same picture would
    pHash the zero lattice, not the image, and never collide."""
    import numpy as np

    h, w = img.shape
    r = (np.arange(h) * out_h) // h
    c = (np.arange(w) * out_w) // w
    sums = np.zeros((out_h, out_w))
    np.add.at(sums, (r[:, None], c[None, :]), img)
    counts = np.zeros((out_h, out_w))
    np.add.at(counts, (r[:, None], c[None, :]), 1.0)
    pooled = sums / np.maximum(counts, 1.0)
    if counts.min() == 0.0:
        src_r = (np.arange(out_h) * h) // out_h
        src_c = (np.arange(out_w) * w) // out_w
        nearest = img[src_r[:, None], src_c[None, :]]
        pooled = np.where(counts > 0, pooled, nearest)
    return pooled


def extract_media_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata/feature extraction over binary payloads.

    → (doc_id, media_type, n_bytes, magic, width, height, checksum)
    """
    cols = df.select("doc_id", "media_type", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def _dims(p: bytes) -> tuple[int, int]:
            img = decode_image(p)
            if img is not None:
                return img.shape[1], img.shape[0]
            return _stub_decode(p)

        for pdf in batches:
            payloads = pdf["payload"]
            dims = [_dims(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "magic": payloads.map(lambda p: bytes(p)[:4].hex()),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "checksum": payloads.map(lambda p: hashlib.md5(bytes(p)).hexdigest()),
                }
            )

    return cols.mapInPandas(run, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, resized binary, n_bytes_out bigint"
)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched resize: → (doc_id, width, height, resized,
    n_bytes_out). The pixel resample itself is STUBBED (no codec libs
    in this container) as a deterministic byte resample — take
    width×height evenly-spaced bytes, zero-padded — so output size,
    schema, and batching behave exactly like a real thumbnailer.
    Swap ``_stub_resize`` for PIL's ``Image.resize`` and nothing else
    changes."""
    cols = df.select("doc_id", "payload")

    def _stub_resize(payload: bytes) -> bytes:
        import numpy as np

        img = decode_image(payload)
        if img is not None:  # real raster: area-mean grayscale thumbnail
            return bytes(
                np.clip(pool_raster(img, height, width), 0, 255)
                .astype(np.uint8)
                .tobytes()
            )
        target = width * height
        if not payload:
            return b"\x00" * target
        step = max(len(payload) // target, 1)
        sampled = payload[::step][:target]
        return sampled + b"\x00" * (target - len(sampled))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda p: _stub_resize(bytes(p)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "resized": resized,
                    "n_bytes_out": resized.map(len).astype("int64"),
                }
            )

    return cols.mapInPandas(run, schema=RESIZED_SCHEMA)


FEATURES_SCHEMA = "doc_id bigint, embedding array<float>"


def extract_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """Arrow-batched feature extraction: binary payload → unit-norm
    ``array<float>`` embedding, the column the similarity/ANN operators
    consume. The encoder is STUBBED (no model runtime here) as a
    content-derived deterministic projection — md5 bytes seeded per
    chunk — so identical payloads embed identically and the
    Spark-side contract (schema, batching, downstream join shape) is
    fully real. Swap the body for a real encoder batch call."""
    import hashlib

    import numpy as np

    cols = df.select("doc_id", "payload")

    def _stub_embed(payload: bytes) -> list[float]:
        raw = hashlib.md5(payload).digest()
        rng = np.random.default_rng(int.from_bytes(raw[:8], "big"))
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v) or 1.0
        return [float(x) for x in v]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "embedding": pdf["payload"].map(lambda p: _stub_embed(bytes(p))),
                }
            )

    return cols.mapInPandas(run, schema=FEATURES_SCHEMA)


PHASH_BANDS = 4
PHASH_SCHEMA = "doc_id bigint, " + ", ".join(f"b{i} long" for i in range(PHASH_BANDS))


def phash_signatures(df: DataFrame, grid: int = 32, hash_size: int = 8) -> DataFrame:
    """Perceptual hash (pHash) per binary payload: decode to a
    ``grid``×``grid`` grayscale raster, 2-D type-II DCT, keep the
    ``hash_size``×``hash_size`` low-frequency block, threshold each
    coefficient → a 64-bit signature emitted as ``PHASH_BANDS`` 16-bit
    band columns (the layout
    :func:`etl_dag_spark.operators.dedup.banded_hamming_pairs` consumes,
    and the one that avoids int64 sign-bit overflow under ANSI mode).

    The DCT/threshold math is the real pHash pipeline (numpy matrix
    DCT, no codec dependency). BMP/PPM/PGM payloads decode for real
    (``decode_image`` → area-mean pool to the grid — the actual pHash
    front end); opaque payloads fall back to the stubbed raster
    (`_stub_raster`). pHash's robustness assumes the input
    has natural-image spectral structure (low-frequency energy ≫ the
    energy of a small local edit), so the stub integrates the payload
    bytes into a mean-centered random walk (1/f² spectrum) rather than
    using raw byte noise — raw bytes are white noise, where ANY
    spectral hash is unstable by construction. Bits are per-coefficient
    signs, not a median split: a global median couples all 64 bits to
    one statistic, so a tiny edit that nudges the median flips many
    bits at once (measured: median-split hamming ≈ 22 for a 3-byte
    edit vs ≤ 7 for sign bits, with unrelated payloads at ≥ 16). Swap
    `_stub_raster` for a real decoder and nothing downstream changes.

    Arrow-batched ``mapInPandas``; the DCT is one (grid×grid)·(grid×
    grid) matmul per image, vectorized over the batch.
    """
    import numpy as np

    cols = df.select("doc_id", "payload")
    n_bits = hash_size * hash_size
    assert n_bits % PHASH_BANDS == 0
    bits_per_band = n_bits // PHASH_BANDS

    # type-II orthonormal DCT matrix, built once per executor batch
    x = np.arange(grid)
    dct_m = np.cos(np.pi * (2 * x[None, :] + 1) * x[:, None] / (2 * grid))
    dct_m[0, :] /= np.sqrt(2)
    dct_m *= np.sqrt(2 / grid)

    def _stub_raster(payload: bytes) -> "np.ndarray":
        img = decode_image(payload)
        if img is not None:
            # real raster: area-mean pool to the DCT grid — the actual
            # pHash front end (decode → grayscale → downscale)
            return pool_raster(img, grid, grid)
        target = grid * grid
        if not payload:
            return np.zeros((grid, grid))
        step = max(len(payload) // target, 1)
        sampled = np.frombuffer(payload[::step][:target], dtype=np.uint8).astype(
            np.float64
        )
        walk = np.cumsum(sampled - sampled.mean())
        out = np.full(target, walk[-1])  # hold the last value in the pad
        out[: len(walk)] = walk
        return out.reshape(grid, grid)

    def run(batches):
        powers = (1 << np.arange(bits_per_band)).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # one batched DCT: (B, g, g) einsum against the basis, then
            # vectorized sign-bit packing — Python touches each payload
            # only to extract its raster
            rasters = np.stack([_stub_raster(bytes(p)) for p in pdf["payload"]])
            # batched GEMMs ((g,g)@(B,g,g)@(g,g) via matmul broadcasting);
            # einsum without optimize= would contract this as a naive
            # 5-index loop — ~1000x slower
            coeffs = dct_m @ rasters @ dct_m.T
            bits = coeffs[:, :hash_size, :hash_size].reshape(len(pdf), n_bits) > 0
            rows: dict[str, object] = {"doc_id": pdf["doc_id"]}
            for b in range(PHASH_BANDS):
                sl = bits[:, b * bits_per_band : (b + 1) * bits_per_band]
                rows[f"b{b}"] = pd.Series(sl @ powers, dtype="int64")
            yield pd.DataFrame(rows)

    return cols.mapInPandas(run, schema=PHASH_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary, frame_checksum string"


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Arrow-batched frame sampling: treat each binary payload as a
    "video" and emit ``n_frames`` evenly-spaced chunks as one row per
    frame — the fan-out shape (1 row in → n rows out via mapInPandas)
    a real keyframe extractor has. The chunking stands in for the
    codec's frame decode; checksums make each frame independently
    verifiable downstream."""
    cols = df.select("doc_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": [], "frame_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                chunk = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    frame = raw[i * chunk : (i + 1) * chunk] or b"\x00"
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(frame)
                    out["frame_checksum"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame": out["frame"],
                    "frame_checksum": out["frame_checksum"],
                }
            )

    return cols.mapInPandas(run, schema=FRAME_SCHEMA)


def decode_audio(payload: bytes):
    """Pure-numpy decode of uncompressed WAV (RIFF/WAVE, PCM format 1,
    8/16-bit, any channel count — downmixed to mono by channel mean).
    Returns ``(samples float64 in [-1, 1], sample_rate)`` or ``None``
    when the payload is not canonical PCM WAV — callers fall back to
    the deterministic stub, the same seam discipline as
    :func:`decode_image`. Chunk-walks the RIFF container (fmt/data can
    be preceded by LIST/fact chunks), no codec library involved.
    Compressed audio (MP3/FLAC) would slot in behind the same
    ``None``-fallback via an import-guarded libav call."""
    import numpy as np

    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = payload[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None or len(fmt) < 16:
            return None
        audio_format = int.from_bytes(fmt[0:2], "little")
        n_channels = int.from_bytes(fmt[2:4], "little")
        rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if audio_format != 1 or n_channels < 1 or rate <= 0 or bits not in (8, 16):
            return None
        if bits == 16:
            raw = np.frombuffer(
                data, dtype="<i2", count=len(data) // 2
            ).astype(np.float64) / 32768.0
        else:  # 8-bit WAV is unsigned, biased at 128
            raw = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        n = (len(raw) // n_channels) * n_channels
        mono = raw[:n].reshape(-1, n_channels).mean(axis=1)
        return mono, rate
    except (ValueError, IndexError):
        return None


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, decoded boolean, sample_rate int, duration_ms bigint, "
    "rms_x1e6 bigint, zero_crossings bigint, env_fp int"
)


def audio_features(df: DataFrame, n_bands: int = 16) -> DataFrame:
    """Per-payload audio features over the binary seam: duration, RMS
    (integer micro-units), zero-crossing count, and an ``n_bands``-bit
    ENVELOPE FINGERPRINT — per-band mean |amplitude| thresholded at the
    band median, so the fingerprint is invariant to volume scaling
    (the audio analog of pHash's DCT-median trick: re-encoded or
    re-normalized copies of the same recording collide, different
    material doesn't). Real WAV payloads decode via
    :func:`decode_audio`; opaque bytes fall back to deterministic
    length-derived stub features behind the same seam, flagged by
    ``decoded=false``.

    Scale shape: payloads never shuffle — one Arrow pass computes the
    ≤7-column feature row and drops the bytes; dedup/grouping runs on
    the fingerprint column only. ``repartition`` upstream if the
    source is a single file (the pHash lesson)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "decoded", "sample_rate", "duration_ms",
                "rms_x1e6", "zero_crossings", "env_fp",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                dec = decode_audio(p)
                out["doc_id"].append(int(doc_id))
                if dec is None:
                    out["decoded"].append(False)
                    out["sample_rate"].append(8000)
                    out["duration_ms"].append(len(p) % 60_000)
                    out["rms_x1e6"].append(len(p) % 1_000_000)
                    out["zero_crossings"].append(len(p) % 4096)
                    out["env_fp"].append(len(p) % (1 << n_bands))
                    continue
                x, rate = dec
                n = len(x)
                out["decoded"].append(True)
                out["sample_rate"].append(int(rate))
                out["duration_ms"].append(int(n * 1000 // rate) if rate else 0)
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                out["rms_x1e6"].append(int(rms * 1_000_000))
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                )
                if n >= n_bands:
                    cuts = (np.arange(n_bands + 1) * n) // n_bands
                    env = np.array(
                        [np.mean(np.abs(x[cuts[i]:cuts[i + 1]]))
                         for i in range(n_bands)]
                    )
                    bits = env > np.median(env)
                    out["env_fp"].append(int(bits.dot(1 << np.arange(n_bands))))
                else:
                    out["env_fp"].append(0)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def attach_wav_payload(documents: DataFrame, rate: int = 4000) -> DataFrame:
    """Test-harness adapter (the audio twin of
    :func:`attach_binary_payload`): synthesize a REAL canonical PCM WAV
    per document — a 0.1 s tone whose frequency and amplitude envelope
    derive deterministically from (doc_id, n_chars) — so the decode
    path runs on genuine RIFF bytes end-to-end on distributed data.
    Documents with doc_id % 7 == 0 instead carry their utf-8 text bytes
    (opaque), exercising the stub fallback in the same pass."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = rate // 10
        t = np.arange(n) / rate
        for pdf in batches:
            payloads = []
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                did = int(doc_id)
                if did % 7 == 0:
                    payloads.append(str(text).encode("utf-8"))
                    continue
                freq = 200 + (did % 20) * 50
                # envelope rises or decays by content-length parity
                env = t / t[-1] if int(n_chars) % 2 else 1 - t / t[-1]
                x = 0.1 + 0.7 * env * np.sin(2 * np.pi * freq * t)
                data = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
                fmt = (
                    (1).to_bytes(2, "little")
                    + (1).to_bytes(2, "little")
                    + rate.to_bytes(4, "little")
                    + (rate * 2).to_bytes(4, "little")
                    + (2).to_bytes(2, "little")
                    + (16).to_bytes(2, "little")
                )
                body = (
                    b"fmt " + len(fmt).to_bytes(4, "little") + fmt
                    + b"data" + len(data).to_bytes(4, "little") + data
                )
                payloads.append(
                    b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return documents.select("doc_id", "text", "n_chars").mapInPandas(
        run, "doc_id bigint, payload binary"
    )


def raster_frame_length(payload: bytes, pos: int = 0) -> int | None:
    """Byte length of the single BMP / P6 / P5 raster starting at
    ``pos`` inside ``payload``, or ``None`` if no well-formed raster
    starts there. This is the frame-boundary parse a multi-frame
    raster stream (our container-free stand-in for a video file)
    needs: BMP declares its total size in the file header; PPM/PGM
    end exactly ``w*h*ch`` bytes after the maxval whitespace."""
    head = payload[pos : pos + 2]
    try:
        if head == b"BM" and len(payload) - pos >= 54:
            size = int.from_bytes(payload[pos + 2 : pos + 6], "little")
            if 54 <= size <= len(payload) - pos:
                return size
            return None
        if head in (b"P5", b"P6"):
            p, fields = pos + 2, []
            while len(fields) < 3 and p < len(payload):
                c = payload[p : p + 1]
                if c == b"#":
                    p = payload.index(b"\n", p) + 1
                elif c.isspace():
                    p += 1
                else:
                    end = p
                    while end < len(payload) and not payload[end : end + 1].isspace():
                        end += 1
                    fields.append(int(payload[p:end]))
                    p = end
            p += 1  # single whitespace after maxval
            w, h, maxval = fields
            if not (0 < maxval <= 255 and w > 0 and h > 0):
                return None
            ch = 3 if head == b"P6" else 1
            end = p - pos + w * h * ch
            if pos + end <= len(payload):
                return end
    except (ValueError, IndexError):
        return None
    return None


def split_raster_stream(payload: bytes) -> list[bytes] | None:
    """Split a concatenation of BMP/P6/P5 rasters into per-frame byte
    slices — the video seam's demuxer. Returns ``None`` unless the
    payload is EXACTLY a sequence of well-formed rasters (so opaque
    bytes fall through to the stub path rather than half-decoding)."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(payload):
        ln = raster_frame_length(payload, pos)
        if ln is None:
            return None
        frames.append(payload[pos : pos + ln])
        pos += ln
    return frames or None


def encode_bmp_gray(gray) -> bytes:
    """Minimal 24-bpp BI_RGB bottom-up BMP writer over a 2-D uint8
    grayscale array (each pixel duplicated into B=G=R, so the decoder's
    BT.601 luma returns the input exactly: 0.114+0.587+0.299 = 1).
    Product-side twin of the test-suite encoder — used by
    :func:`attach_video_payload` to synthesize REAL raster frames."""
    import numpy as np

    g = np.asarray(gray, dtype=np.uint8)
    h, w = g.shape
    stride = ((24 * w + 31) // 32) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = np.repeat(g[:, :, None], 3, axis=2)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    px = rows[::-1].tobytes()  # bottom-up
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


def attach_video_payload(
    documents: DataFrame, frame_hw: int = 16, n_frames: int = 8
) -> DataFrame:
    """Test-harness adapter (the video twin of
    :func:`attach_wav_payload`): synthesize a REAL multi-frame BMP
    stream per document — ``n_frames`` 24-bpp rasters back to back,
    carrying ``1 + doc_id % 3`` scenes of smooth sinusoid imagery whose
    frequency/phase derive deterministically from (doc_id, scene) —
    so the demux → decode → luma-histogram path runs on genuine pixels
    end-to-end on distributed data. Documents with doc_id % 7 == 0
    instead carry their utf-8 text bytes (opaque), exercising the stub
    fallback in the same pass."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        y, x = np.mgrid[0:frame_hw, 0:frame_hw]

        def scene_frame(did: int, scene: int) -> bytes:
            # one smooth image per (doc, scene); frames within a scene
            # are identical and ADJACENT scenes differ in brightness
            # level by ≥50 luma while the sinusoid spans ±30, so their
            # histogram supports overlap by at most 10 luma (~2-3 of
            # the 64 bins): mostly disjoint support → L1 well above the
            # 0.5 cut threshold, though below the theoretical max of 2
            # — frequency/phase vary per (doc, scene) for spatial
            # realism only
            fy = 0.5 + ((did * 7 + scene * 13) % 5)
            fx = 0.5 + ((did * 11 + scene * 17) % 5)
            ph = ((did + scene * 31) % 8) / 8.0 * 2 * np.pi
            level = 40.0 + ((did + scene) % 4) * 50.0
            img = level + 30.0 * np.sin(
                2 * np.pi * (fy * y + fx * x) / frame_hw + ph
            )
            return encode_bmp_gray(np.clip(np.round(img), 0, 255))

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                if did % 7 == 0:
                    payloads.append(str(text).encode("utf-8"))
                    continue
                n_scenes = 1 + did % 3
                # scene s covers frames [s*n/n_scenes, (s+1)*n/n_scenes);
                # frames within a scene are identical — encode each
                # scene once
                enc = {s: scene_frame(did, s) for s in range(n_scenes)}
                payloads.append(
                    b"".join(
                        enc[(i * n_scenes) // n_frames]
                        for i in range(n_frames)
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return documents.select("doc_id", "text").mapInPandas(
        run, "doc_id bigint, payload binary"
    )


SCENE_SCHEMA = "doc_id bigint, n_frames int, n_cuts int, cut_indices array<int>"


def detect_scene_cuts(
    df: DataFrame, n_frames: int = 8, threshold: float = 0.5,
    spread: bool = True,
) -> DataFrame:
    """Shot-boundary / scene-cut detection over the video seam — the
    classic histogram-difference method (Zhang, Kankanhalli & Smoliar
    1993: a cut is an adjacent-frame histogram L1 distance above a
    threshold). A payload that parses as a multi-frame raster stream
    (:func:`split_raster_stream` — concatenated BMP/PPM/PGM frames,
    the container-free video stand-in) is DECODED for real: each frame
    through :func:`decode_image` to BT.601 luma, then a normalized
    64-bin luma histogram (r10 — the histogram runs on pixels, not
    container bytes, so re-encoding a frame (BMP ↔ PGM, bottom-up ↔
    top-down) does not move it). Opaque payloads keep the
    deterministic byte-chunk stand-in: evenly-spaced chunks sampled
    like :func:`sample_frames`, 64-bin byte histograms. Frame
    transitions with L1 distance > ``threshold`` (range [0, 2]) are
    cuts.

    → (doc_id, n_frames, n_cuts, cut_indices) where cut_indices holds
    the POST-cut frame index and n_frames is the DECODED frame count
    for raster streams (``n_frames`` chunks for opaque payloads).
    Deterministic; all arithmetic per-doc inside one Arrow batch (no
    cross-row float accumulation).

    Scale shape: one projection → repartition (a single-file source
    must not serialize the Python stage through one task, §6b-10) →
    one ``mapInPandas`` pass; frames, histograms and diffs live only
    inside the batch. ``spread=False`` skips the repartition (r14): a
    caller that already spread BEFORE synthesizing payloads would
    otherwise shuffle the payload bytes a second time for nothing —
    the round-robin repartition is only the single-task rescue, and
    payload bytes then never enter any Exchange."""
    spark = df.sparkSession
    cols = df.select("doc_id", "payload")
    if spread:
        cols = cols.repartition(spark.sparkContext.defaultParallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def _byte_hist(chunk: bytes) -> "np.ndarray":
            if not chunk:
                return np.zeros(64)
            b = np.frombuffer(chunk, dtype=np.uint8)
            h = np.bincount(b >> 2, minlength=64).astype(np.float64)
            return h / h.sum()

        def _luma_hist(img: "np.ndarray") -> "np.ndarray":
            # round before quantizing: BT.601 weights sum to exactly 1,
            # so equal-channel pixels return their gray value ± float
            # fuzz — rounding keeps BMP/PGM renderings bin-identical
            q = np.clip(np.round(img), 0, 255).astype(np.uint8) >> 2
            h = np.bincount(q.ravel(), minlength=64).astype(np.float64)
            return h / h.sum()

        def _doc_hists(raw: bytes) -> list["np.ndarray"]:
            frames = split_raster_stream(raw)
            if frames is not None:
                decoded = [decode_image(f) for f in frames]
                if all(d is not None for d in decoded):
                    return [_luma_hist(d) for d in decoded]
            chunk = max(len(raw) // n_frames, 1)
            return [
                _byte_hist(raw[i * chunk : (i + 1) * chunk] or b"\x00")
                for i in range(n_frames)
            ]

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "n_frames": [], "n_cuts": [], "cut_indices": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                hists = _doc_hists(bytes(payload))
                cuts = [
                    i
                    for i in range(1, len(hists))
                    if float(np.abs(hists[i] - hists[i - 1]).sum()) > threshold
                ]
                out["doc_id"].append(doc_id)
                out["n_frames"].append(len(hists))
                out["n_cuts"].append(len(cuts))
                out["cut_indices"].append(cuts)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "n_cuts": pd.Series(out["n_cuts"], dtype="int32"),
                    "cut_indices": out["cut_indices"],
                }
            )

    return cols.mapInPandas(run, schema=SCENE_SCHEMA)
