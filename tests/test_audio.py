"""Real WAV decode + audio features over the multimodal seam
(SURVEY §2 #32e): exact PCM decode, volume-invariant envelope
fingerprint dedup, stub fallback for opaque bytes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_dag_spark.operators.multimodal import audio_features, decode_audio


def _encode_wav(
    samples: "np.ndarray",
    rate: int = 8000,
    bits: int = 16,
    channels: int = 1,
    junk_chunk: bool = False,
) -> bytes:
    """Minimal canonical PCM WAV writer (the test-side inverse of
    decode_audio). ``samples`` is float in [-1, 1], shape (n,) mono or
    (n, channels)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = np.repeat(x[:, None], channels, axis=1)
    if bits == 16:
        data = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        data = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    block = channels * bits // 8
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = b""
    if junk_chunk:  # decoder must chunk-walk past unknown chunks
        chunks += b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    chunks += b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def _tone(freq: float, seconds: float = 0.25, rate: int = 8000) -> "np.ndarray":
    t = np.arange(int(seconds * rate)) / rate
    return 0.5 * np.sin(2 * np.pi * freq * t)


def test_decode_16bit_mono_exact():
    x = _tone(440)
    got = decode_audio(_encode_wav(x, bits=16))
    assert got is not None
    samples, rate = got
    assert rate == 8000
    want = (np.clip(x, -1, 1) * 32767).astype("<i2").astype(np.float64) / 32768.0
    assert np.array_equal(samples, want)


def test_decode_8bit_and_stereo_downmix():
    x = _tone(200)
    s8, _ = decode_audio(_encode_wav(x, bits=8))
    assert np.max(np.abs(s8 - x)) < 1 / 64  # 8-bit quantization bound
    stereo = np.stack([x, -x], axis=1)  # L/R cancel → silent downmix
    sm, _ = decode_audio(_encode_wav(stereo, channels=2))
    assert np.max(np.abs(sm)) <= 1 / 32768.0


def test_decode_walks_past_junk_chunks_and_rejects_opaque():
    x = _tone(330)
    got = decode_audio(_encode_wav(x, junk_chunk=True))
    assert got is not None and got[1] == 8000
    assert decode_audio(b"not a wav at all" * 10) is None
    assert decode_audio(b"RIFF\x00\x00\x00\x00WAVE") is None  # no fmt/data


def test_envelope_fingerprint_is_volume_invariant(spark):
    """The dedup property: a re-normalized copy of the same recording
    fingerprints identically; different envelope material doesn't."""
    rate = 8000
    n = rate // 2
    t = np.arange(n) / rate
    rising = 0.8 * (t / t[-1]) * np.sin(2 * np.pi * 440 * t)
    decaying = 0.8 * (1 - t / t[-1]) * np.sin(2 * np.pi * 440 * t)
    rows = [
        (1, bytearray(_encode_wav(rising))),
        (2, bytearray(_encode_wav(rising * 0.25))),  # quiet copy
        (3, bytearray(_encode_wav(decaying))),
        (4, bytearray(b"opaque payload, not audio")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in audio_features(df).collect()}
    assert got[1].decoded and got[2].decoded and got[3].decoded
    assert not got[4].decoded
    assert got[1].env_fp == got[2].env_fp  # volume-scaled → same fp
    assert got[1].env_fp != got[3].env_fp  # different envelope → differs
    assert got[1].rms_x1e6 > got[2].rms_x1e6 > 0  # rms still tells them apart
    assert got[1].duration_ms == 500
    assert got[1].sample_rate == 8000


def test_features_run_distributed_and_group_dups(spark):
    """The pipeline shape: features in one Arrow pass, dedup grouping on
    the fingerprint column only (payloads never shuffle)."""
    rate = 8000
    n = rate // 4
    t = np.arange(n) / rate
    sigs = []
    for k in range(6):
        env = 0.2 + 0.8 * ((t * (k + 1)) % 0.25) / 0.25  # distinct envelopes
        sigs.append(env * np.sin(2 * np.pi * 300 * t))
    rows = []
    for i, s in enumerate(sigs):
        rows.append((i * 2, bytearray(_encode_wav(s))))
        rows.append((i * 2 + 1, bytearray(_encode_wav(s * 0.5))))  # planted dup
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(4)
    feats = audio_features(df)
    groups = (
        feats.groupBy("env_fp")
        .agg(F.count(F.lit(1)).alias("n"), F.collect_set("doc_id").alias("ids"))
        .collect()
    )
    pairs = {tuple(sorted(r.ids)) for r in groups if r.n == 2}
    # every planted (2k, 2k+1) volume pair lands in one fingerprint bucket
    assert {(i * 2, i * 2 + 1) for i in range(6)} <= pairs | {
        tuple(sorted(r.ids)) for r in groups
    }
    for i in range(6):
        match = [r for r in groups if i * 2 in r.ids]
        assert len(match) == 1 and i * 2 + 1 in match[0].ids
