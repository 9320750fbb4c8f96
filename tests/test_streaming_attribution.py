"""Streaming last-touch attribution (SURVEY §2e 34r) vs its batch twin."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from etl_dag_spark.sources.tables import read_events_batch
from etl_dag_spark.streaming.attribution import (
    attribute_purchases,
    attribution_base,
    read_attributions,
    read_last_clicks,
    stream_attribute_last_touch,
)
from etl_dag_spark.streaming.events import read_event_stream

from tests.conftest import SF_DIR


def _batch_verdicts(spark, src):
    """Per-purchase verdicts from the shared batch stages over the full
    history — the ground truth the stream must reproduce."""
    base = attribution_base(read_events_batch(spark, src))
    purchases = base.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("us").alias("p_us"), "cents"
    )
    clicks = base.where(F.col("event_type") == "click").select(
        "user_id", "us", "event_id", "campaign", F.col("us").alias("c_us")
    )
    return {
        r["event_id"]: (r["campaign"], r["cents"])
        for r in attribute_purchases(purchases, clicks).collect()
    }


def test_stream_attribution_single_batch_equals_batch(spark, tmp_path):
    """One source file = one micro-batch: intra-batch attribution is
    exact, so stream verdicts must equal the batch twin row-for-row."""
    src = str(tmp_path / "src")
    (
        read_events_batch(spark, f"{SF_DIR}/events.parquet")
        .drop("ts_ns", "ts_utc")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(src)
    )
    spark.sql("DROP TABLE IF EXISTS t_attr_one")
    out = str(tmp_path / "out")
    q = stream_attribute_last_touch(
        read_event_stream(spark, src),
        out,
        str(tmp_path / "ckpt"),
        store_table="t_attr_one",
        store_path=str(tmp_path / "store"),
    )
    q.awaitTermination(120)

    got = {
        r["event_id"]: (r["campaign"], r["cents"])
        for r in read_attributions(spark, out).collect()
    }
    want = _batch_verdicts(spark, src)
    assert got == want
    assert len(got) > 0
    assert {c for c, _ in got.values()} - {"none"}  # some attributed


def test_stream_attribution_time_ordered_batches_equal_batch(spark, tmp_path):
    """Three time-ordered micro-batches: cross-batch purchases must see
    earlier batches' clicks through the persisted store — final
    verdicts equal the one-shot batch computation."""
    e = read_events_batch(spark, f"{SF_DIR}/events.parquet")
    lo, hi = e.agg(F.min("ts_ns"), F.max("ts_ns")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3

    src = str(tmp_path / "src")
    for cond in (
        F.col("ts_ns") <= cut1,
        (F.col("ts_ns") > cut1) & (F.col("ts_ns") <= cut2),
        F.col("ts_ns") > cut2,
    ):
        (
            e.where(cond)
            .drop("ts_ns", "ts_utc")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(1.05)  # distinct mod-times: file source goes oldest-first

    spark.sql("DROP TABLE IF EXISTS t_attr_three")
    out = str(tmp_path / "out")
    q = stream_attribute_last_touch(
        read_event_stream(spark, src),
        out,
        str(tmp_path / "ckpt"),
        store_table="t_attr_three",
        store_path=str(tmp_path / "store"),
    )
    q.awaitTermination(180)

    got = {
        r["event_id"]: (r["campaign"], r["cents"])
        for r in read_attributions(spark, out).collect()
    }
    want = _batch_verdicts(spark, src)
    assert got == want


def _event_row(eid, user, etype, us, value=None, k=0):
    return (eid, us * 1000, user, etype, value, json.dumps({"k": k}))


_EVT_SCHEMA = "event_id long, ts long, user_id long, event_type string, value double, props string"


def test_stream_attribution_late_click_is_arrival_time(spark, tmp_path):
    """A click arriving AFTER its purchase's batch cannot
    retro-attribute (earlier emits stand) — the documented arrival-time
    semantics, where the batch twin would pick the later click."""
    day_us = 86_400_000_000
    b1 = [_event_row(1, 7, "click", day_us, k=1)]
    b2 = [_event_row(2, 7, "purchase", 2 * day_us, value=10.0)]
    b3 = [_event_row(3, 7, "click", int(1.5 * day_us), k=2)]  # late arrival

    src = str(tmp_path / "src")
    for rows in (b1, b2, b3):
        spark.createDataFrame(rows, _EVT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.05)

    spark.sql("DROP TABLE IF EXISTS t_attr_late")
    out = str(tmp_path / "out")
    q = stream_attribute_last_touch(
        read_event_stream(spark, src),
        out,
        str(tmp_path / "ckpt"),
        store_table="t_attr_late",
        store_path=str(tmp_path / "store"),
    )
    q.awaitTermination(120)

    got = {r["event_id"]: r["campaign"] for r in read_attributions(spark, out).collect()}
    assert got == {2: "c1"}  # streamed: the click that had ARRIVED
    want = _batch_verdicts(spark, src)
    assert want[2][0] == "c2"  # batch over full history picks the later click


def test_store_fold_is_replay_idempotent(spark, tmp_path):
    """Re-appending a batch's delta (the foreachBatch at-least-once
    crash case) must not move the folded last-click view."""
    src = str(tmp_path / "src")
    (
        read_events_batch(spark, f"{SF_DIR}/events.parquet")
        .drop("ts_ns", "ts_utc")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(src)
    )
    spark.sql("DROP TABLE IF EXISTS t_attr_replay")
    out = str(tmp_path / "out")
    q = stream_attribute_last_touch(
        read_event_stream(spark, src),
        out,
        str(tmp_path / "ckpt"),
        store_table="t_attr_replay",
        store_path=str(tmp_path / "store"),
    )
    q.awaitTermination(120)

    before = {
        r["user_id"]: (r["c_us"], r["click_id"], r["campaign"])
        for r in read_last_clicks(spark, "t_attr_replay").collect()
    }
    assert len(before) > 0
    # replay the whole delta: duplicate every store row (materialized
    # first — appending a table into itself is a read-write cycle)
    dup = spark.createDataFrame(
        spark.table("t_attr_replay").collect(), spark.table("t_attr_replay").schema
    )
    dup.write.mode("append").bucketBy(8, "user_id").format("parquet").saveAsTable(
        "t_attr_replay"
    )
    after = {
        r["user_id"]: (r["c_us"], r["click_id"], r["campaign"])
        for r in read_last_clicks(spark, "t_attr_replay").collect()
    }
    assert after == before
