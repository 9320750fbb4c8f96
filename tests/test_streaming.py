"""Structured Streaming mirrors of the batch event operators
(SURVEY §2e): stream-result == batch-result on the same input, and
bounded-state streaming dedup.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_dag_spark.queries import SPARK_QUERIES
from etl_dag_spark.sources.tables import read_events_batch
from etl_dag_spark.streaming.events import (
    dedup_stream,
    read_event_stream,
    run_to_memory,
    windowed_counts,
)

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    """Copy the events table into several files so maxFilesPerTrigger
    actually exercises multi-batch incremental processing."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    (
        read_events_batch(spark, f"{SF_DIR}/events.parquet")
        .drop("ts_ns", "ts_utc")
        .repartition(4)
        .write.mode("overwrite").parquet(out)
    )
    return out


def test_stream_windowed_counts_equals_batch(spark, stream_src):
    stream = windowed_counts(read_event_stream(spark, stream_src))
    run_to_memory(stream, "win_stream", mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, float(r.total_value))
        for r in spark.table("win_stream").collect()
    }
    batch = SPARK_QUERIES["stream_windowed_counts"](spark, SF_DIR).collect()
    want = {
        (r.window_start, r.event_type): (r.n_events, float(r.total_value))
        for r in batch
    }
    assert got == want


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids across micro-batches collapse to one row."""
    src = str(tmp_path / "dup_events")
    base = spark.range(100).select(
        (F.col("id") % 50).alias("event_id"),  # every id appears twice
        (F.lit(1_700_000_000_000_000_000) + F.col("id") * 1_000_000_000).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        F.lit("purchase").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    base.repartition(4).write.mode("overwrite").parquet(src)
    deduped = dedup_stream(read_event_stream(spark, src))
    run_to_memory(deduped, "dedup_stream_t", mode="append")
    out = spark.table("dedup_stream_t").select("event_id").collect()
    ids = [r.event_id for r in out]
    assert sorted(set(ids)) == list(range(50))
    assert len(ids) == 50  # no duplicate survived


def test_stream_incremental_batches(spark, stream_src):
    """maxFilesPerTrigger=1 really processes multiple micro-batches —
    the incremental path, not one giant batch."""
    stream = windowed_counts(read_event_stream(spark, stream_src))
    q = (
        stream.writeStream.format("memory")
        .queryName("win_stream_batches")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress["batchId"] >= 2


def test_stream_session_windows_equals_batch(spark, stream_src):
    from etl_dag_spark.streaming.events import session_counts

    # files arrive in arbitrary time order: a watermark wider than the
    # table's span means nothing is treated as late, so cross-batch
    # session MERGING (the semantics under test) is isolated from
    # late-data eviction (covered by the dedup/watermark test)
    stream = session_counts(read_event_stream(spark, stream_src), watermark="90 days")
    run_to_memory(stream, "sess_stream", mode="complete")
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in spark.table("sess_stream").collect()
    }
    want = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in SPARK_QUERIES["olap_session_windows"](spark, SF_DIR).collect()
    }
    assert got == want


def test_stateful_running_totals_across_batches(spark, stream_src):
    """applyInPandasWithState: per-user state accumulates across
    micro-batches; the final emitted total per user equals the batch
    aggregate over the same input."""
    from etl_dag_spark.streaming.stateful import running_user_totals

    stream = running_user_totals(read_event_stream(spark, stream_src))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress["batchId"] >= 2  # state really crossed batches
    # update mode re-emits per batch: the max per user is the final state
    got = {
        r.user_id: (r.n_events, r.total_cents)
        for r in spark.sql(
            """SELECT user_id, max(n_events) AS n_events, max(total_cents) AS total_cents
               FROM user_totals GROUP BY user_id"""
        ).collect()
    }
    batch = (
        read_events_batch(spark, stream_src)
        .selectExpr(
            "user_id",
            "CAST(coalesce(value, 0) * 100 AS BIGINT) AS vc",
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vc").alias("cents"))
        .collect()
    )
    want = {r.user_id: (r.n, r.cents) for r in batch}
    assert got == want


def test_stateful_running_diversity_across_batches(spark, stream_src):
    """Streaming twin of olap_event_diversity (r12): per-user type
    counts accumulate in state; after the last batch the emitted
    diversity per user equals the batch query over the same events."""
    from etl_dag_spark.queries import SPARK_QUERIES
    from etl_dag_spark.streaming.stateful import running_user_diversity

    stream = running_user_diversity(read_event_stream(spark, stream_src))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_diversity")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress["batchId"] >= 2
    # update mode re-emits per batch: max n_events marks the final row
    got = {
        r.user_id: (r.n_events, r.n_types, r.gini_simpson, r.inv_simpson)
        for r in spark.sql(
            """SELECT user_id, n_events, n_types, gini_simpson, inv_simpson
               FROM (SELECT *, row_number() OVER (
                        PARTITION BY user_id ORDER BY n_events DESC) AS rn
                     FROM user_diversity) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.n_types, r.gini_simpson, r.inv_simpson)
        for r in SPARK_QUERIES["olap_event_diversity"](spark, SF_DIR).collect()
    }
    assert got == want


def test_stateful_diversity_counts_null_types(spark, tmp_path):
    """NULL event_type is its own type in the batch twin's groupBy —
    the stream's value_counts must not drop it (ADVICE r12), and an
    all-null user must not divide by zero."""
    from etl_dag_spark.streaming.stateful import running_user_diversity

    src = str(tmp_path / "null_events")
    rows = [
        (1, "view"), (1, None), (1, None),  # mixed: null is a 2nd type
        (2, None), (2, None),               # all-null user: 1 type
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    df.repartition(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("user_id long, event_type string").parquet(src)
    q = (
        running_user_diversity(stream)
        .writeStream.format("memory")
        .queryName("null_diversity")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, r.n_types, r.gini_simpson, r.inv_simpson)
        for r in spark.sql(
            """SELECT user_id, n_events, n_types, gini_simpson, inv_simpson
               FROM (SELECT *, row_number() OVER (
                        PARTITION BY user_id ORDER BY n_events DESC) AS rn
                     FROM null_diversity) WHERE rn = 1"""
        ).collect()
    }
    # batch formula by hand: u1 = {view:1, NULL:2}, u2 = {NULL:2}
    assert got == {
        1: (3, 2, (9 - 5) / 9, 9 / 5),
        2: (2, 1, 0.0, 1.0),
    }


def test_stream_static_join_enriches_events(spark, stream_src):
    """Stream-static join: the streaming fact side joins a static dim
    per micro-batch (dim broadcast, stream never blocked)."""
    dim = spark.createDataFrame(
        [(i, f"segment_{i % 3}") for i in range(150)], "user_id long, segment string"
    )
    stream = read_event_stream(spark, stream_src).join(dim, "user_id")
    q = (
        stream.select("event_id", "user_id", "segment")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("enriched")
    n_src = read_events_batch(spark, stream_src).count()
    assert out.count() == n_src  # every event found its dim row
    assert out.where("segment NOT RLIKE '^segment_[0-2]$'").count() == 0


def test_stream_stream_join_equals_batch(spark, stream_src):
    """Stream-stream inner join (clicks → purchases within 1h per user)
    equals the equivalent batch join. Wide watermark again isolates join
    semantics from late-data eviction."""
    from etl_dag_spark.streaming.events import click_purchase_join

    stream = click_purchase_join(
        read_event_stream(spark, stream_src), watermark="90 days"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cp_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.table("cp_join").collect()
    }
    e = read_events_batch(spark, stream_src).select(
        "event_id", "user_id", "event_type", F.expr("ts_ns DIV 1000").alias("tu")
    )
    clicks = e.where("event_type = 'click'").selectExpr(
        "user_id AS cu", "event_id AS click_id", "tu AS ct"
    )
    purchases = e.where("event_type = 'purchase'").selectExpr(
        "user_id AS pu", "event_id AS purchase_id", "tu AS pt"
    )
    want = {
        (r.pu, r.purchase_id, r.click_id)
        for r in clicks.join(
            purchases,
            (F.col("cu") == F.col("pu"))
            & (F.col("ct") <= F.col("pt"))
            & (F.col("ct") >= F.col("pt") - 3600 * 1_000_000),
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_closed_sessions_emit_once_via_inline_and_timeout(spark, tmp_path):
    """applyInPandasWithState + EventTimeTimeout: a session closes
    EXACTLY once — inline when a later event arrives past the gap, or
    by watermark timeout when no successor comes; still-open sessions
    emit nothing."""
    import time as _time

    from etl_dag_spark.streaming.stateful import closed_user_sessions

    t0 = 1_700_000_000_000_000  # µs
    src = str(tmp_path / "src")

    def write(rows):
        spark.createDataFrame(rows, "user_id bigint, us bigint").select(
            "user_id", F.timestamp_micros("us").alias("ts_utc")
        ).coalesce(1).write.mode("append").parquet(src)

    write([(1, t0), (1, t0 + 10_000_000), (3, t0 + 5_000_000)])
    _time.sleep(1.05)  # distinct mtimes: oldest file first
    write([(1, t0 + 3_600_000_000), (2, t0 + 3_600_000_000)])

    stream = (
        spark.readStream.schema("user_id bigint, ts_utc timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        closed_user_sessions(stream, gap_seconds=60, watermark="10 seconds")
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.table("closed_sessions").collect()
    }
    # u1's first session closed INLINE by the t0+1h event; u3 closed by
    # TIMEOUT (watermark t0+1h-10s >> t0+5s+60s); u1's second session
    # and u2's are still open -> absent
    assert got == {
        1: (t0, t0 + 10_000_000, 2),
        3: (t0 + 5_000_000, t0 + 5_000_000, 1),
    }
    spark.sql("DROP TABLE IF EXISTS closed_sessions")


def test_closed_sessions_fold_late_events_backward(spark, tmp_path):
    """ADVICE r9: a late-but-in-watermark event earlier than the stored
    session start must extend the session BACKWARD (start = min), and
    an event more than gap before the stored start must open its own
    earlier session (closed inline by the stored successor) — not be
    absorbed into the current one."""
    import time as _time

    from etl_dag_spark.streaming.stateful import closed_user_sessions

    t0 = 1_700_000_000_000_000  # µs
    src = str(tmp_path / "src")

    def write(rows):
        spark.createDataFrame(rows, "user_id bigint, us bigint").select(
            "user_id", F.timestamp_micros("us").alias("ts_utc")
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: u1 session [t0, t0+10s], u2 session [t0]
    write([(1, t0), (1, t0 + 10_000_000), (2, t0)])
    _time.sleep(1.05)
    # batch 2 (late, inside the 600s watermark): u1 event 50s BEFORE
    # its stored start (within gap 60s -> backward extension); u2 event
    # 300s before its stored start (> gap -> separate earlier session)
    write([(1, t0 - 50_000_000), (2, t0 - 300_000_000)])
    _time.sleep(1.05)
    # batch 3: u1 event 2h later inline-closes u1's merged session
    write([(1, t0 + 7_200_000_000)])

    stream = (
        spark.readStream.schema("user_id bigint, ts_utc timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        closed_user_sessions(stream, gap_seconds=60, watermark="600 seconds")
        .writeStream.format("memory")
        .queryName("closed_sessions_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.table("closed_sessions_late").collect()
    )
    assert got == [
        # u1: late event folded backward into [t0-50s, t0+10s], 3 events
        (1, t0 - 50_000_000, t0 + 10_000_000, 3),
        # u2: the >gap-early event became its own one-event session,
        # gap-closed by the stored [t0] successor — NOT absorbed
        (2, t0 - 300_000_000, t0 - 300_000_000, 1),
        # u2's stored [t0] session closed by watermark timeout (batch 3
        # pushed the global watermark to t0+6600s > t0+gap); u1's
        # t0+2h session is still open (timeout t0+7260s) -> absent
        (2, t0, t0, 1),
    ]
    spark.sql("DROP TABLE IF EXISTS closed_sessions_late")


def test_closed_sessions_held_session_absorbs_later_straggler(
    spark, tmp_path
):
    """r11 (VERDICT r10 #7): a session already gap-closed by a
    successor must STILL absorb a later-arriving in-watermark event
    that belongs to it — list-valued state holds closed sessions until
    the watermark passes end + gap, so the straggler merges before
    emission instead of splitting into a spurious one-event session."""
    import time as _time

    from etl_dag_spark.streaming.stateful import closed_user_sessions

    t0 = 1_700_000_000_000_000  # µs
    src = str(tmp_path / "src")

    def write(rows):
        spark.createDataFrame(rows, "user_id bigint, us bigint").select(
            "user_id", F.timestamp_micros("us").alias("ts_utc")
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: [t0] and [t0+300s] — 300s > gap 60s, so [t0] is already
    # gap-closed by its successor, but the 600s watermark has not
    # passed t0+gap yet -> it must be HELD, not emitted
    write([(1, t0), (1, t0 + 300_000_000)])
    _time.sleep(1.05)
    # batch 2: a straggler at t0+30s (within gap of [t0], within the
    # watermark) must merge into the held session; t0+2h pushes the
    # watermark far enough to finalize both early sessions
    write([(1, t0 + 30_000_000), (1, t0 + 7_200_000_000)])

    stream = (
        spark.readStream.schema("user_id bigint, ts_utc timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        closed_user_sessions(stream, gap_seconds=60, watermark="600 seconds")
        .writeStream.format("memory")
        .queryName("closed_sessions_straggler")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.table("closed_sessions_straggler").collect()
    )
    assert got == [
        # ONE merged session [t0, t0+30s] with 2 events — not the
        # (t0,t0,1) + (t0+30s,t0+30s,1) split the r10 inline close
        # would have produced
        (1, t0, t0 + 30_000_000, 2),
        (1, t0 + 300_000_000, t0 + 300_000_000, 1),
        # the t0+2h session is still open -> absent
    ]
    spark.sql("DROP TABLE IF EXISTS closed_sessions_straggler")


def test_stateful_window_funnel_across_batches(spark, stream_src):
    """Streaming twin of olap_window_funnel (r13): per-user funnel
    events accumulate in state; the final per-user level histogram
    equals the batch query over the same events."""
    from etl_dag_spark.queries import SPARK_QUERIES
    from etl_dag_spark.streaming.stateful import running_window_funnel

    stream = running_window_funnel(read_event_stream(spark, stream_src))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_funnel")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress["batchId"] >= 2
    # levels are monotone in the event set: max emission = final level
    got = {
        r.level: r.n
        for r in spark.sql(
            """SELECT level, CAST(count(*) AS BIGINT) AS n
               FROM (SELECT user_id, max(level) AS level
                     FROM user_funnel GROUP BY user_id)
               GROUP BY level"""
        ).collect()
    }
    want = {
        r.level: r.n_users
        for r in SPARK_QUERIES["olap_window_funnel"](spark, SF_DIR).collect()
        if r.n_users > 0
    }
    assert got == want
