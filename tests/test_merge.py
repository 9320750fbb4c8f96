"""Parquet MERGE (upsert) and the foreachBatch streaming upsert sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_dag_spark.sources.merge import merge_into_parquet


def test_merge_insert_update_latest_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10, "2024-01"), (2, "b", 20, "2024-01"), (3, "c", 30, "2024-02")],
        "k long, val string, ver long, month string",
    )
    merge_into_parquet(spark, path, base, ["k"], "ver", partition_col="month")
    updates = spark.createDataFrame(
        [
            (2, "b2", 25, "2024-01"),   # update existing key
            (4, "d", 5, "2024-02"),     # insert new key
            (4, "d2", 6, "2024-02"),    # same key twice in batch: ver 6 wins
        ],
        "k long, val string, ver long, month string",
    )
    merge_into_parquet(spark, path, updates, ["k"], "ver", partition_col="month")
    got = {r.k: (r.val, r.ver) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 25), 3: ("c", 30), 4: ("d2", 6)}


def test_merge_update_beats_target_even_with_lower_order(spark, tmp_path):
    """MERGE semantics: an incoming update replaces the target row for
    its key regardless of version comparison (is_update wins first)."""
    path = str(tmp_path / "t2")
    merge_into_parquet(
        spark,
        path,
        spark.createDataFrame([(1, "old", 100)], "k long, val string, ver long"),
        ["k"],
        "ver",
    )
    merge_into_parquet(
        spark,
        path,
        spark.createDataFrame([(1, "new", 1)], "k long, val string, ver long"),
        ["k"],
        "ver",
    )
    got = {r.k: (r.val, r.ver) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("new", 1)}


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "t3")
    base = spark.createDataFrame(
        [(1, "a", 1, "2024-01"), (2, "b", 1, "2024-02")],
        "k long, val string, ver long, month string",
    )
    merge_into_parquet(spark, path, base, ["k"], "ver", partition_col="month")
    before = set(os.listdir(os.path.join(path, "month=2024-01")))
    merge_into_parquet(
        spark,
        path,
        spark.createDataFrame([(2, "b2", 2, "2024-02")], "k long, val string, ver long, month string"),
        ["k"],
        "ver",
        partition_col="month",
    )
    after = set(os.listdir(os.path.join(path, "month=2024-01")))
    assert before == after  # untouched partition's files unchanged
    got = {r.k: r.val for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b2"}


def test_streaming_upsert_sink(spark, tmp_path):
    """Stream events through the foreachBatch MERGE sink; the final
    table equals the batch latest-per-key aggregate."""
    from etl_dag_spark.streaming.events import read_event_stream, upsert_stream

    src = str(tmp_path / "src")
    spark.range(200).select(
        (F.col("id") % 40).alias("event_id"),
        (F.lit(1_700_000_000_000_000_000) + F.col("id") * 1_000_000_000).alias("ts"),
        (F.col("id") % 9).alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("id") * 1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).repartition(4).write.mode("overwrite").parquet(src)

    target = str(tmp_path / "tgt")
    stream = read_event_stream(spark, src).select("event_id", "ts", "user_id", "value")
    upsert_stream(
        stream, target, key_cols=["event_id"], order_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {r.event_id: r.ts for r in spark.read.parquet(target).collect()}
    # each event_id appears 5x (200/40); latest ts must win
    want = {
        r.event_id: r.ts
        for r in spark.read.parquet(src)
        .groupBy("event_id").agg(F.max("ts").alias("ts")).collect()
    }
    assert got == want


def test_merge_recovers_partition_crash_window(spark, tmp_path):
    """Crash between _swap_dir's two renames leaves the partition's only
    copy in <part>__trash with dst missing. Replaying the same batch
    must RESTORE the trash (not discard it) so non-batch rows survive."""
    path = str(tmp_path / "t4")
    base = spark.createDataFrame(
        [(1, "a", 1, "2024-01"), (2, "b", 1, "2024-01"), (3, "c", 1, "2024-02")],
        "k long, val string, ver long, month string",
    )
    merge_into_parquet(spark, path, base, ["k"], "ver", partition_col="month")
    updates = spark.createDataFrame(
        [(1, "a2", 2, "2024-01")], "k long, val string, ver long, month string"
    )
    # simulate the crash: dst renamed away, replacement never arrived
    part = os.path.join(path, "month=2024-01")
    os.rename(part, part + "__trash")
    assert not os.path.isdir(part)
    merge_into_parquet(spark, path, updates, ["k"], "ver", partition_col="month")
    got = {r.k: (r.val, r.ver) for r in spark.read.parquet(path).collect()}
    # k=2 is NOT in the batch; it must survive via the restored trash
    assert got == {1: ("a2", 2), 2: ("b", 1), 3: ("c", 1)}
    assert not any(d.endswith("__trash") for d in os.listdir(path))


def test_merge_recovers_whole_table_crash_window(spark, tmp_path):
    """Same crash window for the unpartitioned whole-table swap."""
    path = str(tmp_path / "t5")
    merge_into_parquet(
        spark,
        path,
        spark.createDataFrame([(1, "a", 1), (2, "b", 1)], "k long, val string, ver long"),
        ["k"],
        "ver",
    )
    os.rename(path, path + "__trash")
    merge_into_parquet(
        spark,
        path,
        spark.createDataFrame([(1, "a2", 2)], "k long, val string, ver long"),
        ["k"],
        "ver",
    )
    got = {r.k: (r.val, r.ver) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a2", 2), 2: ("b", 1)}
    assert not os.path.exists(path + "__trash")


def test_merge_hive_escaped_and_null_partition_values(spark, tmp_path):
    """Partition values Spark Hive-escapes on disk (space/colon → %XX)
    and NULL (__HIVE_DEFAULT_PARTITION__) must still be swapped in — the
    old code rebuilt 'col=value' names from raw values, missed the
    escaped dirs, and silently dropped the merged rows."""
    path = str(tmp_path / "t6")
    base = spark.createDataFrame(
        [(1, "a", 1, "jan 01"), (2, "b", 1, "feb:02"), (3, "c", 1, None)],
        "k long, val string, ver long, month string",
    )
    merge_into_parquet(spark, path, base, ["k"], "ver", partition_col="month")
    updates = spark.createDataFrame(
        [(1, "a2", 2, "jan 01"), (3, "c2", 2, None), (4, "d", 1, "feb:02")],
        "k long, val string, ver long, month string",
    )
    merge_into_parquet(spark, path, updates, ["k"], "ver", partition_col="month")
    got = {r.k: (r.val, r.ver, r.month) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a2", 2, "jan 01"),
        2: ("b", 1, "feb:02"),
        3: ("c2", 2, None),
        4: ("d", 1, "feb:02"),
    }
    assert not os.path.exists(path.rstrip("/") + "__staging")


def test_merge_stages_then_swaps(spark, tmp_path):
    """The merge writes to a __staging sibling and swaps directories in:
    after a successful merge no staging/trash dirs remain, and the
    untouched partition's files were never rewritten."""
    path = str(tmp_path / "t3")
    base = spark.createDataFrame(
        [(1, "a", 1, "2024-01"), (2, "b", 1, "2024-02")],
        "k long, val string, ver long, month string",
    )
    merge_into_parquet(spark, path, base, ["k"], "ver", partition_col="month")
    untouched = os.path.join(path, "month=2024-02")
    before = sorted(os.listdir(untouched))
    mtime_before = os.path.getmtime(untouched)

    updates = spark.createDataFrame(
        [(1, "a2", 2, "2024-01")], "k long, val string, ver long, month string"
    )
    merge_into_parquet(spark, path, updates, ["k"], "ver", partition_col="month")

    assert not os.path.exists(path.rstrip("/") + "__staging")
    assert not any(d.endswith("__trash") for d in os.listdir(str(tmp_path)))
    assert sorted(os.listdir(untouched)) == before
    assert os.path.getmtime(untouched) == mtime_before
    got = {r.k: (r.val, r.ver) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a2", 2), 2: ("b", 1)}
