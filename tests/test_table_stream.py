"""Streaming SOURCE over the versioned table (VERDICT r12 #3): each
committed snapshot is one micro-batch; offsets are version numbers;
stream-over-commits equals the batch delta union."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_dag_spark.sources.versions import (
    compact_version,
    delete_version,
    merge_version,
    read_version,
    read_version_delta,
    write_version,
)
from etl_dag_spark.streaming.table_stream import read_table_stream


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def _drain(spark, stream, name, checkpoint=None):
    w = stream.writeStream.format("memory").queryName(name).outputMode(
        "append"
    )
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.processAllAvailable()
    return q


def test_stream_over_commits_equals_batch_delta_union(spark, tmp_path):
    """The VERDICT r12 #3 equality pin: initial snapshot + every
    append (optimize skipped) drained through the stream == the batch
    read of the tip == initial read ∪ read_version_delta."""
    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), path
    )
    write_version(
        spark.createDataFrame([(3, "c")], "k int, v string"), path, op="append"
    )
    compact_version(spark, path)  # v3: dataChange=false, must be skipped
    write_version(
        spark.createDataFrame([(4, "d")], "k int, v string"), path, op="append"
    )
    q = _drain(spark, read_table_stream(spark, path), "vt_eq")
    try:
        got = _rows(spark.table("vt_eq"))
        assert got == _rows(read_version(spark, path))  # tip snapshot
        want = _rows(
            read_version(spark, path, 1).unionByName(
                read_version_delta(spark, path, 1, 4)
            )
        )
        assert got == want
        # a commit landing WHILE the stream runs is its own micro-batch
        write_version(
            spark.createDataFrame([(5, "e")], "k int, v string"),
            path,
            op="append",
        )
        q.processAllAvailable()
        assert _rows(spark.table("vt_eq")) == _rows(read_version(spark, path))
        # an OPTIMIZE landing MID-stream is skipped (dataChange=false)
        # and appends after it keep flowing
        compact_version(spark, path)
        write_version(
            spark.createDataFrame([(6, "f")], "k int, v string"),
            path,
            op="append",
        )
        q.processAllAvailable()
        assert _rows(spark.table("vt_eq")) == _rows(read_version(spark, path))
    finally:
        q.stop()


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Offsets are version numbers in Spark's checkpoint: a restarted
    stream re-emits NOTHING already consumed and picks up exactly the
    commits that landed while it was down (the Delta streaming
    exactly-once contract)."""
    path = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_version(
        spark.createDataFrame([(1, "a")], "k int, v string"), path
    )
    stream = read_table_stream(spark, path)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # two commits land while the stream is down
    write_version(
        spark.createDataFrame([(2, "b")], "k int, v string"), path, op="append"
    )
    write_version(
        spark.createDataFrame([(3, "c")], "k int, v string"), path, op="append"
    )
    q = (
        read_table_stream(spark, path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.k, r.v) for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]  # no dup, no gap


def test_starting_version_skips_initial_snapshot(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), path
    )
    write_version(
        spark.createDataFrame([(3, "c")], "k int, v string"), path, op="append"
    )
    q = _drain(
        spark,
        read_table_stream(spark, path, startingVersion=1),
        "vt_from1",
    )
    try:
        assert _rows(spark.table("vt_from1")) == [(3, "c")]
    finally:
        q.stop()


def test_rewrite_commit_fails_stream_unless_ignore_changes(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1)], "k int, v string, ts int"
        ),
        path,
    )
    merge_version(
        spark,
        path,
        spark.createDataFrame([(2, "B", 2)], "k int, v string, ts int"),
        ["k"],
        "ts",
    )
    stream = read_table_stream(spark, path)
    q = stream.writeStream.format("memory").queryName("vt_fail").start()
    with pytest.raises(Exception, match="not a row delta"):
        q.processAllAvailable()
    q.stop()
    # ignoreChanges: the merge's rewritten files emit as-is — every
    # current row appears, and the PRE-merge version of a rewritten
    # row re-emits too (v1's file holding (2,'b') was already consumed
    # before the rewrite added its replacement) — exactly Delta's
    # documented ignoreChanges downstream-dedup burden
    q = _drain(
        spark,
        read_table_stream(spark, path, ignoreChanges=True),
        "vt_ic",
    )
    try:
        got = sorted(
            (r.k, r.v) for r in spark.table("vt_ic").collect()
        )
        assert got == [(1, "a"), (2, "B"), (2, "b")]
        current = set(
            (r.k, r.v) for r in read_version(spark, path).collect()
        )
        assert current <= set(got)  # no current row is ever missed
    finally:
        q.stop()
    # deletes behave the same way
    delete_version(spark, path, "k = 1")
    q2 = read_table_stream(spark, path).writeStream.format("memory").queryName(
        "vt_fail2"
    ).start()
    with pytest.raises(Exception, match="not a row delta"):
        q2.processAllAvailable()
    q2.stop()


def test_added_column_evolution_pads_nulls(spark, tmp_path):
    """A restart after an added-column append pins the TIP schema; the
    older files' missing column reads as typed NULLs (readers.
    read_evolved semantics, Arrow-side)."""
    path = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"), path)
    write_version(
        spark.createDataFrame(
            [(2, "b", 9.5)], "k int, v string, score double"
        ),
        path,
        op="append",
    )
    q = _drain(spark, read_table_stream(spark, path), "vt_evolved")
    try:
        got = sorted(
            (r.k, r.v, r.score) for r in spark.table("vt_evolved").collect()
        )
        assert got == [(1, "a", None), (2, "b", 9.5)]
    finally:
        q.stop()


def test_max_versions_per_trigger_paces_catch_up(spark, tmp_path):
    """A subscriber catching up on history drains it in bounded
    micro-batches (one commit per batch here), not one giant batch —
    with no row lost or duplicated."""
    path = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"), path)
    for k in (2, 3, 4, 5):
        write_version(
            spark.createDataFrame([(k, f"v{k}")], "k int, v string"),
            path,
            op="append",
        )
    q = _drain(
        spark,
        read_table_stream(spark, path, maxVersionsPerTrigger=1),
        "vt_paced",
    )
    try:
        assert _rows(spark.table("vt_paced")) == _rows(
            read_version(spark, path)
        )
        # 5 commits → 5 paced batches
        assert q.lastProgress["batchId"] >= 4
    finally:
        q.stop()


def test_medallion_pipeline_table_to_table(spark, tmp_path):
    """Composition pin (r13): the streaming SOURCE feeds a versioned
    SINK — a bronze→silver medallion hop where each bronze commit
    streams through an aggregation and MERGEs into silver exactly
    once. After draining, silver's tip equals the batch aggregate of
    bronze's tip; bronze commits landing later flow through
    incrementally on the next drain."""
    from pyspark.sql import functions as F

    from etl_dag_spark.sources.versions import merge_version

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    write_version(
        spark.createDataFrame(
            [(1, 10), (2, 5), (1, 7)], "k int, amount int"
        ),
        bronze,
    )
    write_version(
        spark.createDataFrame([(2, 1), (3, 4)], "k int, amount int"),
        bronze,
        op="append",
    )

    def upsert(batch_df, batch_id):
        # per-key partial sums of THIS batch merge into silver's
        # running totals (read-modify-write keyed merge, txn-gated so
        # an at-least-once redelivery is a manifest no-op)
        part = batch_df.groupBy("k").agg(
            F.sum("amount").cast("long").alias("delta")
        )
        try:
            from etl_dag_spark.sources.versions import read_version as rv

            cur = rv(spark, silver).select("k", "total")
        except FileNotFoundError:
            cur = spark.createDataFrame([], "k int, total long")
        merged = (
            part.join(cur, "k", "full_outer")
            .select(
                "k",
                (
                    F.coalesce(F.col("delta"), F.lit(0))
                    + F.coalesce(F.col("total"), F.lit(0))
                ).cast("long").alias("total"),
                F.lit(batch_id).cast("long").alias("b"),
            )
        )
        merge_version(
            spark, silver, merged, ["k"], "b",
            txn_id=f"b{batch_id}", writer_id="medallion",
        )

    def drain():
        q = (
            read_table_stream(spark, bronze)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got = {
        r.k: r.total for r in read_version(spark, silver).collect()
    }
    assert got == {1: 17, 2: 6, 3: 4}
    # late bronze commit flows through incrementally on the next drain
    write_version(
        spark.createDataFrame([(3, 6), (4, 2)], "k int, amount int"),
        bronze,
        op="append",
    )
    drain()
    got = {
        r.k: r.total for r in read_version(spark, silver).collect()
    }
    assert got == {1: 17, 2: 6, 3: 10, 4: 2}


def test_rename_fails_only_at_the_renaming_commit(spark, tmp_path):
    """r14 ADVICE fix: manifests carry the CUMULATIVE rename map
    forward on every append, so a rename anywhere in history used to
    fail every later append forever (and the advised restart could
    not heal). The stream must fail exactly AT the commit where a
    rename occurs, and a fresh subscriber past it streams cleanly."""
    from etl_dag_spark.sources.versions import vacuum

    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame([(1, "a")], "k int, v string"), path
    )  # v1
    write_version(
        spark.createDataFrame([(2, "b")], "k int, label string"),
        path,
        op="append",
        rename={"v": "label"},
    )  # v2: the rename
    write_version(
        spark.createDataFrame([(3, "c")], "k int, label string"),
        path,
        op="append",
    )  # v3: carries the cumulative map but renames NOTHING
    # streaming THROUGH the rename fails at v2, with restart advice
    q = (
        read_table_stream(spark, path)
        .writeStream.format("memory")
        .queryName("vt_ren_fail")
        .start()
    )
    with pytest.raises(Exception, match="renames columns"):
        q.processAllAvailable()
    q.stop()
    # the advised restart heals: a fresh subscriber past the rename
    # version streams v3 (whose manifest still carries the map)
    q = _drain(
        spark,
        read_table_stream(spark, path, startingVersion=2),
        "vt_ren_ok",
    )
    try:
        got = sorted((r.k, r.label) for r in spark.table("vt_ren_ok").collect())
        assert got == [(3, "c")]
    finally:
        q.stop()
    # appends keep flowing AFTER the rename version too
    write_version(
        spark.createDataFrame([(4, "d")], "k int, label string"),
        path,
        op="append",
    )  # v4
    q = _drain(
        spark,
        read_table_stream(spark, path, startingVersion=2),
        "vt_ren_more",
    )
    try:
        got = sorted(
            (r.k, r.label) for r in spark.table("vt_ren_more").collect()
        )
        assert got == [(3, "c"), (4, "d")]
    finally:
        q.stop()
    # a vacuumed parent at the retention boundary is the subscriber's
    # baseline, never a mid-stream change
    vacuum(path, keep_last=1, min_age_seconds=0)
    q = _drain(
        spark,
        read_table_stream(spark, path, startingVersion=3),
        "vt_ren_vac",
    )
    try:
        got = sorted(
            (r.k, r.label) for r in spark.table("vt_ren_vac").collect()
        )
        assert got == [(4, "d")]
    finally:
        q.stop()


def test_stream_refuses_vacuumed_history(spark, tmp_path):
    """r13 retention guard: a fresh subscriber on a vacuumed table
    fails loudly instead of silently streaming a hole; startingVersion
    at the retention floor works."""
    from etl_dag_spark.sources.versions import vacuum

    path = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"), path)
    for k in (2, 3, 4, 5):
        write_version(
            spark.createDataFrame([(k, f"v{k}")], "k int, v string"),
            path,
            op="append",
        )
    vacuum(path, keep_last=2, min_age_seconds=0)
    q = (
        read_table_stream(spark, path)
        .writeStream.format("memory")
        .queryName("vt_vac")
        .start()
    )
    with pytest.raises(Exception, match="vacuumed"):
        q.processAllAvailable()
    q.stop()
    # the documented recovery: re-seed from the floor, stream after it
    q = _drain(
        spark,
        read_table_stream(spark, path, startingVersion=4),
        "vt_vac_ok",
    )
    try:
        assert _rows(spark.table("vt_vac_ok")) == [(5, "v5")]
    finally:
        q.stop()


def test_cdf_stream_equals_batch_cdc(spark, tmp_path):
    """r14 (VERDICT r13 #3): readChangeFeed=true streams exact change
    rows — per commit, the streamed set equals batch cdc_rows(v-1, v)
    across an append, a MERGE, and a DELETE commit."""
    from etl_dag_spark.sources.versions import cdc_rows

    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k int, v string, ts int"
        ).repartition(2, "k"),
        path,
    )  # v1
    write_version(
        spark.createDataFrame([(4, "d", 1)], "k int, v string, ts int"),
        path,
        op="append",
    )  # v2
    merge_version(
        spark,
        path,
        spark.createDataFrame(
            [(2, "B", 2), (9, "z", 2)], "k int, v string, ts int"
        ),
        ["k"],
        "ts",
    )  # v3: update k=2, insert k=9
    delete_version(spark, path, "k = 1")  # v4
    q = _drain(
        spark,
        read_table_stream(
            spark, path, readChangeFeed=True, keyCols="k", cdcBuckets=2
        ),
        "vt_cdf",
    )
    try:
        got = spark.table("vt_cdf")
        assert set(got.columns) == {
            "k", "v", "ts", "_change_type", "_commit_version"
        }
        # v1+v2 (initial snapshot + append) are pure inserts
        ins = sorted(
            (r.k, r.v, r._commit_version)
            for r in got.where("_commit_version <= 2").collect()
        )
        assert ins == [(1, "a", 1), (2, "b", 1), (3, "c", 1), (4, "d", 2)]
        assert {
            r._change_type
            for r in got.where("_commit_version <= 2").collect()
        } == {"insert"}
        # per rewrite commit: streamed changes == batch cdc_rows
        for v in (3, 4):
            streamed = sorted(
                (r.k, r.v, r._change_type)
                for r in got.where(f"_commit_version = {v}").collect()
            )
            batch = sorted(
                (r.k, r.v, r._change_type)
                for r in cdc_rows(spark, path, v - 1, v, key_cols=["k"])
                .collect()
            )
            assert streamed == batch, f"v{v}: {streamed} != {batch}"
        # a rewrite landing WHILE the CDF stream runs flows through
        merge_version(
            spark,
            path,
            spark.createDataFrame([(3, "C", 3)], "k int, v string, ts int"),
            ["k"],
            "ts",
        )  # v5
        q.processAllAvailable()
        got5 = sorted(
            (r.k, r.v, r._change_type)
            for r in spark.table("vt_cdf")
            .where("_commit_version = 5")
            .collect()
        )
        assert got5 == [
            (3, "C", "update_postimage"), (3, "c", "update_preimage"),
        ]
    finally:
        q.stop()


def test_cdf_stream_restart_exactly_once(spark, tmp_path):
    """CDF offsets ride the same version checkpointing: a restart
    re-emits NOTHING and picks up rewrite commits that landed while
    the stream was down."""
    path = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_version(
        spark.createDataFrame([(1, "a", 1)], "k int, v string, ts int"), path
    )

    def drain():
        q = (
            read_table_stream(spark, path, readChangeFeed=True, keyCols="k")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    merge_version(
        spark,
        path,
        spark.createDataFrame([(1, "A", 2)], "k int, v string, ts int"),
        ["k"],
        "ts",
    )
    delete_version(spark, path, "k = 1")
    drain()
    got = sorted(
        (r.k, r.v, r._change_type, r._commit_version)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, "A", "delete", 3),
        (1, "A", "update_postimage", 2),
        (1, "a", "insert", 1),
        (1, "a", "update_preimage", 2),
    ]


def test_cdf_requires_key_cols_for_rewrites(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame([(1, "a", 1)], "k int, v string, ts int"), path
    )
    delete_version(spark, path, "k = 1")
    q = (
        read_table_stream(spark, path, readChangeFeed=True)
        .writeStream.format("memory")
        .queryName("vt_cdf_nokeys")
        .start()
    )
    with pytest.raises(Exception, match="keyCols"):
        q.processAllAvailable()
    q.stop()


def test_cdc_table_replication(spark, tmp_path):
    """r14 composition pin: CDF source → apply_cdc_version sink keeps
    a downstream versioned table EXACTLY equal to the upstream across
    appends, a merge, and a delete — with the destination schema
    identical to the source's (the transport ordering column never
    lands) and a second drain catching up commits that arrived while
    the replica was idle."""
    from etl_dag_spark.streaming.table_stream import replicate_table_stream

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    write_version(
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1)], "k int, v string, ts int"
        ).repartition(2, "k"),
        src,
    )
    write_version(
        spark.createDataFrame([(3, "c", 1)], "k int, v string, ts int"),
        src,
        op="append",
    )
    merge_version(
        spark,
        src,
        spark.createDataFrame(
            [(2, "B", 2), (9, "z", 2)], "k int, v string, ts int"
        ),
        ["k"],
        "ts",
    )
    delete_version(spark, src, "k = 1")

    def sync():
        q = replicate_table_stream(spark, src, dst, ["k"], ckpt)
        q.awaitTermination(120)

    sync()
    want = sorted(
        (r.k, r.v, r.ts) for r in read_version(spark, src).collect()
    )
    got = sorted(
        (r.k, r.v, r.ts) for r in read_version(spark, dst).collect()
    )
    assert got == want
    assert read_version(spark, dst).schema == read_version(spark, src).schema
    # commits landing while the replica is idle flow through on the
    # next drain — including a delete of a replicated row
    merge_version(
        spark,
        src,
        spark.createDataFrame([(3, "C", 3)], "k int, v string, ts int"),
        ["k"],
        "ts",
    )
    delete_version(spark, src, "k = 9")
    sync()
    got = sorted(
        (r.k, r.v, r.ts) for r in read_version(spark, dst).collect()
    )
    want = sorted(
        (r.k, r.v, r.ts) for r in read_version(spark, src).collect()
    )
    assert got == want
    # an idle re-drain with nothing new is a no-op (txn-gated)
    tip = read_version(spark, dst).count()
    sync()
    assert read_version(spark, dst).count() == tip
