"""Skyline operator (operators/preference.py — SURVEY §2, r11)."""

from __future__ import annotations

import itertools

import pytest

from etl_dag_spark.operators.preference import skyline


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _brute(rows, nd):
    def dominates(q, p):
        return all(q[i] >= p[i] for i in range(nd)) and any(
            q[i] > p[i] for i in range(nd)
        )

    return sorted(
        p for p in rows if not any(dominates(q, p) for q in rows if q != p)
    )


def test_skyline_keeps_exactly_the_pareto_front(spark):
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 8, 8), (3, 10, 4), (4, 3, 3), (5, 10, 5)],
        "id int, x int, y int",
    )
    got = _rows(skyline(df, ["x", "y"]))
    # (3): dominated by (1)/(5); (4): dominated by everything.
    # (1) and (5) tie in every dim: neither dominates — both stay.
    assert got == [(1, 10, 5), (2, 8, 8), (5, 10, 5)]


def test_skyline_matches_bruteforce_under_any_partitioning(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.randrange(20), rng.randrange(20), rng.randrange(20))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id int, a int, b int, c int")
    want = _brute([r[1:] for r in rows], 3)
    for parts in (1, 7):
        got = sorted(
            {(r.a, r.b, r.c) for r in skyline(df.repartition(parts), ["a", "b", "c"]).collect()}
        )
        assert sorted(set(want)) == got


def test_skyline_minimize_via_negation(spark):
    df = spark.createDataFrame(
        [(1, 100, 4), (2, 100, 9), (3, 50, 2)], "id int, spend int, cost int"
    )
    from pyspark.sql import functions as F

    neg = df.withColumn("neg_cost", -F.col("cost"))
    got = {r.id for r in skyline(neg, ["spend", "neg_cost"]).collect()}
    # 2 loses (same spend as 1, higher cost); 3 survives (cheapest)
    assert got == {1, 3}


def test_skyline_rejects_unknown_dim(spark):
    df = spark.createDataFrame([(1, 2)], "id int, x int")
    with pytest.raises(ValueError, match="nope"):
        skyline(df, ["nope"])


def test_skyline_rejects_null_dims_fail_fast(spark):
    """NULL dims must raise inside the scan, not silently survive as
    spurious front members (NaN comparisons are all-False in numpy, so
    a NULL row could neither dominate nor be dominated)."""
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame(
        [(1, 10, 5), (2, None, 8)], "id int, x int, y int"
    )
    with pytest.raises(Exception) as exc:
        skyline(df, ["x", "y"]).collect()
    assert "NULL" in str(exc.value)


def test_skyline_anticorrelated_worst_case_front_equals_corpus(spark):
    """Anti-correlated input where EVERY row is on the front (a+b
    constant, all distinct): the blocked numpy scan must return all of
    them — the worst case degrades in C, not the interpreter."""
    n = 3000
    rows = [(i, i, n - i) for i in range(n)]
    df = spark.createDataFrame(rows, "id int, a int, b int")
    assert skyline(df.repartition(5), ["a", "b"]).count() == n


def test_skyline_global_phase_is_a_shuffle_barrier(spark):
    """coalesce(1) would collapse the parallel local phase into one
    task (narrow dependency); the global fold must sit behind a real
    Exchange so phase 1 keeps the input's parallelism."""
    df = spark.createDataFrame([(1, 2, 3)], "id int, a int, b int")
    plan = skyline(df, ["a", "b"])._jdf.queryExecution().toString()
    assert "Repartition" in plan and "Coalesce" not in plan


def test_stream_skyline_store_folds_to_exact_front(spark, tmp_path):
    """Streaming Pareto-front maintenance (r11): per-batch local fronts
    land log-structured; the fold equals the one-shot skyline of every
    ingested row, and a replayed batch rewrites identical rows
    (idempotent store)."""
    import time

    from etl_dag_spark.streaming.preference import (
        read_skyline_store,
        stream_skyline,
    )

    src = str(tmp_path / "rows_src")
    store = str(tmp_path / "front_store")
    ckpt = str(tmp_path / "front_ckpt")
    import random

    rng = random.Random(11)
    rows = [
        (i, rng.randrange(30), rng.randrange(30)) for i in range(400)
    ]

    def write(chunk):
        spark.createDataFrame(chunk, "id int, a int, b int").coalesce(
            1
        ).write.mode("append").parquet(src)

    write(rows[:200])
    time.sleep(1.05)
    write(rows[200:])

    stream = (
        spark.readStream.schema("id int, a int, b int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_skyline(stream, store, ckpt, ["a", "b"])
    q.awaitTermination(180)

    folded = read_skyline_store(spark, store, ["a", "b"])
    # the __batch=<id> store layout must not leak into the fold's schema
    assert folded.columns == ["id", "a", "b"]
    got = sorted((r.id, r.a, r.b) for r in folded.collect())
    want = sorted(
        (r.id, r.a, r.b)
        for r in skyline(
            spark.createDataFrame(rows, "id int, a int, b int"), ["a", "b"]
        ).collect()
    )
    assert got == want and len(got) >= 1
    # replaying a batch overwrites its own directory: store unchanged
    import os as _os

    batches = sorted(
        d for d in _os.listdir(store) if d.startswith("__batch=")
    )
    assert len(batches) == 2
    before = got
    skyline(
        spark.createDataFrame(rows[:200], "id int, a int, b int"), ["a", "b"]
    ).coalesce(1).write.mode("overwrite").parquet(
        _os.path.join(store, batches[0])
    )
    after = sorted(
        (r.id, r.a, r.b)
        for r in read_skyline_store(spark, store, ["a", "b"]).collect()
    )
    assert after == before


def test_stream_skyline_rejects_store_layout_column_collision(spark, tmp_path):
    """An ingested __-prefixed column would collide with (or be
    silently deleted by) the store's partition layout: refuse at
    wiring time."""
    from etl_dag_spark.streaming.preference import stream_skyline

    src = str(tmp_path / "clash_src")
    spark.createDataFrame([(1, 2)], "id int, a int").write.parquet(src)
    stream = spark.readStream.schema("id int, a int").parquet(src)
    renamed = stream.withColumnRenamed("id", "__batch")
    with pytest.raises(ValueError, match="__batch"):
        stream_skyline(
            renamed,
            str(tmp_path / "clash_store"),
            str(tmp_path / "clash_ckpt"),
            ["a"],
        )


def test_read_skyline_store_empty_store_returns_empty_frame(spark, tmp_path):
    """A stream that saw zero non-empty batches leaves a store with a
    pinned schema and no __batch dirs: the fold must return an empty
    frame of the ingested schema, not throw."""
    from etl_dag_spark.streaming.preference import (
        read_skyline_store,
        stream_skyline,
    )

    src = str(tmp_path / "empty_src")
    import os as _os

    _os.makedirs(src)
    store = str(tmp_path / "empty_store")
    stream = spark.readStream.schema("id int, a int, b int").parquet(src)
    q = stream_skyline(stream, store, str(tmp_path / "empty_ckpt"), ["a", "b"])
    q.awaitTermination(60)
    folded = read_skyline_store(spark, store, ["a", "b"])
    assert folded.columns == ["id", "a", "b"]
    assert folded.count() == 0
