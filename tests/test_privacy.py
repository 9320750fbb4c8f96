"""Governance operators: pseudonymization and right-to-be-forgotten."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_dag_spark.operators import privacy
from etl_dag_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def test_tokens_stable_and_domain_separated(spark):
    df = spark.createDataFrame(
        [("alice", "alice"), ("bob", "carol"), (None, "dave")], "a string, b string"
    )
    out = df.select(
        privacy.token_column("a").alias("ta"), privacy.token_column("b").alias("tb")
    ).collect()
    # same value, same column → same token (run twice for stability)
    again = df.select(privacy.token_column("a").alias("ta")).collect()
    assert [r["ta"] for r in out] == [r["ta"] for r in again]
    # same value in DIFFERENT columns → different tokens (domain separation)
    assert out[0]["ta"] != out[0]["tb"]
    # NULL passes through as NULL, never a token of the empty string
    assert out[2]["ta"] is None
    for r in out:
        for v in (r["ta"], r["tb"]):
            if v is not None:
                assert v.startswith(privacy.TOKEN_PREFIX) and len(v) == 4 + 16


def test_tokens_referentially_consistent_across_frames(spark):
    """The whole point of STABLE tokens: a join key tokenized in two
    different tables still joins — counts survive pseudonymization."""
    c = load_table(spark, SF_DIR, "customer")
    t1 = c.select(privacy.token_column("c_custkey", salt="key").alias("k"))
    t2 = c.select(privacy.token_column("c_custkey", salt="key").alias("k"))
    assert t1.join(t2, "k").count() == c.count()
    assert t1.distinct().count() == c.select("c_custkey").distinct().count()


def test_pseudonymize_passthrough_and_banding(spark):
    df = spark.createDataFrame(
        [(1, "alice", -846.69), (2, "bob", 999.99), (3, "carol", 1000.0)],
        "id long, name string, bal double",
    )
    out = privacy.pseudonymize(df, ["name"]).withColumn(
        "band", privacy.generalize_band("bal", 1000)
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["bal"] == -846.69  # non-token columns pass through
    assert rows[1]["name"].startswith("pii_")
    assert rows[1]["band"] == "[-1000,0)"
    assert rows[2]["band"] == "[0,1000)"
    assert rows[3]["band"] == "[1000,2000)"
    assert out.columns == ["id", "name", "bal", "band"]  # order preserved


def _store(spark, path):
    rows = [(i, f"u{i}", i % 3) for i in range(30)]  # days 0,1,2 — 10 rows each
    df = spark.createDataFrame(rows, "uid long, name string, day int")
    df.write.mode("overwrite").partitionBy("day").parquet(path)
    return df


def _part_files(path):
    out = {}
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if os.path.isdir(full) and "=" in d:
            out[d] = sorted(
                (f, os.path.getmtime(os.path.join(full, f)))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            )
    return out


def test_forget_keys_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "store")
    _store(spark, path)
    before = _part_files(path)
    doomed = spark.createDataFrame([(0,), (3,)], "uid long")  # both in day=0
    n = privacy.forget_keys(spark, path, doomed, "uid", partition_col="day")
    assert n == 1
    back = spark.read.parquet(path)
    assert back.count() == 28
    assert back.where(F.col("uid").isin(0, 3)).count() == 0
    after = _part_files(path)
    # untouched partitions: identical file listing AND mtimes (never opened)
    assert after["day=1"] == before["day=1"]
    assert after["day=2"] == before["day=2"]
    assert after["day=0"] != before["day=0"]


def test_forget_keys_drops_fully_erased_partition(spark, tmp_path):
    path = str(tmp_path / "store")
    _store(spark, path)
    doomed = spark.createDataFrame([(i,) for i in range(0, 30, 3)], "uid long")
    n = privacy.forget_keys(spark, path, doomed, "uid", partition_col="day")
    # every uid in day=0 is doomed (uids ≡ 0 mod 3 ⇔ day 0): dir removed
    assert n == 1
    assert not os.path.isdir(os.path.join(path, "day=0"))
    back = spark.read.parquet(path)
    assert back.count() == 20
    assert back.where(F.col("day") == 0).count() == 0


def test_forget_keys_no_match_is_a_noop(spark, tmp_path):
    path = str(tmp_path / "store")
    _store(spark, path)
    before = _part_files(path)
    n = privacy.forget_keys(
        spark, path, spark.createDataFrame([(999,)], "uid long"), "uid",
        partition_col="day",
    )
    assert n == 0
    assert _part_files(path) == before


def test_forget_keys_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "store")
    df = spark.createDataFrame([(i, f"u{i}") for i in range(10)], "uid long, name string")
    df.write.mode("overwrite").parquet(path)
    n = privacy.forget_keys(
        spark, path, spark.createDataFrame([(1,), (2,)], "uid long"), "uid"
    )
    assert n == 1
    back = spark.read.parquet(path)
    assert back.count() == 8
    assert back.where(F.col("uid").isin(1, 2)).count() == 0


def test_forget_keys_erasure_is_complete_and_minimal(spark, tmp_path):
    """Survivors are EXACTLY original minus doomed — no collateral loss."""
    path = str(tmp_path / "store")
    df = _store(spark, path)
    doomed = spark.createDataFrame([(7,), (8,), (999,)], "uid long")
    privacy.forget_keys(spark, path, doomed, "uid", partition_col="day")
    back = spark.read.parquet(path)
    expect = {(r["uid"], r["name"], r["day"]) for r in df.collect() if r["uid"] not in (7, 8)}
    got = {(r["uid"], r["name"], r["day"]) for r in back.collect()}
    assert got == expect


def test_forget_keys_erases_null_partition_rows(spark, tmp_path):
    """Doomed rows under partition_col = NULL (__HIVE_DEFAULT_PARTITION__)
    MUST be erased — isin() never matches NULL, so a naive touched-list
    filter silently reports success while PII stays on disk."""
    path = str(tmp_path / "store")
    rows = [(i, f"u{i}", i % 3 if i % 5 else None) for i in range(30)]
    df = spark.createDataFrame(rows, "uid long, name string, day int")
    df.write.mode("overwrite").partitionBy("day").parquet(path)
    # uid 0,5,10,... live in the NULL partition; doom two of them plus
    # one day=1 row so both branches (null + non-null) exercise
    doomed = spark.createDataFrame([(0,), (5,), (1,)], "uid long")
    n = privacy.forget_keys(spark, path, doomed, "uid", partition_col="day")
    assert n == 2  # NULL partition + day=1 rewritten
    back = spark.read.parquet(path)
    assert back.count() == 27
    assert back.where(F.col("uid").isin(0, 5, 1)).count() == 0
    # surviving NULL-partition rows intact
    assert back.where(F.col("day").isNull()).count() == 4


def test_forget_keys_drops_fully_erased_null_partition(spark, tmp_path):
    path = str(tmp_path / "store")
    rows = [(i, f"u{i}", None if i < 3 else 1) for i in range(10)]
    df = spark.createDataFrame(rows, "uid long, name string, day int")
    df.write.mode("overwrite").partitionBy("day").parquet(path)
    doomed = spark.createDataFrame([(0,), (1,), (2,)], "uid long")
    n = privacy.forget_keys(spark, path, doomed, "uid", partition_col="day")
    assert n == 1
    assert not os.path.isdir(os.path.join(path, "day=__HIVE_DEFAULT_PARTITION__"))
    back = spark.read.parquet(path)
    assert back.count() == 7
    assert back.where(F.col("day").isNull()).count() == 0


def test_forget_keys_unpartitioned_no_match_is_a_noop(spark, tmp_path):
    """An erasure batch matching nothing must NOT rewrite the store."""
    path = str(tmp_path / "store")
    df = spark.createDataFrame([(i, f"u{i}") for i in range(10)], "uid long, name string")
    df.write.mode("overwrite").parquet(path)
    before = sorted(
        (f, os.path.getmtime(os.path.join(path, f)))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n = privacy.forget_keys(
        spark, path, spark.createDataFrame([(999,)], "uid long"), "uid"
    )
    assert n == 0
    after = sorted(
        (f, os.path.getmtime(os.path.join(path, f)))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    assert after == before
