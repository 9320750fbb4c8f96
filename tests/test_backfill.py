"""Change-detection backfill (plans/backfill.py) — the Airflow-backfill
semantics of the reference DAG, reduced to recompute-only-what-changed."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_dag_spark.plans.backfill import backfill, partition_fingerprints
from etl_dag_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def _monthly_view(src):
    return src.groupBy("month").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "revenue_cents"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )


def _source(spark, path):
    (
        load_table(spark, SF_DIR, "orders")
        .withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
        .write.mode("overwrite")
        .parquet(path)
    )


def _mtimes(path):
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


def test_initial_backfill_builds_everything_and_matches_full_compute(spark, tmp_path):
    src_path = str(tmp_path / "src")
    _source(spark, src_path)
    src = spark.read.parquet(src_path)
    report = backfill(
        spark, src, "month", _monthly_view,
        str(tmp_path / "view"), str(tmp_path / "manifest"),
    )
    assert report["unchanged"] == 0 and not report["dropped"]
    got = {
        r["month"]: (r["revenue_cents"], r["n_orders"])
        for r in spark.read.parquet(str(tmp_path / "view")).collect()
    }
    want = {
        r["month"]: (r["revenue_cents"], r["n_orders"])
        for r in _monthly_view(src).collect()
    }
    assert got == want
    assert sorted(report["recomputed"]) == sorted(want)


def test_noop_backfill_touches_nothing(spark, tmp_path):
    src_path = str(tmp_path / "src")
    _source(spark, src_path)
    src = spark.read.parquet(src_path)
    view, man = str(tmp_path / "view"), str(tmp_path / "manifest")
    backfill(spark, src, "month", _monthly_view, view, man)
    before = _mtimes(view)
    report = backfill(spark, src, "month", _monthly_view, view, man)
    assert report["recomputed"] == [] and report["dropped"] == []
    assert report["unchanged"] == len(before)
    assert _mtimes(view) == before  # no partition opened or rewritten


def test_changed_partition_recomputes_only_itself(spark, tmp_path):
    src_path = str(tmp_path / "src")
    _source(spark, src_path)
    src = spark.read.parquet(src_path)
    view, man = str(tmp_path / "view"), str(tmp_path / "manifest")
    backfill(spark, src, "month", _monthly_view, view, man)
    before = _mtimes(view)

    target = src.select(F.min("month")).first()[0]
    bumped = src.withColumn(
        "o_totalprice",
        F.when(F.col("month") == target, F.col("o_totalprice") + 100.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    report = backfill(spark, bumped, "month", _monthly_view, view, man)
    assert report["recomputed"] == [target]
    assert report["dropped"] == []
    after = _mtimes(view)
    changed = {d for d in after if after[d] != before.get(d)}
    assert changed == {f"month={target}"}
    # recomputed values are correct
    got = {
        r["month"]: r["revenue_cents"]
        for r in spark.read.parquet(view).collect()
    }
    want = {
        r["month"]: r["revenue_cents"] for r in _monthly_view(bumped).collect()
    }
    assert got == want


def test_vanished_partition_is_dropped(spark, tmp_path):
    src_path = str(tmp_path / "src")
    _source(spark, src_path)
    src = spark.read.parquet(src_path)
    view, man = str(tmp_path / "view"), str(tmp_path / "manifest")
    backfill(spark, src, "month", _monthly_view, view, man)

    target = src.select(F.min("month")).first()[0]
    shrunk = src.where(F.col("month") != target)
    report = backfill(spark, shrunk, "month", _monthly_view, view, man)
    assert report["dropped"] == [target]
    assert not os.path.isdir(os.path.join(view, f"month={target}"))
    assert spark.read.parquet(view).where(F.col("month") == target).count() == 0


def test_stale_partition_recomputing_to_zero_rows_is_cleared(spark, tmp_path):
    """Dynamic partitionOverwriteMode only rewrites partitions present
    in the written output, so a stale partition whose recompute yields
    ZERO view rows (filtering view_fn) must be cleared explicitly or
    its old derived rows stay on disk forever while the manifest
    advances."""
    def _big_orders(src):
        return src.where(F.col("o_totalprice") > F.lit(1e16)).groupBy(
            "month"
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))

    def _thresholded(th):
        def fn(src):
            return src.where(F.col("o_totalprice") > th).groupBy("month").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders")
            )
        return fn

    src_path = str(tmp_path / "src")
    _source(spark, src_path)
    src = spark.read.parquet(src_path)
    view, man = str(tmp_path / "view"), str(tmp_path / "manifest")
    # pass 1: low threshold — every month emits rows
    backfill(spark, src, "month", _thresholded(0.0), view, man)
    target = src.select(F.min("month")).first()[0]
    # pass 2: perturb ONE month so it goes stale, with a view_fn whose
    # recompute of that month emits zero rows
    bumped = src.withColumn(
        "o_totalprice",
        F.when(F.col("month") == target, F.col("o_totalprice") + 1.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    report = backfill(spark, bumped, "month", _big_orders, view, man)
    assert target in report["recomputed"]
    assert not os.path.isdir(os.path.join(view, f"month={target}"))


def test_null_partition_value_is_rejected(spark, tmp_path):
    """str(None)=='None' fingerprint keys + the isin-NULL trap would
    mark a changed NULL partition recomputed while rewriting nothing;
    the contract is enforced up front instead."""
    df = spark.createDataFrame(
        [("2024-01", 1), (None, 2)], "month string, v int"
    )
    with pytest.raises(ValueError, match="NULL value in partition column"):
        backfill(
            spark, df, "month", lambda s: s,
            str(tmp_path / "view"), str(tmp_path / "manifest"),
        )


def test_fingerprints_are_order_and_layout_invariant(spark, tmp_path):
    src_path = str(tmp_path / "src")
    _source(spark, src_path)
    src = spark.read.parquet(src_path)
    a = {
        r["part"]: (r["n_rows"], r["content_hash"])
        for r in partition_fingerprints(src, "month").collect()
    }
    b = {
        r["part"]: (r["n_rows"], r["content_hash"])
        for r in partition_fingerprints(
            src.repartition(17).sortWithinPartitions("o_totalprice"), "month"
        ).collect()
    }
    assert a == b
    assert len(a) > 10


def test_fingerprint_detects_single_row_change(spark):
    src = load_table(spark, SF_DIR, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    key = src.select(F.min("o_orderkey")).first()[0]
    tweaked = src.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == key, F.col("o_totalprice") + 0.01).otherwise(
            F.col("o_totalprice")
        ),
    )
    a = {r["part"]: r["content_hash"] for r in partition_fingerprints(src, "month").collect()}
    b = {r["part"]: r["content_hash"] for r in partition_fingerprints(tweaked, "month").collect()}
    diffs = {p for p in a if a[p] != b.get(p)}
    assert len(diffs) == 1


def test_fingerprint_sees_even_multiplicity_swaps(spark):
    """Pure XOR of row hashes cancels paired rows: replacing two copies
    of y with two copies of x keeps count AND xor unchanged, silently
    leaving the view stale. The (row_hash, multiplicity) fingerprint
    must distinguish them."""
    a = spark.createDataFrame(
        [("2024-01", 5, "y"), ("2024-01", 5, "y")], "month string, v int, s string"
    )
    b = spark.createDataFrame(
        [("2024-01", 7, "x"), ("2024-01", 7, "x")], "month string, v int, s string"
    )
    fa = partition_fingerprints(a, "month").collect()[0]
    fb = partition_fingerprints(b, "month").collect()[0]
    assert fa["n_rows"] == fb["n_rows"] == 2
    assert fa["content_hash"] != fb["content_hash"]


def test_fingerprint_sees_multiplicity_change_of_same_row(spark):
    """1 copy vs 3 copies of the same row: count differs here, but the
    hash alone must also differ (2 vs 4 copies would share the xor)."""
    one = spark.createDataFrame([("2024-01", 1)], "month string, v int")
    two = spark.createDataFrame([("2024-01", 1)] * 2, "month string, v int")
    four = spark.createDataFrame([("2024-01", 1)] * 4, "month string, v int")
    h2 = partition_fingerprints(two, "month").collect()[0]["content_hash"]
    h4 = partition_fingerprints(four, "month").collect()[0]["content_hash"]
    h1 = partition_fingerprints(one, "month").collect()[0]["content_hash"]
    assert h2 != h4  # raw-xor fingerprint had h2 == h4 == 0
    assert h1 != h2
