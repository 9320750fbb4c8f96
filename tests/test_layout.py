"""Storage-layout operators (operators/layout.py): compaction rewrites
to the computed file count without losing rows; Z-ordering measurably
prunes files for point predicates on BOTH clustered columns vs a
single-column sort, which can only prune its leading key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_dag_spark.operators.layout import (
    compact_parquet,
    files_overlapping_point,
    write_zordered,
)


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(200_000).select(
        F.col("id"), (F.col("id") % 1000).alias("k"), F.md5(F.col("id").cast("string")).alias("pad")
    )
    df.repartition(64).write.parquet(src)  # the small-file pathology
    stats = compact_parquet(spark, src, dst, target_file_bytes=1 << 21)
    assert stats["files_before"] == 64
    assert stats["files_after"] == stats["target_files"] < 16
    assert spark.read.parquet(dst).count() == 200_000
    # and values survive, not just counts
    a = spark.read.parquet(src).agg(F.sum("k"), F.count("pad")).first()
    b = spark.read.parquet(dst).agg(F.sum("k"), F.count("pad")).first()
    assert a == b


def test_zorder_prunes_both_columns_linear_sort_only_one(spark, tmp_path):
    """With a plain sort on x, a point predicate on y overlaps EVERY
    file (y spans the full range within each x-slice). Z-ordering
    bounds both coordinates per file, so both predicates prune."""
    n_files = 16
    df = spark.range(100_000).select(
        (F.col("id") % 317).cast("long").alias("x"),
        F.expr("CAST(pmod(hash(id), 1000) AS BIGINT)").alias("y"),
    )
    flat, zord = str(tmp_path / "flat"), str(tmp_path / "zord")
    (
        df.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.parquet(flat)
    )
    write_zordered(df, ["x", "y"], zord, n_files=n_files)

    # point predicate on x: both layouts prune (x is flat's sort key)
    fx_hit, fx_n = files_overlapping_point(flat, "x", 100)
    zx_hit, zx_n = files_overlapping_point(zord, "x", 100)
    assert fx_n == zx_n == n_files
    assert fx_hit <= 2
    # z-order gives x only every other bit, so its x-pruning is
    # inherently coarser, and repartitionByRange boundary SAMPLING
    # jitters the per-file cube edges run-to-run (observed 9/16 once
    # under host contention): assert meaningful pruning with margin,
    # not a knife-edge half
    assert zx_hit <= 10, f"z-order x pruning degraded: {zx_hit}/{n_files}"
    # point predicate on y: flat can't prune at all, z-order must
    fy_hit, _ = files_overlapping_point(flat, "y", 500)
    zy_hit, _ = files_overlapping_point(zord, "y", 500)
    assert fy_hit == n_files  # every file overlaps
    assert zy_hit <= n_files / 2, f"z-order failed to prune y: {zy_hit}/{n_files}"


def test_zorder_value_is_deterministic_and_total(spark):
    from etl_dag_spark.operators.layout import zorder_value

    df = spark.range(1000).select(
        (F.col("id") % 32).alias("a"), (F.col("id") % 17).alias("b")
    )
    z = zorder_value(["a", "b"], [0.0, 0.0], [31.0, 16.0], bits=5)
    out = df.select("a", "b", z.alias("z")).collect()
    seen = {}
    for r in out:
        key = (r.a, r.b)
        assert seen.setdefault(key, r.z) == r.z  # same input → same z
        assert 0 <= r.z < (1 << 10)
