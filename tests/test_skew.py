"""Salted join: result equality with a plain join on skewed data, and
the plan property that the shuffle key includes the salt."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_dag_spark.operators.skew import salted_join


def _frames(spark):
    # 10k rows of one hot key + a tail of normal keys
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    tail = spark.range(100).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    skewed = hot.unionByName(tail)
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (50, "b"), (101, "c"), (999, "unmatched")],
        "k long, name string",
    )
    return skewed, dim


def test_salted_join_equals_plain_join(spark):
    skewed, dim = _frames(spark)
    got = salted_join(skewed, dim, "k", n_salts=8)
    want = skewed.join(dim, "k")
    # hot key matches 10k rows; tail keys 2..101 match dim keys {2,50,101}
    assert got.count() == want.count() == 10_003
    assert (
        got.groupBy("k", "name").count().exceptAll(want.groupBy("k", "name").count()).count()
        == 0
    )


def test_salted_left_join_keeps_unmatched(spark):
    skewed, dim = _frames(spark)
    got = salted_join(skewed, dim, "k", n_salts=8, how="left")
    assert got.count() == skewed.count()
    assert got.where(F.col("name").isNull()).count() == skewed.join(dim, "k", "left").where(
        F.col("name").isNull()
    ).count()


def test_salt_scatters_hot_key(spark):
    skewed, dim = _frames(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8))
    dist = (
        skewed.where(F.col("k") == 1)
        .withColumn("__salt", salt)
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(dist) == 8  # the hot key's rows hit every salt bucket
    assert max(r["count"] for r in dist) < 10_000 * 0.25  # no bucket dominates


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew handling: a pathologically skewed key in a sort-merge
    join gets split at runtime (the adaptive plan marks the join
    skew=true) — the first line of defense before manual salting."""
    skewed = spark.range(400_000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 1 ELSE id END AS k", "id AS v"
    )
    other = spark.range(50_000).selectExpr("id AS k2", "id * 2 AS w")
    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        joined = skewed.join(other, skewed["k"] == other["k2"])
        # execute THIS DataFrame's own query execution (count() would
        # clone the plan and leave this one un-finalized), then read the
        # final adaptive plan back
        n = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # hot key (360k rows) matches k2=1; tail ids 9,19,...,49999 → 5000
    assert n == 360_000 + 5_000
    assert "skew=true" in plan


def test_salted_join_rejects_right_and_full(spark):
    """The replicated small side would emit unmatched keys n_salts
    times under right/full/semi/anti joins — those types must raise."""
    import pytest

    from etl_dag_spark.operators.skew import salted_join

    a = spark.range(10).selectExpr("id AS k", "id AS v")
    b = spark.range(5).selectExpr("id AS k", "id * 2 AS w")
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(a, b, "k", n_salts=4, how=how)
