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
