"""As-of join and range join on constructed data covering the edge
cases the sf-table oracle can't isolate: no-earlier-match NULLs,
exact-timestamp inclusivity, and tie-breaking."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_dag_spark.operators.joins import asof_join, range_join


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [
            (1, 100, "t1"),   # before any quote → NULL
            (1, 205, "t2"),   # between quotes → quote@200
            (1, 300, "t3"),   # exactly at quote ts → inclusive match
            (2, 500, "t4"),   # other key
            (3, 100, "t5"),   # key with no quotes at all
        ],
        "sym int, t long, trade string",
    )
    quotes = spark.createDataFrame(
        [
            (1, 200, 10, 9.9),
            (1, 300, 11, 10.1),
            (1, 300, 12, 10.2),  # same ts: higher qid must win
            (1, 400, 13, 10.3),
            (2, 450, 20, 55.0),
        ],
        "sym int, t long, qid int, px double",
    )
    return trades, quotes


def test_asof_backward_semantics(spark, frames):
    trades, quotes = frames
    out = asof_join(
        trades.select("sym", F.col("t").alias("tt"), "trade"),
        quotes.select("sym", F.col("t").alias("qt"), "qid", "px"),
        key="sym",
        left_ts="tt",
        right_ts="qt",
        payload_cols=["qid", "px"],
        right_order="qid",
    )
    got = {r.trade: (r.qid, r.px) for r in out.collect()}
    assert got == {
        "t1": (None, None),      # nothing at or before t=100
        "t2": (10, 9.9),         # latest quote <= 205 is t=200
        "t3": (12, 10.2),        # t=300 inclusive; qid tie → larger qid
        "t4": (20, 55.0),
        "t5": (None, None),      # key 3 has no quotes
    }
    assert out.count() == trades.count()  # every left row exactly once


def test_range_join_interval_bounds(spark, frames):
    trades, quotes = frames
    out = range_join(
        trades.select("sym", F.col("t").alias("tt"), "trade"),
        quotes.select(F.col("sym").alias("qsym"), F.col("t").alias("qt"), "qid"),
        key_left="sym",
        key_right="qsym",
        ts_right="qt",
        lower=F.col("tt"),
        upper=F.col("tt") + F.lit(100),
        how="left",
    ).groupBy("trade").agg(F.count("qid").alias("n"))
    got = {r.trade: r.n for r in out.collect()}
    # [t, t+100): t1 captures quote@100? none at sym1 before 200 → t1 [100,200) → no;
    # t2 [205,305) → quotes at 300 (two) → 2; t3 [300,400) → 2 at 300; t4 [500,600) → none
    assert got == {"t1": 0, "t2": 2, "t3": 2, "t4": 0, "t5": 0}


def test_asof_join_is_single_shuffle(spark, frames):
    """The plan must contain exactly one exchange by key (union + one
    window) — no inequality join blowup."""
    trades, quotes = frames
    out = asof_join(
        trades.select("sym", F.col("t").alias("tt"), "trade"),
        quotes.select("sym", F.col("t").alias("qt"), "qid", "px"),
        key="sym",
        left_ts="tt",
        right_ts="qt",
        payload_cols=["qid", "px"],
        right_order="qid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # composed from union+window, not a join


def test_nearest_join_arbitration(spark):
    """Backward/forward arbitration: nearer side wins, equal |dt| takes
    the earlier right row, same-ts right rows break by right_order
    (backward max, forward min), and a key with no right rows keeps
    NULL payload + NULL delta."""
    from etl_dag_spark.operators.joins import nearest_join

    left = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 205), (3, "b", 50), (4, "c", 10)],
        "lid long, k string, t long",
    )
    right = spark.createDataFrame(
        [
            ("a", 90, 901),   # 10 before left1
            ("a", 110, 902),  # 10 after left1 → tie, backward wins
            ("a", 200, 903),  # 5 before left2
            ("a", 200, 904),  # same ts: backward picks max id (904)
            ("b", 80, 905),   # forward-only for left3
        ],
        "k string, rt long, rid long",
    )
    got = {
        r["lid"]: (r["rid"], r["__delta"])
        for r in nearest_join(
            left, right, "k", "t", "rt", ["rid"], right_order="rid"
        ).collect()
    }
    assert got[1] == (901, -10)   # tie → earlier (backward)
    assert got[2] == (904, -5)    # same-ts backward → max rid
    assert got[3] == (905, 30)    # forward only
    assert got[4] == (None, None)  # no right rows for key c
