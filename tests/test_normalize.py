"""Quantile normalization, weighted Jaccard, and rank fusion (r12
additions — SURVEY §2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_dag_spark.operators.dedup import weighted_jaccard_pairs
from etl_dag_spark.operators.normalize import quantile_normalize


def test_quantile_normalize_maps_group_quantiles_onto_pooled(spark):
    """Two sources with shifted distributions: each group's rank-r
    value maps to the pooled value at 1 + (r-1)(N-1) DIV (n_g-1) —
    endpoint-preserving (group min → pooled min, group max → pooled
    max)."""
    rows = [
        # source a: 10, 20, 30 — source b: 100, 200, 300
        (1, "a", 10), (2, "a", 20), (3, "a", 30),
        (4, "b", 100), (5, "b", 200), (6, "b", 300),
    ]
    df = spark.createDataFrame(rows, "id int, src string, v int")
    got = {
        r.id: r.nv
        for r in quantile_normalize(df, "src", "v", "id", "nv").collect()
    }
    # pooled sorted: 10,20,30,100,200,300 (N=6); group rank r of 3 maps
    # to pooled position 1 + (r-1)*5 DIV 2 → 1, 3, 6
    assert got == {1: 10, 2: 30, 3: 300, 4: 10, 5: 30, 6: 300}


def test_quantile_normalize_single_row_group_maps_to_pooled_min(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 1), (3, "b", 9)], "id int, src string, v int"
    )
    got = {
        r.id: r.nv
        for r in quantile_normalize(df, "src", "v", "id", "nv").collect()
    }
    # n_g=1 → r=1 → p = 1 + 0 DIV 1 = 1 → pooled min (1)
    assert got[1] == 1
    # b: ranks 1,2 of 2 → pooled positions 1 and 3 → values 1 and 9
    assert got[2] == 1 and got[3] == 9


def test_quantile_normalize_preserves_rows_and_rejects_bad_cols(spark):
    df = spark.createDataFrame([(1, "a", 5)], "id int, src string, v int")
    out = quantile_normalize(df, "src", "v", "id")
    assert out.count() == 1
    assert set(out.columns) == {"id", "src", "v", "norm_value"}
    with pytest.raises(ValueError, match="nope"):
        quantile_normalize(df, "nope", "v", "id")


def test_weighted_jaccard_rare_agreement_beats_boilerplate(spark):
    """Docs A,B share a RARE 5-token run plus differ elsewhere; docs
    C,D share only a corpus-wide boilerplate run. Unweighted Jaccard
    scores the pairs equally; df-weighting keeps (A,B) and drops
    (C,D)."""
    boiler = "click here to subscribe now"
    rare = "quantum entanglement entropy scaling law"
    rows = [
        (0, f"{rare} alpha"),
        (1, f"{rare} beta"),
        (2, f"{boiler} gamma"),
        (3, f"{boiler} delta"),
        # boilerplate appears in every doc → its shingles are heavy-df,
        # weight ≈ 1
        *[(10 + i, f"{boiler} filler{i} text{i} words{i}") for i in range(20)],
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_id_a, r.doc_id_b): r.weighted_jaccard
        for r in weighted_jaccard_pairs(
            df, n=3, num=1, den=2, max_shingle_freq=100
        ).collect()
    }
    assert (0, 1) in pairs
    # rare-shingle agreement scores higher than boilerplate agreement
    assert pairs[(0, 1)] > pairs.get((2, 3), 0.0)


def test_weighted_jaccard_identical_docs_score_one(spark):
    df = spark.createDataFrame(
        [(0, "one two three four"), (1, "one two three four"), (2, "x y z w")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id_a, r.doc_id_b): r.weighted_jaccard
        for r in weighted_jaccard_pairs(df, n=3, num=4, den=5).collect()
    }
    assert got == {(0, 1): 1.0}


def test_weighted_jaccard_plan_build_runs_no_job(spark):
    """VERDICT r12 #5: the corpus total D is a broadcast 1-row
    aggregate folded into the plan, not an eager count() — building
    the frame must launch ZERO Spark jobs (at 100 TB an eager count
    is a full extra corpus scan before the real job starts)."""
    sc = spark.sparkContext
    df = spark.createDataFrame(
        [(0, "one two three four"), (1, "one two three four")],
        "doc_id long, text string",
    )
    sc.setJobGroup("wj-plan-build", "weighted_jaccard_pairs plan build")
    try:
        pairs = weighted_jaccard_pairs(df, n=3, num=4, den=5)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("wj-plan-build")
    assert list(jobs) == [], f"plan build launched Spark jobs: {jobs}"
    # and the plan still answers correctly when an action finally runs
    assert [(r.doc_id_a, r.doc_id_b) for r in pairs.collect()] == [(0, 1)]


def test_rank_fusion_borda_consensus(spark, tmp_path):
    """Registry-level check on crafted docs: a doc strong on both
    signals out-ranks docs strong on only one."""
    from etl_dag_spark.queries import SPARK_QUERIES

    docs = spark.createDataFrame(
        [
            # doc 1: long AND diverse → best consensus
            (1, "alpha beta gamma delta epsilon zeta", "s", 36),
            # doc 2: longest but one repeated token
            (2, "spam spam spam spam spam spam spam spam", "s", 40),
            # doc 3: diverse but short
            (3, "one two three", "s", 13),
            (4, "tiny", "s", 4),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.rank_len, r.rank_vocab, r.borda_score, r.fused_rank)
        for r in SPARK_QUERIES["etl_rank_fusion"](spark, str(tmp_path)).collect()
    }
    assert got[1][3] == 1  # best fused rank
    assert got[1][2] == got[1][0] + got[1][1]
    assert got[4][3] == 4  # worst on both → last
