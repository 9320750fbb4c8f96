"""Deterministic weighted sampling (Efraimidis–Spirakis keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_dag_spark.queries import SPARK_QUERIES, weighted_sample_keys

from tests.conftest import SF_DIR


def _sample(spark, df, k, salt, weight_col="w"):
    key = weighted_sample_keys(df, F.col(weight_col).cast("double"), salt=salt, id_col="id")
    return [
        r["id"]
        for r in df.select("id", key.alias("__k"))
        .orderBy("__k", "id")
        .limit(k)
        .collect()
    ]


def _corpus(spark, n=500, heavy=None):
    heavy = heavy or set()
    rows = [(i, 1_000_000.0 if i in heavy else 1.0) for i in range(n)]
    return spark.createDataFrame(rows, "id long, w double")


def test_exact_k_and_deterministic(spark):
    out = SPARK_QUERIES["etl_weighted_sample"](spark, SF_DIR).collect()
    again = SPARK_QUERIES["etl_weighted_sample"](spark, SF_DIR).collect()
    assert len(out) == 50
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in again]
    assert [r["sample_rank"] for r in out] == list(range(1, 51))


def test_heavy_weights_dominate_inclusion(spark):
    """5 docs weighted 10⁶× the rest: each must appear in the top-50
    in nearly every salt draw (per-draw inclusion prob ≈ 1)."""
    heavy = {7, 77, 177, 277, 477}
    df = _corpus(spark, heavy=heavy)
    hits = 0
    for s in range(20):
        got = set(_sample(spark, df, 50, salt=f"t{s}"))
        hits += len(heavy & got)
    assert hits >= 0.9 * 20 * len(heavy), hits


def test_equal_weights_unbiased_across_salts(spark):
    """With equal weights every item's inclusion frequency over many
    salts should be near k/n — no positional or id bias."""
    df = _corpus(spark, n=200)
    counts = {i: 0 for i in range(200)}
    draws = 30
    for s in range(draws):
        for i in _sample(spark, df, 50, salt=f"u{s}"):
            counts[i] += 1
    # expected 50/200 = 0.25 → 7.5 of 30; allow a generous band
    freqs = [c / draws for c in counts.values()]
    assert 0.15 < sum(freqs) / len(freqs) < 0.35
    assert max(freqs) < 0.7  # no item is systematically favored


def test_append_only_evicts_never_reshuffles(spark):
    """Content-local keys: adding documents can only push old members
    out of the top-k — the surviving intersection keeps its members
    (eval-set stability under corpus growth)."""
    base = _corpus(spark, n=300)
    grown = _corpus(spark, n=400)  # superset: ids 0..399, same weights
    a = set(_sample(spark, base, 50, salt="g"))
    b = set(_sample(spark, grown, 50, salt="g"))
    # every member of the grown sample that existed before was already
    # in the base sample (keys did not move)
    assert {i for i in b if i < 300} <= a


def test_weight_monotonicity_single_item(spark):
    """Doubling ONE item's weight can only improve (or keep) its rank —
    its key is -ln(u)/w with u fixed by content."""
    df1 = _corpus(spark, n=100)
    df2 = spark.createDataFrame(
        [(i, 2.0 if i == 42 else 1.0) for i in range(100)], "id long, w double"
    )
    k1 = _sample(spark, df1, 100, salt="m")  # full ranking
    k2 = _sample(spark, df2, 100, salt="m")
    assert k2.index(42) <= k1.index(42)


def test_zero_weight_rows_are_never_sampled(spark):
    """w = 0 means inclusion probability 0 — but -ln(u)/0.0 is NULL
    under Spark's double divide and ascending orderBy sorts NULLS
    FIRST, which would deterministically include every zero-weight row
    at rank 1. The key must map w <= 0 to +inf instead."""
    rows = [(i, 0.0 if i < 5 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w double")
    for salt in ("a", "b", "c"):
        got = _sample(spark, df, 20, salt)
        assert not set(got) & {0, 1, 2, 3, 4}
        assert len(got) == 20


def test_proportional_sample_hamilton_invariants(spark):
    """Largest-remainder apportionment: quotas sum to exactly K, each
    within 1 of its exact proportional share, per-domain selection
    fills the quota exactly, and the draw is deterministic."""
    out = SPARK_QUERIES["etl_proportional_sample"](spark, SF_DIR).toPandas()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    c = {r["source"]: r["cnt"] for r in docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    t = sum(c.values())
    K = 100
    assert len(out) == K
    quotas = out.drop_duplicates("source").set_index("source")["domain_quota"]
    assert quotas.sum() == K
    for s, q in quotas.items():
        assert abs(q - K * c[s] / t) < 1
    # quota filled exactly: selected count per domain == quota
    sel = out.groupby("source").size()
    for s, n in sel.items():
        assert n == quotas[s]
    again = SPARK_QUERIES["etl_proportional_sample"](spark, SF_DIR).toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])
