"""Sequence-packing invariants (SURVEY §2d round 5).

``etl_pack_sequences`` (contiguous) is oracle-checked by the driver;
this module asserts the properties the oracle can't express and covers
the strict-capacity first-fit twin.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_dag_spark.operators.packing import pack_contiguous, pack_first_fit
from etl_dag_spark.queries import SPARK_QUERIES, _PACK_CAP
from etl_dag_spark.sources.tables import load_table

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_contiguous_packs_every_doc_exactly_once(spark, docs):
    out = SPARK_QUERIES["etl_pack_sequences"](spark, SF_DIR)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_contiguous_bins_are_contiguous_in_doc_order(spark):
    """bin_id is non-decreasing in doc_id order and every bin's token
    start offset is exactly bin_id * cap."""
    rows = (
        SPARK_QUERIES["etl_pack_sequences"](spark, SF_DIR)
        .orderBy("doc_id")
        .collect()
    )
    cum = 0
    prev_bin = 0
    for r in rows:
        assert r.bin_id == cum // _PACK_CAP
        assert r.bin_id >= prev_bin
        cum += r.n_tokens
        prev_bin = r.bin_id


def test_first_fit_capacity_and_exactly_once(spark, docs):
    out = pack_first_fit(
        docs.select("doc_id", "source", F.length("text").alias("n_tokens")) #  chars as tokens: same invariants, no tokenizer dependency
        .withColumn("n_tokens", (F.col("n_tokens") / 5).cast("bigint")),
        cap=_PACK_CAP,
    ).cache()
    try:
        n_docs = docs.count()
        assert out.count() == n_docs
        assert out.select("doc_id").distinct().count() == n_docs
        fills = (
            out.groupBy("source", "bin_id")
            .agg(F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        for r in fills:
            # strict capacity unless a single doc alone exceeds the cap
            assert r.fill <= _PACK_CAP or r.n == 1, (r.source, r.bin_id, r.fill, r.n)
    finally:
        out.unpersist()


def test_first_fit_bin_counts_vs_bounds(spark, docs):
    """Bin-quality claim, asserted against true bounds rather than the
    not-a-theorem ``ff <= contiguous``: strict-capacity FFD needs at
    least ceil(total/cap) bins and (with no doc over the cap) achieves
    it here, while contiguous packing occupies between that lower bound
    minus nothing and +1 bins — it can use one FEWER distinct bin than
    FFD when the last doc in order straddles a cap boundary (its tail
    overshoots into token space no bin id is minted for)."""
    import math

    d = docs.select(
        F.col("doc_id"), F.lit("all").alias("source"),
        (F.length("text") / 5).cast("bigint").alias("n_tokens"),
    )
    total, max_doc = d.agg(F.sum("n_tokens"), F.max("n_tokens")).first()
    assert max_doc <= _PACK_CAP, "fixture assumption: no oversized doc"
    lower = math.ceil(total / _PACK_CAP)
    ff_bins = pack_first_fit(d, cap=_PACK_CAP).agg(
        F.countDistinct("bin_id")
    ).first()[0]
    cont_bins = pack_contiguous(d, cap=_PACK_CAP).agg(
        F.countDistinct("bin_id")
    ).first()[0]
    assert ff_bins >= lower
    assert ff_bins <= cont_bins + 1
    # contiguous mints exactly one bin id per started cap-window
    assert lower - 1 <= cont_bins <= lower


def test_first_fit_oversized_doc_gets_solo_bin(spark):
    d = spark.createDataFrame(
        [(1, "g", 100), (2, "g", _PACK_CAP + 50), (3, "g", 200)],
        "doc_id long, source string, n_tokens long",
    )
    out = {r.doc_id: r for r in pack_first_fit(d, cap=_PACK_CAP).collect()}
    big_bin = out[2].bin_id
    others = [r.bin_id for i, r in out.items() if i != 2]
    assert big_bin not in others  # oversized doc shares with nobody
