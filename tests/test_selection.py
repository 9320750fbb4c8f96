"""Value-domain bisection selection (SURVEY §2 #37b): exact k-th
smallest without sorting, vs a sorted-reference oracle on constructed
distributions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_dag_spark.operators.selection import kth_smallest_bisect


def _reference_kth(values, k):
    return sorted(values)[k - 1]


@pytest.mark.parametrize(
    "dist",
    [
        [1, 2, 3, 4, 5],
        [7] * 100,  # all-equal: bracket collapses immediately
        [0, 0, 0, 1_000_000_000],  # huge sparse domain
        [-5, -4, -3, 17],  # negatives
        list(range(1000)) + [3] * 500,  # heavy ties at one value
    ],
)
def test_median_matches_sorted_reference(spark, dist):
    df = spark.createDataFrame([("g", int(v)) for v in dist], "g string, v long")
    got = kth_smallest_bisect(df, "g", "v", k_of_n=lambda n: (n + 1) // 2).collect()[0]
    k = (len(dist) + 1) // 2
    assert got.n == len(dist)
    assert got.k == k
    assert got.kth_value == _reference_kth(dist, k)


def test_multiple_groups_converge_in_shared_passes(spark):
    rows = []
    import itertools

    for g, vals in [
        ("a", range(0, 101)),           # median 50
        ("b", [5]),                      # singleton
        ("c", [10, 20, 20, 20, 99]),     # ties at the median
        ("d", range(-50, 51, 2)),        # negatives, even count → lower median
    ]:
        rows.extend((g, int(v)) for v in vals)
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.g: (r.n, r.k, r.kth_value)
        for r in kth_smallest_bisect(df, "g", "v", lambda n: (n + 1) // 2).collect()
    }
    for g, vals in [
        ("a", list(range(0, 101))),
        ("b", [5]),
        ("c", [10, 20, 20, 20, 99]),
        ("d", list(range(-50, 51, 2))),
    ]:
        k = (len(vals) + 1) // 2
        assert got[g] == (len(vals), k, _reference_kth(vals, k)), g


def test_other_ranks_p25_p75(spark):
    vals = list(range(1, 201))
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    p25 = kth_smallest_bisect(df, "g", "v", lambda n: max(1, n // 4)).collect()[0]
    assert p25.kth_value == _reference_kth(vals, max(1, len(vals) // 4))
    p75 = kth_smallest_bisect(df, "g", "v", lambda n: 3 * n // 4).collect()[0]
    assert p75.kth_value == _reference_kth(vals, 3 * len(vals) // 4)


def test_weighted_kth_matches_expanded_multiset(spark):
    """weight_col semantics: the weighted order statistic equals the
    unweighted one over the weight-expanded multiset."""
    rows = [("g", 10, 1), ("g", 20, 5), ("g", 30, 2)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = kth_smallest_bisect(
        df, "g", "v", lambda n: (n + 1) // 2, weight_col="w"
    ).collect()[0]
    expanded = [10] + [20] * 5 + [30] * 2
    k = (len(expanded) + 1) // 2
    assert (got.n, got.k, got.kth_value) == (len(expanded), k, sorted(expanded)[k - 1])


def test_null_values_and_null_groups_are_excluded(spark):
    """SQL aggregate semantics: NULL values never rank and NULL group
    keys are dropped — previously they inflated n while vanishing from
    every bracket count (wrong rank or non-convergence)."""
    rows = [
        ("g", 1), ("g", 2), ("g", 3), ("g", None), ("g", None),
        (None, 99),
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    got = kth_smallest_bisect(df, "g", "v", lambda n: (n + 1) // 2).collect()
    assert len(got) == 1  # the NULL group is gone
    r = got[0]
    assert (r.g, r.n, r.k, r.kth_value) == ("g", 3, 2, 2)


def test_adaptive_fanout_equals_forced_narrow(spark):
    """The r14 adaptive fanout (wider probes, fewer scans) finds the
    SAME order statistic as a forced fanout=4 — exactness is structural
    (smallest v with count(<=v) >= k), independent of probe layout."""
    import random

    rng = random.Random(7)
    rows = [("a", rng.randrange(-1_000_000, 1_000_000)) for _ in range(500)]
    rows += [("b", rng.randrange(0, 50)) for _ in range(101)]
    df = spark.createDataFrame(rows, "g string, v long")
    adaptive = {
        r.g: (r.n, r.k, r.kth_value)
        for r in kth_smallest_bisect(
            df, "g", "v", k_of_n=lambda n: (n + 1) // 2
        ).collect()
    }
    narrow = {
        r.g: (r.n, r.k, r.kth_value)
        for r in kth_smallest_bisect(
            df, "g", "v", k_of_n=lambda n: (n + 1) // 2, fanout=4
        ).collect()
    }
    assert adaptive == narrow
    for g in ("a", "b"):
        vals = sorted(v for gg, v in rows if gg == g)
        assert adaptive[g][2] == vals[(len(vals) + 1) // 2 - 1]


def test_group_cardinality_guard_fails_fast(spark):
    """Driver state is per-group: a high-cardinality group_col must be
    rejected BEFORE the scan loop, not OOM the driver (VERDICT r8 #3)."""
    df = spark.range(20).select(
        F.col("id").cast("string").alias("g"), F.col("id").alias("v")
    )
    with pytest.raises(ValueError, match="max_groups"):
        kth_smallest_bisect(
            df, "g", "v", k_of_n=lambda n: 1, max_groups=10
        )


def test_domain_width_guard_rejects_int64_overflow(spark):
    """fanout*(v-lo+1)-1 wraps int64 when the value domain spans more
    than 2^63/fanout — reject the bracket up front (ADVICE r8)."""
    df = spark.createDataFrame(
        [("g", -(2**62)), ("g", 2**62)], "g string, v long"
    )
    with pytest.raises(ValueError, match="overflow|width"):
        kth_smallest_bisect(df, "g", "v", k_of_n=lambda n: 1, fanout=32)
