"""Count-min sketch properties (operators/sketch.py): the estimate
never underestimates, cell mass is conserved per hash row, and sketches
of corpus halves merge cell-wise into the sketch of the union — the
three invariants that make the CMS a safe distributed/streaming
frequency summary. The engine-portable hash (and therefore the exact
cell values) is oracle-checked end-to-end by
test_parity[text_countmin_hitters]; these tests pin the algebra.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_dag_spark.operators import sketch as sk

DEPTH, WIDTH = 4, 64  # narrow width so collisions actually occur


def _counted(spark, items: dict[str, int]):
    return spark.createDataFrame(
        [(k, v) for k, v in items.items()], "key string, c long"
    )


def _zipf_corpus() -> dict[str, int]:
    return {f"tok{i}": max(1, 3000 // (i + 1)) for i in range(300)}


def test_estimate_never_underestimates_and_is_tight_for_hitters(spark):
    items = _zipf_corpus()
    cnt = _counted(spark, items)
    cms = sk.countmin_build(cnt, depth=DEPTH, width=WIDTH)
    est = {
        r.key: r.cms_estimate
        for r in sk.countmin_estimate(cms, cnt.select("key"), depth=DEPTH, width=WIDTH).collect()
    }
    assert set(est) == set(items)
    n_total = sum(items.values())
    for k, true_c in items.items():
        assert est[k] >= true_c, f"{k}: CMS underestimated {est[k]} < {true_c}"
        # classic bound: overestimate ≤ (e/width)·N w.h.p.; depth=4
        # independent rows make a miss on all four vanishingly unlikely
        assert est[k] - true_c <= (2.72 / WIDTH) * n_total * 4


def test_cell_mass_conserved_per_row(spark):
    items = _zipf_corpus()
    cms = sk.countmin_build(_counted(spark, items), depth=DEPTH, width=WIDTH)
    per_row = {r.row: r.total for r in cms.groupBy("row").agg(F.sum("cell").alias("total")).collect()}
    n_total = sum(items.values())
    assert sorted(per_row) == list(range(DEPTH))
    assert all(v == n_total for v in per_row.values())


def test_merge_of_halves_equals_sketch_of_union(spark):
    items = _zipf_corpus()
    half_a = {k: v for i, (k, v) in enumerate(items.items()) if i % 2 == 0}
    half_b = {k: v for i, (k, v) in enumerate(items.items()) if i % 2 == 1}
    merged = sk.countmin_merge(
        sk.countmin_build(_counted(spark, half_a), depth=DEPTH, width=WIDTH),
        sk.countmin_build(_counted(spark, half_b), depth=DEPTH, width=WIDTH),
    )
    whole = sk.countmin_build(_counted(spark, items), depth=DEPTH, width=WIDTH)
    m = {(r.row, r.pos): r.cell for r in merged.collect()}
    w = {(r.row, r.pos): r.cell for r in whole.collect()}
    assert m == w


def test_duplicate_count_rows_fold_like_a_raw_stream(spark):
    # the sketch of pre-aggregated counts equals the sketch of the raw
    # stream: feeding the same key twice with split counts is identical
    split = spark.createDataFrame(
        [("a", 3), ("a", 4), ("b", 5)], "key string, c long"
    )
    folded = spark.createDataFrame([("a", 7), ("b", 5)], "key string, c long")
    s1 = {(r.row, r.pos): r.cell for r in sk.countmin_build(split, depth=DEPTH, width=WIDTH).collect()}
    s2 = {(r.row, r.pos): r.cell for r in sk.countmin_build(folded, depth=DEPTH, width=WIDTH).collect()}
    assert s1 == s2


def test_join_size_estimate_bounds(spark):
    """CMS inner product: always >= the exact equi-join size, and with
    depth=4 rows the min-estimate lands within the classic additive
    bound e/width * |A| * |B|."""
    import random

    rng = random.Random(7)
    a_items = {f"k{i}": rng.randint(1, 20) for i in range(120)}
    b_items = {f"k{i}": rng.randint(1, 20) for i in range(60, 180)}
    exact = sum(a_items[k] * b_items[k] for k in a_items.keys() & b_items.keys())
    cms_a = sk.countmin_build(_counted(spark, a_items), depth=DEPTH, width=WIDTH)
    cms_b = sk.countmin_build(_counted(spark, b_items), depth=DEPTH, width=WIDTH)
    est = sk.countmin_join_size(cms_a, cms_b, depth=DEPTH).collect()[0].est
    assert est >= exact
    na = sum(a_items.values())
    nb = sum(b_items.values())
    assert est - exact <= (2.72 / WIDTH) * na * nb


def test_join_size_estimate_disjoint_keys_small(spark):
    """Disjoint key sets: the true join is empty; the estimate is pure
    collision noise, far below any overlapping configuration."""
    a_items = {f"a{i}": 10 for i in range(100)}
    b_items = {f"b{i}": 10 for i in range(100)}
    cms_a = sk.countmin_build(_counted(spark, a_items), depth=DEPTH, width=WIDTH)
    cms_b = sk.countmin_build(_counted(spark, b_items), depth=DEPTH, width=WIDTH)
    est = sk.countmin_join_size(cms_a, cms_b, depth=DEPTH).collect()[0].est
    na, nb = 1000, 1000
    assert 0 <= est <= (2.72 / WIDTH) * na * nb
