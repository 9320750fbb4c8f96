"""Physical-plan audits: the properties that make these queries scale
(SURVEY §6) are asserted on the actual executed plans so a regression
in join strategy, pushdown, or Python placement fails CI — not just a
benchmark eyeball.
"""

from __future__ import annotations

import pytest

from etl_dag_spark.queries import SPARK_QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return SPARK_QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(SPARK_QUERIES))
def test_no_cartesian_product_and_no_rowwise_python(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    # Python is allowed only Arrow-batched (mapInPandas / pandas_udf),
    # never row-at-a-time
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF in plan"


def test_revenue_by_category_is_broadcast_pruned_partial(spark):
    plan = _plan(spark, "bi_revenue_by_category")
    assert "BroadcastHashJoin" in plan  # part dim broadcast
    assert "partial_sum" in plan        # map-side combine before shuffle
    # lineitem scan pruned to the 3 needed columns
    scan = next(l for l in plan.splitlines() if "Scan parquet" in l and "l_partkey" in l)
    assert "l_extendedprice" in scan and "l_discount" in scan
    assert "l_comment" not in scan and "l_quantity" not in scan


def test_shipping_priority_pushes_dim_filter_to_scan(spark):
    plan = _plan(spark, "olap_shipping_priority")
    scan = next(l for l in plan.splitlines() if "Scan parquet" in l and "c_mktsegment" in l)
    assert "BUILDING" in scan  # selective predicate reaches the file scan


def test_star_fact_prunes_order_columns(spark):
    plan = _plan(spark, "etl_star_fact")
    scan = next(l for l in plan.splitlines() if "Scan parquet" in l and "o_orderkey" in l)
    assert "o_orderpriority" not in scan and "o_orderstatus" not in scan


def test_anti_join_is_broadcast(spark):
    plan = _plan(spark, "bi_customers_no_purchase")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_pricing_summary_is_single_scan_partial_agg(spark):
    plan = _plan(spark, "olap_pricing_summary")
    assert plan.count("Scan parquet") == 1
    assert "partial_sum" in plan


def test_local_supplier_volume_broadcasts_all_dims(spark):
    """TPC-H Q5-class plan: exactly one shuffle-side join (the fact⋈fact
    on orderkey under AQE); every dim join broadcasts."""
    plan = _plan(spark, "olap_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3  # customer, supplier, nation
    assert "CartesianProduct" not in plan


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))


# nodes whose presence bounds (or makes sublinear) a subtree's
# cardinality: an aggregate/distinct output, a LIMIT, or a rank window
_BOUNDING = {"Aggregate", "GlobalLimit", "LocalLimit", "Window", "Deduplicate"}
# leaves that never scale with data volume
_UNSCALED_LEAVES = {"LocalRelation", "Range", "OneRowRelation"}


@pytest.mark.parametrize("name", sorted(SPARK_QUERIES))
def test_no_broadcast_hint_on_scaled_tables(spark, name):
    """An explicit broadcast hint bypasses Spark's size check, so a hint
    on a table that grows with scale factor (part/customer/supplier/
    fact-derived key sets) is an executor OOM at 100 TB, not a plan
    degradation. Every ResolvedHint subtree must be provably bounded:
    either it contains a cardinality-bounding operator (aggregate,
    limit, window-rank, distinct) or its only leaves are unscaled
    relations (nation, region, literals, ranges)."""
    plan = SPARK_QUERIES[name](spark, SF)._jdf.queryExecution().analyzed()
    for node in _walk(plan):
        if node.getClass().getSimpleName() != "ResolvedHint":
            continue
        sub = list(_walk(node))
        names = {n.getClass().getSimpleName() for n in sub}
        if names & _BOUNDING:
            continue
        for leaf in sub:
            sn = leaf.getClass().getSimpleName()
            if sn in _UNSCALED_LEAVES:
                continue
            if sn == "LogicalRelation":
                head = leaf.toString().splitlines()[0]
                assert "n_nationkey" in head or "r_regionkey" in head, (
                    f"{name}: broadcast hint on an SF-scaled scan with no "
                    f"bounding operator above it: {head[:160]}"
                )


def test_disjunctive_predicate_pushes_to_both_scans(spark):
    """Q19-class: the 3-arm (brand, size, quantity) disjunction must be
    OR-factored into per-table predicates and pushed into BOTH parquet
    scans — a cast or un-factorable expression would silently turn the
    lineitem side into a full scan."""
    df = SPARK_QUERIES["olap_disjunctive_revenue"](spark, SF)
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l and "Or(" in l for l in pushed), pushed
    assert any("p_brand" in l and "Or(" in l for l in pushed), pushed


def test_ntile_quartiles_has_no_unpartitioned_window(spark):
    """olap_ntile_quartiles must never plan a global-sort window: every
    Window node carries a partition spec (the exact_ntile rewrite ranks
    inside range partitions), and no Sort is global."""
    import re

    plan = _plan(spark, "olap_ntile_quartiles")
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            # an unpartitioned window spec starts the spec with the
            # order column directly; ours must lead with __pid
            assert "__pid" in line, f"unpartitioned window: {line.strip()[:160]}"
    assert "Sort [pc" not in plan  # no global sort over the agg frame
