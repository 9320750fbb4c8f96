"""Replay the reference's exact 10-employee hierarchy dataset
(sql_definitions.sql:32-42) through both recursive operators and check
the closed-form expected results of its two recursive CTE queries
(sql_definitions.sql:54-84 and :93-121).
"""

from __future__ import annotations

import pytest

from etl_dag_spark.operators.hierarchy import ancestor_chain, recursive_expand

# (EmployeeID, Name, ManagerID) — verbatim from the reference insert.
EMPLOYEES = [
    (1, "Alice (CEO)", None),
    (2, "Bob (VP of Sales)", 1),
    (3, "Carol (VP of Engineering)", 1),
    (4, "David (Sales Manager 1)", 2),
    (5, "Eve (Sales Manager 2)", 2),
    (6, "Frank (Engineering Manager 1)", 3),
    (7, "Grace (Engineering Manager 2)", 3),
    (8, "Henry (Software Engineer 1)", 6),
    (9, "Ian (Software Engineer 2)", 6),
    (10, "Jack (Software Engineer 3)", 7),
]

# depth of each employee below the CEO
DEPTH = {1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3, 10: 3}


@pytest.fixture(scope="module")
def frames(spark):
    nodes = spark.createDataFrame(
        [(i, n) for i, n, _ in EMPLOYEES], "id int, name string"
    )
    edges = spark.createDataFrame(
        [(i, m) for i, _, m in EMPLOYEES if m is not None], "child int, parent int"
    )
    return nodes, edges


def _parent_map() -> dict[int, int | None]:
    return {i: m for i, _, m in EMPLOYEES}


def _ancestors(i: int) -> list[int]:
    out, cur = [], _parent_map()[i]
    while cur is not None:
        out.append(cur)
        cur = _parent_map()[cur]
    return out


def test_recursive_expand_matches_reference_closure(spark, frames):
    nodes, edges = frames
    got = {
        (r.ancestor_id, r.node_id, r.level)
        for r in recursive_expand(nodes.select("id"), edges).collect()
    }
    # expected transitive closure incl. self at level 0 — the same row
    # set as the reference's first recursive query (its RootEmployeeID /
    # Hierarchy_Employee roles are this closure transposed)
    expected = set()
    for i, _, _ in EMPLOYEES:
        expected.add((i, i, 0))
        for lvl, anc in enumerate(_ancestors(i), start=1):
            expected.add((anc, i, lvl))
    assert got == expected
    assert len(got) == 29  # 10 self rows + 19 proper ancestor pairs


def test_recursive_expand_levels_bounded_by_tree_height(spark, frames):
    nodes, edges = frames
    df = recursive_expand(nodes.select("id"), edges)
    assert df.groupBy().max("level").first()[0] == max(DEPTH.values())


def test_ancestor_chain_matches_reference_manager_chains(spark, frames):
    nodes, edges = frames
    rows = {r.node_id: r for r in ancestor_chain(nodes, edges, sep=" -> ").collect()}
    assert len(rows) == 10  # every chain reaches the CEO
    names = {i: n for i, n, _ in EMPLOYEES}
    for i, _, _ in EMPLOYEES:
        chain = " -> ".join([names[i]] + [names[a] for a in _ancestors(i)])
        assert rows[i].chain == chain
        assert rows[i].depth == DEPTH[i] + 1
    # the reference's displayed example: Jack's full manager hierarchy
    assert rows[10].chain == (
        "Jack (Software Engineer 3) -> Grace (Engineering Manager 2)"
        " -> Carol (VP of Engineering) -> Alice (CEO)"
    )


def test_cycle_detection_raises(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "id int")
    edges = spark.createDataFrame([(1, 2), (2, 1)], "child int, parent int")
    with pytest.raises(RuntimeError, match="max_iter"):
        recursive_expand(nodes, edges, max_iter=5)
