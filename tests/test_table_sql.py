"""Lakehouse SQL verbs (VERDICT r12 #4): TABLE_AT time travel, MERGE
INTO, DELETE FROM, RESTORE, DESCRIBE HISTORY routed through
sources/table_sql.py onto the manifest protocol."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_dag_spark.sources.table_sql import run_table_sql
from etl_dag_spark.sources.versions import (
    history,
    merge_version,
    read_version,
    write_version,
)


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), path
    )
    write_version(
        spark.createDataFrame([(3, "c")], "k int, v string"),
        path,
        op="append",
    )
    return path


def test_table_at_time_travel(spark, table):
    tip = run_table_sql(spark, f"SELECT * FROM TABLE_AT('{table}')")
    assert _rows(tip) == [(1, "a"), (2, "b"), (3, "c")]
    v1 = run_table_sql(
        spark, f"SELECT k, v FROM TABLE_AT('{table}', 1) WHERE k > 1"
    )
    assert _rows(v1) == [(2, "b")]
    # two different snapshots of the SAME table in one statement
    both = run_table_sql(
        spark,
        f"""SELECT a.k, a.v FROM TABLE_AT('{table}', 1) a
            JOIN TABLE_AT('{table}', 2) b ON a.k = b.k""",
    )
    assert _rows(both) == [(1, "a"), (2, "b")]


def test_merge_into_matches_python_api(spark, table, tmp_path):
    # the same batch through the Python API on a twin table
    twin = str(tmp_path / "twin")
    write_version(read_version(spark, table, 2), twin)
    updates = spark.createDataFrame(
        [(2, "B"), (9, "z")], "k int, v string"
    )
    updates.createOrReplaceTempView("upd_view")
    v = run_table_sql(
        spark,
        f"""MERGE INTO '{table}' AS t USING upd_view AS s
            ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""",
    )
    assert v == 3
    merge_version(spark, twin, updates, ["k"], "k")
    assert _rows(read_version(spark, table)) == _rows(
        read_version(spark, twin)
    )
    assert _rows(read_version(spark, table)) == [
        (1, "a"), (2, "B"), (3, "c"), (9, "z")
    ]
    # subquery source form, reversed ON sides
    run_table_sql(
        spark,
        f"""MERGE INTO '{table}' t
            USING (SELECT 9 AS k, 'Z' AS v) s
            ON s.k = t.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""",
    )
    assert (9, "Z") in _rows(read_version(spark, table))


def test_delete_where_null_predicate_survives(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "c")], "k int, v string"
        ),
        path,
    )
    v = run_table_sql(spark, f"DELETE FROM '{path}' WHERE v = 'c'")
    assert v == 2
    # NULL-predicate row (k=2: v='c' is NULL) must SURVIVE (SQL DELETE)
    assert _rows(read_version(spark, path)) == [(1, "a"), (2, None)]


def test_update_where_null_predicate_survives(spark, tmp_path):
    """r14 (VERDICT r13 #2): SQL UPDATE semantics — TRUE rows get the
    assignments, FALSE **and NULL** rows survive unchanged; every
    assignment casts to the column's type so schema never drifts; the
    pre-update snapshot stays addressable (time travel intact)."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, "c")],
        "k int, price double, v string",
    )
    write_version(base.repartition(2, "k"), path)
    v = run_table_sql(
        spark,
        f"UPDATE '{path}' SET price = price + 1, v = upper(v) "
        "WHERE price > 15",
    )
    assert v == 2
    got = sorted(
        (r.k, r.price, r.v) for r in read_version(spark, path).collect()
    )
    # k=2's predicate is NULL (NULL > 15) — unchanged, not updated
    assert got == [(1, 10.0, "a"), (2, None, "b"), (3, 31.0, "C")]
    assert read_version(spark, path).schema == base.schema
    assert sorted(
        (r.k, r.price, r.v) for r in read_version(spark, path, 1).collect()
    ) == [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, "c")]
    assert history(path)[-1]["op"] == "update"
    # integer-typed assignment: the expression casts to the column type
    run_table_sql(spark, f"UPDATE '{path}' SET k = k + 10 WHERE k = 1")
    assert read_version(spark, path).schema == base.schema
    # no WHERE = every row
    run_table_sql(spark, f"UPDATE '{path}' SET v = 'x'")
    assert {r.v for r in read_version(spark, path).collect()} == {"x"}


def test_update_assignments_read_the_preimage(spark, tmp_path):
    """SET a = b, b = a must SWAP (SQL assignment semantics), never
    cascade through a chained rewrite."""
    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame([(1, 7, 9)], "k int, a int, b int"), path
    )
    run_table_sql(spark, f"UPDATE '{path}' SET a = b, b = a WHERE k = 1")
    r = read_version(spark, path).collect()[0]
    assert (r.a, r.b) == (9, 7)


def test_merge_when_matched_delete(spark, tmp_path):
    """r14 (VERDICT r13 #2): the DELETE branch of MERGE — matched keys
    go, unmatched stay, an AND-condition narrows the matches, and a
    NULL condition keeps the row (SQL three-valued logic)."""
    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame(
            [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)],
            "k int, price double",
        ).repartition(2, "k"),
        path,
    )
    spark.createDataFrame(
        [(1, 100.0), (2, 50.0), (3, 5.0), (9, 1.0)], "k int, floor double"
    ).createOrReplaceTempView("mdel_src")
    v = run_table_sql(
        spark,
        f"""MERGE INTO '{path}' AS t USING mdel_src AS s
            ON t.k = s.k
            WHEN MATCHED AND t.price < s.floor THEN DELETE""",
    )
    assert v == 2
    # k=1 deleted (10<100); k=2 cond NULL → survives; k=3 cond FALSE →
    # survives; k=4 unmatched; k=9 not in target
    assert sorted(r.k for r in read_version(spark, path).collect()) == [
        2, 3, 4,
    ]
    assert history(path)[-1]["op"] == "delete"
    # unconditioned form: every matched key goes
    spark.createDataFrame([(4,)], "k int").createOrReplaceTempView(
        "mdel_src2"
    )
    run_table_sql(
        spark,
        f"MERGE INTO '{path}' t USING mdel_src2 s ON s.k = t.k "
        "WHEN MATCHED THEN DELETE",
    )
    assert sorted(r.k for r in read_version(spark, path).collect()) == [2, 3]


def test_merge_when_matched_update_set(spark, tmp_path):
    """r14: the explicit-assignment MERGE branch — alias-qualified SET
    targets, s.-referencing values, an AND-condition with SQL
    three-valued logic (NULL keeps the row), optional INSERT * for
    unmatched source rows, key columns unassignable."""
    from etl_dag_spark.sources.versions import merge_update_version

    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame(
            [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, "c")],
            "k int, price double, v string",
        ).repartition(2, "k"),
        path,
    )
    spark.createDataFrame(
        [(1, 5.0), (2, 7.0), (3, 99.0)], "k int, np double"
    ).createOrReplaceTempView("mupd_src")
    v = run_table_sql(
        spark,
        f"""MERGE INTO '{path}' AS t USING mupd_src AS s
            ON t.k = s.k
            WHEN MATCHED AND t.price > s.np
            THEN UPDATE SET t.price = s.np, v = upper(t.v)""",
    )
    assert v == 2
    got = sorted(
        (r.k, r.price, r.v) for r in read_version(spark, path).collect()
    )
    # k=1: 10>5 → updated; k=2: NULL>7 is NULL → unchanged; k=3:
    # 30>99 FALSE → unchanged
    assert got == [(1, 5.0, "A"), (2, None, "b"), (3, 30.0, "c")]
    assert history(path)[-1]["op"] == "update"
    # INSERT * branch appends unmatched source rows; schema casts
    spark.createDataFrame(
        [(2, 70.0, "B"), (8, 80.0, "H")], "k int, price double, v string"
    ).createOrReplaceTempView("mupd_src2")
    v = run_table_sql(
        spark,
        f"""MERGE INTO '{path}' t USING mupd_src2 s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET price = s.price
            WHEN NOT MATCHED THEN INSERT *""",
    )
    assert history(path)[-1]["op"] == "merge"
    got = sorted(
        (r.k, r.price) for r in read_version(spark, path).collect()
    )
    assert got == [(1, 5.0), (2, 70.0), (3, 30.0), (8, 80.0)]
    # merge keys are unassignable; duplicate source keys refused
    with pytest.raises(ValueError, match="key columns"):
        run_table_sql(
            spark,
            f"MERGE INTO '{path}' t USING mupd_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET k = s.k",
        )
    spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], "k int, np double"
    ).createOrReplaceTempView("mupd_dup")
    with pytest.raises(ValueError, match="duplicate"):
        merge_update_version(
            spark, path, spark.table("mupd_dup"), ["k"],
            {"price": "s.np"},
        )


def test_merge_duplicate_source_keys_refused(spark, table):
    """r14 ADVICE fix: SQL MERGE forbids multiple source rows matching
    one target row — the router refuses BEFORE touching the table, so
    the committed state can never be tie-break-nondeterministic."""
    spark.createDataFrame(
        [(2, "x"), (2, "y"), (5, "z")], "k int, v string"
    ).createOrReplaceTempView("dup_src")
    tip_before = history(table)[-1]["version"]
    with pytest.raises(ValueError, match="duplicate"):
        run_table_sql(
            spark,
            f"""MERGE INTO '{table}' t USING dup_src s ON t.k = s.k
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""",
        )
    assert history(table)[-1]["version"] == tip_before  # nothing committed


def test_restore_and_history(spark, table):
    run_table_sql(spark, f"DELETE FROM '{table}' WHERE k = 1")
    v = run_table_sql(
        spark, f"RESTORE TABLE '{table}' TO VERSION AS OF 2"
    )
    assert v == 4
    assert _rows(read_version(spark, table)) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    h = run_table_sql(spark, f"DESCRIBE HISTORY '{table}'")
    got = [(r.version, r.op) for r in h.orderBy("version").collect()]
    assert got == [
        (1, "overwrite"), (2, "append"), (3, "delete"), (4, "restore")
    ]
    assert [x["version"] for x in history(table)] == [1, 2, 3, 4]


def test_table_changes_sql(spark, tmp_path):
    """r14: TABLE_CHANGES('<path>', v1[, v2][, KEY (...)]) == the
    Python cdc_rows — keyed across a rewrite commit, keyless on
    append-only lineage, and composable inside a bigger SELECT."""
    from etl_dag_spark.sources.versions import cdc_rows

    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1)], "k int, v string, ts int"
        ),
        path,
    )
    write_version(
        spark.createDataFrame([(3, "c", 1)], "k int, v string, ts int"),
        path,
        op="append",
    )
    merge_version(
        spark,
        path,
        spark.createDataFrame([(2, "B", 2)], "k int, v string, ts int"),
        ["k"],
        "ts",
    )
    got = run_table_sql(
        spark,
        f"SELECT * FROM TABLE_CHANGES('{path}', 1, 3, KEY (k))",
    )
    want = cdc_rows(spark, path, 1, 3, key_cols=["k"])
    key = lambda df: sorted(  # noqa: E731
        (r.k, r.v, r._change_type) for r in df.collect()
    )
    assert key(got) == key(want)
    # keyless works on append-only lineage; to_v defaults to the tip
    got2 = run_table_sql(
        spark, f"SELECT k, v FROM TABLE_CHANGES('{path}', 1, 2) WHERE k > 0"
    )
    assert _rows(got2) == [(3, "c")]
    # composes with TABLE_AT in one statement
    both = run_table_sql(
        spark,
        f"""SELECT c.k FROM TABLE_CHANGES('{path}', 2, 3, KEY (k)) c
            JOIN TABLE_AT('{path}', 1) a ON c.k = a.k""",
    )
    assert sorted(r.k for r in both.collect()) == [2, 2]


def test_timestamp_as_of_sql(spark, tmp_path):
    """r14 (VERDICT r13 #4): TABLE_AT with a TIMESTAMP literal and
    RESTORE ... TO TIMESTAMP AS OF resolve to the last version
    committed at or before it (UTC), equal to the version-number
    forms."""
    import time
    from datetime import datetime, timezone

    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame([(1, "a")], "k int, v string"), path
    )
    time.sleep(0.05)
    between = datetime.now(timezone.utc).replace(tzinfo=None).isoformat()
    time.sleep(0.05)
    write_version(
        spark.createDataFrame([(2, "b")], "k int, v string"),
        path,
        op="append",
    )
    ts_read = run_table_sql(
        spark,
        f"SELECT * FROM TABLE_AT('{path}', TIMESTAMP '{between}')",
    )
    assert _rows(ts_read) == [(1, "a")]
    v = run_table_sql(
        spark,
        f"RESTORE TABLE '{path}' TO TIMESTAMP AS OF '{between}'",
    )
    assert v == 3
    assert _rows(read_version(spark, path)) == [(1, "a")]
    # the commit time surfaces in DESCRIBE HISTORY
    h = run_table_sql(spark, f"DESCRIBE HISTORY '{path}'")
    assert "ts" in h.columns
    tss = [r.ts for r in h.orderBy("version").collect()]
    assert all(t is not None for t in tss)


def test_alter_constraint_sql(spark, tmp_path):
    """r14: the ALTER TABLE constraint verbs route to the metadata-only
    alter commit; a violating ADD refuses before anything lands."""
    from etl_dag_spark.sources.versions import ConstraintViolationError

    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame([(1, "a"), (2, None)], "k int, v string"),
        path,
    )
    with pytest.raises(ConstraintViolationError):
        run_table_sql(
            spark, f"ALTER TABLE '{path}' ALTER COLUMN v SET NOT NULL"
        )
    v = run_table_sql(spark, f"ALTER TABLE '{path}' ADD CHECK (k > 0)")
    assert v == 2
    assert history(path)[-1]["op"] == "alter"
    with pytest.raises(ConstraintViolationError):
        write_version(
            spark.createDataFrame([(0, "x")], "k int, v string"),
            path,
            op="append",
        )
    run_table_sql(spark, f"ALTER TABLE '{path}' DROP CONSTRAINTS")
    write_version(
        spark.createDataFrame([(0, "x")], "k int, v string"),
        path,
        op="append",
    )
    assert len(read_version(spark, path).collect()) == 3


def test_alter_schema_sql(spark, tmp_path):
    """r14: the ADD COLUMNS / DROP COLUMN verbs through SQL."""
    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame([(1, "a")], "k int, v string"), path
    )
    v = run_table_sql(
        spark,
        f"ALTER TABLE '{path}' ADD COLUMNS (score double, tag string)",
    )
    assert v == 2
    assert read_version(spark, path).columns == ["k", "v", "score", "tag"]
    run_table_sql(spark, f"ALTER TABLE '{path}' DROP COLUMN tag")
    assert read_version(spark, path).columns == ["k", "v", "score"]
    run_table_sql(spark, f"ALTER TABLE '{path}' DROP COLUMNS (v, score)")
    assert read_version(spark, path).columns == ["k"]
    assert [r.k for r in read_version(spark, path).collect()] == [1]


def test_unsupported_statements_raise(spark, table):
    with pytest.raises(ValueError, match="supported statements"):
        run_table_sql(spark, f"TRUNCATE TABLE '{table}'")
    with pytest.raises(ValueError, match="equi-key"):
        run_table_sql(
            spark,
            f"""MERGE INTO '{table}' t USING (SELECT 1 AS k, 'x' AS v) s
                ON t.k > s.k
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""",
        )
    with pytest.raises(ValueError, match="match by name"):
        run_table_sql(
            spark,
            f"""MERGE INTO '{table}' t USING (SELECT 1 AS kk, 'x' AS v) s
                ON t.k = s.kk
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""",
        )


def test_optimize_and_vacuum_statements(spark, tmp_path):
    """OPTIMIZE [ZORDER BY] and VACUUM [RETAIN n VERSIONS] [DRY RUN]
    route to compact_version / vacuum_report / vacuum."""
    import os

    from etl_dag_spark.sources.versions import _load_manifest

    path = str(tmp_path / "tbl")
    for k in range(4):  # streaming-debris shape: 4 small commits
        write_version(
            spark.createDataFrame([(k, f"v{k}")], "k int, v string"),
            path,
            op="overwrite" if k == 0 else "append",
        )
    v = run_table_sql(spark, f"OPTIMIZE '{path}' ZORDER BY (k)")
    assert v == 5
    m = _load_manifest(path, 5)
    assert _rows(read_version(spark, path)) == [
        (0, "v0"), (1, "v1"), (2, "v2"), (3, "v3")
    ]
    # the zorder layout recorded stats for the clustered column
    assert any("k" in per for per in m.get("stats", {}).values())
    # DRY RUN: reports, touches nothing
    rep = run_table_sql(
        spark, f"VACUUM '{path}' RETAIN 1 VERSIONS DRY RUN"
    ).collect()[0]
    # only the optimized snapshot survives: the pre-optimize small
    # files become unreferenced and reclaimable
    assert rep.dropped_versions == [1, 2, 3, 4]
    assert rep.reclaim_bytes > 0
    assert len(rep.reclaim_dirs) == 4
    assert [h["version"] for h in history(path)] == [1, 2, 3, 4, 5]
    # real vacuum drops exactly what the dry run promised
    dropped = run_table_sql(spark, f"VACUUM '{path}' RETAIN 1 VERSIONS")
    assert dropped == [1, 2, 3, 4]
    assert [h["version"] for h in history(path)] == [5]
    for d in rep.reclaim_dirs:
        assert not os.path.exists(d)
    assert _rows(read_version(spark, path)) == [
        (0, "v0"), (1, "v1"), (2, "v2"), (3, "v3")
    ]


def test_merge_on_clause_parser_fuzz():
    """Property: any equi-key conjunction over identifiers parses to
    the key list regardless of side order, case, or whitespace; any
    asymmetric or non-equi clause raises."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_dag_spark.sources.table_sql import _merge_keys

    ident = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True)

    @settings(max_examples=200, deadline=None)
    @given(
        keys=st.lists(ident, min_size=1, max_size=4, unique_by=str.lower),
        flips=st.lists(st.booleans(), min_size=4, max_size=4),
        spaces=st.sampled_from([" ", "  ", " \n "]),
    )
    def check(keys, flips, spaces):
        clauses = []
        for k, flip in zip(keys, flips):
            clauses.append(
                f"s.{k}{spaces}={spaces}t.{k}" if flip else f"t.{k} = s.{k}"
            )
        on = " AND ".join(clauses)
        assert _merge_keys(on, "t", "s") == list(keys)

    check()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        _merge_keys("t.a = s.b", "t", "s")  # asymmetric names
    with _pytest.raises(ValueError):
        _merge_keys("t.a > s.a", "t", "s")  # non-equi
    with _pytest.raises(ValueError):
        _merge_keys("t.a = s.a OR t.b = s.b", "t", "s")  # disjunction
    with _pytest.raises(ValueError):
        _merge_keys("x.a = s.a", "t", "s")  # unknown alias


def test_update_set_splitter_fuzz():
    """Property (r14, companion to the ON-clause fuzz): any assignment
    list whose expressions contain nested parens, quoted literals with
    commas/equals, and arbitrary whitespace splits back to exactly the
    (column, expression) pairs it was built from; malformed parts and
    duplicate targets raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_dag_spark.sources.table_sql import _split_assignments

    ident = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True)
    # expression atoms that stress the depth-0 comma splitter
    atom = st.sampled_from(
        [
            "x + 1",
            "coalesce(a, b, 0)",
            "'lit,with,commas'",
            "'it''s = tricky'",
            "greatest(f(a, b), g(c))",
            "CAST(p AS DOUBLE)",
            "s.np * 2",
            "(a + (b - c)) / 2",
        ]
    )
    spaces = st.sampled_from([" ", "  ", " \n "])

    @settings(max_examples=200, deadline=None)
    @given(
        cols=st.lists(ident, min_size=1, max_size=5, unique=True),
        exprs=st.lists(atom, min_size=5, max_size=5),
        sp=spaces,
        qualify=st.booleans(),
    )
    def check(cols, exprs, sp, qualify):
        alias = "t" if qualify else None
        parts = []
        for c, e in zip(cols, exprs):
            lhs = f"t.{c}" if qualify else c
            parts.append(f"{sp}{lhs}{sp}={sp}{e}{sp}")
        sets = ",".join(parts)
        got = _split_assignments(sets, alias=alias)
        assert got == {c: e for c, e in zip(cols, exprs)}

    check()

    with pytest.raises(ValueError):
        _split_assignments("a = 1, a = 2")  # duplicate target
    with pytest.raises(ValueError):
        _split_assignments("just_an_expr")  # no '='
    with pytest.raises(ValueError):
        _split_assignments("t.a = 1")  # qualified LHS on bare UPDATE
    with pytest.raises(ValueError):
        _split_assignments("x.a = 1", alias="t")  # wrong alias
    # a quoted '=' or comma never splits/parses as an assignment op
    assert _split_assignments("a = 'x=y, z'") == {"a": "'x=y, z'"}
