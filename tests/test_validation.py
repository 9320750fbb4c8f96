"""Data-quality rule engine on crafted violations (ETL_DAG.py:90-142
semantics: positive amounts, parseable/required dates, non-negative
prices, well-formed identifiers — plus the quarantine split the
reference's raise-on-violation becomes at scale)."""

from __future__ import annotations

import pytest

from etl_dag_spark.operators.validation import (
    Rule,
    dq_report,
    require_columns,
    split_valid,
)

RULES = (
    Rule("sales", "amount_positive", "amount > 0"),
    Rule("sales", "date_not_null", "sale_date IS NOT NULL"),
    Rule("sales", "email_well_formed", "email RLIKE '^[^@]+@[^@]+\\\\.[^@]+$'"),
)


@pytest.fixture(scope="module")
def sales(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "2024-01-01", "a@b.com"),
            (2, -5.0, "2024-01-02", "c@d.org"),   # bad amount
            (3, 7.5, None, "e@f.io"),             # bad date
            (4, 3.0, "2024-01-04", "not-an-email"),  # bad email
            (5, 0.0, None, "x"),                  # bad amount+date+email
        ],
        "id int, amount double, sale_date string, email string",
    )


def test_dq_report_counts(spark, sales):
    rows = {
        r.rule_name: (r.violations, r.total_rows)
        for r in dq_report({"sales": sales}, RULES).collect()
    }
    assert rows == {
        "amount_positive": (2, 5),
        "date_not_null": (2, 5),
        "email_well_formed": (2, 5),
    }


def test_split_valid_quarantines_with_failed_rule_names(spark, sales):
    valid, invalid = split_valid(sales, list(RULES))
    assert {r.id for r in valid.collect()} == {1}
    bad = {r.id: sorted(r["__failed_rules"]) for r in invalid.collect()}
    assert bad[2] == ["amount_positive"]
    assert bad[3] == ["date_not_null"]
    assert bad[4] == ["email_well_formed"]
    assert bad[5] == ["amount_positive", "date_not_null", "email_well_formed"]


def test_require_columns(spark, sales):
    require_columns(sales, ["id", "amount"])  # present: no raise
    with pytest.raises(ValueError, match="missing required columns"):
        require_columns(sales, ["id", "nope", "amount"])


def test_dq_report_single_scan_per_table(spark, sales):
    """All of a table's rules compile into ONE aggregate — the plan
    contains exactly one scan of the input."""
    plan = dq_report({"sales": sales}, RULES)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalRelation") + plan.count("LogicalRDD") == 1


def test_null_input_counts_as_violation(spark):
    """NULL predicate inputs are violations (pred IS NOT TRUE), matching
    the reference's pandas semantics where NaN comparisons are falsy and
    validate_data raises — a NULL AMOUNT must not silently pass."""
    df = spark.createDataFrame(
        [(1, 10.0, "a@b.com"), (2, None, None)],
        "id int, amount double, email string",
    )
    rules = (
        Rule("t", "amount_positive", "amount > 0"),
        Rule("t", "email_well_formed", "email RLIKE '^[^@]+@[^@]+\\\\.[^@]+$'"),
    )
    rows = {
        r.rule_name: r.violations for r in dq_report({"t": df}, rules).collect()
    }
    assert rows == {"amount_positive": 1, "email_well_formed": 1}
    valid, invalid = split_valid(df, list(rules))
    assert {r.id for r in valid.collect()} == {1}
    bad = {r.id: sorted(r["__failed_rules"]) for r in invalid.collect()}
    assert bad == {2: ["amount_positive", "email_well_formed"]}
