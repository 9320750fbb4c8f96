"""Plan-regression snapshots for the headline queries.

A silent physical-plan regression (broadcast join degrading to
sort-merge, a lost parquet filter pushdown, an extra Exchange) only
shows up as bench noise unless the plan itself is pinned. This module
fingerprints ``explain("formatted")`` for the headline queries —
normalized for expression IDs, plan node numbers, and file paths — and
diffs against golden files in ``tests/golden_plans/``.

On an intentional plan change, regenerate with:

    UPDATE_PLAN_SNAPSHOTS=1 python -m pytest tests/test_plan_snapshots.py -q

and review the golden-file diff in git like any other code change.
"""

from __future__ import annotations

import difflib
import os
import re

import pytest

from etl_dag_spark.queries import SPARK_QUERIES

from tests.conftest import SF_DIR

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_plans")

# the queries whose plans are load-bearing: the reference-parity BI
# join, the TPC-H-class agg join, the two LSH dedup scale paths, and
# the distributed-ntile window rewrite
SNAPSHOT_QUERIES = [
    "bi_revenue_by_category",
    "olap_shipping_priority",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine_lsh",
    "olap_ntile_quartiles",
    # distributed prefix-sum: the plan must never contain a
    # single-partition global sort window
    "etl_pack_sequences",
    # r6 broadcast-inversion fix: the 20-row top-k frame must be the
    # broadcast side, never the SF-scaled customer table
    "olap_returned_items",
    # r7: line-frequency dedup (the frequency join-back must stay
    # unhinted), the composed pipeline with its checkpointed filter
    # stage, and the argmin-per-key TPC-H Q2 rewrite
    "text_line_dedup",
    "olap_min_cost_supplier",
    # r7 cont.: winnowing (fingerprint window must reuse the shingle
    # window's doc_id partitioning — no Exchange between them), the
    # CMS heavy-hitter probe (constant-bound sketch broadcast), and
    # tf-idf (vocabulary join-back must stay unhinted)
    "dedup_winnowing",
    "text_countmin_hitters",
    "text_tfidf_keywords",
    # late r7: last-touch attribution must stay ONE user_id shuffle
    # (union + window carry — a regression to a range join would
    # explode on heavy clickers), and pseudonymization must stay a
    # zero-shuffle scan-speed projection
    "olap_attribution_last_touch",
    "etl_pseudonymize",
    # r9: the suffix sort (range exchange + __pid-local windows, never
    # a single-partition global sort; the pre-range pin hides lineage
    # so the LogicalRDD leaf is the evidence), and the wide training
    # export (sample filter at the lineitem scan, bounded dims
    # broadcast, SF-scaled dims decided by AQE)
    "text_suffix_dup_spans",
    "etl_training_export",
    # r13: the lateness profile must stay per-HOUR partitioned windows
    # plus a tiny hourly-max cumulative — never a global-sort window
    # over the event table; weighted Jaccard pins the persist()-based
    # index reuse (InMemoryRelation, no plan-build materialization)
    "stream_lateness_profile",
    "dedup_weighted_jaccard",
]

# Node headers worth pinning: strategy-bearing operators. Detail
# sections (column lists, codegen ids, stats) churn with no semantic
# change, so the fingerprint keeps only the operator tree plus pushdown
# evidence from scan details.
_TREE_LINE = re.compile(r"^[\s+*:-]*(?:\([0-9]+\)\s+)?([A-Za-z][A-Za-z0-9]*.*)$")


def plan_fingerprint(df) -> str:
    """Normalized formatted-explain fingerprint: the operator tree with
    node numbers / expression IDs / paths / sizes scrubbed, plus sorted
    PushedFilters and ReadSchema lines from every parquet scan."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    raw = df._jdf.queryExecution().explainString(mode)

    tree, details = raw.split("\n\n", 1) if "\n\n" in raw else (raw, "")
    out = []
    for line in tree.splitlines():
        # "* HashAggregate (5)" / "+- Exchange (4)" → keep shape, drop number
        line = re.sub(r"\s*\([0-9]+\)\s*$", "", line)
        # AQE re-plans at runtime; the initial plan is what we pin
        line = re.sub(r"AdaptiveSparkPlan.*", "AdaptiveSparkPlan", line)
        if line.strip():
            out.append(line.rstrip())

    pushdown = []
    for line in details.splitlines():
        s = line.strip()
        if s.startswith(("PushedFilters:", "ReadSchema:")):
            s = re.sub(r"#[0-9]+", "#", s)  # expression ids
            s = re.sub(r"file:[^\s,\]]+", "file:<path>", s)
            pushdown.append(s)
    return "\n".join(out + sorted(set(pushdown))) + "\n"


@pytest.fixture(scope="module", autouse=True)
def _default_sf_only():
    if SF_DIR != "/root/testdata/sf0.001":
        pytest.skip("plan snapshots are pinned at the default sf0.001 fixture")


@pytest.mark.parametrize("name", SNAPSHOT_QUERIES)
def test_plan_matches_golden(spark, name):
    # an earlier test running the same query leaves persist() entries
    # in the CacheManager, which substitutes InMemoryRelation into ANY
    # later plan-equal subtree — fingerprint the UNCACHED plan so the
    # golden is independent of suite order
    spark.catalog.clearCache()
    got = plan_fingerprint(SPARK_QUERIES[name](spark, SF_DIR))
    path = os.path.join(GOLDEN_DIR, f"{name}.txt")
    if os.environ.get("UPDATE_PLAN_SNAPSHOTS") == "1":
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(got)
        return
    assert os.path.exists(path), (
        f"no golden plan for {name}; run UPDATE_PLAN_SNAPSHOTS=1 pytest "
        "tests/test_plan_snapshots.py"
    )
    with open(path) as f:
        want = f.read()
    if got != want:
        diff = "\n".join(
            difflib.unified_diff(
                want.splitlines(), got.splitlines(),
                fromfile=f"golden/{name}", tofile="current", lineterm="",
            )
        )
        raise AssertionError(
            f"physical plan for {name} drifted from golden snapshot — "
            "review for a lost broadcast/pushdown or a new Exchange; if "
            "intentional, regenerate with UPDATE_PLAN_SNAPSHOTS=1:\n" + diff
        )


def test_no_scan_reads_all_columns_for_narrow_queries(spark):
    """Column pruning check: the revenue query projects 2 output
    columns from lineitem; its scan must not read the full 11-column
    schema."""
    fp = plan_fingerprint(SPARK_QUERIES["bi_revenue_by_category"](spark, SF_DIR))
    schemas = [l for l in fp.splitlines() if l.startswith("ReadSchema:")]
    assert schemas, "no ReadSchema in fingerprint — scan detail parsing broke"
    for s in schemas:
        if "l_orderkey" in s or "l_extendedprice" in s:
            n_cols = s.count(":")  # struct<a:double,b:string,...> field count
            assert n_cols <= 6, f"lineitem scan reads too many columns: {s}"
