"""Raw-SQL surface: the reference's users write SQL (BI_Questions.sql,
sql_definitions.sql); this module lets them run it nearly verbatim —
``register_views`` exposes the test tables as temp views and the
queries below are the reference's own SQL re-typed for Spark SQL
dialect (DATE_TRUNC → date_format, Snowflake table refs → view names).

Because ``spark.sql`` compiles to the same Catalyst plans as the
DataFrame API, everything the engine guarantees (pushdown, broadcast,
partial aggregation) applies to ad-hoc SQL identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_dag_spark.sources.tables import TABLES, load_events, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every test table as a temp view (events with usable
    timestamps via the nanos-aware loader)."""
    for name in TABLES:
        if name == "events":
            load_events(spark, sf_dir).createOrReplaceTempView(name)
        else:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# BI_Questions.sql:1-10, re-typed: categories = p_brand, revenue from
# order lines at exact cents (see queries.py portability rules).
REVENUE_BY_CATEGORY_SQL = """
SELECT p.p_brand AS product_category,
       sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) / CAST(100.0 AS DOUBLE)
         AS total_sales_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY total_sales_revenue DESC
"""

# BI_Questions.sql:12-24 (RANK() OVER window, top 5 with ties).
TOP_CUSTOMERS_SQL = """
WITH customer_sales AS (
    SELECT o_custkey,
           sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS purchase_cents
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT o_custkey, purchase_cents,
           CAST(rank() OVER (ORDER BY purchase_cents DESC) AS INT) AS top_rank
    FROM customer_sales
)
SELECT CAST(c.c_custkey AS BIGINT) AS customer_id,
       c.c_name AS customer_name,
       r.purchase_cents / CAST(100.0 AS DOUBLE) AS purchase_amount,
       r.top_rank
FROM ranked r JOIN customer c ON c.c_custkey = r.o_custkey
WHERE r.top_rank <= 5
"""


# BI_Questions.sql:27-37 (DATE_TRUNC trend, trailing 12 months
# anchored at MAX(o_orderdate); Snowflake DATE_TRUNC('month', …) →
# date_format 'yyyy-MM'). CAST(100.0 AS DOUBLE): a bare 100.0 literal
# is DECIMAL in Spark SQL (unlike the DataFrame API's Python float).
MONTHLY_TREND_SQL = """
WITH anchor AS (
    SELECT date_format(max(o_orderdate) - INTERVAL 11 MONTH, 'yyyy-MM')
             AS from_month
    FROM orders
)
SELECT date_format(o_orderdate, 'yyyy-MM') AS sales_month,
       sum(CAST(floor(o_totalprice * 100) AS BIGINT)) / CAST(100.0 AS DOUBLE)
         AS total_sales
FROM orders, anchor
WHERE date_format(o_orderdate, 'yyyy-MM') >= from_month
GROUP BY sales_month
"""


# sql_definitions.sql:54-84 (first approach), re-typed nearly verbatim:
# Spark 4.x runs WITH RECURSIVE natively, so the reference's recursive
# CTE needs NO rewrite — only its employees(EmployeeID, Name, ManagerID)
# table mapped onto the region→nation→customer tree (the same node/edge
# encoding the DataFrame twin bi_hierarchy_levels uses; regions are the
# NULL-manager roots). Output aliased to the shared oracle's columns:
# the reference walks UP from each root employee, so its RootEmployeeID
# is the descendant (node_id) and the recursion cursor the ancestor.
HIERARCHY_LEVELS_SQL = """
WITH RECURSIVE employees AS (
    SELECT CAST(r_regionkey AS BIGINT) AS EmployeeID,
           r_name AS Name,
           CAST(NULL AS BIGINT) AS ManagerID
    FROM region
    UNION ALL
    SELECT CAST(n_nationkey + 100 AS BIGINT), n_name,
           CAST(n_regionkey AS BIGINT)
    FROM nation
    UNION ALL
    SELECT CAST(c_custkey + 1000 AS BIGINT), c_name,
           CAST(c_nationkey + 100 AS BIGINT)
    FROM customer
),
Employee_Hierarchy_Tab AS (
    SELECT
        EmployeeID,
        Name,
        ManagerID,
        0 AS Level,
        EmployeeID AS RootEmployeeID
    FROM employees

    UNION ALL

    SELECT
        e.EmployeeID,
        e.Name,
        e.ManagerID,
        eh.Level + 1 AS Level,
        eh.RootEmployeeID
    FROM employees e
    INNER JOIN Employee_Hierarchy_Tab eh
      ON e.EmployeeID = eh.ManagerID
)
SELECT
    eht.EmployeeID AS ancestor_id,
    eht.Name AS ancestor_name,
    eht.RootEmployeeID AS node_id,
    e.Name AS node_name,
    CAST(eht.Level AS INT) AS level
FROM Employee_Hierarchy_Tab eht
INNER JOIN employees e
  ON eht.RootEmployeeID = e.EmployeeID
"""

# sql_definitions.sql:93-121 (second approach, ManagerChain
# concatenation), re-typed nearly verbatim over the same employees
# mapping; ' -> ' separator and (node_id, chain, depth) aliases match
# the shared bi_ancestor_chain oracle. The reference's final
# `WHERE ManagerID IS NULL` keeps complete (root-reaching) chains only.
ANCESTOR_CHAIN_SQL = """
WITH RECURSIVE employees AS (
    SELECT CAST(r_regionkey AS BIGINT) AS EmployeeID,
           r_name AS Name,
           CAST(NULL AS BIGINT) AS ManagerID
    FROM region
    UNION ALL
    SELECT CAST(n_nationkey + 100 AS BIGINT), n_name,
           CAST(n_regionkey AS BIGINT)
    FROM nation
    UNION ALL
    SELECT CAST(c_custkey + 1000 AS BIGINT), c_name,
           CAST(c_nationkey + 100 AS BIGINT)
    FROM customer
),
EmployeeHierarchy AS (
    SELECT
        EmployeeID,
        Name AS Employee_Name,
        ManagerID,
        Name AS ManagerChain,
        1 AS Hierarchy_Level
    FROM employees

    UNION ALL

    SELECT
        eh.EmployeeID,
        eh.Employee_Name,
        e.ManagerID,
        eh.ManagerChain || ' -> ' || e.Name,
        eh.Hierarchy_Level + 1
    FROM EmployeeHierarchy eh
    JOIN employees e ON eh.ManagerID = e.EmployeeID
)
SELECT
    EmployeeID AS node_id,
    ManagerChain AS chain,
    CAST(Hierarchy_Level AS INT) AS depth
FROM EmployeeHierarchy
WHERE ManagerID IS NULL
"""

# sql_definitions.sql:133-139 (SQL question 2), re-typed nearly
# verbatim: Orders → orders, Payments → purchase events (the data
# model's payment record), CustomerID → o_custkey/user_id. DISTINCT
# matches the one-row-per-customer contract of the DataFrame twin.
CUSTOMERS_NO_PURCHASE_SQL = """
SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS customer_id
FROM orders o
WHERE NOT EXISTS (
    SELECT 1
    FROM events p
    WHERE p.user_id = o.o_custkey AND p.event_type = 'purchase'
)
"""


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)
