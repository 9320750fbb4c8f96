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


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)
