"""Loader for the harness test tables (TPC-H-ish star schema + events +
documents + embeddings), one parquet file per table.

Mirrors the reference's source-acquisition step (ETL_DAG.py:33-42
``get_csv_paths`` + ETL_DAG.py:162-164 reads) but as lazy Spark scans:
nothing is materialized, so Catalyst prunes columns and pushes filters
into the parquet reader for whatever query consumes the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every test table as a lazy DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with usable timestamps.

    The harness writes ``ts`` as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright; ``nanosAsLong`` reads it as raw
    int64 nanoseconds. Two derived columns are added:

    - ``ts_ns``   — exact integer nanoseconds (for arithmetic: gaps,
      buckets; integer math is engine-portable and order-independent)
    - ``ts_utc``  — TIMESTAMP_NTZ at microsecond precision, built with
      wall-clock ``timestampadd`` so the value never depends on the
      session timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "events")
    return df.withColumn("ts_ns", F.col("ts").cast("bigint")).withColumn(
        "ts_utc",
        F.expr("timestampadd(MICROSECOND, ts DIV 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
    )
