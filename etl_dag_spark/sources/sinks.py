"""Batch sinks.

Mirrors the reference's truncate-and-load into Snowflake
(ETL_DAG.py:210-229: ``TRUNCATE TABLE`` + ``write_pandas``) with
idempotent overwrite semantics. ``mode("overwrite")`` on a parquet
directory IS truncate-and-load; with ``partition_by`` plus dynamic
partition overwrite, a rerun replaces only the partitions it produced —
the idempotency pattern that matters when a daily DAG backfills one day
of a 100 TB table instead of rewriting all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def overwrite_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    buckets: tuple[int, str] | None = None,
) -> None:
    """Truncate-and-load a parquet dataset.

    ``partition_by``: directory partitioning → partition pruning for
    readers filtering on those columns.
    ``buckets``: (n, col) — placeholder for bucketed saveAsTable form;
    bucketing co-locates both sides of a recurring join key so the join
    never shuffles. Requires a metastore table, so exposed separately.
    """
    writer = df.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if buckets is not None:
        raise NotImplementedError(
            "bucketed writes need saveAsTable + a metastore; use "
            "overwrite_bucketed_table"
        )
    writer.parquet(path)


def overwrite_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    truncate: bool = True,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Truncate-and-load into an external warehouse over JDBC — the
    generic form of the reference's terminal step (ETL_DAG.py:206-229:
    ``TRUNCATE TABLE`` per target followed by ``write_pandas``).

    ``mode("overwrite")`` + ``truncate=true`` makes the JDBC source issue
    ``TRUNCATE TABLE`` instead of ``DROP``/``CREATE`` — the table's DDL,
    grants, and indexes survive, exactly like the reference's explicit
    TRUNCATE. Each Spark partition then streams batched INSERTs over its
    own connection, so the load parallelism is ``num_partitions`` (the
    distributed equivalent of the reference's single ``write_pandas``
    call — and the reason to cap it: a 1000-partition DataFrame would
    open 1000 warehouse connections; ``num_partitions`` coalesces the
    write to a connection budget the warehouse can take).

    ``options`` passes through driver-specific settings (``driver``,
    ``user``, ``password``, ``isolationLevel``, ...). Credentials should
    come from the environment via :func:`etl_dag_spark.plans.etl_pipeline
    .require_config`, mirroring ETL_DAG.py:44-58.
    """
    writer = (
        df.write.format("jdbc")
        .mode("overwrite")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", "true" if truncate else "false")
        .option("batchsize", str(batchsize))
    )
    if num_partitions is not None:
        writer = writer.option("numPartitions", str(num_partitions))
    for key, value in (options or {}).items():
        writer = writer.option(key, value)
    writer.save()


def overwrite_bucketed_table(
    df: DataFrame, table: str, n_buckets: int, bucket_col: str, sort_col: str | None = None
) -> None:
    """Bucketed saveAsTable: pre-shuffles once at write time so every
    subsequent join/aggregation on ``bucket_col`` is shuffle-free."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)
