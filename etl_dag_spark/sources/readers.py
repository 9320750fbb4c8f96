"""Generic batch source readers with schema enforcement and column-rename
maps.

Mirrors the reference's ingestion surface: pandas ``read_csv`` +
``rename(columns=...)`` (ETL_DAG.py:162-187), re-expressed as Spark scans
so schema projection and predicate pushdown reach the file reader. A
rename is a metadata-only projection — zero cost at any scale.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = {"csv", "parquet", "json", "orc"}


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    rename: Mapping[str, str] | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt``, optionally enforcing ``schema`` and applying
    a ``rename`` map (old name → new name).

    CSV defaults to header=true; pass an explicit schema in production —
    ``inferSchema`` triggers an extra full scan, which is unacceptable on
    large inputs.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {sorted(_FORMATS)}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    for key, value in options.items():
        reader = reader.option(key, value)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    if rename:
        missing = set(rename) - set(df.columns)
        if missing:
            raise ValueError(f"rename refers to missing columns: {sorted(missing)}")
        df = df.withColumnsRenamed(dict(rename))
    return df
