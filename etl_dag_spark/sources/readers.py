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


def read_evolved(
    spark: SparkSession,
    path: str,
    target_schema: StructType | str,
    rename: Mapping[str, str] | None = None,
    defaults: Mapping[str, object] | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Schema-drift-tolerant reader: reconcile files written under
    EVOLVING schemas to one target schema — the capability a long-lived
    ingest needs once upstream adds, renames, or widens columns
    mid-corpus (the reference pipeline hard-fails on drift,
    ETL_DAG.py:126-128; at 100 TB you cannot rewrite history to fix
    old files). Scope: handles added / dropped / renamed columns and
    parquet-MERGEABLE type changes (widenings like int→long); an
    incompatible in-place retype of one name (int→string) fails in
    mergeSchema's footer union itself — those generations must be read
    separately and reconciled post-load (rename the legacy generation
    on write, then the rename-coalesce path here applies).

    Reconciliation, in order: ``mergeSchema`` unions every field seen
    across file footers (a metadata-plane union — row groups are still
    pruned to requested columns); legacy names map through ``rename``
    — when BOTH generations occur on disk the two columns are the same
    logical field and COALESCE (new wins; rows from old files carry
    the legacy value), when only the legacy name occurs it renames,
    and entries never seen on disk are ignored (unlike
    :func:`read_source`, absence here is the expected case); target
    fields still missing materialize as ``defaults`` or typed NULLs;
    every column is cast to its target type (safe widenings);
    legacy-only fields are dropped by the final projection, which also
    fixes column order.
    """
    from pyspark.sql.types import _parse_datatype_string

    if isinstance(target_schema, str):
        target_schema = _parse_datatype_string(target_schema)
    df = spark.read.format(fmt).option("mergeSchema", "true").load(path)
    return reconcile_frame(df, target_schema, rename, defaults)


def reconcile_frame(
    df: DataFrame,
    target_schema: StructType,
    rename: Mapping[str, str] | None = None,
    defaults: Mapping[str, object] | None = None,
) -> DataFrame:
    """The reconciliation core of :func:`read_evolved`, applicable to
    any already-loaded frame (e.g. a versioned table's mergeSchema read
    over an explicit file list, sources/versions.py): legacy names map
    through ``rename`` (COALESCE when both generations coexist, new
    wins), missing target fields materialize as ``defaults`` or typed
    NULLs, every column casts to its target type, and the final
    projection drops legacy-only fields and fixes column order."""
    from pyspark.sql import functions as F

    for old, new in (rename or {}).items():
        if old in df.columns and new in df.columns:
            df = df.withColumn(
                new, F.coalesce(F.col(new), F.col(old))
            ).drop(old)
        elif old in df.columns:
            df = df.withColumnRenamed(old, new)
    defaults = dict(defaults or {})
    cols = []
    for field in target_schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(
                F.lit(defaults.get(field.name)).cast(field.dataType).alias(field.name)
            )
    return df.select(*cols)
