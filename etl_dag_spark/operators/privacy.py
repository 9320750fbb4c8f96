"""Data-governance operators: deterministic pseudonymization and
right-to-be-forgotten erasure.

Re-expresses the reference's PII-handling intent (ETL_DAG.py's
normalize/validate stage treats customer identity columns as opaque
pass-through) as the two governance primitives a 100 TB lake actually
needs:

- ``pseudonymize``: replace direct identifiers with STABLE,
  domain-separated hash tokens. Stability (same value → same token in
  every table, every run) preserves referential integrity and
  join/count semantics, so the analytics in this repo run unchanged on
  the pseudonymized copy; domain separation (the column name is part of
  the hash input) stops cross-column correlation of tokens. Pure
  codegen Column expressions — tokenization runs at scan speed with no
  shuffle, no vault lookup, no UDF.
- ``generalize_band``: quasi-identifier coarsening (k-anonymity-style
  banding) for numeric columns that would re-identify in combination.
- ``forget_keys``: GDPR Art. 17 erasure over a persisted parquet store.
  Deletion is a REWRITE in an immutable lake; the operator rewrites
  only the partitions that contain the doomed keys (semi-join discovers
  them, anti-join drops the rows, the crash-safe staging/swap machinery
  shared with sources/merge.py lands them atomically). Untouched
  partitions are never opened — at 100 TB, erasing one user touches a
  handful of files, not the table.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import unquote

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_dag_spark.sources.merge import (
    _recover_partition_trash,
    _recover_trash,
    _swap_dir,
)

#: default token prefix; tokens look like ``pii_3f2a…`` so a leaked
#: pseudonymized extract is visibly tokenized
TOKEN_PREFIX = "pii_"
TOKEN_LEN = 16


def token_column(col: str, salt: str = "pseudo") -> Column:
    """Stable pseudonym for ``col``: first 16 hex chars of
    md5(salt:column:value). NULL stays NULL (md5 of NULL is NULL in
    both engines). The column NAME is hashed in (domain separation): the
    same literal value appearing in two different columns yields two
    unrelated tokens, so tokens cannot be correlated across columns."""
    return F.concat(
        F.lit(TOKEN_PREFIX),
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:{col}:"), F.col(col).cast("string"))),
            1,
            TOKEN_LEN,
        ),
    )


def token_sql(col: str, salt: str = "pseudo") -> str:
    """DuckDB twin of :func:`token_column` — generated from the same
    salt/prefix constants so the two engines cannot drift."""
    return (
        f"'{TOKEN_PREFIX}' || substr(md5('{salt}:{col}:' || "
        f"CAST({col} AS VARCHAR)), 1, {TOKEN_LEN})"
    )


def generalize_band(col: str, width: int) -> Column:
    """k-anonymity-style numeric coarsening: ``[lo,hi)`` band label of
    fixed ``width``. Integer floor-division arithmetic — exact and
    engine-portable (negative values round toward -inf in both
    engines' floor)."""
    lo = F.floor(F.col(col) / width).cast("bigint") * width
    return F.concat(
        F.lit("["), lo.cast("string"), F.lit(","), (lo + width).cast("string"), F.lit(")")
    )


def generalize_band_sql(col: str, width: int) -> str:
    """DuckDB twin of :func:`generalize_band`."""
    lo = f"CAST(floor(({col}) / {width}) AS BIGINT) * {width}"
    return f"'[' || CAST({lo} AS VARCHAR) || ',' || CAST({lo} + {width} AS VARCHAR) || ')'"


def pseudonymize(df: DataFrame, cols: list[str], salt: str = "pseudo") -> DataFrame:
    """Replace each column in ``cols`` with its stable token; all other
    columns pass through unchanged, in their original order."""
    token_set = set(cols)
    return df.select(
        *[
            token_column(c, salt).alias(c) if c in token_set else F.col(c)
            for c in df.columns
        ]
    )


def forget_keys(
    spark: SparkSession,
    target_path: str,
    doomed: DataFrame,
    key_col: str,
    partition_col: str | None = None,
) -> int:
    """Erase every row of the parquet dataset at ``target_path`` whose
    ``key_col`` appears in ``doomed`` (a one-column frame of keys).
    Returns the number of partitions rewritten (0/1 for an
    unpartitioned store).

    With ``partition_col``, a semi-join first discovers which
    partitions hold any doomed row; only those are read, anti-joined,
    and atomically swapped via the crash-safe staging protocol shared
    with ``merge_into_parquet``. The doomed-key frame is broadcast by
    contract: an erasure request batch is bounded (user-initiated), not
    corpus-scaled."""
    _recover_trash(target_path)
    _recover_partition_trash(target_path)
    doomed = doomed.select(F.col(key_col)).distinct()
    target = spark.read.parquet(target_path)

    if partition_col:
        touched = [
            r[0]
            for r in target.join(F.broadcast(doomed), key_col, "semi")
            .select(partition_col)
            .distinct()
            .collect()
        ]
        if not touched:
            return 0
        # Doomed rows can live in the NULL partition
        # (__HIVE_DEFAULT_PARTITION__). isin() evaluates NULL IN (...)
        # to NULL — it NEVER matches NULL rows — so the filter must OR
        # in isNull() explicitly, or the erasure silently skips those
        # rows while reporting success.
        null_touched = any(v is None for v in touched)
        non_null = [v for v in touched if v is not None]
        cond = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
        if null_touched:
            cond = cond | F.col(partition_col).isNull()
        target = target.where(cond)
    else:
        # Cheap existence probe (take(1) short-circuits) before
        # committing to a full-table rewrite: an erasure batch that
        # matches nothing must not rewrite 100 TB for a no-op.
        if target.join(F.broadcast(doomed), key_col, "semi").isEmpty():
            return 0

    survivors = target.join(F.broadcast(doomed), key_col, "anti")
    staging = target_path.rstrip("/") + "__staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    writer = survivors.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(staging)
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        raise RuntimeError(f"staged erasure write has no _SUCCESS marker: {staging}")

    if partition_col:
        # Swap exactly the staged partition dirs (Hive-escaped names
        # come from the staging listing, same rationale as merge.py).
        # A partition whose every row was doomed stages no dir — it
        # must be REMOVED from the live store, so iterate the touched
        # list via the live dirs too.
        staged = {
            d
            for d in os.listdir(staging)
            if os.path.isdir(os.path.join(staging, d)) and "=" in d
        }
        live = {
            d
            for d in os.listdir(target_path)
            if os.path.isdir(os.path.join(target_path, d)) and "=" in d
        }
        # Every staged dir is a touched partition by construction (the
        # survivors frame was filtered to the touched list) → swap them
        # all. A partition whose every row was doomed stages NO dir and
        # must be dropped from the live store: identify those by
        # Hive-unescaping the live dir name (%XX → char, the escaping
        # merge.py warns about) and matching the touched values. A
        # touched NULL partition writes as __HIVE_DEFAULT_PARTITION__.
        values = {str(v) for v in touched if v is not None}
        if null_touched:
            values.add("__HIVE_DEFAULT_PARTITION__")
        n = 0
        for part in sorted(staged):
            src = os.path.join(staging, part)
            dst = os.path.join(target_path, part)
            if os.path.isdir(dst):
                _swap_dir(src, dst)
            else:
                os.rename(src, dst)
            n += 1
        for part in sorted(live - staged):
            col, _, raw = part.partition("=")
            if col != partition_col or unquote(raw) not in values:
                continue
            shutil.rmtree(os.path.join(target_path, part))
            n += 1
        shutil.rmtree(staging)
        return n
    _swap_dir(staging, target_path)
    return 1
