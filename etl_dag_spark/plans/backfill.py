"""Change-detection backfill of a partitioned derived table.

The reference is an Airflow DAG, and the Airflow operation this
re-expresses is *backfill*: re-materialize a derived table for the date
range whose inputs changed. The reference does it by truncate-and-load
(ETL_DAG.py:206-229 — recompute everything, every run); at 100 TB the
only viable form is *detect which partitions' inputs actually changed
and recompute exactly those*.

Change detection is a per-partition FINGERPRINT computed in one scan of
the source: row count + bit_xor over the distinct (row_hash,
multiplicity) pairs. XOR is commutative, associative, and
overflow-free, so the fingerprint is independent of row order and
partitioning (a repartitioned but identical source maps to the
identical manifest) and aggregates map-side. Folding the multiplicity
INTO the hashed pair (rather than xor-ing raw row hashes) makes the
fingerprint multiset-exact: pure XOR cancels even multiplicities (two
copies of y replaced by two copies of x is invisible — count AND xor
both unchanged), while hash(row_hash, count) changes whenever any
row's multiplicity changes. The manifest is partition-count-sized —
metadata, not data.

A backfill run then:
- recomputes ONLY partitions whose fingerprint changed or appeared,
  via dynamic partition overwrite (untouched partitions never open);
- drops view partitions whose source partition disappeared;
- swaps in the new manifest atomically (crash before the swap leaves
  the old manifest, and the next run simply redoes the same partitions
  — the recompute is idempotent).
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import unquote

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_dag_spark.sources.merge import _recover_trash, _swap_dir


def partition_fingerprints(
    df: DataFrame, part_col: str, hash_cols: list[str] | None = None
) -> DataFrame:
    """(part, n_rows, content_hash) — multiset-exact and order/
    partitioning-independent. Two-level aggregate: collapse to
    (part, row_hash) → multiplicity first (map-side combine eats
    in-partition duplicates; the shuffled record is 24 bytes/distinct
    row), then xor xxhash64(row_hash, multiplicity) per partition.
    Hashing the multiplicity in closes pure-XOR's blind spot (paired
    rows cancel: y,y → x,x changes neither count nor xor of raw row
    hashes) with no overflow anywhere (a wrapped SUM of hashes would
    trip ANSI arithmetic at scale)."""
    cols = hash_cols or [c for c in df.columns if c != part_col]
    per_row = df.groupBy(
        F.col(part_col).alias("part"),
        F.xxhash64(*[F.col(c) for c in cols]).alias("__rh"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__m"))
    return per_row.groupBy("part").agg(
        F.sum("__m").cast("bigint").alias("n_rows"),
        F.bit_xor(F.xxhash64("__rh", "__m")).alias("content_hash"),
    )


def _manifest_map(rows) -> dict:
    return {str(r["part"]): (r["n_rows"], r["content_hash"]) for r in rows}


def _rm_partition_dirs(view_path: str, part_col: str, doomed: set[str]) -> None:
    """Delete ``view_path``'s hive partition dirs whose value is in
    ``doomed`` (string-compared after URL-unquoting, matching the
    manifest's str() keys)."""
    if not doomed or not os.path.isdir(view_path):
        return
    for d in os.listdir(view_path):
        full = os.path.join(view_path, d)
        col, _, raw = d.partition("=")
        if os.path.isdir(full) and col == part_col and unquote(raw) in doomed:
            shutil.rmtree(full)


def backfill(
    spark: SparkSession,
    source: DataFrame,
    part_col: str,
    view_fn,
    view_path: str,
    manifest_path: str,
    hash_cols: list[str] | None = None,
) -> dict:
    """Refresh the derived table at ``view_path`` to match ``source``.

    ``view_fn(stale_source_df) -> DataFrame`` defines the derivation;
    its output must carry ``part_col`` (the view partitions by it, the
    group-key-partitioned MV discipline of streaming/mv.py). Partition
    values must be sane path atoms (dates, months, ints).

    Returns ``{"recomputed": [...], "dropped": [...], "unchanged": n}``.
    The fingerprint manifests are collected to the driver: they are
    partition-count-sized by construction (one row per date/month),
    the same metadata-plane contract as merge.py's touched-partition
    list."""
    _recover_trash(manifest_path)
    fp_rows_now = partition_fingerprints(source, part_col, hash_cols).collect()
    if any(r["part"] is None for r in fp_rows_now):
        # Enforce the "sane path atoms" contract instead of silently
        # fingerprinting NULL as str(None)=='None': the recompute
        # filter below (`cast(string).isin(...)`) can NEVER match NULL
        # rows (the documented isin-NULL trap), so a changed NULL
        # partition would be marked recomputed while nothing was
        # rewritten — and the manifest swap would hide the staleness
        # forever.
        raise ValueError(
            f"backfill: NULL value in partition column {part_col!r}; "
            "partition values must be sane path atoms (dates, months, "
            "ints). Filter or fill NULLs upstream."
        )
    now = _manifest_map(fp_rows_now)
    have_manifest = os.path.isdir(manifest_path) and any(
        not f.startswith(("_", ".")) for f in os.listdir(manifest_path)
    )
    old = (
        _manifest_map(spark.read.parquet(manifest_path).collect())
        if have_manifest
        else {}
    )

    stale = sorted(p for p, fp in now.items() if old.get(p) != fp)
    dropped = sorted(p for p in old if p not in now)
    unchanged = len(now) - len(stale)

    if stale:
        part_strs = set(stale)
        # Clear the stale view partition dirs BEFORE the write: dynamic
        # partitionOverwriteMode only rewrites partitions present in
        # the written output, so a stale partition whose recompute now
        # yields ZERO view rows (e.g. the filtering view_fn drops every
        # row) would otherwise keep its old derived files on disk while
        # the manifest advances — permanently stale. Pre-deleting is
        # crash-safe: the manifest only swaps at the end, so a crash in
        # the window re-marks the same partitions stale on the next run
        # and the idempotent recompute redoes them.
        _rm_partition_dirs(view_path, part_col, part_strs)
        stale_src = source.where(
            F.col(part_col).cast("string").isin(list(part_strs))
        )
        (
            view_fn(stale_src)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(part_col)
            .parquet(view_path)
        )
    if dropped:
        _rm_partition_dirs(view_path, part_col, set(dropped))

    # atomic manifest swap (staging + rename, shared with merge.py)
    staging = manifest_path.rstrip("/") + "__staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    fp_rows = [(p, n, h) for p, (n, h) in sorted(now.items())]
    spark.createDataFrame(
        fp_rows, "part string, n_rows bigint, content_hash bigint"
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    if os.path.isdir(manifest_path):
        _swap_dir(staging, manifest_path)
    else:
        os.rename(staging, manifest_path)

    return {"recomputed": stale, "dropped": dropped, "unchanged": unchanged}
