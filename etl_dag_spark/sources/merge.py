"""MERGE INTO for plain parquet datasets: upsert ``updates`` into a
target by business key, latest-wins.

This is the incremental pattern the reference's TRUNCATE-and-load
becomes once the table stops fitting a full rewrite: with a partition
column, only the partitions PRESENT IN THE UPDATE BATCH are read and
rewritten (dynamic partition overwrite) — a daily backfill touches one
day of a 100 TB table, not all of it.

Crash durability: the merged output is STAGED to a sibling directory
(validated via its ``_SUCCESS`` marker) and then swapped in with
directory renames — the target is never half-deleted mid-write, and a
crash before the swap leaves it untouched. Each swapped partition is
whole; a crash between partition swaps is repaired by replaying the
same batch (the latest-wins key merge is idempotent).

Caveats by design: parquet has no transaction log, so this is the
classic pre-lakehouse merge — correct for a single writer. A real
deployment swaps the sink for Delta/Iceberg ``MERGE INTO`` and keeps
the exact same dataflow.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _swap_dir(src: str, dst: str) -> None:
    """Replace directory ``dst`` with ``src`` via two renames (each
    atomic on POSIX); the trash dir bounds the non-atomic window to
    between them. A leftover trash from a prior crash is STALE only if
    ``dst`` exists (crash after the second rename); if ``dst`` is
    missing, the trash holds the only copy of the old rows — restore
    it, never discard it."""
    trash = dst.rstrip("/") + "__trash"
    _recover_trash(dst)
    os.rename(dst, trash)
    os.rename(src, dst)
    shutil.rmtree(trash)


def _recover_trash(dst: str) -> None:
    """Repair _swap_dir's non-atomic window: a crash after
    ``rename(dst, trash)`` but before ``rename(src, dst)`` leaves the
    only copy of the old rows in the trash sibling. Restoring it (and
    then replaying the batch) is always correct — the latest-wins key
    merge is idempotent — whereas discarding it would lose every
    non-batch row of that partition permanently."""
    trash = dst.rstrip("/") + "__trash"
    if os.path.exists(trash):
        if os.path.exists(dst):
            shutil.rmtree(trash)  # crash after swap completed: stale copy
        else:
            os.rename(trash, dst)  # crash inside the window: restore


def _recover_partition_trash(target_path: str) -> None:
    """Restore any orphaned ``<partition>__trash`` dirs left by a crash
    mid-swap, BEFORE the merge reads the target — otherwise the re-merge
    reads a target missing that partition's non-batch rows and the
    orphan is later destroyed as if stale."""
    if not os.path.isdir(target_path):
        return
    for d in os.listdir(target_path):
        if d.endswith("__trash"):
            _recover_trash(os.path.join(target_path, d[: -len("__trash")]))


def _latest_per_key(
    df: DataFrame, key_cols: list[str], order_col: str, latest_wins: bool
) -> DataFrame:
    if latest_wins:
        # event-time semantics: greatest order_col wins regardless of
        # which side it came from (out-of-order CDC replay is a no-op)
        order = [F.col(order_col).desc(), F.col("__is_update").desc()]
    else:
        # SQL MERGE semantics: an incoming update replaces the target
        # row for its key; order_col only breaks ties within the batch
        order = [F.col("__is_update").desc(), F.col(order_col).desc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__is_update")
    )


def merge_into_parquet(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str,
    partition_col: str | None = None,
    latest_wins: bool = False,
) -> None:
    """Upsert ``updates`` into the parquet dataset at ``target_path``.

    Keys present in both sides take the update row (ties within the
    batch break by ``order_col`` descending); new keys insert. With
    ``partition_col``, only partitions occurring in ``updates`` are
    read+merged+rewritten; untouched partitions are never opened.
    """
    upd = updates.withColumn("__is_update", F.lit(1))
    _recover_trash(target_path)  # whole-table swap crashed mid-window
    _recover_partition_trash(target_path)  # per-partition swap ditto
    exists = os.path.isdir(target_path) and any(
        not f.startswith(("_", ".")) for f in os.listdir(target_path)
    )
    if not exists:
        merged = _latest_per_key(upd, key_cols, order_col, latest_wins)
        writer = merged.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_path)
        return

    target = spark.read.parquet(target_path).withColumn("__is_update", F.lit(0))
    if partition_col:
        touched = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]  # partition pruning needs literal values; update batches touch few
        target = target.where(F.col(partition_col).isin(touched))
    merged = _latest_per_key(
        target.unionByName(upd.select(target.columns)), key_cols, order_col, latest_wins
    )
    # Stage to a sibling dir: the plan reads the live target while
    # writing elsewhere (no read-write cycle, no driver checkpoint) and
    # the live target survives any crash before the swap below.
    staging = target_path.rstrip("/") + "__staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    writer = merged.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(staging)
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        raise RuntimeError(f"staged merge write has no _SUCCESS marker: {staging}")

    if partition_col:
        # Swap only the touched partitions; untouched ones never move.
        # Enumerate the STAGING dirs rather than reconstructing
        # f"{col}={value}" names: Spark Hive-escapes special chars
        # (space/colon → %XX) and writes NULL as
        # __HIVE_DEFAULT_PARTITION__, so a rebuilt name can miss the
        # real dir and silently drop that partition's merged rows.
        parts = [
            d
            for d in os.listdir(staging)
            if os.path.isdir(os.path.join(staging, d)) and "=" in d
        ]
        if not parts and any(
            not f.startswith(("_", ".")) for f in os.listdir(staging)
        ):
            raise RuntimeError(
                f"staged merge output is unpartitioned but partition_col="
                f"{partition_col!r} was requested: {staging}"
            )
        for part in parts:
            src, dst = os.path.join(staging, part), os.path.join(target_path, part)
            if os.path.isdir(dst):
                _swap_dir(src, dst)
            else:
                os.rename(src, dst)
        shutil.rmtree(staging)
    else:
        _swap_dir(staging, target_path)
