"""Storage-layout maintenance: small-file compaction and Z-order
clustering — the table-maintenance operators that keep a 100 TB parquet
lake scannable.

- Small files are the classic ingestion pathology: a streaming sink or
  a thousand-task write leaves thousands of KB-sized files, and every
  downstream scan pays per-file open/footer/scheduling overhead.
  ``compact_parquet`` rewrites a directory to ceil(total/target) files.
- Z-ordering maps multi-column values onto a space-filling curve and
  sorts the write by it, so each output file covers a small hyper-cube
  of the key space: parquet min/max footer stats then prune most files
  for predicates on ANY of the clustered columns, not just the first
  sort key. This is the public Z-curve technique (bit-interleaving of
  bucketed coordinates) — pure codegen Column math, no UDF.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_parquet_bytes(path: str) -> tuple[int, int]:
    """(total_bytes, n_files) of the parquet files under ``path``.
    Driver-side file listing — the metadata plane; at warehouse scale
    this comes from the table manifest/catalog, never a data scan."""
    total = n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
                n += 1
    return total, n


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``src_dir`` to ``dst_dir`` as ceil(total/target) files
    (round-robin repartition — uniform output sizes, one shuffle whose
    width IS the output file count). Returns before/after stats."""
    total, n_before = _dir_parquet_bytes(src_dir)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.repartition(n_out).write.mode("overwrite").parquet(dst_dir)
    _, n_after = _dir_parquet_bytes(dst_dir)
    return {
        "bytes": total,
        "files_before": n_before,
        "files_after": n_after,
        "target_files": n_out,
    }


def zorder_value(
    cols: list[str],
    mins: list[float],
    maxs: list[float],
    bits: int = 8,
) -> Column:
    """The Z-curve (Morton) value of ``cols`` as a BIGINT Column: each
    column is width-bucketed to ``bits`` bits over [min, max] (bounds
    from a prior one-pass aggregate — driver state is 2 scalars per
    column), and the bucket bits interleave column-major. Pure codegen
    (width_bucket / shiftleft / bitwise-or); ncols·bits must be ≤ 63."""
    ncols = len(cols)
    if ncols * bits > 63:
        raise ValueError("ncols * bits must fit in a signed 64-bit Z value")
    nb = 1 << bits
    z = F.lit(0).cast("bigint")
    for j, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        # width_bucket → 1..nb (nb+1 on the max edge); clamp to 0..nb-1
        b = F.expr(
            f"CAST(least(greatest(width_bucket(CAST({c} AS DOUBLE), "
            f"CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE), {nb}) - 1, 0), {nb - 1}) AS BIGINT)"
        )
        for i in range(bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1).cast("bigint"))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return z


def zordered_frame(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int = 8,
) -> DataFrame:
    """``df`` re-laid-out as ``n_partitions`` partitions clustered on
    the Z-curve of ``cols``: one bounds aggregate (2 scalars per
    column), range-repartition on the Z value (distributed range
    boundaries from a sample — no global sort through one task) +
    in-partition sort. Writing the result produces files whose min/max
    footers each cover a tight hyper-cube, so scans with predicates on
    ANY clustered column prune most files. Shared by
    :func:`write_zordered` (raw directory) and
    ``sources.versions.compact_version`` (OPTIMIZE ZORDER)."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__hi{i}") for i, c in enumerate(cols)],
    ).first()
    mins = [bounds[f"__lo{i}"] for i in range(len(cols))]
    maxs = [bounds[f"__hi{i}"] for i in range(len(cols))]
    z = zorder_value(cols, mins, maxs, bits=bits)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int,
    bits: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-curve of ``cols`` (see :func:`zordered_frame`)."""
    zordered_frame(df, cols, n_files, bits=bits).write.mode("overwrite").parquet(path)


def files_overlapping_point(path: str, col: str, value) -> tuple[int, int]:
    """(n_overlapping, n_files): how many parquet files' [min, max]
    footer range for ``col`` contains ``value`` — the file-level
    pruning a predicate-pushdown scan achieves without reading data.
    Reads only footers (pyarrow), the same stats Spark's scan planner
    uses."""
    import pyarrow.parquet as pq

    n = hit = 0
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            n += 1
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            lo = hi = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None and lo <= value <= hi:
                hit += 1
    return hit, n
