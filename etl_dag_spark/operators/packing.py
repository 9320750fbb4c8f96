"""Sequence packing: assign documents to fixed-token-budget bins —
the step between a cleaned corpus and a training dataloader, where
documents are concatenated into context-window-sized sequences.

Two strategies with different contracts:

- :func:`pack_contiguous` — deterministic contiguous packing in a
  given total order: a document belongs to the bin its START offset
  falls in (``(cum - n) DIV cap``). A bin can overshoot the cap by at
  most one document tail (the dataloader truncates or spills), but the
  assignment is a pure function of the order — SQL-expressible, so it
  is the oracle-checked path, and it runs on the distributed
  prefix-sum (no single-partition sort) so it survives 100 TB.

- :func:`pack_first_fit` — strict-capacity greedy first-fit-decreasing
  within each ``group_col`` shard (Arrow ``applyInPandas``; state never
  leaves the shard). No bin exceeds the cap unless a single document
  alone does (it gets a solo bin). Bin QUALITY beats contiguous; the
  assignment depends on the in-group ordering only (sorted, so
  deterministic). Not expressible in one SQL window → rows-only driver
  check + pytest invariants (every doc packed exactly once, no bin
  over cap, fill factor sane).

Scale: contiguous shuffles once (range partition) + one broadcast of
per-partition totals; first-fit shuffles once on ``group_col`` and
packs each shard in a single Arrow batch stream — shards (sources,
dates) are the natural packing domain in a real corpus anyway.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_dag_spark.operators.windows import global_running_sum


def pack_contiguous(
    docs: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(doc_id, n_tokens, bin_id): contiguous packing in ``id_col``
    order; ``bin_id = (inclusive_cumsum - n_tokens) DIV cap``."""
    cum = global_running_sum(
        docs.select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            F.col(tokens_col).cast("bigint").alias("n_tokens"),
        ),
        order=[F.col("doc_id")],
        value_col="n_tokens",
        out_col="__cum",
    )
    # exact BIGINT integer division (matching the oracle's DIV), never
    # a double quotient that could round across a bin boundary at
    # 2^53-scale token offsets
    return cum.select(
        "doc_id",
        "n_tokens",
        F.expr(f"(__cum - n_tokens) DIV {int(cap)}").alias("bin_id"),
    )


def pack_first_fit(
    docs: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    group_col: str = "source",
) -> DataFrame:
    """(group, doc_id, n_tokens, bin_id): strict-capacity first-fit-
    decreasing per group. Bins are numbered per group from 0."""
    out_schema = (
        f"{group_col} string, doc_id bigint, n_tokens bigint, bin_id bigint"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # decreasing size, doc_id tie-break: deterministic
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bin_free: list[int] = []  # remaining capacity per bin
        assigned = []
        for n in pdf["n_tokens"]:
            n = int(n)
            for b, free in enumerate(bin_free):
                if free >= n:
                    bin_free[b] = free - n
                    assigned.append(b)
                    break
            else:
                # new bin; an over-cap doc gets a solo (negative-free) bin
                bin_free.append(cap - n)
                assigned.append(len(bin_free) - 1)
        pdf["bin_id"] = pd.Series(assigned, dtype="int64")
        return pdf[[group_col, "doc_id", "n_tokens", "bin_id"]]

    prepared = docs.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
    )
    # applyInPandas over mapInPandas: the shuffle on group_col IS the
    # packing domain; each group arrives as one logical frame
    return prepared.groupBy(group_col).applyInPandas(pack, schema=out_schema)
