"""Distributed selection (k-th smallest / exact median) WITHOUT
sorting — value-domain bisection.

`windows.exact_percentiles` sorts each group inside a window partition:
correct, one shuffle, but the sort is GROUP-sized — at 100 TB a single
hot group (one event_type owning half the corpus) serializes through
one task's sort buffer. This module is the scale path for that regime:
binary-search the VALUE DOMAIN instead of ordering rows. Each round
asks one aggregate question — "how many rows ≤ each probe value, per
group?" — which is a map-side-combined scan with no shuffle wider than
|groups| rows, and narrows every group's [lo, hi] bracket
simultaneously. With an 8-way probe fan-out the bracket shrinks 8× per
round, so an integer domain of width W needs ceil(log8 W) scans
(~6 for cent-valued measures) — O(log W) cheap passes instead of one
partition-sized sort, with driver state bounded by |groups| scalars.

The classic external-memory selection algorithm (Blum et al.'s
selection, re-shaped for BSP scans); Spark's own
``approxQuantile(relativeError=0)`` walks the same idea via
Greenwald-Khanna, but per-column only — this is the grouped form, and
exact by construction on integer domains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kth_smallest_bisect(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k_of_n,
    fanout: int = 8,
    max_rounds: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact k-th smallest ``value_col`` (an INTEGER column) per group,
    found by multi-way bisection of the value domain.

    ``k_of_n``: callable n → k (1-based rank), e.g. lower median is
    ``lambda n: (n + 1) // 2``.

    ``weight_col``: optional non-negative INTEGER weights — n becomes
    the group's total weight and the result is the WEIGHTED order
    statistic (smallest v whose cumulative weight reaches k): the
    weighted median needs no new algorithm, only weighted counting,
    because bisection never looks at row order.

    Returns a |groups|-row DataFrame (group_col, n BIGINT, k BIGINT,
    kth_value BIGINT). The input projection is persisted for the scan
    loop and released before returning.

    Invariant per round: the answer (smallest v with count(≤ v) ≥ k)
    lies in [lo, hi]. Probes split the bracket into ``fanout`` cells;
    counting rows ≤ each probe locates the cell, all groups in the same
    pass. Driver state: (lo, hi, k, n) per group — scalars, never rows.
    """
    wcol = (
        F.col(weight_col).cast("long") if weight_col is not None else F.lit(1)
    )
    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
        wcol.alias("w"),
    ).persist()
    try:
        base = {
            r["g"]: {
                "lo": int(r["lo"]), "hi": int(r["hi"]),
                "n": int(r["n"]), "k": int(k_of_n(int(r["n"]))),
            }
            for r in vals.groupBy("g")
            .agg(
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
                F.sum("w").alias("n"),
            )
            .collect()
        }
        spark = df.sparkSession
        for _ in range(max_rounds):
            open_groups = {g: s for g, s in base.items() if s["lo"] < s["hi"]}
            if not open_groups:
                break
            # per group: fanout-1 interior probe points of [lo, hi)
            probe_rows = []
            for g, s in open_groups.items():
                lo, hi = s["lo"], s["hi"]
                probes = sorted(
                    {lo + (hi - lo) * j // fanout for j in range(1, fanout)}
                )
                probe_rows.append((g, probes))
            probes_df = spark.createDataFrame(
                probe_rows, f"g {df.schema[group_col].dataType.simpleString()},"
                " probes array<long>"
            )
            # LocalRelation leaf → provably bounded broadcast; ONE scan
            # counts rows ≤ every probe for every open group
            counts = (
                vals.join(F.broadcast(probes_df), "g")
                .select(
                    "g",
                    F.posexplode("probes").alias("j", "p"),
                    F.col("v"),
                    F.col("w"),
                )
                .groupBy("g", "j", "p")
                .agg(
                    F.sum(
                        F.when(F.col("v") <= F.col("p"), F.col("w")).otherwise(0)
                    ).alias("c")
                )
                .collect()
            )
            by_group: dict = {}
            for r in counts:
                by_group.setdefault(r["g"], []).append((int(r["p"]), int(r["c"])))
            for g, s in open_groups.items():
                k = s["k"]
                new_lo, new_hi = s["lo"], s["hi"]
                for p, c in sorted(by_group.get(g, [])):
                    if c >= k:
                        new_hi = min(new_hi, p)
                        break
                    new_lo = max(new_lo, p + 1)
                s["lo"], s["hi"] = new_lo, new_hi
        leftover = [g for g, s in base.items() if s["lo"] < s["hi"]]
        if leftover:
            raise RuntimeError(f"bisection did not converge for {leftover}")
        out = [
            (g, s["n"], s["k"], s["lo"]) for g, s in sorted(base.items())
        ]
        return spark.createDataFrame(
            out,
            f"{group_col} {df.schema[group_col].dataType.simpleString()},"
            " n bigint, k bigint, kth_value bigint",
        )
    finally:
        vals.unpersist()
