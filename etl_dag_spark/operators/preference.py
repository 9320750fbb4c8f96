"""Preference queries: the skyline (Pareto-optimal set) operator.

The skyline of a frame under a set of MAXIMIZE dimensions is the set of
rows no other row dominates (dominates = ≥ in every dimension and > in
at least one — Börzsönyi et al., "The Skyline Operator", ICDE 2001).
Spark has no built-in for it and the exact SQL formulation is a
quadratic NOT-EXISTS self-join, so this module implements the standard
distributed two-phase algorithm instead:

1. **local phase** — each partition computes its own skyline with an
   O(n·k) sorted scan (k = local skyline size), entirely inside one
   Arrow-batched ``mapInPandas`` task: dominated rows die where they
   live, nothing but survivors is shuffled;
2. **global phase** — the union of local skylines (small: dominance is
   transitive, so every globally dominated row is dominated by some
   LOCAL survivor) is gathered to one task and reduced the same way.

The result is EXACT for any partitioning: skyline(∪ skyline(P_i)) =
skyline(∪ P_i). At 100 TB the shuffle carries only the local survivors
— for correlated dimensions that is a vanishing fraction of the input;
the adversarial anti-correlated case degrades gracefully to the
quadratic the problem inherently is.

Reference parity: the reference's BI surface stops at single-measure
rankings (BI_Questions.sql top-N); the skyline is the multi-criteria
generalization its users would reach for next ("best customers" when
spend, frequency, and recency all matter and no weighting is agreed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _skyline_pdf(pdf: pd.DataFrame, dims: list[str]) -> pd.DataFrame:
    """Exact skyline of one in-memory frame: sort descending
    lexicographically by the dimensions (any dominator of a row sorts
    strictly before it), then scan keeping each row not dominated by a
    kept one. Ties in every dimension dominate neither way: all kept."""
    import numpy as np

    if len(pdf) == 0:
        return pdf
    a = pdf[dims].to_numpy()
    # lexsort keys are last-significant-first; negate for descending
    order = np.lexsort(tuple(-a[:, i] for i in reversed(range(len(dims)))))
    kept: list[int] = []
    for idx in order:
        p = a[idx]
        if kept:
            k = a[kept]
            if bool(((k >= p).all(axis=1) & (k > p).any(axis=1)).any()):
                continue
        kept.append(int(idx))
    return pdf.iloc[sorted(kept)]


def skyline(df: DataFrame, dims: list[str]) -> DataFrame:
    """Pareto-optimal rows of ``df``, MAXIMIZING every column in
    ``dims`` (negate a column upstream to minimize it). Exact under
    any partitioning; schema preserved. Dimensions must be numeric and
    non-NULL (NULL has no place in a dominance order — filter or
    coalesce upstream, same contract as ORDER BY keys)."""
    for c in dims:
        if c not in df.columns:
            raise ValueError(f"skyline dim {c!r} not in frame: {df.columns}")
    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the skyline is a whole-partition property: fold all Arrow
        # batches of the task before scanning (survivor sets are small,
        # the partition's rows already fit the task)
        parts = [p for p in batches if len(p)]
        if parts:
            yield _skyline_pdf(pd.concat(parts, ignore_index=True), dims)

    survivors = df.mapInPandas(local, schema=schema)
    # global reduction: one task folds the (small) union of local
    # skylines; coalesce(1) moves only survivors, never the input
    return survivors.coalesce(1).mapInPandas(local, schema=schema)
