"""Preference queries: the skyline (Pareto-optimal set) operator.

The skyline of a frame under a set of MAXIMIZE dimensions is the set of
rows no other row dominates (dominates = ≥ in every dimension and > in
at least one — Börzsönyi et al., "The Skyline Operator", ICDE 2001).
Spark has no built-in for it and the exact SQL formulation is a
quadratic NOT-EXISTS self-join, so this module implements the standard
distributed two-phase algorithm instead:

1. **local phase** — each partition computes its own skyline with a
   blocked numpy dominance scan (all comparisons run as C matrix ops,
   never a per-row Python loop), entirely inside one Arrow-batched
   ``mapInPandas`` task: dominated rows die where they live, nothing
   but survivors is shuffled;
2. **global phase** — the union of local skylines (small: dominance is
   transitive, so every globally dominated row is dominated by some
   LOCAL survivor) crosses one shuffle barrier (``repartition(1)`` — a
   real exchange, so the local phase keeps its input parallelism and
   only survivors move) and is reduced the same way in one task.

The result is EXACT for any partitioning: skyline(∪ skyline(P_i)) =
skyline(∪ P_i). At 100 TB the shuffle carries only the local survivors
— for correlated dimensions that is a vanishing fraction of the input;
the adversarial anti-correlated case (front ≈ corpus) degrades to the
quadratic the problem inherently is, but degrades in numpy blocks, not
in the interpreter.

Reference parity: the reference's BI surface stops at single-measure
rankings (BI_Questions.sql top-N); the skyline is the multi-criteria
generalization its users would reach for next ("best customers" when
spend, frequency, and recency all matter and no weighting is agreed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# Candidate rows are scanned in blocks of this many; dominance against
# the kept set is evaluated in kept-chunks of the same size. Peak
# broadcast temp is O(block² · ndims) booleans (~a few MB) regardless
# of partition size.
_BLOCK = 512


def _dominated_by(block, others, np) -> "np.ndarray":
    """(B,) bool: for each row of ``block``, is it dominated by ANY row
    of ``others``? Chunked so the broadcast temporaries stay bounded;
    early-exits once every block row is dominated."""
    dom = np.zeros(len(block), dtype=bool)
    for start in range(0, len(others), _BLOCK):
        o = others[start : start + _BLOCK]
        ge = (o[:, None, :] >= block[None, :, :]).all(axis=-1)
        gt = (o[:, None, :] > block[None, :, :]).any(axis=-1)
        dom |= (ge & gt).any(axis=0)
        if dom.all():
            break
    return dom


def _skyline_pdf(pdf: pd.DataFrame, dims: list[str]) -> pd.DataFrame:
    """Exact skyline of one in-memory frame: sort descending
    lexicographically by the dimensions (any dominator of a row sorts
    strictly before it — ties in every dimension dominate neither way,
    so all tied rows are kept), then sweep the sorted rows in blocks.
    Dominance is transitive, so "dominated by ANY earlier row" (kept or
    not) already implies "dominated by some skyline member": each block
    is tested against the accumulated survivors AND against itself in
    two vectorized passes, no per-row Python loop."""
    import numpy as np

    if len(pdf) == 0:
        return pdf
    if pdf[dims].isna().to_numpy().any():
        bad = [c for c in dims if pdf[c].isna().any()]
        raise ValueError(
            f"skyline dims contain NULL/NaN (columns {bad}): NULL has no "
            "place in a dominance order — filter or coalesce upstream"
        )
    a = pdf[dims].to_numpy()
    # lexsort keys are last-significant-first; negate for descending
    order = np.lexsort(tuple(-a[:, i] for i in reversed(range(len(dims)))))
    s = a[order]
    kept_blocks: list[np.ndarray] = []  # survivor dim-rows, sort order
    kept_pos: list[np.ndarray] = []  # their positions within `order`
    for start in range(0, len(s), _BLOCK):
        block = s[start : start + _BLOCK]
        dom = np.zeros(len(block), dtype=bool)
        for k in kept_blocks:
            dom |= _dominated_by(block, k, np)
            if dom.all():
                break
        if not dom.all():
            # within-block: only strictly-earlier sort positions can
            # dominate (a dominator sorts strictly before its victim in
            # the descending lex order), so the full B×B matrix is safe
            ge = (block[:, None, :] >= block[None, :, :]).all(axis=-1)
            gt = (block[:, None, :] > block[None, :, :]).any(axis=-1)
            dom |= (ge & gt).any(axis=0)
        if not dom.all():
            keep = ~dom
            kept_blocks.append(block[keep])
            kept_pos.append(np.arange(start, start + len(block))[keep])
    if not kept_pos:
        return pdf.iloc[:0]
    idx = order[np.concatenate(kept_pos)]
    return pdf.iloc[np.sort(idx)]


def skyline(df: DataFrame, dims: list[str]) -> DataFrame:
    """Pareto-optimal rows of ``df``, MAXIMIZING every column in
    ``dims`` (negate a column upstream to minimize it). Exact under
    any partitioning; schema preserved. Dimensions must be numeric and
    non-NULL — a NULL dim raises inside the scan (fail-fast, mirroring
    the unknown-dim check) rather than silently polluting the front."""
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
    # global reduction behind a SHUFFLE barrier: coalesce(1) would be a
    # narrow dependency that collapses the local phase into the same
    # single task; repartition(1) keeps phase 1 at the input's
    # parallelism and moves only the survivors.
    return survivors.repartition(1).mapInPandas(local, schema=schema)
