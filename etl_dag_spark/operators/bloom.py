"""Distributed Bloom filter as pure Column algebra — no UDF, no driver
round-trip, no Scala-only API.

Spark's internal ``bloom_filter_agg`` / ``might_contain`` expressions
are not registered as public SQL functions, and the Scala
``DataFrameStatFunctions.bloomFilter`` materializes the filter on the
driver where Python can only probe it row-at-a-time. This module builds
the same structure out of operations Catalyst can codegen end-to-end:

- **build**: each key contributes ``k`` bit positions
  ``pmod(xxhash64(key, seed+j), m)``; positions explode to rows, fold
  into 64-bit words with a ``bit_or`` aggregate → a (``__w``, ``__bits``)
  table of at most ``m/64`` rows. The group key is
  ``pmod(...) DIV 64`` — bounded by the CONSTANT modulus, so the table
  is broadcastable at any corpus size (the plan audit's pmod rule).
- **probe**: ``k`` broadcast hash joins against that words table, one
  per hash function, each map-side and Exchange-free; a row survives
  only if all ``k`` bits are set. No false negatives by construction;
  false-positive rate ≈ (1 − e^(−k·n/m))^k.

Use case: pre-filtering a probe stream against a large keyed store
(e.g. the incremental-dedup signature store) so that definitely-new
keys never enter the expensive store join. At 100 TB most of a fresh
crawl's buckets miss the store — the Bloom pass turns that majority
into a map-only filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_BITS = 1 << 20
_DEFAULT_K = 5
_DEFAULT_SEED = 0x5EED


def _pos_expr(cols: list[str], j: int, num_bits: int, seed: int):
    cs = ", ".join(cols)
    return f"pmod(xxhash64({cs}, {seed + j}), {num_bits})"


def bloom_filter_words(
    keys: DataFrame,
    cols: list[str],
    num_bits: int = _DEFAULT_BITS,
    k: int = _DEFAULT_K,
    seed: int = _DEFAULT_SEED,
) -> DataFrame:
    """Build the (``__w``, ``__bits``) word table of a Bloom filter over
    the distinct values of ``cols`` in ``keys``. At most ``num_bits/64``
    rows regardless of input size; one map-side-combined aggregate."""
    pos_arr = F.array(*[F.expr(_pos_expr(cols, j, num_bits, seed)) for j in range(k)])
    return (
        keys.select(F.explode(pos_arr).alias("__pos"))
        .select(
            F.expr("CAST(__pos DIV 64 AS INT)").alias("__w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias("__b"),
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(__b)").alias("__bits"))
    )


def bloom_prefilter(
    probe: DataFrame,
    words: DataFrame,
    cols: list[str],
    num_bits: int = _DEFAULT_BITS,
    k: int = _DEFAULT_K,
    seed: int = _DEFAULT_SEED,
) -> DataFrame:
    """Keep only probe rows whose ``cols`` MIGHT be in the filter —
    ``k`` broadcast left joins (map-side, no Exchange on the probe
    side), then a conjunction of bit tests. Rows whose word is absent
    or whose bit is unset are definitely-new and are dropped; false
    positives pass through to whatever exact check follows. An EMPTY
    words table drops every row — correct, nothing can match an empty
    store."""
    out = probe
    conds = []
    for j in range(k):
        pos = _pos_expr(cols, j, num_bits, seed)
        wj = words.select(
            F.col("__w").alias(f"__w{j}"), F.col("__bits").alias(f"__bits{j}")
        )
        out = out.join(
            F.broadcast(wj),
            F.expr(f"CAST({pos} DIV 64 AS INT)") == F.col(f"__w{j}"),
            "left",
        )
        conds.append(
            F.expr(
                f"coalesce((shiftright(__bits{j}, CAST({pos} % 64 AS INT)) & 1) = 1, false)"
            )
        )
    keep = conds[0]
    for c in conds[1:]:
        keep = keep & c
    drop = [f"__w{j}" for j in range(k)] + [f"__bits{j}" for j in range(k)]
    return out.where(keep).drop(*drop)
