"""Skew mitigation: salted join.

AQE's skew-join split handles most skew at runtime, but it only splits
partitions of an already-shuffled big side. When one key is so hot that
a single key's rows overwhelm any partition (the classic null-key /
celebrity-user problem), salting is the structural fix: the skewed side
scatters each key across ``n_salts`` sub-keys, the small side replicates
each key ``n_salts`` times, and the join runs on (key, salt) — turning
one impossible reducer into ``n_salts`` even ones. Cost: the small side
is written ``n_salts``× into the shuffle, which is why this is for
genuinely pathological keys, not a default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` ⋈ ``small`` on ``key`` with salt-scattered
    shuffle. Result columns = skewed's + small's (minus the duplicate
    key). The salt is content-derived (hash of the whole row), so
    re-computation under task retry lands rows on the same salt —
    no correctness dependence on nondeterministic row order.

    Only ``inner`` and ``left`` are supported: the small side is
    replicated ``n_salts``×, so right/full/semi/anti joins would emit
    each unmatched small-side key ``n_salts`` times."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'), got {how!r}: "
            "the replicated small side duplicates unmatched keys under "
            "right/full/semi/anti semantics"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt)
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    out = left.join(right, on=[key, "__salt"], how=how)
    return out.drop("__salt")
