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
simultaneously. Each round HISTOGRAMS the bracket into ``fanout``
cells with pure integer arithmetic (one subtraction + one DIV per row
— no probe explode, no array lambda), so per-round cost is one O(rows)
scan regardless of fanout; at fanout 32 the bracket shrinks 32× per
round and a cent-valued domain of width W needs ceil(log32 W) ≈ 4-5
scans, the per-round cost being job latency, not probe count — O(log W) cheap passes instead of one
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
    fanout: int | None = None,
    max_rounds: int = 64,
    weight_col: str | None = None,
    max_groups: int = 100_000,
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
    loop and released before returning. Rows with NULL value or NULL
    group key are EXCLUDED up front (SQL aggregate semantics — n and k
    are computed over the non-null multiset).

    Invariant per round: the answer (smallest v with TOTAL weight
    ≤ v reaching k) lies in [lo, hi], and ``done`` holds the weight
    strictly below lo. Each round histograms the bracket into
    ``fanout`` cells by PURE INTEGER ARITHMETIC (one subtraction + one
    DIV per row — no probe explode, no array lambda, so per-round cost
    is one O(rows) map-side-combined scan regardless of fanout), the
    driver walks cumulative cell weights to the cell containing rank k,
    and the bracket narrows to that cell's value range. Driver state:
    (lo, hi, k, done) per group — scalars, never rows; each round
    collects ≤ fanout·|groups| count rows.

    Fail-fast contracts (both raise ``ValueError`` before any scan
    loop): |groups| must not exceed ``max_groups`` (driver state and
    the per-round broadcast are |groups|-sized — a high-cardinality
    ``group_col`` would OOM the driver silently otherwise; use the
    window-sort form for that regime), and each group's value-domain
    width must satisfy ``hi - lo + 1 ≤ (2^63-1)/fanout`` — the integer
    cell expression ``fanout·(v-lo+1)-1`` would otherwise wrap int64
    under non-ANSI arithmetic and bisect the wrong cell. Brackets only
    narrow, so checking the initial bracket covers every round.
    """
    wcol = (
        F.col(weight_col).cast("long") if weight_col is not None else F.lit(1)
    )
    # NULL contract = SQL aggregate semantics: NULL values never rank
    # (they'd inflate n yet vanish from every bracket count — wrong
    # ranks or non-convergence); NULL group keys are excluded too (an
    # equi-join never matches NULL — the CLAUDE.md isin/join trap would
    # leave that group's bracket permanently open).
    vals = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
        wcol.alias("w"),
    ).persist()
    try:
        base = {
            r["g"]: {
                "lo": int(r["lo"]), "hi": int(r["hi"]), "done": 0,
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
        if len(base) > max_groups:
            raise ValueError(
                f"kth_smallest_bisect: {len(base)} groups exceeds "
                f"max_groups={max_groups}; driver state is per-group — "
                "use windows.exact_percentiles for high-cardinality keys"
            )
        if fanout is None:
            # ADAPTIVE fanout (r14): per-round cost is ONE O(rows) scan
            # regardless of fanout (integer cell arithmetic), so wider
            # fanouts are strictly fewer full passes — the only cost
            # that grows is the per-round collect (≤ fanout·|groups|
            # count rows). Budget that at ~2^20 cells: few groups →
            # fanout 1024 (a cent-valued 10^7-wide domain converges in
            # 2-3 scans instead of 5), many groups → fanout decays to
            # the floor of 16 and rounds grow only logarithmically.
            # Clamped by the WIDEST group's domain (r15, ADVICE r14):
            # the int64 cell guard below scales as (2^63-1)/fanout, so
            # an adaptive 1024 would reject domains (e.g. ns timestamps
            # spanning months) that a narrower fanout bisects fine —
            # shrink to the biggest safe fanout before the guard.
            max_width = max(
                (s["hi"] - s["lo"] for s in base.values()), default=0
            )
            fanout = max(
                16,
                min(
                    1024,
                    (1 << 20) // max(1, len(base)),
                    (2**63 - 1) // (max_width + 2),
                ),
            )
        width_cap = (2**63 - 1) // fanout - 1
        too_wide = [
            g for g, s in base.items() if s["hi"] - s["lo"] > width_cap
        ]
        if too_wide:
            raise ValueError(
                "kth_smallest_bisect: value-domain width exceeds "
                f"(2^63-1)/fanout for groups {too_wide[:5]!r}; the "
                "integer cell index would overflow int64 — rescale the "
                "value column or reduce fanout"
            )
        spark = df.sparkSession

        def _cell_edge(lo: int, hi: int, c: int) -> int:
            """Lower value bound of cell c under the round's layout."""
            a = hi - lo
            if a < fanout:
                return lo + c  # exact-value cells
            return lo + a * c // fanout

        for _ in range(max_rounds):
            open_groups = {g: s for g, s in base.items() if s["lo"] < s["hi"]}
            if not open_groups:
                break
            bounds_df = spark.createDataFrame(
                [(g, s["lo"], s["hi"]) for g, s in open_groups.items()],
                f"g {df.schema[group_col].dataType.simpleString()},"
                " lo long, hi long",
            )
            # LocalRelation leaf → provably bounded broadcast. Cell
            # index: with a = hi-lo ≥ fanout, cell(v) counts boundaries
            # lo + a·j DIV fanout ≤ v (floor-division duality:
            # (fanout·(v-lo+1) - 1) DIV a, clamped); small brackets use
            # one cell per exact value.
            counts = (
                vals.join(F.broadcast(bounds_df), "g")
                .where((F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
                .select(
                    "g",
                    "w",
                    F.when(
                        F.col("hi") - F.col("lo") < fanout,
                        F.col("v") - F.col("lo"),
                    )
                    .otherwise(
                        F.least(
                            F.lit(fanout - 1),
                            F.expr(
                                f"({fanout} * (v - lo + 1) - 1) DIV (hi - lo)"
                            ),
                        )
                    )
                    .alias("cell"),
                )
                .groupBy("g", "cell")
                .agg(F.sum("w").alias("c"))
                .collect()
            )
            by_group: dict = {}
            for r in counts:
                by_group.setdefault(r["g"], {})[int(r["cell"])] = int(r["c"])
            for g, s in open_groups.items():
                lo, hi, k = s["lo"], s["hi"], s["k"]
                cells = by_group.get(g, {})
                n_cells = (hi - lo + 1) if hi - lo < fanout else fanout
                cum = s["done"]
                for c in range(n_cells):
                    w_c = cells.get(c, 0)
                    if cum + w_c >= k:
                        s["lo"] = _cell_edge(lo, hi, c)
                        s["hi"] = (
                            _cell_edge(lo, hi, c + 1) - 1
                            if c + 1 < n_cells
                            else hi
                        )
                        s["done"] = cum
                        break
                    cum += w_c
                else:  # pragma: no cover - invariant violation guard
                    raise RuntimeError(f"rank {k} not reached in group {g!r}")
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
