"""Entity resolution (record linkage): deletion-neighborhood blocking +
multi-field verification + connected-components survivorship.

Generalizes the reference's fuzzy reference-data matching
(ETL_DAG.py:144-151 — pycountry ``search_fuzzy`` over country names)
from "resolve against a small dictionary" to "resolve records against
EACH OTHER": find records that denote the same real-world entity despite
typos, link them, and elect a canonical survivor per entity.

Blocking is the whole scale story. A naive ER compares all pairs
(quadratic); blocking restricts comparisons to records sharing a
candidate key. The key set used here is the SymSpell / deletion-
neighborhood scheme (Garbe 2012, FastSS — Bocek et al. 2007): each
record emits its normalized name plus every single-character deletion of
it. Two strings within edit distance 1 ALWAYS share such a key
(deletion: B equals a deletion of A; substitution at position i: both
sides' i-th deletions coincide; insertion is deletion mirrored), so
recall for distance ≤ 1 is structural, not probabilistic — while the
fan-out is bounded by the name length (a constant of the schema, not a
data statistic). Hot keys (shared boilerplate names) are df-capped like
every candidate generator in this repo; the cap is mirrored verbatim in
the DuckDB oracle.

Verification then applies the real match rule — name edit distance
within threshold AND exact agreement on discriminating fields — and
transitive closure over verified pairs is the existing
``dedup.cluster_pairs`` min-label propagation (no driver graph state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_dag_spark.operators.dedup import cluster_pairs


def deletion_neighborhood_keys(
    records: DataFrame,
    name_col: str = "name",
    max_block: int = 100,
) -> DataFrame:
    """records → one row per (record, candidate key): the name itself
    plus each of its 1-character deletions, df-capped.

    Scale shape: the explode fans out length(name)+1 rows per record —
    bounded by the schema's name length; the df table is
    key-vocabulary-sized and grows with the data, so its join back is
    UNHINTED (the text_rarity_score lesson)."""
    keys = (
        records.select(
            "*", F.explode(F.sequence(F.lit(0), F.length(name_col))).alias("__i")
        )
        .select(
            "*",
            F.when(F.col("__i") == 0, F.col(name_col))
            .otherwise(
                F.expr(
                    f"concat(substring({name_col}, 1, __i - 1),"
                    f" substring({name_col}, __i + 1, 100))"
                )
            )
            .alias("__k"),
        )
        .drop("__i")
    )
    ok = (
        keys.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= max_block)
    )
    return keys.join(ok.select("__k"), "__k")


def resolve_entities(
    records: DataFrame,
    id_col: str = "record_id",
    name_col: str = "name",
    exact_cols: tuple[str, ...] = (),
    max_name_dist: int = 1,
    max_block: int = 100,
) -> DataFrame:
    """Full ER pipeline → (record_id, entity_id, is_canonical,
    n_members). entity_id is the component's min record id (the
    survivor a MERGE would keep); n_members is the entity's record
    count.

    Candidates come from :func:`deletion_neighborhood_keys` (recall
    for name edits ≤ 1 is structural); the match rule verified on each
    candidate pair is ``levenshtein(name_a, name_b) <= max_name_dist``
    AND equality on every ``exact_cols`` field. One equi-join on the
    candidate key (shuffle linear in records × name length), one
    distinct, then the components fixpoint over verified pairs only.
    """
    keep = [id_col, name_col, *exact_cols]
    keys = (
        deletion_neighborhood_keys(
            records.select(*keep), name_col=name_col, max_block=max_block
        )
        # feeds both sides of the candidate self-join: materialize once
        .localCheckpoint(eager=False)
    )
    a = keys.select(
        F.col("__k"),
        F.col(id_col).alias("doc_id_a"),
        F.col(name_col).alias("__na"),
        *[F.col(c).alias(f"__a_{c}") for c in exact_cols],
    )
    b = keys.select(
        F.col("__k"),
        F.col(id_col).alias("doc_id_b"),
        F.col(name_col).alias("__nb"),
        *[F.col(c).alias(f"__b_{c}") for c in exact_cols],
    )
    cand = (
        a.join(b, "__k")
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .drop("__k")
        .distinct()
    )
    cond = F.levenshtein(F.col("__na"), F.col("__nb")) <= max_name_dist
    for c in exact_cols:
        cond = cond & (F.col(f"__a_{c}") == F.col(f"__b_{c}"))
    pairs = cand.where(cond).select("doc_id_a", "doc_id_b")
    comp = cluster_pairs(pairs, records.select(id_col), id_col=id_col)
    sizes = comp.groupBy(F.col("cluster_id").alias("__cid")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return (
        comp.join(sizes, comp["cluster_id"] == sizes["__cid"])
        .select(
            F.col("doc_id").alias("record_id"),
            F.col("cluster_id").alias("entity_id"),
            "is_canonical",
            "n_members",
        )
    )
