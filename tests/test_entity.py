"""Entity-resolution invariants (operators/entity.py): the deletion-
neighborhood blocking guarantee (every edit-distance-1 pair shares a
candidate key — deletion, substitution, AND insertion), the multi-field
match rule, transitive closure with min-id survivorship, and the
negative cases (distance-2 names, agreeing names with disagreeing exact
fields). The engine-parity of the full pipeline is oracle-checked by
test_parity[etl_entity_resolution]."""

from __future__ import annotations

from etl_dag_spark.operators.entity import resolve_entities


def _resolve(spark, rows, **kw):
    recs = spark.createDataFrame(rows, "record_id long, name string, cents long")
    out = resolve_entities(
        recs, exact_cols=("cents",), max_name_dist=1, **kw
    ).collect()
    return {r.record_id: r for r in out}


def test_every_edit_class_links_and_distance2_does_not(spark):
    """Recall is structural for distance ≤ 1: a deletion, a
    substitution, and an insertion variant all land in the base
    record's entity; a distance-2 name does not (blocking never
    produced the pair, and the rule would reject it anyway)."""
    rows = [
        (1, "Customer#0042", 100),
        (2, "Custmer#0042", 100),   # deletion of 'o'
        (3, "Customer#0043", 100),  # substitution (no! same cents, dist 1)
        (4, "Customerr#0042", 100), # insertion of 'r'
        # ≥2 deletions away from EVERY other record (incl. record 2 —
        # "Cstmer#0042" would be distance 1 from it): stays unlinked
        (10, "Cstmr#0042", 100),
    ]
    out = _resolve(spark, rows)
    assert out[2].entity_id == 1 and out[4].entity_id == 1
    assert out[3].entity_id == 1  # substitution links too (shared i-th deletion)
    assert out[10].entity_id == 10  # distance ≥ 2: unlinked singleton
    assert out[1].is_canonical and not out[2].is_canonical
    assert out[1].n_members == 4


def test_exact_field_disagreement_blocks_the_match(spark):
    """Names within distance 1 but different cents stay separate
    entities — the multi-field rule that keeps near-miss names of
    DIFFERENT real-world entities apart (the reason clean customers
    differing in one digit don't collapse into one entity)."""
    rows = [
        (1, "Customer#0042", 100),
        (2, "Customer#0043", 999),  # name dist 1, cents differ
    ]
    out = _resolve(spark, rows)
    assert out[1].entity_id == 1 and out[2].entity_id == 2
    assert out[1].n_members == 1 and out[2].n_members == 1


def test_transitive_closure_elects_min_id_survivor(spark):
    """A~B and B~C (but A,C at distance 2) still form ONE entity via
    transitivity, surviving as min(record_id)."""
    rows = [
        (5, "abcdef", 7),
        (3, "abcdef", 7),   # == 5's name? no: same string → dist 0
        (9, "abcde", 7),    # deletion of 'f' → links to both
    ]
    out = _resolve(spark, rows)
    assert {out[k].entity_id for k in (3, 5, 9)} == {3}
    assert out[3].is_canonical and out[3].n_members == 3


def test_hot_block_cap_drops_boilerplate_keys(spark):
    """A name repeated beyond max_block floods its candidate keys; the
    df cap suppresses those keys entirely (the stop-phrase discipline),
    so the flooded records stay singletons instead of generating a
    quadratic candidate set."""
    rows = [(i, "same name", 1) for i in range(40)] + [
        (100, "unique one", 2),
        (101, "unique on", 2),  # deletion variant of 100
    ]
    out = _resolve(spark, rows, max_block=10)
    assert all(out[i].entity_id == i for i in range(40))  # capped → unlinked
    assert out[101].entity_id == 100  # small blocks still link
