"""Sorted-suffix exact duplicated-span profile (SURVEY §2 #114c):
`dedup.suffix_dup_spans` vs a brute-force shingle-ladder reference, on
corpora constructed to exercise cross-doc, within-doc, doc-edge, and
partition-boundary span placements."""

from __future__ import annotations

import random

import pytest

from etl_dag_spark.operators.dedup import suffix_dup_spans


def _reference(texts: dict[int, str], cap: int, min_len: int):
    """Brute force: per doc, max L ≤ cap with an L-token span occurring
    ≥2 times corpus-wide, plus the count of positions starting a
    duplicated span of length ≥ min_len."""
    toks = {d: t.strip().split() for d, t in texts.items()}
    # collapse space runs the way tokens_column does
    toks = {d: [x for x in tk] for d, tk in toks.items()}
    occ: dict[tuple[int, str], int] = {}
    for d, tk in toks.items():
        for p in range(len(tk)):
            for L in range(1, min(cap, len(tk) - p) + 1):
                key = (L, " ".join(tk[p : p + L]))
                occ[key] = occ.get(key, 0) + 1
    out = {}
    for d, tk in toks.items():
        mx, ns = 0, 0
        for p in range(len(tk)):
            best = 0
            for L in range(1, min(cap, len(tk) - p) + 1):
                if occ[(L, " ".join(tk[p : p + L]))] >= 2:
                    best = L
            mx = max(mx, best)
            if best >= min_len:
                ns += 1
        out[d] = (mx, ns)
    return out


def _run(spark, texts, cap=8, min_len=3, num_partitions=7):
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["max_dup_span"], r["n_dup_starts"])
        for r in suffix_dup_spans(
            df, cap=cap, min_len=min_len, num_partitions=num_partitions
        ).collect()
    }
    assert got == _reference(texts, cap, min_len)


def test_constructed_spans(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog today",
        2: "yesterday the quick brown fox jumps over a fence",
        3: "unique words only here nothing repeats at all",
        4: "repeat me repeat me repeat me once more",  # within-doc dup
        5: "dog today",  # doc-edge span shared with doc 1's tail
    }
    _run(spark, texts)


def test_identical_docs_hit_the_cap(spark):
    t = " ".join(f"w{i}" for i in range(20))
    _run(spark, {1: t, 2: t, 3: "something else entirely"}, cap=8, min_len=3)


@pytest.mark.parametrize("num_partitions", [1, 3, 16])
def test_random_corpus_all_partitionings_agree(spark, num_partitions):
    """Random small-vocab corpus (forces many shared spans) — exactness
    must be independent of where partition boundaries fall."""
    rng = random.Random(7)
    texts = {
        d: " ".join(rng.choice("a b c d e".split()) for _ in range(30))
        for d in range(12)
    }
    _run(spark, texts, cap=6, min_len=2, num_partitions=num_partitions)


def test_single_token_and_whitespace_docs(spark):
    _run(spark, {1: "solo", 2: "solo", 3: "x"}, cap=4, min_len=1)


def test_long_shared_span_exceeding_cap_saturates(spark):
    """A shared span longer than cap reports exactly cap (truncated
    suffix keys saturate), and positions inside the long span count as
    dup starts."""
    shared = " ".join(f"s{i}" for i in range(20))
    texts = {1: shared + " tail one", 2: "head " + shared}
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["max_dup_span"], r["n_dup_starts"])
        for r in suffix_dup_spans(
            df, cap=6, min_len=6, num_partitions=5
        ).collect()
    }
    # every window of 6 tokens inside the 20-token shared run is dup;
    # doc1 has starts at positions 0..14 of the run (15), doc2 the same
    assert got[1][0] == 6 and got[2][0] == 6
    assert got[1][1] == 15 and got[2][1] == 15
