"""Unigram-LM tokenizer training (operators/unigram.py, VERDICT r13
#5): the distributed trainer must EQUAL a literal pure-Python
reference implementation of the spec — seed substring vocabulary →
Viterbi-EM with integer expected counts → iterative shrink — on
crafted AND real corpora (the train_bpe equality pattern)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR

from etl_dag_spark.operators.unigram import (
    apply_unigram,
    train_unigram,
    train_unigram_local,
)


# ---------------------------------------------------------------------
# Literal reference implementation (independent of the module's code)
# ---------------------------------------------------------------------

def ref_viterbi(word, lp, L):
    n = len(word)
    best = [0.0] + [None] * n
    back = [0] * (n + 1)
    for end in range(1, n + 1):
        b, arg = None, -1
        for start in range(max(0, end - L), end):
            p = word[start:end]
            if p in lp and best[start] is not None:
                s = best[start] + lp[p]
                if b is None or s > b:
                    b, arg = s, start
        best[end], back[end] = b, arg
    if best[n] is None:
        return None
    out, e = [], n
    while e > 0:
        out.append(word[back[e]:e])
        e = back[e]
    return out[::-1]


def ref_train(words, vocab_size, seed_size, L, shrink, em_iters):
    freq = {}
    for w, c in words:
        for i in range(len(w)):
            for j in range(i + 1, min(i + L, len(w)) + 1):
                freq[w[i:j]] = freq.get(w[i:j], 0) + c
    singles = {s: f for s, f in freq.items() if len(s) == 1}
    multis = sorted(
        ((s, f) for s, f in freq.items() if len(s) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    counts = {**singles, **dict(multis)}

    def logprobs(cs):
        tot = sum(cs.values())
        return {s: math.log(c / tot) for s, c in cs.items() if c > 0}

    while True:
        lp = logprobs(counts)
        for _ in range(em_iters):
            got = {}
            for w, c in words:
                ps = ref_viterbi(w, lp, L)
                if ps is None:
                    continue
                for p in ps:
                    got[p] = got.get(p, 0) + c
            counts = {
                s: got.get(s, 0)
                for s in lp
                if got.get(s, 0) > 0 or len(s) == 1
            }
            for s in list(counts):
                if len(s) == 1 and counts[s] == 0:
                    counts[s] = 1
            lp = logprobs(counts)
        sing = {s for s in counts if len(s) == 1}
        mult = sorted(
            ((s, c) for s, c in counts.items() if len(s) > 1),
            key=lambda t: (-t[1], t[0]),
        )
        budget = max(vocab_size - len(sing), 0)
        if len(mult) <= budget:
            break
        target = max(int(len(mult) * shrink), budget)
        if target >= len(mult):
            target = budget
        counts = {s: counts[s] for s in sing}
        counts.update(dict(mult[:target]))
    lp = logprobs(counts)
    return sorted(lp.items(), key=lambda t: (-t[1], t[0]))


CRAFTED = [
    # (doc_id, text): heavy 'ing'/'the' structure so multi-char pieces
    # clearly beat characters
    (1, "the thing singing the ring"),
    (2, "bring the singer another thing"),
    (3, "kings sing the singalong"),
    (4, "a thing for the king"),
]


def _crafted_words():
    counts = {}
    for _, t in CRAFTED:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    return sorted(counts.items())


def test_spark_trainer_equals_reference_on_crafted_corpus(spark):
    docs = spark.createDataFrame(CRAFTED, "doc_id int, text string")
    got = [
        (r.piece, r.logprob)
        for r in train_unigram(
            docs, vocab_size=24, seed_size=40, max_piece_len=5,
            shrink=0.5, em_iters=2,
        ).orderBy("rank").collect()
    ]
    want = ref_train(
        _crafted_words(), vocab_size=24, seed_size=40, L=5,
        shrink=0.5, em_iters=2,
    )
    assert got == want  # pieces, order, AND logprobs bit-exact
    pieces = {p for p, _ in got}
    assert {"t", "h", "e", "i", "n", "g"} <= pieces  # singles survive
    assert any(len(p) > 1 for p in pieces)  # learned real pieces
    assert len(pieces) <= 24


def test_spark_trainer_equals_reference_on_real_docs(spark):
    from etl_dag_spark.operators.bpe import word_type_table
    from etl_dag_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(150)
    words = sorted(
        (r.w, int(r.c))
        for r in word_type_table(docs, "text", 400).collect()
    )
    got = [
        (r.piece, r.logprob)
        for r in train_unigram(
            docs, vocab_size=120, seed_size=300, max_piece_len=6,
            max_word_types=400, shrink=0.75, em_iters=2,
        ).orderBy("rank").collect()
    ]
    want = ref_train(
        words, vocab_size=120, seed_size=300, L=6, shrink=0.75,
        em_iters=2,
    )
    assert got == want


def test_local_trainer_is_the_same_spec(spark):
    """train_unigram_local (the module's in-memory control flow) and
    the test's independent reference agree — guards against the spec
    and the distributed wrapper drifting apart."""
    words = _crafted_words()
    assert train_unigram_local(
        words, vocab_size=24, seed_size=40, max_piece_len=5,
        shrink=0.5, em_iters=2,
    ) == ref_train(words, 24, 40, 5, 0.5, 2)


def test_apply_unigram_counts(spark):
    docs = spark.createDataFrame(CRAFTED, "doc_id int, text string")
    vocab = train_unigram_local(
        _crafted_words(), vocab_size=24, seed_size=40,
        max_piece_len=5, shrink=0.5, em_iters=2,
    )
    got = {
        r.doc_id: r.n_unigram_tokens
        for r in apply_unigram(
            docs, vocab, max_piece_len=5
        ).collect()
    }
    lp = dict(vocab)
    want = {}
    for did, t in CRAFTED:
        n = 0
        for w in t.split():
            ps = ref_viterbi(w, lp, 5)
            n += len(ps) if ps is not None else len(w)
        want[did] = n
    assert got == want
    # a vocabulary word segments to ONE piece only if it was learned
    # whole; every count is between n_words and n_chars
    for did, t in CRAFTED:
        n_words = len(t.split())
        n_chars = sum(len(w) for w in t.split())
        assert n_words <= got[did] <= n_chars
    # OOV characters fall back to per-char counting
    oov = spark.createDataFrame([(9, "zzz qq")], "doc_id int, text string")
    row = apply_unigram(oov, [("a", -1.0)], max_piece_len=5).collect()[0]
    assert row.n_unigram_tokens == 5


def test_repeated_bigram_learns_the_bigram(spark):
    docs = spark.createDataFrame(
        [(i, "ababab ababab abab") for i in range(5)],
        "doc_id int, text string",
    )
    vocab = [
        r.piece
        for r in train_unigram(
            docs, vocab_size=6, seed_size=20, max_piece_len=4,
            shrink=0.5, em_iters=2,
        ).collect()
    ]
    assert "ab" in vocab or "abab" in vocab
