"""Constructed-data edge cases for the round-5 corpus operators
(SURVEY §2 rows 69-71, 76). The oracle gate proves engine parity on the
test tables; these pin the SEMANTICS on inputs the tables don't contain.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_dag_spark.queries import (
    _EMAIL_RE,
    _MIX_THRESHOLDS,
    _NUM_RE,
    _URL_RE,
)


def _scrub(spark, text: str) -> dict:
    row = (
        spark.createDataFrame([(text,)], "t string")
        .select(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
                    _URL_RE,
                    "<URL>",
                ),
                _NUM_RE,
                "<NUM>",
            ).alias("clean"),
            F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
            F.size(F.regexp_extract_all("t", F.lit(_URL_RE), F.lit(0))).alias("n_urls"),
            F.size(F.regexp_extract_all("t", F.lit(_NUM_RE), F.lit(0))).alias("n_nums"),
        )
        .first()
    )
    return {"clean": row.clean, "emails": row.n_emails, "urls": row.n_urls, "nums": row.n_nums}


def test_pii_multiple_and_adjacent_matches(spark):
    got = _scrub(spark, "a@b.com c@d.org call 12345678 or 87654321")
    assert got["clean"] == "<EMAIL> <EMAIL> call <NUM> or <NUM>"
    assert (got["emails"], got["nums"]) == (2, 2)


def test_pii_email_inside_url_consumed_by_email_pass_first(spark):
    """Redaction order is part of the contract: the email pass rewrites
    the query-param email first, then the URL pass consumes the whole
    (space-free) remainder including the placeholder — one <URL>, and
    the per-class counts still see each pattern in the ORIGINAL text."""
    got = _scrub(spark, "see https://x.com/reset?u=bob@mail.com&k=12345678901 now")
    assert got["clean"] == "see <URL> now"
    assert (got["emails"], got["urls"], got["nums"]) == (1, 1, 1)


def test_pii_short_digit_runs_survive(spark):
    got = _scrub(spark, "room 404 of 123456 st")
    assert got["clean"] == "room 404 of 123456 st"
    assert got["nums"] == 0


def test_repetition_extremes(spark):
    """A fully-repeated doc fails both filters; a fully-distinct doc
    passes both — thresholds sit strictly between the extremes."""
    from etl_dag_spark.queries import SPARK_QUERIES
    import tempfile, os

    tmp = tempfile.mkdtemp()
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam", "s", 40),
            (2, "one two three four five six seven eight", "s", 40),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in SPARK_QUERIES["text_repetition_quality"](spark, tmp).collect()}
    assert out[1].top_word_frac == 1.0
    assert out[1].dup_2gram_frac == pytest.approx(6 / 7)
    assert not out[1].keep
    assert out[2].top_word_frac == pytest.approx(1 / 8)
    assert out[2].dup_2gram_frac == 0.0
    assert out[2].keep


def test_contamination_flags_planted_overlap_and_caps_hot_grams(spark):
    """doc 40 (eval: 40 % 20 == 0) shares a 4-gram run with doc 41
    (train) → flagged; the df-capped stop-phrase shared by EVERY doc
    contributes nothing."""
    from etl_dag_spark.queries import SPARK_QUERIES
    import tempfile, os

    stop = "common filler phrase every doc has"
    rows = []
    # 80 docs share the stop phrase → its 4-grams have df=80 > the
    # 50-doc cap and are excluded from candidate generation
    for i in range(30, 110):
        uniq = f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f"
        rows.append((i, f"{stop} {uniq}", "s", 1))
    # plant: train doc 41 copies eval doc 40's unique run
    rows[11] = (41, f"{stop} u40a u40b u40c u40d u40e u40f x41", "s", 1)
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    got = {
        (r.train_doc_id, r.eval_doc_id): r.n_common
        for r in SPARK_QUERIES["dedup_contamination"](spark, tmp).collect()
    }
    assert (41, 40) in got
    assert got[(41, 40)] >= 2
    # no other train doc shares ≥2 non-hot 4-grams with any eval doc
    assert all(k == (41, 40) for k in got)


def test_domain_mix_rates_converge(spark):
    """Observed keep rate per source approaches the configured rate
    (hash uniformity), and the decision is stable across runs."""
    n = 4000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 2).cast("string")).alias("source"),
    )
    hv = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    )
    for src in ("src0", "src1"):
        thr = _MIX_THRESHOLDS[src]
        kept = base.where((F.col("source") == src) & (hv < F.lit(thr))).count()
        rate = kept / (n / 2)
        want = thr / (1 << 32)
        assert abs(rate - want) < 0.05, (src, rate, want)


def test_per_group_top_k_matches_plain_window(spark):
    """The salted two-phase top-k (round 6, etl_host_cap) must emit the
    EXACT rows and ranks of the single-window formulation it replaces —
    the salt only prunes, never changes the selection."""
    from pyspark.sql import Window

    from etl_dag_spark.operators.windows import per_group_top_k
    from etl_dag_spark.sources.tables import load_table

    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        F.length("text").cast("bigint").alias("n"),
    )
    k = 7
    got = per_group_top_k(
        d, "source", [F.col("n"), F.col("doc_id")], k, rank_col="rk"
    ).select("source", "doc_id", "rk")
    w = Window.partitionBy("source").orderBy("n", "doc_id")
    want = (
        d.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
        .select("source", "doc_id", "rk")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # and it genuinely bounds the final window's input: phase-1 output
    # per group is at most k * n_salts, independent of group size
    assert got.count() == want.count()


def test_line_dedup_drops_planted_boilerplate_and_preserves_order(spark):
    """suppress_boilerplate_lines on a REAL newline corpus: a cookie
    banner planted in 50 of 60 docs must be dropped everywhere, unique
    lines must survive, reassembly must preserve line order, and an
    all-boilerplate doc must come back with empty clean_text instead of
    disappearing."""
    from etl_dag_spark.functions.text import split_lines
    from etl_dag_spark.operators.dedup import suppress_boilerplate_lines

    banner = "accept all cookies to continue"
    rows = []
    for i in range(60):
        body = [f"unique line {i} alpha", f"unique line {i} beta"]
        if i < 50:
            rows.append((i, "\n".join([banner] + body)))
        else:
            rows.append((i, "\n".join(body)))
    rows.append((99, banner))  # all-boilerplate doc
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in suppress_boilerplate_lines(
            split_lines(docs), max_df=10
        ).collect()
    }
    assert len(out) == 61
    for i in range(50):
        assert out[i].clean_text == f"unique line {i} alpha unique line {i} beta"
        assert (out[i].n_lines_kept, out[i].n_lines_dropped) == (2, 1)
    for i in range(50, 60):
        assert out[i].n_lines_dropped == 0
    assert out[99].clean_text == "" and out[99].n_lines_kept == 0


def test_line_dedup_relative_threshold_scales_with_corpus(spark):
    """With no max_df the threshold is greatest(2, n_docs DIV 100): at
    300 docs (thr=3) a line repeated 3 times must survive and one
    repeated 5 times must drop."""
    from etl_dag_spark.functions.text import split_lines
    from etl_dag_spark.operators.dedup import suppress_boilerplate_lines

    rows = [(i, f"only line {i}") for i in range(300)]
    for i in range(3):
        rows[i] = (i, f"only line {i}\nthree times")
    for i in range(10, 15):
        rows[i] = (i, f"only line {i}\nfive times")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in suppress_boilerplate_lines(split_lines(docs)).collect()
    }
    assert out[0].clean_text == "only line 0 three times"
    assert out[10].clean_text == "only line 10"
    assert out[10].n_lines_dropped == 1


def test_intradoc_dedup_keeps_first_occurrence_in_order(spark):
    """dedup_intradoc_lines: a line repeated inside ONE doc keeps only
    its first occurrence (order preserved); the same line in a
    DIFFERENT doc is untouched (no corpus-wide state); and the keep
    flag + reassembly add no Exchange beyond the line split's."""
    from etl_dag_spark.functions.text import split_lines
    from etl_dag_spark.operators.dedup import dedup_intradoc_lines

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha\ngamma\nbeta"),
            (2, "alpha\ndelta"),  # 'alpha' repeats only across docs → kept
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    frame = dedup_intradoc_lines(split_lines(docs))
    out = {r.doc_id: r for r in frame.collect()}
    assert out[1].clean_text == "alpha beta gamma"
    assert (out[1].n_lines_kept, out[1].n_lines_dropped) == (3, 2)
    assert out[2].clean_text == "alpha delta" and out[2].n_lines_dropped == 0
    assert out[3].clean_text == "solo"
    # On a doc_id-partitioned line frame (the chunk_token_lines path —
    # its window shuffles on doc_id), the keep window and the
    # reassembly both reuse that partitioning (subset rule): exactly
    # ONE Exchange in the whole plan. (split_lines has no upstream
    # window, so that path pays its own (doc_id, line) shuffle.)
    from etl_dag_spark.functions.text import chunk_token_lines

    docs2 = spark.createDataFrame(
        [(1, "a b c a b c d e f"), (2, "x y z")], "doc_id long, text string"
    )
    f2 = dedup_intradoc_lines(chunk_token_lines(docs2, n=3))
    assert {r.doc_id: r.clean_text for r in f2.collect()} == {
        1: "a b c d e f",
        2: "x y z",
    }
    plan = (
        f2._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]  # AQE echoes the pre-adaptive plan
    )
    assert plan.count("Exchange") == 1, plan


def test_chunk_documents_tiles_exactly(spark):
    """Context-window chunking invariants at sf0.001: chunk_ids are
    contiguous from 0; every chunk's token count matches its text; and
    stitching chunks back together (first `stride` tokens of every
    non-final chunk + the whole final chunk) reproduces each document's
    token stream exactly — no token lost or duplicated beyond the
    declared overlap."""
    from etl_dag_spark.queries import SPARK_QUERIES, _CHUNK_SIZE, _CHUNK_STRIDE
    from etl_dag_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    chunks = SPARK_QUERIES["etl_chunk_documents"](spark, sf).collect()
    docs = {
        r.doc_id: r.text.strip().split()
        for r in load_table(spark, sf, "documents").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        stitched: list[str] = []
        for i, r in enumerate(rows):
            toks = r.chunk_text.split() if r.chunk_text else []
            assert len(toks) == r.n_tokens
            assert len(toks) <= _CHUNK_SIZE
            stitched.extend(toks if i == len(rows) - 1 else toks[:_CHUNK_STRIDE])
        assert stitched == docs[doc_id], f"doc {doc_id} not tiled exactly"


# ----------------------------------------------------- winnowing (MOSS)

def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_remove_dup_spans_excises_exactly_the_copied_block(spark):
    """remove_duplicated_spans with k=5: an 8-token block copied across
    two docs is excised EXACTLY (tokens p..p+7 — covered iff a dup
    shingle starts within the trailing k-window), unique context on
    both sides survives contiguously, untouched docs lose nothing, and
    a doc that is one block repeated twice is covered entirely."""
    from etl_dag_spark.operators.dedup import remove_duplicated_spans

    block = "c1 c2 c3 c4 c5 c6 c7 c8"
    docs = spark.createDataFrame(
        [
            (1, f"u1 u2 u3 u4 u5 {block} v1 v2 v3 v4 v5"),
            (2, f"w1 w2 w3 {block} x1 x2 x3"),
            (3, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),  # no dup anywhere
            (4, "r1 r2 r3 r4 r5 r6 r1 r2 r3 r4 r5 r6"),  # self-repeat
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicated_spans(docs, n=5).collect()}
    assert out[1].clean_text == "u1 u2 u3 u4 u5 v1 v2 v3 v4 v5"
    assert (out[1].n_tokens_kept, out[1].n_tokens_removed) == (10, 8)
    assert out[2].clean_text == "w1 w2 w3 x1 x2 x3"
    assert out[2].n_tokens_removed == 8
    assert out[3].n_tokens_removed == 0 and out[3].clean_text.startswith("a1 ")
    # the 6-token period makes every position sit within k of a
    # duplicated shingle start: the whole doc is excised
    assert out[4].clean_text == "" and out[4].n_tokens_kept == 0


def test_winnowing_guarantee_shared_long_run_collides(spark):
    """The winnowing theorem: two documents sharing a token run of
    length ≥ w+k−1 share at least one selected fingerprint — for every
    alignment of the run inside otherwise-disjoint documents."""
    from etl_dag_spark.operators.dedup import winnowing_pairs

    k, w = 5, 4
    run = " ".join(f"shared{i}" for i in range(k + w - 1))  # exactly w+k-1
    for offset in range(4):
        a = " ".join(f"apre{j}" for j in range(offset)) + (" " if offset else "") + run
        b = run + " " + " ".join(f"bpost{j}" for j in range(7))
        pairs = winnowing_pairs(
            _docs(spark, [a, b]), k=k, w=w, min_shared=1, max_fp_df=50
        ).collect()
        assert any(
            (r.doc_id_a, r.doc_id_b) == (0, 1) for r in pairs
        ), f"offset {offset}: shared w+k-1 run missed"


def test_winnowing_disjoint_docs_share_nothing(spark):
    from etl_dag_spark.operators.dedup import winnowing_pairs

    a = " ".join(f"left{i}" for i in range(30))
    b = " ".join(f"right{i}" for i in range(30))
    assert (
        winnowing_pairs(_docs(spark, [a, b]), min_shared=1).count() == 0
    )


def test_winnowing_subsamples_the_shingle_stream(spark):
    """Selected fingerprints are far fewer than shingles (the ~2/(w+1)
    density that makes winnowing the scalable index) while every
    fingerprint IS one of the doc's shingle hashes."""
    from etl_dag_spark.functions.text import shingle_rows_pos
    from etl_dag_spark.operators.dedup import winnow_fingerprints
    from etl_dag_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    k, w = 5, 4
    sh = shingle_rows_pos(d, n=k).select(
        "doc_id",
        F.expr("CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)").alias("h"),
    )
    fp = winnow_fingerprints(d, k=k, w=w)
    n_shingles, n_fp = sh.count(), fp.count()
    assert 0 < n_fp < 0.6 * n_shingles  # ~2/(w+1)=0.4 expected density
    assert fp.join(sh, (fp.doc_id == sh.doc_id) & (fp.fp == sh.h), "left_anti").count() == 0


def test_dup_span_stats_run_semantics(spark):
    """max_dup_run counts CONSECUTIVE duplicated shingle positions: a
    verbatim copied block of L tokens inside otherwise-unique docs gives
    max_dup_run == L−k+1 in both docs; a fully unique doc gives 0."""
    from etl_dag_spark.queries import SPARK_QUERIES, _SPAN_K
    import etl_dag_spark.queries as Q

    k = _SPAN_K
    block = " ".join(f"copy{i}" for i in range(12))  # L=12 -> run 12-k+1
    texts = [
        " ".join(f"a{i}" for i in range(8)) + " " + block,
        block + " " + " ".join(f"b{i}" for i in range(8)),
        " ".join(f"u{i}" for i in range(20)),
    ]
    d = _docs(spark, texts)
    orig = Q.load_table
    Q.load_table = lambda spark, sf, name: d
    try:
        out = {r.doc_id: r for r in SPARK_QUERIES["text_dup_span_stats"](spark, "x").collect()}
    finally:
        Q.load_table = orig
    assert out[0].max_dup_run == 12 - k + 1
    assert out[1].max_dup_run == 12 - k + 1
    assert out[2].max_dup_run == 0 and out[2].n_dup == 0
    assert out[2].dup_ratio == 0.0


def test_winnow_fingerprints_single_exchange(spark):
    """The entire winnowing selection — positional shingles, hashing,
    min-of-window, per-doc distinct — runs on ONE doc_id hash
    partitioning: exactly one Exchange in the plan (the initial
    repartition by doc_id), everything after it partition-local."""
    from etl_dag_spark.operators.dedup import winnow_fingerprints
    from etl_dag_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        winnow_fingerprints(d, k=5, w=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_temperature_sample_literal_replay(spark):
    """etl_temperature_sample replayed literally in Python: same md5
    hash, same q_s = (n_min/n_s)^(1-alpha) arithmetic, same floor into
    the 2^32 space — the kept set must match EXACTLY, and kept mass
    must flatten the skew (kept_s/n_s^alpha roughly constant)."""
    import hashlib
    from collections import Counter

    from etl_dag_spark.queries import SPARK_QUERIES, _TEMP_ALPHA
    from etl_dag_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = [(r.doc_id, r.source) for r in load_table(spark, sf, "documents").collect()]
    n = Counter(s for _, s in docs)
    n_min = min(n.values())
    thr = {
        s: int((n_min / ns) ** (1.0 - _TEMP_ALPHA) * float(1 << 32))
        for s, ns in n.items()
    }
    expected = set()
    for doc_id, s in docs:
        hv = int(hashlib.md5(f"temp:{doc_id}".encode()).hexdigest()[:8], 16)
        if hv < thr[s]:
            expected.add((doc_id, s))
    got = {
        (r.doc_id, r.source)
        for r in SPARK_QUERIES["etl_temperature_sample"](spark, sf).collect()
    }
    assert got == expected
    # the smallest source is kept in full; larger sources downsampled
    kept = Counter(s for _, s in got)
    assert kept[min(n, key=n.get)] == n[min(n, key=n.get)]
    ratios = {s: kept[s] / (n[s] ** _TEMP_ALPHA) for s in n}
    lo, hi = min(ratios.values()), max(ratios.values())
    assert hi / lo < 1.5, ratios  # flattened to ~constant mass per n^alpha
