"""Streaming corpus-clean equals its batch twin (SURVEY §2e 34g)."""

from __future__ import annotations

import pytest

from etl_dag_spark.sources.tables import load_table
from etl_dag_spark.streaming.corpus import clean_documents, read_document_stream
from etl_dag_spark.streaming.events import run_to_memory

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def doc_stream_src(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("docs_stream"))
    (
        load_table(spark, SF_DIR, "documents")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_stream_corpus_clean_equals_batch(spark, doc_stream_src):
    stream = clean_documents(read_document_stream(spark, doc_stream_src))
    run_to_memory(stream, "corpus_clean_stream", mode="append")
    got = {
        r.doc_id: (r.clean_text, r.lang_pred, r.n_tokens, r.source)
        for r in spark.table("corpus_clean_stream").collect()
    }
    want = {
        r.doc_id: (r.clean_text, r.lang_pred, r.n_tokens, r.source)
        for r in clean_documents(spark.read.parquet(doc_stream_src)).collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_corpus_clean_is_incremental(spark, doc_stream_src):
    stream = clean_documents(read_document_stream(spark, doc_stream_src))
    q = (
        stream.writeStream.format("memory")
        .queryName("corpus_clean_batches")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress["batchId"] >= 2


def test_stream_incremental_dedup_equals_one_shot(spark, tmp_path):
    """Streaming dedup via the persisted signature store: micro-batch
    boundaries must not change the outcome. Files are written in
    doc_id-range order (one file per range, ordered mod-times), so the
    stream's batch sequence is an id-ordered split — exactly the regime
    where the operator's batch-split invariance guarantees equality
    with a single one-shot batch."""
    import time

    from pyspark.sql import functions as F

    from etl_dag_spark.operators.dedup import incremental_minhash_dedup
    from etl_dag_spark.streaming.corpus import stream_incremental_dedup

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "source")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3

    src = str(tmp_path / "src")
    for i, cond in enumerate(
        [
            F.col("doc_id") <= cut1,
            (F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2),
            F.col("doc_id") > cut2,
        ]
    ):
        docs.where(cond).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)  # distinct mod-times: the file source goes oldest-first

    for t in ("t_stream_incr", "t_oneshot_incr"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("doc_id bigint, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_incremental_dedup(
        stream,
        "t_stream_incr",
        out,
        str(tmp_path / "ckpt"),
        store_path=str(tmp_path / "store_stream"),
    )
    q.awaitTermination(120)

    got = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    want = {
        r.doc_id
        for r in incremental_minhash_dedup(
            docs, "t_oneshot_incr", path=str(tmp_path / "store_os")
        )
        .where("keep")
        .collect()
    }
    assert got == want
    assert 0 < len(got) < docs.count()  # something kept, something dropped


def test_stream_line_dedup_single_batch_equals_batch_operator(spark, tmp_path):
    """A one-file stream is a single micro-batch, so the streaming twin
    must equal the one-shot batch operator exactly (same max_df)."""
    from pyspark.sql import functions as F

    from etl_dag_spark.functions.text import chunk_token_lines
    from etl_dag_spark.operators.dedup import suppress_boilerplate_lines
    from etl_dag_spark.streaming.corpus import stream_line_dedup

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    spark.sql("DROP TABLE IF EXISTS t_line_stream_one")

    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(src)
    )
    q = stream_line_dedup(
        stream, "t_line_stream_one", out, str(tmp_path / "ckpt"),
        n=3, max_df=5, store_path=str(tmp_path / "store"),
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.clean_text, r.n_lines_kept, r.n_lines_dropped)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.clean_text, r.n_lines_kept, r.n_lines_dropped)
        for r in suppress_boilerplate_lines(
            chunk_token_lines(docs, n=3), max_df=5
        ).collect()
    }
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS t_line_stream_one")


def test_stream_line_dedup_cumulative_history_suppresses_late_boilerplate(
    spark, tmp_path
):
    """The store is unbounded history: a banner below threshold in batch
    1 (kept) crosses it in batch 2 (dropped for batch-2 docs), while
    batch-1 outputs stay as emitted — arrival-time semantics. The
    folded store counts must equal the whole corpus's line frequencies."""
    import time

    from pyspark.sql import functions as F

    from etl_dag_spark.streaming.corpus import stream_line_dedup

    banner = "click here now"
    b1 = [(i, f"{banner} alpha beta d{i}") for i in range(1, 7)]       # df 6
    b2 = [(i, f"{banner} gamma delta d{i}") for i in range(11, 16)]   # cum 11
    src = str(tmp_path / "src")
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.05)
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.sql("DROP TABLE IF EXISTS t_line_stream_cum")

    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_line_dedup(
        stream, "t_line_stream_cum", out, str(tmp_path / "ckpt"),
        n=3, max_df=10, store_path=str(tmp_path / "store"),
    )
    q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert len(got) == 11
    for i in range(1, 7):   # batch 1: banner df 6 <= 10 → kept
        assert got[i].clean_text.startswith(banner), got[i].clean_text
        assert got[i].n_lines_dropped == 0
    for i in range(11, 16):  # batch 2: cumulative 11 > 10 → dropped
        assert not got[i].clean_text.startswith(banner), got[i].clean_text
        assert got[i].n_lines_dropped == 1
    # folded store == whole-corpus line frequency for the banner
    cnt = (
        spark.table("t_line_stream_cum")
        .where(F.col("line") == banner)
        .agg(F.sum("cnt"))
        .first()[0]
    )
    assert cnt == 11
    spark.sql("DROP TABLE IF EXISTS t_line_stream_cum")


def test_stream_countmin_equals_one_shot_batch_sketch(spark, doc_stream_src, tmp_path):
    """The streaming CMS (per-batch delta appends, maxFilesPerTrigger=1
    so multiple micro-batches actually occur) folds to EXACTLY the
    one-shot batch sketch of the whole corpus — cell-for-cell, and
    therefore estimate-for-estimate."""
    from pyspark.sql import functions as F

    from etl_dag_spark.functions.text import tokens_column
    from etl_dag_spark.operators.sketch import countmin_build, countmin_estimate
    from etl_dag_spark.streaming.corpus import (
        read_countmin_store,
        read_document_stream,
        stream_countmin,
    )

    store = str(tmp_path / "cms_store")
    q = stream_countmin(
        read_document_stream(spark, doc_stream_src),
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        depth=4,
        width=64,
    )
    q.awaitTermination(120)

    docs = load_table(spark, SF_DIR, "documents")
    cnt = (
        docs.select(F.explode(tokens_column("text")).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    whole = countmin_build(cnt, depth=4, width=64)
    streamed = read_countmin_store(spark, store)
    w = {(r.row, r.pos): r.cell for r in whole.collect()}
    s = {(r.row, r.pos): r.cell for r in streamed.collect()}
    assert s == w
    # and the folded store answers probes identically to the batch sketch
    probes = cnt.orderBy(F.col("c").desc()).limit(5).select("key")
    est_b = {r.key: r.cms_estimate for r in countmin_estimate(whole, probes, depth=4, width=64).collect()}
    est_s = {r.key: r.cms_estimate for r in countmin_estimate(streamed, probes, depth=4, width=64).collect()}
    assert est_s == est_b


def test_stream_mv_maintenance_equals_full_recompute(spark, tmp_path):
    """Incremental monthly-revenue MV: after streaming the orders table
    in multiple micro-batches (maxFilesPerTrigger=1 over a 4-file
    copy), the maintained view equals the one-shot batch recompute
    row-for-row — and untouched partitions were never part of any
    batch's rewrite (partition values read back as strings per the
    partition-column gotcha)."""
    from etl_dag_spark.streaming.mv import (
        monthly_revenue,
        read_orders_stream,
        stream_maintain_monthly_revenue,
    )

    src = str(tmp_path / "orders_src")
    load_table(spark, SF_DIR, "orders").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    mv = str(tmp_path / "mv")
    q = stream_maintain_monthly_revenue(
        read_orders_stream(spark, src),
        mv_path=mv,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        r.month: (r.revenue_cents, r.n_orders)
        for r in spark.read.parquet(mv).collect()
    }
    want = {
        r.month: (r.revenue_cents, r.n_orders)
        for r in monthly_revenue(load_table(spark, SF_DIR, "orders")).collect()
    }
    assert {str(k): v for k, v in got.items()} == {str(k): v for k, v in want.items()}


def test_stream_mv_second_feed_keeps_folding(spark, tmp_path):
    """Feeding the SAME orders again through a fresh stream doubles
    every month's totals — the fold is genuinely additive, not
    latest-wins."""
    from etl_dag_spark.streaming.mv import (
        monthly_revenue,
        read_orders_stream,
        stream_maintain_monthly_revenue,
    )

    src1 = str(tmp_path / "src1")
    src2 = str(tmp_path / "src2")
    orders = load_table(spark, SF_DIR, "orders")
    orders.repartition(2).write.mode("overwrite").parquet(src1)
    orders.repartition(2).write.mode("overwrite").parquet(src2)
    mv = str(tmp_path / "mv")
    for i, src in enumerate((src1, src2)):
        q = stream_maintain_monthly_revenue(
            read_orders_stream(spark, src),
            mv_path=mv,
            checkpoint_dir=str(tmp_path / f"ckpt{i}"),
        )
        q.awaitTermination(120)
    got = {
        str(r.month): (r.revenue_cents, r.n_orders)
        for r in spark.read.parquet(mv).collect()
    }
    want = {
        str(r.month): (2 * r.revenue_cents, 2 * r.n_orders)
        for r in monthly_revenue(orders).collect()
    }
    assert got == want


def test_stream_hll_equals_one_shot_batch_registers(spark, doc_stream_src, tmp_path):
    """The streaming HLL (per-batch register appends over multiple
    micro-batches) folds to EXACTLY the one-shot batch register table
    of the whole corpus — and re-running the stream over the same files
    into the same store changes nothing (idempotent MAX fold)."""
    from pyspark.sql import functions as F

    from etl_dag_spark.functions.text import tokens_column
    from etl_dag_spark.operators.sketch import hll_registers
    from etl_dag_spark.streaming.corpus import (
        read_document_stream,
        read_hll_store,
        stream_hll,
    )

    store = str(tmp_path / "hll_store")
    q = stream_hll(
        read_document_stream(spark, doc_stream_src),
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt_hll"),
        p=8,
    )
    q.awaitTermination(120)

    docs = load_table(spark, SF_DIR, "documents")
    whole = {
        (r.register, r.max_rho)
        for r in hll_registers(
            docs.select(F.explode(tokens_column("text")).alias("key")), p=8
        ).collect()
    }
    streamed = {
        (r.register, r.max_rho) for r in read_hll_store(spark, store).collect()
    }
    assert streamed == whole

    # replay: a second full pass (fresh checkpoint, same store) must
    # leave the folded registers unchanged
    q2 = stream_hll(
        read_document_stream(spark, doc_stream_src),
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt_hll2"),
        p=8,
    )
    q2.awaitTermination(120)
    replayed = {
        (r.register, r.max_rho) for r in read_hll_store(spark, store).collect()
    }
    assert replayed == whole


def test_stream_dq_monitor_folds_to_one_shot_report(spark, doc_stream_src, tmp_path):
    """Streaming DQ monitor: per-batch count deltas fold (per-rule SUM)
    to exactly the one-shot report over the whole corpus — NULL
    predicate results count as violations, matching the batch rule
    engine's IS NOT TRUE semantics."""
    from pyspark.sql import functions as F

    from etl_dag_spark.streaming.corpus import read_document_stream
    from etl_dag_spark.streaming.quality import read_dq_store, stream_dq_monitor

    rules = [
        ("min_length", "length(text) >= 120"),
        ("known_lang", "lang IN ('en', 'es', 'fr', 'de')"),
        ("chars_consistent", "n_chars = length(text)"),
    ]
    store = str(tmp_path / "dq_store")
    q = stream_dq_monitor(
        read_document_stream(spark, doc_stream_src),
        rules,
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt_dq"),
    )
    q.awaitTermination(120)

    docs = load_table(spark, SF_DIR, "documents")
    total = docs.count()
    got = {r.rule_name: r for r in read_dq_store(spark, store).collect()}
    assert set(got) == {name for name, _ in rules}
    for name, pred in rules:
        want = docs.where(F.expr(f"({pred}) IS NOT TRUE")).count()
        assert got[name].violations == want, name
        assert got[name].total_rows == total
    # the corpus genuinely exercises both sides of at least one rule
    assert 0 < got["min_length"].violations < total

    # replay safety: re-running the whole stream into the SAME store
    # (fresh checkpoint → every batch re-delivers with the same
    # batch_ids) must not inflate the additive counts — the
    # (batch_id, rule) MAX collapse absorbs duplicate deliveries
    q2 = stream_dq_monitor(
        read_document_stream(spark, doc_stream_src),
        rules,
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt_dq2"),
    )
    q2.awaitTermination(120)
    replayed = {r.rule_name: r for r in read_dq_store(spark, store).collect()}
    for name, _ in rules:
        assert replayed[name].violations == got[name].violations
        assert replayed[name].total_rows == total


def test_stream_kmv_equals_one_shot_batch_sketch(spark, doc_stream_src, tmp_path):
    """The streaming KMV (per-batch bottom-k appends) folds to EXACTLY
    the one-shot sketch of the whole corpus, and replaying the stream
    into the same store changes nothing (bottom-k-of-union fold is
    idempotent, like the HLL's MAX and unlike the CMS's addition)."""
    from pyspark.sql import functions as F

    from etl_dag_spark.functions.text import tokens_column
    from etl_dag_spark.operators.sketch import kmv_sketch
    from etl_dag_spark.streaming.corpus import (
        read_document_stream,
        read_kmv_store,
        stream_kmv,
    )

    store = str(tmp_path / "kmv_store")
    q = stream_kmv(
        read_document_stream(spark, doc_stream_src),
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt_kmv"),
        k=64,
    )
    q.awaitTermination(120)

    docs = load_table(spark, SF_DIR, "documents")
    whole = sorted(
        r.hv
        for r in kmv_sketch(
            docs.select(F.explode(tokens_column("text")).alias("key")), k=64
        ).collect()
    )
    streamed = sorted(r.hv for r in read_kmv_store(spark, store, k=64).collect())
    assert streamed == whole

    q2 = stream_kmv(
        read_document_stream(spark, doc_stream_src),
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt_kmv2"),
        k=64,
    )
    q2.awaitTermination(120)
    replayed = sorted(r.hv for r in read_kmv_store(spark, store, k=64).collect())
    assert replayed == whole


def test_stream_index_vectors_equals_union_build(spark, tmp_path):
    """Streaming ANN-index maintenance: vectors streamed file-by-file
    into a persisted IVF index answer queries exactly like a one-shot
    assignment of the same corpus under the same codebook."""
    import shutil

    from pyspark.sql import functions as F

    from etl_dag_spark.operators import similarity as sim
    from etl_dag_spark.streaming.vectors import (
        read_embedding_stream,
        stream_index_vectors,
    )

    emb = load_table(spark, SF_DIR, "embeddings").persist()
    half_a = emb.where(F.col("vec_id") % 2 == 0)
    half_b = emb.where(F.col("vec_id") % 2 == 1)

    # historical index built offline on half A
    idx = str(tmp_path / "vec_idx")
    sim.build_ivf_index(half_a, idx, n_lists=16, seed=42)

    # half B arrives as a 4-file stream
    src = str(tmp_path / "vec_stream")
    half_b.repartition(4).write.mode("overwrite").parquet(src)
    q = stream_index_vectors(
        read_embedding_stream(spark, src),
        index_path=idx,
        checkpoint_dir=str(tmp_path / "ckpt_vec"),
    )
    q.awaitTermination(120)

    # reference: same codebook, whole corpus assigned in one shot
    idx_ref = str(tmp_path / "vec_ref")
    shutil.copytree(f"{idx}/centroids", f"{idx_ref}/centroids")
    sim.append_to_ivf_index(emb, idx_ref)

    flt = F.col("vec_id") % 10 == 0
    q_pdf = emb.where(flt).select("vec_id", "embedding").toPandas()
    emb.unpersist()
    got = {
        (r.query_id, r.neighbor_id): (r.rank, r.sim)
        for r in sim.ivf_index_topk(spark, idx, q_pdf, k=10, n_probe=4).collect()
    }
    want = {
        (r.query_id, r.neighbor_id): (r.rank, r.sim)
        for r in sim.ivf_index_topk(spark, idx_ref, q_pdf, k=10, n_probe=4).collect()
    }
    assert got == want
    assert {nid % 2 for (_, nid) in got} == {0, 1}


def test_stream_weighted_sample_equals_one_shot(spark, doc_stream_src, tmp_path):
    """The streaming A-Res reservoir (per-batch bottom-k appends) folds
    to EXACTLY the one-shot weighted sample of the whole corpus —
    content-derived keys make micro-batch boundaries invisible — and
    replaying the stream into the same store changes nothing (the
    bottom-k-of-distinct-union fold is idempotent, like KMV's)."""
    from pyspark.sql import functions as F

    from etl_dag_spark.queries import weighted_sample_keys
    from etl_dag_spark.streaming.corpus import (
        read_document_stream,
        read_weighted_sample_store,
        stream_weighted_sample,
    )

    store = str(tmp_path / "wsamp_store")
    q = stream_weighted_sample(
        read_document_stream(spark, doc_stream_src),
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt_ws"),
        k=40,
    )
    q.awaitTermination(120)

    docs = load_table(spark, SF_DIR, "documents")
    whole = [
        (r.doc_id, r.ares_key)
        for r in docs.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            weighted_sample_keys(docs, F.col("n_chars").cast("double")).alias(
                "ares_key"
            ),
        )
        .orderBy("ares_key", "doc_id")
        .limit(40)
        .collect()
    ]
    streamed = [
        (r.doc_id, r.ares_key)
        for r in read_weighted_sample_store(spark, store, k=40)
        .orderBy("ares_key", "doc_id")
        .collect()
    ]
    assert streamed == whole
    assert len(streamed) == 40

    q2 = stream_weighted_sample(
        read_document_stream(spark, doc_stream_src),
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt_ws2"),
        k=40,
    )
    q2.awaitTermination(120)
    replayed = [
        (r.doc_id, r.ares_key)
        for r in read_weighted_sample_store(spark, store, k=40)
        .orderBy("ares_key", "doc_id")
        .collect()
    ]
    assert replayed == whole


def test_stream_moments_folds_to_one_shot_pca(spark, tmp_path):
    """Incremental-PCA maintenance: embedding micro-batches append
    integer moment deltas; the folded store equals the one-shot moment
    cells BIT-EXACTLY, so components derived from the store equal
    embedding_pca's components bit-for-bit at any batch boundary."""
    import numpy as np
    from pyspark.sql import functions as F

    from etl_dag_spark.operators.similarity import (
        components_from_moments,
        dim_of,
        embedding_pca,
        fold_moment_rows,
        moment_partials,
        quantized_vectors,
    )
    from etl_dag_spark.streaming.vectors import (
        read_embedding_stream,
        read_moment_store,
        stream_moments,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    src = str(tmp_path / "vec_src")
    emb.repartition(3).write.mode("overwrite").parquet(src)

    store = str(tmp_path / "mom_store")
    q = stream_moments(
        read_embedding_stream(spark, src),
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt_mom"),
    )
    q.awaitTermination(120)

    # cell-level bit equality vs the one-shot moment pass
    one_shot = {
        (r.i, r.j): r.v
        for r in moment_partials(
            quantized_vectors(spark.read.parquet(src), "vec_id", "embedding")
        ).collect()
    }
    folded_rows = read_moment_store(spark, store).collect()
    folded = {(r.i, r.j): r.v for r in folded_rows}
    assert folded == one_shot

    # component-level bit equality vs the one-shot PCA operator
    d = dim_of(emb, "embedding")
    n, s, ss = fold_moment_rows(folded_rows, d)
    _, evals_f, comp_f = components_from_moments(n, s, ss, 1_000_000, 4)
    _, evals_o, comp_o = embedding_pca(emb, n_components=4)
    assert np.array_equal(evals_f, evals_o)
    assert np.array_equal(comp_f, comp_o)


def test_stream_versioned_ingest_snapshots_every_batch(spark, doc_stream_src, tmp_path):
    """Streaming into the versioned table: the latest snapshot equals
    the full corpus, every micro-batch boundary is a time-travelable
    version, and a replayed batch commit (same txn_id against the tip)
    is a manifest no-op."""
    from etl_dag_spark.sources.versions import history, read_version, write_version
    from etl_dag_spark.streaming.corpus import (
        read_document_stream,
        stream_versioned_ingest,
    )

    table = str(tmp_path / "vtable")
    q = stream_versioned_ingest(
        read_document_stream(spark, doc_stream_src),
        table_path=table,
        checkpoint_dir=str(tmp_path / "ckpt_v"),
    )
    q.awaitTermination(120)

    want = sorted(
        r.doc_id for r in spark.read.parquet(doc_stream_src).select("doc_id").collect()
    )
    got = sorted(r.doc_id for r in read_version(spark, table).select("doc_id").collect())
    assert got == want

    h = history(table)
    assert len(h) >= 2  # maxFilesPerTrigger=1 over a 4-file source
    assert all(m["op"] == "append" for m in h)
    # earlier snapshots hold strict prefixes of the ingest
    first = read_version(spark, table, 1).count()
    assert 0 < first < len(want)

    # replaying the LAST batch under the STREAM's writer identity
    # (checkpoint-derived) is a no-op
    import os

    tip = h[-1]["version"]
    writer = f"stream:{os.path.abspath(str(tmp_path / 'ckpt_v'))}"
    replay = read_version(spark, table, tip)  # any frame; txn gates it
    v = write_version(
        replay, table, op="append",
        txn_id=f"batch-{tip - 1}", writer_id=writer,
    )
    assert v == tip
    assert read_version(spark, table).count() == len(want)
    # a DIFFERENT stream replaying ITS OWN batch-(tip-1) is NOT masked
    # by this stream's token: the txn map is per-writer
    one_row = read_version(spark, table, 1)
    v2 = write_version(
        one_row, table, op="append",
        txn_id=f"batch-{tip - 1}", writer_id="stream:/elsewhere/ckpt",
    )
    assert v2 == tip + 1


def test_stream_moments_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering batches must leave
    the additive moment store unchanged because the batch=<id>
    overwrite rewrites identical deltas in place. Simulated as a
    fresh-checkpoint rerun over the controlled tmpdir source (stable
    mtimes + maxFilesPerTrigger=1 ⇒ identical batch ids/content; a true
    same-checkpoint commit-marker restore is rejected by Spark 4.1's
    commit-log concurrency validation in a shared session)."""
    from etl_dag_spark.operators.similarity import (
        moment_partials,
        quantized_vectors,
    )
    from etl_dag_spark.streaming.vectors import (
        read_embedding_stream,
        read_moment_store,
        stream_moments,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    src = str(tmp_path / "vec_src2")
    emb.repartition(2).write.mode("overwrite").parquet(src)

    store = str(tmp_path / "mom_store2")
    for ckpt in ("ck_a", "ck_b"):  # second run redelivers every batch
        q = stream_moments(
            read_embedding_stream(spark, src),
            store_path=store,
            checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination(120)
        q.stop()
    folded = {(r.i, r.j): r.v for r in read_moment_store(spark, store).collect()}
    one_shot = {
        (r.i, r.j): r.v
        for r in moment_partials(
            quantized_vectors(spark.read.parquet(src), "vec_id", "embedding")
        ).collect()
    }
    assert folded == one_shot


def test_stream_countmin_replay_is_idempotent(spark, doc_stream_src, tmp_path):
    from pyspark.sql import functions as F

    from etl_dag_spark.functions.text import tokens_column
    from etl_dag_spark.operators.sketch import countmin_build
    from etl_dag_spark.streaming.corpus import read_countmin_store, stream_countmin

    store = str(tmp_path / "cms_store2")
    # the fresh-checkpoint rerun relies on file-source batching being
    # deterministic for this controlled tmpdir source (stable mtimes,
    # maxFilesPerTrigger=1) — same batch ids, same content, so the
    # batch=<id> overwrite must leave the fold unchanged
    for ckpt in ("ck_a", "ck_b"):
        q = stream_countmin(
            read_document_stream(spark, doc_stream_src),
            store_path=store,
            checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination(120)
    docs = load_table(spark, SF_DIR, "documents")
    cnt = (
        docs.select(F.explode(tokens_column("text")).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    whole = {
        (r.row, r.pos): r.cell for r in countmin_build(cnt).collect()
    }
    folded = {
        (r.row, r.pos): r.cell
        for r in read_countmin_store(spark, store).collect()
    }
    assert folded == whole


def test_stream_drift_monitor_folds_and_alarms(spark, doc_stream_src, tmp_path):
    """Streaming drift monitor: the category store folds to the exact
    one-shot histogram (replay-idempotent), and the chi-squared report
    against a reference flags a shifted distribution while a
    self-comparison is all-zero contributions."""
    from pyspark.sql import functions as F

    from etl_dag_spark.streaming.corpus import (
        drift_chisq_report,
        read_category_store,
        read_document_stream,
        stream_category_counts,
    )

    store = str(tmp_path / "cat_store")
    # controlled-source cross-run rerun (see the countmin test note)
    for ckpt in ("ck_a", "ck_b"):
        q = stream_category_counts(
            read_document_stream(spark, doc_stream_src),
            store_path=store,
            checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination(120)

    docs = load_table(spark, SF_DIR, "documents")
    want = {
        r.category: r.n
        for r in docs.groupBy(F.col("lang").alias("category"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    folded = read_category_store(spark, store)
    assert {r.category: r.n for r in folded.collect()} == want

    # self-comparison: expected == observed exactly → zero contributions
    self_rep = drift_chisq_report(folded, folded).collect()
    assert all(r.chisq_contrib == 0.0 for r in self_rep)

    # drifted feed: one category doubled, one novel → positive + inf
    drifted = spark.createDataFrame(
        [(max(want), want[max(want)] * 3), ("xx_new", 50)],
        "category string, n long",
    )
    rep = {r.category: r for r in drift_chisq_report(drifted, folded).collect()}
    assert rep["xx_new"].chisq_contrib == float("inf")
    assert rep[max(want)].chisq_contrib > 0.0
    # categories present in ref but absent from the drifted feed: n_obs 0
    gone = [c for c in want if c not in (max(want), "xx_new")]
    assert all(rep[c].n_obs == 0 for c in gone)


def test_stream_quantile_sketch_equals_one_shot_batch_sketch(
    spark, doc_stream_src, tmp_path
):
    """The streaming quantile sample store folds to EXACTLY the
    one-shot sketch of the whole corpus (mergeable bottom-k), its
    estimates match, and replay is a no-op (distinct-union fold)."""
    from pyspark.sql import functions as F

    from etl_dag_spark.functions.text import token_count_column
    from etl_dag_spark.operators.sketch import (
        quantile_sample_estimate,
        quantile_sample_sketch,
    )
    from etl_dag_spark.streaming.corpus import (
        read_document_stream,
        read_quantile_store,
        stream_quantile_sketch,
    )

    store = str(tmp_path / "qsk_store")
    q = stream_quantile_sketch(
        read_document_stream(spark, doc_stream_src),
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt_qsk"),
        k=64,
    )
    q.awaitTermination(120)

    docs = load_table(spark, SF_DIR, "documents")
    whole = quantile_sample_sketch(
        docs.select(
            F.col("lang"),
            token_count_column("text").alias("v"),
            F.col("doc_id"),
        ),
        "lang",
        "v",
        "CAST(doc_id AS STRING)",
        k=64,
    )
    want = sorted(map(tuple, whole.collect()))
    folded = read_quantile_store(spark, store, k=64)
    assert sorted(map(tuple, folded.collect())) == want
    est_w = sorted(map(tuple, quantile_sample_estimate(whole).collect()))
    est_f = sorted(map(tuple, quantile_sample_estimate(folded).collect()))
    assert est_f == est_w

    q2 = stream_quantile_sketch(
        read_document_stream(spark, doc_stream_src),
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt_qsk2"),
        k=64,
    )
    q2.awaitTermination(120)
    assert sorted(map(tuple, read_quantile_store(spark, store, k=64).collect())) == want


def test_stream_ingest_then_optimize_zorder_full_lakehouse_loop(
    spark, doc_stream_src, tmp_path
):
    """The complete maintenance loop a streaming lake table lives by
    (r10): micro-batch appends leave small-file debris -> OPTIMIZE
    ZORDER compacts the tip into a z-clustered layout with manifest
    stats -> narrow reads prune files; every pre-optimize snapshot
    still time-travels on its own (un-rewritten) files."""
    from etl_dag_spark.sources.versions import (
        compact_version,
        history,
        read_version,
    )
    from etl_dag_spark.streaming.corpus import (
        read_document_stream,
        stream_versioned_ingest,
    )

    table = str(tmp_path / "vtable_z")
    q = stream_versioned_ingest(
        read_document_stream(spark, doc_stream_src),
        table_path=table,
        checkpoint_dir=str(tmp_path / "ckpt_z"),
    )
    q.awaitTermination(120)

    tip_before = history(table)[-1]["version"]
    debris = read_version(spark, table)
    n_debris_files = len(debris.inputFiles())
    want = sorted(r.doc_id for r in debris.select("doc_id").collect())

    v = compact_version(
        spark, table, target_files=16, zorder_by=["doc_id", "n_chars"]
    )
    assert v == tip_before + 1
    after = read_version(spark, table)
    assert sorted(r.doc_id for r in after.select("doc_id").collect()) == want
    assert len(after.inputFiles()) == 16

    # manifest-level pruning on the clustered id column: a narrow id
    # range (1/32 of the domain) opens at most half the 16 files (the
    # z-curve scatters an id slice across a few hyper-cubes — the
    # test_layout margin, generous for range-sampling jitter)
    lo, hi = want[0], want[len(want) // 32]
    pruned = read_version(spark, table, between=("doc_id", lo, hi))
    assert len(pruned.inputFiles()) <= 8
    assert sorted(r.doc_id for r in pruned.select("doc_id").collect()) == [
        d for d in want if lo <= d <= hi
    ]

    # the streaming history is intact: pre-optimize snapshots read
    # their original debris files, untouched by the rewrite
    assert len(read_version(spark, table, tip_before).inputFiles()) == n_debris_files
    assert read_version(spark, table, 1).count() < len(want)


def test_stream_auto_optimize_compacts_and_replays_exactly_once(
    spark, doc_stream_src, tmp_path
):
    """AUTO-OPTIMIZE (r10): with optimize_every=2 the ingest interleaves
    OPTIMIZE ZORDER commits between appends; the final corpus is exact,
    and a crash-replay of BOTH the last append and its OPTIMIZE is a
    manifest no-op under their separate writer identities."""
    import os as _os

    from etl_dag_spark.sources.versions import (
        compact_version,
        history,
        read_version,
        write_version,
    )
    from etl_dag_spark.streaming.corpus import (
        read_document_stream,
        stream_versioned_ingest,
    )

    table = str(tmp_path / "vtable_auto")
    ckpt = str(tmp_path / "ckpt_auto")
    q = stream_versioned_ingest(
        read_document_stream(spark, doc_stream_src),
        table_path=table,
        checkpoint_dir=ckpt,
        optimize_every=2,
        optimize_target_files=4,
        zorder_by=["doc_id", "n_chars"],
    )
    q.awaitTermination(180)

    h = history(table)
    ops = [m["op"] for m in h]
    # the 4-file source yields 4 appends (maxFilesPerTrigger=1) with a
    # row-preserving OPTIMIZE commit after every 2nd (ADVICE r10: the
    # compaction is op="optimize", not "overwrite", so incremental
    # readers keep working across the boundary)
    assert ops.count("optimize") == 2, h
    assert ops.count("append") == 4, h

    want = sorted(
        r.doc_id for r in spark.read.parquet(doc_stream_src).select("doc_id").collect()
    )
    tip_df = read_version(spark, table)
    assert sorted(r.doc_id for r in tip_df.select("doc_id").collect()) == want
    assert len(tip_df.inputFiles()) == 4  # compacted tip

    # crash replay: re-commit the last append AND its OPTIMIZE with the
    # same txn ids -> both are no-ops, history/version unchanged
    tip = h[-1]["version"]
    writer = f"stream:{_os.path.abspath(ckpt)}"
    last_batch = sum(1 for o in ops if o == "append") - 1
    v1 = write_version(
        tip_df, table, op="append",
        txn_id=f"batch-{last_batch}", writer_id=writer,
    )
    v2 = compact_version(
        spark, table, target_files=4, zorder_by=["doc_id", "n_chars"],
        txn_id=f"optimize-{last_batch}", writer_id=f"{writer}:optimize",
    )
    assert v1 == v2 == tip
    assert [m["version"] for m in history(table)] == [m["version"] for m in h]
    assert read_version(spark, table).count() == len(want)

    # the optimized lineage stays incrementally consumable: the delta
    # since v1 is exactly the rows appended after the first batch
    from etl_dag_spark.sources.versions import read_version_delta

    first = set(r.doc_id for r in read_version(spark, table, 1).collect())
    delta = read_version_delta(spark, table, 1)
    assert sorted(r.doc_id for r in delta.select("doc_id").collect()) == sorted(
        d for d in want if d not in first
    )


def test_stream_merge_ingest_upserts_exactly_once(spark, tmp_path):
    """r11: streaming CDC-upsert ingest — every micro-batch lands as an
    op="merge" snapshot commit (touched files rewritten, rest shared),
    latest_wins resolves an out-of-order stale update to a no-op, CDC
    between batch boundaries shows exactly that batch's upserts, and a
    crash-replayed batch is a manifest no-op."""
    import os as _os
    import time as _time

    from etl_dag_spark.sources.versions import (
        cdc_rows,
        history,
        merge_version,
        read_version,
    )
    from etl_dag_spark.streaming.corpus import stream_merge_ingest

    src = str(tmp_path / "upd_src")
    table = str(tmp_path / "merge_table")
    ckpt = str(tmp_path / "merge_ckpt")

    def write(rows):
        spark.createDataFrame(rows, "k int, v string, ts int").coalesce(
            1
        ).write.mode("append").parquet(src)

    write([(1, "a", 1), (2, "b", 1), (3, "c", 1), (4, "d", 1)])
    _time.sleep(1.05)
    # updates: k2/k3 re-valued at ts=2, k9 inserted, and a STALE k4
    # (ts=0) that must lose to the stored ts=1 row under latest_wins
    write([(2, "B", 2), (3, "C", 2), (9, "z", 2), (4, "stale", 0)])

    stream = (
        spark.readStream.schema("k int, v string, ts int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_merge_ingest(stream, table, ckpt, ["k"], "ts")
    q.awaitTermination(180)

    assert [m["op"] for m in history(table)] == ["overwrite", "merge"]
    got = sorted((r.k, r.v, r.ts) for r in read_version(spark, table).collect())
    assert got == [
        (1, "a", 1), (2, "B", 2), (3, "C", 2), (4, "d", 1), (9, "z", 2),
    ]
    # CDC between the batch boundaries: exactly batch 1's effective
    # upserts — the stale k4 write is invisible (value unchanged)
    changes = sorted(
        (r.k, r.v, r._change_type)
        for r in cdc_rows(spark, table, 1, 2, key_cols=["k"]).collect()
    )
    assert changes == [
        (2, "B", "update_postimage"),
        (2, "b", "update_preimage"),
        (3, "C", "update_postimage"),
        (3, "c", "update_preimage"),
        (9, "z", "insert"),
    ]
    # crash replay of the last merge batch: manifest no-op
    writer = f"stream-merge:{_os.path.abspath(ckpt)}"
    upd = spark.createDataFrame(
        [(2, "B", 2), (3, "C", 2), (9, "z", 2), (4, "stale", 0)],
        "k int, v string, ts int",
    )
    v = merge_version(
        spark, table, upd, ["k"], "ts", latest_wins=True,
        txn_id="merge-1", writer_id=writer,
    )
    assert v == 2
    assert [m["version"] for m in history(table)] == [1, 2]


def test_stream_cdc_ingest_applies_tombstones_exactly_once(spark, tmp_path):
    """r11: streaming FULL-CDC ingest — micro-batches mixing upserts
    and D tombstones land as snapshot commits; deletes REMOVE keys (an
    upsert-only sink can never converge to a deleting source), an
    equal-instant delete beats the upsert, CDC between boundaries
    classifies the batch, and a crash-replayed batch is a no-op."""
    import os as _os
    import time as _time

    from etl_dag_spark.sources.versions import (
        apply_cdc_version,
        cdc_rows,
        history,
        read_version,
    )
    from etl_dag_spark.streaming.corpus import stream_cdc_ingest

    src = str(tmp_path / "cdc_src")
    table = str(tmp_path / "cdc_table")
    ckpt = str(tmp_path / "cdc_ckpt")
    schema = "k int, v string, ts int, op string"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write([(1, "a", 1, "I"), (2, "b", 1, "I"), (3, "c", 1, "I"),
           (4, "d", 1, "I")])
    _time.sleep(1.05)
    # batch 1: update k2, DELETE k3, insert k9, and k4 gets an
    # equal-instant upsert+tombstone pair — the delete must win
    write([(2, "B", 2, "U"), (3, None, 2, "D"), (9, "z", 2, "I"),
           (4, "race", 2, "U"), (4, None, 2, "D")])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_cdc_ingest(stream, table, ckpt, ["k"], "ts")
    q.awaitTermination(180)

    assert [m["op"] for m in history(table)] == ["overwrite", "merge"]
    got = sorted((r.k, r.v) for r in read_version(spark, table).collect())
    assert got == [(1, "a"), (2, "B"), (9, "z")]
    changes = sorted(
        (r.k, r._change_type)
        for r in cdc_rows(spark, table, 1, 2, key_cols=["k"]).collect()
    )
    assert changes == [
        (2, "update_postimage"), (2, "update_preimage"),
        (3, "delete"), (4, "delete"), (9, "insert"),
    ]
    # crash replay of batch 1: manifest no-op under the stream's writer
    writer = f"stream-cdc:{_os.path.abspath(ckpt)}"
    replay = spark.createDataFrame(
        [(2, "B", 2, "U"), (3, None, 2, "D"), (9, "z", 2, "I"),
         (4, "race", 2, "U"), (4, None, 2, "D")],
        schema,
    )
    v = apply_cdc_version(
        spark, table, replay, ["k"], "ts",
        txn_id="cdc-1", writer_id=writer,
    )
    assert v == 2
    assert [m["version"] for m in history(table)] == [1, 2]


def test_stream_host_cap_fold_equals_batch_gate(spark, doc_stream_src):
    """Streaming per-host cap (r12, twin of #78): the folded store
    equals the batch etl_host_cap gate over every ingested document —
    per-host top-k by content hash is mergeable across micro-batches."""
    from etl_dag_spark.queries import _HOST_CAP, SPARK_QUERIES
    from etl_dag_spark.streaming.corpus import (
        read_host_cap_store,
        stream_host_cap,
    )
    import os as _os
    import tempfile as _tf

    store = _tf.mkdtemp(prefix="hostcap_store_")
    ckpt = _tf.mkdtemp(prefix="hostcap_ckpt_")
    q = stream_host_cap(
        read_document_stream(spark, doc_stream_src), store, ckpt, cap=_HOST_CAP
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.source, r.host_rank)
        for r in read_host_cap_store(spark, store, cap=_HOST_CAP).collect()
    }
    want = {
        (r.doc_id, r.source, r.host_rank)
        for r in SPARK_QUERIES["etl_host_cap"](spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0
    # the store never holds more than cap rows per (batch, host)
    assert len(
        [d for d in _os.listdir(store) if d.startswith("batch=")]
    ) >= 2


def test_stream_decontaminate_equals_one_shot(spark, doc_stream_src):
    """Streaming decontamination guard (r12, twin of #101b): union of
    per-batch clean outputs == the one-shot batch verdict over the
    whole corpus (decisions are doc-local vs the static eval set);
    a replayed batch rewrites identical rows."""
    import os as _os
    import tempfile as _tf

    from pyspark.sql import functions as F

    from etl_dag_spark.functions.text import shingle_rows
    from etl_dag_spark.streaming.corpus import (
        decontaminate_batch,
        stream_decontaminate,
    )

    docs = spark.read.parquet(doc_stream_src)
    eval_docs = docs.where(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    out = _tf.mkdtemp(prefix="decon_out_")
    ckpt = _tf.mkdtemp(prefix="decon_ckpt_")
    q = stream_decontaminate(
        read_document_stream(spark, doc_stream_src), eval_docs, out, ckpt
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    ev = shingle_rows(eval_docs, n=4).select(
        F.col("doc_id").alias("eval_doc_id"), "s"
    )
    verdict = decontaminate_batch(docs, ev)
    want = {r.doc_id for r in verdict.where(~F.col("dropped")).collect()}
    assert got == want
    # contamination really fired: every eval doc flags itself
    n_eval = eval_docs.count()
    assert verdict.where(F.col("dropped")).count() >= n_eval > 0
    # replaying one batch (overwrite) leaves the result unchanged
    batches = sorted(
        d for d in _os.listdir(out) if d.startswith("batch=")
    )
    assert len(batches) >= 2
    # materialize before self-overwriting (a lazy read of the same
    # path would see its own deletes)
    first = spark.read.parquet(
        _os.path.join(out, batches[0])
    ).localCheckpoint(eager=True)
    first.coalesce(1).write.mode("overwrite").parquet(
        _os.path.join(out, batches[0])
    )
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == want


def test_read_host_cap_store_empty_store(spark, tmp_path):
    from etl_dag_spark.streaming.corpus import read_host_cap_store

    folded = read_host_cap_store(spark, str(tmp_path / "nope"))
    assert folded.columns == ["doc_id", "source", "host_rank"]
    assert folded.count() == 0


def test_stream_lateness_monitor_scores_cross_batch_disorder(spark, tmp_path):
    """Streaming lateness monitor (r13, twin of stream_lateness_profile):
    events arriving in a LATER micro-batch than their event time score
    against the max of all prior batches; the folded store matches the
    hand-computed expectation, and a replayed delivery cannot inflate
    it."""
    import os

    from etl_dag_spark.streaming.quality import (
        read_lateness_store,
        stream_lateness_monitor,
    )

    src = str(tmp_path / "feed")
    os.makedirs(src)
    t0 = 1_700_000_000_000_000  # epoch µs
    # file 1: on-time events up to t0+2h; file 2: one event 30s late,
    # one 30min late, one on time; file 3: one 2h late (past every
    # class bound), one on time
    files = [
        [t0, t0 + 7_200_000_000],
        [t0 + 7_200_000_000 - 30_000_000,
         t0 + 7_200_000_000 - 1_800_000_000,
         t0 + 7_300_000_000],
        [t0 + 100_000_000, t0 + 7_400_000_000],
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i, ts_list in enumerate(files):
        # plain FILES directly under src (the file source ignores
        # nested dirs); distinct mtimes pin the processing order
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(ts_list)), pa.int64()),
                "ts_utc": pa.array(ts_list, pa.timestamp("us")),
            }
        )
        f = f"{src}/f{i}.parquet"
        pq.write_table(tbl, f)
        os.utime(f, (1000 + i, 1000 + i))
    stream = (
        spark.readStream.schema("event_id long, ts_utc timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    q = stream_lateness_monitor(stream, store, ckpt)
    q.awaitTermination(120)
    got = {
        r.lateness_class: (r.n_events, r.max_lateness_us)
        for r in read_lateness_store(spark, store).collect()
    }
    # batch 0: both on time (prev max unknown → 0); batch 1: 30s late
    # (<=1m), 30min late (<=1h), on-time; batch 2: 2h late (>1h since
    # 7300s-100s > 1h), on-time
    assert got == {
        "0": (4, 0),
        "<=1m": (1, 30_000_000),
        "<=1h": (1, 1_800_000_000),
        ">1h": (1, 7_200_000_000),
    }
    # at-least-once: re-delivering a batch's identical rows is folded out
    dup = spark.read.parquet(store).where("batch_id = 1")
    dup.write.mode("append").parquet(store)
    again = {
        r.lateness_class: (r.n_events, r.max_lateness_us)
        for r in read_lateness_store(spark, store).collect()
    }
    assert again == got
