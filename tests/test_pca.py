"""Distributed PCA (similarity.py::embedding_pca): the quantized
moment pass must reproduce the numpy covariance EXACTLY (integer
moments are order-independent), eigenvalues must come out descending,
and every projected coordinate must match a literal numpy replay.
"""

from __future__ import annotations

import numpy as np

from etl_dag_spark.operators.similarity import embedding_pca
from etl_dag_spark.sources.tables import load_table

from tests.conftest import SF_DIR

QUANT = 1_000_000


def _replay(emb_rows):
    """Literal numpy replay of the documented arithmetic."""
    ids = np.array([r["vec_id"] for r in emb_rows], dtype=np.int64)
    mat = np.array(
        [np.floor(np.asarray(r["embedding"], dtype=np.float64) * QUANT) for r in emb_rows],
        dtype=np.int64,
    )
    n, d = mat.shape
    s = mat.sum(axis=0)
    ss = mat.T @ mat
    mu_q = s.astype(np.float64) / n
    cov = (ss.astype(np.float64) / n - np.outer(mu_q, mu_q)) / (QUANT * QUANT)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    return ids, mat, mu_q, cov, evals[order], evecs[:, order]


def test_pca_matches_numpy_replay(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids, mat, mu_q, cov, evals_np, evecs_np = _replay(rows)

    k = 4
    proj, evals, comp = embedding_pca(emb, n_components=k, quant=QUANT)

    # eigenvalues: descending, non-negative, equal to the replay's
    assert np.all(np.diff(evals) <= 0)
    assert evals[-1] >= -1e-12
    assert np.allclose(evals, evals_np[:k], rtol=0, atol=1e-18)

    # components: same subspace AND same sign convention
    comp_np = evecs_np[:, :k].T
    flip = np.sign(comp_np[np.arange(k), np.abs(comp_np).argmax(axis=1)])
    comp_np = comp_np * flip[:, None]
    assert np.allclose(comp, comp_np, rtol=0, atol=1e-12)

    # every projected coordinate matches the replay
    want = {
        int(i): ((row - mu_q) / QUANT) @ comp_np.T for i, row in zip(ids, mat)
    }
    got = {int(r["vec_id"]): np.asarray(r["pc"]) for r in proj.collect()}
    assert set(got) == set(want)
    for i in got:
        assert np.allclose(got[i], want[i], rtol=0, atol=1e-12), i


def test_pca_variance_concentrates(spark):
    """Top components must actually explain more variance than the
    tail — on any non-degenerate corpus the spectrum is decreasing and
    the top-8 share is strictly positive."""
    emb = load_table(spark, SF_DIR, "embeddings")
    _proj, evals, _comp = embedding_pca(emb, n_components=8)
    assert evals[0] > 0
    assert np.all(evals >= -1e-12)


def test_pca_extra_cols_pass_through(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    proj, _e, _c = embedding_pca(emb, n_components=2, extra_cols=["label"])
    base = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    out = {r["vec_id"]: r["label"] for r in proj.collect()}
    assert out == base


def test_pca_projection_is_run_stable(spark):
    """Two invocations over the same corpus must agree bit-for-bit —
    the determinism contract the rows-only driver check leans on."""
    emb = load_table(spark, SF_DIR, "embeddings")
    a, ea, ca = embedding_pca(emb, n_components=3)
    b, eb, cb = embedding_pca(emb, n_components=3)
    assert np.array_equal(ea, eb) and np.array_equal(ca, cb)
    pa = {r["vec_id"]: tuple(r["pc"]) for r in a.collect()}
    pb = {r["vec_id"]: tuple(r["pc"]) for r in b.collect()}
    assert pa == pb
