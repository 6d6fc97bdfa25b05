"""Distributed PCA (`similarity.pca_fit` / `pca_transform`) vs an
in-memory numpy oracle on the real embeddings table.

The distributed fit accumulates Gram partials per partition; the oracle
computes the same covariance eigendecomposition on collected vectors.
Components must match to float tolerance (signs canonicalized on both
sides), projections must match row-wise, and the fit must be invariant
to partition layout.
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_workflow_spark.catalog import table
from etl_workflow_spark.operators import similarity as S

DIM = 64
K = 6


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    return np.array([r.embedding for r in rows], dtype=np.float64)


def numpy_pca(X, k):
    mu = X.mean(axis=0)
    Xc = X - mu
    cov = (Xc.T @ Xc) / X.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, np.maximum(evals[order], 0.0)


def test_fit_matches_numpy_oracle(emb, X):
    model = S.pca_fit(emb, k=K, dim=DIM)
    mu, comps, var = numpy_pca(X, K)
    assert model["n"] == X.shape[0]
    assert np.allclose(model["mean"], mu, atol=1e-9)
    assert np.allclose(model["explained_variance"], var, rtol=1e-8)
    assert np.allclose(model["components"], comps, atol=1e-7)


def test_components_orthonormal_and_variance_descending(emb):
    model = S.pca_fit(emb, k=K, dim=DIM)
    C = np.array(model["components"])
    assert np.allclose(C @ C.T, np.eye(K), atol=1e-9)
    v = model["explained_variance"]
    assert all(a >= b - 1e-12 for a, b in zip(v, v[1:]))
    r = model["explained_variance_ratio"]
    assert 0.0 < sum(r) <= 1.0 + 1e-9


def test_fit_layout_invariant(emb):
    a = S.pca_fit(emb, k=K, dim=DIM)
    b = S.pca_fit(emb.repartition(11, "vec_id"), k=K, dim=DIM)
    c = S.pca_fit(emb.coalesce(1), k=K, dim=DIM)
    for other in (b, c):
        assert np.allclose(a["components"], other["components"], atol=1e-8)
        assert np.allclose(
            a["explained_variance"], other["explained_variance"], rtol=1e-8
        )


def test_transform_matches_numpy_projection(emb, X):
    model = S.pca_fit(emb, k=K, dim=DIM)
    out = S.pca_transform(emb, model).collect()
    got = {r.vec_id: np.array(r.pca) for r in out}
    mu = np.array(model["mean"])
    C = np.array(model["components"])
    ids = sorted(got)
    P = (X - mu) @ C.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], P[i], atol=1e-7)


def test_whiten_unit_variance(emb):
    model = S.pca_fit(emb, k=K, dim=DIM)
    out = S.pca_transform(emb, model, whiten=True).collect()
    P = np.array([r.pca for r in out])
    # population variance of each whitened coordinate ~ 1
    assert np.allclose(P.var(axis=0), 1.0, rtol=1e-6)


def test_reconstruction_error_decreases_with_k(emb, X):
    errs = []
    for k in (2, 8, 32):
        model = S.pca_fit(emb, k=k, dim=DIM)
        mu = np.array(model["mean"])
        C = np.array(model["components"])
        P = (X - mu) @ C.T
        R = P @ C + mu
        errs.append(float(((X - R) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]


def test_empty_and_bad_dim_raise(spark, emb):
    with pytest.raises(ValueError):
        S.pca_fit(emb.limit(0), k=2, dim=DIM)
    with pytest.raises(Exception):
        S.pca_fit(emb, k=2, dim=32)  # declared dim mismatches data
    with pytest.raises(ValueError):
        S.pca_fit(emb, k=DIM + 1, dim=DIM)


def test_gram_rollup_incremental_pca_matches_batch(spark, emb, tmp_path):
    """PCA refit from the streamed Gram-partial store must equal the
    one-shot batch fit; replaying a batch with its original batch_id
    must not change the model, a new batch_id must."""
    from etl_workflow_spark.streaming.incremental import gram_rollup_batch

    store = str(tmp_path / "gram_store")
    b1 = emb.where("vec_id % 2 = 0")
    b2 = emb.where("vec_id % 2 = 1")
    gram_rollup_batch(b1, store, batch_id=0, dim=DIM)
    gram_rollup_batch(b2, store, batch_id=1, dim=DIM)

    from_store = S.pca_fit_from_partials(
        spark.read.parquet(store), k=K, dim=DIM
    )
    batch = S.pca_fit(emb, k=K, dim=DIM)
    assert from_store["n"] == batch["n"]
    assert np.allclose(from_store["components"], batch["components"], atol=1e-8)
    assert np.allclose(
        from_store["explained_variance"], batch["explained_variance"], rtol=1e-8
    )

    # replay with the same batch_id: model unchanged
    gram_rollup_batch(b2, store, batch_id=1, dim=DIM)
    replay = S.pca_fit_from_partials(spark.read.parquet(store), k=K, dim=DIM)
    assert replay["n"] == batch["n"]
    assert np.allclose(replay["components"], batch["components"], atol=1e-10)

    # a NEW batch_id genuinely adds rows
    gram_rollup_batch(b2, store, batch_id=2, dim=DIM)
    grown = S.pca_fit_from_partials(spark.read.parquet(store), k=K, dim=DIM)
    assert grown["n"] == batch["n"] + b2.count()


def test_stream_gram_rollup_real_stream(spark, emb, tmp_path):
    """Drive the Gram rollup through a real availableNow stream and
    refit: must match the batch model."""
    from etl_workflow_spark.streaming.incremental import stream_gram_rollup

    src = str(tmp_path / "src")
    emb.write.parquet(src)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(emb.schema).parquet(src)
    q = (
        stream_gram_rollup(stream, store, ckpt, dim=DIM)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish"
    model = S.pca_fit_from_partials(spark.read.parquet(store), k=K, dim=DIM)
    batch = S.pca_fit(emb, k=K, dim=DIM)
    assert model["n"] == batch["n"]
    assert np.allclose(model["components"], batch["components"], atol=1e-8)


def test_compact_gram_store_preserves_model(spark, emb, tmp_path):
    from etl_workflow_spark.streaming.incremental import (
        compact_gram_store,
        gram_rollup_batch,
    )

    store = str(tmp_path / "gram")
    for b in range(3):
        gram_rollup_batch(
            emb.where(f"vec_id % 3 = {b}"), store, batch_id=b, dim=DIM
        )
    before = S.pca_fit_from_partials(spark.read.parquet(store), k=K, dim=DIM)
    compact_gram_store(spark, store, before_batch_id=2)
    store_df = spark.read.parquet(store)
    assert store_df.count() == 2  # compacted row + open batch 2
    after = S.pca_fit_from_partials(store_df, k=K, dim=DIM)
    assert after["n"] == before["n"]
    assert np.allclose(after["components"], before["components"], atol=1e-10)
