"""Signed feature-hashed TF-IDF document vectors: numpy-oracle parity,
unit norm, similarity-tier composition, determinism, edges.

Reference analog: none — extension-tier text→embedding bridge so the
ANN/clustering/semdedup tiers run on text-only corpora.
"""
from __future__ import annotations

import math
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_workflow_spark.operators.text import hashed_tfidf_vectors

DIM = 64


def _oracle(texts: dict[int, str], dim: int) -> dict[int, np.ndarray]:
    tf = {}
    for d, t in texts.items():
        if t is None:
            continue
        c: dict[str, int] = {}
        for w in t.strip().lower().split():
            if w:
                c[w] = c.get(w, 0) + 1
        if c:
            tf[d] = c
    n = len([t for t in texts.values() if t is not None])
    dfreq: dict[str, int] = {}
    for c in tf.values():
        for w in c:
            dfreq[w] = dfreq.get(w, 0) + 1
    out = {}
    for d, c in tf.items():
        v_e9 = np.zeros(dim, dtype=np.int64)
        for w, k in c.items():
            b = zlib.crc32(w.encode()) % dim
            s = 1.0 if zlib.crc32((w + "#sign").encode()) % 2 == 0 else -1.0
            # per-term e9 floor before the bucket sum — the engine's
            # fixed-point convention, mirrored exactly
            v_e9[b] += math.floor(
                s * k * (math.log((n + 1) / (dfreq[w] + 1)) + 1.0) * 1e9
            )
        v = v_e9 / 1e9
        nm = np.linalg.norm(v)
        out[d] = v / nm if nm > 0 else v
    return out


def test_hashed_tfidf_matches_numpy_oracle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    got = {
        r["doc_id"]: np.array(r["embedding"])
        for r in hashed_tfidf_vectors(docs, dim=DIM).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = _oracle(texts, DIM)
    assert set(got) == set(want)
    for d in want:
        assert np.allclose(got[d], want[d], atol=1e-12)
        assert abs(np.linalg.norm(got[d]) - 1.0) < 1e-9


def test_hashed_tfidf_feeds_similarity_tier(spark):
    """The point of the op: near-identical docs land near-identical
    vectors, so brute-force cosine over the HASHED vectors retrieves
    the near-dup top-1 — embedding-style near-dup without a model."""
    from etl_workflow_spark.operators.similarity import brute_force_topk

    rows = [
        (0, "spark shuffles partition data across the cluster nodes"),
        (1, "spark shuffles partition data across the cluster machines"),
        (2, "bananas are yellow and monkeys enjoy eating them daily"),
        (3, "the optimizer rewrites join trees using cost estimates"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = hashed_tfidf_vectors(docs, dim=128).withColumnRenamed(
        "doc_id", "vec_id"
    )
    q = vecs.where("vec_id = 0").withColumnRenamed("vec_id", "query_id")
    top = brute_force_topk(vecs, q, k=1).collect()
    assert top[0]["neighbor_id"] == 1
    assert top[0]["score_e4"] > 7000  # near-dup cosine is high


def test_hashed_tfidf_edges_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta Alpha"), (2, None), (3, "   "), (4, "beta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["embedding"]
           for r in hashed_tfidf_vectors(docs, dim=16).collect()}
    # NULL and whitespace-only docs yield no vector row
    assert set(out) == {1, 4}
    assert len(out[1]) == 16
    # layout invariance
    rep = {r["doc_id"]: r["embedding"]
           for r in hashed_tfidf_vectors(
               docs.repartition(5), dim=16).collect()}
    assert rep == out
    # unnormalized mode preserves raw weights (norm != 1 in general)
    raw = {r["doc_id"]: np.array(r["embedding"])
           for r in hashed_tfidf_vectors(
               docs, dim=16, normalize=False).collect()}
    assert abs(np.linalg.norm(raw[1]) - 1.0) > 1e-6
    with pytest.raises(ValueError, match="dim"):
        hashed_tfidf_vectors(docs, dim=0)
    # pure codegen: no Python UDF in the plan
    plan = (
        hashed_tfidf_vectors(docs, dim=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_corpus_drift_matches_numpy_oracle(spark, sf_dir):
    """PSI drift (r11): exact parity with an independent zlib/numpy
    oracle; identical corpora score ~0; a major injected shift scores
    over the published 0.25 threshold; refusals."""
    import math as _math

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a_df = docs.where("doc_id < 250")
    b_df = docs.where("doc_id >= 250")
    B, S = 64, 0.5
    from etl_workflow_spark.operators.text import corpus_drift

    rows = corpus_drift(a_df, b_df, buckets=B, smoothing=S).collect()

    def counts(frame):
        c = {}
        tot = 0
        for r in frame.collect():
            if r["text"] is None:
                continue
            for w in r["text"].strip().lower().split():
                if w:
                    b = zlib.crc32(w.encode()) % B
                    c[b] = c.get(b, 0) + 1
                    tot += 1
        return c, tot

    ca, ua = counts(a_df)
    cb, ub = counts(b_df)
    want = {}
    want_total = 0
    for b in range(B):  # FULL spine: both-empty buckets still count
        na, nb = ca.get(b, 0), cb.get(b, 0)
        lr = (
            (_math.log(na + S) - _math.log(ua + S * B))
            - (_math.log(nb + S) - _math.log(ub + S * B))
        )
        p = (na + S) / (ua + S * B)
        q = (nb + S) / (ub + S * B)
        e9 = _math.floor((p - q) * lr * 1e9)
        want[b] = (na, nb, e9)
        want_total += e9
    got = {
        r["bucket"]: (r["n_a"], r["n_b"], r["psi_e9"]) for r in rows
    }
    assert got == want
    assert all(r["psi_total_e9"] == want_total for r in rows)
    # two halves of the same synthetic corpus: stable (< 0.1)
    assert want_total / 1e9 < 0.1
    # injected major shift: replace half of B's text with a new token
    shifted = b_df.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.lit("zzznovel " * 60)
        ).otherwise(F.col("text")).alias("text"),
    )
    big = corpus_drift(a_df, shifted, buckets=B, smoothing=S).collect()
    assert big[0]["psi_total_e9"] / 1e9 > 0.25
    with pytest.raises(ValueError, match="non-empty"):
        corpus_drift(
            a_df,
            spark.createDataFrame([], "doc_id long, text string"),
            buckets=B,
        )
    with pytest.raises(ValueError, match="buckets"):
        corpus_drift(a_df, b_df, buckets=0)
