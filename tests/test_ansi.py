"""ANSI-mode smoke: the session pins ANSI off for reference parity
(bad rows tolerated), but the operators claim Spark-4-default (ANSI on)
portability — the round-5 minhash rewrite exists precisely because an
affine-min hash relied on silent overflow and threw under ANSI. This
suite re-runs representative operators with the runtime conf flipped.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_workflow_spark.catalog import table


@pytest.fixture()
def ansi(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


def test_minhash_and_text_ops_under_ansi(ansi, sf_dir):
    from etl_workflow_spark.operators.dedup import minhash_lsh_pairs
    from etl_workflow_spark.operators.text import text_profile, text_quality

    docs = table(ansi, sf_dir, "documents")
    assert minhash_lsh_pairs(docs, threshold=0.4).count() >= 0
    tq = text_quality(docs)
    assert tq.where(F.col("n_words") > 0).count() > 0
    assert text_profile(docs).count() == docs.count()


def test_ranking_and_fixed_point_under_ansi(ansi, sf_dir):
    from etl_workflow_spark.operators.ranking import (
        distributed_ntile,
        select_prefix_by_budget,
    )

    docs = table(ansi, sf_dir, "documents").select("doc_id", "n_chars")
    order = [F.desc("n_chars"), F.asc("doc_id")]
    nt = distributed_ntile(docs, order, 4, out_col="q")
    assert set(r.q for r in nt.collect()) == {1, 2, 3, 4}
    sel = select_prefix_by_budget(docs, order, "n_chars", budget=10_000)
    assert sel.agg(F.max("cum_weight")).collect()[0][0] <= 10_000


def test_gate_fixed_point_entries_under_ansi(ansi, sf_dir):
    """The integer-DIV fixed-point recipes (quality stats, revenue
    windows) must not hit ANSI division/overflow errors."""
    import __spark_entry__ as entry

    q = entry.queries()
    assert q["quality_filtered_stats"](ansi, sf_dir).count() == 1
    assert q["revenue_windows"](ansi, sf_dir).count() > 0


def test_txn_mutations_and_span_dedup_under_ansi(ansi, sf_dir, tmp_path):
    """Round-8 surface under ANSI: the txn mutation family (stats
    aggregation, key anti-join, replace_where arithmetic) and the
    reshaped span dedup must not rely on silent overflow/coercion."""
    from etl_workflow_spark.operators.dedup import dedup_spans
    from etl_workflow_spark.sources import txn

    docs = table(ansi, sf_dir, "documents").limit(50)
    assert dedup_spans(docs, min_tokens=10).count() == 50

    path = str(tmp_path / "t")
    txn.txn_create(
        ansi, path, ansi.createDataFrame([(1, 10)], ["id", "v"]),
        stats_cols=["id"],
    )
    assert txn.txn_append(
        ansi, path, ansi.createDataFrame([(1, 11), (2, 20)], ["id", "v"]),
        keys=["id"],
    ) == 1
    assert txn.txn_merge_into(
        ansi, path, ansi.createDataFrame([(2, 21)], ["id", "v"]), ["id"]
    ) == (1, 0)
    deleted, inserted = txn.txn_replace_where(
        ansi, path, F.col("v") > 15,
        ansi.createDataFrame([(9, 9)], ["id", "v"]),
    )
    assert (deleted, inserted) == (1, 1)
    got = sorted((r.id, r.v) for r in txn.txn_read(ansi, path).collect())
    assert got == [(1, 10), (9, 9)]


def test_r9_surface_under_ansi(ansi, sf_dir):
    """Round-9 surface under ANSI: the PQ tier (int16 codes, bigint
    accumulation in the int8 oracle twin's Spark side, window cuts)
    and byte-fallback BPE encode/decode must not rely on silent
    overflow/coercion."""
    from etl_workflow_spark.operators import similarity as S
    from etl_workflow_spark.operators import text as T

    emb = table(ansi, sf_dir, "embeddings")
    q = emb.where("vec_id < 2").withColumnRenamed("vec_id", "query_id")
    model = S.pq_fit(emb, n_cells=4, m_sub=8, ksub=16)
    idx = S.pq_index(emb, model)
    assert S.pq_topk(idx, q, model, emb, k=3).count() == 6
    assert S.pq_topk(idx, q, model, emb, k=3, n_probe=2).count() > 0

    docs = table(ansi, sf_dir, "documents").select("doc_id", "text").limit(20)
    bpe = T.train_bpe(
        docs, num_merges=20, lowercase=False, byte_fallback=True,
        min_pair_count=1,
    )
    out = T.bpe_decode(T.bpe_encode(docs, bpe), bpe)
    assert out.where(
        F.col("text_decoded") != F.col("text")
    ).count() == 0
