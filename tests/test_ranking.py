"""Distributed ranking vs the single-partition window oracle.

``distributed_row_number`` / ``distributed_ntile`` must match
``row_number()``/``ntile()`` over ``Window.orderBy(...)`` exactly —
the whole point is same semantics, distributed cost.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_workflow_spark.operators.ranking import (
    distributed_ntile,
    distributed_row_number,
)


@pytest.fixture(scope="module")
def scored(spark):
    # Values with heavy ties; id is the unique tiebreak.
    return spark.range(997).select(
        F.col("id"),
        (F.col("id") % 13).alias("score"),
    )


def test_row_number_matches_window(spark, scored):
    order = [F.desc("score"), F.asc("id")]
    got = {
        r["id"]: r["rn"]
        for r in distributed_row_number(scored, order, num_partitions=8)
        .collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in scored.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rn")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n", [1, 4, 7, 32])
def test_ntile_matches_window(spark, scored, n):
    order = [F.desc("score"), F.asc("id")]
    got = {
        r["id"]: r["q"]
        for r in distributed_ntile(
            scored, order, n, out_col="q", num_partitions=8
        ).collect()
    }
    want = {
        r["id"]: r["q"]
        for r in scored.select(
            "id", F.ntile(n).over(Window.orderBy(*order)).alias("q")
        ).collect()
    }
    assert got == want


def test_ntile_more_buckets_than_rows(spark):
    df = spark.range(3).select(F.col("id"))
    got = sorted(
        (r["id"], r["q"])
        for r in distributed_ntile(
            df, [F.asc("id")], 10, out_col="q", num_partitions=4
        ).collect()
    )
    # NTILE with n > rows: bucket == row number.
    assert got == [(0, 1), (1, 2), (2, 3)]


def test_empty_input(spark):
    df = spark.range(0)
    assert distributed_row_number(df, [F.asc("id")]).count() == 0
    assert distributed_ntile(df, [F.asc("id")], 4).count() == 0


def test_no_single_partition_window_in_plan(spark, scored):
    """The scale claim itself: the distributed path contains no Window
    operator at all (and therefore no everything-to-one-task sort);
    the global order comes from a range exchange. The output plan is a
    scan of the checkpointed ranged frame (lineage truncation is the
    determinism fix), so the range exchange is asserted on the
    pre-checkpoint stage."""
    from etl_workflow_spark.plans import physical_plan

    order = [F.desc("score"), F.asc("id")]
    out = distributed_ntile(scored, order, 4, num_partitions=8)
    plan = physical_plan(out)
    assert "Window" not in plan

    staged = scored.repartitionByRange(8, *order).sortWithinPartitions(*order)
    assert "rangepartitioning" in physical_plan(staged).lower()


def test_gate_entry_uses_distributed_path(spark, sf_dir):
    """customer_quartiles (the gate entry) must ride this operator,
    not a bare Window.orderBy."""
    import __spark_entry__ as entry

    df = entry.queries()["customer_quartiles"](spark, sf_dir)
    from etl_workflow_spark.plans import physical_plan

    assert "Window" not in physical_plan(df)


def test_budget_prefix_matches_window_semantics(spark):
    """select_prefix_by_budget == SUM(w) OVER (ORDER BY ...) <= budget
    computed the naive single-partition way."""
    import random

    from pyspark.sql.window import Window

    from etl_workflow_spark.operators.ranking import select_prefix_by_budget

    rnd = random.Random(3)
    rows = [(i, rnd.randrange(1, 50), rnd.randrange(1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens", "quality"])
    order = [F.desc("quality"), F.asc("doc_id")]
    budget = 5000

    w = Window.orderBy(*order)
    expected = {
        (r.doc_id, r.cw)
        for r in df.withColumn("cw", F.sum("n_tokens").over(w))
        .where(F.col("cw") <= budget)
        .select("doc_id", "cw")
        .collect()
    }
    got = {
        (r.doc_id, r.cum_weight)
        for r in select_prefix_by_budget(
            df, order, "n_tokens", budget, num_partitions=8
        ).collect()
    }
    assert got == expected
    assert got, "budget must select a non-empty prefix"


def test_budget_prefix_prunes_partitions(spark):
    """A tiny budget must not read every partition in pass 2 — the plan
    filters on the partition id before mapInPandas."""
    from etl_workflow_spark.operators.ranking import select_prefix_by_budget

    df = spark.createDataFrame(
        [(i, 10, i) for i in range(1000)], ["doc_id", "n_tokens", "q"]
    )
    out = select_prefix_by_budget(
        df, [F.asc("q"), F.asc("doc_id")], "n_tokens", budget=50,
        num_partitions=8,
    )
    rows = out.collect()
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.cum_weight)] == [
        0, 1, 2, 3, 4
    ]
    # the pid filter survives into the optimized plan (a single-pid
    # isin folds to an equality — either form proves pass-2 pruning)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" in plan and "__rank_pid" in plan


def test_budget_prefix_empty_when_budget_below_first_row(spark):
    from etl_workflow_spark.operators.ranking import select_prefix_by_budget

    df = spark.createDataFrame([(1, 100, 1)], ["doc_id", "n_tokens", "q"])
    out = select_prefix_by_budget(df, [F.asc("q")], "n_tokens", budget=50)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_tokens", "q", "cum_weight"]


def test_row_number_exact_when_range_sampling_engages(spark):
    """Regression: RangePartitioner re-samples split points per JOB, so
    without materialization the count pass and assign pass can see
    different boundaries — at ~15k rows this produced duplicate and
    skipped global row numbers (caught at sf0.1). The invariant that
    failed: rn must be exactly the set 1..n."""
    import random

    from etl_workflow_spark.operators.ranking import distributed_row_number

    rnd = random.Random(17)
    df = spark.createDataFrame(
        [(i, rnd.random()) for i in range(20_000)], ["id", "v"]
    ).repartition(8)
    out = distributed_row_number(df, [F.desc("v"), F.asc("id")], "rn")
    rns = [r.rn for r in out.select("rn").collect()]
    assert sorted(rns) == list(range(1, 20_001))


def test_rrf_fuse_contract(spark):
    """Reciprocal-rank fusion (r11): hand-checked integer math,
    n_lists accounting, tie-break by id, layout invariance, and the
    empty-input refusal."""
    from etl_workflow_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3), ("q2", 20, 1)],
        "query string, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [("q1", 11, 1), ("q1", 13, 2), ("q2", 20, 1)],
        "query string, doc_id long, rank int",
    )
    out = {
        (r["query"], r["doc_id"]): (r["n_lists"], r["rrf_e6"], r["rank"])
        for r in rrf_fuse([a, b], k=10).collect()
    }
    c = lambda r: 1_000_000 // (60 + r)  # noqa: E731
    # doc 11 is in both lists: rank 2 in a, rank 1 in b
    assert out[("q1", 11)] == (2, c(2) + c(1), 1)
    assert out[("q1", 10)] == (1, c(1), 2)
    # 12 (rank 3 in a) vs 13 (rank 2 in b): 13 scores higher
    assert out[("q1", 13)][2] == 3 and out[("q1", 12)][2] == 4
    assert out[("q2", 20)] == (2, 2 * c(1), 1)
    # exact ties break by doc id ascending: two singletons at rank 1
    t1 = spark.createDataFrame(
        [("q", 5, 1)], "query string, doc_id long, rank int"
    )
    t2 = spark.createDataFrame(
        [("q", 3, 1)], "query string, doc_id long, rank int"
    )
    tied = [
        (r["doc_id"], r["rank"]) for r in rrf_fuse([t1, t2], k=2)
        .orderBy("rank").collect()
    ]
    assert tied == [(3, 1), (5, 2)]
    # k cuts; layout-invariant under repartition
    assert rrf_fuse([a, b], k=2).count() == 3  # 2 for q1, 1 for q2
    rep = {
        (r["query"], r["doc_id"]): (r["n_lists"], r["rrf_e6"], r["rank"])
        for r in rrf_fuse([a.repartition(7), b.coalesce(1)], k=10)
        .collect()
    }
    assert rep == out
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([], k=5)


def test_rrf_fuse_hybrid_end_to_end(spark, sf_dir):
    """Sparse BM25 + dense cosine fused over the same doc-id space —
    the hybrid-search composition the ann_topk gate hash-checks; here
    the invariants: fused ranks are contiguous per query, every fused
    doc came from at least one input list, and a doc ranked top-1 by
    BOTH lists is fused top-1."""
    from etl_workflow_spark.operators.ranking import rrf_fuse
    from etl_workflow_spark.operators.similarity import brute_force_topk
    from etl_workflow_spark.operators.text import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sparse = bm25_topk(docs, ["hash join merge"], k=10).select(
        F.lit("h").alias("query"), "doc_id", "rank"
    )
    dense = brute_force_topk(
        emb, emb.where("vec_id = 7").withColumnRenamed("vec_id", "query_id"),
        k=10,
    ).select(
        F.lit("h").alias("query"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    fused = rrf_fuse([sparse, dense], k=10).collect()
    ranks = sorted(r["rank"] for r in fused)
    assert ranks == list(range(1, len(fused) + 1))
    in_lists = {r["doc_id"] for r in sparse.collect()} | {
        r["doc_id"] for r in dense.collect()
    }
    assert {r["doc_id"] for r in fused} <= in_lists
    both_top = {r["doc_id"] for r in sparse.where("rank = 1").collect()} & {
        r["doc_id"] for r in dense.where("rank = 1").collect()
    }
    if both_top:
        assert {r["doc_id"] for r in fused if r["rank"] == 1} == both_top


def test_retrieval_metrics_hand_computed(spark):
    """MRR / recall@k / nDCG@k (r11): every value checked against a
    hand computation with the same e9-floor-then-integer-sum rule."""
    import math

    from etl_workflow_spark.operators.ranking import retrieval_metrics

    ranked = spark.createDataFrame(
        [
            ("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3),
            ("q2", 20, 1), ("q2", 21, 2),
            ("q3", 30, 1),
        ],
        "query string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [
            ("q1", 11, 2), ("q1", 12, 1), ("q1", 99, 3),  # 99 missed
            ("q2", 21, 1),
            ("q3", 77, 1),          # nothing retrieved is relevant
            ("q4", 50, 2),          # query never ranked at all
        ],
        "query string, doc_id long, rel int",
    )
    out = {r["query"]: r for r in retrieval_metrics(
        ranked, qrels, k=3).collect()}

    def term(rel, pos):
        return math.floor((2 ** rel - 1) / math.log2(pos + 1) * 1e9)

    q1 = out["q1"]
    assert (q1["n_rel"], q1["n_hit"]) == (3, 2)
    assert q1["mrr_e6"] == 1_000_000 // 2  # first hit at rank 2
    assert q1["dcg_e9"] == term(2, 2) + term(1, 3)
    # ideal order: rel 3, 2, 1 at positions 1..3
    assert q1["idcg_e9"] == term(3, 1) + term(2, 2) + term(1, 3)
    assert q1["ndcg_e6"] == q1["dcg_e9"] * 1_000_000 // q1["idcg_e9"]
    q2 = out["q2"]
    assert (q2["n_rel"], q2["n_hit"], q2["mrr_e6"]) == (1, 1, 500_000)
    assert q2["ndcg_e6"] == term(1, 2) * 1_000_000 // term(1, 1)
    # no relevant doc retrieved: zeros, but the query still reports
    q3 = out["q3"]
    assert (q3["n_hit"], q3["mrr_e6"], q3["dcg_e9"], q3["ndcg_e6"]) == (
        0, 0, 0, 0,
    )
    # judged-but-never-ranked query also reports (recall denominator)
    assert out["q4"]["n_hit"] == 0 and out["q4"]["n_rel"] == 1
    # perfect ranking scores ndcg exactly 1e6
    perfect = retrieval_metrics(
        spark.createDataFrame(
            [("p", 1, 1), ("p", 2, 2)],
            "query string, doc_id long, rank int",
        ),
        spark.createDataFrame(
            [("p", 1, 2), ("p", 2, 1)],
            "query string, doc_id long, rel int",
        ),
        k=5,
    ).collect()[0]
    assert perfect["ndcg_e6"] == 1_000_000


def test_retrieval_metrics_rejects_oversized_grades(spark):
    from etl_workflow_spark.operators.ranking import retrieval_metrics

    ranked = spark.createDataFrame(
        [("q", 1, 1)], "query string, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [("q", 1, 17)], "query string, doc_id long, rel int"
    )
    with pytest.raises(Exception, match="rel <= 16"):
        retrieval_metrics(ranked, qrels, k=5).collect()


def test_mmr_rerank_diversifies(spark):
    """MMR (r11): λ=1 reproduces relevance order; a smaller λ demotes
    the near-duplicate of the top hit; hand-checked selection scores;
    layout invariance; λ range guard."""
    import math

    import numpy as np

    from etl_workflow_spark.operators.ranking import mmr_rerank

    # doc 1 and 2 near-identical vectors; doc 3 orthogonal-ish
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.04, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "doc_id long, embedding array<double>",
    )
    ranked = spark.createDataFrame(
        [("q", 1, 1000, 1), ("q", 2, 900, 2), ("q", 3, 500, 3)],
        "query string, doc_id long, score_e4 long, rank int",
    )
    pure = [r["doc_id"] for r in mmr_rerank(
        ranked, vecs, k=3, lam=1.0).orderBy("rank").collect()]
    assert pure == [1, 2, 3]
    div = {r["rank"]: r for r in mmr_rerank(
        ranked, vecs, k=3, lam=0.5).orderBy("rank").collect()}
    assert [div[i]["doc_id"] for i in (1, 2, 3)] == [1, 3, 2]
    # hand-check rank-2's score: rel(3)=0, sim(3,1)=0 -> 0.5*0-0.5*0=0
    assert div[2]["mmr_e6"] == 0
    # rank-1 pick scores its normalized relevance (1.0)
    assert div[1]["mmr_e6"] == 1_000_000
    # rank-3: rel(2)=0.8, max sim to {1,3} ~ 0.9992 — recomputed
    # through the r12 quantized-cosine path (floor to the 2^-20 grid,
    # integer dot, one closing division)
    u2 = np.array([0.999, 0.04, 0.0])
    u2q = np.floor(u2 / np.linalg.norm(u2) * 2.0**20)
    u1q = np.floor(np.array([1.0, 0.0, 0.0]) * 2.0**20)
    sim = float(u2q @ u1q) / 2.0**40
    want = math.floor((0.5 * 0.8 - 0.5 * sim) * 1e6)
    assert div[3]["mmr_e6"] == want
    # k cut + layout invariance
    assert mmr_rerank(ranked, vecs, k=2, lam=0.5).count() == 2
    again = {r["rank"]: r["doc_id"] for r in mmr_rerank(
        ranked.repartition(5), vecs.coalesce(1), k=3, lam=0.5
    ).collect()}
    assert [again[i] for i in (1, 2, 3)] == [1, 3, 2]
    import pytest as _pt

    with _pt.raises(ValueError, match="lam"):
        mmr_rerank(ranked, vecs, lam=1.5)


def test_retrieval_metrics_high_grade_no_overflow(spark):
    """rel up to 16 must produce a sane ndcg (the ×1e6 intermediate
    widens to decimal — previously it wrapped int64)."""
    from etl_workflow_spark.operators.ranking import retrieval_metrics

    ranked = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "query string, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [("q", 1, 16), ("q", 2, 16)],
        "query string, doc_id long, rel int",
    )
    m = retrieval_metrics(ranked, qrels, k=5).collect()[0]
    assert m["ndcg_e6"] == 1_000_000  # perfect order, no wrap


def test_mmr_rerank_missing_vector_fails_loudly(spark):
    from etl_workflow_spark.operators.ranking import mmr_rerank

    ranked = spark.createDataFrame(
        [("q", 1, 900, 1), ("q", 2, 100, 2)],
        "query string, doc_id long, score_e4 long, rank int",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "doc_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="no vector for ranked candidate"):
        mmr_rerank(ranked, vecs, k=2).collect()


def test_mmr_rerank_string_ids(spark):
    """The output schema derives from the input id/query types —
    string doc ids must work (previously pinned to long)."""
    from etl_workflow_spark.operators.ranking import mmr_rerank

    ranked = spark.createDataFrame(
        [("q", "a", 900, 1), ("q", "b", 100, 2)],
        "query string, doc_id string, score_e4 long, rank int",
    )
    vecs = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "doc_id string, embedding array<double>",
    )
    out = {r["rank"]: r["doc_id"]
           for r in mmr_rerank(ranked, vecs, k=2, lam=0.5).collect()}
    assert out == {1: "a", 2: "b"}


def test_retrieval_metrics_dedupes_qrels(spark):
    """Duplicate (query, doc) judgment rows (r12 fix): collapsed to
    max(rel) before counting — previously each dup double-counted
    n_rel/n_hit and inflated DCG and IDCG."""
    import math

    from etl_workflow_spark.operators.ranking import retrieval_metrics

    ranked = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)],
        "query string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        # doc 1 judged THREE times with conflicting grades; doc 2 twice
        [("q", 1, 1), ("q", 1, 3), ("q", 1, 2),
         ("q", 2, 1), ("q", 2, 1)],
        "query string, doc_id long, rel int",
    )
    out = retrieval_metrics(ranked, qrels, k=5).collect()
    assert len(out) == 1
    row = out[0]

    def term(rel, pos):
        return math.floor((2 ** rel - 1) / math.log2(pos + 1) * 1e9)

    # 2 distinct judged docs, both retrieved; grades resolve to 3 and 1
    assert (row["n_rel"], row["n_hit"]) == (2, 2)
    assert row["mrr_e6"] == 1_000_000
    assert row["dcg_e9"] == term(3, 1) + term(1, 2)
    assert row["idcg_e9"] == term(3, 1) + term(1, 2)
    assert row["ndcg_e6"] == 1_000_000
