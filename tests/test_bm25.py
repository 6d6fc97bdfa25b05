"""BM25 full-text search: oracle parity, prebuilt-index path, plan
shape, determinism, and edge semantics.

Reference analog: none — extension-tier corpus search. The DuckDB twin
(`bm25_topk_oracle`) replays the identically-parenthesized per-term
double and e6 floor, so scores are compared EXACTLY, not approximately.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_workflow_spark.operators import text as T

QS = ["hash join merge", "slow query filter", "vector vector the zzzmiss"]


def _rows(df):
    return sorted(
        (r["query"], r["doc_id"], r["n_terms"], r["score_e4"], r["rank"])
        for r in df.collect()
    )


def test_bm25_matches_duckdb(spark, sf_dir):
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _rows(T.bm25_topk(docs, QS, k=7))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(T.bm25_topk_oracle(QS, k=7)).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_bm25_prebuilt_postings_equals_inline(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inline = _rows(T.bm25_topk(docs, QS, k=5))
    postings = T.build_text_index(docs)
    assert _rows(T.bm25_topk(None, QS, k=5, postings=postings)) == inline
    # the 100 TB path: postings persisted as a table, corpus never re-read
    path = str(tmp_path / "postings")
    postings.write.parquet(path)
    stored = spark.read.parquet(path)
    assert _rows(T.bm25_topk(None, QS, k=5, postings=stored)) == inline


def test_build_text_index_contract(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hash JOIN hash"),
            (2, "   "),
            (3, None),
            (4, "merge"),
        ],
        "doc_id long, text string",
    )
    post = T.build_text_index(docs).collect()
    by_doc = {}
    for r in post:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # whitespace-only and NULL docs contribute no postings
    assert set(by_doc) == {1, 4}
    # terms are lowercased and tf-counted; dl == sum(tf) per doc
    d1 = {r["term"]: r["tf"] for r in by_doc[1]}
    assert d1 == {"hash": 2, "join": 1}
    assert all(r["dl"] == 3 for r in by_doc[1])
    assert sum(r["tf"] for r in by_doc[4]) == by_doc[4][0]["dl"] == 1


def test_bm25_semantics_and_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join join fast"),
            (2, "join slow"),
            (3, "spark spark spark"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = T.bm25_topk(docs, ["spark join"], k=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    # NULL-text doc never appears; all matching docs do
    assert set(rows) == {1, 2, 3}
    # doc 1 matches both terms
    assert rows[1]["n_terms"] == 2
    assert rows[2]["n_terms"] == rows[3]["n_terms"] == 1
    # ranks are contiguous from 1 and ordered by score desc, id asc
    ordered = sorted(rows.values(), key=lambda r: r["rank"])
    assert [r["rank"] for r in ordered] == [1, 2, 3]
    scores = [r["score_e4"] for r in ordered]
    assert scores == sorted(scores, reverse=True)
    # bag semantics: a repeated query term doubles its contribution
    one = {
        r["doc_id"]: r["score_e4"]
        for r in T.bm25_topk(docs, ["spark"], k=10).collect()
    }
    two = {
        r["doc_id"]: r["score_e4"]
        for r in T.bm25_topk(docs, ["spark spark"], k=10).collect()
    }
    for d, s in one.items():
        assert abs(two[d] - 2 * s) <= 1  # one floor at e6, scaled to e4
    # misses and refusals
    assert T.bm25_topk(docs, ["zzznothere"], k=5).count() == 0
    with pytest.raises(ValueError, match="at least one query"):
        T.bm25_topk(docs, [], k=5)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty"):
        T.bm25_topk(empty, ["spark"], k=5)
    # whitespace-only query contributes no rows but doesn't poison others
    mixed = T.bm25_topk(docs, ["   ", "slow"], k=5)
    assert {r["query"] for r in mixed.collect()} == {"slow"}


def test_bm25_layout_invariance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = _rows(T.bm25_topk(docs, QS[:2], k=5))
    assert _rows(T.bm25_topk(docs.repartition(7), QS[:2], k=5)) == base
    assert _rows(T.bm25_topk(docs.coalesce(1), QS[:2], k=5)) == base


def test_bm25_plan_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        T.bm25_topk(docs, QS, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the query-term probe and the per-term stats broadcast into the
    # postings scan; the rank cut pushes k into the window
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_bm25_max_df_ratio_prunes_stopwords(spark):
    docs = spark.createDataFrame(
        [
            (1, "the spark engine"),
            (2, "the slow planner"),
            (3, "the the the"),
            (4, "the fast executor"),
        ],
        "doc_id long, text string",
    )
    full = {
        r["doc_id"]: r for r in T.bm25_topk(docs, ["the spark"], k=10)
        .collect()
    }
    pruned = {
        r["doc_id"]: r
        for r in T.bm25_topk(
            docs, ["the spark"], k=10, max_df_ratio=0.5
        ).collect()
    }
    # unpruned: every doc matches 'the'
    assert set(full) == {1, 2, 3, 4}
    # pruned: 'the' (df=4/4 > 0.5) is dropped — only the 'spark' doc
    # survives, and its score counts one matched term
    assert set(pruned) == {1}
    assert pruned[1]["n_terms"] == 1 and pruned[1]["rank"] == 1
    # a pruned-term-only query returns nothing rather than erroring
    assert T.bm25_topk(docs, ["the"], k=5, max_df_ratio=0.5).count() == 0
    # ratio 1.0 keeps everything (df <= N)
    kept = {
        r["doc_id"]
        for r in T.bm25_topk(
            docs, ["the spark"], k=10, max_df_ratio=1.0
        ).collect()
    }
    assert kept == set(full)


def test_phrase_topk_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a"),
            (2, "a b a b"),
            (3, "b a"),
            (4, "A  B"),
            (5, None),
            (6, "c"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["phrase"], r["doc_id"]): r["n_hits"]
        for r in T.phrase_topk(
            docs, ["a b", "a a", "b a", "a", "zzz qqq"], k=10
        ).collect()
    }
    # adjacency with case folding and multi-space split
    assert out[("a b", 2)] == 2
    assert out[("a b", 4)] == 1
    # overlapping matches both count; repeated-term phrase needs each
    # offset witnessed independently
    assert out[("a a", 1)] == 2
    assert ("a a", 2) not in out
    assert out[("b a", 2)] == 1 and out[("b a", 3)] == 1
    # single-term phrase == term frequency
    assert out[("a", 1)] == 3 and out[("a", 2)] == 2
    # miss phrase yields no rows
    assert not any(p == "zzz qqq" for p, _ in out)
    with pytest.raises(ValueError, match="at least one"):
        T.phrase_topk(docs, [])


def test_phrase_topk_matches_duckdb_and_prebuilt(spark, sf_dir):
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    PH = ["order fast", "window join stream", "order order"]
    inline = sorted(tuple(r) for r in T.phrase_topk(docs, PH, k=6).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(T.phrase_topk_oracle(PH, k=6)).fetchall()
    )
    assert inline == want and len(inline) > 0
    pos = T.build_positional_index(docs)
    assert sorted(
        tuple(r) for r in T.phrase_topk(None, PH, k=6, postings=pos)
        .collect()
    ) == inline
    # ranks contiguous per phrase
    by_phrase = {}
    for ph, _d, _n, rk in inline:
        by_phrase.setdefault(ph, []).append(rk)
    for rks in by_phrase.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_collocations_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "new york new york city"),
            (2, "new shoes and york minster"),
            (3, "a b"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi_e6"], r["rank"])
        for r in T.collocations(docs, k=10, min_count=2).collect()
    }
    # unigram totals: new=3, york=3, city=1, shoes=1, and=1, minster=1,
    # a=1, b=1 -> U=12; bigrams: doc1 has 4, doc2 has 4, doc3 has 1 ->
    # B=9; ('new','york') count 2
    assert set(out) == {("new", "york")}
    n_pair, pmi_e6, rank = out[("new", "york")]
    assert n_pair == 2 and rank == 1
    want = (
        math.log(2.0) + math.log(12.0) + math.log(12.0)
        - math.log(9.0) - math.log(3.0) - math.log(3.0)
    )
    assert pmi_e6 == math.floor(want * 1e6)
    # refusals: empty corpus / no 2-token docs
    import pytest as _pt

    empty = spark.createDataFrame([], "doc_id long, text string")
    with _pt.raises(ValueError, match="non-empty"):
        T.collocations(empty)
    singles = spark.createDataFrame(
        [(1, "one"), (2, "two")], "doc_id long, text string"
    )
    with _pt.raises(ValueError, match="2-token"):
        T.collocations(singles)


def test_collocations_matches_duckdb(spark, sf_dir):
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [tuple(r) for r in T.collocations(docs, k=20, min_count=5).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = [
        tuple(r)
        for r in con.execute(
            T.collocations_oracle(k=20, min_count=5)
        ).fetchall()
    ]
    assert got == want and len(got) == 20


def test_keyword_snippets(spark, sf_dir):
    import duckdb

    # hand-checked window clipping at both edges
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "beta"), (3, None)],
        "doc_id long, text string",
    )
    out = {
        (r["term"], r["doc_id"], r["pos"]): (r["snippet"], r["rank"])
        for r in T.keyword_snippets(docs, ["beta", "Epsilon"], window=2)
        .collect()
    }
    assert out[("beta", 1, 1)] == ("alpha beta gamma delta", 1)
    assert out[("beta", 2, 0)] == ("beta", 2)
    assert out[("epsilon", 1, 4)] == ("gamma delta epsilon", 1)
    with pytest.raises(ValueError, match="at least one"):
        T.keyword_snippets(docs, ["  "])

    # DuckDB parity + top-k cut on real data
    real = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in T.keyword_snippets(
            real, ["hash", "window"], window=3, k=10
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            T.keyword_snippets_oracle(["hash", "window"], window=3, k=10)
        ).fetchall()
    )
    assert got == want
    assert 0 < len(got) <= 20


def test_expand_queries_prf(spark):
    """RM3-lite expansion (r11): feedback terms come from the top
    docs, exclude the original query's own terms, and the expanded
    query retrieves co-occurrence neighbors the original missed."""
    docs = spark.createDataFrame(
        [
            (1, "red apple fruit basket"),
            (2, "apple orchard harvest"),
            (3, "banana plantation yellow"),
            (4, "red paint bucket"),
        ],
        "doc_id long, text string",
    )
    exp = {
        r["query"]: (r["expanded_query"], r["added_terms"])
        for r in T.expand_queries(
            docs, ["red"], n_docs=2, n_terms=2
        ).collect()
    }
    expanded, added = exp["red"]
    # expansion keeps the original query as a prefix and never
    # re-adds its own terms
    assert expanded.startswith("red ")
    assert "red" not in added and len(added) == 2
    # every added term really occurs in the feedback docs (1 and 4)
    fb_terms = {"apple", "fruit", "basket", "paint", "bucket"}
    assert set(added) <= fb_terms
    # the expanded query reaches a doc the original could not: doc 2
    # shares no term with "red" but co-occurs with its feedback terms
    before = {r["doc_id"] for r in T.bm25_topk(docs, ["red"], k=4)
              .collect()}
    after = {r["doc_id"] for r in T.bm25_topk(docs, [expanded], k=4)
             .collect()}
    assert 2 not in before
    if "apple" in added:
        assert 2 in after
    # a query with no matches expands to itself
    none = T.expand_queries(docs, ["zzzmiss"], n_docs=2).collect()[0]
    assert none["expanded_query"] == "zzzmiss"
    assert none["added_terms"] == []
    # deterministic under repartition
    again = {
        r["query"]: (r["expanded_query"], r["added_terms"])
        for r in T.expand_queries(
            docs.repartition(5), ["red"], n_docs=2, n_terms=2
        ).collect()
    }
    assert again == exp


def test_bm25_prebuilt_stats_path(spark, sf_dir):
    from etl_workflow_spark.operators.text import _bm25_index_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings = T.build_text_index(docs)
    stats = _bm25_index_stats(postings, "doc_id")
    assert stats[0] > 0 and stats[1] > stats[0]
    base = _rows(T.bm25_topk(None, QS[:2], k=5, postings=postings))
    injected = _rows(
        T.bm25_topk(None, QS[:2], k=5, postings=postings, stats=stats)
    )
    assert injected == base


def test_search_pipeline_end_to_end(spark, sf_dir):
    """The full retrieval composition a user runs: build the postings
    index once → BM25 → PRF expansion → second BM25 pass → fuse with
    dense cosine → MMR diversify → score against judgments. Each stage
    is hash/oracle-checked elsewhere; this test pins the CONTRACTS
    between them (column names, id spaces, determinism end-to-end)."""
    from etl_workflow_spark.operators.ranking import (
        mmr_rerank, retrieval_metrics, rrf_fuse,
    )
    from etl_workflow_spark.operators.text import (
        _bm25_index_stats, build_text_index, expand_queries,
        hashed_tfidf_vectors,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    postings = build_text_index(docs)
    stats = _bm25_index_stats(postings, "doc_id")

    def run_pipeline():
        exp = expand_queries(
            None, ["hash join"], n_docs=3, n_terms=3, postings=postings
        ).collect()[0]
        sparse = T.bm25_topk(
            None, [exp["expanded_query"]], k=20, postings=postings,
            stats=stats,
        ).select(F.lit("q").alias("query"), "doc_id", "rank")
        vecs = hashed_tfidf_vectors(docs, dim=64)
        from etl_workflow_spark.operators.similarity import (
            brute_force_topk,
        )

        dense = brute_force_topk(
            vecs.withColumnRenamed("doc_id", "vec_id"),
            vecs.where("doc_id = 7").withColumnRenamed(
                "doc_id", "query_id"
            ),
            k=20,
        ).select(
            F.lit("q").alias("query"),
            F.col("neighbor_id").alias("doc_id"),
            "rank",
        )
        fused = rrf_fuse([sparse, dense], k=12).select(
            "query", "doc_id",
            F.expr("rrf_e6 div 100").alias("score_e4"), "rank",
        )
        final = mmr_rerank(fused, vecs, k=8, lam=0.7)
        return exp["expanded_query"], [
            (r["doc_id"], r["rank"]) for r in final.orderBy("rank")
            .collect()
        ]

    q1, order1 = run_pipeline()
    q2, order2 = run_pipeline()
    # deterministic end to end
    assert q1 == q2 and order1 == order2
    assert 0 < len(order1) <= 8
    assert [rk for _, rk in order1] == list(range(1, len(order1) + 1))
    # the diversified list is scoreable against judgments
    qrels = spark.createDataFrame(
        [("q", d, 1) for d, _ in order1[:3]],
        "query string, doc_id long, rel int",
    )
    final_df = spark.createDataFrame(
        [("q", d, r) for d, r in order1],
        "query string, doc_id long, rank int",
    )
    m = retrieval_metrics(final_df, qrels, k=8).collect()[0]
    assert m["n_hit"] == 3 and m["ndcg_e6"] > 0


def test_bm25_pruned_equals_exhaustive(spark, sf_dir):
    """r14 MaxScore pruning: bm25_topk_pruned returns ROW-IDENTICAL
    results to the exhaustive ranker — on the testdata corpus across
    multi-term / rare-term / hot-term queries, at small and large k,
    with and without max_df_ratio, and on a hand-built hot-term corpus
    where the pruning provably collapses the candidate set."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # include a corpus-hot term alongside rare ones: 'the' floods,
    # the rare terms seed a high threshold
    qs = QS + ["the zzzmiss", "the"]
    for kk in (3, 10):
        assert _rows(T.bm25_topk_pruned(docs, qs, k=kk)) == _rows(
            T.bm25_topk(docs, qs, k=kk)
        )
    assert _rows(
        T.bm25_topk_pruned(docs, qs, k=5, max_df_ratio=0.5)
    ) == _rows(T.bm25_topk(docs, qs, k=5, max_df_ratio=0.5))
    # prebuilt postings path
    postings = T.build_text_index(docs)
    assert _rows(
        T.bm25_topk_pruned(None, QS, k=5, postings=postings)
    ) == _rows(T.bm25_topk(docs, QS, k=5))

    # hand-built hot-term corpus: 'common' in every doc, 'rare' in 3;
    # with k=2 the rare-term partial threshold makes 'common'
    # non-essential, so common-only docs cannot rank — and the pruned
    # results still equal the exhaustive ones exactly
    rows = [(i, "common filler number %d" % i) for i in range(1, 98)]
    rows += [(101, "rare common topic"), (102, "rare common subject"),
             (103, "rare common matter")]
    hot = spark.createDataFrame(rows, "doc_id long, text string")
    assert _rows(T.bm25_topk_pruned(hot, ["rare common"], k=2)) == _rows(
        T.bm25_topk(hot, ["rare common"], k=2)
    )
    # single-hot-term query: its one term is always essential — no
    # pruning possible, results still exact
    assert _rows(T.bm25_topk_pruned(hot, ["common"], k=4)) == _rows(
        T.bm25_topk(hot, ["common"], k=4)
    )
    with pytest.raises(ValueError, match="at least one query"):
        T.bm25_topk_pruned(hot, [])
    with pytest.raises(ValueError, match="needs df or postings"):
        T.bm25_topk_pruned(None, ["x"])
