"""Metamorphic layout-invariance sweep: a deterministic operator must
produce IDENTICAL results regardless of the input's physical
partitioning. This is the bug class that keeps appearing at scale
(range-sampling drift in ranking, shard-membership drift in the
sharded shuffle — both caught in round 6): small inputs mask it, so
every operator claiming determinism gets the same two-layout check.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_workflow_spark.catalog import table


def _collect_sorted(df):
    cols = df.columns
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


def _big_frame(spark):
    # deterministic pseudo-random values; big enough that the range
    # exchange samples instead of sketching every row
    return spark.range(25_000).select(
        F.col("id"), F.pmod(F.xxhash64("id"), F.lit(1000)).alias("v")
    )


OPERATORS = {
    "exact_dedup": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.dedup", fromlist=["exact_dedup"]
    ).exact_dedup(docs),
    "minhash_lsh_pairs": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.dedup", fromlist=["minhash_lsh_pairs"]
    ).minhash_lsh_pairs(docs, threshold=0.4),
    "ngram_jaccard_pairs": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.dedup", fromlist=["ngram_jaccard_pairs"]
    ).ngram_jaccard_pairs(docs, threshold=0.4),
    "simhash": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.dedup", fromlist=["simhash"]
    ).simhash(docs),
    "dedup_paragraphs": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.dedup", fromlist=["dedup_paragraphs"]
    ).dedup_paragraphs(docs, sep=" "),
    "text_profile": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.text", fromlist=["text_profile"]
    ).text_profile(docs),
    "tfidf_top_terms": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.text", fromlist=["tfidf_top_terms"]
    ).tfidf_top_terms(docs, k=3),
    "chunk_documents": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.chunking", fromlist=["chunk_documents"]
    ).chunk_documents(docs, chunk_tokens=16),
    "deterministic_sample": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.sampling",
        fromlist=["deterministic_sample"],
    ).deterministic_sample(docs, 0.3),
    "brute_force_topk": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.similarity",
        fromlist=["brute_force_topk"],
    ).brute_force_topk(
        emb, emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id"),
        k=3,
    ),
    # ranking ops get a 25k-row frame: range-exchange SAMPLING (the
    # round-6 bug source) only engages once partitions exceed the
    # reservoir size, which 500 docs never reach
    "distributed_ntile": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.ranking", fromlist=["distributed_ntile"]
    ).distributed_ntile(
        _big_frame(s),
        [F.desc("v"), F.asc("id")],
        7,
    ),
    "select_prefix_by_budget": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.ranking",
        fromlist=["select_prefix_by_budget"],
    ).select_prefix_by_budget(
        _big_frame(s),
        [F.desc("v"), F.asc("id")],
        "v",
        budget=500_000,
    ),
    "lm_score": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.text", fromlist=["ngram_lm_score"]
    ).ngram_lm_score(
        docs,
        __import__(
            "etl_workflow_spark.operators.text", fromlist=["ngram_lm_counts"]
        ).ngram_lm_counts(docs, n=2),
        n=2,
    ),
    "corpus_containment": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.text", fromlist=["corpus_containment"]
    ).corpus_containment(
        docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")
    ),
    "strip_html": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.text", fromlist=["strip_html"]
    ).strip_html(docs),
    "per_group_sample": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.sampling", fromlist=["per_group_sample"]
    ).per_group_sample(docs, ["lang"], k=7),
    "funnel": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.temporal", fromlist=["funnel"]
    ).funnel(
        __import__(
            "etl_workflow_spark.catalog", fromlist=["events_table"]
        ).events_table(s, d),
        ["view", "click", "purchase"],
    ),
    "retention_cohorts": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.temporal",
        fromlist=["retention_cohorts"],
    ).retention_cohorts(
        __import__(
            "etl_workflow_spark.catalog", fromlist=["events_table"]
        ).events_table(s, d),
        "signup",
    ),
    "event_transitions": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.temporal",
        fromlist=["event_transitions"],
    ).event_transitions(
        __import__(
            "etl_workflow_spark.catalog", fromlist=["events_table"]
        ).events_table(s, d),
        tiebreak_col="event_id",
    ),
    "dedup_spans": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.dedup", fromlist=["dedup_spans"]
    ).dedup_spans(docs, min_tokens=10),
    "dedup_corpus": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.dedup", fromlist=["dedup_corpus"]
    ).dedup_corpus(docs, threshold=0.4),
    "vocab_counts": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.text", fromlist=["vocab_counts"]
    ).vocab_counts(docs, min_count=2, top_k=100),
    "quantize_embeddings": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.similarity",
        fromlist=["quantize_embeddings"],
    ).quantize_embeddings(emb),
    "quantized_topk": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.similarity",
        fromlist=["quantized_topk"],
    ).quantized_topk(
        emb, emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id"),
        k=3,
    ),
    # semdedup is deliberately NOT in this sweep: kmeans' centroid
    # update sums raw doubles (F.sum), whose accumulation order is a
    # function of partition layout — centroids can differ in last-ulp
    # across layouts, and a boundary point could flip cells. Same-seed
    # same-layout reproducibility is asserted in test_neardup instead.
    "bpe_encode": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.text", fromlist=["bpe_encode"]
    ).bpe_encode(
        docs.select("doc_id", "text"),
        __import__(
            "etl_workflow_spark.operators.text", fromlist=["train_bpe"]
        ).train_bpe(docs, num_merges=50),
    ),
    # pq_index under a FIXED model (trained from the fresh, canonical
    # layout both times — pq_fit itself samples per-layout, same
    # documented caveat as kmeans): encoding is row-local and must not
    # depend on partitioning
    "pq_index": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.similarity", fromlist=["pq_index"]
    ).pq_index(
        emb,
        __import__(
            "etl_workflow_spark.operators.similarity", fromlist=["pq_fit"]
        ).pq_fit(_emb(s, d), n_cells=4, m_sub=8, ksub=16),
    ),
    # unigram encode, sampling mode: draws are (seed, word,
    # occurrence-within-doc)-pure, so even the RANDOMIZED mode must be
    # layout-invariant (model trained from the canonical layout)
    "unigram_encode_sampled": lambda s, d, docs, emb: __import__(
        "etl_workflow_spark.operators.text", fromlist=["unigram_encode"]
    ).unigram_encode(
        docs.select("doc_id", "text"),
        __import__(
            "etl_workflow_spark.operators.text", fromlist=["train_unigram"]
        ).train_unigram(_docs(s, d), vocab_size=150),
        sample_alpha=0.3,
        seed=11,
    ),
}


@pytest.mark.parametrize("name", sorted(OPERATORS))
def test_layout_invariance(spark, sf_dir, name):
    fn = OPERATORS[name]
    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    base = _collect_sorted(fn(spark, sf_dir, docs, emb))
    shuffled = _collect_sorted(
        fn(spark, sf_dir, docs.repartition(13), emb.repartition(9))
    )
    assert base == shuffled, f"{name} is layout-dependent"
    assert base, f"{name} returned empty output — sweep is vacuous"
