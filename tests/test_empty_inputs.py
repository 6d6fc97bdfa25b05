"""Empty-input robustness: every operator must yield an empty (or
well-defined degenerate) result on a zero-row corpus, never raise —
the class of failure dedup_clusters hit on an empty pair list
(CANNOT_INFER_EMPTY_SCHEMA) before round 6 fixed it. Empty inputs are
routine in production: an idle micro-batch, a filter that matched
nothing, a new partition."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_workflow_spark.catalog import table


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_dedup_ops_on_empty_corpus(spark, empty_docs):
    from etl_workflow_spark.operators import dedup as D

    assert D.exact_dedup(empty_docs).count() == 0
    assert D.minhash_lsh_pairs(empty_docs).count() == 0
    assert D.simhash(empty_docs).count() == 0
    assert D.dedup_paragraphs(empty_docs).count() == 0
    assert D.dedup_spans(empty_docs, min_tokens=3).count() == 0
    assert D.build_lsh_index(empty_docs).count() == 0
    assert D.dedup_clusters(
        D.minhash_lsh_pairs(empty_docs), all_ids=empty_docs.select("doc_id")
    ).count() == 0


def test_text_ops_on_empty_corpus(spark, empty_docs):
    from etl_workflow_spark.operators import text as T

    assert T.text_quality(empty_docs).count() == 0
    assert T.text_profile(empty_docs).count() == 0
    assert T.tfidf_top_terms(empty_docs, k=3).count() == 0
    assert T.strip_html(empty_docs).count() == 0
    assert T.ngram_lm_score(
        empty_docs, T.ngram_lm_counts(empty_docs)
    ).count() == 0
    row = T.corpus_containment(empty_docs, empty_docs).collect()[0]
    assert (row.n_grams_b, row.n_shared, row.containment_e6) == (0, 0, None)
    assert T.vocab_counts(empty_docs).count() == 0
    empty_vocab = spark.createDataFrame([], "token string, count long")
    assert T.bpe_pair_counts(empty_vocab).count() == 0


def test_sampling_ops_on_empty_corpus(spark, empty_docs):
    from etl_workflow_spark.operators import sampling as S

    assert S.deterministic_sample(empty_docs, 0.5).count() == 0
    assert S.global_sample_k(empty_docs, 5).count() == 0
    assert S.per_group_sample(empty_docs, ["text"], 3).count() == 0
    parts = S.split_frame(empty_docs, {"a": 0.5, "b": 0.5})
    assert all(p.count() == 0 for p in parts.values())


def test_ranking_ops_on_empty_corpus(spark, empty_docs):
    from etl_workflow_spark.operators.ranking import (
        distributed_ntile,
        distributed_row_number,
        select_prefix_by_budget,
    )

    assert distributed_row_number(empty_docs, [F.asc("doc_id")]).count() == 0
    assert distributed_ntile(empty_docs, [F.asc("doc_id")], 4).count() == 0
    assert select_prefix_by_budget(
        empty_docs, [F.asc("doc_id")], "doc_id", budget=100
    ).count() == 0


def test_event_ops_on_empty_stream(spark):
    from etl_workflow_spark.operators.temporal import (
        event_transitions,
        funnel,
        retention_cohorts,
    )

    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string"
    )
    assert funnel(ev, ["view", "click"]).count() == 0
    assert retention_cohorts(ev, "signup").count() == 0
    assert event_transitions(ev).count() == 0


def test_round8_dedup_ops_on_empty_corpus(spark, empty_docs):
    from etl_workflow_spark.operators import dedup as D

    assert D.dedup_corpus(empty_docs).count() == 0
    clusters = spark.createDataFrame([], "doc_id long, cluster_id long")
    scored = empty_docs.withColumn("q", empty_docs.doc_id.cast("double"))
    assert D.keep_best_per_cluster(scored, clusters, "q").count() == 0


def test_similarity_ops_on_empty_corpus(spark):
    from etl_workflow_spark.operators import similarity as SIM

    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    one_q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, embedding array<float>"
    )
    assert SIM.quantize_embeddings(empty_emb).count() == 0
    # empty corpus, live query batch — and the mirror image
    assert SIM.quantized_topk(empty_emb, one_q, k=3).count() == 0
    assert SIM.quantized_topk(empty_emb, one_q, k=3, rerank_factor=1).count() == 0
    assert SIM.brute_force_topk(empty_emb, one_q, k=3).count() == 0
    live = spark.createDataFrame(
        [(1, [0.5, 0.5])], "vec_id long, embedding array<float>"
    )
    empty_q = spark.createDataFrame(
        [], "query_id long, embedding array<float>"
    )
    assert SIM.quantized_topk(live, empty_q, k=3).count() == 0
    # PQ tier: model trained on a live 2-dim corpus, probed with empty
    # corpus index / empty query batch
    model = SIM.pq_fit(live, n_cells=1, m_sub=2, ksub=1, sample_size=4)
    assert SIM.pq_index(empty_emb, model).count() == 0
    assert SIM.pq_topk(
        SIM.pq_index(empty_emb, model), one_q, model, empty_emb, k=3
    ).count() == 0
    live_idx = SIM.pq_index(live, model)
    assert SIM.pq_topk(live_idx, empty_q, model, live, k=3).count() == 0
    assert SIM.pq_topk(
        live_idx, empty_q, model, live, k=3, n_probe=1
    ).count() == 0


def test_round8s4_ops_on_empty_corpus(spark, empty_docs):
    """semdedup / grouped blocked pairing / BPE on zero-row inputs."""
    from etl_workflow_spark.operators import similarity as SIM
    from etl_workflow_spark.operators import text as T

    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    assert SIM.embedding_neardup_blocked(
        empty_emb, threshold=0.5, group_col="vec_id"
    ).count() == 0
    # semdedup can't cluster an empty corpus (kmeans needs >= k rows)
    # and refuses loudly rather than returning a silently empty frame
    with pytest.raises(ValueError, match="fewer than k"):
        SIM.semdedup(empty_emb, k=2, dim=2)
    model = T.learn_bpe([], num_merges=5)
    assert model["merges"] == [] and model["symbols"] == []
    out = T.bpe_encode(empty_docs, model)
    assert out.count() == 0 and "bpe_tokens" in out.columns
    # empty corpus trains an empty model end-to-end
    assert T.train_bpe(empty_docs, num_merges=5)["merges"] == []


def test_unigram_ops_on_empty_corpus(spark, empty_docs):
    from etl_workflow_spark.operators import chunking as CH
    from etl_workflow_spark.operators import text as T

    empty_ids = spark.createDataFrame(
        [], "doc_id long, token_ids array<int>"
    )
    assert CH.chunk_token_ids(empty_ids, ids_col="token_ids").count() == 0

    model = T.train_unigram(empty_docs, vocab_size=8)
    assert model["pieces"] == []
    assert T.unigram_encode(empty_docs, model).count() == 0
    assert T.unigram_logprob(empty_docs, model).count() == 0
    # an empty model still encodes live docs (every char is the
    # reserved unknown id)
    live = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    row = T.unigram_encode(live, model, ids=True).collect()[0]
    assert row["unigram_tokens"] == [0, 0]


def test_byte_fallback_unigram_on_empty_corpus(spark, empty_docs):
    """byte_fallback over an empty corpus: the model is just the 256
    reserved byte pieces; live text still encodes (everything
    byte-decomposes) and round-trips exactly; decode of empty stays
    empty and NULL stays NULL."""
    from etl_workflow_spark.operators import text as T

    model = T.train_unigram(empty_docs, vocab_size=8, byte_fallback=True)
    assert len(model["pieces"]) == 256
    live = spark.createDataFrame(
        [(1, "ab cd"), (2, None), (3, "")], "doc_id long, text string"
    )
    enc = T.unigram_encode(live, model, ids=True)
    out = {r["doc_id"]: r["text_decoded"] for r in T.unigram_decode(
        enc, model, ids=True
    ).collect()}
    assert out == {1: "ab cd", 2: None, 3: ""}


def test_imi_ops_on_empty_inputs(spark, sf_dir):
    """IMI robustness: empty query batch returns an empty top-k frame
    with the contract schema; an index over one row still answers."""
    from etl_workflow_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = S.imi_fit(emb, n_cells=4)
    one = emb.limit(2)
    idx = S.imi_index(one, model)
    q0 = emb.where("vec_id < 0").withColumnRenamed("vec_id", "query_id")
    out = S.imi_topk(idx, q0, model, one, k=3)
    assert out.columns == ["query_id", "neighbor_id", "score_e4", "rank"]
    assert out.count() == 0


def test_retrieval_tier_ops_on_empty_inputs(spark, empty_docs, sf_dir):
    """r11 retrieval tier: empty corpora either yield empty frames
    (index builders, snippet/metric joins) or refuse with the
    DOCUMENTED ValueError (ops whose semantics need a non-empty
    corpus-level denominator) — never an opaque engine error."""
    from etl_workflow_spark.operators import text as T
    from etl_workflow_spark.operators.ranking import (
        retrieval_metrics, rrf_fuse,
    )

    # index builders: empty in, empty out
    assert T.build_text_index(empty_docs).count() == 0
    assert T.build_positional_index(empty_docs).count() == 0
    # queries against an empty index: documented refusal (bm25 needs
    # N > 0) / empty result (phrase, snippets — no denominators)
    with pytest.raises(ValueError, match="empty"):
        T.bm25_topk(empty_docs, ["spark"], k=5)
    assert T.phrase_topk(empty_docs, ["a b"], k=5).count() == 0
    assert T.keyword_snippets(empty_docs, ["spark"]).count() == 0
    # statistics ops: documented refusals (corpus-level denominators)
    with pytest.raises(ValueError, match="non-empty"):
        T.collocations(empty_docs)
    with pytest.raises(ValueError, match="non-empty"):
        T.corpus_drift(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            empty_docs,
        )
    # vector / tokenizer builders: empty in, empty out
    assert T.hashed_tfidf_vectors(empty_docs, dim=8).count() == 0
    model = {
        "format": "spark-graft-wordpiece/v1",
        "vocab": ["[UNK]", "a", "##a"],
        "lowercase": True,
        "unk": "[UNK]",
        "max_input_chars_per_word": 100,
    }
    assert T.wordpiece_encode(empty_docs, model).count() == 0
    # fusion / evaluation over empty ranked lists
    empty_ranked = spark.createDataFrame(
        [], "query string, doc_id long, rank int"
    )
    assert rrf_fuse([empty_ranked, empty_ranked], k=5).count() == 0
    empty_qrels = spark.createDataFrame(
        [], "query string, doc_id long, rel int"
    )
    assert retrieval_metrics(empty_ranked, empty_qrels).count() == 0


def test_r12_text_ops_on_empty_corpus(spark, empty_docs):
    from etl_workflow_spark.operators import text as T

    assert T.gopher_quality_flags(empty_docs).count() == 0
    assert T.c4_line_filter(empty_docs).count() == 0
    assert T.normalize_text(empty_docs).count() == 0
    assert T.compression_ratio(empty_docs).count() == 0
    # lm_score with a usable model but an empty scored corpus
    uni = spark.createDataFrame([("a", 1)], "token string, count long")
    big = spark.createDataFrame(
        [("a", "a", 1)], "w1 string, w2 string, n_pair long"
    )
    assert T.lm_score(empty_docs, unigrams=uni, bigrams=big).count() == 0
    # keyword snippets / drift need non-empty semantics checks
    assert T.keyword_snippets(empty_docs, ["x"]).count() == 0
    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        T.corpus_drift(empty_docs, empty_docs, buckets=8)
    with _pt.raises(ValueError, match="non-empty unigram"):
        T.lm_score(empty_docs)


def test_r12_sampling_and_sketch_ops_on_empty(spark, empty_docs):
    import pytest as _pt

    from etl_workflow_spark.operators import sampling as S
    from etl_workflow_spark.operators.sketches import (
        histogram_drift, value_histogram_sketch,
    )

    lang_docs = spark.createDataFrame([], "doc_id long, lang string")
    with _pt.raises(ValueError, match="non-null"):
        S.temperature_mixture(lang_docs, "lang")
    # empty numeric side: the ungrouped sketch is one degenerate row
    # (global agg of nothing — n reports empty), and drift refuses on
    # the zero totals rather than emitting garbage
    vals = spark.createDataFrame([], "id long, v double")
    row = value_histogram_sketch(vals, "v").collect()
    assert len(row) == 1 and not row[0]["n"]
    with _pt.raises(ValueError, match="non-empty"):
        histogram_drift(
            value_histogram_sketch(vals, "v"),
            value_histogram_sketch(vals, "v"),
        )


def test_r13_image_neardup_on_empty_payloads(spark):
    from etl_workflow_spark.operators import multimodal as M

    empty = spark.createDataFrame([], "doc_id long, payload binary")
    assert M.dhash_media(empty).count() == 0
    assert M.image_neardup_pairs(empty).count() == 0


def test_r13_backoff_lm_on_empty_corpus(spark, empty_docs):
    from etl_workflow_spark.operators import text as T

    uni = spark.createDataFrame([("a", 1)], "token string, count long")
    big = spark.createDataFrame(
        [("a", "a", 1)], "w1 string, w2 string, n_pair long"
    )
    tri = spark.createDataFrame(
        [], "w1 string, w2 string, w3 string, n_tri long"
    )
    assert T.adjacent_trigram_counts(empty_docs).count() == 0
    assert T.lm_score_backoff(
        empty_docs, unigrams=uni, bigrams=big, trigrams=tri
    ).count() == 0


def test_r13_dedup_images_on_empty_payloads(spark):
    from etl_workflow_spark.operators import multimodal as M

    empty = spark.createDataFrame([], "doc_id long, payload binary")
    assert M.dedup_images(empty).count() == 0


def test_r13_phash_on_empty_payloads(spark):
    from etl_workflow_spark.operators import multimodal as M

    empty = spark.createDataFrame([], "doc_id long, payload binary")
    assert M.phash_media(empty).count() == 0
    assert M.image_neardup_pairs(empty, method="phash").count() == 0


def test_r13_kn_lm_on_empty_corpus(spark, empty_docs):
    from etl_workflow_spark.operators import text as T

    uni = spark.createDataFrame([("a", 1)], "token string, count long")
    big = spark.createDataFrame(
        [("a", "a", 1)], "w1 string, w2 string, n_pair long"
    )
    assert T.lm_score_kn(
        empty_docs, unigrams=uni, bigrams=big
    ).count() == 0


def test_r13_backoff_n_on_empty_corpus(spark, empty_docs):
    from etl_workflow_spark.operators import text as T

    counts = {
        1: spark.createDataFrame([("a", 1)], "token string, count long"),
        2: spark.createDataFrame(
            [("a", "a", 1)], "w1 string, w2 string, n_gram long"
        ),
        3: spark.createDataFrame(
            [], "w1 string, w2 string, w3 string, n_gram long"
        ),
        4: spark.createDataFrame(
            [],
            "w1 string, w2 string, w3 string, w4 string, n_gram long",
        ),
    }
    assert T.adjacent_ngram_counts(empty_docs, 4).count() == 0
    assert T.lm_score_backoff_n(
        empty_docs, order=4, counts=counts
    ).count() == 0


def test_r14_video_neardup_on_empty_payloads(spark):
    from etl_workflow_spark.operators import multimodal as M

    empty = spark.createDataFrame([], "doc_id long, payload binary")
    assert M.video_neardup_pairs(empty).count() == 0
    assert M.dedup_videos(empty).count() == 0


def test_r14_audio_fingerprint_on_empty_payloads(spark):
    from etl_workflow_spark.operators import multimodal as M

    empty = spark.createDataFrame([], "doc_id long, payload binary")
    assert M.audio_fingerprint(empty).count() == 0
    assert M.audio_neardup_pairs(empty).count() == 0
    assert M.dedup_audio(empty).count() == 0


def test_r14_frame_decontamination_on_empty_inputs(spark):
    from etl_workflow_spark.operators import multimodal as M

    empty = spark.createDataFrame([], "doc_id long, payload binary")
    bench = spark.createDataFrame(
        [(bytearray(b"clip"),)], "payload binary"
    )
    assert M.decontaminate_videos(empty, bench).count() == 0
    assert M.decontaminate_audio(empty, bench).count() == 0
    # empty BENCHMARK drops nothing
    docs = spark.createDataFrame(
        [(1, bytearray(b"clip"))], "doc_id long, payload binary"
    )
    ebench = spark.createDataFrame([], "payload binary")
    assert M.decontaminate_videos(docs, ebench).count() == 1
    assert M.decontaminate_audio(docs, ebench).count() == 1


def test_r14_audio_quality_on_empty_payloads(spark):
    from etl_workflow_spark.operators import multimodal as M

    empty = spark.createDataFrame([], "doc_id long, payload binary")
    assert M.audio_quality(empty).count() == 0
