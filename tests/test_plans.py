"""Plan-shape tests: the 100 TB questions, asserted.

Each test encodes a scale invariant: filters reach the parquet scan,
dims broadcast instead of shuffling the fact, scans prune columns,
and aggregations don't shuffle more than once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_workflow_spark import plans
from etl_workflow_spark import queries as Q


def test_product_sales_pushes_date_and_status_filters(spark, sf_dir):
    df = Q.product_sales(spark, sf_dir)
    # status + date-range predicates must reach the orders scan.
    assert plans.has_pushed_filters(df, "o_orderstatus", "o_orderdate")


def test_top_selling_broadcasts_part_dim(spark, sf_dir):
    df = Q.top_selling_by_category(spark, sf_dir)
    assert plans.uses_broadcast_join(df)


def test_top_selling_prunes_columns(spark, sf_dir):
    df = Q.top_selling_by_category(spark, sf_dir)
    schemas = plans.scan_read_schemas(df)
    # lineitem scan must not read l_shipdate/l_tax etc. (6 needed cols).
    li = [s for s in schemas if "l_orderkey" in s]
    assert li and "l_shipdate" not in li[0] and "l_tax" not in li[0]
    # orders scan: only key + status (+optional date filter cols).
    o = [s for s in schemas if "o_orderkey" in s]
    assert o and "o_totalprice" not in o[0] and "o_custkey" not in o[0]


def test_customer_history_pushes_point_filter(spark, sf_dir):
    df = Q.customer_purchase_history(spark, sf_dir, customer_id=7)
    assert plans.has_pushed_filters(df, "o_custkey")


def test_lifetime_value_single_shuffle_for_agg(spark, sf_dir):
    import __spark_entry__ as m

    df = m.queries()["lifetime_value"](spark, sf_dir)
    # one exchange for the orders agg; the customer join broadcasts
    # (post-agg side is small) — no second full shuffle of customers.
    assert plans.count_exchanges(df) <= 2
    assert plans.count_broadcasts(df) >= 1


def test_sales_trends_broadcasts_calendar(spark, sf_dir):
    df = Q.sales_trends(spark, sf_dir)
    assert plans.uses_broadcast_join(df)


def test_fused_corpus_entries_scan_once(spark, sf_dir):
    """The training-mix rollup and the quality funnel are FUSED
    single-projection pipelines: exactly one corpus scan, no joins.
    Three joined operators would read the corpus three times — at
    100 TB the scan count is the query cost."""
    import __spark_entry__ as m

    for name in ("lang_quality_rollup", "quality_filtered_stats"):
        df = m.queries()[name](spark, sf_dir)
        plan = plans.physical_plan(df)
        assert plan.count("FileScan parquet") == 1, name
        assert "Join" not in plan, name


def test_partitioned_facts_prune_by_year(spark, sf_dir, tmp_path):
    """The warehouse writes facts partitioned by order year (the
    reference's RANGE-partition analog, database-schema.sql:109-116);
    a year predicate must prune to that year's directory — at 100 TB
    the difference between scanning one year and scanning the table."""
    import os

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.sources.writers import write_partitioned

    orders = table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, "order_year")

    pruned = spark.read.parquet(path).where("order_year = 1995")
    plan = plans.physical_plan(pruned)
    # partition filter present, and the scan touches one partition dir
    assert "order_year" in plan and "PartitionFilters" in plan
    years = {
        r["order_year"] for r in pruned.select("order_year").distinct().collect()
    }
    assert years == {1995}
    dirs = [d for d in os.listdir(path) if d.startswith("order_year=")]
    assert len(dirs) > 1  # pruning is meaningful: several partitions exist


def test_minhash_lsh_broadcast_is_count_gated(spark, sf_dir):
    """The candidate set of a near-dup-heavy corpus is NOT small — a
    forced broadcast of it OOMs executors exactly when dedup matters.
    The broadcast hint must be gated on the measured candidate count:
    above the limit the plan carries no hint (AQE may still broadcast
    if it measures small), under it the hint is applied.
    """
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import dedup as D

    docs = table(spark, sf_dir, "documents")

    # materialize=False: plan inspection needs the LAZY frame (the
    # default eagerly checkpoints, collapsing the plan to a LogicalRDD)
    over = D.minhash_lsh_pairs(
        docs, threshold=0.5, broadcast_pairs_limit=0, materialize=False
    )
    analyzed = over._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed

    under = D.minhash_lsh_pairs(docs, threshold=0.5, materialize=False)
    analyzed = under._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in analyzed
    # both paths emit identical pairs — the hint is advisory only
    assert sorted(map(tuple, over.collect())) == sorted(map(tuple, under.collect()))
    spark.catalog.clearCache()  # release the lazy frames' candidate persists


def test_dedup_exact_prunes_to_needed_columns(spark, sf_dir):
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import dedup as D

    df = D.exact_dedup(table(spark, sf_dir, "documents"))
    schemas = plans.scan_read_schemas(df)
    assert schemas and "lang" not in schemas[0] and "source" not in schemas[0]

def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Co-located bucketed tables must merge-join with zero exchanges
    (the bucketing contract a 100 TB fact-fact join relies on)."""
    from etl_workflow_spark.sources.writers import write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", num_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        assert plans.count_exchanges(joined) == 0
        assert "SortMergeJoin" in plans.physical_plan(joined)
        # and the result is still correct
        plain = orders.join(lineitem, "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_skips_exchange(spark):
    """groupBy on the bucket key must reuse the bucket partitioning."""
    agg = (
        spark.table("b_lineitem")
        .groupBy("o_orderkey")
        .count()
    )
    assert plans.count_exchanges(agg) == 0


def test_asof_join_has_no_nested_loop(spark, sf_dir):
    """A raw range-condition join would plan BroadcastNestedLoop; the
    union+window as-of must not."""
    import __spark_entry__ as m

    df = m.queries()["asof_attribution"](spark, sf_dir)
    p = plans.physical_plan(df)
    assert "NestedLoop" not in p and "CartesianProduct" not in p


def test_interval_join_has_no_nested_loop(spark, sf_dir):
    import __spark_entry__ as m

    df = m.queries()["interval_join_sessions"](spark, sf_dir)
    p = plans.physical_plan(df)
    assert "NestedLoop" not in p and "CartesianProduct" not in p


def test_top_per_brand_broadcasts_dim_single_agg_shuffle(spark, sf_dir):
    import __spark_entry__ as m

    df = m.queries()["top_per_brand"](spark, sf_dir)
    assert plans.count_broadcasts(df) >= 1
    # one exchange for the (brand, part) agg + one for the rank window
    assert plans.count_exchanges(df) <= 2


def test_chunking_is_shuffle_free(spark, sf_dir):
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.chunking import chunk_documents

    df = chunk_documents(table(spark, sf_dir, "documents"), chunk_tokens=32)
    assert plans.count_exchanges(df) == 0
    schemas = plans.scan_read_schemas(df)
    assert schemas and "lang" not in schemas[0]  # column pruning


def test_sampling_is_shuffle_free_pushdown(spark, sf_dir):
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.sampling import deterministic_sample

    df = deterministic_sample(table(spark, sf_dir, "documents"), rate=0.2)
    assert plans.count_exchanges(df) == 0


def test_lsh_probe_broadcasts_batch_index_side_never_shuffles(spark, sf_dir):
    """The incremental probe's scale contract: the (small) new batch is
    the broadcast side of the band join, so the corpus index side
    carries no shuffle exchange before the join."""
    from pyspark.sql import functions as F

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.dedup import build_lsh_index, minhash_lsh_probe
    from etl_workflow_spark.plans import physical_plan

    docs = table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 25 == 0)
    corpus = docs.where(F.col("doc_id") % 25 != 0)
    idx = build_lsh_index(corpus)

    out = minhash_lsh_probe(new, corpus, index=idx, threshold=0.4,
                            materialize=False)
    plan = physical_plan(out)
    assert "BroadcastHashJoin" in plan
    # candidate generation must never fall back to a nested loop
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_probe_fallback_reads_bucketed_index_in_place(spark, sf_dir):
    """Bulk-backfill path (batch too big to broadcast): a (band, bucket)-
    bucketed index must join without its own exchange — only the batch
    side moves. Asserted as strictly fewer shuffles than the same probe
    over a plain (unbucketed) index."""
    from pyspark.sql import functions as F

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.dedup import build_lsh_index, minhash_lsh_probe
    from etl_workflow_spark.plans import count_exchanges
    from etl_workflow_spark.sources.writers import write_bucketed

    docs = table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 25 == 0)
    corpus = docs.where(F.col("doc_id") % 25 != 0)

    plain_idx = build_lsh_index(corpus)
    write_bucketed(plain_idx, "lsh_idx_bucketed", ["band", "bucket"],
                   num_buckets=8)
    bucketed_idx = spark.table("lsh_idx_bucketed")

    # broadcast_rows_limit=0 forces the non-broadcast fallback
    plain = minhash_lsh_probe(new, corpus, index=plain_idx,
                              threshold=0.4, broadcast_rows_limit=0,
                              materialize=False)
    bucketed = minhash_lsh_probe(new, corpus, index=bucketed_idx,
                                 threshold=0.4, broadcast_rows_limit=0,
                                 materialize=False)
    assert count_exchanges(bucketed) < count_exchanges(plain)
    # and the two paths agree on the result
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_gram_partials_single_pass_no_shuffle(spark, sf_dir):
    """PCA's fit pass must scan the vectors once with ZERO exchanges:
    partials are per-partition, the only data movement is the bounded
    collect of one row per partition."""
    from etl_workflow_spark.operators.similarity import gram_partials

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    parts = gram_partials(emb, dim=64)
    assert plans.count_exchanges(parts) == 0
    # and the scan must prune to the embedding column only
    schemas = plans.scan_read_schemas(parts)
    assert any("embedding" in s and "label" not in s for s in schemas)


def test_histogram_sketch_two_agg_shuffles_pruned_scan(spark, sf_dir):
    """The histogram build is two hash aggregations (bucket cells,
    then per-group maps) — no more; and the fact scan reads only the
    value and date columns."""
    from etl_workflow_spark.operators.sketches import value_histogram_sketch

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = value_histogram_sketch(li, "l_extendedprice", ts_col="l_shipdate")
    assert plans.count_exchanges(sk) <= 2
    schemas = plans.scan_read_schemas(sk)
    assert any(
        "l_extendedprice" in s and "l_orderkey" not in s for s in schemas
    )


def test_histogram_month_rollup_from_daily_store(spark, sf_dir, tmp_path):
    """Coarser rollups come from the STORE, not the facts: day→month
    via merge_histogram_rows on a derived month key must equal
    month histograms built from the raw facts."""
    from etl_workflow_spark.operators.sketches import (
        merge_histogram_rows,
        value_histogram_sketch,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    daily = value_histogram_sketch(li, "l_extendedprice", ts_col="l_shipdate")
    monthly_from_store = merge_histogram_rows(
        daily.withColumn("month", F.date_trunc("month", "date").cast("date")),
        keys=["month"],
    )
    monthly_direct = value_histogram_sketch(
        li.withColumn(
            "month", F.date_trunc("month", "l_shipdate").cast("date")
        ),
        "l_extendedprice",
        group_cols=["month"],
    )
    got = {
        r.month: (dict(r.bins), r.n) for r in monthly_from_store.collect()
    }
    want = {r.month: (dict(r.bins), r.n) for r in monthly_direct.collect()}
    assert got == want and len(got) > 12


def test_event_transitions_two_shuffles_pruned_scan(spark, sf_dir):
    """One hash shuffle for the per-user window, one for the (from,to)
    rollup — no more; the scan reads only the three needed columns
    plus the tiebreak."""
    from etl_workflow_spark.operators.temporal import event_transitions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = event_transitions(ev, tiebreak_col="event_id")
    assert plans.count_exchanges(df) <= 2
    schemas = plans.scan_read_schemas(df)
    assert any("user_id" in s and "props" not in s for s in schemas)


def test_retention_shuffles_distinct_user_periods_only(spark, sf_dir):
    """The activity side deduplicates to (user, period) BEFORE the
    cohort join (the shuffle carries distinct user-periods, not
    events), and the scan prunes to the three needed columns."""
    from etl_workflow_spark.operators.temporal import retention_cohorts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = retention_cohorts(ev, cohort_event="signup", grain="week")
    plan = plans.physical_plan(df)
    # the distinct aggregate must sit below the join
    assert plan.index("HashAggregate") < plan.index("Join")
    schemas = plans.scan_read_schemas(df)
    assert any("user_id" in s and "props" not in s for s in schemas)
    assert plans.count_exchanges(df) <= 5


def test_dedup_spans_prunes_scan_and_joins_on_window_hash(spark, sf_dir):
    """The span-dedup scan reads only (doc_id, text); the
    duplicate-window probe joins on whash — the key its aggregation
    just shuffled on."""
    from etl_workflow_spark.operators.dedup import dedup_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = dedup_spans(docs, min_tokens=20)
    schemas = plans.scan_read_schemas(df)
    assert any(
        "doc_id" in s and "text" in s and "lang" not in s for s in schemas
    )


def test_quantized_topk_scan_prunes_to_int8_and_broadcasts_queries(
    spark, sf_dir, tmp_path
):
    """The int8 tier's scale contract: the corpus-side scan of a
    pre-quantized table reads the tinyint column, NOT the float
    embedding (4x the bytes); the query batch broadcasts so the corpus
    never shuffles before scoring; the re-rank join stays broadcast."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.similarity import (
        quantize_embeddings,
        quantized_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    qdir = str(tmp_path / "qemb")
    quantize_embeddings(emb).write.parquet(qdir)
    pre = spark.read.parquet(qdir)
    q = emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id")

    # no re-rank: the scoring scan must read qvec but not embedding
    raw = quantized_topk(pre, q, k=3, rerank_factor=1)
    schemas = plans.scan_read_schemas(raw)
    qvec_scans = [s for s in schemas if "qvec" in s]
    assert qvec_scans and all("embedding" not in s for s in qvec_scans)
    plan = plans.physical_plan(raw)
    # query batch broadcasts (BroadcastNestedLoopJoin), never a
    # two-sided CartesianProduct shuffle
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # with re-rank: candidates broadcast back onto the float column
    rr = quantized_topk(pre, q, k=3, rerank_factor=4)
    assert plans.physical_plan(rr).count("SortMergeJoin") == 0


def test_bpe_encode_is_shuffle_free(spark, sf_dir):
    """Tokenization must scale as a pure map: no Exchange anywhere —
    the corpus-sized recurring cost of the tokenizer is one
    Arrow-batched pass per split."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.text import bpe_encode, learn_bpe

    model = learn_bpe([("the", 5), ("then", 3), ("them", 2)],
                      num_merges=4, min_pair_count=1)
    df = bpe_encode(
        table(spark, sf_dir, "documents").select("doc_id", "text"),
        model, ids=True,
    )
    assert plans.count_exchanges(df) == 0


def test_blocked_neardup_scores_each_block_pair_once(spark, sf_dir):
    """The matmul UDF must be planned exactly once: a plain explode of
    its output makes Catalyst infer a size()>0 pre-filter that doubles
    the Python evaluation — the whole operator's dominant cost."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.similarity import (
        embedding_neardup_blocked,
    )

    emb = table(spark, sf_dir, "embeddings")
    df = embedding_neardup_blocked(emb, threshold=0.45, num_blocks=4)
    assert plans.count_python_evals(df) == 1


def test_ivf_probe_udfs_eval_once_each(spark, sf_dir):
    """ivf_topk plans exactly three Python evals: corpus nearest-cell,
    query probe-cells, and the candidate cosine — none duplicated by
    an inferred explode pre-filter."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id")
    df = ivf_topk(emb, q, k=3)
    assert plans.count_python_evals(df) == 3


def test_neardup_verify_scores_once(spark, sf_dir):
    """The exact-verification cosine must be planned as ONE Python
    eval per tier: without the nondeterministic planning fence the
    threshold filter pushes below the scoring projection and the
    batch UDF runs twice per candidate."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.similarity import (
        embedding_neardup_exact,
        embedding_neardup_lsh,
    )

    emb = table(spark, sf_dir, "embeddings")
    assert plans.count_python_evals(
        embedding_neardup_exact(emb, threshold=0.4)
    ) == 1
    # lsh: 1 verify eval + 2 legitimate sketch evals (self-join sides)
    assert plans.count_python_evals(
        embedding_neardup_lsh(emb, threshold=0.4)
    ) == 3


def test_pq_topk_python_evals_bounded(spark, sf_dir):
    """pq_topk plans exactly ONE Arrow eval in flat mode (the ADC
    scorer) and TWO in probe mode (+query probe-cells), plus the
    single mapInPandas encode pass — no eval duplicated by an
    inferred explode pre-filter or per-field struct reference; the
    exact re-rank cosine stays codegen."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.similarity import (
        pq_fit, pq_index, pq_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id")
    model = pq_fit(emb, n_cells=4, m_sub=8, ksub=16)
    idx = pq_index(emb, model)
    assert plans.physical_plan(idx).count("MapInPandas") == 1
    flat = pq_topk(idx, q, model, emb, k=3)
    assert plans.count_python_evals(flat) == 1
    probed = pq_topk(idx, q, model, emb, k=3, n_probe=2)
    assert plans.count_python_evals(probed) == 2


def test_imi_topk_plan_shape(spark, sf_dir):
    """The IMI tiers' plan contracts: imi_index is one mapInPandas
    pass; imi_topk plans exactly ONE Arrow eval (the pair prober —
    explode_outer dodges the inferred-filter double-plan) and
    broadcasts the QUERY side of the pair join (never the index);
    the composed imi_pq_topk plans exactly TWO Arrow evals (prober +
    ADC scorer)."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.similarity import (
        imi_fit, imi_index, imi_pq_index, imi_pq_topk, imi_topk, pq_fit,
    )

    emb = table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id")
    model = imi_fit(emb, n_cells=8)
    idx = imi_index(emb, model)
    assert plans.physical_plan(idx).count("MapInPandas") == 1
    top = imi_topk(idx, q, model, emb, k=3, n_probe_pairs=8)
    assert plans.count_python_evals(top) == 1
    assert plans.count_broadcasts(top) >= 1  # the probe/query sides
    pq_m = pq_fit(emb, n_cells=4, m_sub=8, ksub=16)
    fused = imi_pq_index(emb, model, pq_m)
    assert plans.physical_plan(fused).count("MapInPandas") == 1
    composed = imi_pq_topk(fused, q, model, pq_m, emb, k=3,
                           n_probe_pairs=8)
    assert plans.count_python_evals(composed) == 2


def test_phrase_topk_plan_shape(spark, sf_dir):
    """Phrase search (r11): the tiny phrase-term frame broadcasts into
    the positional scan — never a nested loop — and the per-phrase
    rank cut pushes k into the window."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.text import phrase_topk

    docs = table(spark, sf_dir, "documents")
    plan = plans.physical_plan(
        phrase_topk(docs, ["order fast", "data slow"], k=5)
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_collocations_plan_shape(spark, sf_dir):
    """Collocations (r11): global top-k compiles to TakeOrdered (a
    per-partition heap merged at the driver), never a full sort."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.text import collocations

    docs = table(spark, sf_dir, "documents")
    plan = plans.physical_plan(collocations(docs, k=20, min_count=5))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rrf_fuse_plan_shape(spark, sf_dir):
    """Hybrid fusion (r11): fusing two ranked lists shuffles only the
    k x |queries| x |lists| result rows — never a corpus-sized side —
    and the final cut pushes k into the window."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.ranking import rrf_fuse
    from etl_workflow_spark.operators.text import bm25_topk

    docs = table(spark, sf_dir, "documents")
    a = bm25_topk(docs, ["hash join"], k=10).select(
        "query", "doc_id", "rank"
    )
    b = bm25_topk(docs, ["slow filter"], k=10).select(
        "query", "doc_id", "rank"
    )
    plan = plans.physical_plan(rrf_fuse([a, b], k=5))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_mmr_rerank_plan_shape(spark, sf_dir):
    """MMR vector fetch (r12 fix): the corpus-sized vectors table must
    NEVER shuffle — the candidate ids broadcast into the vectors scan
    as a left-semi probe, and the pruned (k x |queries|-sized) vector
    set broadcasts into the guard left-join. r11 shipped this as a
    SortMergeJoin with a full Exchange of the vectors side; this test
    pins the fixed shape (the only shuffles left are the tiny
    candidate-id distinct and the per-query applyInPandas group)."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.ranking import mmr_rerank

    emb = table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        emb.vec_id.alias("doc_id"), emb.embedding
    )
    ranked = (
        emb.where(emb.vec_id < 8)
        .select(
            F.lit("q0").alias("query"),
            emb.vec_id.alias("doc_id"),
            (emb.vec_id * 10).alias("score_e4"),
        )
    )
    out = mmr_rerank(ranked, vecs, k=4, lam=0.6)
    plan = plans.physical_plan(out)
    # both the prune and the fetch are broadcast joins — a
    # SortMergeJoin/ShuffledHashJoin here means the corpus moved
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # and the result still computes (guard path intact)
    assert out.count() == 4


def test_page_filters_and_normalize_plan_shape(spark, sf_dir):
    """r12 text additions: the page filters are single-projection
    codegen (ZERO exchanges — a filter that shuffles would be wrong at
    any scale); normalize_text's only Python is the one Arrow batch."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.text import (
        c4_line_filter, gopher_quality_flags, normalize_text,
    )

    docs = table(spark, sf_dir, "documents")
    for op in (gopher_quality_flags, c4_line_filter):
        df = op(docs)
        assert plans.count_exchanges(df) == 0, op.__name__
        assert plans.count_python_evals(df) == 0, op.__name__
    norm = normalize_text(docs)
    assert plans.count_exchanges(norm) == 0
    assert plans.count_python_evals(norm) == 1  # the NFC Arrow batch
    assert "BatchEvalPython" not in plans.physical_plan(norm)


def test_lm_score_plan_shape(spark, sf_dir):
    """r12 LM filter: document pairs GROUP (distinct-pair-bounded)
    before probing the count tables — never a nested loop or
    cartesian — and scoring stays JVM-side (no Python evals)."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.text import lm_score

    docs = table(spark, sf_dir, "documents")
    df = lm_score(docs)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plans.count_python_evals(df) == 0


def test_lm_score_backoff_plan_shape(spark, sf_dir):
    """r13 backoff LM: document trigrams GROUP (distinct-trigram-
    bounded) before probing the three count tables — never a nested
    loop or cartesian — and scoring stays JVM-side."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.text import lm_score_backoff

    docs = table(spark, sf_dir, "documents")
    df = lm_score_backoff(docs)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plans.count_python_evals(df) == 0


def test_lm_score_kn_plan_shape(spark, sf_dir):
    """r13 KN LM: same contract as the sibling scorers — grouped
    pairs probe the count/continuation tables via equi-joins only,
    scoring JVM-side."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.text import lm_score_kn

    docs = table(spark, sf_dir, "documents")
    df = lm_score_kn(docs)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plans.count_python_evals(df) == 0


def test_image_neardup_plan_shape(spark, sf_dir):
    """r13 image near-dup: the payload column enters exactly ONE Arrow
    pass (the dHash mapInPandas) and never the pairing join — after
    the hash, everything is 8-byte fingerprints; the banded self-join
    is equi-join only (pigeonhole segments), no nested loop."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import multimodal as M

    docs = M.with_binary_payload(table(spark, sf_dir, "documents"))
    pairs = M.image_neardup_pairs(docs, max_distance=3)
    plan = plans.physical_plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one payload-consuming Python stage, Arrow-batched (mapInPandas
    # compiles to one python eval per join branch of the self-join —
    # both branches reuse the SAME single-scan subplan shape; what
    # matters is no per-row BatchEvalPython anywhere)
    assert "BatchEvalPython" not in plan
    # the join keys are the pigeonhole segments, not payloads: the
    # plan prints top-down, so every operator ABOVE the hash pass
    # (exchange, join, filters) appears before the first MapInPandas —
    # none of them may carry the payload column
    assert "segval" in plan and "MapInPandas" in plan
    above = plan.split("MapInPandas", 1)[0]
    assert "payload" not in above


def test_video_neardup_plan_shape(spark, sf_dir):
    """r14 video near-dup: payloads enter the frame-sampling /
    per-frame-hash Arrow passes only — never the frame-pair join,
    which is equi-join on pigeonhole segments (no cartesian, no
    nested loop, no per-row Python); no operator above the Arrow
    stages carries the payload column."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import multimodal as M

    docs = M.with_binary_payload(table(spark, sf_dir, "documents"))
    pairs = M.video_neardup_pairs(docs, max_distance=3)
    plan = plans.physical_plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "segval" in plan and "MapInPandas" in plan
    above = plan.split("MapInPandas", 1)[0]
    assert "payload" not in above


def test_audio_neardup_plan_shape(spark, sf_dir):
    """r14 audio near-dup: payloads enter the fingerprint Arrow pass
    only — never the frame-pair join, which is equi-join on pigeonhole
    segments (no cartesian, no nested loop, no per-row Python); no
    operator above the Arrow stage carries the payload column."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import multimodal as M

    docs = M.with_binary_payload(table(spark, sf_dir, "documents"))
    pairs = M.audio_neardup_pairs(docs, max_distance=3)
    plan = plans.physical_plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "segval" in plan and "MapInPandas" in plan
    above = plan.split("MapInPandas", 1)[0]
    assert "payload" not in above
