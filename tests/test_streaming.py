"""Structured Streaming tests: file source → windowed agg → idempotent
foreachBatch sink, using availableNow triggers over testdata-derived
parquet so the stream is deterministic."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from etl_workflow_spark.catalog import events_table
from etl_workflow_spark.streaming import incremental as inc


def _prepare_events_dir(spark, sf_dir, tmp_path):
    """Stage events as normal-precision parquet (the raw testdata file
    is TIMESTAMP(NANOS), which the streaming reader also rejects)."""
    out = str(tmp_path / "events_in")
    events_table(spark, sf_dir).write.parquet(out)
    return out


def test_windowed_counts_batch_equals_stream(spark, sf_dir, tmp_path):
    events_dir = _prepare_events_dir(spark, sf_dir, tmp_path)
    static = spark.read.parquet(events_dir)

    batch_result = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in inc.windowed_event_counts(static).collect()
    }

    stream = inc.file_stream_events(spark, events_dir, static.schema,
                                    max_files_per_trigger=2)
    agg = inc.windowed_event_counts(stream)
    out_rows = []

    def collect_batch(df, _bid):
        out_rows.extend(df.collect())

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(collect_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last complete-mode emission = final state
    stream_result = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in out_rows
    }
    assert stream_result == batch_result and len(batch_result) > 0


def test_stream_daily_sales_idempotent_sink(spark, tmp_path):
    rows = [
        (datetime.datetime(2023, 1, 1, 10), 1, 1, 10, 2, 18.0),
        (datetime.datetime(2023, 1, 1, 11), 1, 2, 20, 1, 20.0),
        (datetime.datetime(2023, 1, 2, 9), 2, 1, 10, 3, 30.0),
    ]
    src = str(tmp_path / "items_in")
    spark.createDataFrame(
        rows, ["order_date", "order_id", "product_id", "category_id",
               "quantity", "total"]
    ).write.parquet(src)

    out = str(tmp_path / "daily_out")
    for run in range(2):  # second run must converge to the same result
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        )
        q = (
            inc.stream_daily_sales(
                spark, stream, out, str(tmp_path / f"ckpt_{run}")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    res = spark.read.parquet(out)
    assert res.count() == 3
    d1 = res.filter(F.col("product_id") == 1).filter(
        F.col("date") == datetime.date(2023, 1, 1)
    ).collect()[0]
    assert float(d1["units_sold"]) == 2.0 and float(d1["revenue"]) == 18.0

def test_merge_daily_partitions_keeps_unchanged_groups(spark, tmp_path):
    """Update-mode micro-batches carry only changed groups; the merge
    sink must NOT drop a date's previously-written groups when a later
    batch updates a different group of the same date (the silent-loss
    bug of blind dynamic partition overwrite)."""
    import datetime as dt

    out = str(tmp_path / "merged")
    cols = ["date", "product_id", "category_id", "units_sold", "revenue",
            "order_count"]
    d1 = dt.date(2023, 1, 1)

    batch1 = spark.createDataFrame(
        [(d1, 1, 10, 5.0, 50.0, 2), (d1, 2, 10, 3.0, 30.0, 1)], cols
    )
    inc.merge_daily_partitions(batch1, out)

    # same date, only product 2 changed + one new product
    batch2 = spark.createDataFrame(
        [(d1, 2, 10, 9.0, 90.0, 3), (d1, 3, 11, 1.0, 10.0, 1)], cols
    )
    inc.merge_daily_partitions(batch2, out)

    got = {
        (r["product_id"]): (r["units_sold"], r["revenue"], r["order_count"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        1: (5.0, 50.0, 2),   # untouched group survives the 2nd batch
        2: (9.0, 90.0, 3),   # updated in place
        3: (1.0, 10.0, 1),   # new group added
    }


def test_stream_dedup_drops_redelivered_events(spark, tmp_path):
    """At-least-once redelivery collapses to one row per key; state is
    watermark-bounded (contract documented in stream_dedup)."""
    import datetime as dt

    from etl_workflow_spark.streaming.incremental import stream_dedup

    src = str(tmp_path / "src")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, "click", 1.0),
        (2, base + dt.timedelta(minutes=1), "view", 2.0),
        (1, base, "click", 1.0),          # exact redelivery
        (2, base + dt.timedelta(minutes=1), "view", 2.0),  # redelivery
        (3, base + dt.timedelta(minutes=2), "purchase", 3.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    deduped = stream_dedup(stream, key_cols=["event_id"], watermark="10 minutes")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]

    # batch path: same keys, same survivors
    assert sorted(
        r["event_id"] for r in stream_dedup(df, key_cols=["event_id"]).collect()
    ) == [1, 2, 3]


def test_enrich_stream_static_join(spark, tmp_path):
    """Stream-static join: stateless enrichment, stream side never
    shuffles (broadcast dim)."""
    import datetime as dt

    from etl_workflow_spark.streaming.incremental import enrich_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    facts = spark.createDataFrame(
        [(1, 100, base), (2, 200, base), (3, 100, base), (4, 999, base)],
        ["event_id", "product_id", "ts"],
    )
    facts.coalesce(1).write.mode("overwrite").parquet(src)
    dim = spark.createDataFrame(
        [(100, "widget"), (200, "gadget")], ["product_id", "name"]
    )

    stream = spark.readStream.schema(facts.schema).parquet(src)
    q = (
        enrich_stream(stream, dim, on="product_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["event_id"], r["name"]) for r in spark.read.parquet(out).collect()
    )
    # inner join: the unknown product (999) drops
    assert got == [(1, "widget"), (2, "gadget"), (3, "widget")]


def test_stream_matview_refresh_matches_batch_recompute(spark, tmp_path):
    """Continuous matview maintenance: two micro-batches of order
    deltas (inserts + a cancellation) must leave the summary equal to
    a full batch recompute over the final orders state."""
    from etl_workflow_spark.operators.etl import product_sales_summary
    from etl_workflow_spark.sources.writers import overwrite

    cats = spark.createDataFrame([(1, "c")], ["category_id", "category_name"])
    prods = spark.createDataFrame(
        [(1, 1, "p1"), (2, 1, "p2")], ["product_id", "category_id", "name"]
    )
    items = spark.createDataFrame(
        [
            (1, 1, 1, 1, 10.0),
            (2, 2, 2, 1, 20.0),
            (3, 3, 1, 2, 30.0),
            (4, 4, 2, 1, 40.0),
        ],
        ["order_item_id", "order_id", "product_id", "quantity", "total"],
    )
    base_orders = spark.createDataFrame(
        [
            (1, 10, "2024-01-01", "Delivered"),
            (2, 11, "2024-01-02", "Delivered"),
        ],
        ["order_id", "customer_id", "order_date", "status"],
    )

    orders_path = str(tmp_path / "orders")
    base_orders.write.parquet(orders_path)
    summary_path = str(tmp_path / "summary")
    overwrite(product_sales_summary(prods, cats, items, base_orders),
              summary_path)

    # delta feed: one file per micro-batch (maxFilesPerTrigger=1)
    feed = tmp_path / "feed"
    spark.createDataFrame(
        [(3, 12, "2024-01-03", "Delivered")], base_orders.schema
    ).coalesce(1).write.mode("append").parquet(str(feed))
    spark.createDataFrame(
        # order 2 cancelled: product 2 must NOT vanish (order 4 still
        # qualifies after batch 2 inserts it) but its numbers change
        [(2, 11, "2024-01-02", "Cancelled"),
         (4, 13, "2024-01-04", "Delivered")],
        base_orders.schema,
    ).coalesce(1).write.mode("append").parquet(str(feed))

    stream = (
        spark.readStream.schema(base_orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = (
        inc.stream_matview_refresh(
            spark, stream, orders_path, summary_path,
            str(tmp_path / "ckpt"), prods, cats, items,
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    want = sorted(
        tuple(r)
        for r in product_sales_summary(
            prods, cats, items, spark.read.parquet(orders_path)
        ).collect()
    )
    got = sorted(
        tuple(r) for r in spark.read.parquet(summary_path).collect()
    )
    assert got == want and len(got) == 2


def test_interval_join_stream_equals_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join parity: click->purchase attribution
    over two file streams must equal the same join on static frames."""
    events_dir = _prepare_events_dir(spark, sf_dir, tmp_path)
    static = spark.read.parquet(events_dir)

    def sides(df):
        clicks = df.where(F.col("event_type") == "click").select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        buys = df.where(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("buy_ts"),
            F.col("event_id").alias("buy_id"),
        )
        return clicks, buys

    b_clicks, b_buys = sides(static)
    batch_pairs = {
        (r["click_id"], r["buy_id"])
        for r in inc.interval_join_stream(
            b_clicks, b_buys, "user_id", "click_ts", "buy_ts",
            within="30 minutes",
        ).collect()
    }
    assert batch_pairs  # the fixture must actually produce attributions

    s_clicks, s_buys = sides(
        inc.file_stream_events(spark, events_dir, static.schema,
                               max_files_per_trigger=2)
    )
    joined = inc.interval_join_stream(
        s_clicks, s_buys, "user_id", "click_ts", "buy_ts",
        within="30 minutes", watermark="1 hour",
    )
    got = []

    def collect_batch(df, _bid):
        got.extend(df.collect())

    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(collect_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_ivj"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    stream_pairs = {(r["click_id"], r["buy_id"]) for r in got}
    assert stream_pairs == batch_pairs


def test_neardup_ingest_batches_dedup_across_batches(spark, tmp_path):
    """Dedup-at-ingest: batch 2's near-duplicate of batch 1 content is
    rejected, novel docs are admitted, and the index extends so batch 3
    sees batch 2's survivors."""
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest looking for delicious food"
    )
    other = (
        "completely different content about databases indexes and query "
        "optimization strategies for distributed analytical engines"
    )
    third = (
        "yet another unrelated document discussing streaming watermarks "
        "state stores and exactly once delivery semantics in pipelines"
    )

    b1 = spark.createDataFrame([(1, base), (2, other)], ["doc_id", "text"])
    n1 = inc.neardup_ingest_batch(b1, corpus, index, threshold=0.5)
    assert n1 == 2

    # near-dup of doc 1 (one word changed) + a novel doc
    b2 = spark.createDataFrame(
        [(10, base.replace("delicious", "tasty")), (11, third)],
        ["doc_id", "text"],
    )
    n2 = inc.neardup_ingest_batch(b2, corpus, index, threshold=0.5)
    assert n2 == 1

    # near-dup of batch-2 SURVIVOR (doc 11) must also be rejected
    b3 = spark.createDataFrame(
        [(20, third.replace("pipelines", "systems"))], ["doc_id", "text"]
    )
    n3 = inc.neardup_ingest_batch(b3, corpus, index, threshold=0.5)
    assert n3 == 0

    ids = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert ids == [1, 2, 11]


def test_neardup_ingest_within_batch_keeps_min_id(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    text = (
        "some reasonably long document text that shingles into plenty "
        "of three gram sequences for the minhash signature computation"
    )
    b = spark.createDataFrame(
        [(5, text), (3, text + " extra"), (9, "entirely different words "
          "about orchestration scheduling and resource management today")],
        ["doc_id", "text"],
    )
    admitted = inc.neardup_ingest_batch(b, corpus, index, threshold=0.5)
    assert admitted == 2
    ids = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert ids == [3, 9]


def test_neardup_ingest_replay_is_idempotent(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    b = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")],
        ["doc_id", "text"],
    )
    assert inc.neardup_ingest_batch(b, corpus, index) == 1
    # replayed micro-batch (failure before checkpoint commit)
    assert inc.neardup_ingest_batch(b, corpus, index) == 0
    assert spark.read.parquet(corpus).count() == 1
    idx = spark.read.parquet(index)
    assert idx.count() == idx.dropDuplicates(["doc_id", "band", "bucket"]).count()


def test_stream_neardup_ingest_end_to_end(spark, tmp_path):
    """Real Structured Streaming run over a file source: two files of
    documents, availableNow trigger, dedup across micro-batches."""
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    t1 = (
        "original document text with enough words to produce a useful "
        "number of shingles for locality sensitive hashing to work with"
    )
    t2 = (
        "a second totally distinct document concerning compilers parsers "
        "abstract syntax trees and register allocation techniques galore"
    )
    d1 = spark.createDataFrame([(1, t1)], ["doc_id", "text"])
    d2 = spark.createDataFrame(
        [(2, t1.replace("galore", "indeed").replace("original", "copied")),
         (3, t2)],
        ["doc_id", "text"],
    )
    d1.coalesce(1).write.parquet(src)
    d2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        inc.stream_neardup_ingest(stream, corpus, index, ckpt, threshold=0.5)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in time"

    got = {r.doc_id: r.text for r in spark.read.parquet(corpus).collect()}
    assert 3 in got and len(got) >= 2
    # t1 and its near-dup can't both be present
    assert not (1 in got and 2 in got)


# ------------------------------------------------ semantic dedup-at-ingest


_SEM_CENTS = [[0.0] * 4, [40.0] * 4, [-40.0] * 4]


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_ingest_batches_dedup_across_batches(spark, tmp_path):
    """Batch 2's semantic near-dup of batch 1 content is rejected,
    novel vectors are admitted, and batch 3 sees batch 2's survivors."""
    corpus = str(tmp_path / "semcorpus")
    v1 = [1.0, 2.0, 3.0, 4.0]
    v2 = [38.0, 41.0, 40.0, 39.0]
    b1 = _vecs(spark, [(1, v1), (2, v2)])
    assert inc.semdedup_ingest_batch(b1, corpus, _SEM_CENTS) == 2

    # scaled copy of v1 (cosine 1) + a novel direction in cell 0
    v3 = [4.0, 1.0, -2.0, 3.0]
    b2 = _vecs(spark, [(10, [x * 2 for x in v1]), (11, v3)])
    assert inc.semdedup_ingest_batch(b2, corpus, _SEM_CENTS) == 1

    # near-dup of batch-2 SURVIVOR (vec 11) must also be rejected
    b3 = _vecs(spark, [(20, [x * 1.5 for x in v3])])
    assert inc.semdedup_ingest_batch(b3, corpus, _SEM_CENTS) == 0

    got = spark.read.parquet(corpus)
    assert sorted(r.vec_id for r in got.collect()) == [1, 2, 11]
    # survivors land WITH their cell assignment for future probes
    assert "cluster" in got.columns


def test_semdedup_ingest_within_batch_and_corpus_transitive(spark, tmp_path):
    corpus = str(tmp_path / "semcorpus")
    v = [3.0, -1.0, 2.0, 5.0]
    b = _vecs(spark, [(7, v), (4, [x * 3 for x in v]),
                      (9, [-2.0, 4.0, 1.0, -3.0])])
    # within-batch dup group {7, 4} admits min id 4
    assert inc.semdedup_ingest_batch(b, corpus, _SEM_CENTS) == 2
    assert sorted(r.vec_id for r in spark.read.parquet(corpus).collect()) == [4, 9]
    # a batch pairing BOTH a corpus member and a fresh member: the
    # whole cluster is transitive-rejected
    b2 = _vecs(spark, [(30, [x * 2 for x in v]), (31, [x * 5 for x in v])])
    assert inc.semdedup_ingest_batch(b2, corpus, _SEM_CENTS) == 0


def test_semdedup_ingest_replay_is_idempotent(spark, tmp_path):
    corpus = str(tmp_path / "semcorpus")
    b = _vecs(spark, [(1, [1.0, 2.0, 3.0, 4.0])])
    assert inc.semdedup_ingest_batch(b, corpus, _SEM_CENTS) == 1
    # replayed micro-batch: its id now exists in the corpus (self-pair
    # territory) — must converge, not duplicate or crash
    assert inc.semdedup_ingest_batch(b, corpus, _SEM_CENTS) == 0
    assert spark.read.parquet(corpus).count() == 1


def test_stream_semdedup_ingest_end_to_end(spark, tmp_path):
    src = str(tmp_path / "semsrc")
    corpus = str(tmp_path / "semcorpus")
    ckpt = str(tmp_path / "semckpt")
    v1 = [1.0, 2.0, 3.0, 4.0]
    v2 = [-5.0, 2.0, -4.0, 1.0]
    _vecs(spark, [(1, v1)]).coalesce(1).write.parquet(src)
    _vecs(spark, [(2, [x * 2 for x in v1]), (3, v2)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        inc.stream_semdedup_ingest(stream, corpus, _SEM_CENTS, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in time"
    got = sorted(r.vec_id for r in spark.read.parquet(corpus).collect())
    assert 3 in got
    assert not (1 in got and 2 in got)  # v1 and its copy never coexist


# ---------------------------------------------------- vocabulary store


def test_vocab_store_matches_batch_vocab_and_replays(spark, tmp_path):
    """Fragments merge to exactly vocab_counts over the full corpus;
    a replayed batch overwrites its own partition (no double counts);
    global min_count applies after the merge."""
    from etl_workflow_spark.operators.text import vocab_counts

    store = str(tmp_path / "vocab")
    b1 = spark.createDataFrame(
        [(1, "alpha beta beta gamma")], ["doc_id", "text"]
    )
    b2 = spark.createDataFrame(
        [(2, "beta gamma gamma delta")], ["doc_id", "text"]
    )
    inc.vocab_rollup_batch(b1, store, 0)
    inc.vocab_rollup_batch(b2, store, 1)
    inc.vocab_rollup_batch(b2, store, 1)  # replay: same partition
    got = {
        r["token"]: r["count"]
        for r in inc.read_vocab_store(spark, store).collect()
    }
    want = {
        r["token"]: r["count"]
        for r in vocab_counts(b1.unionByName(b2)).collect()
    }
    assert got == want
    # tokens below min_count in EVERY fragment but above it merged:
    # beta (2+1) and gamma (1+2) — a per-fragment threshold regression
    # would return nothing here
    thr = {
        r["token"]: r["count"]
        for r in inc.read_vocab_store(spark, store, min_count=3).collect()
    }
    assert thr == {"beta": 3, "gamma": 3}


def test_vocab_store_mixed_flag_fragments_read_correctly(spark, tmp_path):
    """ADVICE r8: a store mixing pre-flag fragments (no lowercase
    column on disk) with flagged fragments must neither hide the new
    fragments' flag behind one parquet footer's schema nor read the
    old fragments as NULL→False and spuriously refuse. The explicit
    read schema surfaces the column everywhere; pre-flag NULLs
    coalesce to True (the only writer default back then)."""
    import pytest

    from etl_workflow_spark.operators.text import vocab_counts

    store = str(tmp_path / "vocab")
    b = spark.createDataFrame([(1, "alpha beta alpha")], ["doc_id", "text"])
    # a fragment the PRE-FLAG writer would have produced: no lowercase
    # column on disk
    (
        vocab_counts(b)
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store)
    )
    inc.vocab_rollup_batch(b, store, 1, lowercase=True)
    # merge sees BOTH fragments; flag resolves to the agreeing True
    got = {
        r["token"]: r["count"]
        for r in inc.read_vocab_store(spark, store).collect()
    }
    assert got == {"alpha": 4, "beta": 2}
    assert inc.train_bpe_from_store(spark, store, num_merges=1)[
        "lowercase"
    ] is True
    # compaction reads through the same explicit-schema path
    inc.compact_vocab_store(spark, store, before_batch_id=2)
    got = {
        r["token"]: r["count"]
        for r in inc.read_vocab_store(spark, store).collect()
    }
    assert got == {"alpha": 4, "beta": 2}
    # a flagged-False fragment DISAGREES with the pre-flag default and
    # is still refused
    inc.vocab_rollup_batch(b, store, 2, lowercase=False)
    with pytest.raises(ValueError, match="lowercase"):
        inc.train_bpe_from_store(spark, store, num_merges=1)


def test_vocab_store_refuses_mixed_normalization(spark, tmp_path):
    """Fragments record their lowercase flag; a store whose fragments
    disagree is refused at train time rather than silently training on
    mixed-normalization counts."""
    import pytest

    store = str(tmp_path / "vocab")
    b = spark.createDataFrame([(1, "The the")], ["doc_id", "text"])
    inc.vocab_rollup_batch(b, store, 0, lowercase=True)
    inc.vocab_rollup_batch(b, store, 1, lowercase=False)
    with pytest.raises(ValueError, match="lowercase"):
        inc.train_bpe_from_store(spark, store, num_merges=2)


def test_vocab_store_compaction_preserves_counts(spark, tmp_path):
    store = str(tmp_path / "vocab")
    for i in range(4):
        b = spark.createDataFrame(
            [(i, f"tok{i} shared shared")], ["doc_id", "text"]
        )
        inc.vocab_rollup_batch(b, store, i)
    before = {
        r["token"]: r["count"]
        for r in inc.read_vocab_store(spark, store).collect()
    }
    inc.compact_vocab_store(spark, store, before_batch_id=3)
    frags = spark.read.parquet(store)
    assert frags.where("batch_id = -1").count() > 0
    assert {
        r["token"]: r["count"]
        for r in inc.read_vocab_store(spark, store).collect()
    } == before
    # re-compaction (batch_id=-1 included) stays correct
    inc.compact_vocab_store(spark, store, before_batch_id=99)
    assert {
        r["token"]: r["count"]
        for r in inc.read_vocab_store(spark, store).collect()
    } == before


def test_train_bpe_from_store_equals_full_corpus_train(spark, tmp_path):
    from etl_workflow_spark.operators.text import train_bpe

    store = str(tmp_path / "vocab")
    docs = [(i, t) for i, t in enumerate(
        ["low lower low", "newest new lowest low", "wide wider widest"]
    )]
    full = spark.createDataFrame(docs, ["doc_id", "text"])
    for i, row in enumerate(docs):
        inc.vocab_rollup_batch(
            spark.createDataFrame([row], ["doc_id", "text"]), store, i
        )
    got = inc.train_bpe_from_store(spark, store, num_merges=10,
                                   min_pair_count=1)
    want = train_bpe(full, num_merges=10, min_pair_count=1)
    assert got == want


def test_stream_vocab_rollup_end_to_end(spark, tmp_path):
    """Real availableNow stream: per-file micro-batches build the
    store; the merged vocabulary equals the batch build."""
    from etl_workflow_spark.operators.text import vocab_counts

    src = str(tmp_path / "vsrc")
    store = str(tmp_path / "vstore")
    ckpt = str(tmp_path / "vckpt")
    d1 = spark.createDataFrame([(1, "red green green")], ["doc_id", "text"])
    d2 = spark.createDataFrame([(2, "green blue")], ["doc_id", "text"])
    d1.coalesce(1).write.parquet(src)
    d2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        inc.stream_vocab_rollup(stream, store, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in time"
    got = {
        r["token"]: r["count"]
        for r in inc.read_vocab_store(spark, store).collect()
    }
    want = {
        r["token"]: r["count"]
        for r in vocab_counts(d1.unionByName(d2)).collect()
    }
    assert got == want == {"red": 1, "green": 3, "blue": 1}


def test_vocab_store_guard_in_read_path_and_preflag_fallback(
    spark, tmp_path
):
    """Mixed normalization is refused at read_vocab_store (every
    consumer inherits the guard), and a pre-flag store (fragments
    without the lowercase column) reads/compacts/trains under the
    old default instead of crashing."""
    import pytest

    store = str(tmp_path / "vocab")
    b = spark.createDataFrame([(1, "The the")], ["doc_id", "text"])
    inc.vocab_rollup_batch(b, store, 0, lowercase=True)
    inc.vocab_rollup_batch(b, store, 1, lowercase=False)
    with pytest.raises(ValueError, match="lowercase"):
        inc.read_vocab_store(spark, store).collect()

    # pre-flag layout: fragments with only (token, count, batch_id)
    old = str(tmp_path / "vocab_v0")
    from etl_workflow_spark.operators.text import vocab_counts

    (
        vocab_counts(b)
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite").partitionBy("batch_id").parquet(old)
    )
    got = {
        r["token"]: r["count"]
        for r in inc.read_vocab_store(spark, old).collect()
    }
    assert got == {"the": 2}
    inc.compact_vocab_store(spark, old, before_batch_id=99)
    assert {
        r["token"]: r["count"]
        for r in inc.read_vocab_store(spark, old).collect()
    } == got
    model = inc.train_bpe_from_store(spark, old, num_merges=2,
                                     min_pair_count=1)
    assert model["lowercase"] is True and model["merges"]


# ---------------------------------------------------- PQ index store


def test_pq_index_store_matches_batch_and_replays(spark, sf_dir, tmp_path):
    """Fragments merge to exactly the one-pass encode of the full
    corpus; a replayed batch overwrites its own partition; fragments
    encoded under a different model are refused via the per-row
    model_id column (the vocab-store mixed-fragment lesson)."""
    import pytest

    from etl_workflow_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = emb.where("vec_id < 250")
    b2 = emb.where("vec_id >= 250")
    model = S.pq_fit(emb, n_cells=8, m_sub=8, ksub=32)
    store = str(tmp_path / "pqstore")
    inc.pq_index_batch(b1, store, 0, model)
    inc.pq_index_batch(b2, store, 1, model)
    inc.pq_index_batch(b2, store, 1, model)  # replay: same partition
    got = sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in inc.read_pq_index(spark, store, model).collect()
    )
    want = sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in S.pq_index(emb, model).collect()
    )
    assert got == want
    # probes over the store equal probes over the one-pass index
    q = emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id")
    a = sorted(map(tuple, S.pq_topk(
        inc.read_pq_index(spark, store, model), q, model, emb, k=5
    ).collect()))
    b = sorted(map(tuple, S.pq_topk(
        S.pq_index(emb, model), q, model, emb, k=5
    ).collect()))
    assert a == b
    # a fragment encoded under a DIFFERENT model is refused on read
    other = S.pq_fit(emb, n_cells=8, m_sub=8, ksub=32, seed=99)
    inc.pq_index_batch(b1.limit(10), store, 2, other)
    with pytest.raises(ValueError, match="encoded under model"):
        inc.read_pq_index(spark, store, model)


def test_stream_pq_index_end_to_end(spark, sf_dir, tmp_path):
    """Real availableNow stream: per-file micro-batches encode into
    the store; the merged index equals the batch build."""
    from etl_workflow_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = S.pq_fit(emb, n_cells=8, m_sub=8, ksub=32)
    src = str(tmp_path / "psrc")
    store = str(tmp_path / "pstore")
    ckpt = str(tmp_path / "pckpt")
    emb.where("vec_id < 250").coalesce(1).write.parquet(src)
    emb.where("vec_id >= 250").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, "
                                "label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        inc.stream_pq_index(stream, store, ckpt, model)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in time"
    got = sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in inc.read_pq_index(spark, store, model).collect()
    )
    want = sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in S.pq_index(emb, model).collect()
    )
    assert got == want


def test_pq_index_store_redelivery_and_compaction(spark, sf_dir, tmp_path):
    """Review hardening: a vector re-delivered in a LATER batch keeps
    only its latest codes (last-write-wins by id — a duplicate id
    would displace a real neighbor from top-k); compaction collapses
    closed fragments with the same semantics; fingerprint-less models
    get a computed fingerprint (no empty-string collision); legacy
    stores without the model_id column and empty stores error/pass
    truthfully."""
    import pytest

    from etl_workflow_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = S.pq_fit(emb, n_cells=8, m_sub=8, ksub=32)
    store = str(tmp_path / "pqstore")
    inc.pq_index_batch(emb.where("vec_id < 300"), store, 0, model)
    # batch 1 RE-DELIVERS vec 5 with a different (negated) embedding
    redeliver = emb.where("vec_id == 5").selectExpr(
        "vec_id", "transform(embedding, x -> -x) as embedding", "label"
    )
    inc.pq_index_batch(
        emb.where("vec_id >= 300").unionByName(redeliver), store, 1, model
    )
    idx = inc.read_pq_index(spark, store, model)
    assert idx.count() == emb.count()  # one row per id
    new_cell = idx.where("vec_id = 5").collect()[0]["cell"]
    old_cell = S.pq_index(emb.where("vec_id == 5"), model).collect()[0][
        "cell"
    ]
    neg_cell = S.pq_index(redeliver, model).collect()[0]["cell"]
    assert new_cell == neg_cell
    if old_cell != neg_cell:
        assert new_cell != old_cell
    # compaction: same table afterwards, fragments collapsed
    before = sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in inc.read_pq_index(spark, store, model).collect()
    )
    inc.compact_pq_index(spark, store, before_batch_id=2)
    after = sorted(
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in inc.read_pq_index(spark, store, model).collect()
    )
    assert after == before
    # fingerprint-less model: computed fingerprint, not "" — a
    # DIFFERENT stripped model is still refused
    bare = {k: v for k, v in model.items() if k != "model_id"}
    store2 = str(tmp_path / "pq2")
    inc.pq_index_batch(emb.limit(20), store2, 0, bare)
    assert inc.read_pq_index(spark, store2, bare).count() == 20
    other = {
        k: v
        for k, v in S.pq_fit(
            emb, n_cells=8, m_sub=8, ksub=32, seed=99
        ).items()
        if k != "model_id"
    }
    with pytest.raises(ValueError, match="encoded under model"):
        inc.read_pq_index(spark, store2, other)
    # legacy store (plain pq_index write): actionable refusal
    store3 = str(tmp_path / "pq3")
    S.pq_index(emb.limit(10), model).write.parquet(store3)
    with pytest.raises(ValueError, match="no model_id column"):
        inc.read_pq_index(spark, store3, model)
    assert inc.read_pq_index(spark, store3).count() == 10  # unguarded ok


def test_train_unigram_from_store_matches_full_corpus(spark, tmp_path):
    """The unigram twin of train_bpe_from_store: retraining from the
    additive vocabulary store equals training over the full ingested
    corpus — the corpus is counted once per document, never re-scanned
    per retrain; and the model survives a JSON round trip."""
    import json

    from etl_workflow_spark.operators.text import train_unigram

    store = str(tmp_path / "vocab")
    b1 = spark.createDataFrame(
        [(1, "hello world hello"), (2, "help low world")],
        ["doc_id", "text"],
    )
    b2 = spark.createDataFrame(
        [(3, "lowest world hello help")], ["doc_id", "text"]
    )
    inc.vocab_rollup_batch(b1, store, 0)
    inc.vocab_rollup_batch(b2, store, 1)
    from_store = inc.train_unigram_from_store(
        spark, store, vocab_size=30
    )
    full = train_unigram(b1.unionByName(b2), vocab_size=30)
    assert from_store == full
    assert json.loads(json.dumps(from_store)) == from_store


def test_dsir_store_matches_direct_fit_and_replays(spark, tmp_path):
    """r11 DSIR count store: fragments merge to exactly the counts one
    featurizer pass over the full ingested corpus produces; a replayed
    batch overwrites its own partition (additive counts, write-side
    idempotence); and a model refit from the two stores is
    BIT-IDENTICAL to dsir_fit over the unioned corpora (the shared
    _dsir_model_from_counts body) — the corpus is featurized once at
    ingest, never re-scanned per refit."""
    from etl_workflow_spark.operators.text import _dsir_partials, dsir_fit

    raw_store = str(tmp_path / "raw")
    tgt_store = str(tmp_path / "tgt")
    r1 = spark.createDataFrame(
        [(1, "the parser read the buffer twice"),
         (2, "a socket fed the kernel queue")], ["doc_id", "text"])
    r2 = spark.createDataFrame(
        [(3, "threads waited on the index lock")], ["doc_id", "text"])
    t1 = spark.createDataFrame(
        [(10, "the harbor mist hid the ferry"),
         (11, "gulls circled the quay at dawn")], ["doc_id", "text"])
    inc.dsir_counts_batch(r1, raw_store, 0, n=2, buckets=256)
    inc.dsir_counts_batch(r2, raw_store, 1, n=2, buckets=256)
    inc.dsir_counts_batch(r2, raw_store, 1, n=2, buckets=256)  # replay
    inc.dsir_counts_batch(t1, tgt_store, 0, n=2, buckets=256)

    union = r1.unionByName(r2)
    want_counts = {
        r["b"]: r["k"]
        for r in _dsir_partials(union, "text", 2, 256)
        .groupBy("b").agg(F.sum("k").alias("k")).collect()
    }
    got_counts = {
        r["b"]: r["k"]
        for r in inc.read_dsir_counts(spark, raw_store).collect()
    }
    assert got_counts == want_counts

    got = inc.dsir_fit_from_stores(spark, tgt_store, raw_store)
    want = dsir_fit(union, t1, n=2, buckets=256)
    assert got == want


def test_dsir_store_compaction_and_guards(spark, tmp_path):
    """Compaction preserves the refit model exactly; mixed-parameter
    fragments, cross-store parameter mismatch, empty stores, and
    foreign parquet all refuse loudly instead of summing
    incommensurable bucket ids."""
    import pytest

    raw_store = str(tmp_path / "raw")
    tgt_store = str(tmp_path / "tgt")
    for i in range(4):
        b = spark.createDataFrame(
            [(i, f"batch {i} wrote a shared sentence here")],
            ["doc_id", "text"],
        )
        inc.dsir_counts_batch(b, raw_store, i, n=2, buckets=128)
    t = spark.createDataFrame(
        [(9, "a curated target sentence sits here")], ["doc_id", "text"])
    inc.dsir_counts_batch(t, tgt_store, 0, n=2, buckets=128)
    before = inc.dsir_fit_from_stores(spark, tgt_store, raw_store)
    inc.compact_dsir_store(spark, raw_store, before_batch_id=3)
    frags = spark.read.parquet(raw_store)
    assert frags.where("batch_id = -1").count() > 0
    assert inc.dsir_fit_from_stores(spark, tgt_store, raw_store) == before
    # re-compaction (batch_id=-1 included) stays exact
    inc.compact_dsir_store(spark, raw_store, before_batch_id=99)
    assert inc.dsir_fit_from_stores(spark, tgt_store, raw_store) == before

    # mixed featurizer parameters within one store refuse
    b = spark.createDataFrame([(50, "late differently hashed batch")],
                              ["doc_id", "text"])
    inc.dsir_counts_batch(b, raw_store, 50, n=1, buckets=128)
    with pytest.raises(ValueError, match="disagree"):
        inc.read_dsir_counts(spark, raw_store)
    with pytest.raises(ValueError, match="disagree"):
        inc.dsir_fit_from_stores(spark, tgt_store, raw_store)

    # cross-store mismatch refuses
    other = str(tmp_path / "other")
    inc.dsir_counts_batch(b, other, 0, n=2, buckets=64)
    with pytest.raises(ValueError, match="SAME hashed space"):
        inc.dsir_fit_from_stores(spark, tgt_store, other)

    # a store written with only gram-less docs is empty -> refuses
    empty = str(tmp_path / "empty")
    blank = spark.createDataFrame([(1, "   ")], ["doc_id", "text"])
    inc.dsir_counts_batch(blank, empty, 0, n=2, buckets=128)
    with pytest.raises(ValueError, match="empty"):
        inc.dsir_fit_from_stores(spark, tgt_store, empty)

    # foreign parquet (no recorded parameters) refuses actionably
    foreign = str(tmp_path / "foreign")
    spark.createDataFrame([(0, 1)], "b long, k long").write.parquet(foreign)
    with pytest.raises(ValueError, match="dsir_counts_batch"):
        inc.read_dsir_counts(spark, foreign)


def test_stream_dsir_counts_end_to_end(spark, tmp_path):
    """Real availableNow stream: per-file micro-batches build the raw
    count store; the refit model equals dsir_fit over the batch
    union."""
    from etl_workflow_spark.operators.text import dsir_fit

    src = str(tmp_path / "dsrc")
    store = str(tmp_path / "dstore")
    ckpt = str(tmp_path / "dckpt")
    d1 = spark.createDataFrame(
        [(1, "the parser read the buffer twice")], ["doc_id", "text"])
    d2 = spark.createDataFrame(
        [(2, "a socket fed the kernel queue")], ["doc_id", "text"])
    d1.coalesce(1).write.parquet(src)
    d2.coalesce(1).write.mode("append").parquet(src)
    t = spark.createDataFrame(
        [(10, "the harbor mist hid the ferry")], ["doc_id", "text"])
    tgt_store = str(tmp_path / "dtgt")
    inc.dsir_counts_batch(t, tgt_store, 0, n=2, buckets=256)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        inc.stream_dsir_counts(stream, store, ckpt, n=2, buckets=256)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in time"
    got = inc.dsir_fit_from_stores(spark, tgt_store, store)
    want = dsir_fit(d1.unionByName(d2), t, n=2, buckets=256)
    assert got == want


def test_pq_store_id_col_resolution_and_tiebreak(spark, sf_dir, tmp_path):
    """ADVICE r9: the last-write-wins window must key on the REAL id
    column — explicit id_col is honored, a reserved-named first column
    is refused instead of guessed around, and duplicate ids within ONE
    batch resolve deterministically (tie-break on cell/codes, not
    partition order)."""
    import pytest

    from etl_workflow_spark.operators import similarity as S
    from etl_workflow_spark.streaming.incremental import _pq_store_id_col

    # resolution unit cases
    cols = ["vec_id", "cell", "codes", "model_id", "batch_id"]
    assert _pq_store_id_col(cols, None) == "vec_id"
    assert _pq_store_id_col(cols, "vec_id") == "vec_id"
    with pytest.raises(ValueError, match="not in the store"):
        _pq_store_id_col(cols, "nope")
    with pytest.raises(ValueError, match="pass id_col explicitly"):
        _pq_store_id_col(["cell", "codes", "model_id"], None)

    # deterministic within-batch duplicate: craft one batch holding
    # the same id twice with different vectors; both reads agree and
    # pick the (cell, codes)-minimal row
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = S.pq_fit(emb, n_cells=4, m_sub=8, ksub=16)
    dup = spark.createDataFrame(
        [(7, [1.0] * 64), (7, [-1.0] * 64), (8, [0.5] * 64)],
        "vec_id long, embedding array<double>",
    )
    store = str(tmp_path / "pqdup")
    inc.pq_index_batch(dup, store, 0, model)
    a = {(r["vec_id"], r["cell"], tuple(r["codes"])) for r in
         inc.read_pq_index(spark, store, model).collect()}
    b = {(r["vec_id"], r["cell"], tuple(r["codes"])) for r in
         inc.read_pq_index(spark, store, model, id_col="vec_id").collect()}
    assert a == b and len(a) == 2
    rows7 = sorted(t for t in a if t[0] == 7)
    # the survivor is the (cell, codes)-ascending minimum of the two
    enc = {(r["cell"], tuple(r["codes"])) for r in
           S.pq_index(dup, model).where("vec_id = 7").collect()}
    assert (7, *min(enc)) == rows7[0]


def test_imi_index_store_matches_batch_and_replays(spark, sf_dir, tmp_path):
    """IMI store (the PQ-store contract, r10): fragments merge to the
    one-pass assignment of the full corpus; a replayed batch
    overwrites its own partition; imi_topk over the store equals
    imi_topk over a direct index; mixed-model fragments are refused;
    redelivered ids keep the newest assignment; compaction preserves
    the read exactly; a real availableNow stream lands fragments."""
    import pytest

    from etl_workflow_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = emb.where("vec_id < 250")
    b2 = emb.where("vec_id >= 250")
    model = S.imi_fit(emb, n_cells=8)
    store = str(tmp_path / "imistore")
    inc.imi_index_batch(b1, store, 0, model)
    inc.imi_index_batch(b2, store, 1, model)
    inc.imi_index_batch(b2, store, 1, model)  # replay: same partition
    got = {(r["vec_id"], r["cell_a"], r["cell_b"])
           for r in inc.read_imi_index(spark, store, model).collect()}
    want = {(r["vec_id"], r["cell_a"], r["cell_b"])
            for r in S.imi_index(emb, model).collect()}
    assert got == want
    # probe equality over the store
    q = emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id")
    direct = {(r["query_id"], r["neighbor_id"]) for r in S.imi_topk(
        S.imi_index(emb, model), q, model, emb, k=5, n_probe_pairs=24
    ).collect()}
    stored = {(r["query_id"], r["neighbor_id"]) for r in S.imi_topk(
        inc.read_imi_index(spark, store, model), q, model, emb,
        k=5, n_probe_pairs=24,
    ).collect()}
    assert stored == direct
    # mixed-model fragments refused
    other = S.imi_fit(emb, n_cells=4)
    inc.imi_index_batch(b1.limit(10), store, 2, other)
    with pytest.raises(ValueError, match="assigned under model"):
        inc.read_imi_index(spark, store, model)

    # redelivery: newest batch wins; compaction preserves the read
    store2 = str(tmp_path / "imistore2")
    inc.imi_index_batch(emb.where("vec_id < 300"), store2, 0, model)
    shifted = emb.where("vec_id < 60").selectExpr(
        "vec_id", "transform(embedding, x -> -x) as embedding"
    )
    inc.imi_index_batch(shifted, store2, 1, model)
    before = {(r["vec_id"], r["cell_a"], r["cell_b"])
              for r in inc.read_imi_index(spark, store2, model).collect()}
    new_assign = {(r["vec_id"], r["cell_a"], r["cell_b"])
                  for r in S.imi_index(shifted, model).collect()}
    assert new_assign <= before
    inc.compact_imi_index(spark, store2, before_batch_id=2)
    after = {(r["vec_id"], r["cell_a"], r["cell_b"])
             for r in inc.read_imi_index(spark, store2, model).collect()}
    assert after == before

    # store written by the plain writer (no model_id) is refused
    store3 = str(tmp_path / "imistore3")
    S.imi_index(emb.limit(10), model).withColumn(
        "batch_id", F.lit(0)
    ).write.partitionBy("batch_id").parquet(store3)
    with pytest.raises(ValueError, match="no model_id"):
        inc.read_imi_index(spark, store3, model)
    assert inc.read_imi_index(spark, store3).count() == 10  # unguarded ok

    # real availableNow stream
    src = str(tmp_path / "src")
    emb.where("vec_id < 120").write.parquet(src)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(src)
    store4 = str(tmp_path / "imistore4")
    qh = (
        inc.stream_imi_index(
            stream, store4, str(tmp_path / "ckpt"), model
        )
        .trigger(availableNow=True)
        .start()
    )
    qh.awaitTermination(120)
    got4 = {(r["vec_id"], r["cell_a"], r["cell_b"])
            for r in inc.read_imi_index(spark, store4, model).collect()}
    want4 = {(r["vec_id"], r["cell_a"], r["cell_b"])
             for r in S.imi_index(emb.where("vec_id < 120"), model).collect()}
    assert got4 == want4


def test_text_index_store_matches_batch_and_replays(spark, sf_dir, tmp_path):
    """BM25 postings store (the PQ-store contract, r11): fragments
    merge to the one-pass index of the full corpus; a replayed batch
    overwrites its own partition; bm25_topk over the store equals
    bm25_topk over the corpus; a re-delivered document's OLD postings
    disappear (per-doc last-write-wins, not per-row); within-batch
    duplicate ids collapse deterministically; compaction preserves
    the read; a real availableNow stream lands fragments."""
    import pytest

    from etl_workflow_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    b1 = docs.where("doc_id < 250")
    b2 = docs.where("doc_id >= 250")
    store = str(tmp_path / "textstore")
    inc.text_index_batch(b1, store, 0)
    inc.text_index_batch(b2, store, 1)
    inc.text_index_batch(b2, store, 1)  # replay: same partition
    got = {tuple(r) for r in inc.read_text_index(spark, store).collect()}
    want = {tuple(r) for r in T.build_text_index(docs).collect()}
    assert got == want
    # query equality over the store
    qs = ["hash join merge", "slow query filter"]
    direct = {
        (r["query"], r["doc_id"], r["score_e4"], r["rank"])
        for r in T.bm25_topk(docs, qs, k=5).collect()
    }
    stored = {
        (r["query"], r["doc_id"], r["score_e4"], r["rank"])
        for r in T.bm25_topk(
            None, qs, k=5, postings=inc.read_text_index(spark, store)
        ).collect()
    }
    assert stored == direct

    # re-delivery: the doc's new text fully replaces its old postings
    upd = spark.createDataFrame(
        [(0, "zzznewterm only")], "doc_id long, text string"
    )
    inc.text_index_batch(upd, store, 2)
    cur = inc.read_text_index(spark, store)
    d0 = {(r["term"], r["tf"], r["dl"]) for r in cur.where(
        "doc_id = 0").collect()}
    assert d0 == {("zzznewterm", 1, 2), ("only", 1, 2)}
    # every other doc is untouched
    assert cur.count() == len(want) - sum(
        1 for w in want if w[1] == 0
    ) + 2

    # within-batch duplicate ids collapse deterministically (max text)
    dup = spark.createDataFrame(
        [(7_000_000, "aaa"), (7_000_000, "bbb")],
        "doc_id long, text string",
    )
    store2 = str(tmp_path / "textstore2")
    inc.text_index_batch(dup, store2, 0)
    rows2 = inc.read_text_index(spark, store2).collect()
    assert {(r["term"], r["tf"]) for r in rows2} == {("bbb", 1)}

    # compaction: batches 0..1 collapse; the read is unchanged
    before = {tuple(r) for r in inc.read_text_index(spark, store).collect()}
    inc.compact_text_index(spark, store, before_batch_id=2)
    after = {tuple(r) for r in inc.read_text_index(spark, store).collect()}
    assert after == before
    frag_ids = {
        r["batch_id"]
        for r in spark.read.parquet(store).select("batch_id")
        .distinct().collect()
    }
    assert frag_ids == {-1, 2}

    # ambiguous id inference is refused
    two_extra = spark.read.parquet(store).withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="doc-id column"):
        inc._text_store_id_col(two_extra.columns, None)

    # real availableNow stream
    src = str(tmp_path / "src")
    docs.where("doc_id < 120").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    store4 = str(tmp_path / "textstore4")
    qh = (
        inc.stream_text_index(stream, store4, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    qh.awaitTermination(120)
    got4 = {tuple(r) for r in inc.read_text_index(spark, store4).collect()}
    want4 = {
        tuple(r)
        for r in T.build_text_index(docs.where("doc_id < 120")).collect()
    }
    assert got4 == want4


def test_text_index_store_positional_layout(spark, sf_dir, tmp_path):
    """Positional store layout (r11): fragments merge to the one-pass
    positional index, re-delivery replaces per-doc, and phrase_topk
    over the store equals phrase_topk over the corpus."""
    from etl_workflow_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    store = str(tmp_path / "posstore")
    inc.text_index_batch(docs.where("doc_id < 250"), store, 0,
                         positional=True)
    inc.text_index_batch(docs.where("doc_id >= 250"), store, 1,
                         positional=True)
    got = {tuple(r) for r in inc.read_text_index(spark, store).collect()}
    want = {tuple(r) for r in T.build_positional_index(docs).collect()}
    assert got == want
    PH = ["order fast", "window join stream"]
    direct = sorted(
        tuple(r) for r in T.phrase_topk(docs, PH, k=5).collect()
    )
    stored = sorted(
        tuple(r)
        for r in T.phrase_topk(
            None, PH, k=5, postings=inc.read_text_index(spark, store)
        ).collect()
    )
    assert stored == direct
    # re-delivery: doc 0's new positions fully replace the old
    inc.text_index_batch(
        spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string"),
        store, 2, positional=True,
    )
    d0 = {
        (r["term"], r["pos"])
        for r in inc.read_text_index(spark, store)
        .where("doc_id = 0").collect()
    }
    assert d0 == {("alpha", 0), ("beta", 1)}
    # compaction preserves the read
    before = {tuple(r) for r in inc.read_text_index(spark, store).collect()}
    inc.compact_text_index(spark, store, before_batch_id=3)
    after = {tuple(r) for r in inc.read_text_index(spark, store).collect()}
    assert after == before


def test_bigram_store_collocations_match_batch(spark, sf_dir, tmp_path):
    """Bigram count store (r11): store-fed PMI equals the batch
    collocations byte-for-byte on the same ingested rows; replay
    overwrites; compaction preserves the read; non-lowercase vocab
    stores are refused; a real availableNow stream lands fragments."""
    import pytest

    from etl_workflow_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bstore = str(tmp_path / "bigrams")
    vstore = str(tmp_path / "vocab")
    for bid, part in ((0, "doc_id < 250"), (1, "doc_id >= 250")):
        inc.bigram_rollup_batch(docs.where(part), bstore, bid)
        inc.vocab_rollup_batch(docs.where(part), vstore, bid)
    inc.bigram_rollup_batch(docs.where("doc_id >= 250"), bstore, 1)  # replay
    want = [
        tuple(r) for r in T.collocations(docs, k=25, min_count=5).collect()
    ]
    got = [
        tuple(r)
        for r in inc.collocations_from_stores(
            spark, bstore, vstore, k=25, min_count=5
        ).collect()
    ]
    assert got == want and len(got) == 25
    # compaction preserves the answer
    inc.compact_bigram_store(spark, bstore, before_batch_id=2)
    after = [
        tuple(r)
        for r in inc.collocations_from_stores(
            spark, bstore, vstore, k=25, min_count=5
        ).collect()
    ]
    assert after == want
    frag_ids = {
        r["batch_id"]
        for r in spark.read.parquet(bstore).select("batch_id")
        .distinct().collect()
    }
    assert frag_ids == {-1}
    # non-lowercase vocab store refused
    vstore2 = str(tmp_path / "vocab_cased")
    inc.vocab_rollup_batch(docs, vstore2, 0, lowercase=False)
    with pytest.raises(ValueError, match="LOWERCASE"):
        inc.collocations_from_stores(spark, bstore, vstore2)
    # real availableNow stream
    src = str(tmp_path / "src_bi")
    docs.where("doc_id < 120").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    bstore3 = str(tmp_path / "bigrams_stream")
    qh = (
        inc.stream_bigram_rollup(stream, bstore3, str(tmp_path / "ckpt_bi"))
        .trigger(availableNow=True)
        .start()
    )
    qh.awaitTermination(120)
    got3 = {
        (r["w1"], r["w2"]): r["n_pair"]
        for r in inc.read_bigram_store(spark, bstore3).collect()
    }
    want3 = {
        (r["w1"], r["w2"]): r["n_pair"]
        for r in T.adjacent_bigram_counts(
            docs.where("doc_id < 120")
        ).collect()
    }
    assert got3 == want3


def test_text_index_store_term_pruned_layout(spark, sf_dir, tmp_path):
    """Term-clustered store layout (r12): fragments are written
    range-partitioned + sorted on term, so parquet min/max stats let
    a rare-term probe skip almost every file/row group — previously
    the store was term-random and every BM25/phrase probe read the
    whole store. Asserts (a) within-file row groups are term-runs,
    (b) files in one fragment have disjoint term ranges, (c) probed
    bytes for rare terms are a small fraction of the store, (d) the
    layout change does not alter store content, batch or compacted."""
    import glob

    import pyarrow.parquet as pq

    from etl_workflow_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    store = str(tmp_path / "sorted_store")
    # test-scale fragments are tiny, so AQE would coalesce the range
    # shuffle to ONE file and make every pruning assertion vacuous; at
    # production fragment sizes the coalesce target (64 MB) keeps
    # files numerous and disjoint, so disabling it here reproduces the
    # at-scale file layout, not a different one
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        inc.text_index_batch(docs.where("doc_id < 250"), store, 0)
        inc.text_index_batch(docs.where("doc_id >= 250"), store, 1)
    finally:
        spark.conf.set(coalesce_key, prev)
    want = {tuple(r) for r in T.build_text_index(docs).collect()}

    def ranges(fragment_glob):
        """[(file, rg_bytes, term_min, term_max)] for every row group."""
        out = []
        for f in sorted(glob.glob(fragment_glob)):
            md = pq.ParquetFile(f).metadata
            ti = md.schema.names.index("term")
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                st = rg.column(ti).statistics
                assert st is not None and st.has_min_max
                out.append((f, rg.total_byte_size, st.min, st.max))
        return out

    def check_layout(fragment_glob):
        rgs = ranges(fragment_glob)
        assert rgs
        # (a) within a file, row groups form ascending term runs
        per_file: dict[str, list] = {}
        for f, _, lo, hi in rgs:
            assert lo <= hi
            per_file.setdefault(f, []).append((lo, hi))
        for spans in per_file.values():
            for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
                assert hi_prev <= lo_next
        # (b) files cover disjoint term ranges (a term maps to exactly
        # one range partition; only a hot term split by the id
        # tiebreak may share a boundary)
        file_spans = sorted(
            (min(lo for lo, _ in v), max(hi for _, hi in v))
            for v in per_file.values()
        )
        for (_, hi_prev), (lo_next, _) in zip(file_spans, file_spans[1:]):
            assert hi_prev <= lo_next
        return rgs

    check_layout(f"{store}/batch_id=0/*.parquet")
    check_layout(f"{store}/batch_id=1/*.parquet")

    # (c) probed bytes: the fraction of the store a rare-term probe
    # must read (row groups whose [min,max] covers the term)
    from pyspark.sql import functions as F

    cur = inc.read_text_index(spark, store)
    rare = [
        r["term"]
        for r in cur.groupBy("term").agg(F.count("*").alias("n"))
        .orderBy("n", "term").limit(5).collect()
    ]
    assert rare
    rgs = ranges(f"{store}/batch_id=*/*.parquet")
    total = sum(b for _, b, _, _ in rgs)
    fractions = []
    for t in rare:
        probed = sum(b for _, b, lo, hi in rgs if lo <= t <= hi)
        # the unsorted r11 layout probed 100% for every term; the
        # test-scale vocabulary is tiny so each range file still
        # covers a visible slice — at production vocabulary sizes the
        # covered fraction is ~1/n_files
        assert probed < total * 0.5, (t, probed, total)
        fractions.append(probed / total)
    assert sum(fractions) / len(fractions) < 0.35, fractions

    # (d) content is unchanged by the layout, and survives compaction
    got = {tuple(r) for r in cur.collect()}
    assert got == want
    spark.conf.set(coalesce_key, "false")
    try:
        inc.compact_text_index(spark, store, before_batch_id=2)
    finally:
        spark.conf.set(coalesce_key, prev)
    check_layout(f"{store}/batch_id=-1/*.parquet")
    after = {tuple(r) for r in inc.read_text_index(spark, store).collect()}
    assert after == want

    # positional layout gets the same clustering
    pstore = str(tmp_path / "sorted_pos")
    spark.conf.set(coalesce_key, "false")
    try:
        inc.text_index_batch(docs, pstore, 0, positional=True)
    finally:
        spark.conf.set(coalesce_key, prev)
    check_layout(f"{pstore}/batch_id=0/*.parquet")
    pgot = {tuple(r) for r in inc.read_text_index(spark, pstore).collect()}
    pwant = {tuple(r) for r in T.build_positional_index(docs).collect()}
    assert pgot == pwant


def test_sample_store_matches_batch_and_replays(spark, sf_dir, tmp_path):
    """Uniform sample store (r12): per-batch local top-k fragments
    re-cut to the exact global_sample_k of everything delivered;
    replayed batches overwrite their own fragment; re-delivered keys
    never duplicate; a larger read-k than write-k is refused;
    compaction preserves the read and bounds rows; a real availableNow
    stream lands fragments."""
    import pytest

    from etl_workflow_spark.operators import sampling as SAMP

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    store = str(tmp_path / "samplestore")
    inc.sample_rollup_batch(docs.where("doc_id < 200"), store, 0, k=50)
    inc.sample_rollup_batch(docs.where("doc_id >= 200"), store, 1, k=50)
    inc.sample_rollup_batch(docs.where("doc_id >= 200"), store, 1, k=50)
    got = {r["doc_id"] for r in inc.read_sample_store(spark, store).collect()}
    want = {r["doc_id"] for r in SAMP.global_sample_k(docs, 50).collect()}
    assert got == want and len(got) == 50
    # smaller read-k is the global prefix; larger is refused
    got10 = {r["doc_id"]
             for r in inc.read_sample_store(spark, store, k=10).collect()}
    want10 = {r["doc_id"] for r in SAMP.global_sample_k(docs, 10).collect()}
    assert got10 == want10
    with pytest.raises(ValueError, match="exceeds the store's"):
        inc.read_sample_store(spark, store, k=51)
    # re-delivered key: membership exact, no duplicate rows
    sampled_id = sorted(got)[0]
    upd = spark.createDataFrame(
        [(sampled_id, "fresh text")], "doc_id long, text string"
    )
    inc.sample_rollup_batch(upd, store, 2, k=50)
    cur = inc.read_sample_store(spark, store).collect()
    assert {r["doc_id"] for r in cur} == want
    assert sum(1 for r in cur if r["doc_id"] == sampled_id) == 1
    # the re-delivered key's payload refreshed (it made batch 2's top-k
    # trivially — it was the only row)
    assert next(
        r["text"] for r in cur if r["doc_id"] == sampled_id
    ) == "fresh text"
    # a key delivered twice WITHIN one micro-batch (r12 ADVICE): it
    # must neither appear twice in the read sample nor consume two of
    # the k slots — the fragment dedups by key before its local cut
    store_dup = str(tmp_path / "dupstore")
    dup_batch = spark.createDataFrame(
        [(1, "first copy"), (1, "second copy"), (2, "b"), (3, "c"),
         (4, "d")],
        "doc_id long, text string",
    )
    inc.sample_rollup_batch(dup_batch, store_dup, 0, k=3)
    dup_read = inc.read_sample_store(spark, store_dup).collect()
    dup_keys = [r["doc_id"] for r in dup_read]
    assert len(dup_keys) == 3 and len(set(dup_keys)) == 3
    want_dup = {r["doc_id"] for r in SAMP.global_sample_k(
        dup_batch.dropDuplicates(["doc_id"]), 3).collect()}
    assert set(dup_keys) == want_dup
    # mixed write-k stores are refused loudly
    store_bad = str(tmp_path / "badstore")
    inc.sample_rollup_batch(docs.where("doc_id < 100"), store_bad, 0, k=10)
    inc.sample_rollup_batch(docs.where("doc_id >= 100"), store_bad, 1, k=20)
    with pytest.raises(ValueError, match="different k"):
        inc.read_sample_store(spark, store_bad)
    # mixed salts too (r12 review fix): hashes from different salts
    # are incomparable draws — a silent union re-cut would be biased
    store_salt = str(tmp_path / "saltstore")
    inc.sample_rollup_batch(docs.where("doc_id < 100"), store_salt, 0,
                            k=10, salt="a")
    inc.sample_rollup_batch(docs.where("doc_id >= 100"), store_salt, 1,
                            k=10, salt="b")
    with pytest.raises(ValueError, match="different salts"):
        inc.read_sample_store(spark, store_salt)
    # compaction: closed fragments collapse to ONE k-row fragment
    before = {r["doc_id"]
              for r in inc.read_sample_store(spark, store).collect()}
    inc.compact_sample_store(spark, store, before_batch_id=2)
    after = {r["doc_id"]
             for r in inc.read_sample_store(spark, store).collect()}
    assert after == before
    frag = spark.read.parquet(store)
    assert frag.where("batch_id = -1").count() <= 50
    assert {r["batch_id"] for r in
            frag.select("batch_id").distinct().collect()} == {-1, 2}
    # real availableNow stream
    src = str(tmp_path / "ssrc")
    docs.where("doc_id < 150").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    store4 = str(tmp_path / "samplestore4")
    qh = (
        inc.stream_sample_rollup(stream, store4, str(tmp_path / "ckpt"),
                                 k=25)
        .trigger(availableNow=True)
        .start()
    )
    qh.awaitTermination(120)
    got4 = {r["doc_id"]
            for r in inc.read_sample_store(spark, store4).collect()}
    want4 = {r["doc_id"] for r in SAMP.global_sample_k(
        docs.where("doc_id < 150"), 25).collect()}
    assert got4 == want4


def test_drift_store_matches_inline_corpus_drift(spark, sf_dir, tmp_path):
    """Drift bucket store (r12): store-fed PSI between two batch
    windows equals the inline corpus_drift over the same document
    windows byte-for-byte (shared bucketing expression + shared
    driver arithmetic); replayed batches overwrite their fragment;
    mixed-modulus stores are refused; compaction preserves any
    reading that treats the compacted block as one window; a real
    availableNow stream lands fragments."""
    import pytest

    from etl_workflow_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    w_a = docs.where("doc_id % 3 = 0")
    w_b = docs.where("doc_id % 3 != 0")
    store = str(tmp_path / "driftstore")
    # window A = batches 0-1, window B = batches 2-3
    inc.drift_rollup_batch(w_a.where("doc_id < 300"), store, 0, buckets=64)
    inc.drift_rollup_batch(w_a.where("doc_id >= 300"), store, 1, buckets=64)
    inc.drift_rollup_batch(w_b.where("doc_id < 300"), store, 2, buckets=64)
    inc.drift_rollup_batch(w_b.where("doc_id >= 300"), store, 3, buckets=64)
    inc.drift_rollup_batch(w_b.where("doc_id >= 300"), store, 3, buckets=64)
    got = inc.corpus_drift_from_store(
        spark, store, "batch_id <= 1", "batch_id >= 2"
    ).collect()
    want = T.corpus_drift(w_a, w_b, buckets=64).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # compaction: batches 0..1 collapse; the same split still reads
    # (the compacted block IS window A)
    inc.compact_drift_store(spark, store, before_batch_id=2)
    got2 = inc.corpus_drift_from_store(
        spark, store, "batch_id = -1", "batch_id >= 2"
    ).collect()
    assert sorted(map(tuple, got2)) == sorted(map(tuple, want))
    # mixed bucket moduli refuse
    inc.drift_rollup_batch(docs.limit(10), store, 9, buckets=32)
    with pytest.raises(ValueError, match="bucket moduli"):
        inc.corpus_drift_from_store(spark, store, "batch_id < 9",
                                    "batch_id = 9")
    # real availableNow stream
    src = str(tmp_path / "dsrc")
    docs.where("doc_id < 120").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    store4 = str(tmp_path / "driftstore4")
    qh = (
        inc.stream_drift_rollup(stream, store4, str(tmp_path / "ckpt"),
                                buckets=64)
        .trigger(availableNow=True)
        .start()
    )
    qh.awaitTermination(120)
    frag = spark.read.parquet(store4)
    merged = {
        (r["bucket"], r["n"])
        for r in frag.groupBy("bucket").agg(
            F.sum("n").alias("n")).collect()
    }
    from etl_workflow_spark.operators.text import _term_bucket_counts

    direct = {
        (r["bucket"], r["n"])
        for r in _term_bucket_counts(
            docs.where("doc_id < 120"), "text", 64, "n").collect()
    }
    assert merged == direct


def test_lm_score_from_stores_matches_inline(spark, sf_dir, tmp_path):
    """Store-fed LM scoring (r12): scoring under the persisted
    vocab + bigram stores of the SAME corpus equals the self-fit
    inline lm_score byte-for-byte; a case-sensitive vocab store is
    refused (every token would silently go OOV)."""
    import pytest

    from etl_workflow_spark.operators.text import lm_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    vstore = str(tmp_path / "vstore")
    bstore = str(tmp_path / "bstore")
    inc.vocab_rollup_batch(docs.where("doc_id < 250"), vstore, 0)
    inc.vocab_rollup_batch(docs.where("doc_id >= 250"), vstore, 1)
    inc.bigram_rollup_batch(docs.where("doc_id < 250"), bstore, 0)
    inc.bigram_rollup_batch(docs.where("doc_id >= 250"), bstore, 1)
    got = {tuple(r) for r in inc.lm_score_from_stores(
        spark, docs, vstore, bstore).collect()}
    want = {tuple(r) for r in lm_score(docs).collect()}
    assert got == want
    # scoring a DIFFERENT corpus under the stored model runs (the
    # CCNet shape) and reports every doc
    other = spark.createDataFrame(
        [(900001, "zzz unseen words only"), (900002, None)],
        "doc_id long, text string",
    )
    o = {r["doc_id"]: r for r in inc.lm_score_from_stores(
        spark, other, vstore, bstore).collect()}
    assert o[900001]["n_pairs"] == 3 and o[900002]["n_pairs"] == 0
    # case-sensitive store refused
    vbad = str(tmp_path / "vbad")
    inc.vocab_rollup_batch(docs.limit(50), vbad, 0, lowercase=False)
    with pytest.raises(ValueError, match="lowercase vocab store"):
        inc.lm_score_from_stores(spark, docs, vbad, bstore)


def test_lm_score_backoff_from_stores_matches_inline(
    spark, sf_dir, tmp_path
):
    """Store-fed stupid-backoff scoring (r13): scoring under the
    persisted vocab + bigram + trigram stores of the SAME corpus
    equals the self-fit inline lm_score_backoff byte-for-byte;
    trigram-store compaction preserves the merged counts; a
    case-sensitive vocab store is refused."""
    import pytest

    from etl_workflow_spark.operators.text import (
        adjacent_trigram_counts,
        lm_score_backoff,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    vstore = str(tmp_path / "vstore")
    bstore = str(tmp_path / "bstore")
    tstore = str(tmp_path / "tstore")
    for lo, hi, b in ((0, 250, 0), (250, 10**9, 1)):
        part = docs.where(f"doc_id >= {lo} AND doc_id < {hi}")
        inc.vocab_rollup_batch(part, vstore, b)
        inc.bigram_rollup_batch(part, bstore, b)
        inc.trigram_rollup_batch(part, tstore, b)
    got = {tuple(r) for r in inc.lm_score_backoff_from_stores(
        spark, docs, vstore, bstore, tstore).collect()}
    want = {tuple(r) for r in lm_score_backoff(docs).collect()}
    assert got == want
    # compaction: merged counts unchanged, fragments collapse
    before = {tuple(r)
              for r in inc.read_trigram_store(spark, tstore).collect()}
    inc.compact_trigram_store(spark, tstore, before_batch_id=2)
    after = {tuple(r)
             for r in inc.read_trigram_store(spark, tstore).collect()}
    assert after == before
    assert {r["batch_id"] for r in spark.read.parquet(tstore)
            .select("batch_id").distinct().collect()} == {-1}
    # the store holds exactly the inline extraction
    assert before == {
        tuple(r) for r in adjacent_trigram_counts(docs).collect()
    }
    # case-sensitive store refused
    vbad = str(tmp_path / "vbad")
    inc.vocab_rollup_batch(docs.limit(50), vbad, 0, lowercase=False)
    with pytest.raises(ValueError, match="lowercase vocab"):
        inc.lm_score_backoff_from_stores(spark, docs, vbad, bstore, tstore)


def test_lm_score_kn_from_stores_matches_inline(spark, sf_dir, tmp_path):
    """Store-fed Kneser-Ney scoring (r13): the SAME two stores that
    feed the Laplace scorer hold the full KN model (continuation
    counts are distinct-neighbor counts over the bigram table), and
    store-fed equals the self-fit inline lm_score_kn byte-for-byte;
    case-sensitive vocab stores refused."""
    import pytest

    from etl_workflow_spark.operators.text import lm_score_kn

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    vstore = str(tmp_path / "vstore")
    bstore = str(tmp_path / "bstore")
    for lo, hi, b in ((0, 250, 0), (250, 10**9, 1)):
        part = docs.where(f"doc_id >= {lo} AND doc_id < {hi}")
        inc.vocab_rollup_batch(part, vstore, b)
        inc.bigram_rollup_batch(part, bstore, b)
    got = {tuple(r) for r in inc.lm_score_kn_from_stores(
        spark, docs, vstore, bstore).collect()}
    want = {tuple(r) for r in lm_score_kn(docs).collect()}
    assert got == want
    vbad = str(tmp_path / "vbad")
    inc.vocab_rollup_batch(docs.limit(50), vbad, 0, lowercase=False)
    with pytest.raises(ValueError, match="lowercase vocab"):
        inc.lm_score_kn_from_stores(spark, docs, vbad, bstore)


def test_ngram_store_and_backoff_n_from_stores(spark, sf_dir, tmp_path):
    """Generic n-gram stores (r13): order-4/5 rollups merge
    additively and feed lm_score_backoff_n_from_stores byte-equal to
    the inline self-fit; the named bigram/trigram stores plug into
    the same scorer (schema-detected); mixed-order stores and missing
    orders refuse loudly; compaction preserves the merged counts."""
    import pytest

    from etl_workflow_spark.operators.text import lm_score_backoff_n

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).where("doc_id < 300")
    vstore = str(tmp_path / "vstore")
    bstore = str(tmp_path / "bstore")
    tstore = str(tmp_path / "tstore")
    g4 = str(tmp_path / "g4store")
    g5 = str(tmp_path / "g5store")
    for lo, hi, b in ((0, 150, 0), (150, 10**9, 1)):
        part = docs.where(f"doc_id >= {lo} AND doc_id < {hi}")
        inc.vocab_rollup_batch(part, vstore, b)
        inc.bigram_rollup_batch(part, bstore, b)
        inc.trigram_rollup_batch(part, tstore, b)
        inc.ngram_rollup_batch(part, g4, b, n=4)
        inc.ngram_rollup_batch(part, g5, b, n=5)
    # order 5, all-generic stores above order 3 + legacy 2/3 stores
    got = {tuple(r) for r in inc.lm_score_backoff_n_from_stores(
        spark, docs, 5, vstore,
        {2: bstore, 3: tstore, 4: g4, 5: g5},
    ).collect()}
    want = {tuple(r) for r in lm_score_backoff_n(docs, order=5).collect()}
    assert got == want
    # compaction preserves the merged counts
    before = {tuple(r)
              for r in inc.read_ngram_store(spark, g4, 4).collect()}
    inc.compact_ngram_store(spark, g4, before_batch_id=2, n=4)
    after = {tuple(r)
             for r in inc.read_ngram_store(spark, g4, 4).collect()}
    assert after == before
    # min_count prunes AFTER the merge (global threshold, the
    # vocab-store rule) — the CCNet model-pruning knob
    pruned = inc.read_ngram_store(spark, g4, 4, min_count=2)
    assert pruned.where("n_gram < 2").count() == 0
    assert pruned.count() < len(before)
    merged_ge2 = {t for t in before if t[-1] >= 2}
    assert {tuple(r) for r in pruned.collect()} == merged_ge2
    # wrong-order read refused; mixed-order store refused
    with pytest.raises(ValueError, match="order"):
        inc.read_ngram_store(spark, g4, 5)
    mixed = str(tmp_path / "mixed")
    inc.ngram_rollup_batch(docs, mixed, 0, n=4)
    inc.ngram_rollup_batch(docs, mixed, 1, n=5)
    with pytest.raises(ValueError, match="order"):
        inc.read_ngram_store(spark, mixed, 4)
    # missing order refused before any work
    with pytest.raises(ValueError, match="missing"):
        inc.lm_score_backoff_n_from_stores(
            spark, docs, 5, vstore, {2: bstore, 3: tstore, 5: g5}
        )
    # a non-count store refused by schema detection
    with pytest.raises(ValueError, match="not an order"):
        inc.lm_score_backoff_n_from_stores(
            spark, docs, 2, vstore, {2: vstore}
        )


def test_image_fingerprint_store_and_probe(spark, tmp_path):
    """Image fingerprint store (r13): per-batch exactly-once
    fragments of perceptual hashes; the probe hashes a NEW batch
    under the store's RECORDED config and bands it against the
    corpus fingerprints (payloads decoded once, at ingest); replays
    overwrite; re-ingested keys are last-write-wins; mixed-config
    stores refuse; a real availableNow stream lands fragments."""
    import pytest

    from etl_workflow_spark.operators import multimodal as M

    def block_png(i, poke=False):
        w, h = 36, 32
        buf = bytearray()
        for py in range(h):
            for px in range(w):
                v = 200 if ((px // 4 + py // 4 + i) % 2) else 40
                buf += bytes((v, v, v))
        if poke:
            j = (1 * 36 + 1) * 3
            buf[j:j + 3] = bytes((buf[j] + 1,) * 3)
        return bytearray(M._png_encode(w, h, 3, bytes(buf)))

    corpus = spark.createDataFrame(
        [(1, block_png(0)), (2, block_png(1))],
        "doc_id long, payload binary",
    )
    store = str(tmp_path / "fpstore")
    inc.dhash_rollup_batch(corpus.where("doc_id = 1"), store, 0)
    inc.dhash_rollup_batch(corpus.where("doc_id = 2"), store, 1)
    inc.dhash_rollup_batch(corpus.where("doc_id = 2"), store, 1)  # replay
    fps, method, hs = inc.read_fingerprint_store(spark, store)
    assert (method, hs) == ("dhash", 8)
    want = {(r["doc_id"], r["dhash"])
            for r in M.dhash_media(corpus, allow_fake=False).collect()}
    assert {(r["doc_id"], r["fp"]) for r in fps.collect()} == want
    # probe: a near-dup of doc 1 hits it; a fresh pattern misses
    grad = bytearray(M._png_encode(36, 32, 3, bytes(
        b for py in range(32) for px in range(36)
        for b in (((7 * px + 13 * py) % 161 + 40),) * 3
    )))
    batch = spark.createDataFrame(
        [(30, block_png(0, poke=True)), (31, grad)],
        "doc_id long, payload binary",
    )
    hits = {(r["doc_a"], r["doc_b"])
            for r in inc.image_neardup_probe(spark, batch, store).collect()}
    assert (30, 1) in hits
    assert not any(a == 31 for a, _ in hits)
    # keep-first-ingest dedup decision: anti-join drops the near-dup
    losers = inc.image_neardup_probe(spark, batch, store).select(
        F.col("doc_a").alias("doc_id")
    )
    kept = {r["doc_id"]
            for r in batch.join(losers, "doc_id", "left_anti").collect()}
    assert kept == {31}
    # mixed-config store refused
    inc.dhash_rollup_batch(corpus, store, 2, method="phash")
    with pytest.raises(ValueError, match="mixes hash"):
        inc.read_fingerprint_store(spark, store)
    # empty store refused loudly
    with pytest.raises(Exception):
        inc.image_neardup_probe(
            spark, batch, str(tmp_path / "nostore")
        )
    # real availableNow stream
    src = str(tmp_path / "imgsrc")
    corpus.write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, payload binary"
    ).parquet(src)
    store2 = str(tmp_path / "fpstore2")
    qh = (
        inc.stream_dhash_rollup(stream, store2, str(tmp_path / "ickpt"))
        .trigger(availableNow=True)
        .start()
    )
    qh.awaitTermination(120)
    fps2, _, _ = inc.read_fingerprint_store(spark, store2)
    assert {(r["doc_id"], r["fp"]) for r in fps2.collect()} == want


def test_compact_fingerprint_store_preserves_reads(spark, tmp_path):
    """r14: fingerprint-store compaction collapses closed fragments to
    batch_id=-1 with per-key last-write-wins applied at compaction —
    read_fingerprint_store and the probe return byte-identical results
    before and after; open fragments stay; the video layout's
    (doc_id, frame_idx) keys compact per frame."""
    docs = spark.createDataFrame(
        [(1, bytearray(b"img one")), (2, bytearray(b"img two"))],
        "doc_id long, payload binary",
    )
    store = str(tmp_path / "cstore")
    inc.dhash_rollup_batch(docs.where("doc_id = 1"), store, 0)
    # re-ingest doc 1 (last-write-wins target) + doc 2, then an OPEN batch
    inc.dhash_rollup_batch(docs, store, 1)
    inc.dhash_rollup_batch(
        spark.createDataFrame(
            [(3, bytearray(b"img three"))], "doc_id long, payload binary"
        ),
        store, 2,
    )
    before_fps, method, hs = inc.read_fingerprint_store(spark, store)
    before = sorted(map(tuple, before_fps.collect()))
    inc.compact_fingerprint_store(spark, store, before_batch_id=2)
    after_fps, method2, hs2 = inc.read_fingerprint_store(spark, store)
    assert sorted(map(tuple, after_fps.collect())) == before
    assert (method2, hs2) == (method, hs)
    # closed fragments collapsed, the open one kept
    bids = {r["batch_id"] for r in spark.read.parquet(store)
            .select("batch_id").distinct().collect()}
    assert bids == {-1, 2}
    # video layout: per-(doc, frame) keys survive compaction
    vstore = str(tmp_path / "cvstore")
    frames = spark.createDataFrame(
        [(10, 0, 111), (10, 2, 222)],
        "doc_id long, frame_idx int, fp long",
    )
    inc.write_fingerprint_fragment(
        frames, vstore, 0, "dhash", 8, extra=("frame_idx",)
    )
    inc.write_fingerprint_fragment(
        frames.where("frame_idx = 0").withColumn("fp", F.lit(999)),
        vstore, 1, "dhash", 8, extra=("frame_idx",),
    )
    inc.compact_fingerprint_store(spark, vstore, before_batch_id=2)
    rows = {(r["doc_id"], r["frame_idx"]): r["fp"]
            for r in spark.read.parquet(vstore).collect()}
    assert rows == {(10, 0): 999, (10, 2): 222}


def test_audio_fingerprint_store_and_probe(spark, tmp_path):
    """Audio fingerprint store (r14): per-batch exactly-once fragments
    of Haitsma–Kalker frame fingerprints with the analysis grid
    recorded in the config columns; the probe fingerprints a NEW
    batch under the store's RECORDED grid and bands it against the
    corpus frames (payloads parsed once, at ingest), aggregated per
    clip pair; replays overwrite; mixed-grid and non-audio stores
    refuse; a real availableNow stream lands fragments."""
    import io
    import random
    import struct
    import wave

    import pytest

    from etl_workflow_spark.operators import multimodal as M

    def wav(seed, extra=0):
        rnd, xr = random.Random(seed), random.Random(99)
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"".join(
            struct.pack("<h", max(-32768, min(
                32767,
                rnd.randint(-12000, 12000)
                + (xr.randint(-extra, extra) if extra else 0),
            )))
            for _ in range(8000)
        ))
        w.close()
        return bytearray(buf.getvalue())

    grid = dict(frame_size=256, hop=128, n_bands=32)
    corpus = spark.createDataFrame(
        [(1, wav(1)), (2, wav(2))], "doc_id long, payload binary"
    )
    store = str(tmp_path / "astore")
    inc.audio_rollup_batch(corpus.where("doc_id = 1"), store, 0, **grid)
    inc.audio_rollup_batch(corpus.where("doc_id = 2"), store, 1, **grid)
    inc.audio_rollup_batch(  # replay overwrites its own fragment
        corpus.where("doc_id = 2"), store, 1, **grid
    )
    fps, fs_, hop_, nb_ = inc.read_audio_fingerprint_store(spark, store)
    assert (fs_, hop_, nb_) == (256, 128, 32)
    want = {
        (r["doc_id"], r["frame_idx"], r["afp"])
        for r in M.audio_fingerprint(
            corpus, allow_fake=False, **grid
        ).collect()
    }
    assert {
        (r["doc_id"], r["frame_idx"], r["fp"]) for r in fps.collect()
    } == want

    # probe: a noisy re-take of clip 1 hits it on ~every frame; a
    # fresh clip misses; the threshold gates the pair
    batch = spark.createDataFrame(
        [(30, wav(1, extra=400)), (31, wav(3))],
        "doc_id long, payload binary",
    )
    hits = {
        (r["doc_a"], r["doc_b"]): r["n_matching_frames"]
        for r in inc.audio_neardup_probe(spark, batch, store).collect()
    }
    assert set(hits) == {(30, 1)} and hits[(30, 1)] >= 50
    assert inc.audio_neardup_probe(
        spark, batch, store, min_matching_frames=hits[(30, 1)] + 1
    ).count() == 0
    # keep-first-ingest decision: anti-join drops the near-dup
    losers = inc.audio_neardup_probe(spark, batch, store).select(
        F.col("doc_a").alias("doc_id")
    )
    kept = {r["doc_id"]
            for r in batch.join(losers, "doc_id", "left_anti").collect()}
    assert kept == {31}

    # mixed-grid store refused; image stores are not audio stores
    inc.audio_rollup_batch(
        corpus, store, 2, frame_size=256, hop=64, n_bands=32
    )
    with pytest.raises(ValueError, match="mixes analysis grids"):
        inc.read_audio_fingerprint_store(spark, store)
    imgstore = str(tmp_path / "imgstore")
    inc.dhash_rollup_batch(corpus, imgstore, 0)
    with pytest.raises(ValueError, match="not an audio fingerprint"):
        inc.read_audio_fingerprint_store(spark, imgstore)
    with pytest.raises(Exception):
        inc.audio_neardup_probe(
            spark, batch, str(tmp_path / "nostore")
        )
    with pytest.raises(ValueError, match="min_matching_frames"):
        inc.audio_neardup_probe(
            spark, batch, store, min_matching_frames=0
        )

    # real availableNow stream
    srcdir = str(tmp_path / "audsrc")
    corpus.write.parquet(srcdir)
    stream = spark.readStream.schema(
        "doc_id long, payload binary"
    ).parquet(srcdir)
    store2 = str(tmp_path / "astore2")
    qh = (
        inc.stream_audio_rollup(
            stream, store2, str(tmp_path / "ackpt"), **grid
        )
        .trigger(availableNow=True)
        .start()
    )
    qh.awaitTermination(120)
    fps2, _, _, _ = inc.read_audio_fingerprint_store(spark, store2)
    assert {
        (r["doc_id"], r["frame_idx"], r["fp"]) for r in fps2.collect()
    } == want


def test_video_fingerprint_store_and_probe(spark, tmp_path):
    """Video fingerprint store (r14): per-batch exactly-once
    per-frame fragments with (method, hash_size, every_n) recorded as
    '<method>@<every_n>'; the probe frame-samples + hashes a NEW
    batch under the store's RECORDED config and bands frame keys
    against the corpus, aggregated per clip pair; replays overwrite;
    mixed/non-video stores refuse; image probes refuse video stores;
    a real availableNow stream lands fragments."""
    import pytest

    from etl_workflow_spark.operators import multimodal as M

    vid_a = b"opaque video payload A"
    vid_b = b"opaque video payload B"
    corpus = spark.createDataFrame(
        [(1, bytearray(vid_a)), (2, bytearray(vid_b))],
        "doc_id long, payload binary",
    )
    store = str(tmp_path / "vstore")
    inc.video_rollup_batch(corpus.where("doc_id = 1"), store, 0)
    inc.video_rollup_batch(corpus.where("doc_id = 2"), store, 1)
    inc.video_rollup_batch(  # replay overwrites its own fragment
        corpus.where("doc_id = 2"), store, 1
    )
    fps, method, hs, every_n = inc.read_video_fingerprint_store(
        spark, store
    )
    assert (method, hs, every_n) == ("dhash", 8, 2)
    # store == inline pairing-chain fingerprints (fake chain)
    frames = M.sample_frames(corpus)
    keyed = frames.select(
        F.concat_ws("#", "doc_id", "frame_idx").alias("k"),
        F.col("frame_payload").alias("payload"),
    )
    want = {
        (int(r["k"].split("#")[0]), int(r["k"].split("#")[1]),
         r["dhash"])
        for r in M.dhash_media(keyed, id_col="k").collect()
    }
    assert {
        (r["doc_id"], r["frame_idx"], r["fp"]) for r in fps.collect()
    } == want

    # probe: a copy of clip 1 matches every sampled frame; fresh misses
    import hashlib as hl

    k = len(range(0, 1 + hl.sha256(vid_a).digest()[2] % 8, 2))
    batch = spark.createDataFrame(
        [(30, bytearray(vid_a)), (31, bytearray(b"fresh clip"))],
        "doc_id long, payload binary",
    )
    hits = {
        (r["doc_a"], r["doc_b"]): r["n_matching_frames"]
        for r in inc.video_neardup_probe(spark, batch, store).collect()
    }
    assert hits == {(30, 1): k}
    assert inc.video_neardup_probe(
        spark, batch, store, min_matching_frames=k + 1
    ).count() == 0
    losers = inc.video_neardup_probe(spark, batch, store).select(
        F.col("doc_a").alias("doc_id")
    )
    kept = {r["doc_id"]
            for r in batch.join(losers, "doc_id", "left_anti").collect()}
    assert kept == {31}

    # mixed-config refused; audio/image stores are not video stores;
    # the image probe refuses a video store rather than mis-dispatch
    inc.video_rollup_batch(corpus, store, 2, every_n=1)
    with pytest.raises(ValueError, match="mixes configurations"):
        inc.read_video_fingerprint_store(spark, store)
    imgstore = str(tmp_path / "vimgstore")
    inc.dhash_rollup_batch(corpus, imgstore, 0)
    with pytest.raises(ValueError, match="not a video fingerprint"):
        inc.read_video_fingerprint_store(spark, imgstore)
    vstore2 = str(tmp_path / "vonly")
    inc.video_rollup_batch(corpus, vstore2, 0)
    with pytest.raises(ValueError, match="not an image fingerprint"):
        inc.image_neardup_probe(spark, batch, vstore2)
    with pytest.raises(ValueError, match="min_matching_frames"):
        inc.video_neardup_probe(
            spark, batch, vstore2, min_matching_frames=0
        )

    # real availableNow stream
    srcdir = str(tmp_path / "vidsrc")
    corpus.write.parquet(srcdir)
    stream = spark.readStream.schema(
        "doc_id long, payload binary"
    ).parquet(srcdir)
    store3 = str(tmp_path / "vstore3")
    qh = (
        inc.stream_video_rollup(stream, store3, str(tmp_path / "vckpt"))
        .trigger(availableNow=True)
        .start()
    )
    qh.awaitTermination(120)
    fps3, _, _, _ = inc.read_video_fingerprint_store(spark, store3)
    assert {
        (r["doc_id"], r["frame_idx"], r["fp"]) for r in fps3.collect()
    } == want


def test_frame_store_bottom_k_sketch(spark, tmp_path):
    """r14: min_k bottom-k frame-sketch retention bounds the store to
    k rows per clip — the k SMALLEST fingerprints (deterministic,
    mergeable) — while a full copy probed against the sketched corpus
    still pairs on every retained frame; min_k=0 refuses."""
    import io
    import pytest
    import random
    import struct
    import wave

    def wav(seed):
        rnd = random.Random(seed)
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"".join(
            struct.pack("<h", rnd.randint(-12000, 12000))
            for _ in range(8000)
        ))
        w.close()
        return bytearray(buf.getvalue())

    grid = dict(frame_size=256, hop=128, n_bands=32)
    corpus = spark.createDataFrame(
        [(1, wav(1)), (2, wav(2))], "doc_id long, payload binary"
    )
    store = str(tmp_path / "skstore")
    inc.audio_rollup_batch(corpus, store, 0, min_k=3, **grid)
    fps, _, _, _ = inc.read_audio_fingerprint_store(spark, store)
    rows = fps.collect()
    assert len(rows) == 6          # 3 per clip, not 60
    # the retained rows ARE the 3 smallest fingerprints per clip
    from etl_workflow_spark.operators import multimodal as M

    full = M.audio_fingerprint(corpus, allow_fake=False, **grid)
    for did in (1, 2):
        want = sorted(
            r["afp"] for r in full.where(f"doc_id = {did}").collect()
        )[:3]
        got = sorted(
            r["fp"] for r in rows if r["doc_id"] == did
        )
        assert got == want
    # a full (unsketched) copy probes in on all retained frames
    batch = spark.createDataFrame(
        [(30, wav(1))], "doc_id long, payload binary"
    )
    hits = {
        (r["doc_a"], r["doc_b"]): r["n_matching_frames"]
        for r in inc.audio_neardup_probe(spark, batch, store).collect()
    }
    assert hits[(30, 1)] >= 3 and (30, 2) not in hits
    with pytest.raises(ValueError, match="min_k"):
        inc.audio_rollup_batch(corpus, store, 1, min_k=0, **grid)
    # video twin: bounded rows, copy still pairs
    vid = spark.createDataFrame(
        [(5, bytearray(b"long opaque video payload"))],
        "doc_id long, payload binary",
    )
    vstore = str(tmp_path / "vskstore")
    inc.video_rollup_batch(vid, vstore, 0, min_k=1)
    vfps, _, _, _ = inc.read_video_fingerprint_store(spark, vstore)
    assert vfps.count() == 1
    vhits = inc.video_neardup_probe(
        spark,
        vid.withColumn("doc_id", F.lit(50).cast("long")),
        vstore,
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["n_matching_frames"])
            for r in vhits] == [(50, 5, 1)]
