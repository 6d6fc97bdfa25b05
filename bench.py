"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed over a full action (count of the materialized
result) after a warm-up of the session JVM. The headline set covers
the shuffle-heavy paths: joins+aggs, the daily rollup, pagination,
and (as they land) dedup/similarity/text operators.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_headline():
    """The headline query list and name → callable map — ONE definition
    shared by :func:`main` and the optimization tooling
    (``tools/optharness.py``), so plan captures and isolated timings
    always exercise exactly the benched workloads. Returns
    ``(headline, qs)`` where ``qs`` maps every headline name (plus the
    gate entries) to a ``(spark, sf_dir) -> DataFrame`` callable."""
    import __spark_entry__ as entry_mod

    # Headline set: the queries a reference user runs all day, weighted
    # toward the shuffle/join-heavy paths that dominate at scale.
    # Names match BENCH_r02 for round-over-round comparability; where
    # the correctness gate consolidated entries, the PRODUCTION operator
    # tier is timed directly (the gate entry also runs oracle/recall
    # machinery that is correctness overhead, not operator cost).
    headline = [
        "product_sales",
        "top_selling_by_category",
        "customer_purchase_history",
        "sales_trends_month",
        "order_items_transform",
        "daily_sales_aggregation",
        "lifetime_value",
        "customer_purchase_summary",
        "product_sales_summary",
        "dim_time",
        "dedup_exact",
        "dedup_minhash_lsh",
        "text_quality",
        "token_count",
        "lang_id",
        # brute force is the right ANN tier at 2k vectors (one broadcast
        # pass); IVF's quantizer-training overhead only amortizes when
        # corpus/queries are orders of magnitude larger — it stays in the
        # correctness gate, not the headline set
        "ann_bruteforce",
        # blocked matmul is the right near-dup tier at this corpus size;
        # the LSH tier only prunes in the >=0.9-cosine regime, which the
        # isotropic testdata embeddings don't contain (max pair ~0.6)
        "embedding_neardup_blocked",
        "events_windowed",
        "value_percentiles",
        "sessionize",
        # round-2 additions: temporal joins, clustering, chunk/pack,
        # repetition signals, ranked/pivot/rollup analytics
        "asof_attribution",
        "interval_join_sessions",
        "rolling_revenue",
        "dedup_clusters",
        "chunk_documents",
        "pack_invariants",
        "repetition_signals",
        "top_per_brand",
        "events_pivot",
        "revenue_rollup",
        "tfidf_top_terms",
        "profile_orders",
        "constraint_checks",
        # round-5 addition: pg_trgm-analog trigram fuzzy lookup
        "fuzzy_name_search",
        # round-6 additions: distributed exact NTILE (no single-task
        # window) and 13-gram benchmark decontamination
        "customer_quartiles",
        "decontamination",
        # round-6 session 2: incremental LSH probe, full-corpus k-means,
        # token-budget corpus selection
        "lsh_probe",
        "kmeans_embeddings",
        "token_budget_select",
        # round-6 session 3: one-pass PCA fit+project, mergeable
        # histogram store quantile path
        "pca_embeddings",
        "histogram_quantiles",
        # round-7: ExactSubstr-style span dedup (full-corpus pass) and
        # the funnel path of the event-analytics trio
        "dedup_spans",
        "event_funnel",
        # round-8: the transactional DML path (create → keyed append →
        # evolving merge → delete through the manifest log) — constant
        # work vs sf (fixed key slice), timing the commit protocol
        "txn_mutations",
        # round-8: full BPE tokenizer workflow — vocab shuffle + driver
        # merge loop (run-rarely) + the corpus-sized shuffle-free encode
        "bpe_tokenize",
        # round-9: IVF-PQ flat-ADC top-k — fit + encode + code-column
        # scan + exact re-rank (the ~8%-of-bytes ANN tier)
        "pq_topk",
        # round-9: unigram-LM tokenizer workflow — one vocab shuffle +
        # driver Viterbi-EM (run-rarely) + shuffle-free Arrow encode
        "unigram_tokenize",
        # round-10: inverted multi-index workflow — fit (driver
        # k-means ×2 halves) + assignment pass + pair-probed
        # candidate generation + exact re-rank ×8 queries
        "imi_topk",
        # round-10: DSIR importance resampling — two featurize passes
        # (fit) + per-doc scoring pass + Gumbel top-k selection
        "dsir_select",
        # round-11: fastText-style quality classifier — driver GD fit
        # on a bounded two-class sample + one distributed scoring pass
        "qcls_score",
        # round-11: BM25 full-text search — inline index build (one
        # tokenize+agg pass) + broadcast-probed scoring + windowed
        # top-k, ×4 queries
        "bm25_search",
        # round-11: WordPiece tokenizer workflow — one vocab shuffle +
        # driver likelihood-merge loop (run-rarely) + the shuffle-free
        # Arrow greedy-MaxMatch encode
        "wordpiece_tokenize",
        # round-11: hybrid retrieval — BM25 + exact-cosine top-20
        # lists fused by integer reciprocal-rank, ×4 queries
        "hybrid_search",
        # round-11: exact phrase search — positional index build
        # (posexplode) + broadcast adjacency join, ×5 phrases
        "phrase_search",
        # round-11: PMI collocations — bigram + unigram tokenize/agg
        # evaluations, distributed top-k (the store-fed refresh path
        # skips both corpus scans)
        "collocations",
        # round-11: signed feature-hashed TF-IDF document vectors —
        # the text→embedding bridge (explode + two aggs + one
        # term-keyed join + codegen densify, corpus-sized)
        "tfidf_embed",
        # round-12: published page filters (Gopher rules + C4 line
        # filter, one shuffle-free codegen pass each) and unicode
        # normalization (the one Arrow-batched Python step + codegen
        # cleanup — times the pandas-UDF boundary honestly)
        "page_filters",
        "normalize_text",
        # round-12: CCNet-style bigram-LM perplexity (self-fit: two
        # count passes + distinct-pair-bounded joins)
        "lm_score",
        # round-13: stupid-backoff trigram tier (three count fits off
        # one checkpointed token frame + distinct-trigram joins)
        "lm_backoff",
        # round-13: interpolated Kneser-Ney (continuation counts from
        # the bigram table itself — no third count table)
        "lm_kn",
        # round-13: perceptual-hash near-dup (one payload Arrow pass +
        # pigeonhole-banded fingerprint self-join; fake hash tier here)
        "image_neardup",
        # round-14: video near-dup via frame fingerprints — frame
        # fan-out + hash in one Arrow pass, then frame-level banding
        # and per-video-pair aggregation
        "video_neardup",
        # round-14: audio near-dup via Haitsma–Kalker frame
        # fingerprints — per-frame fan-out + fingerprint in one Arrow
        # pass, then 32-bit pigeonhole banding and per-clip-pair
        # aggregation (fake chain on text payloads)
        "audio_neardup",
    ]

    # Operator-tier callables for headline names whose gate entries were
    # consolidated (the gate runs extra oracle/recall tiers on top).
    from pyspark.sql import functions as F  # noqa: N812

    from etl_workflow_spark import queries as Q
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import chunking as CH
    from etl_workflow_spark.operators import dedup as D
    from etl_workflow_spark.operators import multimodal as MM
    from etl_workflow_spark.operators import ranking as R
    from etl_workflow_spark.operators import similarity as S
    from etl_workflow_spark.operators import text as T

    ops = {
        "sales_trends_month": lambda s, d: Q.sales_trends(s, d, interval="month"),
        "top_selling_by_category": lambda s, d: Q.top_selling_by_category(s, d),
        # operator-level (the gate entry consolidated into
        # dedup_recipes; the headline keeps timing the bare operator)
        "dedup_exact": lambda s, d: D.exact_dedup(table(s, d, "documents")),
        "dedup_minhash_lsh": lambda s, d: D.minhash_lsh_pairs(
            table(s, d, "documents"), threshold=0.5
        ),
        "text_quality": lambda s, d: T.text_quality(table(s, d, "documents")),
        "page_filters": lambda s, d: (lambda docs: T.gopher_quality_flags(
            docs
        ).join(T.c4_line_filter(docs), "doc_id"))(
            table(s, d, "documents")
        ),
        "normalize_text": lambda s, d: T.normalize_text(
            table(s, d, "documents")
        ),
        # payload scan + 8-byte fingerprint banding; the fake hash tier
        # runs here (text payloads), timing the mapInPandas + join shape
        "image_neardup": lambda s, d: MM.image_neardup_pairs(
            MM.with_binary_payload(table(s, d, "documents"))
        ),
        # r14: frame sampling fan-out + per-frame hashing (one fused
        # Arrow pass) + frame-level pigeonhole banding + per-video-pair
        # aggregation (fake frame chain on text payloads)
        "video_neardup": lambda s, d: MM.video_neardup_pairs(
            MM.with_binary_payload(table(s, d, "documents"))
        ),
        "audio_neardup": lambda s, d: MM.audio_neardup_pairs(
            MM.with_binary_payload(table(s, d, "documents"))
        ),
        "lm_score": lambda s, d: T.lm_score(table(s, d, "documents")),
        "lm_backoff": lambda s, d: T.lm_score_backoff(
            table(s, d, "documents")
        ),
        "lm_kn": lambda s, d: T.lm_score_kn(table(s, d, "documents")),
        "token_count": lambda s, d: T.token_count(table(s, d, "documents")),
        "lang_id": lambda s, d: T.lang_id(table(s, d, "documents")),
        "repetition_signals": lambda s, d: T.repetition_signals(
            table(s, d, "documents")
        ),
        "tfidf_top_terms": lambda s, d: T.tfidf_top_terms(
            table(s, d, "documents"), k=5
        ),
        "ann_bruteforce": lambda s, d: S.brute_force_topk(
            table(s, d, "embeddings"),
            table(s, d, "embeddings")
            .where("vec_id < 8")
            .withColumnRenamed("vec_id", "query_id"),
            k=5,
        ),
        "embedding_neardup_blocked": lambda s, d: S.embedding_neardup_blocked(
            table(s, d, "embeddings"), threshold=0.45
        ),
        "chunk_documents": lambda s, d: CH.chunk_documents(
            table(s, d, "documents"), chunk_tokens=32
        ),
        # fixed-size benchmark side (eval sets don't grow with corpus)
        "decontamination": lambda s, d: T.ngram_contamination(
            table(s, d, "documents"),
            table(s, d, "documents").limit(50).select("text"),
            n=13,
        ),
        # daily-ingest shape: 2% of the corpus probes the other 98%
        "lsh_probe": lambda s, d: D.minhash_lsh_probe(
            table(s, d, "documents").where(F.col("doc_id") % 50 == 0),
            table(s, d, "documents").where(F.col("doc_id") % 50 != 0),
            threshold=0.5,
        ),
        "kmeans_embeddings": lambda s, d: S.kmeans(
            table(s, d, "embeddings"), k=8, dim=64, max_iter=5
        )[0],
        # quality-ordered prefix under a 50k-token budget (stopword
        # ratio as the naturalness proxy; unique-id tiebreak). ONE
        # corpus scan: text_quality's n_words IS the whitespace token
        # count (verified equal to token_count.n_tokens row-for-row),
        # so the former token_count join paid a second tokenization
        # pass + a shuffle for nothing — the fused form is the one a
        # 100 TB pipeline should run (same lesson as text_profile).
        "token_budget_select": lambda s, d: R.select_prefix_by_budget(
            T.text_quality(table(s, d, "documents")).select(
                "doc_id",
                F.col("n_words").alias("n_tokens"),
                "stopword_ratio_e4",
            ),
            [F.desc("stopword_ratio_e4"), F.asc("doc_id")],
            "n_tokens",
            budget=50_000,
        ),
        # fit (one corpus pass, driver eigh) + whitened projection
        "pca_embeddings": lambda s, d: S.pca_transform(
            table(s, d, "embeddings"),
            S.pca_fit(table(s, d, "embeddings"), k=8, dim=64),
            whiten=True,
        ),
        # build per-day sketches, merge, answer a quantile set
        "histogram_quantiles": lambda s, d: _histogram_quantiles_df(s, d),
        # repeated >=50-token spans removed from all but the first
        # occurrence (the run-rarely full-corpus pass)
        "dedup_spans": lambda s, d: D.dedup_spans(
            table(s, d, "documents"), min_tokens=50
        ),
        "event_funnel": lambda s, d: _event_funnel_df(s, d),
        # train (one vocab shuffle + driver merge loop) + encode
        # (shuffle-free Arrow pass) — the whole tokenizer workflow
        "bpe_tokenize": lambda s, d: T.bpe_encode(
            table(s, d, "documents").select("doc_id", "text"),
            T.train_bpe(table(s, d, "documents"), num_merges=200),
            ids=True,
        ),
        # train (vocab shuffle + driver Viterbi-EM) + encode — the
        # unigram twin of bpe_tokenize
        "unigram_tokenize": lambda s, d: T.unigram_encode(
            table(s, d, "documents").select("doc_id", "text"),
            T.train_unigram(table(s, d, "documents"), vocab_size=500),
            ids=True,
        ),
        # the whole IVF-PQ workflow: fit (driver k-means on a bounded
        # sample) + index encode (one Arrow pass) + flat ADC scan +
        # exact re-rank ×8 — at scale fit/index amortize, so this is
        # the upper bound on the per-query-batch cost
        "pq_topk": lambda s, d: _pq_topk_df(s, d),
        # r10: the whole inverted-multi-index workflow — fit + one
        # assignment pass + pair-probed candidates + exact re-rank
        "imi_topk": lambda s, d: _imi_topk_df(s, d),
        # r10: DSIR selection workflow — target = a fixed 50-doc
        # slice, raw = the corpus; fit + score + Gumbel top-k
        "dsir_select": lambda s, d: T.dsir_select(
            table(s, d, "documents"),
            T.dsir_fit(
                table(s, d, "documents"),
                table(s, d, "documents").where("doc_id < 50")
                .select("text"),
            ),
            n_select=100,
        ),
        "collocations": lambda s, d: T.collocations(
            table(s, d, "documents"), k=50, min_count=5
        ),
        "phrase_search": lambda s, d: T.phrase_topk(
            table(s, d, "documents"),
            getattr(
                entry_mod, "_PHRASE_QUERIES", ["order fast", "data slow"]
            ),
            k=10,
        ),
        "tfidf_embed": lambda s, d: T.hashed_tfidf_vectors(
            table(s, d, "documents"), dim=128
        ),
        # sparse+dense fusion: BM25 + brute-force cosine top-20 per
        # query, integer reciprocal-rank fuse (the ann_topk gate's
        # tier='hybrid' composition, timed as the production operator)
        "hybrid_search": lambda s, d: entry_mod._hybrid_search_frame(s, d),
        # train (vocab shuffle + driver likelihood merges) + encode —
        # the WordPiece sibling of bpe_tokenize/unigram_tokenize
        "wordpiece_tokenize": lambda s, d: T.wordpiece_encode(
            table(s, d, "documents").select("doc_id", "text"),
            T.train_wordpiece(table(s, d, "documents"), vocab_size=500),
            ids=True,
        ),
        # queries = the gate's fixed list (one definition; a drift
        # would silently time a different workload than is checked)
        "bm25_search": lambda s, d: T.bm25_topk(
            table(s, d, "documents"),
            getattr(
                entry_mod, "_BM25_QUERIES",
                ["hash join merge", "slow query filter"],
            ),
            k=10,
        ),
        "qcls_score": lambda s, d: T.quality_classifier_score(
            table(s, d, "documents"),
            T.quality_classifier_fit(
                table(s, d, "documents").where("doc_id % 2 = 0")
                .select("text"),
                table(s, d, "documents").where("doc_id % 2 = 1")
                .select("text"),
                buckets=1024, sample_size=512,
            ),
        ),
    }

    def _imi_topk_df(s, d):
        emb = table(s, d, "embeddings")
        q = (
            emb.where("vec_id < 8").withColumnRenamed("vec_id", "query_id")
        )
        model = S.imi_fit(emb, n_cells=32)
        return S.imi_topk(
            S.imi_index(emb, model), q, model, emb, k=10,
            n_probe_pairs=64,
        )

    def _pq_topk_df(s, d):
        emb = table(s, d, "embeddings")
        q = (
            emb.where("vec_id < 8").withColumnRenamed("vec_id", "query_id")
        )
        model = S.pq_fit(emb, n_cells=16, m_sub=8, ksub=256)
        return S.pq_topk(
            S.pq_index(emb, model), q, model, emb, k=10, rerank_factor=8
        )

    def _event_funnel_df(s, d):
        from etl_workflow_spark.catalog import events_table
        from etl_workflow_spark.operators import temporal as TP

        return TP.funnel(events_table(s, d), ["view", "click", "purchase"])

    from etl_workflow_spark.operators import sketches as SK

    def _histogram_quantiles_df(s, d):
        li = s.read.parquet(f"{d}/lineitem.parquet")
        daily = SK.value_histogram_sketch(
            li, "l_extendedprice", ts_col="l_shipdate"
        )
        merged = SK.merge_histogram_sketches(daily)
        qs = SK.histogram_quantiles(merged, [0.25, 0.5, 0.9, 0.99])
        return s.createDataFrame(qs, "q double, est double")
    # Private entry-module callables resolved defensively: a rename in a
    # future consolidation must cost ONE missing query row, not the
    # whole bench (round 3 died to exactly this NameError class).
    for bench_name, attr in (
        ("value_percentiles", "_q_value_percentiles"),
        ("pack_invariants", "_q_pack_invariants"),
        ("rolling_revenue", "_q_rolling_revenue"),
    ):
        fn = getattr(entry_mod, attr, None)
        if fn is not None:
            ops[bench_name] = fn

    return headline, {**entry_mod.queries(), **ops}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from etl_workflow_spark.session import get_spark

    # The status store retains 1000 SQL executions (plan graphs +
    # metrics) by default even with the UI off; a bench run issues
    # ~150 executions with wide plans, and that accumulation is a
    # plausible driver of the measured late-session slowdown (queries
    # timing several-x slower at the tail of a long JVM session).
    # Retain a handful, nothing else reads them here.
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.sql.ui.retainedExecutions": "8",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "200",
            "spark.ui.retainedTasks": "2000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM with a representative join+agg plan, not just a
    # trivial scan: whole-stage codegen compilation, AQE machinery, and
    # the shuffle paths JIT on first use and cost seconds — measured on
    # the FIRST query otherwise (product_sales read 8.2s cold vs 1.1s
    # warm at sf0.1), which misattributes fixed session cost to
    # whichever query happens to run first.
    from etl_workflow_spark import queries as _warm_q

    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
    _warm_q.product_sales(spark, sf_dir).count()

    # Calibration probe: a fixed synthetic workload (codegen agg + a
    # 1000-key shuffle) that never touches repo code or testdata. Its
    # time moves with the HOST (CPU contention, VM generation, JIT),
    # not with this round's changes — divide headline totals by the
    # calibration ratio before reading round-over-round deltas.
    # Measured spread on one box: identical code varied 25.9s -> 30.8s
    # total across back-to-back runs (~19%), swamping real deltas.
    from pyspark.sql import functions as _CF

    def _calibrate() -> float:
        t0 = time.time()
        spark.range(100_000_000).select(
            _CF.sum(_CF.col("id") % 7)
        ).collect()
        (
            spark.range(20_000_000)
            .groupBy((_CF.col("id") % 1000).alias("k"))
            .count()
            .count()
        )
        return time.time() - t0

    _calibrate()  # warm the probe's own codegen
    calibration = round(min(_calibrate(), _calibrate()), 3)

    headline, qs = build_headline()

    def _prev_record() -> tuple[str | None, dict]:
        """Previous full record for deltas. Prefer BENCH_LOCAL.json —
        bench.py's own complete record, written every run and committed
        — over the driver's BENCH_r*.json tails: the driver persists
        only the LAST 2000 chars of stdout, so a grown record loses its
        front (r6: parsed null, headline+calibration unrecoverable).
        BENCH_LOCAL always has calibration_sec and the current forcing
        mode, so deltas are calibrated and compat re-timing never
        triggers."""
        import glob

        local = os.path.join(os.path.dirname(__file__), "BENCH_LOCAL.json")
        try:
            with open(local) as fh:
                parsed = json.load(fh)
            # same-sf only: a record from a smoke run at another scale
            # would make every delta a scale artifact
            if parsed.get("queries") and parsed.get("sf") == sf:
                return "BENCH_LOCAL.json", parsed
        except Exception:
            pass
        prior = sorted(
            glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json"))
        )
        for path in reversed(prior):
            try:
                with open(path) as fh:
                    parsed = json.load(fh).get("parsed") or {}
                if parsed.get("queries"):
                    return os.path.basename(path), parsed
            except Exception:
                continue
        return None, {}

    prev_name, prev_parsed = _prev_record()

    def _compat_forcing() -> str | None:
        """The previous round's forcing mode, when it differs from this
        round's: headline numbers are then NOT comparable (count-per-
        column measures work count(*) let Catalyst eliminate), so extra
        passes re-time under the old mode for an apples-to-apples
        delta. Rounds whose predecessor used the same mode skip this."""
        if not prev_parsed:
            return None
        prev_forcing = prev_parsed.get("forcing", "count-star")
        return prev_forcing if prev_forcing != "count-per-column" else None

    def _force(out_df, mode: str) -> None:
        if mode == "count-star":
            out_df.count()
        else:
            out_df.groupBy().agg(
                *[_CF.count(_CF.col(c)) for c in out_df.columns]
            ).collect()

    def _run_pass(timings: dict[str, float], errors: dict[str, str],
                  mode: str) -> None:
        spark.catalog.clearCache()
        for name in headline:
            fn = qs.get(name)
            if fn is None:
                continue
            t0 = time.time()
            try:
                _force(fn(spark, sf_dir), mode)
                t = round(time.time() - t0, 3)
                if name not in timings or t < timings[name]:
                    timings[name] = t
            except Exception as e:  # noqa: BLE001 - bench must survive
                errors[name] = str(e).split("\n", 1)[0][:300]

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Two passes, keep the per-query minimum: single-shot timings on a
    # shared box carry ±15% GC/JIT/load noise, which swamps real
    # round-over-round deltas. The cache is cleared between passes so
    # operator-internal persists can't serve pass 2 from memory — the
    # minimum is a real cold-cache execution, just the less unlucky one.
    # Headline passes force EVERY output column with count(col)-per-
    # column, not count(*): bare count() lets Catalyst eliminate outer
    # joins whose build side has provably-unique keys (any Aggregate
    # right side) and prune scan columns — r2-r5 under-measured
    # lifetime_value this way (its customer⟕agg join was optimized out
    # entirely) and let text operators skip reading `text` altogether.
    # count(col) references each output column, so pruning/elimination
    # can't fire, at ~3× less overhead than a hash-sum of stringified
    # rows (which charged wide outputs for the hashing, not the query).
    # One bad query must never zero out the whole round's perf signal
    # (r3 and r4 both lost their bench to a single raise) — _run_pass
    # records the error and keeps timing the rest.
    #
    # Pass order matters: measured on this box, queries run late in a
    # long JVM session time up to several× slower than the same query
    # early (listener/GC accumulation over ~140 executions), and host
    # contention swings 2-4× within a day — a SINGLE compat pass once
    # recorded 65s against the same code's min-of-2 24.7s, which would
    # misread as a 3× regression vs the prior round. Both modes
    # therefore interleave and keep min-of-2; compat passes only exist
    # in the one round after a forcing change, so the extra cost is
    # transient.
    compat_mode = _compat_forcing()
    pass_plan = ["count-per-column", compat_mode, "count-per-column", compat_mode]
    compat_t: dict[str, float] = {}
    compat_e: dict[str, str] = {}
    for mode in pass_plan:
        if mode is None:
            continue
        if mode == "count-per-column":
            _run_pass(timings, errors, mode)
        else:
            _run_pass(compat_t, compat_e, mode)

    def _sig3(x: float) -> float:
        """3 significant figures — the record must fit the driver's
        2000-char stdout-tail capture (r6 outgrew it and the whole
        round's perf signal was lost to truncation)."""
        return float(f"{x:.3g}")

    total = _sig3(sum(timings.values()))
    # Field ORDER is load-bearing: the driver keeps only the stdout
    # tail, so the headline fields (value, calibration_sec, sf, passes)
    # go LAST — a front-truncated record still surrenders them to a
    # tail scrape even if full-JSON parsing fails. The raw
    # delta_vs_prev map is gone (recomputable from BENCH_LOCAL.json);
    # only calibration-normalized regressions are published.
    out: dict = {
        "metric": "headline_queries_wall",
        "unit": "sec",
        # r6 methodology change: count-per-output-column forcing
        # (r2-r5 used count(*), which join-eliminated some queries —
        # e.g. lifetime_value's outer join never ran — and let scans
        # prune to zero columns).
        "forcing": "count-per-column",
        "queries": {q: _sig3(t) for q, t in timings.items()},
    }
    if errors:
        out["errors"] = errors

    # Calibrated deltas: host throughput swings 2-4x within a day
    # (measured; r6's apparent dedup_minhash_lsh +70% did not reproduce
    # on a controlled re-run). r10 fix (judge process note): the
    # synthetic probe was a poor proxy for query throughput — across
    # three r9 runs it swung 0.645→0.565→0.439s (±32%) while most
    # query times moved <10%, manufacturing 8 false regression flags
    # whose set was DISJOINT between runs. The host factor is now the
    # MEDIAN per-query ratio (this run / previous run) over the shared
    # headline queries themselves: ~45 independent samples of the same
    # host multiplier, robust to ≤ half of them genuinely regressing —
    # a real code regression in a few queries cannot move the median,
    # while a host-wide slowdown moves every ratio together and is
    # divided out exactly. The probe's calibration_ratio is still
    # published as a cross-check (median ≫ probe ratio would mean a
    # repo-wide real slowdown); flags use the median. Only normalized
    # regressions >15% are published (capped at 8, largest first) —
    # the full previous record lives in BENCH_LOCAL.json.
    prev_q = prev_parsed.get("queries") or {}
    if prev_name:
        out["prev_round"] = prev_name
    prev_cal = prev_parsed.get("calibration_sec")
    # always emitted (default 1.0): harness tooling keyed on this field
    # must never see it silently missing when a previous record lacks
    # calibration_sec (flags still use host_ratio_median below)
    out["calibration_ratio"] = (
        _sig3(calibration / prev_cal) if prev_cal else 1.0
    )
    if prev_q and prev_parsed.get("forcing", "count-star") == out["forcing"]:
        shared_ratios = sorted(
            t / prev_q[q]
            for q, t in timings.items()
            if q in prev_q and prev_q[q] > 0
        )
        ratio = (
            shared_ratios[len(shared_ratios) // 2] if shared_ratios else 1.0
        )
        out["host_ratio_median"] = _sig3(ratio)
        regressions = sorted(
            (
                (q, _sig3(t / ratio - prev_q[q]))
                for q, t in timings.items()
                if q in prev_q and prev_q[q] > 0
                and (t / ratio - prev_q[q]) / prev_q[q] > 0.15
                and t / ratio - prev_q[q] > 0.1
            ),
            key=lambda kv: -kv[1],
        )[:8]
        out["delta_vs_prev_calibrated"] = dict(regressions)
    elif prev_q and compat_t:
        # transient: only fires the one round after a forcing change
        out["compat"] = {
            "forcing": compat_mode,
            "value": _sig3(sum(compat_t.values())),
        }
    out["passes"] = 2
    out["sf"] = sf
    out["calibration_sec"] = calibration
    out["value"] = total

    # Persist the full record locally so the next run's deltas never
    # depend on the driver's truncatable capture. Best-effort: a
    # read-only checkout must not kill the bench.
    try:
        local = os.path.join(os.path.dirname(__file__), "BENCH_LOCAL.json")
        with open(local, "w") as fh:
            json.dump(out, fh)
            fh.write("\n")
    except OSError:
        pass

    line = json.dumps(out)
    # Hard guard: the driver's capture window is 2000 chars. If the
    # record ever outgrows it again, shed the biggest optional field
    # rather than lose the headline (the queries map stays — it is the
    # per-query signal; regressions and errors are diagnosable from
    # BENCH_LOCAL.json).
    if len(line) > 1900:
        for drop in ("delta_vs_prev_calibrated", "errors", "compat"):
            out.pop(drop, None)
            line = json.dumps(out)
            if len(line) <= 1900:
                break
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
