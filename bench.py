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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from etl_workflow_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + parquet footer caches with a trivial action.
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    # Headline set: the queries a reference user runs all day, weighted
    # toward the shuffle/join-heavy paths that dominate at scale.
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
        "events_json",
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
    ]
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in headline:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        # count() forces the full plan; results are small-to-medium so
        # this measures compute, not driver materialization.
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    # Per-query delta vs the newest recorded round (BENCH_r{N}.json), so
    # each round's record carries its own regression report. Single-run
    # local timings are noisy (~±0.3s); read deltas accordingly.
    import glob

    prior = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")))
    if prior:
        try:
            with open(prior[-1]) as fh:
                prev = json.load(fh).get("parsed", {}).get("queries", {})
            out["prev_round"] = os.path.basename(prior[-1])
            out["delta_vs_prev"] = {
                q: round(t - prev[q], 3) for q, t in timings.items() if q in prev
            }
        except Exception:
            pass

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
