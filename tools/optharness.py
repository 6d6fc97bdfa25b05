"""Optimization measurement harness (rounds 14-15).

Times individual headline queries in isolation and captures their
``explain("formatted")`` plans, using the SAME callables the bench
runs (``bench.build_headline``), so plan claims in ``plans/r*/`` and
OPTIMIZATION_r*.md are checked against exactly the benched workloads.

Two forcing modes per query:

* ``noop``   — ``df.write.format("noop")`` (guide §1.4): computes every
  column, isolates the computation from collect/count overheads.
* ``percol`` — the bench's own count-per-column forcing, for numbers
  directly comparable to BENCH_LOCAL.json.

r15 fixes (verdict note #2, round 14):

* Plan capture goes through LAZY_PLAN_OVERRIDES for queries whose
  benched callable eagerly ``localCheckpoint``s internal tables at
  construction — the r14 dumps for those were one-line
  ``Scan ExistingRDD`` plans. The overrides build the IDENTICAL
  workload with the operator's ``materialize=False`` escape hatch, so
  the dumped plan is the full lazy tree the operator actually runs.
  Queries whose work is a driver-side LOOP (kmeans/pq/imi/txn) have no
  single plan; their evidence is dumped per-step by dedicated scripts
  (see plans/r15/*_before.txt headers).
* Timings record EVERY rep plus min and median (the committed
  BENCH_LOCAL.json convention moved from best-of-N to median-of-N).

Usage::

    python tools/optharness.py [--plans DIR] [--suffix before|after]
        [--reps N] [--mode noop|percol|both] query [query ...]

Plans are written to ``<plans>/<query>_<suffix>.txt``; timings print
as one JSON line per query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _lazy_plan_overrides():
    """name -> (spark, sf_dir) -> DataFrame, SAME workloads as
    bench.build_headline but with ``materialize=False`` so the full
    plan is visible. Keep in lockstep with bench.py."""
    import __spark_entry__ as entry_mod

    from pyspark.sql import functions as F  # noqa: N812

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import dedup as D
    from etl_workflow_spark.operators import text as T

    return {
        "lm_score": lambda s, d: T.lm_score(
            table(s, d, "documents"), materialize=False
        ),
        "lm_backoff": lambda s, d: T.lm_score_backoff(
            table(s, d, "documents"), materialize=False
        ),
        "lm_kn": lambda s, d: T.lm_score_kn(
            table(s, d, "documents"), materialize=False
        ),
        "collocations": lambda s, d: T.collocations(
            table(s, d, "documents"), k=50, min_count=5,
            materialize=False,
        ),
        "bm25_search": lambda s, d: T.bm25_topk(
            table(s, d, "documents"),
            getattr(
                entry_mod, "_BM25_QUERIES",
                ["hash join merge", "slow query filter"],
            ),
            k=10,
            materialize=False,
        ),
        "dedup_minhash_lsh": lambda s, d: D.minhash_lsh_pairs(
            table(s, d, "documents"), threshold=0.5, materialize=False
        ),
        "lsh_probe": lambda s, d: D.minhash_lsh_probe(
            table(s, d, "documents").where(F.col("doc_id") % 50 == 0),
            table(s, d, "documents").where(F.col("doc_id") % 50 != 0),
            threshold=0.5,
            materialize=False,
        ),
        # dedup_clusters' tail is a driver union-find over a
        # checkpointed 256-edge list; the meaningful plan is the pair
        # generator feeding it
        "dedup_clusters": lambda s, d: D.ngram_jaccard_pairs(
            table(s, d, "documents"), threshold=0.5
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans", default=None, help="plan output dir")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--mode", default="both",
                    choices=["noop", "percol", "both"])
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--conf", action="append", default=[],
        help="extra runtime spark conf k=v (e.g. to restore an "
        "excluded optimizer rule for a BEFORE plan/timing)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import bench
    from etl_workflow_spark.session import get_spark

    spark = get_spark(
        "optharness",
        extra_conf={
            "spark.sql.ui.retainedExecutions": "8",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "200",
            "spark.ui.retainedTasks": "2000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for kv in args.conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)

    # same warmup as bench.main
    from etl_workflow_spark import queries as _warm_q

    spark.read.parquet(os.path.join(args.sf_dir, "nation.parquet")).count()
    _warm_q.product_sales(spark, args.sf_dir).count()

    _, qs = bench.build_headline()
    lazy = _lazy_plan_overrides()

    def _force_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def _force_percol(df) -> None:
        df.groupBy().agg(
            *[F.count(F.col(c)) for c in df.columns]
        ).collect()

    for name in args.queries:
        fn = qs.get(name)
        if fn is None:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        spark.sparkContext.setJobDescription(f"optharness: {name}")
        rec: dict = {"query": name}
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan_fn = lazy.get(name, fn)
            df = plan_fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            hdr = ""
            if name in lazy:
                hdr = (
                    f"{name}: plan captured via the operator's "
                    "materialize=False escape hatch (identical workload;"
                    " the production default eagerly checkpoints the "
                    "fit/index tables, which would print here as a "
                    "one-line Scan ExistingRDD).\n\n"
                )
            with open(path, "w") as fh:
                fh.write(hdr + plan)
            rec["plan"] = path
        modes = (
            ["noop", "percol"] if args.mode == "both" else [args.mode]
        )
        for mode in modes:
            force = _force_noop if mode == "noop" else _force_percol
            reps = []
            for _ in range(max(1, args.reps)):
                spark.catalog.clearCache()
                t0 = time.time()
                force(fn(spark, args.sf_dir))
                reps.append(round(time.time() - t0, 3))
            rec[mode] = min(reps)
            rec[f"{mode}_median"] = sorted(reps)[len(reps) // 2]
            rec[f"{mode}_reps"] = reps
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
