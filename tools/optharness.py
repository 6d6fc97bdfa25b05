"""Optimization measurement harness (round 14).

Times individual headline queries in isolation and captures their
``explain("formatted")`` plans, using the SAME callables the bench
runs (``bench.build_headline``), so plan claims in ``plans/r14/`` and
OPTIMIZATION_r14.md are checked against exactly the benched workloads.

Two forcing modes per query:

* ``noop``   — ``df.write.format("noop")`` (guide §1.4): computes every
  column, isolates the computation from collect/count overheads.
* ``percol`` — the bench's own count-per-column forcing, for numbers
  directly comparable to BENCH_LOCAL.json.

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

    # same warmup as bench.main
    from etl_workflow_spark import queries as _warm_q

    spark.read.parquet(os.path.join(args.sf_dir, "nation.parquet")).count()
    _warm_q.product_sales(spark, args.sf_dir).count()

    _, qs = bench.build_headline()

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
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            rec["plan"] = path
        modes = (
            ["noop", "percol"] if args.mode == "both" else [args.mode]
        )
        for mode in modes:
            force = _force_noop if mode == "noop" else _force_percol
            best = None
            for _ in range(max(1, args.reps)):
                spark.catalog.clearCache()
                t0 = time.time()
                force(fn(spark, args.sf_dir))
                t = time.time() - t0
                best = t if best is None or t < best else best
            rec[mode] = round(best, 3)
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
