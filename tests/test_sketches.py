"""Sketch-rollup contracts: range estimates from stored daily sketches
must track exact distincts within HLL error, and the sketch store must
round-trip through parquet (the whole point is persisting it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_workflow_spark.catalog import events_table
from etl_workflow_spark.operators.sketches import (
    daily_distinct_sketches,
    distinct_over_range,
    period_overlap_estimate,
)


def test_range_estimate_tracks_exact(spark, sf_dir, tmp_path):
    ev = events_table(spark, sf_dir)
    sk = daily_distinct_sketches(ev)
    # persist + reload: binary sketches must survive parquet
    path = str(tmp_path / "sketches")
    sk.write.parquet(path)
    stored = spark.read.parquet(path)

    lo, hi = ev.agg(
        F.min(F.to_date("ts")), F.max(F.to_date("ts"))
    ).collect()[0]
    mid = lo + (hi - lo) / 2

    for start, end in [(lo, hi), (lo, mid)]:
        est = distinct_over_range(
            stored, str(start), str(end)
        ).collect()[0]
        exact = (
            ev.where(
                (F.to_date("ts") >= F.lit(str(start)))
                & (F.to_date("ts") <= F.lit(str(end)))
            )
            .select("user_id")
            .distinct()
            .count()
        )
        assert exact > 0
        assert abs(est.distinct_est - exact) / exact < 0.05, (
            start, end, est.distinct_est, exact,
        )


def test_period_overlap_estimate(spark, sf_dir):
    ev = events_table(spark, sf_dir)
    sk = daily_distinct_sketches(ev).persist()
    lo, hi = sk.agg(F.min("date"), F.max("date")).collect()[0]
    mid = lo + (hi - lo) / 2
    a = sk.where(F.col("date") <= F.lit(str(mid)))
    b = sk.where(F.col("date") > F.lit(str(mid)))
    row = period_overlap_estimate(a, b).collect()[0]

    ua = {
        r.user_id
        for r in ev.where(F.to_date("ts") <= F.lit(str(mid)))
        .select("user_id").distinct().collect()
    }
    ub = {
        r.user_id
        for r in ev.where(F.to_date("ts") > F.lit(str(mid)))
        .select("user_id").distinct().collect()
    }
    inter = len(ua & ub)
    assert inter > 0
    assert abs(row.a_est - len(ua)) / len(ua) < 0.05
    # subtraction amplifies error: generous relative bound
    assert abs(row.overlap_est - inter) / inter < 0.15
    sk.unpersist()


def test_stream_sketch_rollup_converges_to_batch(spark, sf_dir, tmp_path):
    """Two micro-batches of real events through the streaming rollup
    must estimate the same distincts as one batch build — and a
    replayed batch must not change the sketch (HLL idempotency)."""
    from etl_workflow_spark.streaming.incremental import sketch_rollup_batch

    ev = events_table(spark, sf_dir)
    store = str(tmp_path / "sketch_store")

    b1 = ev.where(F.col("event_id") % 2 == 0)
    b2 = ev.where(F.col("event_id") % 2 == 1)
    sketch_rollup_batch(b1, store, lg_k=12)
    sketch_rollup_batch(b2, store, lg_k=12)

    stored = spark.read.parquet(store)
    lo, hi = ev.agg(
        F.min(F.to_date("ts")), F.max(F.to_date("ts"))
    ).collect()[0]
    est = distinct_over_range(stored, str(lo), str(hi)).collect()[0]
    exact = ev.select("user_id").distinct().count()
    assert abs(est.distinct_est - exact) / exact < 0.05

    # replay batch 2: estimates must be unchanged
    sketch_rollup_batch(b2, store, lg_k=12)
    est2 = distinct_over_range(
        spark.read.parquet(store), str(lo), str(hi)
    ).collect()[0]
    assert est2.distinct_est == est.distinct_est


def test_heavy_hitters_match_exact_on_dominant_items(spark, sf_dir):
    from etl_workflow_spark.operators.sketches import heavy_hitters

    ev = events_table(spark, sf_dir)
    got = {
        r["item"]: r["count"]
        for r in heavy_hitters(ev, "event_type", k=5).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(
            F.count("*").alias("n")
        ).collect()
    }
    # 5 event types, all tracked: counts must be exact
    assert got == exact
