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


def _hist_imports():
    from etl_workflow_spark.operators.sketches import (
        histogram_quantiles,
        merge_histogram_sketches,
        value_histogram_sketch,
    )

    return value_histogram_sketch, merge_histogram_sketches, histogram_quantiles


def test_histogram_merge_is_exact(spark, sf_dir, tmp_path):
    """Per-day sketches merged must equal the whole-table histogram
    EXACTLY — bin counts are exact; only within-bin position is
    approximate. Must also survive parquet (the store is persisted)."""
    sketch, merge, _ = _hist_imports()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    daily = sketch(li, "l_extendedprice", ts_col="l_shipdate")
    path = str(tmp_path / "hist_store")
    daily.write.parquet(path)
    reloaded = spark.read.parquet(path)
    merged = merge(reloaded).collect()[0]
    whole = merge(
        sketch(li.select("l_extendedprice"), "l_extendedprice")
    ).collect()[0]
    assert list(merged.counts) == list(whole.counts)
    assert merged.n == whole.n == li.where("l_extendedprice is not null").count()
    assert merged.vmin == whole.vmin and merged.vmax == whole.vmax
    assert abs(merged.vsum - whole.vsum) < 1e-6 * abs(whole.vsum)


def test_histogram_layout_invariant(spark, sf_dir):
    sketch, merge, _ = _hist_imports()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_extendedprice")
    a = sketch(li, "l_extendedprice").collect()[0]
    b = sketch(li.repartition(7), "l_extendedprice").collect()[0]
    assert dict(a.bins) == dict(b.bins) and a.n == b.n


def test_histogram_quantiles_within_growth_bound(spark, sf_dir):
    """Estimates vs numpy exact: relative error <= growth-1 (plus a
    hair of slack for interpolation at bin boundaries)."""
    import numpy as np

    sketch, merge, quantiles = _hist_imports()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    growth = 1.05
    daily = sketch(li, "l_extendedprice", ts_col="l_shipdate", growth=growth)
    merged = merge(daily)
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    est = dict(quantiles(merged, qs))
    vals = np.array(
        [r.l_extendedprice for r in li.select("l_extendedprice").collect()
         if r.l_extendedprice is not None]
    )
    for q in qs:
        exact = float(np.quantile(vals, q))
        rel = abs(est[q] - exact) / exact
        assert rel <= (growth - 1) + 0.01, (q, est[q], exact, rel)


def test_histogram_edge_bins_clamp_to_extrema(spark):
    sketch, merge, quantiles = _hist_imports()
    df = spark.createDataFrame(
        [(0.0,), (0.001,), (5.0,), (2e9,), (3e9,)], "v double"
    )
    sk = sketch(df, "v", lo=0.01, hi=1e9)
    row = merge(sk).collect()[0]
    assert row.counts[0] == 2  # 0.0 and 0.001 underflow
    assert row.counts[-1] == 2  # the two >hi values overflow
    est = dict(quantiles(merge(sk), [0.0, 1.0]))
    assert est[0.0] == 0.0 and est[1.0] == 3e9


def test_histogram_validates_params(spark):
    sketch, merge, quantiles = _hist_imports()
    df = spark.createDataFrame([(1.0,)], "v double")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sketch(df, "v", lo=10.0, hi=1.0)
    with _pytest.raises(ValueError):
        sketch(df, "v", growth=1.0)
    with _pytest.raises(ValueError):
        quantiles(merge(sketch(df, "v")), [1.5])


def test_histogram_rollup_exactly_once_under_replay(spark, sf_dir, tmp_path):
    """Split real events into two 'micro-batches', roll both into the
    store, and the merged store must equal the one-shot batch build
    EXACTLY (counts are exact). Replaying a batch with its original
    batch_id must leave the store byte-identical (partition overwrite
    idempotence); a NEW batch_id genuinely adds."""
    from etl_workflow_spark.operators.sketches import (
        merge_histogram_sketches,
        value_histogram_sketch,
    )
    from etl_workflow_spark.streaming.incremental import histogram_rollup_batch

    ev = events_table(spark, sf_dir).where(F.col("value").isNotNull())
    store = str(tmp_path / "hist_store")
    b1 = ev.where(F.col("event_id") % 2 == 0)
    b2 = ev.where(F.col("event_id") % 2 == 1)
    histogram_rollup_batch(b1, store, batch_id=0)
    histogram_rollup_batch(b2, store, batch_id=1)

    merged = merge_histogram_sketches(spark.read.parquet(store)).collect()[0]
    whole = merge_histogram_sketches(
        value_histogram_sketch(ev, "value", ts_col="ts")
    ).collect()[0]
    assert list(merged.counts) == list(whole.counts)
    assert merged.n == whole.n and merged.vmin == whole.vmin

    # replay batch 1 (same batch_id): nothing changes
    histogram_rollup_batch(b2, store, batch_id=1)
    replay = merge_histogram_sketches(spark.read.parquet(store)).collect()[0]
    assert list(replay.counts) == list(merged.counts) and replay.n == merged.n

    # same rows under a NEW batch_id: counts double for those rows
    histogram_rollup_batch(b2, store, batch_id=2)
    dup = merge_histogram_sketches(spark.read.parquet(store)).collect()[0]
    assert dup.n == merged.n + b2.count()


def test_stream_histogram_rollup_real_stream(spark, sf_dir, tmp_path):
    """Drive the rollup through a real availableNow file stream; the
    store must match the batch build exactly."""
    import time

    from etl_workflow_spark.operators.sketches import (
        merge_histogram_sketches,
        value_histogram_sketch,
    )
    from etl_workflow_spark.streaming.incremental import stream_histogram_rollup

    ev = events_table(spark, sf_dir).where(F.col("value").isNotNull())
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        stream_histogram_rollup(stream, store, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish"

    merged = merge_histogram_sketches(spark.read.parquet(store)).collect()[0]
    whole = merge_histogram_sketches(
        value_histogram_sketch(ev, "value", ts_col="ts")
    ).collect()[0]
    assert list(merged.counts) == list(whole.counts) and merged.n == whole.n


def test_compact_histogram_store_preserves_totals(spark, sf_dir, tmp_path):
    """Compacting closed batches must leave every merged answer
    unchanged, shrink the fragment count, and keep the still-open
    batch's fragments untouched (replay safety)."""
    import os

    from etl_workflow_spark.operators.sketches import merge_histogram_sketches
    from etl_workflow_spark.streaming.incremental import (
        compact_histogram_store,
        histogram_rollup_batch,
    )

    ev = events_table(spark, sf_dir).where(F.col("value").isNotNull())
    store = str(tmp_path / "store")
    for b in range(3):
        histogram_rollup_batch(
            ev.where(F.col("event_id") % 3 == b), store, batch_id=b
        )
    before = merge_histogram_sketches(spark.read.parquet(store)).collect()[0]
    n_frags_before = spark.read.parquet(store).count()

    # batch 2 is the still-replayable tail: compact everything below it
    compact_histogram_store(spark, store, before_batch_id=2)
    after_df = spark.read.parquet(store)
    after = merge_histogram_sketches(after_df).collect()[0]
    assert list(after.counts) == list(before.counts)
    assert after.n == before.n and after.vmin == before.vmin
    assert after_df.count() < n_frags_before
    # open batch survives under its own id; closed ones merged to -1
    ids = {r.batch_id for r in after_df.select("batch_id").distinct().collect()}
    assert ids == {-1, 2}
    # a replay of the open batch still converges after compaction
    histogram_rollup_batch(
        ev.where(F.col("event_id") % 3 == 2), store, batch_id=2
    )
    replay = merge_histogram_sketches(spark.read.parquet(store)).collect()[0]
    assert list(replay.counts) == list(before.counts)
    assert os.path.isdir(store)


def test_range_estimate_tolerates_mixed_lg_k(spark, sf_dir):
    """A store whose day rows were written at different HLL precisions
    (config drift between the batch builder and the stream maintainer)
    must still answer range queries: the read-side union degrades to
    the coarser lg_k instead of throwing."""
    from etl_workflow_spark.operators.sketches import (
        daily_distinct_sketches,
        distinct_over_range,
        period_overlap_estimate,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo, hi = ev.selectExpr(
        "min(to_date(ts))", "max(to_date(ts))"
    ).collect()[0]
    day_a = daily_distinct_sketches(ev, lg_k=12)
    day_b = daily_distinct_sketches(ev, lg_k=14)
    mixed = day_a.limit(0).unionByName(
        day_a.where("day(date) % 2 = 0")
    ).unionByName(day_b.where("day(date) % 2 = 1"))

    est = distinct_over_range(mixed, str(lo), str(hi)).collect()[0]
    exact = ev.select("user_id").distinct().count()
    assert est.distinct_est > 0
    assert abs(est.distinct_est - exact) / exact < 0.15

    ov = period_overlap_estimate(day_a, day_b).collect()[0]
    assert ov.overlap_est > 0


def test_month_tier_matches_day_tier_on_aligned_ranges(spark, sf_dir):
    """The month store is an exact set-union of its day rows, so an
    aligned (whole-month) range answered from 12× fewer rows must give
    the IDENTICAL estimate the day store gives."""
    import datetime as dt

    from etl_workflow_spark.operators.sketches import (
        daily_distinct_sketches,
        distinct_over_range,
        monthly_distinct_sketches,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    day = daily_distinct_sketches(
        orders, id_col="o_custkey", ts_col="o_orderdate"
    )
    month = monthly_distinct_sketches(day)

    months = sorted(
        r.month for r in month.select("month").distinct().collect()
    )
    assert len(months) >= 2
    start = months[0]
    last = months[-1]
    end = (last.replace(day=28) + dt.timedelta(days=4)).replace(
        day=1
    ) - dt.timedelta(days=1)

    from_day = distinct_over_range(day, str(start), str(end)).collect()[0]
    from_month = distinct_over_range(
        month, str(start), str(end), date_col="month"
    ).collect()[0]
    assert from_month.distinct_est == from_day.distinct_est
    assert from_month.n_days == len(months)


def test_tiered_range_matches_day_tier_on_ragged_ranges(spark, sf_dir):
    """A ragged range (partial edge months) answered month-tier-first
    with day-tier edges equals the pure day-tier answer exactly."""
    import datetime as dt

    from etl_workflow_spark.operators.sketches import (
        daily_distinct_sketches,
        distinct_over_range,
        distinct_over_range_tiered,
        monthly_distinct_sketches,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    day = daily_distinct_sketches(
        orders, id_col="o_custkey", ts_col="o_orderdate"
    )
    month = monthly_distinct_sketches(day)

    lo, hi = orders.agg(
        F.min(F.to_date("o_orderdate")), F.max(F.to_date("o_orderdate"))
    ).collect()[0]
    cases = [
        (lo + dt.timedelta(days=9), hi - dt.timedelta(days=11)),  # ragged
        (lo, hi),  # full span
        (lo + dt.timedelta(days=3), lo + dt.timedelta(days=12)),  # no month
    ]
    for start, end in cases:
        if start > end:
            continue
        tiered = distinct_over_range_tiered(
            day, month, str(start), str(end)
        ).collect()[0]
        flat = distinct_over_range(day, str(start), str(end)).collect()[0]
        assert tiered.distinct_est == flat.distinct_est, (start, end)
        assert tiered.n_sketches <= flat.n_days


def test_monthly_store_materializes_and_answers_tiered(spark, sf_dir, tmp_path):
    """The persisted month store round-trips through parquet and a
    tiered range read over (month store + day store) equals the pure
    day-store answer; a rebuild after new data folds it in."""
    from etl_workflow_spark.operators.sketches import (
        daily_distinct_sketches,
        distinct_over_range,
        distinct_over_range_tiered,
    )
    from etl_workflow_spark.streaming.incremental import (
        rollup_distinct_store_monthly,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    half = orders.where("o_orderkey % 2 = 0")
    day_path = str(tmp_path / "day")
    month_path = str(tmp_path / "month")

    daily_distinct_sketches(
        half, id_col="o_custkey", ts_col="o_orderdate"
    ).write.parquet(day_path)
    rollup_distinct_store_monthly(spark, day_path, month_path)

    lo, hi = orders.agg(
        F.min(F.to_date("o_orderdate")), F.max(F.to_date("o_orderdate"))
    ).collect()[0]
    day = spark.read.parquet(day_path)
    month = spark.read.parquet(month_path)
    tiered = distinct_over_range_tiered(
        day, month, str(lo), str(hi)
    ).collect()[0]
    flat = distinct_over_range(day, str(lo), str(hi)).collect()[0]
    assert tiered.distinct_est == flat.distinct_est

    # late data widens a day; the rebuild folds it into the month tier
    daily_distinct_sketches(
        orders, id_col="o_custkey", ts_col="o_orderdate"
    ).localCheckpoint(eager=True).write.mode("overwrite").parquet(day_path)
    rollup_distinct_store_monthly(spark, day_path, month_path)
    day2 = spark.read.parquet(day_path)
    month2 = spark.read.parquet(month_path)
    tiered2 = distinct_over_range_tiered(
        day2, month2, str(lo), str(hi)
    ).collect()[0]
    flat2 = distinct_over_range(day2, str(lo), str(hi)).collect()[0]
    assert tiered2.distinct_est == flat2.distinct_est
    assert tiered2.distinct_est >= tiered.distinct_est


def test_histogram_drift_reads_numeric_shift(spark):
    """Numeric PSI drift (r12): near-identical windows read stable
    (< 0.1), a shifted distribution reads major (> 0.25), bins line
    up on the shared spine, config mismatches refuse, and store-style
    multi-row sketch sets merge before comparing."""
    import pytest

    from etl_workflow_spark.operators.sketches import (
        histogram_drift,
        value_histogram_sketch,
    )

    base = spark.range(0, 4000).selectExpr(
        "id", "CAST(1.0 + (id % 100) AS DOUBLE) AS v"
    )
    same = spark.range(4000, 8000).selectExpr(
        "id", "CAST(1.0 + (id % 100) AS DOUBLE) AS v"
    )
    shifted = spark.range(0, 4000).selectExpr(
        "id", "CAST(1000.0 + (id % 100) AS DOUBLE) AS v"
    )
    cfg = dict(lo=0.5, hi=1e5, growth=1.5)
    sk = lambda df: value_histogram_sketch(df, "v", **cfg)
    stable = histogram_drift(sk(base), sk(same)).collect()
    assert stable[0]["psi_total_e9"] < 100_000_000  # < 0.1
    major = histogram_drift(sk(base), sk(shifted)).collect()
    assert major[0]["psi_total_e9"] > 250_000_000   # > 0.25
    # full spine (every bin reported, even empty), counts conserved
    assert len(stable) == sk(base).first()["nbins"]
    assert sum(r["n_a"] for r in stable) == 4000
    assert sum(r["n_b"] for r in stable) == 4000
    # multi-row sketch sets (per-day store rows) merge before PSI
    parts = sk(base.where("id % 2 = 0")).unionByName(
        sk(base.where("id % 2 != 0"))
    )
    merged = histogram_drift(parts, sk(base)).collect()
    assert merged[0]["psi_total_e9"] == histogram_drift(
        sk(base), sk(base)).collect()[0]["psi_total_e9"]
    # config mismatch refuses
    with pytest.raises(ValueError, match="one \\(lo, hi"):
        histogram_drift(
            sk(base), value_histogram_sketch(base, "v", lo=0.5,
                                             hi=1e5, growth=2.0),
        )
