"""approx_count_distinct (HLL++) must stay inside its configured
relative-error bound against the exact count on real testdata."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_distinct_error_bound(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        # rsd=0.02 is one sigma; 5x leaves headroom without being vacuous
        assert abs(approx[k] - n) <= max(1, 0.1 * n), (k, approx[k], n)


def test_percentile_approx_tracks_exact(spark, sf_dir):
    """The documented 100 TB swap for value_percentiles: percentile_approx
    (KLL-style sketch, one pass, bounded memory) must sit within the
    accuracy its parameter promises. accuracy=10000 bounds rank error at
    n/10000; converted to value space via the observed spread."""
    from etl_workflow_spark.catalog import events_table

    ev = events_table(spark, str(sf_dir))
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.95)").alias("exact"),
            F.expr("percentile_approx(value, 0.95, 10000)").alias("approx"),
            F.expr("percentile(value, 0.94)").alias("lo"),
            F.expr("percentile(value, 0.96)").alias("hi"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # rank error n/10000 << 1% of n: approx must land inside the
        # exact [p94, p96] value bracket
        assert r["lo"] <= r["approx"] <= r["hi"], dict(r.asDict())
