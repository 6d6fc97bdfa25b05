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
