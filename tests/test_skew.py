"""Salted aggregate/join rewrites must be result-identical to the plain
plan for every salt factor — the salt is purely a performance knob."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_workflow_spark.operators.skew import salted_aggregate, salted_join


def _rows(df, *keys):
    return sorted(tuple(r) for r in df.select(*keys).collect())


def test_salted_aggregate_matches_plain_groupby(spark, sf_dir):
    # decimal money so the two-level sum is order-independent (double
    # sums differ in the last ulp depending on addition order)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("decimal(18,2)")
    )
    plain = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("total"),
        F.count("o_orderkey").alias("n"),
        F.min("o_orderdate").alias("first"),
        F.max("o_orderdate").alias("last"),
    )
    for buckets in (1, 7, 32):
        salted = salted_aggregate(
            orders,
            ["o_custkey"],
            {
                "total": ("sum", "o_totalprice"),
                "n": ("count", "o_orderkey"),
                "first": ("min", "o_orderdate"),
                "last": ("max", "o_orderdate"),
            },
            salt_buckets=buckets,
        )
        cols = ["o_custkey", "total", "n", "first", "last"]
        assert _rows(salted, *cols) == _rows(plain, *cols)


def test_salted_aggregate_rejects_non_decomposable(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(orders, ["o_custkey"], {"d": ("countDistinct", "o_orderkey")})


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, on="o_custkey")
    cols = ["o_orderkey", "o_custkey", "c_name"]
    for buckets in (1, 5):
        salted = salted_join(orders, customer, "o_custkey", salt_buckets=buckets)
        assert _rows(salted, *cols) == _rows(plain, *cols)


def test_salted_join_rejects_outer_modes(spark, sf_dir):
    # the exploded dim side would emit unmatched rows salt_buckets times
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="inner/left only"):
            salted_join(orders, customer, "o_custkey", how=how)


def test_salted_join_left_keeps_unmatched(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # drop half the customers so some orders have no match
    customer = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where("c_custkey % 2 = 0")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    plain = orders.join(customer, on="o_custkey", how="left")
    salted = salted_join(orders, customer, "o_custkey", how="left", salt_buckets=4)
    cols = ["o_orderkey", "o_custkey", "c_name"]
    assert _rows(salted, *cols) == _rows(plain, *cols)
