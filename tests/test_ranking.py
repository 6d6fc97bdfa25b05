"""Distributed ranking vs the single-partition window oracle.

``distributed_row_number`` / ``distributed_ntile`` must match
``row_number()``/``ntile()`` over ``Window.orderBy(...)`` exactly —
the whole point is same semantics, distributed cost.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_workflow_spark.operators.ranking import (
    distributed_ntile,
    distributed_row_number,
)


@pytest.fixture(scope="module")
def scored(spark):
    # Values with heavy ties; id is the unique tiebreak.
    return spark.range(997).select(
        F.col("id"),
        (F.col("id") % 13).alias("score"),
    )


def test_row_number_matches_window(spark, scored):
    order = [F.desc("score"), F.asc("id")]
    got = {
        r["id"]: r["rn"]
        for r in distributed_row_number(scored, order, num_partitions=8)
        .collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in scored.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rn")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n", [1, 4, 7, 32])
def test_ntile_matches_window(spark, scored, n):
    order = [F.desc("score"), F.asc("id")]
    got = {
        r["id"]: r["q"]
        for r in distributed_ntile(
            scored, order, n, out_col="q", num_partitions=8
        ).collect()
    }
    want = {
        r["id"]: r["q"]
        for r in scored.select(
            "id", F.ntile(n).over(Window.orderBy(*order)).alias("q")
        ).collect()
    }
    assert got == want


def test_ntile_more_buckets_than_rows(spark):
    df = spark.range(3).select(F.col("id"))
    got = sorted(
        (r["id"], r["q"])
        for r in distributed_ntile(
            df, [F.asc("id")], 10, out_col="q", num_partitions=4
        ).collect()
    )
    # NTILE with n > rows: bucket == row number.
    assert got == [(0, 1), (1, 2), (2, 3)]


def test_empty_input(spark):
    df = spark.range(0)
    assert distributed_row_number(df, [F.asc("id")]).count() == 0
    assert distributed_ntile(df, [F.asc("id")], 4).count() == 0


def test_no_single_partition_window_in_plan(spark, scored):
    """The scale claim itself: the distributed path contains no Window
    operator at all (and therefore no everything-to-one-task sort),
    while still range-partitioning for global order."""
    from etl_workflow_spark.plans import physical_plan

    out = distributed_ntile(
        scored, [F.desc("score"), F.asc("id")], 4, num_partitions=8
    )
    plan = physical_plan(out)
    assert "Window" not in plan
    assert "rangepartitioning" in plan.lower()


def test_gate_entry_uses_distributed_path(spark, sf_dir):
    """customer_quartiles (the gate entry) must ride this operator,
    not a bare Window.orderBy."""
    import __spark_entry__ as entry

    df = entry.queries()["customer_quartiles"](spark, sf_dir)
    from etl_workflow_spark.plans import physical_plan

    assert "Window" not in physical_plan(df)
