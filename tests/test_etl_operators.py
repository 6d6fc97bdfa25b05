"""Unit tests mirroring the reference's golden-value tests
(``workflow.py:298-352``) plus the quirk list (SURVEY.md §2 Q1-Q7).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from etl_workflow_spark.operators import etl as E
from etl_workflow_spark.operators.dimtime import dim_time_frame


def test_recompute_item_total_golden(spark):
    """Reference golden (workflow.py:326-332): qty=2, price=10.0,
    discount=1.0, input total=0.0 → output total = 19.0 (Q6)."""
    df = spark.createDataFrame(
        [Row(order_item_id=1, quantity=2, price=10.0, discount=1.0, total=0.0)]
    )
    out = E.recompute_item_total(df).collect()[0]
    assert float(out["total"]) == 19.0


def test_clean_nulls_drops_only_subset(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, b="x", c=None),  # null outside subset -> kept
            Row(a=None, b="y", c="z"),  # null in subset -> dropped
        ]
    )
    out = E.clean_nulls(df, ["a", "b"]).collect()
    assert len(out) == 1 and out[0]["b"] == "x"


def test_lifetime_value_null_to_zero_and_no_status_filter(spark):
    """Q7: LV=0 for customers with no orders; LV includes
    Cancelled/Returned orders (workflow.py:128-133 has no status filter)."""
    customers = spark.createDataFrame([Row(customer_id=1), Row(customer_id=2)])
    orders = spark.createDataFrame(
        [
            Row(customer_id=1, total_amount=10.0, status="Delivered"),
            Row(customer_id=1, total_amount=5.0, status="Cancelled"),
        ]
    )
    out = {
        r["customer_id"]: float(r["lifetime_value"])
        for r in E.with_lifetime_value(customers, orders).collect()
    }
    assert out == {1: 15.0, 2: 0.0}


def test_daily_agg_avg_unit_price_zero_guard(spark):
    """Q2: avg_unit_price = revenue/units_sold with 0-fill on 0/0."""
    items = spark.createDataFrame(
        [
            Row(order_id=1, product_id=1, quantity=0, total=0.0),
            Row(order_id=2, product_id=2, quantity=2, total=8.0),
        ]
    )
    orders = spark.createDataFrame(
        [
            Row(order_id=1, order_date=datetime.datetime(2023, 1, 1)),
            Row(order_id=2, order_date=datetime.datetime(2023, 1, 1)),
        ]
    )
    products = spark.createDataFrame(
        [Row(product_id=1, category_id=10), Row(product_id=2, category_id=20)]
    )
    rows = {
        r["product_id"]: r
        for r in E.daily_sales_aggregation(items, orders, products).collect()
    }
    assert float(rows[1]["avg_unit_price"]) == 0.0  # 0/0 -> 0, not null/NaN
    assert float(rows[2]["avg_unit_price"]) == 4.0
    assert rows[2]["date"] == datetime.date(2023, 1, 1)


def test_customer_purchase_summary_avg_days(spark):
    customers = spark.createDataFrame([Row(customer_id=1)])
    orders = spark.createDataFrame(
        [
            Row(customer_id=1, order_id=1, total_amount=10.0,
                order_date=datetime.datetime(2023, 1, 1), status="Delivered"),
            Row(customer_id=1, order_id=2, total_amount=20.0,
                order_date=datetime.datetime(2023, 1, 11), status="Shipped"),
            Row(customer_id=1, order_id=3, total_amount=99.0,
                order_date=datetime.datetime(2023, 2, 1), status="Cancelled"),
        ]
    )
    r = E.customer_purchase_summary(customers, orders).collect()[0]
    assert r["order_count"] == 2  # Cancelled excluded (B4/Q5)
    assert float(r["total_spent"]) == 30.0
    assert float(r["avg_days_between_orders"]) == 5.0  # 10 days / 2 orders


# ------------------------------------------------------------------ dim_time


def test_dim_time_inclusive_three_days(spark):
    """Reference golden (workflow.py:346-352): 3-day range → 3 rows."""
    assert dim_time_frame(spark, "2023-01-01", "2023-01-03").count() == 3


def test_dim_time_full_reference_range_cardinality(spark):
    """workflow.py:47: 2021-01-01..2025-12-31 → 1,826 rows."""
    assert dim_time_frame(spark, "2021-01-01", "2025-12-31").count() == 1826


def test_dim_time_calendar_parts(spark):
    # 2023-01-01 was a Sunday; ISO week 52 of 2022.
    r = dim_time_frame(spark, "2023-01-01", "2023-01-02").collect()
    sun, mon = r[0], r[1]
    assert sun["day_of_week"] == 7 and mon["day_of_week"] == 1  # Mon=1..Sun=7
    assert sun["is_weekend"] and not mon["is_weekend"]
    assert sun["week_of_year"] == 52 and mon["week_of_year"] == 1  # ISO
    assert sun["month_name"] == "January"
    assert sun["quarter"] == 1
    assert not sun["is_holiday"]


# ------------------------------------------------------------------ queries


def test_product_sales_pagination_deterministic(spark, sf_dir):
    from etl_workflow_spark import queries as Q

    page1 = Q.product_sales(spark, sf_dir, limit=5, offset=0).collect()
    page2 = Q.product_sales(spark, sf_dir, limit=5, offset=5).collect()
    both = Q.product_sales(spark, sf_dir, limit=10, offset=0).collect()
    assert [tuple(r) for r in page1 + page2] == [tuple(r) for r in both]


def test_sort_allowlist_fallback(spark, sf_dir):
    from etl_workflow_spark import queries as Q

    good = Q.top_selling_by_category(spark, sf_dir, limit=5).collect()
    bogus = Q.top_selling_by_category(
        spark, sf_dir, sort_by="nope; DROP TABLE", sort_dir="sideways", limit=5
    ).collect()
    assert [tuple(r) for r in good] == [tuple(r) for r in bogus]


def test_update_product_requires_field(spark, sf_dir):
    from etl_workflow_spark import queries as Q

    with pytest.raises(ValueError):
        Q.update_product(spark, sf_dir, 1)
