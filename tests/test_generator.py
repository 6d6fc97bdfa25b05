"""Seeded generator: deterministic across runs/partitionings,
FK-consistent, and consumable by the full pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_workflow_spark import generator as gen


def test_generator_deterministic_and_fk_consistent(spark):
    t1 = gen.generate_tables(spark, n_categories=5, n_products=20,
                             n_customers=30, n_orders=50, seed=7)
    t2 = gen.generate_tables(spark, n_categories=5, n_products=20,
                             n_customers=30, n_orders=50, seed=7)
    for name in t1:
        a = sorted(map(tuple, t1[name].collect()))
        b = sorted(map(tuple, t2[name].repartition(7).collect()))
        assert a == b, f"{name} not deterministic"

    # different seed -> different data
    t3 = gen.generate_tables(spark, n_categories=5, n_products=20,
                             n_customers=30, n_orders=50, seed=8)
    assert sorted(map(tuple, t1["orders"].collect())) != sorted(
        map(tuple, t3["orders"].collect())
    )

    # FK integrity: every reference resolves
    orders, items = t1["orders"], t1["order_items"]
    cust_ids = {r[0] for r in t1["customers"].select("customer_id").collect()}
    assert {r[0] for r in orders.select("customer_id").collect()} <= cust_ids
    prod_ids = {r[0] for r in t1["products"].select("product_id").collect()}
    assert {r[0] for r in items.select("product_id").collect()} <= prod_ids
    cat_ids = {r[0] for r in t1["product_categories"].select("category_id").collect()}
    assert {
        r[0] for r in t1["products"].select("category_id").collect()
    } <= cat_ids
    # item totals follow the Q6 rule against the joined product price
    bad = items.join(
        t1["products"].select("product_id", F.col("price").alias("p")), "product_id"
    ).where(
        F.col("total")
        != (
            F.col("p").cast("decimal(18,2)") * F.col("quantity").cast("decimal(18,2)")
            - F.col("discount").cast("decimal(18,2)")
        ).cast("decimal(10,2)")
    )
    assert bad.count() == 0


def test_generated_csvs_run_through_pipeline(spark, tmp_path):
    from etl_workflow_spark.pipeline import run_pipeline

    raw = str(tmp_path / "raw")
    counts = gen.generate_csv_dataset(
        spark, raw, n_categories=5, n_products=20, n_customers=30, n_orders=50
    )
    assert counts["orders"] == 50
    res = run_pipeline(spark, raw, str(tmp_path / "wh"))
    assert res.rows_loaded["orders"] == 50
    assert res.rows_loaded["order_items"] == counts["order_items"]
    daily = spark.read.parquet(str(tmp_path / "wh" / "daily_sales_aggregation"))
    assert daily.count() > 0
    # revenue present and decimal-typed end to end (SUM widens precision)
    assert dict(daily.dtypes)["revenue"].startswith("decimal(")
