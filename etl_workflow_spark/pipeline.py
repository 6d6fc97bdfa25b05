"""End-to-end ETL pipeline — the reference's Flyte DAG as lazy lineage.

``workflow.py:229-295`` wires extract → concat → transform → load per
table, then daily aggregation and a matview refresh, with Flyte task
pods as execution boundaries. Here the entire DAG is DataFrame lineage
inside one SparkSession: Catalyst sees the whole graph, so column
pruning/pushdown cross what used to be pod boundaries, and the only
materialization points are the sink writes (SURVEY.md §3.1).

Stage map (reference task -> here):
  extract_csv + concatenate_chunks  -> sources.readers.read_csv
  transform_data                    -> _transform_* below
  load_to_db (ON CONFLICT NOTHING)  -> sources.writers.idempotent_append
  populate_dim_time (TRUNCATE+ins)  -> operators.dimtime + writers.overwrite
  aggregate_daily_sales             -> operators.etl.daily_sales_aggregation
  refresh_materialized_view         -> operators.etl.product_sales_summary
                                       + writers.overwrite
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import etl as ops
from .operators.dimtime import dim_time_frame
from .sources import readers, writers


@dataclass
class PipelineResult:
    rows_loaded: dict[str, int] = field(default_factory=dict)
    warehouse: str = ""


def _transform_categories(df: DataFrame) -> DataFrame:
    # etl.py:21-29: dropna on keys, normalize nullable parent_id, sort
    # by id (sort only affected FK load order; semantically a no-op here).
    return ops.clean_nulls(df, ["category_id", "name"]).withColumn(
        "parent_id",
        F.when(F.col("parent_id").isNotNull(), F.col("parent_id").cast("int")),
    )


def _transform_products(df: DataFrame) -> DataFrame:
    # workflow.py:318-323: products transform is identity (+clean).
    return ops.clean_nulls(df, ["product_id", "name", "price"])


def _transform_customers(df: DataFrame, orders: DataFrame) -> DataFrame:
    # workflow.py:128-138: clean (excluding computed lifetime_value from
    # the null-check subset), then LV enrichment (C7+D1, quirk Q7).
    cleaned = ops.clean_nulls(df, ["customer_id", "email"])
    return ops.with_lifetime_value(cleaned, orders)


def _transform_orders(df: DataFrame) -> DataFrame:
    return ops.clean_nulls(df, ["order_id", "customer_id", "order_date"]).withColumn(
        "order_date", F.to_timestamp("order_date")
    )


def _transform_order_items(df: DataFrame) -> DataFrame:
    # workflow.py:120-127: clean + recompute total (quirk Q6).
    return ops.recompute_item_total(
        ops.clean_nulls(df, ["order_item_id", "order_id", "product_id"])
    )


def run_pipeline(
    spark: SparkSession,
    input_dir: str,
    warehouse_dir: str,
    input_format: str = "csv",
) -> PipelineResult:
    """Run the full reference pipeline from raw files to the warehouse.

    Loads are idempotent (re-running appends nothing), facts land
    partitioned by date, and derived relations are recomputed last —
    the same order as ``etl_workflow`` (``workflow.py:247-295``).
    """
    res = PipelineResult(warehouse=warehouse_dir)

    def read(name: str) -> DataFrame:
        path = os.path.join(input_dir, f"{name}.{input_format}")
        if input_format == "csv":
            return readers.read_csv(spark, path, table_name=name)
        return spark.read.parquet(path)

    def sink(name: str) -> str:
        return os.path.join(warehouse_dir, name)

    # 1. dim_time first (workflow.py:249) — truncate-and-reload (A5).
    dim_time = dim_time_frame(spark)
    writers.overwrite(dim_time, sink("dim_time"))

    # 2. dimensions + facts in FK order (etl.py:69-98).
    categories = _transform_categories(read("product_categories"))
    res.rows_loaded["product_categories"] = writers.idempotent_append(
        spark, categories, sink("product_categories"), ["category_id"]
    )

    products = _transform_products(read("products"))
    res.rows_loaded["products"] = writers.idempotent_append(
        spark, products, sink("products"), ["product_id"]
    )

    orders = _transform_orders(read("orders"))
    # Partitioned fact write (the RANGE-partition analog): partition by
    # order year — daily granularity over-partitions small directories.
    orders_out = orders.withColumn("order_year", F.year("order_date"))
    writers.write_partitioned(orders_out, sink("orders"), "order_year")
    res.rows_loaded["orders"] = orders.count()

    customers = _transform_customers(read("customers"), orders)
    res.rows_loaded["customers"] = writers.idempotent_append(
        spark, customers, sink("customers"), ["customer_id"]
    )

    items = _transform_order_items(read("order_items"))
    res.rows_loaded["order_items"] = writers.idempotent_append(
        spark, items, sink("order_items"), ["order_item_id"]
    )

    # 3. daily aggregation (workflow.py:279-291), partition-overwritten
    #    at MONTH grain — the J2 idempotent slice generalized. The agg
    #    table is tiny relative to facts (one row per product×category×
    #    day), so day-grain dirs are pure filesystem overhead: a 6.5-yr
    #    backfill wrote 2,399 directories (~28s of serial commit at
    #    sf0.01, and a small-files problem at scale) where month grain
    #    writes 79. Re-aggregating a day rewrites its month partition —
    #    still a bounded handful of aggregate rows.
    daily = ops.daily_sales_aggregation(items, orders, products).withColumn(
        "month", F.date_format("date", "yyyy-MM")
    )
    writers.overwrite_partitions(
        spark, daily, sink("daily_sales_aggregation"), partition_col="month"
    )

    # 4. "materialized view" refresh (A7): recompute + overwrite.
    summary = ops.product_sales_summary(
        products.withColumnRenamed("name", "product_name"),
        categories.select(
            "category_id", F.col("name").alias("category_name")
        ),
        items,
        orders,
        product_name="product_name",
    )
    writers.overwrite(summary, sink("product_sales_summary"))

    return res
