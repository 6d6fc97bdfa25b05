"""Seeded synthetic data generator — the reference's fixture machinery,
Spark-first.

The reference (``data-generator.py:1-347``) seeds numpy/random (lines
12-14) and builds each table row-by-row in pandas, then writes CSVs
(307-311, 326-330). A driver-side loop caps out at one machine; here
every table is a ``spark.range`` lineage whose "randomness" is a
deterministic hash of (seed, row id, field) — fully distributed (each
partition generates independently), reproducible across any cluster
size or partitioning, and entirely whole-stage-codegen (no Python in
the generation path).

Output matches the reference CSV layout (``schemas.CSV_SCHEMAS``), so
``pipeline.run_pipeline`` consumes it directly.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import ORDER_STATUSES, PAYMENT_METHODS
from .sources.writers import write_csv

FIRST_NAMES = ("Alice", "Bob", "Carol", "Dan", "Eve", "Frank", "Grace", "Heidi")
LAST_NAMES = ("Smith", "Jones", "Lee", "Patel", "Garcia", "Kim", "Chen", "Olsen")


def _h(col: Column, seed: int, salt: str) -> Column:
    """Non-negative 63-bit hash of (seed, salt, id) — ANSI-safe (no
    abs() on Long.MIN_VALUE), uniform, deterministic everywhere."""
    return F.shiftrightunsigned(
        F.xxhash64(col.cast("string"), F.lit(salt), F.lit(seed)), 1
    )


def _u(col: Column, seed: int, salt: str) -> Column:
    """Uniform double in [0, 1)."""
    return (_h(col, seed, salt) % F.lit(1 << 30)).cast("double") / F.lit(
        float(1 << 30)
    )


def _pick(col: Column, seed: int, salt: str, values: tuple[str, ...]) -> Column:
    return F.element_at(
        F.array(*[F.lit(v) for v in values]),
        (_h(col, seed, salt) % F.lit(len(values)) + 1).cast("int"),
    )


def generate_tables(
    spark: SparkSession,
    n_categories: int = 10,
    n_products: int = 100,
    n_customers: int = 200,
    n_orders: int = 500,
    seed: int = 42,
    start_date: str = "2023-01-01",
    n_days: int = 365,
) -> dict[str, DataFrame]:
    """All five reference tables as DataFrames (FK-consistent)."""
    cid = F.col("id") + 1

    cats = spark.range(n_categories).select(
        cid.cast("int").alias("category_id"),
        F.concat(F.lit("Category "), cid).alias("name"),
        F.concat(F.lit("All about category "), cid).alias("description"),
        # first half are roots; the rest hang off an earlier category
        F.when(
            F.col("id") >= n_categories // 2,
            (_h(cid, seed, "parent") % F.lit(max(n_categories // 2, 1)) + 1).cast(
                "int"
            ),
        ).alias("parent_id"),
        F.lit(None).cast("timestamp").alias("created_at"),
    )

    pid = F.col("id") + 1
    products = spark.range(n_products).select(
        pid.cast("int").alias("product_id"),
        F.concat(F.lit("Product "), pid).alias("name"),
        F.concat(F.lit("Description of product "), pid).alias("description"),
        F.round(F.lit(1.0) + _u(pid, seed, "price") * 999.0, 2)
        .cast("decimal(10,2)")
        .alias("price"),
        F.round(F.lit(0.5) + _u(pid, seed, "cost") * 500.0, 2)
        .cast("decimal(10,2)")
        .alias("cost"),
        (_h(pid, seed, "cat") % F.lit(n_categories) + 1).cast("int").alias(
            "category_id"
        ),
        F.concat(F.lit("SKU-"), F.lpad(pid.cast("string"), 8, "0")).alias("sku"),
        (_h(pid, seed, "inv") % F.lit(1000)).cast("int").alias("inventory_count"),
        F.round(_u(pid, seed, "wt") * 50.0, 2).cast("decimal(8,2)").alias("weight"),
        F.lit(None).cast("timestamp").alias("created_at"),
        (_u(pid, seed, "act") < 0.95).alias("is_active"),
    )

    kid = F.col("id") + 1
    customers = spark.range(n_customers).select(
        kid.cast("int").alias("customer_id"),
        F.concat(F.lit("user"), kid, F.lit("@example.com")).alias("email"),
        _pick(kid, seed, "fn", FIRST_NAMES).alias("first_name"),
        _pick(kid, seed, "ln", LAST_NAMES).alias("last_name"),
        F.concat(F.lit("1 Main St Apt "), kid).alias("street_address"),
        F.lit("Springfield").alias("city"),
        F.lit("IL").alias("state"),
        F.lpad((_h(kid, seed, "zip") % F.lit(99999)).cast("string"), 5, "0").alias(
            "zip_code"
        ),
        F.lit("USA").alias("country"),
        F.lit(None).cast("string").alias("phone"),
        F.lit(None).cast("timestamp").alias("registration_date"),
        F.lit(None).cast("timestamp").alias("last_login"),
    )

    oid = F.col("id") + 1
    order_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start_date), "yyyy-MM-dd")
        + _h(oid, seed, "odate") % F.lit(n_days * 86400)
    )
    orders = spark.range(n_orders).select(
        oid.cast("int").alias("order_id"),
        (_h(oid, seed, "cust") % F.lit(n_customers) + 1).cast("int").alias(
            "customer_id"
        ),
        order_ts.alias("order_date"),
        _pick(oid, seed, "status", ORDER_STATUSES).alias("status"),
        _pick(oid, seed, "pay", PAYMENT_METHODS).alias("payment_method"),
        *[
            F.lit(None).cast("string").alias(c)
            for c in (
                "shipping_address", "shipping_city", "shipping_state",
                "shipping_zip", "shipping_country",
            )
        ],
        *[
            F.lit(None).cast("timestamp").alias(c)
            for c in ("processing_date", "shipping_date", "delivery_date")
        ],
        # recomputed downstream from items (quirk Q6 makes this advisory)
        F.round(_u(oid, seed, "amt") * 5000.0, 2)
        .cast("decimal(12,2)")
        .alias("total_amount"),
    )

    # 1-3 items per order: explode a per-order sequence (distributed
    # fan-out, no driver loop), then join real product prices so item
    # economics are FK-consistent.
    base = spark.range(n_orders).select(
        oid.cast("int").alias("order_id"),
        F.explode(
            F.sequence(
                F.lit(1), (_h(oid, seed, "nitems") % F.lit(3) + 1).cast("int")
            )
        ).alias("line"),
    )
    iid = F.col("order_id") * 10 + F.col("line")
    items = base.select(
        iid.cast("int").alias("order_item_id"),
        F.col("order_id"),
        (_h(iid, seed, "prod") % F.lit(n_products) + 1).cast("int").alias(
            "product_id"
        ),
        (_h(iid, seed, "qty") % F.lit(5) + 1).cast("int").alias("quantity"),
        F.round(_u(iid, seed, "disc") * 5.0, 2).cast("decimal(10,2)").alias(
            "discount"
        ),
    )
    order_items = (
        items.join(
            F.broadcast(products.select("product_id", "price")), on="product_id"
        )
        .withColumn(
            "total",
            (
                F.col("price").cast("decimal(18,2)")
                * F.col("quantity").cast("decimal(18,2)")
                - F.col("discount").cast("decimal(18,2)")
            ).cast("decimal(10,2)"),
        )
        .select(
            "order_item_id", "order_id", "product_id", "quantity",
            "price", "discount", "total",
        )
    )

    return {
        "product_categories": cats,
        "products": products,
        "customers": customers,
        "orders": orders,
        "order_items": order_items,
    }


def generate_csv_dataset(spark: SparkSession, out_dir: str, **kwargs) -> dict[str, int]:
    """Write the generated tables as the reference's CSV layout
    (``data-generator.py:307-311``); returns per-table row counts."""
    counts: dict[str, int] = {}
    for name, df in generate_tables(spark, **kwargs).items():
        write_csv(df, os.path.join(out_dir, f"{name}.csv"))
        counts[name] = df.count()
    return counts
