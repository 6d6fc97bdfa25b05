"""ETL transform operators — the reference pipeline, Spark-first.

The reference runs pandas tasks in a Flyte DAG (``workflow.py:229-295``):
extract → clean → transform → aggregate → load.  Here the whole DAG is
lazy DataFrame lineage in one SparkSession; Catalyst replaces Flyte's
task graph (SURVEY §3.1).

Operators (SURVEY §2 labels):
  clean_nulls           B2  df.dropna(subset)           workflow.py:126-138
  recompute_item_total  G1  total = price*qty - disc    workflow.py:125 (Q6)
  with_lifetime_value   C7+D1  customer LV enrichment   workflow.py:128-133 (Q7)
  daily_sales_aggregation  C3+C4+D2  the daily rollup   workflow.py:151-184 (Q2)
  customer_purchase_summary  D5+C8   the summary view   database-schema.sql:182-199
  product_sales_summary      D3      the materialized view  database-schema.sql:157-179
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def _money(col: Column) -> Column:
    return col.cast(MONEY)


def clean_nulls(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """B2: drop rows with nulls in key columns (``workflow.py:126``)."""
    return df.na.drop(subset=list(subset))


def recompute_item_total(
    df: DataFrame,
    price: str = "price",
    quantity: str = "quantity",
    discount: str = "discount",
    out: str = "total",
) -> Column | DataFrame:
    """G1/Q6: overwrite ``total`` with price*quantity - discount
    regardless of the input value (``workflow.py:125``; golden test
    ``workflow.py:326-332``: qty=2, price=10, discount=1 → 19.0).
    """
    total = _money(_money(F.col(price)) * _money(F.col(quantity)) - _money(F.col(discount)))
    return df.withColumn(out, total)


def with_lifetime_value(
    customers: DataFrame,
    orders: DataFrame,
    customer_key: str = "customer_id",
    order_customer_key: str = "customer_id",
    amount: str = "total_amount",
) -> DataFrame:
    """C7+D1+Q7: enrich customers with lifetime_value = SUM of their
    orders' total_amount, 0 when they have none (``workflow.py:128-133``).

    Quirk Q7 preserved: LV sums ALL orders, including Cancelled/Returned
    (the reference's groupby has no status filter).

    Scale note: aggregate-then-join — orders reduce to one row per
    customer BEFORE the join, so the join's build side is |customers|,
    not |orders|.  With AQE the post-agg side often broadcasts.
    """
    lv = orders.groupBy(F.col(order_customer_key).alias(customer_key)).agg(
        F.sum(_money(F.col(amount))).alias("_lv")
    )
    return customers.join(lv, on=customer_key, how="left").withColumn(
        "lifetime_value", F.coalesce(F.col("_lv"), F.lit(0).cast(MONEY))
    ).drop("_lv")


def daily_sales_aggregation(
    items: DataFrame,
    orders: DataFrame,
    products: DataFrame,
    order_key: str = "order_id",
    product_key: str = "product_id",
    order_date: str = "order_date",
    category_key: str = "category_id",
    quantity: str = "quantity",
    total: str = "total",
) -> DataFrame:
    """C3+C4+D2+Q2: the daily rollup (``workflow.py:151-184``).

    items ⟕ orders[date] ⟕ products[category] → group (date, product,
    category) → units_sold, revenue, order_count, avg_unit_price.

    Quirk Q2: avg_unit_price = revenue/units_sold with NaN→0 fill
    (``workflow.py:181``) — expressed as coalesce(try_divide(...), 0).

    Scale: the two enrichment joins broadcast their right sides
    (orders is projected to 2 columns before the join — at 100 TB use
    a co-partitioned shuffle join on order_key instead; Catalyst/AQE
    picks this automatically once the projected side exceeds the
    broadcast threshold). The aggregation is the only full shuffle and
    benefits from map-side partial aggregation.
    """
    dated = items.join(
        orders.select(order_key, order_date), on=order_key, how="left"
    ).withColumn("date", F.to_date(F.col(order_date)))
    enriched = dated.join(
        products.select(product_key, category_key), on=product_key, how="left"
    )
    agg = enriched.groupBy("date", product_key, category_key).agg(
        F.sum(_money(F.col(quantity))).alias("units_sold"),
        F.sum(_money(F.col(total))).alias("revenue"),
        F.countDistinct(order_key).alias("order_count"),
    )
    return agg.withColumn(
        "avg_unit_price",
        F.coalesce(
            F.try_divide(F.col("revenue").cast("double"), F.col("units_sold").cast("double")),
            F.lit(0.0),
        ),
    )


def customer_purchase_summary(
    customers: DataFrame,
    orders: DataFrame,
    customer_key: str = "customer_id",
    order_key: str = "order_id",
    order_date: str = "order_date",
    amount: str = "total_amount",
    status: str = "status",
    excluded_status: Sequence[str] = ("Cancelled", "Returned"),
) -> DataFrame:
    """D5+C8+B4: the customer_purchase_summary view
    (``database-schema.sql:182-199``) — per-customer order count, spend,
    first/last order, avg days between orders
    ((MAX-MIN)/COUNT DISTINCT, ``database-schema.sql:192``).
    """
    joined = customers.join(orders, on=customer_key).filter(
        ~F.col(status).isin(*excluded_status)
    )
    agg = joined.groupBy(customer_key).agg(
        F.countDistinct(order_key).alias("order_count"),
        F.sum(_money(F.col(amount))).alias("total_spent"),
        F.min(order_date).alias("first_order_date"),
        F.max(order_date).alias("last_order_date"),
    )
    return agg.withColumn(
        "avg_days_between_orders",
        F.datediff(F.to_date("last_order_date"), F.to_date("first_order_date"))
        / F.col("order_count"),
    )


def product_sales_summary(
    products: DataFrame,
    categories: DataFrame | None,
    items: DataFrame,
    orders: DataFrame,
    product_key: str = "product_id",
    category_key: str = "category_id",
    category_name: str = "category_name",
    product_name: str = "name",
    order_key: str = "order_id",
    customer_key: str = "customer_id",
    order_date: str = "order_date",
    quantity: str = "quantity",
    total: str = "total",
    status: str = "status",
    excluded_status: Sequence[str] = ("Cancelled", "Returned"),
) -> DataFrame:
    """D3: the product_sales_summary materialized view
    (``database-schema.sql:157-179``) — per-product totals + distinct
    customers + last order date.  Recomputed on demand (A7): Spark has
    no auto-refresh matviews, so the refresh is `overwrite` of this
    frame's output (see sources.writers.overwrite).
    """
    df = products
    if categories is not None:
        df = df.join(F.broadcast(categories), on=category_key, how="left")
    df = (
        df.join(items, on=product_key)
        .join(orders, on=order_key)
        .filter(~F.col(status).isin(*excluded_status))
    )
    return df.groupBy(product_key, product_name, category_name).agg(
        F.sum(_money(F.col(quantity))).alias("total_quantity_sold"),
        F.sum(_money(F.col(total))).alias("total_revenue"),
        F.countDistinct(order_key).alias("order_count"),
        F.countDistinct(customer_key).alias("unique_customers"),
        F.max(order_date).alias("last_order_date"),
    )


def refresh_product_summary_incremental(
    spark,
    summary_path: str,
    products: DataFrame,
    categories: DataFrame | None,
    items: DataFrame,
    orders: DataFrame,
    changed_orders: DataFrame,
    product_key: str = "product_id",
    order_key: str = "order_id",
    **summary_kwargs,
) -> int:
    """A7 at scale: INCREMENTAL refresh of the product_sales_summary
    materialized view (``database-schema.sql:157-179``).

    The reference's ``REFRESH MATERIALIZED VIEW`` recomputes the whole
    view; so does :func:`product_sales_summary` + overwrite. At 100 TB
    of facts that is a full fact scan to pick up one day of orders.
    This operator recomputes ONLY the products touched by
    ``changed_orders`` (the new/updated batch, a subset of ``orders``):

      affected  = products appearing in the changed orders' items
      fresh     = the view recomputed for JUST those products — the
                  ``products`` semi-join makes Catalyst restrict the
                  items join to affected products (partition pruning /
                  min-max skipping on a product-bucketed items table)
      swap      = current summary minus affected rows, union fresh

    Products whose last qualifying order was cancelled by the batch
    simply produce no fresh row and their stale row is dropped —
    matching the inner-join view definition, which a keyed MERGE
    (no WHEN NOT MATCHED BY SOURCE DELETE) would get wrong.

    The rewrite unions against the CURRENT summary (product
    cardinality, not fact cardinality — the summary is always small
    relative to facts) and swaps via staged rename; refresh cost
    scales with the affected products' fact slice, not the corpus.
    Returns the number of affected products.
    """
    from ..sources.writers import _swap_staged

    affected = (
        items.join(
            changed_orders.select(order_key).distinct(), on=order_key
        )
        .select(product_key)
        .distinct()
    )
    n_affected = affected.count()
    if not n_affected:
        return 0
    slice_products = products.join(affected, on=product_key, how="left_semi")
    fresh = product_sales_summary(
        slice_products, categories, items, orders,
        product_key=product_key, order_key=order_key, **summary_kwargs,
    )
    current = spark.read.parquet(summary_path)
    kept = current.join(affected, on=product_key, how="left_anti")
    _swap_staged(spark, summary_path, kept.unionByName(fresh))
    return n_affected


def refresh_product_summary_from_changes(
    spark,
    orders_txn_path: str,
    summary_path: str,
    products: DataFrame,
    categories: DataFrame | None,
    items: DataFrame,
    from_version: int,
    to_version: int | None = None,
    **summary_kwargs,
) -> int:
    """CDC-driven view maintenance: the orders table lives in a
    manifest-log transactional table (``sources/txn.py``); the change
    data feed between two of its versions IS the refresh delta.

    This closes the loop the reference gets from Postgres triggers +
    REFRESH (``database-schema.sql:202-231,157-179``): writers merge
    into the orders table transactionally, and any consumer can later
    bring the summary up to date for exactly the keys that changed —
    inserts, updates, AND deletes all surface in the feed, so a
    product whose orders were deleted is re-derived (or dropped) too.
    No state beyond the last-refreshed version number is needed, and
    the refresh is idempotent: re-running the same version window
    recomputes the same slice.

    Returns the number of affected products (0 when the window is
    empty or the versions are equal).
    """
    from ..sources.txn import latest_version, txn_changes, txn_read

    to_v = (
        latest_version(spark, orders_txn_path)
        if to_version is None
        else to_version
    )
    if to_v is None or to_v == from_version:
        return 0
    order_key = summary_kwargs.get("order_key", "order_id")
    changes = txn_changes(
        spark, orders_txn_path, [order_key], from_version, to_v
    )
    orders_now = txn_read(spark, orders_txn_path, to_v)
    return refresh_product_summary_incremental(
        spark, summary_path, products, categories, items, orders_now,
        changes.select(order_key), **summary_kwargs,
    )
