"""Analytics queries — the reference's GraphQL query surface, Spark-first.

The reference exposes 4 analytics queries + 1 mutation over a Postgres
star schema (``app.py:31-226``, contract ``schema.graphql:42-86``).
Each resolver templates SQL; here each query is a declarative DataFrame
plan that Catalyst optimizes (pushdown, broadcast, AQE).

Port onto the driver's TPC-H-ish testdata (FIXTURES.md §3 mapping):

  orders(order_id, customer_id, order_date, status, total_amount)
    -> orders(o_orderkey, o_custkey, o_orderdate, o_orderstatus, o_totalprice)
  order_items(order_id, product_id, quantity, price, discount)
    -> lineitem(l_orderkey, l_partkey, l_quantity, l_extendedprice, l_discount)
  products(product_id, name)        -> part(p_partkey, p_name)
  product_categories.category_id    -> part.p_brand (grouping dim)
  customers.customer_id             -> customer.c_custkey
  status NOT IN (Cancelled, Returned) -> o_orderstatus <> 'F'

Numeric discipline (oracle parity, SURVEY §7.4 risk 1): money flows
through DECIMAL so sums are exact and order-independent across engines;
cast to DOUBLE only in the output projection (the reference does the
same float() cast at the API edge, ``app.py:68,153,179``).

Every ordered query carries a unique tiebreak key so LIMIT/OFFSET
pagination is deterministic (SURVEY §7.4 risk 2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import table

# DECIMAL(18,2) holds any realistic money value at 100 TB scale and
# keeps Spark's sum-result precision (28,2) inside decimal128.
MONEY = "decimal(18,2)"

# The reference excludes Cancelled/Returned everywhere (app.py:42 — quirk Q5).
EXCLUDED_STATUS = ("F",)


def _money(col: Column) -> Column:
    return col.cast(MONEY)


def _status_ok(col: Column) -> Column:
    return ~col.isin(*EXCLUDED_STATUS)


def item_total() -> Column:
    """The reference's recomputed line total: price*quantity - discount
    (``workflow.py:125``, golden test ``workflow.py:326-332`` — quirk Q6).
    Ported per FIXTURES.md: l_extendedprice*l_quantity - l_discount.
    """
    return _money(
        _money(F.col("l_extendedprice")) * _money(F.col("l_quantity"))
        - _money(F.col("l_discount"))
    )


# --------------------------------------------------------------------------
# 1. productSales (app.py:31-70): 3-way inner join, status + date-range
#    filters, allowlisted sort, LIMIT/OFFSET. Preserves quirk Q1: no
#    DISTINCT, so an order with k items yields k rows.
# --------------------------------------------------------------------------

_PRODUCT_SALES_SORT = {"order_date": "o_orderdate", "total_amount": "o_totalprice"}


def product_sales(
    spark: SparkSession,
    sf_dir: str,
    start_date: str = "1995-01-01",
    end_date: str = "1998-12-31",
    product_id: int | None = None,
    category: str | None = None,
    sort_by: str = "order_date",
    sort_dir: str = "ASC",
    limit: int = 50,
    offset: int = 0,
) -> DataFrame:
    """orders ⨝ lineitem ⨝ part with the reference's filter set.

    Sort column/direction validated against an allowlist with silent
    fallback to defaults, exactly like ``app.py:60-61``.
    """
    orders = table(spark, sf_dir, "orders")
    items = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")

    sort_col = _PRODUCT_SALES_SORT.get(sort_by, "o_orderdate")
    direction = sort_dir.upper() if sort_dir.upper() in ("ASC", "DESC") else "ASC"

    df = (
        orders.filter(_status_ok(F.col("o_orderstatus")))
        .filter(F.col("o_orderdate").between(F.lit(start_date), F.lit(end_date)))
        .join(items, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    if product_id is not None:
        df = df.filter(F.col("p_partkey") == F.lit(product_id))
    if category is not None:
        df = df.filter(F.col("p_brand") == F.lit(category))

    # Tiebreak chain down to full-row identity: the testdata's lineitem
    # can repeat (l_orderkey, l_linenumber), so pagination is only
    # deterministic if the ordering distinguishes every non-identical row.
    ordering = [
        F.col(sort_col).asc() if direction == "ASC" else F.col(sort_col).desc(),
        F.col("o_orderkey").asc(),
        F.col("l_linenumber").asc(),
        F.col("l_partkey").asc(),
        F.col("l_quantity").asc(),
        F.col("l_extendedprice").asc(),
        F.col("l_discount").asc(),
    ]
    return (
        df.select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_totalprice").cast("double").alias("total_amount"),
            F.col("o_orderstatus").alias("status"),
            F.col("p_name").alias("product_name"),
            F.col("l_quantity").cast("int").alias("quantity"),
            item_total().cast("double").alias("item_total"),
            F.col("l_linenumber").alias("line_number"),
        )
        .orderBy(*ordering)
        .offset(offset)
        .limit(limit)
    )


def product_sales_oracle(
    start_date: str = "1995-01-01",
    end_date: str = "1998-12-31",
    sort_by: str = "order_date",
    sort_dir: str = "ASC",
    limit: int = 50,
    offset: int = 0,
) -> str:
    sort_col = _PRODUCT_SALES_SORT.get(sort_by, "o_orderdate")
    direction = sort_dir.upper() if sort_dir.upper() in ("ASC", "DESC") else "ASC"
    return f"""
        SELECT o.o_orderkey AS order_id,
               o.o_orderdate AS order_date,
               CAST(o.o_totalprice AS DOUBLE) AS total_amount,
               o.o_orderstatus AS status,
               p.p_name AS product_name,
               CAST(l.l_quantity AS INT) AS quantity,
               CAST(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * CAST(l.l_quantity AS DECIMAL(18,2))
                         - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2))
                    AS DOUBLE) AS item_total,
               l.l_linenumber AS line_number
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE o.o_orderstatus <> 'F'
          AND o.o_orderdate BETWEEN TIMESTAMP '{start_date} 00:00:00'
                                AND TIMESTAMP '{end_date} 00:00:00'
        ORDER BY {sort_col} {direction}, o.o_orderkey ASC, l.l_linenumber ASC,
                 l.l_partkey ASC, l.l_quantity ASC, l.l_extendedprice ASC,
                 l.l_discount ASC
        LIMIT {limit} OFFSET {offset}
    """


# --------------------------------------------------------------------------
# 2. topSellingProductsByCategory (app.py:109-155): 4-way join + hash agg
#    with SUM/SUM/COUNT DISTINCT, allowlisted sort, top-k.  Flagship.
# --------------------------------------------------------------------------

_TOP_SELLING_SORT = {
    "total_units_sold": "total_units_sold",
    "total_revenue": "total_revenue",
    "order_count": "order_count",
}


def top_selling_by_category(
    spark: SparkSession,
    sf_dir: str,
    category: str | None = None,
    start_date: str | None = None,
    end_date: str | None = None,
    sort_by: str = "total_units_sold",
    sort_dir: str = "DESC",
    limit: int = 25,
) -> DataFrame:
    """Group product sales by product within a category dimension.

    Reference shape ``app.py:115-131``: products ⨝ categories ⨝
    order_items ⨝ orders → SUM(quantity), SUM(total), COUNT DISTINCT
    orders, top-k. Here part.p_brand plays the category.
    part is broadcast — at 100 TB the fact (lineitem) never shuffles
    for this join; the aggregation is the only shuffle, pre-reduced
    map-side by partial aggregation.
    """
    orders = table(spark, sf_dir, "orders")
    items = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")

    df = (
        orders.filter(_status_ok(F.col("o_orderstatus")))
        .join(items, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    if category is not None:
        df = df.filter(F.col("p_brand") == F.lit(category))
    if start_date is not None:
        df = df.filter(F.col("o_orderdate") >= F.lit(start_date))
    if end_date is not None:
        df = df.filter(F.col("o_orderdate") <= F.lit(end_date))

    sort_col = _TOP_SELLING_SORT.get(sort_by, "total_units_sold")
    direction = sort_dir.upper() if sort_dir.upper() in ("ASC", "DESC") else "DESC"
    sort_expr = F.col(sort_col).asc() if direction == "ASC" else F.col(sort_col).desc()

    return (
        df.groupBy(
            F.col("p_partkey").alias("product_id"),
            F.col("p_name").alias("product_name"),
            F.col("p_brand").alias("category_name"),
        )
        .agg(
            F.sum(_money(F.col("l_quantity"))).cast("double").alias("total_units_sold"),
            F.sum(item_total()).cast("double").alias("total_revenue"),
            F.countDistinct("o_orderkey").alias("order_count"),
        )
        .orderBy(sort_expr, F.col("product_id").asc())
        .limit(limit)
    )


def top_selling_by_category_oracle(
    sort_by: str = "total_units_sold",
    sort_dir: str = "DESC",
    limit: int = 25,
    start_date: str | None = None,
    end_date: str | None = None,
) -> str:
    sort_col = _TOP_SELLING_SORT.get(sort_by, "total_units_sold")
    direction = sort_dir.upper() if sort_dir.upper() in ("ASC", "DESC") else "DESC"
    date_pred = ""
    if start_date is not None:
        date_pred += f" AND o.o_orderdate >= TIMESTAMP '{start_date} 00:00:00'"
    if end_date is not None:
        date_pred += f" AND o.o_orderdate <= TIMESTAMP '{end_date} 00:00:00'"
    return f"""
        SELECT p.p_partkey AS product_id,
               p.p_name AS product_name,
               p.p_brand AS category_name,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_units_sold,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * CAST(l.l_quantity AS DECIMAL(18,2))
                             - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2)))
                    AS DOUBLE) AS total_revenue,
               COUNT(DISTINCT o.o_orderkey) AS order_count
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE o.o_orderstatus <> 'F'{date_pred}
        GROUP BY 1, 2, 3
        ORDER BY {sort_col} {direction}, product_id ASC
        LIMIT {limit}
    """


# --------------------------------------------------------------------------
# 3. customerPurchaseHistory (app.py:72-107): point filter + optional
#    date filters + allowlisted sort + LIMIT/OFFSET.
# --------------------------------------------------------------------------


def customer_purchase_history(
    spark: SparkSession,
    sf_dir: str,
    customer_id: int = 1,
    start_date: str | None = None,
    end_date: str | None = None,
    sort_by: str = "order_date",
    sort_dir: str = "DESC",
    limit: int = 10,
    offset: int = 0,
) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    df = orders.filter(F.col("o_custkey") == F.lit(customer_id)).filter(
        _status_ok(F.col("o_orderstatus"))
    )
    if start_date is not None:
        df = df.filter(F.col("o_orderdate") >= F.lit(start_date))
    if end_date is not None:
        df = df.filter(F.col("o_orderdate") <= F.lit(end_date))

    sort_col = _PRODUCT_SALES_SORT.get(sort_by, "o_orderdate")
    direction = sort_dir.upper() if sort_dir.upper() in ("ASC", "DESC") else "DESC"
    sort_expr = F.col(sort_col).asc() if direction == "ASC" else F.col(sort_col).desc()
    return (
        df.select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("payment_method"),
            F.col("o_totalprice").cast("double").alias("total_amount"),
        )
        .orderBy(sort_expr, F.col("order_id").asc())
        .offset(offset)
        .limit(limit)
    )


def customer_purchase_history_oracle(
    customer_id: int = 1,
    sort_by: str = "order_date",
    sort_dir: str = "DESC",
    limit: int = 10,
    offset: int = 0,
) -> str:
    sort_col = _PRODUCT_SALES_SORT.get(sort_by, "o_orderdate")
    direction = sort_dir.upper() if sort_dir.upper() in ("ASC", "DESC") else "DESC"
    return f"""
        SELECT o_orderkey AS order_id,
               o_orderdate AS order_date,
               o_orderstatus AS status,
               o_orderpriority AS payment_method,
               CAST(o_totalprice AS DOUBLE) AS total_amount
        FROM orders
        WHERE o_custkey = {customer_id} AND o_orderstatus <> 'F'
        ORDER BY {sort_col} {direction}, order_id ASC
        LIMIT {limit} OFFSET {offset}
    """


# --------------------------------------------------------------------------
# 4. salesTrends (app.py:157-180): dim_time ⨝ orders ⨝ items,
#    DATE_TRUNC bucketing with an interval allowlist.
# --------------------------------------------------------------------------

_INTERVAL_MAP = {"day": "day", "week": "week", "month": "month"}  # app.py:161-162


def sales_trends(
    spark: SparkSession,
    sf_dir: str,
    interval: str = "month",
    start_date: str = "1995-01-01",
    end_date: str = "1998-12-31",
) -> DataFrame:
    """SUM(item total) per DATE_TRUNC bucket over a dim_time join.

    The reference anchors on dim_time (``app.py:168``) — joining the
    calendar dimension on DATE(order_date) — then joins items. The
    calendar is generated, broadcast, and joined on the derived date
    expression (C5: equi-join on expression).
    """
    from .operators.dimtime import dim_time_frame

    bucket = _INTERVAL_MAP.get(interval, "day")
    orders = table(spark, sf_dir, "orders")
    items = table(spark, sf_dir, "lineitem")
    dt = dim_time_frame(spark, start_date, end_date).select("date")

    return (
        orders.filter(_status_ok(F.col("o_orderstatus")))
        .join(F.broadcast(dt), F.to_date(F.col("o_orderdate")) == F.col("date"))
        .join(items, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.date_trunc(bucket, F.col("date")).cast("date").alias("period"))
        .agg(F.sum(item_total()).cast("double").alias("total_sales"))
        .orderBy(F.col("period").asc())
    )


def sales_trends_oracle(
    interval: str = "month",
    start_date: str = "1995-01-01",
    end_date: str = "1998-12-31",
) -> str:
    bucket = _INTERVAL_MAP.get(interval, "day")
    return f"""
        WITH dt AS (
            SELECT CAST(unnest(generate_series(DATE '{start_date}',
                                               DATE '{end_date}',
                                               INTERVAL 1 DAY)) AS DATE) AS date
        )
        SELECT CAST(DATE_TRUNC('{bucket}', dt.date) AS DATE) AS period,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * CAST(l.l_quantity AS DECIMAL(18,2))
                             - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2)))
                    AS DOUBLE) AS total_sales
        FROM dt
        JOIN orders o ON CAST(o.o_orderdate AS DATE) = dt.date
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus <> 'F'
        GROUP BY 1
        ORDER BY 1
    """


# --------------------------------------------------------------------------
# 5. updateProduct mutation-equivalent (app.py:182-226, J1): no mutable
#    store in vanilla Spark — expressed as a conditional projection the
#    write path overwrites with.  Validation semantics preserved.
# --------------------------------------------------------------------------


def update_product(
    spark: SparkSession,
    sf_dir: str,
    product_id: int,
    name: str | None = None,
    price: float | None = None,
) -> DataFrame:
    """Return the part table with the row updated + updated_at stamped.

    Replicates ``app.py:195-198``: error if no field given.  The
    falsy-parameter quirk Q3 (``if name:`` treats "" as absent) is
    deliberately FIXED to ``is not None`` — documented divergence.
    """
    if name is None and price is None:
        raise ValueError("At least one field (name, price) must be provided")
    part = table(spark, sf_dir, "part")
    is_target = F.col("p_partkey") == F.lit(product_id)
    df = part
    if name is not None:
        df = df.withColumn("p_name", F.when(is_target, F.lit(name)).otherwise(F.col("p_name")))
    if price is not None:
        df = df.withColumn(
            "p_retailprice",
            F.when(is_target, F.lit(price)).otherwise(F.col("p_retailprice")),
        )
    return df.withColumn(
        "updated_at", F.when(is_target, F.current_timestamp()).otherwise(F.lit(None))
    )
