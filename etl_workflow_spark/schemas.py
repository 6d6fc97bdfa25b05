"""Authoritative schemas — the reference's DDL as Spark StructTypes.

Types follow ``database-schema.sql`` (SURVEY.md §1.2): DECIMAL for all
money (not double — oracle parity through aggregation), TIMESTAMP for
event times, nullable parent_id for the category hierarchy. The ETL
reads CSVs with these schemas instead of inferring (the reference lets
pandas infer then stringifies, ``workflow.py:140-144`` — we keep real
types internally; quirk Q4 only matters for byte-level load parity).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# database-schema.sql:8-10
ORDER_STATUSES = (
    "Pending", "Processing", "Shipped", "In Transit",
    "Delivered", "Cancelled", "Returned",
)
# database-schema.sql:12-14
PAYMENT_METHODS = (
    "Credit Card", "PayPal", "Apple Pay", "Google Pay",
    "Gift Card", "Bank Transfer",
)
# app.py:42 — excluded from every analytics query (quirk Q5)
EXCLUDED_STATUSES = ("Cancelled", "Returned")


def _f(name, dtype, nullable=True):
    return StructField(name, dtype, nullable)


# database-schema.sql:33-40 (+ parent_id from CSV, etl.py:24-25)
PRODUCT_CATEGORIES = StructType([
    _f("category_id", IntegerType(), False),
    _f("name", StringType(), False),
    _f("description", StringType()),
    _f("parent_id", IntegerType()),
    _f("created_at", TimestampType()),
])

# database-schema.sql:46-59
PRODUCTS = StructType([
    _f("product_id", IntegerType(), False),
    _f("name", StringType(), False),
    _f("description", StringType()),
    _f("price", DecimalType(10, 2), False),
    _f("cost", DecimalType(10, 2)),
    _f("category_id", IntegerType(), False),
    _f("sku", StringType(), False),
    _f("inventory_count", IntegerType()),
    _f("weight", DecimalType(8, 2)),
    _f("created_at", TimestampType()),
    _f("is_active", BooleanType()),
])

# database-schema.sql:67-83
CUSTOMERS = StructType([
    _f("customer_id", IntegerType(), False),
    _f("email", StringType(), False),
    _f("first_name", StringType(), False),
    _f("last_name", StringType(), False),
    _f("street_address", StringType()),
    _f("city", StringType()),
    _f("state", StringType()),
    _f("zip_code", StringType()),
    _f("country", StringType()),
    _f("phone", StringType()),
    _f("registration_date", TimestampType()),
    _f("last_login", TimestampType()),
])

# database-schema.sql:91-116 (fact; partition by order_date)
ORDERS = StructType([
    _f("order_id", IntegerType(), False),
    _f("customer_id", IntegerType(), False),
    _f("order_date", TimestampType(), False),
    _f("status", StringType(), False),
    _f("payment_method", StringType()),
    _f("shipping_address", StringType()),
    _f("shipping_city", StringType()),
    _f("shipping_state", StringType()),
    _f("shipping_zip", StringType()),
    _f("shipping_country", StringType()),
    _f("processing_date", TimestampType()),
    _f("shipping_date", TimestampType()),
    _f("delivery_date", TimestampType()),
    _f("total_amount", DecimalType(12, 2)),
])

# database-schema.sql:124-133
ORDER_ITEMS = StructType([
    _f("order_item_id", IntegerType(), False),
    _f("order_id", IntegerType(), False),
    _f("product_id", IntegerType(), False),
    _f("quantity", IntegerType(), False),
    _f("price", DecimalType(10, 2), False),
    _f("discount", DecimalType(10, 2)),
    _f("total", DecimalType(10, 2)),
])

# database-schema.sql:17-30 (generated — operators/dimtime.py)
DIM_TIME = StructType([
    _f("date", DateType(), False),
    _f("day_of_week", IntegerType(), False),
    _f("day_of_month", IntegerType(), False),
    _f("day_of_year", IntegerType(), False),
    _f("week_of_year", IntegerType(), False),
    _f("month", IntegerType(), False),
    _f("month_name", StringType(), False),
    _f("quarter", IntegerType(), False),
    _f("year", IntegerType(), False),
    _f("is_weekend", BooleanType(), False),
    _f("is_holiday", BooleanType(), False),
])

# database-schema.sql:140-149
DAILY_SALES_AGGREGATION = StructType([
    _f("date", DateType(), False),
    _f("product_id", IntegerType(), False),
    _f("category_id", IntegerType()),
    _f("units_sold", IntegerType()),
    _f("revenue", DecimalType(12, 2)),
    _f("order_count", IntegerType()),
    _f("avg_unit_price", DecimalType(10, 2)),
])

CSV_SCHEMAS = {
    "product_categories": PRODUCT_CATEGORIES,
    "products": PRODUCTS,
    "customers": CUSTOMERS,
    "orders": ORDERS,
    "order_items": ORDER_ITEMS,
}
