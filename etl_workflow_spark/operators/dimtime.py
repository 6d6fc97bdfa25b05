"""Time-dimension generator.

The reference generates one row per calendar day, 2021-01-01 →
2025-12-31 inclusive, with calendar parts (``workflow.py:47-76``).
Spark-first: ``sequence`` + ``explode`` — a single narrow projection,
no shuffle, trivially parallel at any range length.

Calendar-parity traps (SURVEY §2 G7, §7.4 risk 4):
  * day_of_week is Mon=1..Sun=7 (pandas ``weekday()+1``) — Spark's
    ``dayofweek`` is Sun=1, so use ``weekday()+1``.
  * week_of_year is ISO (pandas ``isocalendar().week``) — Spark's
    ``weekofyear`` is ISO already.
  * range bounds are INCLUSIVE (golden test ``workflow.py:346-352``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dim_time_frame(
    spark: SparkSession,
    start_date: str = "2021-01-01",
    end_date: str = "2025-12-31",
) -> DataFrame:
    """One row per day in [start_date, end_date], with calendar parts."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start_date)),
                F.to_date(F.lit(end_date)),
                F.expr("interval 1 day"),
            )
        ).alias("date")
    )
    return days.select(
        F.col("date"),
        (F.weekday("date") + F.lit(1)).alias("day_of_week"),  # Mon=1..Sun=7
        F.dayofmonth("date").alias("day_of_month"),
        F.dayofyear("date").alias("day_of_year"),
        F.weekofyear("date").alias("week_of_year"),  # ISO
        F.month("date").alias("month"),
        F.date_format("date", "MMMM").alias("month_name"),
        F.quarter("date").alias("quarter"),
        F.year("date").alias("year"),
        (F.weekday("date") >= F.lit(5)).alias("is_weekend"),  # Sat/Sun
        F.lit(False).alias("is_holiday"),  # workflow.py:69 — always false
    )


def dim_time_oracle(start_date: str, end_date: str) -> str:
    """DuckDB twin of :func:`dim_time_frame` for the correctness gate."""
    return f"""
        SELECT d AS date,
               CAST(isodow(d) AS INT) AS day_of_week,
               CAST(day(d) AS INT) AS day_of_month,
               CAST(dayofyear(d) AS INT) AS day_of_year,
               CAST(week(d) AS INT) AS week_of_year,
               CAST(month(d) AS INT) AS month,
               monthname(d) AS month_name,
               CAST(quarter(d) AS INT) AS quarter,
               CAST(year(d) AS INT) AS year,
               isodow(d) >= 6 AS is_weekend,
               FALSE AS is_holiday
        FROM (SELECT CAST(unnest(generate_series(DATE '{start_date}',
                                                 DATE '{end_date}',
                                                 INTERVAL 1 DAY)) AS DATE) AS d)
        ORDER BY date
    """
