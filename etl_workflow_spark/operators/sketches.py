"""Mergeable-sketch rollups: the scalable twin of exact COUNT DISTINCT
(reference D6, ``app.py`` analytics).

An exact distinct over an arbitrary date range re-shuffles the range's
raw facts every time someone asks. Datasketches HLL sketches are
MERGEABLE: aggregate each day's users into one ~KB sketch ONCE, store
the sketches, and any later range query is a union of a few hundred
binary blobs — no fact re-scan, no distinct shuffle, error ~1.04/√2^lg_k
(~0.8% at lg_k=14). ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` are Spark built-ins (JVM-side, codegen sinks).

This is the standard "sketch store" pattern of large-scale metrics
platforms (daily uniques, monthly actives, overlap between periods);
the exact tier stays available for audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_distinct_sketches(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = 14,
) -> DataFrame:
    """One HLL sketch of distinct ``id_col`` per calendar day:
    (date, sketch, n_rows). Build once per ingested day (idempotent
    re-aggregation of a day replaces its row), persist, and range
    queries never touch the facts again. Map-side partial aggregation:
    the shuffle carries one partial sketch per (task, day)."""
    return (
        events.groupBy(F.to_date(F.col(ts_col)).alias("date"))
        .agg(
            F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("sketch"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def distinct_over_range(
    sketches: DataFrame,
    start: str,
    end: str,
    date_col: str = "date",
    sketch_col: str = "sketch",
) -> DataFrame:
    """Estimated distinct count over an inclusive date range from the
    stored sketches: filters |days| rows (partition/row-group pruned on
    the date column) and unions their sketches — cost is independent of
    the fact volume the range covers. Returns one row:
    (n_days, distinct_est)."""
    ranged = sketches.where(
        (F.col(date_col) >= F.lit(start)) & (F.col(date_col) <= F.lit(end))
    )
    return ranged.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col))
        ).cast("long").alias("distinct_est"),
    )


def period_overlap_estimate(
    sketches_a: DataFrame,
    sketches_b: DataFrame,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Estimated overlap of two periods' distinct populations by
    inclusion-exclusion on sketch unions (retention between months,
    audience overlap): |A∩B| ≈ |A| + |B| − |A∪B|. Same error caveat as
    every HLL subtraction — small overlaps are noisy; audit with the
    exact tier. Returns (a_est, b_est, overlap_est)."""
    a = sketches_a.agg(F.hll_union_agg(F.col(sketch_col)).alias("sa"))
    b = sketches_b.agg(F.hll_union_agg(F.col(sketch_col)).alias("sb"))
    both = a.crossJoin(b)
    return both.select(
        F.hll_sketch_estimate("sa").cast("long").alias("a_est"),
        F.hll_sketch_estimate("sb").cast("long").alias("b_est"),
        F.greatest(
            F.lit(0),
            (
                F.hll_sketch_estimate("sa")
                + F.hll_sketch_estimate("sb")
                - F.hll_sketch_estimate(F.hll_union("sa", "sb"))
            ),
        ).cast("long").alias("overlap_est"),
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    max_items_tracked: int = 10_000,
) -> DataFrame:
    """Approximate top-k frequent items (``approx_top_k`` built-in —
    a bounded frequent-items sketch per partition, merged once): the
    hot-key detector that feeds the skew tier (`operators/skew.py`)
    and term/domain monitoring, at one pass and O(max_items_tracked)
    state — where an exact top-k pays a full groupBy shuffle over every
    distinct value. Exact counts for items that dominate; items near
    the tracking boundary can under-count (standard frequent-items
    contract). Returns (item, count) rows, most frequent first."""
    sk = df.selectExpr(
        f"approx_top_k({col}, {int(k)}, {int(max_items_tracked)}) AS tk"
    )
    return sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").alias("count")
    )
