"""Temporal join and window operators.

Three operators the reference's SQL surface cannot express but every
time-series / activity-log workload needs, each built Spark-first:

  asof_join       latest right row at-or-before each left timestamp —
                  ONE sort shuffle via union+window (no range explosion,
                  no per-row lookup)
  interval_join   points-in-intervals WITHOUT an equality key — time-
                  binned equi-join instead of the quadratic cross join
  rolling_daily   calendar-windowed (RANGE frame) moving aggregates

Capability analogs: the reference joins fact rows to dim_time by exact
date (``database-schema.sql:152-156``); these generalize that to
inexact (as-of) and interval temporal alignment.

Scale notes are on each function; none of them carries a cross join or
a per-row Python path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------------ asof


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row with
    the same key and the greatest ``right_ts`` <= ``left_ts`` (DuckDB's
    ``ASOF LEFT JOIN`` semantics). Unmatched left rows keep nulls.

    Implementation is union-and-carry, the shuffle-minimal plan: tag
    both inputs, union, then one window sorted by (ts, side) per key in
    which ``last(value, ignorenulls)`` carries the most recent right
    payload forward into each left row. Cost = ONE hash shuffle + sort
    on the key — identical to what a sort-merge equi-join would pay —
    versus the range-condition join Spark would otherwise plan as
    BroadcastNestedLoop. State per key is O(1) (the running last), so
    skewed keys degrade to a sort, never to a quadratic buffer.

    Right rows sort BEFORE left rows at equal ts (side 0 < 1), making
    the match inclusive. If multiple right rows share (key, ts) the
    carried one is undefined — pre-aggregate the right side to one row
    per (key, ts), as any as-of semantics requires.

    ``tolerance_seconds`` voids matches older than the given age
    (pandas ``merge_asof(tolerance=...)``): the join still runs in one
    pass; stale matches are nulled afterwards.
    """
    lcols = left.columns
    carried = list(right_cols)
    if right_ts not in carried:
        carried = [right_ts] + carried

    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
        *[F.lit(None).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).alias(f"_r_{c}") for c in carried],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r.unionByName(l).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in carried
        ],
    )
    out = u.where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        fresh = F.col(f"_m_{right_ts}") >= F.col("_ts") - F.expr(
            f"INTERVAL {int(tolerance_seconds)} SECONDS"
        )
        out = out.select(
            *["_k", "_ts"],
            *[F.col(f"_l_{c}").alias(f"_l_{c}") for c in lcols],
            *[
                F.when(fresh, F.col(f"_m_{c}")).alias(f"_m_{c}")
                for c in carried
            ],
        )
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_m_{c}").alias(c) for c in right_cols],
    )


def asof_join_oracle(
    left_sql: str,
    right_sql: str,
    on: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
) -> str:
    """DuckDB twin using its native ASOF LEFT JOIN."""
    lsel = ", ".join(f"l.{c}" for c in left_cols)
    rsel = ", ".join(f"r.{c}" for c in right_cols)
    return f"""
        SELECT {lsel}, {rsel}
        FROM ({left_sql}) l
        ASOF LEFT JOIN ({right_sql}) r
          ON l.{on} = r.{on} AND l.{left_ts} >= r.{right_ts}
    """


# -------------------------------------------------------------- interval


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int | None = 3600,
) -> DataFrame:
    """Keyless points-in-intervals join: every (point, interval) pair
    with ``start <= ts <= end``, with NO equality key to hash on.

    Spark plans a bare range predicate as BroadcastNestedLoopJoin —
    O(points × intervals), the classic scale-killer. Instead both sides
    are mapped onto fixed-width time bins: each interval explodes into
    the bins it covers (``sequence`` — codegen, fanout = duration/bin),
    each point lands in one bin, and the bins equi-join with the exact
    range predicate re-checked afterwards. Candidates are limited to
    pairs sharing a bin, so cost tracks temporal locality, not the
    cross product. Pick ``bin_seconds`` near the median interval length
    so fanout stays O(1); skewed long intervals only widen their own
    fanout. ``bin_seconds=None`` self-tunes: one sketch pass
    (``percentile_approx`` — bounded memory, one scalar to the driver)
    sets the bin to the median interval length, the fanout sweet spot.

    Output: all point columns + all interval columns (names must not
    collide).
    """
    if bin_seconds is None:
        med = intervals.select(
            F.expr(
                f"percentile_approx(unix_timestamp({end_col}) - "
                f"unix_timestamp({start_col}), 0.5, 1000)"
            )
        ).first()[0]
        bin_seconds = max(int(med or 0), 60)
    p = points.withColumn(
        "_bin", (F.unix_timestamp(F.col(point_ts)) / bin_seconds).cast("long")
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bin_seconds).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / bin_seconds).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, on="_bin")
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_bin")
    )


# --------------------------------------------------------------- rolling


def rolling_daily(
    daily: DataFrame,
    date_col: str,
    value_col: str,
    days: int = 7,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Calendar-windowed moving aggregates over a daily series: for each
    day, the sum/avg of ``value_col`` over the trailing ``days``-day
    window (RANGE frame on days-since-epoch, so gaps in the calendar
    count as zero — a ROWS frame would silently stretch the window) and
    the running cumulative sum.

    One sort shuffle per partition key; the frame is O(1) state
    (sliding sum), nothing is buffered. The input should already be the
    daily rollup — run this AFTER aggregation so the window sees one
    row per (key, day), not raw facts.

    The trailing average is emitted as ``{value}_{days}d_avg_e4`` — a
    BIGINT in 1e-4 units of ``value_col`` via truncating integer
    division of the exact windowed sum. Two rounds of oracle hash-fails
    traced to ``round(double, 4)`` landing on the .00005 boundary and
    rounding differently across engines; integer fixed-point from a
    decimal input is bit-identical everywhere (divide by 1e4 to
    display). Feed a decimal ``value_col`` for full exactness.
    """
    keys = partition_cols or []
    d = daily.withColumn("_day", F.datediff(F.col(date_col), F.lit("1970-01-01")))
    trailing = (
        Window.partitionBy(*keys).orderBy("_day").rangeBetween(-(days - 1), 0)
    )
    running = (
        Window.partitionBy(*keys)
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # avg derived from the exact (decimal) windowed sum / count — a
    # direct windowed avg accumulates in engine-specific order
    tsum = F.sum(value_col).over(trailing)
    tcnt = F.count(value_col).over(trailing)
    out = d.select(
        *keys,
        F.col(date_col),
        F.col(value_col),
        tsum.alias(f"{value_col}_{days}d_sum"),
        # decimal(38,0) cast rounds the (integral for decimal inputs)
        # scaled sum before the long cast, so double inputs round sanely
        (tsum * F.lit(10000)).cast("decimal(38,0)").cast("long").alias("_sum_e4"),
        tcnt.alias("_cnt"),
        F.sum(value_col).over(running).alias(f"{value_col}_cumulative"),
    )
    # sign-guarded truncating division: Spark's DIV truncates toward
    # zero while DuckDB's // floors — the CASE pins both to trunc so
    # the oracle twin is exact even on negative sums
    return out.withColumn(
        f"{value_col}_{days}d_avg_e4",
        F.expr(
            "CAST(CASE WHEN _sum_e4 < 0 THEN -((-_sum_e4) DIV _cnt) "
            "ELSE _sum_e4 DIV _cnt END AS BIGINT)"
        ),
    ).drop("_day", "_sum_e4", "_cnt")


# ------------------------------------------------------------ funnel


def funnel(
    events: DataFrame,
    steps: list[str],
    within: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-touch funnel analysis: for each user, the earliest strictly
    ordered completion of ``steps`` (e.g. view → click → purchase),
    optionally within a ``within`` interval of the first step (SQL
    interval string, e.g. ``'7 days'``). Standard product-analytics
    semantics: the funnel anchors on the user's FIRST step-1 event; a
    later step-1 occurrence is never revisited.

    Relational, not per-user iteration: step i is "earliest step-i
    event after t_{i-1}" — a type-filtered slice (predicate reaches the
    scan) joined on the user key and min-aggregated. N steps cost N
    filtered passes + N co-keyed join/agg shuffles, each carrying only
    (user, ts) pairs; no collect_list, no per-row Python, skewed users
    cost their own events. Returns one row per user that entered the
    funnel: (user, t_1..t_N nullable, reached ∈ [1, N]).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    slim = events.select(
        F.col(user_col), F.col(ts_col).alias("_t"), F.col(type_col)
    )
    cur = (
        slim.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min("_t").alias("t_1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        nxt = slim.where(F.col(type_col) == s).select(user_col, "_t")
        cond = F.col("_t") > F.col(f"t_{i - 1}")
        if within is not None:
            cond = cond & (
                F.col("_t") <= F.col("t_1") + F.expr(f"INTERVAL {within}")
            )
        prev_cols = [f"t_{j}" for j in range(1, i)]
        advanced = (
            cur.join(nxt, on=user_col)
            .where(cond)
            .groupBy(user_col, *prev_cols)
            .agg(F.min("_t").alias(f"t_{i}"))
        )
        # left join keeps users who stalled at an earlier step; the
        # lazy checkpoint truncates lineage so step i+1 reuses this
        # frame instead of re-deriving every prior step's scan+join
        # (observed: the step-1 slice scanned N+1 times without it)
        cur = cur.join(
            advanced.select(user_col, f"t_{i}"), on=user_col, how="left"
        ).localCheckpoint(eager=False)
    reached = F.lit(1)
    for i in range(2, len(steps) + 1):
        reached = F.when(F.col(f"t_{i}").isNotNull(), i).otherwise(reached)
    # reached is monotone: t_i only exists if t_{i-1} did
    return cur.select(
        user_col,
        *[f"t_{i}" for i in range(1, len(steps) + 1)],
        reached.cast("int").alias("reached"),
    )


def funnel_counts(funnel_df: DataFrame, n_steps: int) -> DataFrame:
    """Step-wise conversion summary of a :func:`funnel` result: users
    at-or-past each step (one tiny aggregation)."""
    aggs = [
        F.sum((F.col("reached") >= i).cast("long")).alias(f"step_{i}_users")
        for i in range(1, n_steps + 1)
    ]
    return funnel_df.agg(*aggs)


def retention_cohorts(
    events: DataFrame,
    cohort_event: str | None = "signup",
    grain: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort retention: users grouped by the period of their first
    ``cohort_event`` (``None`` = first activity of any type), counted
    as retained in each later period they were active. The classic
    product-analytics triangle: (cohort, period_offset, n_users).

    Three combiner-friendly aggregations and one broadcast-size join:
    cohorts are one row per user (min over a type-filtered slice),
    activity deduplicates to (user, period) — the shuffle carries
    distinct user-periods, not events — and the final rollup is
    |cohorts × offsets| rows. ``period_offset`` counts ``grain``
    boundaries (0 = the cohort period itself).
    """
    src = events.select(
        F.col(user_col), F.col(ts_col).alias("_t"), F.col(type_col)
    )
    first = src if cohort_event is None else src.where(
        F.col(type_col) == cohort_event
    )
    cohorts = first.groupBy(user_col).agg(
        F.date_trunc(grain, F.min("_t")).alias("cohort")
    )
    activity = (
        src.select(user_col, F.date_trunc(grain, F.col("_t")).alias("period"))
        .distinct()
    )
    per_grain_days = {"day": 1, "week": 7}
    joined = activity.join(cohorts, on=user_col).where(
        F.col("period") >= F.col("cohort")
    )
    if grain in per_grain_days:
        offset = (
            F.datediff(F.col("period"), F.col("cohort"))
            / per_grain_days[grain]
        ).cast("long")
    elif grain == "month":
        offset = (
            (F.year("period") - F.year("cohort")) * 12
            + (F.month("period") - F.month("cohort"))
        ).cast("long")
    else:
        raise ValueError(f"unsupported grain: {grain}")
    return (
        joined.select(user_col, "cohort", offset.alias("period_offset"))
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Path analysis primitive: per-user consecutive event pairs rolled
    up to (from_type, to_type, n_transitions) — the transition matrix
    behind "what do users do after X" and Markov-style flow diagrams.

    One partitioned window (hash shuffle on the user key — skewed users
    cost their own events, state is O(1) per row) and one
    combiner-friendly rollup whose shuffle carries |event-type|² rows
    at most. Same-timestamp events make the sequence — and therefore
    the counts — engine/partitioning-dependent; pass a unique
    ``tiebreak_col`` (e.g. an event id) to pin a total order.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    nxt = F.lead(type_col).over(w)
    keep = [user_col, ts_col, type_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
    return (
        events.select(*[F.col(c) for c in keep])
        .withColumn("_next", nxt)
        .where(F.col("_next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"),
            F.col("_next").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def fill_calendar_gaps(
    daily: DataFrame,
    date_col: str,
    value_cols: list[str],
    keys: list[str] | None = None,
    fill=0,
) -> DataFrame:
    """Densify a daily series: emit one row for EVERY calendar day in
    each key's [min, max] span, filling absent days' values with
    ``fill`` (0 for additive metrics, None to leave gaps explicit for
    carry-forward via :func:`asof_join`). Downstream consumers that
    assume gap-free series (exports, plotting, naive ROWS-frame
    windows) get the calendar contract the RANGE-frame operators here
    enforce internally.

    Per key: one min/max aggregation (rows = |keys|), a ``sequence``
    explode into the calendar frame (codegen; rows = span days), and
    one left join back on (key, date) — the series side shuffles once
    on the key-date hash; at 100 TB "daily rollup" scale that side is
    already tiny relative to facts.
    """
    keys = keys or []
    spans = daily.groupBy(*keys).agg(
        F.min(date_col).alias("_lo"), F.max(date_col).alias("_hi")
    )
    calendar = spans.select(
        *keys,
        F.explode(F.sequence("_lo", "_hi")).alias(date_col),
    )
    out = calendar.join(daily, on=[*keys, date_col], how="left")
    filled = [
        F.coalesce(F.col(c), F.lit(fill)).alias(c) if fill is not None
        else F.col(c)
        for c in value_cols
    ]
    return out.select(*keys, date_col, *filled)
