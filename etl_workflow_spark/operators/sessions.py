"""Gap-based sessionization over event streams.

The custom stateful operator a training-data/event pipeline needs that
the reference lacks entirely (its closest hook is the incremental daily
slice, ``database-schema.sql:202-231``). Two execution shapes with the
same semantics:

  sessionize          batch: lag + cumulative-sum session indexing over
                      a (user, ts) window, then one per-session
                      aggregate. Exactly one shuffle — the window's
                      hash(user) exchange is reused by the groupBy
                      (ClusteredDistribution on a key subset), and the
                      session boundary rule is pure SQL, so the DuckDB
                      oracle replays it verbatim.

  sessionize_stream   streaming: applyInPandasWithState with event-time
                      timeout — sessions close when the watermark
                      passes last_event + gap; state per user is O(1)
                      (current open session only).

Scale: both shapes shuffle once on user_id; skewed users are bounded by
session gap (state does not grow with history). The batch form is the
backfill/audit path for the stream (lambda contract, as with
streaming.incremental).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user sessions: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Ordering ties break on
    ``id_col`` so session indexes are deterministic.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # timestamp subtraction keeps microsecond precision on both engines
    is_new = (
        prev_ts.isNull()
        | ((F.col(ts_col) - prev_ts) > F.expr(f"INTERVAL {gap_minutes} MINUTES"))
    ).cast("int")
    indexed = events.withColumn(
        "session_idx",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        indexed.groupBy(F.col(user_col).alias("user_id"), F.col("session_idx"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(25,10)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("int").alias("session_idx"),
            "session_start",
            "session_end",
            "n_events",
            "total_value",
        )
    )


def sessionize_oracle(
    gap_minutes: int = 30, table: str = "events"
) -> str:
    return f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM {table}
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        indexed AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM flagged
        )
        SELECT user_id,
               CAST(session_idx AS INT) AS session_idx,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) AS total_value
        FROM indexed
        GROUP BY user_id, session_idx
    """


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization: one open session per user held in
    state; a session is emitted when the event-time watermark passes
    its end + gap (timeout), or extended when a new in-gap event
    arrives. Late events beyond the watermark are dropped by Spark
    before reaching the operator (standard watermark contract).

    State is a single (start, end, n, total) row per user — O(users),
    not O(events) — and the emitted rows match the batch
    :func:`sessionize` for every session the watermark has closed.
    """
    import pandas as pd  # noqa: F401 (used in the worker closure)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60
    out_schema = (
        "user_id bigint, session_start timestamp, session_end timestamp, "
        "n_events bigint, total_value double"
    )
    state_schema = "start timestamp, end timestamp, n bigint, total double"

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [start],
                    "session_end": [end],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        closed = []
        if state.exists:
            start, end, n, total = state.get
        else:
            start = end = None
            n, total = 0, 0.0
        for ts, val in zip(rows[ts_col], rows[value_col]):
            if start is None:
                start, end, n, total = ts, ts, 1, float(val)
            elif (ts - end).total_seconds() > gap_s:
                closed.append((start, end, n, total))
                start, end, n, total = ts, ts, 1, float(val)
            else:
                end = ts
                n += 1
                total += float(val)
        state.update((start, end, n, total))
        # event-time timeout: fires once the watermark passes end + gap
        state.setTimeoutTimestamp(int(end.timestamp() * 1000) + gap_s * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
