import datetime as dt

from pyspark.sql import functions as F

from etl_workflow_spark.operators.temporal import (
    asof_join,
    interval_join,
    rolling_daily,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_matches_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00")),
            (2, "u", _ts("2024-01-01 12:00:00")),
            (3, "u", _ts("2024-01-01 09:00:00")),  # before any right row
            (4, "v", _ts("2024-01-01 10:30:00")),
            (5, "w", _ts("2024-01-01 10:00:00")),  # key with no right rows
        ],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 09:30:00"), 100),
            ("u", _ts("2024-01-01 10:00:00"), 200),  # ties left id=1: inclusive
            ("u", _ts("2024-01-01 11:00:00"), 300),
            ("v", _ts("2024-01-01 10:30:00"), 400),
        ],
        ["k", "rts", "val"],
    )
    out = {
        r["id"]: r["val"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["val"],
        ).collect()
    }
    assert out == {1: 200, 2: 300, 3: None, 4: 400, 5: None}


def test_asof_join_tolerance_voids_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 12:00:00"))], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:00:00"), 7)], ["k", "rts", "val"]
    )
    fresh = asof_join(
        left, right, "k", "ts", "rts", ["val"], tolerance_seconds=3 * 3600
    ).collect()[0]
    stale = asof_join(
        left, right, "k", "ts", "rts", ["val"], tolerance_seconds=3600
    ).collect()[0]
    assert fresh["val"] == 7
    assert stale["val"] is None


def test_interval_join_equals_naive_range_join(spark):
    points = spark.createDataFrame(
        [(i, _ts("2024-01-01 00:00:00") + dt.timedelta(minutes=17 * i))
         for i in range(60)],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 02:30:00")),
            (2, _ts("2024-01-01 02:00:00"), _ts("2024-01-01 02:10:00")),
            (3, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 06:00:00")),
            (4, _ts("2024-03-01 00:00:00"), _ts("2024-03-01 01:00:00")),  # empty
        ],
        ["iid", "lo", "hi"],
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, "ts", "lo", "hi",
                               bin_seconds=600).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .where((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
        .collect()
    )
    assert got == naive and len(got) > 0


def test_rolling_daily_range_frame_respects_calendar_gaps(spark):
    daily = spark.createDataFrame(
        [
            (dt.date(2024, 1, 1), 10.0),
            (dt.date(2024, 1, 2), 20.0),
            # gap: Jan 3-9 missing; Jan 10 must NOT see Jan 1-2
            (dt.date(2024, 1, 10), 40.0),
        ],
        ["date", "rev"],
    )
    out = {
        r["date"]: (r["rev_7d_sum"], r["rev_7d_avg_e4"], r["rev_cumulative"])
        for r in rolling_daily(daily, "date", "rev", days=7).collect()
    }
    # avg is BIGINT fixed-point in 1e-4 units (15.0 -> 150000)
    assert out[dt.date(2024, 1, 2)] == (30.0, 150000, 30.0)
    assert out[dt.date(2024, 1, 10)] == (40.0, 400000, 70.0)


def test_interval_join_auto_bin_matches_fixed(spark):
    points = spark.createDataFrame(
        [(i, _ts("2024-01-01 00:00:00") + dt.timedelta(minutes=13 * i))
         for i in range(40)],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 03:00:00")),
            (2, _ts("2024-01-01 04:00:00"), _ts("2024-01-01 04:30:00")),
        ],
        ["iid", "lo", "hi"],
    )
    fixed = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, "ts", "lo", "hi", 600).collect()
    )
    auto = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, "ts", "lo", "hi", None).collect()
    )
    assert auto == fixed and len(auto) > 0


# ------------------------------------------------------------ funnel


def test_funnel_python_oracle(spark, sf_dir):
    """First-touch funnel over the real events table vs a sequential
    per-user Python scan."""
    import datetime as dt

    from etl_workflow_spark.catalog import events_table
    from etl_workflow_spark.operators.temporal import funnel, funnel_counts

    ev = events_table(spark, sf_dir)
    steps = ["view", "click", "purchase"]
    got = {
        r.user_id: (r.t_1, r.t_2, r.t_3, r.reached)
        for r in funnel(ev, steps).collect()
    }

    rows = ev.select("user_id", "ts", "event_type").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    expected = {}
    for u, evs in by_user.items():
        evs.sort()
        t = [None, None, None]
        t[0] = next((ts for ts, e in evs if e == steps[0]), None)
        if t[0] is None:
            continue
        for i in (1, 2):
            t[i] = next(
                (ts for ts, e in evs if e == steps[i] and ts > t[i - 1]),
                None,
            )
            if t[i] is None:
                break
        reached = sum(1 for x in t if x is not None)
        expected[u] = (t[0], t[1], t[2], reached)
    assert got == expected
    assert any(v[3] == 3 for v in got.values()), "no full conversion in fixture"

    counts = funnel_counts(funnel(ev, steps), 3).collect()[0]
    assert counts.step_1_users == len(expected)
    assert counts.step_3_users == sum(1 for v in expected.values() if v[3] == 3)


def test_funnel_within_window(spark):
    import datetime as dt

    from etl_workflow_spark.operators.temporal import funnel

    base = dt.datetime(2024, 1, 1)
    rows = [
        # converts: click 1h after view
        (1, base, "view"), (1, base + dt.timedelta(hours=1), "click"),
        # stalls: click 10 days after FIRST view (outside 1-day window),
        # even though a second view exists 9 days in (first-touch)
        (2, base, "view"), (2, base + dt.timedelta(days=9), "view"),
        (2, base + dt.timedelta(days=10), "click"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: r.reached
        for r in funnel(ev, ["view", "click"], within="1 days").collect()
    }
    assert got == {1: 2, 2: 1}


def test_retention_cohorts_python_oracle(spark, sf_dir):
    """Weekly signup-cohort retention vs a Python set computation on
    the real events table."""
    import datetime as dt

    from etl_workflow_spark.catalog import events_table
    from etl_workflow_spark.operators.temporal import retention_cohorts

    ev = events_table(spark, sf_dir)
    got = {
        (r.cohort, r.period_offset): r.n_users
        for r in retention_cohorts(ev, "signup", grain="week").collect()
    }

    def monday(ts):
        d = ts.date()
        return d - dt.timedelta(days=d.weekday())

    rows = ev.select("user_id", "ts", "event_type").collect()
    first_signup: dict = {}
    activity: dict = {}
    for r in rows:
        if r.event_type == "signup":
            cur = first_signup.get(r.user_id)
            if cur is None or r.ts < cur:
                first_signup[r.user_id] = r.ts
        activity.setdefault(r.user_id, set()).add(monday(r.ts))
    expected: dict = {}
    for u, ts0 in first_signup.items():
        c = monday(ts0)
        for w in activity[u]:
            if w >= c:
                off = (w - c).days // 7
                key = (dt.datetime.combine(c, dt.time()), off)
                expected[key] = expected.get(key, 0) + 1
    got_norm = {(k[0].replace(tzinfo=None), k[1]): v for k, v in got.items()}
    assert got_norm == expected
    assert any(k[1] > 0 for k in expected), "fixture has no retained weeks"


def test_event_transitions_python_oracle(spark, sf_dir):
    from collections import Counter

    from etl_workflow_spark.catalog import events_table
    from etl_workflow_spark.operators.temporal import event_transitions

    ev = events_table(spark, sf_dir)
    got = {
        (r.from_type, r.to_type): r.n_transitions
        for r in event_transitions(ev).collect()
    }

    rows = ev.select("user_id", "ts", "event_type", "event_id").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    expected: Counter = Counter()
    for evs in by_user.values():
        evs.sort(key=lambda x: x[0])  # stable on ts, matching the window
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            expected[(a, b)] += 1
    # same-timestamp pairs are tie-ambiguous between engines; the
    # fixture's microsecond timestamps make ties vanishingly rare, and
    # totals must agree regardless of tie order per user when types tie
    assert sum(got.values()) == sum(expected.values())
    assert got == dict(expected)


def test_fill_calendar_gaps(spark):
    import datetime as dt

    from etl_workflow_spark.operators.temporal import fill_calendar_gaps

    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 10),
        ("a", d(2024, 1, 4), 40),   # gap: 2nd, 3rd
        ("b", d(2024, 2, 1), 5),    # single day span
    ]
    daily = spark.createDataFrame(rows, ["k", "date", "v"])
    got = {
        (r.k, r.date): r.v
        for r in fill_calendar_gaps(daily, "date", ["v"], keys=["k"]).collect()
    }
    assert got == {
        ("a", d(2024, 1, 1)): 10,
        ("a", d(2024, 1, 2)): 0,
        ("a", d(2024, 1, 3)): 0,
        ("a", d(2024, 1, 4)): 40,
        ("b", d(2024, 2, 1)): 5,
    }
    # fill=None leaves explicit nulls
    got_n = {
        (r.k, r.date): r.v
        for r in fill_calendar_gaps(
            daily, "date", ["v"], keys=["k"], fill=None
        ).collect()
    }
    assert got_n[("a", d(2024, 1, 2))] is None
