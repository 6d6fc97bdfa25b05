"""Sessionization: batch golden cases + stream==batch convergence for
watermark-closed sessions."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_workflow_spark.operators.sessions import sessionize, sessionize_stream


def _ev(uid, minute, value=1.0, eid=None, base=dt.datetime(2024, 1, 1)):
    return (
        eid if eid is not None else uid * 1000 + minute,
        base + dt.timedelta(minutes=minute),
        uid,
        "click",
        value,
        "{}",
    )


COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def test_sessionize_golden(spark):
    rows = [
        _ev(1, 0), _ev(1, 10), _ev(1, 50),      # user 1: [0,10], [50]
        _ev(2, 5),                               # user 2: [5]
        _ev(1, 51), _ev(1, 95),                  # user 1: [50,51], [95]
    ]
    df = spark.createDataFrame(rows, COLS)
    out = {
        (r.user_id, r.session_idx): (r.n_events, r.session_start.minute)
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert out == {
        (1, 1): (2, 0),
        (1, 2): (2, 50),
        (1, 3): (1, 35),  # minute 95 -> 1:35
        (2, 1): (1, 5),
    }


def test_sessionize_tie_break_deterministic(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [
        (2, t, 1, "click", 1.0, "{}"),
        (1, t, 1, "click", 1.0, "{}"),  # same ts, lower event_id
    ]
    df = spark.createDataFrame(rows, COLS)
    out = sessionize(df, gap_minutes=30).collect()
    assert len(out) == 1 and out[0].n_events == 2


def test_sessionize_stream_matches_batch(spark, tmp_path, sf_dir):
    from etl_workflow_spark.catalog import events_table

    events = events_table(spark, sf_dir)
    # split into time-ordered files so the watermark advances per batch
    src = str(tmp_path / "stream_src")
    events.withColumn(
        "bucket", F.ntile(4).over(__import__("pyspark").sql.window.Window.orderBy("ts"))
    ).write.partitionBy("bucket").mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.drop("bucket").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/bucket=*")
    )
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("select * from sess_out").collect()
    }
    assert len(got) > 0
    full_batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(events, gap_minutes=30).collect()
    }
    # every emitted session must be a real (batch-identical) session;
    # sessions still open at end-of-stream are withheld by design
    assert got <= full_batch
    # most sessions should have closed (watermark passed them)
    assert len(got) >= len(full_batch) * 0.5
