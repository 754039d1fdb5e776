"""Sessionization operator (operators/events.py)."""

import pyspark.sql.functions as F

from tilekiln_spark.operators.events import sessionize


def _ev(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_sessionize_gap_boundary(spark):
    # exactly-gap event MERGES (window end is last + gap, end-exclusive is
    # gap+epsilon); one second past the gap splits — the oracle twin's
    # `gap <= 30 minutes` lag test encodes the same rule
    rows = [(1, "2026-01-01T10:00:00", 1, "a", 1.0, ""),
            (2, "2026-01-01T10:30:00", 1, "a", 2.0, ""),
            (3, "2026-01-01T11:00:01", 1, "a", 4.0, "")]
    got = sessionize(_ev(spark, rows)).orderBy("session_start").collect()
    assert [(r.n_events, r.sum_value) for r in got] == [(2, 3.0), (1, 4.0)]
    assert got[0].session_end.isoformat() == "2026-01-01T10:30:00"


def test_sessionize_per_user_isolation(spark):
    rows = [(1, "2026-01-01T10:00:00", 1, "a", 1.0, ""),
            (2, "2026-01-01T10:05:00", 2, "a", 1.0, ""),
            (3, "2026-01-01T10:10:00", 1, "a", 1.0, "")]
    got = sessionize(_ev(spark, rows)).collect()
    assert sorted((r.user_id, r.n_events) for r in got) == [(1, 2), (2, 1)]


def test_sessionize_streaming_compatible(spark, tmp_path):
    # the same aggregate runs as a streaming query with a watermark
    import json

    src = tmp_path / "ev"
    src.mkdir()
    with open(src / "a.jsonl", "w") as f:
        for r in [(1, "2026-01-01T10:00:00", 1, "a", 1.0, ""),
                  (2, "2026-01-01T10:10:00", 1, "a", 2.0, ""),
                  (3, "2026-01-01T12:00:00", 1, "a", 4.0, "")]:
            f.write(json.dumps(dict(zip(
                ["event_id", "ts", "user_id", "event_type", "value", "props"], r))) + "\n")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).json(str(src)).withWatermark("ts", "1 hour")
    q = (
        sessionize(stream)
        .writeStream.format("memory").queryName("sess_out")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted((r.n_events, r.sum_value) for r in spark.sql("SELECT * FROM sess_out").collect())
    assert got == [(1, 4.0), (2, 3.0)]
