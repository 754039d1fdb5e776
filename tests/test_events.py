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


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def test_asof_join_backward_basic(spark):
    from tilekiln_spark.operators.events import asof_join

    clicks = _ev(spark, [
        (10, "2026-01-01T10:05:00", 1, "click", 1.0, ""),
        (11, "2026-01-01T10:20:00", 1, "click", 2.0, ""),
        (12, "2026-01-01T09:00:00", 1, "click", 3.0, ""),   # before any view
        (13, "2026-01-01T10:05:00", 2, "click", 4.0, ""),   # other user
    ])
    views = _ev(spark, [
        (1, "2026-01-01T10:00:00", 1, "view", 7.0, ""),
        (2, "2026-01-01T10:10:00", 1, "view", 8.0, ""),
        (3, "2026-01-01T10:05:00", 2, "view", 9.0, ""),     # equal-ts match
    ])
    got = {r.event_id: r for r in asof_join(
        clicks, views, ["user_id"], "ts",
        value_cols=["value"], tiebreak_col="event_id").collect()}
    assert got[10].value_asof == 7.0          # latest view <= 10:05
    assert got[11].value_asof == 8.0
    assert got[12].value_asof is None and got[12].ts_asof is None
    assert got[13].value_asof == 9.0          # exact-ts match included
    # left columns unchanged
    assert got[10].value == 1.0 and len(got) == 4


def test_asof_join_tiebreak_and_tolerance(spark):
    from tilekiln_spark.operators.events import asof_join

    left = _ev(spark, [(10, "2026-01-01T12:00:00", 1, "click", 0.0, "")])
    right = _ev(spark, [
        (1, "2026-01-01T11:00:00", 1, "view", 5.0, ""),
        (2, "2026-01-01T11:00:00", 1, "view", 6.0, ""),   # same ts, larger id wins
    ])
    r = asof_join(left, right, ["user_id"], "ts",
                  value_cols=["value"], tiebreak_col="event_id").collect()[0]
    assert r.value_asof == 6.0
    # tolerance 30 minutes: the 11:00 match is older than 11:30 -> nulled
    r2 = asof_join(left, right, ["user_id"], "ts", value_cols=["value"],
                   tiebreak_col="event_id", tolerance="30 minutes").collect()[0]
    assert r2.value_asof is None and r2.ts_asof is None


def test_asof_join_single_shuffle_plan(spark):
    from tilekiln_spark.operators.events import asof_join

    clicks = _ev(spark, [(10, "2026-01-01T10:05:00", 1, "click", 1.0, "")])
    views = _ev(spark, [(1, "2026-01-01T10:00:00", 1, "view", 7.0, "")])
    out = asof_join(clicks, views, ["user_id"], "ts",
                    value_cols=["value"], tiebreak_col="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole join is one window pass: no join node at all
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # one per union branch, same key


# ---------------------------------------------------------------------------
# interval join
# ---------------------------------------------------------------------------

def test_interval_join_half_open_and_buckets(spark):
    from tilekiln_spark.operators.events import interval_join

    pts = _ev(spark, [
        (1, "2026-01-01T10:00:00", 1, "click", 1.0, ""),   # == start: in
        (2, "2026-01-01T10:09:59", 1, "click", 2.0, ""),   # inside
        (3, "2026-01-01T10:10:00", 1, "click", 3.0, ""),   # == end: out
        (4, "2026-01-01T10:05:00", 2, "click", 4.0, ""),   # wrong user
        (5, "2026-01-01T10:25:00", 1, "click", 5.0, ""),   # crosses bucket
    ])
    iv = spark.createDataFrame(
        [(100, 1, "2026-01-01T10:00:00", "2026-01-01T10:10:00"),
         (101, 1, "2026-01-01T10:19:00", "2026-01-01T10:29:00")],
        "iv_id long, iv_user long, start string, end string",
    ).withColumn("start", F.to_timestamp("start")).withColumn("end", F.to_timestamp("end"))

    got = interval_join(
        pts, iv.withColumnRenamed("iv_user", "user_id"),
        key_cols=["user_id"], bucket="10 minutes",
    ).select("event_id", "iv_id").collect()
    assert sorted((r.event_id, r.iv_id) for r in got) == [(1, 100), (2, 100), (5, 101)]


def test_interval_join_no_duplicate_matches(spark):
    from tilekiln_spark.operators.events import interval_join

    # one long interval spanning many buckets; each point matches ONCE
    pts = _ev(spark, [(i, f"2026-01-01T10:{m:02d}:00", 1, "c", 0.0, "")
                      for i, m in enumerate([0, 13, 26, 39, 52])])
    iv = spark.createDataFrame(
        [(1, 1, "2026-01-01T09:55:00", "2026-01-01T11:00:00")],
        "iv_id long, user_id long, start string, end string",
    ).withColumn("start", F.to_timestamp("start")).withColumn("end", F.to_timestamp("end"))
    got = interval_join(pts, iv, key_cols=["user_id"], bucket="5 minutes").collect()
    assert len(got) == 5


def test_interval_join_plan_is_equi_join(spark):
    from tilekiln_spark.operators.events import interval_join

    pts = _ev(spark, [(1, "2026-01-01T10:00:00", 1, "c", 0.0, "")])
    iv = spark.createDataFrame(
        [(1, 1, "2026-01-01T09:55:00", "2026-01-01T10:05:00")],
        "iv_id long, user_id long, start string, end string",
    ).withColumn("start", F.to_timestamp("start")).withColumn("end", F.to_timestamp("end"))
    plan = interval_join(pts, iv, key_cols=["user_id"])._jdf.queryExecution().executedPlan().toString()
    # hash-partitionable equi-join on (user_id, bucket); NOT a nested-loop
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_join_forward_and_nearest(spark):
    from tilekiln_spark.operators.events import asof_join

    left = _ev(spark, [
        (10, "2026-01-01T10:00:00", 1, "click", 0.0, ""),   # nearest: forward (1 vs 2 min)
        (11, "2026-01-01T11:00:00", 1, "click", 0.0, ""),   # forward: none after
        (12, "2026-01-01T09:30:00", 1, "click", 0.0, ""),   # backward: none before
    ])
    right = _ev(spark, [
        (1, "2026-01-01T09:58:00", 1, "view", 5.0, ""),
        (2, "2026-01-01T10:01:00", 1, "view", 6.0, ""),
    ])
    fwd = {r.event_id: r for r in asof_join(
        left, right, ["user_id"], "ts", value_cols=["value"],
        tiebreak_col="event_id", direction="forward").collect()}
    assert fwd[10].value_asof == 6.0          # earliest at-or-after 10:00
    assert fwd[11].value_asof is None
    assert fwd[12].value_asof == 5.0
    near = {r.event_id: r for r in asof_join(
        left, right, ["user_id"], "ts", value_cols=["value"],
        tiebreak_col="event_id", direction="nearest").collect()}
    assert near[10].value_asof == 6.0         # 1 min forward beats 2 min back
    assert near[11].value_asof == 6.0         # only backward exists
    assert near[12].value_asof == 5.0         # only forward exists


def test_asof_join_nearest_tie_goes_backward(spark):
    from tilekiln_spark.operators.events import asof_join

    left = _ev(spark, [(10, "2026-01-01T10:00:00", 1, "click", 0.0, "")])
    right = _ev(spark, [
        (1, "2026-01-01T09:59:00", 1, "view", 5.0, ""),
        (2, "2026-01-01T10:01:00", 1, "view", 6.0, ""),
    ])
    r = asof_join(left, right, ["user_id"], "ts", value_cols=["value"],
                  tiebreak_col="event_id", direction="nearest").collect()[0]
    assert r.value_asof == 5.0                # pandas tie rule: backward wins
    # forward-side tolerance nulls the forward candidate; backward survives
    r2 = asof_join(left, right, ["user_id"], "ts", value_cols=["value"],
                   tiebreak_col="event_id", direction="nearest",
                   tolerance="30 seconds").collect()[0]
    assert r2.value_asof is None              # both outside 30 s


def test_asof_join_nearest_single_exchange(spark):
    from tilekiln_spark.operators.events import asof_join

    left = _ev(spark, [(10, "2026-01-01T10:00:00", 1, "click", 0.0, "")])
    right = _ev(spark, [(1, "2026-01-01T09:59:00", 1, "view", 5.0, "")])
    plan = asof_join(left, right, ["user_id"], "ts", value_cols=["value"],
                     tiebreak_col="event_id", direction="nearest",
                     )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # both direction passes reuse ONE hash partitioning on the keys
    assert plan.count("Exchange hashpartitioning") <= 2


def test_asof_join_matched_row_is_atomic(spark):
    """A matched right row with a NULL value field keeps that null — the
    fill never splices a value from an older right row (review fix)."""
    from tilekiln_spark.operators.events import asof_join

    left = _ev(spark, [(10, "2026-01-01T10:06:00", 1, "click", 0.0, "")])
    right = _ev(spark, [
        (1, "2026-01-01T10:00:00", 1, "view", 7.0, ""),
        (2, "2026-01-01T10:05:00", 1, "view", None, ""),
    ])
    r = asof_join(left, right, ["user_id"], "ts", value_cols=["value"],
                  tiebreak_col="event_id").collect()[0]
    assert r.ts_asof.isoformat() == "2026-01-01T10:05:00"
    assert r.value_asof is None      # NOT 7.0 from the older row


def test_asof_join_chaining_guard_and_suffix(spark):
    import pytest

    from tilekiln_spark.operators.events import asof_join

    clicks = _ev(spark, [(10, "2026-01-01T10:05:00", 1, "click", 1.0, "")])
    views = _ev(spark, [(1, "2026-01-01T10:00:00", 1, "view", 7.0, "")])
    once = asof_join(clicks, views, ["user_id"], "ts",
                     value_cols=["value"], tiebreak_col="event_id")
    with pytest.raises(ValueError, match="suffix"):
        asof_join(once, views, ["user_id"], "ts",
                  value_cols=["value"], tiebreak_col="event_id")
    twice = asof_join(once, views, ["user_id"], "ts",
                      value_cols=["value"], tiebreak_col="event_id",
                      suffix="_v2").collect()[0]
    assert twice.value_asof == 7.0 and twice.value_v2 == 7.0


def test_interval_join_stream_static(spark, tmp_path):
    """interval_join composes with Structured Streaming unchanged: a
    streaming points side against static intervals is a stream-static
    equi-join (append mode, no state, no watermark needed)."""
    import json

    from tilekiln_spark.operators.events import interval_join

    src = tmp_path / "pts"
    src.mkdir()
    with open(src / "a.jsonl", "w") as f:
        for r in [(1, "2026-01-01T10:05:00", 1, "click", 1.0, ""),
                  (2, "2026-01-01T10:25:00", 1, "click", 2.0, ""),
                  (3, "2026-01-01T10:05:00", 2, "click", 3.0, "")]:
            f.write(json.dumps(dict(zip(
                ["event_id", "ts", "user_id", "event_type", "value", "props"], r))) + "\n")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).json(str(src))
    iv = spark.createDataFrame(
        [(100, 1, "2026-01-01T10:00:00", "2026-01-01T10:10:00")],
        "iv_id long, user_id long, start string, end string",
    ).withColumn("start", F.to_timestamp("start")).withColumn("end", F.to_timestamp("end"))
    q = (
        interval_join(stream, iv, key_cols=["user_id"], bucket="10 minutes")
        .select("event_id", "iv_id")
        .writeStream.format("memory").queryName("ivj_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted((r.event_id, r.iv_id) for r in spark.sql("SELECT * FROM ivj_out").collect())
    assert got == [(1, 100)]


def test_mann_kendall_cells_trends(spark):
    """One cell with strictly increasing daily counts -> S = n(n-1)/2 and
    'increasing'; one flat cell -> S = 0, z = 0, 'none'; densify pins an
    absent middle day as a 0 count (S flips sign vs the skip-it answer)."""
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F401

    from tilekiln_spark.operators.events import mann_kendall_cells

    base = dt.datetime(2024, 1, 1)
    rows = []
    # cell A at (~0.5, 0.5)M: 1, 2, 3 events on days 0, 1, 2
    for day, k in ((0, 1), (1, 2), (2, 3)):
        for i in range(k):
            rows.append((5e5, 5e5, base + dt.timedelta(days=day, hours=i)))
    # cell B at (~-3.5M): 2 events day 0, 2 events day 2, NOTHING day 1
    for day in (0, 2):
        for i in range(2):
            rows.append((-3.5e6, -3.5e6, base + dt.timedelta(days=day, hours=i)))
    ev = spark.createDataFrame(rows, "mx double, my double, ts timestamp")
    out = {(r.cx, r.cy): r for r in
           mann_kendall_cells(ev, cell=5e6, period_seconds=86400).collect()}
    a = out[(0, 0)]
    assert (a.n_events, a.s_stat, a.trend) == (6, 3, "increasing")
    b = out[(-1, -1)]
    # dense series (2, 0, 2): pairs (2,0)->-1, (2,2)->0, (0,2)->+1 -> S=0
    assert (b.n_events, b.s_stat, b.trend) == (4, 0, "none")
    assert b.mk_z == 0.0


def test_trajectory_cpa_crossing_and_parallel(spark):
    """Two users crossing at the same place but NOT the same time: user 1
    passes y=0 at t=100, user 2 runs the opposite way on the line y=3;
    the x separation 2|t-105| vanishes at t=105, leaving the constant
    3 m cross-track gap -> CPA distance 3 at t=105 (NOT the naive
    closest-sample answer).  A parallel
    co-moving pair (|V|=0) clamps tau to 0 -> constant 7 m gap at the
    overlap start."""
    import datetime as dt

    from tilekiln_spark.operators.events import trajectory_cpa

    def ts(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    rows = [
        # user 1: moving +x through origin at t=100 (1 m/s)
        (1, 1, ts(0), -100.0, 0.0), (1, 2, ts(200), 100.0, 0.0),
        # user 2: moving -x through origin at t=110
        (2, 3, ts(10), 100.0, 3.0), (2, 4, ts(210), -100.0, 3.0),
        # users 3/4: parallel, same velocity, constant 7 m apart in y
        (3, 5, ts(0), 0.0, 0.0), (3, 6, ts(100), 100.0, 0.0),
        (4, 7, ts(0), 0.0, 7.0), (4, 8, ts(100), 100.0, 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, mx double, my double"
    )
    out = {(r.u1, r.u2): r for r in trajectory_cpa(ev).collect()}
    cpa12 = out[(1, 2)]
    assert abs(cpa12.cpa_dist - 3.0) < 1e-9
    t_rel = cpa12.t_cpa - dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()
    assert abs(t_rel - 105.0) < 1e-9
    cpa34 = out[(3, 4)]
    assert abs(cpa34.cpa_dist - 7.0) < 1e-9


def test_od_flows_endpoints_zones_and_stats(spark):
    """Three users: two share the same west->east trip (same z1 zone
    pair, different displacement lengths -> n_users=2 with distinct
    min/max km), one stays in place (origin zone == dest zone, 0 km).
    Endpoints are picked by (ts, event_id) order, NOT row order — user 1's
    rows are supplied shuffled to pin that."""
    import datetime as dt

    from tilekiln_spark.operators.events import od_flows
    from tilekiln_spark.tiles.core import HALF_WORLD

    def ts(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    q = HALF_WORLD / 2  # zone centers at zoom 1: +-q
    rows = [
        # user 1 (shuffled): starts west (-q, q), ends east (q, q)
        (1, 12, ts(50), 0.0, q),
        (1, 13, ts(90), q, q),          # last by ts
        (1, 11, ts(10), -q, q),         # first by ts
        # user 2: same zones, shorter displacement
        (2, 21, ts(0), -q / 2, q), (2, 22, ts(60), q / 2, q),
        # user 3: never leaves its zone
        (3, 31, ts(0), q, -q), (3, 32, ts(30), q, -q),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, mx double, my double"
    )
    out = {(r.o_x, r.o_y, r.d_x, r.d_y): r for r in od_flows(ev, zoom=1).collect()}
    assert set(out) == {(0, 0, 1, 0), (1, 1, 1, 1)}
    flow = out[(0, 0, 1, 0)]
    assert flow.n_users == 2
    assert abs(flow.min_km - q / 1000.0) < 1e-6          # user 2: q total
    assert abs(flow.max_km - 2 * q / 1000.0) < 1e-6      # user 1: 2q total
    stay = out[(1, 1, 1, 1)]
    assert stay.n_users == 1 and stay.min_km == 0.0 and stay.max_km == 0.0


def test_od_flows_ts_tie_breaks_on_order_col(spark):
    """Two samples with the SAME timestamp: the event_id tiebreak decides
    first/last deterministically (struct min/max ordering)."""
    import datetime as dt

    from tilekiln_spark.operators.events import od_flows

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, 2, t0, 1000.0, 0.0), (1, 1, t0, -1000.0, 0.0)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, mx double, my double"
    )
    r = od_flows(ev, zoom=0).collect()[0]
    # first = event_id 1 at x=-1000, last = event_id 2 at x=+1000 -> 2 km
    assert abs(r.min_km - 2.0) < 1e-9 and abs(r.max_km - 2.0) < 1e-9


def test_knox_test_hand_counts(spark):
    """4 events, margins hand-enumerated: A/B close in space AND time;
    A/C close in space only; B/D close in time only; C/D far in both.
    Ordered counts double the unordered ones; ratio =
    n_both*n_pairs/(n_space*n_time)."""
    import datetime as dt

    from tilekiln_spark.operators.events import knox_test

    def ts(h):
        return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)

    rows = [
        (1, ts(0), 0.0, 0.0),          # A
        (2, ts(1), 500.0, 0.0),        # B: 500 m, 1 h from A
        (3, ts(30), 800.0, 0.0),       # C: 800 m from A, 30 h
        (4, ts(2), 1.0e6, 0.0),        # D: far away, 1 h from B
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, mx double, my double"
    )
    r = knox_test(ev, delta=1000.0, tau_seconds=2 * 3600.0).collect()[0]
    assert (r.n_events, r.n_pairs) == (4, 12)
    # space pairs (<=1000 m): AB, AC, BC -> 6 ordered
    assert r.n_space == 6
    # time pairs (<=2 h): AB, BD, AD(2 h exactly, boundary-inclusive) -> 6
    assert r.n_time == 6
    # both: AB only -> 2 ordered
    assert r.n_both == 2
    assert abs(r.knox_ratio - (2 * 12) / (6 * 6)) < 1e-12


def test_knox_test_empty_margin_null_ratio(spark):
    """No pair within delta: n_space = 0 -> NULL ratio, zero counts."""
    import datetime as dt

    from tilekiln_spark.operators.events import knox_test

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, t0, 0.0, 0.0), (2, t0, 9.9e6, 0.0)],
        "event_id long, ts timestamp, mx double, my double",
    )
    r = knox_test(ev, delta=10.0, tau_seconds=60.0).collect()[0]
    assert (r.n_space, r.n_both, r.n_time) == (0, 0, 2)
    assert r.knox_ratio is None


def test_cusum_alarms_hand_sequence(spark):
    """Hourly counts [5, 0, 12] with k=3: y = [2, -3, 9] -> S = [2, 0, 9],
    alarm fires only when S >= 8; the empty middle hour is generated and
    drains the statistic."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.events import cusum_alarms

    secs = [0] * 5 + [2 * 3600] * 12
    df = spark.createDataFrame(
        [("a", s + 7) for s in secs], "event_type string, sec long"
    ).select("event_type", F.col("sec").cast("timestamp").alias("ts"))
    out = sorted(
        (r.bucket, r.cnt, r.s, r.alarm)
        for r in cusum_alarms(df, k=3, h=8).collect()
    )
    assert out == [(0, 5, 2, False), (1, 0, 0, False), (2, 12, 9, True)]


def test_burst_states_detects_designed_burst(spark):
    """Gaps [100s x5, 5s x6, 100s x5]: base gap ~41s, so the 5s run is
    a burst and the 100s flanks are not — boundaries exact."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.events import burst_states

    ts, t = [0], 0
    for g in [100] * 5 + [5] * 6 + [100] * 5:
        t += g
        ts.append(t)
    df = spark.createDataFrame(
        [("a", x * 1_000_000) for x in ts], "event_type string, us long"
    ).select("event_type", F.timestamp_micros(F.col("us")).alias("ts"))
    out = {r.idx: r.burst for r in burst_states(df).collect()}
    assert [out[i] for i in range(1, 17)] == [False] * 5 + [True] * 6 + [False] * 5


def test_burst_states_uniform_stream_no_burst(spark):
    """Uniform gaps never enter the burst state (the 2*g0 transition
    penalty is never repaid)."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.events import burst_states

    df = spark.createDataFrame(
        [("u", i * 60_000_000) for i in range(30)], "event_type string, us long"
    ).select("event_type", F.timestamp_micros(F.col("us")).alias("ts"))
    rows = burst_states(df).collect()
    assert len(rows) == 29 and not any(r.burst for r in rows)


def test_series_acf_periodic_and_flat(spark):
    """A period-2 alternating series has r(1) = -1, r(2) = +1; a
    constant series has zero variance -> NULL r."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.events import series_acf

    rows = []
    for h in range(40):
        n = 3 if h % 2 == 0 else 1
        rows += [("alt", h * 3600 + 5)] * n
        rows += [("flat", h * 3600 + 5)] * 2
    df = spark.createDataFrame(rows, "event_type string, sec long").select(
        "event_type", F.col("sec").cast("timestamp").alias("ts")
    )
    out = {(r.key, r.lag): r.r for r in series_acf(df, [1, 2]).collect()}
    assert out[("alt", 1)] == -1.0
    assert out[("alt", 2)] == 1.0
    assert out[("flat", 1)] is None and out[("flat", 2)] is None


def test_retention_matrix_hand_cohorts(spark):
    """User A active days {0, 1, 3}, user B {0}, user C {1}: cohort 0
    has 2 users with day-1 retention 0.5; cohort 1 has 1 user."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.events import retention_matrix

    day = 86400
    rows = [(1, 10), (1, day + 10), (1, 3 * day + 10),
            (2, 20), (3, day + 20)]
    df = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.col("sec").cast("timestamp").alias("ts")
    )
    out = {(r.cohort_day, r.offset): (r.n_cohort, r.n_active, r.rate)
           for r in retention_matrix(df).collect()}
    assert out[(0, 0)] == (2, 2, 1.0)
    assert out[(0, 1)] == (2, 1, 0.5)
    assert out[(0, 3)] == (2, 1, 0.5)
    assert out[(1, 0)] == (1, 1, 1.0)


def test_funnel_steps_ordering_matters(spark):
    """User 1 converts in order; user 2 clicked BEFORE viewing (first
    click < first view) so stops at step 1; user 3 never clicks."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.events import funnel_steps

    rows = [(1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            (2, "click", 5), (2, "view", 8), (2, "purchase", 9),
            (3, "view", 1)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, sec long"
    ).select("user_id", "event_type", F.col("sec").cast("timestamp").alias("ts"))
    out = {r.step_idx: (r.n_users, r.rate) for r in
           funnel_steps(df, ["view", "click", "purchase"]).collect()}
    assert out[1] == (3, 1.0)
    assert out[2] == (1, round(1 / 3, 6))
    assert out[3] == (1, round(1 / 3, 6))


def test_markov_transitions_two_state_chain(spark):
    """Deterministic alternation a->b->a...: transition probs are 1.0
    and the stationary distribution is uniform (0.5 / 0.5)."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.events import markov_transitions

    rows = [(1, i, "a" if i % 2 == 0 else "b", i * 10) for i in range(20)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, sec long"
    ).select(
        "user_id", "event_id", "event_type",
        F.col("sec").cast("timestamp").alias("ts"),
    )
    out = {(r.from_type, r.to_type): (r.p, r.stationary_from)
           for r in markov_transitions(df).collect()}
    assert out[("a", "b")] == (1.0, 0.5)
    assert out[("b", "a")] == (1.0, 0.5)


def test_regularity_flags_bot_vs_bursty(spark):
    """A perfect timer (CV = 0) flags regular; an alternating
    short/long gap pattern (CV ~ 0.76 over its 9 gaps) does not;
    below min_gaps no row."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.events import regularity_flags

    rows = [(1, i * 60) for i in range(10)]
    t = 0
    for i in range(10):
        t += 10 if i % 2 == 0 else 110
        rows.append((2, t))
    rows += [(3, 0), (3, 60)]
    df = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.col("sec").cast("timestamp").alias("ts")
    )
    out = {r.key: (r.cv, r.is_regular)
           for r in regularity_flags(df).collect()}
    assert out[1] == (0.0, True)
    assert out[2][1] is False and out[2][0] > 0.7
    assert 3 not in out
