"""trajectory_stops: dwell clusters split on spatial jumps, min_pts
filter, per-user isolation, deterministic centroids."""

import pandas as pd

from tilekiln_spark.operators.events import trajectory_stops


def _track(spark):
    rows = []
    for i in range(20):  # user 0: 4 dwell blocks of 5 points, 1 m apart
        b, j = divmod(i, 5)
        rows.append((0, i * 10, b * 1000.0 + j * 1.0, 0.0))
    for i in range(6):   # user 1: every step jumps 500 m -> no stops
        rows.append((1, i * 10, i * 500.0, 100.0))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "mx", "my"]),
        "user_id long, ts long, mx double, my double",
    )


def test_stops_split_on_jumps(spark):
    out = trajectory_stops(_track(spark), eps=50.0, min_pts=3).collect()
    stops = {(r.user_id, r.seg_id): (r.n_pts, r.dwell_s, r.cx, r.cy)
             for r in out}
    assert len(stops) == 4 and all(u == 0 for u, _ in stops)
    for b, (seg, vals) in enumerate(sorted(stops.items())):
        n_pts, dwell, cx, cy = vals
        assert (n_pts, dwell, cy) == (5, 40, 0.0)
        assert cx == b * 1000.0 + 2.0  # mean of offsets 0..4


def test_stops_min_pts_filter(spark):
    assert trajectory_stops(_track(spark), eps=50.0, min_pts=6).count() == 0
