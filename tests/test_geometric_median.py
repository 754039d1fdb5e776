"""geometric_median (ST_GeometricMedian): fixed-point exactness at the
symmetric center, outlier robustness vs the centroid, row-order
invariance, and the eps clamp on a sample-point iterate."""

import pandas as pd

from tilekiln_spark.operators.hull import geometric_median

SCHEMA = "g long, i long, x double, y double"


def _df(spark, pts, g=0, ids=None):
    ids = ids or range(len(pts))
    return spark.createDataFrame(
        pd.DataFrame(
            [(g, i, float(x), float(y)) for i, (x, y) in zip(ids, pts)],
            columns=["g", "i", "x", "y"],
        ),
        SCHEMA,
    )


def test_square_center_is_fixed_point(spark):
    # mean of the 4 corners IS the geometric median; Weiszfeld starts
    # there and every iteration maps it to itself exactly
    [r] = geometric_median(
        _df(spark, [(0, 0), (10, 0), (0, 10), (10, 10)]), "g", "x", "y", "i"
    ).collect()
    assert (r.gx, r.gy, r.n_pts) == (5.0, 5.0, 4)


def test_outlier_robust_vs_centroid(spark):
    pts = [(0, 0), (10, 0), (0, 10), (10, 10), (1000, 1000)]
    [r] = geometric_median(
        _df(spark, pts), "g", "x", "y", "i", iterations=50
    ).collect()
    centroid_x = sum(p[0] for p in pts) / 5  # 204
    # the median barely leaves the square; the centroid is dragged to 204
    assert r.gx < 11.0 and r.gy < 11.0
    assert abs(r.gx - centroid_x) > 190


def test_row_order_invariance(spark):
    # same (id, point) pairs fed in reversed ROW order: the sorted fold
    # order is identical, so the result is bit-identical
    pts = [(0, 0), (3, 7), (9, 2), (4, 4), (8, 8)]
    a = geometric_median(_df(spark, pts), "g", "x", "y", "i").collect()[0]
    b = geometric_median(
        _df(spark, list(reversed(pts)), ids=reversed(range(len(pts)))),
        "g", "x", "y", "i",
    ).collect()[0]
    assert (a.gx, a.gy) == (b.gx, b.gy)


def test_eps_clamp_on_sample_point(spark):
    # mean of 3 collinear points (0,0),(1,0),(2,0) is the middle SAMPLE
    # point: d=0 there must clamp, not divide by zero, and the iterate
    # stays put (it is the true median)
    [r] = geometric_median(
        _df(spark, [(0, 0), (1, 0), (2, 0)]), "g", "x", "y", "i"
    ).collect()
    assert (r.gx, r.gy) == (1.0, 0.0)


def test_zero_iterations_returns_centroid(spark):
    # iterations=0 is the centroid init — NOT two spurious Weiszfeld
    # steps from a descending sequence
    [r] = geometric_median(
        _df(spark, [(0, 0), (10, 0), (0, 10), (10, 10), (1000, 1000)]),
        "g", "x", "y", "i", iterations=0,
    ).collect()
    assert (r.gx, r.gy) == (204.0, 204.0)
