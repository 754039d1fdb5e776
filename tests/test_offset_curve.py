"""ST_OffsetCurve mitre joins (functions/geometry.py offset_curve):
hand-verified straight, right-angle (mitre) and collinear-fallback cases."""

from pyspark.sql import functions as F

from tilekiln_spark.functions.geometry import offset_curve


def _off(spark, pts, d):
    df = spark.createDataFrame(
        [([p[0] for p in pts], [p[1] for p in pts])],
        "xs array<double>, ys array<double>",
    )
    ox, oy = offset_curve(F.col("xs"), F.col("ys"), d)
    r = df.select(ox.alias("ox"), oy.alias("oy")).head()
    return list(zip(r["ox"], r["oy"]))


def test_straight_left_and_right(spark):
    line = [(0.0, 0.0), (10.0, 0.0)]
    assert _off(spark, line, 2.0) == [(0.0, 2.0), (10.0, 2.0)]
    assert _off(spark, line, -2.0) == [(0.0, -2.0), (10.0, -2.0)]


def test_right_angle_mitre(spark):
    # +x then +y: the left offset lines y=2 and x=8 meet at the mitre (8,2)
    line = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
    assert _off(spark, line, 2.0) == [(0.0, 2.0), (8.0, 2.0), (8.0, 10.0)]
    # right side: y=-2 meets x=12 at (12,-2)
    assert _off(spark, line, -2.0) == [(0.0, -2.0), (12.0, -2.0), (12.0, 10.0)]


def test_collinear_fallback(spark):
    # exactly collinear edges: cross == 0 -> simple normal translation
    line = [(0.0, 0.0), (5.0, 0.0), (10.0, 0.0)]
    assert _off(spark, line, 2.0) == [(0.0, 2.0), (5.0, 2.0), (10.0, 2.0)]
