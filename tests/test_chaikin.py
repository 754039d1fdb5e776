"""Chaikin corner-cutting smoothing (functions/geometry.py chaikin_once).

Reference behavior: PostGIS ST_ChaikinSmoothing on linestrings (tilekiln
delegates geometry processing to PostGIS) — endpoints preserved, each edge
cut at exact 1/4 and 3/4.
"""

from pyspark.sql import functions as F

from tilekiln_spark.functions.geometry import chaikin_once


def _smooth(spark, xs, ys, iterations=1):
    df = spark.createDataFrame(
        [(xs, ys)], "xs0 array<double>, ys0 array<double>"
    )
    for it in range(iterations):
        sx, sy = chaikin_once(F.col(f"xs{it}"), F.col(f"ys{it}"))
        df = df.select(sx.alias(f"xs{it + 1}"), sy.alias(f"ys{it + 1}"))
    row = df.collect()[0]
    return row[f"xs{iterations}"], row[f"ys{iterations}"]


def test_chaikin_one_round_right_angle(spark):
    """L-shaped line (0,0)-(4,0)-(4,4): hand-computed 1/4-3/4 cuts."""
    xs, ys = _smooth(spark, [0.0, 4.0, 4.0], [0.0, 0.0, 4.0])
    assert xs == [0.0, 1.0, 3.0, 4.0, 4.0, 4.0]
    assert ys == [0.0, 0.0, 0.0, 1.0, 3.0, 4.0]


def test_chaikin_two_rounds_endpoints_and_length(spark):
    """Two rounds double the vertex count each time (2n law), keep the
    exact endpoints, and the corner keeps pulling toward the diagonal."""
    xs, ys = _smooth(spark, [0.0, 4.0, 4.0], [0.0, 0.0, 4.0], iterations=2)
    assert len(xs) == 12 and len(ys) == 12
    assert (xs[0], ys[0]) == (0.0, 0.0)
    assert (xs[-1], ys[-1]) == (4.0, 4.0)
    # second round on [0,1,3,4,4,4]: hand-computed prefix
    assert xs[:5] == [0.0, 0.25, 0.75, 1.5, 2.5]
    assert ys[:5] == [0.0, 0.0, 0.0, 0.0, 0.0]


def test_chaikin_same_name_realias_miscompiles_workaround(spark):
    """Pin the footgun that forced distinct per-round column names: two
    rounds through DIFFERENT names works (this test), while re-aliasing a
    chaikin output onto its own input name raises the spurious
    INVALID_ARRAY_INDEX error on this Spark version.  If this test starts
    failing the other way, the workaround in __spark_entry__ can be
    simplified."""
    df = spark.createDataFrame(
        [([0.0, 4.0, 4.0], [0.0, 0.0, 4.0])],
        "xs array<double>, ys array<double>",
    )
    for _ in range(2):
        sx, sy = chaikin_once(F.col("xs"), F.col("ys"))
        df = df.select(sx.alias("xs"), sy.alias("ys"))
    try:
        df.collect()
        same_name_ok = True
    except Exception:
        same_name_ok = False
    assert not same_name_ok, (
        "same-name re-alias now works; the distinct-name workaround in "
        "__spark_entry__.chaikin_smooth can be dropped"
    )
