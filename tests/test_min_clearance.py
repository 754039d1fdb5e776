"""ST_MinimumClearance (functions/geometry.py min_clearance) on
hand-checkable rings, including cross-engine agreement."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tilekiln_spark.functions.geometry import min_clearance, min_clearance_sql

ROWS = [
    # unit square: nearest vertex pair = any edge (1.0)
    (1, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]),
    # L-shape: the reflex vertex (2,2) sits 2.0 from the left wall
    (2, [0.0, 10.0, 10.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0, 8.0, 8.0]),
    # thin spike: vertex (5, 0.1) hovers 0.1 over the base edge
    (3, [0.0, 10.0, 5.0], [0.0, 0.0, 0.1]),
    # degenerate (2 vertices): NULL
    (4, [0.0, 1.0], [0.0, 1.0]),
]


def test_min_clearance_values(spark):
    df = spark.createDataFrame(
        ROWS, "pid long, xs array<double>, ys array<double>"
    )
    got = {
        r.pid: r.mc
        for r in df.select(
            "pid", min_clearance(F.col("xs"), F.col("ys")).alias("mc")
        ).collect()
    }
    assert got[1] == 1.0
    assert got[2] == 2.0
    assert abs(got[3] - 0.1) < 1e-12
    assert got[4] is None


def test_min_clearance_sql_twin_matches(spark):
    df = spark.createDataFrame(
        ROWS, "pid long, xs array<double>, ys array<double>"
    )
    spark_vals = {
        r.pid: r.mc
        for r in df.select(
            "pid", min_clearance(F.col("xs"), F.col("ys")).alias("mc")
        ).collect()
    }

    def lit(a):
        return "[" + ", ".join(f"{v!r}e0" for v in a) + "]::DOUBLE[]"

    vals = ", ".join(f"({p}, {lit(xs)}, {lit(ys)})" for p, xs, ys in ROWS)
    sql_vals = dict(
        duckdb.sql(
            f"WITH p(pid, xs, ys) AS (VALUES {vals}) "
            f"SELECT pid, {min_clearance_sql('xs', 'ys')} FROM p"
        ).fetchall()
    )
    assert spark_vals == sql_vals
