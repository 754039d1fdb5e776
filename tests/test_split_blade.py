"""ST_Split blade-area kernel (functions/geometry.py
halfplane_clip_area): each side's area from ONE stateless
Green's-theorem fold — the blade is translated through the origin so
every Sutherland–Hodgman chord's shoelace term vanishes and no clipped
ring is ever materialized.  Hand-checkable values + cross-engine twin
agreement on identical exact-DOUBLE blade constants."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tilekiln_spark.functions.geometry import (
    halfplane_clip_area,
    halfplane_clip_area_sql,
)

ROWS = [
    # unit square CCW
    (1, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]),
    # same square CW (orientation-free kernel)
    (2, [0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0]),
    # concave L: 10x2 base + 2x6 riser, total area 32
    (3, [0.0, 10.0, 10.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0, 8.0, 8.0]),
    # degenerate 2-vertex "ring": both sides 0
    (4, [0.0, 1.0], [0.0, 1.0]),
]

# (label, nx, ny, c, expected per pid) for nx*x + ny*y <= c
CASES = [
    # vertical blade x <= 0.25 through the squares
    ("x_le_quarter", 1.0, 0.0, 0.25, {1: 0.25, 2: 0.25, 3: 2.0, 4: 0.0}),
    # diagonal x + y <= 1 cuts the unit square in half; for the L it
    # keeps the triangle (0,0)-(1,0)-(0,1)
    ("diag", 1.0, 1.0, 1.0, {1: 0.5, 2: 0.5, 3: 0.5, 4: 0.0}),
    # horizontal blade y <= 5 through the L riser: base 20 + 2x3 riser
    ("y_le_5", 0.0, 1.0, 5.0, {1: 1.0, 2: 1.0, 3: 26.0, 4: 0.0}),
    # blade misses everything (all inside)
    ("all_in", 1.0, 0.0, 100.0, {1: 1.0, 2: 1.0, 3: 32.0, 4: 0.0}),
    # blade excludes everything
    ("none_in", 1.0, 0.0, -1.0, {1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0}),
]

TOTALS = {1: 1.0, 2: 1.0, 3: 32.0, 4: 0.0}


def _df(spark):
    return spark.createDataFrame(
        ROWS, "pid long, xs array<double>, ys array<double>"
    )


def test_halfplane_clip_area_values(spark):
    df = _df(spark)
    cols = ["pid"]
    for label, nx, ny, c, _ in CASES:
        cols.append(
            halfplane_clip_area(F.col("xs"), F.col("ys"), nx, ny, c).alias(label)
        )
    got = {r.pid: r for r in df.select(*cols).collect()}
    for label, _, _, _, exp in CASES:
        for pid, want in exp.items():
            assert abs(got[pid][label] - want) < 1e-12, (label, pid)


def test_halfplane_sides_sum_to_ring_area(spark):
    df = _df(spark)
    for label, nx, ny, c, _ in CASES[:3]:
        both = df.select(
            "pid",
            (
                halfplane_clip_area(F.col("xs"), F.col("ys"), nx, ny, c)
                + halfplane_clip_area(F.col("xs"), F.col("ys"), -nx, -ny, -c)
            ).alias("tot"),
        ).collect()
        for r in both:
            assert abs(r.tot - TOTALS[r.pid]) < 1e-9, (label, r.pid)


def test_halfplane_zero_normal_raises():
    with pytest.raises(ValueError):
        halfplane_clip_area(F.lit(None), F.lit(None), 0.0, 0.0, 1.0)
    with pytest.raises(ValueError):
        halfplane_clip_area_sql("xs", "ys", 0.0, 0.0, 1.0)


def test_halfplane_sql_twin_matches(spark):
    df = _df(spark)

    def lit(a):
        return "[" + ", ".join(f"{v!r}e0" for v in a) + "]::DOUBLE[]"

    vals = ", ".join(f"({p}, {lit(xs)}, {lit(ys)})" for p, xs, ys in ROWS)
    for label, nx, ny, c, _ in CASES:
        spark_vals = {
            r.pid: r.a
            for r in df.select(
                "pid",
                halfplane_clip_area(F.col("xs"), F.col("ys"), nx, ny, c).alias(
                    "a"
                ),
            ).collect()
        }
        sql_vals = dict(
            duckdb.sql(
                f"WITH p(pid, xs, ys) AS (VALUES {vals}) SELECT pid, "
                f"{halfplane_clip_area_sql('xs', 'ys', nx, ny, c)} FROM p"
            ).fetchall()
        )
        assert spark_vals == sql_vals, label
