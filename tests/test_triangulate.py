"""Delaunay / alpha-shape / Voronoi (operators/triangulate.py) on
hand-checkable configurations."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilekiln_spark.operators.triangulate import (
    alpha_shape_stats,
    delaunay_triangles,
    voronoi_cells,
)


def _pts(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["gid", "x", "y"]),
        "gid long, x double, y double",
    )


# unit square + center: the 4 corner-corner-center triangles are Delaunay
# (each circumcircle's far corners lie outside); every corner triangle's
# circumcircle is the unit circle whose CENTER is the 5th point — strictly
# inside, so rejected.  Sorted order: (0,0)=1 (0,1)=2 (.5,.5)=3 (1,0)=4 (1,1)=5.
SQUARE_C = [
    (7, 0.0, 0.0), (7, 1.0, 0.0), (7, 0.0, 1.0), (7, 1.0, 1.0),
    (7, 0.5, 0.5),
]


def test_delaunay_square_plus_center(spark):
    tri = delaunay_triangles(_pts(spark, SQUARE_C), "gid", "x", "y").collect()
    assert len(tri) == 4
    # every triangle contains the center (sorted index 3), area sums to 1
    assert all(3 in (r.i, r.j, r.k) for r in tri)
    assert abs(sum(r.tri_area for r in tri) - 1.0) < 1e-12
    # circumcenters are the edge midpoints of the square
    cc = sorted((round(r.ccx, 9), round(r.ccy, 9)) for r in tri)
    assert cc == [(0.0, 0.5), (0.5, 0.0), (0.5, 1.0), (1.0, 0.5)]


def test_delaunay_degenerate_groups(spark):
    rows = [
        (1, 0.0, 0.0), (1, 1.0, 1.0),                  # 2 points
        (2, 0.0, 0.0), (2, 1.0, 1.0), (2, 2.0, 2.0),   # collinear
        (3, 0.0, 0.0), (3, 0.0, 0.0), (3, 1.0, 0.0), (3, 0.0, 1.0),  # dup
    ]
    tri = delaunay_triangles(_pts(spark, rows), "gid", "x", "y")
    got = {r.gid: r for r in tri.collect()}
    assert set(got) == {3}          # groups 1-2 emit nothing, dup deduped
    assert abs(got[3].tri_area - 0.5) < 1e-12


def test_voronoi_square_plus_center(spark):
    cells = voronoi_cells(
        delaunay_triangles(_pts(spark, SQUARE_C), "gid", "x", "y"), "gid"
    ).collect()
    # only the center site is interior; its cell is the diamond over the
    # 4 edge-midpoint circumcenters: area d1*d2/2 = 0.5
    assert len(cells) == 1
    c = cells[0]
    assert c.site == 3 and (c.sx, c.sy) == (0.5, 0.5)
    assert c.n_vertices == 4
    assert abs(c.cell_area - 0.5) < 1e-12


def test_alpha_shape_drops_sliver(spark):
    # near-unit square (one corner nudged to break cocircularity) plus a
    # far point: the 2 square triangles are alpha-kept, the 2 slivers to
    # the far point have huge circumradii and drop; the alpha boundary is
    # the 4 square edges.
    rows = [
        (5, 0.0, 0.0), (5, 1.0, 0.0), (5, 0.0, 1.0), (5, 1.0, 1.2),
        (5, 10.0, 0.5),
    ]
    tri = delaunay_triangles(_pts(spark, rows), "gid", "x", "y")
    full = tri.count()
    assert full == 3                 # all 5 points are hull vertices: 2n-h-2
    stats = alpha_shape_stats(tri, "gid", alpha_r2=2.0).collect()
    assert len(stats) == 1
    s = stats[0]
    assert s.n_tri == 2
    assert s.boundary_edges == 4
    assert abs(s.shape_area - 1.1) < 1e-9   # quad (0,0)(1,0)(1,1.2)(0,1)


def test_delaunay_is_a_triangulation_of_the_hull(spark):
    # random-ish deterministic cloud: kept triangles tile the convex hull
    # exactly once — total area equals hull area and every input point is
    # used or on some triangle
    import math

    rows = [
        (9, math.sin(i * 12.9898) * 43758.5453 % 7.0,
            math.sin(i * 78.233) * 12543.8547 % 5.0)
        for i in range(20)
    ]
    rows = [(9, round(x, 6), round(y, 6)) for _, x, y in rows]
    df = _pts(spark, rows)
    tri = delaunay_triangles(df, "gid", "x", "y")
    tri_area = tri.agg(F.sum("tri_area")).collect()[0][0]

    from tilekiln_spark.operators.hull import convex_hull

    hull = convex_hull(df, "gid", "x", "y").collect()
    hx = [r.x for r in hull]
    hy = [r.y for r in hull]
    hull_area = abs(
        sum(
            hx[i] * hy[(i + 1) % len(hx)] - hx[(i + 1) % len(hx)] * hy[i]
            for i in range(len(hx))
        )
    ) / 2.0
    assert abs(tri_area - hull_area) < 1e-6 * max(hull_area, 1.0)
    # Euler check: for a triangulation of n points with h hull vertices,
    # triangles = 2n - h - 2
    n = len(set((x, y) for _, x, y in rows))
    h = len(hull)
    assert tri.count() == 2 * n - h - 2


def test_largest_empty_circle_unit_square_plus_center_offset(spark):
    """5 sites: unit-square corners + an off-center interior point at
    (0.25, 0.25).  The largest empty circle inside the bbox centers at a
    Voronoi vertex in the emptier half; every candidate's radius is its
    triangle's circumradius, and the winner must clear the naive
    half-diagonal bound of the crowded corner (sqrt(2)/4 ~ 0.3536)."""
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.triangulate import largest_empty_circle

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 1.0, 0.0), (1, 0.0, 1.0), (1, 1.0, 1.0),
         (1, 0.25, 0.25)],
        "gid int, x double, y double",
    )
    row = largest_empty_circle(pts, "gid", "x", "y").collect()[0]
    # center inside the bbox, radius bigger than the crowded-corner bound
    assert 0.0 <= row.lec_x <= 1.0 and 0.0 <= row.lec_y <= 1.0
    assert row.lec_r > 0.3536
    # the empty-circle invariant itself: no site strictly inside
    d2 = [
        (row.lec_x - x) ** 2 + (row.lec_y - y) ** 2
        for x, y in [(0, 0), (1, 0), (0, 1), (1, 1), (0.25, 0.25)]
    ]
    assert min(d2) >= row.lec_r ** 2 - 1e-9


def test_largest_empty_circle_too_few_points_empty(spark):
    from tilekiln_spark.operators.triangulate import largest_empty_circle

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 1.0, 0.0)], "gid int, x double, y double"
    )
    assert largest_empty_circle(pts, "gid", "x", "y").count() == 0


def test_delaunay_kernel_equals_expression_path(spark):
    # r6: the Arrow triple kernel must select EXACTLY the triangles the
    # pure-expression path does (bit-identical incircle arithmetic),
    # including degenerate-heavy groups (grid with collinear triples)
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.triangulate import delaunay_triangles

    frac = lambda c: c - F.floor(c)  # noqa: E731
    pts = spark.range(40 * 12).select(
        (F.col("id") / F.lit(12)).cast("long").alias("gid"),
        frac(F.sin(F.col("id") * 12.9898) * 43758.5453).alias("x"),
        frac(F.sin(F.col("id") * 78.233) * 12543.8547).alias("y"),
    )
    grid = spark.createDataFrame(
        [(999, float(i % 4), float(i // 4)) for i in range(16)],
        "gid long, x double, y double",
    )
    both = pts.unionByName(grid)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    kernel = rows(delaunay_triangles(both, "gid", "x", "y"))
    spark.conf.set("spark.tilekiln.delaunay.kernel", "expr")
    try:
        expr = rows(delaunay_triangles(both, "gid", "x", "y"))
    finally:
        spark.conf.unset("spark.tilekiln.delaunay.kernel")
    assert kernel == expr and len(kernel) > 0
