"""ST_ConvexHull (operators/hull.py): monotone-chain kernel goldens, the
partial-hull associativity invariant (partition-layout independence), and
containment of every input point.

Parity target: PostGIS ST_ConvexHull over grouped point sets (the
reference executes arbitrary template SQL,
/root/reference/tilekiln/definition.py:42-77)."""

import math

import numpy as np

from tilekiln_spark.operators.hull import (
    convex_hull,
    hull_np,
    minimum_bounding_radius,
    oriented_envelope_area,
)


def test_hull_np_square_golden():
    xs = np.array([0.0, 4.0, 4.0, 0.0, 2.0, 1.0, 3.0])
    ys = np.array([0.0, 0.0, 4.0, 4.0, 2.0, 1.0, 3.0])
    hx, hy = hull_np(xs, ys)
    # CCW from lexicographically smallest point
    assert list(zip(hx, hy)) == [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]


def test_hull_np_degenerates():
    hx, hy = hull_np(np.array([1.0]), np.array([2.0]))
    assert list(zip(hx, hy)) == [(1.0, 2.0)]
    # duplicates collapse; two distinct points stay two
    hx, hy = hull_np(np.array([1.0, 1.0, 3.0]), np.array([2.0, 2.0, 5.0]))
    assert list(zip(hx, hy)) == [(1.0, 2.0), (3.0, 5.0)]


def _inside_or_on(px, py, hx, hy):
    """All cross products of hull edges vs the point are >= 0 (CCW hull)."""
    n = len(hx)
    for i in range(n):
        j = (i + 1) % n
        cr = (hx[j] - hx[i]) * (py - hy[i]) - (hy[j] - hy[i]) * (px - hx[i])
        if cr < -1e-9 * max(abs(px), abs(py), 1.0):
            return False
    return True


def test_hull_contains_all_and_partition_invariant(spark):
    rng = np.random.default_rng(5)
    pts = [
        (int(i % 3), float(x), float(y))
        for i, (x, y) in enumerate(rng.normal(0, 100, (900, 2)))
    ]
    df = spark.createDataFrame(pts, "gid int, x double, y double")
    got = convex_hull(df, "gid", "x", "y").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.gid, []).append((r.x, r.y))
    assert set(by_g) == {0, 1, 2}
    for g, hull in by_g.items():
        hull_sorted = hull  # rows arrive in kernel order per group
        hx = [p[0] for p in hull_sorted]
        hy = [p[1] for p in hull_sorted]
        members = [(x, y) for gg, x, y in pts if gg == g]
        # hull vertices are input points; every input point is inside/on
        assert set(hull) <= set(members)
        for px, py in members:
            assert _inside_or_on(px, py, hx, hy)
        # associativity: exact same vertex SET under a different layout
        # and under the driver-side single-shot kernel
        kx, ky = hull_np(
            np.array([p[0] for p in members]), np.array([p[1] for p in members])
        )
        assert set(hull) == set(zip(kx, ky))
    re = convex_hull(df.repartition(13), "gid", "x", "y").collect()
    assert {(r.gid, r.x, r.y) for r in re} == {(r.gid, r.x, r.y) for r in got}


def test_hull_null_group_preserved(spark):
    """A null group key is a group like any other (Spark groupBy keeps it;
    the pandas partial stage must not drop it via groupby's default
    dropna)."""
    rows = [(0, 0.0, 0.0), (0, 1.0, 0.0), (0, 0.0, 1.0),
            (None, 5.0, 5.0), (None, 6.0, 5.0)]
    df = spark.createDataFrame(rows, "gid int, x double, y double")
    got = {(r.gid, r.x, r.y) for r in convex_hull(df, "gid", "x", "y").collect()}
    assert (None, 5.0, 5.0) in got and (None, 6.0, 5.0) in got
    assert len([g for g, *_ in got if g is None]) == 2


def test_oriented_envelope_rotated_rect(spark):
    """A 10x4 rectangle of points rotated 30deg: the minimum-area oriented
    box is the rectangle itself (area 40), strictly below the axis-aligned
    bbox area.  Interior points must not change the answer."""
    rng = np.random.default_rng(11)
    base = np.column_stack(
        [rng.uniform(0, 10, 200), rng.uniform(0, 4, 200)]
    )
    base = np.vstack([base, [[0, 0], [10, 0], [10, 4], [0, 4]]])
    th = math.radians(30)
    c, s = math.cos(th), math.sin(th)
    rot = base @ np.array([[c, s], [-s, c]])
    rows = [(7, float(x), float(y)) for x, y in rot]
    df = spark.createDataFrame(rows, "gid int, x double, y double")
    hull = convex_hull(df, "gid", "x", "y")
    got = oriented_envelope_area(hull, "gid", "x", "y").collect()
    assert len(got) == 1 and got[0].gid == 7
    assert abs(got[0].obb_area - 40.0) < 1e-9
    aabb = (rot[:, 0].max() - rot[:, 0].min()) * (rot[:, 1].max() - rot[:, 1].min())
    assert got[0].obb_area < aabb


def test_oriented_envelope_square_and_degenerate(spark):
    rows = [
        (0, 0.0, 0.0), (0, 4.0, 0.0), (0, 4.0, 4.0), (0, 0.0, 4.0), (0, 1.0, 2.0),
        (1, 5.0, 5.0), (1, 9.0, 9.0),  # 2 hull vertices -> degenerate 0.0
    ]
    df = spark.createDataFrame(rows, "gid int, x double, y double")
    hull = convex_hull(df, "gid", "x", "y")
    got = {r.gid: r.obb_area for r in oriented_envelope_area(hull, "gid", "x", "y").collect()}
    assert abs(got[0] - 16.0) < 1e-12
    assert got[1] == 0.0


def test_min_bounding_radius_square_pair_triple(spark):
    """Unit square: MEC is the circumcircle through opposite corners,
    r^2 = 0.5 (a pair-diameter candidate).  Equilateral-ish triangle
    group: the 3-point circumcircle (a triple candidate) beats every
    pair circle.  Interior points never change the answer; a 2-point
    group degrades to half the distance; a 1-point group to 0."""
    tri = [(1, 0.0, 0.0), (1, 4.0, 0.0), (1, 2.0, 3.2)]
    rows = (
        [(0, 0.0, 0.0), (0, 1.0, 0.0), (0, 1.0, 1.0), (0, 0.0, 1.0), (0, 0.3, 0.7)]
        + tri
        + [(2, 5.0, 5.0), (2, 8.0, 9.0), (3, 7.0, 7.0)]
    )
    df = spark.createDataFrame(rows, "gid int, x double, y double")
    hull = convex_hull(df, "gid", "x", "y")
    got = {
        r.gid: r.mec_r2
        for r in minimum_bounding_radius(hull, "gid", "x", "y").collect()
    }
    assert abs(got[0] - 0.5) < 1e-12
    # triangle circumradius: R = abc / (4K)
    import itertools

    a, b, c = (
        math.dist(p1[1:], p2[1:]) for p1, p2 in itertools.combinations(tri, 2)
    )
    k = abs(
        (tri[1][1] - tri[0][1]) * (tri[2][2] - tri[0][2])
        - (tri[2][1] - tri[0][1]) * (tri[1][2] - tri[0][2])
    ) / 2
    assert abs(got[1] - (a * b * c / (4 * k)) ** 2) < 1e-9
    assert abs(got[2] - (3.0 ** 2 + 4.0 ** 2) / 4) < 1e-12
    assert got[3] == 0.0


def test_maximum_inscribed_circle_square_and_L(spark):
    """MIC refinement: square converges to the center (within the
    2^-levels grid pitch); the L-shape's best circle sits in the corner
    pocket (radius > the 1.0 bar half-width, near the exact
    2*sqrt(2)/(1+sqrt(2)) corner optimum); result point is inside."""
    import math

    import pandas as pd

    from tilekiln_spark.operators.hull import maximum_inscribed_circle

    def row(pid, xs, ys):
        return (pid, min(xs), min(ys), max(xs), max(ys), xs, ys)

    rows = [
        row(0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 4.0, 4.0]),
        row(1, [0.0, 10.0, 10.0, 2.0, 2.0, 0.0],
               [0.0, 0.0, 2.0, 2.0, 8.0, 8.0]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=[
            "polygon_id", "xmin", "ymin", "xmax", "ymax",
            "ring_xs", "ring_ys"]),
        "polygon_id long, xmin double, ymin double, xmax double, "
        "ymax double, ring_xs array<double>, ring_ys array<double>",
    )
    got = {r.polygon_id: r for r in
           maximum_inscribed_circle(df, levels=8).collect()}
    sq = got[0]
    assert abs(sq.cx - 2.0) < 0.05 and abs(sq.cy - 2.0) < 0.05
    assert abs(sq.radius - 2.0) < 0.05
    ell = got[1]
    exact = 2.0 * math.sqrt(2.0) / (1.0 + math.sqrt(2.0))
    assert ell.radius > 1.0                    # beats any bar-center circle
    assert abs(ell.radius - exact) < 0.08
    assert abs(ell.cx - ell.cy) < 0.1          # corner-pocket symmetry


def test_std_dev_ellipse_known_geometries(spark):
    """Hand-verified ellipses: a perfect 45-degree line (angle 45, minor
    axis 0), an axis-aligned 4x2 rectangle (angle 0, axes sqrt(8)/sqrt(2)
    in km), and sub-km jitter erased by the snap (identical moments to
    the clean group)."""
    from tilekiln_spark.operators.hull import std_dev_ellipse

    km = 1000.0
    rows = [("line", i * km, i * km) for i in range(4)]
    rows += [("rect", x * km, y * km) for x in (0, 4) for y in (0, 2)]
    # same rectangle with sub-snap jitter: floor() must erase it
    rows += [("rectj", x * km + 400.0, y * km + 900.0)
             for x in (0, 4) for y in (0, 2)]
    df = spark.createDataFrame(rows, "g string, mx double, my double")
    out = {r.g: r for r in std_dev_ellipse(df, "g").collect()}

    line = out["line"]
    assert line.n_pts == 4
    assert abs(line.angle_deg - 45.0) < 1e-9
    assert abs(line.major - 5.0 ** 0.5) < 1e-12
    assert line.minor == 0.0
    assert abs(line.cx - 1.5) < 1e-12 and abs(line.cy - 1.5) < 1e-12

    rect = out["rect"]
    assert rect.angle_deg == 0.0
    assert abs(rect.major - 8.0 ** 0.5) < 1e-12
    assert abs(rect.minor - 2.0 ** 0.5) < 1e-12

    rj = out["rectj"]
    assert (rj.cx, rj.cy, rj.angle_deg, rj.major, rj.minor) == (
        rect.cx, rect.cy, rect.angle_deg, rect.major, rect.minor
    )


def test_std_dev_ellipse_singleton_degenerate(spark):
    """A single point: zero moments, zero axes, angle 0 — no NaN, no
    divide-by-zero on either engine."""
    from tilekiln_spark.operators.hull import std_dev_ellipse

    df = spark.createDataFrame(
        [("solo", 5000.0, -3000.0)], "g string, mx double, my double"
    )
    r = std_dev_ellipse(df, "g").collect()[0]
    assert (r.n_pts, r.cx, r.cy) == (1, 5.0, -3.0)
    assert r.angle_deg == 0.0 and r.major == 0.0 and r.minor == 0.0
