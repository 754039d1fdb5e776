"""Geometry simplification kernel (operators/simplify.py)."""

import numpy as np
import pytest

from tilekiln_spark.operators.simplify import simplify_chains_np, simplify_ring_cols


def _chain(pts):
    xs = np.array([p[0] for p in pts], dtype=float)
    ys = np.array([p[1] for p in pts], dtype=float)
    return xs, ys


class TestKernel:
    def test_collinear_midpoints_removed(self):
        # square with a midpoint on every edge: 8 -> 4 vertices at any tol>0
        pts = [(0, 0), (5, 0), (10, 0), (10, 5), (10, 10), (5, 10),
               (0, 10), (0, 5)]
        vx, vy = _chain(pts)
        sx, sy, ln = simplify_chains_np(vx, vy, np.array([8]), tol=0.1)
        got = set(zip(sx.tolist(), sy.tolist()))
        # endpoints 0,0 and 0,5 are pinned; the true corners all survive
        assert {(0, 0), (10, 0), (10, 10), (0, 10)} <= got
        assert (5, 0) not in got and (10, 5) not in got and (5, 10) not in got
        assert ln[0] == len(got)

    def test_large_detail_survives(self):
        # a deep notch (big triangle area) must survive a small tolerance
        pts = [(0, 0), (4, 0), (5, 8), (6, 0), (10, 0), (10, 10), (0, 10)]
        vx, vy = _chain(pts)
        sx, sy, ln = simplify_chains_np(vx, vy, np.array([7]), tol=1.0)
        assert (5.0, 8.0) in set(zip(sx.tolist(), sy.tolist()))

    def test_multiple_chains_independent(self):
        # two chains in one batch: thinning never crosses the boundary
        a = [(0, 0), (5, 0.01), (10, 0)]          # middle vertex removable
        b = [(100, 100), (105, 108), (110, 100)]  # middle vertex is detail
        vx = np.array([p[0] for p in a + b], dtype=float)
        vy = np.array([p[1] for p in a + b], dtype=float)
        sx, sy, ln = simplify_chains_np(vx, vy, np.array([3, 3]), tol=1.0,
                                        min_len=2)
        assert ln.tolist() == [2, 3]
        assert (105.0, 108.0) in set(zip(sx.tolist(), sy.tolist()))

    def test_validity_floor(self):
        # a tiny triangle below tolerance keeps all 3 vertices (min_len)
        pts = [(0, 0), (0.1, 0.1), (0.2, 0.0)]
        vx, vy = _chain(pts)
        sx, sy, ln = simplify_chains_np(vx, vy, np.array([3]), tol=100.0)
        assert ln[0] == 3

    def test_idempotent(self):
        rng = np.random.default_rng(7)
        vx = np.cumsum(rng.random(50))
        vy = rng.random(50)
        ln = np.array([50])
        s1 = simplify_chains_np(vx, vy, ln, tol=0.3)
        s2 = simplify_chains_np(s1[0], s1[1], s1[2], tol=0.3)
        np.testing.assert_array_equal(s1[0], s2[0])
        np.testing.assert_array_equal(s1[2], s2[2])

    def test_zero_length_chain_passthrough(self):
        sx, sy, ln = simplify_chains_np(
            np.array([0.0, 5.0, 10.0]), np.array([0.0, 0.01, 0.0]),
            np.array([0, 3, 0]), tol=1.0, min_len=2,
        )
        assert ln.tolist() == [0, 2, 0]


def test_simplify_ring_cols_layouts(spark):
    """All three ring layouts normalize to rings_* and thin; props pass
    through untouched."""
    sq = [0.0, 5.0, 10.0, 10.0, 10.0, 5.0, 0.0, 0.0]
    sqy = [0.0, 0.0, 0.0, 5.0, 10.0, 10.0, 10.0, 5.0]
    hole_x = [4.0, 6.0, 6.0, 4.0]
    hole_y = [4.0, 4.0, 6.0, 6.0]
    df = spark.createDataFrame(
        [(1, sq, sqy, [hole_x], [hole_y])],
        "polygon_id long, ring_xs array<double>, ring_ys array<double>,"
        " holes_xs array<array<double>>, holes_ys array<array<double>>",
    )
    out = simplify_ring_cols(df, tolerance=0.1).collect()[0]
    assert out.polygon_id == 1
    assert len(out.rings_xs) == 2 and out.rings_hole == [False, True]
    assert len(out.rings_xs[0]) == 5  # 8 -> 4 corners + the pinned endpoint
    assert len(out.rings_xs[1]) == 4  # hole corners are real detail: untouched

    # single-ring layout
    df2 = spark.createDataFrame(
        [(2, sq, sqy)],
        "polygon_id long, ring_xs array<double>, ring_ys array<double>",
    )
    out2 = simplify_ring_cols(df2, tolerance=0.1).collect()[0]
    assert out2.rings_hole == [False] and len(out2.rings_xs[0]) == 5


def test_simplify_ring_cols_is_map_only(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0], [0.0, 0.0, 0.0])],
        "polygon_id long, ring_xs array<double>, ring_ys array<double>",
    )
    plan = simplify_ring_cols(df, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_douglas_peucker_exact():
    """DP keep-mask against hand-checkable shapes: straight line
    collapses to endpoints; a single spike above tol is kept; segment
    (not infinite-line) distance governs."""
    import numpy as np

    from tilekiln_spark.operators.simplify import douglas_peucker_mask_np

    # straight line -> endpoints only
    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    ys = np.zeros(5)
    assert douglas_peucker_mask_np(xs, ys, 0.5).tolist() == [
        True, False, False, False, True,
    ]
    # one spike above tol is kept, sub-tol wiggle dropped
    ys2 = np.array([0.0, 0.1, 5.0, 0.1, 0.0])
    m = douglas_peucker_mask_np(xs, ys2, 1.0)
    assert m.tolist() == [True, False, True, False, True]
    # degenerate closed chord (first == last): distance to the POINT
    xs3 = np.array([0.0, 3.0, 0.0])
    ys3 = np.array([0.0, 0.0, 0.0])
    assert douglas_peucker_mask_np(xs3, ys3, 1.0).tolist() == [
        True, True, True,
    ]


def test_douglas_peucker_cols_roundtrip(spark):
    from pyspark.sql import functions as F

    from tilekiln_spark.operators.simplify import douglas_peucker_cols

    df = spark.createDataFrame(
        [
            (0, [0.0, 1.0, 2.0, 3.0], [0.0, 0.01, -0.01, 0.0]),
            (1, None, None),
        ],
        "line_id long, xs array<double>, ys array<double>",
    )
    out = {r["line_id"]: (r["xs"], r["ys"])
           for r in douglas_peucker_cols(df, 0.5).collect()}
    assert out[0] == ([0.0, 3.0], [0.0, 0.0])
    assert out[1] == (None, None)
