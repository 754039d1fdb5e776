"""Polygon x polygon ST_Intersects join: kernel known cases, DuckDB-twin
bit-equality, and the PBSM grid join vs a brute-force cross join (reporting
-cell dedup included)."""

import duckdb
import numpy as np
import pyspark.sql.functions as F
import pytest

from tilekiln_spark.functions.geometry import rings_intersect_sql
from tilekiln_spark.operators.spatial_join import (
    _rings_intersect_np,
    make_rings_intersect_udf,
    polygons_intersect_join,
)

_CASES = [
    # (ring A xs, ys, ring B xs, ys, intersects?)
    ([0, 2, 2, 0], [0, 0, 2, 2], [1, 3, 3, 1], [1, 1, 3, 3], True),   # overlap
    ([0, 2, 2, 0], [0, 0, 2, 2], [5, 6, 6, 5], [5, 5, 6, 6], False),  # disjoint
    ([0, 10, 10, 0], [4, 4, 6, 6], [4, 6, 6, 4], [0, 0, 10, 10], True),  # plus-cross: no vertex containment
    ([0, 2, 2, 0], [0, 0, 2, 2], [2, 4, 4, 2], [0, 0, 2, 2], True),   # shared edge
    ([0, 10, 10, 0], [0, 0, 10, 10], [4, 6, 6, 4], [4, 4, 6, 6], True),  # B inside A
    ([4, 6, 6, 4], [4, 4, 6, 6], [0, 10, 10, 0], [0, 0, 10, 10], True),  # A inside B
    ([0, 2, 2, 0], [0, 0, 2, 2], [2, 4, 3, 4], [2, 2, 4, 4], True),   # vertex touch
    # concave L vs a square tucked into the L's notch (bbox overlap, no hit)
    ([0, 4, 4, 2, 2, 0], [0, 0, 4, 4, 1, 1], [0.5, 1.5, 1.5, 0.5], [1.5, 1.5, 3.5, 3.5], False),
    # same L vs a square crossing into the L's foot
    ([0, 4, 4, 2, 2, 0], [0, 0, 4, 4, 1, 1], [1, 3, 3, 1], [-1, -1, 0.5, 0.5], True),
]


def _f(a):
    return np.asarray(a, dtype=np.float64)


def test_kernel_known_cases():
    for ax, ay, bx, by, want in _CASES:
        got = _rings_intersect_np(_f(ax), _f(ay), _f(bx), _f(by))
        assert got == want, (ax, bx, want)
        # symmetry
        assert _rings_intersect_np(_f(bx), _f(by), _f(ax), _f(ay)) == want


def _rand_rings(n, seed_mult, scale=1e6):
    """Deterministic star-convex rings scattered over a 10-scale plane."""
    rings = []
    for i in range(n):
        cx = ((i * 7919 * seed_mult) % 200 - 100) / 10.0 * scale
        cy = ((i * 104729 * seed_mult) % 200 - 100) / 10.0 * scale
        m = 5 + (i * seed_mult) % 6
        xs, ys = [], []
        for v in range(m):
            r = (0.4 + ((i * 31 + v * 17 * seed_mult) % 100) / 100.0) * scale
            ang = 2 * np.pi * v / m
            xs.append(cx + r * np.cos(ang))
            ys.append(cy + r * np.sin(ang))
        rings.append((i, xs, ys))
    return rings


def test_kernel_matches_duckdb_twin():
    """Bit-identical decisions on 200 random ring pairs."""
    A = _rand_rings(20, 1)
    B = _rand_rings(10, 3)
    sql = rings_intersect_sql("axs", "ays", "bxs", "bys")
    con = duckdb.connect()
    for _, ax, ay in A:
        for _, bx, by in B:
            got = _rings_intersect_np(_f(ax), _f(ay), _f(bx), _f(by))
            want = con.execute(
                f"SELECT {sql} FROM (SELECT CAST(? AS DOUBLE[]) axs, "
                "CAST(? AS DOUBLE[]) ays, CAST(? AS DOUBLE[]) bxs, "
                "CAST(? AS DOUBLE[]) bys)",
                [ax, ay, bx, by],
            ).fetchone()[0]
            assert got == want


def _poly_df(spark, rings):
    rows = [
        (pid, float(min(xs)), float(min(ys)), float(max(xs)), float(max(ys)),
         [float(v) for v in xs], [float(v) for v in ys])
        for pid, xs, ys in rings
    ]
    return spark.createDataFrame(
        rows,
        "polygon_id int, xmin double, ymin double, xmax double, ymax double, "
        "ring_xs array<double>, ring_ys array<double>",
    )


@pytest.mark.parametrize("grid_zoom", [3, 6])
def test_join_matches_bruteforce(spark, grid_zoom):
    A = _poly_df(spark, _rand_rings(40, 1, scale=2e6))
    B = _poly_df(spark, _rand_rings(25, 3, scale=2e6))
    got = {
        (r.polygon_id, r.b_polygon_id)
        for r in polygons_intersect_join(A, B, grid_zoom=grid_zoom).collect()
    }
    bref = B
    for c in B.columns:
        bref = bref.withColumnRenamed(c, f"b_{c}")
    hit = make_rings_intersect_udf()(
        F.col("ring_xs"), F.col("ring_ys"), F.col("b_ring_xs"), F.col("b_ring_ys")
    )
    want = {
        (r.polygon_id, r.b_polygon_id)
        for r in A.crossJoin(bref).filter(hit).collect()
    }
    assert got == want
    assert len(want) > 0


def test_join_no_duplicate_pairs(spark):
    """Big bboxes spanning many cells still report each pair exactly once
    (the reporting-cell rule)."""
    A = _poly_df(spark, _rand_rings(15, 1, scale=8e6))
    B = _poly_df(spark, _rand_rings(10, 3, scale=8e6))
    out = polygons_intersect_join(A, B, grid_zoom=5).select("polygon_id", "b_polygon_id")
    assert out.count() == out.distinct().count()
    assert out.count() > 0


def test_join_whale_overflow_path(spark):
    """Continent-scale polygons (bbox over the cell budget) take the
    broadcast bbox path, never the explode — same pairs as brute force."""
    small_a = _rand_rings(20, 1, scale=1e6)
    small_b = _rand_rings(12, 3, scale=1e6)
    # whales: near-world-spanning rings on each side
    whale_a = [(100, [-1.9e7, 1.9e7, 1.9e7, -1.9e7], [-1.9e7, -1.9e7, 1.9e7, 1.9e7])]
    whale_b = [(200, [-1.8e7, 1.8e7, 0.0], [-1.8e7, -1.8e7, 1.8e7])]
    A = _poly_df(spark, small_a + whale_a)
    B = _poly_df(spark, small_b + whale_b)
    got = {
        (r.polygon_id, r.b_polygon_id)
        for r in polygons_intersect_join(A, B, grid_zoom=7, max_cells_per_poly=64).collect()
    }
    bref = B
    for c in B.columns:
        bref = bref.withColumnRenamed(c, f"b_{c}")
    hit = make_rings_intersect_udf()(
        F.col("ring_xs"), F.col("ring_ys"), F.col("b_ring_xs"), F.col("b_ring_ys")
    )
    want = {
        (r.polygon_id, r.b_polygon_id)
        for r in A.crossJoin(bref).filter(hit).collect()
    }
    assert got == want
    # whales actually matched things (the paths are live)
    assert any(a == 100 for a, _ in got) and any(b == 200 for _, b in got)
    # and each pair appears exactly once (paths partition the pair space)
    out = polygons_intersect_join(A, B, grid_zoom=7, max_cells_per_poly=64)
    assert out.count() == out.select("polygon_id", "b_polygon_id").distinct().count()


def test_ring_is_simple_kernel_and_twin():
    """ST_IsSimple: valid shapes pass, bowtie/self-touch/spike/degenerate
    fail; the DuckDB twin decides bit-identically on randomized rings."""
    from tilekiln_spark.functions.geometry import ring_is_simple_sql
    from tilekiln_spark.operators.spatial_join import _ring_is_simple_np

    cases = [
        ([0, 4, 4, 0], [0, 0, 3, 3], True),
        ([0, 2, 2, 0], [0, 2, 0, 2], False),                 # bowtie
        ([0, 2, 1, 2, 0, 1], [0, 0, 1, 2, 2, 1], False),     # self-touch
        ([0, 4, 2, 2], [0, 0, 0, 2], False),                 # spike
        ([0, 16e6, 16e6, 8e6, 8e6, 0], [0, 0, 8e6, 8e6, 16e6, 16e6], True),
        ([1, 2], [1, 1], False),                             # degenerate
    ]
    sql = ring_is_simple_sql("xs", "ys")
    con = duckdb.connect()
    for xs, ys, want in cases:
        assert _ring_is_simple_np(_f(xs), _f(ys)) == want, (xs, want)
    for _, xs, ys in _rand_rings(40, 7):
        got = _ring_is_simple_np(_f(xs), _f(ys))
        twin = con.execute(
            f"SELECT {sql} FROM (SELECT CAST(? AS DOUBLE[]) xs, CAST(? AS DOUBLE[]) ys)",
            [xs, ys],
        ).fetchone()[0]
        assert got == twin
