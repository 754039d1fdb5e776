"""Marching-squares contours (operators/raster.py contours): hand-verified
single-cell diamond, saddle convention, and contour continuity.

Reference scope: tilekiln renders rasters only through arbitrary PostGIS SQL
(tilekiln/definition.py); gdal_contour-style iso-lines are the canonical
raster->vector query for that path."""

from pyspark.sql import functions as F

from tilekiln_spark.operators.raster import contours


def _cells(spark, rows):
    return spark.createDataFrame(
        rows, "zoom int, x int, y int, bin_x int, bin_y int, n long"
    )


def test_single_hot_cell_emits_closed_diamond(spark):
    # one hot cell (global 5,5, v=4) in a sea of absent(=0) cells, level 0.5:
    # each of the 4 windows cornering it carries exactly one crossing segment
    # and the four segments close into a diamond.  Interpolation t from the
    # zero corner is 0.5/4 = 0.125; from the hot corner 3.5/4 = 0.875.
    cells = _cells(spark, [(0, 0, 0, 5, 5, 4)])
    rows = contours(cells, level=0.5, res=16).collect()
    assert len(rows) == 4
    assert all(r.part == 0 for r in rows)
    segs = {
        ((r.x1, r.y1), (r.x2, r.y2)) for r in rows
    }
    expect = {
        ((5.0, 5.875), (5.875, 5.0)),   # window (5,5): idx 1, L->B
        ((4.125, 5.0), (5.0, 5.875)),   # window (4,5): idx 2, B->R
        ((5.0, 4.125), (4.125, 5.0)),   # window (4,4): idx 4, R->T
        ((5.875, 5.0), (5.0, 4.125)),   # window (5,4): idx 8, T->L
    }
    assert segs == expect
    # continuity: every endpoint appears exactly twice (closed ring)
    from collections import Counter

    c = Counter()
    for a, b in segs:
        c[a] += 1
        c[b] += 1
    assert all(v == 2 for v in c.values())


def test_saddle_window_emits_two_parts():
    # handled in test_saddle below with the shared fixture shape
    pass


def test_saddle(spark):
    # hot cells at (5,5) and (6,6): the window with origin (5,5) has opposite
    # corners above (idx 5) -> exactly two segments with parts {0, 1}
    cells = _cells(spark, [(0, 0, 0, 5, 5, 4), (0, 0, 0, 6, 6, 4)])
    out = contours(cells, level=0.5, res=16)
    saddle = out.filter((F.col("gx") == 5) & (F.col("gy") == 5)).collect()
    assert sorted(r.part for r in saddle) == [0, 1]
    # fixed convention: part 0 = (left, top), part 1 = (right, bottom)
    p0 = next(r for r in saddle if r.part == 0)
    p1 = next(r for r in saddle if r.part == 1)
    assert (p0.x1, p0.y1) == (5.0, 5.875)      # left edge point
    assert (p0.x2, p0.y2) == (5.125, 6.0)      # top edge point
    assert (p1.x1, p1.y1) == (6.0, 5.125)      # right edge point
    assert (p1.x2, p1.y2) == (5.875, 5.0)      # bottom edge point


def test_level_above_max_yields_no_rows(spark):
    cells = _cells(spark, [(0, 0, 0, 5, 5, 4)])
    assert contours(cells, level=9.5, res=16).count() == 0


def test_interior_plateau_emits_no_interior_segments(spark):
    # a 2x2 block of equal hot cells: contours exist only on the block
    # boundary, never between equal-valued interior corners
    rows = [(0, 0, 0, 5 + dx, 5 + dy, 4) for dx in (0, 1) for dy in (0, 1)]
    out = contours(_cells(spark, rows), level=0.5, res=16).collect()
    # interior window (5,5) has all four corners hot (idx 15): no segment
    assert not [r for r in out if (r.gx, r.gy) == (5, 5)]
    # the remaining 8 of the 3x3 window origins each carry ONE segment
    assert len(out) == 8
    # and they close into a single ring: every endpoint appears twice
    from collections import Counter

    c = Counter()
    for r in out:
        c[(r.x1, r.y1)] += 1
        c[(r.x2, r.y2)] += 1
    assert all(v == 2 for v in c.values())
