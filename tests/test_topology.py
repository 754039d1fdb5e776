"""merge_lines (ST_LineMerge): chain assembly, junction stop, ring
detection, direction invariance, and singleton passthrough."""

import pandas as pd
import pytest

from tilekiln_spark.operators.topology import merge_lines

SCHEMA = "seg_id long, x1 double, y1 double, x2 double, y2 double"


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["seg_id", "x1", "y1", "x2", "y2"]), SCHEMA
    )


def test_merge_lines_chain_ring_junction(spark):
    rows = [
        # chain A: 4 collinear-ish segments; seg 3 stored REVERSED
        (1, 0.0, 0.0, 1.0, 0.0),
        (2, 1.0, 0.0, 2.0, 0.0),
        (3, 3.0, 0.0, 2.0, 0.0),      # reversed direction must still merge
        (4, 3.0, 0.0, 3.0, 1.0),
        # ring B: closed rectangle
        (10, 5.0, 5.0, 7.0, 5.0),
        (11, 7.0, 5.0, 7.0, 6.0),
        (12, 7.0, 6.0, 5.0, 6.0),
        (13, 5.0, 6.0, 5.0, 5.0),
        # T junction at (10,0): segs 20/21/22 meet (degree 3 — no merge),
        # but 20 continues through a degree-2 node to 23
        (20, 10.0, 0.0, 10.0, 2.0),
        (21, 10.0, 0.0, 12.0, 0.0),
        (22, 10.0, 0.0, 8.0, 0.0),
        (23, 10.0, 2.0, 10.0, 5.0),
        # isolated 3-4-5 diagonal singleton
        (30, 20.0, 20.0, 23.0, 24.0),
    ]
    out = {
        r.line_id: (r.n_segs, r.merged_len, r.is_ring)
        for r in merge_lines(_df(spark, rows)).collect()
    }
    assert out == {
        1: (4, 4.0, False),
        10: (4, 6.0, True),
        20: (2, 5.0, False),
        21: (1, 2.0, False),
        22: (1, 2.0, False),
        30: (1, 5.0, False),
    }


def test_merge_lines_degenerate_zero_length_self_node(spark):
    # a zero-length segment makes its node degree 2 with segs [s, s];
    # it must NOT pair with itself and stays a singleton non-ring
    rows = [(7, 1.0, 1.0, 1.0, 1.0)]
    [r] = merge_lines(_df(spark, rows)).collect()
    assert (r.line_id, r.n_segs, r.merged_len, r.is_ring) == (7, 1, 0.0, False)


def test_node_segments_cross_touch_collinear(spark):
    """node_segments: X crossing splits both, double-crossed segment gets
    3 parts, T-touch splits only the touched segment, collinear overlap
    left alone, isolated passthrough."""
    rows = [
        (1, 0.0, 0.0, 10.0, 0.0),   # crossed by 2 (s=0.2) and 3 (s=0.7)
        (2, 2.0, -1.0, 2.0, 1.0),
        (3, 7.0, -2.0, 7.0, 3.0),
        (4, 0.0, 5.0, 4.0, 5.0),    # T: 5's endpoint on 4's interior
        (5, 2.0, 5.0, 2.0, 9.0),
        (6, 20.0, 0.0, 24.0, 0.0),  # collinear overlap with 7: split at 22
        (7, 22.0, 0.0, 26.0, 0.0),  # ...and 7 split at 24 (r5)
        (8, 30.0, 30.0, 33.0, 34.0),  # isolated
    ]
    from tilekiln_spark.operators.topology import node_segments

    out = node_segments(_df(spark, rows), grid_zoom=3).collect()
    parts = {}
    for r in out:
        parts.setdefault(r.seg_id, []).append(
            (r.part, r.px1, r.py1, r.px2, r.py2)
        )
    for v in parts.values():
        v.sort()
    assert parts[1] == [
        (1, 0.0, 0.0, 2.0, 0.0),
        (2, 2.0, 0.0, 7.0, 0.0),
        (3, 7.0, 0.0, 10.0, 0.0),
    ]
    assert parts[2] == [(1, 2.0, -1.0, 2.0, 0.0), (2, 2.0, 0.0, 2.0, 1.0)]
    assert parts[3] == [(1, 7.0, -2.0, 7.0, 0.0), (2, 7.0, 0.0, 7.0, 3.0)]
    assert parts[4] == [(1, 0.0, 5.0, 2.0, 5.0), (2, 2.0, 5.0, 4.0, 5.0)]
    assert parts[5] == [(1, 2.0, 5.0, 2.0, 9.0)]   # touch at its OWN endpoint
    assert parts[6] == [(1, 20.0, 0.0, 22.0, 0.0), (2, 22.0, 0.0, 24.0, 0.0)]
    assert parts[7] == [(1, 22.0, 0.0, 24.0, 0.0), (2, 24.0, 0.0, 26.0, 0.0)]
    assert parts[8] == [(1, 30.0, 30.0, 33.0, 34.0)]


def test_union_area_disjoint_nested_island(spark):
    """The r5 seed-mask correction: an island fully inside a host ring
    with NO boundary contact no longer double-counts — its outer face
    seeds at the host's mask, and deeper nesting telescopes."""
    from tilekiln_spark.operators.topology import union_area

    # host + island + separate disjoint square
    rows = [
        (0, [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0]),
        (1, [4.0, 6.0, 6.0, 4.0], [4.0, 4.0, 6.0, 6.0]),
        (2, [20.0, 23.0, 23.0, 20.0], [0.0, 0.0, 3.0, 3.0]),
    ]
    df = spark.createDataFrame(
        rows, "ring_id long, ring_xs array<double>, ring_ys array<double>"
    )
    r = union_area(df, grid_zoom=3).collect()[0]
    assert r.union_area == 109.0  # 100 + 9; the island adds nothing

    # three-deep nesting A > B > C
    rows = [
        (0, [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0]),
        (1, [2.0, 8.0, 8.0, 2.0], [2.0, 2.0, 8.0, 8.0]),
        (2, [4.0, 6.0, 6.0, 4.0], [4.0, 4.0, 6.0, 6.0]),
    ]
    df = spark.createDataFrame(
        rows, "ring_id long, ring_xs array<double>, ring_ys array<double>"
    )
    r = union_area(df, grid_zoom=3).collect()[0]
    assert r.union_area == 100.0


def test_polygonize_grid_dangle_triangle(spark):
    """polygonize_faces: a 2x2 grid of unit squares (12 shared segments ->
    4 faces), a dangling edge hanging off the grid (ignored), an isolated
    triangle, and an isolated segment (no face)."""
    from tilekiln_spark.operators.topology import polygonize_faces

    rows = []
    sid = 0
    # 2x2 grid: horizontal segments y=0,1,2 x in [0,1],[1,2]; vertical x=0,1,2
    for y in (0.0, 1.0, 2.0):
        for x0 in (0.0, 1.0):
            rows.append((sid, x0, y, x0 + 1.0, y)); sid += 1
    for x in (0.0, 1.0, 2.0):
        for y0 in (0.0, 1.0):
            rows.append((sid, x, y0, x, y0 + 1.0)); sid += 1
    rows.append((sid, 2.0, 2.0, 3.0, 3.0)); sid += 1          # dangle off grid
    rows.append((sid, 10.0, 0.0, 13.0, 0.0)); sid += 1        # triangle
    rows.append((sid, 13.0, 0.0, 10.0, 4.0)); sid += 1        # 3-4-5
    rows.append((sid, 10.0, 4.0, 10.0, 0.0)); sid += 1
    rows.append((sid, 20.0, 20.0, 21.0, 21.0)); sid += 1      # isolated seg

    out = polygonize_faces(_df(spark, rows)).collect()
    areas = sorted(round(r.area, 9) for r in out)
    assert areas == [1.0, 1.0, 1.0, 1.0, 6.0]
    n_edges = sorted(r.n_edges for r in out)
    assert n_edges == [3, 4, 4, 4, 4]


def test_shared_paths_overlap_direction(spark):
    """shared_paths_join: containment overlap, partial overlap, reversed
    direction, endpoint-touch excluded (zero length), parallel
    non-collinear excluded, diagonal 3-4-5 overlap measured exactly."""
    from tilekiln_spark.operators.topology import shared_paths_join

    rows = [
        (1, 0.0, 0.0, 10.0, 0.0),
        (2, 4.0, 0.0, 6.0, 0.0),      # contained in 1, same dir
        (3, 8.0, 0.0, 14.0, 0.0),     # partial overlap with 1
        (4, 20.0, 0.0, 24.0, 0.0),
        (5, 26.0, 0.0, 22.0, 0.0),    # reversed: overlap (22,24)
        (6, 0.0, 5.0, 4.0, 5.0),
        (7, 4.0, 5.0, 8.0, 5.0),      # endpoint touch: zero overlap
        (8, 0.0, 10.0, 4.0, 10.0),
        (9, 0.0, 11.0, 4.0, 11.0),    # parallel, NOT collinear
        (10, 0.0, 20.0, 6.0, 28.0),   # 3-4-5 direction (6,8)
        (11, 3.0, 24.0, 9.0, 32.0),   # collinear, overlap half of 10
    ]
    got = {
        (r.a_id, r.b_id): (round(r.shared_len, 9), r.same_dir)
        for r in shared_paths_join(_df(spark, rows), grid_zoom=3).collect()
    }
    assert got == {
        (1, 2): (2.0, True),
        (1, 3): (2.0, True),
        (4, 5): (2.0, False),
        (10, 11): (5.0, True),
    }


def test_polygonize_lake_with_island(spark):
    """polygonize_faces hole assignment: a nested disconnected square
    yields the outer face WITH the hole subtracted (PostGIS contract)
    plus the island face — and two-level nesting assigns each hole to
    the SMALLEST containing face."""
    from tilekiln_spark.operators.topology import polygonize_faces

    def square(sid0, x0, y0, s):
        return [
            (sid0, x0, y0, x0 + s, y0),
            (sid0 + 1, x0 + s, y0, x0 + s, y0 + s),
            (sid0 + 2, x0 + s, y0 + s, x0, y0 + s),
            (sid0 + 3, x0, y0 + s, x0, y0),
        ]

    rows = (
        square(0, 0.0, 0.0, 8.0)      # outer: 64
        + square(10, 2.0, 2.0, 4.0)   # middle: 16 (hole of outer)
        + square(20, 3.0, 3.0, 1.0)   # inner: 1 (hole of middle)
    )
    out = sorted(
        (round(r.area, 9), r.n_edges) for r in
        polygonize_faces(_df(spark, rows)).collect()
    )
    # outer face 64-16=48 with 8 edges (its ring + hole ring),
    # middle 16-1=15 with 8, island 1 with 4
    assert out == [(1.0, 4), (15.0, 8), (48.0, 8)]


def test_union_area_chain_shared_borders(spark):
    """union_area: three chained squares (A/B share a collinear border
    piece along y=0 — the duplicate-edge dedupe + XOR toggle path) plus
    a disjoint square: |A u B u C| + |D| = 48 - 8 - 4 + 4 = 40 over 6
    arrangement faces; single ring sanity = its own area."""
    import pandas as pd

    from tilekiln_spark.operators.topology import union_area

    def sq(rid, x0, y0, s):
        return (rid, [x0, x0 + s, x0 + s, x0], [y0, y0, y0 + s, y0 + s])

    schema = "ring_id long, ring_xs array<double>, ring_ys array<double>"
    rings = spark.createDataFrame(
        pd.DataFrame(
            [sq(0, 0.0, 0.0, 4.0), sq(1, 2.0, 0.0, 4.0),
             sq(2, 5.0, 0.0, 4.0), sq(3, 20.0, 20.0, 2.0)],
            columns=["ring_id", "ring_xs", "ring_ys"],
        ),
        schema,
    )
    [r] = union_area(rings, grid_zoom=3).collect()
    assert (r.union_area, r.n_faces) == (40.0, 6)

    one = spark.createDataFrame(
        pd.DataFrame([sq(0, 0.0, 0.0, 3.0)],
                     columns=["ring_id", "ring_xs", "ring_ys"]),
        schema,
    )
    [r1] = union_area(one, grid_zoom=3).collect()
    assert (r1.union_area, r1.n_faces) == (9.0, 1)


def test_make_valid_areas_bowtie_figure8_and_overlap(spark):
    """ST_MakeValid parity areas, all hand-verified: the bowtie repairs
    to its two 4-area triangles (8 total); a valid square is the
    identity (16, one face); the figure-8 self-touching at a vertex
    yields its two 16-area lobes; a valid square overlapping the bowtie
    keeps ITS exact area 4 even though the arrangement splits it into 4
    diagonal-cut faces (per-ring parity is untouched by other rings)."""
    import pandas as pd

    from tilekiln_spark.operators.topology import make_valid_areas

    rings = [
        (0, [0.0, 4.0, 0.0, 4.0], [0.0, 0.0, 4.0, 4.0]),
        (1, [10.0, 14.0, 14.0, 10.0], [0.0, 0.0, 4.0, 4.0]),
        (2, [20.0, 24.0, 24.0, 20.0, 16.0, 16.0, 20.0, 20.0],
            [0.0, 0.0, 4.0, 4.0, 4.0, 8.0, 8.0, 4.0]),
        (3, [1.0, 3.0, 3.0, 1.0], [1.0, 1.0, 3.0, 3.0]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rings, columns=["ring_id", "ring_xs", "ring_ys"]),
        "ring_id long, ring_xs array<double>, ring_ys array<double>",
    )
    got = {r.ring_id: (round(r.valid_area, 9), r.n_faces)
           for r in make_valid_areas(df, grid_zoom=3).collect()}
    assert got[0] == (8.0, 4)   # two triangles, each split by square 3
    assert got[1] == (16.0, 1)
    assert got[2] == (32.0, 2)
    assert got[3] == (4.0, 4)   # diagonals cut the square into 4 faces
