"""Planar geometry measures (ST_Area / ST_Length / ST_Perimeter parity):
known values, degenerate/null guards, exact DuckDB-twin equivalence, the
way_area golden identity, and the compiled-template wiring.

Reference parity: tilekiln templates call PostGIS measures freely and read
osm2pgsql's precomputed way_area (reference tilekiln/definition.py:42-77,
sample/building.sql.jinja2); here each measure is one F.aggregate fold —
built-in HOF, whole-stage codegen, no UDF (functions/geometry.py).
"""

import duckdb
import pytest
import pyspark.sql.functions as F

from tilekiln_spark.config.errors import DefinitionError
from tilekiln_spark.config.model import Config
from tilekiln_spark.functions.geometry import (
    line_length,
    line_length_sql,
    ring_area,
    ring_area_sql,
    ring_perimeter,
    ring_perimeter_sql,
)
from tilekiln_spark.operators.tiling import pages_geo, render_zooms, sample_tables
from tilekiln_spark.sources.pages import layer_polygons, pages

# rect, right triangle, concave L, 2-vertex, 1-vertex, empty, null
_FIXTURE = [
    (0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 3.0, 3.0]),
    (1, [0.0, 6.0, 0.0], [0.0, 0.0, 8.0]),
    (2, [0.0, 1.6e7, 1.6e7, 8.0e6, 8.0e6, 0.0],
        [0.0, 0.0, 8.0e6, 8.0e6, 1.6e7, 1.6e7]),
    (3, [1.0, 2.0], [1.0, 1.0]),
    (4, [5.0], [5.0]),
    (5, [], []),
    (6, None, None),
]


def _fixture_df(spark):
    return spark.createDataFrame(
        _FIXTURE, "gid int, xs array<double>, ys array<double>"
    )


def _measures(spark):
    return (
        _fixture_df(spark)
        .select(
            "gid",
            ring_area(F.col("xs"), F.col("ys")).alias("area"),
            ring_perimeter(F.col("xs"), F.col("ys")).alias("perim"),
            line_length(F.col("xs"), F.col("ys")).alias("len_open"),
        )
        .orderBy("gid")
        .collect()
    )


def test_measures_known_values(spark):
    rows = {r.gid: r for r in _measures(spark)}
    assert rows[0].area == 12.0 and rows[0].perim == 14.0 and rows[0].len_open == 11.0
    assert rows[1].area == 24.0  # right triangle 6x8
    assert rows[1].perim == 24.0  # 6 + 8 + 10
    assert rows[2].area == 1.92e14  # concave L: 16e6^2 - 8e6^2
    # degenerate guards: <3 vertices area 0, <2 vertices length 0
    assert rows[3].area == 0.0 and rows[3].len_open == 1.0 and rows[3].perim == 2.0
    assert rows[4].area == 0.0 and rows[4].len_open == 0.0 and rows[4].perim == 0.0
    assert rows[5].area == 0.0 and rows[5].len_open == 0.0
    # null arrays null-propagate (never coerced to 0)
    assert rows[6].area is None and rows[6].perim is None and rows[6].len_open is None


def test_measures_duckdb_twins(spark):
    """The *_sql builders generate the IDENTICAL arithmetic as DuckDB list
    lambdas — bit-equal results on every fixture row, degenerates and null
    included (both folds accumulate left-to-right in float64)."""
    got = [
        (r.gid, r.area, r.perim, r.len_open) for r in _measures(spark)
    ]
    vals = ",".join(
        f"({g}, " + ("NULL, NULL" if xs is None else f"{xs!r}::DOUBLE[], {ys!r}::DOUBLE[]")
        + ")"
        for g, xs, ys in _FIXTURE
    )
    want = duckdb.connect().execute(
        f"""
        WITH t(gid, xs, ys) AS (VALUES {vals})
        SELECT gid, {ring_area_sql('xs', 'ys')} AS area,
               {ring_perimeter_sql('xs', 'ys')} AS perim,
               {line_length_sql('xs', 'ys')} AS len_open
        FROM t ORDER BY gid
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]


_DIST_FIXTURE = [
    # square (0,0)-(4,0)-(4,3)-(0,3); probe above, beyond corner, inside,
    # plus a duplicate-vertex ring (degenerate edge, guarded division),
    # a single-vertex ring (point-to-vertex) and the null guard
    (0, 2.0, 5.0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 3.0, 3.0]),
    (1, 8.0, 6.0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 3.0, 3.0]),
    (2, 2.0, 1.0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 3.0, 3.0]),
    (3, 7.0, 3.0, [0.0, 0.0, 4.0, 4.0], [0.0, 0.0, 0.0, 3.0]),
    (4, 8.0, 9.0, [5.0], [5.0]),
    (5, 1.0, 1.0, None, None),
]


def test_point_ring_distance_known_values(spark):
    from tilekiln_spark.functions.geometry import point_ring_distance

    df = spark.createDataFrame(
        _DIST_FIXTURE, "gid int, px double, py double, xs array<double>, ys array<double>"
    )
    rows = (
        df.select(
            "gid",
            point_ring_distance(
                F.col("px"), F.col("py"), F.col("xs"), F.col("ys")
            ).alias("d"),
        )
        .orderBy("gid")
        .collect()
    )
    got = {r.gid: r.d for r in rows}
    assert got[0] == 2.0          # straight up to the top edge
    assert got[1] == 5.0          # 3-4-5 to corner (4,3)
    assert got[2] == 1.0          # inside: BOUNDARY distance (composition zeroes it)
    assert got[3] == 3.0          # duplicate vertex: degenerate edge guarded
    assert got[4] == 5.0          # single vertex: point-to-vertex
    assert got[5] is None


def test_point_ring_distance_duckdb_twin(spark):
    from tilekiln_spark.functions.geometry import (
        point_ring_distance,
        point_ring_distance_sql,
    )

    df = spark.createDataFrame(
        _DIST_FIXTURE, "gid int, px double, py double, xs array<double>, ys array<double>"
    )
    got = [
        (r.gid, r.d)
        for r in df.select(
            "gid",
            point_ring_distance(
                F.col("px"), F.col("py"), F.col("xs"), F.col("ys")
            ).alias("d"),
        )
        .orderBy("gid")
        .collect()
    ]
    vals = ",".join(
        f"({g}, {px!r}, {py!r}, "
        + ("NULL, NULL" if xs is None else f"{xs!r}::DOUBLE[], {ys!r}::DOUBLE[]")
        + ")"
        for g, px, py, xs, ys in _DIST_FIXTURE
    )
    want = duckdb.connect().execute(
        f"""
        WITH t(gid, px, py, xs, ys) AS (VALUES {vals})
        SELECT gid, {point_ring_distance_sql('px', 'py', 'xs', 'ys')} AS d
        FROM t ORDER BY gid
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]


_CENTROID_FIXTURE = [
    (0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 3.0, 3.0]),     # square -> (2, 1.5)
    (1, [0.0, 6.0, 0.0], [0.0, 0.0, 9.0]),                # triangle -> (2, 3)
    (2, [0.0, 0.0, 4.0, 4.0], [3.0, 0.0, 0.0, 3.0]),      # CW square, same centroid
    (3, [0.0, 1.0, 2.0], [0.0, 1.0, 2.0]),                # collinear -> vertex mean
    (4, [1.0, 5.0], [2.0, 4.0]),                          # 2 points -> mean
    (5, None, None),
]


def test_ring_centroid_known_values(spark):
    from tilekiln_spark.functions.geometry import ring_centroid

    df = spark.createDataFrame(
        _CENTROID_FIXTURE, "gid int, xs array<double>, ys array<double>"
    )
    cx, cy = ring_centroid(F.col("xs"), F.col("ys"))
    got = {
        r.gid: (r.cx, r.cy)
        for r in df.select("gid", cx.alias("cx"), cy.alias("cy")).collect()
    }
    assert got[0] == (2.0, 1.5)
    assert got[1] == (2.0, 3.0)
    assert got[2] == (2.0, 1.5)
    assert got[3] == (1.0, 1.0)
    assert got[4] == (3.0, 3.0)
    assert got[5] == (None, None)


def test_ring_centroid_duckdb_twin(spark):
    from tilekiln_spark.functions.geometry import ring_centroid, ring_centroid_sql

    df = spark.createDataFrame(
        _CENTROID_FIXTURE, "gid int, xs array<double>, ys array<double>"
    )
    cx, cy = ring_centroid(F.col("xs"), F.col("ys"))
    got = [
        tuple(r)
        for r in df.select("gid", cx.alias("cx"), cy.alias("cy"))
        .orderBy("gid")
        .collect()
    ]
    cx_sql, cy_sql = ring_centroid_sql("xs", "ys")
    vals = ",".join(
        f"({g}, "
        + ("NULL, NULL" if xs is None else f"{xs!r}::DOUBLE[], {ys!r}::DOUBLE[]")
        + ")"
        for g, xs, ys in _CENTROID_FIXTURE
    )
    want = duckdb.connect().execute(
        f"WITH t(gid, xs, ys) AS (VALUES {vals}) "
        f"SELECT gid, {cx_sql} AS cx, {cy_sql} AS cy FROM t ORDER BY gid"
    ).fetchall()
    assert got == [tuple(r) for r in want]


_INTERP_FIXTURE = [
    (0, 0.5, [0.0, 4.0, 4.0], [0.0, 0.0, 3.0]),   # mid of total 7 -> (3.5, 0)
    (1, 6.0 / 7.0, [0.0, 4.0, 4.0], [0.0, 0.0, 3.0]),  # -> (4, 2)
    (2, 0.0, [0.0, 4.0, 4.0], [0.0, 0.0, 3.0]),   # start
    (3, 1.0, [0.0, 4.0, 4.0], [0.0, 0.0, 3.0]),   # end
    (4, 0.5, [1.0, 1.0, 2.0], [1.0, 1.0, 1.0]),   # zero-length first edge
    (5, 0.25, [7.0], [9.0]),                      # single vertex -> itself
    (6, 0.5, None, None),
]


def test_line_interpolate_point(spark):
    from tilekiln_spark.functions.geometry import (
        line_interpolate_point,
        line_interpolate_point_sql,
    )

    rows = []
    for g, fr, xs, ys in _INTERP_FIXTURE:
        df = spark.createDataFrame(
            [(g, xs, ys)], "gid int, xs array<double>, ys array<double>"
        )
        px, py = line_interpolate_point(F.col("xs"), F.col("ys"), fr)
        rows.append(tuple(df.select("gid", px.alias("px"), py.alias("py")).collect()[0]))
    got = {g: (px, py) for g, px, py in rows}
    assert got[0] == (3.5, 0.0)
    assert got[1] == (4.0, 2.0)
    assert got[2] == (0.0, 0.0)
    assert got[3] == (4.0, 3.0)
    assert got[4] == (1.5, 1.0)
    assert got[5] == (7.0, 9.0)
    assert got[6] == (None, None)

    # DuckDB twin, bit-identical per fixture row
    con = duckdb.connect()
    for g, fr, xs, ys in _INTERP_FIXTURE:
        px_sql, py_sql = line_interpolate_point_sql("xs", "ys", fr)
        lit = (
            "NULL::DOUBLE[], NULL::DOUBLE[]"
            if xs is None
            else f"{xs!r}::DOUBLE[], {ys!r}::DOUBLE[]"
        )
        want = con.execute(
            f"WITH t(xs, ys) AS (VALUES ({lit})) "
            f"SELECT {px_sql}, {py_sql} FROM t"
        ).fetchone()
        assert got[g] == tuple(want), g


def test_ring_ring_distance(spark):
    """Known gaps between disjoint rings + twin bit-equality.  Two unit
    squares 3 apart -> 3; diagonal offset -> corner-to-corner sqrt(2);
    vertex-to-EDGE-interior case (not vertex-to-vertex) -> 0.5."""
    from tilekiln_spark.functions.geometry import (
        ring_ring_distance,
        ring_ring_distance_sql,
    )

    sq = ([0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0])

    def shift(r, dx, dy):
        return [v + dx for v in r[0]], [v + dy for v in r[1]]

    fixture = [
        (0, *sq, *shift(sq, 4.0, 0.0)),                       # gap 3
        (1, *sq, *shift(sq, 2.0, 2.0)),                       # diag sqrt(2)
        (2, *sq, [0.5, 2.5, 2.5], [1.5, 1.5, 3.0]),           # vertex->edge 0.5
        (3, *sq, None, None),                                  # null guard
    ]
    df = spark.createDataFrame(
        fixture,
        "gid int, axs array<double>, ays array<double>, "
        "bxs array<double>, bys array<double>",
    )
    d = ring_ring_distance(F.col("axs"), F.col("ays"), F.col("bxs"), F.col("bys"))
    got = {r.gid: r.d for r in df.select("gid", d.alias("d")).collect()}
    assert got[0] == 3.0
    assert got[1] == pytest.approx(2.0 ** 0.5, rel=1e-15)
    assert got[2] == 0.5
    assert got[3] is None

    vals = ",".join(
        f"({g}, {axs!r}::DOUBLE[], {ays!r}::DOUBLE[], "
        + (
            "NULL::DOUBLE[], NULL::DOUBLE[]"
            if bxs is None
            else f"{bxs!r}::DOUBLE[], {bys!r}::DOUBLE[]"
        )
        + ")"
        for g, axs, ays, bxs, bys in fixture
    )
    want = duckdb.connect().execute(
        f"WITH t(gid, axs, ays, bxs, bys) AS (VALUES {vals}) "
        f"SELECT gid, {ring_ring_distance_sql('axs', 'ays', 'bxs', 'bys')} "
        f"FROM t ORDER BY gid"
    ).fetchall()
    assert [(g, got[g]) for g, *_ in fixture] == [tuple(r) for r in want]


_SEG_FIXTURE = [
    (0, [0.0, 3.0], [0.0, 0.0]),        # 3 sub-edges at max_len 1
    (1, [0.0, 1.0], [0.0, 0.0]),        # exactly max_len: unchanged
    (2, [0.0, 3.0], [0.0, 4.0]),        # len 5 -> k=3 (max_len 2 case below)
    (3, [1.0, 1.0, 2.0], [5.0, 5.0, 5.0]),  # zero-length first edge
    (4, [7.0], [9.0]),                  # single vertex passthrough
    (5, None, None),
]


def test_segmentize(spark):
    from tilekiln_spark.functions.geometry import segmentize, segmentize_sql

    df = spark.createDataFrame(
        _SEG_FIXTURE, "gid int, xs array<double>, ys array<double>"
    )
    sx1, sy1 = segmentize(F.col("xs"), F.col("ys"), 1.0)
    got = {
        r.gid: (r.sx, r.sy)
        for r in df.select("gid", sx1.alias("sx"), sy1.alias("sy")).collect()
    }
    assert got[0] == ([0.0, 1.0, 2.0, 3.0], [0.0, 0.0, 0.0, 0.0])
    assert got[1] == ([0.0, 1.0], [0.0, 0.0])
    assert got[3] == ([1.0, 1.0, 2.0], [5.0, 5.0, 5.0])
    assert got[4] == ([7.0], [9.0])
    assert got[5] == (None, None)
    import pytest as _pt

    with _pt.raises(ValueError, match="max_len"):
        segmentize(F.col("xs"), F.col("ys"), 0.0)
    with _pt.raises(ValueError, match="max_len"):
        segmentize_sql("xs", "ys", -1.0)
    sx2, sy2 = segmentize(F.col("xs"), F.col("ys"), 2.0)
    g2 = df.where("gid = 2").select(sx2.alias("sx"), sy2.alias("sy")).collect()[0]
    assert g2.sx == [0.0, 1.0, 2.0, 3.0]
    assert g2.sy == [0.0, 4.0 / 3.0, 8.0 / 3.0, 4.0]

    # twin: bit-identical arrays on every fixture row, both tolerances
    for ml in (1.0, 2.0):
        xs_sql, ys_sql = segmentize_sql("xs", "ys", ml)
        vals = ",".join(
            f"({g}, "
            + ("NULL::DOUBLE[], NULL::DOUBLE[]" if xs is None
               else f"{xs!r}::DOUBLE[], {ys!r}::DOUBLE[]")
            + ")"
            for g, xs, ys in _SEG_FIXTURE
        )
        want = duckdb.connect().execute(
            f"WITH t(gid, xs, ys) AS (VALUES {vals}) "
            f"SELECT gid, {xs_sql}, {ys_sql} FROM t ORDER BY gid"
        ).fetchall()
        sxc, syc = segmentize(F.col("xs"), F.col("ys"), ml)
        gotc = [
            tuple(r)
            for r in df.select("gid", sxc.alias("sx"), syc.alias("sy"))
            .orderBy("gid").collect()
        ]
        assert gotc == [tuple(r) for r in want]


def test_line_locate_point(spark):
    """Inverse of interpolate on the L-chain [(0,0),(4,0),(4,3)] (len 7):
    projections, end clamps, the first-minimum tie rule, and the
    round-trip with line_interpolate_point."""
    from tilekiln_spark.functions.geometry import (
        line_locate_point,
        line_locate_point_sql,
    )

    chain = ([0.0, 4.0, 4.0], [0.0, 0.0, 3.0])
    fixture = [
        (0, *chain, 2.0, 1.0),    # edge 1, t=.5 -> 2/7
        (1, *chain, 5.0, 1.5),    # edge 2, t=.5 -> 5.5/7
        (2, *chain, 5.0, 4.0),    # beyond the end -> 1.0
        (3, *chain, -1.0, -1.0),  # before the start -> 0.0
        (4, *chain, 3.0, 1.0),    # tie (dist 1 to both edges) -> FIRST edge, 3/7
        (5, [7.0], [9.0], 1.0, 1.0),   # single vertex -> 0.0
        (6, None, None, 1.0, 1.0),
    ]
    df = spark.createDataFrame(
        fixture,
        "gid int, xs array<double>, ys array<double>, px double, py double",
    )
    fr = line_locate_point(F.col("xs"), F.col("ys"), F.col("px"), F.col("py"))
    got = {r.gid: r.f for r in df.select("gid", fr.alias("f")).collect()}
    assert got[0] == 2.0 / 7.0
    assert got[1] == 5.5 / 7.0
    assert got[2] == 1.0
    assert got[3] == 0.0
    assert got[4] == 3.0 / 7.0
    assert got[5] == 0.0
    assert got[6] is None

    vals = ",".join(
        f"({g}, "
        + ("NULL::DOUBLE[], NULL::DOUBLE[]" if xs is None
           else f"{xs!r}::DOUBLE[], {ys!r}::DOUBLE[]")
        + f", {px!r}, {py!r})"
        for g, xs, ys, px, py in fixture
    )
    want = duckdb.connect().execute(
        f"WITH t(gid, xs, ys, px, py) AS (VALUES {vals}) "
        f"SELECT gid, {line_locate_point_sql('xs', 'ys', 'px', 'py')} "
        f"FROM t ORDER BY gid"
    ).fetchall()
    assert [(g, got[g]) for g, *_ in fixture] == [tuple(r) for r in want]


def test_azimuth_compass_points(spark):
    """ST_Azimuth: north-based clockwise — N=0, E=90, S=180, W=270; the
    coincident-point deviation returns 0."""
    from tilekiln_spark.functions.geometry import azimuth, azimuth_sql

    fixture = [
        (0, 0.0, 1.0), (1, 1.0, 0.0), (2, 0.0, -1.0), (3, -1.0, 0.0),
        (4, 1.0, 1.0), (5, 0.0, 0.0),
    ]
    df = spark.createDataFrame(fixture, "gid int, tx double, ty double")
    az = F.degrees(azimuth(F.lit(0.0), F.lit(0.0), F.col("tx"), F.col("ty")))
    got = {r.gid: r.a for r in df.select("gid", F.round(az, 9).alias("a")).collect()}
    assert got[0] == 0.0 and got[1] == 90.0
    assert got[2] == 180.0 and got[3] == 270.0
    assert got[4] == 45.0 and got[5] == 0.0
    vals = ",".join(f"({g}, {x!r}, {y!r})" for g, x, y in fixture)
    want = duckdb.connect().execute(
        f"WITH t(gid, tx, ty) AS (VALUES {vals}) "
        f"SELECT gid, round(degrees({azimuth_sql('0.0', '0.0', 'tx', 'ty')}), 9) "
        f"FROM t ORDER BY gid"
    ).fetchall()
    assert [(g, got[g]) for g, _, _ in fixture] == [tuple(r) for r in want]


def test_hexbin_nearest_center_property(spark):
    """The defining hexbin invariant: every point lands in the hex whose
    center is nearest (strictly, among the point's own cell and all its
    neighbors), and the twin SQL reproduces the assignment bit-for-bit."""
    import math

    import numpy as np

    from tilekiln_spark.functions.geometry import (
        hex_center,
        hex_center_sql,
        hexbin_qr,
        hexbin_qr_sql,
    )

    size = 10.0
    rng = np.random.default_rng(11)
    pts = [(int(i), float(x), float(y))
           for i, (x, y) in enumerate(rng.uniform(-100, 100, (400, 2)))]
    df = spark.createDataFrame(pts, "pid int, x double, y double")
    qc, rc = hexbin_qr(F.col("x"), F.col("y"), size)
    rows = df.select("pid", "x", "y", qc.alias("q"), rc.alias("r")).collect()

    def center(q, r):
        return (size * math.sqrt(3.0) * (q + r / 2.0), size * 1.5 * r)

    for row in rows:
        cx, cy = center(row.q, row.r)
        d_own = (row.x - cx) ** 2 + (row.y - cy) ** 2
        for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
            nx, ny = center(row.q + dq, row.r + dr)
            assert d_own <= (row.x - nx) ** 2 + (row.y - ny) ** 2 + 1e-9

    # DuckDB twin: identical (q, r) and centers for every point
    q_sql, r_sql = hexbin_qr_sql("x", "y", size)
    cx_sql, cy_sql = hex_center_sql(q_sql, r_sql, size)
    vals = ",".join(f"({p}, {x!r}, {y!r})" for p, x, y in pts)
    want = duckdb.connect().execute(
        f"WITH t(pid, x, y) AS (VALUES {vals}) "
        f"SELECT pid, {q_sql} AS q, {r_sql} AS r, {cx_sql}, {cy_sql} "
        f"FROM t ORDER BY pid"
    ).fetchall()
    cxc, cyc = hex_center(F.col("q"), F.col("r"), size)
    got = (
        df.select("pid", qc.alias("q"), rc.alias("r"))
        .select("pid", "q", "r", cxc.alias("cx"), cyc.alias("cy"))
        .orderBy("pid")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_st_area_matches_way_area(spark):
    """Golden identity: the fixture's way_area column IS the Python shoelace
    of the same ring accumulated in the same order — ring_area must
    reproduce it bit-for-bit on all 360 polygons (convex AND concave)."""
    polys = layer_polygons(spark, 120)
    bad = polys.filter(
        ring_area(F.col("ring_xs"), F.col("ring_ys")) != F.col("way_area")
    ).count()
    assert bad == 0


def _template_sources(spark):
    return {
        "pages_geo": pages_geo(pages(spark, 2000)),
        "layer_polygons": layer_polygons(spark, 30),
        "tables": sample_tables(),
        "materialize": False,
    }


def _poly_cfg(where: str, extra_item: str = ""):
    return Config(
        f"""
metadata: {{id: meas}}
vector_layers:
  water:
    fields: {{}}
    sql:
    - {{minzoom: 2, maxzoom: 4, extent: 4096, file: m.t}}
""",
        {
            "m.t": f"""
SELECT ST_AsMVTGeom(way, {{{{bbox}}}}, {{{{extent}}}}) AS way, osm_id{extra_item}
FROM water_polygons
WHERE way && {{{{bbox}}}} AND {where}
"""
        },
    )


def test_compiled_st_area_filter(spark):
    """`WHERE ST_Area(way) > X` compiles to the fold and renders
    byte-identically to the precomputed-column filter `way_area > X`
    (they are the same number, see test_st_area_matches_way_area)."""
    sources = _template_sources(spark)
    thr = 1.0e12
    by_fn = {(r.zoom, r.x, r.y): bytes(r.water_data) for r in
             render_zooms(_poly_cfg(f"ST_Area(way) > {thr}"), [2, 3],
                          dict(sources)).collect()}
    by_col = {(r.zoom, r.x, r.y): bytes(r.water_data) for r in
              render_zooms(_poly_cfg(f"way_area > {thr}"), [2, 3],
                           dict(sources)).collect()}
    assert by_fn == by_col
    # the threshold actually bites: strictly smaller than the unfiltered set
    all_t = {(r.zoom, r.x, r.y): bytes(r.water_data) for r in
             render_zooms(_poly_cfg("1 = 1"), [2, 3], dict(sources)).collect()}
    assert set(by_fn) <= set(all_t)
    assert by_fn != all_t
    assert len(by_fn) > 0


def test_compiled_st_perimeter_property(spark):
    """ST_Perimeter(way) as a SELECT item lands in the tile properties;
    perimeter >= 4*sqrt(area) for every rectangle (isoperimetric check on
    decoded values is overkill — assert the render succeeds and differs
    from the area-item render, i.e. the item is not ignored)."""
    sources = _template_sources(spark)
    a = {(r.zoom, r.x, r.y): bytes(r.water_data) for r in
         render_zooms(_poly_cfg("1 = 1", ", ST_Area(way) AS m"), [2],
                      dict(sources)).collect()}
    p = {(r.zoom, r.x, r.y): bytes(r.water_data) for r in
         render_zooms(_poly_cfg("1 = 1", ", ST_Perimeter(way) AS m"), [2],
                      dict(sources)).collect()}
    assert set(a) == set(p) and len(a) > 0
    assert any(a[k] != p[k] for k in a)


def test_compiled_st_length_polyline(spark):
    """ST_Length over a true open-chain (polyline-kind) table compiles and
    filters: a length threshold between the two fixture chains keeps
    exactly the longer one."""
    import pandas as pd

    chains = [
        (0, [0.0, 3.0e6], [0.0, 4.0e6]),            # length 5e6
        (1, [0.0, 6.0e6, 6.0e6], [0.0, 0.0, 8.0e6]),  # length 14e6
    ]
    pdf = pd.DataFrame(
        [
            {
                "polygon_id": gid, "osm_id": gid,
                "xmin": min(xs), "ymin": min(ys),
                "xmax": max(xs), "ymax": max(ys),
                "ring_xs": xs, "ring_ys": ys,
            }
            for gid, xs, ys in chains
        ]
    )
    lines = spark.createDataFrame(
        pdf,
        "polygon_id long, osm_id long, xmin double, ymin double, "
        "xmax double, ymax double, ring_xs array<double>, ring_ys array<double>",
    )
    tables = sample_tables()
    tables["waterways"] = {"frame": lambda s: lines, "kind": "polyline"}
    cfg = Config(
        """
metadata: {id: wlen}
vector_layers:
  waterway:
    fields: {}
    sql:
    - {minzoom: 1, maxzoom: 3, extent: 2048, file: w.t}
""",
        {"w.t": """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, osm_id
FROM waterways
WHERE way && {{bbox}} AND ST_Length(way) > 10000000
"""},
    )
    sources = {
        "pages_geo": spark.createDataFrame(
            [], "url string, lang string, mx double, my double"
        ),
        "layer_polygons": layer_polygons(spark, 5),
        "tables": tables,
        "materialize": False,
    }
    from tilekiln_spark.operators.mvt import decode_tile

    tiles = render_zooms(cfg, [1], dict(sources)).collect()
    assert len(tiles) > 0
    ids = set()
    for r in tiles:
        for layer in decode_tile(bytes(r.waterway_data)):
            ki = layer["keys"].index("osm_id")
            for f in layer["features"]:
                tags = f["tags"]
                vi = next(
                    tags[i + 1] for i in range(0, len(tags), 2) if tags[i] == ki
                )
                ids.add(int(layer["values"][vi]))
    assert ids == {1}


def test_compiled_measure_kind_rejections(spark):
    sources = _template_sources(spark)
    with pytest.raises(DefinitionError, match="ST_AREA is only valid"):
        render_zooms(
            Config(
                """
metadata: {id: bad}
vector_layers:
  l:
    fields: {}
    sql:
    - {minzoom: 2, maxzoom: 3, extent: 1024, file: b.t}
""",
                {"b.t": """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, osm_id
FROM planet_osm_polygon WHERE way && {{bbox}} AND ST_Area(way) > 10
"""},
            ),
            [2], dict(sources),
        )
    with pytest.raises(DefinitionError, match="ST_LENGTH is only valid"):
        render_zooms(
            Config(
                """
metadata: {id: bad2}
vector_layers:
  l:
    fields: {}
    sql:
    - {minzoom: 2, maxzoom: 3, extent: 1024, file: b.t}
""",
                {"b.t": """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, osm_id,
       ST_Length(way) AS boundary
FROM water_polygons WHERE way && {{bbox}}
"""},
            ),
            [2], dict(sources),
        )
    with pytest.raises(DefinitionError, match="geometry column"):
        render_zooms(
            Config(
                """
metadata: {id: bad3}
vector_layers:
  l:
    fields: {}
    sql:
    - {minzoom: 2, maxzoom: 3, extent: 1024, file: b.t}
""",
                {"b.t": """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, osm_id
FROM water_polygons WHERE way && {{bbox}} AND ST_Area(1 + 2) > 10
"""},
            ),
            [2], dict(sources),
        )


def test_compiled_st_geohash(spark):
    """ST_GeoHash(ST_Transform(way, 4326), p) over a point source compiles
    to the unrolled bit interleave on the inverse-mercator lat/lon; the
    rendered property values equal the directly-computed hashes."""
    from tilekiln_spark.functions.cellcodes import geohash_encode
    from tilekiln_spark.functions.tileids import inv_merc_x, inv_merc_y
    from tilekiln_spark.operators.mvt import decode_tile

    sources = _template_sources(spark)
    cfg = Config(
        """
metadata: {id: gh}
vector_layers:
  pts:
    fields: {gh: Geohash}
    sql:
    - {minzoom: 2, maxzoom: 3, extent: 1024, file: g.t}
""",
        {"g.t": """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way,
       ST_GeoHash(ST_Transform(way, 4326), 5) AS gh
FROM planet_osm_polygon WHERE way && {{bbox}}
"""},
    )
    tiles = render_zooms(cfg, [2], dict(sources)).collect()
    assert tiles
    got = set()
    for r in tiles:
        for layer in decode_tile(bytes(r.pts_data)):
            ki = layer["keys"].index("gh")
            for f in layer["features"]:
                tags = f["tags"]
                vi = next(tags[i + 1] for i in range(0, len(tags), 2) if tags[i] == ki)
                got.add(layer["values"][vi])
    want = {
        r[0]
        for r in sources["pages_geo"].select(
            geohash_encode(inv_merc_y(F.col("my")), inv_merc_x(F.col("mx")), 5)
        ).collect()
    }
    assert got and got <= want
    # polygon sources are rejected (a ring has no single hash cell)
    bad = Config(
        """
metadata: {id: ghbad}
vector_layers:
  l:
    fields: {gh: Geohash}
    sql:
    - {minzoom: 2, maxzoom: 3, extent: 1024, file: b.t}
""",
        {"b.t": """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way,
       ST_GeoHash(way, 5) AS gh
FROM water_polygons WHERE way && {{bbox}}
"""},
    )
    with pytest.raises(DefinitionError, match="ST_GEOHASH is only valid"):
        render_zooms(bad, [2], dict(sources))


def test_point_buffer_ring_properties(spark):
    """ST_Buffer(point): n-gon vertices at exact radius; shoelace area
    equals the closed form (n/2)r^2 sin(2pi/n); composes with the ring
    measures; radius guard raises."""
    import math

    from tilekiln_spark.functions.geometry import point_buffer, ring_area

    r, segs = 10.0, 4
    n = 4 * segs
    xs, ys = point_buffer(F.lit(3.0), F.lit(-2.0), r, segments=segs)
    row = spark.range(1).select(
        xs.alias("xs"), ys.alias("ys"),
        F.round(ring_area(xs, ys), 9).alias("area"),
    ).collect()[0]
    assert len(row.xs) == n
    for vx, vy in zip(row.xs, row.ys):
        assert abs(math.hypot(vx - 3.0, vy + 2.0) - r) < 1e-12
    assert row.area == round(n / 2.0 * r * r * math.sin(2 * math.pi / n), 9)
    with pytest.raises(ValueError, match="radius"):
        point_buffer(F.lit(0.0), F.lit(0.0), 0.0)


def test_closest_point_on_chain(spark):
    """ST_ClosestPoint: edge-interior projection, endpoint clamp,
    first-minimum tie edge, single-vertex and null guards; the DuckDB twin
    must agree bitwise on identical literals."""
    import duckdb

    from tilekiln_spark.functions.geometry import (
        closest_point_on_chain,
        closest_point_on_chain_sql,
    )

    sq_xs, sq_ys = [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0]
    fixture = [
        # interior point nearer the left edge
        (0, sq_xs, sq_ys, 3.0, 4.0, True),
        # outside, clamps to the corner (5? no: (-3,-4) -> corner (0,0))
        (1, sq_xs, sq_ys, -3.0, -4.0, True),
        # center: equidistant from all four edges -> FIRST edge (bottom)
        (2, sq_xs, sq_ys, 5.0, 5.0, True),
        # open chain: beyond the last vertex clamps to it
        (3, [0.0, 5.0], [0.0, 0.0], 9.0, 2.0, False),
        (4, [7.0], [8.0], 0.0, 0.0, False),
        (5, None, None, 1.0, 1.0, True),
    ]
    rows = [(g, xs, ys, px, py) for g, xs, ys, px, py, _ in fixture]
    df = spark.createDataFrame(
        rows,
        "gid int, xs array<double>, ys array<double>, px double, py double",
    )
    out = {}
    for closed in (True, False):
        qx, qy = closest_point_on_chain(
            F.col("xs"), F.col("ys"), F.col("px"), F.col("py"), closed=closed
        )
        for r in df.select("gid", qx.alias("qx"), qy.alias("qy")).collect():
            out[(r.gid, closed)] = (r.qx, r.qy)
    assert out[(0, True)] == (0.0, 4.0)
    assert out[(1, True)] == (0.0, 0.0)
    assert out[(2, True)] == (5.0, 0.0)     # first-minimum edge rule
    assert out[(3, False)] == (5.0, 0.0)
    assert out[(4, False)] == (7.0, 8.0)
    assert out[(5, True)] == (None, None)
    # open square: wrap edge gone, (-3,-4) still clamps to (0,0)
    assert out[(1, False)] == (0.0, 0.0)

    for gid, xs, ys, px, py, closed in fixture:
        sqlx, sqly = closest_point_on_chain_sql(
            "xs", "ys", repr(px), repr(py), closed=closed
        )
        arr = (
            lambda a: "CAST(NULL AS DOUBLE[])"
            if a is None
            else "[" + ", ".join(repr(v) for v in a) + "]::DOUBLE[]"
        )
        dd = duckdb.sql(
            f"SELECT {sqlx}, {sqly} FROM (SELECT {arr(xs)} xs, {arr(ys)} ys)"
        ).fetchone()
        assert dd == out[(gid, closed)]


_SUBSTR_FIXTURE = [
    # (gid, f1, f2, xs, ys, want_xs, want_ys)
    # L-chain len 8, exact quarter cuts: start mid-edge-1, keep the corner,
    # end mid-edge-2
    (0, 0.25, 0.75, [0.0, 4.0, 4.0], [0.0, 0.0, 4.0],
     [2.0, 4.0, 4.0], [0.0, 0.0, 2.0]),
    # cuts landing EXACTLY on vertices: strict interior filter never
    # duplicates them
    (1, 0.5, 1.0, [0.0, 2.0, 4.0], [0.0, 0.0, 0.0],
     [2.0, 4.0], [0.0, 0.0]),
    # whole line
    (2, 0.0, 1.0, [0.0, 2.0, 4.0], [0.0, 0.0, 0.0],
     [0.0, 2.0, 4.0], [0.0, 0.0, 0.0]),
    # f1 == f2: deterministic degenerate [p, p]
    (3, 0.5, 0.5, [0.0, 4.0], [0.0, 0.0], [2.0, 2.0], [0.0, 0.0]),
    # single vertex passthrough
    (4, 0.2, 0.8, [7.0], [9.0], [7.0], [9.0]),
    # empty / null guards
    (5, 0.2, 0.8, [], [], None, None),
    (6, 0.2, 0.8, None, None, None, None),
]


def test_line_substring(spark):
    """PostGIS ST_LineSubstring goldens on exact-float cuts, vertex-exact
    cuts (no duplicate vertices), degenerate guards, and per-row DuckDB
    twin bit-equality."""
    from tilekiln_spark.functions.geometry import (
        line_substring,
        line_substring_sql,
    )

    got = {}
    for g, f1, f2, xs, ys, _, _ in _SUBSTR_FIXTURE:
        df = spark.createDataFrame(
            [(g, xs, ys)], "gid int, xs array<double>, ys array<double>"
        )
        sx, sy = line_substring(F.col("xs"), F.col("ys"), f1, f2)
        r = df.select(sx.alias("sx"), sy.alias("sy")).collect()[0]
        got[g] = (r.sx, r.sy)
    for g, f1, f2, xs, ys, wxs, wys in _SUBSTR_FIXTURE:
        assert got[g] == (wxs, wys), g

    con = duckdb.connect()
    for g, f1, f2, xs, ys, _, _ in _SUBSTR_FIXTURE:
        sx_sql, sy_sql = line_substring_sql("xs", "ys", f1, f2)
        lit = (
            "NULL::DOUBLE[], NULL::DOUBLE[]"
            if xs is None
            else f"{xs!r}::DOUBLE[], {ys!r}::DOUBLE[]"
        )
        want = con.execute(
            f"WITH t(xs, ys) AS (VALUES ({lit})) "
            f"SELECT {sx_sql}, {sy_sql} FROM t"
        ).fetchone()
        assert got[g] == tuple(want), g

    with pytest.raises(ValueError, match="0 <= f1 <= f2 <= 1"):
        line_substring(F.col("xs"), F.col("ys"), 0.8, 0.2)


def test_point_chain_distance(spark):
    """Open-chain point distance goldens (no wrap edge — the L-chain's
    open gap must NOT contribute) + DuckDB twin bit-equality."""
    from tilekiln_spark.functions.geometry import (
        point_chain_distance,
        point_chain_distance_sql,
    )

    # L-chain [(0,0),(4,0),(4,3)]: open — no edge from (4,3) back to (0,0)
    chain = ([0.0, 4.0, 4.0], [0.0, 0.0, 3.0])
    fixture = [
        (0, 2.0, 1.0, 1.0),          # above first edge
        (1, 5.0, 3.0, 1.0),          # right of second edge's end region
        (2, 0.0, 3.0, 3.0),          # near the OPEN gap: dist to (0,0) edge
        (3, 4.0, 0.0, 0.0),          # on the chain
        (4, None, None, None),       # null point
    ]
    rows = [
        (g, px, py, chain[0], chain[1]) for g, px, py, _ in fixture
    ]
    df = spark.createDataFrame(
        rows,
        "gid int, px double, py double, xs array<double>, ys array<double>",
    )
    d = point_chain_distance(F.col("px"), F.col("py"), F.col("xs"), F.col("ys"))
    got = {r.gid: r.d for r in df.select("gid", d.alias("d")).collect()}
    for g, _, _, want in fixture:
        assert got[g] == want, g

    con = duckdb.connect()
    sql = point_chain_distance_sql("px", "py", "xs", "ys")
    for g, px, py, _ in fixture:
        plit = "NULL::DOUBLE, NULL::DOUBLE" if px is None else f"{px!r}, {py!r}"
        dd = con.execute(
            f"SELECT {sql} FROM (SELECT {plit}, "
            f"{chain[0]!r}::DOUBLE[], {chain[1]!r}::DOUBLE[]) t(px, py, xs, ys)"
        ).fetchone()[0]
        assert dd == got[g], g

    # single-vertex degenerate
    one = spark.createDataFrame(
        [(3.0, 4.0, [0.0], [0.0])],
        "px double, py double, xs array<double>, ys array<double>",
    )
    assert one.select(
        point_chain_distance(F.col("px"), F.col("py"), F.col("xs"), F.col("ys"))
    ).collect()[0][0] == 5.0


def test_compactness_square_vs_thin(spark):
    # a unit square: PP = 4*pi*1/16 = pi/4; Schwartzberg = sqrt(pi)/2;
    # a 10x0.1 sliver is far less compact on both
    import math

    from pyspark.sql import functions as F

    from tilekiln_spark.functions.geometry import ring_area, ring_perimeter

    df = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]),
            (2, [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 0.1, 0.1]),
        ],
        "gid int, xs array<double>, ys array<double>",
    )
    xs, ys = F.col("xs"), F.col("ys")
    a = F.abs(ring_area(xs, ys))
    p = ring_perimeter(xs, ys)
    out = {r["gid"]: (r["pp"], r["sw"]) for r in df.select(
        "gid",
        (F.lit(4.0 * math.pi) * a / (p * p)).alias("pp"),
        (F.lit(2.0) * F.sqrt(F.lit(math.pi) * a) / p).alias("sw"),
    ).collect()}
    assert abs(out[1][0] - math.pi / 4.0) < 1e-12
    assert abs(out[1][1] - math.sqrt(math.pi) / 2.0) < 1e-12
    assert out[2][0] < 0.1 and out[2][1] < out[1][1]
