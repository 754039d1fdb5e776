"""SQL-template compiler (config/sqlt.py): the reference executes arbitrary
Jinja SQL templates (reference tilekiln/definition.py:42-77); this engine
COMPILES the restricted subset those templates use into DataFrame plans.

Parity contract: a config shipping the actual .sql.jinja2 template files
(sample/*.sql.jinja2) must render BYTE-IDENTICALLY to the same config wired
to the hand-registered builders, plus a novel template (never hand-mapped)
must compile and render correctly."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilekiln_spark.config.model import Config
from tilekiln_spark.config.errors import DefinitionError
from tilekiln_spark.operators.tiling import render_zooms, sample_tables

CFG_YAML = """
metadata: {id: tc}
vector_layers:
  water:
    fields: {water: Type of water}
    sql:
    - {minzoom: 0, maxzoom: 8, extent: 2048, file: water.t}
  waterpoly:
    fields: {water: Type of water}
    sql:
    - {minzoom: 0, maxzoom: 8, extent: 2048, buffer: 8, file: wpoly.t}
  admin:
    fields: {admin_level: Admin level}
    sql:
    - {minzoom: 1, maxzoom: 3, file: ne.t}
    - {minzoom: 4, maxzoom: 10, file: admin.t}
  adminline:
    fields: {admin_level: Admin level}
    sql:
    - {minzoom: 1, maxzoom: 10, extent: 4096, buffer: 8, file: aline.t}
  country_names:
    fields: {name: Name, area: Area}
    sql:
    - {minzoom: 3, maxzoom: 14, file: country.t}
"""

BUILDER_TEMPLATES = {
    "water.t": "water", "wpoly.t": "water_poly", "ne.t": "ne_admin",
    "admin.t": "admin", "aline.t": "admin_line", "country.t": "country",
}

_FILES = {
    "water.t": "sample/water.sql.jinja2",
    "wpoly.t": "sample/water-poly.sql.jinja2",
    "ne.t": "sample/ne-admin.sql.jinja2",
    "admin.t": "sample/admin.sql.jinja2",
    "aline.t": "sample/admin-line.sql.jinja2",
    "country.t": "sample/country.sql.jinja2",
}


def _sql_templates():
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    return {k: (root / v).read_text() for k, v in _FILES.items()}


def _sources(spark):
    from tilekiln_spark.sources.pages import layer_polygons, pages
    from tilekiln_spark.operators.tiling import pages_geo

    return {
        "pages_geo": pages_geo(pages(spark, 4000)),
        "layer_polygons": layer_polygons(spark, 30),
        "tables": sample_tables(),
        "materialize": False,
    }


def _tile_rows(df):
    drop = [c for c in df.columns if c.endswith("_generated")]
    out = {}
    for r in df.drop(*drop).collect():
        key = (r["zoom"], r["x"], r["y"])
        out[key] = tuple(
            bytes(v) if isinstance(v, (bytes, bytearray)) else v
            for c, v in sorted(r.asDict().items()) if c not in ("zoom", "x", "y")
        )
    return out


def test_sample_templates_render_identically_to_builders(spark):
    """The four reference-sample layers (+ the areal/line variants) ingested
    from their actual .sql.jinja2 FILES produce byte-identical tiles to the
    hand-registered builders."""
    sources = _sources(spark)
    zooms = [0, 2, 5, 8]
    hand = render_zooms(Config(CFG_YAML, BUILDER_TEMPLATES), zooms, dict(sources))
    sql = render_zooms(Config(CFG_YAML, _sql_templates()), zooms, dict(sources))
    h, s = _tile_rows(hand), _tile_rows(sql)
    assert set(h) == set(s)
    diff = [k for k in h if h[k] != s[k]]
    assert not diff, f"{len(diff)} tiles differ, e.g. {diff[:3]}"
    assert len(h) > 50  # sanity: the render actually produced tiles


def test_novel_template_compiles_without_python(spark):
    """A template never hand-mapped: new filters, arithmetic, IS NULL, a
    coalesce, over the registered osm schema — runs from SQL alone."""
    cfg = Config(
        """
metadata: {id: novel}
vector_layers:
  big_water:
    fields: {label: Name}
    sql:
    - {minzoom: 2, maxzoom: 6, extent: 1024, file: novel.t}
""",
        {
            "novel.t": """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way,
       COALESCE(water, 'unnamed') AS label,
       osm_id
FROM planet_osm_polygon
WHERE way && {{bbox}}
  AND "natural" IN ('water')
  AND osm_id > 0
{% if zoom <= 4 %}
  AND way_area > 100 * {{coordinate_area}}
{% endif %}
"""
        },
    )
    sources = _sources(spark)
    tiles = render_zooms(cfg, [3, 6], dict(sources))
    rows = tiles.collect()
    assert len(rows) > 0
    assert {"big_water_data", "big_water_nfeat"} <= set(tiles.columns)
    # decode one populated tile: the label property resolved the coalesce
    from tilekiln_spark.operators.mvt import decode_tile

    populated = [r for r in rows if r.big_water_nfeat and r.big_water_nfeat > 0]
    assert populated
    (layer,) = decode_tile(bytes(populated[0].big_water_data))
    assert layer["name"] == "big_water"
    assert layer["extent"] == 1024
    assert "label" in layer["keys"] and "osm_id" in layer["keys"]


def test_compiler_rejects_out_of_subset_sql(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate

    dummy = spark.createDataFrame([(1.0, 2.0, 3)], "mx double, my double, x long")
    bad = [
        "SELECT way FROM t",                            # no ST_AsMVTGeom
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way FROM t GROUP BY way",  # no aggregation tier
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, f(x) FROM t",
    ]
    for body in bad:
        with pytest.raises(DefinitionError):
            CompiledTemplate(body).build(
                {"tables": {"t": {"frame": dummy, "kind": "point"}}}, [3], 4096, 0
            )


def test_zoom_groups_share_plans():
    """Identical rendered text across zooms collapses to one plan branch."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    body = (
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way FROM t WHERE way && {{bbox}}"
        "{% if zoom <= 4 %} AND way_area > {{tile_area}}*0.05^2{% endif %}"
    )
    ct = CompiledTemplate(body)
    groups = ct._zoom_groups(list(range(0, 9)), 4096, 0)
    assert sorted(tuple(zs) for zs, _ in groups) == [
        (0, 1, 2, 3, 4), (5, 6, 7, 8),
    ]


def test_polygon_label_points_interior(spark):
    """Exact ST_PointOnSurface: the label point is INSIDE the ring even when
    the centroid falls outside (L-shape / horseshoe)."""
    from tilekiln_spark.operators.tiling import polygon_label_points

    # C-shape (open to the right): outer [0,10]^2 with the notch
    # [2,10]x[2,8] removed — the vertex centroid lands in the notch
    xs = [0.0, 10.0, 10.0, 2.0, 2.0, 10.0, 10.0, 0.0]
    ys = [0.0, 0.0, 2.0, 2.0, 8.0, 8.0, 10.0, 10.0]
    rows = [
        (0, xs, ys),
        (1, [20.0, 24.0, 24.0, 20.0], [0.0, 0.0, 4.0, 4.0]),  # rectangle
    ]
    df = spark.createDataFrame(rows, "polygon_id long, ring_xs array<double>, ring_ys array<double>")
    out = {r.pid: (r.mx, r.my) for r in polygon_label_points(
        df, {"pid": F.col("polygon_id")}
    ).collect()}

    def inside(px, py, rxs, rys):
        n = len(rxs)
        hit = False
        for i in range(n):
            j = (i + 1) % n
            if (rys[i] > py) != (rys[j] > py):
                if px < rxs[i] + (py - rys[i]) * (rxs[j] - rxs[i]) / (rys[j] - rys[i]):
                    hit = not hit
        return hit

    ux, uy = out[0]
    assert inside(ux, uy, xs, ys), f"label point ({ux},{uy}) outside the U"
    assert uy == 5.0 and 0.0 < ux < 2.0  # widest interior interval at cy=5 is the left arm
    assert out[1] == (22.0, 2.0)  # rectangle: bbox center


def test_compiled_label_over_polygon_table(spark):
    """ST_PointOnSurface over a polygon-kind table compiles to the exact
    interior point path (not the page-cluster centroid)."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    rows = [
        (7, "lake", 0.0, 0.0, 4.0, 4.0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 4.0, 4.0]),
    ]
    tbl = spark.createDataFrame(
        rows,
        "polygon_id long, name string, xmin double, ymin double, xmax double, "
        "ymax double, ring_xs array<double>, ring_ys array<double>",
    )
    body = (
        "SELECT ST_AsMVTGeom(ST_PointOnSurface(way), {{bbox}}, {{extent}}) AS way, "
        "name FROM lakes WHERE way && {{bbox}}"
    )
    out = CompiledTemplate(body).build(
        {"tables": {"lakes": {"frame": tbl, "kind": "polygon"}}}, [3], 4096, 0
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.zoom, r.mx, r.my, r.name) == (3, 2.0, 2.0, "lake")


def test_compiled_st_centroid_polygon(spark):
    """Non-aggregate ST_Centroid(way) over a polygon table: exact
    area-weighted centroid (matches functions/geometry.py ring_centroid),
    NOT the bbox center — pinned on a concave L where the two differ."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    rows = [
        (7, "elbow", 0.0, 0.0, 3.0, 3.0,
         [0.0, 3.0, 3.0, 1.0, 1.0, 0.0],
         [0.0, 0.0, 1.0, 1.0, 3.0, 3.0]),
    ]
    tbl = spark.createDataFrame(
        rows,
        "polygon_id long, name string, xmin double, ymin double, xmax double, "
        "ymax double, ring_xs array<double>, ring_ys array<double>",
    )
    body = (
        "SELECT ST_AsMVTGeom(ST_Centroid(way), {{bbox}}, {{extent}}) AS way, "
        "name FROM lakes WHERE way && {{bbox}}"
    )
    out = CompiledTemplate(body).build(
        {"tables": {"lakes": {"frame": tbl, "kind": "polygon"}}}, [3], 4096, 0
    ).collect()
    assert len(out) == 1
    r = out[0]
    # area 5: 3x1 bottom rect (c=(1.5,0.5)) + 1x2 left column (c=(0.5,2.0))
    assert r.zoom == 3 and r.name == "elbow"
    assert r.mx == pytest.approx(1.1, abs=1e-12)
    assert r.my == pytest.approx(1.1, abs=1e-12)
    assert (r.mx, r.my) != (1.5, 1.5)  # not the bbox center

    # point-table identity: ST_Centroid of a point is the point
    pt = spark.createDataFrame(
        [(1, 5.0, 7.0, "p")], "doc_id long, mx double, my double, name string"
    )
    out2 = CompiledTemplate(
        "SELECT ST_AsMVTGeom(ST_Centroid(way), {{bbox}}) AS way, name FROM t "
        "WHERE way && {{bbox}}"
    ).build({"tables": {"t": {"frame": pt, "kind": "point"}}}, [2], 4096, 0).collect()
    assert [(r.zoom, r.mx, r.my, r.name) for r in out2] == [(2, 5.0, 7.0, "p")]

    # line/polyline kinds are a NAMED error (PostGIS linestring centroids
    # are length-weighted; the area kernel would be silently wrong)
    import pytest as _pt

    from tilekiln_spark.config.errors import DefinitionError

    with _pt.raises(DefinitionError, match="length-weighted"):
        CompiledTemplate(body).build(
            {"tables": {"lakes": {"frame": tbl, "kind": "polyline"}}},
            [3], 4096, 0,
        )


def test_case_like_between_constructs(spark):
    """Round-4 compiler tier: searched CASE, LIKE/ILIKE/NOT LIKE, BETWEEN,
    negative IN literals, round/concat/nullif — value-checked row by row."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    rows = [
        (0, 1.0, 1.0, "water park", 500.0, -1),
        (1, 2.0, 2.0, "Waterloo", 2.0e7, 2),
        (2, 3.0, 3.0, "xx-skip", 1.0, 3),
        (3, 4.0, 4.0, "plain", 1.0e13, -3),
    ]
    tbl = spark.createDataFrame(
        rows, "pid long, mx double, my double, name string, way_area double, code int"
    )
    body = """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way,
       CASE WHEN name ILIKE 'WATER%' THEN concat('w:', name)
            WHEN name LIKE '%lain' THEN 'pl'
            ELSE nullif(name, '') END AS label,
       CASE WHEN way_area BETWEEN 0 AND 1000 THEN 'small'
            WHEN way_area > 1000000000000 THEN 'huge'
            ELSE 'mid' END AS sizeclass,
       round(way_area / 1000, 1) AS kd
FROM t
WHERE way && {{bbox}} AND NOT (name LIKE 'xx%') AND code IN (-1, 2, -3)
"""
    out = {
        r.label: (r.sizeclass, r.kd)
        for r in CompiledTemplate(body)
        .build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [3], 4096, 0)
        .collect()
    }
    assert out == {
        "w:water park": ("small", 0.5),
        "w:Waterloo": ("mid", 20000.0),
        "pl": ("huge", 10000000000.0),
    }


def test_not_between_and_in_negative_literals(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate

    tbl = spark.createDataFrame(
        [(0, 1.0, 1.0, 5), (1, 2.0, 2.0, 50), (2, 3.0, 3.0, -1)],
        "pid long, mx double, my double, v int",
    )
    body = (
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, pid "
        "FROM t WHERE way && {{bbox}} AND v NOT BETWEEN 0 AND 10"
    )
    got = {
        r.pid
        for r in CompiledTemplate(body)
        .build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [3], 4096, 0)
        .collect()
    }
    assert got == {1, 2}


def test_empty_zoom_branch_skipped_and_all_empty_named(spark):
    """A template wholly inside a zoom conditional emits no rows at the
    excluded zooms; if EVERY requested zoom renders empty the error names
    the zooms instead of a bare parser failure (ADVICE r3)."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    tbl = spark.createDataFrame([(0, 1.0, 1.0)], "pid long, mx double, my double")
    body = (
        "{% if zoom > 4 %}SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, pid "
        "FROM t WHERE way && {{bbox}}{% endif %}"
    )
    src = {"tables": {"t": {"frame": tbl, "kind": "point"}}}
    ct = CompiledTemplate(body)
    # mixed: zoom 3 renders empty (skipped), zoom 6 contributes rows
    out = ct.build(src, [3, 6], 4096, 0).collect()
    assert {r.zoom for r in out} == {6}
    with pytest.raises(DefinitionError, match=r"zoom.*\[2, 3\]|\[2, 3\].*zoom"):
        CompiledTemplate(body).build(src, [2, 3], 4096, 0)


def test_sample_placeclass_template_compiles(spark):
    """The shipped CASE+LIKE sample template (sample/place-class.sql.jinja2)
    compiles over the registered osm schema and renders features."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    cfg = Config(
        """
metadata: {id: pc}
vector_layers:
  placeclass:
    fields: {label: Label, sizeclass: Size class, area_km2: Area km2}
    sql:
    - {minzoom: 0, maxzoom: 10, file: pc.t}
""",
        {"pc.t": (root / "sample/place-class.sql.jinja2").read_text()},
    )
    sources = _sources(spark)
    tiles = render_zooms(cfg, [3, 6], dict(sources))
    rows = tiles.collect()
    populated = [r for r in rows if r.placeclass_nfeat and r.placeclass_nfeat > 0]
    assert populated
    from tilekiln_spark.operators.mvt import decode_tile

    (layer,) = decode_tile(bytes(populated[0].placeclass_data))
    assert {"label", "sizeclass", "area_km2"} <= set(layer["keys"])


def test_derived_table_point_kind(spark):
    """FROM (SELECT ...) subqueries: inner projection/filter resolve over
    the registered table, `way` passes the geometry through, outer items
    reference inner aliases (reference runs arbitrary PostGIS SQL —
    tilekiln/definition.py:42-77; this closes the derived-table tier)."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    rows = [
        (0, 1.0, 1.0, "aa", 10),
        (1, 2.0, 2.0, "bb", 50),
        (2, 3.0, 3.0, "zz", 400),
        (3, 4.0, 4.0, "cc", 900),
    ]
    tbl = spark.createDataFrame(rows, "pid long, mx double, my double, lang string, n int")
    body = """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way,
       upper(tag) AS label, n2
FROM (
    SELECT way, concat(lang, '-x') AS tag, n * 2 AS n2
    FROM t WHERE lang <> 'zz' AND way && {{bbox}}
) sub
WHERE way && {{bbox}} AND n2 BETWEEN 20 AND 1000
"""
    out = {
        r.label: r.n2
        for r in CompiledTemplate(body)
        .build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [3], 4096, 0)
        .collect()
    }
    # n2=1800 (pid 3) falls outside BETWEEN 20 AND 1000; zz filtered inner
    assert out == {"AA-X": 20, "BB-X": 100}


def test_derived_table_polygon_kind_and_errors(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate

    rows = [
        (7, 0.0, 0.0, 2.0e6, 2.0e6,
         [0.0, 2.0e6, 2.0e6, 0.0], [0.0, 0.0, 2.0e6, 2.0e6], "lake", 4.0e12),
        (8, -3.0e6, -3.0e6, -1.0e6, -1.0e6,
         [-3.0e6, -1.0e6, -1.0e6, -3.0e6], [-3.0e6, -3.0e6, -1.0e6, -1.0e6], "pond", 4.0e12),
    ]
    tbl = spark.createDataFrame(
        rows,
        "polygon_id long, xmin double, ymin double, xmax double, ymax double, "
        "ring_xs array<double>, ring_ys array<double>, name string, way_area double",
    )
    body = """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, nm
FROM (SELECT way, upper(name) AS nm FROM t WHERE name LIKE 'la%') d
WHERE way && {{bbox}}
"""
    out = CompiledTemplate(body).build(
        {"tables": {"t": {"frame": tbl, "kind": "polygon"}}}, [2], 4096, 0
    ).collect()
    assert out and all(r.nm == "LAKE" for r in out)

    # derived table without `way` names the problem
    with pytest.raises(DefinitionError, match="derived table must select `way`"):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, nm "
            "FROM (SELECT upper(name) AS nm FROM t) d WHERE way && {{bbox}}"
        ).build({"tables": {"t": {"frame": tbl, "kind": "polygon"}}}, [2], 4096, 0)

    # zoom-dependent pseudo-columns inside the derived table are named too
    with pytest.raises(DefinitionError, match="not supported inside a derived table"):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, nm "
            "FROM (SELECT way, name AS nm FROM t WHERE way_area > {{tile_area}}) d "
            "WHERE way && {{bbox}}"
        ).build({"tables": {"t": {"frame": tbl, "kind": "polygon"}}}, [2], 4096, 0)


def test_join_registered_dim_table(spark):
    """INNER/LEFT JOIN: the left table carries the geometry, the right is an
    attribute dim; ambiguous columns rename behind the join alias and
    resolve via qualified refs (`b.col`)."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    pts = spark.createDataFrame(
        [(0, 1.0, 1.0, 10, "a"), (1, 2.0, 2.0, 20, "b"),
         (2, 3.0, 3.0, 30, "c"), (3, 4.0, 4.0, 40, "d")],
        "pid long, mx double, my double, cls long, name string",
    )
    dim = spark.createDataFrame(
        [(10, "water", 1.5), (20, "admin", 2.5), (30, "place", 3.5)],
        "cls long, label string, name double",  # `name` collides with left
    )
    body = """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way,
       a.name AS nm, d.label AS lbl, d.name AS weight
FROM t a
JOIN dim d ON a.cls = d.cls
WHERE way && {{bbox}} AND d.label <> 'place'
"""
    out = {
        r.nm: (r.lbl, r.weight)
        for r in CompiledTemplate(body)
        .build(
            {"tables": {"t": {"frame": pts, "kind": "point"},
                        "dim": {"frame": dim, "kind": "point"}}},
            [3], 4096, 0,
        )
        .collect()
    }
    # pid 2 filtered by label, pid 3 dropped by INNER join (no dim row)
    assert out == {"a": ("water", 1.5), "b": ("admin", 2.5)}


def test_left_join_and_join_inside_derived(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate

    pts = spark.createDataFrame(
        [(0, 1.0, 1.0, 10), (1, 2.0, 2.0, 99)],
        "pid long, mx double, my double, cls long",
    )
    dim = spark.createDataFrame([(10, "water")], "cls long, label string")
    srcs = {"tables": {"t": {"frame": pts, "kind": "point"},
                       "dim": {"frame": dim, "kind": "point"}}}

    body = """
SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, pid,
       coalesce(d.label, 'none') AS lbl
FROM t a LEFT JOIN dim d ON a.cls = d.cls
WHERE way && {{bbox}}
"""
    got = {
        r.pid: r.lbl
        for r in CompiledTemplate(body).build(srcs, [3], 4096, 0).collect()
    }
    assert got == {0: "water", 1: "none"}

    # a JOIN inside a derived table; outer sees only the projected columns
    body2 = """
SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, tagged
FROM (
    SELECT way, concat(d.label, ':', a.pid) AS tagged
    FROM t a JOIN dim d ON a.cls = d.cls
) s
WHERE way && {{bbox}}
"""
    got2 = [r.tagged for r in CompiledTemplate(body2).build(srcs, [3], 4096, 0).collect()]
    assert got2 == ["water:0"]


def test_join_alias_required_on_collision(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate

    pts = spark.createDataFrame([(0, 1.0, 1.0)], "pid long, mx double, my double")
    srcs = {"tables": {"t": {"frame": pts, "kind": "point"}}}
    body = (
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, pid "
        "FROM t JOIN t ON pid = pid WHERE way && {{bbox}}"
    )
    with pytest.raises(DefinitionError, match="duplicate table alias"):
        CompiledTemplate(body).build(srcs, [3], 4096, 0)

    # a derived right side with colliding columns and NO alias is named too
    body2 = (
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, pid "
        "FROM t a JOIN (SELECT way, pid FROM t) ON pid = pid "
        "WHERE way && {{bbox}}"
    )
    with pytest.raises(DefinitionError, match="needs an alias"):
        CompiledTemplate(body2).build(srcs, [3], 4096, 0)


def test_hstore_map_access_exists_and_cast(spark):
    """Round-4 compiler tier: hstore-style operators over a
    map<string,string> column (the osm2pgsql `tags` shape) — `tags->'key'`
    is NULL for a missing key or NULL map (try_element_at, even under ANSI),
    `tags ? 'key'` is key-exists, and `(tags->'k')::integer` postfix-casts
    a non-identifier expression."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    rows = []
    for i in range(12):
        tags = {"name": f"n{i}"}
        if i % 3 != 0:
            tags["population"] = str(i * 1000)
        if i % 4 == 0:
            tags["wikidata"] = f"Q{i}"
        rows.append((i, float(i), float(i), None if i == 11 else tags))
    tbl = spark.createDataFrame(
        rows, "pid long, mx double, my double, tags map<string,string>"
    )
    body = """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, pid,
       tags->'name' AS name,
       (tags->'population')::integer AS pop,
       tags ? 'wikidata' AS has_wd
FROM t
WHERE way && {{bbox}} AND tags ? 'population'
  AND (tags->'population')::integer > 3000
"""
    out = (
        CompiledTemplate(body)
        .build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [3], 4096, 0)
        .select("pid", "name", "pop", "has_wd")
        .collect()
    )
    got = {r.pid: (r.name, r.pop, r.has_wd) for r in out}
    # pop key exists (i%3!=0), map non-null (i!=11), value > 3000
    assert got == {
        4: ("n4", 4000, True),
        5: ("n5", 5000, False),
        7: ("n7", 7000, False),
        8: ("n8", 8000, True),
        10: ("n10", 10000, False),
    }

    # missing key -> NULL through ->, not an ANSI error; NULL map rows too
    all_rows = (
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, pid, "
            "tags->'population' AS p FROM t WHERE way && {{bbox}}"
        )
        .build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [3], 4096, 0)
        .collect()
    )
    nulls = {r.pid for r in all_rows if r.p is None}
    assert nulls == {0, 3, 6, 9, 11}

    # unsupported cast type is a DefinitionError, not a Spark crash
    with pytest.raises(DefinitionError, match="unsupported cast"):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, "
            "(tags->'x')::hstore AS h FROM t WHERE way && {{bbox}}"
        ).build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [3], 4096, 0)


def test_string_function_whitelist(spark):
    """Round-4 compiler tier: Postgres string functions common in OSM layer
    SQL — substr (2- and 3-arg), trim/ltrim/rtrim, replace, split_part
    (1-based), left/right, starts_with."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    tbl = spark.createDataFrame(
        [(0, 1.0, 1.0, "  Main Street  ", "A;B;C"),
         (1, 2.0, 2.0, "Elm Road", "X;Y")],
        "pid long, mx double, my double, name string, refs string",
    )
    body = """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, pid,
       substr(trim(name), 1, 4) AS head,
       substr(name, 3) AS tail3,
       replace(trim(name), ' ', '_') AS snake,
       split_part(refs, ';', 2) AS ref2,
       left(refs, 1) AS l1, right(refs, 1) AS r1,
       starts_with(refs, 'A') AS is_a
FROM t
WHERE way && {{bbox}}
"""
    out = {
        r.pid: (r.head, r.tail3, r.snake, r.ref2, r.l1, r.r1, r.is_a)
        for r in CompiledTemplate(body)
        .build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [3], 4096, 0)
        .collect()
    }
    assert out == {
        0: ("Main", "Main Street  ", "Main_Street", "B", "A", "C", True),
        1: ("Elm ", "m Road", "Elm_Road", "Y", "X", "Y", False),
    }


def test_order_by_limit_per_tile(spark):
    """Trailing ORDER BY <key> [DESC] LIMIT n compiles to a per-(zoom,x,y)
    top-n window (the reference runs the SQL once per tile, so LIMIT caps
    EACH tile's features — reference definition.py:42-77).  Two tiles at z1,
    unequal pool sizes, DESC key: each tile keeps its own top-2 by score."""
    from tilekiln_spark.operators.mvt import decode_tile

    HW = 20037508.342789244
    q = HW / 2  # tile centers at z1
    rows = [
        # four points in z1 tile (0,0): scores 1..4 -> keep {4.0, 3.0}
        (0, -q, q, 1.0), (1, -q + 9, q, 2.0), (2, -q, q - 9, 3.0), (3, -q + 9, q - 9, 4.0),
        # two points in z1 tile (1,1): scores 5, 6 -> keep both (pool < n)
        (4, q, -q, 5.0), (5, q + 9, -q, 6.0),
    ]
    tbl = spark.createDataFrame(rows, "pid long, mx double, my double, score double")
    cfg = Config(
        """
metadata: {id: topn}
vector_layers:
  pts:
    fields: {score: Rank score}
    sql:
    - {minzoom: 1, maxzoom: 1, extent: 4096, file: topn.t}
""",
        {
            "topn.t": """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, score
FROM t WHERE way && {{bbox}}
ORDER BY score DESC LIMIT 2
"""
        },
    )
    tiles = render_zooms(
        cfg, [1], {"tables": {"t": {"frame": tbl, "kind": "point"}}, "materialize": False}
    )
    got = {}
    for r in tiles.collect():
        if r["pts_data"] is None:
            continue
        (layer,) = decode_tile(bytes(r["pts_data"]))
        scores = sorted(
            layer["values"][f["tags"][2 * i + 1]]
            for f in layer["features"]
            for i in range(len(f["tags"]) // 2)
            if layer["keys"][f["tags"][2 * i]] == "score"
        )
        got[(r["x"], r["y"])] = (r["pts_nfeat"], tuple(scores))
    assert got == {(0, 0): (2, (3.0, 4.0)), (1, 1): (2, (5.0, 6.0))}


def test_order_by_zoom_conditional_limits(spark):
    """Zoom conditionals may vary the LIMIT value (same ORDER BY key): each
    zoom applies its own per-tile cap; a zoom with no LIMIT branch is
    uncapped."""
    from tilekiln_spark.config.sqlt import CompiledTemplate
    from tilekiln_spark.operators.tiling import _layer_band_features

    HW = 20037508.342789244
    q = HW / 2
    tbl = spark.createDataFrame(
        [(i, -q, q, float(i)) for i in range(6)],
        "pid long, mx double, my double, score double",
    )
    cfg = Config(
        """
metadata: {id: topnz}
vector_layers:
  pts:
    fields: {score: Rank score}
    sql:
    - {minzoom: 1, maxzoom: 3, extent: 4096, file: topnz.t}
""",
        {
            "topnz.t": """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, score
FROM t WHERE way && {{bbox}}
{% if zoom == 1 %}ORDER BY score ASC LIMIT 1{% elif zoom == 2 %}ORDER BY score ASC LIMIT 4{% endif %}
"""
        },
    )
    feats = _layer_band_features(
        cfg, "pts", [1, 2, 3],
        {"tables": {"t": {"frame": tbl, "kind": "point"}}, "materialize": False},
        None,
    )
    by_zoom = {}
    for r in feats.collect():
        by_zoom.setdefault(r["zoom"], []).append(r["score"])
    assert sorted(by_zoom[1]) == [0.0]
    assert sorted(by_zoom[2]) == [0.0, 1.0, 2.0, 3.0]
    assert len(by_zoom[3]) == 6  # no LIMIT branch at z3 -> uncapped

    # conflicting ORDER BY keys across zoom groups is a definition error
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, score FROM t "
            "WHERE way && {{bbox}} "
            "{% if zoom == 1 %}ORDER BY score LIMIT 1"
            "{% else %}ORDER BY pid LIMIT 1{% endif %}"
        ).order_limit_for([1, 2], 4096, 0)


def test_order_by_unknown_column_rejected(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate

    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, score FROM t "
            "WHERE way && {{bbox}} ORDER BY nope LIMIT 2"
        ).order_limit_for([1], 4096, 0)


def test_group_by_cluster_per_tile(spark):
    """GROUP BY compiles to a per-(zoom,x,y,keys) aggregation with the
    ST_Centroid(ST_Collect(way)) geometry = group centroid (the reference
    runs the SQL once per tile, so GROUP BY aggregates within the tile);
    HAVING filters groups; expressions over aggregates compile."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    HW = 20037508.342789244
    q = HW / 2
    rows = [
        # z1 tile (0,0): 2 en + 1 fr; z1 tile (1,1): 2 fr
        (0, -q, q, "en", 10), (1, -q + 8, q - 8, "en", 30), (2, -q, q - 9, "fr", 100),
        (3, q, -q, "fr", 50), (4, q + 8, -q - 8, "fr", 70),
    ]
    tbl = spark.createDataFrame(
        rows, "pid long, mx double, my double, lang string, n_chars long"
    )
    out = CompiledTemplate(
        """
SELECT ST_AsMVTGeom(ST_Centroid(ST_Collect(way)), {{bbox}}, {{extent}}) AS way,
       lang, count(*) AS n_docs, sum(n_chars) AS total_chars,
       round(avg(n_chars), 1) AS avg_chars
FROM t WHERE way && {{bbox}}
GROUP BY lang
HAVING sum(n_chars) > 20
"""
    ).build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [1], 4096, 0)
    got = {
        (r.lang, round(r.mx), round(r.my)): (r.n_docs, r.total_chars, r.avg_chars)
        for r in out.collect()
    }
    # en group in tile (0,0): centroid of the two en points, sums over both;
    # the (0,0) fr group (sum 100) and (1,1) fr group (sum 120) both survive
    # HAVING; nothing merges across tiles
    assert got == {
        ("en", round(-q + 4), round(q - 4)): (2, 40, 20.0),
        ("fr", round(-q), round(q - 9)): (1, 100, 100.0),
        ("fr", round(q + 4), round(-q - 4)): (2, 120, 60.0),
    }
    # centroid stays inside the owning tile -> re-assignment agrees
    from tilekiln_spark.operators.tiling import tile_x, tile_y
    import pyspark.sql.functions as F

    xy = out.select(
        tile_x(F.col("zoom"), F.col("mx")).alias("x"),
        tile_y(F.col("zoom"), F.col("my")).alias("y"),
    ).collect()
    assert sorted((r.x, r.y) for r in xy) == [(0, 0), (0, 0), (1, 1)]


def test_group_by_whole_tile_aggregate(spark):
    """No GROUP BY keys at all: one aggregate feature per tile (heatmap
    shape)."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    HW = 20037508.342789244
    q = HW / 2
    tbl = spark.createDataFrame(
        [(0, -q, q, 5), (1, -q + 9, q, 7), (2, q, -q, 11)],
        "pid long, mx double, my double, w long",
    )
    out = CompiledTemplate(
        "SELECT ST_AsMVTGeom(ST_Centroid(ST_Collect(way)), {{bbox}}, {{extent}}) AS way, "
        "count(*) AS n, sum(w) AS sw FROM t WHERE way && {{bbox}}"
    ).build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [1], 4096, 0)
    assert sorted((r.n, r.sw) for r in out.collect()) == [(1, 11), (2, 12)]


def test_group_by_errors(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate

    tbl = spark.createDataFrame(
        [(0, 1.0, 1.0, "a", 1)], "pid long, mx double, my double, lang string, n long"
    )
    src = {"tables": {"t": {"frame": tbl, "kind": "point"}}}

    # GROUP BY without the aggregate geometry form
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, lang, count(*) AS n_ "
            "FROM t WHERE way && {{bbox}} GROUP BY lang"
        ).build(src, [1], 4096, 0)
    # non-aggregate, non-key output column
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_Centroid(ST_Collect(way)), {{bbox}}) AS way, "
            "lang, n FROM t WHERE way && {{bbox}} GROUP BY lang"
        ).build(src, [1], 4096, 0)
    # GROUP BY names a non-selected column
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_Centroid(ST_Collect(way)), {{bbox}}) AS way, "
            "count(*) AS n_ FROM t WHERE way && {{bbox}} GROUP BY lang"
        ).build(src, [1], 4096, 0)
    # nested aggregates
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_Centroid(ST_Collect(way)), {{bbox}}) AS way, "
            "sum(count(*)) AS n_ FROM t WHERE way && {{bbox}}"
        ).build(src, [1], 4096, 0)
    # GROUP BY inside a derived table
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, n_ FROM "
            "(SELECT way, count(*) AS n_ FROM t GROUP BY lang) d "
            "WHERE way && {{bbox}}"
        ).build(src, [1], 4096, 0)
    # count(*) only valid for count
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_Centroid(ST_Collect(way)), {{bbox}}) AS way, "
            "sum(*) AS s_ FROM t WHERE way && {{bbox}}"
        ).build(src, [1], 4096, 0)


def test_select_distinct_quantized(spark):
    """SELECT DISTINCT dedups the QUANTIZED per-tile row: two raw points on
    the same output pixel with equal props are one feature; a differing
    prop or pixel survives.  A zoom-conditional branch without DISTINCT
    stays undeduplicated."""
    from tilekiln_spark.operators.tiling import _layer_band_features

    HW = 20037508.342789244
    q = HW / 2
    eps = 0.001  # ~1mm: far below one z1-pixel (4891m), same quantized px
    rows = [
        (0, -q, q, "a"), (1, -q + eps, q - eps, "a"),  # same pixel+prop -> 1
        (2, -q, q, "b"),                                # same pixel, new prop
        (3, -q + 9000, q, "a"),                         # ~2 pixels away
    ]
    tbl = spark.createDataFrame(rows, "pid long, mx double, my double, tag string")
    cfg = Config(
        """
metadata: {id: dst}
vector_layers:
  pts:
    fields: {tag: T}
    sql:
    - {minzoom: 1, maxzoom: 2, extent: 4096, file: dst.t}
""",
        {
            "dst.t": """
SELECT {% if zoom == 1 %}DISTINCT{% endif %} ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, tag
FROM t WHERE way && {{bbox}}
"""
        },
    )
    feats = _layer_band_features(
        cfg, "pts", [1, 2],
        {"tables": {"t": {"frame": tbl, "kind": "point"}}, "materialize": False},
        None,
    )
    by_zoom = {}
    for r in feats.collect():
        by_zoom.setdefault(r["zoom"], []).append((r["px"], r["py"], r["tag"]))
    assert len(by_zoom[1]) == 3  # deduped: pixel-dup pair collapsed
    assert len(by_zoom[2]) == 4  # no DISTINCT at z2
    assert len(set(by_zoom[1])) == 3


def test_select_distinct_errors(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate

    # DISTINCT + UNION ALL
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT DISTINCT ST_AsMVTGeom(way, {{bbox}}) AS way, tag FROM t "
            "WHERE way && {{bbox}} UNION ALL "
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, tag FROM t "
            "WHERE way && {{bbox}}"
        )._zoom_groups([1], 4096, 0)
    # DISTINCT + GROUP BY
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT DISTINCT ST_AsMVTGeom(ST_Centroid(ST_Collect(way)), {{bbox}}) AS way, "
            "tag, count(*) AS n_ FROM t WHERE way && {{bbox}} GROUP BY tag"
        )._zoom_groups([1], 4096, 0)
    # DISTINCT on a polygon table
    poly = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0, 1.0, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0], "a")],
        "polygon_id long, xmin double, ymin double, xmax double, ymax double, "
        "ring_xs array<double>, ring_ys array<double>, tag string",
    )
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT DISTINCT ST_AsMVTGeom(way, {{bbox}}) AS way, tag FROM p "
            "WHERE way && {{bbox}}"
        ).build({"tables": {"p": {"frame": poly, "kind": "polygon"}}}, [1], 4096, 0)


def test_order_by_limit_polygon_kind(spark):
    """LIMIT on a geometry-kind template caps per tile on the bbox-assigned
    rows (the reference's WHERE way && bbox ... LIMIT does the same: LIMIT
    applies to intersecting rows before ST_AsMVTGeom clips)."""
    from tilekiln_spark.operators.tiling import _layer_band_features

    HW = 20037508.342789244
    # three nested squares around the origin spanning all four z1 tiles,
    # areas descending with polygon_id
    rows = []
    for i, half in enumerate((3e6, 2e6, 1e6)):
        rows.append(
            (i, -half, -half, half, half,
             [-half, half, half, -half], [-half, -half, half, half],
             float(half))
        )
    tbl = spark.createDataFrame(
        rows,
        "polygon_id long, xmin double, ymin double, xmax double, ymax double, "
        "ring_xs array<double>, ring_ys array<double>, halfw double",
    )
    cfg = Config(
        """
metadata: {id: pl}
vector_layers:
  polys:
    fields: {halfw: Half width}
    sql:
    - {minzoom: 1, maxzoom: 1, extent: 4096, buffer: 0, file: pl.t}
""",
        {
            "pl.t": """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, halfw
FROM p WHERE way && {{bbox}}
ORDER BY halfw DESC LIMIT 2
"""
        },
    )
    feats = _layer_band_features(
        cfg, "polys", [1],
        {"tables": {"p": {"frame": tbl, "kind": "polygon"}}, "materialize": False},
        None,
    )
    by_tile = {}
    for r in feats.collect():
        by_tile.setdefault((r["x"], r["y"]), []).append(r["halfw"])
    # every z1 tile intersects all three bboxes; LIMIT keeps the 2 largest
    assert set(by_tile) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert all(sorted(v) == [2e6, 3e6] for v in by_tile.values())


def test_count_sum_distinct_aggregates(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate

    HW = 20037508.342789244
    q = HW / 2
    rows = [(0, -q, q, "en", 10), (1, -q + 9, q, "en", 10), (2, -q, q - 9, "fr", 30)]
    tbl = spark.createDataFrame(
        rows, "pid long, mx double, my double, lang string, n long"
    )
    out = CompiledTemplate(
        "SELECT ST_AsMVTGeom(ST_Centroid(ST_Collect(way)), {{bbox}}) AS way, "
        "count(DISTINCT lang) AS n_langs, sum(DISTINCT n) AS sd, sum(n) AS s_ "
        "FROM t WHERE way && {{bbox}}"
    ).build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [1], 4096, 0)
    (r,) = out.collect()
    assert (r.n_langs, r.sd, r.s_) == (2, 40, 50)
    # DISTINCT on a scalar function / unsupported aggregate is an error
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, "
            "round(DISTINCT n) AS r_ FROM t WHERE way && {{bbox}}"
        ).build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [1], 4096, 0)
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_Centroid(ST_Collect(way)), {{bbox}}) AS way, "
            "avg(DISTINCT n) AS a_ FROM t WHERE way && {{bbox}}"
        ).build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [1], 4096, 0)


def test_compile_modulo_and_in_subquery(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate

    pts = spark.createDataFrame(
        [(1.0, 2.0, 3, "city"), (1.5, 2.5, 4, "town"), (1.6, 2.6, 6, "city")],
        "mx double, my double, osm_id long, place string")
    allowed = spark.createDataFrame([("city",), (None,)], "place string")
    tables = {"t": {"frame": pts, "kind": "point"},
              "allowed": {"frame": allowed, "kind": "point", "broadcast": True}}
    body = ("select osm_id, ST_AsMVTGeom(way, {{bbox}}, {{extent}}) as way "
            "from t where osm_id % 2 = 0")
    got = CompiledTemplate(body).build({"tables": tables}, [3], 4096, 0)
    assert sorted(r.osm_id for r in got.select("osm_id").collect()) == [4, 6]
    body = ("select osm_id, ST_AsMVTGeom(way, {{bbox}}, {{extent}}) as way "
            "from t where place in (select place from allowed where place is not null)")
    df = CompiledTemplate(body).build({"tables": tables}, [3], 4096, 0)
    assert sorted(r.osm_id for r in df.select("osm_id").collect()) == [3, 6]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan


def test_in_subquery_named_rejections(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate

    pts = spark.createDataFrame([(1.0, 2.0, 3, "city")],
                                "mx double, my double, osm_id long, place string")
    allowed = spark.createDataFrame([("city",)], "place string")
    tables = {"t": {"frame": pts, "kind": "point"},
              "allowed": {"frame": allowed, "kind": "point"}}
    sel = "select osm_id, ST_AsMVTGeom(way, {{bbox}}, {{extent}}) as way from t where "
    # r5: NOT IN (SELECT ...) now compiles (null-faithful anti join) —
    # see test_not_in_subquery_null_faithful
    with pytest.raises(DefinitionError, match="top-level AND conjunct"):
        CompiledTemplate(
            sel + "osm_id = 1 or place in (select place from allowed)").build(
            {"tables": tables}, [3], 4096, 0)


def test_cte_compiles_as_named_derived_table(spark):
    """WITH CTEs: a CTE is a named derived table — usable in FROM and JOIN,
    and a later CTE may reference an earlier one."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    rows = [
        (0, 1.0, 1.0, "aa", 10),
        (1, 2.0, 2.0, "bb", 50),
        (2, 3.0, 3.0, "zz", 400),
        (3, 4.0, 4.0, "cc", 900),
    ]
    tbl = spark.createDataFrame(rows, "pid long, mx double, my double, lang string, n int")
    body = """
WITH filtered AS (
    SELECT way, lang, n FROM t WHERE lang <> 'zz' AND way && {{bbox}}
), doubled AS (
    SELECT way, concat(lang, '-x') AS tag, n * 2 AS n2 FROM filtered f
)
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way,
       upper(tag) AS label, n2
FROM doubled
WHERE way && {{bbox}} AND n2 BETWEEN 20 AND 1000
"""
    out = {
        r.label: r.n2
        for r in CompiledTemplate(body)
        .build({"tables": {"t": {"frame": tbl, "kind": "point"}}}, [3], 4096, 0)
        .collect()
    }
    assert out == {"AA-X": 20, "BB-X": 100}


def test_cte_errors(spark):
    """Recursive-CTE named errors (non-UNION-ALL / aggregate outer /
    non-referencing step), duplicate CTE names, and CTEs inside
    IN-subqueries."""
    import pytest as _pytest

    from tilekiln_spark.config.errors import DefinitionError
    from tilekiln_spark.config.sqlt import CompiledTemplate

    tbl_src = {"tables": {"t": {"frame": None, "kind": "point"}}}
    # r5: WITH RECURSIVE compiles via bounded unroll; the residual named
    # errors are the semantic boundaries of the unroll
    with _pytest.raises(DefinitionError, match="UNION ALL"):
        CompiledTemplate(
            "WITH RECURSIVE r AS (SELECT way, pid FROM t UNION "
            "SELECT way, pid FROM t JOIN r rr ON t.pid = rr.pid) "
            "SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way FROM r"
        ).build(tbl_src, [3], 4096, 0)
    with _pytest.raises(DefinitionError, match="must reference the"):
        CompiledTemplate(
            "WITH RECURSIVE r AS (SELECT way, pid FROM t UNION ALL "
            "SELECT way, pid FROM t) "
            "SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way FROM r"
        ).build(tbl_src, [3], 4096, 0)
    with _pytest.raises(DefinitionError, match="do not commute"):
        CompiledTemplate(
            "WITH RECURSIVE r AS (SELECT way, pid FROM t UNION ALL "
            "SELECT w.way, w.pid FROM r w) "
            "SELECT ST_AsMVTGeom(ST_Centroid(ST_Collect(way)), {{bbox}}, "
            "{{extent}}) AS way, pid FROM r GROUP BY pid"
        ).build(tbl_src, [3], 4096, 0)
    with _pytest.raises(DefinitionError, match="duplicate CTE"):
        CompiledTemplate(
            "WITH a AS (SELECT way FROM t), a AS (SELECT way FROM t) "
            "SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way FROM a"
        ).build(tbl_src, [3], 4096, 0)
    with _pytest.raises(DefinitionError, match="references\\s+a CTE"):
        CompiledTemplate(
            "WITH a AS (SELECT way, lang FROM t) "
            "SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way FROM t "
            "WHERE lang IN (SELECT lang FROM a)"
        ).build(tbl_src, [3], 4096, 0)


def test_exists_semi_and_anti(spark):
    """[NOT] EXISTS compiles to a correlated semi/anti join: inner-alias-
    qualified refs are inner, unqualified refs are outer columns."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    rows = [
        (0, 1.0, 1.0, "en", 10),
        (1, 2.0, 2.0, "de", 50),
        (2, 3.0, 3.0, "fr", 400),
        (3, 4.0, 4.0, "xx", 900),
    ]
    tbl = spark.createDataFrame(rows, "pid long, mx double, my double, lang string, n int")
    dim = spark.createDataFrame(
        [("en", 1), ("de", 0), ("fr", 1)], "dlang string, keep int"
    )
    srcs = {"tables": {
        "t": {"frame": tbl, "kind": "point"},
        "dim": {"frame": dim, "kind": "point", "broadcast": True},
    }}
    body = """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, lang, n
FROM t
WHERE way && {{bbox}} AND EXISTS (
    SELECT 1 FROM dim d WHERE d.dlang = lang AND d.keep = 1
)
"""
    got = {r.lang for r in CompiledTemplate(body).build(srcs, [3], 4096, 0).collect()}
    assert got == {"en", "fr"}
    body_anti = body.replace("AND EXISTS", "AND NOT EXISTS")
    got2 = {r.lang for r in CompiledTemplate(body_anti).build(srcs, [3], 4096, 0).collect()}
    assert got2 == {"de", "xx"}  # de: dim row exists but keep=0 filters it out


def test_exists_errors(spark):
    import pytest as _pytest

    from tilekiln_spark.config.errors import DefinitionError
    from tilekiln_spark.config.sqlt import CompiledTemplate

    tbl = spark.createDataFrame(
        [(0, 1.0, 1.0, "en")], "pid long, mx double, my double, lang string"
    )
    dim = spark.createDataFrame([("en", 1)], "dlang string, keep int")
    srcs = {"tables": {"t": {"frame": tbl, "kind": "point"},
                       "dim": {"frame": dim, "kind": "point"}}}
    base = "SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way FROM t WHERE "
    with _pytest.raises(DefinitionError, match="no correlation equality"):
        CompiledTemplate(
            base + "EXISTS (SELECT 1 FROM dim d WHERE d.keep > 0)"
        ).build(srcs, [3], 4096, 0)
    with _pytest.raises(DefinitionError, match="top-level AND"):
        CompiledTemplate(
            base + "(EXISTS (SELECT 1 FROM dim d WHERE d.dlang = lang) OR lang = 'en')"
        ).build(srcs, [3], 4096, 0)
    with _pytest.raises(DefinitionError, match="SELECT 1 or SELECT"):
        CompiledTemplate(
            base + "EXISTS (SELECT dlang FROM dim d WHERE d.dlang = lang)"
        ).build(srcs, [3], 4096, 0)
    with _pytest.raises(DefinitionError, match="references\\s+a CTE"):
        CompiledTemplate(
            "WITH c AS (SELECT way, lang FROM t) " + base.replace("FROM t", "FROM t") +
            "EXISTS (SELECT 1 FROM c x WHERE x.lang = lang)"
        ).build(srcs, [3], 4096, 0)


def test_scalar_subquery(spark):
    """(SELECT agg(col) FROM tbl [WHERE ...]) resolves to a build-time
    literal — usable in WHERE and SELECT items; re-building against
    different sources recomputes it (the parse cache is not mutated)."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    def mk(ns):
        return spark.createDataFrame(
            [(i, float(i), float(i), f"l{i}", n) for i, n in enumerate(ns)],
            "pid long, mx double, my double, lang string, n int",
        )

    body = """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, lang, n,
       (SELECT max(n) FROM t) AS cap
FROM t
WHERE way && {{bbox}} AND n > (SELECT avg(n) FROM t WHERE n < 100)
"""
    ct = CompiledTemplate(body)
    t1 = mk([10, 20, 90, 400])   # avg(n<100) = 40 -> keeps 90, 400; cap 400
    got1 = {(r.lang, r.cap) for r in ct.build(
        {"tables": {"t": {"frame": t1, "kind": "point"}}}, [3], 4096, 0
    ).collect()}
    assert got1 == {("l2", 400), ("l3", 400)}
    t2 = mk([1, 2, 3])           # avg = 2 -> keeps 3; cap 3
    got2 = {(r.lang, r.cap) for r in ct.build(
        {"tables": {"t": {"frame": t2, "kind": "point"}}}, [3], 4096, 0
    ).collect()}
    assert got2 == {("l2", 3)}


def test_scalar_subquery_count_and_errors(spark):
    import pytest as _pytest

    from tilekiln_spark.config.errors import DefinitionError
    from tilekiln_spark.config.sqlt import CompiledTemplate

    tbl = spark.createDataFrame(
        [(0, 1.0, 1.0, "en", 5)], "pid long, mx double, my double, lang string, n int"
    )
    srcs = {"tables": {"t": {"frame": tbl, "kind": "point"}}}
    out = CompiledTemplate(
        "SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way,"
        " (SELECT count(*) FROM t) AS total FROM t WHERE way && {{bbox}}"
    ).build(srcs, [3], 4096, 0).collect()
    assert [r.total for r in out] == [1]
    with _pytest.raises(DefinitionError, match="single aggregate"):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way FROM t "
            "WHERE n > (SELECT n FROM t)"
        ).build(srcs, [3], 4096, 0)


def test_compiled_st_simplify(spark):
    """ST_Simplify(way, tol) inside ST_AsMVTGeom compiles to the
    pre-encode thinning kernel: same tiles, payloads never larger, and a
    meaningful tolerance strictly shrinks at least one polygon tile."""
    def cfg(geom):
        return Config(
            f"""
metadata: {{id: simp}}
vector_layers:
  water:
    fields: {{}}
    sql:
    - {{minzoom: 2, maxzoom: 4, extent: 4096, file: simp.t}}
""",
            {
                "simp.t": f"""
SELECT ST_AsMVTGeom({geom}, {{{{bbox}}}}, {{{{extent}}}}) AS way, osm_id
FROM water_polygons
WHERE way && {{{{bbox}}}}
"""
            },
        )

    sources = _sources(spark)
    plain = {(r.zoom, r.x, r.y): bytes(r.water_data) for r in
             render_zooms(cfg("way"), [2, 3], dict(sources)).collect()}
    simp = {(r.zoom, r.x, r.y): bytes(r.water_data) for r in
            render_zooms(cfg("ST_Simplify(way, 200000)"), [2, 3],
                         dict(sources)).collect()}
    assert set(plain) == set(simp)
    assert all(len(simp[k]) <= len(plain[k]) for k in plain)
    assert any(len(simp[k]) < len(plain[k]) for k in plain)


def test_compiled_st_simplify_rejections(spark):
    from tilekiln_spark.config.errors import DefinitionError

    def one(geom, table):
        return Config(
            """
metadata: {id: bad}
vector_layers:
  l:
    fields: {}
    sql:
    - {minzoom: 2, maxzoom: 3, extent: 1024, file: b.t}
""",
            {"b.t": f"""
SELECT ST_AsMVTGeom({geom}, {{{{bbox}}}}, {{{{extent}}}}) AS way, osm_id
FROM {table} WHERE way && {{{{bbox}}}}
"""},
        )

    sources = _sources(spark)
    with pytest.raises(DefinitionError, match="polygon/line"):
        # planet_osm_polygon maps onto the point-kind fixture rows
        render_zooms(one("ST_Simplify(way, 100)", "planet_osm_polygon"),
                     [2], dict(sources))
    with pytest.raises(DefinitionError, match="positive numeric"):
        render_zooms(one("ST_Simplify(way, 0)", "water_polygons"),
                     [2], dict(sources))
    with pytest.raises(DefinitionError, match="geometry column"):
        # ST_Simplify composes only with a plain geometry column
        render_zooms(
            one("ST_Simplify(ST_PointOnSurface(way), 100)", "water_polygons"),
            [2], dict(sources))


def test_compiled_st_simplify_preserve_topology_alias(spark):
    """ST_SimplifyPreserveTopology (the common osm-template spelling)
    compiles to the same kernel: byte-identical to ST_Simplify."""
    def cfg(fn):
        return Config(
            """
metadata: {id: spt}
vector_layers:
  water:
    fields: {}
    sql:
    - {minzoom: 2, maxzoom: 3, extent: 2048, file: spt.t}
""",
            {"spt.t": f"""
SELECT ST_AsMVTGeom({fn}(way, 200000), {{{{bbox}}}}, {{{{extent}}}}) AS way,
       osm_id
FROM water_polygons WHERE way && {{{{bbox}}}}
"""},
        )

    sources = _sources(spark)
    a = {(r.zoom, r.x, r.y): bytes(r.water_data) for r in
         render_zooms(cfg("ST_Simplify"), [2], dict(sources)).collect()}
    b = {(r.zoom, r.x, r.y): bytes(r.water_data) for r in
         render_zooms(cfg("ST_SimplifyPreserveTopology"), [2],
                      dict(sources)).collect()}
    assert a == b and len(a) > 0


def test_compiled_st_simplify_runs_before_zoom_explode(spark):
    """The thinning kernel applies once per source FEATURE: in the
    compiled plan every Generate (zoom/tile explode) sits ABOVE the
    ArrowEvalPython node (parents print first), so the UDF's input is the
    un-exploded source frame (review fix)."""
    cfg = Config(
        """
metadata: {id: pe}
vector_layers:
  water:
    fields: {}
    sql:
    - {minzoom: 2, maxzoom: 6, extent: 2048, file: pe.t}
""",
        {"pe.t": """
SELECT ST_AsMVTGeom(ST_Simplify(way, 200000), {{bbox}}, {{extent}}) AS way,
       osm_id
FROM water_polygons WHERE way && {{bbox}}
"""},
    )
    sources = _sources(spark)
    df = render_zooms(cfg, [2, 3, 4, 5, 6], dict(sources))
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    (i,) = [k for k, l in enumerate(lines) if "ArrowEvalPython" in l]
    # the UDF's child subtree is the raw source (Project/Filter/Scan) —
    # no zoom column, no Generate: thinning happens before any explode
    child = "\n".join(lines[i + 1 : i + 4])
    assert "zoom#" not in child and "Generate" not in child
    assert "Scan" in child or "Project" in child


def test_compiled_st_dwithin(spark):
    """ST_DWithin over a point source compiles to the exact squared-distance
    residual: the compiled feature set == hand-filtered pages_geo, for the
    ST_SetSRID(ST_MakePoint) and bare ST_Point forms, plain and negated."""
    from tilekiln_spark.config.sqlt import CompiledTemplate
    from tilekiln_spark.operators.tiling import pages_geo
    from tilekiln_spark.sources.pages import pages

    pts = pages_geo(pages(spark, 1500)).cache()
    px, py, r = 2000000.0, 1000000.0, 6000000.0
    body = f"""
SELECT ST_AsMVTGeom(way, {{{{bbox}}}}, {{{{extent}}}}) AS way, url
FROM pts
WHERE way && {{{{bbox}}}}
  AND ST_DWithin(way, ST_SetSRID(ST_MakePoint({px}, {py}), 3857), {r})
  AND NOT ST_DWithin(ST_Point({px}, {py}), way, {r} / 4)
"""
    sources = {"tables": {"pts": {"frame": pts, "kind": "point"}}}
    feats = CompiledTemplate(body).build(sources, [3], 4096, 0)
    got = sorted(u.url for u in feats.select("url").collect())
    d2 = (F.col("mx") - px) * (F.col("mx") - px) + (F.col("my") - py) * (F.col("my") - py)
    expected = sorted(
        u.url
        for u in pts.where((d2 <= r * r) & ~(d2 <= (r / 4) * (r / 4))).select("url").collect()
    )
    assert got == expected and expected
    pts.unpersist()


def test_compiled_st_dwithin_rejections(spark):
    """Malformed ST_DWithin forms and ring-table usage raise DefinitionError
    at build time with actionable messages."""
    from tilekiln_spark.config.errors import DefinitionError
    from tilekiln_spark.config.sqlt import CompiledTemplate
    from tilekiln_spark.operators.tiling import pages_geo
    from tilekiln_spark.sources.pages import pages

    pts = pages_geo(pages(spark, 50))
    src = {"tables": {"pts": {"frame": pts, "kind": "point"}}}

    def build(body, sources=src):
        return CompiledTemplate(body).build(sources, [3], 4096, 0)

    with pytest.raises(DefinitionError, match="ST_DWithin takes"):
        build("""SELECT ST_AsMVTGeom(way, {{bbox}}) AS way FROM pts
WHERE way && {{bbox}} AND ST_DWithin(way, 5.0)""")
    with pytest.raises(DefinitionError, match="ST_MakePoint"):
        build("""SELECT ST_AsMVTGeom(way, {{bbox}}) AS way FROM pts
WHERE way && {{bbox}} AND ST_DWithin(way, way, 5.0)""")
    with pytest.raises(DefinitionError, match="point-geometry"):
        build(
            """SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, osm_id FROM water_polygons
WHERE way && {{bbox}} AND ST_DWithin(way, ST_MakePoint(0.0, 0.0), 5.0)""",
            _sources(spark),
        )


def test_compiled_st_xy(spark):
    """ST_X/ST_Y over a point source compile to the stored mercator columns;
    inside ST_Transform(way, 4326) they compile to the inverse-mercator
    lon/lat (exact inverse of the geocode forward transform)."""
    from tilekiln_spark.config.sqlt import CompiledTemplate
    from tilekiln_spark.operators.tiling import pages_geo
    from tilekiln_spark.sources.pages import pages

    pts = pages_geo(pages(spark, 400)).cache()
    body = """
SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, url,
       ST_X(way) AS mx_out, ST_Y(way) AS my_out,
       round(ST_X(ST_Transform(way, 4326)), 6) AS lon6,
       round(ST_Y(ST_Transform(way, 4326)), 6) AS lat6
FROM pts WHERE way && {{bbox}}
"""
    sources = {"tables": {"pts": {"frame": pts, "kind": "point"}}}
    feats = CompiledTemplate(body).build(sources, [3], 4096, 0)
    got = {r.url: r for r in feats.collect()}
    from tilekiln_spark.functions.tileids import inv_merc_x, inv_merc_y

    want = {
        r.url: r
        for r in pts.select(
            "url", "mx", "my",
            F.round(inv_merc_x("mx"), 6).alias("lon6"),
            F.round(inv_merc_y("my"), 6).alias("lat6"),
        ).collect()
    }
    assert set(got) == set(want) and got
    for u, g in got.items():
        w = want[u]
        assert g.mx_out == w.mx and g.my_out == w.my
        assert g.lon6 == w.lon6 and g.lat6 == w.lat6
    pts.unpersist()


def test_compiled_st_xy_rejections(spark):
    """Malformed ST_X/ST_Y forms and ring-table usage raise DefinitionError."""
    from tilekiln_spark.config.errors import DefinitionError
    from tilekiln_spark.config.sqlt import CompiledTemplate
    from tilekiln_spark.operators.tiling import pages_geo
    from tilekiln_spark.sources.pages import pages

    pts = pages_geo(pages(spark, 50))
    src = {"tables": {"pts": {"frame": pts, "kind": "point"}}}

    def build(body, sources=src):
        return CompiledTemplate(body).build(sources, [3], 4096, 0)

    with pytest.raises(DefinitionError, match="ST_X takes"):
        build("""SELECT ST_AsMVTGeom(way, {{bbox}}) AS way,
ST_X(way, 1) AS x FROM pts WHERE way && {{bbox}}""")
    with pytest.raises(DefinitionError, match="geometry column"):
        build("""SELECT ST_AsMVTGeom(way, {{bbox}}) AS way,
ST_Y(1.5) AS y FROM pts WHERE way && {{bbox}}""")
    with pytest.raises(DefinitionError, match="ST_X is only valid"):
        build(
            """SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, osm_id,
ST_X(way) AS x FROM water_polygons WHERE way && {{bbox}}""",
            _sources(spark),
        )


def test_compiled_st_buffer_points(spark):
    """ST_Buffer(way, r) over a point source: each point becomes a 32-gon
    polygon feature; a buffer straddling a tile boundary lands in both
    tiles; ring tables and DISTINCT are named errors."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    HW = 20037508.342789244
    pt = spark.createDataFrame(
        [(1, 5.0e6, 7.0e6, "en"), (2, -1.0e7, -5.0e6, "de")],
        "doc_id long, mx double, my double, lang string",
    )
    body = (
        "SELECT ST_AsMVTGeom(ST_Buffer(way, 1200000), {{bbox}}, {{extent}}) "
        "AS way, lang FROM pts WHERE way && {{bbox}}"
    )
    src = {"tables": {"pts": {"frame": pt, "kind": "point"}}}
    tpl = CompiledTemplate(body)
    out = tpl.build(src, [2], 4096, 0).collect()
    # point 2 sits on the x=0/x=1 tile seam at z2 (mx=-1e7, boundary at
    # -HW/2 ≈ -1.0019e7 is 1.9e4 away < r) -> two tiles; point 1 one tile
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append((r.x, r.y))
    assert len(by_lang["en"]) == 1
    assert sorted(by_lang["de"]) == [(0, 2), (1, 2)]
    for r in out:
        assert len(r.g_xs[0]) == 32 and r.g_hole == [False]

    from tilekiln_spark.operators.mvt import GEOM_POLYGON

    assert tpl.geom_type(src, [2], 4096, 0) == GEOM_POLYGON

    ring_tbl = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0, 1.0, [0.0, 1.0, 1.0], [0.0, 0.0, 1.0], "a")],
        "polygon_id long, xmin double, ymin double, xmax double, ymax double, "
        "ring_xs array<double>, ring_ys array<double>, tag string",
    )
    with pytest.raises(DefinitionError, match="point sources"):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_Buffer(way, 10), {{bbox}}) AS way, tag FROM p "
            "WHERE way && {{bbox}}"
        ).build({"tables": {"p": {"frame": ring_tbl, "kind": "polygon"}}}, [1], 4096, 0)
    with pytest.raises(DefinitionError):
        CompiledTemplate(
            "SELECT DISTINCT ST_AsMVTGeom(ST_Buffer(way, 10), {{bbox}}) AS way, "
            "lang FROM pts WHERE way && {{bbox}}"
        ).build(src, [2], 4096, 0)


def test_affine_tier_point_and_ring(spark):
    """Affine chains compile to ONE composed pre-explode matrix: point
    coordinates match the hand-applied innermost-first composition; ring
    tables transform vertices AND recompute the bbox (a rotated ring must
    land in the tiles of its rotated envelope, not the stored one)."""
    import math

    from tilekiln_spark.config.sqlt import CompiledTemplate

    pts = spark.createDataFrame(
        [(1.0e6, 2.0e6, "a"), (-3.0e6, 5.0e5, "b")],
        "mx double, my double, lang string",
    )
    body = (
        "SELECT ST_AsMVTGeom(ST_Translate(ST_Rotate(way, 0.5), 1000000, "
        "-500000), {{bbox}}, {{extent}}) AS way, lang FROM pts "
        "WHERE way && {{bbox}}"
    )
    got = {
        r.lang: (r.mx, r.my)
        for r in CompiledTemplate(body)
        .build({"tables": {"pts": {"frame": pts, "kind": "point"}}}, [2], 4096, 0)
        .collect()
    }
    c, s = math.cos(0.5), math.sin(0.5)
    for mx, my, lang in [(1.0e6, 2.0e6, "a"), (-3.0e6, 5.0e5, "b")]:
        # compiler composes Translate o Rotate into one matrix; the two-step
        # hand application agrees exactly here because the translate step
        # adds whole constants to each composed term
        assert got[lang] == (c * mx - s * my + 1.0e6, s * mx + c * my - 5.0e5)

    # ring: rotate a thin bar by 90 degrees; its stored bbox is wide/flat,
    # the rotated one tall/narrow -> tile rows must follow the NEW envelope
    ring = spark.createDataFrame(
        [(
            1, 2.0e6, -1.0e5, 1.8e7, 1.0e5,
            [2.0e6, 1.8e7, 1.8e7, 2.0e6],
            [-1.0e5, -1.0e5, 1.0e5, 1.0e5],
        )],
        "polygon_id long, xmin double, ymin double, xmax double, ymax double, "
        "ring_xs array<double>, ring_ys array<double>",
    )
    rot = (
        "SELECT ST_AsMVTGeom(ST_Rotate(way, 1.5707963267948966), {{bbox}}, "
        "{{extent}}) AS way FROM rings WHERE way && {{bbox}}"
    )
    tiles = {
        (r.x, r.y)
        for r in CompiledTemplate(rot)
        .build({"tables": {"rings": {"frame": ring, "kind": "polygon"}}}, [3], 4096, 0)
        .select("x", "y")
        .collect()
    }
    # rotated bar spans x ~ [-1e5, 1e5] (one x column at z3), y ~ [2e6, 1.8e7]
    assert len({x for x, _ in tiles}) <= 2
    assert len({y for _, y in tiles}) >= 3

    with pytest.raises(DefinitionError, match="numeric literal"):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_Translate(way, mx, 0), {{bbox}}) AS way "
            "FROM pts WHERE way && {{bbox}}"
        ).build({"tables": {"pts": {"frame": pts, "kind": "point"}}}, [2], 4096, 0)
    with pytest.raises(DefinitionError, match="directly to the geometry"):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_Rotate(ST_PointOnSurface(way), 0.5), "
            "{{bbox}}) AS way FROM pts WHERE way && {{bbox}}"
        ).build({"tables": {"pts": {"frame": pts, "kind": "point"}}}, [2], 4096, 0)


def test_snap_and_st_affine_tier(spark):
    """ST_SnapToGrid and ST_Affine (PostGIS 2D form) compile in the
    geometry-op chain: snap rounds to grid nodes AFTER an inner affine
    (chain order matters and is preserved); consecutive affines still
    compose into one matrix; sizes must be positive literals."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    pts = spark.createDataFrame(
        [(1.1e6, 2.6e6, "a"), (-3.4e6, 5.0e5, "b")],
        "mx double, my double, lang string",
    )
    src = {"tables": {"pts": {"frame": pts, "kind": "point"}}}

    # plain snap: nearest 1e6-node
    got = {
        r.lang: (r.mx, r.my)
        for r in CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_SnapToGrid(way, 1000000), {{bbox}}, "
            "{{extent}}) AS way, lang FROM pts WHERE way && {{bbox}}"
        ).build(src, [2], 4096, 0).collect()
    }
    assert got["a"] == (1.0e6, 3.0e6)
    assert got["b"] == (-3.0e6, 1.0e6)  # floor(0.5/1 + 0.5) = 1 (half up)

    # chain order: ST_SnapToGrid(ST_Affine(way, 2,0,0,2, 100000, 0), 1e6)
    # doubles first, then snaps — NOT the other way around
    got = {
        r.lang: (r.mx, r.my)
        for r in CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_SnapToGrid(ST_Affine(way, 2, 0, 0, 2, "
            "100000, 0), 1000000), {{bbox}}, {{extent}}) AS way, lang "
            "FROM pts WHERE way && {{bbox}}"
        ).build(src, [2], 4096, 0).collect()
    }
    # a: (1.1e6*2 + 1e5, 2.6e6*2) = (2.3e6, 5.2e6) -> (2e6, 5e6)
    assert got["a"] == (2.0e6, 5.0e6)
    # b: (-3.4e6*2 + 1e5, 5e5*2) = (-6.7e6, 1.0e6) -> snap x: floor(-6.7+0.5)
    # = floor(-6.2) = -7
    assert got["b"] == (-7.0e6, 1.0e6)

    # anisotropic 2-size form
    got = {
        r.lang: (r.mx, r.my)
        for r in CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_SnapToGrid(way, 1000000, 500000), "
            "{{bbox}}, {{extent}}) AS way, lang FROM pts WHERE way && {{bbox}}"
        ).build(src, [2], 4096, 0).collect()
    }
    assert got["a"] == (1.0e6, 2.5e6)

    with pytest.raises(DefinitionError, match="must be positive"):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_SnapToGrid(way, 0), {{bbox}}) AS way "
            "FROM pts WHERE way && {{bbox}}"
        ).build(src, [2], 4096, 0)
    with pytest.raises(DefinitionError, match="numeric literal"):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(ST_Affine(way, 1, 0, 0, 1, mx, 0), "
            "{{bbox}}) AS way FROM pts WHERE way && {{bbox}}"
        ).build(src, [2], 4096, 0)


def test_geom_ops_reject_outside_geometry_reads(spark):
    """A geometry-op chain rewrites the source mx/my, so any compiled
    construct reading geometry OUTSIDE the ST_AsMVTGeom item (ST_X
    property, ST_DWithin predicate, ...) must be rejected by name —
    PostGIS reads the ORIGINAL geometry there, and compiling it would
    silently return transformed coordinates."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    pts = spark.createDataFrame(
        [(1.0e6, 2.0e6, "a")], "mx double, my double, lang string"
    )
    src = {"tables": {"pts": {"frame": pts, "kind": "point"}}}
    for body in (
        "SELECT ST_AsMVTGeom(ST_Translate(way, 1000, 0), {{bbox}}) AS way, "
        "ST_X(way) AS lon FROM pts WHERE way && {{bbox}}",
        "SELECT ST_AsMVTGeom(ST_SnapToGrid(way, 1000), {{bbox}}) AS way "
        "FROM pts WHERE way && {{bbox}} "
        "AND ST_DWithin(way, ST_MakePoint(0, 0), 1000000)",
    ):
        with pytest.raises(DefinitionError, match="transform only the"):
            CompiledTemplate(body).build(src, [2], 4096, 0)

    # untransformed queries with the same constructs still compile
    ok = CompiledTemplate(
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, ST_X(way) AS lon "
        "FROM pts WHERE way && {{bbox}}"
    ).build(src, [2], 4096, 0)
    assert ok.select("lon").collect()[0][0] == 1.0e6


def test_recursive_cte_bounded_unroll(spark):
    """r5 tier: WITH RECURSIVE t AS (base UNION ALL step) compiles by
    bounded unroll — UNION ALL path-multiplicity semantics match true
    recursion for recursions that terminate within the depth cap."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    rows = [(i, float(i), float(i)) for i in range(1, 20)]
    tbl = spark.createDataFrame(rows, "pid long, mx double, my double")
    src = {"tables": {"t": {"frame": tbl, "kind": "point"}}}
    body = (
        "WITH RECURSIVE walk AS ("
        "  SELECT way, pid, pid * 2 AS nxt FROM t WHERE pid < 3"
        "  UNION ALL"
        "  SELECT d.way, d.pid, d.pid * 2 AS nxt"
        "  FROM t d JOIN walk w ON d.pid = w.nxt"
        ") "
        "SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, pid "
        "FROM walk WHERE way && {{bbox}}"
    )
    feats = CompiledTemplate(body).build(src, [2], 4096, 0)
    counts = {
        r["pid"]: r["n"]
        for r in feats.groupBy("pid").agg(F.count("*").alias("n")).collect()
    }
    # seeds 1,2; chains 1->2->4->8->16 and 2->4->8->16:
    # path multiplicities: 1:1, 2:2 (seed + from 1), 4:2, 8:2, 16:2
    assert counts == {1: 1, 2: 2, 4: 2, 8: 2, 16: 2}


def test_union_dissolve_tier(spark):
    """r5 tier: ST_AsMVTGeom(ST_Union(ST_SnapToGrid(way, g)), ...)
    GROUP BY keys -> one feature per DISTINCT snapped point per group,
    each carrying the group's aggregates."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    rows = [
        # lang a: three points, two share a snap cell (g=1000)
        (1.0e6 + 10, 1.0e6 + 10, "a"),
        (1.0e6 + 20, 1.0e6 + 20, "a"),
        (2.0e6, 2.0e6, "a"),
        # lang b: one point
        (3.0e6, 3.0e6, "b"),
    ]
    tbl = spark.createDataFrame(rows, "mx double, my double, lang string")
    src = {"tables": {"t": {"frame": tbl, "kind": "point"}}}
    body = (
        "SELECT ST_AsMVTGeom(ST_Union(ST_SnapToGrid(way, 1000)), {{bbox}}, "
        "{{extent}}) AS way, lang, count(*) AS n FROM t "
        "WHERE way && {{bbox}} GROUP BY lang"
    )
    feats = CompiledTemplate(body).build(src, [0], 4096, 0)
    got = {
        (r["lang"], r["mx"], r["my"], r["n"]) for r in feats.collect()
    }
    assert got == {
        ("a", 1.0e6, 1.0e6, 3),
        ("a", 2.0e6, 2.0e6, 3),
        ("b", 3.0e6, 3.0e6, 1),
    }


def test_not_in_subquery_null_faithful(spark):
    """r5: NOT IN (SELECT ...) compiles to a null-faithful anti join —
    exact SQL three-valued semantics: a NULL in the subquery empties the
    result; NULL probe values are excluded; otherwise a left-anti."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    pts = spark.createDataFrame(
        [(1.0, 1.0, "en"), (2.0, 2.0, "de"), (3.0, 3.0, None)],
        "mx double, my double, lang string",
    )
    dim_clean = spark.createDataFrame([("de",), ("fr",)], "dlang string")
    dim_null = spark.createDataFrame(
        [("de",), (None,)], "dlang string"
    )
    body = (
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, lang FROM pts "
        "WHERE way && {{bbox}} AND lang NOT IN (SELECT dlang FROM dim)"
    )
    out = CompiledTemplate(body).build(
        {"tables": {"pts": {"frame": pts, "kind": "point"},
                    "dim": {"frame": dim_clean, "kind": "point"}}},
        [2], 4096, 0,
    )
    # 'en' survives; 'de' is in the set; the NULL-lang row is UNKNOWN
    assert [r["lang"] for r in out.collect()] == ["en"]
    out2 = CompiledTemplate(body).build(
        {"tables": {"pts": {"frame": pts, "kind": "point"},
                    "dim": {"frame": dim_null, "kind": "point"}}},
        [2], 4096, 0,
    )
    assert out2.count() == 0  # NULL in the subquery: never TRUE


def test_non_literal_like_and_in_list(spark):
    """r5: LIKE with a column/expression pattern and IN lists with
    non-literal members compile (previously named errors)."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    rows = [
        (1.0, 1.0, "en-GB", "en%", "en-GB", "de"),
        (2.0, 2.0, "fr-FR", "en%", "it", "pt"),
        (3.0, 3.0, "de-DE", "%-DE", "xx", "de-DE"),
    ]
    tbl = spark.createDataFrame(
        rows, "mx double, my double, lang string, pat string, "
              "alt1 string, alt2 string"
    )
    src = {"tables": {"t": {"frame": tbl, "kind": "point"}}}
    out = CompiledTemplate(
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, lang FROM t "
        "WHERE way && {{bbox}} AND lang LIKE pat"
    ).build(src, [2], 4096, 0)
    assert sorted(r["lang"] for r in out.collect()) == ["de-DE", "en-GB"]
    out2 = CompiledTemplate(
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, lang FROM t "
        "WHERE way && {{bbox}} AND lang IN (alt1, alt2, 'fr-FR')"
    ).build(src, [2], 4096, 0)
    assert sorted(r["lang"] for r in out2.collect()) == ["de-DE", "en-GB", "fr-FR"]


def test_r5_function_whitelist(spark):
    """r5 whitelist widening: numeric/string scalars with exact
    Postgres->Spark semantics (log is base-10; mod keeps the dividend
    sign; regexp_replace requires the 'g' flag)."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    tbl = spark.createDataFrame(
        [(1.0, 1.0, "abc def", -7, 16.0)],
        "mx double, my double, s string, i long, v double",
    )
    src = {"tables": {"t": {"frame": tbl, "kind": "point"}}}
    out = CompiledTemplate(
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, "
        "sqrt(v) AS sq, power(2, 5) AS pw, log(100.0) AS lg, ln(v) AS lnv, "
        "sign(i) AS sg, mod(i, 3) AS md, strpos(s, 'def') AS sp, "
        "initcap(s) AS ic, translate(s, 'abc', 'xyz') AS tr, "
        "regexp_replace(s, '[aeiou]', '_', 'g') AS rr "
        "FROM t WHERE way && {{bbox}}"
    ).build(src, [2], 4096, 0)
    r = out.collect()[0]
    assert r["sq"] == 4.0 and r["pw"] == 32.0 and r["lg"] == 2.0
    assert abs(r["lnv"] - 2.772588722239781) < 1e-12
    assert r["sg"] == -1.0 and r["md"] == -1
    assert r["sp"] == 5 and r["ic"] == "Abc Def"
    assert r["tr"] == "xyz def" and r["rr"] == "_bc d_f"

    import pytest as _pytest

    from tilekiln_spark.config.errors import DefinitionError

    with _pytest.raises(DefinitionError, match="'g' flag"):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, "
            "regexp_replace(s, 'a', 'b') AS rr FROM t WHERE way && {{bbox}}"
        ).build(src, [2], 4096, 0)


def test_not_in_empty_subquery_keeps_all_rows(spark):
    """r5 review: x NOT IN (empty set) is TRUE for every x — including
    NULL probes, which the IS NOT NULL filter must not drop."""
    from tilekiln_spark.config.sqlt import CompiledTemplate

    pts = spark.createDataFrame(
        [(1.0, 1.0, "en"), (2.0, 2.0, None)],
        "mx double, my double, lang string",
    )
    dim = spark.createDataFrame([("zz",)], "dlang string").filter("1 = 0")
    out = CompiledTemplate(
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, lang FROM pts "
        "WHERE way && {{bbox}} AND lang NOT IN (SELECT dlang FROM dim)"
    ).build(
        {"tables": {"pts": {"frame": pts, "kind": "point"},
                    "dim": {"frame": dim, "kind": "point"}}},
        [2], 4096, 0,
    )
    assert sorted(r["lang"] or "" for r in out.collect()) == ["", "en"]


def test_lpad_two_arg_and_regexp_replace_backref_rejection(spark):
    from tilekiln_spark.config.sqlt import CompiledTemplate
    from tilekiln_spark.config.errors import DefinitionError

    tbl = spark.createDataFrame([(1.0, 1.0, "ab")], "mx double, my double, s string")
    src = {"tables": {"t": {"frame": tbl, "kind": "point"}}}
    out = CompiledTemplate(
        "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, lpad(s, 4) AS p "
        "FROM t WHERE way && {{bbox}}"
    ).build(src, [2], 4096, 0)
    assert out.collect()[0]["p"] == "  ab"
    with pytest.raises(DefinitionError, match="backreferences"):
        CompiledTemplate(
            "SELECT ST_AsMVTGeom(way, {{bbox}}) AS way, "
            "regexp_replace(s, '(a)', '\\\\1x', 'g') AS r "
            "FROM t WHERE way && {{bbox}}"
        ).build(src, [2], 4096, 0)


def test_union_dissolve_snapped_tile_membership(spark):
    """r5 review: a point whose snap crosses a tile edge dissolves into
    the neighbour tile's cell — one consistent feature, no duplicate in
    the origin tile, counts conserved."""
    from pyspark.sql import functions as F

    from tilekiln_spark.config.sqlt import CompiledTemplate
    from tilekiln_spark.tiles.core import HALF_WORLD

    # z1 tile edge at mx = 0; g = 1000: a point at mx = -200 snaps to 0
    # (the eastern tile), plus one interior point per side
    rows = [
        (-200.0, 100.0, "a"),      # snaps to (0, 0) -> east tile
        (-5.0e6, 100.0, "a"),      # stays west
        (5.0e6, 100.0, "a"),       # stays east
    ]
    tbl = spark.createDataFrame(rows, "mx double, my double, lang string")
    src = {"tables": {"t": {"frame": tbl, "kind": "point"}}}
    feats = CompiledTemplate(
        "SELECT ST_AsMVTGeom(ST_Union(ST_SnapToGrid(way, 1000)), {{bbox}}, "
        "{{extent}}) AS way, lang, count(*) AS n FROM t "
        "WHERE way && {{bbox}} GROUP BY lang"
    ).build(src, [1], 4096, 0)
    rows = feats.select("mx", "my", "n").collect()
    got = sorted((r["mx"], r["n"]) for r in rows)
    # three distinct snapped parts; group counts split by SNAPPED tile:
    # west tile holds 1 point, east tile 2 (the edge point migrated)
    assert got == [(-5.0e6, 1), (0.0, 2), (5.0e6, 2)]
    assert sum(n for _, n in {(mx, n) for mx, n in got}) == 5  # per-part dup of group counts


def test_recursive_cte_truncation_boundary(spark):
    """r6 ADVICE pin: a recursion that does NOT terminate within
    RECURSIVE_UNROLL_DEPTH is silently truncated at the cap - the
    documented boundary of the bounded-unroll tier (no named error
    exists; the compiler cannot check runtime convergence statically).
    This test makes the truncation loud in the suite: a chain needing 20
    steps yields exactly DEPTH+1 levels of rows (seed + 16 steps), not
    the true fixpoint."""
    from tilekiln_spark.config.sqlt import CompiledTemplate, _Parser

    depth = _Parser.RECURSIVE_UNROLL_DEPTH
    rows = [(i, float(i), float(i)) for i in range(1, 41)]
    tbl = spark.createDataFrame(rows, "pid long, mx double, my double")
    src = {"tables": {"t": {"frame": tbl, "kind": "point"}}}
    body = (
        "WITH RECURSIVE walk AS ("
        "  SELECT way, pid, pid + 1 AS nxt FROM t WHERE pid = 1"
        "  UNION ALL"
        "  SELECT d.way, d.pid, d.pid + 1 AS nxt"
        "  FROM t d JOIN walk w ON d.pid = w.nxt"
        ") "
        "SELECT ST_AsMVTGeom(way, {{bbox}}, {{extent}}) AS way, pid "
        "FROM walk WHERE way && {{bbox}}"
    )
    feats = CompiledTemplate(body).build(src, [2], 4096, 0)
    got = sorted(r["pid"] for r in feats.select("pid").collect())
    # the true fixpoint walks 1..40; the unroll stops at the cap: levels
    # 0..depth-1 exist (seed + depth-1 steps), so pids 1..depth only -
    # rows past level depth-1 are silently absent by design
    assert got == list(range(1, depth + 1))
