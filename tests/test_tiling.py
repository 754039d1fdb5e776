"""End-to-end tiling pipeline: pages -> geocode -> join -> MVT tiles."""

import pyspark.sql.functions as F
import pytest

from tilekiln_spark.config.model import Config
from tilekiln_spark.operators.mvt import decode_points, decode_tile
from tilekiln_spark.operators.tiling import assign_tiles, pages_geo, render_layer_zoom, render_zoom
from tilekiln_spark.sources.pages import layer_polygons, pages
from tilekiln_spark.tiles.core import HALF_WORLD

CFG_YAML = """
metadata: {id: v1}
vector_layers:
  water:
    fields: {water: Type of water}
    sql:
    - {minzoom: 0, maxzoom: 8, extent: 2048, file: water.b}
  admin:
    fields: {admin_level: Admin level}
    sql:
    - {minzoom: 1, maxzoom: 3, file: ne.b}
    - {minzoom: 4, maxzoom: 10, file: admin.b}
  country_names:
    fields: {name: Name, area: Area}
    sql:
    - {minzoom: 3, maxzoom: 14, file: country.b}
"""
TEMPLATES = {"water.b": "water", "ne.b": "ne_admin", "admin.b": "admin", "country.b": "country"}


@pytest.fixture(scope="module")
def cfg():
    return Config(CFG_YAML, TEMPLATES)


@pytest.fixture(scope="module")
def sources(spark):
    geo = pages_geo(pages(spark, 1500)).cache()
    geo.count()
    return {"pages_geo": geo, "layer_polygons": layer_polygons(spark, 30).cache()}


def test_assign_tiles_unbuffered(spark):
    # a point strictly inside a tile lands in exactly that tile
    df = spark.createDataFrame(
        [(HALF_WORLD * 0.51, HALF_WORLD * 0.51)], "mx double, my double"
    )
    r = assign_tiles(df, 2, 4096, 0).head()
    # mercator (0.51, 0.51)*HW is in the NE quadrant, z2 -> x=3, y=0
    assert (r.zoom, r.x, r.y) == (2, 3, 0)


def test_assign_tiles_buffered_duplicates_into_margin(spark):
    # a point just left of a tile boundary also lands in the right tile when
    # the buffer covers it (ST_AsMVTGeom margin semantics)
    eps = 100.0  # meters, well inside a 64-unit buffer at z2 (~156km/unit@4096)
    # my strictly inside row 0 (row boundary at HW/2 would legitimately pull
    # in rows 0 AND 1 under the buffer)
    df = spark.createDataFrame([(-eps, HALF_WORLD * 0.75)], "mx double, my double")
    rows = assign_tiles(df, 2, 4096, 64).orderBy("x").collect()
    assert [(r.x, r.y) for r in rows] == [(1, 0), (2, 0)]
    # unbuffered: single tile
    rows0 = assign_tiles(df, 2, 4096, 0).collect()
    assert [(r.x, r.y) for r in rows0] == [(1, 0)]


def test_render_layer_zoom_counts_match_join(cfg, sources, spark):
    # n_features per tile == direct spatial-join count per tile
    out = render_layer_zoom(cfg, "water", 6, sources).cache()
    from tilekiln_spark.operators.spatial_join import points_in_polygons
    from tilekiln_spark.functions.tileids import tile_x, tile_y

    polys = sources["layer_polygons"].filter(F.col("layer") == "water")
    # water builder at z6: osm side (odd ids) has way_area > 400*coord_area
    from tilekiln_spark.tiles.core import coordinate_area

    ca = coordinate_area(6, 2048)
    polys = polys.filter(
        (F.col("polygon_id") % 2 == 0) | (F.col("way_area") > 400 * ca)
    )
    joined = points_in_polygons(sources["pages_geo"], polys)
    z = F.lit(6)
    expected = (
        joined.withColumn("x", tile_x(z, F.col("mx")))
        .withColumn("y", tile_y(z, F.col("my")))
        .groupBy("x", "y")
        .count()
        .collect()
    )
    got = {(r.x, r.y): r.n_features for r in out.collect()}
    assert got == {(r.x, r.y): r["count"] for r in expected}
    assert sum(got.values()) > 0


def test_render_layer_zoom_none_outside_range(cfg, sources):
    # water defined z0-8 only (kiln.py None short-circuit)
    assert render_layer_zoom(cfg, "water", 9, sources) is None
    assert render_layer_zoom(cfg, "country_names", 2, sources) is None


def test_mvt_blob_decodes_with_correct_counts(cfg, sources):
    out = render_layer_zoom(cfg, "water", 4, sources)
    rows = out.orderBy(F.desc("n_features")).head(3)
    for r in rows:
        (layer,) = decode_tile(bytes(r.data))
        assert layer["name"] == "water"
        assert layer["extent"] == 2048
        assert len(layer["features"]) == r.n_features
        # coordinates within the unbuffered extent (buffer=0 in config)
        for px, py in decode_points(layer):
            assert 0 <= px <= 2048 and 0 <= py <= 2048


def test_render_zoom_storage_row_shape(cfg, sources):
    tiles = render_zoom(cfg, 6, sources).cache()
    cols = tiles.columns
    # z6: water (z0-8), admin (2nd def z4-10), country_names (z3-14) all defined
    for layer in ("water", "admin", "country_names"):
        assert f"{layer}_data" in cols and f"{layer}_generated" in cols
    # every tile row has bytes for every defined layer (empty-layer contract)
    n = tiles.count()
    assert n > 0
    for layer in ("water", "admin", "country_names"):
        assert tiles.filter(F.col(f"{layer}_data").isNull()).count() == 0
    # a tile with 0 water features decodes to a header-only water layer
    empties = tiles.filter(F.col("water_nfeat") == 0).head(1)
    if empties:
        (layer,) = decode_tile(bytes(empties[0].water_data))
        assert layer["features"] == [] and layer["name"] == "water"


def test_render_zoom_respects_worklist(cfg, sources, spark):
    full = render_zoom(cfg, 6, sources)
    some = full.select("zoom", "x", "y").limit(3)
    restricted = render_zoom(cfg, 6, sources, worklist=some)
    got = {(r.x, r.y) for r in restricted.select("x", "y").collect()}
    want = {(r.x, r.y) for r in some.collect()}
    assert got == want


def test_render_zoom_partial_layers(cfg, sources):
    # z12: only country_names defined -> only its columns present
    tiles = render_zoom(cfg, 12, sources)
    assert set(c for c in tiles.columns if c.endswith("_data")) == {"country_names_data"}


def test_cap_deterministic_and_true_counts(cfg, spark):
    # Whale-tile cap: exact cap in the blob, TRUE pre-cap n_features, and
    # byte-identical blobs regardless of input partitioning (the hash-sample
    # + hash-order truncation must not depend on shuffle arrival order).
    from tilekiln_spark.operators.tiling import mvt_layer_agg_multi

    n, cap = 5000, 200
    feats = spark.range(n).select(
        F.lit(0).alias("zoom"), F.lit(0).alias("x"), F.lit(0).alias("y"),
        (F.col("id") % 2048).alias("px"), F.floor(F.col("id") / 2048).alias("py"),
        F.concat(F.lit("w"), (F.col("id") % 50).cast("string")).alias("water"),
    )
    out1 = mvt_layer_agg_multi(feats, "water", cfg, ["water"], max_features_per_tile=cap)
    r1 = out1.collect()[0]
    (layer,) = decode_tile(bytes(r1.data))
    assert len(layer["features"]) == cap
    assert r1.n_features == n  # TRUE pre-cap count
    # same bytes under different partitioning of the same input
    out2 = mvt_layer_agg_multi(
        feats.repartition(13), "water", cfg, ["water"], max_features_per_tile=cap
    )
    r2 = out2.collect()[0]
    assert bytes(r2.data) == bytes(r1.data)
    assert r2.n_features == n
    # blob order is (px, py, hash): decoded points non-decreasing in (px, py)
    pts = decode_points(layer)
    assert pts == sorted(pts)


GEOM_CFG_YAML = """
metadata: {id: vgeo}
vector_layers:
  waterpoly:
    fields: {water: Type of water}
    sql:
    - {minzoom: 0, maxzoom: 8, extent: 2048, buffer: 8, file: wp.b}
  adminline:
    fields: {admin_level: Admin level}
    sql:
    - {minzoom: 0, maxzoom: 8, extent: 4096, buffer: 8, file: al.b}
"""
GEOM_TEMPLATES = {"wp.b": "water_poly", "al.b": "admin_line"}


def test_geometry_layers_roundtrip(sources, spark):
    from tilekiln_spark.operators.mvt import decode_geom
    cfg = Config(GEOM_CFG_YAML, GEOM_TEMPLATES)
    tiles = render_zoom(cfg, 3, sources).cache()
    rows = tiles.collect()
    assert len(rows) > 0
    n_poly_feats = n_line_feats = 0
    for r in rows:
        (wl,) = decode_tile(bytes(r.waterpoly_data))
        assert wl["name"] == "waterpoly" and wl["extent"] == 2048
        assert len(wl["features"]) == r.waterpoly_nfeat
        for f in wl["features"]:
            assert f["type"] == 3  # POLYGON
            parts = decode_geom(f)
            assert len(parts) == 1
            ring = parts[0]
            assert ring[0] == ring[-1]  # closed
            assert len(ring) >= 4
            # exterior ring: positive surveyor area in tile coords
            area2 = sum(
                ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
                for i in range(len(ring) - 1)
            )
            assert area2 > 0
            for px, py in ring:
                assert -8 <= px <= 2048 + 8 and -8 <= py <= 2048 + 8
            n_poly_feats += 1
        (al,) = decode_tile(bytes(r.adminline_data))
        assert al["name"] == "adminline" and al["extent"] == 4096
        assert len(al["features"]) == r.adminline_nfeat
        for f in al["features"]:
            assert f["type"] == 2  # LINESTRING
            for part in decode_geom(f):
                assert len(part) >= 2
                for px, py in part:
                    assert -8 <= px <= 4096 + 8 and -8 <= py <= 4096 + 8
            n_line_feats += 1
    assert n_poly_feats > 0 and n_line_feats > 0
    tiles.unpersist()
