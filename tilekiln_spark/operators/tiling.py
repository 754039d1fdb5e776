"""Per-zoom tile generation: layer builders + the distributed render plan.

Where the reference renders one (layer, tile) at a time — Jinja template ->
PostGIS SQL -> ST_AsMVT (reference tilekiln/kiln.py:19-43, definition.py:57-77)
— this engine builds ONE logical plan per (layer, zoom) covering every tile at
that zoom: the per-tile bbox predicate becomes tile *assignment* (floor-divide
column math), and Catalyst plans the whole zoom as scan -> join -> shuffle on
(zoom, x, y) -> MVT aggregate.  A tile worklist (reference stdin source A2/A3)
becomes a semi-join after assignment.

The builder registry maps the reference's sample templates
(reference sample/{water,admin,ne-admin,country}.sql.jinja2) to DataFrame
builders with the same relational semantics over our page-point feature
source:

- water     — UNION ALL of an "ocean" source and an "osm-water" source with
              NULL-padded columns (B5/B7), way_area threshold at z<=12 (B9)
- admin     — zoom-dependent source swap z<=10 (B8), admin_level IN-lists
              varying by zoom (B6), cast to int (B7)
- ne_admin  — literal column admin_level=2 (B7)
- country   — name IS NOT NULL + area generalization (B6/B9), per-(polygon,
              tile) label point = centroid of the joined feature cluster
              (B10 — documented deviation: centroid, not ST_PointOnSurface,
              since our features are points, not polygon interiors)

Each builder: (sources, params) -> DataFrame[mx, my, <property columns...>]
where params is Definition.render_params(tile-of-that-zoom) minus x/y.
"""

from __future__ import annotations

from typing import Callable

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tilekiln_spark.config.model import Config
from tilekiln_spark.functions.tileids import tile_length_col, tile_x, tile_y
from tilekiln_spark.operators.mvt import empty_layer, mvt_geom_cols, mvt_layer_agg
from tilekiln_spark.operators.spatial_join import points_in_polygons
from tilekiln_spark.tiles.core import HALF_WORLD, tile_area, coordinate_area

BuilderFn = Callable[[dict, dict], DataFrame]

BUILDERS: dict[str, BuilderFn] = {}


def builder(name: str):
    def deco(fn: BuilderFn) -> BuilderFn:
        BUILDERS[name] = fn
        return fn

    return deco


def _polys(sources: dict, layer: str) -> DataFrame:
    return sources["layer_polygons"].filter(F.col("layer") == layer)


@builder("water")
def water_builder(sources: dict, params: dict) -> DataFrame:
    """reference sample/water.sql.jinja2: ocean UNION ALL osm-water with
    zoom-gated way_area threshold (400 * coordinate_area)."""
    zoom = params["zoom"]
    pts = sources["pages_geo"]
    polys = _polys(sources, "water")
    # stand-ins for the template's two tables: even ids = "simplified_water
    # _polygons" (ocean), odd = "planet_osm_polygon" water rows
    ocean = polys.filter(F.col("polygon_id") % 2 == 0)
    osm = polys.filter(F.col("polygon_id") % 2 == 1)
    if zoom <= 12:
        osm = osm.filter(F.col("way_area") > 400 * params["coordinate_area"])
    a = points_in_polygons(pts, ocean).select(
        "mx", "my", F.lit(None).cast("long").alias("osm_id"), F.lit("ocean").alias("water")
    )
    b = points_in_polygons(pts, osm).select(
        "mx", "my", F.col("polygon_id").alias("osm_id"), F.col("name").alias("water")
    )
    return a.unionByName(b)


@builder("admin")
def admin_builder(sources: dict, params: dict) -> DataFrame:
    """reference sample/admin.sql.jinja2: source swap at z<=10, IN-lists by zoom."""
    zoom = params["zoom"]
    pts = sources["pages_geo"]
    polys = _polys(sources, "admin")
    # z<=10 reads the generalized "roads" subset, deeper zooms the full set
    src = polys.filter(F.col("polygon_id") % 3 == 0) if zoom <= 10 else polys
    if zoom <= 2:
        src = src.filter(F.col("admin_level").isin("0", "1", "2"))
    elif zoom <= 10:
        src = src.filter(F.col("admin_level").isin("0", "1", "2", "3", "4"))
    elif zoom <= 12:
        src = src.filter(F.col("admin_level").isin("0", "1", "2", "3", "4", "5", "6"))
    return points_in_polygons(pts, src).select(
        "mx", "my", F.col("admin_level").cast("int").alias("admin_level")
    )


@builder("ne_admin")
def ne_admin_builder(sources: dict, params: dict) -> DataFrame:
    """reference sample/ne-admin.sql.jinja2: literal admin_level=2."""
    pts = sources["pages_geo"]
    src = _polys(sources, "admin").filter(F.col("admin_level") == "2")
    return points_in_polygons(pts, src).select(
        "mx", "my", F.lit(2).alias("admin_level")
    )


@builder("country")
def country_builder(sources: dict, params: dict) -> DataFrame:
    """reference sample/country.sql.jinja2: label points.  One feature per
    (polygon, tile): the centroid of the page cluster inside the polygon &
    tile (B10 centroid deviation), name IS NOT NULL, area generalization."""
    zoom = params["zoom"]
    pts = sources["pages_geo"]
    polys = _polys(sources, "country_names").filter(F.col("name").isNotNull())
    if zoom <= 12:
        polys = polys.filter(F.col("way_area") > params["tile_area"] * 0.05**2)
    joined = points_in_polygons(pts, polys)
    z = F.lit(zoom)
    return (
        joined.withColumn("x", tile_x(z, F.col("mx")))
        .withColumn("y", tile_y(z, F.col("my")))
        .groupBy("x", "y", "polygon_id", "name", "way_area")
        .agg(F.avg("mx").alias("mx"), F.avg("my").alias("my"))
        .select("mx", "my", "name", F.col("way_area").alias("area"))
    )


# --------------------------------------------------------------------------
# Per-zoom render plan
# --------------------------------------------------------------------------


def assign_tiles(
    feats: DataFrame, zoom: int, extent: int, buffer: int, mx: str = "mx", my: str = "my"
) -> DataFrame:
    """Add (zoom, x, y): each feature lands in its containing tile plus any
    neighbors whose buffered envelope still covers it (buffer in MVT
    coordinate units, as in the reference's margin = buffer/extent,
    reference tile.py:52-54).  buffer=0 -> exactly one tile per feature."""
    z = F.lit(zoom)
    pmx, pmy = F.col(mx), F.col(my)
    if buffer == 0:
        return feats.withColumn("zoom", z.cast("int")).withColumn(
            "x", tile_x(z, pmx)
        ).withColumn("y", tile_y(z, pmy))
    m = (buffer / extent) * (2.0 * HALF_WORLD) / (2**zoom)
    x0, x1 = tile_x(z, pmx - m), tile_x(z, pmx + m)
    y0, y1 = tile_y(z, pmy + m), tile_y(z, pmy - m)
    return (
        feats.withColumn("zoom", z.cast("int"))
        .withColumn("x", F.explode(F.sequence(x0, x1)))
        .withColumn("y", F.explode(F.sequence(y0, y1)))
    )


def render_layer_zoom(
    config: Config,
    layer: str,
    zoom: int,
    sources: dict,
    worklist: DataFrame | None = None,
    max_features_per_tile: int = 65536,
) -> DataFrame | None:
    """One (layer, zoom) -> DataFrame[zoom, x, y, data, n_features], or None
    when the layer has no definition at this zoom (the reference's None-query
    short-circuit, kiln.py:36-38)."""
    lc = config.layers[layer]
    d = lc.definition_for(zoom)
    if d is None:
        return None
    # template params; x/y folded out (they exist per-tile in the reference,
    # here the plan covers all tiles of the zoom)
    params = {
        "zoom": zoom,
        "extent": d.extent,
        "buffer": d.buffer,
        "tile_length": 2.0 * HALF_WORLD / (2**zoom),
        "tile_area": tile_area(zoom),
        "coordinate_length": (2.0 * HALF_WORLD / (2**zoom)) / d.extent,
        "coordinate_area": coordinate_area(zoom, d.extent),
    }
    feats = BUILDERS[d.builder](sources, params)
    feats = assign_tiles(feats, zoom, d.extent, d.buffer)
    if worklist is not None:
        feats = feats.join(
            F.broadcast(worklist.select("zoom", "x", "y")), ["zoom", "x", "y"], "left_semi"
        )
    px, py, in_clip = mvt_geom_cols(
        F.col("zoom"), F.col("x"), F.col("y"), F.col("mx"), F.col("my"), d.extent, d.buffer
    )
    prop_cols = [c for c in feats.columns if c not in ("mx", "my", "zoom", "x", "y")]
    feats = feats.withColumn("px", px).withColumn("py", py).filter(in_clip)
    return mvt_layer_agg(
        feats.select("zoom", "x", "y", "px", "py", *prop_cols),
        layer,
        d.extent,
        prop_cols,
        max_features_per_tile,
    )


def render_zooms(
    config: Config,
    zooms: list[int],
    sources: dict,
    worklist: DataFrame | None = None,
    layers: list[str] | None = None,
) -> DataFrame | None:
    """All layers across MANY zooms in one plan: per layer, the per-zoom
    feature branches (builders still differ by zoom — filters and thresholds
    are zoom-dependent) are unioned BEFORE the tile aggregate, so each layer
    costs ONE shuffle + ONE applyInPandas over (zoom, x, y) for the whole
    zoom range instead of one per zoom.  The reference's zoom loop
    (generate.py:132) becomes a single Catalyst plan; per-zoom work remains
    map-side branches over the (cached) feature source."""
    layer_names = layers or config.layer_names()
    rendered: dict[str, DataFrame] = {}
    blanks: dict[str, dict[int, bytes]] = {}
    for name in layer_names:
        branches = []
        zoom_blanks: dict[int, bytes] = {}
        for z in zooms:
            lc = config.layers[name]
            d = lc.definition_for(z)
            if d is None:
                continue
            branches.append(_layer_features_zoom(config, name, z, sources, worklist))
            zoom_blanks[z] = empty_layer(name, d.extent)
        if not branches:
            continue
        feats = branches[0]
        for b in branches[1:]:
            feats = feats.unionByName(b, allowMissingColumns=True)
        prop_cols = [c for c in feats.columns if c not in ("zoom", "x", "y", "px", "py")]
        rendered[name] = mvt_layer_agg_multi(feats, name, config, prop_cols)
        blanks[name] = zoom_blanks
    if not rendered:
        return None
    out: DataFrame | None = None
    for name, df in rendered.items():
        part = df.select(
            "zoom", "x", "y", F.col("data").alias(f"{name}_data"),
            F.col("n_features").alias(f"{name}_nfeat"),
        )
        out = part if out is None else out.join(part, ["zoom", "x", "y"], "full_outer")
    ts = F.current_timestamp()
    cols = [F.col("zoom"), F.col("x"), F.col("y")]
    for name in rendered:
        blank_map = F.create_map(
            *[x for z, b in blanks[name].items() for x in (F.lit(z), F.lit(b))]
        )
        defined = F.element_at(blank_map, F.col("zoom")).isNotNull()
        cols.append(F.when(defined, ts).alias(f"{name}_generated"))
        cols.append(
            F.coalesce(F.col(f"{name}_data"), F.element_at(blank_map, F.col("zoom"))).alias(f"{name}_data")
        )
        cols.append(
            F.when(defined, F.coalesce(F.col(f"{name}_nfeat"), F.lit(0))).alias(f"{name}_nfeat")
        )
    return out.select(*cols)


def _layer_features_zoom(
    config: Config, layer: str, zoom: int, sources: dict, worklist: DataFrame | None
) -> DataFrame:
    """Features of one (layer, zoom) with tile assignment + MVT coords —
    the map-side branch that render_zooms unions."""
    lc = config.layers[layer]
    d = lc.definition_for(zoom)
    params = {
        "zoom": zoom,
        "extent": d.extent,
        "buffer": d.buffer,
        "tile_length": 2.0 * HALF_WORLD / (2**zoom),
        "tile_area": tile_area(zoom),
        "coordinate_length": (2.0 * HALF_WORLD / (2**zoom)) / d.extent,
        "coordinate_area": coordinate_area(zoom, d.extent),
    }
    feats = BUILDERS[d.builder](sources, params)
    feats = assign_tiles(feats, zoom, d.extent, d.buffer)
    if worklist is not None:
        feats = feats.join(
            F.broadcast(worklist.select("zoom", "x", "y")), ["zoom", "x", "y"], "left_semi"
        )
    px, py, in_clip = mvt_geom_cols(
        F.col("zoom"), F.col("x"), F.col("y"), F.col("mx"), F.col("my"), d.extent, d.buffer
    )
    prop_cols = [c for c in feats.columns if c not in ("mx", "my", "zoom", "x", "y")]
    return (
        feats.withColumn("px", px).withColumn("py", py).filter(in_clip)
        .select("zoom", "x", "y", "px", "py", *prop_cols)
    )


def mvt_layer_agg_multi(
    feats: DataFrame, layer: str, config: Config, prop_cols: list[str],
    max_features_per_tile: int = 65536,
) -> DataFrame:
    """mvt_layer_agg across zooms with per-zoom extents (extent comes from the
    zoom's definition at encode time)."""
    import pandas as pd

    extents = {
        z: d.extent
        for z in range(0, 31)
        if (d := config.layers[layer].definition_for(z)) is not None
    }
    from tilekiln_spark.operators.mvt import encode_layer

    out_schema = "zoom int, x int, y int, data binary, n_features long"

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["px", "py"], kind="stable")
        n_total = len(pdf)
        if n_total > max_features_per_tile:
            pdf = pdf.iloc[:max_features_per_tile]
        z = int(pdf["zoom"].iloc[0])
        props = {c: pdf[c].tolist() for c in prop_cols}
        blob = encode_layer(
            layer, extents[z], pdf["px"].to_numpy(), pdf["py"].to_numpy(), props
        )
        return pd.DataFrame(
            {
                "zoom": [z], "x": [int(pdf["x"].iloc[0])], "y": [int(pdf["y"].iloc[0])],
                "data": [blob], "n_features": [n_total],
            }
        )

    return feats.groupBy("zoom", "x", "y").applyInPandas(encode, out_schema)


def render_zoom(
    config: Config,
    zoom: int,
    sources: dict,
    worklist: DataFrame | None = None,
    layers: list[str] | None = None,
) -> DataFrame | None:
    """All layers at one zoom -> tile-table rows
    [zoom, x, y, {layer}_generated, {layer}_data per defined layer].

    Layers defined at this zoom but empty for a tile that another layer
    populated get header-only MVT bytes (ST_AsMVT's >=1-row contract);
    layers not defined at this zoom are absent entirely (partial-layer write,
    reference storage.py:371-390)."""
    return render_zooms(config, [zoom], sources, worklist, layers)


def pages_geo(spark_pages: DataFrame, method: str = "expr") -> DataFrame:
    """pages -> geocoded point features (url, lang, mx, my).

    method="expr" (default): xxhash64-based expression geocode — whole-stage
    codegen, zero Python.  method="pandas": the Arrow-batched UDF geocode
    (same contract, different hash).  NB with the pandas method, persist the
    result before reusing it in several plans — Catalyst's filter pushdown
    can otherwise duplicate the ArrowEvalPython node (observed: geocode
    evaluated twice when the join-key non-null filter is pushed below the
    projection).

    Column pruning matters at 10^12 rows: html/text are dropped before any
    shuffle — only url (join key), lang, and 16 bytes of coordinates move."""
    from tilekiln_spark.functions.geocode import geocode, geocode_expr
    from tilekiln_spark.functions.tileids import merc_x, merc_y

    fn = geocode_expr if method == "expr" else geocode
    g = spark_pages.select("url", "lang", fn(F.col("url")).alias("g"))
    return g.select(
        "url",
        "lang",
        merc_x(F.col("g.lon")).alias("mx"),
        merc_y(F.col("g.lat")).alias("my"),
    )
