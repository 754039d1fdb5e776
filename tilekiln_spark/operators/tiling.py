"""Per-zoom tile generation: layer builders + the distributed render plan.

Where the reference renders one (layer, tile) at a time — Jinja template ->
PostGIS SQL -> ST_AsMVT (reference tilekiln/kiln.py:19-43, definition.py:57-77)
— this engine treats **zoom as data**: per layer the (zoom-independent)
spatial join runs ONCE, matched rows explode across the requested zooms, and
the zoom-dependent template parameters (tile_area, coordinate_area thresholds,
admin_level IN-lists — reference sample/*.sql.jinja2) become column predicates
on the zoom column.  Catalyst then plans one scan -> one broadcast join -> one
shuffle on (zoom, x, y) -> one MVT aggregate per layer for the WHOLE zoom
range.  The reference's zoom-dependent *source* swap (B8, admin.sql.jinja2:3-7)
stays plan-level: disjoint zoom subsets get their own join branch.

Builder registry maps the reference's sample templates to these plans:

- water     — UNION ALL of an "ocean" source and an "osm-water" source with
              NULL-padded columns (B5/B7), way_area > 400*coordinate_area at
              z<=12 (B9) as a zoom-column predicate
- admin     — zoom-dependent source swap z<=10 (B8), admin_level IN-lists
              varying by zoom (B6), cast to int (B7)
- ne_admin  — literal column admin_level=2 (B7)
- country   — name IS NOT NULL + tile_area*0.05^2 generalization (B6/B9),
              label point per (polygon, tile) = centroid of the joined page
              cluster (B10 — documented deviation: centroid, not
              ST_PointOnSurface, since our features are points)

Each builder: (sources, zooms, extent, buffer) ->
DataFrame[zoom, mx, my, <property columns...>].
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tilekiln_spark.config.model import Config
from tilekiln_spark.functions.tileids import tile_x, tile_y
from tilekiln_spark.operators.mvt import empty_layer, encode_layer_fast, mvt_geom_cols
from tilekiln_spark.operators.spatial_join import points_in_polygons
from tilekiln_spark.tiles.core import HALF_WORLD

BuilderFn = Callable[[dict, list, int, int], DataFrame]

BUILDERS: dict[str, BuilderFn] = {}


def builder(name: str):
    def deco(fn: BuilderFn) -> BuilderFn:
        BUILDERS[name] = fn
        return fn

    return deco


# -- zoom-column template parameters (reference definition.py:57-69) ---------

def tile_length_col(zoom: Column) -> Column:
    return F.lit(2.0 * HALF_WORLD) / F.pow(F.lit(2.0), zoom)


def tile_area_col(zoom: Column) -> Column:
    return tile_length_col(zoom) ** 2


def coordinate_area_col(zoom: Column, extent: int) -> Column:
    return (tile_length_col(zoom) / extent) ** 2


def _explode_zooms(df: DataFrame, zooms: list[int]) -> DataFrame:
    return df.withColumn(
        "zoom", F.explode(F.array(*[F.lit(z).cast("int") for z in zooms]))
    )


def _polys(sources: dict, layer: str) -> DataFrame:
    return sources["layer_polygons"].filter(F.col("layer") == layer)


@builder("water")
def water_builder(sources: dict, zooms: list[int], extent: int, buffer: int) -> DataFrame:
    """reference sample/water.sql.jinja2."""
    pts = sources["pages_geo"]
    polys = _polys(sources, "water")
    # stand-ins for the template's two tables: even ids = "simplified_water
    # _polygons" (ocean), odd = "planet_osm_polygon" water rows
    ocean = (
        _explode_zooms(points_in_polygons(pts, polys.filter(F.col("polygon_id") % 2 == 0)), zooms)
        .select(
            "zoom", "mx", "my",
            F.lit(None).cast("long").alias("osm_id"), F.lit("ocean").alias("water"),
        )
    )
    z = F.col("zoom")
    osm = (
        _explode_zooms(points_in_polygons(pts, polys.filter(F.col("polygon_id") % 2 == 1)), zooms)
        .filter((z > 12) | (F.col("way_area") > 400 * coordinate_area_col(z, extent)))
        .select(
            "zoom", "mx", "my",
            F.col("polygon_id").alias("osm_id"), F.col("name").alias("water"),
        )
    )
    return ocean.unionByName(osm)


@builder("admin")
def admin_builder(sources: dict, zooms: list[int], extent: int, buffer: int) -> DataFrame:
    """reference sample/admin.sql.jinja2: source swap at z<=10 (plan-level,
    disjoint zoom subsets), IN-lists by zoom (row-level predicates)."""
    pts = sources["pages_geo"]
    polys = _polys(sources, "admin")
    zlow = [z for z in zooms if z <= 10]
    zhigh = [z for z in zooms if z > 10]
    parts = []
    if zlow:
        src = polys.filter(F.col("polygon_id") % 3 == 0)  # "roads" generalized set
        parts.append(_explode_zooms(points_in_polygons(pts, src), zlow))
    if zhigh:
        parts.append(_explode_zooms(points_in_polygons(pts, polys), zhigh))
    joined = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    z = F.col("zoom")
    lvl = F.col("admin_level")
    in_list = (
        F.when(z <= 2, lvl.isin("0", "1", "2"))
        .when(z <= 10, lvl.isin("0", "1", "2", "3", "4"))
        .when(z <= 12, lvl.isin("0", "1", "2", "3", "4", "5", "6"))
        .otherwise(F.lit(True))
    )
    return joined.filter(in_list).select(
        "zoom", "mx", "my", lvl.cast("int").alias("admin_level")
    )


@builder("ne_admin")
def ne_admin_builder(sources: dict, zooms: list[int], extent: int, buffer: int) -> DataFrame:
    """reference sample/ne-admin.sql.jinja2: literal admin_level=2."""
    pts = sources["pages_geo"]
    src = _polys(sources, "admin").filter(F.col("admin_level") == "2")
    return _explode_zooms(points_in_polygons(pts, src), zooms).select(
        "zoom", "mx", "my", F.lit(2).alias("admin_level")
    )


@builder("country")
def country_builder(sources: dict, zooms: list[int], extent: int, buffer: int) -> DataFrame:
    """reference sample/country.sql.jinja2: one label point per (polygon,
    tile) — centroid of the page cluster inside polygon & tile."""
    pts = sources["pages_geo"]
    polys = _polys(sources, "country_names").filter(F.col("name").isNotNull())
    z = F.col("zoom")
    joined = (
        _explode_zooms(points_in_polygons(pts, polys), zooms)
        .filter((z > 12) | (F.col("way_area") > tile_area_col(z) * 0.05**2))
    )
    return (
        joined.withColumn("x", tile_x(z, F.col("mx")))
        .withColumn("y", tile_y(z, F.col("my")))
        .groupBy("zoom", "x", "y", "polygon_id", "name", "way_area")
        .agg(F.avg("mx").alias("mx"), F.avg("my").alias("my"))
        .select("zoom", "mx", "my", "name", F.col("way_area").alias("area"))
    )


# --------------------------------------------------------------------------
# Tile assignment (zoom is a column)
# --------------------------------------------------------------------------


def assign_tiles_col(
    feats: DataFrame, extent: int, buffer: int, mx: str = "mx", my: str = "my"
) -> DataFrame:
    """Add (x, y) for the feature's tile at its `zoom` column; with buffer>0
    each feature lands in every tile whose buffered envelope covers it
    (margin = buffer/extent of the tile width, reference tile.py:52-54)."""
    z = F.col("zoom")
    pmx, pmy = F.col(mx), F.col(my)
    if buffer == 0:
        return feats.withColumn("x", tile_x(z, pmx)).withColumn("y", tile_y(z, pmy))
    m = (buffer / extent) * tile_length_col(z)
    x0, x1 = tile_x(z, pmx - m), tile_x(z, pmx + m)
    y0, y1 = tile_y(z, pmy + m), tile_y(z, pmy - m)
    return feats.withColumn("x", F.explode(F.sequence(x0, x1))).withColumn(
        "y", F.explode(F.sequence(y0, y1))
    )


def assign_tiles(
    feats: DataFrame, zoom: int, extent: int, buffer: int, mx: str = "mx", my: str = "my"
) -> DataFrame:
    """Single-zoom convenience wrapper over assign_tiles_col."""
    return assign_tiles_col(
        feats.withColumn("zoom", F.lit(zoom).cast("int")), extent, buffer, mx, my
    )


# --------------------------------------------------------------------------
# Render plans
# --------------------------------------------------------------------------


def _layer_band_features(
    config: Config,
    layer: str,
    zooms: list[int],
    sources: dict,
    worklist: DataFrame | None,
) -> DataFrame | None:
    """Features of one (layer, definition band) across its zooms, with tile
    assignment and MVT tile-local coordinates."""
    lc = config.layers[layer]
    d = None
    for z in zooms:
        d = lc.definition_for(z)
        break
    if d is None:
        return None
    feats = BUILDERS[d.builder](sources, zooms, d.extent, d.buffer)
    feats = assign_tiles_col(feats, d.extent, d.buffer)
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
    pre_cap_salts: int = 16,
    pre_cap_max_zoom: int = 8,
) -> DataFrame:
    """One shuffle + one applyInPandas for a layer across every zoom; the
    encode picks the zoom's extent from the config (SURVEY B4).

    Skew handling (north_rule "salted prefixes for dense regions"): tiles at
    zoom <= pre_cap_max_zoom can receive millions of features (z0 receives
    EVERY feature), which would serialize in one reducer and blow its memory.
    Those rows take a salted pre-aggregation: groupBy(zoom, x, y, salt) caps
    each salt bucket to max_features_per_tile (top-K by (px, py)), so the
    final per-tile group sees at most salts*K rows and the hot keys are
    spread over `pre_cap_salts` reducers.  Deeper zooms (plenty of groups,
    bounded fan-in) skip the extra shuffle.  Truncation is deterministic
    (stable sort by (px, py); the salt is a pure function of (px, py))."""
    import pandas as pd

    extents = {
        z: d.extent
        for z in range(0, 31)
        if (d := config.layers[layer].definition_for(z)) is not None
    }
    if pre_cap_salts and pre_cap_salts > 1:
        low = feats.filter(F.col("zoom") <= pre_cap_max_zoom)
        high = feats.filter(F.col("zoom") > pre_cap_max_zoom)
        feat_schema = low.schema
        salted = low.withColumn(
            "salt", F.pmod(F.xxhash64(F.col("px"), F.col("py")), F.lit(pre_cap_salts)).cast("int")
        )

        def cap(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.drop(columns=["salt"])
            return _truncate_by_pxy(pdf, max_features_per_tile)

        capped = salted.groupBy("zoom", "x", "y", "salt").applyInPandas(cap, feat_schema)
        feats = capped.unionByName(high)

    out_schema = "zoom int, x int, y int, data binary, n_features long"

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        n_total = len(pdf)
        pdf = _truncate_by_pxy(pdf, max_features_per_tile)
        z = int(pdf["zoom"].iloc[0])
        props = {c: pdf[c] for c in prop_cols}
        blob = encode_layer_fast(
            layer, extents[z], pdf["px"].to_numpy(), pdf["py"].to_numpy(), props
        )
        return pd.DataFrame(
            {
                "zoom": [z], "x": [int(pdf["x"].iloc[0])], "y": [int(pdf["y"].iloc[0])],
                "data": [blob], "n_features": [n_total],
            }
        )

    return feats.groupBy("zoom", "x", "y").applyInPandas(encode, out_schema)


def _truncate_by_pxy(pdf, k: int):
    """Deterministic (px, py)-ordered truncation via a packed-int64 sortkey
    numpy argsort — ~15x faster than the multi-column pandas sort_values the
    whale low-zoom groups otherwise spend seconds in.  Output stays sorted by
    (px, py) so blob bytes are deterministic, which the MERGE's
    timestamp-preservation (same bytes -> keep generated) relies on."""
    import numpy as np

    key = (
        (pdf["px"].to_numpy().astype(np.int64) + (1 << 21)) << np.int64(22)
    ) | (pdf["py"].to_numpy().astype(np.int64) + (1 << 21))
    order = np.argsort(key, kind="stable")
    if len(order) > k:
        order = order[:k]
    return pdf.iloc[order]


def _definition_bands(config: Config, layer: str, zooms: list[int]) -> list[list[int]]:
    """Group requested zooms by the definition that serves them (definitions
    are zoom-disjoint, reference config.py:132-144)."""
    by_def: dict = {}
    for z in sorted(zooms):
        d = config.layers[layer].definition_for(z)
        if d is None:
            continue
        by_def.setdefault(id(d), []).append(z)
    return list(by_def.values())


def render_zooms(
    config: Config,
    zooms: list[int],
    sources: dict,
    worklist: DataFrame | None = None,
    layers: list[str] | None = None,
) -> DataFrame | None:
    """All layers across many zooms -> tile-table rows
    [zoom, x, y, {layer}_generated, {layer}_data, {layer}_nfeat].

    Tiles where a defined layer has zero features get that layer's
    header-only MVT bytes (ST_AsMVT's >=1-row contract, kiln.py:40-43);
    layers with no definition at a zoom stay NULL there (partial-layer
    semantics, reference storage.py:371-390)."""
    layer_names = layers or config.layer_names()
    rendered: dict[str, DataFrame] = {}
    blanks: dict[str, dict[int, bytes]] = {}
    for name in layer_names:
        bands = _definition_bands(config, name, zooms)
        branches = [
            f for zs in bands
            if (f := _layer_band_features(config, name, zs, sources, worklist)) is not None
        ]
        if not branches:
            continue
        feats = branches[0]
        for b in branches[1:]:
            feats = feats.unionByName(b, allowMissingColumns=True)
        prop_cols = [c for c in feats.columns if c not in ("zoom", "x", "y", "px", "py")]
        rendered[name] = mvt_layer_agg_multi(feats, name, config, prop_cols)
        blanks[name] = {
            z: empty_layer(name, config.layers[name].definition_for(z).extent)
            for zs in bands for z in zs
        }
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
            F.coalesce(F.col(f"{name}_data"), F.element_at(blank_map, F.col("zoom")))
            .alias(f"{name}_data")
        )
        cols.append(
            F.when(defined, F.coalesce(F.col(f"{name}_nfeat"), F.lit(0)))
            .alias(f"{name}_nfeat")
        )
    return out.select(*cols)


def render_zoom(
    config: Config,
    zoom: int,
    sources: dict,
    worklist: DataFrame | None = None,
    layers: list[str] | None = None,
) -> DataFrame | None:
    """Single-zoom render (the reference's per-zoom generate loop unit)."""
    return render_zooms(config, [zoom], sources, worklist, layers)


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
    if config.layers[layer].definition_for(zoom) is None:
        return None
    feats = _layer_band_features(config, layer, [zoom], sources, worklist)
    prop_cols = [c for c in feats.columns if c not in ("zoom", "x", "y", "px", "py")]
    return mvt_layer_agg_multi(feats, layer, config, prop_cols, max_features_per_tile)


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
