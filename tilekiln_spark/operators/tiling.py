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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tilekiln_spark.config.model import Config
from tilekiln_spark.functions.tileids import envelope_cols, tile_x, tile_y
from tilekiln_spark.operators.mvt import (
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    empty_layer,
    encode_geom_layer_segments,
    encode_layer_fast,
    encode_point_layer_segments,
    mvt_geom_cols,
)
from tilekiln_spark.operators.spatial_join import points_in_polygons
from tilekiln_spark.tiles.core import HALF_WORLD

BuilderFn = Callable[[dict, list, int, int], DataFrame]

BUILDERS: dict[str, BuilderFn] = {}
BUILDER_GEOM: dict[str, int] = {}


def builder(name: str, geom_type: int = GEOM_POINT):
    def deco(fn: BuilderFn) -> BuilderFn:
        BUILDERS[name] = fn
        BUILDER_GEOM[name] = geom_type
        return fn

    return deco


# -- zoom-column template parameters (reference definition.py:57-69) ---------

def tile_length_col(zoom: Column) -> Column:
    # shiftleft, not pow: zoom is a column in this plan, and per-row
    # StrictMath.pow is measurable (see functions/tileids.py::_n_tiles)
    return F.lit(2.0 * HALF_WORLD) / F.call_function("shiftleft", F.lit(1).cast("long"), zoom.cast("int"))


def tile_area_col(zoom: Column) -> Column:
    return tile_length_col(zoom) ** 2


def coordinate_area_col(zoom: Column, extent: int) -> Column:
    return (tile_length_col(zoom) / extent) ** 2


def _explode_zooms(df: DataFrame, zooms: list[int]) -> DataFrame:
    return df.withColumn(
        "zoom", F.explode(F.array(*[F.lit(z).cast("int") for z in zooms]))
    )


def _pages_polys(sources: dict) -> DataFrame:
    """The ONE spatial join every builder shares: pages x ALL layer polygons.

    Builders used to run their own points_in_polygons against per-branch
    polygon subsets — 6 broadcast joins + 6 PIP passes over the full page
    stream per render.  Since every branch's polygon set is a subset of
    `layer_polygons`, one join followed by cheap column predicates produces
    identical rows with ONE scan of the pages and ONE PIP evaluation — the
    'one scan -> one broadcast join' shape that matters most at 10^12 rows.
    The joined frame is lazily localCheckpoint'ed (flag `materialize`) so the
    cap's count rollup and the probe side read one materialized copy."""
    if "_pages_polys" not in sources:
        # refine defaults to the concave-safe raycast_auto; callers override
        # with sources["refine"] (e.g. "convex" for a known-convex layer set)
        j = points_in_polygons(
            sources["pages_geo"],
            sources["layer_polygons"],
            refine=sources.get("refine", "raycast_auto"),
        )
        # the refine already consumed the ring/bbox machinery columns — no
        # builder reads them from the joined frame (geometry layers take
        # rings straight from layer_polygons), and carrying ~0.5 KB of ring
        # doubles per matched row through the checkpoint + every downstream
        # scan was the bulk of the materialization cost
        j = j.drop("ring_xs", "ring_ys", "xmin", "ymin", "xmax", "ymax")
        sources["_pages_polys"] = j
    return sources["_pages_polys"]


def _layer_rows(sources: dict, layer: str) -> DataFrame:
    """One LAYER's joined rows, materialized per layer (not one fat
    checkpoint): every builder branch appears in both the count-rollup and
    the probe subtree, so a single all-layers checkpoint gets scanned
    ~2x#branches times per render — at 6.4M pages that block traffic is the
    memory-bandwidth ceiling of the 32-thread cell.  Splitting the
    materialization by layer means each scan touches only its own layer's
    blocks (total stored rows unchanged)."""
    key = "_layer_rows:" + layer
    if key not in sources:
        lr = _pages_polys(sources).filter(F.col("layer") == layer)
        if sources.get("materialize", True):
            lr = lr.localCheckpoint(eager=False)
        sources[key] = lr
    return sources[key]


@builder("water")
def water_builder(sources: dict, zooms: list[int], extent: int, buffer: int) -> DataFrame:
    """reference sample/water.sql.jinja2.  Stand-ins for the template's two
    tables: even polygon ids = "simplified_water_polygons" (ocean), odd =
    "planet_osm_polygon" water rows (way_area-generalized at z<=12)."""
    j = _explode_zooms(_layer_rows(sources, "water"), zooms)
    z = F.col("zoom")
    ocean = F.col("polygon_id") % 2 == 0
    j = j.filter(ocean | (z > 12) | (F.col("way_area") > 400 * coordinate_area_col(z, extent)))
    return j.select(
        "zoom", "mx", "my",
        F.when(~ocean, F.col("polygon_id")).cast("long").alias("osm_id"),
        F.when(ocean, F.lit("ocean")).otherwise(F.col("name")).alias("water"),
    )


@builder("admin")
def admin_builder(sources: dict, zooms: list[int], extent: int, buffer: int) -> DataFrame:
    """reference sample/admin.sql.jinja2: source swap at z<=10 (the "roads"
    generalized subset, polygon_id % 3 == 0) as a zoom-row predicate,
    IN-lists varying by zoom (B6), cast to int (B7)."""
    j = _explode_zooms(_layer_rows(sources, "admin"), zooms)
    z = F.col("zoom")
    j = j.filter(((z <= 10) & (F.col("polygon_id") % 3 == 0)) | (z > 10))
    lvl = F.col("admin_level")
    in_list = (
        F.when(z <= 2, lvl.isin("0", "1", "2"))
        .when(z <= 10, lvl.isin("0", "1", "2", "3", "4"))
        .when(z <= 12, lvl.isin("0", "1", "2", "3", "4", "5", "6"))
        .otherwise(F.lit(True))
    )
    return j.filter(in_list).select(
        "zoom", "mx", "my", lvl.cast("int").alias("admin_level")
    )


@builder("ne_admin")
def ne_admin_builder(sources: dict, zooms: list[int], extent: int, buffer: int) -> DataFrame:
    """reference sample/ne-admin.sql.jinja2: literal admin_level=2."""
    j = _layer_rows(sources, "admin").filter(F.col("admin_level") == "2")
    return _explode_zooms(j, zooms).select(
        "zoom", "mx", "my", F.lit(2).alias("admin_level")
    )


def polygon_label_points(polys: DataFrame, props: dict[str, Column]) -> DataFrame:
    """Exact ST_PointOnSurface for polygon rows: a point GUARANTEED interior
    to the ring (PostGIS semantics — the centroid of a concave polygon can
    fall outside it).  Algorithm (the standard interior-point scan): cast a
    horizontal line through the bbox-center y, collect the ring's crossings,
    take the midpoint of the WIDEST interior interval.  Evaluated by an
    Arrow-batched kernel over the polygon frame (the small broadcast dim —
    one row per feature, not per joined pair).

    Output: [mx, my, <props...>] — zoom-agnostic; callers explode zooms."""
    from pyspark.sql.types import ArrayType, DoubleType

    @F.pandas_udf(ArrayType(DoubleType()))
    def pos(ring_xs: pd.Series, ring_ys: pd.Series) -> pd.Series:
        import numpy as np  # noqa: PLC0415 - executor-side import

        n = len(ring_xs)
        if n == 0:
            return pd.Series([], dtype=object)
        # whole-batch flattened-offsets kernel (same pattern as the MinHash /
        # SimHash / clip kernels): ALL rings concatenate into one vertex
        # array; per-ring reductions ride np.minimum/maximum.reduceat and
        # the interval scan is one lexsort over every crossing in the batch
        lens = np.fromiter((len(v) for v in ring_xs), dtype=np.int64, count=n)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        x = np.concatenate([np.asarray(v, dtype=np.float64) for v in ring_xs])
        y = np.concatenate([np.asarray(v, dtype=np.float64) for v in ring_ys])
        rid = np.repeat(np.arange(n), lens)
        ymin = np.minimum.reduceat(y, starts)
        ymax = np.maximum.reduceat(y, starts)
        xmin = np.minimum.reduceat(x, starts)
        xmax = np.maximum.reduceat(x, starts)
        cy = (ymin + ymax) / 2.0
        cyv = cy[rid]
        # next-vertex index wraps WITHIN each ring
        nxt = np.arange(len(x)) + 1
        nxt[starts + lens - 1] = starts
        xj, yj = x[nxt], y[nxt]
        straddle = (y > cyv) != (yj > cyv)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi_all = x + (cyv - y) * (xj - x) / (yj - y)
        srid = rid[straddle]
        xi = xi_all[straddle]
        # sort crossings by (ring, x); even-odd pairs them into intervals
        order = np.lexsort((xi, srid))
        srid, xi = srid[order], xi[order]
        counts = np.bincount(srid, minlength=n)
        goff = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(len(xi)) - goff[srid]
        # interval [xi[2k], xi[2k+1]]; a trailing odd crossing never pairs
        lo = (within % 2 == 0) & (within + 1 < counts[srid])
        pi = np.nonzero(lo)[0]
        widths = xi[pi + 1] - xi[pi]
        mids = (xi[pi] + xi[pi + 1]) / 2.0
        prid = srid[pi]
        # widest interval per ring: order pairs by (ring, -width), keep first
        porder = np.lexsort((-widths, prid))
        prid_s, mids_s = prid[porder], mids[porder]
        first = np.concatenate([[True], prid_s[1:] != prid_s[:-1]])
        # degenerate (flat ring / no interval): fall back to the bbox center
        mx = (xmin + xmax) / 2.0
        mx[prid_s[first]] = mids_s[first]
        return pd.Series([[float(a), float(b)] for a, b in zip(mx, cy)])

    p = pos(F.col("ring_xs"), F.col("ring_ys"))
    named = polys.withColumn("__pos", p)
    keep = [c for c in ("zoom",) if c in polys.columns]
    return named.select(
        *keep,
        F.col("__pos")[0].alias("mx"),
        F.col("__pos")[1].alias("my"),
        *[c.alias(k) for k, c in props.items()],
    )


def polygon_centroid_points(polys: DataFrame, props: dict[str, Column]) -> DataFrame:
    """Exact area-weighted ST_Centroid for polygon/ring rows (PostGIS
    non-aggregate ST_Centroid(way) — the reference's templates may call it
    on any feature table, reference tilekiln/definition.py:42-77).  Unlike
    ST_PointOnSurface the centroid may fall OUTSIDE a concave ring — that
    is the PostGIS contract, not a bug.  Pure ``F.aggregate`` folds
    (functions/geometry.py ring_centroid): codegen, no UDF, map-only.

    Output: [zoom?, mx, my, <props...>] — same shape as
    :func:`polygon_label_points`."""
    from tilekiln_spark.functions.geometry import ring_centroid

    cx, cy = ring_centroid(F.col("ring_xs"), F.col("ring_ys"))
    keep = [c for c in ("zoom",) if c in polys.columns]
    return polys.select(
        *keep,
        cx.alias("mx"),
        cy.alias("my"),
        *[c.alias(k) for k, c in props.items()],
    )


def _cluster_label_points(df: DataFrame, extent: int, props: dict[str, Column]) -> DataFrame:
    """ST_PointOnSurface stand-in (documented deviation): one label point
    per (feature, tile) = centroid of the joined page cluster inside
    polygon & tile.  `df` must be zoom-exploded with mx/my/polygon_id."""
    z = F.col("zoom")
    named = df.select(
        "zoom", "mx", "my", "polygon_id", *[c.alias(k) for k, c in props.items()]
    )
    return (
        named.withColumn("x", tile_x(z, F.col("mx")))
        .withColumn("y", tile_y(z, F.col("my")))
        .groupBy("zoom", "x", "y", "polygon_id", *props.keys())
        .agg(F.avg("mx").alias("mx"), F.avg("my").alias("my"))
        .select("zoom", "mx", "my", *props.keys())
    )


@builder("country")
def country_builder(sources: dict, zooms: list[int], extent: int, buffer: int) -> DataFrame:
    """reference sample/country.sql.jinja2: one label point per (polygon,
    tile) — centroid of the page cluster inside polygon & tile."""
    z = F.col("zoom")
    joined = (
        _explode_zooms(_layer_rows(sources, "country_names").filter(F.col("name").isNotNull()), zooms)
        .filter((z > 12) | (F.col("way_area") > tile_area_col(z) * 0.05**2))
    )
    return _cluster_label_points(
        joined, extent, {"name": F.col("name"), "area": F.col("way_area")}
    )


def ring_col_exprs(cols: set) -> tuple:
    """Normalize the three ring-column layouts to nested-array expressions
    (rings_xs, rings_ys, rings_hole) — ONE implementation shared by the
    tile-row builder and the simplification kernel (layouts documented on
    :func:`_poly_tile_rows`)."""
    if "rings_xs" in cols:
        return F.col("rings_xs"), F.col("rings_ys"), F.col("rings_hole")
    if "holes_xs" in cols:
        hx = F.coalesce(F.col("holes_xs"), F.array())
        hy = F.coalesce(F.col("holes_ys"), F.array())
        rxs = F.concat(F.array(F.col("ring_xs")), hx)
        rys = F.concat(F.array(F.col("ring_ys")), hy)
        hole = F.concat(F.array(F.lit(False)), F.transform(hx, lambda _: F.lit(True)))
        return rxs, rys, hole
    return (
        F.array(F.col("ring_xs")),
        F.array(F.col("ring_ys")),
        F.array(F.lit(False)),
    )


def _closure_ring_store(
    sources: dict,
    polys: DataFrame,
    cache_key: str,
    close: bool,
) -> dict | None:
    """Collect a bounded {polygon_id: (flat_xs, flat_ys, ring_lens, holes)}
    ring store for kernel-side tile transformation (r6; guide §8: when a
    pipeline shuffles heavy payloads, move lightweight proxies through the
    exchange and re-attach the bytes once).  The polygon dim of a render is
    the same broadcastable class the PIP join already collects rings for
    (spatial_join.make_pip_raycast_closure_udf) and gets the same budget
    guard: one tiny aggregate sizes the payload, and anything over
    ``spark.tilekiln.rings.closureBudgetBytes`` (default 64 MB) returns
    None so the caller keeps the distributed row-borne ring path — a
    million-polygon layer must not OOM the driver or bloat task closures.

    The rings collected are the NORMALIZED nested layout (ring_col_exprs),
    with ``close`` applied SQL-side at collect time, so the store holds
    exactly the per-ring vertex sequences the row-borne path would carry.
    Cached in ``sources`` under ``cache_key`` (None cached too)."""
    import numpy as np

    if cache_key in sources:
        return sources[cache_key]
    spark = polys.sparkSession
    budget = int(spark.conf.get(
        "spark.tilekiln.rings.closureBudgetBytes", str(64 << 20)
    ))
    rxs, rys, hole = ring_col_exprs(set(polys.columns))
    if close:
        rxs = F.transform(rxs, lambda r: F.concat(r, F.slice(r, 1, 1)))
        rys = F.transform(rys, lambda r: F.concat(r, F.slice(r, 1, 1)))
    mx_sum, n_polys = polys.agg(
        F.sum(F.size(F.flatten(rxs))), F.count(F.lit(1))
    ).collect()[0]
    payload = 16 * (mx_sum or 0) + 96 * (n_polys or 0)
    if payload > budget:
        sources[cache_key] = None
        return None
    rows = polys.select(
        F.col("polygon_id").alias("__p"), rxs.alias("__rx"),
        rys.alias("__ry"), hole.alias("__rh"),
    ).collect()
    store = {}
    for r in rows:
        fx = np.concatenate(
            [np.asarray(v, dtype=np.float64) for v in r["__rx"]]
        ) if r["__rx"] else np.empty(0, dtype=np.float64)
        fy = np.concatenate(
            [np.asarray(v, dtype=np.float64) for v in r["__ry"]]
        ) if r["__ry"] else np.empty(0, dtype=np.float64)
        lens = np.asarray([len(v) for v in r["__rx"]], dtype=np.int64)
        holes = np.asarray(list(r["__rh"]), dtype=bool)
        store[r["__p"]] = (fx, fy, lens, holes)
    sources[cache_key] = store
    return store


def _poly_tile_rows(
    polys: DataFrame,
    zooms: list[int],
    extent: int,
    buffer: int,
    props: dict[str, Column],
    close: bool = False,
    pre_exploded: bool = False,
    simplify_tolerance: float = 0.0,
    closure_store: dict | None = None,
) -> DataFrame:
    """Geometry-layer rows: one (polygon, zoom, tile) row carrying the
    feature's RINGS in tile-local FLOAT coordinates as nested arrays
    (g_xs/g_ys: array<array<double>>, g_hole: array<boolean>) for batch
    clip+encode inside the tile aggregate.  Ring sources, most general
    first (all optional except the flat exterior):

    - ``rings_xs/rings_ys/rings_hole`` — full (multi)polygon: rings ordered
      [exterior, its holes..., exterior2, ...] (MVT 2.1 §4.3.3.3)
    - ``holes_xs/holes_ys`` — exterior ``ring_xs`` + interior rings
    - ``ring_xs/ring_ys`` — single exterior ring (round-1 form)

    Tiles = every tile whose buffered envelope intersects the feature bbox
    (bbox explode, the ST_AsMVTGeom assignment for areal geometry);
    `close=True` appends each ring's first vertex again so rings read as
    closed outline LINESTRINGs.  ``simplify_tolerance > 0`` thins the
    rings FIRST (operators/simplify.py) — once per INPUT ROW, before this
    function's own explodes, so pass an un-exploded frame when using it
    (the compiled ST_Simplify path pre-applies the kernel before its zoom
    explode and passes no tolerance here); the bbox columns keep the
    unsimplified extent (a superset — spurious tiles clip to empty and
    drop).

    ``closure_store`` (r6): a bounded {polygon_id: rings} store from
    :func:`_closure_ring_store`.  When given, the emitted rows carry ONLY
    ``__pid`` (8 bytes) instead of the g_xs/g_ys/g_hole nested ring
    arrays — the tile exchange moves keys, not vertices, and the encode
    kernel re-attaches the rings from the store and applies the identical
    tile-local affine there (bit-for-bit: same (v - txmin) / tlen *
    extent float64 ops).  px/py stay SQL-side, computed from the FIRST
    vertex with the same expression the ring transform would produce.
    Requires simplify_tolerance == 0 (the compiled simplify path keeps
    row-borne rings)."""
    if closure_store is not None and simplify_tolerance > 0:
        raise ValueError("closure_store requires simplify_tolerance == 0")
    if simplify_tolerance > 0:
        from tilekiln_spark.operators.simplify import simplify_ring_cols

        polys = simplify_ring_cols(polys, simplify_tolerance)
    z = F.col("zoom")
    length = tile_length_col(z)
    margin = (buffer / extent) * length
    pf = polys if pre_exploded else _explode_zooms(polys, zooms)
    x0, x1 = tile_x(z, F.col("xmin") - margin), tile_x(z, F.col("xmax") + margin)
    y0, y1 = tile_y(z, F.col("ymax") + margin), tile_y(z, F.col("ymin") - margin)
    pf = pf.withColumn("x", F.explode(F.sequence(x0, x1))).withColumn(
        "y", F.explode(F.sequence(y0, y1))
    )
    txmin, tymin, txmax, tymax = envelope_cols(z, F.col("x"), F.col("y"), 0.0)
    tlen = txmax - txmin
    rxs, rys, hole = ring_col_exprs(set(polys.columns))
    if close:
        rxs = F.transform(rxs, lambda r: F.concat(r, F.slice(r, 1, 1)))
        rys = F.transform(rys, lambda r: F.concat(r, F.slice(r, 1, 1)))
    prop_cols = [c.alias(k) for k, c in props.items()]
    fh = F.xxhash64(F.col("polygon_id"))
    if closure_store is not None:
        # keys-only emit: px/py from the first vertex via the SAME affine
        # the ring transform applies (closing never changes vertex 1)
        fx1 = F.element_at(F.element_at(rxs, 1), 1)
        fy1 = F.element_at(F.element_at(rys, 1), 1)
        return pf.select(
            "zoom", "x", "y",
            F.round((fx1 - txmin) / tlen * extent).cast("long").alias("px"),
            F.round((tymax - fy1) / tlen * extent).cast("long").alias("py"),
            fh.alias("__fh"),
            F.col("polygon_id").cast("long").alias("__pid"),
            *prop_cols,
        )
    gxs = F.transform(rxs, lambda r: F.transform(r, lambda v: (v - txmin) / tlen * extent))
    gys = F.transform(rys, lambda r: F.transform(r, lambda v: (tymax - v) / tlen * extent))
    return pf.select(
        "zoom", "x", "y",
        F.round(F.element_at(F.element_at(gxs, 1), 1)).cast("long").alias("px"),
        F.round(F.element_at(F.element_at(gys, 1), 1)).cast("long").alias("py"),
        fh.alias("__fh"),
        gxs.alias("g_xs"), gys.alias("g_ys"), hole.alias("g_hole"),
        *prop_cols,
    )


def sample_tables() -> dict:
    """SQL-resolvable stand-in tables (``sources["tables"]``) exposing the
    osm2pgsql-style schema the reference's sample templates query, mapped
    onto the synthetic fixture EXACTLY as the hand-written builders map it
    (water even ids = ocean shapefile rows, odd = osm water; admin
    polygon_id % 3 == 0 = the generalized "roads" subset; negative osm_id =
    relation-backed rows).  With this registry, a config shipping the actual
    .sql.jinja2 templates (sample/*.sql.jinja2 in this repo) renders
    byte-identically to the registered-builder config — tested in
    tests/test_template_compiler.py."""
    S = "string"

    def _water_odd(s):
        return _layer_rows(s, "water").filter(F.col("polygon_id") % 2 != 0)

    def simplified_water_polygons(s):
        return _layer_rows(s, "water").filter(F.col("polygon_id") % 2 == 0)

    def planet_osm_polygon(s):
        water = _water_odd(s).select(
            "mx", "my", "polygon_id", "way_area", "name",
            F.col("polygon_id").cast("long").alias("osm_id"),
            F.col("name").alias("water"),
            F.lit(None).cast(S).alias("waterway"),
            F.lit(None).cast(S).alias("landuse"),
            F.lit("water").alias("natural"),
            F.lit(None).cast(S).alias("boundary"),
            F.lit(None).cast(S).alias("admin_level"),
        )
        country = _layer_rows(s, "country_names").select(
            "mx", "my", "polygon_id", "way_area", "name",
            (-F.col("polygon_id") - 1).cast("long").alias("osm_id"),
            F.lit(None).cast(S).alias("water"),
            F.lit(None).cast(S).alias("waterway"),
            F.lit(None).cast(S).alias("landuse"),
            F.lit(None).cast(S).alias("natural"),
            F.lit("administrative").alias("boundary"),
            F.lit("2").alias("admin_level"),
        )
        return water.unionByName(country)

    def _admin(s):
        return _layer_rows(s, "admin").select(
            "mx", "my", "polygon_id", "way_area", "name", "admin_level",
            (-F.col("polygon_id") - 1).cast("long").alias("osm_id"),
            F.lit("administrative").alias("boundary"),
        )

    def planet_osm_roads(s):
        return _admin(s).filter(F.col("polygon_id") % 3 == 0)

    def ne_110m_admin_0_boundary_lines_land(s):
        return _admin(s).filter(F.col("admin_level") == "2")

    def water_polygons(s):
        return s["layer_polygons"].filter(F.col("layer") == "water").select(
            "*",
            F.col("polygon_id").alias("osm_id"),
            F.col("name").alias("water"),
        )

    def admin_boundary_lines(s):
        return s["layer_polygons"].filter(F.col("layer") == "admin")

    return {
        "simplified_water_polygons": {"frame": simplified_water_polygons, "kind": "point"},
        "planet_osm_polygon": {"frame": planet_osm_polygon, "kind": "point"},
        "planet_osm_roads": {"frame": planet_osm_roads, "kind": "point"},
        "planet_osm_line": {"frame": _admin, "kind": "point"},
        "ne_110m_admin_0_boundary_lines_land": {
            "frame": ne_110m_admin_0_boundary_lines_land, "kind": "point",
        },
        "water_polygons": {"frame": water_polygons, "kind": "polygon"},
        "admin_boundary_lines": {"frame": admin_boundary_lines, "kind": "line"},
    }


@builder("water_poly", geom_type=GEOM_POLYGON)
def water_poly_builder(sources: dict, zooms: list[int], extent: int, buffer: int) -> DataFrame:
    """Areal water geometry — the reference's water layer emits the polygons
    themselves (sample/water.sql.jinja2 ST_AsMVTGeom over `way`), not points;
    each (polygon, tile) feature is clipped to the buffered tile box and
    encoded as a POLYGON command stream."""
    polys = sources["layer_polygons"].filter(F.col("layer") == "water")
    store = (
        _closure_ring_store(sources, polys, "_ring_cache:water:0", close=False)
        if sources.get("_closure_rings_ok")
        else None
    )
    if store is not None:
        sources["_ring_store_pending"] = store
    return _poly_tile_rows(
        polys, zooms, extent, buffer,
        props={
            "osm_id": F.col("polygon_id"),
            "water": F.coalesce(F.col("name"), F.lit("ocean")),
        },
        closure_store=store,
    )


@builder("polyline", geom_type=GEOM_LINESTRING)
def polyline_builder(sources: dict, zooms: list[int], extent: int, buffer: int) -> DataFrame:
    """True OPEN polylines (reference planet_osm_line semantics —
    sample/admin.sql.jinja2:6 feeds real LINESTRING geometries, not ring
    outlines): rows of ``sources["layer_lines"]`` carry the vertex chain in
    ring_xs/ring_ys; each (line, tile) pair is clipped with the
    Liang–Barsky part splits (a line that exits and re-enters a tile emits
    multiple MoveTo parts — mvt.py clip_lines_batch)."""
    lines = sources["layer_lines"]
    store = (
        _closure_ring_store(sources, lines, "_ring_cache:lines:0", close=False)
        if sources.get("_closure_rings_ok")
        else None
    )
    if store is not None:
        sources["_ring_store_pending"] = store
    return _poly_tile_rows(
        lines, zooms, extent, buffer, close=False,
        props={"osm_id": F.col("polygon_id")},
        closure_store=store,
    )


@builder("admin_line", geom_type=GEOM_LINESTRING)
def admin_line_builder(sources: dict, zooms: list[int], extent: int, buffer: int) -> DataFrame:
    """Admin boundary lines — the reference's admin layer emits boundary
    LINESTRINGs (sample/admin.sql.jinja2 over planet_osm_roads/line); the
    polygon outline (closed ring as a line) stands in, clipped per tile."""
    polys = sources["layer_polygons"].filter(F.col("layer") == "admin")
    store = (
        _closure_ring_store(sources, polys, "_ring_cache:admin:1", close=True)
        if sources.get("_closure_rings_ok")
        else None
    )
    if store is not None:
        sources["_ring_store_pending"] = store
    return _poly_tile_rows(
        polys, zooms, extent, buffer, close=True,
        props={"admin_level": F.col("admin_level").cast("int")},
        closure_store=store,
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



def _definition_geom_type(d, sources: dict, zooms: list[int]) -> int:
    """Geometry type of a definition band: registered builders carry it in
    BUILDER_GEOM; compiled SQL templates derive it from the source table's
    kind (point/polygon/line) or the ST_PointOnSurface label form."""
    if d.builder == "__sql__":
        return d.compiled.geom_type(sources, zooms, d.extent, d.buffer)
    return BUILDER_GEOM[d.builder]


def _run_builder(d, sources: dict, zooms: list[int]) -> DataFrame:
    if d.builder == "__sql__":
        return d.compiled.build(sources, zooms, d.extent, d.buffer)
    return BUILDERS[d.builder](sources, zooms, d.extent, d.buffer)


def _apply_tile_limit(
    feats: DataFrame, ol: tuple[list, dict] | None, zooms: list[int]
) -> DataFrame:
    """Per-tile ORDER BY/LIMIT from a compiled template (sqlt.order_limit_for).

    The reference runs the template SQL once per tile, so ``LIMIT n`` means
    "top n features of THIS tile by the ORDER BY key" (reference
    definition.py:42-77 — the SQL executes against a per-tile bbox).  Here
    zoom is data, so the cap is a per-(zoom, x, y) window: rank by the ORDER
    BY key (Postgres null ordering: ASC = NULLS LAST, DESC = NULLS FIRST)
    with the deterministic feature hash ``__fh`` as the tiebreaker, keep
    row_number <= n.

    Scale: the rank filter uses a LITERAL limit per branch so Catalyst's
    WindowGroupLimit rewrite inserts a partial per-partition top-n BEFORE the
    (zoom,x,y) shuffle — a z0 whale tile ships n rows per map partition, not
    its full feature set.  Zoom conditionals may carry different limits; each
    distinct limit becomes its own literal branch (one branch in the common
    uniform-limit case)."""
    if ol is None:
        return feats
    from pyspark.sql.window import Window

    order_keys, limits = ol
    sort_cols = [
        (F.col(n).desc_nulls_first() if desc else F.col(n).asc_nulls_last())
        for n, desc in order_keys
    ] + [F.col("__fh").asc()]
    w = Window.partitionBy("zoom", "x", "y").orderBy(*sort_cols)
    by_n: dict[int, list[int]] = {}
    for z, n in limits.items():
        by_n.setdefault(n, []).append(z)
    all_capped = set(zooms) <= set(limits)
    parts = []
    for n, zs in sorted(by_n.items()):
        capped = feats if (all_capped and len(by_n) == 1) else feats.filter(
            F.col("zoom").isin(zs)
        )
        parts.append(
            capped.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= F.lit(n))
            .drop("__rn")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if not all_capped:
        out = out.unionByName(feats.filter(~F.col("zoom").isin(list(limits.keys()))))
    return out


def _apply_tile_distinct(
    feats: DataFrame, dzooms: set, zooms: list[int], prop_cols: list[str]
) -> DataFrame:
    """SELECT DISTINCT from a compiled template: per-tile dedup on the
    QUANTIZED feature row (zoom, x, y, px, py, props) — ST_AsMVTGeom's
    output is what the reference's per-tile SQL dedups, so two raw points
    that land on the same pixel ARE duplicates.  min(__fh) keeps the
    deterministic representative for downstream whale-tile sampling and
    sort tiebreaks.

    Scale: one partial-aggregated shuffle on the dedup key — map-side
    combine collapses each partition's duplicates before the exchange."""
    if not dzooms:
        return feats
    key = ["zoom", "x", "y", "px", "py", *prop_cols]
    if set(zooms) <= dzooms:
        return feats.groupBy(*key).agg(F.min("__fh").alias("__fh"))
    deduped = (
        feats.filter(F.col("zoom").isin(list(dzooms)))
        .groupBy(*key).agg(F.min("__fh").alias("__fh"))
    )
    rest = feats.filter(~F.col("zoom").isin(list(dzooms)))
    return deduped.unionByName(rest)


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
    feats = _run_builder(d, sources, zooms)
    # a builder that opted into keys-only geometry rows (closure ring
    # store) leaves the store at a temp key; file it under the config
    # layer's name so the render's encoder can find it (r6)
    pending = sources.pop("_ring_store_pending", None)
    if pending is not None:
        sources[f"_ring_store:{layer}"] = pending
    ol = (
        d.compiled.order_limit_for(zooms, d.extent, d.buffer)
        if d.builder == "__sql__"
        else None
    )
    dz = (
        d.compiled.distinct_zooms(zooms, d.extent, d.buffer)
        if d.builder == "__sql__"
        else set()
    )
    if _definition_geom_type(d, sources, zooms) != GEOM_POINT:
        # geometry builders assign tiles by bbox intersection and carry
        # tile-local float rings; clipping happens inside the tile aggregate
        if worklist is not None:
            feats = feats.join(
                F.broadcast(worklist.select("zoom", "x", "y")), ["zoom", "x", "y"], "left_semi"
            )
        return _apply_tile_limit(feats, ol, zooms)
    feats = assign_tiles_col(feats, d.extent, d.buffer)
    if worklist is not None:
        feats = feats.join(
            F.broadcast(worklist.select("zoom", "x", "y")), ["zoom", "x", "y"], "left_semi"
        )
    px, py, in_clip = mvt_geom_cols(
        F.col("zoom"), F.col("x"), F.col("y"), F.col("mx"), F.col("my"), d.extent, d.buffer
    )
    prop_cols = [c for c in feats.columns if c not in ("mx", "my", "zoom", "x", "y")]
    # deterministic per-feature hash: the whale-tile sampling key and the
    # truncation/sort tiebreaker (ties on quantized (px, py) would otherwise
    # keep shuffle-arrival order, making capped blob bytes run-dependent)
    fh = F.xxhash64(F.col("mx"), F.col("my"), *[F.col(c) for c in prop_cols])
    out = (
        feats.withColumn("px", px).withColumn("py", py).filter(in_clip)
        .select("zoom", "x", "y", "px", "py", fh.alias("__fh"), *prop_cols)
    )
    # SQL order: DISTINCT dedups first, then ORDER BY/LIMIT ranks the
    # deduplicated per-tile rows
    return _apply_tile_limit(_apply_tile_distinct(out, dz, zooms, prop_cols), ol, zooms)


def mvt_layer_agg_multi(
    feats: DataFrame, layer: str, config: Config, prop_cols: list[str],
    max_features_per_tile: int = 65536,
    sample_margin: float = 1.15,
) -> DataFrame:
    """One count rollup + one shuffle + one applyInPandas for a layer across
    every zoom; the encode picks the zoom's extent from the config (B4).

    Skew handling (north_rule "salted prefixes / adaptive repartitioning for
    dense web regions"): low-zoom tiles receive millions of features (z0
    receives EVERY feature), which would funnel whole partitions through one
    reducer.  Instead of a salted top-K pre-aggregation (round-1 design: a
    second full shuffle + a 16-reducer funnel per whale tile), the cap is a
    **deterministic hash-sampling filter**:

      1. per-tile counts via groupBy(zoom,x,y).count() — map-side partial
         aggregation, shuffles one row per non-empty tile;
      2. tiles over the cap (at most total_rows/cap of them, so the frame is
         small by construction) broadcast back onto the feature stream;
      3. each feature of an over-cap tile survives iff
         pmod(xxhash64(feature), n_true) < margin*cap — a pure per-row
         filter, embarrassingly parallel, no extra shuffle;
      4. the final per-tile group therefore holds <= ~margin*cap rows at ANY
         zoom; exact truncation to the cap happens in-group, ordered by the
         same feature hash (deterministic; uniform spatial subsample rather
         than the west-corner bias of (px,py)-ordered truncation).

    `n_features` always reports the TRUE pre-cap count (carried via the
    broadcast count for whale tiles, len(group) otherwise).  Blob bytes are
    deterministic: the sample predicate and both orderings depend only on
    feature values, never on partitioning or arrival order."""
    import numpy as np
    import pandas as pd

    extents = {
        z: d.extent
        for z in range(0, 31)
        if (d := config.layers[layer].definition_for(z)) is not None
    }
    cap = max_features_per_tile
    if "__fh" not in feats.columns:
        feats = feats.withColumn(
            "__fh", F.xxhash64(F.col("px"), F.col("py"), *[F.col(c) for c in prop_cols])
        )
    if cap:
        counts = feats.groupBy("zoom", "x", "y").agg(F.count("*").alias("__ntrue"))
        big = counts.filter(F.col("__ntrue") > cap)
        # margin keeps P[sample < cap] negligible (binomial std ~ sqrt(cap))
        m = F.lit(int(cap * sample_margin) + 64)
        feats = feats.join(F.broadcast(big), ["zoom", "x", "y"], "left")
        feats = feats.filter(
            F.col("__ntrue").isNull() | (F.pmod(F.col("__fh"), F.col("__ntrue")) < m)
        )

    out_schema = "zoom int, x int, y int, data binary, n_features long"

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        ntrue = pdf["__ntrue"].dropna() if "__ntrue" in pdf.columns else pd.Series([], dtype="float64")
        n_total = int(ntrue.iloc[0]) if len(ntrue) else len(pdf)
        fh = pdf["__fh"].to_numpy()
        pxy = (
            (pdf["px"].to_numpy().astype(np.int64) + (1 << 21)) << np.int64(22)
        ) | (pdf["py"].to_numpy().astype(np.int64) + (1 << 21))
        if len(pdf) > cap:
            # exact cap: keep the cap smallest by (hash, pxy) — a uniform,
            # deterministic subset of the (already hash-sampled) group
            keep = np.lexsort((pxy, fh))[:cap]
            pdf = pdf.iloc[keep]
            fh, pxy = fh[keep], pxy[keep]
        order = np.lexsort((fh, pxy))  # final blob order: (px, py, hash)
        pdf = pdf.iloc[order]
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
    max_features_per_tile: int = 65536,
    sample_margin: float = 1.15,
    materialize_features: bool = True,
) -> DataFrame | None:
    """All layers across many zooms -> tile-table rows
    [zoom, x, y, {layer}_generated, {layer}_data, {layer}_nfeat].

    Tiles where a defined layer has zero features get that layer's
    header-only MVT bytes (ST_AsMVT's >=1-row contract, kiln.py:40-43);
    layers with no definition at a zoom stay NULL there (partial-layer
    semantics, reference storage.py:371-390).

    Fused plan (round 2): all layers' feature branches union into ONE frame
    tagged with a __layer column, take ONE per-(layer,tile) count rollup +
    whale-tile hash-sample (see mvt_layer_agg_multi for the cap math), ONE
    shuffle on (zoom, x, y), and ONE applyInPandas that encodes every layer
    of the tile in the same group.  vs the per-layer form this removes
    L-1 shuffles, L-1 broadcast builds and the L-way full-outer join of the
    layer outputs — at a 1000-executor scale those joins re-shuffle the
    entire tile table L times for no information gain."""
    import numpy as np
    import pandas as pd

    # The checkpointed shared join is cached back into the CALLER's dict:
    # repeated renders over the same sources reuse one materialization.
    # Without this, every render leaves an unreferenced localCheckpoint in
    # the block store until GC — two 6.4M-page checkpoints plus the persisted
    # pages saturate the storage pool and the second run pays an
    # eviction/spill storm (measured 76s -> 354s).  Pass a fresh dict if the
    # underlying sources change between calls.
    caller_sources = sources
    sources = {**sources, "materialize": materialize_features}
    # geometry builders may opt into keys-only ring rows (bounded closure
    # ring store — see _closure_ring_store); only this fused render path
    # has the store-aware encoder, so the flag is set here, not globally
    sources["_closure_rings_ok"] = True
    layer_names = layers or config.layer_names()
    branches: list[DataFrame] = []
    layer_props: dict[str, list[str]] = {}
    extents: dict[str, dict[int, int]] = {}
    buffers: dict[str, dict[int, int]] = {}
    geom_types: dict[str, int] = {}
    _GEOM_COLS = ("g_xs", "g_ys", "g_hole")
    for name in layer_names:
        bands = _definition_bands(config, name, zooms)
        got = False
        for zs in bands:
            f = _layer_band_features(config, name, zs, sources, worklist)
            if f is None:
                continue
            got = True
            props = [
                c for c in f.columns
                if c not in ("zoom", "x", "y", "px", "py", "__fh", "__pid")
                and c not in _GEOM_COLS
            ]
            layer_props.setdefault(name, [])
            for p in props:
                if p not in layer_props[name]:
                    layer_props[name].append(p)
            d = config.layers[name].definition_for(zs[0])
            gt = _definition_geom_type(d, sources, zs)
            assert geom_types.setdefault(name, gt) == gt, (
                f"layer {name}: definition bands mix geometry types"
            )
            branches.append(f.withColumn("__layer", F.lit(name)))
        if got:
            extents[name] = {
                z: config.layers[name].definition_for(z).extent
                for zs in bands for z in zs
            }
            buffers[name] = {
                z: config.layers[name].definition_for(z).buffer
                for zs in bands for z in zs
            }
    if not branches:
        return None
    for k, v in sources.items():
        if isinstance(k, str) and k.startswith("_"):
            caller_sources.setdefault(k, v)
    feats = branches[0]
    for b in branches[1:]:
        feats = feats.unionByName(b, allowMissingColumns=True)

    cap = max_features_per_tile
    if cap:
        # NB the count rollup is a broadcast subtree of the same job; both it
        # and the probe side re-derive from the localCheckpoint'ed shared
        # spatial join (_pages_polys), so the expensive join+PIP runs once.
        # At 10^12-row scale pass materialize_features=False (recompute: two
        # scans beat spilling the joined stream to executor disks).
        counts = feats.groupBy("__layer", "zoom", "x", "y").agg(
            F.count("*").alias("__ntrue")
        )
        # over-cap tiles only: at most total_rows/cap of them, small by
        # construction (falls back to a shuffle join automatically if a
        # pathological cap/total ratio ever outgrows the broadcast threshold)
        big = counts.filter(F.col("__ntrue") > cap)
        m = F.lit(int(cap * sample_margin) + 64)
        feats = feats.join(F.broadcast(big), ["__layer", "zoom", "x", "y"], "left")
        feats = feats.filter(
            F.col("__ntrue").isNull() | (F.pmod(F.col("__fh"), F.col("__ntrue")) < m)
        )
    else:
        feats = feats.withColumn("__ntrue", F.lit(None).cast("long"))

    rendered_layers = [n for n in layer_names if n in extents]
    out_schema = "zoom int, x int, y int, __lc int, data binary, nfeat long"
    blanks = {
        name: {z: empty_layer(name, ext) for z, ext in extents[name].items()}
        for name in rendered_layers
    }
    # integral prop columns arrive as float64+NaN through Arrow when other
    # layers' rows hold NULLs — coerce back so MVT values stay ints
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    int_props = {
        f.name for f in feats.schema.fields
        if isinstance(f.dataType, (ByteType, ShortType, IntegerType, LongType))
    }

    lcode = {name: i for i, name in enumerate(rendered_layers)}
    code_expr = F.array_position(
        F.array(*[F.lit(n) for n in rendered_layers]), F.col("__layer")
    ).cast("int")
    feats = feats.withColumn("__lc", code_expr)
    # r6: geometry layers whose builder collected a closure ring store
    # ship ONLY __pid through the tile exchange; row-borne g_* columns are
    # needed just for the geometry layers WITHOUT a store
    ring_stores = {
        n: sources[f"_ring_store:{n}"]
        for n in rendered_layers
        if sources.get(f"_ring_store:{n}") is not None
    }
    rowborne_geom = any(
        geom_types[n] != GEOM_POINT and n not in ring_stores
        for n in rendered_layers
    )
    needed_cols = set(
        ["zoom", "x", "y", "px", "py", "__fh", "__ntrue", "__lc"]
        + [c for n in rendered_layers for c in layer_props[n]]
        + (["g_xs", "g_ys", "g_hole"] if rowborne_geom else [])
        + (["__pid"] if ring_stores else [])
    )

    def _emit(pdf: pd.DataFrame) -> pd.DataFrame:
        """One sorted chunk of whole (tile, layer) groups -> one output row
        per group [zoom, x, y, __lc, data, nfeat].

        Point layers take the whole-batch point kernel
        (encode_point_layer_segments) and line/polygon layers the whole-batch
        geometry kernel (encode_geom_layer_segments): all of a layer's
        segments across every tile in the chunk clip + encode in one numpy
        pass, so per-tile cost is O(rows + vertices), not O(features x call
        overhead) — at planet z12-14 the (polygon x tile) row count is
        millions per task and a per-feature Python clip loop was the
        encoder-stage straggler.  Blank fill / undefined-zoom NULLs happen in
        the pivot select after the encoder."""
        arrs = {}
        for c in needed_cols & set(pdf.columns):
            a = pdf[c].to_numpy()
            if c in ("zoom", "x", "y", "px", "py", "__fh"):
                a = a.astype(np.int64)
            arrs[c] = a
        key = (arrs["zoom"] << np.int64(58)) | (arrs["x"] << np.int64(29)) | arrs["y"]
        lc = arrs["__lc"].astype(np.int64)
        new_tile = np.concatenate([[True], key[1:] != key[:-1]])
        tile_of_row = np.cumsum(new_tile.astype(np.int64)) - 1
        starts = np.flatnonzero(new_tile)
        zoom_t = arrs["zoom"][starts]
        x_t = arrs["x"][starts]
        y_t = arrs["y"][starts]
        out_z: list = []
        out_x: list = []
        out_y: list = []
        out_lc: list = []
        out_data: list = []
        out_nf: list = []
        for name in rendered_layers:
            code = lcode[name] + 1  # array_position is 1-based
            gt = geom_types[name]
            rows = np.flatnonzero(lc == code)
            if not rows.size:
                continue
            t_of = tile_of_row[rows]
            seg_b = np.flatnonzero(
                np.concatenate([[True], t_of[1:] != t_of[:-1]])
            )
            seg_tile = t_of[seg_b]
            if gt == GEOM_POINT:
                extent_seg = np.array(
                    [extents[name][int(z)] for z in zoom_t[seg_tile]],
                    dtype=np.int64,
                )
                props = {}
                for c in layer_props[name]:
                    col = arrs[c][rows]
                    if c in int_props and col.dtype.kind == "f":
                        col = pd.array(col, dtype="Int64")
                    props[c] = col
                rel_ends = np.concatenate([seg_b[1:], [len(rows)]])
                blobs, n_tot = encode_point_layer_segments(
                    name, extent_seg, seg_b, rel_ends,
                    arrs["px"][rows], arrs["py"][rows], arrs["__fh"][rows],
                    props, arrs["__ntrue"][rows], cap,
                )
                nfs = n_tot.tolist()
            else:
                # line/polygon: whole-batch clip + command-stream kernel
                # (encode_geom_layer_segments) — features clipped entirely
                # away drop out, matching ST_AsMVTGeom's NULL-geometry
                # removal; empty segments get the layer's blank bytes
                zs = zoom_t[seg_tile]
                extent_seg = np.array(
                    [extents[name][int(z)] for z in zs], dtype=np.int64
                )
                lo_seg = np.array([float(-buffers[name][int(z)]) for z in zs])
                hi_seg = np.array(
                    [float(extents[name][int(z)] + buffers[name][int(z)]) for z in zs]
                )
                rel_ends = np.concatenate([seg_b[1:], [len(rows)]])
                props = {c: arrs[c][rows] for c in layer_props[name]}
                if name in ring_stores:
                    # r6 closure path: rebuild each segment's tile affine
                    # with the exact envelope_cols float64 op sequence
                    # (lit(2H)/2^z; -H + x*L; H - y*L; m = 0.0*L;
                    # txmin = xmin - m; txmax = (xmin + L) + m)
                    zs_i = zs.astype(np.int64)
                    L = np.float64(2.0 * HALF_WORLD) / (np.int64(1) << zs_i)
                    xmin = -HALF_WORLD + x_t[seg_tile] * L
                    tymax0 = HALF_WORLD - y_t[seg_tile] * L
                    m0 = 0.0 * L
                    s_txmin = xmin - m0
                    s_tymax = tymax0 + m0
                    s_tlen = ((xmin + L) + m0) - s_txmin
                    blobs, n_tot = encode_geom_layer_segments(
                        name, extent_seg, lo_seg, hi_seg, seg_b, rel_ends,
                        arrs["px"][rows], arrs["py"][rows], arrs["__fh"][rows],
                        None, None, None,
                        props, cap, gt,
                        pid=arrs["__pid"][rows].astype(np.int64),
                        ring_store=ring_stores[name],
                        seg_txmin=s_txmin, seg_tymax=s_tymax, seg_tlen=s_tlen,
                    )
                else:
                    hole_col = arrs.get("g_hole")
                    blobs, n_tot = encode_geom_layer_segments(
                        name, extent_seg, lo_seg, hi_seg, seg_b, rel_ends,
                        arrs["px"][rows], arrs["py"][rows], arrs["__fh"][rows],
                        arrs["g_xs"][rows], arrs["g_ys"][rows],
                        hole_col[rows] if hole_col is not None else None,
                        props, cap, gt,
                    )
                blobs = [
                    b if b else blanks[name][int(zs[i])]
                    for i, b in enumerate(blobs)
                ]
                nfs = n_tot.tolist()
            out_z.extend(zoom_t[seg_tile].tolist())
            out_x.extend(x_t[seg_tile].tolist())
            out_y.extend(y_t[seg_tile].tolist())
            out_lc.extend([code] * len(seg_tile))
            out_data.extend(blobs)
            out_nf.extend(nfs)
        return pd.DataFrame(
            {
                "zoom": pd.Series(out_z, dtype="int32"),
                "x": pd.Series(out_x, dtype="int32"),
                "y": pd.Series(out_y, dtype="int32"),
                "__lc": pd.Series(out_lc, dtype="int32"),
                "data": pd.Series(out_data, dtype=object),
                "nfeat": pd.Series(out_nf, dtype="int64"),
            }
        )

    def encode_stream(batches):
        """Sorted-stream encoder: rows arrive clustered by (zoom, x, y, __lc)
        within each partition; groups are numpy slices of whole Arrow
        batches, so per-group cost is an np.searchsorted + batch-kernel call
        — no per-group pandas DataFrame, which is what makes the z14-shaped
        'millions of tiny tiles' case scale (applyInPandas pays ~ms per
        group; this path pays ~µs)."""
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            key = (
                (pdf["zoom"].to_numpy().astype(np.int64) << np.int64(58))
                | (pdf["x"].to_numpy().astype(np.int64) << np.int64(29))
                | pdf["y"].to_numpy().astype(np.int64)
            )
            lc_a = pdf["__lc"].to_numpy()
            body_end = np.flatnonzero((key != key[-1]) | (lc_a != lc_a[-1]))
            if len(body_end) == 0:
                carry = pdf  # whole batch is one (tile, layer): accumulate
                continue
            cut = int(body_end[-1]) + 1
            carry = pdf.iloc[cut:]
            yield _emit(pdf.iloc[:cut])
        if carry is not None and len(carry):
            yield _emit(carry)

    # partition by (tile, LAYER): each layer blob is an independent unit of
    # work, so a capped low-zoom whale tile costs max cap*margin rows per
    # task instead of L layers x cap in one task — at full planet scale every
    # z<=6 tile is capped, making the per-tile grouping a built-in straggler.
    # The pivot below reassembles tiles from the (small) encoded rows.
    # partitions per core for the encoder stage: tunable because slot
    # occupancy of the Python-boundary stage is the gen-scaling lever
    # (BENCH/BASELINE.md); more, smaller partitions overlap Arrow transfer
    # with encode at the cost of per-partition fixed overhead
    factor = int(
        feats.sparkSession.conf.get("spark.tilekiln.encoder.partsFactor", "4")
    )
    n_parts = feats.sparkSession.sparkContext.defaultParallelism * factor
    enc = (
        feats.repartition(n_parts, "zoom", "x", "y", "__lc")
        .sortWithinPartitions("zoom", "x", "y", "__lc")
        .mapInPandas(encode_stream, out_schema)
    )
    aggs = []
    for name in rendered_layers:
        code = lcode[name] + 1
        is_l = F.col("__lc") == code
        aggs.append(
            F.first(F.when(is_l, F.col("data")), ignorenulls=True).alias(f"{name}_data")
        )
        aggs.append(
            F.first(F.when(is_l, F.col("nfeat")), ignorenulls=True).alias(f"{name}_nfeat")
        )
    tiles = enc.groupBy("zoom", "x", "y").agg(*aggs)
    ts = F.current_timestamp()
    cols = [F.col("zoom"), F.col("x"), F.col("y")]
    for name in rendered_layers:
        defined_zooms = sorted(extents[name])
        defined = F.col("zoom").isin(defined_zooms)
        expr = None  # CASE zoom WHEN z THEN <header-only blank bytes>
        for z in defined_zooms:
            cond = F.col("zoom") == z
            expr = F.when(cond, F.lit(blanks[name][z])) if expr is None else expr.when(cond, F.lit(blanks[name][z]))
        cols.append(F.when(defined, ts).alias(f"{name}_generated"))
        cols.append(
            F.when(defined, F.coalesce(F.col(f"{name}_data"), expr)).alias(f"{name}_data")
        )
        cols.append(
            F.when(defined, F.coalesce(F.col(f"{name}_nfeat"), F.lit(0))).alias(f"{name}_nfeat")
        )
    return tiles.select(*cols)


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
    sources = dict(sources)  # scope the shared-join cache to this call
    feats = _layer_band_features(config, layer, [zoom], sources, worklist)
    prop_cols = [c for c in feats.columns if c not in ("zoom", "x", "y", "px", "py", "__fh")]
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
